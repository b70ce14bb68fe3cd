"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


@needs_8
def test_dryrun_multichip_8():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


@needs_8
def test_sharded_wave_matches_single_device():
    import __graft_entry__ as ge
    from gi_raytracer_tpu.config import RenderConfig
    from gi_raytracer_tpu.render import Camera
    from gi_raytracer_tpu.render.integrator import Renderer, radiance_wave
    from gi_raytracer_tpu.parallel import make_mesh, render_wave_sharded

    scene = ge._tiny_scene(np.float32)
    cfg = RenderConfig(min_samples=1, max_samples=1, max_depth=3)
    cam = Camera(pos=(0.0, 0.0, -14.0), look_at=(0.0, 0.0, 0.0))
    r = Renderer(scene, cam, cfg, 16, 16)
    ro, rd, sx_all, sy_all, key = ge._make_wave_inputs(r)

    single = radiance_wave(scene, cfg, ro, rd, sx_all, sy_all, key, 0, None)

    mesh = make_mesh(8)
    sharded = render_wave_sharded(mesh, scene, cfg, ro, rd, sx_all, sy_all,
                                  key, 0, None)
    np.testing.assert_allclose(np.asarray(single), np.asarray(sharded),
                               rtol=2e-5, atol=2e-6)


@needs_8
def test_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()
