"""Progressive rendering: on_wave hook + checkpoint/resume equivalence."""

import numpy as np
import jax.numpy as jnp

from gi_raytracer_tpu.config import RenderConfig
from gi_raytracer_tpu.render import Camera
from gi_raytracer_tpu.render.integrator import Renderer
from gi_raytracer_tpu.scene import SceneBuilder
from gi_raytracer_tpu.scene.meshgen import quad_mesh


def _scene():
    b = SceneBuilder()
    t = b.add_texture_const((0.8, 0.7, 0.6))
    black = b.add_texture_const((0, 0, 0))
    m = b.add_material(t, black, 1.0, 1.0, 1.0)
    b.add_triangles(quad_mesh((-3, -1, -3), (3, -1, -3), (-3, -1, 3),
                              (3, -1, 3)), mat_id=m)
    b.add_sphere((0, 0.2, 0), 0.8, m)
    b.add_light((2, 3, 1), (9, 9, 9), 0.3)
    return b.build(dtype=np.float64)


def test_resume_matches_uninterrupted():
    scene = _scene()
    cfg = RenderConfig(min_samples=4, max_samples=4, max_depth=3,
                       adaptive=False, dtype="float64")
    cam = Camera(pos=(0.0, 1.5, 6.0), look_at=(0.0, 0.0, 0.0))

    r = Renderer(scene, cam, cfg, 24, 24)
    snaps = {}

    def grab(st, s):
        if s == 1:
            snaps["state"] = {k: np.asarray(v) for k, v in st.items()}

    full = np.asarray(r.render(on_wave=grab))
    assert "state" in snaps

    r2 = Renderer(scene, cam, cfg, 24, 24)
    state = {k: jnp.asarray(v) for k, v in snaps["state"].items()}
    resumed = np.asarray(r2.render(state=state))
    np.testing.assert_allclose(resumed, full, rtol=1e-12)


def test_on_wave_called_each_wave():
    scene = _scene()
    cfg = RenderConfig(min_samples=3, max_samples=3, max_depth=2,
                       adaptive=False, dtype="float64")
    cam = Camera(pos=(0.0, 1.5, 6.0), look_at=(0.0, 0.0, 0.0))
    r = Renderer(scene, cam, cfg, 16, 16)
    waves = []
    r.render(on_wave=lambda st, s: waves.append(s))
    assert waves == [0, 1, 2]
