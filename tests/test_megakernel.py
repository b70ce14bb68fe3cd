"""Bounce megakernel vs the staged integrator (interpret mode on CPU).

The megakernel runs the whole bounce loop in one Pallas kernel; every
stochastic stream replays sampling.rng.hash_u01 bit-exactly, so on an
all-opaque triangle scene its radiance must match the staged path up to
float reassociation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gi_raytracer_tpu.scene import load_scene
from gi_raytracer_tpu.config import RenderConfig
from gi_raytracer_tpu.render import Camera
from gi_raytracer_tpu.render.integrator import Renderer, radiance_wave
from gi_raytracer_tpu.render.camera import primary_rays
from gi_raytracer_tpu.ops.pallas_megakernel import (radiance_wave_mega,
                                                    mega_eligible)

CORNELL = "/root/reference/scenes/cornell/test.scn"
W = H = 32


@pytest.fixture(scope="module")
def setup():
    ls = load_scene(CORNELL)
    # the staged PALLAS backend (interpret mode on CPU) is the apples-to-
    # apples baseline: the megakernel shares its homogeneous accept test,
    # which disagrees with the exact jnp test on ~0.3% of grazing/edge lanes
    cfg = ls.config.replace(min_samples=1, max_samples=1, max_depth=4,
                            adaptive=False, dtype="float32",
                            intersect_backend="pallas", knn_backend="jnp")
    cam = Camera(pos=ls.camera_pos, look_at=ls.camera_look_at)
    r = Renderer(ls.scene, cam, cfg, W, H)
    idx = jnp.asarray(r.enum.index_image(0).ravel()[np.asarray(r._perm)])
    xr = r.sampler.sample(0, idx, r._index_bits).astype(jnp.float32)
    yr = r.sampler.sample(1, idx, r._index_bits).astype(jnp.float32)
    ro, rd = primary_rays(cam, W, H, xr * r.enum.scale_x,
                          yr * r.enum.scale_y)
    sx_all, sy_all = r._bounce_samples(idx)
    return ls, cfg, ro, rd, sx_all, sy_all


def test_cornell_is_mega_eligible(setup):
    ls, cfg, *_ = setup
    assert mega_eligible(ls.scene, cfg)


def test_mega_matches_staged_wave(setup):
    ls, cfg, ro, rd, sx_all, sy_all = setup
    R = ro.shape[0]
    lane = jnp.arange(R, dtype=jnp.uint32)
    key = jax.random.PRNGKey(0)

    want, (nc_w, ns_w) = radiance_wave(ls.scene, cfg, ro, rd, sx_all, sy_all,
                                       key, 0, None, with_counts=True)
    got, (nc_g, ns_g) = radiance_wave_mega(ls.scene, cfg, ro, rd,
                                           sx_all, sy_all, lane,
                                           wave_salt=0, interpret=True)
    want = np.asarray(want)
    got = np.asarray(got)
    # identical stochastic streams -> identical path topology; tiny float
    # reassociation differences only
    mismatch = np.abs(got - want).max()
    assert np.isfinite(got).all()
    assert mismatch < 1e-4, f"max abs err {mismatch}"
    assert int(nc_g) == int(nc_w), (int(nc_g), int(nc_w))
    assert int(ns_g) == int(ns_w), (int(ns_g), int(ns_w))


@pytest.mark.slow
def test_mega_matches_staged_wave_with_photon_map(setup):
    from gi_raytracer_tpu.render.photon import PhotonBatch, build_photon_map
    ls, cfg, ro, rd, sx_all, sy_all = setup
    R = ro.shape[0]
    rng = np.random.default_rng(0)
    P = 4000
    lo = np.asarray(ls.scene.world_min, np.float32)
    hi = np.asarray(ls.scene.world_max, np.float32)
    ppos = rng.uniform(lo, hi, (P, 3)).astype(np.float32)
    pdir = rng.normal(size=(P, 3)).astype(np.float32)
    pdir /= np.linalg.norm(pdir, axis=1, keepdims=True)
    pcol = rng.uniform(0, 0.1, (P, 3)).astype(np.float32)
    pm = build_photon_map(
        PhotonBatch(jnp.asarray(ppos), jnp.asarray(pdir), jnp.asarray(pcol),
                    jnp.ones(P, bool)), lo, hi)

    lane = jnp.arange(R, dtype=jnp.uint32)
    key = jax.random.PRNGKey(0)
    want = np.asarray(radiance_wave(ls.scene, cfg, ro, rd, sx_all, sy_all,
                                    key, 0, pm))
    got, _ = radiance_wave_mega(ls.scene, cfg, ro, rd, sx_all, sy_all, lane,
                                wave_salt=0, photon_map=pm, interpret=True)
    got = np.asarray(got)
    assert np.isfinite(got).all()
    assert np.abs(got - want).max() < 1e-4, np.abs(got - want).max()


@pytest.mark.slow
def test_renderer_mega_matches_staged_end_to_end(setup):
    """The full Renderer (fused adaptive loop) with integrator="mega"
    (interpret mode on CPU) matches the staged-pallas renderer."""
    ls, cfg0, *_ = setup
    cam = Camera(pos=ls.camera_pos, look_at=ls.camera_look_at)
    cfg_staged = cfg0.replace(min_samples=2, max_samples=2, adaptive=False,
                              integrator="staged")
    cfg_mega = cfg_staged.replace(integrator="mega")
    img_s = np.asarray(Renderer(ls.scene, cam, cfg_staged, 16, 16).render())
    img_m = np.asarray(Renderer(ls.scene, cam, cfg_mega, 16, 16).render())
    assert np.isfinite(img_m).all()
    # exact-tie hits across chunks may resolve to a different (equally
    # valid) winner primitive in the two kernels' visit orders — allow a
    # few isolated pixels, require everything else tight
    err = np.abs(img_m - img_s).max(axis=-1)
    assert (err > 1e-4).mean() < 0.01, (err > 1e-4).mean()
    assert err.mean() < 1e-3, err.mean()


def test_mega_matches_staged_wave_depth16(setup):
    """Runtime-depth widening (r5): the default config's max_depth=16 must
    take the megakernel and agree with the staged path."""
    ls, cfg, ro, rd, sx_all, sy_all = setup
    cfg16 = cfg.replace(max_depth=16)
    assert mega_eligible(ls.scene, cfg16)
    r = Renderer(ls.scene, Camera(pos=ls.camera_pos,
                                  look_at=ls.camera_look_at),
                 cfg16, W, H)
    idx = jnp.asarray(r.enum.index_image(0).ravel()[np.asarray(r._perm)])
    sx16, sy16 = r._bounce_samples(idx)
    R = ro.shape[0]
    lane = jnp.arange(R, dtype=jnp.uint32)
    key = jax.random.PRNGKey(0)
    want, (nc_w, ns_w) = radiance_wave(ls.scene, cfg16, ro, rd, sx16, sy16,
                                       key, 0, None, with_counts=True)
    got, (nc_g, ns_g) = radiance_wave_mega(ls.scene, cfg16, ro, rd,
                                           sx16, sy16, lane,
                                           wave_salt=0, interpret=True)
    mismatch = np.abs(np.asarray(got) - np.asarray(want)).max()
    assert np.isfinite(np.asarray(got)).all()
    assert mismatch < 1e-4, f"max abs err {mismatch}"
    assert int(nc_g) == int(nc_w), (int(nc_g), int(nc_w))
    assert int(ns_g) == int(ns_w), (int(ns_g), int(ns_w))
