"""Golden-image validation against the reference's OWN rendered outputs.

The reference ships renders for its bundled scenes (SURVEY §4: golden-image
eyeball testing).  Exact pixel equality is impossible by construction — the
reference is float64 C++ with wall-clock-seeded xorshift RNG (util.h:52-80)
and fastPow bit tricks — so these tests assert DOCUMENTED statistical
tolerances on the downsampled images:

* cornell (scenes/cornell/test.scn vs scenes/cornell/render.png): the
  checkout is missing dragon.obj (.MISSING_LARGE_BLOBS), so the golden
  contains a glass dragon our render cannot have; tolerances are set to
  absorb it (the dragon is transparent — measured contribution ~0.01 mean).
  Measured at 4 spp / no photons: mean 0.045, P95 0.100.
* caustics_02 (scenes/caustics_02/caustics.scn vs
  examples/caustics/test_16/render_7.5m.png — same scene, all assets
  present): measured mean 0.008, P95 0.040 at 2 spp / 20k photons.

Higher-fidelity side-by-sides (512px, full photon budgets, TPU) are
produced by scripts/validate_golden.py and committed under docs/validation/.
"""

import os

import numpy as np
import pytest
from PIL import Image

import jax

from gi_raytracer_tpu.scene import load_scene
from gi_raytracer_tpu.render import Camera
from gi_raytracer_tpu.render.integrator import Renderer
from gi_raytracer_tpu.render.photon import trace_photons, build_photon_map

REF = "/root/reference"
SIZE = 128


def _render(scn, spp, depth, photons=0, size=SIZE):
    ls = load_scene(scn)
    cfg = ls.config.replace(min_samples=spp, max_samples=spp,
                            max_depth=depth, adaptive=False)
    pm = None
    if photons:
        cfg = cfg.replace(photons=photons)
        batch = trace_photons(ls.scene, cfg)
        pm = build_photon_map(batch, np.asarray(ls.scene.world_min),
                              np.asarray(ls.scene.world_max))
    cam = Camera(pos=ls.camera_pos, look_at=ls.camera_look_at)
    r = Renderer(ls.scene, cam, cfg, size, size, photon_map=pm)
    return np.asarray(r.tonemap(r.render()))


def _golden(path, size=SIZE):
    img = Image.open(path).convert("RGB").resize((size, size),
                                                 Image.BILINEAR)
    return np.asarray(img, np.float32) / 255.0


def _stats(img, gold):
    diff = np.abs(img - gold).mean(axis=-1)
    return float(diff.mean()), float(np.percentile(diff, 95))


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_cornell_matches_reference_render():
    img = _render(f"{REF}/scenes/cornell/test.scn", spp=4, depth=6)
    gold = _golden(f"{REF}/scenes/cornell/render.png")
    mean, p95 = _stats(img, gold)
    # documented tolerance: 0.045/0.100 measured + headroom; the golden
    # includes the missing glass dragon and 750k-photon caustics
    assert mean < 0.065, f"cornell mean abs err {mean}"
    assert p95 < 0.14, f"cornell P95 abs err {p95}"
    # structural checks survive the tolerance: red box region is red
    box = img[58:82, 39:52]
    assert box[..., 0].mean() > 1.5 * box[..., 2].mean(), "red box missing"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_caustics02_matches_reference_render():
    img = _render(f"{REF}/scenes/caustics_02/caustics.scn", spp=2, depth=5,
                  photons=20000)
    gold = _golden(f"{REF}/examples/caustics/test_16/render_7.5m.png")
    mean, p95 = _stats(img, gold)
    # measured 0.008/0.040 at these settings + headroom
    assert mean < 0.02, f"caustics_02 mean abs err {mean}"
    assert p95 < 0.08, f"caustics_02 P95 abs err {p95}"
