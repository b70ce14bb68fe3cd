"""Benchmark harness — run on real TPU hardware by the driver.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: rays/s through the full trace+shade wavefront on the cornell scene
at 512x512, fixed 8 spp, depth 8 (protocol per BASELINE.md).  "Rays" counts
every traversal query actually issued for an ALIVE lane — primary + bounce
extensions + shadow rays, from the integrator's own per-bounce counters —
matching how the reference's trace()/visible() calls would be counted.
Paths killed by Russian roulette stop counting, exactly as the reference's
recursion stops issuing queries.

vs_baseline: the reference publishes no numbers (BASELINE.md); the north
star is >=50x a 32-core CPU running the reference.  We report against a
measured proxy: the reference's single-thread C++ renderer does ~1-2 Mrays/s
per core on cornell-class scenes => a 32-core CPU ~= 48 Mrays/s.  That
constant (48e6) is used until a measured reference baseline lands in
BASELINE.json.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

REF_32CORE_RAYS_PER_S = 48e6  # documented proxy, see module docstring

SCENE = "/root/reference/scenes/cornell/test.scn"
WIDTH = HEIGHT = 512
SPP = 8
DEPTH = 8


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, "/root/repo")
    from gi_raytracer_tpu.scene import load_scene
    from gi_raytracer_tpu.render import Camera
    from gi_raytracer_tpu.render.integrator import Renderer

    ls = load_scene(SCENE)
    cfg = ls.config.replace(min_samples=SPP, max_samples=SPP,
                            max_depth=DEPTH, adaptive=False)
    cam = Camera(pos=ls.camera_pos, look_at=ls.camera_look_at)
    r = Renderer(ls.scene, cam, cfg, WIDTH, HEIGHT)

    # warmup / compile
    img, st = r.render(return_state=True)
    np.asarray(img)

    t0 = time.time()
    img, st = r.render(return_state=True)
    np.asarray(img)
    dt = time.time() - t0

    # HONEST ray count from the integrator's own per-bounce alive/shadow
    # counters (integrator.py PathState.n_closest/n_shadow, accumulated into
    # state["rays"] by the fused loop) — NOT the W*H*SPP*DEPTH*(1+L) formula,
    # which pretends every path survives all bounces.
    rays = float(np.asarray(st["rays"]))
    rays_per_s = rays / dt
    print(json.dumps({
        "metric": "rays_per_s_cornell_512_8spp",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": rays_per_s / REF_32CORE_RAYS_PER_S,
        "seconds": dt,
        "rays_traced": rays,
    }))


if __name__ == "__main__":
    main()
