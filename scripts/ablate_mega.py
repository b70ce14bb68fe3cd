"""Megakernel stage-ablation study (VERDICT r4 #7) — run ON the TPU.

Times one full-frame no-map radiance wave (cornell 512x512, depth 8 — the
headline's per-wave unit) through megakernel variants with stages deleted,
to decompose the ~540 ms/wave trace floor:

  full        the production kernel (host-derived MT feature table)
  no_shadow   shadow any-hit traces deleted (occ = 0)
  fixed_hit   closest-hit traces deleted (every alive lane hits tri 0)
  shade_only  both deleted -> shading/secondary/light/RR + glue floor
  linear      ordered-visit machinery deleted: every chunk tested in index
              order, no cull, no sorted early exit, no shrink
  no_shrink   the every-4-iteration collective t-cap shrink deleted

Derived shares printed at the end:
  closest trace  = full - fixed_hit
  shadow trace   = full - no_shadow
  shading floor  = shade_only
  ordering gain  = linear - full   (what the cull/order machinery SAVES)

Usage: python scripts/ablate_mega.py [--waves N]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

SCENE = "/root/reference/scenes/cornell/test.scn"
W = H = 512
DEPTH = 8

VARIANTS = [
    ("full", ()),                   # production policy (linear on cornell)
    ("ordered", ("ordered",)),      # force the r4 ordered walk
    ("no_shadow", ("no_shadow",)),
    ("fixed_hit", ("fixed_hit",)),
    ("shade_only", ("fixed_hit", "no_shadow")),
    ("linear", ("linear",)),
    ("no_shrink", ("no_shrink", "ordered")),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--waves", type=int, default=3,
                    help="timed repetitions per variant")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gi_raytracer_tpu.scene import load_scene
    from gi_raytracer_tpu.render import Camera
    from gi_raytracer_tpu.render.camera import primary_rays
    from gi_raytracer_tpu.render.integrator import Renderer
    from gi_raytracer_tpu.ops.pallas_megakernel import radiance_wave_mega

    ls = load_scene(SCENE)
    cfg = ls.config.replace(min_samples=1, max_samples=1, max_depth=DEPTH,
                            adaptive=False)
    cam = Camera(pos=ls.camera_pos, look_at=ls.camera_look_at)
    r = Renderer(ls.scene, cam, cfg, W, H)

    idx = jnp.asarray(r.enum.index_image(0).ravel()[np.asarray(r._perm)])
    xr = r.sampler.sample(0, idx, r._index_bits).astype(jnp.float32)
    yr = r.sampler.sample(1, idx, r._index_bits).astype(jnp.float32)
    ro, rd = primary_rays(cam, W, H, xr * r.enum.scale_x,
                          yr * r.enum.scale_y)
    sx, sy = r._bounce_samples(idx)
    lane = jnp.arange(W * H, dtype=jnp.uint32)

    results = {}
    for name, ablate in VARIANTS:
        fn = jax.jit(lambda ro, rd, sx, sy, lane, a=ablate:
                     radiance_wave_mega(ls.scene, cfg, ro, rd, sx, sy,
                                        lane, 0, None, ablate=a)[0])
        out = fn(ro, rd, sx, sy, lane)          # compile + warmup
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(args.waves):
            out = fn(ro, rd, sx, sy, lane)
            jax.block_until_ready(out)
        dt = (time.time() - t0) / args.waves
        results[name] = dt
        print(json.dumps({"variant": name, "ms_per_wave": dt * 1e3}),
              flush=True)

    f = results["full"]
    print(json.dumps({
        "closest_trace_ms": (f - results["fixed_hit"]) * 1e3,
        "shadow_trace_ms": (f - results["no_shadow"]) * 1e3,
        "shading_floor_ms": results["shade_only"] * 1e3,
        "ordering_gain_ms": (results["linear"] - f) * 1e3,
        "shrink_cost_ms": (f - results["no_shrink"]) * 1e3,
        "full_ms": f * 1e3,
    }), flush=True)


if __name__ == "__main__":
    main()
