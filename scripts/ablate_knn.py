"""kNN gather stage ablation — run ON the TPU, one mode per process.

Times the class-tiled gather (photon_knn.sample_photons_tiled) on the
bench protocol's 262k primary-hit queries against the cornell 750k map,
under the KNN_ABLATE stage deletions baked in at import time:

  (unset)        full pipeline
  nores          tile passes + prep, per-point residual skipped
  nokernel,nores prep/runs machinery only (class gather+kernels skipped)

plus a direct timing of the morton argsort + inverse permutation alone.

Usage:
  for m in "" nores nokernel,nores; do KNN_ABLATE=$m python scripts/ablate_knn.py; done
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

SCENE = "/root/reference/scenes/cornell/test.scn"
W = H = 512


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gi_raytracer_tpu.scene import load_scene
    from gi_raytracer_tpu.render import Camera
    from gi_raytracer_tpu.render.camera import primary_rays
    from gi_raytracer_tpu.render.integrator import Renderer
    from gi_raytracer_tpu.render.photon import (trace_photons,
                                                build_photon_map)
    from gi_raytracer_tpu.render.photon_knn import (sample_photons_tiled,
                                                    _morton3)
    from gi_raytracer_tpu.ops.intersect import trace_closest

    ls = load_scene(SCENE)
    cfg = ls.config.replace(min_samples=1, max_samples=1, adaptive=False)
    cam = Camera(pos=ls.camera_pos, look_at=ls.camera_look_at)

    batch = trace_photons(ls.scene, cfg)
    jax.block_until_ready(batch.pos)
    pm = build_photon_map(batch, np.asarray(ls.scene.world_min),
                          np.asarray(ls.scene.world_max))

    r = Renderer(ls.scene, cam, cfg, W, H)
    idx = jnp.asarray(r.enum.index_image(0).ravel()[np.asarray(r._perm)])
    xr = r.sampler.sample(0, idx, r._index_bits).astype(jnp.float32)
    yr = r.sampler.sample(1, idx, r._index_bits).astype(jnp.float32)
    ro, rd = primary_rays(cam, W, H, xr * r.enum.scale_x,
                          yr * r.enum.scale_y)
    hit = jax.jit(lambda a, b: trace_closest(ls.scene, a, b))(ro, rd)
    pts = ro + jnp.where(hit.prim >= 0, hit.t, 0.0)[:, None] * rd
    dirs = -rd

    mode = os.environ.get("KNN_ABLATE", "") or "full"

    gather = jax.jit(lambda p, d: sample_photons_tiled(pm, p, d, cfg.knn_k))
    jax.block_until_ready(gather(pts, dirs))
    t0 = time.time()
    for _ in range(3):
        jax.block_until_ready(gather(pts, dirs))
    dt = (time.time() - t0) / 3
    print(json.dumps({"knn_mode": mode, "ms": dt * 1e3,
                      "points": int(pts.shape[0])}), flush=True)

    if mode == "full":
        # morton argsort + inverse permutation + sorted gather alone
        dims_i = jnp.asarray([pm.dims[0] - 1, pm.dims[1] - 1,
                              pm.dims[2] - 1], jnp.int32)

        def sort_only(p):
            g = (p.astype(jnp.float32) - pm.grid_min[None, :].astype(
                jnp.float32)) * pm.inv_cell[None, :].astype(jnp.float32)
            cells = jnp.clip(g.astype(jnp.int32), 0, dims_i)
            order = jnp.argsort(
                _morton3(cells[:, 0], cells[:, 1], cells[:, 2]),
                stable=True).astype(jnp.int32)
            pos_of = jnp.zeros_like(order).at[order].set(
                jnp.arange(p.shape[0], dtype=jnp.int32),
                unique_indices=True)
            return p[order], cells[order], pos_of

        f = jax.jit(sort_only)
        jax.block_until_ready(f(pts))
        t0 = time.time()
        for _ in range(3):
            jax.block_until_ready(f(pts))
        dt = (time.time() - t0) / 3
        print(json.dumps({"knn_mode": "morton_sort_only", "ms": dt * 1e3}),
              flush=True)


if __name__ == "__main__":
    main()
