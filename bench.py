"""Benchmark harness — run on real TPU hardware by the driver.

Prints one JSON line per metric; the LAST line is the headline metric:
  {"metric": "rays_per_s_cornell_512_8spp", "value": N, "unit": "rays/s",
   "vs_baseline": N}

Protocol (BASELINE.md): cornell at 512x512, fixed 8 spp, depth 8, WITH the
scene's 750k-photon caustic map (scenes/cornell/test.scn:3) — the same
work the reference's trace()/visible()/samplePhotons() do per frame.
r4 note: this runs end-to-end on-device for the first time (r3's photon
renders crashed the TPU worker); the bounce megakernel + tiled kNN gather
make the headline a measured number, not a fallback.

"Rays" counts every traversal query actually issued for an ALIVE lane —
primary + bounce extensions + shadow rays, from the integrator's own
per-bounce counters (megakernel / PathState) — NOT a
W*H*SPP*DEPTH*(1+L) formula: paths killed by Russian roulette stop
counting, exactly as the reference's recursion stops issuing queries.

Also reported:
  rays_per_s_cornell_512_8spp_nophotons — the trace+shade-only number
    (comparable to r2/r3 lines)
  photons_emitted_per_s  — wavefront emission pass throughput (750k slots)
  knn_gather_mphotons_per_s — photons returned by the kNN caustic estimate
    per second at 262k PRIMARY-HIT shading points (k=32).  r4 protocol
    change: queries are the actual first-bounce surface points (87%
    occupied windows) instead of uniform random volume points (mostly
    empty windows) — the old protocol flattered the gather by ~8x.

vs_baseline: MEASURED (r5).  scripts/ref_baseline/build_and_run.sh builds
the reference headless (its own sources + a QImage shim) and times the
exact headline workload (cornell 512x512 / 8spp fixed / 750k-photon map)
on this host's cores; BASELINE.json `measured_reference` holds the result
(198.5 s on 2 cores = 58.0k rays/s/core).  vs_baseline divides by the
32-core linear projection (1.856 Mrays/s) — the >=50x north-star
denominator; `vs_ref_host` divides by the as-measured 2-core number.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_BASE = json.load(open(os.path.join(os.path.dirname(
    os.path.abspath(__file__)), "BASELINE.json")))
REF_32CORE_RAYS_PER_S = _BASE["measured_reference"][
    "rays_per_s_32core_projected"]
REF_HOST_RAYS_PER_S = _BASE["measured_reference"]["rays_per_s_measured_2core"]

SCENE = "/root/reference/scenes/cornell/test.scn"
WIDTH = HEIGHT = 512
SPP = 8
DEPTH = 8


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, "/root/repo")
    from gi_raytracer_tpu.scene import load_scene
    from gi_raytracer_tpu.render import Camera
    from gi_raytracer_tpu.render.camera import primary_rays
    from gi_raytracer_tpu.render.integrator import Renderer
    from gi_raytracer_tpu.render.photon import (trace_photons,
                                                build_photon_map,
                                                sample_photons_backend)
    from gi_raytracer_tpu.ops.intersect import trace_closest

    ls = load_scene(SCENE)
    cfg = ls.config.replace(min_samples=SPP, max_samples=SPP,
                            max_depth=DEPTH, adaptive=False)
    cam = Camera(pos=ls.camera_pos, look_at=ls.camera_look_at)

    # --- photon pass (cornell requests 750k, test.scn:3) ------------------
    batch = trace_photons(ls.scene, cfg)   # warmup+compile
    jax.block_until_ready(batch.pos)
    t0 = time.time()
    batch = trace_photons(ls.scene, cfg)
    jax.block_until_ready(batch.pos)
    dt_ph = time.time() - t0
    stored = int(np.asarray(batch.stored).sum())
    print(json.dumps({"metric": "photons_emitted_per_s",
                      "value": cfg.photons / dt_ph, "unit": "photons/s",
                      "stored": stored, "seconds": dt_ph}))

    pm = build_photon_map(batch, np.asarray(ls.scene.world_min),
                          np.asarray(ls.scene.world_max))

    # --- kNN gather throughput on REAL shading points ---------------------
    R = WIDTH * HEIGHT
    r_probe = Renderer(ls.scene, cam, cfg, WIDTH, HEIGHT)
    idx = jnp.asarray(r_probe.enum.index_image(0).ravel()[
        np.asarray(r_probe._perm)])
    xr = r_probe.sampler.sample(0, idx, r_probe._index_bits).astype(jnp.float32)
    yr = r_probe.sampler.sample(1, idx, r_probe._index_bits).astype(jnp.float32)
    ro, rd = primary_rays(cam, WIDTH, HEIGHT, xr * r_probe.enum.scale_x,
                          yr * r_probe.enum.scale_y)
    hit = jax.jit(lambda a, b: trace_closest(ls.scene, a, b))(ro, rd)
    pts = ro + jnp.where(hit.prim >= 0, hit.t, 0.0)[:, None] * rd
    dirs = -rd
    gather = jax.jit(lambda p, d: sample_photons_backend(
        pm, p, d, cfg.knn_k, cfg.knn_backend))
    jax.block_until_ready(gather(pts, dirs))  # warmup
    t0 = time.time()
    jax.block_until_ready(gather(pts, dirs))
    dt_g = time.time() - t0
    print(json.dumps({"metric": "knn_gather_mphotons_per_s",
                      "value": R * cfg.knn_k / dt_g / 1e6,
                      "unit": "Mphotons/s", "points": R, "k": cfg.knn_k,
                      "seconds": dt_g, "query_protocol": "primary-hit"}))

    # --- backward pass: one inverse-rendering step (VERDICT r4 #5) --------
    # STAGED fwd+bwd through the whole estimator with a 50k-photon map;
    # gradients to the photon-map colors (through the differentiable
    # chunk-row kNN) and the light color.  The tunnel's remote compile
    # helper crashes on the largest differentiated programs, so a ladder
    # of configs is tried largest-first and the first that compiles is
    # reported.
    from gi_raytracer_tpu.render.integrator import radiance_wave
    n_small = 50_000
    small = jax.tree_util.tree_map(lambda a: a[:n_small], batch)
    pm_small = build_photon_map(small, np.asarray(ls.scene.world_min),
                                np.asarray(ls.scene.world_max))
    done = False
    for W2, depth_b, knn_b in ((256, 8, "chunkrow"), (128, 6, "chunkrow"),
                               (128, 6, "jnp")):
        if done:
            break
        N2 = W2 * W2
        cfg2 = cfg.replace(min_samples=1, max_samples=1, max_depth=depth_b,
                           knn_backend=knn_b)
        rb = Renderer(ls.scene, cam, cfg2, W2, W2)
        idx = jnp.asarray(rb.enum.index_image(0).ravel()[
            np.asarray(rb._perm)])
        xr2 = rb.sampler.sample(0, idx, rb._index_bits).astype(jnp.float32)
        yr2 = rb.sampler.sample(1, idx, rb._index_bits).astype(jnp.float32)
        ro2, rd2 = primary_rays(cam, W2, W2, xr2 * rb.enum.scale_x,
                                yr2 * rb.enum.scale_y)
        sx2, sy2 = rb._bounce_samples(idx)
        lane2 = jnp.arange(N2, dtype=jnp.uint32)
        key2 = jax.random.PRNGKey(0)
        target = jnp.full((N2, 3), 0.25, jnp.float32)

        def loss_fn(pcol, lcol, cfg2=cfg2, ro2=ro2, rd2=rd2, sx2=sx2,
                    sy2=sy2, lane2=lane2, target=target):
            pm_ = pm_small.replace(col=pcol)
            sc = ls.scene.replace(lights=ls.scene.lights.replace(
                col=jnp.broadcast_to(lcol, ls.scene.lights.col.shape)))
            c = radiance_wave(sc, cfg2, ro2, rd2, sx2, sy2, key2, 0, pm_,
                              lane_ids=lane2)
            return jnp.mean((c - target) ** 2)

        try:
            step = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)))
            out = step(pm_small.col, ls.scene.lights.col[0])
            jax.block_until_ready(out)
            t0 = time.time()
            (lv, (g_pcol, g_lcol)) = step(pm_small.col,
                                          ls.scene.lights.col[0])
            jax.block_until_ready(g_pcol)
            dt_b = time.time() - t0
            print(json.dumps({
                "metric": "train_step_seconds",
                "value": dt_b, "unit": "s",
                "workload": f"cornell {W2}x{W2} 1spp wavefront, depth "
                            f"{depth_b}, staged fwd+bwd, 50k-photon map, "
                            f"knn={knn_b}; grads: photon colors + light "
                            "color",
                "loss": float(lv),
                "grad_norms": [float(jnp.linalg.norm(g_pcol)),
                               float(jnp.linalg.norm(g_lcol))],
            }))
            done = True
        except Exception as e:
            print(json.dumps({"metric": "train_step_attempt",
                              "config": [W2, depth_b, knn_b],
                              "error": str(e)[:120]}))

    # --- render WITHOUT the map (r2/r3-comparable trace+shade number) -----
    r0 = Renderer(ls.scene, cam, cfg, WIDTH, HEIGHT)
    img, st = r0.render(return_state=True)
    np.asarray(img)
    t0 = time.time()
    img, st = r0.render(return_state=True)
    np.asarray(img)
    dt0 = time.time() - t0
    rays0 = float(np.asarray(st["rays"]))
    print(json.dumps({
        "metric": "rays_per_s_cornell_512_8spp_nophotons",
        "value": rays0 / dt0, "unit": "rays/s", "seconds": dt0,
        "rays_traced": rays0,
    }))

    # --- full render WITH the 750k photon map (the reference's workload) --
    try:
        r = Renderer(ls.scene, cam, cfg, WIDTH, HEIGHT, photon_map=pm)
        img, st = r.render(return_state=True)   # warmup
        np.asarray(img)

        t0 = time.time()
        img, st = r.render(return_state=True)
        np.asarray(img)
        dt = time.time() - t0

        rays = float(np.asarray(st["rays"]))
        rays_per_s = rays / dt
        print(json.dumps({
            "metric": "rays_per_s_cornell_512_8spp",
            "value": rays_per_s,
            "unit": "rays/s",
            "vs_baseline": rays_per_s / REF_32CORE_RAYS_PER_S,
            "vs_ref_host": rays_per_s / REF_HOST_RAYS_PER_S,
            "baseline": "measured 32-core projection "
                        f"{REF_32CORE_RAYS_PER_S:.3g} rays/s "
                        "(BASELINE.json measured_reference)",
            "seconds": dt,
            "rays_traced": rays,
            "with_photon_map": True,
        }))
    except Exception as e:
        # report the trace+shade number under a DISTINCT metric name (the
        # documented protocol for the headline name is WITH the map) and a
        # null vs_baseline so consumers keying on the headline name never
        # compare incommensurable numbers
        print(json.dumps({
            "metric": "rays_per_s_cornell_512_8spp_nophotons_fallback",
            "value": rays0 / dt0,
            "unit": "rays/s",
            "vs_baseline": None,
            "seconds": dt0,
            "rays_traced": rays0,
            "with_photon_map": False,
            "photon_render_error": str(e)[:120],
        }))


if __name__ == "__main__":
    main()
