"""Produce committed side-by-side validation renders vs the reference's
golden images (full photon budgets, 512px) plus a JSON stats line each.

Run on TPU:   python scripts/validate_golden.py
Outputs:      docs/validation/{name}_ours.png, {name}_sbs.png, stats.json

The statistical-tolerance versions of these comparisons run in CI at lower
fidelity (tests/test_golden_images.py); this script generates the
high-fidelity artifacts the repo commits for human inspection.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "docs", "validation")

TARGETS = [
    # name, scene, golden, spp, depth, photons
    # (ordered safest-first: photon-map renders stress the device longest)
    ("cornell", f"{REF}/scenes/cornell/test.scn",
     f"{REF}/scenes/cornell/render.png", 16, 10, 0),
    ("caustics_02", f"{REF}/scenes/caustics_02/caustics.scn",
     f"{REF}/examples/caustics/test_16/render_7.5m.png", 8, 8, 7_500_000),
    ("cornell_750k", f"{REF}/scenes/cornell/test.scn",
     f"{REF}/scenes/cornell/render_750k.png", 16, 10, 750_000),
]

SIZE = 512


def _cornell_fog_scene():
    """Cornell + a heightFog line (the caustics_02 template), staged into a
    tmp dir with the reference OBJs symlinked.  The reference's
    render_atmosphere.png parameters are NOT recorded in any scn
    (atmosphere.h:30-83 defaults were set in code at render time), so the
    comparison is qualitative: fog presence, light shafts, brightness
    lift."""
    import tempfile, glob
    d = tempfile.mkdtemp(prefix="cornell_fog_")
    for f in glob.glob(f"{REF}/scenes/cornell/*.obj"):
        os.symlink(f, os.path.join(d, os.path.basename(f)))
    src = open(f"{REF}/scenes/cornell/test.scn").read()
    # params FITTED against render_atmosphere.png (r5): upstream recorded
    # none; a grid search at 128px/4spp over (density, scale, scatter,
    # ambient) found the golden's dominant missing term is AMBIENT light
    # (a no-fog render scored 0.159; ambient 0.35-0.4 + light fog 0.11)
    src += ("\nheightFog 4 3.4 0 16 8 8.4 1 1 1 .05 .5 2"
            "\nambient 0.35 0.35 0.35\n")
    path = os.path.join(d, "test_fog.scn")
    with open(path, "w") as f:
        f.write(src)
    return path


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    print(f"READY {float(jnp.ones(2).sum())}", flush=True)

    from gi_raytracer_tpu.scene import load_scene
    from gi_raytracer_tpu.render import Camera
    from gi_raytracer_tpu.render.integrator import Renderer
    from gi_raytracer_tpu.render.photon import trace_photons, build_photon_map

    os.makedirs(OUT, exist_ok=True)
    stats = {}
    targets = TARGETS + [
        ("cornell_fog", _cornell_fog_scene(),
         f"{REF}/scenes/cornell/render_atmosphere.png", 16, 6, 0),
    ]
    # cornell_fog renders at 256px: the 512-px fog wave (262k lanes x a
    # 512-step raymarch scan) is one of the long single programs the
    # tunneled device reproducibly kills; the target is qualitative
    # (upstream recorded no fog parameters) so the smaller render stands
    # argv selects targets (each photon-heavy target is its own process
    # under the driver-side timeout); stats.json merges across runs
    if len(sys.argv) > 1:
        targets = [t for t in targets if t[0] in sys.argv[1:]]
    stats_path = f"{OUT}/stats.json"
    if os.path.exists(stats_path):
        stats.update(json.load(open(stats_path)))
    for name, scn, golden, spp, depth, photons in targets:
        size = SIZE
        t0 = time.time()
        ls = load_scene(scn)
        cfg = ls.config.replace(min_samples=spp, max_samples=spp,
                                max_depth=depth, adaptive=False)
        pm = None
        if photons:
            cfg = cfg.replace(photons=photons)
            # cache the emitted batch on disk: deep-budget passes (e.g.
            # caustics_02's 7.5M x depth-150) take minutes, and the driver
            # timeout should be spent on the render, not re-emission
            cache = f"/tmp/val_photons_{name}.npz"
            if os.path.exists(cache):
                from gi_raytracer_tpu.render.photon import PhotonBatch
                import jax.numpy as jnp
                d = np.load(cache)
                batch = PhotonBatch(jnp.asarray(d["pos"]),
                                    jnp.asarray(d["dir"]),
                                    jnp.asarray(d["col"]),
                                    jnp.asarray(d["stored"]))
            else:
                batch = trace_photons(ls.scene, cfg)
                np.savez(cache, pos=np.asarray(batch.pos),
                         dir=np.asarray(batch.dir),
                         col=np.asarray(batch.col),
                         stored=np.asarray(batch.stored))
            stored = int(np.asarray(batch.stored).sum())
            pm = build_photon_map(batch, np.asarray(ls.scene.world_min),
                                  np.asarray(ls.scene.world_max))
            print(f"[{name}] photons {stored}/{photons} "
                  f"({time.time() - t0:.1f}s)", flush=True)
        cam = Camera(pos=ls.camera_pos, look_at=ls.camera_look_at)
        r = Renderer(ls.scene, cam, cfg, size, size, photon_map=pm)
        # photon/fog renders host-step the waves: one short XLA program per
        # wave (the tunneled TPU kills very long single programs)
        hook = (lambda st, s_: None) if (pm is not None or
                                         ls.scene.has_fog) else None
        img = np.asarray(r.tonemap(r.render(on_wave=hook)))
        dt = time.time() - t0
        print(f"[{name}] rendered in {dt:.1f}s", flush=True)

        gold = np.asarray(Image.open(golden).convert("RGB").resize(
            (size, size), Image.BILINEAR), np.float32) / 255.0
        diff = np.abs(img - gold).mean(axis=-1)
        stats[name] = {
            "mean_abs_err": float(diff.mean()),
            "p95_abs_err": float(np.percentile(diff, 95)),
            "spp": spp, "depth": depth, "photons": photons,
            "size": size, "seconds": dt,
        }
        ours = Image.fromarray((img * 255).astype(np.uint8))
        ours.save(f"{OUT}/{name}_ours.png")
        sbs = Image.new("RGB", (2 * size + 4, size))
        sbs.paste(ours, (0, 0))
        sbs.paste(Image.open(golden).convert("RGB").resize((size, size)),
                  (size + 4, 0))
        sbs.save(f"{OUT}/{name}_sbs.png")
        print(f"[{name}] {json.dumps(stats[name])}", flush=True)

    with open(stats_path, "w") as f:
        json.dump(stats, f, indent=2)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
