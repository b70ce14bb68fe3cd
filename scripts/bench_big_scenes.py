"""Synthetic big-scene bench: wavy terrain at 250k tris (dense VMEM Pallas
path), 500k and 1M tris (HBM-streaming superchunk Pallas kernel, r5 —
replaces the r4 jnp BVH fallback that ran at 6.9k rays/s)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import time
import numpy as np
import jax
from gi_raytracer_tpu.scene.build import SceneBuilder
from gi_raytracer_tpu.render import Camera
from gi_raytracer_tpu.render.integrator import Renderer
from gi_raytracer_tpu.config import RenderConfig


def terrain_scene(n):
    """(n-1)^2*2-tri wavy terrain + light."""
    b = SceneBuilder()
    white = b.add_texture_const((0.8, 0.8, 0.8))
    black = b.add_texture_const((0.0, 0.0, 0.0))
    m = b.add_material(white, black, 1.0, 1.0, 1.0)
    xs = np.linspace(-20, 20, n)
    zs = np.linspace(-20, 20, n)
    X, Z = np.meshgrid(xs, zs)
    Y = 1.5 * np.sin(X * 0.7) * np.cos(Z * 0.6)
    P = np.stack([X, Y, Z], -1)                      # (n, n, 3)
    a = P[:-1, :-1]; bb = P[:-1, 1:]; c = P[1:, :-1]; d = P[1:, 1:]
    t1 = np.stack([a, bb, c], 2).reshape(-1, 3, 3)
    t2 = np.stack([bb, d, c], 2).reshape(-1, 3, 3)
    tris = np.concatenate([t1, t2], 0)
    b._tri_v.extend(list(tris))
    z33 = np.zeros((3, 3))
    z32 = np.zeros((3, 2))
    b._tri_n.extend([z33] * len(tris))
    b._tri_uv.extend([z32] * len(tris))
    b._tri_mat.extend([m] * len(tris))
    b.add_light((0.0, 25.0, 0.0), (600.0, 600.0, 600.0), 1.0)
    return b.build(dtype=np.float32)


for n, label in ((355, "250k_stream"), (501, "500k_stream"),
                 (708, "1m_stream")):
    t0 = time.time()
    scene = terrain_scene(n)
    print(f"[{label}] built {scene.n_tris} tris ({time.time()-t0:.1f}s)",
          flush=True)
    cfg = RenderConfig(min_samples=2, max_samples=2, max_depth=3,
                       adaptive=False, photons=0)
    cam = Camera(pos=(0.0, 18.0, -30.0), look_at=(0.0, 0.0, 0.0))
    r = Renderer(scene, cam, cfg, 256, 256)
    img, st = r.render(return_state=True)
    np.asarray(img)
    t0 = time.time()
    img, st = r.render(return_state=True)
    np.asarray(img)
    dt = time.time() - t0
    rays = float(np.asarray(st["rays"]))
    print(f'{{"metric": "rays_per_s_terrain_{label}", '
          f'"value": {rays/dt:.1f}, "tris": {scene.n_tris}, '
          f'"seconds": {dt:.3f}, "rays": {rays}}}', flush=True)
print("synthetic big-scene bench complete", flush=True)
