"""Big-scene bench: glass (76k tris) cornell-protocol timing."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import time
import numpy as np
import jax
from gi_raytracer_tpu.scene import load_scene
from gi_raytracer_tpu.render import Camera
from gi_raytracer_tpu.render.integrator import Renderer

ls = load_scene("/root/reference/scenes/glass/glass.scn")
cfg = ls.config.replace(min_samples=4, max_samples=4, max_depth=6,
                        adaptive=False, photons=0)
cam = Camera(pos=ls.camera_pos, look_at=ls.camera_look_at)
r = Renderer(ls.scene, cam, cfg, 512, 512)
img, st = r.render(return_state=True)
np.asarray(img)
t0 = time.time()
img, st = r.render(return_state=True)
np.asarray(img)
dt = time.time() - t0
rays = float(np.asarray(st["rays"]))
print(f'{{"metric": "rays_per_s_glass_512_4spp", "value": {rays/dt:.1f}, '
      f'"tris": {ls.scene.n_tris}, "seconds": {dt:.3f}, "rays": {rays}}}',
      flush=True)
from gi_raytracer_tpu.io import save_png
save_png("/tmp/glass_512.png", np.asarray(r.tonemap(img)))
print("glass bench complete", flush=True)
