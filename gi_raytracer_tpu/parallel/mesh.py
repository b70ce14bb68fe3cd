"""Device-mesh distribution of the renderer.

The reference's only parallelism is OpenMP over image rows with a critical
section around the framebuffer (reference include/raytracer.h:93,154).  The
TPU-native equivalent is SPMD over a 1-D device mesh:

* rays / pixels / photons are sharded on their batch axis ('shard');
* the scene (triangles, BVH, materials, textures, photon map) is replicated
  in HBM on every chip — tens of MB for the bundled scenes;
* gradients of replicated scene parameters are all-reduced by XLA
  automatically (pjit semantics) — collectives ride ICI, overlapping with
  the backward wavefront;
* multi-host runs extend the same mesh via `jax.distributed.initialize`.

Nothing here hand-schedules collectives: shardings are annotated via
`NamedSharding` and XLA's SPMD partitioner inserts psum/all-gather — the
"pick a mesh, annotate, let XLA do the rest" recipe.
"""

from __future__ import annotations

import functools
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("shard",))


def shard_batch(mesh: Mesh, tree: Any) -> Any:
    """Place a pytree of (R, ...) arrays sharded on axis 0."""
    def put(x):
        spec = P("shard", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree (the scene) on every device of the mesh."""
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P()))
    return jax.tree_util.tree_map(put, tree)


def render_wave_sharded(mesh: Mesh, scene, cfg, ro, rd, sx_all, sy_all,
                        key, wave_salt, photon_map=None):
    """radiance_wave with rays sharded over the mesh, scene replicated.

    sx_all/sy_all are (D, R): sharded on the ray axis (axis 1).
    """
    from ..render.integrator import radiance_wave

    ro = jax.device_put(ro, NamedSharding(mesh, P("shard", None)))
    rd = jax.device_put(rd, NamedSharding(mesh, P("shard", None)))
    sx_all = jax.device_put(sx_all, NamedSharding(mesh, P(None, "shard")))
    sy_all = jax.device_put(sy_all, NamedSharding(mesh, P(None, "shard")))
    scene = replicate(mesh, scene)
    if photon_map is not None:
        photon_map = replicate(mesh, photon_map)

    fn = jax.jit(
        functools.partial(radiance_wave, cfg=cfg),
        static_argnames=(),
        out_shardings=NamedSharding(mesh, P("shard", None)))
    return fn(scene, ro=ro, rd=rd, sx_all=sx_all, sy_all=sy_all, key=key,
              wave_salt=wave_salt, photon_map=photon_map)


def train_step_sharded(mesh: Mesh, params, static_scene_fn, cfg,
                       ro, rd, sx_all, sy_all, key, target, lr=0.05,
                       photon_map=None):
    """One inverse-rendering SGD step, data-parallel over rays.

    ``params`` is a pytree of differentiable scene leaves (replicated);
    ``static_scene_fn(params) -> Scene`` rebuilds the scene around them.
    The L2 loss against ``target`` radiance is averaged over all (sharded)
    rays; XLA all-reduces the replicated-parameter gradients over ICI.
    Returns (loss, new_params).
    """
    from ..render.integrator import radiance_wave

    ro = jax.device_put(ro, NamedSharding(mesh, P("shard", None)))
    rd = jax.device_put(rd, NamedSharding(mesh, P("shard", None)))
    sx_all = jax.device_put(sx_all, NamedSharding(mesh, P(None, "shard")))
    sy_all = jax.device_put(sy_all, NamedSharding(mesh, P(None, "shard")))
    target = jax.device_put(target, NamedSharding(mesh, P("shard", None)))
    params = replicate(mesh, params)

    @jax.jit
    def step(params, ro, rd, sx_all, sy_all, target):
        def loss_fn(p):
            scene = static_scene_fn(p)
            c = radiance_wave(scene, cfg, ro, rd, sx_all, sy_all, key, 0,
                              photon_map)
            return jnp.mean((c - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        new = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
        return loss, new

    return step(params, ro, rd, sx_all, sy_all, target)
