"""Photon-mapped caustics: emission wavefront, hash-grid map, kNN estimate.

The reference emits photons serially per slot with up to 500 retries
(reference include/raytracer.h:582-715), stores them in a second octree
(photonMap.cpp) and estimates caustic radiance as the classic Jensen density
estimate over the k=32 nearest photons of the containing leaf
(raytracer.h:532-579).  TPU-first redesign:

* emission is a wavefront: all slots emit at once; a slot's retries become
  masked re-emission *waves* (raytracer.h:602's retry loop, vectorized);
  the specular-continuation bounce chain is a `lax.scan` of length
  photon_depth with closest-hit traversal per step;
* the map is a uniform hash grid: photons sorted by cell id, cell ranges by
  `searchsorted`; replaces the photon octree (photonMap.cpp:137-192);
* the kNN gather reads a fixed 3x3x3 cell window (bounded candidates per
  cell), masks, and `top_k`s by squared distance — a strict superset of the
  reference's single-leaf gather, validated against the *estimate*;
* the estimate  sum(col_i * dot(dir_i, d)) / (pi * r_k^2)  (raytracer.h:
  558-576) is differentiable: gradients flow through photon colors and
  positions back to light and material parameters.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..config import RenderConfig
from ..ops.intersect import trace_closest
from ..sampling.halton import HaltonSampler
from ..sampling.rng import Purpose, stream
from ..scene.types import Scene
from .geom import normalize, random_unit_vec, sphere_cap_cos, PI
from .shading import hit_attributes_uv, material_lookup, secondary_ray


@struct.dataclass
class PhotonMap:
    pos: jnp.ndarray         # (P,3) cell-sorted
    dir: jnp.ndarray         # (P,3)
    col: jnp.ndarray         # (P,3)
    valid: jnp.ndarray       # (P,)
    cell_start: jnp.ndarray  # (C+1,) int32 prefix ranges into sorted arrays
    grid_min: jnp.ndarray    # (3,)
    inv_cell: jnp.ndarray    # (3,) 1/cell_size
    dims: tuple = struct.field(pytree_node=False, default=(1, 1, 1))
    window_cap: int = struct.field(pytree_node=False, default=8)

    @property
    def capacity(self) -> int:
        return self.pos.shape[0]


class PhotonBatch(NamedTuple):
    pos: jnp.ndarray
    dir: jnp.ndarray
    col: jnp.ndarray
    stored: jnp.ndarray


def _emit_attempts(scene: Scene, cfg: RenderConfig, sampler: HaltonSampler,
                   li: int, h_idx: jnp.ndarray, key) -> PhotonBatch:
    """Emission attempts for light ``li`` — one lane per (slot, retry).

    The reference's serial per-slot retry loop (raytracer.h:602) is
    flattened into the batch axis: every retry is an independent lane; the
    caller picks each slot's first successful attempt.  Emission point/cone
    per light.h:47-53 + raytracer.h:604-618; the specular-continuation chain
    per raytracer.h:633-695.
    """
    R = h_idx.shape[0]
    dt = scene.lights.pos.dtype
    lpos = scene.lights.pos[li]
    lcol = scene.lights.col[li]
    lrad = scene.lights.rad[li]
    ldir = scene.lights.dir[li]
    langle = scene.lights.angle[li]

    sx = sampler.sample(0, h_idx).astype(dt)
    sy = sampler.sample(1, h_idx).astype(dt)

    # surface point within the caustic cone (light.h:47-53)
    cap = sphere_cap_cos(jnp.broadcast_to(ldir, (R, 3)), sx, sy, 1.0, langle)
    sphere_pt = random_unit_vec(sx, sy)
    surf = jnp.where(langle < 1.0, cap, sphere_pt)
    pos = lpos[None, :] + lrad * surf

    ku = stream(key, int(Purpose.PHOTON_EMIT_X), li)
    u = jax.random.uniform(ku, (2, R), dt)
    emit_dir = sphere_cap_cos(normalize(pos - lpos[None, :]), u[0], u[1],
                              2.0, langle)

    col0 = (0.5 * langle / cfg.photons) * lcol
    col = jnp.broadcast_to(col0, (R, 3)).astype(dt)

    # --- specular continuation chain ---------------------------------------
    ro, rd = pos, emit_dir
    salt0 = jnp.uint32((li + 1) * 40503)

    hit = trace_closest(scene, ro, rd, salt=salt0, eps=cfg.epsilon,
                        backend=cfg.intersect_backend)
    attrs = hit_attributes_uv(scene, ro, rd, hit.t, hit.prim, hit.u, hit.v)
    _, _, _, rough, _ = material_lookup(scene, attrs.mat_id, attrs.uv)
    alive = attrs.valid & (rough < 0.1)   # only specular-first paths matter

    class Chain(NamedTuple):
        ro: jnp.ndarray
        rd: jnp.ndarray
        col: jnp.ndarray
        alive: jnp.ndarray
        stored: jnp.ndarray
        p_pos: jnp.ndarray
        p_dir: jnp.ndarray
        p_col: jnp.ndarray

    st = Chain(ro, rd, col, alive,
               jnp.zeros(R, bool), jnp.zeros((R, 3), dt),
               jnp.zeros((R, 3), dt), jnp.zeros((R, 3), dt))

    def body(s: Chain, depth):
        salt = salt0 + (depth.astype(jnp.uint32) + 1) * jnp.uint32(7919)
        kb = jax.random.fold_in(stream(key, int(Purpose.PHOTON_ALPHA), li),
                                depth)
        uni = jax.random.uniform(kb, (4, R), dt)

        # photon chains die fast (specular-only continuation): compaction
        # always pays here
        hit = trace_closest(scene, s.ro, s.rd, salt=salt, eps=cfg.epsilon,
                            active=s.alive, backend=cfg.intersect_backend,
                            compact=True)
        attrs = hit_attributes_uv(scene, s.ro, s.rd, hit.t, hit.prim,
                                  hit.u, hit.v)
        color, _, alpha, rough, ior = material_lookup(scene, attrs.mat_id,
                                                      attrs.uv)
        sec = secondary_ray(s.rd, attrs.normal, color, alpha, rough, ior,
                            uni[0], uni[1], uni[2], uni[3],
                            jnp.ones((R, 3), dt))
        live = s.alive & attrs.valid
        new_col = jnp.where(live[:, None], s.col * sec.f, s.col)
        new_ro = attrs.point + (sec.offset_sign * cfg.shadow_bias)[:, None] \
            * sec.normal
        new_rd = sec.dir

        # first diffuse hit after the specular chain stores the photon
        # (raytracer.h:685-692): position = hit, direction = the bounced
        # diffuse-sampled dir, color including the diffuse surface's f.
        store_now = live & (rough >= 0.1) & ~s.stored
        keep_going = live & (rough < 0.1)

        return Chain(
            jnp.where(live[:, None], new_ro, s.ro),
            jnp.where(live[:, None], new_rd, s.rd),
            new_col,
            keep_going,
            s.stored | store_now,
            jnp.where(store_now[:, None], attrs.point, s.p_pos),
            jnp.where(store_now[:, None], new_rd, s.p_dir),
            jnp.where(store_now[:, None], new_col, s.p_col),
        ), None

    st, _ = jax.lax.scan(body, st, jnp.arange(cfg.photon_depth))
    return PhotonBatch(st.p_pos, st.p_dir, st.p_col, st.stored)


def trace_photons(scene: Scene, cfg: RenderConfig,
                  sampler: HaltonSampler | None = None,
                  key=None, count: int | None = None) -> PhotonBatch:
    """Emit ``count`` photon slots per light with masked retry waves.
    Returns fixed-size per-slot arrays (stored = success mask).

    The whole retry x depth emission program is traced into ONE jitted
    computation (the reference's per-slot retry loop, raytracer.h:602,
    becomes `photon_retries` statically-unrolled masked waves).
    """
    sampler = sampler or HaltonSampler()
    key = key if key is not None else jax.random.PRNGKey(cfg.seed)
    count = count or cfg.photons
    L = scene.lights.count
    dt = scene.lights.pos.dtype
    if L == 0:
        return PhotonBatch(jnp.zeros((1, 3), dt), jnp.zeros((1, 3), dt),
                           jnp.zeros((1, 3), dt), jnp.zeros(1, bool))

    retries = max(cfg.photon_retries, 1)
    # chunk over slots; each chunk is (slots_per_chunk * retries) lanes
    slots_per_chunk = max(cfg.ray_chunk // retries, 1)

    @functools.partial(jax.jit, static_argnames=("li", "n_slots"))
    def run_chunk(scene, key, start, li, n_slots):
        """Attempts for slots [start, start+n_slots) of light li, with the
        first successful retry selected per slot."""
        slot = start + jnp.arange(n_slots, dtype=jnp.uint32)
        # lane layout (slots, retries): h_idx = slot * retries + t, matching
        # the reference's i*500+tries indexing scheme (raytracer.h:604)
        h_idx = (slot[:, None] * jnp.uint32(retries)
                 + jnp.arange(retries, dtype=jnp.uint32)[None, :]).ravel()
        wave = _emit_attempts(scene, cfg, sampler, li, h_idx, key)
        stored = wave.stored.reshape(n_slots, retries)
        first = jnp.argmax(stored, axis=1)            # first success per slot
        rows = jnp.arange(n_slots)
        sel = rows * retries + first
        return PhotonBatch(
            wave.pos[sel], wave.dir[sel], wave.col[sel],
            stored[rows, first])

    parts = []
    for li in range(L):
        pos_l, dir_l, col_l, st_l = [], [], [], []
        for start in range(0, count, slots_per_chunk):
            n = min(slots_per_chunk, count - start)
            kc = jax.random.fold_in(key, start // slots_per_chunk)
            b = run_chunk(scene, kc, jnp.uint32(start), li, n)
            pos_l.append(b.pos); dir_l.append(b.dir)
            col_l.append(b.col); st_l.append(b.stored)
        parts.append(PhotonBatch(jnp.concatenate(pos_l),
                                 jnp.concatenate(dir_l),
                                 jnp.concatenate(col_l),
                                 jnp.concatenate(st_l)))
    return PhotonBatch(
        jnp.concatenate([p.pos for p in parts]),
        jnp.concatenate([p.dir for p in parts]),
        jnp.concatenate([p.col for p in parts]),
        jnp.concatenate([p.stored for p in parts]))


def build_photon_map(batch: PhotonBatch, world_min, world_max,
                     target_per_cell: float = 8.0,
                     max_dim: int = 128, window_cap: int = 8) -> PhotonMap:
    """Sort photons into a uniform grid (replaces photonMap.cpp:137-192).

    world_min/world_max: host-side floats (grid geometry must be static).
    """
    wmin = np.asarray(world_min, np.float64)
    wmax = np.asarray(world_max, np.float64)
    extent = np.maximum(wmax - wmin, 1e-6)
    P = batch.pos.shape[0]
    n_stored = max(int(jnp.sum(batch.stored)), 1)
    # ~target_per_cell photons per occupied cell, assuming they cluster in
    # a small part of the volume; cube-root heuristic over stored count
    n_cells_target = max(n_stored / target_per_cell, 1.0)
    per_axis = int(np.clip(np.ceil(n_cells_target ** (1 / 3)), 1, max_dim))
    dims = (per_axis, per_axis, per_axis)
    cell = extent / np.asarray(dims)
    inv_cell = 1.0 / cell

    dt = batch.pos.dtype
    C = dims[0] * dims[1] * dims[2]

    gi = ((batch.pos - jnp.asarray(wmin, dt)) * jnp.asarray(inv_cell, dt))
    gi = jnp.clip(gi.astype(jnp.int32), 0,
                  jnp.asarray(np.asarray(dims) - 1, jnp.int32))
    cell_id = (gi[:, 0] * dims[1] + gi[:, 1]) * dims[2] + gi[:, 2]
    cell_id = jnp.where(batch.stored, cell_id, C)  # invalid -> overflow cell

    order = jnp.argsort(cell_id)
    sorted_id = cell_id[order]
    cell_start = jnp.searchsorted(sorted_id,
                                  jnp.arange(C + 1, dtype=jnp.int32),
                                  side="left").astype(jnp.int32)

    return PhotonMap(pos=batch.pos[order], dir=batch.dir[order],
                     col=batch.col[order], valid=batch.stored[order],
                     cell_start=cell_start,
                     grid_min=jnp.asarray(wmin, dt),
                     inv_cell=jnp.asarray(inv_cell, dt),
                     dims=dims, window_cap=window_cap)


def sample_photons(pm: PhotonMap, point: jnp.ndarray, direction: jnp.ndarray,
                   k: int) -> jnp.ndarray:
    """Jensen caustic estimate at shading points (raytracer.h:532-579).

    Gathers candidates from the 3x3x3 cell window around each point (up to
    ``window_cap`` per cell), takes the k nearest, and returns
    sum(col_i * dot(dir_i, direction)) / (pi * r_k^2).
    """
    R = point.shape[0]
    dt = point.dtype
    nx, ny, nz = pm.dims
    cap = pm.window_cap

    g = (point - pm.grid_min[None, :]) * pm.inv_cell[None, :]
    gi = jnp.clip(g.astype(jnp.int32), 0,
                  jnp.asarray([nx - 1, ny - 1, nz - 1], jnp.int32))

    cand_idx = []
    cand_ok = []
    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            for oz in (-1, 0, 1):
                cx = jnp.clip(gi[:, 0] + ox, 0, nx - 1)
                cy = jnp.clip(gi[:, 1] + oy, 0, ny - 1)
                cz = jnp.clip(gi[:, 2] + oz, 0, nz - 1)
                # skip duplicate cells at the clamp boundary
                dup = ((cx != gi[:, 0] + ox) | (cy != gi[:, 1] + oy)
                       | (cz != gi[:, 2] + oz))
                cid = (cx * ny + cy) * nz + cz
                start = pm.cell_start[cid]
                end = pm.cell_start[cid + 1]
                sl = start[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
                ok = (sl < end[:, None]) & ~dup[:, None]
                cand_idx.append(jnp.clip(sl, 0, pm.capacity - 1))
                cand_ok.append(ok)
    idx = jnp.concatenate(cand_idx, axis=1)     # (R, 27*cap)
    ok = jnp.concatenate(cand_ok, axis=1)

    ppos = pm.pos[idx]                           # (R, W, 3)
    d2 = jnp.sum((ppos - point[:, None, :]) ** 2, -1)
    d2 = jnp.where(ok & pm.valid[idx], d2, jnp.inf)

    k = min(k, d2.shape[1])
    neg_top, top_i = jax.lax.top_k(-d2, k)       # ascending distance
    top_d2 = -neg_top
    found = jnp.isfinite(top_d2)
    n_found = jnp.sum(found, axis=1)

    rows = jnp.arange(R)[:, None]
    sel = idx[rows, top_i]
    pcol = pm.col[sel]
    pdir = pm.dir[sel]
    w = jnp.sum(pdir * direction[:, None, :], -1)
    contrib = jnp.where(found[:, :, None], pcol * w[:, :, None], 0.0)
    total = jnp.sum(contrib, axis=1)

    # r_k^2 = squared distance of the count-th photon (raytracer.h:574)
    kth = jnp.clip(n_found - 1, 0, k - 1)
    max_d2 = top_d2[jnp.arange(R), kth]
    has = n_found > 0
    denom = jnp.where(has, PI * jnp.maximum(max_d2, 1e-20), 1.0)
    return jnp.where(has[:, None], total / denom[:, None],
                     jnp.zeros((R, 3), dt))
