"""Pallas TPU intersection kernels: ordered dense-chunk ray-triangle testing.

Why not a BVH walk on TPU?  Per-lane pointer chasing compiles to huge gather
chains (measured ~23µs/ray on v5e — HBM gathers dominate).  The TPU-native
shape of this problem is *dense tiles*: triangles are spatially sorted (BVH
leaf order) and split into chunks of 128; rays are processed in tiles of
256.  Each (ray-tile x chunk) step is pure VPU math on (256, 128) registers.

The brute-force version of that design is VPU-roofline-bound (~42 ops per
ray-triangle test; measured ~95% of v5e VPU throughput), so all further
speed comes from *not testing chunks*.  Three collective culls recover
BVH-style pruning without any per-ray control flow:

1. **near-to-far chunk ordering**: per ray tile, chunks are visited in
   order of distance from the tile's (active-ray) origin centroid — a tiny
   (n_tiles, n_chunks) argsort OUTSIDE the kernel.  Nearby geometry is
   tested first, so hits arrive early;
2. **collective t-shrink**: after each tested chunk the tile's traversal
   cap becomes  t_cap = max over active rays of min(best_t, t_lim)  — once
   every ray has a hit, the cap collapses to the farthest hit so far;
3. **distance lower-bound cull**: a chunk whose AABB is farther than t_cap
   from the tile's origin AABB (per-axis gap distance) can't improve any
   ray and is skipped; a swept-reach AABB overlap test (origins + t_cap *
   direction extents) handles the directed case.

Together these give the reference's front-to-back octree early-out
(reference include/raytracer.h:446-472, octree.cpp:285-313) its collective
TPU equivalent: closed scenes test O(hit distance) chunks per tile instead
of all of them.

The Möller–Trumbore test (reference include/entities.h:443-490) is evaluated
in its *separable triple-product form* so the per-(ray, tri) work is only
dot products against precomputed per-triangle features — no cross products,
no divides in the hot loop:

    det   = -(rd · n2)                  n2  = e1 x e2
    u_num =  (ro x rd) · e2 + rd · f_u  f_u = v0 x e2
    v_num = -(ro x rd) · e1 - rd · f_v  f_v = v0 x e1
    t_num =  ro · n2 - d0               d0  = v0 · n2

with all comparisons done homogeneously (multiplied through by sign(det))
and only an *approximate* reciprocal for the best-t ordering.  The kernel
returns the winning primitive id per ray; exact (t, u, v) are recomputed
OUTSIDE the kernel for the winner only — one MT evaluation per ray — which
is also what makes the op differentiable for free (the selection is an int;
the values are ordinary jnp math on scene.tris and the rays).

The feature SoA lives in VMEM ((17, T) layout, ~68 B/tri), good to ~150k
triangles — beyond that the caller falls back to the jnp traversal
(ops.intersect).

Stochastic alpha acceptance (reference include/raytracer.h:455,297) is done
in-kernel with a counter-based hash of (ray id, prim id, salt) — identical
semantics to the jnp path, different stream.  Ray ids are the caller's lane
ids (passed in, so wavefront compaction cannot permute the alpha stream).
Scenes where every material is opaque-or-refractive skip the hash entirely
(static specialization).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_TILE = 256     # rays per grid step (sublane axis)
TRI_CHUNK = 128    # triangles per inner step (lane axis)
VMEM_TRI_CAP = 150_000  # beyond this the caller should use the jnp path
ORDER_ROWS = 8     # SMEM block row granularity for the per-tile chunk order

_BIG = 3.0e38
_IMAX = 2147483647


def _mix32(h):
    h = h.astype(jnp.uint32)
    h ^= h >> 16
    h *= jnp.uint32(0x85EBCA6B)
    h ^= h >> 13
    h *= jnp.uint32(0xC2B2AE35)
    h ^= h >> 16
    return h


def _kernel(salt_ref, diag_ref, ro_ref, rd_ref, tlim_ref, act_ref, rid_ref,
            order_ref, feat_ref, cbox_ref, out_t_ref, prim_ref,
            *, n_chunks: int, any_hit: bool, eps: float, all_opaque: bool):
    """Grid: (n_ray_tiles,).  Refs:
    salt_ref (1,1) i32 SMEM; diag_ref (1,1) f32 SMEM (scene diameter bound)
    ro/rd (RT,3) VMEM; tlim (RT,1); act (RT,1) f32 (1=active)
    rid (RT,1) i32 lane-invariant ray ids (alpha hash keys)
    order_ref (ORDER_ROWS, ncp) i32 SMEM: per-tile near-to-far chunk order
    feat_ref (17, T_pad): rows n2(3) e1(3) e2(3) f_u(3) f_v(3) d0 accept
    cbox_ref (8, n_chunks_pad) SMEM: rows minx..maxz (2 pad)
    out_t_ref (RT, 1) f32 approx hit t; prim_ref (RT, 1) i32
    """
    RT = RAY_TILE
    CK = TRI_CHUNK

    ox = ro_ref[:, 0:1]
    oy = ro_ref[:, 1:2]
    oz = ro_ref[:, 2:3]
    dx = rd_ref[:, 0:1]
    dy = rd_ref[:, 1:2]
    dz = rd_ref[:, 2:3]
    act = act_ref[:, 0:1] > 0.5
    t_lim = tlim_ref[:, 0:1]
    big = jnp.float32(_BIG)
    t_eff = jnp.where(act, t_lim, -big)  # folds the act mask

    # ro x rd, shared by u_num / v_num across every chunk
    cxx = oy * dz - oz * dy
    cxy = oz * dx - ox * dz
    cxz = ox * dy - oy * dx

    # tile extents over ACTIVE rays only (dead tiles collapse to nothing)
    diag = diag_ref[0, 0]
    o_min = [jnp.min(jnp.where(act, o, big)) for o in (ox, oy, oz)]
    o_max = [jnp.max(jnp.where(act, o, -big)) for o in (ox, oy, oz)]
    d_min = [jnp.min(jnp.where(act, d, 0.0)) for d in (dx, dy, dz)]
    d_max = [jnp.max(jnp.where(act, d, 0.0)) for d in (dx, dy, dz)]

    t_cap0 = jnp.minimum(jnp.max(jnp.where(act, jnp.minimum(t_lim, diag),
                                           -big)), diag)
    t_cap0 = jnp.maximum(t_cap0, 0.0)

    row = pl.program_id(0) % ORDER_ROWS
    rid = jnp.broadcast_to(rid_ref[:, 0:1], (RT, CK)).astype(jnp.uint32)
    salt = salt_ref[0, 0].astype(jnp.uint32)
    eps_h = jnp.float32(eps)

    def chunk_body(ci, carry):
        # carry: per-LANE best (RT, CK) — lane k tracks the best hit among
        # triangles with in-chunk index k; ONE cross-lane reduction happens
        # after the loop instead of two per chunk.
        best_t, best_c, t_cap = carry
        c = order_ref[row, ci]
        cxlo = cbox_ref[0, c]
        cylo = cbox_ref[1, c]
        czlo = cbox_ref[2, c]
        cxhi = cbox_ref[3, c]
        cyhi = cbox_ref[4, c]
        czhi = cbox_ref[5, c]
        # (3) distance lower bound: tile origin box -> chunk box
        gx = jnp.maximum(jnp.maximum(cxlo - o_max[0], o_min[0] - cxhi), 0.0)
        gy = jnp.maximum(jnp.maximum(cylo - o_max[1], o_min[1] - cyhi), 0.0)
        gz = jnp.maximum(jnp.maximum(czlo - o_max[2], o_min[2] - czhi), 0.0)
        lb2 = gx * gx + gy * gy + gz * gz
        # swept reach of this ray tile under the current t_cap
        overlap = lb2 <= t_cap * t_cap
        for i, (clo, chi) in enumerate(((cxlo, cxhi), (cylo, cyhi),
                                        (czlo, czhi))):
            rlo = o_min[i] + t_cap * jnp.minimum(d_min[i], 0.0)
            rhi = o_max[i] + t_cap * jnp.maximum(d_max[i], 0.0)
            overlap = overlap & (clo <= rhi) & (chi >= rlo)
        if any_hit:
            # stop testing once every active lane is resolved
            unresolved = jnp.any(act & jnp.all(best_c < 0, axis=1,
                                               keepdims=True))
            overlap = overlap & unresolved

        def tested(carry):
            best_t, best_c, t_cap = carry
            sl = pl.ds(c * CK, CK)
            n2x = feat_ref[0, sl].reshape(1, CK)
            n2y = feat_ref[1, sl].reshape(1, CK)
            n2z = feat_ref[2, sl].reshape(1, CK)
            e1x = feat_ref[3, sl].reshape(1, CK)
            e1y = feat_ref[4, sl].reshape(1, CK)
            e1z = feat_ref[5, sl].reshape(1, CK)
            e2x = feat_ref[6, sl].reshape(1, CK)
            e2y = feat_ref[7, sl].reshape(1, CK)
            e2z = feat_ref[8, sl].reshape(1, CK)
            fux = feat_ref[9, sl].reshape(1, CK)
            fuy = feat_ref[10, sl].reshape(1, CK)
            fuz = feat_ref[11, sl].reshape(1, CK)
            fvx = feat_ref[12, sl].reshape(1, CK)
            fvy = feat_ref[13, sl].reshape(1, CK)
            fvz = feat_ref[14, sl].reshape(1, CK)
            d0 = feat_ref[15, sl].reshape(1, CK)

            m = dx * n2x + dy * n2y + dz * n2z          # rd·n2 = -det
            sm = jnp.where(m >= 0.0, 1.0, -1.0)
            ds = m * sm                                  # |det|
            ns = -sm                                     # sign(det)
            u_num = ((cxx * e2x + cxy * e2y + cxz * e2z)
                     + (dx * fux + dy * fuy + dz * fuz))
            v_sum = ((cxx * e1x + cxy * e1y + cxz * e1z)
                     + (dx * fvx + dy * fvy + dz * fvz))  # = -v_num
            t_num = (ox * n2x + oy * n2y + oz * n2z) - d0
            us = u_num * ns
            vs = v_sum * sm
            ts = t_num * ns
            ok = ((ds >= eps_h) & (us >= 0.0) & (vs >= 0.0)
                  & (us + vs <= ds) & (ts > 0.0))
            tc = ts * pl.reciprocal(jnp.maximum(ds, 1e-30), approx=True)
            ok &= (tc < t_eff) & (tc < best_t)  # t_eff = -inf on dead lanes

            if not all_opaque:
                # stochastic alpha (raytracer.h:455): hash(ray, prim, salt)
                accept = feat_ref[16, sl].reshape(1, CK)
                prim_g = (jnp.uint32(c * CK)
                          + jax.lax.broadcasted_iota(jnp.uint32, (RT, CK), 1))
                h = _mix32(rid * jnp.uint32(0x9E3779B9)
                           ^ _mix32(prim_g + jnp.uint32(0x7F4A7C15) ^ salt))
                # Mosaic lacks uint32->f32; use the top 24 bits via int32
                uni = ((h >> 8).astype(jnp.int32).astype(jnp.float32)
                       * jnp.float32(5.960464477539063e-08))
                ok &= (uni < accept) | (accept >= 1.0)

            tt = jnp.where(ok, tc, big)
            better = tt < best_t
            best_t = jnp.where(better, tt, best_t)
            best_c = jnp.where(better, jnp.int32(c), best_c)
            # (2) collective t-shrink
            per_ray = jnp.min(best_t, axis=1, keepdims=True)
            cap = jnp.max(jnp.where(act, jnp.minimum(per_ray, t_lim), -big))
            t_cap = jnp.maximum(jnp.minimum(t_cap, cap), 0.0)
            return best_t, best_c, t_cap

        return jax.lax.cond(overlap, tested, lambda cr: cr,
                            (best_t, best_c, t_cap))

    init = (jnp.full((RT, CK), big, jnp.float32),
            jnp.full((RT, CK), -1, jnp.int32), t_cap0)
    best_t, best_c, _ = jax.lax.fori_loop(0, n_chunks, chunk_body, init)

    # single cross-lane reduction: global best t + owning lane -> prim id
    tmin = jnp.min(best_t, axis=1, keepdims=True)                # (RT,1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (RT, CK), 1)
    pid = jnp.where((best_t <= tmin) & (best_c >= 0),
                    best_c * jnp.int32(CK) + lane, jnp.int32(_IMAX))
    pmin = jnp.min(pid, axis=1, keepdims=True)
    out_t_ref[:, 0:1] = tmin
    prim_ref[:, 0:1] = jnp.where(pmin == jnp.int32(_IMAX),
                                 jnp.int32(-1), pmin)


@functools.partial(jax.jit, static_argnames=("any_hit", "eps", "all_opaque",
                                              "interpret"))
def _dense_trace(feat, cbox, ccent, ro, rd, t_lim, active, rid, salt, diag,
                 any_hit=False, eps=1e-5, all_opaque=False, interpret=False):
    """feat (17, T_pad), cbox (8, n_chunks_pad), ccent (n_chunks, 3) host
    chunk centroids, rays (R,3) padded to RAY_TILE multiple.
    Returns (t_approx (R,), prim (R,))."""
    R = ro.shape[0]
    n_tiles = R // RAY_TILE
    n_chunks = feat.shape[1] // TRI_CHUNK
    ncp = -(-n_chunks // 128) * 128

    # (1) near-to-far chunk order per tile, from active-ray origin centroids
    w = active.reshape(n_tiles, RAY_TILE, 1)
    cw = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    cent = jnp.sum(ro.reshape(n_tiles, RAY_TILE, 3) * w, axis=1) / cw
    d2 = jnp.sum((cent[:, None, :] - ccent[None]) ** 2, -1)  # (nT, nC)
    order = jnp.argsort(d2, axis=1).astype(jnp.int32)
    order = jnp.pad(order, ((0, (-n_tiles) % ORDER_ROWS), (0, ncp - n_chunks)))

    kernel = functools.partial(_kernel, n_chunks=n_chunks,
                               any_hit=any_hit, eps=eps,
                               all_opaque=all_opaque)
    out_t, prim = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((RAY_TILE, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_TILE, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            # per-tile chunk order: scalar reads need SMEM; SMEM block rows
            # must be 8-aligned, so tiles share 8-row blocks (row = tile % 8)
            pl.BlockSpec((ORDER_ROWS, ncp), lambda i: (i // ORDER_ROWS, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(feat.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            # chunk bboxes are read as scalars with a dynamic chunk index —
            # that requires SMEM (VMEM vector loads need static lane offsets)
            pl.BlockSpec(cbox.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
            jax.ShapeDtypeStruct((R, 1), jnp.int32),
        ],
        interpret=interpret,
    )(salt, diag, ro, rd, t_lim, active, rid, order, feat, cbox)
    return out_t[:, 0], prim[:, 0]


def build_tri_features(scene):
    """(17, T_pad) separable-MT feature SoA + (8, n_chunks_pad) chunk bboxes
    + (n_chunks, 3) chunk centroids from the (BVH-leaf-ordered) scene
    triangle arrays.  jnp; cheap; jit-safe; differentiable into scene.tris
    (only used for the winner's exact recompute — the kernel consumes it as
    data)."""
    tr = scene.tris
    T = tr.v0.shape[0]
    pad = (-T) % TRI_CHUNK
    f32 = jnp.float32

    accept = jnp.where(scene.materials.ior[tr.mat_id] != 1.0, 1.0,
                       scene.materials.opacity[tr.mat_id])

    v0, e1, e2 = tr.v0, tr.e1, tr.e2
    n2 = jnp.cross(e1, e2)
    f_u = jnp.cross(v0, e2)
    f_v = jnp.cross(v0, e1)
    d0 = jnp.sum(v0 * n2, -1)

    def row(x):
        return jnp.pad(x.astype(f32), (0, pad))

    feat = jnp.stack([
        row(n2[:, 0]), row(n2[:, 1]), row(n2[:, 2]),
        row(e1[:, 0]), row(e1[:, 1]), row(e1[:, 2]),
        row(e2[:, 0]), row(e2[:, 1]), row(e2[:, 2]),
        row(f_u[:, 0]), row(f_u[:, 1]), row(f_u[:, 2]),
        row(f_v[:, 0]), row(f_v[:, 1]), row(f_v[:, 2]),
        row(d0),
        jnp.pad(accept.astype(f32), (0, pad), constant_values=-1.0),
    ])

    # chunk bounds over all 3 triangle vertices
    Tp = T + pad
    nC = Tp // TRI_CHUNK
    v1 = v0 + e1
    v2 = v0 + e2
    big = jnp.float32(_BIG)

    def minmax(c, lo_pad, hi_pad):
        lo = jnp.pad(c.astype(f32), (0, pad), constant_values=lo_pad)
        hi = jnp.pad(c.astype(f32), (0, pad), constant_values=hi_pad)
        return (jnp.min(lo.reshape(nC, TRI_CHUNK), axis=1),
                jnp.max(hi.reshape(nC, TRI_CHUNK), axis=1))

    rows = []
    for axis in range(3):
        comp = jnp.min(jnp.stack([v0[:, axis], v1[:, axis], v2[:, axis]]), 0)
        lo, _ = minmax(comp, big, -big)
        rows.append(lo)
    for axis in range(3):
        comp = jnp.max(jnp.stack([v0[:, axis], v1[:, axis], v2[:, axis]]), 0)
        _, hi = minmax(comp, big, -big)
        rows.append(hi)
    rows.append(jnp.zeros(nC, f32))
    rows.append(jnp.zeros(nC, f32))
    cbox = jnp.stack(rows)  # (8, nC)
    ccent = 0.5 * (cbox[:3] + cbox[3:6]).T  # (nC, 3)
    return feat, cbox, ccent


def _exact_hit(scene, ro, rd, prim, eps):
    """Recompute exact (t, u, v) for the kernel-selected triangle — one MT
    evaluation per ray, ordinary differentiable jnp (selection detached)."""
    from .intersect import ray_triangle

    tr = scene.tris
    ok = prim >= 0
    p = jnp.clip(prim, 0, max(tr.v0.shape[0] - 1, 0))
    t, u, v, valid = ray_triangle(ro, rd, tr.v0[p], tr.e1[p], tr.e2[p], eps)
    m = ok & valid
    # fall back to never-hit for the (rare) lanes where the approximate
    # kernel accept disagrees with the exact test
    return (jnp.where(m, t, jnp.inf), jnp.where(m, u, 0.0),
            jnp.where(m, v, 0.0), jnp.where(m, prim, -1))


def pallas_closest_hit(scene, ro, rd, t_max=None, salt=0, eps=1e-5,
                       active=None, ray_id=None, any_hit=False,
                       interpret=False, differentiable=True):
    """Drop-in closest-hit/any-hit over the Pallas dense kernel.
    Returns the same Hit tuple as ops.intersect.closest_hit (triangles
    only — the caller layers the dense sphere/cone passes on top).
    hit.t/u/v carry gradients to scene.tris and rays because the exact
    values are recomputed outside the kernel from the winning prim.
    ``ray_id``: lane-invariant ids for the alpha hash (defaults to the
    dispatch slot; compaction callers must pass the original lane ids)."""
    from .intersect import Hit

    del differentiable  # always differentiable now (exact recompute path)
    R = ro.shape[0]
    dt = jnp.float32
    pad = (-R) % RAY_TILE
    rop = jnp.pad(ro.astype(dt), ((0, pad), (0, 0)))
    rdp = jnp.pad(rd.astype(dt), ((0, pad), (0, 0)))
    if t_max is None:
        tl = jnp.full((R + pad, 1), _BIG, dt)
    else:
        tl = jnp.pad(jnp.broadcast_to(t_max, (R,)).astype(dt)[:, None],
                     ((0, pad), (0, 0)))
    if active is None:
        ac = jnp.pad(jnp.ones((R, 1), dt), ((0, pad), (0, 0)))
    else:
        ac = jnp.pad(active.astype(dt)[:, None], ((0, pad), (0, 0)))
    if ray_id is None:
        ray_id = jnp.arange(R, dtype=jnp.int32)
    ridp = jnp.pad(ray_id.astype(jnp.int32)[:, None], ((0, pad), (0, 0)))

    feat, cbox, ccent = build_tri_features(scene)
    feat = jax.lax.stop_gradient(feat)
    cbox = jax.lax.stop_gradient(cbox)
    ccent = jax.lax.stop_gradient(ccent)
    diag = jnp.linalg.norm(jax.lax.stop_gradient(
        (scene.world_max - scene.world_min).astype(dt))) * 1.001
    salt_arr = jnp.asarray(salt, jnp.int32).reshape(1, 1)
    diag_arr = diag.reshape(1, 1)

    tk, prim = _dense_trace(feat, cbox, ccent, rop, rdp, tl, ac, ridp,
                            salt_arr, diag_arr,
                            any_hit=any_hit, eps=eps,
                            all_opaque=scene.all_opaque,
                            interpret=interpret)
    prim = jax.lax.stop_gradient(prim[:R])
    if any_hit:
        # occlusion only needs the accept decision; skip the exact pass
        t = jnp.where(prim >= 0, tk[:R].astype(ro.dtype), jnp.inf)
        z = jnp.zeros((R,), ro.dtype)
        return Hit(jax.lax.stop_gradient(t), prim, z, z)
    t, u, v, prim = _exact_hit(scene, ro, rd, prim, eps)
    return Hit(t.astype(ro.dtype), prim,
               u.astype(ro.dtype), v.astype(ro.dtype))
