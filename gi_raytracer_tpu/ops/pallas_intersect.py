"""Pallas TPU intersection kernel: entry-ordered dense-chunk ray-tri testing.

Why not a BVH walk on TPU?  Per-lane pointer chasing compiles to huge gather
chains (measured ~23µs/ray on v5e — HBM gathers dominate).  The TPU-native
shape of this problem is *dense tiles*: triangles are spatially sorted (BVH
leaf order) and split into chunks of 128; rays are processed in tiles of
RAY_TILE.  Each (ray-tile x chunk) step is pure VPU math on (RT, 128)
registers.

The brute-force version of that design is VPU-roofline-bound (~42 ops per
ray-triangle test), so all further speed comes from *not testing chunks*.
v2 design (replacing the v1 in-kernel distance heuristics, which spent
~25µs/grid-step on scalar reductions):

1. **per-ray slab cull, OUTSIDE the kernel**: a vectorized (R, n_chunks)
   ray-vs-chunk-AABB slab test computes, per (ray tile, chunk), the minimum
   entry distance over the tile's active rays (inf if no ray enters within
   its t limit).  This is ordinary fused XLA — microseconds — and is *sharp*:
   a tile whose frustum misses a chunk never tests it.
2. **entry-sorted chunk order**: per tile, chunks are visited in ascending
   min-entry order (a small (n_tiles, n_chunks) argsort outside the kernel).
3. **collective t-shrink + sorted early exit, INSIDE the kernel**: the chunk
   loop is a `lax.while_loop` whose condition is
   ``entry[i] <= t_cap`` where ``t_cap = max over active rays of
   min(best_t, t_lim)`` (refreshed every SHRINK_EVERY chunks).  Because the
   entries are sorted, the first chunk that can't improve any ray ends the
   loop — no per-chunk branching, no wasted scalar syncs.

Together these give the reference's front-to-back octree early-out
(reference include/raytracer.h:446-472, octree.cpp:285-313) its collective
TPU equivalent: closed scenes test O(hit distance) chunks per tile instead
of all of them, and tiles whose rays miss clustered geometry skip it
entirely.

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

The feature SoA lives in VMEM ((10, T) layout, 40 B/tri — the derived MT
features are recomputed per chunk in-kernel), good to ~300k triangles —
beyond that the caller falls back to the jnp traversal (ops.intersect).

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
VMEM_TRI_CAP = 16_384   # dense VMEM-resident kernel up to here; beyond it
                        # the HBM-streaming superchunk kernel is FASTER
                        # (measured r5: glass 76k 222k->793k rays/s,
                        # terrain 250k 141k->841k — the per-ray superchunk
                        # cull + on-demand DMA beat the dense path's
                        # conservative whole-scene chunk ordering)
# the feature SoA carries only (v0, e1, e2, accept) = 10 rows (40 B/tri);
# the separable-MT features (n2, f_u, f_v, d0) are derived per (tile,
# chunk) INSIDE the kernel from (1,128) vectors — ~40 VPU ops amortized
# over the 256-ray tile, which doubles the VMEM triangle capacity for free
ORDER_ROWS = 8     # SMEM block row granularity for the per-tile chunk order
SHRINK_EVERY = 2   # chunks between collective t-cap refreshes
# r3 profile: the (R, n_chunks) per-ray slab cull + tile reduce cost 9 ms
# per trace at 262k rays x 18 chunks — 62% of the whole trace — while the
# (n_tiles, n_chunks) conservative interval cull is ~256x less work and
# loses only entry-bound sharpness the in-kernel early-exit recovers.
PER_RAY_CULL_MAX_CHUNKS = 0  # per-ray slab cull disabled (kept for A/B)

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


def _kernel(salt_ref, ro_ref, rd_ref, tlim_ref, act_ref, rid_ref,
            order_ref, entry_ref, cap0_ref, feat_ref, out_t_ref, prim_ref,
            *, n_chunks: int, any_hit: bool, eps: float, all_opaque: bool):
    """Grid: (n_ray_tiles,).  Refs:
    salt_ref (1,1) i32 SMEM
    ro/rd (RT,3) VMEM; tlim (RT,1); act (RT,1) f32 (1=active)
    rid (RT,1) i32 lane-invariant ray ids (alpha hash keys)
    order_ref (ORDER_ROWS, ncp) i32 SMEM: per-tile entry-sorted chunk order
    entry_ref (ORDER_ROWS, ncp) f32 SMEM: sorted min entry distances
    cap0_ref (ORDER_ROWS, 1) f32 SMEM: initial per-tile t cap
    feat_ref (10, T_pad): rows v0(3) e1(3) e2(3) accept (MT features
        derived per chunk in-kernel)
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

    row = pl.program_id(0) % ORDER_ROWS
    rid = jnp.broadcast_to(rid_ref[:, 0:1], (RT, CK)).astype(jnp.uint32)
    salt = salt_ref[0, 0].astype(jnp.uint32)
    eps_h = jnp.float32(eps)
    t_cap0 = cap0_ref[row, 0]

    def tested(i, best_t, best_c, t_cap):
        c = order_ref[row, i]
        sl = pl.ds(c * CK, CK)
        v0x = feat_ref[0, sl].reshape(1, CK)
        v0y = feat_ref[1, sl].reshape(1, CK)
        v0z = feat_ref[2, sl].reshape(1, CK)
        e1x = feat_ref[3, sl].reshape(1, CK)
        e1y = feat_ref[4, sl].reshape(1, CK)
        e1z = feat_ref[5, sl].reshape(1, CK)
        e2x = feat_ref[6, sl].reshape(1, CK)
        e2y = feat_ref[7, sl].reshape(1, CK)
        e2z = feat_ref[8, sl].reshape(1, CK)
        # derive the separable-MT features per chunk (amortized over the
        # 256-ray tile): n2 = e1 x e2, f_u = v0 x e2, f_v = v0 x e1,
        # d0 = v0 . n2
        n2x = e1y * e2z - e1z * e2y
        n2y = e1z * e2x - e1x * e2z
        n2z = e1x * e2y - e1y * e2x
        fux = v0y * e2z - v0z * e2y
        fuy = v0z * e2x - v0x * e2z
        fuz = v0x * e2y - v0y * e2x
        fvx = v0y * e1z - v0z * e1y
        fvy = v0z * e1x - v0x * e1z
        fvz = v0x * e1y - v0y * e1x
        d0 = v0x * n2x + v0y * n2y + v0z * n2z

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
            accept = feat_ref[9, sl].reshape(1, CK)
            prim_g = (c.astype(jnp.uint32) * jnp.uint32(CK)
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
        return best_t, best_c, t_cap

    def shrink(best_t, t_lim_k):
        # collective t-cap: the farthest any active ray still needs to look
        per_ray = jnp.min(best_t, axis=1, keepdims=True)
        if any_hit:
            # a lane with ANY accepted hit is resolved and stops needing
            # traversal entirely
            need = act & (per_ray >= big)
            return jnp.max(jnp.where(need, t_lim_k, -big))
        return jnp.max(jnp.where(act, jnp.minimum(per_ray, t_lim_k), -big))

    def cond(carry):
        i, best_t, best_c, t_cap = carry
        # clamp: `&` does not short-circuit, so the read happens even when
        # i == n_chunks; when n_chunks is an exact multiple of 128 that slot
        # would be past the SMEM block
        i_s = jnp.minimum(i, n_chunks - 1)
        return (i < n_chunks) & (entry_ref[row, i_s] <= t_cap)

    def body(carry):
        i, best_t, best_c, t_cap = carry
        best_t, best_c, t_cap = tested(i, best_t, best_c, t_cap)
        new_cap = jax.lax.cond(
            (i % SHRINK_EVERY) == (SHRINK_EVERY - 1),
            lambda: jnp.minimum(t_cap, shrink(best_t, t_lim)),
            lambda: t_cap)
        return i + 1, best_t, best_c, new_cap

    init = (jnp.int32(0),
            jnp.full((RT, CK), big, jnp.float32),
            jnp.full((RT, CK), -1, jnp.int32),
            t_cap0)
    _, best_t, best_c, _ = jax.lax.while_loop(cond, body, init)

    # single cross-lane reduction: global best t + owning lane -> prim id
    tmin = jnp.min(best_t, axis=1, keepdims=True)                # (RT,1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (RT, CK), 1)
    pid = jnp.where((best_t <= tmin) & (best_c >= 0),
                    best_c * jnp.int32(CK) + lane, jnp.int32(_IMAX))
    pmin = jnp.min(pid, axis=1, keepdims=True)
    out_t_ref[:, 0:1] = tmin
    prim_ref[:, 0:1] = jnp.where(pmin == jnp.int32(_IMAX),
                                 jnp.int32(-1), pmin)


def _chunk_cull(cbox, ro, rd, t_eff, active, n_chunks, diag,
                per_ray_max=PER_RAY_CULL_MAX_CHUNKS):
    """Per-(tile, chunk) minimum entry distance, OUTSIDE the kernel.

    cbox (8, nCp): rows minx..maxz.  Returns (n_tiles, n_chunks) f32 with
    inf where no active ray in the tile enters the chunk AABB within its
    t limit — the TPU-collective replacement for per-ray octree descent.
    """
    n_tiles = ro.shape[0] // RAY_TILE
    lo = cbox[0:3, :n_chunks].T                      # (nC, 3)
    hi = cbox[3:6, :n_chunks].T
    big = jnp.float32(_BIG)

    if n_chunks <= per_ray_max:
        # sharp per-ray slab test, reduced per tile; accumulated one axis at
        # a time so peak HBM is O(R * nC) not O(R * nC * 3 * 2) — at 262k
        # rays x 128 chunks the 3-axis intermediates were a ~400MB spike
        # when XLA chose not to fuse the reduction
        tiny = 1e-12
        safe_d = jnp.where(jnp.abs(rd) < tiny,
                           jnp.where(rd < 0, -tiny, tiny), rd)
        inv_d = 1.0 / safe_d                          # (R, 3)
        tn = jnp.full((ro.shape[0], n_chunks), -big, jnp.float32)
        tf = jnp.full((ro.shape[0], n_chunks), big, jnp.float32)
        for ax in range(3):
            ta = (lo[None, :, ax] - ro[:, None, ax]) * inv_d[:, None, ax]
            tb = (hi[None, :, ax] - ro[:, None, ax]) * inv_d[:, None, ax]
            tn = jnp.maximum(tn, jnp.minimum(ta, tb))
            tf = jnp.minimum(tf, jnp.maximum(ta, tb))
        ent = jnp.maximum(tn, 0.0)
        ok = (tf >= ent) & (ent < t_eff[:, None]) & active[:, None]
        score = jnp.where(ok, ent, big)
        return jnp.min(score.reshape(n_tiles, RAY_TILE, n_chunks), axis=1)

    # conservative per-tile interval test (big scenes): tile origin/direction
    # AABBs swept to the tile's max t limit
    om = ro.reshape(n_tiles, RAY_TILE, 3)
    dm = rd.reshape(n_tiles, RAY_TILE, 3)
    am = active.reshape(n_tiles, RAY_TILE, 1)
    o_lo = jnp.min(jnp.where(am, om, big), axis=1)       # (nT, 3)
    o_hi = jnp.max(jnp.where(am, om, -big), axis=1)
    d_lo = jnp.min(jnp.where(am, dm, 0.0), axis=1)
    d_hi = jnp.max(jnp.where(am, dm, 0.0), axis=1)
    t_cap = jnp.max(jnp.where(active, t_eff, -big).reshape(
        n_tiles, RAY_TILE), axis=1)                      # (nT,)
    t_cap = jnp.clip(t_cap, 0.0, diag)
    # reach overlap: chunk box vs [o_lo + t*min(d,0), o_hi + t*max(d,0)]
    r_lo = o_lo + t_cap[:, None] * jnp.minimum(d_lo, 0.0)   # (nT, 3)
    r_hi = o_hi + t_cap[:, None] * jnp.maximum(d_hi, 0.0)
    overlap = jnp.all((lo[None] <= r_hi[:, None]) &
                      (hi[None] >= r_lo[:, None]), axis=-1)  # (nT, nC)
    # entry lower bound: axis gap / max speed
    gap = jnp.maximum(jnp.maximum(lo[None] - o_hi[:, None],
                                  o_lo[:, None] - hi[None]), 0.0)
    ent = jnp.sqrt(jnp.sum(gap * gap, axis=-1))           # (nT, nC) euclid lb
    return jnp.where(overlap & (ent <= t_cap[:, None]), ent, big)


@functools.partial(jax.jit, static_argnames=("any_hit", "eps", "all_opaque",
                                              "interpret"))
def _dense_trace(feat, cbox, ro, rd, t_lim, active, rid, salt, diag,
                 any_hit=False, eps=1e-5, all_opaque=False, interpret=False):
    """feat (10, T_pad), cbox (8, n_chunks_pad), rays (R,3) padded to
    RAY_TILE multiple.  Returns (t_approx (R,), prim (R,))."""
    R = ro.shape[0]
    n_tiles = R // RAY_TILE
    n_chunks = feat.shape[1] // TRI_CHUNK
    ncp = -(-n_chunks // 128) * 128
    rpad = (-n_tiles) % ORDER_ROWS

    act_b = active[:, 0] > 0.5
    t_eff = jnp.minimum(t_lim[:, 0], diag)
    score = _chunk_cull(cbox, ro, rd, t_eff, act_b, n_chunks, diag)
    order = jnp.argsort(score, axis=1).astype(jnp.int32)
    entry = jnp.take_along_axis(score, order, axis=1)
    order = jnp.pad(order, ((0, rpad), (0, ncp - n_chunks)))
    entry = jnp.pad(entry, ((0, rpad), (0, ncp - n_chunks)),
                    constant_values=_BIG)
    cap0 = jnp.max(jnp.where(act_b, jnp.clip(t_eff, 0.0, diag), -_BIG)
                   .reshape(n_tiles, RAY_TILE), axis=1, keepdims=True)
    cap0 = jnp.pad(cap0, ((0, rpad), (0, 0)), constant_values=-_BIG)

    kernel = functools.partial(_kernel, n_chunks=n_chunks,
                               any_hit=any_hit, eps=eps,
                               all_opaque=all_opaque)
    out_t, prim = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
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
            # per-tile chunk order + sorted entries: scalar reads need SMEM;
            # SMEM block rows must be 8-aligned, so tiles share 8-row blocks
            # (row = tile % 8)
            pl.BlockSpec((ORDER_ROWS, ncp), lambda i: (i // ORDER_ROWS, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((ORDER_ROWS, ncp), lambda i: (i // ORDER_ROWS, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((ORDER_ROWS, 1), lambda i: (i // ORDER_ROWS, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(feat.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
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
    )(salt, ro, rd, t_lim, active, rid, order, entry, cap0, feat)
    return out_t[:, 0], prim[:, 0]


# ---------------------------------------------------------------------------
# streaming variant: triangles live in HBM, superchunks DMA'd on demand
# ---------------------------------------------------------------------------

SC_CHUNKS = 16                      # chunks per superchunk (2048 tris)
SC_ROWS = SC_CHUNKS * 10            # feature rows per superchunk (8-aligned)
STREAM_TRI_CAP = 4_000_000          # HBM feature table cap (~160 MB)


def _stream_kernel(salt_ref, ro_ref, rd_ref, tlim_ref, act_ref, rid_ref,
                   order_ref, entry_ref, cap0_ref, feat_hbm,
                   out_t_ref, prim_ref, *, n_sc: int, any_hit: bool,
                   eps: float, all_opaque: bool):
    """Streaming counterpart of :func:`_kernel` for scenes past the VMEM
    triangle cap (reference octree.cpp:150-313 serves any scene size from
    DRAM; this is its TPU shape).  The per-tile visit loop walks
    SUPERCHUNKS (16 chunks = 2048 tris) in ascending entry order; each
    visit DMAs the superchunk's (SC_ROWS, 128) feature block HBM->VMEM
    double-buffered — the next block streams in while the current one is
    tested — and the collective t-cap ends the walk exactly like the dense
    kernel.  HBM traffic is O(visited superchunks), not O(scene).
    feat_hbm (n_sc * SC_ROWS, 128) ANY/HBM: per superchunk, 16 chunks x
    10 rows (v0 xyz, e1 xyz, e2 xyz, accept).
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
    t_eff = jnp.where(act, t_lim, -big)

    cxx = oy * dz - oz * dy
    cxy = oz * dx - ox * dz
    cxz = ox * dy - oy * dx

    row = pl.program_id(0) % ORDER_ROWS
    rid = jnp.broadcast_to(rid_ref[:, 0:1], (RT, CK)).astype(jnp.uint32)
    salt = salt_ref[0, 0].astype(jnp.uint32)
    eps_h = jnp.float32(eps)
    t_cap0 = cap0_ref[row, 0]

    def scoped(scratch, sem):
        def get_dma(slot, j):
            sc = order_ref[row, jnp.minimum(j, n_sc - 1)]
            return pltpu.make_async_copy(
                feat_hbm.at[pl.ds(sc * SC_ROWS, SC_ROWS), :],
                scratch.at[slot], sem.at[slot])

        def test_chunk(buf, ck, sc, best_t, best_c):
            b = ck * 10
            v0x = buf[b + 0:b + 1, :]
            v0y = buf[b + 1:b + 2, :]
            v0z = buf[b + 2:b + 3, :]
            e1x = buf[b + 3:b + 4, :]
            e1y = buf[b + 4:b + 5, :]
            e1z = buf[b + 5:b + 6, :]
            e2x = buf[b + 6:b + 7, :]
            e2y = buf[b + 7:b + 8, :]
            e2z = buf[b + 8:b + 9, :]
            n2x = e1y * e2z - e1z * e2y
            n2y = e1z * e2x - e1x * e2z
            n2z = e1x * e2y - e1y * e2x
            fux = v0y * e2z - v0z * e2y
            fuy = v0z * e2x - v0x * e2z
            fuz = v0x * e2y - v0y * e2x
            fvx = v0y * e1z - v0z * e1y
            fvy = v0z * e1x - v0x * e1z
            fvz = v0x * e1y - v0y * e1x
            d0 = v0x * n2x + v0y * n2y + v0z * n2z

            m = dx * n2x + dy * n2y + dz * n2z
            sm = jnp.where(m >= 0.0, 1.0, -1.0)
            ds = m * sm
            ns = -sm
            u_num = ((cxx * e2x + cxy * e2y + cxz * e2z)
                     + (dx * fux + dy * fuy + dz * fuz))
            v_sum = ((cxx * e1x + cxy * e1y + cxz * e1z)
                     + (dx * fvx + dy * fvy + dz * fvz))
            t_num = (ox * n2x + oy * n2y + oz * n2z) - d0
            us = u_num * ns
            vs = v_sum * sm
            ts = t_num * ns
            ok = ((ds >= eps_h) & (us >= 0.0) & (vs >= 0.0)
                  & (us + vs <= ds) & (ts > 0.0))
            tc = ts * pl.reciprocal(jnp.maximum(ds, 1e-30), approx=True)
            ok &= (tc < t_eff) & (tc < best_t)

            c_g = sc * jnp.int32(SC_CHUNKS) + jnp.int32(ck)
            if not all_opaque:
                accept = buf[b + 9:b + 10, :]
                prim_g = (c_g.astype(jnp.uint32) * jnp.uint32(CK)
                          + jax.lax.broadcasted_iota(jnp.uint32,
                                                     (RT, CK), 1))
                h = _mix32(rid * jnp.uint32(0x9E3779B9)
                           ^ _mix32(prim_g + jnp.uint32(0x7F4A7C15) ^ salt))
                uni = ((h >> 8).astype(jnp.int32).astype(jnp.float32)
                       * jnp.float32(5.960464477539063e-08))
                ok &= (uni < accept) | (accept >= 1.0)

            tt = jnp.where(ok, tc, big)
            better = tt < best_t
            best_t = jnp.where(better, tt, best_t)
            best_c = jnp.where(better, c_g, best_c)
            return best_t, best_c

        def shrink(best_t):
            per_ray = jnp.min(best_t, axis=1, keepdims=True)
            if any_hit:
                need = act & (per_ray >= big)
                return jnp.max(jnp.where(need, t_lim, -big))
            return jnp.max(jnp.where(act, jnp.minimum(per_ray, t_lim),
                                     -big))

        def cond(carry):
            i, best_t, best_c, t_cap = carry
            i_s = jnp.minimum(i, n_sc - 1)
            return (i < n_sc) & (entry_ref[row, i_s] <= t_cap)

        def body(carry):
            i, best_t, best_c, t_cap = carry
            # speculative prefetch of the next superchunk overlaps its DMA
            # with this visit's 16-chunk test burst
            @pl.when(i + 1 < n_sc)
            def _():
                get_dma((i + 1) % 2, i + 1).start()

            get_dma(i % 2, i).wait()
            buf = scratch.at[i % 2]
            sc = order_ref[row, jnp.minimum(i, n_sc - 1)]
            for ck in range(SC_CHUNKS):
                best_t, best_c = test_chunk(buf, ck, sc, best_t, best_c)
            new_cap = jnp.minimum(t_cap, shrink(best_t))
            return i + 1, best_t, best_c, new_cap

        first = (jnp.int32(0) < n_sc) & (entry_ref[row, 0] <= t_cap0)

        @pl.when(first)
        def _():
            get_dma(0, 0).start()

        init = (jnp.int32(0),
                jnp.full((RT, CK), big, jnp.float32),
                jnp.full((RT, CK), -1, jnp.int32),
                t_cap0)
        i_end, best_t, best_c, _ = jax.lax.while_loop(cond, body, init)

        # drain the prefetch the final visit issued (exit-by-cap leaves it
        # in flight; an outstanding DMA at kernel end is illegal)
        @pl.when((i_end > 0) & (i_end < n_sc))
        def _():
            get_dma(i_end % 2, i_end).wait()

        tmin = jnp.min(best_t, axis=1, keepdims=True)
        lane = jax.lax.broadcasted_iota(jnp.int32, (RT, CK), 1)
        pid = jnp.where((best_t <= tmin) & (best_c >= 0),
                        best_c * jnp.int32(CK) + lane, jnp.int32(_IMAX))
        pmin = jnp.min(pid, axis=1, keepdims=True)
        out_t_ref[:, 0:1] = tmin
        prim_ref[:, 0:1] = jnp.where(pmin == jnp.int32(_IMAX),
                                     jnp.int32(-1), pmin)

    pl.run_scoped(
        scoped,
        scratch=pltpu.VMEM((2, SC_ROWS, TRI_CHUNK), jnp.float32),
        sem=pltpu.SemaphoreType.DMA((2,)))


@functools.partial(jax.jit, static_argnames=("any_hit", "eps", "all_opaque",
                                             "interpret"))
def _stream_trace(feat_sc, scbox, ro, rd, t_lim, active, rid, salt, diag,
                  any_hit=False, eps=1e-5, all_opaque=False,
                  interpret=False):
    """Streaming trace: feat_sc (n_sc * SC_ROWS, 128) stays in HBM;
    culling/ordering run at SUPERCHUNK granularity (scbox (8, n_sc_pad))."""
    R = ro.shape[0]
    n_tiles = R // RAY_TILE
    n_sc = feat_sc.shape[0] // SC_ROWS
    ncp = -(-n_sc // 128) * 128
    rpad = (-n_tiles) % ORDER_ROWS

    act_b = active[:, 0] > 0.5
    t_eff = jnp.minimum(t_lim[:, 0], diag)
    # per-RAY slab cull: at SUPERCHUNK granularity (16x fewer boxes than
    # chunks) the sharp test is affordable and prunes the grazing-angle
    # frustum blowup that made the conservative tile-interval cull visit
    # ~25% of the scene per tile (measured on terrain_500k)
    score = _chunk_cull(scbox, ro, rd, t_eff, act_b, n_sc, diag,
                        per_ray_max=2048)
    order = jnp.argsort(score, axis=1).astype(jnp.int32)
    entry = jnp.take_along_axis(score, order, axis=1)
    order = jnp.pad(order, ((0, rpad), (0, ncp - n_sc)))
    entry = jnp.pad(entry, ((0, rpad), (0, ncp - n_sc)),
                    constant_values=_BIG)
    cap0 = jnp.max(jnp.where(act_b, jnp.clip(t_eff, 0.0, diag), -_BIG)
                   .reshape(n_tiles, RAY_TILE), axis=1, keepdims=True)
    cap0 = jnp.pad(cap0, ((0, rpad), (0, 0)), constant_values=-_BIG)

    kernel = functools.partial(_stream_kernel, n_sc=n_sc, any_hit=any_hit,
                               eps=eps, all_opaque=all_opaque)
    out_t, prim = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
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
            pl.BlockSpec((ORDER_ROWS, ncp), lambda i: (i // ORDER_ROWS, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((ORDER_ROWS, ncp), lambda i: (i // ORDER_ROWS, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((ORDER_ROWS, 1), lambda i: (i // ORDER_ROWS, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),   # feat stays in HBM
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
    )(salt, ro, rd, t_lim, active, rid, order, entry, cap0, feat_sc)
    return out_t[:, 0], prim[:, 0]


def build_tri_features_stream(scene):
    """Superchunk-major HBM feature table (n_sc * SC_ROWS, 128) + per-
    superchunk bounds (8, n_sc) for the streaming kernel: the dense (10,
    T_pad) SoA regrouped so each superchunk's 16 chunks x 10 rows are one
    contiguous, DMA-aligned block."""
    feat, cbox = build_tri_features(scene)            # (10, T_pad), (8, nC)
    Tp = feat.shape[1]
    nC = Tp // TRI_CHUNK
    n_sc = -(-nC // SC_CHUNKS)
    cpad = n_sc * SC_CHUNKS - nC
    if cpad:
        pad_feat = jnp.zeros((10, cpad * TRI_CHUNK), jnp.float32)
        pad_feat = pad_feat.at[9, :].set(-1.0)        # accept = never
        feat = jnp.concatenate([feat, pad_feat], axis=1)
    # (10, n_sc, 16, 128) -> (n_sc, 16, 10, 128) -> (n_sc * 160, 128)
    feat_sc = feat.reshape(10, n_sc, SC_CHUNKS, TRI_CHUNK) \
        .transpose(1, 2, 0, 3).reshape(n_sc * SC_ROWS, TRI_CHUNK)

    # superchunk bounds = union of member chunk bounds
    big = jnp.float32(_BIG)
    cb = jnp.pad(cbox[:, :nC], ((0, 0), (0, cpad)),
                 constant_values=0.0)
    if cpad:  # padded chunks must not grow the union
        cb = cb.at[0:3, nC:].set(big)
        cb = cb.at[3:6, nC:].set(-big)
    lo = jnp.min(cb[0:3].reshape(3, n_sc, SC_CHUNKS), axis=2)
    hi = jnp.max(cb[3:6].reshape(3, n_sc, SC_CHUNKS), axis=2)
    scbox = jnp.concatenate([lo, hi, jnp.zeros((2, n_sc), jnp.float32)],
                            axis=0)
    return feat_sc, scbox


def build_tri_features(scene):
    """(10, T_pad) triangle SoA (v0, e1, e2, accept) + (8, n_chunks_pad)
    chunk bboxes from the (BVH-leaf-ordered) scene triangle arrays.  jnp;
    cheap; jit-safe; differentiable into scene.tris (only used for the
    winner's exact recompute — the kernel consumes it as data).  The
    derived MT features are computed in-kernel per chunk."""
    tr = scene.tris
    T = tr.v0.shape[0]
    pad = (-T) % TRI_CHUNK
    f32 = jnp.float32

    accept = jnp.where(scene.materials.ior[tr.mat_id] != 1.0, 1.0,
                       scene.materials.opacity[tr.mat_id])

    v0, e1, e2 = tr.v0, tr.e1, tr.e2

    def row(x):
        return jnp.pad(x.astype(f32), (0, pad))

    feat = jnp.stack([
        row(v0[:, 0]), row(v0[:, 1]), row(v0[:, 2]),
        row(e1[:, 0]), row(e1[:, 1]), row(e1[:, 2]),
        row(e2[:, 0]), row(e2[:, 1]), row(e2[:, 2]),
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
    return feat, cbox


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


def pallas_prim_query(scene, ro, rd, t_max=None, salt=0, eps=1e-5,
                      active=None, ray_id=None, any_hit=False,
                      interpret=None):
    """Raw kernel query: (approx_t (R,), prim (R,)) for the winning
    triangle per ray (-1 = miss).  Exact values are the caller's job.
    ``interpret=None`` auto-selects interpreter mode off-TPU so the
    Pallas backend is testable on the CPU mesh."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
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

    diag = jnp.linalg.norm(jax.lax.stop_gradient(
        (scene.world_max - scene.world_min).astype(dt))) * 1.001
    salt_arr = jnp.asarray(salt, jnp.int32).reshape(1, 1)

    if scene.n_tris > VMEM_TRI_CAP:
        # streaming path: triangles stay in HBM, superchunks DMA'd on
        # demand (reference octree.cpp:150-313's any-scene-size role)
        feat_sc, scbox = build_tri_features_stream(scene)
        tk, prim = _stream_trace(
            jax.lax.stop_gradient(feat_sc), jax.lax.stop_gradient(scbox),
            rop, rdp, tl, ac, ridp, salt_arr, diag,
            any_hit=any_hit, eps=eps, all_opaque=scene.all_opaque,
            interpret=interpret)
    else:
        feat, cbox = build_tri_features(scene)
        tk, prim = _dense_trace(
            jax.lax.stop_gradient(feat), jax.lax.stop_gradient(cbox),
            rop, rdp, tl, ac, ridp, salt_arr, diag,
            any_hit=any_hit, eps=eps, all_opaque=scene.all_opaque,
            interpret=interpret)
    return (jax.lax.stop_gradient(tk[:R]),
            jax.lax.stop_gradient(prim[:R]))


def pallas_closest_hit(scene, ro, rd, t_max=None, salt=0, eps=1e-5,
                       active=None, ray_id=None, any_hit=False,
                       interpret=None, differentiable=True):
    """Drop-in closest-hit/any-hit over the Pallas dense kernel.
    Returns the same Hit tuple as ops.intersect.closest_hit (triangles
    only — the caller layers the dense sphere/cone passes on top).
    hit.t/u/v carry gradients to scene.tris and rays because the exact
    values are recomputed outside the kernel from the winning prim.
    ``ray_id``: lane-invariant ids for the alpha hash (defaults to the
    dispatch slot; compaction callers must pass the original lane ids)."""
    from .intersect import Hit

    del differentiable  # always differentiable now (exact recompute path)
    tk, prim = pallas_prim_query(scene, ro, rd, t_max=t_max, salt=salt,
                                 eps=eps, active=active, ray_id=ray_id,
                                 any_hit=any_hit, interpret=interpret)
    R = ro.shape[0]
    if any_hit:
        # occlusion only needs the accept decision; skip the exact pass
        t = jnp.where(prim >= 0, tk.astype(ro.dtype), jnp.inf)
        z = jnp.zeros((R,), ro.dtype)
        return Hit(t, prim, z, z)
    t, u, v, prim = _exact_hit(scene, ro, rd, prim, eps)
    return Hit(t.astype(ro.dtype), prim,
               u.astype(ro.dtype), v.astype(ro.dtype))
