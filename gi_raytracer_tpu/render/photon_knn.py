"""Pallas kNN photon gather — the TPU-native caustic estimate.

The baseline gather in :mod:`photon` pads every query's 27-cell window to
``27 * window_cap`` candidate slots (cap = the map's DENSEST cell, up to
96) and `top_k`s the result.  On production maps that is ~12x padding
waste — the median window holds ~40 photons — and the per-call gather
traffic reaches gigabytes, which is what killed with-map renders
on-device in r3 (~6.8 s per 262k queries on the cornell 750k map).

TPU-first redesign:

1. **Exact ragged windows.**  Photons are cell-sorted with row-major cell
   ids, so a query's 3x3x3 window is exactly 9 CONTIGUOUS runs of the
   photon array (one per in-range (x, y) column, z contiguous).  The
   candidate list is built run-by-run with a batched `searchsorted` —
   exactly ``n_cand`` candidates per query, no per-cell cap, no padding
   beyond the tier cap.
2. **Tiered caps.**  Queries are partitioned by window population into
   tiers (<=128, <=512, <=2048 candidates); each tier gathers and
   computes at its own width, so the common case pays the common cost.
   Tier overflows (pathological foci) fall back to the reference path.
3. **A Pallas kernel does the math.**  Squared distances, the k-th-radius
   solve (bisection on the squared distance + exact max-in-threshold
   sharpening — equal to the reference's partial-sort k-th,
   raytracer.h:547,574, up to distance ties inside a 2^-18 interval) and
   the weighted contribution sums run on VMEM-resident (256, cap) planes.

Empty-window queries cost one 18-gather counting pass and are skipped —
the reference's empty-leaf result (photonMap.cpp:50-66).

Differentiability: the kernels are forward-only; the custom VJP
differentiates :func:`sample_photons_chunkrow` — the same estimator with
candidates fetched as whole 2 KB chunk rows (the access pattern this
platform runs ~100x cheaper per byte than per-element gathers) — so
gradients to photon positions/colors (and through them to light/material
parameters) equal the reference path's (tested) at a fraction of the r4
reference-replay cost.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TQ = 256                      # max queries per kernel block (sublane axis)
TIER_CAPS = (128, 512, 2048)  # candidate caps (lane axis) per tier
# queries per kernel block, per tier: 9 candidate planes of (TQS x cap)
# f32 must fit VMEM with double buffering (~5 MB per buffer set)
TIER_TQ = (256, 256, 64)
# lanes per scan super-block, per tier: small blocks keep the (slow)
# per-lane scalar gathers proportional to the residual actually processed
# (this path only serves the few-percent tile-pass residual)
TIER_BLOCK_LANES = (8192, 4096, 2048)

_BIG = 3.0e38

# dev-only stage ablation for on-device profiling (results become WRONG):
#   KNN_ABLATE=nokernel  -> skip the class gather+kernel passes
#   KNN_ABLATE=pass1     -> skip pass 2 + the per-point residual
#   KNN_ABLATE=nores     -> skip only the per-point residual
import os as _os
_ABLATE = frozenset(
    x for x in _os.environ.get("KNN_ABLATE", "").split(",") if x)


def _knn_kernel(meta_ref, q_ref, px_ref, py_ref, pz_ref, dx_ref, dy_ref,
                dz_ref, cr_ref, cg_ref, cb_ref, out_ref, *, k: int, C: int,
                TQ: int):
    """Grid: (blocks,).  Refs:
    meta_ref (8, 8) i32 SMEM row (block%8): [flag]
    q_ref    (TQ, 8) f32: qpos xyz, qdir xyz, n_cand, pad
    p*_ref   (TQ, C) f32 candidate positions; d* directions; c* colors
    out_ref  (TQ, 4) f32: estimate rgb + pad
    """
    row = pl.program_id(0) % 8
    flag = meta_ref[row, 0]

    @pl.when(flag == 0)
    def _():
        out_ref[:, :] = jnp.zeros((TQ, 4), jnp.float32)

    @pl.when(flag > 0)
    def _():
        qx = q_ref[:, 0:1]
        qy = q_ref[:, 1:2]
        qz = q_ref[:, 2:3]
        n_cand = q_ref[:, 6:7]

        lane = jax.lax.broadcasted_iota(jnp.int32, (TQ, C), 1)
        ok = lane.astype(jnp.float32) < n_cand
        big = jnp.float32(_BIG)
        d2 = ((px_ref[:, :] - qx) ** 2 + (py_ref[:, :] - qy) ** 2
              + (pz_ref[:, :] - qz) ** 2)
        d2 = jnp.where(ok, d2, big)

        d2_max = jnp.max(jnp.where(ok, d2, -big), axis=1, keepdims=True)
        kf = jnp.float32(k)
        need = n_cand > kf

        # EXACT k-th squared distance: bisect the float BIT PATTERN
        # (monotone for non-negative f32), so 32 iterations shrink the
        # bracket to one ulp — no distance-tie ambiguity.  Invariant:
        # count(d2 <= f(lo)) < k <= count(d2 <= f(hi)).
        def body(i, bounds):
            lo, hi = bounds
            mid = (lo + hi) >> 1
            mid_f = jax.lax.bitcast_convert_type(mid, jnp.float32)
            cnt = jnp.sum((d2 <= mid_f).astype(jnp.float32), axis=1,
                          keepdims=True)
            ge = cnt >= kf
            return (jnp.where(ge, lo, mid), jnp.where(ge, mid, hi))

        lo0 = jnp.full((TQ, 1), -1, jnp.int32)
        hi0 = jax.lax.bitcast_convert_type(jnp.maximum(d2_max, 0.0),
                                           jnp.int32)
        _, hi = jax.lax.fori_loop(0, 32, body, (lo0, hi0))
        kth = jax.lax.bitcast_convert_type(hi, jnp.float32)
        # r_k^2 = the k-th smallest distance exactly (raytracer.h:574)
        rk2 = jnp.where(need, kth, d2_max)
        sel = ok & (d2 <= rk2)

        w = (dx_ref[:, :] * q_ref[:, 3:4] + dy_ref[:, :] * q_ref[:, 4:5]
             + dz_ref[:, :] * q_ref[:, 5:6])
        w = jnp.where(sel, w, 0.0)
        inv_pi_r2 = pl.reciprocal(
            jnp.float32(np.pi) * jnp.maximum(rk2, 1e-20), approx=False)
        scale = jnp.where(n_cand > 0, inv_pi_r2, 0.0)
        out_ref[:, 0:1] = jnp.sum(cr_ref[:, :] * w, axis=1,
                                  keepdims=True) * scale
        out_ref[:, 1:2] = jnp.sum(cg_ref[:, :] * w, axis=1,
                                  keepdims=True) * scale
        out_ref[:, 2:3] = jnp.sum(cb_ref[:, :] * w, axis=1,
                                  keepdims=True) * scale
        out_ref[:, 3:4] = jnp.zeros((TQ, 1), jnp.float32)


def _knn_blocks(meta, q, planes, k, C, TQ, interpret):
    """meta (B_pad8, 8) i32, q (B*TQ, 8), planes 9x (B*TQ, C)."""
    n_blocks = q.shape[0] // TQ
    kernel = functools.partial(_knn_kernel, k=k, C=C, TQ=TQ)
    plane_spec = pl.BlockSpec((TQ, C), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((8, 8), lambda i: (i // 8, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((TQ, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [plane_spec] * 9,
        out_specs=pl.BlockSpec((TQ, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks * TQ, 4), jnp.float32),
        interpret=interpret,
    )(meta, q, *planes)


def sample_photons_tiled(pm, point, direction, k, interpret=None):
    """Drop-in fast path of :func:`photon.sample_photons`.

    Same estimate semantics (27-cell clamped window, k nearest, Jensen
    density with exact k-th radius); forward pass is the class-tiled
    Pallas pipeline, backward (custom VJP) differentiates the chunk-row
    path (:func:`sample_photons_chunkrow`).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _make_tiled_fn(int(k), bool(interpret))(pm, point, direction)


@functools.lru_cache(maxsize=None)
def _make_tiled_fn(k: int, interpret: bool):
    """One cached custom-VJP function per (k, interpret) so repeated calls
    inside jitted loops hit the same trace cache entry."""

    @jax.custom_vjp
    def f(pm, point, direction):
        return _fwd_impl(pm, point, direction, k, interpret)

    def fwd(pm, point, direction):
        return _fwd_impl(pm, point, direction, k, interpret), \
            (pm, point, direction)

    def bwd(res, g):
        pm, point, direction = res
        _, pull = jax.vjp(
            lambda pm_, p_, d_: sample_photons_chunkrow(pm_, p_, d_, k),
            pm, point, direction)
        return pull(g)

    f.defvjp(fwd, bwd)
    return f


# ---------------------------------------------------------------------------
# chunk-row differentiable path (the VJP workhorse)
#
# A pure-jnp forward that fetches each query's window candidates as WHOLE
# 2 KB chunk rows of the cell-sorted photon table — the access pattern this
# platform runs ~100x cheaper per byte than per-element gathers — then
# top_k + Jensen in ordinary differentiable XLA.  Same estimator as
# photon.sample_photons (same windows, same k-th radius semantics), but
# its jax.vjp is ~an order of magnitude cheaper, so it backs the tiled
# kernel's custom VJP (replacing the r4 reference-gather replay,
# photon_knn.py VJP — VERDICT r4 #5).
# ---------------------------------------------------------------------------

CCAP = 16          # default chunk budget per query (512 candidate slots)
CR_BLK = 8192      # lanes per scan block (bounds the (B, 512, 16) fetch)


def _window_runs(pm, point):
    """Stage 1 of the chunk-row path: per-query window runs -> 32-aligned
    disjoint chunk ranges.  Returns (cells (B,3) i32, lo_c (B,9), ae (B,9),
    prefix (B,9), n_chunks (B,)) — cheap (18 cell_start gathers/lane)."""
    B = point.shape[0]
    nx, ny, nz = pm.dims
    dims_i = jnp.asarray([nx - 1, ny - 1, nz - 1], jnp.int32)
    p32 = point.astype(jnp.float32)
    g = (p32 - pm.grid_min[None, :].astype(jnp.float32)) \
        * pm.inv_cell[None, :].astype(jnp.float32)
    cells = jnp.clip(g.astype(jnp.int32), 0, dims_i)

    # the 9 contiguous z-runs of the clamped 3x3x3 window (cell-id order,
    # so run starts ascend and the chunk cummax merge stays disjoint)
    starts, ends = [], []
    cx, cy, cz = cells[:, 0], cells[:, 1], cells[:, 2]
    zlo = jnp.maximum(cz - 1, 0)
    zhi = jnp.minimum(cz + 1, nz - 1)
    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            wx = cx + ox
            wy = cy + oy
            in_r = (wx >= 0) & (wx < nx) & (wy >= 0) & (wy < ny)
            base = (jnp.clip(wx, 0, nx - 1) * ny
                    + jnp.clip(wy, 0, ny - 1)) * nz
            s = pm.cell_start[base + zlo]
            e = pm.cell_start[base + zhi + 1]
            starts.append(jnp.where(in_r, s, 0))
            ends.append(jnp.where(in_r, e, 0))
    r_s = jnp.stack(starts, axis=1)                       # (B, 9)
    r_e = jnp.stack(ends, axis=1)
    run_ok = r_e > r_s

    # 32-aligned chunk ranges, cummax-merged so ranges stay disjoint
    as_ = r_s // 32
    ae_ = jnp.where(run_ok, -(-r_e // 32), 0)
    cmax_inc = jax.lax.associative_scan(jnp.maximum, ae_, axis=1)
    cmax_exc = jnp.concatenate(
        [jnp.zeros((B, 1), ae_.dtype), cmax_inc[:, :-1]], axis=1)
    lo_c = jnp.maximum(as_, cmax_exc)
    rlen = jnp.where(run_ok, jnp.maximum(ae_ - lo_c, 0), 0)
    prefix = jnp.cumsum(rlen, axis=1)                     # (B, 9)
    return cells, lo_c, prefix, prefix[:, -1]


def _expand_cids(lo_c, prefix, n_chunks, ccap, sentinel):
    """Stage 2: the (B, ccap) chunk-id list from the 9 merged ranges."""
    B = lo_c.shape[0]
    jj = jnp.arange(ccap, dtype=jnp.int32)[None, :]
    run_of = jnp.zeros((B, ccap), jnp.int32)
    for r in range(9):
        run_of = run_of + (jj >= prefix[:, r:r + 1]).astype(jnp.int32)
    run_of = jnp.minimum(run_of, 8)
    before = jnp.zeros((B, ccap), jnp.int32)
    startc = jnp.zeros((B, ccap), jnp.int32)
    for r in range(9):
        is_r = run_of == r
        if r > 0:
            before = jnp.where(is_r, prefix[:, r - 1:r], before)
        startc = jnp.where(is_r, lo_c[:, r:r + 1], startc)
    return jnp.where(jj < jnp.minimum(n_chunks, ccap)[:, None],
                     jnp.clip(startc + (jj - before), 0, sentinel - 1),
                     sentinel)


def _est_from_chunks(tbl, cid, cells, point, direction, k):
    """Stage 3: fetch candidate chunk ROWS and evaluate the estimator.
    Selection = every candidate within the exact k-th radius (distance
    ties included) — the same inclusion rule the tile kernels implement.
    Differentiable (gathers + top_k + arithmetic)."""
    B, ccap = cid.shape
    p32 = point.astype(jnp.float32)
    cand = tbl[cid].reshape(B, ccap * 32, 16)             # the row fetch
    qc = cells.astype(jnp.float32)
    ok = ((jnp.abs(cand[:, :, 9] - qc[:, 0:1]) <= 1.0)
          & (jnp.abs(cand[:, :, 10] - qc[:, 1:2]) <= 1.0)
          & (jnp.abs(cand[:, :, 11] - qc[:, 2:3]) <= 1.0))
    # NaN-sentinel positions already fail the membership mask; they must
    # ALSO be scrubbed before the arithmetic, or the masked branch's NaN
    # poisons the query-point gradient through where()'s 0 * NaN chain
    psafe = jnp.where(jnp.isnan(cand[:, :, 0:3]), 0.0, cand[:, :, 0:3])
    d2 = jnp.sum((psafe - p32[:, None, :]) ** 2, -1)
    d2 = jnp.where(ok, d2, jnp.inf)

    kk = min(k, d2.shape[1])
    neg_top, _ = jax.lax.top_k(-d2, kk)                   # ascending
    top_d2 = -neg_top
    found = jnp.isfinite(top_d2)
    n_found = jnp.sum(found, axis=1)

    kth = jnp.clip(n_found - 1, 0, kk - 1)
    max_d2 = top_d2[jnp.arange(B), kth]
    sel = d2 <= max_d2[:, None]
    w = jnp.sum(cand[:, :, 3:6]
                * direction.astype(jnp.float32)[:, None, :], -1)
    contrib = jnp.where(sel[:, :, None], cand[:, :, 6:9] * w[:, :, None],
                        0.0)
    total = jnp.sum(contrib, axis=1)

    has = n_found > 0
    denom = jnp.where(has, jnp.float32(np.pi)
                      * jnp.maximum(max_d2, 1e-20), 1.0)
    return jnp.where(has[:, None], total / denom[:, None], 0.0)


CCAP_SMALL = 16       # small-width bucket (512 candidate slots)
CR_BLK_BIG = 2048     # lanes per block at the wide width


def sample_photons_chunkrow(pm, point, direction, k, ccap=96):
    """Differentiable chunk-row kNN estimate: per-query window candidates
    fetched as whole 2 KB chunk rows (the access pattern this platform
    runs ~100x cheaper per byte than per-element gathers), then top_k +
    Jensen in ordinary XLA.  Lanes are WIDTH-BUCKETED by their chunk
    count — most windows fit CCAP_SMALL chunks and pay a 6x smaller fetch
    — and each bucket processes only as many fixed-size blocks as its
    population fills.  Windows past ``ccap`` chunks (denser than the
    occupancy-driven grid could resolve — bitwise-coincident foci) fall
    back per-lane to photon.sample_photons (its per-cell-cap truncation +
    subsample correction included)."""
    from .photon import sample_photons

    R = point.shape[0]
    dt = point.dtype
    tbl = _pack_chunk_table(pm)
    sentinel = tbl.shape[0] - 1
    cells, lo_c, prefix, n_chunks = _window_runs(pm, point)
    overflow = n_chunks > ccap

    est = jnp.zeros((R + 1, 3), jnp.float32)
    buckets = (
        ((n_chunks > 0) & (n_chunks <= CCAP_SMALL), CCAP_SMALL, CR_BLK),
        ((n_chunks > CCAP_SMALL) & ~overflow, ccap, CR_BLK_BIG),
    )
    for mask, W, blk in buckets:
        blk = min(blk, max(R, 1))
        a = mask.astype(jnp.int32)
        n_c = jnp.sum(a)
        c = jnp.cumsum(a) - a
        slot = jnp.where(mask, c, R)
        ids = jnp.full((R + 1,), 0, jnp.int32).at[
            jnp.minimum(slot, R)].set(jnp.arange(R, dtype=jnp.int32))[:R]
        n_blk = -(-R // blk)

        def step(est, i, ids=ids, n_c=n_c, W=W, blk=blk):
            t0 = jnp.minimum(i * blk, R - blk)

            def computed():
                lanes = jax.lax.dynamic_slice(ids, (t0,), (blk,))
                live = (t0 + jnp.arange(blk, dtype=jnp.int32)) < n_c
                cid = _expand_cids(lo_c[lanes], prefix[lanes],
                                   n_chunks[lanes], W, sentinel)
                e = _est_from_chunks(tbl, cid, cells[lanes], point[lanes],
                                     direction[lanes], k)
                return est.at[jnp.where(live, lanes, R)].set(e)

            return jax.lax.cond(t0 < n_c, computed, lambda: est), None

        est, _ = jax.lax.scan(step, est, jnp.arange(n_blk))

    est = est[:R].astype(dt)

    def slow():
        far = (pm.grid_min - 1e6 * jnp.maximum(
            1.0 / jnp.maximum(pm.inv_cell, 1e-20), 1.0)).astype(dt)
        p_slow = jnp.where(overflow[:, None], point, far[None, :])
        return sample_photons(pm, p_slow, direction, k)

    est_slow = jax.lax.cond(
        jnp.any(overflow), slow, lambda: jnp.zeros((R, 3), dt))
    return jnp.where(overflow[:, None], est_slow, est)


def _fwd_perpoint(pm, point, direction, k, interpret):
    R = point.shape[0]
    dt = point.dtype
    nx, ny, nz = pm.dims
    C_cells = nx * ny * nz
    dims_i = jnp.asarray([nx - 1, ny - 1, nz - 1], jnp.int32)

    p32 = point.astype(jnp.float32)
    d32 = direction.astype(jnp.float32)
    g = (p32 - pm.grid_min[None, :].astype(jnp.float32)) \
        * pm.inv_cell[None, :].astype(jnp.float32)
    cells = jnp.clip(g.astype(jnp.int32), 0, dims_i)            # (R, 3)
    cx, cy, cz = cells[:, 0], cells[:, 1], cells[:, 2]
    zlo = jnp.maximum(cz - 1, 0)
    zhi = jnp.minimum(cz + 1, nz - 1)

    # the 9 contiguous z-runs of each query's clamped 3x3x3 window
    starts, lens = [], []
    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            wx = cx + ox
            wy = cy + oy
            in_r = (wx >= 0) & (wx < nx) & (wy >= 0) & (wy < ny)
            base = (jnp.clip(wx, 0, nx - 1) * ny
                    + jnp.clip(wy, 0, ny - 1)) * nz
            s = pm.cell_start[base + zlo]
            e = pm.cell_start[base + zhi + 1]
            starts.append(jnp.where(in_r, s, 0))
            lens.append(jnp.where(in_r, e - s, 0))
    r_start = jnp.stack(starts, axis=1)                          # (R, 9)
    r_len = jnp.stack(lens, axis=1)
    prefix = jnp.cumsum(r_len, axis=1)                           # inclusive
    n_cand = prefix[:, -1]

    # tier partition: 0..len(TIER_CAPS)-1, len() = reference fallback,
    # len()+1 = empty (skipped)
    n_tiers = len(TIER_CAPS)
    tier = jnp.full((R,), n_tiers, jnp.int32)
    for t in range(n_tiers - 1, -1, -1):
        tier = jnp.where(n_cand <= TIER_CAPS[t], t, tier)
    tier = jnp.where(n_cand == 0, n_tiers + 1, tier)
    order = jnp.argsort(tier, stable=True).astype(jnp.int32)
    # inverse permutation by scatter (an argsort-of-argsort is a second
    # full sort; the scatter is one linear pass)
    pos_of = jnp.zeros_like(order).at[order].set(
        jnp.arange(order.shape[0], dtype=jnp.int32), unique_indices=True)
    # tier boundaries in sorted space
    bounds = jnp.searchsorted(tier[order],
                              jnp.arange(n_tiers + 2, dtype=jnp.int32),
                              side="left").astype(jnp.int32)

    pad = (-R) % TQ
    Rp = R + pad

    def srt(x, fill=0.0):
        y = x[order]
        widths = ((0, pad),) + ((0, 0),) * (y.ndim - 1)
        return jnp.pad(y, widths, constant_values=fill)

    q = jnp.concatenate([
        srt(p32), srt(d32),
        srt(n_cand.astype(jnp.float32))[:, None],
        jnp.zeros((Rp, 1), jnp.float32)], axis=1)                # (Rp, 8)
    rs_s = srt(r_start)
    pf_s = srt(prefix)

    ppos = pm.pos.astype(jnp.float32)
    pdir = pm.dir.astype(jnp.float32)
    pcol = pm.col.astype(jnp.float32)
    cap_idx = pm.pos.shape[0] - 1

    est = jnp.zeros((Rp, 3), jnp.float32)

    for t, C in enumerate(TIER_CAPS):
        tq = TIER_TQ[t]
        lanes_blk = min(TIER_BLOCK_LANES[t], Rp)
        n_sb = -(-Rp // lanes_blk)
        lo_t, hi_t = bounds[t], bounds[t + 1]

        def super_block(base, lo_t=lo_t, hi_t=hi_t, C=C,
                        lanes_blk=lanes_blk, tq=tq):
            qb = jax.lax.dynamic_slice(q, (base, 0), (lanes_blk, 8))
            rsb = jax.lax.dynamic_slice(rs_s, (base, 0), (lanes_blk, 9))
            pfb = jax.lax.dynamic_slice(pf_s, (base, 0), (lanes_blk, 9))
            # ragged-run expansion as 9 one-hot passes (gather-free; a
            # vmapped searchsorted lowered pathologically here)
            j = jnp.arange(C, dtype=jnp.int32)[None, :]
            run_of = jnp.zeros((lanes_blk, C), jnp.int32)
            for r in range(9):
                run_of = run_of + (j >= pfb[:, r:r + 1]).astype(jnp.int32)
            run_of = jnp.minimum(run_of, 8)
            before = jnp.zeros((lanes_blk, C), jnp.int32)
            startv = jnp.zeros((lanes_blk, C), jnp.int32)
            for r in range(9):
                is_r = run_of == r
                if r > 0:
                    before = jnp.where(is_r, pfb[:, r - 1:r], before)
                startv = jnp.where(is_r, rsb[:, r:r + 1], startv)
            idx = jnp.clip(startv + (j - before), 0, cap_idx)
            planes = (ppos[:, 0][idx], ppos[:, 1][idx], ppos[:, 2][idx],
                      pdir[:, 0][idx], pdir[:, 1][idx], pdir[:, 2][idx],
                      pcol[:, 0][idx], pcol[:, 1][idx], pcol[:, 2][idx])
            # block flags: a tq-lane block computes iff it overlaps the
            # tier's sorted range
            nb = lanes_blk // tq
            blk0 = base // tq + jnp.arange(nb, dtype=jnp.int32)
            flag = ((blk0 * tq + tq > lo_t) & (blk0 * tq < hi_t)) \
                .astype(jnp.int32)
            mpad = (-nb) % 8
            meta = jnp.pad(flag[:, None], ((0, mpad), (0, 7)))
            return _knn_blocks(meta, qb, planes, k, C, tq,
                               interpret)[:, :3]

        def step(carry, sb):
            est = carry
            # clamp the last super-block so slices never run past Rp; the
            # overlap recomputes identical lanes, merged by `mine` below
            base = jnp.minimum(sb * lanes_blk, Rp - lanes_blk)
            needed = (base + lanes_blk > lo_t) & (base < hi_t)
            out = jax.lax.cond(
                needed, lambda: super_block(base),
                lambda: jnp.zeros((lanes_blk, 3), jnp.float32))
            # merge only this tier's lanes (boundary blocks may compute
            # lanes belonging to a neighboring tier at the wrong cap)
            lane_ids = base + jnp.arange(lanes_blk)
            mine = (lane_ids >= lo_t) & (lane_ids < hi_t)
            cur = jax.lax.dynamic_slice(est, (base, 0), (lanes_blk, 3))
            upd = jnp.where(mine[:, None], out, cur)
            return jax.lax.dynamic_update_slice(est, upd, (base, 0)), None

        est, _ = jax.lax.scan(step, est, jnp.arange(n_sb))

    # un-sort; tier == n_tiers lanes take the reference path
    est_r = est[pos_of]
    lane_tier = tier
    need_slow = jnp.any(lane_tier == n_tiers)

    def slow_path():
        from .photon import sample_photons
        far = pm.grid_min - 1e6 * jnp.maximum(
            1.0 / jnp.maximum(pm.inv_cell, 1e-20), 1.0)
        p_slow = jnp.where((lane_tier == n_tiers)[:, None], point,
                           far[None, :].astype(dt))
        return sample_photons(pm, p_slow, direction, k).astype(jnp.float32)

    est_slow = jax.lax.cond(need_slow, slow_path,
                            lambda: jnp.zeros((R, 3), jnp.float32))
    out = jnp.where((lane_tier == n_tiers)[:, None], est_slow, est_r)
    return out.astype(dt)


# ---------------------------------------------------------------------------
# tile-shared chunk-gather path (the production TPU pipeline)
#
# XLA's 1-D gather runs at ~0.16 GB/s on this platform (measured: 850 ms
# per 262k x 128 plane), so ANY per-query candidate fetch is the wall.
# This path amortizes the fetch across a tile of TQ_T cell-sorted queries:
# the tile's window-cell union is a box whose (x, y) columns are contiguous
# photon runs; runs are rounded to 32-photon chunks, merged (cummax chain,
# which also guarantees chunk-disjointness = no double counting) and
# fetched as WHOLE 2 KB rows of a (P/32, 512) chunk table — one gather
# element per chunk instead of one per candidate.  Per-query exactness is
# restored in-kernel by the 3x3x3 cell-membership mask (over-fetched
# photons from gap cells always fail it — see the geometry argument in the
# comments below).
# ---------------------------------------------------------------------------

TQ_T = 64        # queries per tile (pass 1)
TQ_T2 = 16       # queries per tile (pass 2 re-tiling of pass-1 failures)
XYB_T = 16       # max box columns per axis
R_MAX = 64       # merged chunk-ranges per tile
KCHUNK = 128     # pass-1 chunk cap (4096 candidate slots)
KCHUNK2 = 256    # pass-2 chunk cap: dense caustic-focus tiles fail pass 1
                 # and are re-tiled at TQ_T2=16 queries, where the smaller
                 # window union fits 256 chunks — the wide gather is paid
                 # ONLY by the few re-tiled tiles, and the large kernel's
                 # dynamic block extent keeps compute proportional
KCHUNK_S = 32    # small-class chunk budget -> 1024 candidate slots
CHUNK_BLK = 32   # chunks per dynamic compute block in the large kernel
TILE_SB = 512    # tiles per gather/kernel super-block
RES_FRAC = 8     # pass-2 capacity = ceil(Rp / RES_FRAC) lanes (measured
                 # pass-1 failure ~4-8% of tiles — finer occupancy-driven
                 # grids widen morton boxes past XYB_T; overflow falls
                 # through to the chunk-row residual)
RESIDUAL_CAP = 65536  # compacted chunk-row residual lanes (beyond: tiered)


def _morton3(x, y, z):
    """Interleave the low 10 bits of three int32 coords (z-order key)."""
    def spread(v):
        v = v.astype(jnp.uint32) & jnp.uint32(0x3FF)
        v = (v | (v << 16)) & jnp.uint32(0x030000FF)
        v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
        v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
        v = (v | (v << 2)) & jnp.uint32(0x09249249)
        return v
    return (spread(x) | (spread(y) << 1) | (spread(z) << 2)).astype(jnp.int32)


def _q_cells(q_ref, scal_ref, dims, tq):
    """Query cell coords (f32, ints exact) from the SMEM grid params —
    int32 truncation toward zero to match build_photon_map / _fwd_impl."""
    nx, ny, nz = dims

    def cell(p, g, iv, n):
        v = (p - g) * iv
        return jnp.clip(jnp.where(v >= 0.0, jnp.floor(v), -jnp.floor(-v)),
                        0.0, jnp.float32(n - 1))

    return (cell(q_ref[0:1, :], scal_ref[0, 0], scal_ref[0, 3], nx),
            cell(q_ref[1:2, :], scal_ref[0, 1], scal_ref[0, 4], ny),
            cell(q_ref[2:3, :], scal_ref[0, 2], scal_ref[0, 5], nz))


def _blk_d2(cand_ref, q_ref, qc, sl):
    """(CB, tq) masked squared distances for candidate rows ``sl``.

    Membership uses the photon cell coords STORED in the chunk table
    (cols 9-11, assigned at build time in the map dtype) — identical to
    the runs that fetched them, so a boundary photon can't be dropped by
    a recomputed-floor mismatch (r4 advisor finding).  NaN cells
    (invalid/sentinel photons) fail every compare."""
    qcx, qcy, qcz = qc
    ok = ((jnp.abs(cand_ref[sl, 9:10] - qcx) <= 1.0)
          & (jnp.abs(cand_ref[sl, 10:11] - qcy) <= 1.0)
          & (jnp.abs(cand_ref[sl, 11:12] - qcz) <= 1.0))
    d2 = ((cand_ref[sl, 0:1] - q_ref[0:1, :]) ** 2
          + (cand_ref[sl, 1:2] - q_ref[1:2, :]) ** 2
          + (cand_ref[sl, 2:3] - q_ref[2:3, :]) ** 2)
    return jnp.where(ok, d2, jnp.float32(_BIG)), ok


def _estimate_rows(out_ref, n_found, rk2, sum_r, sum_g, sum_b, tq):
    inv_pi_r2 = pl.reciprocal(
        jnp.float32(np.pi) * jnp.maximum(rk2, 1e-20), approx=False)
    scale = jnp.where(n_found > 0, inv_pi_r2, 0.0)
    out_ref[0:1, :] = sum_r * scale
    out_ref[1:2, :] = sum_g * scale
    out_ref[2:3, :] = sum_b * scale
    out_ref[3:8, :] = jnp.zeros((5, tq), jnp.float32)


def _bisect_kth(count_fn, d2_max, k, tq):
    """EXACT k-th smallest masked distance: 32-step bisection on the f32
    bit pattern (monotone for non-negative floats) — one ulp bracket, no
    distance-tie ambiguity.  ``count_fn(mid_f) -> (1, tq)`` counts
    d2 <= mid_f."""
    kf = jnp.float32(k)

    def body(i, bounds):
        lo, hi = bounds
        mid = (lo + hi) >> 1
        mid_f = jax.lax.bitcast_convert_type(mid, jnp.float32)
        ge = count_fn(mid_f) >= kf
        return (jnp.where(ge, lo, mid), jnp.where(ge, mid, hi))

    lo0 = jnp.full((1, tq), -1, jnp.int32)
    hi0 = jax.lax.bitcast_convert_type(jnp.maximum(d2_max, 0.0), jnp.int32)
    _, hi = jax.lax.fori_loop(0, 32, body, (lo0, hi0))
    return jax.lax.bitcast_convert_type(hi, jnp.float32)


def _tile_kernel_small(meta_ref, scal_ref, q_ref, cand_ref, out_ref, *,
                       k: int, dims, tq: int, NC: int):
    """Small-class tile kernel (n_chunks <= KCHUNK_S): static full-plane
    compute over NC = KCHUNK_S*32 candidate slots.
    meta_ref (8, 8) i32 SMEM row (tile%8): [flag, n_blocks]
    scal_ref (1, 8) f32 SMEM: grid_min xyz, inv_cell xyz
    q_ref    (8, tq) f32 rows: qx qy qz qdx qdy qdz
    cand_ref (NC, 16) f32 rows: px py pz dx dy dz cr cg cb cellx celly cellz
    out_ref  (8, tq) f32 rows: estimate rgb + pad
    """
    row = pl.program_id(0) % 8
    flag = meta_ref[row, 0]

    @pl.when(flag == 0)
    def _():
        out_ref[:, :] = jnp.zeros((8, tq), jnp.float32)

    @pl.when(flag > 0)
    def _():
        qc = _q_cells(q_ref, scal_ref, dims, tq)
        sl = pl.ds(0, NC)
        d2, ok = _blk_d2(cand_ref, q_ref, qc, sl)
        big = jnp.float32(_BIG)
        n_found = jnp.sum(ok.astype(jnp.float32), axis=0, keepdims=True)
        d2_max = jnp.max(jnp.where(ok, d2, -big), axis=0, keepdims=True)

        kth = _bisect_kth(
            lambda mid_f: jnp.sum((d2 <= mid_f).astype(jnp.float32),
                                  axis=0, keepdims=True),
            d2_max, k, tq)
        rk2 = jnp.where(n_found > jnp.float32(k), kth, d2_max)
        sel = d2 <= rk2          # not-ok lanes carry BIG -> never selected

        w = (cand_ref[sl, 3:4] * q_ref[3:4, :]
             + cand_ref[sl, 4:5] * q_ref[4:5, :]
             + cand_ref[sl, 5:6] * q_ref[5:6, :])
        w = jnp.where(sel, w, 0.0)
        _estimate_rows(out_ref, n_found, rk2,
                       jnp.sum(cand_ref[sl, 6:7] * w, axis=0, keepdims=True),
                       jnp.sum(cand_ref[sl, 7:8] * w, axis=0, keepdims=True),
                       jnp.sum(cand_ref[sl, 8:9] * w, axis=0, keepdims=True),
                       tq)


def _tile_kernel_large(meta_ref, scal_ref, q_ref, cand_ref, out_ref,
                       d2_scr, *, k: int, dims, tq: int, NC: int):
    """Large-class tile kernel: candidates processed in DYNAMIC-extent
    blocks of CHUNK_BLK*32 slots — a tile only pays for the blocks its
    n_chunks actually fills (meta col 1), not the full NC cap.  Masked
    d2 is staged once into a VMEM scratch; the bisection and the weighted
    sums then loop over the active blocks only.
    """
    row = pl.program_id(0) % 8
    flag = meta_ref[row, 0]
    nb = meta_ref[row, 1]
    CB = CHUNK_BLK * 32

    @pl.when(flag == 0)
    def _():
        out_ref[:, :] = jnp.zeros((8, tq), jnp.float32)

    @pl.when(flag > 0)
    def _():
        qc = _q_cells(q_ref, scal_ref, dims, tq)
        big = jnp.float32(_BIG)

        def blk_a(b, carry):
            n_found, d2_max = carry
            sl = pl.ds(b * CB, CB)
            d2, ok = _blk_d2(cand_ref, q_ref, qc, sl)
            d2_scr[sl, :] = d2
            n_found = n_found + jnp.sum(ok.astype(jnp.float32), axis=0,
                                        keepdims=True)
            d2_max = jnp.maximum(d2_max, jnp.max(
                jnp.where(ok, d2, -big), axis=0, keepdims=True))
            return n_found, d2_max

        n_found, d2_max = jax.lax.fori_loop(
            0, nb, blk_a, (jnp.zeros((1, tq), jnp.float32),
                           jnp.full((1, tq), -big, jnp.float32)))

        def count(mid_f):
            def blk_c(b, cnt):
                sl = pl.ds(b * CB, CB)
                return cnt + jnp.sum((d2_scr[sl, :] <= mid_f)
                                     .astype(jnp.float32),
                                     axis=0, keepdims=True)
            return jax.lax.fori_loop(0, nb, blk_c,
                                     jnp.zeros((1, tq), jnp.float32))

        kth = _bisect_kth(count, d2_max, k, tq)
        rk2 = jnp.where(n_found > jnp.float32(k), kth, d2_max)

        def blk_b(b, sums):
            sr, sg, sb_ = sums
            sl = pl.ds(b * CB, CB)
            sel = d2_scr[sl, :] <= rk2
            w = (cand_ref[sl, 3:4] * q_ref[3:4, :]
                 + cand_ref[sl, 4:5] * q_ref[4:5, :]
                 + cand_ref[sl, 5:6] * q_ref[5:6, :])
            w = jnp.where(sel, w, 0.0)
            return (sr + jnp.sum(cand_ref[sl, 6:7] * w, axis=0,
                                 keepdims=True),
                    sg + jnp.sum(cand_ref[sl, 7:8] * w, axis=0,
                                 keepdims=True),
                    sb_ + jnp.sum(cand_ref[sl, 8:9] * w, axis=0,
                                  keepdims=True))

        z = jnp.zeros((1, tq), jnp.float32)
        sr, sg, sb_ = jax.lax.fori_loop(0, nb, blk_b, (z, z, z))
        _estimate_rows(out_ref, n_found, rk2, sr, sg, sb_, tq)


def _tile_blocks(meta, scal, q, cand, k, dims, tq, n_chunk_cap, interpret):
    """meta (T_pad8, 8) i32 [flag, n_blocks]; q (T*8, tq);
    cand (T*n_chunk_cap*32, 16)."""
    n_tiles = q.shape[0] // 8
    NC = n_chunk_cap * 32
    if n_chunk_cap <= KCHUNK_S:
        kernel = functools.partial(_tile_kernel_small, k=k, dims=dims,
                                   tq=tq, NC=NC)
        scratch = []
    else:
        kernel = functools.partial(_tile_kernel_large, k=k, dims=dims,
                                   tq=tq, NC=NC)
        scratch = [pltpu.VMEM((NC, tq), jnp.float32)]
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, 8), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, tq), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NC, 16), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tq), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * 8, tq), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(meta, scal, q, cand)


def _pack_chunk_table(pm):
    """(P32 + 1, 512) f32: photon rows [pos, dir, col, cell xyz, pad]
    grouped 32 to a chunk row; invalid photons and padding carry NaN
    positions AND NaN cell coords (they then fail every cell-membership
    compare in-kernel).  The final row is the all-NaN sentinel chunk that
    padded chunk ids point at.

    Cell coords (cols 9-11) are computed here in the MAP dtype with the
    exact truncation build_photon_map uses — the kernel compares against
    these instead of recomputing floor() in f32, so a photon on a cell
    boundary can never be fetched via the map's runs yet fail the
    membership mask (r4 advisor finding)."""
    P = pm.pos.shape[0]
    nan = jnp.float32(jnp.nan)
    nx, ny, nz = pm.dims
    dims_i = jnp.asarray([nx - 1, ny - 1, nz - 1], jnp.int32)
    g = (pm.pos - pm.grid_min[None, :]) * pm.inv_cell[None, :]
    cells = jnp.clip(g.astype(jnp.int32), 0, dims_i).astype(jnp.float32)
    cells = jnp.where(pm.valid[:, None], cells, nan)
    pos = jnp.where(pm.valid[:, None], pm.pos.astype(jnp.float32), nan)
    rows = jnp.concatenate([
        pos, pm.dir.astype(jnp.float32), pm.col.astype(jnp.float32),
        cells, jnp.zeros((P, 4), jnp.float32)], axis=1)   # (P, 16)
    pad = (-P) % 32
    rows = jnp.pad(rows, ((0, pad + 32), (0, 0)))
    rows = rows.at[P:, 0:3].set(nan)
    rows = rows.at[P:, 9:12].set(nan)
    return rows.reshape(-1, 512)                           # (P32 + 1, 512)


def _tile_pass(pm, tbl, scal, q_s, cells_s, k, interpret, tq, n_live=None,
               kchunk=KCHUNK):
    """One tile pass over SORTED, tq-padded query arrays.

    q_s (Rp, 8): pos, dir, pad; cells_s (Rp, 3).  ``n_live``: only the
    first n_live lanes matter — super-blocks wholly past them are skipped.
    Returns (est (Rp, 3) f32, fast (Rp,) bool) — est valid on fast lanes.
    """
    nx, ny, nz = pm.dims
    C_cells = nx * ny * nz
    dims_i = jnp.asarray([nx - 1, ny - 1, nz - 1], jnp.int32)
    Rp = q_s.shape[0]
    nT = Rp // tq
    ct = cells_s.reshape(nT, tq, 3)

    lo = jnp.clip(jnp.min(ct, axis=1) - 1, 0, dims_i[None, :])  # (nT, 3)
    hi = jnp.clip(jnp.max(ct, axis=1) + 1, 0, dims_i[None, :])
    bx = hi[:, 0] - lo[:, 0] + 1
    by = hi[:, 1] - lo[:, 1] + 1
    box_ok = (bx <= XYB_T) & (by <= XYB_T)

    # (x, y) column runs of the box, in cell-id (= photon) order
    ox = jnp.arange(XYB_T, dtype=jnp.int32)
    colx = jnp.clip(lo[:, 0:1] + ox[None, :], 0, nx - 1)    # (nT, XYB)
    coly = jnp.clip(lo[:, 1:2] + ox[None, :], 0, ny - 1)
    vx = ox[None, :] < bx[:, None]
    vy = ox[None, :] < by[:, None]
    base = (colx[:, :, None] * ny + coly[:, None, :]) * nz  # (nT, XYB, XYB)
    id_lo = base + lo[:, 2, None, None]
    id_hi = base + hi[:, 2, None, None]
    NRUN = XYB_T * XYB_T
    id_lo = id_lo.reshape(nT, NRUN)
    id_hi = jnp.clip(id_hi.reshape(nT, NRUN) + 1, 0, C_cells)
    r_s = pm.cell_start[id_lo]
    r_e = pm.cell_start[id_hi]
    run_ok = (vx[:, :, None] & vy[:, None, :]).reshape(nT, NRUN)
    run_ok &= r_e > r_s

    # 32-aligned chunk ranges, merged so aligned ranges stay disjoint
    as_ = r_s // 32
    ae_ = jnp.where(run_ok, -(-r_e // 32), 0)
    cmax_inc = jax.lax.associative_scan(jnp.maximum, ae_, axis=1)
    cmax_exc = jnp.concatenate(
        [jnp.zeros((nT, 1), ae_.dtype), cmax_inc[:, :-1]], axis=1)
    bnd = run_ok & (as_ >= cmax_exc)
    range_id = jnp.cumsum(bnd.astype(jnp.int32), axis=1) - 1
    n_ranges = jnp.maximum(range_id[:, -1] + 1, 0)
    range_of_run = jnp.clip(range_id, 0, R_MAX - 1)

    big_i = jnp.int32(1 << 30)
    rs = jnp.full((nT, R_MAX), big_i, jnp.int32)
    re = jnp.zeros((nT, R_MAX), jnp.int32)
    for r in range(R_MAX):
        m = run_ok & (range_of_run == r)
        rs = rs.at[:, r].set(jnp.min(jnp.where(m, as_, big_i), axis=1))
        re = re.at[:, r].set(jnp.max(jnp.where(m, ae_, 0), axis=1))
    # no per-range clipping: an oversized range must inflate n_chunks so
    # the tile fails `fast` and falls back (a clip would silently truncate)
    rlen = jnp.maximum(re - rs, 0)
    rlen = jnp.where(jnp.arange(R_MAX)[None, :] < n_ranges[:, None],
                     rlen, 0)
    prefix = jnp.cumsum(rlen, axis=1)
    n_chunks = prefix[:, -1]
    fast = box_ok & (n_ranges <= R_MAX) & (n_chunks <= kchunk)

    # expand ranges into the (nT, KCHUNK) chunk-id list
    j = jnp.arange(kchunk, dtype=jnp.int32)[None, :]
    run_of = jnp.zeros((nT, kchunk), jnp.int32)
    for r in range(R_MAX):
        run_of = run_of + (j >= prefix[:, r:r + 1]).astype(jnp.int32)
    run_of = jnp.minimum(run_of, R_MAX - 1)
    before = jnp.zeros((nT, kchunk), jnp.int32)
    startc = jnp.zeros((nT, kchunk), jnp.int32)
    for r in range(R_MAX):
        is_r = run_of == r
        if r > 0:
            before = jnp.where(is_r, prefix[:, r - 1:r], before)
        startc = jnp.where(is_r, rs[:, r:r + 1], startc)
    sentinel = tbl.shape[0] - 1
    cid = jnp.where((j < n_chunks[:, None]) & fast[:, None],
                    jnp.clip(startc + (j - before), 0, sentinel - 1),
                    sentinel)

    # ---- class partition: tiles pay for the work they actually have ----
    # empty (n_chunks == 0): no gather, no kernel — estimate is exactly 0
    # small (<= KCHUNK_S chunks): 1024-slot static kernel, 4x smaller gather
    # large (<= KCHUNK): 4096-slot kernel with dynamic block extent
    work = fast & (n_chunks > 0)
    if n_live is not None:
        # lanes past n_live are dead padding (pass-2 re-tiling): keep them
        # out of every class so they cost nothing
        work = work & ((jnp.arange(nT, dtype=jnp.int32) * tq) < n_live)
    is_small = work & (n_chunks <= KCHUNK_S)
    is_large = work & (n_chunks > KCHUNK_S)

    sb = min(TILE_SB, nT)
    n_sb = -(-nT // sb)
    q_t = q_s.reshape(nT, tq, 8).transpose(0, 2, 1)         # (nT, 8, tq)
    nb_of = -(-n_chunks // CHUNK_BLK)                        # dynamic extent
    est_rows = jnp.zeros((nT + 1, 8, tq), jnp.float32)       # +1 dummy row

    def class_pass(est_rows, mask, width):
        n_c = jnp.sum(mask.astype(jnp.int32))
        order_c = jnp.argsort(~mask, stable=True).astype(jnp.int32)
        cid_c = cid[:, :width]

        def run_block(t0):
            tid = jax.lax.dynamic_slice(order_c, (t0,), (sb,))
            live = (t0 + jnp.arange(sb, dtype=jnp.int32)) < n_c
            cand = tbl[cid_c[tid]].reshape(sb * width * 32, 16)
            qb = q_t[tid]                                    # (sb, 8, tq)
            fl = (live & mask[tid]).astype(jnp.int32)
            mpad = (-sb) % 8
            meta = jnp.pad(
                jnp.stack([fl, nb_of[tid]], axis=1), ((0, mpad), (0, 6)))
            out = _tile_blocks(meta, scal, qb.reshape(sb * 8, tq), cand,
                               k, (nx, ny, nz), tq, width, interpret)
            return out.reshape(sb, 8, tq), tid, live

        def step(carry, i):
            est_rows = carry
            t0 = jnp.minimum(i * sb, nT - sb)

            def computed():
                out, tid, live = run_block(t0)
                tid_safe = jnp.where(live, tid, nT)          # dummy slot
                return est_rows.at[tid_safe].set(out)

            return jax.lax.cond(t0 < n_c, computed, lambda: est_rows), None

        est_rows, _ = jax.lax.scan(step, est_rows, jnp.arange(n_sb))
        return est_rows

    if "nokernel" not in _ABLATE:
        est_rows = class_pass(est_rows, is_small, KCHUNK_S)
        est_rows = class_pass(est_rows, is_large, kchunk)
    est = est_rows[:nT].transpose(0, 2, 1).reshape(Rp, 8)[:, :3]
    return est, jnp.repeat(fast, tq)


def _fwd_impl(pm, point, direction, k, interpret):
    """Tile-shared chunk-gather forward pass.

    Pass 1 tiles the cell-sorted queries at TQ_T; tiles whose window box or
    chunk budget exceeds the caps (typically tiles straddling a z-order
    discontinuity) are re-tiled at TQ_T2 in pass 2; the residual goes to
    the per-point tiered path.
    """
    R = point.shape[0]
    dt = point.dtype
    nx, ny, nz = pm.dims
    dims_i = jnp.asarray([nx - 1, ny - 1, nz - 1], jnp.int32)

    p32 = point.astype(jnp.float32)
    d32 = direction.astype(jnp.float32)
    g = (p32 - pm.grid_min[None, :].astype(jnp.float32)) \
        * pm.inv_cell[None, :].astype(jnp.float32)
    cells = jnp.clip(g.astype(jnp.int32), 0, dims_i)        # (R, 3)

    order = jnp.argsort(_morton3(cells[:, 0], cells[:, 1], cells[:, 2]),
                        stable=True).astype(jnp.int32)
    pos_of = jnp.zeros_like(order).at[order].set(
        jnp.arange(R, dtype=jnp.int32), unique_indices=True)

    pad = (-R) % TQ_T
    Rp = R + pad

    def srt(x):
        y = x[order]
        widths = ((0, pad),) + ((0, 0),) * (y.ndim - 1)
        return jnp.pad(y, widths, mode="edge")

    q_s = jnp.concatenate([srt(p32), srt(d32),
                           jnp.zeros((Rp, 2), jnp.float32)], axis=1)
    cells_s = srt(cells)
    tbl = _pack_chunk_table(pm)
    scal = jnp.concatenate([pm.grid_min.astype(jnp.float32),
                            pm.inv_cell.astype(jnp.float32),
                            jnp.zeros(2, jnp.float32)]).reshape(1, 8)

    est1, fast1 = _tile_pass(pm, tbl, scal, q_s, cells_s, k, interpret, TQ_T)
    if "pass1" in _ABLATE:
        return est1[pos_of][:R].astype(dt)

    # ---- pass 2: re-tile pass-1 failures at TQ_T2 ----
    # stable-compact residual lanes to the front (keeps z-order), process
    # the first RES_CAP of them, everything beyond goes to the slow path
    res = ~fast1
    a = res.astype(jnp.int32)
    n_res = jnp.sum(a)
    c_t = jnp.cumsum(a) - a
    c_f = jnp.cumsum(1 - a) - (1 - a)
    dest = jnp.where(res, c_t, n_res + c_f)
    inv_dest = jnp.zeros((Rp,), jnp.int32).at[dest].set(
        jnp.arange(Rp, dtype=jnp.int32), unique_indices=True)  # dest -> lane

    RES_CAP = max((-(-Rp // RES_FRAC) + TQ_T2 - 1) // TQ_T2 * TQ_T2, TQ_T2)
    lane2 = inv_dest[:RES_CAP]
    live2 = jnp.arange(RES_CAP) < jnp.minimum(n_res, RES_CAP)
    # dead pass-2 lanes replicate lane 0 in the COMPUTE (harmless) but
    # scatter to a dummy slot so they can't clobber a live lane's result
    lane2 = jnp.where(live2, lane2, lane2[0])
    q2 = q_s[lane2]
    cells2 = cells_s[lane2]
    est2_c, fast2_c = _tile_pass(pm, tbl, scal, q2, cells2, k, interpret,
                                 TQ_T2, n_live=n_res, kchunk=KCHUNK2)
    fast2_c &= live2
    lane2_sc = jnp.where(live2, lane2, jnp.int32(Rp))
    est2 = jnp.zeros((Rp + 1, 3), jnp.float32).at[lane2_sc].set(
        jnp.where(fast2_c[:, None], est2_c, 0.0))[:Rp]
    fast2 = jnp.zeros((Rp + 1,), bool).at[lane2_sc].max(fast2_c)[:Rp]

    est_s = jnp.where(fast1[:, None], est1, est2)
    covered_s = fast1 | fast2

    # un-sort; uncovered lanes take the per-point tiered path
    est = est_s[pos_of]
    lane_ok = covered_s[pos_of]

    if "nores" in _ABLATE:
        return jnp.where(lane_ok[:, None], est, 0.0).astype(dt)
    res2 = ~lane_ok
    n_r2 = jnp.sum(res2.astype(jnp.int32))
    far = (pm.grid_min - 1e6 * jnp.maximum(
        1.0 / jnp.maximum(pm.inv_cell, 1e-20), 1.0)).astype(dt)

    # residual lanes (tiles whose box/chunk budget failed both passes) run
    # the CHUNK-ROW path on a compacted array: per-query <=CCAP whole-row
    # fetches — ~20x cheaper than the per-point tiered path the r4 residual
    # used (measured: the residual machinery was ~75% of the wave gather).
    # Dense-focal windows overflowing CCAP chunks fall through to the
    # reference path inside sample_photons_chunkrow itself.
    SLOW_CAP = min(RESIDUAL_CAP, R)
    a2 = res2.astype(jnp.int32)
    c2 = jnp.cumsum(a2) - a2

    def slow_at(cap_):
        # ccap=96 keeps whole 27-cell windows EXACT up to the photon map's
        # own per-cell occupancy bound (27 * 96 / 32 = 81 chunks + 9 run-
        # rounding spares); only denser/fragmented windows fall through to
        # the truncated reference path inside sample_photons_chunkrow
        def f():
            slot_ = jnp.where(res2, jnp.minimum(c2, cap_ - 1), cap_)
            ln = jnp.full((cap_ + 1,), -1, jnp.int32).at[slot_].set(
                jnp.arange(R, dtype=jnp.int32))[:cap_]
            lv = ln >= 0
            ln = jnp.maximum(ln, 0)
            p_r = jnp.where(lv[:, None], point[ln], far[None, :])
            d_r = direction[ln]
            e_r = sample_photons_chunkrow(pm, p_r, d_r, k,
                                          ccap=96).astype(jnp.float32)
            out = jnp.zeros((R + 1, 3), jnp.float32).at[
                jnp.where(lv, ln, R)].set(e_r)
            return out[:R]
        return f

    def slow_full():
        p_slow = jnp.where(res2[:, None], point, far[None, :])
        return _fwd_perpoint(pm, p_slow, direction, k,
                             interpret).astype(jnp.float32)

    # bucketed residual width: the call always costs its STATIC lane cap,
    # so a small residual (the common case) must not pay the big bucket
    CAP_SM = min(4096, R)
    CAP_MD = min(32768, R)
    est_slow = jax.lax.cond(
        n_r2 == 0, lambda: jnp.zeros((R, 3), jnp.float32),
        lambda: jax.lax.cond(
            n_r2 <= CAP_SM, slow_at(CAP_SM),
            lambda: jax.lax.cond(
                n_r2 <= CAP_MD, slow_at(CAP_MD),
                lambda: jax.lax.cond(n_r2 <= SLOW_CAP, slow_at(SLOW_CAP),
                                     slow_full))))
    out = jnp.where(lane_ok[:, None], est, est_slow)
    return out.astype(dt)
