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

Differentiability: the kernel is forward-only; a custom VJP replays the
(jnp) reference gather for the backward pass, so gradients to photon
positions/colors (and through them to light/material parameters) are the
same estimator gradients the baseline produces.
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
# lanes per scan super-block, per tier: bounds peak gather memory to
# ~40 MB while keeping the number of scan steps small
TIER_BLOCK_LANES = (32768, 8192, 2048)

_BIG = 3.0e38


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
    density with exact k-th radius); forward pass is the tiered Pallas
    kernel, backward (custom VJP) replays the jnp reference gather.
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
        from .photon import sample_photons
        pm, point, direction = res
        _, pull = jax.vjp(lambda pm_, p_, d_: sample_photons(pm_, p_, d_, k),
                          pm, point, direction)
        return pull(g)

    f.defvjp(fwd, bwd)
    return f


def _fwd_impl(pm, point, direction, k, interpret):
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
    pos_of = jnp.argsort(order).astype(jnp.int32)
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
