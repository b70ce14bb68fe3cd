"""Whole-bounce-loop Pallas megakernel: one device kernel per wave.

r3's profile (PERF.md) showed each radiance wave spending ~50% of its time
in ~60 XLA glue fusions between the trace kernels — shade, secondary,
direct light, Russian roulette — each a full HBM round trip at the
platform's measured ~20 GB/s effective fusion bandwidth.  The megakernel
removes that traffic entirely: for a tile of 256 rays the ENTIRE bounce
loop (closest-hit trace, winner-attribute extraction, shading, secondary
direction, shadow trace + direct light, Russian roulette, accumulation)
runs inside one kernel with all path state resident in registers/VMEM.
HBM sees one read of the primary rays + QMC samples and one write of the
radiance (plus optional caustic query records) per wave.

Layout: rays on LANES, triangles on SUBLANES — all per-ray shading math is
dense (1, 256) row vectors; per-chunk intersection math is (128, 256)
planes; winner attributes are extracted with an MXU contraction
(chunk_attr^T (128, 64) x onehot (128, 256) -> (64, 256)) so the per-bounce
"gather" costs one small matmul per visited chunk instead of an HBM gather.

The traversal strategy mirrors ops.pallas_intersect (reference
include/raytracer.h:446-472, octree.cpp:285-313 equivalents): per-tile
conservative chunk culling, ascending-entry visit order (iterative argmin),
collective t-cap shrink with sorted early exit.  Shading/secondary/light
math mirrors render.shading / render.integrator line for line (reference
include/raytracer.h:167-379,481-506); stochastic streams replay
sampling.rng.hash_u01 bit-exactly.

Scope (callers gate on this): triangle-only scenes, no fog, no image
textures, <= 4 lights, <= MEGA_TRI_CAP triangles, float32.  Everything else
uses the staged integrator path.  Not differentiable (renders only).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RT = 256          # rays per tile (lane axis; two 128-lane groups)
CK = 128          # triangles per chunk (sublane axis)
MEGA_TRI_CAP = 24_000   # (T, 64) f32 attr table must fit VMEM
ATTR_W = 64       # packed shade-row width (shading.PR_W)
SHRINK_EVERY = 4
LINEAR_CHUNK_CAP = 32   # <= this many chunks: static linear traversal
                        # (measured faster than the ordered walk, PERF.md)

_BIG = 3.0e38
_IMAX = 2147483647
_PI = 3.141592653589793


# ---------------------------------------------------------------------------
# in-kernel helpers (all operate on f32 rows (1, RT) / planes (CK, RT))
# ---------------------------------------------------------------------------

def _mixk(h):
    h = h.astype(jnp.uint32)
    h ^= h >> 16
    h *= jnp.uint32(0x85EBCA6B)
    h ^= h >> 13
    h *= jnp.uint32(0xC2B2AE35)
    h ^= h >> 16
    return h


def _hash_u01(a, b, c):
    """Bit-exact replay of sampling.rng.hash_u01."""
    h = _mixk(a.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
              ^ _mixk(jnp.uint32(b) + jnp.uint32(0x7F4A7C15) ^ _mixk(c)))
    return ((h >> 8).astype(jnp.int32).astype(jnp.float32)
            * jnp.float32(5.960464477539063e-08))


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _cross3(ax, ay, az, bx, by, bz):
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _normalize3(x, y, z, eps=1e-30):
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, eps))
    return x * inv, y * inv, z * inv


def _frame_apply(nx, ny, nz, lx, ly, lz):
    """geom._frame_apply (reference util.cpp:35-58), componentwise."""
    z = jnp.abs(nz)
    inv = 1.0 / (1.0 + z)
    ox = lx * (z + ny * ny * inv) + ly * (-nx * ny * inv) + lz * nx
    oy = lx * (-nx * ny * inv) + ly * (z + nx * nx * inv) + lz * ny
    oz = lx * (-nx) + ly * (-ny) + lz * z
    flip = jnp.where(nz < 0, -1.0, 1.0)
    return ox, oy, oz * flip


def _cos_power_local(u, v, inv_power):
    """geom._cos_power_local with power passed as its reciprocal."""
    phi = v * jnp.float32(2.0 * _PI)
    cos_t = jnp.power(jnp.maximum(1.0 - u, 0.0), inv_power)
    sin2 = jnp.maximum(1.0 - cos_t * cos_t, 0.0)
    sin_t = jnp.sqrt(sin2)
    return jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t


def _reflect(ix, iy, iz, nx, ny, nz):
    d = _dot3(nx, ny, nz, ix, iy, iz)
    return ix - 2.0 * d * nx, iy - 2.0 * d * ny, iz - 2.0 * d * nz


# ---------------------------------------------------------------------------
# traversal (shared by closest-hit and shadow any-hit)
# ---------------------------------------------------------------------------

def _tile_cull(cbox_ref, act, rox, roy, roz, rdx, rdy, rdz, t_eff,
               n_chunks, ncp, diag):
    """Conservative per-tile chunk entry bounds (pallas_intersect._chunk_cull
    per-tile branch) -> (1, ncp) entry distances, BIG where prunable."""
    big = jnp.float32(_BIG)

    def mm(v, pad_lo, pad_hi):
        lo = jnp.min(jnp.where(act, v, pad_lo))
        hi = jnp.max(jnp.where(act, v, pad_hi))
        return lo, hi

    olx, ohx = mm(rox, big, -big)
    oly, ohy = mm(roy, big, -big)
    olz, ohz = mm(roz, big, -big)
    dlx = jnp.min(jnp.where(act, rdx, 0.0))
    dhx = jnp.max(jnp.where(act, rdx, 0.0))
    dly = jnp.min(jnp.where(act, rdy, 0.0))
    dhy = jnp.max(jnp.where(act, rdy, 0.0))
    dlz = jnp.min(jnp.where(act, rdz, 0.0))
    dhz = jnp.max(jnp.where(act, rdz, 0.0))
    t_cap = jnp.clip(jnp.max(jnp.where(act, t_eff, -big)), 0.0, diag)

    lox = cbox_ref[0:1, :]
    loy = cbox_ref[1:2, :]
    loz = cbox_ref[2:3, :]
    hix = cbox_ref[3:4, :]
    hiy = cbox_ref[4:5, :]
    hiz = cbox_ref[5:6, :]

    rlx = olx + t_cap * jnp.minimum(dlx, 0.0)
    rhx = ohx + t_cap * jnp.maximum(dhx, 0.0)
    rly = oly + t_cap * jnp.minimum(dly, 0.0)
    rhy = ohy + t_cap * jnp.maximum(dhy, 0.0)
    rlz = olz + t_cap * jnp.minimum(dlz, 0.0)
    rhz = ohz + t_cap * jnp.maximum(dhz, 0.0)
    overlap = ((lox <= rhx) & (hix >= rlx) & (loy <= rhy) & (hiy >= rly)
               & (loz <= rhz) & (hiz >= rlz))
    gx = jnp.maximum(jnp.maximum(lox - ohx, olx - hix), 0.0)
    gy = jnp.maximum(jnp.maximum(loy - ohy, oly - hiy), 0.0)
    gz = jnp.maximum(jnp.maximum(loz - ohz, olz - hiz), 0.0)
    ent = jnp.sqrt(gx * gx + gy * gy + gz * gz)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, ncp), 1)
    entry = jnp.where(overlap & (ent <= t_cap) & (lane < n_chunks), ent, big)
    return entry, t_cap


def _trace_tile(attr_ref, feat_ref, cbox_ref, act, rid_u32, salt_u32,
                rox, roy, roz, rdx, rdy, rdz, t_lim,
                *, n_chunks, ncp, diag, eps, all_opaque, any_hit,
                want_attrs, ablate=()):
    """Closest-hit (want_attrs=True -> also the winner's (64, RT) shade
    rows) or any-hit trace for one ray tile.  Returns
    (best_t (1,RT), pid (1,RT) i32, rows (64,RT) | None)."""
    big = jnp.float32(_BIG)
    t_eff = jnp.where(act, jnp.minimum(t_lim, diag), -big)
    entry, cap0 = _tile_cull(cbox_ref, act, rox, roy, roz, rdx, rdy, rdz,
                             t_eff, n_chunks, ncp, diag)
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (1, ncp), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (CK, RT), 0)
    eps_h = jnp.float32(eps)

    cxx = roy * rdz - roz * rdy                       # ro x rd, (1, RT)
    cxy = roz * rdx - rox * rdz
    cxz = rox * rdy - roy * rdx

    def test_chunk(c, best_t, pid):
        """Slot-wise update: best_t/pid are (CK, RT) — slot s tracks the
        best among tris {c*CK+s : c visited}.  No cross-sublane reductions
        in the hot loop (the staged kernel's trick); the per-ray winner is
        reduced once at the end and at t-cap shrinks.  The MT features
        (n2 = e1 x e2, fu = v0 x e2, fv = v0 x e1, d0 = v0.n2) are
        PRE-DERIVED on the host (build_mega_tables): deriving them here per
        visit cost ~650 mostly-idle (CK, 1) vreg-ops per chunk test — the
        bulk of r4's unexplained ~250 ms/wave trace floor (PERF.md r5
        ablation table)."""
        f = feat_ref[pl.ds(c * CK, CK), :]            # (CK, 16)
        n2x = f[:, 0:1]
        n2y = f[:, 1:2]
        n2z = f[:, 2:3]
        fux = f[:, 3:4]
        fuy = f[:, 4:5]
        fuz = f[:, 5:6]
        fvx = f[:, 6:7]
        fvy = f[:, 7:8]
        fvz = f[:, 8:9]
        d0 = f[:, 9:10]
        e1x = f[:, 10:11]
        e1y = f[:, 11:12]
        e1z = f[:, 12:13]
        e2x = f[:, 13:14]
        e2y = f[:, 14:15]
        e2z = f[:, 15:16]

        m = rdx * n2x + rdy * n2y + rdz * n2z         # (CK, RT)
        sm = jnp.where(m >= 0.0, 1.0, -1.0)
        ds = m * sm
        ns = -sm
        u_num = (cxx * e2x + cxy * e2y + cxz * e2z
                 + rdx * fux + rdy * fuy + rdz * fuz)
        v_sum = (cxx * e1x + cxy * e1y + cxz * e1z
                 + rdx * fvx + rdy * fvy + rdz * fvz)
        t_num = (rox * n2x + roy * n2y + roz * n2z) - d0
        us = u_num * ns
        vs = v_sum * sm
        ts = t_num * ns
        ok = ((ds >= eps_h) & (us >= 0.0) & (vs >= 0.0)
              & (us + vs <= ds) & (ts > 0.0))
        tc = ts * pl.reciprocal(jnp.maximum(ds, 1e-30), approx=True)
        ok &= (tc < t_eff) & (tc < best_t)

        if not all_opaque:
            a = attr_ref[pl.ds(c * CK, CK), :]        # (CK, 64)
            accept = jnp.where(a[:, 30:31] != 1.0, 1.0, a[:, 29:30])
            prim_g = (c.astype(jnp.uint32) * jnp.uint32(CK)
                      + sub.astype(jnp.uint32))
            h = _mixk(rid_u32 * jnp.uint32(0x9E3779B9)
                      ^ _mixk(prim_g + jnp.uint32(0x7F4A7C15) ^ salt_u32))
            uni = ((h >> 8).astype(jnp.int32).astype(jnp.float32)
                   * jnp.float32(5.960464477539063e-08))
            ok &= (uni < accept) | (accept >= 1.0)

        tt = jnp.where(ok, tc, big)
        better = tt < best_t
        best_t = jnp.where(better, tt, best_t)
        pid = jnp.where(better, c * jnp.int32(CK) + sub, pid)
        return best_t, pid

    def shrink(best_t_slots, t_cap):
        per_ray = jnp.min(best_t_slots, axis=0, keepdims=True)
        if any_hit:
            need = act & (per_ray >= big)
            return jnp.max(jnp.where(need, t_eff, -big))
        return jnp.max(jnp.where(act, jnp.minimum(per_ray, t_eff), -big))

    init = (jnp.int32(0), entry, cap0,
            jnp.full((CK, RT), big, jnp.float32),
            jnp.full((CK, RT), -1, jnp.int32))

    def cond(carry):
        _, entry, t_cap, *_ = carry
        return jnp.min(entry) <= t_cap

    def body(carry):
        i, entry, t_cap, best_t, pid = carry
        me = jnp.min(entry)
        c = jnp.min(jnp.where(entry <= me, lane_c, jnp.int32(_IMAX)))
        best_t, pid = test_chunk(c, best_t, pid)
        entry = jnp.where(lane_c == c, big, entry)
        if "no_shrink" in ablate:
            new_cap = t_cap
        else:
            new_cap = jax.lax.cond(
                (i % SHRINK_EVERY) == (SHRINK_EVERY - 1),
                lambda: jnp.minimum(t_cap, shrink(best_t, t_cap)),
                lambda: t_cap)
        return i + 1, entry, new_cap, best_t, pid

    # Traversal policy (static per compile): small scenes take the LINEAR
    # walk — every chunk tested in index order by a static fori_loop.  The
    # r5 on-device ablation (PERF.md) measured the ordered walk's per-
    # iteration machinery (argmin entry selection, dynamic while trip
    # count, shrink cond) costing MORE than the chunk tests it prunes on
    # an 18-chunk scene: 426 -> 302 ms/wave.  A static-bound loop lets
    # Mosaic pipeline the body; the dynamic ordered walk serializes it.
    # Bigger scenes keep the ordered walk (pruning wins at 100+ chunks).
    use_linear = ("linear" in ablate
                  or (n_chunks <= LINEAR_CHUNK_CAP
                      and "ordered" not in ablate))
    if use_linear:
        def lin_body(c, carry):
            best_t, pid = carry
            return test_chunk(c, best_t, pid)

        def lin_run():
            return jax.lax.fori_loop(
                0, n_chunks, lin_body, (init[3], init[4]))

        # whole-tile skip: a tile with no active lanes costs one reduction
        best_ts, pids = jax.lax.cond(
            jnp.any(act), lin_run, lambda: (init[3], init[4]))
    else:
        _, _, _, best_ts, pids = jax.lax.while_loop(cond, body, init)

    # per-ray winner: smallest t, ties broken by smallest global pid
    # (identical to the staged kernel's final reduction)
    tmin = jnp.min(best_ts, axis=0, keepdims=True)            # (1, RT)
    pid_c = jnp.where((best_ts <= tmin) & (pids >= 0), pids,
                      jnp.int32(_IMAX))
    pmin = jnp.min(pid_c, axis=0, keepdims=True)
    pid = jnp.where(pmin == jnp.int32(_IMAX), jnp.int32(-1), pmin)

    rows = None
    if want_attrs:
        # extraction re-walk: one one-hot MXU contraction per DISTINCT
        # winner chunk (a handful per tile) instead of per visited chunk
        win_chunk = jnp.where(pid >= 0, pid // jnp.int32(CK), -1)  # (1, RT)
        last = jnp.max(win_chunk)

        def ex_body(c, rows):
            def hit():
                a = attr_ref[pl.ds(c * CK, CK), :]
                onehot = ((sub == (pid - c * jnp.int32(CK)))
                          & (win_chunk == c)).astype(jnp.float32)
                # HIGHEST precision: the default TPU matmul truncates
                # inputs to bf16, corrupting extracted geometry (~1e-2 on
                # unit-scale vertices) and breaking the exact MT recompute
                new_rows = jax.lax.dot_general(
                    a, onehot, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)      # (64, RT)
                return jnp.where(win_chunk == c, new_rows, rows)

            return jax.lax.cond(jnp.any(win_chunk == c), hit, lambda: rows)

        rows = jax.lax.fori_loop(
            0, last + 1, ex_body, jnp.zeros((ATTR_W, RT), jnp.float32))

    return tmin, pid, rows


# ---------------------------------------------------------------------------
# the megakernel
# ---------------------------------------------------------------------------

def _mega_kernel(meta_ref, scal_ref, lights_ref, rays_ref, rid_ref,
                 attr_ref, feat_ref, cbox_ref, out_ref, *caustic_out,
                 n_chunks, ncp, D, L, eps, shadow_bias, min_depth,
                 ambient, all_opaque, with_caustic, caustic_max_depth,
                 has_checker, ablate=()):
    """Grid (n_tiles,).  Refs:
    meta SMEM (1, 8) i32: [wave_salt]
    scal SMEM (1, 8) f32: [diag]
    lights SMEM (8, 8) f32 rows: [px,py,pz, cr,cg,cb, rad, 0]
    rays (40, RT) f32: rows 0-2 ro, 3-5 rd, 6..6+D sx, 22..22+D sy
    rid (1, RT) i32 global lane ids
    attr (T_pad, 64) f32 packed shade rows (shading.PR_* layout)
    feat (T_pad, 16) f32 host-derived MT features (build_mega_tables)
    cbox (8, ncp) f32 chunk bounds
    out (8, RT) f32: rows 0-2 radiance, 3 closest count, 4 shadow count
    caustic_out[0] (roundup(9D, 8), RT) f32: rows 3d+[0..3) point,
        3D+3d+[0..3) dir, 6D+3d+[0..3) weight
    ablate: static perf-probe stage deletions (scripts/ablate_mega.py);
        () in production
    """
    salt0 = meta_ref[0, 0].astype(jnp.uint32)
    diag = scal_ref[0, 1]
    big = jnp.float32(_BIG)
    f32 = jnp.float32

    rox = rays_ref[0:1, :]
    roy = rays_ref[1:2, :]
    roz = rays_ref[2:3, :]
    rdx = rays_ref[3:4, :]
    rdy = rays_ref[4:5, :]
    rdz = rays_ref[5:6, :]
    rid_u32 = rid_ref[0:1, :].astype(jnp.uint32)

    ones = jnp.ones((1, RT), f32)
    zeros = jnp.zeros((1, RT), f32)

    tx = ty = tz = ones          # throughput
    cx = cy = cz = ones          # contrib (RR driver)
    radx = rady = radz = zeros
    alive = jnp.ones((1, RT), jnp.bool_)
    cnt_closest = zeros
    cnt_shadow = zeros

    def decision_u(purpose, salt):
        return _hash_u01(rid_u32, jnp.uint32(0x80000000) ^ jnp.uint32(purpose),
                         salt)

    for d in range(D):
        salt = salt0 + jnp.uint32(d) * jnp.uint32(31337)
        u_rr = decision_u(3, salt)    # Purpose.RUSSIAN_ROULETTE
        u_op = decision_u(4, salt)    # Purpose.RAY_TYPE_OPACITY
        u_fs = decision_u(5, salt)    # Purpose.RAY_TYPE_FRESNEL

        # ---- closest-hit trace + winner shade rows ----
        if "fixed_hit" in ablate:
            # ablation probe: skip the closest trace; every alive lane
            # "hits" triangle 0 at t=1 so the rest of the bounce runs with
            # realistic control flow
            best_t = jnp.ones((1, RT), f32)
            pid = jnp.zeros((1, RT), jnp.int32)
            a0 = attr_ref[pl.ds(0, CK), :]
            onehot0 = (jax.lax.broadcasted_iota(jnp.int32, (CK, RT), 0)
                       == 0).astype(f32)
            rows = jax.lax.dot_general(
                a0, onehot0, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        else:
            best_t, pid, rows = _trace_tile(
                attr_ref, feat_ref, cbox_ref, alive, rid_u32, salt,
                rox, roy, roz, rdx, rdy, rdz, jnp.full((1, RT), big, f32),
                n_chunks=n_chunks, ncp=ncp, diag=diag, eps=eps,
                all_opaque=all_opaque, any_hit=False, want_attrs=True,
                ablate=ablate)

        # exact MT recompute from the winner's row (pallas_intersect
        # _exact_hit semantics; differentiability is not needed here)
        v0x = rows[0:1, :]
        v0y = rows[1:2, :]
        v0z = rows[2:3, :]
        e1x = rows[3:4, :]
        e1y = rows[4:5, :]
        e1z = rows[5:6, :]
        e2x = rows[6:7, :]
        e2y = rows[7:8, :]
        e2z = rows[8:9, :]
        px, py, pz = _cross3(rdx, rdy, rdz, e2x, e2y, e2z)
        det = _dot3(e1x, e1y, e1z, px, py, pz)
        okx = jnp.abs(det) >= jnp.float32(eps)
        inv_det = jnp.where(okx, 1.0 / jnp.where(okx, det, 1.0), 0.0)
        tvx = rox - v0x
        tvy = roy - v0y
        tvz = roz - v0z
        bu = _dot3(tvx, tvy, tvz, px, py, pz) * inv_det
        qx, qy, qz = _cross3(tvx, tvy, tvz, e1x, e1y, e1z)
        bv = _dot3(rdx, rdy, rdz, qx, qy, qz) * inv_det
        t_ex = _dot3(e2x, e2y, e2z, qx, qy, qz) * inv_det
        okx &= (bu >= 0) & (bu <= 1) & (bv >= 0) & (bu + bv <= 1) & (t_ex > 0)
        hit_valid = (pid >= 0) & okx
        if "fixed_hit" in ablate:   # probe: keep every alive lane hitting
            hit_valid = alive
        t_safe = jnp.where(hit_valid, t_ex, 0.0)

        # ---- shading (shade_from_rows, triangle lanes only) ----
        pxw = rox + t_safe * rdx
        pyw = roy + t_safe * rdy
        pzw = roz + t_safe * rdz
        has_vn = rows[27:28, :] > 0.5
        w0 = 1.0 - bu - bv
        nix = w0 * rows[9:10, :] + bu * rows[12:13, :] + bv * rows[15:16, :]
        niy = w0 * rows[10:11, :] + bu * rows[13:14, :] + bv * rows[16:17, :]
        niz = w0 * rows[11:12, :] + bu * rows[14:15, :] + bv * rows[17:18, :]
        nx = jnp.where(has_vn, nix, rows[24:25, :])
        ny = jnp.where(has_vn, niy, rows[25:26, :])
        nz = jnp.where(has_vn, niz, rows[26:27, :])
        uu = w0 * rows[18:19, :] + bu * rows[20:21, :] + bv * rows[22:23, :]
        vv = w0 * rows[19:20, :] + bu * rows[21:22, :] + bv * rows[23:24, :]
        uu = jnp.where(has_vn, uu, 0.0)
        vv = jnp.where(has_vn, vv, 0.0)

        rough = rows[28:29, :]
        opac = rows[29:30, :]
        ior = rows[30:31, :]

        def tex_eval(base):
            kind = rows[base:base + 1, :]
            c0x = rows[base + 8:base + 9, :]
            c0y = rows[base + 9:base + 10, :]
            c0z = rows[base + 10:base + 11, :]
            if not has_checker:
                return c0x, c0y, c0z
            tlu = rows[base + 6:base + 7, :]
            tlv = rows[base + 7:base + 8, :]
            iu = jnp.trunc(uu * tlu)
            iv = jnp.trunc(vv * tlv)
            even = ((jnp.abs(iu) % 2.0 < 0.5) ^ (jnp.abs(iv) % 2.0 < 0.5))
            is_chk = kind == 1.0     # TEX_CHECKER
            cax = jnp.where(even, c0x, rows[base + 11:base + 12, :])
            cay = jnp.where(even, c0y, rows[base + 12:base + 13, :])
            caz = jnp.where(even, c0z, rows[base + 13:base + 14, :])
            return (jnp.where(is_chk, cax, c0x),
                    jnp.where(is_chk, cay, c0y),
                    jnp.where(is_chk, caz, c0z))

        colx, coly, colz = tex_eval(31)     # PR_TEXD
        emx, emy, emz = tex_eval(45)        # PR_TEXE
        alpha = opac                        # const/checker tex alpha == 1

        # ---- secondary ray (shading.secondary_ray) ----
        backface = _dot3(nx, ny, nz, rdx, rdy, rdz) > 0
        fnx = jnp.where(backface, -nx, nx)
        fny = jnp.where(backface, -ny, ny)
        fnz = jnp.where(backface, -nz, nz)
        r0 = ((1.0 - ior) / (1.0 + ior)) ** 2
        rfx, rfy, rfz = _reflect(rdx, rdy, rdz, fnx, fny, fnz)
        fs = r0 + (1.0 - r0) * (1.0 - _dot3(rfx, rfy, rfz,
                                            fnx, fny, fnz)) ** 5
        typ = jnp.full((1, RT), 2, jnp.int32)
        typ = jnp.where(rough < 0.001, 0, typ)
        lottery = u_op > alpha
        typ = jnp.where(lottery, jnp.where(u_fs < fs, 0, 1), typ)

        eta = jnp.where(backface, ior, 1.0 / ior)
        dn = _dot3(fnx, fny, fnz, rdx, rdy, rdz)
        kk = 1.0 - eta * eta * (1.0 - dn * dn)
        tir = kk < jnp.float32(1e-5)
        sq = jnp.sqrt(jnp.maximum(kk, 0.0))
        rxx = eta * rdx - (eta * dn + sq) * fnx
        rxy = eta * rdy - (eta * dn + sq) * fny
        rxz = eta * rdz - (eta * dn + sq) * fnz
        refx = jnp.where(tir, rfx, rxx)
        refy = jnp.where(tir, rfy, rxy)
        refz = jnp.where(tir, rfz, rxz)

        sx = rays_ref[6 + d:7 + d, :]
        sy = rays_ref[22 + d:23 + d, :]
        dlx, dly, dlz = _cos_power_local(sx, sy, jnp.float32(0.5))
        ddx, ddy, ddz = _frame_apply(fnx, fny, fnz, dlx, dly, dlz)
        inv_pow = 1.0 / (1.0 / jnp.maximum(rough, 1e-6) + 1.0)
        plx, ply, plz = _cos_power_local(sx, sy, inv_pow)
        phx, phy, phz = _frame_apply(rfx, rfy, rfz, plx, ply, plz)
        below = _dot3(phx, phy, phz, fnx, fny, fnz) < 0
        pr_x, pr_y, pr_z = _reflect(phx, phy, phz, fnx, fny, fnz)
        phx = jnp.where(below, pr_x, phx)
        phy = jnp.where(below, pr_y, phy)
        phz = jnp.where(below, pr_z, phz)
        glossy = rough < 0.9
        gx = jnp.where(glossy, phx, ddx)
        gy = jnp.where(glossy, phy, ddy)
        gz = jnp.where(glossy, phz, ddz)

        is_refr = typ == 1
        is_mirr = typ == 0
        ox = jnp.where(is_refr, refx, jnp.where(is_mirr, rfx, gx))
        oy = jnp.where(is_refr, refy, jnp.where(is_mirr, rfy, gy))
        oz = jnp.where(is_refr, refz, jnp.where(is_mirr, rfz, gz))
        fx, fy, fz = colx, coly, colz
        ncx = jnp.where(typ == 2, 0.5 * (cx * colx + colx), 1.0)
        ncy = jnp.where(typ == 2, 0.5 * (cy * coly + coly), 1.0)
        ncz = jnp.where(typ == 2, 0.5 * (cz * colz + colz), 1.0)
        offset_sign = jnp.where(is_refr, -1.0, 1.0)

        valid = alive & hit_valid

        # ---- direct light (integrator._direct_light) ----
        idx_ = idy_ = idz_ = zeros
        bias = jnp.float32(shadow_bias)
        for li in range(L):
            lpx = lights_ref[li, 0]
            lpy = lights_ref[li, 1]
            lpz = lights_ref[li, 2]
            lcr = lights_ref[li, 3]
            lcg = lights_ref[li, 4]
            lcb = lights_ref[li, 5]
            lrad = lights_ref[li, 6]
            ux = decision_u(1 + 16 * li, salt)     # LIGHT_POINT_X + 16li
            uy = decision_u(2 + 16 * li, salt)
            # random_unit_vec(ux, uy)
            zz = jnp.clip(2.0 * uy - 1.0, -1.0, 1.0)
            st = jnp.sqrt(jnp.maximum(1.0 - zz * zz, 0.0))
            svx = st * jnp.cos(jnp.float32(2.0 * _PI) * ux)
            svy = st * jnp.sin(jnp.float32(2.0 * _PI) * ux)
            svz = zz
            lpx_s = lpx + lrad * svx
            lpy_s = lpy + lrad * svy
            lpz_s = lpz + lrad * svz
            sox = pxw + bias * fnx
            soy = pyw + bias * fny
            soz = pzw + bias * fnz
            ldx = lpx_s - sox
            ldy = lpy_s - soy
            ldz = lpz_s - soz
            max_t2 = ldx * ldx + ldy * ldy + ldz * ldz
            t_lim = jnp.sqrt(max_t2) - bias
            lnx, lny, lnz = _normalize3(ldx, ldy, ldz, 1e-30)
            sh_salt = salt + jnp.uint32(7919 * (li + 1))
            if "no_shadow" in ablate:   # probe: all shadow rays unoccluded
                occ = jnp.zeros((1, RT), jnp.bool_)
            else:
                occ_t, occ_pid, _ = _trace_tile(
                    attr_ref, feat_ref, cbox_ref, valid, rid_u32, sh_salt,
                    sox, soy, soz, lnx, lny, lnz, t_lim,
                    n_chunks=n_chunks, ncp=ncp, diag=diag, eps=eps,
                    all_opaque=all_opaque, any_hit=True, want_attrs=False,
                    ablate=ablate)
                occ = occ_pid >= 0
            tolx = lpx - pxw
            toly = lpy - pyw
            tolz = lpz - pzw
            tnx, tny, tnz = _normalize3(tolx, toly, tolz, 1e-30)
            dd = jnp.maximum(_dot3(fnx, fny, fnz, tnx, tny, tnz), 0.0)
            d_pos = dd > 0
            d_safe = jnp.where(d_pos, dd, 1.0)
            l_term = jnp.where(
                d_pos, jnp.power(d_safe, 1.0 / jnp.maximum(rough, 1e-12)),
                0.0)
            hfrac = 1.0 / (jnp.float32(_PI)
                           * (tolx * tolx + toly * toly + tolz * tolz))
            gain = jnp.where(occ, 0.0, l_term * hfrac)
            idx_ = idx_ + lcr * gain
            idy_ = idy_ + lcg * gain
            idz_ = idz_ + lcb * gain

        # ---- Russian roulette + accumulate (raytracer.h:263-272) ----
        q = jnp.maximum(ncx, jnp.maximum(ncy, ncz))
        if d <= min_depth:      # static unroll: branch resolved per bounce
            survive = jnp.ones((1, RT), jnp.bool_)
            boost = jnp.float32(1.0)
        else:
            survive = u_rr < q
            boost = 1.0 / jnp.maximum(q, 1e-12)

        vmask = valid.astype(f32)
        vs_mask = (valid & survive).astype(f32)
        miss = (alive & ~hit_valid).astype(f32)
        radx = radx + vmask * tx * colx * idx_ + vs_mask * tx * emx \
            + miss * tx * jnp.float32(ambient[0])
        rady = rady + vmask * ty * coly * idy_ + vs_mask * ty * emy \
            + miss * ty * jnp.float32(ambient[1])
        radz = radz + vmask * tz * colz * idz_ + vs_mask * tz * emz \
            + miss * tz * jnp.float32(ambient[2])

        if with_caustic:
            pb, db, wb = 3 * d, 3 * D + 3 * d, 6 * D + 3 * d
            if d <= caustic_max_depth:
                qv = valid & survive
                far = jnp.float32(1e30)
                caustic_out[0][pb:pb + 1, :] = jnp.where(qv, pxw, far)
                caustic_out[0][pb + 1:pb + 2, :] = jnp.where(qv, pyw, far)
                caustic_out[0][pb + 2:pb + 3, :] = jnp.where(qv, pzw, far)
                caustic_out[0][db:db + 1, :] = ox
                caustic_out[0][db + 1:db + 2, :] = oy
                caustic_out[0][db + 2:db + 3, :] = oz
                qw = vs_mask
                caustic_out[0][wb:wb + 1, :] = qw * tx * colx
                caustic_out[0][wb + 1:wb + 2, :] = qw * ty * coly
                caustic_out[0][wb + 2:wb + 3, :] = qw * tz * colz
            else:
                # depths past the caustic gate still need their rows
                # INITIALIZED (far point, zero weight): the host sums over
                # all D query rows, and caustic_max_depth < max_depth - 1 is
                # a legal config — uninitialized VMEM here corrupted
                # radiance (r4 advisor finding)
                for base in (pb, db, wb):
                    fill = jnp.full((1, RT), 1e30, f32) if base == pb \
                        else zeros
                    for rr in range(base, base + 3):
                        caustic_out[0][rr:rr + 1, :] = fill

        cnt_closest = cnt_closest + alive.astype(f32)
        cnt_shadow = cnt_shadow + jnp.float32(L) * vmask

        tx = tx * fx * boost
        ty = ty * fy * boost
        tz = tz * fz * boost
        cx, cy, cz = ncx, ncy, ncz
        alive = valid & survive
        rox = pxw + offset_sign * bias * fnx
        roy = pyw + offset_sign * bias * fny
        roz = pzw + offset_sign * bias * fnz
        rdx, rdy, rdz = ox, oy, oz

    out_ref[0:1, :] = radx
    out_ref[1:2, :] = rady
    out_ref[2:3, :] = radz
    out_ref[3:4, :] = cnt_closest
    out_ref[4:5, :] = cnt_shadow
    out_ref[5:8, :] = jnp.zeros((3, RT), f32)
    if with_caustic:
        CR = -(-9 * D // 8) * 8
        for r in range(9 * D, CR):   # alignment pad rows
            caustic_out[0][r:r + 1, :] = zeros


# ---------------------------------------------------------------------------
# host-side wrapper
# ---------------------------------------------------------------------------

def mega_eligible(scene, cfg) -> bool:
    """Static gate: scenes the megakernel handles (callers fall back to the
    staged integrator otherwise)."""
    return not mega_why_not(scene, cfg)


def mega_why_not(scene, cfg) -> list:
    """The failed eligibility conditions, as human-readable strings
    (empty = eligible)."""
    why = []
    if not (0 < scene.n_tris <= MEGA_TRI_CAP):
        why.append(f"n_tris {scene.n_tris} not in (0, {MEGA_TRI_CAP}]")
    if scene.n_spheres != 0:
        why.append(f"{scene.n_spheres} analytic spheres")
    if getattr(scene, "n_cones", 0) != 0:
        why.append(f"{scene.n_cones} analytic cones")
    if scene.has_fog:
        why.append("fog")
    if scene.has_image_tex:
        why.append("image textures")
    if scene.lights.count > 4:
        why.append(f"{scene.lights.count} lights > 4")
    if cfg.dtype != "float32":
        why.append(f"dtype {cfg.dtype}")
    if cfg.max_depth > 16:
        why.append(f"max_depth {cfg.max_depth} > 16")
    return why


def build_mega_tables(scene):
    """(T_pad, 64) attr table (shading.build_prim_rows + safe padding),
    (T_pad, 16) derived MT-feature table, and (8, ncp) chunk bounds
    (pallas_intersect.build_tri_features cbox).

    The feature table carries [n2 (e1 x e2), fu (v0 x e2), fv (v0 x e1),
    d0 (v0.n2), e1, e2] per triangle — everything the separable MT test
    consumes — so the kernel's chunk-test loop never touches the 64-wide
    attr rows nor re-derives cross products per visit (PERF.md r5)."""
    from ..render.shading import build_prim_rows
    from .pallas_intersect import build_tri_features

    rows = build_prim_rows(scene).astype(jnp.float32)    # (T, 64)
    T = rows.shape[0]
    pad = (-T) % CK
    if pad:
        # pad rows must never be accepted: ior=1, opacity=0 -> accept=0;
        # degenerate geometry (all zeros) never passes the MT test either
        prow = jnp.zeros((pad, rows.shape[1]), jnp.float32)
        prow = prow.at[:, 30].set(1.0)   # PR_IOR
        rows = jnp.concatenate([rows, prow], axis=0)

    v0 = rows[:, 0:3]
    e1 = rows[:, 3:6]
    e2 = rows[:, 6:9]
    n2 = jnp.cross(e1, e2)
    fu = jnp.cross(v0, e2)
    fv = jnp.cross(v0, e1)
    d0 = jnp.sum(v0 * n2, axis=1, keepdims=True)
    feat = jnp.concatenate([n2, fu, fv, d0, e1, e2], axis=1)  # (T_pad, 16)

    _, cbox = build_tri_features(scene)
    ncp = -(-cbox.shape[1] // 128) * 128
    cbox = jnp.pad(cbox.astype(jnp.float32), ((0, 0), (0, ncp - cbox.shape[1])),
                   constant_values=0.0)
    return rows, feat, cbox


@functools.partial(
    jax.jit,
    static_argnames=("D", "L", "eps", "shadow_bias", "min_depth", "ambient",
                     "all_opaque", "with_caustic", "caustic_max_depth",
                     "has_checker", "interpret", "ablate"))
def _mega_call(meta, scal, lights, rays, rid, attr, feat, cbox,
               D, L, eps, shadow_bias, min_depth, ambient, all_opaque,
               with_caustic, caustic_max_depth, has_checker, interpret,
               ablate=()):
    R = rays.shape[1]
    n_tiles = R // RT
    ncp = cbox.shape[1]
    n_chunks = attr.shape[0] // CK
    kernel = functools.partial(
        _mega_kernel, n_chunks=n_chunks, ncp=ncp, D=D, L=L, eps=eps,
        shadow_bias=shadow_bias, min_depth=min_depth, ambient=ambient,
        all_opaque=all_opaque, with_caustic=with_caustic,
        caustic_max_depth=caustic_max_depth, has_checker=has_checker,
        ablate=ablate)
    out_shapes = [jax.ShapeDtypeStruct((8, R), jnp.float32)]
    out_specs = [pl.BlockSpec((8, RT), lambda i: (0, i),
                              memory_space=pltpu.VMEM)]
    if with_caustic:
        CR = -(-9 * D // 8) * 8
        out_shapes.append(jax.ShapeDtypeStruct((CR, R), jnp.float32))
        out_specs.append(pl.BlockSpec((CR, RT), lambda i: (0, i),
                                      memory_space=pltpu.VMEM))
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((40, RT), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RT), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(attr.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(feat.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(cbox.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(meta, scal, lights, rays, rid, attr, feat, cbox)
    return outs


def radiance_wave_mega(scene, cfg, ro, rd, sx_all, sy_all, lane_u32,
                       wave_salt=0, photon_map=None, interpret=None,
                       ablate=()):
    """Megakernel radiance wave: same contract as integrator.radiance_wave
    (with_counts=True form) for eligible scenes.  Returns
    (radiance (R,3), (n_closest, n_shadow))."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    R = ro.shape[0]
    assert R % RT == 0, f"lane count {R} not a multiple of {RT}"
    D = cfg.max_depth
    L = scene.lights.count

    attr, feat, cbox = build_mega_tables(scene)
    attr = jax.lax.stop_gradient(attr)
    feat = jax.lax.stop_gradient(feat)
    cbox = jax.lax.stop_gradient(cbox)
    diag = jnp.linalg.norm(jax.lax.stop_gradient(
        (scene.world_max - scene.world_min).astype(jnp.float32))) * 1.001

    rays = jnp.concatenate([
        ro.T.astype(jnp.float32), rd.T.astype(jnp.float32),
        jnp.pad(sx_all.astype(jnp.float32), ((0, 16 - D), (0, 0))),
        jnp.pad(sy_all.astype(jnp.float32), ((0, 16 - D), (0, 0))),
        jnp.zeros((2, R), jnp.float32)], axis=0)     # (40, R)
    rid = lane_u32.astype(jnp.int32).reshape(1, R)
    meta = jnp.asarray(wave_salt, jnp.int32).reshape(1, 1)
    meta = jnp.pad(meta, ((0, 0), (0, 7)))
    scal = jnp.stack([jnp.float32(0.0), diag]).reshape(1, 2)
    scal = jnp.pad(scal, ((0, 0), (0, 6)))
    lrows = jnp.concatenate([
        scene.lights.pos.astype(jnp.float32),
        scene.lights.col.astype(jnp.float32),
        scene.lights.rad.astype(jnp.float32)[:, None],
        jnp.zeros((L, 1), jnp.float32)], axis=1)
    lights = jnp.pad(lrows, ((0, 8 - L), (0, 0)))
    lights = jax.lax.stop_gradient(lights)

    # checker eval is a handful of VPU ops; always on (a host fetch of
    # textures.kind here would break under jit where scene is traced)
    has_checker = True

    with_caustic = photon_map is not None
    outs = _mega_call(
        meta, scal, lights, rays, rid, attr, feat, cbox,
        D=D, L=L, eps=float(cfg.epsilon), shadow_bias=float(cfg.shadow_bias),
        min_depth=int(cfg.min_depth), ambient=tuple(cfg.ambient),
        all_opaque=scene.all_opaque, with_caustic=with_caustic,
        caustic_max_depth=int(cfg.caustic_max_depth),
        has_checker=has_checker, interpret=interpret,
        ablate=tuple(ablate))

    main = outs[0]
    radiance = main[0:3, :].T                       # (R, 3)
    n_closest = jnp.sum(main[3, :]).astype(jnp.int32)
    n_shadow = jnp.sum(main[4, :]).astype(jnp.int32)

    if with_caustic:
        from ..render.photon import sample_photons_backend
        q = outs[1]
        # (R*D, 3) batched caustic queries across every bounce
        pts = q[0:3 * D, :].T.reshape(R, D, 3).reshape(R * D, 3)
        dirs = q[3 * D:6 * D, :].T.reshape(R, D, 3).reshape(R * D, 3)
        wts = q[6 * D:9 * D, :].T.reshape(R, D, 3).reshape(R * D, 3)
        est = _caustic_estimate(photon_map, cfg, pts, dirs, wts, R * D)
        radiance = radiance + jnp.sum(
            (wts * est).reshape(R, D, 3), axis=1)

    return radiance.astype(ro.dtype), (n_closest, n_shadow)


# fraction of the R*D query slots the compacted kNN stream budgets for
# LIVE queries; RR-killed / zero-weight slots are compacted out before the
# gather pipeline (whose every stage costs linearly in lanes).  Cornell at
# depth 8 runs ~65-70% live (white walls keep RR survival high), so 13/16
# covers it; overflow falls back to the full-width call (identical math).
MEGA_QCAP_FRAC = 13 / 16


def _caustic_estimate(photon_map, cfg, pts, dirs, wts, RD):
    """kNN caustic estimate over the megakernel's per-bounce query records,
    with the dead lanes (far-sentinel points from RR-killed / invalid
    bounces, raytracer.h:263-272, and zero-weight lanes) compacted OUT
    before the gather.  Every stage of the tiled gather — morton sort,
    prep, chunk fetch, kernels — costs linearly in lanes, so skipping dead
    slots is a direct speedup; per-query results are unchanged (each
    query's estimate is independent of its neighbors in the stream)."""
    from ..render.photon import sample_photons_backend

    live = (pts[:, 0] < 1e29) & (jnp.max(wts, axis=-1) > 0)
    n_live = jnp.sum(live.astype(jnp.int32))
    cap = max((int(RD * MEGA_QCAP_FRAC) + 1023) // 1024 * 1024, 1024)
    cap = min(cap, RD)

    a = live.astype(jnp.int32)
    c = jnp.cumsum(a) - a                       # live lane -> compact slot

    def compact_call():
        slot = jnp.where(live, jnp.minimum(c, cap - 1), cap)
        p_c = jnp.full((cap + 1, 3), 1e30, pts.dtype).at[slot].set(pts)
        d_c = jnp.zeros((cap + 1, 3), dirs.dtype).at[slot].set(dirs)
        e_c = sample_photons_backend(photon_map, p_c[:cap], d_c[:cap],
                                     cfg.knn_k, cfg.knn_backend)
        e_pad = jnp.concatenate(
            [e_c, jnp.zeros((1, 3), e_c.dtype)], axis=0)
        return jnp.where(live[:, None],
                         e_pad[jnp.minimum(c, cap)], 0.0)

    def full_call():
        return sample_photons_backend(photon_map, pts, dirs, cfg.knn_k,
                                      cfg.knn_backend)

    if cap >= RD:
        return full_call()
    return jax.lax.cond(n_live <= cap, compact_call, full_call)
