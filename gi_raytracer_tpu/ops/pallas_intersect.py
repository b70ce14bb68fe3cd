"""Pallas TPU intersection kernels: dense chunked ray-triangle testing.

Why not a BVH walk on TPU?  Per-lane pointer chasing compiles to huge gather
chains (measured ~23µs/ray on v5e — HBM gathers dominate).  The TPU-native
shape of this problem is *dense tiles*: triangles are spatially sorted (BVH
leaf order) and split into chunks of 128; rays are processed in tiles of
256.  Each (ray-tile x chunk) step is pure VPU math on (256, 128) registers
— Möller–Trumbore on 32k pairs per step, no gathers anywhere.  A scalar
conservative cull (chunk AABB vs the ray-tile's reachable AABB) skips whole
chunks per tile, recovering BVH-style pruning for coherent tiles while
degrading gracefully to brute force for incoherent ones.

The whole triangle soup lives in VMEM ((10, T) layout, ~40KB per 1k tris),
good to ~200k triangles — beyond that the caller falls back to the jnp
traversal (ops.intersect).

Stochastic alpha acceptance (reference include/raytracer.h:455,297) is done
in-kernel with a counter-based hash of (ray id, prim id, salt) — identical
semantics to the jnp path, different stream.
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
VMEM_TRI_CAP = 200_000  # beyond this the caller should use the jnp path

_BIG = 3.0e38


def _mix32(h):
    h = h.astype(jnp.uint32)
    h ^= h >> 16
    h *= jnp.uint32(0x85EBCA6B)
    h ^= h >> 13
    h *= jnp.uint32(0xC2B2AE35)
    h ^= h >> 16
    return h


def _kernel(salt_ref, diag_ref, ro_ref, rd_ref, tlim_ref, act_ref,
            tri_ref, cbox_ref, out_ref, prim_ref,
            *, n_chunks: int, any_hit: bool, eps: float):
    """Grid: (n_ray_tiles,).  Refs:
    salt_ref (1,1) i32 SMEM; diag_ref (1,1) f32 SMEM (scene diameter bound)
    ro/rd (RT,3) VMEM; tlim (RT,1); act (RT,1) f32 (1=active)
    tri_ref (10, T_pad): rows v0xyz e1xyz e2xyz accept
    cbox_ref (8, n_chunks_pad): rows minx..maxz (2 pad)
    out_ref (RT, 4): t, u, v, unused   prim_ref (RT, 1) i32
    """
    tile = pl.program_id(0)
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

    # conservative reach of this ray tile: AABB(origins) swept by t*dir,
    # t <= min(diag, per-tile max t-limit); inactive rays excluded.
    diag = diag_ref[0, 0]
    big = jnp.float32(_BIG)
    t_cap = jnp.minimum(jnp.max(jnp.where(act, jnp.minimum(t_lim, diag),
                                          -big)), diag)
    t_cap = jnp.maximum(t_cap, 0.0)

    def reach(o, d):
        o_act_min = jnp.min(jnp.where(act, o, big))
        o_act_max = jnp.max(jnp.where(act, o, -big))
        d_min = jnp.min(jnp.where(act, d, 0.0))
        d_max = jnp.max(jnp.where(act, d, 0.0))
        lo = o_act_min + t_cap * jnp.minimum(d_min, 0.0)
        hi = o_act_max + t_cap * jnp.maximum(d_max, 0.0)
        return lo, hi

    rxlo, rxhi = reach(ox, dx)
    rylo, ryhi = reach(oy, dy)
    rzlo, rzhi = reach(oz, dz)

    ray_gid = (jnp.uint32(tile * RT)
               + jax.lax.broadcasted_iota(jnp.uint32, (RT, CK), 0))
    salt = salt_ref[0, 0].astype(jnp.uint32)

    def chunk_body(c, carry):
        best_t, best_u, best_v, best_p = carry
        # ---- scalar conservative cull ----
        cxlo = cbox_ref[0, c]
        cylo = cbox_ref[1, c]
        czlo = cbox_ref[2, c]
        cxhi = cbox_ref[3, c]
        cyhi = cbox_ref[4, c]
        czhi = cbox_ref[5, c]
        overlap = ((cxlo <= rxhi) & (cxhi >= rxlo)
                   & (cylo <= ryhi) & (cyhi >= rylo)
                   & (czlo <= rzhi) & (czhi >= rzlo))
        if any_hit:
            # stop testing once every active lane is resolved
            unresolved = jnp.any(act & (best_p < 0))
            overlap = overlap & unresolved

        def tested(carry):
            best_t, best_u, best_v, best_p = carry
            sl = pl.ds(c * CK, CK)
            v0x = tri_ref[0, sl].reshape(1, CK)
            v0y = tri_ref[1, sl].reshape(1, CK)
            v0z = tri_ref[2, sl].reshape(1, CK)
            e1x = tri_ref[3, sl].reshape(1, CK)
            e1y = tri_ref[4, sl].reshape(1, CK)
            e1z = tri_ref[5, sl].reshape(1, CK)
            e2x = tri_ref[6, sl].reshape(1, CK)
            e2y = tri_ref[7, sl].reshape(1, CK)
            e2z = tri_ref[8, sl].reshape(1, CK)
            accept = tri_ref[9, sl].reshape(1, CK)

            # Möller–Trumbore, (RT, CK) lanes (entities.h:443-474)
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            ok = jnp.abs(det) >= eps
            inv = 1.0 / jnp.where(ok, det, 1.0)
            tvx = ox - v0x
            tvy = oy - v0y
            tvz = oz - v0z
            u = (tvx * px + tvy * py + tvz * pz) * inv
            qx = tvy * e1z - tvz * e1y
            qy = tvz * e1x - tvx * e1z
            qz = tvx * e1y - tvy * e1x
            v = (dx * qx + dy * qy + dz * qz) * inv
            t = (e2x * qx + e2y * qy + e2z * qz) * inv
            ok &= (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
            ok &= (t > 0.0) & (t < best_t) & (t < t_lim) & act

            # stochastic alpha (raytracer.h:455): hash(ray, prim, salt)
            prim_gid = (jnp.uint32(c * CK)
                        + jax.lax.broadcasted_iota(jnp.uint32, (RT, CK), 1))
            h = _mix32(ray_gid * jnp.uint32(0x9E3779B9)
                       ^ _mix32(prim_gid + jnp.uint32(0x7F4A7C15) ^ salt))
            # Mosaic lacks uint32->f32; use the top 24 bits via int32
            uni = ((h >> 8).astype(jnp.int32).astype(jnp.float32)
                   * jnp.float32(5.960464477539063e-08))
            ok &= (uni < accept) | (accept >= 1.0)

            tt = jnp.where(ok, t, big)
            tmin = jnp.min(tt, axis=1, keepdims=True)            # (RT,1)
            improved = tmin < best_t
            # index of the winning lane
            is_min = (tt <= tmin) & ok
            pid = jnp.where(is_min, prim_gid.astype(jnp.int32),
                            jnp.int32(2147483647))
            pmin = jnp.min(pid, axis=1, keepdims=True)
            rows = is_min & (pid == pmin)
            usel = jnp.max(jnp.where(rows, u, -big), axis=1, keepdims=True)
            vsel = jnp.max(jnp.where(rows, v, -big), axis=1, keepdims=True)
            return (jnp.where(improved, tmin, best_t),
                    jnp.where(improved, usel, best_u),
                    jnp.where(improved, vsel, best_v),
                    jnp.where(improved, pmin, best_p))

        return jax.lax.cond(overlap, tested, lambda cr: cr,
                            (best_t, best_u, best_v, best_p))

    init = (jnp.full((RT, 1), big, jnp.float32),
            jnp.zeros((RT, 1), jnp.float32),
            jnp.zeros((RT, 1), jnp.float32),
            jnp.full((RT, 1), -1, jnp.int32))
    best_t, best_u, best_v, best_p = jax.lax.fori_loop(
        0, n_chunks, chunk_body, init)

    miss = best_p < 0
    out_ref[:, 0:1] = jnp.where(miss, big, best_t)
    out_ref[:, 1:2] = best_u
    out_ref[:, 2:3] = best_v
    out_ref[:, 3:4] = jnp.zeros((RT, 1), jnp.float32)
    prim_ref[:, 0:1] = best_p


@functools.partial(jax.jit, static_argnames=("any_hit", "eps", "interpret"))
def _dense_trace(tri_soa, cbox, ro, rd, t_lim, active, salt, diag,
                 any_hit=False, eps=1e-5, interpret=False):
    """tri_soa (10, T_pad), cbox (8, n_chunks_pad), rays (R,3) padded to
    RAY_TILE multiple.  Returns (t (R,), u, v, prim)."""
    R = ro.shape[0]
    n_tiles = R // RAY_TILE
    n_chunks = tri_soa.shape[1] // TRI_CHUNK

    kernel = functools.partial(_kernel, n_chunks=n_chunks,
                               any_hit=any_hit, eps=eps)
    out, prim = pl.pallas_call(
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
            pl.BlockSpec(tri_soa.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            # chunk bboxes are read as scalars with a dynamic chunk index —
            # that requires SMEM (VMEM vector loads need static lane offsets)
            pl.BlockSpec(cbox.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((RAY_TILE, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, 4), jnp.float32),
            jax.ShapeDtypeStruct((R, 1), jnp.int32),
        ],
        interpret=interpret,
    )(salt, diag, ro, rd, t_lim, active, tri_soa, cbox)
    return out[:, 0], out[:, 1], out[:, 2], prim[:, 0]


def build_tri_soa(scene):
    """(10, T_pad) triangle SoA + (8, n_chunks_pad) chunk bboxes from the
    (BVH-leaf-ordered) scene triangle arrays.  jnp; cheap; jit-safe."""
    tr = scene.tris
    T = tr.v0.shape[0]
    pad = (-T) % TRI_CHUNK
    f32 = jnp.float32

    accept = jnp.where(scene.materials.ior[tr.mat_id] != 1.0, 1.0,
                       scene.materials.opacity[tr.mat_id])

    def row(x):
        return jnp.pad(x.astype(f32), (0, pad))

    v0, e1, e2 = tr.v0, tr.e1, tr.e2
    soa = jnp.stack([
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

    def minmax(c):
        # c: (T,) padded with +/- big
        lo = jnp.pad(c.astype(f32), (0, pad), constant_values=big)
        hi = jnp.pad(c.astype(f32), (0, pad), constant_values=-big)
        lo = jnp.min(lo.reshape(nC, TRI_CHUNK), axis=1)
        hi = jnp.max(hi.reshape(nC, TRI_CHUNK), axis=1)
        return lo, hi

    rows = []
    for axis in range(3):
        comp = jnp.stack([v0[:, axis], v1[:, axis], v2[:, axis]])
        lo, _ = minmax(jnp.min(comp, 0))
        rows.append(lo)
    for axis in range(3):
        comp = jnp.stack([v0[:, axis], v1[:, axis], v2[:, axis]])
        _, hi = minmax(jnp.max(comp, 0))
        rows.append(hi)
    rows.append(jnp.zeros(nC, f32))
    rows.append(jnp.zeros(nC, f32))
    cbox = jnp.stack(rows)  # (8, nC)
    return soa, cbox


def pallas_closest_hit(scene, ro, rd, t_max=None, salt=0, eps=1e-5,
                       active=None, any_hit=False, interpret=False,
                       differentiable=True):
    """Drop-in closest-hit/any-hit over the Pallas dense kernel.
    Returns the same Hit tuple as ops.intersect.closest_hit (triangles
    only — the caller layers the dense sphere pass on top).  With
    ``differentiable``, hit.t/u/v carry gradients to scene.tris and rays
    via the custom VJP (selection detached)."""
    from .intersect import Hit

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

    soa, cbox = build_tri_soa(scene)
    diag = jnp.linalg.norm(
        (scene.world_max - scene.world_min).astype(dt)) * 1.001
    salt_arr = jnp.asarray(salt, jnp.int32).reshape(1, 1)
    diag_arr = diag.reshape(1, 1)

    if differentiable:
        t, u, v, prim = _dense_trace_diff(soa, cbox, rop, rdp, tl, ac,
                                          salt_arr, diag_arr,
                                          any_hit, eps, interpret)
    else:
        t, u, v, prim = _dense_trace(soa, cbox, rop, rdp, tl, ac,
                                     salt_arr, diag_arr,
                                     any_hit=any_hit, eps=eps,
                                     interpret=interpret)
    t = t[:R].astype(ro.dtype)
    t = jnp.where(prim[:R] >= 0, t, jnp.inf)
    return Hit(t, prim[:R],
               u[:R].astype(ro.dtype), v[:R].astype(ro.dtype))


# --------------------------------------------------------------------------
# differentiable wrapper: forward = Pallas kernel; backward = analytic MT
# derivative at the discovered primitive (selection detached), so pixel
# gradients flow into vertex positions and ray origins/directions.  Applied
# at the _dense_trace level (pure array inputs); the soa cotangent continues
# back through build_tri_soa into scene.tris by ordinary autodiff.
# --------------------------------------------------------------------------

def _hit_formula(soa, ro, rd, prim, eps):
    """(t, u, v) recomputed symbolically for the selected primitive."""
    from .intersect import ray_triangle

    v0 = soa[0:3].T
    e1 = soa[3:6].T
    e2 = soa[6:9].T
    ok = prim >= 0
    p = jnp.clip(prim, 0, v0.shape[0] - 1)
    t, u, v, valid = ray_triangle(ro, rd, v0[p], e1[p], e2[p], eps)
    m = ok & valid
    return (jnp.where(m, t, 0.0), jnp.where(m, u, 0.0), jnp.where(m, v, 0.0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _dense_trace_diff(tri_soa, cbox, ro, rd, t_lim, active, salt, diag,
                      any_hit, eps, interpret):
    return _dense_trace(tri_soa, cbox, ro, rd, t_lim, active, salt, diag,
                        any_hit=any_hit, eps=eps, interpret=interpret)


def _dtd_fwd(tri_soa, cbox, ro, rd, t_lim, active, salt, diag,
             any_hit, eps, interpret):
    out = _dense_trace(tri_soa, cbox, ro, rd, t_lim, active, salt, diag,
                       any_hit=any_hit, eps=eps, interpret=interpret)
    t, u, v, prim = out
    return out, (tri_soa, cbox, ro, rd, t_lim, active, salt, diag, prim)


def _float0(x):
    import numpy as _np
    return _np.zeros(x.shape, jax.dtypes.float0)


def _dtd_bwd(any_hit, eps, interpret, res, g):
    tri_soa, cbox, ro, rd, t_lim, active, salt, diag, prim = res
    gt, gu, gv, _gp = g
    gt = jnp.where(jnp.isfinite(gt), gt, 0.0)

    def f(soa, ro_, rd_):
        return _hit_formula(soa, ro_, rd_, prim, eps)

    _, vjp = jax.vjp(f, tri_soa, ro, rd)
    dsoa, dro, drd = vjp((gt, gu, gv))
    return (dsoa, jnp.zeros_like(cbox), dro, drd,
            jnp.zeros_like(t_lim), jnp.zeros_like(active),
            _float0(salt), jnp.zeros_like(diag))


_dense_trace_diff.defvjp(_dtd_fwd, _dtd_bwd)
