"""Atmospheric height fog: density field + stochastic raymarch.

Reference: HeightFog density = d * noise(p)^7 * ((ymax - p.y)/sy)^2 with
trilinear noise interpolation (reference include/atmosphere.h:50-81), and a
Woodcock-style fixed-step stochastic march: at each 0.04-step the ray
scatters with probability = local density (raytracer.h:509-529).  The march
is a `lax.fori_loop` with per-(ray, step) counter-based uniforms; "first
scattering step wins" is computed with a masked argmin instead of an early
break.  The reference's noise-grid indexing is stride-buggy
(atmosphere.h:61-71); we interpolate a clean (nx, ny, nz) grid — the grid is
i.i.d. uniform noise, so agreement is statistical by construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..sampling.rng import hash_u01
from ..scene.types import Scene
from .geom import random_unit_vec


def fog_density(scene: Scene, p: jnp.ndarray) -> jnp.ndarray:
    """Density (scatter probability per unit length x step) at points p (R,3)."""
    fog = scene.fog
    bmin, bmax = fog.bbox_min, fog.bbox_max
    size = bmax - bmin
    inside = jnp.all((p >= bmin) & (p <= bmax), axis=-1)

    nx, ny, nz = fog.grid.shape
    rel = (p - bmin)
    # grid cells are unit-sized like the reference (nscale collapses to 1,
    # atmosphere.h:46); clamp into the grid
    gx = jnp.clip(rel[:, 0], 0.0, nx - 1.001)
    gy = jnp.clip(rel[:, 1], 0.0, ny - 1.001)
    gz = jnp.clip(rel[:, 2], 0.0, nz - 1.001)
    ix = gx.astype(jnp.int32); dx = gx - ix
    iy = gy.astype(jnp.int32); dy = gy - iy
    iz = gz.astype(jnp.int32); dz = gz - iz

    g = fog.grid

    def at(ox, oy, oz):
        return g[jnp.minimum(ix + ox, nx - 1),
                 jnp.minimum(iy + oy, ny - 1),
                 jnp.minimum(iz + oz, nz - 1)]

    c00 = at(0, 0, 0) * (1 - dx) + at(1, 0, 0) * dx
    c01 = at(0, 0, 1) * (1 - dx) + at(1, 0, 1) * dx
    c10 = at(0, 1, 0) * (1 - dx) + at(1, 1, 0) * dx
    c11 = at(0, 1, 1) * (1 - dx) + at(1, 1, 1) * dx
    c0 = c00 * (1 - dy) + c10 * dy
    c1 = c01 * (1 - dy) + c11 * dy
    noise = (c0 * (1 - dz) + c1 * dz) ** 7

    ymax = bmax[1]
    falloff = ((ymax - p[:, 1]) / size[1]) ** 2
    return jnp.where(inside, fog.density * noise * falloff, 0.0)


def _fog_bounds(scene: Scene, ro, rd, t_cap):
    """Overlap of the ray segment [0, t_cap] with the fog bbox
    (octree.cpp:229-251 atmosphereBounds)."""
    fog = scene.fog
    tiny = 1e-12
    safe = jnp.where(jnp.abs(rd) < tiny, jnp.where(rd < 0, -tiny, tiny), rd)
    inv = 1.0 / safe
    ta = (fog.bbox_min[None, :] - ro) * inv
    tb = (fog.bbox_max[None, :] - ro) * inv
    tn = jnp.max(jnp.minimum(ta, tb), -1)
    tf = jnp.min(jnp.maximum(ta, tb), -1)
    tmin = jnp.maximum(tn, 0.0)
    tmax = jnp.minimum(tf, t_cap)
    return tmin, tmax, (tf >= tn) & (tmax > tmin)


def _march(scene: Scene, cfg: RenderConfig, ro, rd, tmin, tmax, has, salt,
           ray_id=None):
    """First stochastic scattering event along [tmin, tmax] (raytracer.h:509-529).
    Returns (scattered (R,), t_hit (R,)).

    ``ray_id``: GLOBAL lane ids — scatter decisions must be keyed on them
    (not the batch slot) so fog-wave lane chunking reproduces identical
    events, and so successive waves draw INDEPENDENT uniforms (batch-slot
    keying silently reused the same stream every wave, a correlation bug
    fixed in r5)."""
    R = ro.shape[0]
    step = cfg.raymarch_stepsize
    rid = (ray_id.astype(jnp.uint32) if ray_id is not None
           else jnp.arange(R, dtype=jnp.uint32))
    n_steps = cfg.raymarch_max_steps

    def body(i, carry):
        found, t_hit = carry
        t = tmin + cfg.shadow_bias + i * step
        p = ro + t[:, None] * rd
        dens = fog_density(scene, p)
        u = hash_u01(rid, jnp.uint32(i), salt)
        scat = has & (t < tmax) & (u < dens) & ~found
        return (found | scat, jnp.where(scat, t, t_hit))

    found = jnp.zeros(R, bool)
    t_hit = jnp.zeros(R, ro.dtype)
    found, t_hit = jax.lax.fori_loop(0, n_steps, body, (found, t_hit))
    return found, t_hit


def fog_occludes(scene: Scene, cfg: RenderConfig, ro, rd, t_lim, salt,
                 ray_id=None):
    """Shadow-ray fog occlusion (visible(), raytracer.h:308-316)."""
    tmin, tmax, has = _fog_bounds(scene, ro, rd, t_lim)
    found, _ = _march(scene, cfg, ro, rd, tmin, tmax, has, salt,
                      ray_id=ray_id)
    return found


def fog_override(scene: Scene, cfg: RenderConfig, ro, rd, t_hit_surface,
                 sx, sy, salt,
                 point, normal, out_dir, f, color, contrib, rough,
                 offset_sign, ray_id=None):
    """In-scattering override of the surface hit (radiance(),
    raytracer.h:212-228): when the march scatters before the surface, the
    bounce continues from the fog event in a uniform random direction with
    f = color = contrib = fog color and roughness 1.  The surface normal is
    left untouched (reference quirk)."""
    t_cap = jnp.where(jnp.isfinite(t_hit_surface), t_hit_surface, 0.0)
    tmin, tmax, has = _fog_bounds(scene, ro, rd, t_cap)
    scat, t_s = _march(scene, cfg, ro, rd, tmin, tmax, has, salt,
                       ray_id=ray_id)

    fog_col = jnp.broadcast_to(scene.fog.color[None, :], color.shape)
    m = scat[:, None]
    new_point = jnp.where(m, ro + t_s[:, None] * rd, point)
    new_dir = jnp.where(m, random_unit_vec(sx, sy), out_dir)
    new_f = jnp.where(m, fog_col, f)
    new_color = jnp.where(m, fog_col, color)
    new_contrib = jnp.where(m, fog_col, contrib)
    new_rough = jnp.where(scat, 1.0, rough)
    return (new_point, normal, new_dir, new_f, new_color, new_contrib,
            new_rough, offset_sign)
