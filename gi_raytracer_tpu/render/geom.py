"""Direction sampling & reflection math (vectorized over ray lanes).

Re-derivations of the reference's sampler zoo (reference include/util.cpp:
19-107, util.h:173-188): cosine-power hemisphere sampling around a normal,
Phong-lobe sampling around the mirror direction, spherical-cap sampling for
photon emission, uniform sphere points, and refraction with total internal
reflection.  The tangent-frame construction matches util.cpp:35-58 exactly
(the |z|-based branchless frame) so directions agree with the reference for
identical (u, v) inputs.  ``fastPrecisePow`` bit-trick approximations
(util.h:113-136) are replaced by exact ``pow`` — a documented deviation
validated statistically.
"""

from __future__ import annotations

import jax.numpy as jnp

PI = 3.141592653589793


def dot(a, b):
    return jnp.sum(a * b, axis=-1, keepdims=True)


def normalize(v, eps=1e-300):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def reflect(i, n):
    """glm::reflect: i - 2*dot(n,i)*n."""
    return i - 2.0 * dot(n, i) * n


def refract_tir(inc, n, eta, eps=1e-5):
    """Refraction with fallback to reflection on TIR (util.h:173-181)."""
    d = dot(n, inc)
    k = 1.0 - eta * eta * (1.0 - d * d)
    tir = k < eps
    refr = eta * inc - (eta * d + jnp.sqrt(jnp.maximum(k, 0.0))) * n
    return jnp.where(tir, reflect(inc, n), refr)


def _frame_apply(axis, local):
    """Rotate ``local`` (z-up) into the frame of ``axis`` using the
    reference's branchless |z| construction (util.cpp:35-58)."""
    nx = axis[..., 0:1]
    ny = axis[..., 1:2]
    nz = axis[..., 2:3]
    z = jnp.abs(nz)
    inv = 1.0 / (1.0 + z)
    # column vectors of the rotation matrix
    c0 = jnp.concatenate([z + ny * ny * inv, -nx * ny * inv, -nx], -1)
    c1 = jnp.concatenate([-nx * ny * inv, z + nx * nx * inv, -ny], -1)
    c2 = jnp.concatenate([nx, ny, z], -1)
    lx = local[..., 0:1]
    ly = local[..., 1:2]
    lz = local[..., 2:3]
    out = lx * c0 + ly * c1 + lz * c2
    # mirror for downward axes (util.cpp:52-56)
    flip = jnp.concatenate(
        [jnp.ones_like(out[..., :2]),
         jnp.where(nz < 0, -jnp.ones_like(lz), jnp.ones_like(lz))], -1)
    return out * flip


def _cos_power_local(u, v, power):
    """z-up cosine-power sample (util.cpp:27-33).  u, v, power: (R,) or
    scalars; returns (..., 3)."""
    phi = v * (2.0 * PI)
    cos_t = jnp.power(jnp.maximum(1.0 - u, 0.0), 1.0 / power)
    # masked-safe sqrt: at the pole (u=0 -> cos_t=1) sqrt'(0)=inf would
    # poison d/d(power) gradients (e.g. roughness) with inf*0=nan
    sin2 = jnp.maximum(1.0 - cos_t * cos_t, 0.0)
    pos = sin2 > 0
    sin_t = jnp.where(pos, jnp.sqrt(jnp.where(pos, sin2, 1.0)), 0.0)
    return jnp.stack(jnp.broadcast_arrays(
        jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t), -1)


def hemisphere_cos(normal, u, v, power):
    """Cosine-power hemisphere around ``normal`` (util.cpp:35-58)."""
    return _frame_apply(normal, _cos_power_local(u, v, power))


def sample_phong(outdir, power, u, v):
    """Phong lobe around the (mirror) direction (util.cpp:91-107)."""
    return _frame_apply(outdir, _cos_power_local(u, v, power))


def sphere_cap_cos(axis, u, v, power, frac):
    """Spherical-cap sample: cap opening scales with ``frac``
    (util.cpp:60-83); frac=1 is the full cosine hemisphere."""
    phi = v * (2.0 * PI)
    cos_t = frac * jnp.power(jnp.maximum(1.0 - u, 0.0), 1.0 / power) + (1.0 - frac)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    local = jnp.stack([jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t], -1)
    return _frame_apply(axis, local)


def random_unit_vec(x, y):
    """Uniform sphere direction from two uniforms (util.h:183-188).

    Algebraic form: cos(arccos(z)) = z and sin(arccos(z)) = sqrt(1-z^2),
    so the reference's arccos/sin pair (two transcendental expansions per
    lane per bounce) collapses to one sqrt."""
    z = jnp.clip(2.0 * y - 1.0, -1.0, 1.0)
    st = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return jnp.stack([st * jnp.cos(2.0 * PI * x),
                      st * jnp.sin(2.0 * PI * x),
                      z], -1)
