"""Surface shading: texture lookups, hit attributes, BSDF direction logic.

Vectorized (R-lane) re-design of the reference's per-ray shading
(reference include/raytracer.h:167-379,481-506, material.h): every branch
becomes a `jnp.where` select, every ``drand()`` a caller-supplied uniform.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..scene.types import Scene, Textures, TEX_CHECKER, TEX_IMAGE
from .geom import (dot, normalize, reflect, refract_tir, hemisphere_cos,
                   sample_phong)


# --------------------------------------------------------------------------
# textures
# --------------------------------------------------------------------------

def sample_texture(tex: Textures, tid: jnp.ndarray, uv: jnp.ndarray):
    """(rgb (R,3), alpha (R,)) for texture ids ``tid`` at ``uv``.

    Follows material.h:39-47 (checkerboard int-cast parity) and
    material.h:63-78 (image fetch with V flip and tiling).  Image texels are
    already linear (de-gamma at load).
    """
    u, v = uv[..., 0], uv[..., 1]
    kind = tex.kind[tid]

    const_rgb = tex.color[tid]

    # checkerboard: ((int)(u*t) % 2 == 0) ^ ((int)(v*t) % 2 == 0) -> a : b
    tl = tex.tiles[tid]
    iu = jnp.trunc(u * tl[..., 0])
    iv = jnp.trunc(v * tl[..., 1])
    even_u = jnp.abs(iu) % 2.0 < 0.5
    even_v = jnp.abs(iv) % 2.0 < 0.5
    checker_rgb = jnp.where((even_u ^ even_v)[..., None],
                            tex.color[tid], tex.color2[tid])

    # image: x = |(int)(u*w*tx) % w| ; y = h - |(int)(v*h*ty) % h| - 1
    w = tex.width[tid]
    h = tex.height[tid]
    wf = w.astype(u.dtype)
    hf = h.astype(u.dtype)
    xi = jnp.abs(jnp.trunc(u * wf * tl[..., 0]).astype(jnp.int32) % jnp.maximum(w, 1))
    yi_raw = jnp.abs(jnp.trunc(v * hf * tl[..., 1]).astype(jnp.int32) % jnp.maximum(h, 1))
    yi = h - yi_raw - 1
    flat = tex.offset[tid] + yi * w + xi
    flat = jnp.clip(flat, 0, tex.atlas.shape[0] - 1)
    texel = tex.atlas[flat]

    is_img = (kind == TEX_IMAGE)[..., None]
    is_chk = (kind == TEX_CHECKER)[..., None]
    rgb = jnp.where(is_img, texel[..., :3],
                    jnp.where(is_chk, checker_rgb, const_rgb))
    alpha = jnp.where(kind == TEX_IMAGE,
                      jnp.where(tex.has_alpha[tid], texel[..., 3], 1.0),
                      1.0)
    return rgb, alpha


def material_lookup(scene: Scene, mat_id: jnp.ndarray, uv: jnp.ndarray):
    """Gather (diffuse rgb, emissive rgb, alpha=opacity*tex_alpha, roughness,
    ior) for hit materials (material.h:84-100)."""
    m = scene.materials
    rgb, ta = sample_texture(scene.textures, m.diffuse_tex[mat_id], uv)
    em, _ = sample_texture(scene.textures, m.emissive_tex[mat_id], uv)
    alpha = m.opacity[mat_id] * ta
    return rgb, em, alpha, m.roughness[mat_id], m.ior[mat_id]


# --------------------------------------------------------------------------
# hit attribute interpolation
# --------------------------------------------------------------------------

class HitAttrs(NamedTuple):
    point: jnp.ndarray     # (R, 3)
    normal: jnp.ndarray    # (R, 3) un-flipped shading normal
    uv: jnp.ndarray        # (R, 2)
    mat_id: jnp.ndarray    # (R,)
    valid: jnp.ndarray     # (R,)


def hit_attributes_uv(scene: Scene, ro, rd, t, prim, bu, bv) -> HitAttrs:
    """Interpolated position/normal/uv/material for hits, given barycentrics
    from the traversal.

    Triangles use barycentric vertex normals & uvs when present, face normal
    otherwise (entities.h:480-487); interpolated normals are deliberately NOT
    re-normalized (parity with the reference).  Spheres per entities.h:85-97.
    """
    valid = prim >= 0
    total = max(scene.n_tris + scene.n_spheres + scene.n_cones - 1, 0)
    p = jnp.clip(prim, 0, total)
    is_tri = p < scene.n_tris if scene.n_tris else jnp.zeros_like(valid)
    # miss lanes carry t=inf; sanitize so masked-out lanes never produce
    # inf/nan primals (those poison reverse-mode cotangent sums)
    t_safe = jnp.where(valid, t, 0.0)
    point = ro + t_safe[:, None] * rd

    if scene.n_tris:
        tp = jnp.clip(p, 0, scene.n_tris - 1)
        tr = scene.tris
        n0 = tr.n0[tp]; n1 = tr.n1[tp]; n2 = tr.n2[tp]
        has_vn = ((jnp.sum(n0 * n0, -1) > 0) & (jnp.sum(n1 * n1, -1) > 0)
                  & (jnp.sum(n2 * n2, -1) > 0))
        w0 = (1.0 - bu - bv)[:, None]
        n_interp = w0 * n0 + bu[:, None] * n1 + bv[:, None] * n2
        tri_n = jnp.where(has_vn[:, None], n_interp, tr.face_n[tp])
        tri_uv = (w0 * tr.uv0[tp] + bu[:, None] * tr.uv1[tp]
                  + bv[:, None] * tr.uv2[tp])
        tri_uv = jnp.where(has_vn[:, None], tri_uv, jnp.zeros_like(tri_uv))
        tri_mat = tr.mat_id[tp]
    else:
        tri_n = jnp.zeros_like(point)
        tri_uv = jnp.zeros_like(point[:, :2])
        tri_mat = jnp.zeros(point.shape[0], jnp.int32)

    if scene.n_spheres:
        sp = jnp.clip(p - scene.n_tris, 0, scene.n_spheres - 1)
        c = scene.spheres.pos[sp]
        rad = scene.spheres.rad[sp]
        sph_n = (point - c) / rad[:, None]
        d = (c - point) / rad[:, None]
        # spherical uv (entities.h:92-97)
        sv = 0.5 + jnp.arcsin(jnp.clip(d[:, 1], -1, 1)) / jnp.pi
        su = 0.5 + jnp.arctan2(d[:, 2], d[:, 0]) / (2 * jnp.pi)
        sph_uv = jnp.stack([su, sv], -1)
        sph_mat = scene.spheres.mat_id[sp]
        normal = jnp.where(is_tri[:, None], tri_n, sph_n)
        uv = jnp.where(is_tri[:, None], tri_uv, sph_uv)
        mat_id = jnp.where(is_tri, tri_mat, sph_mat)
    else:
        normal, uv, mat_id = tri_n, tri_uv, tri_mat

    if scene.n_cones:
        from ..ops.intersect import cone_attrs
        base = scene.n_tris + scene.n_spheres
        cp = jnp.clip(p - base, 0, scene.n_cones - 1)
        cone_n, cone_uv = cone_attrs(scene.cones, point, cp)
        is_cone = p >= base
        normal = jnp.where(is_cone[:, None], cone_n, normal)
        uv = jnp.where(is_cone[:, None], cone_uv, uv)
        mat_id = jnp.where(is_cone, scene.cones.mat_id[cp], mat_id)

    return HitAttrs(point, normal, uv, mat_id, valid)


# --------------------------------------------------------------------------
# secondary-ray generation (BSDF select)
# --------------------------------------------------------------------------

class Secondary(NamedTuple):
    dir: jnp.ndarray        # (R,3) continuation direction
    f: jnp.ndarray          # (R,3) path weight for this bounce
    contrib: jnp.ndarray    # (R,3) RR driver (raytracer.h:376-377)
    normal: jnp.ndarray     # (R,3) flipped shading normal
    offset_sign: jnp.ndarray  # (R,) +1 reflect/diffuse, -1 refract


def secondary_ray(rd, normal, color, alpha, roughness, ior,
                  sx, sy, u_opacity, u_fresnel, contrib) -> Secondary:
    """BSDF branch select + direction sampling (raytracer.h:321-379,481-506).

    rayType: default glossy/diffuse; mirror when roughness < .001; stochastic
    refract-vs-reflect via Schlick when the opacity lottery fails.
    """
    backface = dot(normal, rd)[..., 0] > 0
    n = jnp.where(backface[:, None], -normal, normal)

    r0 = ((1.0 - ior) / (1.0 + ior)) ** 2
    refl = reflect(rd, n)
    fs = r0 + (1.0 - r0) * (1.0 - dot(refl, n)[..., 0]) ** 5

    # type: 2 = diffuse/glossy, 0 = mirror, 1 = refract (raytracer.h:481-506)
    typ = jnp.full(rd.shape[0], 2, jnp.int32)
    typ = jnp.where(roughness < 0.001, 0, typ)
    lottery = u_opacity > alpha
    typ = jnp.where(lottery, jnp.where(u_fresnel < fs, 0, 1), typ)

    # refraction (eta flips on backface; raytracer.h:336-351)
    eta = jnp.where(backface, ior, 1.0 / ior)[:, None]
    d_refr = refract_tir(rd, n, eta)

    # glossy / diffuse (raytracer.h:360-378)
    d_diff = hemisphere_cos(n, sx, sy, 2.0)
    phong_pow = 1.0 / jnp.maximum(roughness, 1e-6) + 1.0
    d_phong = sample_phong(refl, phong_pow, sx, sy)
    d_phong = jnp.where(dot(d_phong, n)[..., 0:1] < 0,
                        reflect(d_phong, n), d_phong)
    d_gloss = jnp.where((roughness < 0.9)[:, None], d_phong, d_diff)

    out = jnp.where((typ == 1)[:, None], d_refr,
                    jnp.where((typ == 0)[:, None], refl, d_gloss))

    f = color  # all three branches use f = color (raytracer.h:350,357,372)
    ones = jnp.ones_like(color)
    contrib_gloss = 0.5 * (contrib * color + color)  # mix(contrib*c, c, .5)
    new_contrib = jnp.where((typ == 2)[:, None], contrib_gloss, ones)

    offset_sign = jnp.where(typ == 1, -1.0, 1.0)
    return Secondary(out, f, new_contrib, n, offset_sign)
