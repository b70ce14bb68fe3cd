"""Wavefront path-tracing integrator.

The reference estimator is a recursive megakernel (reference
include/raytracer.h:167-276) under a per-pixel adaptive sample loop
(raytracer.h:108-148).  Here it is flattened TPU-first:

* one *wave* = one QMC sample for every pixel, traced as a flat SoA ray
  batch; the bounce recursion becomes a `lax.scan` over bounce index with an
  alive mask (Russian roulette = masked termination + throughput boost);
* the adaptive loop becomes wave-level: after each wave the per-pixel EMA
  variance (raytracer.h:136-144) decides which pixels stay active; inactive
  lanes are masked out of the update.  Wave w uses exactly the Halton index
  the reference would use for per-pixel sample w, so sample positions are
  bit-identical.

Everything inside `render_wave` is jit-compiled; gradients flow through the
whole estimator to scene parameters (materials, textures, lights, camera).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..ops.intersect import trace_closest, trace_any
from ..sampling.halton import HaltonSampler, HaltonEnum, MAX_QMC_DIMS
from ..sampling.rng import Purpose, stream
from ..scene.types import Scene
from .camera import Camera, primary_rays
from .geom import normalize, random_unit_vec, PI
from .shading import hit_attributes_uv, material_lookup, secondary_ray
from .atmosphere import fog_override, fog_occludes


class PathState(NamedTuple):
    ro: jnp.ndarray        # (R,3)
    rd: jnp.ndarray        # (R,3)
    throughput: jnp.ndarray  # (R,3)
    contrib: jnp.ndarray   # (R,3) Russian-roulette driver
    radiance: jnp.ndarray  # (R,3) accumulated
    alive: jnp.ndarray     # (R,)


def _direct_light(scene: Scene, cfg: RenderConfig, point, normal, rough,
                  u_light, salt, active=None):
    """One shadow ray per light per bounce toward a uniform sphere point
    (raytracer.h:230-256).  Reference overwrites ``i`` per light (`=` not
    `+=`, raytracer.h:254); we sum — identical for the bundled single-light
    scenes, and the physically sensible generalization."""
    L = scene.lights.count
    acc = jnp.zeros_like(point)
    if L == 0:
        return acc
    bias = cfg.shadow_bias
    for li in range(L):
        lpos = scene.lights.pos[li]
        lcol = scene.lights.col[li]
        lrad = scene.lights.rad[li]
        ux, uy = u_light[2 * li], u_light[2 * li + 1]
        lp = lpos[None, :] + lrad * random_unit_vec(ux, uy)
        so = point + bias * normal
        ldir = lp - so
        max_t2 = jnp.sum(ldir * ldir, -1)
        t_lim = jnp.sqrt(max_t2) - bias
        occ = trace_any(scene, so, normalize(ldir), t_lim,
                        salt=salt + 7919 * (li + 1), active=active,
                        backend=cfg.intersect_backend,
                        compact=cfg.compact_wavefront)
        if scene.has_fog:
            occ = occ | fog_occludes(scene, cfg, so, normalize(ldir), t_lim,
                                     salt + 104729 * (li + 1))
        to_l = lpos[None, :] - point
        d = jnp.maximum(jnp.sum(normal * normalize(to_l), -1), 0.0)
        l_term = d ** (1.0 / jnp.maximum(rough, 1e-12))
        hfrac = 1.0 / (PI * jnp.sum(to_l * to_l, -1))
        acc = acc + jnp.where(occ[:, None], 0.0, lcol[None, :]
                              * (l_term * hfrac)[:, None])
    return acc


def radiance_wave(scene: Scene, cfg: RenderConfig, ro, rd,
                  sx_all, sy_all, key, wave_salt, photon_map=None):
    """Trace a wave of rays through `max_depth` bounces; returns (R,3).

    sx_all/sy_all: (D, R) per-bounce BSDF sample pairs (QMC dims 2+2d/3+2d,
    raytracer.h:172-173; PRNG beyond the sampler's 31 dims like the
    reference's rand() fallback).
    """
    R = ro.shape[0]
    dt = ro.dtype
    D = cfg.max_depth
    ambient = jnp.asarray(cfg.ambient, dt)

    state = PathState(
        ro=ro, rd=rd,
        throughput=jnp.ones((R, 3), dt),
        contrib=jnp.ones((R, 3), dt),
        radiance=jnp.zeros((R, 3), dt),
        alive=jnp.ones((R,), bool),
    )

    def body(st: PathState, xs):
        depth, sx, sy = xs
        salt = (jnp.asarray(wave_salt).astype(jnp.uint32)
                + depth.astype(jnp.uint32) * jnp.uint32(31337))
        kb = jax.random.fold_in(key, depth)
        n_uni = 4 + 2 * scene.lights.count
        uni = jax.random.uniform(kb, (n_uni, R), dt)
        u_rr, u_op, u_fs = uni[0], uni[1], uni[2]
        u_light = uni[4:]

        hit = trace_closest(scene, st.ro, st.rd, salt=salt, eps=cfg.epsilon,
                            active=st.alive, backend=cfg.intersect_backend,
                            compact=cfg.compact_wavefront)
        attrs = hit_attributes_uv(scene, st.ro, st.rd, hit.t, hit.prim,
                                  hit.u, hit.v)
        color, em, alpha, rough, ior = material_lookup(scene, attrs.mat_id,
                                                       attrs.uv)
        sec = secondary_ray(st.rd, attrs.normal, color, alpha, rough, ior,
                            sx, sy, u_op, u_fs, st.contrib)
        point, normal = attrs.point, sec.normal
        f, contrib, offset_sign = sec.f, sec.contrib, sec.offset_sign
        out_dir = sec.dir

        if scene.has_fog:
            (point, normal, out_dir, f, color, contrib, rough,
             offset_sign) = fog_override(
                scene, cfg, st.ro, st.rd, hit.t, sx, sy, salt,
                point, normal, out_dir, f, color, contrib, rough, offset_sign)

        i_direct = _direct_light(scene, cfg, point, normal, rough,
                                 u_light, salt, active=st.alive & attrs.valid)

        if photon_map is not None:
            from .photon import sample_photons
            caustic = sample_photons(photon_map, point, out_dir, cfg.knn_k)
            caustic = jnp.where(depth <= cfg.caustic_max_depth, caustic, 0.0)
        else:
            caustic = jnp.zeros_like(color)

        # Russian roulette (raytracer.h:263-272)
        q = jnp.max(contrib, axis=-1)
        survive = (depth <= cfg.min_depth) | (u_rr < q)
        boost = jnp.where(depth <= cfg.min_depth, 1.0,
                          1.0 / jnp.maximum(q, 1e-12))

        valid = st.alive & attrs.valid
        lum = st.radiance
        lum = lum + jnp.where(valid[:, None],
                              st.throughput * (color * i_direct), 0.0)
        lum = lum + jnp.where((valid & survive)[:, None],
                              st.throughput * (em + color * caustic), 0.0)
        lum = lum + jnp.where((st.alive & ~attrs.valid)[:, None],
                              st.throughput * ambient[None, :], 0.0)

        new_T = st.throughput * f * boost[:, None]
        new_alive = valid & survive
        new_ro = point + (offset_sign * cfg.shadow_bias)[:, None] * normal
        return PathState(new_ro, out_dir, new_T, contrib, lum, new_alive), None

    depths = jnp.arange(D)
    state, _ = jax.lax.scan(body, state, (depths, sx_all, sy_all))
    return state.radiance


class Renderer:
    """Frame renderer: adaptive QMC waves over the whole image."""

    def __init__(self, scene: Scene, camera: Camera, config: RenderConfig,
                 width: int, height: int, photon_map=None):
        self.scene = scene
        self.camera = camera
        self.cfg = config
        self.width, self.height = width, height
        self.sampler = HaltonSampler()
        self.enum = HaltonEnum(width, height)
        self.photon_map = photon_map
        # host NumPy key: a device-array closure constant is fetched back
        # from the device on every jit lowering (seconds over a TPU tunnel)
        import numpy as _np
        self._key = _np.asarray(jax.random.PRNGKey(config.seed))

    def _bounce_samples(self, idx_flat):
        """(D, R) QMC/PRNG pairs for every bounce (raytracer.h:172-173)."""
        cfg = self.cfg
        sx, sy = [], []
        for d in range(cfg.max_depth):
            dim_x, dim_y = 2 + 2 * d, 3 + 2 * d
            kx = stream(self._key, int(Purpose.DEEP_DIM_X), d)
            ky = stream(self._key, int(Purpose.DEEP_DIM_Y), d)
            sx.append(self.sampler.sample(dim_x, idx_flat)
                      if dim_x < MAX_QMC_DIMS else
                      jax.random.uniform(kx, idx_flat.shape))
            sy.append(self.sampler.sample(dim_y, idx_flat)
                      if dim_y < MAX_QMC_DIMS else
                      jax.random.uniform(ky, idx_flat.shape))
        dt = jnp.float64 if self.cfg.dtype == "float64" else jnp.float32
        return (jnp.stack(sx).astype(dt), jnp.stack(sy).astype(dt))

    @functools.partial(jax.jit, static_argnums=0)
    def _wave(self, scene, photon_map, idx_flat, wave_i):
        """One full-frame sample wave -> (H*W, 3) radiance."""
        dt = jnp.float64 if self.cfg.dtype == "float64" else jnp.float32
        xr = self.sampler.sample(0, idx_flat).astype(dt)
        yr = self.sampler.sample(1, idx_flat).astype(dt)
        dx = xr * self.enum.scale_x
        dy = yr * self.enum.scale_y
        ro, rd = primary_rays(self.camera, self.width, self.height, dx, dy)
        sx_all, sy_all = self._bounce_samples(idx_flat)
        key = jax.random.fold_in(self._key, wave_i)
        return radiance_wave(scene, self.cfg, ro, rd, sx_all, sy_all,
                             key, wave_i * 65537, photon_map)

    def state0(self):
        """Fresh accumulation state (the reference's per-pixel running
        mean/EMA-variance/sample counters, raytracer.h:100-148, as images)."""
        H, W = self.height, self.width
        dt = jnp.float64 if self.cfg.dtype == "float64" else jnp.float32
        return {
            "mean": jnp.full((H, W, 3), 0.5, dt),  # raytracer.h:102 init
            "var": jnp.zeros((H, W), dt),
            "samps": jnp.zeros((H, W), jnp.int32),
            "active": jnp.ones((H, W), bool),
            "wave": jnp.zeros((), jnp.int32),
        }

    def render(self, verbose: bool = False, on_wave=None, state=None):
        """Adaptive multi-wave render -> linear (H, W, 3) mean image.

        ``on_wave(state_dict, wave_index)`` is the incremental-display /
        checkpoint hook (the TPU-side equivalent of the reference viewer's
        32 ms repaint + progressive fill, viewer.h:16-61): called after
        every wave with the full accumulation state, which can be saved and
        passed back as ``state=`` to resume an interrupted render.
        """
        cfg = self.cfg
        H, W = self.height, self.width
        st = state if state is not None else self.state0()
        mean, var = st["mean"], st["var"]
        samps, active = st["samps"], st["active"]
        first = int(st["wave"])

        for s in range(first, cfg.max_samples):
            idx = self.enum.index_image(s).ravel()
            c = self._wave(self.scene, self.photon_map, idx,
                           jnp.uint32(s)).reshape(H, W, 3)
            prev = mean
            new_mean = jnp.where(s == 0, c, (s * mean + c) / (s + 1.0))
            mean = jnp.where(active[..., None], new_mean, mean)
            if s > 0:
                dv = jnp.linalg.norm(new_mean - prev, axis=-1)
                var = jnp.where(active, (5.0 * var + dv) / 6.0, var)
            extend = (s > 0) & (var > cfg.noise_thresh)
            samps = jnp.where(active, samps + 1 - 2 * extend, samps)
            active = active & (samps < cfg.min_samples)
            if verbose:
                print(f"wave {s}: active {int(active.sum())}/{H * W}")
            if on_wave is not None:
                on_wave({"mean": mean, "var": var, "samps": samps,
                         "active": active,
                         "wave": jnp.asarray(s + 1, jnp.int32)}, s)
            if not bool(active.any()):
                break
        return mean

    def tonemap(self, linear):
        """Gamma + clamp at the very end (raytracer.h:150-156)."""
        g = jnp.power(jnp.clip(linear, 0.0, None), 1.0 / self.cfg.gamma)
        return jnp.clip(g, 0.0, 1.0)


def render_image(scene: Scene, camera: Camera, config: RenderConfig,
                 width: int, height: int, photon_map=None, verbose=False):
    r = Renderer(scene, camera, config, width, height, photon_map)
    return r.tonemap(r.render(verbose=verbose))
