"""Analytic cone primitive + low-discrepancy sampler tests."""

import numpy as np
import jax.numpy as jnp

from gi_raytracer_tpu.scene import SceneBuilder
from gi_raytracer_tpu.ops import closest_hit
from gi_raytracer_tpu.ops.intersect import ray_cone, cone_attrs
from gi_raytracer_tpu.sampling.lowdisc import (
    radical_inverse_vdc, hammersley2d, subrand, subrand_unit_vec,
    importance_sample_ggx)


def _cone_scene(rot=(0.0, 0.0, 0.0)):
    b = SceneBuilder()
    t0 = b.add_texture_const((1, 1, 1))
    m = b.add_material(t0, t0, 1.0, 1.0, 1.0)
    b.add_cone((0, 0, 0), rot, 1.0, 2.0, m)
    return b.build(dtype=np.float64)


def test_cone_axis_hit():
    """A ray down the +z axis from above hits the apex at z=height."""
    scene = _cone_scene()
    ro = jnp.asarray([[0.1, 0.0, 5.0]])
    rd = jnp.asarray([[0.0, 0.0, -1.0]])
    hit = closest_hit(scene, ro, rd)
    assert int(hit.prim[0]) == 0  # only primitive => cone id base 0
    # surface point: x=0.1 => radius 0.1 => z = height*(1 - r/rad) = 1.8
    np.testing.assert_allclose(float(hit.t[0]), 5.0 - 1.8, rtol=1e-9)


def test_cone_side_hit_and_miss():
    scene = _cone_scene()
    ro = jnp.asarray([[5.0, 0.0, 0.5], [5.0, 0.0, 3.0]])
    rd = jnp.asarray([[-1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]])
    hit = closest_hit(scene, ro, rd)
    # at z=0.5, surface radius = rad*(1 - z/h) = 0.75
    np.testing.assert_allclose(float(hit.t[0]), 5.0 - 0.75, rtol=1e-9)
    assert int(hit.prim[1]) == -1  # above the apex: miss


def test_cone_normal_outward_and_rotated():
    """Normals point away from the axis and rotate with the cone."""
    scene = _cone_scene()
    p = jnp.asarray([[0.75, 0.0, 0.5]])
    n, uv = cone_attrs(scene.cones, p, jnp.asarray([0]))
    n = np.asarray(n)[0]
    assert n[0] > 0.5  # outward in +x
    # slope: for r/h = 0.5 the surface normal z-component is sin(atan(0.5))
    np.testing.assert_allclose(np.linalg.norm(n), 1.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(uv)[0, 1], 0.25, atol=1e-9)

    # rotate the cone 90° about x: axis now points in -y... verify a hit
    # from the side still reports a unit normal with zero x-component
    scene_r = _cone_scene(rot=(np.pi / 2, 0.0, 0.0))
    ro = jnp.asarray([[0.0, -5.0, 0.02]])
    rd = jnp.asarray([[0.0, 1.0, 0.0]])
    hit = closest_hit(scene_r, ro, rd)
    assert int(hit.prim[0]) == 0


def test_cone_behind_ray_rejected():
    scene = _cone_scene()
    ro = jnp.asarray([[0.0, 0.0, 5.0]])
    rd = jnp.asarray([[0.0, 0.0, 1.0]])  # pointing away
    hit = closest_hit(scene, ro, rd)
    assert int(hit.prim[0]) == -1


def test_ray_cone_inside_hits_far_wall():
    scene = _cone_scene()
    cn = scene.cones
    t, ok = ray_cone(jnp.asarray([0.0, 0.0, 0.5]), jnp.asarray([1.0, 0.0, 0.0]),
                     cn.pos[0], cn.rad[0], cn.height[0], cn.w2l[0])
    assert bool(ok)
    np.testing.assert_allclose(float(t), 0.75, rtol=1e-9)


# --------------------------------------------------------------------------
# low-discrepancy samplers (reference include/util.cpp:108-162, util.h:162-188)
# --------------------------------------------------------------------------

def test_radical_inverse_vdc_values():
    got = np.asarray(radical_inverse_vdc(jnp.arange(8, dtype=jnp.uint32)))
    want = [0.0, 0.5, 0.25, 0.75, 0.125, 0.625, 0.375, 0.875]
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_hammersley_first_coord_is_i_over_n():
    h = np.asarray(hammersley2d(jnp.arange(16, dtype=jnp.uint32), 16))
    np.testing.assert_allclose(h[:, 0], np.arange(16) / 16.0, atol=1e-7)
    assert h[:, 1].min() >= 0 and h[:, 1].max() < 1


def test_subrand_additive_recurrence():
    s = np.asarray(subrand(100, start=0.3, prime_index=1))
    a = np.sqrt(3.0) % 1.0
    want = (0.3 + (np.arange(1, 101)) * a) % 1.0
    np.testing.assert_allclose(s, want, atol=1e-4)
    assert s.min() >= 0 and s.max() < 1


def test_subrand_unit_vec_on_sphere_low_discrepancy():
    v = np.asarray(subrand_unit_vec(256))
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-5)
    # uniform on the sphere => mean close to zero
    assert np.linalg.norm(v.mean(0)) < 0.05


def test_ggx_sample_range():
    g = np.asarray(importance_sample_ggx(jnp.asarray(0.3), jnp.asarray(0.7),
                                         jnp.asarray(0.5)))
    assert 0 <= g[0] <= 2 * np.pi + 1e-6
    assert 0 <= g[1] <= np.pi / 2 + 1e-6
