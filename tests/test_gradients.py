"""Gradient breadth: analytic vs finite differences for every parameter
family the north star names (material, texture, light, geometry) plus
camera and the photon pipeline."""

import numpy as np
import jax.numpy as jnp
import pytest

from gi_raytracer_tpu.config import RenderConfig
from gi_raytracer_tpu.scene import SceneBuilder
from gi_raytracer_tpu import gradcheck


class _LS:
    """Minimal load_scene-like wrapper for built scenes."""
    def __init__(self, scene, cfg, cam_pos, cam_look):
        self.scene = scene
        self.config = cfg
        self.camera_pos = cam_pos
        self.camera_look_at = cam_look


def _box_scene(with_glass=False, rough=1.0):
    """Closed diffuse box + area light: every ray hits geometry, wall quads
    are coplanar triangle pairs => visibility changes are benign and the
    detached-sampling gradient estimator is exact."""
    b = SceneBuilder()
    white = b.add_texture_const((0.9, 0.9, 0.9))
    red = b.add_texture_const((0.8, 0.2, 0.2))
    blue = b.add_texture_const((0.2, 0.2, 0.8))
    black = b.add_texture_const((0.0, 0.0, 0.0))
    m_white = b.add_material(white, black, rough, 1.0, 1.0)
    m_red = b.add_material(red, black, rough, 1.0, 1.0)
    m_blue = b.add_material(blue, black, rough, 1.0, 1.0)
    from gi_raytracer_tpu.scene.meshgen import quad_mesh
    s = 4.0
    b.add_triangles(quad_mesh((-s, -s, -s), (s, -s, -s), (-s, -s, s),
                              (s, -s, s)), mat_id=m_white)
    b.add_triangles(quad_mesh((-s, s, -s), (s, s, -s), (-s, s, s),
                              (s, s, s)), mat_id=m_white)
    b.add_triangles(quad_mesh((-s, -s, s), (s, -s, s), (-s, s, s),
                              (s, s, s)), mat_id=m_white)
    b.add_triangles(quad_mesh((-s, -s, -s), (-s, -s, s), (-s, s, -s),
                              (-s, s, s)), mat_id=m_red)
    b.add_triangles(quad_mesh((s, -s, s), (s, -s, -s), (s, s, s),
                              (s, s, -s)), mat_id=m_blue)
    if with_glass:
        m_glass = b.add_material(white, black, 0.0, 0.0, 1.5)
        b.add_sphere((0.0, -2.0, 0.0), 1.2, m_glass)
    b.add_light((0.0, 3.0, 0.0), (8.0, 8.0, 8.0), 0.3)
    scene = b.build(dtype=np.float64)
    cfg = RenderConfig(dtype="float64")
    return _LS(scene, cfg, (0.0, 0.0, -14.0), (0.0, 0.0, 0.0))


@pytest.fixture(scope="module")
def box():
    return _box_scene()


@pytest.fixture(scope="module")
def box_glass():
    return _box_scene(with_glass=True)


def test_grad_light_color(box):
    rep = gradcheck.check_light_color(box)
    assert rep.ok, f"{rep.name}: rel {rep.rel_err}\n{rep.analytic}\n{rep.fd}"
    assert (np.abs(rep.analytic) > 0).any()


def test_grad_texture_color(box):
    rep = gradcheck.check_texture_color(box)
    assert rep.ok, f"{rep.name}: rel {rep.rel_err}\n{rep.analytic}\n{rep.fd}"
    assert (np.abs(rep.analytic) > 0).any()


def test_grad_roughness(box):
    rep = gradcheck.check_roughness(box)
    assert rep.ok, f"{rep.name}: rel {rep.rel_err}\n{rep.analytic}\n{rep.fd}"


def test_grad_ior(box_glass):
    rep = gradcheck.check_ior(box_glass)
    assert rep.rel_err < 5e-2, (
        f"{rep.name}: rel {rep.rel_err}\n{rep.analytic}\n{rep.fd}")
    assert (np.abs(rep.analytic) > 0).any()


def _floor_scene():
    """One huge diffuse floor quad filling the frustum: every camera ray
    hits it, the only primitive boundary is the benign coplanar diagonal —
    so vertex perturbations change the image smoothly and FD is exact."""
    b = SceneBuilder()
    white = b.add_texture_const((0.9, 0.9, 0.9))
    black = b.add_texture_const((0.0, 0.0, 0.0))
    m = b.add_material(white, black, 1.0, 1.0, 1.0)
    from gi_raytracer_tpu.scene.meshgen import quad_mesh
    b.add_triangles(quad_mesh((-50, 0, -50), (50, 0, -50), (-50, 0, 50),
                              (50, 0, 50)), mat_id=m)
    b.add_light((0.0, 8.0, 0.0), (20.0, 20.0, 20.0), 0.3)
    scene = b.build(dtype=np.float64)
    cfg = RenderConfig(dtype="float64")
    return _LS(scene, cfg, (0.0, 5.0, -6.0), (0.0, 0.0, 0.0))


def test_grad_vertices():
    rep = gradcheck.check_vertices(_floor_scene())
    assert rep.ok, f"{rep.name}: rel {rep.rel_err}\n{rep.analytic}\n{rep.fd}"
    assert (np.abs(rep.analytic) > 0).any()


@pytest.mark.slow
def test_grad_camera(box):
    rep = gradcheck.check_camera(box)
    assert rep.ok, f"{rep.name}: rel {rep.rel_err}\n{rep.analytic}\n{rep.fd}"
    assert (np.abs(rep.analytic) > 0).any()


@pytest.mark.slow
def test_grad_light_color_through_photon_map():
    """Gradients survive trace_photons -> build/rebind -> sample_photons."""
    b = SceneBuilder()
    white = b.add_texture_const((1.0, 1.0, 1.0))
    black = b.add_texture_const((0.0, 0.0, 0.0))
    diffuse = b.add_material(white, black, 1.0, 1.0, 1.0)
    glass = b.add_material(white, black, 0.0, 0.0, 1.5)
    b.add_triangle([(-20, 0, -20), (20, 0, -20), (0, 0, 30)], mat_id=diffuse)
    b.add_sphere((0, 2, 0), 0.7, glass)
    b.add_light((0, 6, 0), (10, 10, 10), 0.05)
    scene = b.build(dtype=np.float64)
    cfg = RenderConfig(photons=512, photon_depth=5, dtype="float64")
    rep = gradcheck.check_light_color_through_photons(scene, cfg)
    assert rep.ok, f"{rep.name}: rel {rep.rel_err}\n{rep.analytic}\n{rep.fd}"
    assert (np.abs(rep.analytic) > 0).any(), "photon-path gradient is zero"
