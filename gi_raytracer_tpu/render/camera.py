"""Camera model + primary ray generation.

Sensor geometry matches the reference (reference include/camera.h:7-31,
raytracer.h:74-80,112-129): sensor diagonal 0.035*240*2, focal distance
0.04*240, basis built from up=(0,1,0), screen center at pos + focalDist *
forward.  Ray generation is pure jnp and differentiable wrt position/look-at.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from .geom import normalize

SENSOR_DIAG = 0.035 * 240 * 2   # camera.h:29
FOCAL_DIST = 0.04 * 240         # camera.h:30


@dataclasses.dataclass
class Camera:
    pos: tuple = (10.0, 5.0, 0.0)      # main.cpp:28 default
    look_at: tuple = (0.0, 0.0, 0.0)
    sensor_diag: float = SENSOR_DIAG
    focal_dist: float = FOCAL_DIST
    focal_blur: float = 0.0            # FOCAL_BLUR (util.h:30)

    def basis(self, dtype=jnp.float32):
        """(pos, forward, up, cam_right) per camera.h:9-15 + raytracer.h:78."""
        pos = jnp.asarray(self.pos, dtype)
        fwd = normalize(jnp.asarray(self.look_at, dtype) - pos)
        up0 = jnp.asarray([0.0, 1.0, 0.0], dtype)
        right = normalize(jnp.cross(up0, fwd))
        up = jnp.cross(fwd, right)
        cam_right = normalize(jnp.cross(fwd, up))  # raytracer.h:78
        return pos, fwd, up, cam_right


def primary_rays(cam: Camera, width: int, height: int,
                 dx: jnp.ndarray, dy: jnp.ndarray,
                 lens_u: jnp.ndarray | None = None,
                 lens_v: jnp.ndarray | None = None):
    """Rays through screen-space positions dx in [0,width), dy in [0,height).

    dx/dy are the Halton samples scaled by the enum (raytracer.h:122-123);
    returns (origins (R,3), directions (R,3)).
    """
    dt = dx.dtype
    pos, fwd, up, cam_right = cam.basis(dt)
    shw = (cam.sensor_diag * width) / jnp.sqrt(
        jnp.asarray(float(width * width + height * height), dt))
    shh = shw * (height / width)
    center = pos + cam.focal_dist * fwd
    pixel = (center
             + (shw * (dx[:, None] / width - 0.5)) * cam_right[None, :]
             - (shh * (dy[:, None] / height - 0.5)) * up[None, :])
    eye = pos[None, :]
    if cam.focal_blur and lens_u is not None:
        eye = eye + (cam.focal_blur * (lens_u[:, None] - 0.5)) * cam_right[None, :] \
                  + (cam.focal_blur * (lens_v[:, None] - 0.5)) * up[None, :]
        eye = jnp.broadcast_to(eye, pixel.shape)
    else:
        eye = jnp.broadcast_to(eye, pixel.shape)
    return eye, normalize(pixel - eye)
