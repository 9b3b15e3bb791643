"""Pinhole camera model with radial-tangential distortion (batched, jit-safe).

Replaces the reference's use of OpenCV camera utilities
(†src/Frame.cc:UndistortKeyPoints via cv::undistortPoints; projection math
inlined throughout †src/Tracking.cc / †src/ORBmatcher.cc). Functional: the
camera is a small pytree of scalars, all ops broadcast over points.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Camera(NamedTuple):
    """Intrinsics + distortion + stereo baseline, all float32 scalars.

    `bf` = fx * baseline (same meaning as the reference's `Camera.bf` YAML
    key); 0.0 for monocular. `th_depth` is the close/far stereo point gate
    multiplier (reference `ThDepth`).
    """

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    k1: jnp.ndarray
    k2: jnp.ndarray
    p1: jnp.ndarray
    p2: jnp.ndarray
    k3: jnp.ndarray
    bf: jnp.ndarray
    width: int
    height: int

    @staticmethod
    def create(fx, fy, cx, cy, k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0, bf=0.0,
               width=640, height=480) -> "Camera":
        f = lambda v: jnp.asarray(v, jnp.float32)
        return Camera(f(fx), f(fy), f(cx), f(cy), f(k1), f(k2), f(p1), f(p2),
                      f(k3), f(bf), int(width), int(height))

    @property
    def K(self) -> jnp.ndarray:
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx], axis=-1),
                jnp.stack([z, self.fy, self.cy], axis=-1),
                jnp.stack([z, z, o], axis=-1),
            ],
            axis=-2,
        )

    @property
    def baseline(self) -> jnp.ndarray:
        return self.bf / jnp.maximum(self.fx, 1e-8)

    @property
    def has_distortion(self) -> bool:
        # Static check usable at trace time when params are concrete floats.
        import numpy as np

        vals = [self.k1, self.k2, self.p1, self.p2, self.k3]
        try:
            return any(abs(float(np.asarray(v))) > 0 for v in vals)
        except Exception:
            return True


def distort_normalized(cam: Camera, xn: jnp.ndarray) -> jnp.ndarray:
    """Apply radial-tangential distortion to normalized coords (..., 2)."""
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + cam.k1 * r2 + cam.k2 * r2 * r2 + cam.k3 * r2 * r2 * r2
    xd = x * radial + 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
    yd = y * radial + cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_points(cam: Camera, uv: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
    """Undistort pixel coords (..., 2) -> pixel coords in the ideal camera.

    Fixed-point iteration identical in spirit to cv::undistortPoints
    (reference †src/Frame.cc:UndistortKeyPoints); fixed iteration count keeps
    it jit-static.
    """
    xn = jnp.stack(
        [(uv[..., 0] - cam.cx) / cam.fx, (uv[..., 1] - cam.cy) / cam.fy], axis=-1
    )
    xd = xn

    def body(_, x):
        d = distort_normalized(cam, x) - x  # distortion delta at current estimate
        return xd - d

    xu = jax.lax.fori_loop(0, iters, body, xn)
    return jnp.stack(
        [xu[..., 0] * cam.fx + cam.cx, xu[..., 1] * cam.fy + cam.cy], axis=-1
    )


def project(cam: Camera, pc: jnp.ndarray) -> jnp.ndarray:
    """Project camera-frame points (..., 3) -> pixel (..., 2) (no distortion).

    The reference projects undistorted keypoints, so matching/BA all happen in
    the ideal pinhole model; we keep the same convention.
    """
    z = pc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    u = cam.fx * pc[..., 0] * inv_z + cam.cx
    v = cam.fy * pc[..., 1] * inv_z + cam.cy
    return jnp.stack([u, v], axis=-1)


def project_stereo(cam: Camera, pc: jnp.ndarray) -> jnp.ndarray:
    """Project to (u, v, u_right): u_right = u - bf/z (†src/Frame.cc stereo)."""
    uv = project(cam, pc)
    z = jnp.maximum(pc[..., 2], 1e-8)
    ur = uv[..., 0] - cam.bf / z
    return jnp.concatenate([uv, ur[..., None]], axis=-1)


def backproject(cam: Camera, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Pixel (..., 2) + depth (...) -> camera-frame 3D point (..., 3)."""
    x = (uv[..., 0] - cam.cx) / cam.fx * depth
    y = (uv[..., 1] - cam.cy) / cam.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def in_image(cam: Camera, uv: jnp.ndarray, border: float = 0.0) -> jnp.ndarray:
    """Validity mask (...,) for pixel coordinates inside the image bounds."""
    return (
        (uv[..., 0] >= border)
        & (uv[..., 0] < cam.width - border)
        & (uv[..., 1] >= border)
        & (uv[..., 1] < cam.height - border)
    )
