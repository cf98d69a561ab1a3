"""Pinhole camera model with radial-tangential distortion.

Replaces the reference's scattered use of cv::undistortPoints + hardcoded
projection math (reference: src/Frame.cc:733-829 UndistortKeyPoints /
UndistortKeyLines, src/Tracking.cc:60-110 intrinsics parsing). Batched over
points; jit/vmap safe.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Camera(NamedTuple):
    """Intrinsics + distortion + stereo baseline, all scalars (f32).

    `bf` = baseline * fx (the reference's `Camera.bf`), used for stereo
    matching and depth: z = bf / disparity. `th_depth` is the close/far
    point threshold multiplier (reference `ThDepth`).
    """

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    k1: jax.Array
    k2: jax.Array
    p1: jax.Array
    p2: jax.Array
    k3: jax.Array
    bf: jax.Array
    width: int
    height: int

    @staticmethod
    def create(fx, fy, cx, cy, k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0,
               bf=0.0, width=640, height=480) -> "Camera":
        f = lambda v: jnp.asarray(v, jnp.float32)
        return Camera(f(fx), f(fy), f(cx), f(cy), f(k1), f(k2), f(p1), f(p2),
                      f(k3), f(bf), int(width), int(height))

    @property
    def K(self) -> jax.Array:
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=jnp.float32,
        )

    @property
    def has_distortion(self) -> bool:
        return True  # decided at trace time by the caller via static config


def project(cam: Camera, pts_cam: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Camera-frame 3D points (N,3) -> pixel coords (N,2), depth (N,).

    Pure pinhole (no distortion): the pipeline works on undistorted
    keypoints, as the reference does (Frame.cc:733).
    """
    z = pts_cam[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = cam.fx * pts_cam[..., 0] / z_safe + cam.cx
    v = cam.fy * pts_cam[..., 1] / z_safe + cam.cy
    return jnp.stack([u, v], axis=-1), z


def backproject(cam: Camera, uv: jax.Array, depth: jax.Array) -> jax.Array:
    """Pixels (N,2) + depth (N,) -> camera-frame 3D points (N,3)."""
    x = (uv[..., 0] - cam.cx) / cam.fx * depth
    y = (uv[..., 1] - cam.cy) / cam.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def distort_normalized(cam: Camera, xy: jax.Array) -> jax.Array:
    """Apply radial-tangential distortion to normalized coords (N,2)."""
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
    xd = x * radial + 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
    yd = y * radial + cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_points(cam: Camera, uv: jax.Array, iters: int = 8) -> jax.Array:
    """Iteratively invert the distortion model (cv::undistortPoints analog).

    Fixed iteration count (no data-dependent loop) — jit-safe. (N,2)->(N,2)
    pixel coordinates.
    """
    x0 = (uv[..., 0] - cam.cx) / cam.fx
    y0 = (uv[..., 1] - cam.cy) / cam.fy
    xy0 = jnp.stack([x0, y0], axis=-1)

    def body(_, xy):
        d = distort_normalized(cam, xy)
        return xy - (d - xy0)

    xy = jax.lax.fori_loop(0, iters, body, xy0)
    u = xy[..., 0] * cam.fx + cam.cx
    v = xy[..., 1] * cam.fy + cam.cy
    return jnp.stack([u, v], axis=-1)


def project_world(cam: Camera, Tcw: jax.Array, pts_w: jax.Array):
    """World points (N,3) through pose Tcw (4,4) -> (uv (N,2), depth (N,))."""
    R = Tcw[:3, :3]
    t = Tcw[:3, 3]
    pc = pts_w @ R.T + t
    return project(cam, pc)


def in_image(cam: Camera, uv: jax.Array, border: float = 0.0) -> jax.Array:
    """Visibility mask for pixel coords (N,2)."""
    return (
        (uv[..., 0] >= border)
        & (uv[..., 0] < cam.width - border)
        & (uv[..., 1] >= border)
        & (uv[..., 1] < cam.height - border)
    )
