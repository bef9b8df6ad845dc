"""Pinhole camera / KITTI calibration geometry (SURVEY.md C2).

KITTI convention: ``Tr`` maps Velodyne coordinates into the cam0 frame, and the
3x4 projection matrix ``P`` maps cam0-frame homogeneous points to pixels of a
given camera (P0 for gray-left).  All ops are pure JAX and batched.
"""
from __future__ import annotations

from typing import NamedTuple

import functools

import jax.numpy as jnp
from jax import lax

# Geometry matmuls are tiny but accuracy-critical: JAX's default matmul
# precision truncates to bfloat16 on some backends, which costs ~0.1 px / ~1 cm
# errors that dwarf the drift budget.  Force full float32 accumulation.
heinsum = functools.partial(jnp.einsum, precision=lax.Precision.HIGHEST)


class Camera(NamedTuple):
    """Static calibration bundle carried through jit (all fixed-shape)."""

    P: jnp.ndarray  # (3, 4) pixel projection from the reference cam frame
    T_cam_velo: jnp.ndarray  # (4, 4) velodyne -> camera rigid transform
    width: int
    height: int

    @property
    def fx(self):
        return self.P[0, 0]

    @property
    def fy(self):
        return self.P[1, 1]

    @property
    def cx(self):
        return self.P[0, 2]

    @property
    def cy(self):
        return self.P[1, 2]


def project(P: jnp.ndarray, pts_cam: jnp.ndarray, eps: float = 1e-6):
    """Project camera-frame 3D points to pixels with a 3x4 matrix.

    Returns ``(uv, valid)`` where ``uv`` is (..., 2) pixel coords and ``valid``
    marks points in front of the camera.  Division is guarded so the function
    is NaN-free for masked/padded points.
    """
    pts_h = jnp.concatenate([pts_cam, jnp.ones_like(pts_cam[..., :1])], axis=-1)
    x = heinsum("ij,...j->...i", P, pts_h)
    z = x[..., 2]
    valid = z > eps
    safe_z = jnp.where(valid, z, 1.0)
    uv = x[..., :2] / safe_z[..., None]
    return uv, valid


def project_depth(P: jnp.ndarray, pts_cam: jnp.ndarray, eps: float = 1e-6):
    """Like :func:`project` but also returns the projective depth z."""
    uv, valid = project(P, pts_cam, eps)
    pts_h = jnp.concatenate([pts_cam, jnp.ones_like(pts_cam[..., :1])], axis=-1)
    z = heinsum("j,...j->...", P[2], pts_h)
    return uv, z, valid


def backproject(cam: Camera, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Pixel + projective depth -> camera-frame 3D point.

    Accounts for the KITTI baseline term P[0,3] (cam frame vs cam0 frame):
    u = (fx X + cx Z + P03) / Z  =>  X = ((u - cx) Z - P03) / fx.
    """
    z = depth
    x = ((uv[..., 0] - cam.cx) * z - cam.P[0, 3]) / cam.fx
    y = ((uv[..., 1] - cam.cy) * z - cam.P[1, 3]) / cam.fy
    return jnp.stack([x, y, z], axis=-1)


def normalized_ray(cam: Camera, uv: jnp.ndarray) -> jnp.ndarray:
    """Unit-depth viewing ray (X/Z, Y/Z, 1) for a pixel (ignoring baseline)."""
    x = (uv[..., 0] - cam.cx) / cam.fx
    y = (uv[..., 1] - cam.cy) / cam.fy
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def in_image(cam: Camera, uv: jnp.ndarray, margin: float = 0.0) -> jnp.ndarray:
    return (
        (uv[..., 0] >= margin)
        & (uv[..., 0] <= cam.width - 1 - margin)
        & (uv[..., 1] >= margin)
        & (uv[..., 1] <= cam.height - 1 - margin)
    )
