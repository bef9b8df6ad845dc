"""Motion deskew (SURVEY.md C3) — constant-velocity scan undistortion.

A spinning LiDAR acquires each azimuth column at a different time while the
vehicle moves, so a raw scan is geometrically smeared.  Under the
constant-velocity assumption the sensor pose during the sweep is
``T(s) = T(0) @ exp(s * xi)`` where ``xi = log(delta)`` is the predicted
frame-to-frame motion and ``s in [0,1)`` is the azimuth phase of each point.
A point measured in the instantaneous frame at phase ``s`` maps into the
sweep-start frame as ``p0 = exp(s*xi) @ p``.

Everything is one batched vectorized pass (per-point Rodrigues via
``se3.exp`` broadcast over N) — the reference's per-point C++ loop becomes a
single fused XLA computation.
"""
from __future__ import annotations

import jax.numpy as jnp

from velo_tpu.geom import se3

_TWO_PI = 2.0 * jnp.pi


def azimuth_phase(pts: jnp.ndarray, az_start: float = 0.0) -> jnp.ndarray:
    """Per-point sweep phase s in [0,1) from the clockwise spin azimuth.

    The scanner spins clockwise (viewed from +z): azimuth decreases over the
    sweep.  ``az_start`` is the azimuth at which the sweep begins (0 for the
    synthetic simulator; real KITTI sweeps start near the rear, ~pi).
    """
    az = jnp.arctan2(pts[..., 1], pts[..., 0])
    return jnp.mod(az_start - az, _TWO_PI) / _TWO_PI


def deskew(
    pts: jnp.ndarray,
    delta_xi: jnp.ndarray,
    az_start: float = 0.0,
    enabled: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Undistort raw points into the sweep-start frame.

    Args:
      pts: (N, 3) raw points in instantaneous sensor frames.
      delta_xi: (6,) se(3) predicted motion over the full sweep.
      az_start: sweep start azimuth.
      enabled: statically disable (config 1 stub) while keeping the shape path.

    Returns:
      (deskewed (N,3) points, per-point phase (N,)).
    """
    s = azimuth_phase(pts, az_start)
    if not enabled:
        return pts, s
    out = apply_scaled_exp(pts, s, delta_xi)
    return out, s


def apply_scaled_exp(pts: jnp.ndarray, s: jnp.ndarray,
                     xi: jnp.ndarray) -> jnp.ndarray:
    """Compute ``exp(s_i * xi) @ p_i`` for all points without materializing
    per-point 4x4 matrices.

    Every per-point transform shares the rotation *axis* of ``xi`` — only the
    angle scales with the phase — so Rodrigues applies directly with
    per-point sin/cos scalars:

        p' = p cos(a) + (k x p) sin(a) + k (k.p)(1 - cos a) + V(a k) (s rho)

    This replaces a (N,4,4) tensor build + batched matmul (several ms/frame
    of bandwidth and layout copies in the device profile) with ~15 fused
    element-wise ops on (N,) lanes.
    """
    rho, phi = xi[:3], xi[3:]
    theta = jnp.linalg.norm(phi)
    small = theta < 1e-8
    k = phi / jnp.where(small, 1.0, theta)  # unit axis (arbitrary if ~0)
    a = s * theta  # per-point angle
    sin_a = jnp.sin(a)[:, None]
    cos_a = jnp.cos(a)[:, None]

    kxp = jnp.cross(k[None, :], pts)
    kdp = jnp.sum(pts * k[None, :], axis=-1, keepdims=True)
    rot = pts * cos_a + kxp * sin_a + k[None, :] * kdp * (1.0 - cos_a)

    # Translation: V(a k) @ (s rho) with V = I + ((1-cos a)/a) hat(k)
    # + ((a - sin a)/a) hat(k)^2 ; Taylor-guard the a->0 limits.
    safe_a = jnp.where(jnp.abs(a) < 1e-6, 1.0, a)[:, None]
    B = jnp.where(jnp.abs(a)[:, None] < 1e-6, 0.5 * a[:, None],
                  (1.0 - cos_a) / safe_a)
    C = jnp.where(jnp.abs(a)[:, None] < 1e-6, a[:, None] ** 2 / 6.0,
                  (a[:, None] - sin_a) / safe_a)
    kxr = jnp.cross(k, rho)
    kxkxr = jnp.cross(k, kxr)
    t = s[:, None] * (rho[None, :] + B * kxr[None, :] + C * kxkxr[None, :])
    out = rot + t
    # Pure-translation limit: rotation is identity.
    return jnp.where(small, pts + s[:, None] * rho[None, :], out)


def redeskew(pts: jnp.ndarray, phase: jnp.ndarray, xi_old: jnp.ndarray,
             xi_new: jnp.ndarray) -> jnp.ndarray:
    """Re-correct already-deskewed points with an improved motion estimate.

    Deskew ran with the *predicted* motion before the solve; once the joint
    solve yields the realized motion, features must be re-expressed with it —
    otherwise consecutive frames carry different residual distortion and
    scan-to-scan matching inherits that mismatch (the dominant error source
    found in end-to-end testing):  p_fix = exp(s*xi_new) exp(-s*xi_old) p.

    Matrix-free: exp(-s*xi_old) == exp(s*(-xi_old)), so both factors apply
    via the shared-axis Rodrigues pass — no (N,4,4) materialization (the
    batched 4x4 builds showed up as ~0.5 ms/frame of layout copies in the
    device trace).
    """
    return apply_scaled_exp(
        apply_scaled_exp(pts, phase, -xi_old), phase, xi_new
    )
