"""SE(3) Lie-group utilities, pure JAX, batched, numerically safe in float32.

Replaces the Eigen geometry layer of the reference pipeline (SURVEY.md C2).
Poses are 4x4 homogeneous matrices; tangent vectors are 6-vectors
``xi = (rho, phi)`` with translation part first and rotation part (axis-angle)
second.  All functions broadcast over arbitrary leading batch dimensions, which
is what lets the deskew stage apply a *per-point* fractional pose with a single
vectorized call.

Small-angle branches use Taylor series selected with ``jnp.where`` on safe
denominators so that the functions are jit-safe, NaN-free, and differentiable
everywhere — a requirement for the hand-derived Jacobians in velo_tpu.solve.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
from jax import lax

# Geometry matmuls are tiny but accuracy-critical: JAX's default matmul
# precision truncates to bfloat16 on some backends, which costs ~0.1 px / ~1 cm
# errors that dwarf the drift budget.  Force full float32 accumulation.
heinsum = functools.partial(jnp.einsum, precision=lax.Precision.HIGHEST)

_EPS = 1e-6


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of a 3-vector; batched over leading dims."""
    w = jnp.asarray(w)
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], zeros, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat: extract the 3-vector from a skew-symmetric matrix."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc_coeffs(theta_sq: jnp.ndarray):
    """A = sin(t)/t, B = (1-cos(t))/t^2, C = (t-sin(t))/t^3, safely.

    Inputs are theta^2 to avoid a sqrt of a near-zero value feeding gradients.
    """
    theta = jnp.sqrt(jnp.maximum(theta_sq, 1e-24))
    small = theta_sq < _EPS
    safe_t = jnp.where(small, 1.0, theta)
    A = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(safe_t) / safe_t)
    B = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(safe_t)) / (safe_t * safe_t))
    C = jnp.where(
        small,
        1.0 / 6.0 - theta_sq / 120.0,
        (safe_t - jnp.sin(safe_t)) / (safe_t * safe_t * safe_t),
    )
    return A, B, C


def exp_so3(phi: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula: axis-angle 3-vector -> rotation matrix. Batched."""
    theta_sq = jnp.sum(phi * phi, axis=-1)
    A, B, _ = _sinc_coeffs(theta_sq)
    K = hat(phi)
    KK = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + A[..., None, None] * K + B[..., None, None] * KK


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion (w, x, y, z), Shepperd's method.

    Branchless (4-way jnp.where on the largest diagonal combination) so it is
    well-conditioned for every rotation including angles near pi.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate 4*q_i^2 values; pick the largest for stability.
    qw2 = 1.0 + tr
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    def _safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # Branch w: q = [s/4? ...] with s = 2*sqrt(qw2)
    sw = 2.0 * _safe_sqrt(qw2)
    quat_w = jnp.stack(
        [0.25 * sw, (m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw], axis=-1
    )
    sx = 2.0 * _safe_sqrt(qx2)
    quat_x = jnp.stack(
        [(m21 - m12) / sx, 0.25 * sx, (m01 + m10) / sx, (m02 + m20) / sx], axis=-1
    )
    sy = 2.0 * _safe_sqrt(qy2)
    quat_y = jnp.stack(
        [(m02 - m20) / sy, (m01 + m10) / sy, 0.25 * sy, (m12 + m21) / sy], axis=-1
    )
    sz = 2.0 * _safe_sqrt(qz2)
    quat_z = jnp.stack(
        [(m10 - m01) / sz, (m02 + m20) / sz, (m12 + m21) / sz, 0.25 * sz], axis=-1
    )

    # Selection: prefer w-branch when trace is dominant, else largest diagonal.
    cand = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    idx = jnp.argmax(cand, axis=-1)
    q = jnp.where(
        (idx == 0)[..., None],
        quat_w,
        jnp.where(
            (idx == 1)[..., None],
            quat_x,
            jnp.where((idx == 2)[..., None], quat_y, quat_z),
        ),
    )
    # Normalize and fix sign (w >= 0) for a canonical representative.
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> axis-angle 3-vector, robust for all angles in [0, pi]."""
    q = rotmat_to_quat(R)
    qw = q[..., 0]
    qv = q[..., 1:]
    n = jnp.linalg.norm(qv, axis=-1)
    small = n < _EPS
    safe_n = jnp.where(small, 1.0, n)
    theta = 2.0 * jnp.arctan2(n, qw)
    # theta/n with Taylor fallback: theta ~ 2n/qw for small n  => theta/n ~ 2/qw
    scale = jnp.where(small, 2.0 / jnp.maximum(qw, 0.5), theta / safe_n)
    return scale[..., None] * qv


def _left_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    """SO(3) left Jacobian V such that exp_se3 translation t = V @ rho."""
    theta_sq = jnp.sum(phi * phi, axis=-1)
    _, B, C = _sinc_coeffs(theta_sq)
    K = hat(phi)
    KK = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + B[..., None, None] * K + C[..., None, None] * KK


def _left_jacobian_inv(phi: jnp.ndarray) -> jnp.ndarray:
    theta_sq = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta_sq, 1e-24))
    small = theta_sq < _EPS
    safe_t = jnp.where(small, 1.0, theta)
    # D = (1/t^2) - (1+cos t)/(2 t sin t), Taylor: 1/12 + t^2/720
    cot_term = (1.0 + jnp.cos(safe_t)) / (2.0 * safe_t * jnp.sin(safe_t))
    D = jnp.where(small, 1.0 / 12.0 + theta_sq / 720.0, 1.0 / (safe_t * safe_t) - cot_term)
    K = hat(phi)
    KK = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye - 0.5 * K + D[..., None, None] * KK


def exp(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) tangent (rho, phi) -> 4x4 homogeneous transform. Batched."""
    xi = jnp.asarray(xi)
    rho, phi = xi[..., :3], xi[..., 3:]
    R = exp_so3(phi)
    t = heinsum("...ij,...j->...i", _left_jacobian(phi), rho)
    return from_rt(R, t)


def log(T: jnp.ndarray) -> jnp.ndarray:
    """4x4 homogeneous transform -> se(3) tangent (rho, phi). Batched."""
    R, t = to_rt(T)
    phi = log_so3(R)
    rho = heinsum("...ij,...j->...i", _left_jacobian_inv(phi), t)
    return jnp.concatenate([rho, phi], axis=-1)


def from_rt(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Assemble a 4x4 transform from rotation (…,3,3) and translation (…,3)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (4,)
    )[..., None, :]
    return jnp.concatenate([top, bottom], axis=-2)


def to_rt(T: jnp.ndarray):
    return T[..., :3, :3], T[..., :3, 3]


def identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.eye(4, dtype=dtype)


def inv(T: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a rigid transform (exact, no linear solve)."""
    R, t = to_rt(T)
    Rt = jnp.swapaxes(R, -1, -2)
    return from_rt(Rt, -heinsum("...ij,...j->...i", Rt, t))


def compose(*Ts: jnp.ndarray) -> jnp.ndarray:
    out = Ts[0]
    for T in Ts[1:]:
        out = out @ T
    return out


def apply(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (…,4,4) transform to (…,N,3) points -> (…,N,3)."""
    R, t = to_rt(T)
    return heinsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


def apply_one(T: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply (…,4,4) transform to (…,3) points (batch dims aligned)."""
    R, t = to_rt(T)
    return heinsum("...ij,...j->...i", R, p) + t


def interp(T: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Geodesic interpolation exp(s * log(T)); s broadcasts over batch dims.

    Used by motion deskew: per-point fractional pose under the
    constant-velocity assumption (SURVEY.md C3).
    """
    xi = log(T)
    return exp(s[..., None] * xi)
