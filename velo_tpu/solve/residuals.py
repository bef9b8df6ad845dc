"""Residual models + hand-derived Jacobians (SURVEY.md C10).

Replaces the reference's Ceres autodiff cost functors with closed-form,
batched residuals.  All functions operate on (K, …) tensors at once and are
NaN-free under masking; Jacobians are verified against ``jax.jacfwd`` in
tests.

Pose perturbation model (left, translation-first): for a point already mapped
into the target frame, ``p' = exp(xi) @ p``, so

    d p' / d xi |_{xi=0} = [ I_3 | -hat(p') ]          (3 x 6)

and every scalar residual Jacobian is ``(dr/dp') @ [I | -hat(p')]``.
"""
from __future__ import annotations

import jax.numpy as jnp

from velo_tpu.geom import se3
from velo_tpu.geom.linalg import sym_eig3x3

_EPS = 1e-9


def point_jacobian(p: jnp.ndarray) -> jnp.ndarray:
    """(…,3) point -> (…,3,6) d(exp(xi) p)/d xi at xi=0."""
    eye = jnp.broadcast_to(jnp.eye(3, dtype=p.dtype), p.shape[:-1] + (3, 3))
    return jnp.concatenate([eye, -se3.hat(p)], axis=-1)


def point_to_line(p: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray,
                  valid: jnp.ndarray):
    """Distance of points p to lines through (a, b); batched.

    Returns (r, dr_dp, ok): residual (K,), gradient wrt p (K,3), and validity
    (degenerate segments or zero distance are masked out).
    """
    u = b - a
    un = jnp.linalg.norm(u, axis=-1)
    ok = valid & (un > 1e-4)
    u_hat = u / jnp.maximum(un, 1e-4)[..., None]
    w = p - a
    # Perpendicular component of w wrt the line.
    v = w - jnp.sum(w * u_hat, axis=-1, keepdims=True) * u_hat
    d = jnp.linalg.norm(v, axis=-1)
    # dr/dp = v / |v| (unit vector from the foot point to p).
    safe_d = jnp.maximum(d, 1e-6)
    dr_dp = v / safe_d[..., None]
    ok = ok & (d > 1e-7)  # zero-distance gradient undefined; drop (r=0 anyway)
    return d, dr_dp, ok


def point_to_plane(p: jnp.ndarray, n: jnp.ndarray, d0: jnp.ndarray,
                   valid: jnp.ndarray):
    """Signed distance of points p to planes (unit n, offset d0): r = n.p + d0."""
    r = jnp.sum(n * p, axis=-1) + d0
    return r, n, valid


def plane_from_3pts(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray,
                    valid: jnp.ndarray, min_area: float = 1e-3):
    """Unit plane (n, d) through point triples; gated on non-collinearity."""
    n = jnp.cross(b - a, c - a)
    nn = jnp.linalg.norm(n, axis=-1)
    ok = valid & (nn > min_area)
    n_hat = n / jnp.maximum(nn, min_area)[..., None]
    d = -jnp.sum(n_hat * a, axis=-1)
    return n_hat, d, ok


def reprojection(p_cam: jnp.ndarray, P: jnp.ndarray, obs_uv: jnp.ndarray,
                 valid: jnp.ndarray):
    """Pinhole reprojection residual + Jacobian wrt the camera-frame point.

    r = project(P, p_cam) - obs  (K, 2);  dr/dp (K, 2, 3) via the standard
    projective chain rule with the 3x4 matrix P = [M | p4]:
      x = M p + p4,  u = x0/x2, v = x1/x2
      du/dp = (M0 - u M2)/x2 ;  dv/dp = (M1 - v M2)/x2.
    """
    ph = jnp.concatenate([p_cam, jnp.ones_like(p_cam[..., :1])], axis=-1)
    x = jnp.einsum("ij,...j->...i", P, ph)
    z = x[..., 2]
    ok = valid & (z > 0.1)
    safe_z = jnp.where(ok, z, 1.0)
    uv = x[..., :2] / safe_z[..., None]
    r = uv - obs_uv
    M = P[:3, :3]
    du_dp = (M[0][None, :] - uv[..., 0:1] * M[2][None, :]) / safe_z[..., None]
    dv_dp = (M[1][None, :] - uv[..., 1:2] * M[2][None, :]) / safe_z[..., None]
    dr_dp = jnp.stack([du_dp, dv_dp], axis=-2)  # (K, 2, 3)
    return r, dr_dp, ok


def epipolar(M: jnp.ndarray, K: jnp.ndarray, uv_prev: jnp.ndarray,
             uv_cur: jnp.ndarray, valid: jnp.ndarray,
             min_baseline: float = 0.05):
    """Depth-unknown reprojection family (SURVEY.md C10 "without fixed
    depth"): point-to-epipolar-line residual for tracks with no LiDAR depth.

    A depth-less track still constrains rotation and the translation
    *direction* through the epipolar identity x2^T [t]x R x1 = 0, where
    ``M = [R|t]`` maps previous-camera coordinates into the current camera.
    The residual is the geometric distance (in pixels, via the focal length)
    of the current observation to the epipolar line of the previous one:

        E = [t]x R,  l = E x1,  r = fx * (x2 . l) / |l_xy|

    Degenerate when the baseline vanishes (pure rotation leaves E ~ 0): such
    frames are masked via ``min_baseline``.

    Returns (r (K,), ok (K,)).  The pose Jacobian is taken with ``jacfwd``
    at the call site — K is the small track capacity, so six forward passes
    of this function cost nothing next to the LiDAR blocks.
    """
    Kinv = jnp.linalg.inv(K)
    ones = jnp.ones_like(uv_prev[..., :1])
    x1 = jnp.einsum("ij,kj->ki", Kinv,
                    jnp.concatenate([uv_prev, ones], axis=-1))
    x2 = jnp.einsum("ij,kj->ki", Kinv,
                    jnp.concatenate([uv_cur, ones], axis=-1))
    R, t = M[:3, :3], M[:3, 3]
    E = se3.hat(t) @ R  # (3,3) essential matrix
    l = jnp.einsum("ij,kj->ki", E, x1)  # epipolar lines in cur norm coords
    ln = jnp.sqrt(l[..., 0] ** 2 + l[..., 1] ** 2)
    ok = valid & (jnp.linalg.norm(t) > min_baseline) & (ln > 1e-8)
    fx = K[0, 0]
    r = fx * jnp.sum(x2 * l, axis=-1) / jnp.maximum(ln, 1e-8)
    return jnp.where(ok, r, 0.0), ok


def huber_weight(r: jnp.ndarray, delta: float) -> jnp.ndarray:
    """IRLS weight of the Huber loss: 1 inside delta, delta/|r| outside."""
    ar = jnp.abs(r)
    return jnp.where(ar <= delta, 1.0, delta / jnp.maximum(ar, _EPS))


def huber_cost(r: jnp.ndarray, delta: float) -> jnp.ndarray:
    ar = jnp.abs(r)
    return jnp.where(ar <= delta, 0.5 * r * r, delta * (ar - 0.5 * delta))


def cauchy_weight(r: jnp.ndarray, scale: float) -> jnp.ndarray:
    """IRLS weight of the Cauchy loss (redescending: outliers -> ~0 weight)."""
    return 1.0 / (1.0 + (r / scale) ** 2)


def cauchy_cost(r: jnp.ndarray, scale: float) -> jnp.ndarray:
    return 0.5 * scale * scale * jnp.log1p((r / scale) ** 2)


def robust_weight(r: jnp.ndarray, delta: float, kind: str) -> jnp.ndarray:
    """Config-selected IRLS weight (C10 "Huber/Cauchy", SURVEY.md §2)."""
    if kind == "huber":
        return huber_weight(r, delta)
    if kind == "cauchy":
        return cauchy_weight(r, delta)
    raise ValueError(f"unknown robust loss {kind!r}")


def robust_cost(r: jnp.ndarray, delta: float, kind: str) -> jnp.ndarray:
    if kind == "huber":
        return huber_cost(r, delta)
    if kind == "cauchy":
        return cauchy_cost(r, delta)
    raise ValueError(f"unknown robust loss {kind!r}")


def fit_line_eig(pts: jnp.ndarray, mask: jnp.ndarray):
    """PCA line fit over (…, k, 3) neighbor sets (LOAM-mapping style).

    Returns (centroid, direction, ok): ok requires the dominant eigenvalue to
    be >= 3x the second (a crisp linear structure).
    """
    w = mask[..., None].astype(pts.dtype)
    cnt = jnp.maximum(jnp.sum(w, axis=-2), 1.0)
    mu = jnp.sum(pts * w, axis=-2, keepdims=True) / cnt[..., None, :]
    d = (pts - mu) * w
    cov = jnp.einsum("...ki,...kj->...ij", d, d) / cnt[..., :, None]
    evals, evecs = sym_eig3x3(cov)  # ascending (closed form, TPU-fast)
    direction = evecs[..., :, 2]
    ok = (evals[..., 2] > 3.0 * evals[..., 1]) & (
        jnp.sum(mask, axis=-1) >= 3
    )
    # Crispness in [0,1]: 1 = perfect line, ~0 at the 3:1 gate boundary.
    quality = jnp.clip(
        1.0 - 3.0 * evals[..., 1] / jnp.maximum(evals[..., 2], _EPS),
        0.0, 1.0,
    )
    return mu[..., 0, :], direction, ok, quality


def fit_plane_eig(pts: jnp.ndarray, mask: jnp.ndarray,
                  max_pt_dist: float = 0.2):
    """PCA plane fit over (…, k, 3) neighbor sets with flatness gates."""
    w = mask[..., None].astype(pts.dtype)
    cnt = jnp.maximum(jnp.sum(w, axis=-2), 1.0)
    mu = jnp.sum(pts * w, axis=-2, keepdims=True) / cnt[..., None, :]
    d = (pts - mu) * w
    cov = jnp.einsum("...ki,...kj->...ij", d, d) / cnt[..., :, None]
    evals, evecs = sym_eig3x3(cov)
    n = evecs[..., :, 0]  # smallest eigenvalue direction = normal
    d0 = -jnp.sum(n * mu[..., 0, :], axis=-1)
    # Flat: smallest eigenvalue much smaller than middle; all pts near plane.
    pt_dist = jnp.abs(jnp.sum(pts * n[..., None, :], axis=-1) + d0[..., None])
    ok = (
        (evals[..., 1] > 3.0 * evals[..., 0])
        & (jnp.sum(mask, axis=-1) >= 3)
        & jnp.all(jnp.where(mask, pt_dist, 0.0) < max_pt_dist, axis=-1)
    )
    # Flatness in [0,1]: 1 = perfect plane, ~0 at the 3:1 gate boundary.
    quality = jnp.clip(
        1.0 - 3.0 * evals[..., 0] / jnp.maximum(evals[..., 1], _EPS),
        0.0, 1.0,
    )
    return n, d0, ok, quality
