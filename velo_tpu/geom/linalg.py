"""Closed-form batched 3x3 symmetric eigendecomposition.

``jnp.linalg.eigh`` lowers to an iterative QR/Jacobi routine that is slow and
serial on TPU; the PCA line/plane fits (SURVEY.md C9/C11 scan-to-map path)
need eigenpairs of tens of thousands of tiny 3x3 covariances per frame.  This
module computes them analytically (trigonometric eigenvalue formula + cross-
product eigenvectors), which is pure VPU element-wise work and vectorizes
perfectly.  Verified against numpy.linalg.eigh in tests.
"""
from __future__ import annotations

import jax.numpy as jnp


def sym_eig3x3(A: jnp.ndarray):
    """Eigen-decomposition of symmetric (…, 3, 3) matrices.

    Returns (evals, evecs) with eigenvalues ascending and ``evecs[..., :, i]``
    the unit eigenvector of ``evals[..., i]`` — the same convention as
    ``jnp.linalg.eigh``.  Degenerate (repeated-eigenvalue) inputs return
    finite orthonormal vectors though individual directions are arbitrary
    within the eigenspace, matching what the downstream eigenvalue-ratio
    gates assume.
    """
    a00 = A[..., 0, 0]
    a11 = A[..., 1, 1]
    a22 = A[..., 2, 2]
    a01 = A[..., 0, 1]
    a02 = A[..., 0, 2]
    a12 = A[..., 1, 2]

    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))

    b00 = (a00 - q) / p
    b11 = (a11 - q) / p
    b22 = (a22 - q) / p
    b01 = a01 / p
    b02 = a02 / p
    b12 = a12 / p
    detB = (
        b00 * (b11 * b22 - b12 * b12)
        - b01 * (b01 * b22 - b12 * b02)
        + b02 * (b01 * b12 - b11 * b02)
    )
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    e_hi = q + 2.0 * p * jnp.cos(phi)
    e_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_hi - e_lo
    # Near-isotropic matrices: p2 ~ 0 -> all eigenvalues ~ q.
    iso = p2 < 1e-20
    e_hi = jnp.where(iso, q, e_hi)
    e_mid = jnp.where(iso, q, e_mid)
    e_lo = jnp.where(iso, q, e_lo)
    evals = jnp.stack([e_lo, e_mid, e_hi], axis=-1)

    def eigvec(lam):
        # Rows of (A - lam I); the eigenvector is orthogonal to every row, so
        # take the largest cross product of two rows for numerical robustness.
        r0 = jnp.stack([a00 - lam, a01, a02], axis=-1)
        r1 = jnp.stack([a01, a11 - lam, a12], axis=-1)
        r2 = jnp.stack([a02, a12, a22 - lam], axis=-1)
        c01 = jnp.cross(r0, r1)
        c02 = jnp.cross(r0, r2)
        c12 = jnp.cross(r1, r2)
        n01 = jnp.sum(c01 * c01, axis=-1)
        n02 = jnp.sum(c02 * c02, axis=-1)
        n12 = jnp.sum(c12 * c12, axis=-1)
        best = jnp.where(
            (n01 >= n02)[..., None] & (n01 >= n12)[..., None],
            c01,
            jnp.where((n02 >= n12)[..., None], c02, c12),
        )
        nrm = jnp.linalg.norm(best, axis=-1, keepdims=True)
        fallback = jnp.broadcast_to(
            jnp.asarray([1.0, 0.0, 0.0], A.dtype), best.shape
        )
        return jnp.where(nrm > 1e-12, best / jnp.maximum(nrm, 1e-12),
                         fallback)

    v_lo = eigvec(e_lo)
    v_hi = eigvec(e_hi)
    # Middle vector: orthogonal completion (exact and always well defined).
    v_mid = jnp.cross(v_hi, v_lo)
    v_mid = v_mid / jnp.maximum(
        jnp.linalg.norm(v_mid, axis=-1, keepdims=True), 1e-12
    )
    evecs = jnp.stack([v_lo, v_mid, v_hi], axis=-1)
    return evals, evecs
