"""SE(3) library vs scipy.spatial.transform oracle + float64 roundtrips."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from velo_tpu.geom import se3

jax.config.update("jax_enable_x64", False)


def random_xi(rng, n=64, max_angle=3.0):
    phi = rng.normal(size=(n, 3))
    phi = phi / np.linalg.norm(phi, axis=1, keepdims=True)
    phi *= rng.uniform(0, max_angle, (n, 1))
    rho = rng.normal(size=(n, 3)) * 2.0
    return np.concatenate([rho, phi], axis=1).astype(np.float32)


def test_exp_so3_matches_scipy(rng):
    phi = random_xi(rng)[:, 3:]
    R = np.asarray(se3.exp_so3(jnp.asarray(phi)))
    R_ref = Rotation.from_rotvec(phi).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=2e-6)


def test_log_so3_matches_scipy(rng):
    phi = random_xi(rng, max_angle=3.1)[:, 3:]
    R = Rotation.from_rotvec(phi).as_matrix().astype(np.float32)
    out = np.asarray(se3.log_so3(jnp.asarray(R)))
    np.testing.assert_allclose(out, phi, atol=1e-4)


def test_exp_log_roundtrip(rng):
    xi = random_xi(rng, max_angle=3.0)
    T = se3.exp(jnp.asarray(xi))
    xi_back = np.asarray(se3.log(T))
    np.testing.assert_allclose(xi_back, xi, atol=3e-4)


def test_small_angle_stability():
    for scale in [0.0, 1e-10, 1e-6, 1e-3]:
        xi = jnp.asarray([0.1, -0.2, 0.3, scale, -scale, scale * 0.5], jnp.float32)
        T = se3.exp(xi)
        assert np.all(np.isfinite(np.asarray(T)))
        xi_back = se3.log(T)
        np.testing.assert_allclose(np.asarray(xi_back), np.asarray(xi), atol=1e-5)


def test_inv_compose(rng):
    xi = random_xi(rng, n=8)
    T = se3.exp(jnp.asarray(xi))
    eye = np.asarray(T @ se3.inv(T))
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(4), eye.shape), atol=1e-5)


def test_apply_matches_matmul(rng):
    xi = random_xi(rng, n=4)
    T = se3.exp(jnp.asarray(xi))
    pts = jnp.asarray(rng.normal(size=(4, 100, 3)).astype(np.float32))
    out = se3.apply(T, pts)
    ref = np.einsum("bij,bnj->bni", np.asarray(T)[:, :3, :3], np.asarray(pts)) + \
        np.asarray(T)[:, None, :3, 3]
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_interp_endpoints_and_midpoint(rng):
    xi = random_xi(rng, n=1)[0]
    T = se3.exp(jnp.asarray(xi))
    np.testing.assert_allclose(
        np.asarray(se3.interp(T, jnp.asarray(1.0))), np.asarray(T), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(se3.interp(T, jnp.asarray(0.0))), np.eye(4), atol=1e-6
    )
    # interp(T, 0.5) composed with itself = T (geodesic property)
    H = se3.interp(T, jnp.asarray(0.5))
    np.testing.assert_allclose(np.asarray(H @ H), np.asarray(T), atol=1e-4)


def test_batched_interp_per_point(rng):
    """Per-point fractional pose (deskew workload): (N,) fractions -> (N,4,4)."""
    xi = random_xi(rng, n=1, max_angle=0.2)[0]
    T = se3.exp(jnp.asarray(xi))
    s = jnp.linspace(0.0, 1.0, 50)
    Ts = se3.interp(T, s)
    assert Ts.shape == (50, 4, 4)
    np.testing.assert_allclose(np.asarray(Ts[-1]), np.asarray(T), atol=1e-5)


def test_jit_and_grad():
    xi = jnp.asarray([0.1, 0.2, -0.3, 0.05, -0.02, 0.08], jnp.float32)

    @jax.jit
    def loss(xi):
        T = se3.exp(xi)
        p = se3.apply_one(T, jnp.asarray([1.0, 2.0, 3.0]))
        return jnp.sum(p**2)

    g = jax.grad(loss)(xi)
    assert np.all(np.isfinite(np.asarray(g)))
    # Finite-difference check
    eps = 1e-3
    for i in range(6):
        d = np.zeros(6, np.float32)
        d[i] = eps
        fd = (loss(xi + d) - loss(xi - d)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g)[i], np.asarray(fd), rtol=2e-2, atol=2e-2)
