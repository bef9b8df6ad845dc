"""Residual Jacobians vs jacfwd; LM recovers known SE(3) perturbations."""
import jax
import jax.numpy as jnp
import numpy as np

from velo_tpu.config import SolverConfig
from velo_tpu.geom import se3
from velo_tpu.solve import residuals as res
from velo_tpu.solve.lm import lm_solve


def test_point_to_line_jacobian(rng):
    p = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32)) * 3
    a = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32)) * 3
    b = a + jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
    valid = jnp.ones(32, bool)

    r, dr_dp, ok = res.point_to_line(p, a, b, valid)

    def f(pi, ai, bi):
        return res.point_to_line(pi[None], ai[None], bi[None],
                                 jnp.ones(1, bool))[0][0]

    for i in range(8):
        J = jax.jacfwd(f)(p[i], a[i], b[i])
        np.testing.assert_allclose(np.asarray(dr_dp[i]), np.asarray(J),
                                   atol=1e-4)


def test_reprojection_jacobian(rng):
    P = jnp.asarray([[240.0, 0, 320, 10.0], [0, 240, 96, 0.0], [0, 0, 1, 0]])
    p = jnp.asarray(rng.uniform([-3, -2, 4], [3, 2, 30], (16, 3)).astype(np.float32))
    obs = jnp.asarray(rng.normal(size=(16, 2)).astype(np.float32)) * 50 + 200
    r, dr_dp, ok = res.reprojection(p, P, obs, jnp.ones(16, bool))

    def f(pi):
        return res.reprojection(pi[None], P, obs[:1], jnp.ones(1, bool))[0][0]

    J = jax.jacfwd(f)(p[0])
    np.testing.assert_allclose(np.asarray(dr_dp[0]), np.asarray(J), atol=1e-3)


def test_fit_plane_eig(rng):
    # Points on plane z = 2x - y + 3 with 2 outlier-free neighbors sets.
    xy = rng.normal(size=(8, 5, 2)).astype(np.float32)
    z = 2 * xy[..., 0] - xy[..., 1] + 3
    pts = jnp.asarray(np.concatenate([xy, z[..., None]], axis=-1))
    n, d, ok, q = res.fit_plane_eig(pts, jnp.ones((8, 5), bool))
    assert np.asarray(ok).all()
    assert np.asarray(q).min() > 0.9  # exact planes -> quality ~ 1
    n_ref = np.array([2.0, -1.0, -1.0]) / np.sqrt(6)
    for i in range(8):
        ni = np.asarray(n[i])
        ni = ni * np.sign(ni @ n_ref)
        np.testing.assert_allclose(ni, n_ref, atol=1e-3)
        # plane passes through the points
        err = np.abs(np.asarray(pts[i]) @ ni + np.sign(np.asarray(n[i]) @ n_ref) * np.asarray(d[i]))
        assert err.max() < 1e-2


def test_fit_line_eig(rng):
    t = rng.normal(size=(6, 5, 1)).astype(np.float32) * 3
    d0 = np.array([1.0, 2.0, -1.0]) / np.sqrt(6)
    pts = jnp.asarray(t * d0 + np.array([5.0, 0.0, 1.0]))
    mu, direction, ok, q = res.fit_line_eig(pts, jnp.ones((6, 5), bool))
    assert np.asarray(ok).all()
    assert np.asarray(q).min() > 0.9  # exact lines -> quality ~ 1
    for i in range(6):
        di = np.asarray(direction[i])
        assert abs(abs(di @ d0) - 1.0) < 1e-3


def _make_plane_problem(rng, n_planes=80, noise=0.0):
    """Synthetic point-to-plane alignment with known ground truth."""
    # Random well-spread plane normals and points.
    normals = rng.normal(size=(n_planes, 3))
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    pts_target = rng.normal(size=(n_planes, 3)).astype(np.float32) * 8
    d = -(normals * pts_target).sum(1)

    xi_true = np.array([0.3, -0.2, 0.4, 0.04, -0.03, 0.05], np.float32)
    T_true = se3.exp(jnp.asarray(xi_true))
    # Source points: T_true @ src lies on the planes => src = T_true^-1 @ pts
    src = se3.apply(se3.inv(T_true)[None], jnp.asarray(pts_target)[None])[0]
    if noise:
        src = src + rng.normal(size=src.shape).astype(np.float32) * noise
    return (jnp.asarray(src), jnp.asarray(normals.astype(np.float32)),
            jnp.asarray(d.astype(np.float32)), T_true, xi_true)


def test_lm_recovers_known_pose(rng):
    src, n, d, T_true, xi_true = _make_plane_problem(rng)
    cfg = SolverConfig(lm_iters=12)
    mask = jnp.ones(src.shape[0], bool)

    def build(T):
        p = se3.apply(T[None], src[None])[0]
        r, dr, ok = res.point_to_plane(p, n, d, mask)
        w = res.huber_weight(r, cfg.huber_delta_icp) * ok
        J = jnp.einsum("ki,kij->kj", dr, res.point_jacobian(p))
        H = jnp.einsum("ki,kj->ij", J * w[:, None], J)
        g = J.T @ (w * r)
        cost = jnp.sum(res.huber_cost(r, cfg.huber_delta_icp) * ok)
        return H, g, cost

    T_est, st = lm_solve(build, se3.identity(), cfg)
    err = se3.log(se3.inv(T_true) @ T_est)
    assert np.linalg.norm(np.asarray(err)) < 1e-4, np.asarray(err)


def test_lm_vs_scipy_oracle(rng):
    """Same problem solved by scipy.optimize.least_squares must agree."""
    from scipy.optimize import least_squares
    from scipy.spatial.transform import Rotation

    src, n, d, T_true, xi_true = _make_plane_problem(rng, noise=0.02)
    src_np, n_np, d_np = map(np.asarray, (src, n, d))

    def residual_np(x):
        R = Rotation.from_rotvec(x[3:]).as_matrix()
        p = src_np @ R.T + x[:3]
        return (n_np * p).sum(1) + d_np

    sol = least_squares(residual_np, np.zeros(6), method="lm")
    R_ref = Rotation.from_rotvec(sol.x[3:]).as_matrix()

    cfg = SolverConfig(lm_iters=15, huber_delta_icp=10.0)  # pure L2 regime
    mask = jnp.ones(src.shape[0], bool)

    def build(T):
        p = se3.apply(T[None], src[None])[0]
        r, dr, ok = res.point_to_plane(p, n, d, mask)
        w = ok.astype(jnp.float32)
        J = jnp.einsum("ki,kij->kj", dr, res.point_jacobian(p))
        H = jnp.einsum("ki,kj->ij", J * w[:, None], J)
        g = J.T @ (w * r)
        return H, g, jnp.sum(0.5 * r * r * w)

    T_est, _ = lm_solve(build, se3.identity(), cfg)
    R_est, t_est = np.asarray(T_est[:3, :3]), np.asarray(T_est[:3, 3])
    np.testing.assert_allclose(R_est, R_ref, atol=5e-4)
    np.testing.assert_allclose(t_est, sol.x[:3], atol=5e-3)


def test_lm_huber_rejects_outliers(rng):
    src, n, d, T_true, _ = _make_plane_problem(rng, n_planes=120)
    # Corrupt 20% of the planes with garbage offsets.
    d_np = np.asarray(d).copy()
    bad = rng.random(120) < 0.2
    d_np[bad] += rng.normal(size=bad.sum()) * 5.0
    d_cor = jnp.asarray(d_np)
    cfg = SolverConfig(lm_iters=15, huber_delta_icp=0.1)
    mask = jnp.ones(src.shape[0], bool)

    def build(T):
        p = se3.apply(T[None], src[None])[0]
        r, dr, ok = res.point_to_plane(p, n, d_cor, mask)
        w = res.huber_weight(r, cfg.huber_delta_icp) * ok
        J = jnp.einsum("ki,kij->kj", dr, res.point_jacobian(p))
        H = jnp.einsum("ki,kj->ij", J * w[:, None], J)
        g = J.T @ (w * r)
        return H, g, jnp.sum(res.huber_cost(r, cfg.huber_delta_icp) * ok)

    T_est, _ = lm_solve(build, se3.identity(), cfg)
    err = np.linalg.norm(np.asarray(se3.log(se3.inv(T_true) @ T_est)))
    assert err < 0.05, err  # outliers must not drag the solution far

    # Non-robust (pure L2) solve on the same data must be much worse.
    def build_l2(T):
        p = se3.apply(T[None], src[None])[0]
        r, dr, ok = res.point_to_plane(p, n, d_cor, mask)
        w = ok.astype(jnp.float32)
        J = jnp.einsum("ki,kij->kj", dr, res.point_jacobian(p))
        H = jnp.einsum("ki,kj->ij", J * w[:, None], J)
        g = J.T @ (w * r)
        return H, g, jnp.sum(0.5 * r * r * w)

    T_l2, _ = lm_solve(build_l2, se3.identity(), cfg)
    err_l2 = np.linalg.norm(np.asarray(se3.log(se3.inv(T_true) @ T_l2)))
    assert err < 0.3 * err_l2, (err, err_l2)

    # Redescending Cauchy should do at least as well as Huber here.
    def build_cauchy(T):
        p = se3.apply(T[None], src[None])[0]
        r, dr, ok = res.point_to_plane(p, n, d_cor, mask)
        w = res.cauchy_weight(r, 0.1) * ok
        J = jnp.einsum("ki,kij->kj", dr, res.point_jacobian(p))
        H = jnp.einsum("ki,kj->ij", J * w[:, None], J)
        g = J.T @ (w * r)
        return H, g, jnp.sum(res.cauchy_cost(r, 0.1) * ok)

    T_c, _ = lm_solve(build_cauchy, se3.identity(), cfg)
    err_c = np.linalg.norm(np.asarray(se3.log(se3.inv(T_true) @ T_c)))
    assert err_c < 0.05, err_c


def test_sym_eig3x3_vs_numpy(rng):
    from velo_tpu.geom.linalg import sym_eig3x3

    M = rng.normal(size=(200, 3, 3)).astype(np.float32)
    A = M @ np.transpose(M, (0, 2, 1))  # SPD + some near-degenerate
    # Squash symmetrically (D A D) so some covariances are near-planar.
    D = np.diag([1e-2, 1.0, 1.0]).astype(np.float32)
    A[:20] = D @ A[:20] @ D
    evals, evecs = sym_eig3x3(jnp.asarray(A))
    ref_w, ref_v = np.linalg.eigh(A.astype(np.float64))
    np.testing.assert_allclose(
        np.asarray(evals), ref_w, rtol=2e-3, atol=2e-3
    )
    # Eigenvector property: A v = lambda v (up to float32 tolerance).
    for i in range(3):
        av = np.einsum("kij,kj->ki", A, np.asarray(evecs)[..., i])
        lv = np.asarray(evals)[:, i: i + 1] * np.asarray(evecs)[..., i]
        scale = np.abs(np.asarray(evals)[:, i: i + 1]) + 1.0
        np.testing.assert_allclose(av / scale, lv / scale, atol=5e-3)
    # Orthonormal.
    VtV = np.einsum("kij,kil->kjl", np.asarray(evecs), np.asarray(evecs))
    np.testing.assert_allclose(VtV, np.broadcast_to(np.eye(3), VtV.shape),
                               atol=2e-3)
