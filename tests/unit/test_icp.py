"""Scan-to-scan / scan-to-map ICP: recover a known pose on synthetic geometry."""
import jax.numpy as jnp
import numpy as np

import pytest

from velo_tpu.config import SolverConfig
from velo_tpu.geom import se3
from velo_tpu.solve import icp


def synthetic_scene(rng, n_lines=12, pts_per_line=14, n_planes=10,
                    pts_per_plane=30):
    """Vertical-ish lines (edge features, with ring ids) + random planes."""
    edges, rings = [], []
    for li in range(n_lines):
        base = rng.uniform([-15, -15, -1], [15, 15, 0], 3)
        direction = np.array([0.0, 0.0, 1.0]) + rng.normal(0, 0.05, 3)
        direction /= np.linalg.norm(direction)
        t = np.linspace(0, 4, pts_per_line)
        edges.append(base + t[:, None] * direction)
        rings.append(np.arange(pts_per_line) % 32)
    edge_pts = np.concatenate(edges).astype(np.float32)
    edge_rings = np.concatenate(rings).astype(np.int32)

    planes = []
    for pi in range(n_planes):
        c = rng.uniform([-15, -15, -2], [15, 15, 3], 3)
        n = rng.normal(size=3)
        n /= np.linalg.norm(n)
        u = np.cross(n, [0, 0, 1.0])
        u /= np.linalg.norm(u) + 1e-9
        v = np.cross(n, u)
        ab = rng.uniform(-3, 3, (pts_per_plane, 2))
        planes.append(c + ab[:, :1] * u + ab[:, 1:] * v)
    planar_pts = np.concatenate(planes).astype(np.float32)
    return edge_pts, edge_rings, planar_pts


@pytest.mark.parametrize("engine", ["dense", "hash"])
def test_scan_to_scan_recovers_pose(engine):
    rng = np.random.default_rng(77)  # own rng: scene must not depend on test order
    edge_pts, edge_rings, planar_pts = synthetic_scene(rng)
    xi_true = np.array([0.4, -0.25, 0.1, 0.015, -0.01, 0.04], np.float32)
    T_true = se3.exp(jnp.asarray(xi_true))

    # Current features = target geometry pulled back through T_true.
    cur_edges = se3.apply(se3.inv(T_true)[None], jnp.asarray(edge_pts)[None])[0]
    cur_planars = se3.apply(se3.inv(T_true)[None], jnp.asarray(planar_pts)[None])[0]

    cfg = SolverConfig(nn_engine=engine)
    edge_targets = icp.make_targets(
        jnp.asarray(edge_pts), jnp.ones(len(edge_pts), dtype=bool),
        payload=jnp.asarray(edge_rings)[:, None],
    )
    planar_targets = icp.make_targets(
        jnp.asarray(planar_pts), jnp.ones(len(planar_pts), dtype=bool)
    )

    T_est, diag = icp.solve_scan_to_scan(
        cur_edges, jnp.ones(len(edge_pts), dtype=bool),
        cur_planars, jnp.ones(len(planar_pts), dtype=bool),
        edge_targets, planar_targets, se3.identity(), cfg,
    )
    err = np.linalg.norm(np.asarray(se3.log(se3.inv(T_true) @ T_est)))
    assert err < 1e-2, (err, np.asarray(diag.n_edge), np.asarray(diag.n_planar))
    assert int(diag.n_edge) > 50 and int(diag.n_planar) > 100


@pytest.mark.parametrize("engine", ["dense", "hash"])
def test_scan_to_map_recovers_pose(engine):
    rng = np.random.default_rng(78)
    edge_pts, edge_rings, planar_pts = synthetic_scene(rng)
    xi_true = np.array([0.2, 0.15, -0.1, -0.01, 0.02, 0.02], np.float32)
    T_true = se3.exp(jnp.asarray(xi_true))
    cur_edges = se3.apply(se3.inv(T_true)[None], jnp.asarray(edge_pts)[None])[0]
    cur_planars = se3.apply(se3.inv(T_true)[None], jnp.asarray(planar_pts)[None])[0]

    cfg = SolverConfig(nn_engine=engine)
    edge_targets = icp.make_targets(
        jnp.asarray(edge_pts), jnp.ones(len(edge_pts), dtype=bool)
    )
    planar_targets = icp.make_targets(
        jnp.asarray(planar_pts), jnp.ones(len(planar_pts), dtype=bool)
    )
    T_est, diag = icp.solve_scan_to_map(
        cur_edges, jnp.ones(len(edge_pts), dtype=bool),
        cur_planars, jnp.ones(len(planar_pts), dtype=bool),
        edge_targets, planar_targets, se3.identity(), cfg,
    )
    err = np.linalg.norm(np.asarray(se3.log(se3.inv(T_true) @ T_est)))
    assert err < 1e-2, err


def test_degenerate_frame_keeps_prior():
    rng = np.random.default_rng(79)
    """Too few correspondences => pose must stay at the prior (recoverable)."""
    cfg = SolverConfig()
    pts = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    targets = icp.make_targets(pts, jnp.zeros(8, dtype=bool),
                               payload=jnp.zeros((8, 1), jnp.int32))
    T0 = se3.exp(jnp.asarray([1.0, 0, 0, 0, 0, 0.1], jnp.float32))
    T_est, diag = icp.solve_scan_to_scan(
        pts, jnp.ones(8, dtype=bool), pts, jnp.ones(8, dtype=bool),
        targets, targets, T0, cfg,
    )
    np.testing.assert_allclose(np.asarray(T_est), np.asarray(T0), atol=1e-7)
    assert bool(diag.degenerate)


def test_epipolar_residual_zero_at_truth_and_informative():
    """Depth-unknown family (C10 'without fixed depth'): residual vanishes at
    the true motion, grows under a yaw perturbation, and its jacfwd Jacobian
    matches finite differences."""
    import jax

    from velo_tpu.solve import residuals as res

    rng = np.random.default_rng(3)
    K = jnp.asarray([[200.0, 0, 160.0], [0, 200.0, 96.0], [0, 0, 1.0]],
                    jnp.float32)
    # True motion prev->cur (current camera = prev moved forward + yawed).
    xi_true = jnp.asarray([0.8, 0.05, 0.0, 0.0, 0.02, 0.03], jnp.float32)
    T_true = se3.exp(xi_true)  # maps current -> previous
    M_true = se3.inv(T_true)  # previous point -> current coords

    X_prev = jnp.asarray(
        rng.uniform([-5, -3, 4], [5, 3, 25], (64, 3)), jnp.float32)

    def project(X):
        x = jnp.einsum("ij,kj->ki", K, X)
        return x[:, :2] / x[:, 2:3]

    uv_prev = project(X_prev)
    X_cur = se3.apply(M_true[None], X_prev[None])[0]
    uv_cur = project(X_cur)
    valid = jnp.ones(64, bool)

    r0, ok = res.epipolar(M_true, K, uv_prev, uv_cur, valid)
    assert np.asarray(ok).all()
    assert np.abs(np.asarray(r0)).max() < 1e-2  # ~zero at truth (pixels)

    # Perturbed motion produces pixel-scale residuals.
    M_bad = se3.exp(jnp.asarray([0, 0, 0, 0, 0, 0.02], jnp.float32)) @ M_true
    r1, ok1 = res.epipolar(M_bad, K, uv_prev, uv_cur, valid)
    assert np.median(np.abs(np.asarray(r1)[np.asarray(ok1)])) > 0.5

    # jacfwd vs finite differences through the full pose chain.
    def rfun(xi):
        M = se3.inv(se3.exp(xi) @ T_true)
        return res.epipolar(M, K, uv_prev, uv_cur, valid)[0]

    J = jax.jacfwd(rfun)(jnp.zeros(6, jnp.float32))
    eps = 1e-3
    for j in range(6):
        e = jnp.zeros(6, jnp.float32).at[j].set(eps)
        fd = (rfun(e) - rfun(-e)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(J[:, j]), np.asarray(fd),
                                   atol=2e-2, rtol=5e-2)


def test_ct_solve_recovers_pose_and_sweep_motion():
    """12-DoF continuous-time solve: given a distorted scan, recover BOTH the
    inter-frame pose and the intra-sweep motion (which the 6-DoF path can
    only assume equal to the prediction)."""
    from velo_tpu.config import SolverConfig
    from velo_tpu.lidar import deskew as deskew_mod

    rng = np.random.default_rng(5)
    edge_pts, edge_rings, planar_pts = synthetic_scene(rng)

    xi_true = jnp.asarray([0.7, 0.12, 0.02, 0.01, 0.02, 0.05], jnp.float32)
    T_true = se3.exp(xi_true)  # current -> previous
    # Sweep motion differs from the inter-frame motion (acceleration).
    xi2_true = xi_true + jnp.asarray([0.1, -0.05, 0.0, 0.0, 0.0, 0.03],
                                     jnp.float32)

    ne, npl = edge_pts.shape[0], planar_pts.shape[0]
    e_phase = jnp.asarray(rng.uniform(0, 1, ne).astype(np.float32))
    p_phase = jnp.asarray(rng.uniform(0, 1, npl).astype(np.float32))

    # True sweep-start positions in the current frame:
    e_q = se3.apply(se3.inv(T_true)[None], jnp.asarray(edge_pts)[None])[0]
    p_q = se3.apply(se3.inv(T_true)[None], jnp.asarray(planar_pts)[None])[0]
    # Measured (instantaneous-frame) coords: p_meas = exp(-s xi2) q,
    # then "deskewed" with a wrong prediction xi_ref:
    xi_ref = xi_true  # constant-velocity prediction (misses the accel)
    e_meas = deskew_mod.apply_scaled_exp(e_q, -e_phase, xi2_true)
    p_meas = deskew_mod.apply_scaled_exp(p_q, -p_phase, xi2_true)
    e_base = deskew_mod.apply_scaled_exp(e_meas, e_phase, xi_ref)
    p_base = deskew_mod.apply_scaled_exp(p_meas, p_phase, xi_ref)

    e_mask = jnp.ones(ne, bool)
    p_mask = jnp.ones(npl, bool)
    e_targets = icp.make_targets(jnp.asarray(edge_pts), e_mask,
                                 payload=jnp.asarray(edge_rings)[:, None])
    p_targets = icp.make_targets(jnp.asarray(planar_pts), p_mask)

    # No coupling prior here: the test verifies the split between T and
    # xi2 is genuinely observable from the phase gradient of the residuals.
    cfg = SolverConfig(icp_iters_odom=10, lm_iters=4,
                       prior_weight_trans=0.0, prior_weight_rot=0.0,
                       couple_weight_trans=0.0, couple_weight_rot=0.0)
    T0 = se3.exp(xi_ref)  # start at the prediction
    T_fin, xi2_fin, diag = icp.solve_scan_to_scan_ct(
        e_base, e_phase, e_mask, p_base, p_phase, p_mask,
        e_targets, p_targets, T0, xi_ref, cfg,
    )
    err_T = np.asarray(se3.log(se3.inv(T_true) @ T_fin))
    err_xi2 = np.asarray(xi2_fin - xi2_true)
    assert np.abs(err_T[:3]).max() < 0.01, err_T
    assert np.abs(err_T[3:]).max() < 0.002, err_T
    # Sweep motion recovered to well under the injected acceleration.
    assert np.abs(err_xi2[:3]).max() < 0.02, err_xi2
    assert np.abs(err_xi2[3:]).max() < 0.005, err_xi2


def test_cauchy_icp_loss_recovers_pose_and_rejects_outliers():
    """icp_loss="cauchy" (C10 Huber/Cauchy contract): the redescending loss
    recovers the pose on clean geometry and keeps it in the presence of
    gross outlier correspondences (corrupted current points)."""
    rng = np.random.default_rng(79)
    edge_pts, edge_rings, planar_pts = synthetic_scene(rng)
    xi_true = np.array([0.3, -0.2, 0.05, 0.01, -0.02, 0.03], np.float32)
    T_true = se3.exp(jnp.asarray(xi_true))
    cur_edges = se3.apply(se3.inv(T_true)[None], jnp.asarray(edge_pts)[None])[0]
    cur_planars = se3.apply(se3.inv(T_true)[None],
                            jnp.asarray(planar_pts)[None])[0]
    # Corrupt 10% of the planar points with ~0.5 m offsets: within the
    # correspondence gate (so they DO enter the cost) but grossly wrong.
    n_bad = len(planar_pts) // 10
    bad = rng.choice(len(planar_pts), n_bad, replace=False)
    cur_planars = np.array(cur_planars)
    cur_planars[bad] += rng.normal(0, 0.3, (n_bad, 3)).astype(np.float32)
    cur_planars = jnp.asarray(cur_planars)

    edge_targets = icp.make_targets(
        jnp.asarray(edge_pts), jnp.ones(len(edge_pts), dtype=bool),
        payload=jnp.asarray(edge_rings)[:, None],
    )
    planar_targets = icp.make_targets(
        jnp.asarray(planar_pts), jnp.ones(len(planar_pts), dtype=bool)
    )
    errs = {}
    for loss in ("huber", "cauchy"):
        cfg = SolverConfig(icp_loss=loss)
        T_est, _ = icp.solve_scan_to_scan(
            cur_edges, jnp.ones(len(edge_pts), dtype=bool),
            cur_planars, jnp.ones(len(planar_pts), dtype=bool),
            edge_targets, planar_targets, se3.identity(), cfg,
        )
        errs[loss] = np.linalg.norm(
            np.asarray(se3.log(se3.inv(T_true) @ T_est)))
    assert errs["cauchy"] < 2e-2, errs
    # Redescending loss should do at least as well as Huber under gross
    # outliers (generous factor: both are already small).
    assert errs["cauchy"] < errs["huber"] * 1.5, errs


def test_robust_loss_dispatch_rejects_unknown():
    from velo_tpu.solve import residuals as res

    with pytest.raises(ValueError):
        res.robust_weight(jnp.ones(3), 0.1, "tukey")


def test_obs_scaled_prior_pins_weak_direction_only():
    """Per-DoF observability-scaled prior (prior_obs_gain > 0).

    Corridor-like geometry: hundreds of planes whose normals span only
    y/z, plus a handful of x-normal planes whose offsets are biased +0.5 m
    (the open-stretch 'wrong constraint directionality' episode in
    miniature).  The isotropic dead-zone prior lets the solve ride to its
    dead-zone edge along x; the eigen-scaled prior detects x as weak
    (lam_x ~ 1% of lam_max), boosts the prior weight and shrinks the dead
    zone there, and pins x near the constant-velocity prediction — while
    the well-observed y/z/rot estimates stay unchanged.
    """
    import dataclasses

    from velo_tpu.solve.lm import lm_solve

    rng = np.random.default_rng(123)
    n_main, n_bias = 300, 8
    pts_main = rng.uniform(-10, 10, (n_main, 3)).astype(np.float32)
    # Normals restricted to the y/z plane: x translation unobserved by them.
    ang = rng.uniform(0, 2 * np.pi, n_main)
    n_main_vec = np.stack(
        [np.zeros(n_main), np.cos(ang), np.sin(ang)], axis=1
    ).astype(np.float32)
    d_main = -(n_main_vec * pts_main).sum(1)  # zero residual at identity

    pts_bias = rng.uniform(-10, 10, (n_bias, 3)).astype(np.float32)
    n_bias_vec = np.tile(np.array([[1.0, 0, 0]], np.float32), (n_bias, 1))
    d_bias = -(pts_bias[:, 0] + 0.5)  # consistent +0.5 m pull along x

    planars = jnp.asarray(np.concatenate([pts_main, pts_bias]))
    pl_n = jnp.asarray(np.concatenate([n_main_vec, n_bias_vec]))
    pl_d = jnp.asarray(np.concatenate([d_main, d_bias]).astype(np.float32))
    ok = jnp.ones(n_main + n_bias, bool)
    # No edge features in this scene.
    edges = jnp.zeros((4, 3), jnp.float32)
    e_ok = jnp.zeros(4, bool)

    def solve(cfg):
        build = icp.make_lidar_system(
            edges, e_ok, edges, edges + 1.0, e_ok,
            planars, ok, pl_n, pl_d, ok, cfg,
            prior_T=se3.identity(), prior_scale=jnp.float32(1.0),
        )
        T, _ = lm_solve(build, se3.identity(), cfg, iters=12)
        return np.asarray(se3.log(T))

    # The shipped default is prior_obs_gain=4.0 (round-4 flip); this test
    # contrasts the isotropic prior against the scaled one, so pin the
    # isotropic arm explicitly.
    base = SolverConfig(prior_obs_gain=0.0)
    xi_iso = solve(base)
    xi_obs = solve(dataclasses.replace(base, prior_obs_gain=4.0))

    # Isotropic: x rides out to (at least) the dead-zone edge.
    assert xi_iso[0] > 0.15, xi_iso
    # Scaled: x pinned near the prediction (well inside the base dead zone).
    assert xi_obs[0] < 0.5 * xi_iso[0], (xi_iso, xi_obs)
    # Well-observed directions unaffected (both solves keep them ~0).
    np.testing.assert_allclose(xi_obs[1:], xi_iso[1:], atol=5e-3)


def test_obs_scaled_prior_keeps_observed_directions_free():
    """A fully-observed deviation inside the dead zone stays cost-free under
    the eigen-scaled prior: strong isotropic geometry => obs=1 in every
    direction => base weight and dead zone everywhere."""
    cfg = SolverConfig(prior_obs_gain=4.0)
    w_prior = jnp.asarray([cfg.prior_weight_trans] * 3
                          + [cfg.prior_weight_rot] * 3, jnp.float32)
    H_obs = jnp.eye(6, dtype=jnp.float32) * 1e4
    r_pr = jnp.asarray([0.1, -0.1, 0.05, 0.005, -0.005, 0.008], jnp.float32)
    H, g, c = icp._obs_scaled_prior(cfg, w_prior, r_pr, H_obs)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(H), 0.0, atol=1e-9)
    assert float(c) == 0.0


def test_obs_prior_staged_basis_matches_dynamic_at_linearization():
    """The production solvers route the obs prior through _make_stage: each
    LM iteration re-derives the basis at its own linearization point and
    freezes it for trial costs (so cost probes carry no Hessian dependence
    — the round-4 in-loop formulation cost 31-38 % throughput).  At the
    linearization point itself stage() must equal the dynamic-basis builder
    bit-for-bit: same H, g, cost; and its trial_cost at the same point must
    equal that cost.  Uses anisotropic geometry so the eigenbasis is
    nontrivial, plus a prior deviation large enough to clear the dead zone.
    """
    rng = np.random.default_rng(7)
    n = 200
    pts = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    # Anisotropic normals: strong y, weak x, medium z.
    raw = rng.normal(0, 1, (n, 3)).astype(np.float32)
    raw[:, 0] *= 0.05
    raw[:, 2] *= 0.4
    nrm = raw / np.linalg.norm(raw, axis=1, keepdims=True)
    d = -(nrm * pts).sum(1)
    planars = jnp.asarray(pts)
    pl_n = jnp.asarray(nrm)
    pl_d = jnp.asarray(d.astype(np.float32))
    ok = jnp.ones(n, bool)
    edges = jnp.zeros((4, 3), jnp.float32)
    e_ok = jnp.zeros(4, bool)

    cfg = SolverConfig(prior_obs_gain=4.0)
    prior_T = se3.identity()
    # Linearization point well away from the prior => dead zone cleared.
    T_lin = se3.exp(jnp.asarray([0.4, -0.3, 0.2, 0.03, -0.02, 0.04],
                                jnp.float32))

    args = (edges, e_ok, edges, edges + 1.0, e_ok,
            planars, ok, pl_n, pl_d, ok, cfg)
    build_dyn = icp.make_lidar_system(*args, prior_T=prior_T)
    build_nop = icp.make_lidar_system(*args)
    stage = icp._make_stage(cfg, prior_T, None, build_nop)

    Hd, gd, cd = build_dyn(T_lin)
    Hf, gf, cf, trial_cost, basis = stage(T_lin)
    np.testing.assert_allclose(np.asarray(Hf), np.asarray(Hd), rtol=1e-6,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gd), rtol=1e-6,
                               atol=1e-4)
    np.testing.assert_allclose(float(cf), float(cd), rtol=1e-6)
    np.testing.assert_allclose(float(trial_cost(T_lin)), float(cf),
                               rtol=1e-6)
    # And the prior is genuinely active at this point (non-trivial terms).
    Hn, gn, cn = build_nop(T_lin)
    assert float(cd) > float(cn)

    # The staged LM solve pins the same weak-direction behavior as the
    # dynamic builder (both re-derive the basis at each linearization).
    from velo_tpu.solve.lm import lm_solve

    T_a, st_a = lm_solve(build_dyn, T_lin, cfg)
    T_b, st_b = lm_solve(None, T_lin, cfg, stage=stage)
    np.testing.assert_allclose(np.asarray(T_a), np.asarray(T_b), atol=5e-3)


def test_deferred_lm_matches_classic_dynamic():
    """prior_obs_impl="deferred" identity: the deferred-reject loop on the
    full dynamic system must reproduce the classic loop's solution on the
    SAME build — same linearization points, same costs, same accept
    sequence — it only reorders when each linearization happens (and pays
    lm_iters+1 builds instead of 2*lm_iters+1).  Uses the anisotropic-plane
    setup above so the obs prior is active and nontrivial."""
    rng = np.random.default_rng(11)
    n = 200
    pts = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    raw = rng.normal(0, 1, (n, 3)).astype(np.float32)
    raw[:, 0] *= 0.05
    raw[:, 2] *= 0.4
    nrm = raw / np.linalg.norm(raw, axis=1, keepdims=True)
    d = -(nrm * pts).sum(1)
    planars = jnp.asarray(pts)
    ok = jnp.ones(n, bool)
    edges = jnp.zeros((4, 3), jnp.float32)
    e_ok = jnp.zeros(4, bool)

    cfg = SolverConfig(prior_obs_gain=4.0)
    prior_T = se3.identity()
    T0 = se3.exp(jnp.asarray([0.4, -0.3, 0.2, 0.03, -0.02, 0.04],
                             jnp.float32))
    build_dyn = icp.make_lidar_system(
        edges, e_ok, edges, edges + 1.0, e_ok,
        planars, ok, jnp.asarray(nrm), jnp.asarray(d.astype(np.float32)),
        ok, cfg, prior_T=prior_T)

    from velo_tpu.solve.lm import lm_solve

    T_c, st_c = lm_solve(build_dyn, T0, cfg)
    T_d, st_d = lm_solve(build_dyn, T0, cfg, deferred=True)
    np.testing.assert_allclose(np.asarray(T_d), np.asarray(T_c), atol=1e-5)
    assert int(st_d.n_accept) == int(st_c.n_accept)
    np.testing.assert_allclose(float(st_d.cost), float(st_c.cost),
                               rtol=1e-5)
    # And the solve genuinely moved (the identity wasn't vacuous).
    assert float(jnp.linalg.norm(se3.log(T_c @ se3.inv(T0)))) > 1e-3


def test_deferred_routing_end_to_end():
    """solve_scan_to_scan with prior_obs_impl="deferred" routes through the
    deferred loop and lands close to the staged solve (both are dynamic on
    the build side; they differ only in trial-cost basis freshness)."""
    rng = np.random.default_rng(3)
    n = 256
    pts = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-1, 1, n).astype(np.float32)
    T_true = se3.exp(jnp.asarray([0.3, 0.1, 0.02, 0.01, -0.01, 0.03],
                                 jnp.float32))
    cur = se3.apply(se3.inv(T_true)[None], jnp.asarray(pts)[None])[0]
    targets = icp.TargetSet(
        pts=jnp.asarray(pts),
        mask=jnp.ones(n, bool),
        payload=jnp.zeros((n, 1), jnp.float32),
    )
    e_n = 8
    e_targets = icp.TargetSet(
        pts=jnp.asarray(pts[:e_n]), mask=jnp.zeros(e_n, bool),
        payload=jnp.zeros((e_n, 1), jnp.float32))
    mask = jnp.ones(n, bool)
    e_mask = jnp.zeros(e_n, bool)
    poses = {}
    for impl in ("staged", "deferred", "deferred_tail"):
        cfg = SolverConfig(prior_obs_gain=4.0, prior_obs_impl=impl)
        T, diag = icp.solve_scan_to_scan(
            cur[:e_n], e_mask, cur, mask, e_targets, targets,
            se3.identity(), cfg, prior_T=se3.identity())
        poses[impl] = np.asarray(T)
    np.testing.assert_allclose(poses["deferred"][:3, 3],
                               np.asarray(T_true)[:3, 3], atol=0.05)
    np.testing.assert_allclose(poses["deferred"], poses["staged"],
                               atol=0.05)
    np.testing.assert_allclose(poses["deferred_tail"], poses["deferred"],
                               atol=0.05)


def test_deferred_tail_matches_deferred_when_all_accepted():
    """deferred_tail differs from pure deferred only in the final accept's
    basis; when every step accepts with clear margins the two must land on
    the same pose (the frozen-basis cost at the carried linearization point
    coincides with the dynamic cost there)."""
    rng = np.random.default_rng(11)
    n = 200
    pts = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    raw = rng.normal(0, 1, (n, 3)).astype(np.float32)
    raw[:, 0] *= 0.05
    raw[:, 2] *= 0.4
    nrm = raw / np.linalg.norm(raw, axis=1, keepdims=True)
    d = -(nrm * pts).sum(1)
    planars = jnp.asarray(pts)
    ok = jnp.ones(n, bool)
    edges = jnp.zeros((4, 3), jnp.float32)
    e_ok = jnp.zeros(4, bool)
    prior_T = se3.identity()
    T0 = se3.exp(jnp.asarray([0.4, -0.3, 0.2, 0.03, -0.02, 0.04],
                             jnp.float32))
    from velo_tpu.solve.lm import lm_solve

    cfg = SolverConfig(prior_obs_gain=4.0)
    args = (edges, e_ok, edges, edges + 1.0, e_ok,
            planars, ok, jnp.asarray(nrm),
            jnp.asarray(d.astype(np.float32)), ok, cfg)
    build_dyn = icp.make_lidar_system(*args, prior_T=prior_T)
    build_nop = icp.make_lidar_system(*args)
    stage = icp._make_stage(cfg, prior_T, None, build_nop)

    T_d, st_d = lm_solve(build_dyn, T0, cfg, deferred=True)
    T_t, st_t = lm_solve(None, T0, cfg, stage=stage, deferred=True)
    np.testing.assert_allclose(np.asarray(T_t), np.asarray(T_d), atol=1e-4)
    assert int(st_t.n_accept) == int(st_d.n_accept)
