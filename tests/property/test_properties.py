"""Property tests (SURVEY.md §4.2): equivariance, mask-invariance, determinism."""
import jax.numpy as jnp
import numpy as np
import pytest

from velo_tpu.config import SolverConfig
from velo_tpu.geom import se3
from velo_tpu.solve import icp

import sys, os  # noqa: E401

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "unit"))
from test_icp import synthetic_scene  # noqa: E402


def _solve(edge_pts, edge_rings, planar_pts, T_init, cfg):
    edge_targets = icp.make_targets(
        jnp.asarray(edge_pts), jnp.ones(len(edge_pts), dtype=bool),
        payload=jnp.asarray(edge_rings)[:, None],
    )
    planar_targets = icp.make_targets(
        jnp.asarray(planar_pts), jnp.ones(len(planar_pts), dtype=bool)
    )
    cur_e = se3.apply(se3.inv(T_init)[None], jnp.asarray(edge_pts)[None])[0]
    cur_p = se3.apply(se3.inv(T_init)[None], jnp.asarray(planar_pts)[None])[0]
    T_est, diag = icp.solve_scan_to_scan(
        cur_e, jnp.ones(len(edge_pts), dtype=bool),
        cur_p, jnp.ones(len(planar_pts), dtype=bool),
        edge_targets, planar_targets, se3.identity(), cfg,
    )
    return T_est


def test_pose_equivariance():
    """Rigidly moving the target frame by G must move the solution by G."""
    rng = np.random.default_rng(21)
    edge_pts, edge_rings, planar_pts = synthetic_scene(rng)
    T_true = se3.exp(jnp.asarray([0.3, -0.1, 0.05, 0.01, 0.02, -0.03],
                                 jnp.float32))
    cfg = SolverConfig()

    T_est = _solve(edge_pts, edge_rings, planar_pts, T_true, cfg)

    G = se3.exp(jnp.asarray([2.0, -1.0, 0.5, 0.1, -0.2, 0.3], jnp.float32))
    edge_g = np.asarray(se3.apply(G[None], jnp.asarray(edge_pts)[None])[0])
    planar_g = np.asarray(se3.apply(G[None], jnp.asarray(planar_pts)[None])[0])
    # Same current scan, targets moved by G => solution must become G @ T.
    edge_targets = icp.make_targets(
        jnp.asarray(edge_g), jnp.ones(len(edge_g), dtype=bool),
        payload=jnp.asarray(edge_rings)[:, None],
    )
    planar_targets = icp.make_targets(
        jnp.asarray(planar_g), jnp.ones(len(planar_g), dtype=bool)
    )
    cur_e = se3.apply(se3.inv(T_true)[None], jnp.asarray(edge_pts)[None])[0]
    cur_p = se3.apply(se3.inv(T_true)[None], jnp.asarray(planar_pts)[None])[0]
    T_est_g, _ = icp.solve_scan_to_scan(
        cur_e, jnp.ones(len(edge_pts), dtype=bool),
        cur_p, jnp.ones(len(planar_pts), dtype=bool),
        edge_targets, planar_targets, G @ se3.identity(), cfg,
    )
    err = se3.log(se3.inv(G @ T_est) @ T_est_g)
    assert np.linalg.norm(np.asarray(err)) < 5e-3, np.asarray(err)


def test_mask_invariance():
    """Appending masked-out garbage features must not change the solution."""
    rng = np.random.default_rng(22)
    edge_pts, edge_rings, planar_pts = synthetic_scene(rng)
    T_true = se3.exp(jnp.asarray([0.2, 0.1, -0.05, 0.02, -0.01, 0.03],
                                 jnp.float32))
    cfg = SolverConfig()

    def run(extra):
        e = edge_pts
        er = edge_rings
        p = planar_pts
        em = np.ones(len(e), bool)
        pm = np.ones(len(p), bool)
        if extra:
            junk = rng.normal(size=(64, 3)).astype(np.float32) * 5
            e = np.concatenate([e, junk])
            er = np.concatenate([er, np.zeros(64, np.int32)])
            em = np.concatenate([em, np.zeros(64, bool)])
            pj = rng.normal(size=(64, 3)).astype(np.float32) * 5
            p = np.concatenate([p, pj])
            pm = np.concatenate([pm, np.zeros(64, bool)])
        et = icp.make_targets(jnp.asarray(e), jnp.asarray(em),
                              payload=jnp.asarray(er)[:, None])
        pt = icp.make_targets(jnp.asarray(p), jnp.asarray(pm))
        cur_e = se3.apply(se3.inv(T_true)[None], jnp.asarray(e)[None])[0]
        cur_p = se3.apply(se3.inv(T_true)[None], jnp.asarray(p)[None])[0]
        T, _ = icp.solve_scan_to_scan(
            cur_e, jnp.asarray(em), cur_p, jnp.asarray(pm), et, pt,
            se3.identity(), cfg,
        )
        return np.asarray(T)

    np.testing.assert_allclose(run(False), run(True), atol=1e-5)


def test_jit_determinism():
    rng = np.random.default_rng(23)
    edge_pts, edge_rings, planar_pts = synthetic_scene(rng)
    T_true = se3.exp(jnp.asarray([0.1, 0.2, 0.0, 0.0, 0.01, 0.02],
                                 jnp.float32))
    cfg = SolverConfig()
    a = np.asarray(_solve(edge_pts, edge_rings, planar_pts, T_true, cfg))
    b = np.asarray(_solve(edge_pts, edge_rings, planar_pts, T_true, cfg))
    np.testing.assert_array_equal(a, b)
