"""Checkpoint/resume round-trip + map_every cadence + plots (SURVEY.md §5)."""
import os

import numpy as np
import pytest

from velo_tpu.config import (LidarConfig, MapConfig, SolverConfig, VeloConfig)
from velo_tpu.io import fixtures, kitti
from velo_tpu.pipeline import checkpoint as ckpt
from velo_tpu.pipeline import odometry


def tiny_cfg(**kw):
    d = dict(
        lidar=LidarConfig(n_rings=16, n_azimuth=256, n_sectors=8),
        solver=SolverConfig(hash_capacity=1024, icp_iters_odom=2,
                            icp_iters_map=2, icp_iters_redeskew=1,
                            lm_iters=2),
        map=MapConfig(edge_capacity=1024, planar_capacity=2048),
        n_max_points=4096,
        use_vision=False,
        use_map=True,
    )
    d.update(kw)
    return VeloConfig(**d)


@pytest.fixture(scope="module")
def frames():
    fx = fixtures.make_fixture(n_frames=6, n_rings=16, n_azimuth=256,
                               with_images=False)
    return [kitti.pad_scan(s, 4096) for s in fx.scans], fx


def test_carry_roundtrip(tmp_path, frames):
    cfg = tiny_cfg()
    carry = odometry.init_carry(cfg)
    path = str(tmp_path / "carry.npz")
    ckpt.save_carry(path, carry, frame_idx=0)
    loaded = ckpt.load_carry(path, odometry.init_carry(cfg))
    import jax

    for a, b in zip(jax.tree.leaves(carry), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert ckpt.checkpoint_frame(path) == 0


def test_structure_mismatch_rejected(tmp_path, frames):
    cfg = tiny_cfg()
    path = str(tmp_path / "carry.npz")
    ckpt.save_carry(path, odometry.init_carry(cfg), frame_idx=0)
    other = tiny_cfg(map=MapConfig(edge_capacity=512, planar_capacity=1024))
    with pytest.raises(ValueError):
        ckpt.load_carry(path, odometry.init_carry(other))


def test_resume_matches_uninterrupted(tmp_path, frames):
    seq, fx = frames
    cfg = tiny_cfg()
    path = str(tmp_path / "ck.npz")

    full, _ = odometry.run_sequence_host(seq, cfg)
    # First run: checkpoint after every 3 frames, stop after 3.
    odometry.run_sequence_host(seq[:3], cfg, checkpoint_path=path,
                               checkpoint_every=3)
    assert ckpt.checkpoint_frame(path) == 3
    resumed, rdiag = odometry.run_sequence_host(seq, cfg,
                                                checkpoint_path=path,
                                                resume=True)
    # Resume returns the FULL trajectory (pre-checkpoint poses come from the
    # persisted history), identical to an uninterrupted run.
    assert resumed.shape[0] == len(seq)
    np.testing.assert_allclose(resumed, full, atol=1e-5)
    assert rdiag["n_edge"].shape[0] == len(seq)


def test_map_every_cadence(frames):
    seq, fx = frames
    cfg = tiny_cfg(map=MapConfig(edge_capacity=1024, planar_capacity=2048,
                                 map_every=2))
    est, diag = odometry.run_sequence_host(seq, cfg)
    assert est.shape == (len(seq), 4, 4)
    assert np.all(np.isfinite(est))


def test_plot_trajectory_writes_files(tmp_path, frames):
    from velo_tpu.evaluation import plots

    _, fx = frames
    gt = fx.gt_poses_cam
    est = gt.copy()
    est[:, 0, 3] += np.linspace(0, 0.1, len(gt))
    written = plots.plot_trajectory(str(tmp_path), "toy", est, gt)
    assert all(os.path.exists(p) for p in written)
    assert len(written) == 2


def test_ct_sweep_no_double_redeskew(frames):
    """Regression (ADVICE r2): with ct_sweep the stored target features are
    already corrected with the solved sweep motion; step 6 must NOT redeskew
    them a second time.  Counted at trace time: the CT path calls redeskew
    exactly 4 times (edges/planars x query/target), never 6."""
    import dataclasses
    from unittest import mock

    import jax

    from velo_tpu.lidar import deskew as deskew_mod

    seq, fx = frames
    cfg = tiny_cfg()
    cfg = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, ct_sweep=True))
    carry = odometry.init_carry(cfg)
    scan, mask = seq[0]
    calls = []
    real = deskew_mod.redeskew
    # Patch odometry's *name* for the module (not the shared module object)
    # so the solver's internal relinearization calls don't count.
    import types
    proxy = types.SimpleNamespace(
        deskew=deskew_mod.deskew,
        redeskew=lambda *a, **k: calls.append(1) or real(*a, **k),
    )
    with mock.patch.object(odometry, "deskew_mod", proxy):
        jax.eval_shape(lambda c, s, m: odometry.step(c, s, m, cfg),
                       carry, scan, mask)
    assert len(calls) == 4


def test_ct_sweep_pipeline_runs(frames):
    """Continuous-time sweep solve: pipeline path compiles and stays sane."""
    import dataclasses

    from velo_tpu.config import SolverConfig

    seq, fx = frames
    cfg = tiny_cfg()
    cfg = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, ct_sweep=True))
    est, diag = odometry.run_sequence_host(seq, cfg)
    assert est.shape == (len(seq), 4, 4)
    assert np.all(np.isfinite(est))
    assert not diag["degenerate"][1:].any()
