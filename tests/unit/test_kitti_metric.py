"""KITTI drift metric: exactness on constructed trajectories."""
import numpy as np

from velo_tpu.evaluation import kitti_metric


def straight_traj(n, step=1.0):
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, 0, 3] = np.arange(n) * step
    return poses


def test_zero_error_on_identical():
    gt = straight_traj(900)
    res = kitti_metric.evaluate_trajectory(gt.copy(), gt)
    assert res.n_segments > 0
    assert res.t_err_pct < 1e-9
    assert res.r_err_deg_per_100m < 1e-6


def test_known_translation_drift():
    # Estimated trajectory scaled by 1.01 => exactly 1% translational drift.
    gt = straight_traj(900)
    est = straight_traj(900, step=1.01)
    res = kitti_metric.evaluate_trajectory(est, gt)
    np.testing.assert_allclose(res.t_err_pct, 1.0, rtol=1e-6)
    assert res.r_err_deg_per_100m < 1e-6


def test_known_rotation_drift():
    # Constant yaw-rate error of 0.001 rad per 1 m step.
    n = 900
    gt = straight_traj(n)
    est = np.tile(np.eye(4), (n, 1, 1))
    x = y = yaw = 0.0
    for i in range(n):
        c, s = np.cos(yaw), np.sin(yaw)
        est[i][:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        est[i][:3, 3] = [x, y, 0]
        x += c
        y += s
        yaw += 0.001
    res = kitti_metric.evaluate_trajectory(est, gt)
    np.testing.assert_allclose(res.r_err_deg_per_m, np.degrees(0.001), rtol=1e-2)


def test_segment_accounting():
    gt = straight_traj(450)  # 449 m -> lengths 100..400 only
    res = kitti_metric.evaluate_trajectory(gt.copy(), gt)
    assert set(res.per_length) == {100.0, 200.0, 300.0, 400.0}


def test_short_trajectory_graceful():
    gt = straight_traj(5)
    res = kitti_metric.evaluate_trajectory(gt.copy(), gt)
    assert res.n_segments == 0
