"""Integration ladder mirroring BASELINE.json's five configs (SURVEY.md §4.2).

Each test runs the real pipeline end-to-end on a synthetic KITTI-like fixture
with exact ground truth.  Thresholds are deliberately generous bounds meant to
catch structural regressions (sign errors, frame conventions, divergence),
not to certify drift — the bench harness tracks accuracy trends.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from velo_tpu.config import LidarConfig, MapConfig, VeloConfig, VisionConfig
from velo_tpu.evaluation import kitti_metric
from velo_tpu.geom import camera as cam_mod
from velo_tpu.io import fixtures, kitti
from velo_tpu.pipeline import odometry

N_FRAMES = 8
RINGS, AZ = 32, 1024


@pytest.fixture(scope="module")
def fx():
    return fixtures.make_fixture(
        n_frames=N_FRAMES, n_rings=RINGS, n_azimuth=AZ, height=128,
        width=384, with_images=True, speed=8.0,
    )


def base_cfg(**kw):
    d = dict(
        lidar=LidarConfig(n_rings=RINGS, n_azimuth=AZ),
        vision=VisionConfig(height=128, width=384, k_tracks=128,
                            grid_cols=24),
        map=MapConfig(edge_capacity=8192, planar_capacity=16384),
        n_max_points=32 * 1024,
    )
    d.update(kw)
    return VeloConfig(**d)


def rel_errors(est, gt):
    errs = []
    for i in range(1, len(gt)):
        rel_gt = np.linalg.inv(gt[i - 1]) @ gt[i]
        rel_est = np.linalg.inv(est[i - 1]) @ est[i]
        e = np.linalg.inv(rel_gt) @ rel_est
        errs.append(np.linalg.norm(e[:3, 3]))
    return np.asarray(errs)


def _run(fx, cfg, with_images=False):
    cam = None
    if with_images:
        cam = cam_mod.Camera(
            P=jnp.asarray(fx.P, jnp.float32),
            T_cam_velo=jnp.asarray(fx.T_cam_velo, jnp.float32),
            width=fx.images.shape[2], height=fx.images.shape[1],
        )
        frames = [
            kitti.pad_scan(s, cfg.n_max_points) + (fx.images[i],)
            for i, s in enumerate(fx.scans)
        ]
    else:
        frames = [kitti.pad_scan(s, cfg.n_max_points) for s in fx.scans]
    return odometry.run_sequence_host(frames, cfg, cam=cam)


@pytest.mark.slow
def test_config1_lidar_scan_to_scan(fx):
    cfg = base_cfg(use_vision=False, use_map=False)
    est, diag = _run(fx, cfg)
    assert not diag["degenerate"][1:].any()
    errs = rel_errors(est, fx.gt_poses_velo)
    # Pinned near achieved levels (round 2: median ~0.02 m) so tuning
    # regressions fail CI, with ~2x headroom for platform noise.
    assert np.median(errs) < 0.05, errs
    assert errs.max() < 0.3, errs


@pytest.mark.slow
def test_config2_with_local_map(fx):
    cfg = base_cfg(use_vision=False, use_map=True)
    est, diag = _run(fx, cfg)
    ate = kitti_metric.ate_rmse(
        est, np.linalg.inv(fx.gt_poses_velo[0])[None] @ fx.gt_poses_velo
    )
    assert ate < 0.4, ate  # pinned near achieved (round 2: ~0.1 m over 8 frames)


@pytest.mark.slow
def test_config4_fused_visual_lidar(fx):
    cfg = base_cfg(use_vision=True, use_map=True)
    est, diag = _run(fx, cfg, with_images=True)
    assert not diag["degenerate"][1:].any()
    errs = rel_errors(est, fx.gt_poses_velo)
    assert np.median(errs) < 0.05, errs
    ate = kitti_metric.ate_rmse(
        est, np.linalg.inv(fx.gt_poses_velo[0])[None] @ fx.gt_poses_velo
    )
    assert ate < 0.4, ate


@pytest.mark.slow
def test_config5_batched_sequences(fx):
    """Two sequences batched with vmap over the jitted step (config 5)."""
    import jax

    cfg = base_cfg(use_vision=False, use_map=False)
    frames = [kitti.pad_scan(s, cfg.n_max_points) for s in fx.scans[:4]]
    scans = jnp.asarray(np.stack([f[0] for f in frames]))
    masks = jnp.asarray(np.stack([f[1] for f in frames]))
    # Batch = same sequence twice (results must match the unbatched run).
    bscans = jnp.stack([scans, scans])
    bmasks = jnp.stack([masks, masks])
    carry0 = odometry.init_carry(cfg)
    bcarry = jax.tree.map(lambda x: jnp.stack([x, x]), carry0)

    bfinal, bout = jax.vmap(
        lambda c, s, m: odometry.run_scan(c, s, m, cfg)
    )(bcarry, bscans, bmasks)
    sfinal, sout = odometry.run_scan(carry0, scans, masks, cfg)
    # Batched matmuls round differently than unbatched ones and the ICP
    # iteration amplifies the ulps, so the cross-check is loose (cm-level);
    # the two identical batch lanes, however, must agree bit-exactly.
    np.testing.assert_allclose(
        np.asarray(bout.T_w[0]), np.asarray(sout.T_w), atol=5e-2
    )
    np.testing.assert_allclose(
        np.asarray(bout.T_w[0]), np.asarray(bout.T_w[1]), atol=0
    )


@pytest.mark.slow
def test_vision_wins_in_degenerate_corridor():
    """The "vision-enhanced" claim, tested where it must matter: in a
    featureless straight corridor every LiDAR surface normal is
    perpendicular to travel, so point-to-plane says nothing about forward
    motion and LiDAR-only underestimates it badly.  The camera still sees
    the textured walls; fused (reprojection with LiDAR depth + epipolar)
    must recover the forward scale."""
    world = fixtures.corridor_world()
    fxp = fixtures.make_fixture(
        n_frames=12, n_rings=RINGS, n_azimuth=AZ, height=128, width=384,
        with_images=True, speed=8.0, seed=11, world=world,
        yaw_rate=0.0, wiggle_scale=0.0,
    )
    # prior_obs_gain pinned OFF: this fixture drives at exactly constant
    # velocity, so the shipped obs-scaled prior pins the LiDAR-unobserved
    # forward DoF to a prediction that happens to be exactly right and the
    # LiDAR-only arm "wins" by oracle prior, not by sensing.  The claim
    # under test is that the CAMERA recovers forward scale where LiDAR
    # geometry cannot; test it against the unpinned solver.
    from velo_tpu.config import SolverConfig
    cfg_kw = dict(
        lidar=LidarConfig(n_rings=RINGS, n_azimuth=AZ),
        vision=VisionConfig(height=128, width=384, k_tracks=128,
                            grid_cols=24),
        map=MapConfig(edge_capacity=8192, planar_capacity=16384),
        solver=SolverConfig(prior_obs_gain=0.0),
        n_max_points=RINGS * AZ,
        use_map=True,
    )
    cfg_l = VeloConfig(use_vision=False, **cfg_kw)
    cfg_f = VeloConfig(use_vision=True, **cfg_kw)

    est_l, _ = _run(fxp, cfg_l)
    est_f, _ = _run(fxp, cfg_f, with_images=True)
    # Forward (x) progress error per frame: LiDAR-only cannot observe it.
    fwd_err_l = np.abs(np.diff(est_l[:, 0, 3]) - np.diff(fxp.gt_poses_velo[:, 0, 3]))
    fwd_err_f = np.abs(np.diff(est_f[:, 0, 3]) - np.diff(fxp.gt_poses_velo[:, 0, 3]))
    assert np.median(fwd_err_f) < 0.5 * np.median(fwd_err_l), (
        np.median(fwd_err_f), np.median(fwd_err_l))


def test_exact_lag_deskew_identity_under_constant_velocity():
    """deskew_exact_lag re-corrects targets/map inserts with the NEXT
    frame's solved delta.  On a constant-velocity drive that correction is
    the identity, so the two settings must produce (nearly) the same
    trajectory — differences come only from the one-frame map-insert lag.
    On an accelerating drive the corrections are real and the trajectories
    legitimately diverge; this pins the no-op contract."""
    fx_cv = fixtures.make_fixture(
        n_frames=6, n_rings=RINGS, n_azimuth=AZ, with_images=False,
        speed=8.0, yaw_rate=0.0, wiggle_scale=0.0,
    )
    import dataclasses

    cfg_off = base_cfg(use_vision=False, use_map=True)
    cfg_on = dataclasses.replace(
        cfg_off, solver=dataclasses.replace(cfg_off.solver,
                                            deskew_exact_lag=True))
    poses_on, _ = _run(fx_cv, cfg_on)
    poses_off, _ = _run(fx_cv, cfg_off)
    gt = fx_cv.gt_poses_velo
    # The redeskew corrections are identities here, so any on/off pose
    # difference is bounded by the two runs' own GT errors (the one-frame
    # map-insert lag changes map *contents*, which perturbs per-frame
    # chaos, but must not introduce error beyond what the baseline has).
    for i in (2, 4, 5):
        d = np.linalg.norm(poses_on[i][:3, 3] - poses_off[i][:3, 3])
        e_on = np.linalg.norm(poses_on[i][:3, 3] - gt[i][:3, 3])
        e_off = np.linalg.norm(poses_off[i][:3, 3] - gt[i][:3, 3])
        assert d <= e_on + e_off + 1e-6, (i, d, e_on, e_off)
    # The identity contract proper: under constant velocity exact-lag may
    # not be WORSE than the plain path (measured: 1.8 cm vs 8 cm at frame
    # 7 — the lagged insert is, if anything, slightly better).
    e_on = np.linalg.norm(poses_on[-1][:3, 3] - gt[len(poses_on) - 1][:3, 3])
    e_off = np.linalg.norm(poses_off[-1][:3, 3]
                           - gt[len(poses_off) - 1][:3, 3])
    assert e_on < e_off + 0.02, (e_on, e_off)
    # And both track ground truth (relative motion) sanely.  The plain
    # path's bound is looser: inserting each frame deskewed by its OWN
    # solved motion feeds estimation error back into the map — on this
    # forward-weak straight drive at CI scale the feedback grows the
    # per-frame error to ~0.12 m by frame 5 (measured; exact-lag's
    # refined lagged inserts break the loop and hold ~0.01 m).  Before
    # the sweep-seam curvature fix this was masked by fake seam edges
    # acting as stable forward pseudo-landmarks.  Full-scale planar drift
    # at the same defaults is healthy (1.12 %/100m 5-seed mean), so the
    # loose bound is a divergence guard, not an accuracy pin.
    for poses, bound in ((poses_on, 0.05), (poses_off, 0.2)):
        rel_est = np.linalg.inv(poses[4]) @ poses[5]
        rel_gt = np.linalg.inv(gt[4]) @ gt[5]
        assert np.linalg.norm(rel_est[:3, 3] - rel_gt[:3, 3]) < bound
