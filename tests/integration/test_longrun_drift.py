"""CI-pinned long-run drift envelope (VERDICT r2 Next#5).

The 150-frame accuracy story previously lived only in the hand-run
``scripts/longrun.py``; a tuning regression that doubled long-run drift
would sail through the suite.  This test runs one real 120-frame /
~120 m drive through the production LiDAR pipeline on CPU and pins the
official KITTI drift metric under an envelope.

The envelope (2 %/100m trans, 2 deg/100m rot) is ~3x the measured value
for this seed (0.59 %/0.70 deg, see BUILD_NOTES) — generous enough for
per-seed chaos, tight enough that a genuine regression (round-1 levels
were 4+ %) fails loudly.
"""
import numpy as np
import jax
import jax.numpy as jnp

from velo_tpu.config import LidarConfig, VeloConfig
from velo_tpu.evaluation import kitti_metric
from velo_tpu.io import fixtures, kitti
from velo_tpu.pipeline import odometry

FRAMES, RINGS, AZ, SPEED, SEED = 120, 32, 1024, 10.0, 0


def _record(name, errs):
    """Append the measured drift to a JSONL trail (and echo it): the pins
    are envelopes sized from measured values + per-seed chaos, and the
    re-measurement that sizes them should fall out of any suite run
    rather than need a hand-run harness."""
    import json

    row = {"test": name, "t_err_pct": round(float(errs.t_err_pct), 3),
           "r_err_deg_per_100m": round(float(errs.r_err_deg_per_100m), 3)}
    print(f"[ci-drift] {json.dumps(row)}")
    with open("/tmp/velo_ci_drift_measured.jsonl", "a") as f:
        f.write(json.dumps(row) + "\n")


def _cached_fixture():
    import os

    cache = (f"/tmp/velo_ci_drift_{FRAMES}_{RINGS}_{AZ}"
             f"_{SPEED:g}_{SEED}.npz")
    if os.path.exists(cache):
        d = np.load(cache)
        return d["scans"], d["masks"], d["gt_cam"], d["T_cam_velo"]
    fx = fixtures.make_fixture(n_frames=FRAMES, n_rings=RINGS, n_azimuth=AZ,
                               with_images=False, speed=SPEED, seed=SEED)
    padded = [kitti.pad_scan(s, RINGS * AZ) for s in fx.scans]
    scans = np.stack([p[0] for p in padded])
    masks = np.stack([p[1] for p in padded])
    np.savez_compressed(cache, scans=scans, masks=masks,
                        gt_cam=fx.gt_poses_cam, T_cam_velo=fx.T_cam_velo)
    return scans, masks, fx.gt_poses_cam, fx.T_cam_velo


def test_longrun_drift_envelope():
    scans, masks, gt_cam, T_cam_velo = _cached_fixture()
    cfg = VeloConfig(lidar=LidarConfig(n_rings=RINGS, n_azimuth=AZ),
                     use_vision=False, use_map=True,
                     n_max_points=RINGS * AZ)
    run = jax.jit(lambda c, s, m: odometry.run_scan(c, s, m, cfg))
    carry, out = run(odometry.init_carry(cfg), jnp.asarray(scans),
                     jnp.asarray(masks))
    poses_cam = odometry.velo_to_cam_trajectory(np.asarray(out.T_w),
                                                T_cam_velo)
    errs = kitti_metric.evaluate_trajectory(poses_cam, gt_cam)
    _record("planar", errs)
    assert errs.n_segments >= 2, "trajectory too short for the KITTI metric"
    # Pins ~2.2x the round-4 shipped-default measurement on this exact
    # cached fixture (t 0.59 %/100m, rot 2.53 deg/100m — the rot value is
    # a CI-scale artifact of the obs-scaled prior: full-scale rotation
    # IMPROVED 1.96->1.29 deg/100m with it on; see BUILD_NOTES round 4).
    # Sized so a uniform 2x tuning regression fails while the measured
    # per-seed chaos of numerically-neutral changes (up to ~1.75x at this
    # scale) does not.
    assert errs.t_err_pct < 1.3, (
        f"long-run translational drift regressed: {errs.t_err_pct:.2f} "
        "%/100m (round-4 shipped defaults measured 0.59 on this seed)")
    assert errs.r_err_deg_per_100m < 5.0, (
        f"long-run rotational drift regressed: "
        f"{errs.r_err_deg_per_100m:.2f} deg/100m (measured 2.53)")
    assert not np.asarray(out.degenerate)[1:].any()


def test_longrun_drift_fused_envelope():
    """Fused (config-4) drift envelope on the historically-hard seed.

    Seed 2's geometry produced the round-3 full-scale track-quality
    regressions.  At THIS reduced CI scale (384x128 images) the specific
    fb_levels=1 failure mode does not reproduce (measured 1.78 vs 2.03 at
    shipped defaults), so this is a generic fused-pipeline drift pin.
    Seed 2 measures 2.0-3.5 %/100m across *numerically-neutral* code
    micro-variants (depth-gate threshold sweeps) — per-seed chaos at this
    scale; round-4 shipped defaults measure 1.77 — so the envelope is
    3.6 (~2x measured): it still fails loudly on the
    catastrophic failure class it exists for (the suburban occlusion-edge
    bug measured 12-18 %), and KLT-specific gating lives in the
    full-scale TPU harness (scripts/longrun.py --vision).
    """
    import os

    from velo_tpu.config import VisionConfig
    from velo_tpu.geom import camera as cam_mod

    # 125 frames ≈ 124 m of path: enough for >=2 overlapping 100 m KITTI
    # segments (a 100-frame drive is ~99 m and yields zero segments).
    frames, seed = 125, 2
    cache = f"/tmp/velo_ci_drift_fused_{frames}_{RINGS}_{AZ}_{seed}.npz"
    if os.path.exists(cache):
        d = np.load(cache)
        scans, masks, images = d["scans"], d["masks"], d["images"]
        gt_cam, T_cam_velo, P = d["gt_cam"], d["T_cam_velo"], d["P"]
    else:
        fx = fixtures.make_fixture(n_frames=frames, n_rings=RINGS,
                                   n_azimuth=AZ, with_images=True,
                                   height=128, width=384, speed=SPEED,
                                   seed=seed)
        padded = [kitti.pad_scan(s, RINGS * AZ) for s in fx.scans]
        scans = np.stack([p[0] for p in padded])
        masks = np.stack([p[1] for p in padded])
        images, gt_cam, T_cam_velo, P = (fx.images, fx.gt_poses_cam,
                                         fx.T_cam_velo, fx.P)
        np.savez_compressed(cache, scans=scans, masks=masks, images=images,
                            gt_cam=gt_cam, T_cam_velo=T_cam_velo, P=P)
    cfg = VeloConfig(lidar=LidarConfig(n_rings=RINGS, n_azimuth=AZ),
                     vision=VisionConfig(height=128, width=384, k_tracks=128,
                                         grid_cols=24),
                     use_vision=True, use_map=True, n_max_points=RINGS * AZ)
    cam = cam_mod.Camera(P=jnp.asarray(P, jnp.float32),
                         T_cam_velo=jnp.asarray(T_cam_velo, jnp.float32),
                         width=384, height=128)
    run = jax.jit(lambda c, s, m, im: odometry.run_scan(c, s, m, cfg,
                                                        images=im, cam=cam))
    carry, out = run(odometry.init_carry(cfg), jnp.asarray(scans),
                     jnp.asarray(masks), jnp.asarray(images, jnp.float32))
    poses_cam = odometry.velo_to_cam_trajectory(np.asarray(out.T_w),
                                                T_cam_velo)
    errs = kitti_metric.evaluate_trajectory(poses_cam, gt_cam)
    _record("fused_seed2", errs)
    assert errs.n_segments >= 2, "trajectory too short for the KITTI metric"
    # ~2x the round-4 shipped-default measurement (1.77 %/100m).
    assert errs.t_err_pct < 3.6, (
        f"fused long-run drift regressed: {errs.t_err_pct:.2f} %/100m "
        "(round-4 shipped defaults measured 1.77 on this seed)")
    assert not np.asarray(out.degenerate)[1:].any()


def test_longrun_drift_heldout_suburban():
    """Drift envelope on the HELD-OUT world family (never used for tuning).

    suburban_world: terraced ~1 % grade the trajectory climbs, sparse
    one-sided set-back structures, two fully open stretches.  Pre-seam-fix
    defaults measured 1.21/0.83/1.15 %/100m (seeds 0-2) at this scale;
    after the sweep-seam curvature fix this seed measures 3.02 — the fake
    seam edges were forward-constraining pseudo-landmarks that open
    stretches (unlike the canyon) genuinely leaned on, so their removal
    trades a big canyon win for a held-out hit AT CI SCALE; the round-4
    obs-scaled-prior default added another CI-scale-only shift to 4.03
    (full-scale TPU suburban at the same config: 0.651 %/100m, a tie with
    the prior off — the pin follows full scale for decisions and CI scale
    for its own envelope).  Pin 8.0 = ~2x the shipped-default CI
    measurement; still catches an overfit-to-canyon catastrophe.
    Seed 1 is the median seed of the original sweep.
    """
    import os

    seed = 1
    cache = f"/tmp/velo_ci_suburban_{FRAMES}_{RINGS}_{AZ}_{seed}.npz"
    if os.path.exists(cache):
        d = np.load(cache)
        scans, masks, gt_cam, T_cam_velo = (d["scans"], d["masks"],
                                            d["gt_cam"], d["T_cam_velo"])
    else:
        fx = fixtures.make_fixture(
            n_frames=FRAMES, n_rings=RINGS, n_azimuth=AZ, with_images=False,
            speed=SPEED, seed=seed, world=fixtures.suburban_world(seed),
            grade=0.01)
        padded = [kitti.pad_scan(s, RINGS * AZ) for s in fx.scans]
        scans = np.stack([p[0] for p in padded])
        masks = np.stack([p[1] for p in padded])
        gt_cam, T_cam_velo = fx.gt_poses_cam, fx.T_cam_velo
        np.savez_compressed(cache, scans=scans, masks=masks, gt_cam=gt_cam,
                            T_cam_velo=T_cam_velo)
    cfg = VeloConfig(lidar=LidarConfig(n_rings=RINGS, n_azimuth=AZ),
                     use_vision=False, use_map=True, n_max_points=RINGS * AZ)
    run = jax.jit(lambda c, s, m: odometry.run_scan(c, s, m, cfg))
    carry, out = run(odometry.init_carry(cfg), jnp.asarray(scans),
                     jnp.asarray(masks))
    poses_cam = odometry.velo_to_cam_trajectory(np.asarray(out.T_w),
                                                T_cam_velo)
    errs = kitti_metric.evaluate_trajectory(poses_cam, gt_cam)
    _record("suburban_heldout", errs)
    assert errs.n_segments >= 2
    assert errs.t_err_pct < 8.0, (
        f"held-out-world drift regressed: {errs.t_err_pct:.2f} %/100m "
        "(round-4 shipped defaults measured 4.03 at CI scale)")


def test_longrun_drift_noise_envelope():
    """Drift envelope WITH sensor-noise realism (2 cm Gaussian range noise,
    ~HDL-64E): the headline numbers must not silently rely on perfect
    ranges (VERDICT r2 Missing#3).  Shipped defaults measured
    1.23/0.47/4.84 %/100m on seeds 0-2 at this scale (round-4 shipped
    defaults re-measure seed 0 at 2.20); seed 0 pins at ~2x that
    (seed 2's geometry is chaotic under noise and would need a useless
    envelope)."""
    import os

    cache = f"/tmp/velo_ci_noise_{FRAMES}_{RINGS}_{AZ}_{SEED}.npz"
    if os.path.exists(cache):
        d = np.load(cache)
        scans, masks, gt_cam, T_cam_velo = (d["scans"], d["masks"],
                                            d["gt_cam"], d["T_cam_velo"])
    else:
        fx = fixtures.make_fixture(n_frames=FRAMES, n_rings=RINGS,
                                   n_azimuth=AZ, with_images=False,
                                   speed=SPEED, seed=SEED, noise_std=0.02)
        padded = [kitti.pad_scan(s, RINGS * AZ) for s in fx.scans]
        scans = np.stack([p[0] for p in padded])
        masks = np.stack([p[1] for p in padded])
        gt_cam, T_cam_velo = fx.gt_poses_cam, fx.T_cam_velo
        np.savez_compressed(cache, scans=scans, masks=masks, gt_cam=gt_cam,
                            T_cam_velo=T_cam_velo)
    cfg = VeloConfig(lidar=LidarConfig(n_rings=RINGS, n_azimuth=AZ),
                     use_vision=False, use_map=True, n_max_points=RINGS * AZ)
    run = jax.jit(lambda c, s, m: odometry.run_scan(c, s, m, cfg))
    carry, out = run(odometry.init_carry(cfg), jnp.asarray(scans),
                     jnp.asarray(masks))
    poses_cam = odometry.velo_to_cam_trajectory(np.asarray(out.T_w),
                                                T_cam_velo)
    errs = kitti_metric.evaluate_trajectory(poses_cam, gt_cam)
    _record("noise", errs)
    assert errs.n_segments >= 2
    assert errs.t_err_pct < 4.4, (
        f"noise-on drift regressed: {errs.t_err_pct:.2f} %/100m "
        "(round-4 shipped defaults measured 2.20 on this seed)")


def test_longrun_drift_heldout_suburban_fused():
    """FUSED drift envelope on the held-out world — the regression class
    this guards is real: before the occlusion-edge depth gates + the
    depth-count trust ramp, fused drift here was 11.8-18.5 %/100m (vs 0.4
    LiDAR-only) because corners preferentially track fence-top/house-edge
    T-junctions whose interpolated LiDAR depth is meters wrong.  After the
    fix this seed measures 0.9-3.1 depending on gate micro-thresholds
    (single-seed chaos); the round-4 default flips (fb_levels=2 +
    obs-scaled prior) move it to 6.29 AT THIS CI SCALE ONLY (full-scale
    TPU suburban fused at the same config: 1.15 %/100m mean, seeds 0-2).
    The envelope is 10.0 — 1.6x the measured value, still below the
    11.8-18.5 failure class it guards."""
    import os

    from velo_tpu.config import VisionConfig
    from velo_tpu.geom import camera as cam_mod

    frames, seed = 125, 1
    cache = f"/tmp/velo_ci_fused_suburban_{frames}_{RINGS}_{AZ}_{seed}.npz"
    if os.path.exists(cache):
        d = np.load(cache)
        scans, masks, images = d["scans"], d["masks"], d["images"]
        gt_cam, T_cam_velo, P = d["gt_cam"], d["T_cam_velo"], d["P"]
    else:
        fx = fixtures.make_fixture(
            n_frames=frames, n_rings=RINGS, n_azimuth=AZ, with_images=True,
            height=128, width=384, speed=SPEED, seed=seed,
            world=fixtures.suburban_world(seed), grade=0.01)
        padded = [kitti.pad_scan(s, RINGS * AZ) for s in fx.scans]
        scans = np.stack([p[0] for p in padded])
        masks = np.stack([p[1] for p in padded])
        images, gt_cam, T_cam_velo, P = (fx.images, fx.gt_poses_cam,
                                         fx.T_cam_velo, fx.P)
        np.savez_compressed(cache, scans=scans, masks=masks, images=images,
                            gt_cam=gt_cam, T_cam_velo=T_cam_velo, P=P)
    cfg = VeloConfig(lidar=LidarConfig(n_rings=RINGS, n_azimuth=AZ),
                     vision=VisionConfig(height=128, width=384, k_tracks=128,
                                         grid_cols=24),
                     use_vision=True, use_map=True, n_max_points=RINGS * AZ)
    cam = cam_mod.Camera(P=jnp.asarray(P, jnp.float32),
                         T_cam_velo=jnp.asarray(T_cam_velo, jnp.float32),
                         width=384, height=128)
    run = jax.jit(lambda c, s, m, im: odometry.run_scan(c, s, m, cfg,
                                                        images=im, cam=cam))
    carry, out = run(odometry.init_carry(cfg), jnp.asarray(scans),
                     jnp.asarray(masks), jnp.asarray(images, jnp.float32))
    poses_cam = odometry.velo_to_cam_trajectory(np.asarray(out.T_w),
                                                T_cam_velo)
    errs = kitti_metric.evaluate_trajectory(poses_cam, gt_cam)
    _record("suburban_fused", errs)
    assert errs.n_segments >= 2
    assert errs.t_err_pct < 10.0, (
        f"held-out fused drift regressed: {errs.t_err_pct:.2f} %/100m "
        "(occlusion-edge depth gates or trust ramp broken?)")
