"""Isolate the forward-motion bias: which stage underestimates?

Runs short sequences through ablated pipelines on fixtures with and without
motion distortion, printing the mean per-frame relative-pose error (the bias
vector) for each cell of the matrix.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_seq(distorted: bool, frames=60, rings=32, az=1024, seed=0):
    from velo_tpu.io import fixtures, kitti

    cache = f"/tmp/velo_bias_{distorted}_{frames}_{rings}_{az}_{seed}.npz"
    if os.path.exists(cache):
        d = np.load(cache)
        return d["scans"], d["masks"], d["gt"]
    world = fixtures.default_world(seed)
    rng = np.random.default_rng(seed + 1)
    poses = fixtures.make_trajectory(frames + 1, speed=8.0, seed=seed + 2)
    scans, masks = [], []
    for i in range(frames):
        end = poses[i + 1] if distorted else poses[i]
        s = fixtures.simulate_velodyne(world, poses[i], end, n_rings=rings,
                                       n_azimuth=az, rng=rng)
        p, m = kitti.pad_scan(s, rings * az)
        scans.append(p)
        masks.append(m)
    scans = np.stack(scans)
    masks = np.stack(masks)
    np.savez_compressed(cache, scans=scans, masks=masks, gt=poses[:frames])
    return scans, masks, poses[:frames]


def bias_of(poses, gt):
    from scipy.spatial.transform import Rotation

    F = len(poses)
    rg = np.asarray([np.linalg.inv(gt[i - 1]) @ gt[i] for i in range(1, F)])
    re_ = np.asarray([np.linalg.inv(poses[i - 1]) @ poses[i]
                      for i in range(1, F)])
    err = np.asarray([np.linalg.inv(a) @ b for a, b in zip(rg, re_)])
    dt = err[:, :3, 3]
    yaw = np.degrees(Rotation.from_matrix(err[:, :3, :3]).as_rotvec()[:, 2])
    return dt.mean(0), dt.std(0), yaw.mean(), yaw.std()


def main():
    import jax
    import jax.numpy as jnp

    from velo_tpu.config import LidarConfig, VeloConfig
    from velo_tpu.pipeline import odometry

    cases = [
        ("distorted base", True, dict(use_map=True, use_deskew=True)),
        ("distorted no-map", True, dict(use_map=False, use_deskew=True)),
        ("undistorted no-deskew no-map", False,
         dict(use_map=False, use_deskew=False)),
        ("undistorted no-deskew map", False,
         dict(use_map=True, use_deskew=False)),
    ]
    for name, distorted, kw in cases:
        scans, masks, gt = make_seq(distorted)
        cfg = VeloConfig(lidar=LidarConfig(n_rings=32, n_azimuth=1024),
                         use_vision=False, n_max_points=32 * 1024, **kw)
        run = jax.jit(lambda c, s, m: odometry.run_scan(c, s, m, cfg))
        carry, out = run(odometry.init_carry(cfg), jnp.asarray(scans),
                         jnp.asarray(masks))
        jax.block_until_ready(out.T_w)
        tb, ts, yb, ys = bias_of(np.asarray(out.T_w), gt)
        print(f"{name:32s} tbias {np.round(tb,4)} (std {np.round(ts,3)}) "
              f"yaw bias {yb:+.4f} std {ys:.3f} deg")


if __name__ == "__main__":
    main()
