"""Probe the LiDAR-poor fixture: does vision help, and are tracks healthy?"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp

    from velo_tpu.config import (LidarConfig, MapConfig, VeloConfig,
                                 VisionConfig)
    from velo_tpu.geom import camera as cam_mod
    from velo_tpu.io import fixtures, kitti
    from velo_tpu.pipeline import odometry

    rings = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    az = 768
    fxp = fixtures.make_fixture(n_frames=10, n_rings=rings, n_azimuth=az,
                                height=128, width=384, with_images=True,
                                speed=8.0, seed=7)
    cfg_kw = dict(
        lidar=LidarConfig(n_rings=rings, n_azimuth=az),
        vision=VisionConfig(height=128, width=384, k_tracks=128,
                            grid_cols=24, depth_search_cells=3,
                            max_depth_spread=2.0),
        map=MapConfig(edge_capacity=4096, planar_capacity=8192),
        n_max_points=rings * az,
        use_map=True,
    )
    cam = cam_mod.Camera(P=jnp.asarray(fxp.P, jnp.float32),
                         T_cam_velo=jnp.asarray(fxp.T_cam_velo, jnp.float32),
                         width=384, height=128)

    def rel_errors(est, gt):
        errs = []
        for i in range(1, len(gt)):
            rel_gt = np.linalg.inv(gt[i - 1]) @ gt[i]
            rel_est = np.linalg.inv(est[i - 1]) @ est[i]
            e = np.linalg.inv(rel_gt) @ rel_est
            errs.append(np.linalg.norm(e[:3, 3]))
        return np.asarray(errs)

    for name, use_vision in [("lidar", False), ("fused", True)]:
        cfg = VeloConfig(use_vision=use_vision, **cfg_kw)
        carry = odometry.init_carry(cfg)
        poses = []
        ntrk = []
        for i, s in enumerate(fxp.scans):
            scan, mask = kitti.pad_scan(s, cfg.n_max_points)
            img = jnp.asarray(fxp.images[i]) if use_vision else None
            carry, out = odometry.jit_step(carry, jnp.asarray(scan),
                                           jnp.asarray(mask), cfg,
                                           image=img, cam=cam)
            poses.append(np.asarray(out.T_w))
            if use_vision:
                t = carry.vision.tracks
                ntrk.append((int(t.active.sum()), int((t.active & t.has_depth).sum())))
        errs = rel_errors(np.stack(poses), fxp.gt_poses_velo)
        print(f"{name}: med {np.median(errs):.4f} max {errs.max():.4f} "
              f"errs {np.round(errs,3)}")
        if ntrk:
            print("  tracks (active, with_depth):", ntrk)


if __name__ == "__main__":
    main()
