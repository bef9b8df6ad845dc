"""Export a synthetic drive as a KITTI odometry sequence directory.

Writes the exact on-disk layout the real-data path consumes
(``io/kitti.KittiSequence``): ``velodyne/XXXXXX.bin`` (float32 Nx4),
``image_0/XXXXXX.png`` (8-bit grayscale), ``calib.txt`` (P0-P3 + Tr),
``times.txt``, and ``poses/<seq>.txt`` ground truth — so the full
--kitti-root CLI path (native async loader, hdl64e ring table, calib
parse, image read-ahead) can be exercised end-to-end without real data.

Usage: python scripts/make_fake_kitti.py --out /tmp/fakekitti --frames 8
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--seq", default="00")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--rings", type=int, default=64)
    ap.add_argument("--azimuth", type=int, default=2048)
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import cv2

    from velo_tpu.io import fixtures, kitti
    from velo_tpu.lidar.rangeimage import hdl64e_beam_elevations

    # Real HDL-64E conventions: non-uniform two-block beam table, sweep
    # start near the rear (~pi) — what the CLI's --kitti-root path assumes.
    fx = fixtures.make_fixture(
        n_frames=args.frames, n_rings=args.rings, n_azimuth=args.azimuth,
        height=args.height, width=args.width, with_images=True,
        seed=args.seed, beam_elev=hdl64e_beam_elevations(args.rings),
        az_start=float(np.pi),
    )
    seq_dir = os.path.join(args.out, "sequences", args.seq)
    velo_dir = os.path.join(seq_dir, "velodyne")
    img_dir = os.path.join(seq_dir, "image_0")
    pose_dir = os.path.join(args.out, "poses")
    for d in (velo_dir, img_dir, pose_dir):
        os.makedirs(d, exist_ok=True)

    for i, scan in enumerate(fx.scans):
        scan.astype(np.float32).tofile(
            os.path.join(velo_dir, f"{i:06d}.bin"))
        img8 = np.clip(fx.images[i] * 255.0, 0, 255).astype(np.uint8)
        cv2.imwrite(os.path.join(img_dir, f"{i:06d}.png"), img8)

    with open(os.path.join(seq_dir, "calib.txt"), "w") as f:
        p_line = " ".join(f"{v:.12e}" for v in fx.P.reshape(-1))
        for name in ("P0", "P1", "P2", "P3"):
            f.write(f"{name}: {p_line}\n")
        tr = fx.T_cam_velo[:3].reshape(-1)
        f.write("Tr: " + " ".join(f"{v:.12e}" for v in tr) + "\n")
    with open(os.path.join(seq_dir, "times.txt"), "w") as f:
        for t in fx.times:
            f.write(f"{t:.6e}\n")
    kitti.write_poses(os.path.join(pose_dir, f"{args.seq}.txt"),
                      fx.gt_poses_cam)
    print(f"wrote {args.frames} frames to {seq_dir}")


if __name__ == "__main__":
    main()
