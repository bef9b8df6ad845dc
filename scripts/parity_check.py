"""TPU vs CPU parity harness (SURVEY.md §4.2 item 4).

The axon tunnel tolerates only one live JAX client per process tree, so the
two backends run in separate subprocesses: each executes the identical
odometry program on the identical fixture and dumps poses; the parent
compares them within float32 tolerances.  Covers BOTH shipped modes:
LiDAR-only (configs 1-2) and fused (config 4, vision + prebin layout).

Usage: python scripts/parity_check.py [--frames 20] [--out PARITY.json]
       [--modes lidar,fused]
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import sys, os
sys.path.insert(0, %(repo)r)
import numpy as np
import jax
import jax.numpy as jnp
from velo_tpu.config import LidarConfig, VeloConfig, VisionConfig
from velo_tpu.geom import camera as cam_mod
from velo_tpu.io import fixtures, kitti
from velo_tpu.lidar import rangeimage as ri_mod
from velo_tpu.pipeline import odometry

frames = %(frames)d
fused = %(fused)r
fx = fixtures.make_fixture(n_frames=frames, n_rings=32, n_azimuth=1024,
                           with_images=fused, height=128, width=384,
                           speed=8.0, seed=3)
cfg = VeloConfig(lidar=LidarConfig(n_rings=32, n_azimuth=1024),
                 vision=VisionConfig(height=128, width=384, k_tracks=128,
                                     grid_cols=24),
                 use_vision=fused, use_map=True, n_max_points=32 * 1024,
                 prebin_host=fused)
if fused:
    binned = [ri_mod.bin_scan_host(s, cfg.lidar) for s in fx.scans]
    scans = jnp.asarray(np.stack([b[0] for b in binned]))
    masks = jnp.asarray(np.stack([b[1] for b in binned]))
    images = jnp.asarray(np.stack(fx.images), jnp.float32)
    cam = cam_mod.Camera(P=jnp.asarray(fx.P, jnp.float32),
                         T_cam_velo=jnp.asarray(fx.T_cam_velo, jnp.float32),
                         width=384, height=128)
    carry, out = jax.jit(lambda c, s, m, im: odometry.run_scan(
        c, s, m, cfg, images=im, cam=cam))(
            odometry.init_carry(cfg), scans, masks, images)
    poses = np.asarray(out.T_w)
else:
    seq = [kitti.pad_scan(s, cfg.n_max_points) for s in fx.scans]
    poses, diag = odometry.run_sequence_host(seq, cfg)
np.savez(%(out)r, poses=poses, gt=fx.gt_poses_velo,
         platform=np.asarray(jax.devices()[0].platform))
print("done", poses.shape, jax.devices()[0].platform)
"""


def run_child(platform: str, frames: int, out: str, fused: bool):
    env = dict(os.environ)
    if platform == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
        # The axon sitecustomize force-registers the TPU platform in every
        # interpreter; clearing its trigger is the reliable CPU switch.
        env["PALLAS_AXON_POOL_IPS"] = ""
    else:
        env.pop("JAX_PLATFORMS", None)
    code = _CHILD % {"repo": REPO, "frames": frames, "out": out,
                     "fused": fused}
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=3600)
    if r.returncode != 0:
        raise RuntimeError(f"{platform} child failed:\n{r.stdout}\n{r.stderr}")


def compare(frames: int, fused: bool):
    import numpy as np

    tag = "fused" if fused else "lidar"
    cpu_out, tpu_out = f"/tmp/parity_cpu_{tag}.npz", f"/tmp/parity_tpu_{tag}.npz"
    run_child("cpu", frames, cpu_out, fused)
    run_child("tpu", frames, tpu_out, fused)

    dc, dt_ = np.load(cpu_out), np.load(tpu_out)
    cpu, tpu = dc["poses"], dt_["poses"]
    plats = (str(dc["platform"]), str(dt_["platform"]))
    assert plats[0] == "cpu" and plats[1] != "cpu", (
        f"parity run did not span two platforms: {plats}")
    dt = np.linalg.norm(cpu[:, :3, 3] - tpu[:, :3, 3], axis=1)
    dR = np.asarray([
        np.degrees(np.arccos(np.clip(
            (np.trace(a[:3, :3].T @ b[:3, :3]) - 1) / 2, -1, 1)))
        for a, b in zip(cpu, tpu)
    ])
    return {
        "platforms": list(plats),
        "frames": int(len(cpu)),
        "max_trans_diff_m": round(float(dt.max()), 5),
        "max_rot_diff_deg": round(float(dR.max()), 5),
        # float32 + iterative ICP: backends legitimately diverge at the
        # ulp level and the solve amplifies it; parity means agreeing to
        # centimeters/hundredths of a degree over the whole run, not bits.
        "pass": bool(dt.max() < 0.05 and dR.max() < 0.1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--out", default=os.path.join(REPO, "PARITY.json"))
    ap.add_argument("--modes", default="lidar,fused")
    args = ap.parse_args()

    import subprocess as sp

    sha = sp.run(["git", "rev-parse", "--short", "HEAD"],
                 capture_output=True, text=True, cwd=REPO).stdout.strip()
    result = {"sha": sha, "ts": time.strftime("%Y-%m-%dT%H:%M:%S")}
    ok = True
    for mode in args.modes.split(","):
        result[mode] = compare(args.frames, fused=(mode == "fused"))
        ok &= result[mode]["pass"]
    result["pass"] = ok
    print(json.dumps(result))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
