"""TPU vs CPU parity harness (SURVEY.md §4.2 item 4).

The axon tunnel tolerates only one live JAX client per process tree, so the
two backends run in separate subprocesses: each executes the identical
odometry program on the identical fixture and dumps poses; the parent
compares them within float32 tolerances.

Usage: python scripts/parity_check.py [--frames 20] [--out PARITY.json]
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import sys, os
sys.path.insert(0, %(repo)r)
import numpy as np
import jax.numpy as jnp
from velo_tpu.config import LidarConfig, VeloConfig
from velo_tpu.io import fixtures, kitti
from velo_tpu.pipeline import odometry

frames = %(frames)d
fx = fixtures.make_fixture(n_frames=frames, n_rings=32, n_azimuth=1024,
                           with_images=False, speed=8.0, seed=3)
cfg = VeloConfig(lidar=LidarConfig(n_rings=32, n_azimuth=1024),
                 use_vision=False, use_map=True, n_max_points=32 * 1024)
seq = [kitti.pad_scan(s, cfg.n_max_points) for s in fx.scans]
poses, diag = odometry.run_sequence_host(seq, cfg)
import jax
np.savez(%(out)r, poses=poses, gt=fx.gt_poses_velo,
         platform=np.asarray(jax.devices()[0].platform))
print("done", poses.shape, jax.devices()[0].platform)
"""


def run_child(platform: str, frames: int, out: str):
    env = dict(os.environ)
    if platform == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
        # The axon sitecustomize force-registers the TPU platform in every
        # interpreter; clearing its trigger is the reliable CPU switch.
        env["PALLAS_AXON_POOL_IPS"] = ""
    else:
        env.pop("JAX_PLATFORMS", None)
    code = _CHILD % {"repo": REPO, "frames": frames, "out": out}
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=3600)
    if r.returncode != 0:
        raise RuntimeError(f"{platform} child failed:\n{r.stdout}\n{r.stderr}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--out", default=os.path.join(REPO, "PARITY.json"))
    args = ap.parse_args()

    import numpy as np

    cpu_out, tpu_out = "/tmp/parity_cpu.npz", "/tmp/parity_tpu.npz"
    run_child("cpu", args.frames, cpu_out)
    run_child("tpu", args.frames, tpu_out)

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
    result = {
        "platforms": list(plats),
        "frames": int(len(cpu)),
        "max_trans_diff_m": round(float(dt.max()), 5),
        "max_rot_diff_deg": round(float(dR.max()), 5),
        # float32 + iterative ICP: backends legitimately diverge at the
        # ulp level and the solve amplifies it; parity means agreeing to
        # centimeters/hundredths of a degree over the whole run, not bits.
        "pass": bool(dt.max() < 0.05 and dR.max() < 0.1),
    }
    print(json.dumps(result))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    return 0 if result["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
