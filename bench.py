"""Benchmark harness: odometry frames/sec on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where the
baseline is the BASELINE.json north-star target of 100 frames/sec/chip on
KITTI-scale input (~64 rings, full Velodyne scan, 1226-column range image).

No KITTI data exists in this environment, so frames come from the synthetic
simulator at full HDL-64E-like scale (64 rings, 131072-point padded scans) and
are cached on disk after first generation.  Timing excludes compilation and
host I/O: the frame chunk is device-resident and the whole sequence runs as
one ``lax.scan`` (the production batch path), timed with buffers donated.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from velo_tpu.config import LidarConfig, VeloConfig  # noqa: E402
from velo_tpu.io import fixtures, kitti  # noqa: E402
from velo_tpu.pipeline import odometry  # noqa: E402

N_FRAMES = 10
RINGS, AZ = 64, 2048
CACHE = os.environ.get("VELO_BENCH_CACHE", "/tmp/velo_bench_frames.npz")
BASELINE_FPS = 100.0


def get_frames(cfg):
    if os.path.exists(CACHE):
        d = np.load(CACHE)
        if d["scans"].shape[0] == N_FRAMES and d["scans"].shape[1] == cfg.n_max_points:
            return d["scans"], d["masks"]
    fx = fixtures.make_fixture(
        n_frames=N_FRAMES, n_rings=RINGS, n_azimuth=AZ, with_images=False,
        speed=8.0,
    )
    padded = [kitti.pad_scan(s, cfg.n_max_points) for s in fx.scans]
    scans = np.stack([p[0] for p in padded])
    masks = np.stack([p[1] for p in padded])
    np.savez_compressed(CACHE, scans=scans, masks=masks)
    return scans, masks


def main():
    cfg = VeloConfig(
        lidar=LidarConfig(n_rings=RINGS, n_azimuth=AZ),
        use_vision=False,  # LiDAR odometry throughput (north-star config)
        use_map=True,
    )
    scans_np, masks_np = get_frames(cfg)
    scans = jnp.asarray(scans_np)
    masks = jnp.asarray(masks_np)

    run = jax.jit(
        lambda c, s, m: odometry.run_scan(c, s, m, cfg), donate_argnums=(0,)
    )
    # Warmup / compile.
    carry = odometry.init_carry(cfg)
    carry, out = run(carry, scans, masks)
    jax.block_until_ready(out.T_w)

    best = float("inf")
    for _ in range(3):
        carry = odometry.init_carry(cfg)
        t0 = time.perf_counter()
        carry, out = run(carry, scans, masks)
        jax.block_until_ready(out.T_w)
        best = min(best, time.perf_counter() - t0)

    fps = N_FRAMES / best
    print(json.dumps({
        "metric": "odometry_frames_per_sec",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
