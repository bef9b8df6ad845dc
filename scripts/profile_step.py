"""Device-profile the odometry step and print the top HLO ops.

Captures a jax.profiler trace of N bench-scale steps on the real chip,
then converts the xplane with xprof's converter and prints an op-level
time breakdown — the "device traces are the only truth" workflow from
round 1 (host-side timing of small jits is unreliable through the axon
tunnel).

Usage: python scripts/profile_step.py [--vision] [--frames 8]
"""
import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--vision", action="store_true")
    ap.add_argument("--logdir", default="/tmp/velo_profile")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from velo_tpu.pipeline import odometry

    # Same config + frame cache bench.py uses for this mode, so profiles
    # measure exactly the program the benchmark measures (ADVICE r2: the
    # old unsuffixed path could silently profile a stale round-1 cache).
    import bench as bench_mod
    from velo_tpu.config import LidarConfig, VeloConfig, VisionConfig
    from velo_tpu.geom import camera as cam_mod

    cfg = VeloConfig(
        lidar=LidarConfig(n_rings=bench_mod.RINGS,
                          n_azimuth=bench_mod.AZ),
        vision=VisionConfig(height=bench_mod.IMG_H, width=bench_mod.IMG_W),
        use_vision=args.vision,
        use_map=True,
        prebin_host=True,  # same production layout bench.py measures
    )
    if os.environ.get("VELO_BENCH_OVERRIDES"):
        # Trace exactly the config a VELO_BENCH_OVERRIDES probe measures.
        cfg = bench_mod.apply_overrides(cfg, os.environ["VELO_BENCH_OVERRIDES"])
    mode = "fused" if args.vision else "lidar"
    scans_np, masks_np, images_np, P, T_cam_velo = bench_mod.get_frames(
        cfg, args.vision, bench_mod.cache_path(mode))
    scans = jnp.asarray(scans_np)
    masks = jnp.asarray(masks_np)
    F = min(args.frames, scans.shape[0])
    if args.vision:
        images = jnp.asarray(images_np, jnp.float32)
        cam = cam_mod.Camera(
            P=jnp.asarray(P, jnp.float32),
            T_cam_velo=jnp.asarray(T_cam_velo, jnp.float32),
            width=bench_mod.IMG_W, height=bench_mod.IMG_H,
        )
        step = jax.jit(lambda c, s, m, im: odometry.step(
            c, s, m, cfg, image=im, cam=cam))
        frame_args = lambda i: (scans[i], masks[i], images[i])
    else:
        step = jax.jit(lambda c, s, m: odometry.step(c, s, m, cfg))
        frame_args = lambda i: (scans[i], masks[i])

    carry = odometry.init_carry(cfg)
    # Warmup / compile.
    carry, out = step(carry, *frame_args(0))
    jax.block_until_ready(out.T_w)

    os.makedirs(args.logdir, exist_ok=True)
    with jax.profiler.trace(args.logdir):
        for i in range(F):
            carry, out = step(carry, *frame_args(i % scans.shape[0]))
        jax.block_until_ready(out.T_w)

    xs = sorted(glob.glob(os.path.join(args.logdir, "**", "*.xplane.pb"),
                          recursive=True), key=os.path.getmtime)
    assert xs, f"no xplane under {args.logdir}"
    xplane = xs[-1]
    print(f"xplane: {xplane}", file=sys.stderr)

    from xprof.convert import raw_to_tool_data as conv

    names = conv.xspace_to_tool_names([xplane])
    print("tools:", names, file=sys.stderr)
    tool = "framework_op_stats" if "framework_op_stats" in str(names) \
        else "hlo_op_stats"
    data, _ = conv.xspace_to_tool_data([xplane], tool + "^",
                                       {"tqx": "out:csv;"})
    if isinstance(data, bytes):
        data = data.decode()
    print(data[:200], file=sys.stderr)
    import csv
    import io

    rows = list(csv.DictReader(io.StringIO(data)))
    if not rows:
        print(data)
        return
    # Find the time column.
    keys = rows[0].keys()
    tkey = next((k for k in keys if "total" in k.lower()
                 and "time" in k.lower() and "%" not in k), None)
    nkey = next((k for k in keys if k.lower() in ("operation", "op name",
                                                  "name")), None)
    print(f"columns: {list(keys)}", file=sys.stderr)
    agg = {}
    for r in rows:
        name = r.get(nkey, "?")
        try:
            t = float(r.get(tkey, 0) or 0)
        except ValueError:
            t = 0.0
        agg[name] = agg.get(name, 0.0) + t
    total = sum(agg.values())
    print(f"\n== top ops by {tkey} (total {total/1e3:.2f} ms over {F} steps,"
          f" {total/1e3/F:.2f} ms/step) ==")
    for name, t in sorted(agg.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"{t/1e3:9.3f} ms  {100*t/max(total,1e-9):5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
