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
import threading
import time

# Armed BEFORE the jax import: the axon sitecustomize registers the TPU
# backend at interpreter start, and a wedged tunnel can block there forever
# — a structured failure beats stalling the caller (driver) indefinitely.
# 180 s is generous for a healthy tunnel (first device contact is seconds);
# a wedge never recovers within any timeout, so fail fast.
_INIT_DONE = threading.Event()

# Partial-result state: completed modes land here so a mid-run wedge (e.g.
# the fused half dying after the lidar half measured) still yields a
# parsable one-line artifact instead of rc=2 with nothing.
_PARTIAL_FPS = {}
_PARTIAL_LOCK = threading.Lock()


def _emit_record(fps, partial):
    head = "fused" if "fused" in fps else "lidar"
    name = ("odometry_frames_per_sec" if head == "lidar"
            else "odometry_frames_per_sec_fused")
    record = {
        "metric": name,
        "value": round(fps[head], 2),
        "unit": "frames/s",
        "vs_baseline": round(fps[head] / BASELINE_FPS, 3),
    }
    for m, v in fps.items():
        record[f"{m}_fps"] = round(v, 2)
    if partial:
        record["partial"] = True
    print(json.dumps(record), flush=True)


def _init_watchdog(seconds: float):
    if not _INIT_DONE.wait(seconds):
        print(f"bench: backend init exceeded {seconds:.0f}s "
              "(axon tunnel wedged?); aborting", file=sys.stderr)
        os._exit(2)


threading.Thread(
    target=_init_watchdog,
    args=(float(os.environ.get("VELO_BENCH_INIT_TIMEOUT", "180")),),
    daemon=True,
).start()

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Fixture generation rides the accelerator (same process, same device —
# runs before any timed section): ~100x faster than the numpy raycast on
# this 1-core host.  Opt out with VELO_FIX_ACCEL=0.
os.environ.setdefault("VELO_FIX_ACCEL", "1")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from velo_tpu.config import LidarConfig, VeloConfig, VisionConfig  # noqa: E402
from velo_tpu.geom import camera as cam_mod  # noqa: E402
from velo_tpu.io import fixtures, kitti  # noqa: E402
from velo_tpu.pipeline import odometry  # noqa: E402

N_FRAMES = 60
RINGS, AZ = 64, 2048
IMG_H, IMG_W = 192, 640  # KITTI-like grayscale camera, full scale
# Default ("both") benches configs 1-2 (lidar) AND config 4 (fused, the
# vision-enhanced north-star pipeline) in one invocation so the driver
# artifact always records the namesake pipeline; VELO_BENCH_MODE=lidar|fused
# restricts to one mode for dev iteration.
MODE = os.environ.get("VELO_BENCH_MODE", "both")
BASELINE_FPS = 100.0


def cache_path(mode):
    # v2: host-pre-binned (R, W, 5) grids — the production loader layout
    # (rangeimage.bin_scan_host during async prefetch).
    return os.environ.get("VELO_BENCH_CACHE",
                          f"/tmp/velo_bench_frames_{mode}_v2.npz")


def get_frames(cfg, with_images, cache):
    if os.path.exists(cache):
        d = np.load(cache)
        if (d["scans"].shape[0] == N_FRAMES
                and d["scans"].shape[1] == cfg.lidar.n_rings
                and (not with_images or "images" in d)):
            return (d["scans"], d["masks"],
                    d["images"] if with_images else None,
                    d["P"], d["T_cam_velo"])
    from velo_tpu.lidar import rangeimage as ri_mod

    fx = fixtures.make_fixture(
        n_frames=N_FRAMES, n_rings=RINGS, n_azimuth=AZ,
        height=IMG_H, width=IMG_W, with_images=with_images, speed=8.0,
    )
    binned = [ri_mod.bin_scan_host(s, cfg.lidar) for s in fx.scans]
    scans = np.stack([b[0] for b in binned])  # (F, R, W, 5)
    masks = np.stack([b[1] for b in binned])  # (F, R, W)
    extra = {"images": fx.images} if with_images else {}
    np.savez_compressed(cache, scans=scans, masks=masks, P=fx.P,
                        T_cam_velo=fx.T_cam_velo, **extra)
    return scans, masks, (fx.images if with_images else None), fx.P, \
        fx.T_cam_velo


def apply_overrides(cfg, spec):
    """Shared "v:klt_iters_fb=2,s:lm_iters=4"-style field overrides
    (velo_tpu.config.apply_overrides — same syntax as longrun variants
    and `velo_tpu.cli --set`)."""
    from velo_tpu.config import apply_overrides as _ao

    return _ao(cfg, spec)


def bench_mode(mode):
    """Best-of-8 device-resident fps for one pipeline config."""
    fused = mode == "fused"
    cfg = VeloConfig(
        lidar=LidarConfig(n_rings=RINGS, n_azimuth=AZ),
        vision=VisionConfig(height=IMG_H, width=IMG_W),
        use_vision=fused,
        use_map=True,
        prebin_host=True,  # production loader layout (async host binning)
    )
    if os.environ.get("VELO_BENCH_OVERRIDES"):
        cfg = apply_overrides(cfg, os.environ["VELO_BENCH_OVERRIDES"])
    scans_np, masks_np, images_np, P, T_cam_velo = get_frames(
        cfg, fused, cache_path(mode))
    # Fixture generation above is host/device compute, not tunnel-liveness
    # signal — on a cold cache it alone can exceed the mode deadline (the
    # fused 60-frame render costs many minutes on a 1-core host without
    # VELO_FIX_ACCEL).  Restart the clock for the part the watchdog is
    # actually guarding: compile + device execution.
    with _PARTIAL_LOCK:
        _MODE_DEADLINE[0] = time.monotonic() + float(
            os.environ.get("VELO_BENCH_MODE_TIMEOUT", "900"))
    scans = jnp.asarray(scans_np)
    masks = jnp.asarray(masks_np)
    images = jnp.asarray(images_np, jnp.float32) if fused else None
    cam = cam_mod.Camera(
        P=jnp.asarray(P, jnp.float32),
        T_cam_velo=jnp.asarray(T_cam_velo, jnp.float32),
        width=IMG_W, height=IMG_H,
    ) if fused else None

    # Tile the frame block: the axon tunnel adds a large fixed cost per
    # execute (50-300 ms with random spikes), so the dispatch must be long
    # enough to amortize it — KITTI seq 00 is 4541 frames, so even a
    # 480-frame device-resident dispatch is conservative for the production
    # serving shape.  VELO_BENCH_FRAMES sets the dispatch length.
    reps = max(1, int(os.environ.get("VELO_BENCH_FRAMES", "480")) // N_FRAMES)
    scans = jnp.concatenate([scans] * reps)
    masks = jnp.concatenate([masks] * reps)
    if fused:
        images = jnp.concatenate([images] * reps)
    n_total = N_FRAMES * reps

    if fused:
        run = jax.jit(
            lambda c, s, m, im: odometry.run_scan(c, s, m, cfg, images=im,
                                                  cam=cam),
            donate_argnums=(0,),
        )
        args = lambda: (odometry.init_carry(cfg), scans, masks, images)
    else:
        run = jax.jit(
            lambda c, s, m: odometry.run_scan(c, s, m, cfg),
            donate_argnums=(0,),
        )
        args = lambda: (odometry.init_carry(cfg), scans, masks)

    # Warmup / compile.
    carry, out = run(*args())
    jax.block_until_ready(out.T_w)

    best = float("inf")
    for _ in range(8):
        t0 = time.perf_counter()
        carry, out = run(*args())
        jax.block_until_ready(out.T_w)
        best = min(best, time.perf_counter() - t0)
        # Refine the partial record after EVERY rep: the first timed rep
        # lands seconds after warmup, so a wedge/deadline anywhere in the
        # best-of-8 loop (or in a later mode) still yields a provisional
        # fps for this mode instead of rc=2 with nothing (BENCH_r04's
        # failure shape).
        with _PARTIAL_LOCK:
            _PARTIAL_FPS[mode] = n_total / best
    return n_total / best


def _mode_watchdog():
    """If a mode wedges mid-run (tunnel death AFTER init), print whatever
    modes already completed as a partial record and bail.  Deadline is per
    bench_mode call (main resets the timer), sized for a cold compile of
    the full fused step graph (1-10 min without the persistent cache)."""
    while True:
        with _PARTIAL_LOCK:
            remaining = _MODE_DEADLINE[0] - time.monotonic()
            done = dict(_PARTIAL_FPS)
        if _ALL_DONE.is_set():
            return
        if remaining <= 0:
            if done:
                _emit_record(done, partial=True)
                print("bench: mode deadline exceeded (tunnel wedged "
                      "mid-run?); emitted partial record", file=sys.stderr)
                os._exit(0)
            print("bench: mode deadline exceeded with no completed modes; "
                  "aborting", file=sys.stderr)
            os._exit(2)
        time.sleep(min(remaining + 0.5, 10.0))


_MODE_DEADLINE = [float("inf")]
_ALL_DONE = threading.Event()


def main():
    jax.devices()  # force backend init under the import-time watchdog
    import jax.numpy as _jnp

    (_jnp.ones((8, 8)) @ _jnp.ones((8, 8))).block_until_ready()
    _INIT_DONE.set()
    modes = ["lidar", "fused"] if MODE == "both" else [MODE]
    per_mode = float(os.environ.get("VELO_BENCH_MODE_TIMEOUT", "900"))
    threading.Thread(target=_mode_watchdog, daemon=True).start()
    failed = False
    for m in modes:
        with _PARTIAL_LOCK:
            _MODE_DEADLINE[0] = time.monotonic() + per_mode
        try:
            v = bench_mode(m)
        except Exception as e:  # e.g. a kernel lowering error under an
            # experimental VELO_BENCH_OVERRIDES config: the OTHER mode's
            # (or this mode's provisional) fps must still reach the
            # artifact instead of propagating to rc!=0 with no record.
            failed = True
            print(f"bench: mode {m} failed: {e!r}", file=sys.stderr)
            continue
        with _PARTIAL_LOCK:
            _PARTIAL_FPS[m] = v
    _ALL_DONE.set()
    # Headline = the fused (vision-enhanced, config-4) pipeline when
    # measured — that is the north-star workload; the LiDAR-only number
    # rides along as an extra key either way.
    if _PARTIAL_FPS:
        # rc=0 whenever a record was emitted (matching the watchdog's
        # partial-emit path): the JSON line itself carries partial=True.
        _emit_record(dict(_PARTIAL_FPS), partial=failed)
    else:
        sys.exit(2)


if __name__ == "__main__":
    main()
