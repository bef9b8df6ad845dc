"""TPU-compile smoke lane for the Pallas kernels (hardware Mosaic lowering).

The unit suite runs the Pallas kernels in interpret mode on CPU by design
(tests/conftest.py forces CPU) — which can never catch a Mosaic lowering
rejection: round 4 shipped a klt_l0 kernel that passed all 122 tests yet
crashed on the chip (SMEM block-shape + HBM DMA tile-alignment rules).
This script compiles AND executes each kernel on the real TPU at production
shapes, printing one JSON line per kernel.  It is part of the revalidation
queue (scripts/r5_queue.sh); run it after any Pallas kernel change.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def smoke(name, fn):
    t0 = time.monotonic()
    try:
        fn()
        print(json.dumps({"kernel": name, "ok": True,
                          "secs": round(time.monotonic() - t0, 1)}))
        return True
    except Exception as e:  # noqa: BLE001 — report, don't crash the lane
        print(json.dumps({"kernel": name, "ok": False,
                          "error": repr(e)[:300],
                          "secs": round(time.monotonic() - t0, 1)}))
        return False


def klt_l0():
    import jax
    import jax.numpy as jnp

    from velo_tpu.config import VisionConfig
    from velo_tpu.pallas import klt_l0 as k

    H, W, K = 192, 640, 256  # production fused-pipeline shapes
    rng = np.random.default_rng(0)
    prev = jnp.asarray(rng.random((H, W)).astype(np.float32))
    cur = jnp.asarray(rng.random((H, W)).astype(np.float32))
    uv = jnp.asarray(
        np.stack([rng.uniform(20, W - 20, K), rng.uniform(16, H - 16, K)],
                 axis=1).astype(np.float32))
    cfg = VisionConfig()
    uv_o, ok = jax.jit(
        lambda p, c, a, b: k.track_level0(p, c, a, b, cfg, iters=8)
    )(prev, cur, uv, uv)
    uv_o.block_until_ready()
    assert np.asarray(ok).sum() > K // 2, "most interior tracks must survive"


def dist_topk():
    import jax
    import jax.numpy as jnp

    from velo_tpu.pallas import dist_topk as dt

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 10, (1024, 3)).astype(np.float32))
    t = jnp.asarray(rng.normal(0, 10, (16384, 3)).astype(np.float32))
    m = jnp.ones(t.shape[0], bool)
    d2, idx = jax.jit(
        lambda tt, mm, qq: dt.dist_topk(tt, mm, qq, k=16, bin_factor=32)
    )(t, m, q)
    jax.block_until_ready(idx)


if __name__ == "__main__":
    import jax

    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          file=sys.stderr)
    ok = smoke("klt_l0", klt_l0)
    ok &= smoke("dist_topk", dist_topk)
    sys.exit(0 if ok else 1)
