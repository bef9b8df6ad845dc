"""Config-5: batched multi-sequence odometry, optionally sharded over a mesh.

The reference processes one KITTI sequence per process run; the batched
benchmark treats sequences as a leading batch dimension over the jitted
``run_scan`` (vmap), and — since sequences are fully independent — shards
that dimension over whatever devices exist (pure data parallelism over ICI;
no per-step collectives are needed or used).  This is the scaling story of
SURVEY.md §2's parallelism table made user-facing.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from velo_tpu.config import VeloConfig
from velo_tpu.pipeline import odometry


def batched_run_scan(cfg: VeloConfig, cam=None):
    """vmap'd device-resident sequence runner: (B,F,N,4) -> (B,F,4,4).

    With ``cam`` (shared calibration), the fused config-4 pipeline runs per
    sequence and the runner takes an extra (B,F,H,W) image stack.
    """

    if cam is None:
        def run(bcarry, bscans, bmasks):
            return jax.vmap(
                lambda c, s, m: odometry.run_scan(c, s, m, cfg)
            )(bcarry, bscans, bmasks)
    else:
        def run(bcarry, bscans, bmasks, bimages):
            return jax.vmap(
                lambda c, s, m, im: odometry.run_scan(c, s, m, cfg,
                                                      images=im, cam=cam)
            )(bcarry, bscans, bmasks, bimages)

    return run


def run_sequences(scans: np.ndarray, masks: np.ndarray, cfg: VeloConfig,
                  shard: bool = False, images: np.ndarray | None = None,
                  cam=None):
    """Run B independent sequences as one batched program.

    Args:
      scans: (B, F, N_MAX, 4) float32 raw padded points, or — with
        ``cfg.prebin_host`` (the production loader layout) —
        (B, F, R, W, 5) host-pre-binned grids.
      masks: (B, F, N_MAX) bool, or (B, F, R, W) with ``cfg.prebin_host``.
      shard: place the batch dimension over all local devices (B must be a
        multiple of the device count).  With one device this is a no-op.
      images: (B, F, H, W) float32 when ``cfg.use_vision`` (config-4 fused
        sequences); requires ``cam`` (shared pinhole calibration).

    Returns:
      (poses (B, F, 4, 4) numpy, diag dict of (B, F) arrays)
    """
    if cfg.use_vision and (images is None or cam is None):
        raise ValueError("cfg.use_vision requires images and cam")
    B = scans.shape[0]
    carry0 = odometry.init_carry(cfg)
    bcarry = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), carry0
    )
    run = batched_run_scan(cfg, cam=cam if cfg.use_vision else None)
    inputs = [jnp.asarray(scans), jnp.asarray(masks)]
    if cfg.use_vision:
        inputs.append(jnp.asarray(images, jnp.float32))

    if shard:
        devs = jax.devices()
        n = len(devs)
        if B % n:
            raise ValueError(f"batch {B} not divisible by {n} devices")
        mesh = Mesh(np.array(devs), axis_names=("seq",))
        sh = NamedSharding(mesh, P("seq"))
        bcarry = jax.device_put(bcarry, sh)
        inputs = [jax.device_put(x, sh) for x in inputs]
        run = jax.jit(run, in_shardings=(sh,) * (1 + len(inputs)),
                      out_shardings=(sh, sh))
    else:
        run = jax.jit(run)

    final, out = run(bcarry, *inputs)
    jax.block_until_ready(out.T_w)
    return np.asarray(out.T_w), {
        k: np.asarray(getattr(out, k))
        for k in type(out)._fields if k != "T_w"
    }
