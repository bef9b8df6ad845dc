"""Multi-host config-5: sequences sharded across processes (SURVEY.md §5).

The reference is strictly single-process; the one honest distributed axis of
this workload is sequence-level data parallelism (SURVEY.md §2 parallelism
table): KITTI sequences are fully independent, so a multi-host run shards the
sequence batch over a global mesh whose devices span processes — collectives
only appear if a cross-sequence aggregate is requested, and then ride the
mesh (ICI within a host, DCN across hosts) via one ``jnp.mean`` under jit.

Usage (one process per host, standard JAX multi-process convention):

    jax.distributed.initialize(coordinator, n_processes, process_id)
    poses, diag = run_sequences_multihost(local_scans, local_masks, cfg)

Each process feeds only its local sequences; results come back for the local
shard.  Tested with two CPU processes x 4 fake devices each
(``tests/integration/test_multihost.py``) — the standard JAX way to validate
multi-host programs without a cluster.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from velo_tpu.config import VeloConfig
from velo_tpu.pipeline import batch as batch_mod
from velo_tpu.pipeline import odometry


def run_sequences_multihost(scans_local: np.ndarray, masks_local: np.ndarray,
                            cfg: VeloConfig,
                            images_local: np.ndarray | None = None,
                            cam=None, with_global_cost: bool = False):
    """Run the global sequence batch; this process contributes its shard.

    Args:
      scans_local: (B_local, F, N_MAX, 4) — this process's sequences.
      masks_local: (B_local, F, N_MAX) bool.
      images_local: (B_local, F, H, W) when ``cfg.use_vision``.
      with_global_cost: also return the cross-host mean final solve cost
        (exercises a DCN collective; odometry itself needs none).

    Returns:
      (poses (B_local, F, 4, 4), diag dict of (B_local, F) arrays
       [, global_cost float]) — the local shard of the global result.
    """
    if cfg.use_vision and (images_local is None or cam is None):
        raise ValueError("cfg.use_vision requires images_local and cam")
    devs = jax.devices()  # global device list, all processes
    mesh = Mesh(np.array(devs), axis_names=("seq",))
    sh = NamedSharding(mesh, P("seq"))
    repl = NamedSharding(mesh, P())

    def _global(x):
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    B_local = scans_local.shape[0]
    B = B_local * jax.process_count()
    carry0 = odometry.init_carry(cfg)
    bcarry = jax.tree.map(
        lambda x: _global(np.broadcast_to(
            np.asarray(x)[None], (B_local,) + np.shape(x))), carry0)
    inputs = [_global(scans_local), _global(masks_local)]
    if cfg.use_vision:
        inputs.append(_global(np.asarray(images_local, np.float32)))

    run = batch_mod.batched_run_scan(cfg, cam=cam if cfg.use_vision else None)

    def wrapped(bc, *ins):
        final, out = run(bc, *ins)
        if with_global_cost:
            return final, out, jnp.mean(out.cost)
        return final, out

    out_sh = (sh, sh, repl) if with_global_cost else (sh, sh)
    jitted = jax.jit(wrapped, in_shardings=(sh,) * (1 + len(inputs)),
                     out_shardings=out_sh)
    # Compile before touching any collective, then rendezvous through the
    # coordination service: Gloo's cross-process context init has a hard
    # ~30 s deadline, and per-process compile times easily diverge by more
    # than that under load.  AOT-compiling first bounds the skew at the
    # first collective to the (millisecond) dispatch gap.
    compiled = jitted.lower(bcarry, *inputs).compile()
    if jax.process_count() > 1:
        try:
            from jax._src import distributed as _dist

            _dist.global_state.client.wait_at_barrier(
                "velo_multihost_warm", timeout_in_ms=600_000)
        except Exception:  # pragma: no cover - barrier API unavailable
            pass
    res = compiled(bcarry, *inputs)
    out = res[1]
    jax.block_until_ready(out.T_w)

    def _local(arr):
        """Reassemble this process's (B_local, ...) block from its shards."""
        shards = sorted(
            ((s.index[0].start, np.asarray(s.data))
             for s in arr.addressable_shards), key=lambda t: t[0])
        return np.concatenate([d for _, d in shards], axis=0)

    poses = _local(out.T_w)
    diag = {k: _local(getattr(out, k))
            for k in type(out)._fields if k != "T_w"}
    if with_global_cost:
        return poses, diag, float(res[2])
    return poses, diag
