"""Fused distance + binned top-k Pallas kernel (candidate preselection).

Replaces ``approx_max_k`` over an MXU distance matmul for the per-frame
global candidate searches (SURVEY.md C9).  The XLA pipeline
(``dot_general`` -> ``approx_top_k``) evaluates the Q x N distance field on
the *vector* unit inside ApproxTopK's reduction fusion (~0.8 ms at
2048x32768 in the device trace) and then sorts ~Q x N/16 survivors
(~0.6 ms).  This kernel instead:

  1. ranks by the MXU matmul ``s = [q|1] @ [-2t | t2]^T`` (d2 = s + |q|^2,
     and the per-query offset |q|^2 cannot change the ranking);
  2. reduces each N-tile to per-bin (min, argmin) with B-way *strided*
     binning entirely in VMEM — one pass over the distance field, never
     materialized to HBM;
  3. extracts the top-k bins per query with k vectorized min/argmin passes
     (k=16 << NB, so extraction beats any sort).

Strided binning (element j of a tile goes to bin ``j mod NBt``) keeps
buffer-adjacent points in different bins; buffer adjacency is exactly where
spatial neighbors concentrate (the local map is sorted by voxel id after
maintenance), so the collision-recall loss stays at the few-per-mille level
of the ApproxTopK path it replaces.

Approximation contract: per query, a true top-k member is lost only when two
of them land in the same bin (expected ~C(k,2)/NB collisions); identical in
kind to ``approx_max_k(recall_target=0.99)``, and downstream robust solves
are insensitive to a rarely-missed 16th neighbor.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30  # python float: jnp constants would be captured by the kernel
_TQ = 256  # queries per grid step


def _pick_tile(n: int) -> int:
    for tn in (4096, 3072, 2048, 1024, 512, 256):
        if n % tn == 0:
            return tn
    raise ValueError(f"N={n} must be a multiple of 256")


def _kernel(q_ref, m_ref, outd_ref, outi_ref, binv, bini, *, n, tn, nbt, k):
    """One Q-tile: bin-reduce all N tiles, then extract top-k bins."""
    q = q_ref[:]  # (TQ, 4)
    n_tiles = n // tn
    b_fold = tn // nbt  # B-way fold per tile
    for nt in range(n_tiles):
        mt = m_ref[:, nt * tn:(nt + 1) * tn]  # (4, TN)
        s = jax.lax.dot_general(
            q, mt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TQ, TN) on the MXU
        mn = s[:, 0:nbt]
        ag = jnp.zeros(mn.shape, jnp.int32)
        for i in range(1, b_fold):
            c = s[:, i * nbt:(i + 1) * nbt]
            take = c < mn
            mn = jnp.where(take, c, mn)
            ag = jnp.where(take, i, ag)
        lane = jax.lax.broadcasted_iota(jnp.int32, mn.shape, 1)
        gidx = nt * tn + ag * nbt + lane
        binv[:, nt * nbt:(nt + 1) * nbt] = mn
        bini[:, nt * nbt:(nt + 1) * nbt] = gidx

    vals = binv[:]  # (TQ, NB)
    idxs = bini[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 1)
    out_v, out_i = [], []
    for _ in range(k):
        pos = jnp.argmin(vals, axis=1)  # first index on ties
        out_v.append(jnp.min(vals, axis=1))
        hit = lane == pos[:, None]
        out_i.append(jnp.max(jnp.where(hit, idxs, -1), axis=1))
        vals = jnp.where(hit, _BIG, vals)
    outd_ref[:] = jnp.stack(out_v, axis=1)
    outi_ref[:] = jnp.stack(out_i, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "bin_factor", "interpret"))
def dist_topk(targets: jnp.ndarray, tmask: jnp.ndarray,
              queries: jnp.ndarray, k: int = 16, bin_factor: int = 16,
              interpret: bool = False):
    """Approximate k-nearest targets for every query.

    Args:
      targets: (N, 3) float32, N a multiple of 256.
      tmask: (N,) bool; masked targets rank last (d2 ~ 1e30).
      queries: (Q, 3) float32; Q padded to a multiple of 256 internally.
      k: neighbors per query.
      bin_factor: B-way reduction (recall ~ 1 - C(k,2)/ (N/B) / k).

    Returns:
      (d2 (Q, k) float32, idx (Q, k) int32) — squared distances ascending.
    """
    n = targets.shape[0]
    q_n = queries.shape[0]
    tn = _pick_tile(n)
    nbt = tn // bin_factor
    nb = n // bin_factor
    assert nbt * bin_factor == tn and k <= nb

    t2 = jnp.sum(targets * targets, axis=-1)
    m = jnp.concatenate(
        [-2.0 * targets, (t2 + jnp.where(tmask, 0.0, _BIG))[:, None]],
        axis=-1,
    ).T  # (4, N)
    q_pad = (-q_n) % _TQ
    q_aug = jnp.concatenate(
        [queries, jnp.ones((q_n, 1), queries.dtype)], axis=-1
    )
    if q_pad:
        q_aug = jnp.pad(q_aug, ((0, q_pad), (0, 0)))
    qp = q_aug.shape[0]

    kern = functools.partial(_kernel, n=n, tn=tn, nbt=nbt, k=k)
    s_sel, idx = pl.pallas_call(
        kern,
        grid=(qp // _TQ,),
        in_specs=[
            pl.BlockSpec((_TQ, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TQ, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TQ, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qp, k), jnp.float32),
            jax.ShapeDtypeStruct((qp, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_TQ, nb), jnp.float32),
            pltpu.VMEM((_TQ, nb), jnp.int32),
        ],
        interpret=interpret,
    )(q_aug, m)
    s_sel = s_sel[:q_n]
    idx = jnp.maximum(idx[:q_n], 0)
    q2 = jnp.sum(queries * queries, axis=-1, keepdims=True)
    d2 = jnp.maximum(s_sel + q2, 0.0)
    return d2, idx
