"""MXU brute-force k-nearest-neighbors (the default correspondence engine).

A device-profile of the voxel-hash path showed the fundamental TPU issue:
arbitrary-index gathers (searchsorted steps, candidate fetches) execute on
the *scalar unit*, costing ~0.4-5 ms each — ~100 of them per frame dominated
the entire pipeline.  For the fixed-size target sets this pipeline guarantees
(previous-scan features <= ~6k, ring-buffer maps <= 32k), the systolic array
is strictly the better tool:

    d2(Q, N) = |q|^2 - 2 q . t^T + |t|^2        (one MXU matmul)
    neighbors = top_k(-d2, k)                   (vectorized, no gathers)

At Q=2048, N=32768 this is ~200 MFLOP — microseconds on the MXU — versus
tens of milliseconds of serialized scalar gathers.  The voxel-hash grid
(voxel_hash.py) remains the scalable engine for unbounded point sets and the
exactness oracle in tests; `SolverConfig.nn_engine` selects between them.

The distance matmul runs in float32 (bf16 would mis-rank near-ties at the
centimeter scales that decide correspondences).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class TargetSet(NamedTuple):
    """A fixed-shape NN target cloud (no build step needed)."""

    pts: jnp.ndarray  # (N, 3)
    mask: jnp.ndarray  # (N,)
    payload: jnp.ndarray  # (N, P) e.g. ring ids; may be (N, 0)


def make_targets(pts, mask, payload=None) -> TargetSet:
    if payload is None:
        payload = jnp.zeros((pts.shape[0], 0), jnp.int32)
    return TargetSet(pts=pts, mask=mask, payload=payload)


def knn(targets: TargetSet, queries: jnp.ndarray, qmask: jnp.ndarray,
        k: int, max_dist: float, approx: bool = False,
        approx_impl: str = "pallas"):
    """Masked kNN via one distance matmul + top_k.

    Same contract as voxel_hash.knn: returns (idx (Q,k) into targets.pts,
    dist (Q,k), valid (Q,k)); invalid lanes carry large distances.

    ``approx=True`` selects an approximate binned search (recall ~0.99) —
    the right trade for *candidate preselection*, where a rarely-missed
    16th-nearest neighbor cannot move a robust-loss solve, and the exact
    partial sort over large N dominates the device profile.  When shapes
    allow it this routes to the fused Pallas dist+top-k kernel
    (pallas/dist_topk.py), which never materializes the Q x N distance
    field; otherwise the ApproxTopK custom call over an MXU matmul.
    """
    t = targets.pts
    q = queries
    if (approx and approx_impl == "pallas" and t.shape[0] % 256 == 0
            and t.shape[0] >= 16 * k):
        from velo_tpu.pallas import dist_topk as dtk

        bf = 32 if t.shape[0] >= 16384 else 4
        d2, idx = dtk.dist_topk(
            t, targets.mask, q, k=k, bin_factor=bf,
            interpret=jax.default_backend() != "tpu",
        )
        d2 = jnp.where(qmask[:, None], d2, 1e30)
        valid = d2 <= max_dist * max_dist
        dist = jnp.sqrt(jnp.minimum(d2, 1e12))
        return idx, dist, valid
    # |q - t|^2 = |q|^2 - 2 q.t + |t|^2 ; the cross term is the MXU matmul.
    cross = lax.dot_general(
        q, t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )  # (Q, N)
    q2 = jnp.sum(q * q, axis=-1, keepdims=True)
    t2 = jnp.sum(t * t, axis=-1)
    d2 = q2 - 2.0 * cross + t2[None, :]
    big = jnp.float32(1e30)  # ApproxTopK dislikes inf; use a finite sentinel
    d2 = jnp.where(targets.mask[None, :], d2, big)
    d2 = jnp.where(qmask[:, None], d2, big)

    if approx and t.shape[0] >= 4 * k:
        neg, idx = jax.lax.approx_max_k(-d2, k, recall_target=0.99)
    else:
        neg, idx = jax.lax.top_k(-d2, k)
    neg = jnp.where(neg <= -big * 0.5, -jnp.inf, neg)
    dist2 = jnp.maximum(-neg, 0.0)  # matmul rounding can go slightly negative
    valid = jnp.isfinite(dist2) & (dist2 <= max_dist * max_dist)
    dist = jnp.sqrt(jnp.where(jnp.isfinite(dist2), dist2, 1e12))
    return idx, dist, valid
