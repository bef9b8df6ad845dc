"""Fixed-capacity feature track table (part of SURVEY.md C6/C7).

The reference keeps a variable-length vector of tracked corners, re-detecting
when the count drops.  The TPU-native equivalent is a static (K,) table with
a validity mask: each frame the KLT result updates positions, failed tracks free
their slots, and new grid-bucket corners are compacted into free slots —
skipping buckets already occupied by a live track so spacing is maintained.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from velo_tpu.config import VisionConfig
from velo_tpu.vision.corners import Corners


class TrackTable(NamedTuple):
    uv: jnp.ndarray  # (K, 2) current pixel positions
    active: jnp.ndarray  # (K,) live track mask
    age: jnp.ndarray  # (K,) int32 frames tracked
    prev_xyz_velo: jnp.ndarray  # (K, 3) landmark at previous frame (velo)
    has_depth: jnp.ndarray  # (K,) landmark depth valid
    depth_grad: jnp.ndarray  # (K,) |dt/duv| of the landmark's association
    # (m/px); drives inverse-variance reprojection weighting.  Only read
    # where has_depth, so replenished slots need no reset.


def empty_tracks(cfg: VisionConfig) -> TrackTable:
    K = cfg.k_tracks
    return TrackTable(
        uv=jnp.zeros((K, 2), jnp.float32),
        active=jnp.zeros((K,), bool),
        age=jnp.zeros((K,), jnp.int32),
        prev_xyz_velo=jnp.zeros((K, 3), jnp.float32),
        has_depth=jnp.zeros((K,), bool),
        depth_grad=jnp.zeros((K,), jnp.float32),
    )


def _bucket_of(uv: jnp.ndarray, cfg: VisionConfig) -> jnp.ndarray:
    bh = cfg.height // cfg.grid_rows
    bw = cfg.width // cfg.grid_cols
    by = jnp.clip(uv[..., 1].astype(jnp.int32) // bh, 0, cfg.grid_rows - 1)
    bx = jnp.clip(uv[..., 0].astype(jnp.int32) // bw, 0, cfg.grid_cols - 1)
    return by * cfg.grid_cols + bx


def replenish(table: TrackTable, corners: Corners,
              cfg: VisionConfig) -> TrackTable:
    """Fill free slots with new corners from unoccupied grid buckets."""
    K = cfg.k_tracks
    G = corners.uv.shape[0]
    n_buckets = cfg.grid_rows * cfg.grid_cols

    # Buckets already holding a live track are off limits (min-distance rule).
    occupied = jnp.zeros((n_buckets,), bool).at[
        _bucket_of(table.uv, cfg)
    ].max(table.active)
    cand_ok = corners.valid & ~occupied[_bucket_of(corners.uv, cfg)]

    # Compact candidates to the front, free slots to the front, zip them.
    free = ~table.active
    cand_rank = jnp.cumsum(cand_ok.astype(jnp.int32)) - 1  # (G,)
    free_idx = jnp.nonzero(free, size=K, fill_value=K)[0]  # (K,) padded
    n_free = jnp.sum(free.astype(jnp.int32))
    # Candidate i goes to slot free_idx[cand_rank[i]] if both in range.
    take = cand_ok & (cand_rank < n_free)
    slot = jnp.where(take, free_idx[jnp.clip(cand_rank, 0, K - 1)], K + 1)

    uv = table.uv.at[slot].set(corners.uv, mode="drop")
    active = table.active.at[slot].set(True, mode="drop")
    age = table.age.at[slot].set(0, mode="drop")
    has_depth = table.has_depth.at[slot].set(False, mode="drop")
    return table._replace(uv=uv, active=active, age=age, has_depth=has_depth)


def after_tracking(table: TrackTable, new_uv: jnp.ndarray,
                   ok: jnp.ndarray) -> TrackTable:
    """Apply a KLT result: move survivors, deactivate failures."""
    return table._replace(
        uv=jnp.where(ok[:, None], new_uv, table.uv),
        active=table.active & ok,
        age=jnp.where(ok, table.age + 1, 0),
    )
