"""Fixed-capacity local feature map (SURVEY.md C11).

The reference accumulates recent edge/planar clouds into a PCL local map and
bounds its density with VoxelGrid downsampling.  The TPU-native design is a
*ring-buffer tensor* of static capacity C:

  * insert: valid new points are compacted (stable cumsum positions) and
    scattered over the oldest slots; invalid lanes are dropped via the
    scatter's out-of-bounds ``mode="drop"`` — no dynamic shapes anywhere;
  * density bound: periodic voxel dedup mask (sort + segment-first);
  * locality: points farther than ``crop_radius`` from the current pose are
    masked out (and their slots eventually recycled by the ring cursor).

The map lives in the world frame; queries re-center the voxel grid on the
current pose so packed voxel keys stay within their +/-511-cell window.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from velo_tpu.mapping import voxel_hash


class LocalMap(NamedTuple):
    pts: jnp.ndarray  # (C, 3) world-frame feature points
    mask: jnp.ndarray  # (C,) validity
    cursor: jnp.ndarray  # scalar int32 ring-buffer write head


def empty_map(capacity: int) -> LocalMap:
    return LocalMap(
        pts=jnp.zeros((capacity, 3), jnp.float32),
        mask=jnp.zeros((capacity,), bool),
        cursor=jnp.int32(0),
    )


def insert(m: LocalMap, new_pts: jnp.ndarray, new_mask: jnp.ndarray) -> LocalMap:
    """Scatter valid new points over the oldest ring-buffer slots."""
    C = m.pts.shape[0]
    # Compacted target slot for each valid lane; invalid lanes go out of
    # bounds and are dropped by the scatter.
    offs = jnp.cumsum(new_mask.astype(jnp.int32)) - 1
    pos = jnp.where(new_mask, (m.cursor + offs) % C, C + 1)
    pts = m.pts.at[pos].set(new_pts, mode="drop")
    mask = m.mask.at[pos].set(True, mode="drop")
    cursor = (m.cursor + jnp.sum(new_mask.astype(jnp.int32))) % C
    return LocalMap(pts=pts, mask=mask, cursor=cursor)


def maintain(m: LocalMap, center: jnp.ndarray, cfg_voxel: float,
             crop_radius: float) -> LocalMap:
    """Voxel dedup + distance crop (both pure mask updates)."""
    d = jnp.linalg.norm(m.pts - center[None, :], axis=-1)
    mask = m.mask & (d < crop_radius)
    mask = voxel_hash.voxel_downsample(m.pts, mask, cfg_voxel, center=center)
    return LocalMap(pts=m.pts, mask=mask, cursor=m.cursor)


def to_grid(m: LocalMap, center: jnp.ndarray, voxel_size: float) -> voxel_hash.VoxelGrid:
    """Queryable voxel grid of the current map contents, pose-centered."""
    return voxel_hash.build_grid(m.pts, m.mask, voxel_size, center=center)
