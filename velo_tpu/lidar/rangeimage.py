"""Ring-organized range image (SURVEY.md C4, organization half).

The reference organizes points by laser ring with per-ring scan order; the
TPU-native equivalent scatters the (padded) unordered point cloud into a fixed
``(n_rings, n_azimuth)`` grid — ring from elevation angle, column from azimuth
phase — so every downstream stage (curvature windows, sector budgets, feature
picks) becomes a dense fixed-shape tensor op.

Cell conflicts (two points in one bin) are resolved *deterministically* in
favor of the nearest return using a single int32 scatter-min over a packed
``(quantized_range << IDX_BITS) | point_index`` key — no atomics, no
nondeterministic duplicate-index scatter.
"""
from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import numpy as np

import jax.numpy as jnp

from velo_tpu.config import LidarConfig

_IDX_BITS = 17  # supports up to 131072 raw points
_RANGE_Q = 100.0  # 1 cm quantization for the winner key
_RANGE_MAX_Q = (1 << 14) - 1  # 14 bits => 163 m at 1 cm


@lru_cache(maxsize=4)
def hdl64e_beam_elevations(n_rings: int = 64) -> np.ndarray:
    """Nominal HDL-64E beam elevations (rad), descending (ring 0 = top).

    Two blocks of 32 lasers: upper spans +2.0 to -8.33 deg (~1/3 deg apart),
    lower spans -8.83 to -24.33 deg (~1/2 deg apart).  Per-unit factory
    calibration deviates by fractions of a degree; nearest-beam assignment
    absorbs that.  For n_rings != 64 the pattern is linearly resampled.
    """
    upper = np.linspace(2.0, -8.33, 32)
    lower = np.linspace(-8.83, -24.33, 32)
    table = np.concatenate([upper, lower])
    if n_rings != 64:
        table = np.interp(np.linspace(0, 63, n_rings), np.arange(64), table)
    return np.deg2rad(table)


class RangeImage(NamedTuple):
    xyz: jnp.ndarray  # (R, W, 3) deskewed points
    rng: jnp.ndarray  # (R, W) range (0 where invalid)
    phase: jnp.ndarray  # (R, W) sweep phase of the stored point
    valid: jnp.ndarray  # (R, W) bool


def build_range_image(
    pts: jnp.ndarray,
    mask: jnp.ndarray,
    phase: jnp.ndarray,
    cfg: LidarConfig,
) -> RangeImage:
    """Scatter (N,3) points + validity into the fixed (R, W) ring grid.

    ``pts`` must already be deskewed; ``phase`` is the per-point sweep phase
    from :func:`velo_tpu.lidar.deskew.azimuth_phase` (reused as the column
    coordinate so the grid matches acquisition order even after deskew moved
    the Cartesian azimuth slightly).
    """
    R, W = cfg.n_rings, cfg.n_azimuth
    n = pts.shape[0]
    assert n <= (1 << _IDX_BITS), "raise _IDX_BITS for larger scans"

    rng = jnp.linalg.norm(pts, axis=-1)
    ok = mask & (rng >= cfg.min_range) & (rng <= cfg.max_range)
    safe_rng = jnp.where(ok, rng, 1.0)

    elev = jnp.arcsin(jnp.clip(pts[..., 2] / safe_rng, -1.0, 1.0))
    if cfg.ring_mode == "hdl64e":
        # Nearest beam in the nominal HDL-64E two-block elevation table —
        # real KITTI scans have non-uniform beam spacing (upper block ~1/3
        # deg, lower ~1/2 deg), which uniform interpolation misassigns by
        # several rings near the block boundary.
        beams = jnp.asarray(hdl64e_beam_elevations(R), jnp.float32)
        d = jnp.abs(elev[:, None] - beams[None, :])  # (N, R)
        ring = jnp.argmin(d, axis=1).astype(jnp.int32)
        gap = jnp.min(d, axis=1)
        # Reject points falling between beams (noise / other sensors).
        ok = ok & (gap < jnp.deg2rad(0.6))
    else:
        e_max = jnp.deg2rad(cfg.elev_max_deg)
        e_min = jnp.deg2rad(cfg.elev_min_deg)
        ring_f = (e_max - elev) / (e_max - e_min) * (R - 1)
        ring = jnp.clip(jnp.round(ring_f).astype(jnp.int32), 0, R - 1)
        # Reject points whose elevation is far outside the laser fan.
        ok = ok & (ring_f > -1.0) & (ring_f < R)

    col = jnp.clip((phase * W).astype(jnp.int32), 0, W - 1)

    # Deterministic nearest-return winner per cell via packed scatter-min.
    rq = jnp.clip(jnp.round(rng * _RANGE_Q), 0, _RANGE_MAX_Q).astype(jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)
    key = (rq << _IDX_BITS) | idx
    sentinel = jnp.int32(2**31 - 1)
    key = jnp.where(ok, key, sentinel)
    flat_cell = ring * W + col
    # Invalid points all target cell 0 with the sentinel key (harmless).
    flat_cell = jnp.where(ok, flat_cell, 0)

    table = jnp.full((R * W,), sentinel, dtype=jnp.int32)
    table = table.at[flat_cell].min(key)

    cell_valid = table != sentinel
    win_idx = jnp.where(cell_valid, table & ((1 << _IDX_BITS) - 1), 0)

    # One row-gather for all per-point channels: separate 1-D gathers of rng
    # and phase each cost ~1 ms/frame on the scalar unit (device trace), while
    # a single (N, 5) row gather moves contiguous lanes per index.
    vals = jnp.concatenate([pts, rng[:, None], phase[:, None]], axis=-1)
    win = jnp.where(cell_valid[:, None], vals[win_idx], 0.0)  # (R*W, 5)
    return RangeImage(xyz=win[:, :3].reshape(R, W, 3),
                      rng=win[:, 3].reshape(R, W),
                      phase=win[:, 4].reshape(R, W),
                      valid=cell_valid.reshape(R, W))
