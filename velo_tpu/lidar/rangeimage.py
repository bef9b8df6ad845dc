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


def bin_scan_host(scan: np.ndarray, cfg: LidarConfig):
    """Host-side (numpy) pre-binning of a raw scan into the (R, W) grid.

    The device scatter-min + winner gather sit at the random-RMW hardware
    floor (~1.6 ms/frame combined in the device trace, the #1 and #2 ops of
    the LiDAR pipeline); binning is cheap, embarrassingly parallel host work
    that the async prefetch loader hides entirely behind the previous
    frame's solve.  Binning uses RAW elevation/range — physically closer to
    the true laser-id semantics than the deskewed elevation the device path
    uses (deskew happens on the grid afterwards, see
    :func:`range_image_from_grid`); at zero motion the two paths agree
    exactly (unit-tested).

    Returns (grid (R, W, 5) float32 [x, y, z, range, phase] of raw winner
    points, valid (R, W) bool).
    """
    R, W = cfg.n_rings, cfg.n_azimuth
    pts = np.asarray(scan[:, :3], np.float32)
    n = len(pts)
    rng = np.linalg.norm(pts, axis=-1)
    ok = (rng >= cfg.min_range) & (rng <= cfg.max_range)
    safe = np.where(ok, rng, 1.0)
    elev = np.arcsin(np.clip(pts[:, 2] / safe, -1.0, 1.0))
    if cfg.ring_mode == "hdl64e":
        beams = hdl64e_beam_elevations(R)
        d = np.abs(elev[:, None] - beams[None, :])
        ring = d.argmin(axis=1).astype(np.int64)
        ok = ok & (d.min(axis=1) < np.deg2rad(0.6))
    else:
        e_max = np.deg2rad(cfg.elev_max_deg)
        e_min = np.deg2rad(cfg.elev_min_deg)
        ring_f = (e_max - elev) / (e_max - e_min) * (R - 1)
        ring = np.clip(np.round(ring_f), 0, R - 1).astype(np.int64)
        ok = ok & (ring_f > -1.0) & (ring_f < R)
    az = np.arctan2(pts[:, 1], pts[:, 0])
    phase = np.mod(cfg.az_start - az, 2.0 * np.pi) / (2.0 * np.pi)
    col = np.clip((phase * W).astype(np.int64), 0, W - 1)

    # Same deterministic nearest-return winner rule as the device path.
    rq = np.clip(np.round(rng * _RANGE_Q), 0, _RANGE_MAX_Q).astype(np.int64)
    key = (rq << _IDX_BITS) | np.arange(n, dtype=np.int64)
    sentinel = np.int64(1) << 62
    table = np.full(R * W, sentinel, np.int64)
    flat = ring * W + col
    np.minimum.at(table, flat[ok], key[ok])
    valid = table != sentinel
    win_idx = np.where(valid, table & ((1 << _IDX_BITS) - 1), 0)
    vals = np.concatenate(
        [pts, rng[:, None].astype(np.float32),
         phase[:, None].astype(np.float32)], axis=-1)
    grid = np.where(valid[:, None], vals[win_idx], 0.0).astype(np.float32)
    return grid.reshape(R, W, 5), valid.reshape(R, W)


def range_image_from_grid(grid: jnp.ndarray, valid: jnp.ndarray,
                          delta_xi: jnp.ndarray, cfg: LidarConfig,
                          enabled: bool = True) -> RangeImage:
    """Deskew a host-pre-binned (R, W, 5) grid into a :class:`RangeImage`.

    The grid cells hold raw sensor-frame winner points + their sweep phase
    (:func:`bin_scan_host`); deskewing them is one dense shared-axis
    Rodrigues pass — no scatter, no gather.
    """
    from velo_tpu.lidar import deskew as deskew_mod

    R, W = cfg.n_rings, cfg.n_azimuth
    pts = grid[..., :3].reshape(-1, 3)
    phase = grid[..., 4].reshape(-1)
    if enabled:
        pts = deskew_mod.apply_scaled_exp(pts, phase, delta_xi)
    rng = jnp.linalg.norm(pts, axis=-1)
    vflat = valid.reshape(-1)
    pts = jnp.where(vflat[:, None], pts, 0.0)
    rng = jnp.where(vflat, rng, 0.0)
    return RangeImage(xyz=pts.reshape(R, W, 3), rng=rng.reshape(R, W),
                      phase=jnp.where(vflat, phase, 0.0).reshape(R, W),
                      valid=valid)
