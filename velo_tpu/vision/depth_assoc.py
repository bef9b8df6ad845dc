"""LiDAR depth -> pixel association (SURVEY.md C8).

The reference projects the deskewed cloud into the camera and KD-tree-searches
projected points around each tracked feature, interpolating depth from the 3
nearest.  The TPU-native design replaces the KD-tree with a *pixel bucket
grid* (the image-space analog of the voxel hash):

  build:  project all LiDAR points; scatter-min a packed (depth, index) key
          into an (H/c x W/c) cell grid -> deterministic nearest-in-depth
          winner per cell;
  query:  gather the 3x3 cell neighborhood of each feature, pick the 3
          closest winners in pixel distance, fit the plane through their 3D
          points, and intersect the feature's viewing ray with it.

Gates mirror the reference: 3 valid neighbors, pixel distance bound, depth
spread bound (no interpolation across depth discontinuities), positive depth.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from velo_tpu.config import VisionConfig
from velo_tpu.geom import camera as cam_mod
from velo_tpu.geom import se3

_IDX_BITS = 17
_DEPTH_Q = 256.0  # ~4 mm quantization
_DEPTH_MAX_Q = (1 << 14) - 1


class DepthGrid(NamedTuple):
    xyz: jnp.ndarray  # (Cells, 3) winning point per cell, camera frame
    uv: jnp.ndarray  # (Cells, 2) its projected pixel position
    valid: jnp.ndarray  # (Cells,)
    rows: int
    cols: int


def build_depth_grid(pts_velo: jnp.ndarray, mask: jnp.ndarray,
                     cam: cam_mod.Camera, cfg: VisionConfig) -> DepthGrid:
    """Project the (deskewed) cloud and keep the nearest point per cell."""
    c = cfg.depth_grid_cell
    rows, cols = cfg.height // c, cfg.width // c
    n = pts_velo.shape[0]

    p_cam = se3.apply(cam.T_cam_velo[None], pts_velo[None])[0]
    uv, z, front = cam_mod.project_depth(cam.P, p_cam)
    ok = (
        mask & front
        & (uv[:, 0] >= 0) & (uv[:, 0] < cfg.width)
        & (uv[:, 1] >= 0) & (uv[:, 1] < cfg.height)
    )
    cell = (
        jnp.clip(uv[:, 1].astype(jnp.int32) // c, 0, rows - 1) * cols
        + jnp.clip(uv[:, 0].astype(jnp.int32) // c, 0, cols - 1)
    )
    zq = jnp.clip(jnp.round(z * _DEPTH_Q), 0, _DEPTH_MAX_Q).astype(jnp.int32)
    key = (zq << _IDX_BITS) | jnp.arange(n, dtype=jnp.int32)
    sentinel = jnp.int32(2**31 - 1)
    key = jnp.where(ok, key, sentinel)
    cell = jnp.where(ok, cell, 0)
    table = jnp.full((rows * cols,), sentinel, jnp.int32).at[cell].min(key)
    cell_ok = table != sentinel
    win = jnp.where(cell_ok, table & ((1 << _IDX_BITS) - 1), 0)
    return DepthGrid(
        xyz=jnp.where(cell_ok[:, None], p_cam[win], 0.0),
        uv=jnp.where(cell_ok[:, None], uv[win], -1e4),
        valid=cell_ok,
        rows=rows,
        cols=cols,
    )


def build_depth_grid_from_ri(ri, cam: cam_mod.Camera, cfg: VisionConfig,
                             az_start: float = 0.0,
                             half_fov: float = 0.9) -> DepthGrid:
    """Depth grid from the forward-facing slice of the range image.

    Scatter cost is proportional to update count; the raw-cloud path
    scatters all ~131k points although only the camera-facing quarter can
    land in the image (~1.1 ms/frame in the fused device trace).  The range
    image already resolved per-cell winners, so this takes the azimuth
    window around the camera axis (+x, phase ~0/1 under ``az_start=0``,
    wrapping) via two static column slices and scatters only those.

    ``half_fov`` is the azimuth half-window in radians (default ~52 deg,
    cushioning any KITTI-like camera).
    """
    R, W = ri.rng.shape
    # Phase of the camera axis (+x): azimuth 0.
    import numpy as _np

    phase0 = (az_start % (2 * _np.pi)) / (2 * _np.pi)
    w_half = max(1, int(round(half_fov / (2 * _np.pi) * W)))
    c0 = int(round(phase0 * W))
    cols = [(c0 - w_half) % W, c0]
    # Two static slices covering [c0-w_half, c0+w_half) with wraparound.
    xs, vs = [], []
    for start in cols:
        if start + w_half <= W:
            sl = slice(start, start + w_half)
            xs.append(ri.xyz[:, sl])
            vs.append(ri.valid[:, sl])
        else:  # wraps: split
            a = W - start
            xs.append(jnp.concatenate(
                [ri.xyz[:, start:], ri.xyz[:, :w_half - a]], axis=1))
            vs.append(jnp.concatenate(
                [ri.valid[:, start:], ri.valid[:, :w_half - a]], axis=1))
    pts = jnp.concatenate(xs, axis=1).reshape(-1, 3)
    mask = jnp.concatenate(vs, axis=1).reshape(-1)
    return build_depth_grid(pts, mask, cam, cfg)


class DepthResult(NamedTuple):
    xyz_cam: jnp.ndarray  # (K, 3) feature landmark in the camera frame
    depth: jnp.ndarray  # (K,) projective depth
    ok: jnp.ndarray  # (K,)
    grad: jnp.ndarray  # (K,) |dt/duv| depth sensitivity (m/px; 0 where !ok)


def associate(grid: DepthGrid, feat_uv: jnp.ndarray, feat_mask: jnp.ndarray,
              cam: cam_mod.Camera, cfg: VisionConfig) -> DepthResult:
    """Interpolate LiDAR depth at tracked feature pixels (plane through 3NN)."""
    c = cfg.depth_grid_cell
    rows, cols = grid.rows, grid.cols
    fr = jnp.clip(feat_uv[:, 1].astype(jnp.int32) // c, 0, rows - 1)
    fc = jnp.clip(feat_uv[:, 0].astype(jnp.int32) // c, 0, cols - 1)

    cand_uv, cand_xyz, cand_ok = [], [], []
    s = cfg.depth_search_cells
    for dy in range(-s, s + 1):
        for dx in range(-s, s + 1):
            r = jnp.clip(fr + dy, 0, rows - 1)
            cc = jnp.clip(fc + dx, 0, cols - 1)
            idx = r * cols + cc
            cand_uv.append(grid.uv[idx])
            cand_xyz.append(grid.xyz[idx])
            cand_ok.append(grid.valid[idx])
    uv9 = jnp.stack(cand_uv, axis=1)  # (K, (2s+1)^2, 2)
    xyz9 = jnp.stack(cand_xyz, axis=1)
    ok9 = jnp.stack(cand_ok, axis=1)

    d2 = jnp.sum((uv9 - feat_uv[:, None, :]) ** 2, axis=-1)
    max_px = (s + 1.0) * c
    d2 = jnp.where(ok9, d2, jnp.inf)
    neg, top = jax.lax.top_k(-d2, 3)
    near_ok = jnp.isfinite(-neg) & (-neg <= max_px * max_px)
    p3 = jnp.take_along_axis(xyz9, top[..., None], axis=1)  # (K, 3, 3)

    # Depth-spread gate: do not interpolate across a discontinuity.
    z3 = p3[..., 2]
    spread = jnp.max(z3, axis=1) - jnp.min(z3, axis=1)
    ok = (
        feat_mask
        & jnp.all(near_ok, axis=1)
        & (spread < cfg.max_depth_spread)
    )

    # Plane through the 3 points; intersect the viewing ray.
    n = jnp.cross(p3[:, 1] - p3[:, 0], p3[:, 2] - p3[:, 0])
    nn = jnp.linalg.norm(n, axis=-1)
    ok = ok & (nn > 1e-6)
    n_hat = n / jnp.maximum(nn, 1e-6)[:, None]

    # Occlusion-edge gate: every valid candidate in the search window that
    # is PIXEL-near the feature must be coplanar with the 3-NN plane.  A
    # receding wall/ground has large depth spread but stays coplanar; an
    # occlusion edge (fence top in front of ground/house behind) does not —
    # and corners preferentially land on exactly those edges (measured
    # 12 m depth error passing every spread gate on the suburban world).
    plane_d = jnp.abs(jnp.einsum("kc,knc->kn", n_hat,
                                 xyz9 - p3[:, :1]))  # (K, N)
    near_px = ok9 & (d2 <= max_px * max_px)
    outlier = jnp.any(near_px & (plane_d > cfg.max_plane_outlier), axis=1)
    ok = ok & ~outlier
    ray = cam_mod.normalized_ray(cam, feat_uv)  # depth-1 ray
    denom = jnp.sum(n_hat * ray, axis=-1)
    ok = ok & (jnp.abs(denom) > 1e-4)
    # Grazing-incidence gate: with the ray nearly parallel to the plane,
    # sub-pixel track noise turns into meters of depth error (open scenes
    # put grazing ground under most features — the held-out suburban world
    # measured 18 %/100m drift from exactly this before the gate).
    cos_inc = jnp.abs(denom) / jnp.maximum(
        jnp.linalg.norm(ray, axis=-1), 1e-6)
    ok = ok & (cos_inc > cfg.min_plane_incidence)
    t = jnp.sum(n_hat * p3[:, 0], axis=-1) / jnp.where(
        jnp.abs(denom) > 1e-4, denom, 1.0
    )
    ok = ok & (t > 0.5) & (t < 120.0)
    # Depth-sensitivity gate (the physically right form of the grazing
    # test): how many meters of depth does ONE pixel of track error buy?
    # dt/du = -t * n_x / (fx * (n.ray)), dt/dv likewise.  Corridor walls
    # 30 m ahead sit at ~0.6 m/px (keep: they carry forward recovery);
    # horizon ground at 26 m is ~1.4 m/px (reject: sub-pixel noise becomes
    # meters).  Unlike a plain incidence-angle cut this scales with t.
    gu = t * n_hat[:, 0] / (cam.fx * denom)
    gv = t * n_hat[:, 1] / (cam.fy * denom)
    grad2 = gu * gu + gv * gv
    ok = ok & (grad2 < cfg.max_depth_grad ** 2)
    # The intersection must land within the depth span of the 3 supporting
    # points (+slack): outside it the plane extrapolates across geometry
    # the neighbors do not support (fence edge -> ground behind, terrace
    # steps).  The ray has z=1, so t IS the projective depth z.
    ok = ok & (t >= jnp.min(z3, axis=1) - cfg.depth_range_slack)
    ok = ok & (t <= jnp.max(z3, axis=1) + cfg.depth_range_slack)
    xyz = ray * t[:, None]
    return DepthResult(
        xyz_cam=jnp.where(ok[:, None], xyz, 0.0),
        depth=jnp.where(ok, t, 0.0),
        ok=ok,
        grad=jnp.where(ok, jnp.sqrt(grad2), 0.0),
    )
