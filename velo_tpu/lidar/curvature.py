"""LOAM-style ring curvature + pickability masks (SURVEY.md C4).

Curvature of point i over its +/-h ring neighbors, as *normalized chord
deviation*: with A = mean(p_{i-h} … p_{i-1}) and B = mean(p_{i+1} … p_{i+h}),

    c_i = dist(p_i, line(A, B)) / (||B - A|| / 2)

This plays the role of the reference's LOAM curvature score but with strictly
better invariance properties for a fixed-threshold pipeline: it is exactly 0
for any collinear window regardless of point spacing (so perspective
foreshortening on grazing walls cannot fake an edge), ~1 at a 90-degree
corner independent of range AND azimuth resolution, and averaging each
half-window suppresses per-point range noise.  One pair of thresholds
therefore works at every distance and sensor resolution.  The per-point C++ hot loop of the reference becomes
2h azimuth rolls of the dense (R, W) grid — pure VPU work that XLA fuses into
a handful of passes (a Pallas sliding-window kernel slots in behind the same
interface; see velo_tpu/pallas/).

Pickability masks reproduce the reference's gating:
  * points whose window contains an invalid cell are not scored;
  * points adjacent to a range discontinuity on the far side are "occluded"
    and can't be edges (they are artifacts of the viewpoint, not geometry);
  * near-parallel-beam points (both neighbors far in range) are dropped.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from velo_tpu.config import LidarConfig
from velo_tpu.lidar.rangeimage import RangeImage


class CurvatureResult(NamedTuple):
    curv: jnp.ndarray  # (R, W) normalized curvature (0 where unscored)
    scored: jnp.ndarray  # (R, W) curvature is meaningful here
    edge_ok: jnp.ndarray  # (R, W) allowed to become an edge feature
    planar_ok: jnp.ndarray  # (R, W) allowed to become a planar feature


def _roll_w(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Roll along the azimuth axis (wrap-around: the sweep is a closed ring)."""
    return jnp.roll(x, shift, axis=1)


def compute_curvature(ri: RangeImage, cfg: LidarConfig) -> CurvatureResult:
    h = cfg.curvature_halfwin
    xyz, rng, valid = ri.xyz, ri.rng, ri.valid

    sum_prev = jnp.zeros_like(xyz)
    sum_next = jnp.zeros_like(xyz)
    all_valid = valid
    for j in range(1, h + 1):
        sum_prev = sum_prev + _roll_w(xyz, j)
        sum_next = sum_next + _roll_w(xyz, -j)
        all_valid = all_valid & _roll_w(valid, j) & _roll_w(valid, -j)
    A = sum_prev / h
    B = sum_next / h
    u = B - A
    chord_sq = jnp.sum(u * u, axis=-1)
    pa = xyz - A
    cross = jnp.cross(pa, u)
    # dist(p, line) / (chord/2) = 2*||pa x u|| / ||u||^2
    curv = 2.0 * jnp.linalg.norm(cross, axis=-1) / jnp.maximum(chord_sq, 1e-8)

    safe_r = jnp.where(rng > 1e-6, rng, 1.0)
    scored = valid & all_valid

    # Sweep-seam exclusion: a curvature window that crosses the sweep wrap
    # mixes points captured ~0.1 s apart.  Deskew corrects their positions,
    # but the RAW-azimuth column order near the seam no longer matches the
    # spatial order (the sensor moved ~0.8 m at 8 m/s), so the chord fit is
    # scrambled — measured 20-30x inflated curvature medians in the ±h seam
    # band on BOTH grid layouts, with p95 above the edge gate: fake edge
    # features dead ahead (az_start=0) every frame.  Classic LOAM marks the
    # first/last h points of every scan line unpickable for the same
    # reason; the wrap-around roll formulation silently lost that.  A
    # window "crosses" when its phase span exceeds half a sweep.
    ph = ri.phase
    ph_min, ph_max = ph, ph
    for j in range(1, h + 1):
        ph_min = jnp.minimum(jnp.minimum(ph_min, _roll_w(ph, j)),
                             _roll_w(ph, -j))
        ph_max = jnp.maximum(jnp.maximum(ph_max, _roll_w(ph, j)),
                             _roll_w(ph, -j))
    scored = scored & ((ph_max - ph_min) <= 0.5)
    curv = jnp.where(scored, curv, 0.0)

    # Occlusion: a big range jump between neighbors means the far-side points
    # along the discontinuity are view-dependent artifacts.  Mark the h points
    # on the *far* side of each jump as not-edge-pickable.
    r_next = _roll_w(rng, -1)
    jump_next = jnp.abs(r_next - rng) > cfg.occlusion_range_jump * jnp.minimum(
        jnp.where(rng > 0, rng, 1e6), jnp.where(r_next > 0, r_next, 1e6)
    )
    far_is_self = rng > r_next  # i is the far side of the jump between i, i+1
    occluded = jnp.zeros_like(valid)
    far_left = jump_next & far_is_self  # far run is i, i-1, …, i-(h-1)
    far_right = jump_next & ~far_is_self  # far run is i+1, …, i+h
    for j in range(h):
        occluded = occluded | _roll_w(far_left, -j)
    for j in range(1, h + 1):
        occluded = occluded | _roll_w(far_right, j)

    # Parallel beam: if the range slope across both neighbors implies a
    # surface incidence steeper than atan(parallel_beam_tan), the returns are
    # unreliable (grazing hits / edge bleed).  The threshold scales with the
    # azimuth step so the rule is resolution-independent:
    # |dr| > r * dphi * tan(beta_max).
    r_prev = _roll_w(rng, 1)
    dphi = 2.0 * jnp.pi / rng.shape[1]
    lim = cfg.parallel_beam_tan * dphi * safe_r
    near_parallel = (jnp.abs(r_next - rng) > lim) & (jnp.abs(r_prev - rng) > lim)

    edge_ok = scored & ~occluded & ~near_parallel
    planar_ok = scored & ~near_parallel
    return CurvatureResult(curv=curv, scored=scored, edge_ok=edge_ok,
                           planar_ok=planar_ok)
