"""Edge/planar feature selection (SURVEY.md C5) — fixed-budget, sector-even.

The reference walks each ring serially: sort a sector by curvature, greedily
pick the top points, suppress each pick's +/-5 neighbors, repeat.  That serial
NMS is hostile to SIMD hardware, so the TPU-native design replaces it with an
equivalent *parallel* spacing rule: an edge candidate must be the strict local
maximum of curvature within its +/-h window (planar: local minimum).  Two
local maxima of an 2h+1 window are necessarily > h apart, so the spacing
guarantee of the greedy NMS is preserved, and the whole selection becomes
masked ``top_k`` per (ring, sector) block — one batched op for all 64 rings.

Outputs are fixed-size ``(K, 3)`` tensors with validity masks; K is the
static per-config budget (rings * sectors * per-sector count).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from velo_tpu.config import LidarConfig
from velo_tpu.lidar.curvature import CurvatureResult
from velo_tpu.lidar.rangeimage import RangeImage

_NEG = -1e30


class ScanFeatures(NamedTuple):
    edges: jnp.ndarray  # (K_edge, 3)
    edge_mask: jnp.ndarray  # (K_edge,)
    planars: jnp.ndarray  # (K_planar, 3)
    planar_mask: jnp.ndarray  # (K_planar,)
    edge_phase: jnp.ndarray  # (K_edge,) sweep phase of each feature
    planar_phase: jnp.ndarray  # (K_planar,)
    edge_ring: jnp.ndarray  # (K_edge,) int32 laser ring of each feature
    planar_ring: jnp.ndarray  # (K_planar,)


def _local_extremum(curv: jnp.ndarray, h: int, mode: str) -> jnp.ndarray:
    """Strict local max (or min) of curvature along azimuth within +/-h."""
    best = curv
    is_ext = jnp.ones(curv.shape, dtype=bool)
    for j in range(1, h + 1):
        for s in (j, -j):
            nb = jnp.roll(curv, s, axis=1)
            if mode == "max":
                is_ext = is_ext & (best >= nb)
            else:
                is_ext = is_ext & (best <= nb)
    return is_ext


def _extract_topk(s: jnp.ndarray, k: int):
    """Descending top-k along the last axis by k max-extraction passes.

    ``jax.lax.top_k`` lowers to a full sort of every (ring, sector) lane on
    TPU (~0.2 ms per call at 64x8x256 in the device trace); for the tiny
    per-sector budgets here (k <= 12), k passes of max/argmax/mask-out are
    ~10x cheaper and produce the identical (sorted, first-index-on-ties)
    result.
    """
    iota = jax.lax.broadcasted_iota(jnp.int32, s.shape, s.ndim - 1)
    vals, idxs = [], []
    for _ in range(k):
        i = jnp.argmax(s, axis=-1)
        vals.append(jnp.max(s, axis=-1))
        idxs.append(i.astype(jnp.int32))
        s = jnp.where(iota == i[..., None], _NEG, s)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


def _sector_topk(score: jnp.ndarray, ok: jnp.ndarray, xyz: jnp.ndarray,
                 phase: jnp.ndarray, n_sectors: int, k: int):
    """Masked top-k per (ring, sector) -> picked points + masks, flattened.

    The pick itself is a one-hot within-sector contraction, not a gather:
    arbitrary-index gathers serialize on the TPU scalar unit (the four
    select_features gathers were part of the ~0.6 ms/frame main-program
    gather aggregate in the device trace), while the (R, S, k, ws) one-hot
    einsum is a few-MFLOP MXU pass.  HIGHEST precision keeps the selected
    f32 coordinates exact (one-hot weights are 0/1 in any dtype; the
    VALUES must not be truncated to bf16 — 0.4% of 50 m is 20 cm).
    """
    import jax

    R, W = score.shape
    ws = W // n_sectors
    s = jnp.where(ok, score, _NEG).reshape(R, n_sectors, ws)
    vals, idx = _extract_topk(s, k)  # (R, S, k) indices within sector
    picked_ok = vals > _NEG / 2
    onehot = (idx[..., None]
              == jnp.arange(ws, dtype=jnp.int32)).astype(jnp.float32)
    chan = jnp.concatenate([xyz, phase[..., None]], axis=-1)  # (R, W, 4)
    chan = chan.reshape(R, n_sectors, ws, 4)
    picked = jnp.einsum("rskw,rswc->rskc", onehot, chan,
                        precision=jax.lax.Precision.HIGHEST)
    pts = picked[..., :3].reshape(-1, 3)
    ph = picked[..., 3].reshape(-1)
    row = jnp.broadcast_to(
        jnp.arange(R, dtype=jnp.int32)[:, None, None], idx.shape)
    return pts, picked_ok.reshape(-1), ph, row.reshape(-1)


def select_features(ri: RangeImage, cr: CurvatureResult, cfg: LidarConfig,
                    target: bool = False) -> ScanFeatures:
    """Pick edge/planar features.

    ``target=False`` (default) picks the sparse "sharp/flat" query set.
    ``target=True`` picks the denser, looser-gated set the *next* frame will
    match against (the reference's sharp -> less-sharp asymmetry): bigger
    per-sector budgets, relaxed curvature gates, and no local-extremum
    spacing rule — density is what makes the neighbor line/plane fits tight.
    """
    h = cfg.curvature_halfwin
    mult = cfg.target_mult if target else 1
    edge_gate = cfg.edge_min_curv * (0.6 if target else 1.0)
    planar_gate = cfg.planar_max_curv * (2.0 if target else 1.0)

    edge_cand = cr.edge_ok & (cr.curv > edge_gate)
    planar_cand = cr.planar_ok & (cr.curv < planar_gate)
    if not target:
        edge_cand = edge_cand & _local_extremum(
            jnp.where(cr.scored, cr.curv, _NEG), h, "max"
        )
        planar_cand = planar_cand & _local_extremum(
            jnp.where(cr.scored, cr.curv, -_NEG), h, "min"
        )

    edges, edge_mask, edge_phase, edge_ring = _sector_topk(
        cr.curv, edge_cand, ri.xyz, ri.phase, cfg.n_sectors,
        cfg.edges_per_sector * mult,
    )
    planars, planar_mask, planar_phase, planar_ring = _sector_topk(
        -cr.curv, planar_cand, ri.xyz, ri.phase, cfg.n_sectors,
        cfg.planars_per_sector * mult,
    )
    # Zero out padded slots so downstream matmuls see benign values.
    edges = jnp.where(edge_mask[:, None], edges, 0.0)
    planars = jnp.where(planar_mask[:, None], planars, 0.0)
    return ScanFeatures(
        edges=edges, edge_mask=edge_mask, planars=planars,
        planar_mask=planar_mask, edge_phase=edge_phase,
        planar_phase=planar_phase, edge_ring=edge_ring,
        planar_ring=planar_ring,
    )
