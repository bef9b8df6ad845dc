"""Non-causal trajectory smoother: windowed scan-to-window-map refinement.

The forward odometry (``pipeline/odometry.py``) is strictly causal — each
pose sees only past scans, so correspondence-starved or turning episodes
leave a small bias that integrates into the long-run drift (the dominant
remaining error; BUILD_NOTES round-2 findings).  For the *batch* benchmark
(the reference's own setting: a recorded KITTI sequence evaluated offline,
SURVEY.md §3.4) a second, non-causal pass is legitimate and is the classic
accuracy lever the reference's LOAM lineage leaves on the table.

TPU-first formulation: given forward poses, every frame's refinement is
INDEPENDENT — frame i re-solves scan-to-map against a window map built from
the features of frames j ∈ [i-W, i+W] \\ {i} at their current pose
estimates.  That is a Jacobi sweep: all frames solve against the same pose
snapshot (``lax.map`` over frames — parallel semantics, no sequential
dependence), then poses update together; ``passes`` sweeps diffuse
constraints ~W frames per pass in BOTH time directions.  Everything is
fixed-shape: the window is a static ``2W+1`` slice of the (F, K, 3) feature
stack, padded with masked frames at the ends.

A third luxury of non-causality: features are deskewed with the *realized*
per-frame motion (log of the forward relative pose) instead of the forward
pass's constant-velocity prediction, so the window maps carry no
prediction-error distortion.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from velo_tpu.config import VeloConfig
from velo_tpu.geom import se3
from velo_tpu.lidar import deskew as deskew_mod
from velo_tpu.lidar import rangeimage as ri_mod
from velo_tpu.solve import icp


class FrameFeatures(NamedTuple):
    """Per-frame feature stacks (leading F dim), scan-local coordinates."""

    q_edges: jnp.ndarray  # (F, Ke, 3) sparse query edges
    q_edge_mask: jnp.ndarray
    q_planars: jnp.ndarray  # (F, Kp, 3)
    q_planar_mask: jnp.ndarray
    t_edges: jnp.ndarray  # (F, Kte, 3) dense map-target edges
    t_edge_mask: jnp.ndarray
    t_planars: jnp.ndarray  # (F, Ktp, 3)
    t_planar_mask: jnp.ndarray


def realized_deltas(poses: jnp.ndarray) -> jnp.ndarray:
    """(F, 6) per-frame motion xi_i = log(T_{i-1}^-1 T_i); frame 0 borrows
    frame 1's motion (the scan was taken moving; the forward pass had no
    estimate yet, but the smoother does)."""
    rel = jnp.einsum("fij,fjk->fik", se3.inv(poses[:-1]), poses[1:])
    xi = se3.log(rel)  # (F-1, 6) — se3.log is batched
    return jnp.concatenate([xi[:1], xi], axis=0)


@partial(jax.jit, static_argnames=("cfg",))
def collect_features(scans, masks, poses, cfg: VeloConfig) -> FrameFeatures:
    """Re-run the LiDAR front-end per frame, deskewed with realized motion."""
    from velo_tpu.pipeline.odometry import _extract_features_from_ri

    deltas = realized_deltas(poses)

    def body(_, frame):
        scan, mask, delta = frame
        if cfg.prebin_host:
            ri = ri_mod.range_image_from_grid(scan, mask, delta, cfg.lidar,
                                              enabled=cfg.use_deskew)
        else:
            pts3, phase = deskew_mod.deskew(
                scan[:, :3], delta, az_start=cfg.lidar.az_start,
                enabled=cfg.use_deskew)
            ri = ri_mod.build_range_image(pts3, mask, phase, cfg.lidar)
        q, t = _extract_features_from_ri(ri, cfg)
        out = (q.edges, q.edge_mask, q.planars, q.planar_mask,
               t.edges, t.edge_mask, t.planars, t.planar_mask)
        return 0, out

    _, stacked = jax.lax.scan(body, 0, (scans, masks, deltas))
    return FrameFeatures(*stacked)


def _window_targets(stack_p, mask_p, poses_p, i, w):
    """World-frame window cloud for frame i from padded (F+2w, K, 3) stacks;
    the center frame (j == i) is masked out so a frame never matches itself."""
    pts = jax.lax.dynamic_slice_in_dim(stack_p, i, 2 * w + 1, 0)
    msk = jax.lax.dynamic_slice_in_dim(mask_p, i, 2 * w + 1, 0)
    Tj = jax.lax.dynamic_slice_in_dim(poses_p, i, 2 * w + 1, 0)
    world = se3.apply(Tj, pts)  # (2w+1, K, 3)
    not_self = jnp.arange(2 * w + 1) != w
    msk = msk & not_self[:, None]
    K = pts.shape[1]
    return (world.reshape((2 * w + 1) * K, 3),
            msk.reshape((2 * w + 1) * K))


@partial(jax.jit, static_argnames=("cfg", "window", "passes", "iters"))
def refine_poses(poses, feats: FrameFeatures, cfg: VeloConfig,
                 window: int = 8, passes: int = 2,
                 iters: int | None = None, alpha: float = 0.7):
    """Damped-Jacobi smoothing sweeps; returns refined (F, 4, 4) poses.

    Reuses the forward pipeline's scan-to-map machinery and plausibility
    gates: a refinement that moves a pose farther than ``max_map_corr_*`` or
    comes from a degenerate system is rejected for that frame/pass.

    ``alpha`` under-relaxes each frame's correction (T_i · exp(α·ξ)).
    Undamped parallel updates oscillate: every frame solves against a
    snapshot that its neighbours are simultaneously abandoning, so a
    correction overshoots by roughly the neighbourhood's own correction.
    α≈0.7 converges monotonically at the solver's ~2-3 cm noise floor
    (measured from exact-GT starts) instead of ringing at ~10 cm.
    """
    sc = cfg.solver
    F = poses.shape[0]
    w = window

    def pad_f(x):
        return jnp.pad(x, ((w, w),) + ((0, 0),) * (x.ndim - 1))

    te_p, tp_p = pad_f(feats.t_edges), pad_f(feats.t_planars)
    tem_p, tpm_p = pad_f(feats.t_edge_mask), pad_f(feats.t_planar_mask)

    def one_pass(poses):
        eye = jnp.broadcast_to(jnp.eye(4, dtype=poses.dtype), (w, 4, 4))
        poses_p = jnp.concatenate([eye, poses, eye], axis=0)

        def solve_i(i):
            e_pts, e_msk = _window_targets(te_p, tem_p, poses_p, i, w)
            p_pts, p_msk = _window_targets(tp_p, tpm_p, poses_p, i, w)
            T_i = poses[i]
            T_new, diag = icp.solve_scan_to_map(
                feats.q_edges[i], feats.q_edge_mask[i],
                feats.q_planars[i], feats.q_planar_mask[i],
                icp.make_targets(e_pts, e_msk),
                icp.make_targets(p_pts, p_msk),
                T_i, sc, iters=iters,
            )
            corr = se3.log(se3.inv(T_i) @ T_new)
            ok = (
                (jnp.linalg.norm(corr[:3]) < sc.max_map_corr_trans)
                & (jnp.linalg.norm(corr[3:]) < sc.max_map_corr_rot)
                & ~diag.degenerate
            )
            T_damped = T_i @ se3.exp(alpha * corr)
            return jnp.where(ok, T_damped, T_i)

        new = jax.lax.map(solve_i, jnp.arange(F))
        # The window solves only constrain relative geometry; pin the global
        # gauge by rebasing so frame 0 keeps its forward pose.
        fix = poses[0] @ se3.inv(new[0])
        return jnp.einsum("ij,fjk->fik", fix, new)

    for _ in range(passes):
        poses = one_pass(poses)
    return poses


def smooth_trajectory(scans, masks, poses, cfg: VeloConfig,
                      window: int = 8, passes: int = 2,
                      iters: int | None = None, alpha: float = 0.7):
    """Convenience wrapper: per pass, re-collect features then sweep once.

    Features are re-collected every pass because deskew uses the *realized*
    per-frame deltas, which change as poses are refined — a stale error in
    the trajectory would otherwise be frozen into the feature clouds as
    permanent deskew distortion (measured: one-shot collection stalls
    recovery at ~0.18 m after a 0.29 m pose injection; per-pass collection
    reaches the solver floor).

    ``scans``/``masks`` are the same (F, …) arrays the forward pass consumed
    (raw padded points, or pre-binned grids with ``cfg.prebin_host``);
    ``poses`` the forward (F, 4, 4) world-from-velo trajectory.
    """
    # Feature collection never needs the vision carry; force the LiDAR-only
    # front-end so the same entry serves fused forward runs too.
    lcfg = dataclasses.replace(cfg, use_vision=False)
    scans = jnp.asarray(scans)
    masks = jnp.asarray(masks)
    poses = jnp.asarray(poses)
    for _ in range(passes):
        feats = collect_features(scans, masks, poses, lcfg)
        poses = refine_poses(poses, feats, lcfg, window=window, passes=1,
                             iters=iters, alpha=alpha)
    return poses
