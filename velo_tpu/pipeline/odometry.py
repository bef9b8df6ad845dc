"""Odometry state machine (SURVEY.md C13): one jitted step, scanned over frames.

Per frame (reference call stack §3.1), entirely on-device:

  predict (constant velocity) -> deskew -> range image -> curvature ->
  feature selection -> scan-to-scan joint solve vs previous features ->
  local-map insert/maintain -> scan-to-map refinement -> publish pose

The carry is a single fixed-shape pytree (pose, velocity, previous features,
map ring buffers), so the whole sequence can run as ``jax.lax.scan`` with
zero host round-trips, or be driven frame-by-frame by a host streaming loop
(same compiled step) when scans arrive from disk.
"""
from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from velo_tpu.config import VeloConfig
from velo_tpu.geom import camera as cam_mod
from velo_tpu.geom import se3
from velo_tpu.lidar import curvature as curv_mod
from velo_tpu.lidar import deskew as deskew_mod
from velo_tpu.lidar import features as feat_mod
from velo_tpu.lidar import rangeimage as ri_mod
from velo_tpu.mapping import local_map, voxel_hash
from velo_tpu.solve import icp
from velo_tpu.vision import corners as corners_mod
from velo_tpu.vision import depth_assoc
from velo_tpu.vision import klt as klt_mod
from velo_tpu.vision import pyramid as pyr_mod
from velo_tpu.vision import tracks as tracks_mod


class VisionCarry(NamedTuple):
    pyr: tuple  # previous image pyramid (levels static)
    grads: tuple  # per-level (gx, gy) of the previous pyramid
    tracks: tracks_mod.TrackTable


class OdomCarry(NamedTuple):
    T_w: jnp.ndarray  # (4,4) world-from-current-scan-start pose
    delta: jnp.ndarray  # (6,) last frame-to-frame motion (xi of T_prev_cur)
    prev_edges: jnp.ndarray  # (K_e, 3) previous-scan edge features
    prev_edge_mask: jnp.ndarray
    prev_edge_ring: jnp.ndarray  # (K_e,) int32
    prev_edge_phase: jnp.ndarray  # (K_e,) sweep phase in [0,1) — kept so the
    # exact-lag deskew can re-correct stored targets once their true sweep
    # motion (the next frame's solved delta) is known
    prev_planars: jnp.ndarray  # (K_p, 3)
    prev_planar_mask: jnp.ndarray
    prev_planar_phase: jnp.ndarray  # (K_p,)
    edge_map: local_map.LocalMap
    planar_map: local_map.LocalMap
    frame_idx: jnp.ndarray  # scalar int32
    vision: VisionCarry | None = None


class FrameResult(NamedTuple):
    """Per-frame diagnostics through the scan carry (SURVEY.md §5 metrics
    row).  All fixed-shape scalars, so carrying them costs nothing; they
    make episode analysis (e.g. the suburban open-stretch bias) possible
    from a single ``longrun.py --dump`` instead of ad-hoc probe scripts."""

    T_w: jnp.ndarray  # (4,4) pose of this frame (velodyne frame)
    n_edge: jnp.ndarray
    n_planar: jnp.ndarray
    cost: jnp.ndarray
    degenerate: jnp.ndarray
    # int32: LM steps accepted in the (final) scan-to-scan solve, summed
    # over its outer ICP iterations (0 = stuck at init; full budget =
    # never converged within the iteration cap).
    lm_accept: jnp.ndarray | int = 0
    # int32: same for the scan-to-map refinement (0 when map off/skipped).
    lm_accept_map: jnp.ndarray | int = 0
    # bool: plausibility gate fired (solve rejected, constant-velocity
    # prediction kept).
    implausible: jnp.ndarray | bool = False
    # bool: the scan-to-map correction passed its gates and was applied.
    map_applied: jnp.ndarray | bool = False
    # bool: final motion lies outside the dead-zone motion prior (the
    # prior's quadratic tail was actively pulling this frame).
    prior_active: jnp.ndarray | bool = False
    # int32: depth-augmented track survivors of the consensus pre-gate
    # (the reprojection block's sample size; 0 when vision off).
    n_depth: jnp.ndarray | int = 0
    # float32: reprojection trust-ramp scale in [0, 1] (1 when vision off
    # so dumps read "fully trusted" only when the ramp isn't limiting).
    vis_w_scale: jnp.ndarray | float = 1.0


def init_carry(cfg: VeloConfig) -> OdomCarry:
    lc = cfg.lidar
    vision = None
    if cfg.use_vision:
        vc = cfg.vision
        zero = jnp.zeros((vc.height, vc.width), jnp.float32)
        pyr = pyr_mod.build_pyramid(zero, vc.pyr_levels)
        vision = VisionCarry(
            pyr=pyr,
            grads=klt_mod.frame_gradients(pyr),
            tracks=tracks_mod.empty_tracks(vc),
        )
    ke = lc.k_edge * lc.target_mult
    kp = lc.k_planar * lc.target_mult
    return OdomCarry(
        vision=vision,
        T_w=se3.identity(),
        delta=jnp.zeros(6, jnp.float32),
        prev_edges=jnp.zeros((ke, 3), jnp.float32),
        prev_edge_mask=jnp.zeros((ke,), bool),
        prev_edge_ring=jnp.zeros((ke,), jnp.int32),
        prev_edge_phase=jnp.zeros((ke,), jnp.float32),
        prev_planars=jnp.zeros((kp, 3), jnp.float32),
        prev_planar_mask=jnp.zeros((kp,), bool),
        prev_planar_phase=jnp.zeros((kp,), jnp.float32),
        edge_map=local_map.empty_map(cfg.map.edge_capacity),
        planar_map=local_map.empty_map(cfg.map.planar_capacity),
        frame_idx=jnp.int32(0),
    )


def _extract_features_from_ri(ri, cfg: VeloConfig):
    """Returns (query_features, target_features) of one range image."""
    cr = curv_mod.compute_curvature(ri, cfg.lidar)
    q = feat_mod.select_features(ri, cr, cfg.lidar)
    t = feat_mod.select_features(ri, cr, cfg.lidar, target=True)
    return q, t


def step(carry: OdomCarry, scan: jnp.ndarray, scan_mask: jnp.ndarray,
         cfg: VeloConfig, image: jnp.ndarray | None = None,
         cam: cam_mod.Camera | None = None):
    """Process one frame. scan: (N_MAX, 4) padded raw points + mask — or,
    with ``cfg.prebin_host``, a host-pre-binned (R, W, 5) grid + (R, W)
    validity (see ``rangeimage.bin_scan_host``); image: (H, W) float32
    grayscale when cfg.use_vision."""
    sc = cfg.solver

    # 1-2) Predict + deskew (constant-velocity), then the LiDAR front-end:
    # sparse query set + dense match-target set from the range image.
    if cfg.prebin_host:
        ri = ri_mod.range_image_from_grid(scan, scan_mask, carry.delta,
                                          cfg.lidar, enabled=cfg.use_deskew)
    else:
        pts3, phase = deskew_mod.deskew(
            scan[:, :3], carry.delta, az_start=cfg.lidar.az_start,
            enabled=cfg.use_deskew,
        )
        ri = ri_mod.build_range_image(pts3, scan_mask, phase, cfg.lidar)
    feats, tfeats = _extract_features_from_ri(ri, cfg)

    # 2v) Visual front-end: pyramid + KLT track + reprojection data.
    vis_data = None
    n_dep = jnp.int32(0)
    w_scale = jnp.float32(1.0)
    T_pred = se3.exp(carry.delta)
    if cfg.use_vision:
        vc = cfg.vision
        vcar = carry.vision
        cur_pyr = pyr_mod.build_pyramid(image, vc.pyr_levels)
        cur_grads = klt_mod.frame_gradients(cur_pyr)
        tr = klt_mod.track(vcar.pyr, cur_pyr, vcar.grads, cur_grads,
                           vcar.tracks.uv, vcar.tracks.active, vc)
        table = tracks_mod.after_tracking(vcar.tracks, tr.uv, tr.ok)
        tracked = table.active & (carry.frame_idx > 0)
        depth_mask = tracked & vcar.tracks.has_depth
        # Consensus pre-gate at the predicted pose: a landmark with a wrong
        # interpolated depth reprojects away from where the *other* tracks
        # agree it should.  Gate on deviation from the median residual, not
        # its absolute size — when the prediction itself is wrong (corridor
        # recovery) every residual is large in the same direction, and that
        # common mode is signal, not outliers.
        Y_pred = se3.apply(se3.inv(T_pred)[None],
                           vcar.tracks.prev_xyz_velo[None])[0]
        Xc_pred = se3.apply(cam.T_cam_velo[None], Y_pred[None])[0]
        r_pred, _, ok_pred = icp.res.reprojection(Xc_pred, cam.P, table.uv,
                                                  depth_mask)
        big = jnp.float32(1e6)
        r_m = jnp.where((depth_mask & ok_pred)[:, None], r_pred, big)
        med = jnp.nanmedian(jnp.where(r_m < big * 0.5, r_m, jnp.nan), axis=0)
        med = jnp.nan_to_num(med)  # no valid tracks -> gate around zero
        depth_mask = depth_mask & ok_pred & (
            jnp.linalg.norm(r_pred - med[None, :], axis=-1)
            < cfg.solver.vis_pregate_px
        )
        # Reprojection trust ramp: with too few depth tracks the median
        # above has no statistics (it IS the outliers), and open scenes
        # measured 30-60 cm/frame forward drag from 2-5 bad landmarks
        # owning the weakly-LiDAR-constrained DoF.  Ramp the block in over
        # [lo, hi] survivors; epipolar terms (depth-free) stay at weight.
        n_dep = jnp.sum(depth_mask).astype(jnp.int32)
        lo = jnp.float32(cfg.solver.vis_depth_lo)
        hi = jnp.float32(cfg.solver.vis_depth_hi)
        w_scale = jnp.clip((n_dep.astype(jnp.float32) - lo)
                           / jnp.maximum(hi - lo, 1.0), 0.0, 1.0)
        # Per-landmark inverse-variance weight from the association's depth
        # sensitivity: a landmark whose depth moves g meters per pixel of
        # track error carries (g·sigma_px)^2 of depth variance — smoothly
        # down-weight instead of only hard-gating at max_depth_grad.
        g0 = jnp.float32(cfg.solver.vis_grad_soft)
        w_lm = 1.0 / (1.0 + (vcar.tracks.depth_grad / g0) ** 2)
        vis_data = icp.VisData(
            xyz_prev_velo=vcar.tracks.prev_xyz_velo,
            obs_uv=table.uv,
            mask=depth_mask,
            P=cam.P,
            T_cam_velo=cam.T_cam_velo,
            uv_prev=vcar.tracks.uv,
            mask_nodepth=tracked & ~vcar.tracks.has_depth,
            w_scale=w_scale,
            w_lm=w_lm,
        )

    # 3) Scan-to-scan joint solve vs previous features (+ visual residuals).
    edge_targets = icp.make_targets(
        carry.prev_edges, carry.prev_edge_mask,
        payload=carry.prev_edge_ring[:, None],
    )
    planar_targets = icp.make_targets(carry.prev_planars,
                                      carry.prev_planar_mask)
    # One global candidate search per frame, shared by both solves: the
    # redeskew between them moves features far less than the cache's slack
    # radius, so re-running the O(Q*N) search bought nothing (device trace).
    if sc.nn_engine == "dense" and sc.reuse_candidates:
        e_cands = icp.build_candidates(edge_targets, feats.edges,
                                       feats.edge_mask, T_pred, sc)
        p_cands = icp.build_candidates(planar_targets, feats.planars,
                                       feats.planar_mask, T_pred, sc)
    else:
        e_cands = p_cands = None
    # The motion prior only applies once a velocity estimate exists (frames
    # 0/1 have no prediction; a prior toward zero motion would bias them).
    prior_scale = (carry.frame_idx >= 2).astype(jnp.float32)

    if cfg.use_deskew and sc.ct_sweep:
        # Continuous-time path: one 12-DoF solve estimates the pose AND the
        # scan's own sweep motion (xi2), replacing the redeskew fixed point.
        T_rel, xi2, diag = icp.solve_scan_to_scan_ct(
            feats.edges, feats.edge_phase, feats.edge_mask,
            feats.planars, feats.planar_phase, feats.planar_mask,
            edge_targets, planar_targets, T_pred, carry.delta, sc,
            vis=vis_data, edge_cands=e_cands, planar_cands=p_cands,
            prior_T=T_pred, prior_scale=prior_scale,
        )
        # The sweep motion cannot deviate from the inter-frame motion by
        # more than physical acceleration allows; clamp the deviation so a
        # weakly-observed xi2 cannot corrupt the stored features or map.
        base = se3.log(T_rel)
        dev2 = xi2 - base
        nt = jnp.linalg.norm(dev2[:3])
        nr = jnp.linalg.norm(dev2[3:])
        dev2 = jnp.concatenate([
            dev2[:3] * jnp.minimum(1.0, sc.max_accel_trans
                                   / jnp.maximum(nt, 1e-9)),
            dev2[3:] * jnp.minimum(1.0, sc.max_accel_rot
                                   / jnp.maximum(nr, 1e-9)),
        ])
        xi2 = base + dev2
        # Frames 0/1: no previous-scan correction reference; keep identity
        # re-correction so both scans carry matching distortion.
        xi2 = jnp.where(carry.frame_idx >= 2, xi2, carry.delta)

        def _fix(pts, phase, mask):
            out = deskew_mod.redeskew(pts, phase, carry.delta, xi2)
            return jnp.where(mask[:, None], out, 0.0)

        feats = feats._replace(
            edges=_fix(feats.edges, feats.edge_phase, feats.edge_mask),
            planars=_fix(feats.planars, feats.planar_phase,
                         feats.planar_mask),
        )
        tfeats = tfeats._replace(
            edges=_fix(tfeats.edges, tfeats.edge_phase, tfeats.edge_mask),
            planars=_fix(tfeats.planars, tfeats.planar_phase,
                         tfeats.planar_mask),
        )
        deskew_ref = None  # features carry their final correction
    else:
        T_rel, diag = icp.solve_scan_to_scan(
            feats.edges, feats.edge_mask, feats.planars, feats.planar_mask,
            edge_targets, planar_targets, T_pred, sc, vis=vis_data,
            edge_cands=e_cands, planar_cands=p_cands, prior_T=T_pred,
            prior_scale=prior_scale,
        )
        # Features are (so far) corrected relative to the predicted motion;
        # refined to delta1 below when the redeskew fixed point runs.
        deskew_ref = carry.delta
    # Deskew/solve fixed point: the first solve ran on features deskewed with
    # the *predicted* motion; re-correct them with the solved motion and solve
    # again, otherwise a prediction bias self-perpetuates (each solve matches
    # residually-distorted features and under-estimates the same way).
    if cfg.use_deskew and not sc.ct_sweep:
        delta1 = se3.log(T_rel)
        # Frames 0/1 have no usable motion estimate for the *previous* scan,
        # so its stored features are distorted; keep the current frame's
        # distortion consistent with it (identity re-correction) there —
        # distorted-vs-distorted matching cancels under constant velocity.
        delta1 = jnp.where(carry.frame_idx >= 2, delta1, carry.delta)
        e2 = deskew_mod.redeskew(feats.edges, feats.edge_phase, carry.delta,
                                 delta1)
        p2 = deskew_mod.redeskew(feats.planars, feats.planar_phase,
                                 carry.delta, delta1)
        feats = feats._replace(
            edges=jnp.where(feats.edge_mask[:, None], e2, 0.0),
            planars=jnp.where(feats.planar_mask[:, None], p2, 0.0),
        )
        te2 = deskew_mod.redeskew(tfeats.edges, tfeats.edge_phase,
                                  carry.delta, delta1)
        tp2 = deskew_mod.redeskew(tfeats.planars, tfeats.planar_phase,
                                  carry.delta, delta1)
        tfeats = tfeats._replace(
            edges=jnp.where(tfeats.edge_mask[:, None], te2, 0.0),
            planars=jnp.where(tfeats.planar_mask[:, None], tp2, 0.0),
        )
        if sc.deskew_exact_lag and sc.exact_lag_targets:
            # One-frame-lag EXACT deskew of the *targets*: scan i-1's sweep
            # spans poses i-1 -> i, so its true sweep motion is precisely the
            # delta being solved RIGHT NOW — not the constant-velocity guess
            # it was stored with (its own frame's delta, one frame stale).
            # Under constant velocity this redeskew is the identity; under
            # acceleration (white pitch/roll excitation, hard braking) it
            # removes the O(accel) target distortion before the re-solve.
            # The stored correction reference is carry.delta: the previous
            # frame corrected its kept features with its realized delta_new,
            # which is this frame's carry.delta.
            pe1 = deskew_mod.redeskew(carry.prev_edges, carry.prev_edge_phase,
                                      carry.delta, delta1)
            pp1 = deskew_mod.redeskew(carry.prev_planars,
                                      carry.prev_planar_phase,
                                      carry.delta, delta1)
            edge_targets = icp.make_targets(
                jnp.where(carry.prev_edge_mask[:, None], pe1, 0.0),
                carry.prev_edge_mask,
                payload=carry.prev_edge_ring[:, None])
            planar_targets = icp.make_targets(
                jnp.where(carry.prev_planar_mask[:, None], pp1, 0.0),
                carry.prev_planar_mask)

            def _fix_cache(cands):
                # The candidate cache gathered target COORDINATES before the
                # redeskew; re-correct them in place (phase recovered from
                # the azimuth — identical to how it was assigned, up to the
                # sub-degree azimuth shift of the correction itself).
                if cands is None:
                    return None
                flat = cands.pts.reshape(-1, 3)
                ph = deskew_mod.azimuth_phase(flat,
                                              az_start=cfg.lidar.az_start)
                fixed = deskew_mod.redeskew(flat, ph, carry.delta, delta1)
                return cands._replace(pts=fixed.reshape(cands.pts.shape))

            e_cands = _fix_cache(e_cands)
            p_cands = _fix_cache(p_cands)
        T_rel, diag = icp.solve_scan_to_scan(
            feats.edges, feats.edge_mask, feats.planars, feats.planar_mask,
            edge_targets, planar_targets, T_rel, sc, vis=vis_data,
            iters=sc.icp_iters_redeskew,
            edge_cands=e_cands, planar_cands=p_cands, prior_T=T_pred,
            prior_scale=prior_scale,
        )
        # From here on the features are corrected relative to delta1.
        deskew_ref = delta1

    # Plausibility gate: between 10 Hz frames the motion cannot jump far from
    # the constant-velocity prediction; a solve that claims otherwise has
    # latched onto wrong correspondences (observed: one edge-starved frame
    # cascades through map + velocity and destroys the whole trajectory).
    dev = se3.log(se3.inv(se3.exp(carry.delta)) @ T_rel)
    implausible = (
        (jnp.linalg.norm(dev[:3]) > sc.max_accel_trans)
        | (jnp.linalg.norm(dev[3:]) > sc.max_accel_rot)
    ) & (carry.frame_idx >= 2)
    # Diagnostic: the dead-zone motion prior's quadratic tail was pulling on
    # this frame (the solved motion deviates from the constant-velocity
    # prediction beyond the dead zone it is free within).
    prior_active = (
        (jnp.linalg.norm(dev[:3]) > sc.prior_deadzone_trans)
        | (jnp.linalg.norm(dev[3:]) > sc.prior_deadzone_rot)
    ) & (prior_scale > 0)
    T_rel = jnp.where(implausible, se3.exp(carry.delta), T_rel)
    T_w = carry.T_w @ T_rel

    # 4) Scan-to-map refinement against the local map (config >= 2).
    map_applied = jnp.asarray(False)
    lm_accept_map = jnp.int32(0)
    if cfg.use_map:
        e_targets = icp.make_targets(carry.edge_map.pts, carry.edge_map.mask)
        p_targets = icp.make_targets(carry.planar_map.pts,
                                     carry.planar_map.mask)
        has_map = jnp.sum(carry.edge_map.mask) + jnp.sum(
            carry.planar_map.mask
        ) > 100

        def _map_solve():
            return icp.solve_scan_to_map(
                feats.edges, feats.edge_mask, feats.planars,
                feats.planar_mask, e_targets, p_targets, T_w, sc,
                prior_T=T_w, prior_scale=prior_scale,
            )

        if cfg.map.map_every > 1:
            # Refinement cadence (C13 "every k frames"): lax.cond keeps the
            # skipped frames from paying for the map solve.
            T_map, diag_m = jax.lax.cond(
                carry.frame_idx % cfg.map.map_every == 0,
                _map_solve,
                lambda: (T_w, icp.SolveDiag(
                    n_edge=jnp.int32(0), n_planar=jnp.int32(0),
                    cost=jnp.float32(0.0), degenerate=jnp.asarray(True),
                    lm_accept=jnp.int32(0))),
            )
        else:
            T_map, diag_m = _map_solve()
        # The map refinement is a *correction*; a large one means bad
        # correspondences, not a better pose.
        corr = se3.log(se3.inv(T_w) @ T_map)
        map_ok = (
            (jnp.linalg.norm(corr[:3]) < sc.max_map_corr_trans)
            & (jnp.linalg.norm(corr[3:]) < sc.max_map_corr_rot)
        )
        map_applied = has_map & ~diag_m.degenerate & map_ok
        lm_accept_map = diag_m.lm_accept
        T_w = jnp.where(map_applied, T_map, T_w)

    # 5) Velocity update from the *realized* motion.
    delta_new = se3.log(se3.inv(carry.T_w) @ T_w)
    # First frame has no reference: keep zero velocity, identity pose.
    first = carry.frame_idx == 0
    delta_new = jnp.where(first, jnp.zeros(6, jnp.float32), delta_new)

    # 6) Re-correct features with the solved motion: deskew ran with the
    # prediction; consecutive frames must carry consistent (zero) residual
    # distortion or matching inherits the mismatch.  (The continuous-time
    # path already corrected them with the solved sweep motion.)
    if cfg.use_deskew and deskew_ref is not None:
        edges_fix = deskew_mod.redeskew(tfeats.edges, tfeats.edge_phase,
                                        deskew_ref, delta_new)
        planars_fix = deskew_mod.redeskew(tfeats.planars, tfeats.planar_phase,
                                          deskew_ref, delta_new)
        edges_fix = jnp.where(tfeats.edge_mask[:, None], edges_fix, 0.0)
        planars_fix = jnp.where(tfeats.planar_mask[:, None], planars_fix, 0.0)
    else:
        edges_fix, planars_fix = tfeats.edges, tfeats.planars

    # 7) Map update: insert corrected features (world frame), bound density.
    # (A novelty-gated insert — only voxel-new points consume slots — was
    # tried for retention and measurably HURT long-run drift: stale
    # misplaced map points persist and block better-localized refreshes.
    # Full refresh insert keeps the map consistent with the best poses.)
    if cfg.use_map:
        if cfg.use_deskew and not sc.ct_sweep and sc.deskew_exact_lag:
            # Exact-lag insert: the previous scan's sweep motion is now
            # pinned by this frame's realized delta, so insert the PREVIOUS
            # scan's features — re-corrected with their exact motion — at
            # the previous pose, one frame late.  The current scan still
            # serves as the s2s target meanwhile, so nothing is lost; the
            # map stops accumulating O(accel) distortion.
            exact = jnp.where(first, carry.delta, delta_new)
            pe_m = deskew_mod.redeskew(carry.prev_edges,
                                       carry.prev_edge_phase,
                                       carry.delta, exact)
            pp_m = deskew_mod.redeskew(carry.prev_planars,
                                       carry.prev_planar_phase,
                                       carry.delta, exact)
            w_edges = se3.apply(carry.T_w[None], pe_m[None])[0]
            w_planars = se3.apply(carry.T_w[None], pp_m[None])[0]
            edge_map = local_map.insert(carry.edge_map, w_edges,
                                        carry.prev_edge_mask)
            planar_map = local_map.insert(carry.planar_map, w_planars,
                                          carry.prev_planar_mask)
        else:
            w_edges = se3.apply(T_w[None], edges_fix[None])[0]
            w_planars = se3.apply(T_w[None], planars_fix[None])[0]
            edge_map = local_map.insert(carry.edge_map, w_edges,
                                        tfeats.edge_mask)
            planar_map = local_map.insert(carry.planar_map, w_planars,
                                          tfeats.planar_mask)

        def _maintain(em, pm):
            em = local_map.maintain(em, T_w[:3, 3], cfg.map.voxel_edge,
                                    cfg.map.crop_radius)
            pm = local_map.maintain(pm, T_w[:3, 3], cfg.map.voxel_planar,
                                    cfg.map.crop_radius)
            return em, pm

        if cfg.map.maintain_every > 1:
            # The ring buffer bounds memory by construction; the sort-based
            # voxel dedup + crop only needs to run on a cadence.
            edge_map, planar_map = jax.lax.cond(
                carry.frame_idx % cfg.map.maintain_every == 0,
                lambda: _maintain(edge_map, planar_map),
                lambda: (edge_map, planar_map),
            )
        else:
            edge_map, planar_map = _maintain(edge_map, planar_map)
    else:
        edge_map, planar_map = carry.edge_map, carry.planar_map

    # 8) Visual bookkeeping for the next frame: associate LiDAR depth at the
    # tracked positions, then replenish free slots from fresh corners.
    new_vision = carry.vision
    if cfg.use_vision:
        dgrid = depth_assoc.build_depth_grid_from_ri(
            ri, cam, cfg.vision, az_start=cfg.lidar.az_start)
        dres = depth_assoc.associate(dgrid, table.uv, table.active, cam,
                                     cfg.vision)
        X_velo = se3.apply(se3.inv(cam.T_cam_velo)[None], dres.xyz_cam[None])[0]
        table = table._replace(
            prev_xyz_velo=jnp.where(dres.ok[:, None], X_velo,
                                    table.prev_xyz_velo),
            has_depth=dres.ok,
            depth_grad=jnp.where(dres.ok, dres.grad, 0.0),
        )
        cns = corners_mod.detect(image, cfg.vision)
        table = tracks_mod.replenish(table, cns, cfg.vision)
        new_vision = VisionCarry(pyr=cur_pyr, grads=cur_grads, tracks=table)

    new_carry = OdomCarry(
        vision=new_vision,
        T_w=T_w,
        delta=delta_new,
        prev_edges=edges_fix,
        prev_edge_mask=tfeats.edge_mask,
        prev_edge_ring=tfeats.edge_ring,
        prev_edge_phase=tfeats.edge_phase,
        prev_planars=planars_fix,
        prev_planar_mask=tfeats.planar_mask,
        prev_planar_phase=tfeats.planar_phase,
        edge_map=edge_map,
        planar_map=planar_map,
        frame_idx=carry.frame_idx + 1,
    )
    result = FrameResult(
        T_w=T_w, n_edge=diag.n_edge, n_planar=diag.n_planar,
        cost=diag.cost, degenerate=diag.degenerate,
        lm_accept=diag.lm_accept, lm_accept_map=lm_accept_map,
        implausible=implausible, map_applied=map_applied,
        prior_active=prior_active, n_depth=n_dep,
        vis_w_scale=w_scale,
    )
    return new_carry, result


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def jit_step(carry, scan, scan_mask, cfg: VeloConfig, image=None, cam=None):
    """Host-streaming entry: one compiled step with donated carry buffers."""
    return step(carry, scan, scan_mask, cfg, image=image, cam=cam)


@partial(jax.jit, static_argnames=("cfg",))
def run_scan(carry, scans, scan_masks, cfg: VeloConfig, images=None,
             cam=None):
    """Device-resident batch entry: lax.scan over (F, N_MAX, 4) frames."""

    if images is None:
        def body(c, frame):
            s, m = frame
            return step(c, s, m, cfg)

        return jax.lax.scan(body, carry, (scans, scan_masks))

    def body(c, frame):
        s, m, im = frame
        return step(c, s, m, cfg, image=im, cam=cam)

    return jax.lax.scan(body, carry, (scans, scan_masks, images))


def run_sequence_host(frames, cfg: VeloConfig, carry=None, cam=None,
                      checkpoint_path=None, checkpoint_every=0,
                      resume=False):
    """Stream numpy frames through the jitted step (C13 driver).

    ``frames`` yields (scan, mask) or (scan, mask, image).
    Returns (poses (F,4,4) numpy, diagnostics dict of numpy arrays).

    With ``checkpoint_path`` + ``checkpoint_every``, the carry pytree AND the
    trajectory-so-far are dumped every N frames (crash recovery, SURVEY.md
    §5); ``resume=True`` reloads both and skips the already-processed frames,
    so resumed runs return the FULL trajectory, identical to an
    uninterrupted run.
    """
    from velo_tpu.pipeline import checkpoint as ckpt

    diag_keys = [k for k in FrameResult._fields if k != "T_w"]
    skip = 0
    poses = []
    diags = {k: [] for k in diag_keys}
    if carry is None:
        carry = init_carry(cfg)
    if resume:
        if not (checkpoint_path and os.path.exists(checkpoint_path)):
            raise FileNotFoundError(
                f"--resume requires an existing checkpoint: {checkpoint_path}"
            )
        carry = ckpt.load_carry(checkpoint_path, carry)
        skip = int(np.asarray(carry.frame_idx))
        hist = ckpt.load_history(checkpoint_path)
        if "poses" not in hist:
            raise ValueError(
                f"checkpoint {checkpoint_path} predates trajectory history; "
                "rerun from scratch (resume would return a truncated file)"
            )
        poses = list(hist["poses"])
        for k in diag_keys:
            # Checkpoints written before a diagnostic existed replay as the
            # field's scan-time default for those frames.
            diags[k] = (list(hist[k]) if k in hist
                        else [FrameResult._field_defaults[k]] * len(poses))
    for i, frame in enumerate(frames):
        if i < skip:
            continue
        scan, mask = frame[0], frame[1]
        image = jnp.asarray(frame[2]) if len(frame) > 2 else None
        carry, out = jit_step(carry, jnp.asarray(scan), jnp.asarray(mask),
                              cfg, image=image, cam=cam)
        poses.append(np.asarray(out.T_w))
        for k in diag_keys:
            diags[k].append(np.asarray(getattr(out, k)))
        if checkpoint_path and checkpoint_every and (
                (i + 1) % checkpoint_every == 0):
            # jit_step donates the carry, so snapshot via host copy.
            history = {k: np.asarray(v) for k, v in diags.items()}
            history["poses"] = np.stack(poses)
            ckpt.save_carry(checkpoint_path,
                            jax.tree.map(np.asarray, carry),
                            frame_idx=i + 1,
                            history=history)
    return np.stack(poses), {k: np.asarray(v) for k, v in diags.items()}


def velo_to_cam_trajectory(poses_velo: np.ndarray,
                           T_cam_velo: np.ndarray) -> np.ndarray:
    """Convert world-from-velo poses to the KITTI cam0 eval convention
    (first camera pose = identity)."""
    T_cv = np.asarray(T_cam_velo, np.float64)
    T_vc = np.linalg.inv(T_cv)
    poses_cam = np.einsum("ij,fjk,kl->fil", T_cv, np.asarray(poses_velo, np.float64), T_vc)
    return np.einsum("ij,fjk->fik", np.linalg.inv(poses_cam[0]), poses_cam)
