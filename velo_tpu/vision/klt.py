"""Pyramidal Lucas-Kanade tracking (SURVEY.md C7), inverse-compositional.

Replaces OpenCV ``calcOpticalFlowPyrLK``.  All K features are tracked at once:
per pyramid level (coarse to fine) the inverse-compositional Gauss-Newton
iteration runs a fixed number of steps —

  template   = patch of the *previous* image at the feature (fixed per level)
  grads      = Scharr gradients of the previous level (fixed => the 2x2
               normal matrix G and its inverse are computed once per level)
  iterate:     e = sample(cur, pos) - template ; d = G^-1 Σ grad*e ; pos += d

— as batched (K, P) bilinear gathers, a ``fori_loop`` over iterations, and a
Python loop over the (static) levels.  A forward-backward consistency check
provides the tracking-failure gate the reference gets from OpenCV's err/status
outputs.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from velo_tpu.config import VisionConfig
from velo_tpu.vision import pyramid as pyr


class TrackResult(NamedTuple):
    uv: jnp.ndarray  # (K, 2) tracked positions in the current image
    ok: jnp.ndarray  # (K,) tracked successfully (converged, in-bounds, fb)
    fb_err: jnp.ndarray  # (K,) forward-backward error in px


def _sample_patches(img, centers, cfg: VisionConfig):
    """(K, P) bilinear patches + per-feature in-bounds flag.

    TPU (``klt_impl="auto"``): matmul formulation (MXU; scalar-unit gathers
    cost ~74 ms/frame in the fused trace), with bf16 selection operands
    (``klt_dtype``) for single-pass MXU.  Other backends: flat gathers
    (cheaper on CPU).  ``klt_impl`` forces either path for testing.
    """
    K = centers.shape[0]
    halfwin = cfg.klt_halfwin
    impl = cfg.klt_impl
    if impl == "auto":
        impl = "matmul" if jax.default_backend() == "tpu" else "gather"
    if impl == "matmul":
        dtype = jnp.bfloat16 if cfg.klt_dtype == "bf16" else None
        p, inb = pyr.bilinear_patches_matmul(img, centers, halfwin,
                                             dtype=dtype)
        return p.reshape(K, -1), inb
    offs = pyr.patch_offsets(halfwin)
    vals, inb = pyr.bilinear_sample(img, centers[:, None, :] + offs[None])
    return vals, jnp.all(inb, axis=1)


def _in_image(uv, halfwin, H, W):
    """Patch-fully-inside-image flag (same formula as the matmul path)."""
    S = 2 * halfwin + 1
    x0 = jnp.floor(uv[:, 0]).astype(jnp.int32) - halfwin
    y0 = jnp.floor(uv[:, 1]).astype(jnp.int32) - halfwin
    return (x0 >= 0) & (y0 >= 0) & (x0 + S < W) & (y0 + S < H)


def _track_level_window(img_prev, gx_prev, gy_prev, img_cur, uv_prev,
                        uv_cur, cfg: VisionConfig):
    """Local-window IC-LK level: per-iteration cost independent of image size.

    The expensive image-sized selection matmuls run exactly twice per level
    (a 3-channel template/gradient window around ``uv_prev`` and a current-
    image window around the initial ``uv_cur``); every GN iteration then
    resamples the patch from the (K, Sw, Sw) windows with per-track
    (S,Sw)@(Sw,Sw)@(Sw,S) matmuls — a few MFLOP, vs ~240 MFLOP per
    iteration for full-image extraction at level 0.  ``klt_win_slack``
    bounds the per-level flow the window can follow; the pyramid exists
    precisely to keep per-level residual flow below the patch radius, and
    tracks that hit the window edge freeze there and fail the FB check,
    matching the frozen-step semantics of the global path.
    """
    h = cfg.klt_halfwin
    S = 2 * h + 1
    slack = cfg.klt_win_slack
    Sw = S + 1 + 2 * slack
    dtype = jnp.bfloat16 if cfg.klt_dtype == "bf16" else None
    H, W = img_cur.shape
    K = uv_prev.shape[0]

    ptl = jnp.floor(uv_prev).astype(jnp.int32) - (h + slack)  # (K,2)
    pwin = pyr.integer_windows(
        jnp.stack([img_prev, gx_prev, gy_prev]), ptl, Sw, dtype=dtype)
    luv_prev = uv_prev - ptl.astype(jnp.float32)
    tmpl, _ = pyr.bilinear_patches_local(pwin[0], luv_prev, h)
    gx, _ = pyr.bilinear_patches_local(pwin[1], luv_prev, h)
    gy, _ = pyr.bilinear_patches_local(pwin[2], luv_prev, h)
    tmpl = tmpl.reshape(K, -1)
    gx = gx.reshape(K, -1)
    gy = gy.reshape(K, -1)
    ok = _in_image(uv_prev, h, H, W)

    gxx = jnp.sum(gx * gx, axis=1)
    gxy = jnp.sum(gx * gy, axis=1)
    gyy = jnp.sum(gy * gy, axis=1)
    det = gxx * gyy - gxy * gxy
    ok = ok & (det > 1e-9)
    safe_det = jnp.where(det > 1e-9, det, 1.0)
    inv00 = gyy / safe_det
    inv01 = -gxy / safe_det
    inv11 = gxx / safe_det

    ctl = jnp.floor(uv_cur).astype(jnp.int32) - (h + slack)
    cwin = pyr.integer_windows(img_cur[None], ctl, Sw, dtype=dtype)[0]
    ctl_f = ctl.astype(jnp.float32)

    def body(_, uv):
        cur, c_inw = pyr.bilinear_patches_local(cwin, uv - ctl_f, h)
        e = cur.reshape(K, -1) - tmpl
        bx = jnp.sum(gx * e, axis=1)
        by = jnp.sum(gy * e, axis=1)
        dx = inv00 * bx + inv01 * by
        dy = inv01 * bx + inv11 * by
        d = jnp.stack([dx, dy], axis=-1)
        step_ok = (ok & c_inw & _in_image(uv, h, H, W))[:, None]
        return uv - jnp.where(step_ok, d, 0.0)

    uv_out = jax.lax.fori_loop(0, cfg.klt_iters, body, uv_cur, unroll=True)
    inb = (
        (uv_out[:, 0] >= 1)
        & (uv_out[:, 0] <= W - 2)
        & (uv_out[:, 1] >= 1)
        & (uv_out[:, 1] <= H - 2)
    )
    return uv_out, ok & inb


def _track_level(img_prev, gx_prev, gy_prev, img_cur, uv_prev, uv_cur,
                 cfg: VisionConfig, iters=None):
    """One pyramid level of IC-LK for all features. Returns (uv_cur, ok)."""
    impl = cfg.klt_impl
    if impl == "auto":
        # Global bf16 selection matmuls measured FASTER than the local-window
        # variant on v5e (64.2 vs 52.7 fused fps): the window path's K
        # batched (S,Sw)@(Sw,Sw) matmuls pad to (8,128) MXU tiles at ~1%
        # utilization and lose more to per-op overhead than they save in
        # FLOPs.  "window" stays available for sweeping.
        impl = "matmul" if jax.default_backend() == "tpu" else "gather"
    if impl == "pallas":
        # Fused level-0 kernel: per-track VMEM blocks, in-kernel Scharr,
        # roll-based bilinear sampling on the VPU (pallas/klt_l0.py).  Only
        # the full-resolution level qualifies (it carries ~3/4 of the KLT
        # cost; coarse levels stay on the matmul path), and only when the
        # block geometry fits the image.
        H, W = img_cur.shape
        from velo_tpu.pallas import klt_l0

        if (H, W) == img_prev.shape and W % 128 == 0 and W >= klt_l0.BW \
                and H >= klt_l0.CB_R and (H, W) == (cfg.height, cfg.width):
            return klt_l0.track_level0(
                img_prev, img_cur, uv_prev, uv_cur, cfg,
                cfg.klt_iters if iters is None else iters,
                interpret=jax.default_backend() != "tpu")
        impl = "matmul" if jax.default_backend() == "tpu" else "gather"
    if impl == "window":
        return _track_level_window(img_prev, gx_prev, gy_prev, img_cur,
                                   uv_prev, uv_cur, cfg)
    if iters is None:
        iters = cfg.klt_iters
    # Fixed template + gradients at the previous-image feature location —
    # one 3-channel extraction (shared selection weights).
    if impl == "matmul":
        K = uv_prev.shape[0]
        dtype = jnp.bfloat16 if cfg.klt_dtype == "bf16" else None
        stack, t_in = pyr.bilinear_patches_matmul_multi(
            jnp.stack([img_prev, gx_prev, gy_prev]), uv_prev,
            cfg.klt_halfwin, dtype=dtype)
        tmpl = stack[0].reshape(K, -1)
        gx = stack[1].reshape(K, -1)
        gy = stack[2].reshape(K, -1)
    else:
        tmpl, t_in = _sample_patches(img_prev, uv_prev, cfg)
        gx, _ = _sample_patches(gx_prev, uv_prev, cfg)
        gy, _ = _sample_patches(gy_prev, uv_prev, cfg)
    ok = t_in

    gxx = jnp.sum(gx * gx, axis=1)
    gxy = jnp.sum(gx * gy, axis=1)
    gyy = jnp.sum(gy * gy, axis=1)
    det = gxx * gyy - gxy * gxy
    ok = ok & (det > 1e-9)
    safe_det = jnp.where(det > 1e-9, det, 1.0)
    # Inverse of the 2x2 normal matrix, per feature.
    inv00 = gyy / safe_det
    inv01 = -gxy / safe_det
    inv11 = gxx / safe_det

    def body(_, uv):
        cur, c_in = _sample_patches(img_cur, uv, cfg)
        e = cur - tmpl
        bx = jnp.sum(gx * e, axis=1)
        by = jnp.sum(gy * e, axis=1)
        dx = inv00 * bx + inv01 * by
        dy = inv01 * bx + inv11 * by
        d = jnp.stack([dx, dy], axis=-1)
        # Inverse-compositional update: move against the error.
        step_ok = (ok & c_in)[:, None]
        return uv - jnp.where(step_ok, d, 0.0)

    # Fully unrolled: each XLA `while` trip costs ~30 us on TPU, and the 8
    # whiles (4 levels x fwd/bwd) x klt_iters trips were ~1 ms/frame of pure
    # loop overhead in the fused trace.
    uv_out = jax.lax.fori_loop(0, iters, body, uv_cur, unroll=True)
    H, W = img_cur.shape
    inb = (
        (uv_out[:, 0] >= 1)
        & (uv_out[:, 0] <= W - 2)
        & (uv_out[:, 1] >= 1)
        & (uv_out[:, 1] <= H - 2)
    )
    return uv_out, ok & inb


def track_pyramid(prev_pyr, cur_pyr, prev_grads, uv0, valid,
                  cfg: VisionConfig, uv_init=None, n_levels=None,
                  iters=None):
    """Track features from the previous to the current pyramid.

    prev_grads: tuple of (gx, gy) per level (precomputed once per frame and
    reused by both the forward and backward passes of the FB check).
    Initial guess: ``uv_init`` if given, else the template position itself
    (the coarsest level absorbs large motion).  ``n_levels`` restricts the
    pass to the finest n levels (the FB backward pass runs only those —
    its init is already sub-pixel close, so coarse alignment is wasted
    work).
    """
    levels = cfg.pyr_levels if n_levels is None else n_levels
    scale = 2.0 ** (levels - 1)
    uv = (uv0 if uv_init is None else uv_init) / scale
    ok = valid
    for lv in range(levels - 1, -1, -1):
        gx, gy = prev_grads[lv]
        uv, lok = _track_level(
            prev_pyr[lv], gx, gy, cur_pyr[lv], uv0 / (2.0**lv), uv, cfg,
            iters=iters,
        )
        # A coarse level that cannot track a feature (patch out of bounds on
        # the tiny top levels, degenerate gradient) must not kill the track —
        # the level loop already passes its position through unchanged, and
        # OpenCV behaves the same way.  Only the finest level's validity
        # gates, with the forward-backward check as the real failure test.
        if lv == 0:
            ok = ok & lok
        else:
            uv = uv * 2.0
    return uv, ok


def track(prev_pyr, cur_pyr, prev_grads, cur_grads, uv0, valid,
          cfg: VisionConfig) -> TrackResult:
    """Forward track + backward consistency check.

    The backward pass runs only the finest ``fb_levels`` levels, initialized
    at the EXPECTED landing position ``uv0``: a genuine match stays put
    (small FB error) while a wrong forward match sends the backward GN
    wandering — same discrimination as the full-pyramid check at a fraction
    of its cost (the coarse backward levels only re-derive an init we
    already know).  ``fb_levels = pyr_levels`` restores the classic
    uninitialized full-pyramid check.
    """
    uv_f, ok_f = track_pyramid(prev_pyr, cur_pyr, prev_grads, uv0, valid, cfg)
    full = cfg.fb_levels >= cfg.pyr_levels
    uv_b, ok_b = track_pyramid(cur_pyr, prev_pyr, cur_grads, uv_f,
                               valid & ok_f, cfg,
                               uv_init=None if full else uv0,
                               n_levels=min(cfg.fb_levels, cfg.pyr_levels),
                               iters=cfg.klt_iters_fb)
    fb = jnp.linalg.norm(uv_b - uv0, axis=-1)
    ok = valid & ok_f & ok_b & (fb < cfg.fb_max_err)
    if cfg.max_track_residual < 1e8:
        # Absolute appearance gate (cv2's `err` output, which callers
        # threshold): mean |I_cur(patch at uv_f) - I_prev(patch at uv0)|.
        # The FB check alone passes locally-self-similar wrong matches
        # (aperture-ambiguous edges) whose backward track slides back along
        # the same structure; those land far from the true match but LOOK
        # consistent.  A wrong landing rarely also matches in appearance.
        tmpl, _ = _sample_patches(prev_pyr[0], uv0, cfg)
        cur, _ = _sample_patches(cur_pyr[0], uv_f, cfg)
        resid = jnp.mean(jnp.abs(cur - tmpl), axis=1)
        ok = ok & (resid < cfg.max_track_residual)
    return TrackResult(uv=uv_f, ok=ok, fb_err=fb)


def frame_gradients(img_pyr):
    """Per-level Scharr gradients for one pyramid (reused fwd/bwd)."""
    return tuple(pyr.scharr_gradients(im) for im in img_pyr)
