"""Fused level-0 IC-LK tracking kernel (the round-3 "structural lever").

Level 0 carries ~3/4 of KLT's cost in the fused device trace: every GN
iteration re-extracts K bilinear patches from the full-resolution image via
(H, W)-sized selection matmuls (vision/pyramid.py), and the whole-image
``strips`` intermediate (H, K*S floats) makes a round trip per iteration.
This kernel keeps each track's working set ON CHIP instead: per track it
DMAs one (24, 384) template block and one (40, 384) current-image block
from HBM into VMEM (double-buffered across the track grid), computes the
Scharr gradients in-block, and runs the full template extraction + all GN
iterations as VPU work — bilinear sampling is two lane/sublane ``roll``s
plus lerps, no matmuls (per-track (16, B)-shaped matmuls would run the MXU
at ~1/8 utilization, the measured failure mode of the ``klt_impl="window"``
variant).

Semantics match vision/klt.py:_track_level at level 0 (f32 exact bilinear;
the XLA path's bf16 selection quantization is absent), with two
documented edge differences:
  * template support must lie >= 1 px inside the image (the XLA path
    edge-clamps Scharr at the border); such tracks return ok=False.
  * the current position may move at most the block slack (~±19 rows,
    ~±117 cols) from its initial estimate within the level; beyond that
    the track freezes — same frozen-step semantics as the window variant,
    far beyond any level-0 step that survives the FB gate.

Coarse pyramid levels (≤ 1/4 the pixels) stay on the XLA matmul path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PB_R = 32   # template block rows: support is 18 rows (bilinear + Scharr),
# block origin is 8-row aligned (Mosaic requires HBM DMA slice starts
# divisible by the (8, 128) tile) so the origin floats up to 7 rows high —
# 32 rows keep >=6 rows of margin below the support in the worst case.
CB_R = 48   # current block rows: patch support + >=±12 rows of GN slack
# at the worst 8-aligned origin.
BW = 384    # block width (3 lane tiles): 128-aligned origin, >=119 px slack


def _grad_blocks(blk):
    """Scharr gx/gy of a block via static rolls (wrap rows/cols are garbage
    but the support requirement keeps every sample >=1 px interior)."""
    R, C = blk.shape
    up = pltpu.roll(blk, 1, axis=0)      # row r holds blk[r-1]
    dn = pltpu.roll(blk, R - 1, axis=0)  # row r holds blk[r+1]

    def dx(a):
        right = pltpu.roll(a, C - 1, axis=1)
        left = pltpu.roll(a, 1, axis=1)
        return right - left

    gx = (3.0 * dx(up) + 10.0 * dx(blk) + 3.0 * dx(dn)) / 32.0
    gy_src = (dn - up)
    gy = (3.0 * pltpu.roll(gy_src, 1, axis=1)
          + 10.0 * gy_src
          + 3.0 * pltpu.roll(gy_src, C - 1, axis=1)) / 32.0
    return gx, gy


def _bilinear15(blk, lx, ly, h):
    """(15, 15) bilinear patch of ``blk`` centered at local float (lx, ly).

    Rows/cols are brought to the top-left with dynamic rolls (wrap rows are
    sliced away), then lerped: pure VPU data movement + multiply-adds.
    """
    R, C = blk.shape
    iy = jnp.floor(ly).astype(jnp.int32)
    ix = jnp.floor(lx).astype(jnp.int32)
    fy = ly - jnp.floor(ly)
    fx = lx - jnp.floor(lx)
    rolled = pltpu.roll(blk, jnp.mod(R - (iy - h), R), axis=0)
    rows16 = rolled[:16, :]
    r15 = rows16[:15, :] * (1.0 - fy) + rows16[1:16, :] * fy
    rolledx = pltpu.roll(r15, jnp.mod(C - (ix - h), C), axis=1)
    c16 = rolledx[:, :16]
    patch = c16[:, :15] * (1.0 - fx) + c16[:, 1:16] * fx
    inb = (iy - h >= 0) & (iy + h + 1 < R) & (ix - h >= 0) & (ix + h + 1 < C)
    return patch, inb


def _kernel(org_ref, uvf_ref, prev_hbm, cur_hbm, uv_out, ok_out,
            pblk, cblk, sem, *, iters, h, H, W):
    k = pl.program_id(0)
    K = pl.num_programs(0)
    slot = jnp.mod(k, 2)
    nslot = jnp.mod(k + 1, 2)

    def copies(i, s):
        # org_ref holds TILE indices (rows/8, cols/128): Mosaic must *prove*
        # the HBM slice start divisible by the (8, 128) tile, and a runtime
        # value only carries that proof as an explicit multiply-by-constant.
        return (
            pltpu.make_async_copy(
                prev_hbm.at[pl.ds(org_ref[i, 0] * 8, PB_R),
                            pl.ds(org_ref[i, 1] * 128, BW)],
                pblk.at[s], sem.at[s, 0]),
            pltpu.make_async_copy(
                cur_hbm.at[pl.ds(org_ref[i, 2] * 8, CB_R),
                           pl.ds(org_ref[i, 3] * 128, BW)],
                cblk.at[s], sem.at[s, 1]),
        )

    @pl.when(k == 0)
    def _():
        for c in copies(0, 0):
            c.start()

    @pl.when(k + 1 < K)
    def _():
        for c in copies(k + 1, nslot):
            c.start()

    for c in copies(k, slot):
        c.wait()

    pb = pblk[slot]
    cb = cblk[slot]
    gxb, gyb = _grad_blocks(pb)

    xp = uvf_ref[k, 0]
    yp = uvf_ref[k, 1]
    pry = (org_ref[k, 0] * 8).astype(jnp.float32)
    prx = (org_ref[k, 1] * 128).astype(jnp.float32)
    cry = (org_ref[k, 2] * 8).astype(jnp.float32)
    crx = (org_ref[k, 3] * 128).astype(jnp.float32)

    # Template support must be >=1 px interior (in-block Scharr validity).
    ixp = jnp.floor(xp)
    iyp = jnp.floor(yp)
    t_in = ((ixp - h >= 1) & (ixp + h + 2 <= W - 1)
            & (iyp - h >= 1) & (iyp + h + 2 <= H - 1))

    tmpl, _ = _bilinear15(pb, xp - prx, yp - pry, h)
    gx, _ = _bilinear15(gxb, xp - prx, yp - pry, h)
    gy, _ = _bilinear15(gyb, xp - prx, yp - pry, h)

    gxx = jnp.sum(gx * gx)
    gxy = jnp.sum(gx * gy)
    gyy = jnp.sum(gy * gy)
    det = gxx * gyy - gxy * gxy
    ok = t_in & (det > 1e-9)
    safe_det = jnp.where(det > 1e-9, det, 1.0)
    inv00 = gyy / safe_det
    inv01 = -gxy / safe_det
    inv11 = gxx / safe_det

    def body(_, uv):
        x, y = uv
        cur, c_inw = _bilinear15(cb, x - crx, y - cry, h)
        # Patch fully inside the IMAGE too (XLA _in_image), and inside the
        # block's sampled window.
        x0 = jnp.floor(x) - h
        y0 = jnp.floor(y) - h
        c_img = (x0 >= 0) & (y0 >= 0) & (x0 + 2 * h + 1 < W) & (
            y0 + 2 * h + 1 < H)
        e = cur - tmpl
        bx = jnp.sum(gx * e)
        by = jnp.sum(gy * e)
        dx = inv00 * bx + inv01 * by
        dy = inv01 * bx + inv11 * by
        step_ok = ok & c_inw & c_img
        x = x - jnp.where(step_ok, dx, 0.0)
        y = y - jnp.where(step_ok, dy, 0.0)
        return (x, y)

    uv0 = (uvf_ref[k, 2], uvf_ref[k, 3])
    x, y = jax.lax.fori_loop(0, iters, body, uv0, unroll=True)

    inb = (x >= 1) & (x <= W - 2) & (y >= 1) & (y <= H - 2)
    # Outputs are whole-array SMEM blocks (all grid steps share them, each
    # writing its own row k): Mosaic rejects sub-array blocks like (1, 2)
    # even in SMEM — the only always-legal block shape for a scalar result
    # table is the full array.
    uv_out[k, 0] = x
    uv_out[k, 1] = y
    ok_out[k, 0] = (ok & inb).astype(jnp.int32)


def track_level0(prev_img, cur_img, uv_prev, uv_cur, cfg, iters,
                 interpret=False):
    """Level-0 IC-LK for all K tracks. Returns (uv_out (K,2), ok (K,))."""
    H, W = prev_img.shape
    K = uv_prev.shape[0]
    h = cfg.klt_halfwin
    assert W % 128 == 0 and W >= BW and H >= CB_R, (H, W)

    assert H % 8 == 0, H  # 8-aligned row origins need 8-aligned clip bounds

    def _orig(uv, rows, slackr):
        # Row origin rounded DOWN to a multiple of 8: Mosaic requires the
        # HBM-side DMA slice start to be divisible by the (8, 128) tile's
        # sublane dim (hardware lowering fails otherwise).  The block-row
        # budgets above absorb the up-to-7-row float.
        iy = jnp.nan_to_num(jnp.floor(uv[:, 1]), nan=0.0).astype(jnp.int32)
        ix = jnp.nan_to_num(jnp.floor(uv[:, 0]), nan=0.0).astype(jnp.int32)
        ry = jnp.clip((iy - h - slackr) // 8, 0, (H - rows) // 8)
        rx = jnp.clip((ix - h - 2) // 128, 0, W // 128 - BW // 128)
        return ry, rx

    pry, prx = _orig(uv_prev, PB_R, 2)
    # Current block: x origin one lane-tile left of the position's tile so
    # leftward motion has >=119 px of slack (rightward >=117).
    icy = jnp.nan_to_num(jnp.floor(uv_cur[:, 1]), nan=0.0).astype(jnp.int32)
    icx = jnp.nan_to_num(jnp.floor(uv_cur[:, 0]), nan=0.0).astype(jnp.int32)
    cry = jnp.clip((icy - h - 12) // 8, 0, (H - CB_R) // 8)
    crx = jnp.clip(icx // 128 - 1, 0, W // 128 - BW // 128)
    org = jnp.stack([pry, prx, cry, crx], axis=1)
    uvf = jnp.concatenate(
        [jnp.nan_to_num(uv_prev, nan=-1e6),
         jnp.nan_to_num(uv_cur, nan=-1e6)], axis=1).astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(K,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            # Scalar per-track results live in SMEM (a (1, 2) f32 block in
            # VMEM would violate the Mosaic (8, 128) vector-tiling rule) as
            # WHOLE-ARRAY blocks: Mosaic applies its block-shape rule to
            # SMEM sub-blocks too (a (1, 2) SMEM block fails lowering on
            # hardware — round-4 probe), but block == array dims is always
            # legal; each grid step writes only its own row k.
            pl.BlockSpec((K, 2), lambda k, org, uvf: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((K, 1), lambda k, org, uvf: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, PB_R, BW), jnp.float32),
            pltpu.VMEM((2, CB_R, BW), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    uv_out, ok = pl.pallas_call(
        functools.partial(_kernel, iters=iters, h=h, H=H, W=W),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((K, 2), jnp.float32),
            jax.ShapeDtypeStruct((K, 1), jnp.int32),
        ],
        interpret=interpret,
    )(org, uvf, prev_img, cur_img)
    return uv_out, ok[:, 0].astype(bool)
