"""Pallas TPU kernel for one pyramid level of inverse-compositional KLT (C7).

Why a kernel: the pure-JAX tracker samples patches with flat gathers over
(K, P) indices, and inside the fused odometry program XLA executes those on
the TPU *scalar unit* — the device trace showed ~74 ms/frame in the six KLT
level loops, dominating the fused pipeline.  The kernel replaces every gather
with aligned vector loads:

  * the whole pyramid level (image, gradients) sits in VMEM;
  * one program per feature loads a (2R, S+1) block whose row start is
    aligned to the 8-sublane grid (a Mosaic requirement for dynamic vector
    loads), then shifts it to the wanted un-aligned row window with a one-hot
    selection matmul — MXU work instead of scalar loads:

        rows = onehot(dy) @ block          # (S+1, 2R) @ (2R, S+1)

  * bilinear weights combine the four shifted (S, S) windows (pure VPU);
  * the fixed-template Gauss-Newton iteration runs entirely in-kernel.

Semantics match `velo_tpu.vision.klt._track_level` (the pure-JAX oracle in
tests): same template, same 2x2 normal matrix, same update rule; features
whose sample window would leave the image are flagged invalid and unmoved.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bilinear_region(ref, y0, x0, fy, fx, size, height, width):
    """Bilinear (size, size) patch at unaligned float anchor, gather-free.

    Mosaic requires dynamic vector-load starts aligned to the (8, 128) tile
    grid, so arbitrary 2D slices are out.  Instead: load a *full-width* row
    block at an 8-aligned row base (only the sublane start is dynamic, and it
    is provably a multiple of 8), then fold BOTH the unaligned row/column
    window selection AND the bilinear interpolation into two tiny weighted
    selection matmuls on the MXU:

        patch = W_row(dy, fy) @ block @ W_col(x0, fx)

    where each selector has two shifted diagonals weighted (1-f, f).
    """
    rows = ((size + 8 + 7) // 8) * 8  # dy<=7 + size+1 span, rounded up to 8
    # (height - rows) is a multiple of 8 for all supported level shapes, so
    # the clip preserves 8-alignment; pl.multiple_of makes it provable.
    y0a = pl.multiple_of(
        jnp.clip((y0 // 8) * 8, 0, ((height - rows) // 8) * 8), 8
    )
    dy = y0 - y0a
    block = ref[pl.ds(y0a, rows), :]  # (rows, W) — aligned dynamic row start

    r_ids = jax.lax.broadcasted_iota(jnp.int32, (size, rows), 0)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (size, rows), 1)
    wrow = (c_ids == r_ids + dy).astype(jnp.float32) * (1.0 - fy) + (
        c_ids == r_ids + dy + 1
    ).astype(jnp.float32) * fy

    s_ids = jax.lax.broadcasted_iota(jnp.int32, (width, size), 0)
    o_ids = jax.lax.broadcasted_iota(jnp.int32, (width, size), 1)
    wcol = (s_ids == o_ids + x0).astype(jnp.float32) * (1.0 - fx) + (
        s_ids == o_ids + x0 + 1
    ).astype(jnp.float32) * fx

    tmp = jax.lax.dot_general(
        wrow, block, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (size, W)
    return jax.lax.dot_general(
        tmp, wcol, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (size, size)


def _track_level_kernel(uv_prev_ref, uv_init_ref, img_prev_ref, gx_ref,
                        gy_ref, img_cur_ref, uv_out_ref, ok_ref, *, halfwin,
                        iters, height, width):
    i = pl.program_id(0)
    S = 2 * halfwin + 1

    uv_p = uv_prev_ref[pl.ds(i, 1), :]  # (1, 2) row load
    px = uv_p[0, 0]
    py = uv_p[0, 1]
    # Template anchor: integer corner + fractional part, clamped in-bounds.
    tx0 = jnp.floor(px).astype(jnp.int32) - halfwin
    ty0 = jnp.floor(py).astype(jnp.int32) - halfwin
    t_in = (tx0 >= 0) & (ty0 >= 0) & (tx0 + S + 1 <= width) & (
        ty0 + S + 9 <= height
    )
    tx0c = jnp.clip(tx0, 0, width - S - 1)
    ty0c = jnp.clip(ty0, 0, height - S - 9)
    tfx = px - jnp.floor(px)
    tfy = py - jnp.floor(py)

    args = (tfy, tfx, S, height, width)
    tmpl = _bilinear_region(img_prev_ref, ty0c, tx0c, *args)
    gx = _bilinear_region(gx_ref, ty0c, tx0c, *args)
    gy = _bilinear_region(gy_ref, ty0c, tx0c, *args)

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
        ux, uy = uv
        cx0 = jnp.floor(ux).astype(jnp.int32) - halfwin
        cy0 = jnp.floor(uy).astype(jnp.int32) - halfwin
        c_in = (cx0 >= 0) & (cy0 >= 0) & (cx0 + S + 1 <= width) & (
            cy0 + S + 9 <= height
        )
        cx0c = jnp.clip(cx0, 0, width - S - 1)
        cy0c = jnp.clip(cy0, 0, height - S - 9)
        cfx = ux - jnp.floor(ux)
        cfy = uy - jnp.floor(uy)
        cur = _bilinear_region(img_cur_ref, cy0c, cx0c, cfy, cfx, S, height,
                               width)
        e = cur - tmpl
        bx = jnp.sum(gx * e)
        by = jnp.sum(gy * e)
        dx = inv00 * bx + inv01 * by
        dy = inv01 * bx + inv11 * by
        step_ok = ok & c_in
        ux = ux - jnp.where(step_ok, dx, 0.0)
        uy = uy - jnp.where(step_ok, dy, 0.0)
        return (ux, uy)

    uv_i = uv_init_ref[pl.ds(i, 1), :]
    ux, uy = jax.lax.fori_loop(0, iters, body, (uv_i[0, 0], uv_i[0, 1]))
    inb = (ux >= 1.0) & (ux <= width - 2.0) & (uy >= 1.0) & (
        uy <= height - 2.0
    )
    uv_out_ref[pl.ds(i, 1), :] = jnp.stack([ux, uy]).reshape(1, 2)
    ok_ref[pl.ds(i, 1), :] = (ok & inb).astype(jnp.int32).reshape(1, 1)


@functools.partial(jax.jit, static_argnames=("halfwin", "iters", "interpret"))
def track_level(img_prev, gx, gy, img_cur, uv_prev, uv_init, halfwin: int,
                iters: int, interpret: bool = False):
    """Pallas one-level IC-LK for all K features.

    Returns (uv_out (K,2) float32, ok (K,) bool) with the same semantics as
    the pure-JAX `_track_level` (which remains the oracle in tests).  The
    kernel's in-bounds margin is slightly stricter (8 alignment rows), so a
    few border features may be flagged invalid that the oracle tracks.
    """
    K = uv_prev.shape[0]
    H, W = img_prev.shape
    kernel = functools.partial(
        _track_level_kernel, halfwin=halfwin, iters=iters, height=H, width=W
    )
    uv_out, ok = pl.pallas_call(
        kernel,
        grid=(K,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # uv_prev
            pl.BlockSpec(memory_space=pltpu.VMEM),  # uv_init
            pl.BlockSpec(memory_space=pltpu.VMEM),  # img_prev
            pl.BlockSpec(memory_space=pltpu.VMEM),  # gx
            pl.BlockSpec(memory_space=pltpu.VMEM),  # gy
            pl.BlockSpec(memory_space=pltpu.VMEM),  # img_cur
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((K, 2), jnp.float32),
            jax.ShapeDtypeStruct((K, 1), jnp.int32),
        ),
        interpret=interpret,
    )(uv_prev, uv_init, img_prev, gx, gy, img_cur)
    return uv_out, ok[:, 0].astype(bool)
