"""Pallas TPU kernel for one pyramid level of inverse-compositional KLT (C7).

Why a kernel: the pure-JAX tracker samples patches with flat gathers —
`img.reshape(-1)[y0*W + x0]` over (K, P) indices — and XLA executes
arbitrary-index gathers on the TPU *scalar unit*, serializing ~millions of
loads per frame.  The kernel formulation replaces every gather with a 2D
**dynamic slice** (the fast, contiguous TPU memory path):

  * the whole pyramid level (image, gradients) sits in VMEM;
  * one program per feature slices an (S+1, S+1) region at the integer part
    of the sample position, then forms the bilinear patch from the four
    shifted (S, S) windows with scalar corner weights — pure VPU math:

        patch = w00*R[:-1,:-1] + w01*R[:-1,1:] + w10*R[1:,:-1] + w11*R[1:,1:]

  * the fixed-template Gauss-Newton iteration runs entirely in-kernel
    (template + gradient slices loaded once, `fori_loop` over iterations).

Semantics match `velo_tpu.vision.klt._track_level` (the interpret-mode /
pure-JAX oracle in tests): same template, same 2x2 normal matrix, same
update rule; features whose (slightly padded) sample window would leave the
image are flagged invalid and left unmoved.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bilinear_region(ref, y0, x0, fy, fx, size):
    """Bilinear patch (size, size) from a (size+1, size+1) dynamic slice."""
    R = ref[pl.ds(y0, size + 1), pl.ds(x0, size + 1)]
    w00 = (1.0 - fy) * (1.0 - fx)
    w01 = (1.0 - fy) * fx
    w10 = fy * (1.0 - fx)
    w11 = fy * fx
    return (
        w00 * R[:-1, :-1]
        + w01 * R[:-1, 1:]
        + w10 * R[1:, :-1]
        + w11 * R[1:, 1:]
    )


def _track_level_kernel(uv_prev_ref, uv_init_ref, img_prev_ref, gx_ref,
                        gy_ref, img_cur_ref, uv_out_ref, ok_ref, *, halfwin,
                        iters, height, width):
    i = pl.program_id(0)
    S = 2 * halfwin + 1

    px = uv_prev_ref[i, 0]
    py = uv_prev_ref[i, 1]
    # Template anchor: integer corner + fractional part, clamped in-bounds.
    tx0 = jnp.floor(px).astype(jnp.int32) - halfwin
    ty0 = jnp.floor(py).astype(jnp.int32) - halfwin
    t_in = (tx0 >= 0) & (ty0 >= 0) & (tx0 + S + 1 <= width) & (
        ty0 + S + 1 <= height
    )
    tx0c = jnp.clip(tx0, 0, width - S - 1)
    ty0c = jnp.clip(ty0, 0, height - S - 1)
    tfx = px - jnp.floor(px)
    tfy = py - jnp.floor(py)

    tmpl = _bilinear_region(img_prev_ref, ty0c, tx0c, tfy, tfx, S)
    gx = _bilinear_region(gx_ref, ty0c, tx0c, tfy, tfx, S)
    gy = _bilinear_region(gy_ref, ty0c, tx0c, tfy, tfx, S)

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
            cy0 + S + 1 <= height
        )
        cx0c = jnp.clip(cx0, 0, width - S - 1)
        cy0c = jnp.clip(cy0, 0, height - S - 1)
        cfx = ux - jnp.floor(ux)
        cfy = uy - jnp.floor(uy)
        cur = _bilinear_region(img_cur_ref, cy0c, cx0c, cfy, cfx, S)
        e = cur - tmpl
        bx = jnp.sum(gx * e)
        by = jnp.sum(gy * e)
        dx = inv00 * bx + inv01 * by
        dy = inv01 * bx + inv11 * by
        step_ok = ok & c_in
        ux = ux - jnp.where(step_ok, dx, 0.0)
        uy = uy - jnp.where(step_ok, dy, 0.0)
        return (ux, uy)

    ux, uy = jax.lax.fori_loop(
        0, iters, body, (uv_init_ref[i, 0], uv_init_ref[i, 1])
    )
    inb = (ux >= 1.0) & (ux <= width - 2.0) & (uy >= 1.0) & (
        uy <= height - 2.0
    )
    uv_out_ref[i, 0] = ux
    uv_out_ref[i, 1] = uy
    ok_ref[i] = (ok & inb).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("halfwin", "iters", "interpret"))
def track_level(img_prev, gx, gy, img_cur, uv_prev, uv_init, halfwin: int,
                iters: int, interpret: bool = False):
    """Pallas one-level IC-LK for all K features.

    Returns (uv_out (K,2) float32, ok (K,) bool) with the same semantics as
    the pure-JAX `_track_level` (which remains the oracle in tests).
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
            jax.ShapeDtypeStruct((K,), jnp.int32),
        ),
        interpret=interpret,
    )(uv_prev, uv_init, img_prev, gx, gy, img_cur)
    return uv_out, ok.astype(bool)
