"""Image pyramid + bilinear patch sampling — shared by corners/KLT.

Pure-JAX building blocks for the visual front-end.  Images are float32
(H, W) in [0, 1]; pyramids are tuples of static-shape levels (one compile per
image size).  The bilinear gather is the hot primitive of KLT: it samples
(K, P) patch points with 4 flat gathers + lerp, fully batched over features.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def blur3(img: jnp.ndarray) -> jnp.ndarray:
    """Separable [1 2 1]/4 binomial blur (edge-clamped)."""
    p = jnp.pad(img, ((1, 1), (1, 1)), mode="edge")
    h = (p[1:-1, :-2] + 2.0 * p[1:-1, 1:-1] + p[1:-1, 2:]) * 0.25
    p2 = jnp.pad(h, ((1, 1), (0, 0)), mode="edge")
    return (p2[:-2] + 2.0 * p2[1:-1] + p2[2:]) * 0.25


def downsample2(img: jnp.ndarray) -> jnp.ndarray:
    """Antialiased 2x downsample (blur then stride)."""
    b = blur3(img)
    return b[::2, ::2]


def build_pyramid(img: jnp.ndarray, levels: int):
    """Tuple of (H/2^l, W/2^l) images, level 0 = full resolution."""
    out = [img]
    for _ in range(levels - 1):
        out.append(downsample2(out[-1]))
    return tuple(out)


def scharr_gradients(img: jnp.ndarray):
    """Scharr 3x3 x/y gradients (edge-clamped), returned as (Ix, Iy)."""
    p = jnp.pad(img, ((1, 1), (1, 1)), mode="edge")
    # Scharr: d = [-1 0 1] smoothing s = [3 10 3] / 16
    gx = (
        3.0 * (p[:-2, 2:] - p[:-2, :-2])
        + 10.0 * (p[1:-1, 2:] - p[1:-1, :-2])
        + 3.0 * (p[2:, 2:] - p[2:, :-2])
    ) / 32.0
    gy = (
        3.0 * (p[2:, :-2] - p[:-2, :-2])
        + 10.0 * (p[2:, 1:-1] - p[:-2, 1:-1])
        + 3.0 * (p[2:, 2:] - p[:-2, 2:])
    ) / 32.0
    return gx, gy


def bilinear_sample(img: jnp.ndarray, xy: jnp.ndarray):
    """Sample img at float (…, 2) pixel coords (x, y) with border clamping.

    Returns (values (…,), in_bounds (…,)) — out-of-bounds samples are clamped
    but flagged so callers can invalidate features that left the image.
    """
    H, W = img.shape
    x = xy[..., 0]
    y = xy[..., 1]
    inb = (x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1)
    x = jnp.clip(x, 0.0, W - 1.001)
    y = jnp.clip(y, 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    flat = img.reshape(-1)
    i00 = flat[y0 * W + x0]
    i01 = flat[y0 * W + x0 + 1]
    i10 = flat[(y0 + 1) * W + x0]
    i11 = flat[(y0 + 1) * W + x0 + 1]
    top = i00 * (1 - fx) + i01 * fx
    bot = i10 * (1 - fx) + i11 * fx
    return top * (1 - fy) + bot * fy, inb


def patch_offsets(halfwin: int) -> jnp.ndarray:
    """((2h+1)^2, 2) integer offsets of a square patch, (x, y) order."""
    r = jnp.arange(-halfwin, halfwin + 1, dtype=jnp.float32)
    oy, ox = jnp.meshgrid(r, r, indexing="ij")
    return jnp.stack([ox.reshape(-1), oy.reshape(-1)], axis=-1)


def bilinear_patches_matmul(img: jnp.ndarray, centers: jnp.ndarray,
                            halfwin: int, dtype=None):
    """Bilinear (K, S, S) patches around float centers — zero gathers.

    TPU executes arbitrary-index gathers on the scalar unit (the KLT level
    loops cost ~74 ms/frame that way in the fused-program device trace), so
    this formulation moves patch extraction to the MXU: bilinear sampling in
    x is a weighted two-diagonal column-selection matmul shared by all K
    features, and sampling in y a small batched row-selection matmul:

        strips  = img @ Wcol(x0, fx)      # (H, W) @ (W, K*S) -> (H, K*S)
        patches = Wrow(y0, fy) @ strips   # batched (K, S, H) @ (K, H, S)

    With ``dtype=bfloat16`` the selection operands run one MXU pass instead
    of the multi-pass fp32 emulation (~6x cheaper; the production KLT path
    uses this): intensities are in [0,1] and the subpixel weights only need
    ~2^-8 relative precision, so the quantization (~4e-3 intensity, ~0.004 px
    in the weights) is far below KLT's tracking noise — accumulation stays
    fp32 via ``preferred_element_type``.

    Returns (patches (K, S, S) float32, in_bounds (K,)); out-of-image
    rows/cols select nothing (zero weight), and `in_bounds` flags affected
    features.
    """
    H, W = img.shape
    K = centers.shape[0]
    S = 2 * halfwin + 1
    x = centers[:, 0]
    y = centers[:, 1]
    x0 = jnp.floor(x).astype(jnp.int32) - halfwin
    y0 = jnp.floor(y).astype(jnp.int32) - halfwin
    fx = x - jnp.floor(x)
    fy = y - jnp.floor(y)
    inb = (x0 >= 0) & (y0 >= 0) & (x0 + S < W) & (y0 + S < H)

    src = jnp.arange(W, dtype=jnp.int32)[:, None, None]  # (W,1,1)
    tgt = x0[None, :, None] + jnp.arange(S, dtype=jnp.int32)[None, None, :]
    wcol = (src == tgt) * (1.0 - fx)[None, :, None] + (src == tgt + 1) * fx[
        None, :, None
    ]  # (W, K, S)

    rsrc = jnp.arange(H, dtype=jnp.int32)[None, None, :]  # (1,1,H)
    rtgt = y0[:, None, None] + jnp.arange(S, dtype=jnp.int32)[None, :, None]
    wrow = (rsrc == rtgt) * (1.0 - fy)[:, None, None] + (rsrc == rtgt + 1) * fy[
        :, None, None
    ]  # (K, S, H)

    if dtype is not None:
        strips = jnp.einsum(
            "hw,wks->hks", img.astype(dtype), wcol.astype(dtype),
            preferred_element_type=jnp.float32,
        )  # (H, K, S)
        patches = jnp.einsum(
            "krh,hkc->krc", wrow.astype(dtype), strips.astype(dtype),
            preferred_element_type=jnp.float32,
        )  # (K, S, S)
    else:
        strips = jnp.einsum(
            "hw,wks->hks", img, wcol, precision=jax.lax.Precision.HIGHEST
        )
        patches = jnp.einsum(
            "krh,hkc->krc", wrow, strips,
            precision=jax.lax.Precision.HIGHEST
        )
    return patches, inb


def bilinear_patches_matmul_multi(imgs: jnp.ndarray, centers: jnp.ndarray,
                                  halfwin: int, dtype=None):
    """(C, K, S, S) bilinear patches of a channel stack — one matmul pair.

    Same construction as :func:`bilinear_patches_matmul`, but the C channels
    (e.g. template image + its two gradients, which KLT samples at identical
    centers) share the selection weights, so the whole stack costs one
    ``chw,wks->chks`` + one ``krh,chks->ckrs`` instead of C separate pairs —
    the selection-weight construction and wcol HBM traffic amortize C-fold.
    """
    C, H, W = imgs.shape
    K = centers.shape[0]
    S = 2 * halfwin + 1
    x = centers[:, 0]
    y = centers[:, 1]
    x0 = jnp.floor(x).astype(jnp.int32) - halfwin
    y0 = jnp.floor(y).astype(jnp.int32) - halfwin
    fx = x - jnp.floor(x)
    fy = y - jnp.floor(y)
    inb = (x0 >= 0) & (y0 >= 0) & (x0 + S < W) & (y0 + S < H)

    src = jnp.arange(W, dtype=jnp.int32)[:, None, None]
    tgt = x0[None, :, None] + jnp.arange(S, dtype=jnp.int32)[None, None, :]
    wcol = (src == tgt) * (1.0 - fx)[None, :, None] + (src == tgt + 1) * fx[
        None, :, None
    ]  # (W, K, S)
    rsrc = jnp.arange(H, dtype=jnp.int32)[None, None, :]
    rtgt = y0[:, None, None] + jnp.arange(S, dtype=jnp.int32)[None, :, None]
    wrow = (rsrc == rtgt) * (1.0 - fy)[:, None, None] + (rsrc == rtgt + 1) * fy[
        :, None, None
    ]  # (K, S, H)

    if dtype is not None:
        strips = jnp.einsum("chw,wks->chks", imgs.astype(dtype),
                            wcol.astype(dtype),
                            preferred_element_type=jnp.float32)
        patches = jnp.einsum("krh,chks->ckrs", wrow.astype(dtype),
                             strips.astype(dtype),
                             preferred_element_type=jnp.float32)
    else:
        strips = jnp.einsum("chw,wks->chks", imgs, wcol,
                            precision=jax.lax.Precision.HIGHEST)
        patches = jnp.einsum("krh,chks->ckrs", wrow, strips,
                             precision=jax.lax.Precision.HIGHEST)
    return patches, inb


def integer_windows(imgs: jnp.ndarray, topleft: jnp.ndarray, size: int,
                    dtype=None):
    """Integer-anchored (C, K, size, size) windows via selection matmuls.

    ``imgs``: (C, H, W) channel stack (image + gradients share the same
    selection weights); ``topleft``: (K, 2) int32 (x0, y0) window corners.
    Out-of-image rows/cols select nothing (zero fill) — callers track
    in-bounds flags themselves.  This is the once-per-level extraction of
    the local-window KLT: after it, every GN iteration samples from these
    windows instead of the full image, making per-iteration cost
    independent of image size.
    """
    C, H, W = imgs.shape
    src = jnp.arange(W, dtype=jnp.int32)[:, None, None]  # (W,1,1)
    tgt = topleft[None, :, 0, None] + jnp.arange(size, dtype=jnp.int32)[None, None]
    wcol = (src == tgt).astype(imgs.dtype)  # (W, K, size)
    rsrc = jnp.arange(H, dtype=jnp.int32)[None, None, :]  # (1,1,H)
    rtgt = (topleft[:, 1][:, None, None]
            + jnp.arange(size, dtype=jnp.int32)[None, :, None])
    wrow = (rsrc == rtgt).astype(imgs.dtype)  # (K, size, H)
    if dtype is not None:
        strips = jnp.einsum("chw,wks->chks", imgs.astype(dtype),
                            wcol.astype(dtype),
                            preferred_element_type=jnp.float32)
        wins = jnp.einsum("krh,chks->ckrs", wrow.astype(dtype),
                          strips.astype(dtype),
                          preferred_element_type=jnp.float32)
    else:
        strips = jnp.einsum("chw,wks->chks", imgs, wcol,
                            precision=jax.lax.Precision.HIGHEST)
        wins = jnp.einsum("krh,chks->ckrs", wrow, strips,
                          precision=jax.lax.Precision.HIGHEST)
    return wins  # (C, K, size, size)


def bilinear_patches_local(wins: jnp.ndarray, luv: jnp.ndarray,
                           halfwin: int):
    """Bilinear (K, S, S) patches from per-track local windows.

    ``wins``: (K, Sw, Sw) windows; ``luv``: (K, 2) float patch centers in
    window-local coordinates.  Per-track two small selection matmuls —
    K x ((S, Sw) @ (Sw, Sw) @ (Sw, S)) — a few MFLOP total regardless of
    image or pyramid level size.  Returns (patches, in_window flag).
    """
    K, Sw, _ = wins.shape
    S = 2 * halfwin + 1
    x = luv[:, 0]
    y = luv[:, 1]
    x0 = jnp.floor(x).astype(jnp.int32) - halfwin
    y0 = jnp.floor(y).astype(jnp.int32) - halfwin
    fx = x - jnp.floor(x)
    fy = y - jnp.floor(y)
    inw = (x0 >= 0) & (y0 >= 0) & (x0 + S < Sw) & (y0 + S < Sw)

    src = jnp.arange(Sw, dtype=jnp.int32)[None, :, None]  # (1,Sw,1)
    tgt = x0[:, None, None] + jnp.arange(S, dtype=jnp.int32)[None, None, :]
    wcol = ((src == tgt) * (1.0 - fx)[:, None, None]
            + (src == tgt + 1) * fx[:, None, None])  # (K, Sw, S)
    rsrc = jnp.arange(Sw, dtype=jnp.int32)[None, None, :]  # (1,1,Sw)
    rtgt = y0[:, None, None] + jnp.arange(S, dtype=jnp.int32)[None, :, None]
    wrow = ((rsrc == rtgt) * (1.0 - fy)[:, None, None]
            + (rsrc == rtgt + 1) * fy[:, None, None])  # (K, S, Sw)
    rows = jnp.einsum("ksw,kwv->ksv", wrow, wins)  # (K, S, Sw)
    patches = jnp.einsum("ksv,kvc->ksc", rows, wcol)  # (K, S, S)
    return patches, inw
