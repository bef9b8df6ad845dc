"""Parity of the Pallas level-0 IC-LK kernel vs the XLA reference path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from velo_tpu.config import VisionConfig
from velo_tpu.pallas import klt_l0
from velo_tpu.vision import klt, pyramid as pyr


def _setup(seed=0, H=64, W=512, K=32):
    rng = np.random.default_rng(seed)
    # Smooth-ish random image so GN has real structure to lock onto.
    img = rng.uniform(0.0, 1.0, (H // 4, W // 4))
    img = np.kron(img, np.ones((4, 4)))
    img = (img + rng.uniform(0, 0.05, (H, W))).astype(np.float32)
    # Current image: the previous one shifted by a known subpixel flow.
    dx, dy = 1.3, -0.7
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    from scipy.ndimage import map_coordinates
    cur = map_coordinates(img, [yy + dy, xx + dx], order=1,
                          mode="nearest").astype(np.float32)
    uv_prev = np.stack([
        rng.uniform(24, W - 24, K), rng.uniform(16, H - 16, K)],
        axis=1).astype(np.float32)
    uv_cur = uv_prev + rng.uniform(-2, 2, (K, 2)).astype(np.float32)
    return jnp.asarray(img), jnp.asarray(cur), jnp.asarray(uv_prev), \
        jnp.asarray(uv_cur)


@pytest.mark.parametrize("iters", [4, 8])
def test_level0_matches_gather_path(iters):
    prev, cur, uv_prev, uv_cur = _setup(iters)
    cfg = VisionConfig(height=prev.shape[0], width=prev.shape[1],
                       klt_impl="gather")
    gx, gy = pyr.scharr_gradients(prev)
    uv_ref, ok_ref = klt._track_level(prev, gx, gy, cur, uv_prev, uv_cur,
                                      cfg, iters=iters)
    uv_pal, ok_pal = klt_l0.track_level0(prev, cur, uv_prev, uv_cur, cfg,
                                         iters, interpret=True)
    uv_ref = np.asarray(uv_ref)
    uv_pal = np.asarray(uv_pal)
    ok_ref = np.asarray(ok_ref)
    ok_pal = np.asarray(ok_pal)
    # Interior tracks: same validity and sub-1e-2 px agreement (both f32,
    # different reduction order).
    assert (ok_pal == ok_ref).mean() > 0.95
    both = ok_pal & ok_ref
    assert both.sum() >= 20
    d = np.abs(uv_pal[both] - uv_ref[both]).max()
    assert d < 1e-2, d


def test_level0_converges_to_true_flow():
    prev, cur, uv_prev, _ = _setup(3)
    cfg = VisionConfig(height=prev.shape[0], width=prev.shape[1])
    uv, ok = klt_l0.track_level0(prev, cur, uv_prev, uv_prev, cfg, 8,
                                 interpret=True)
    flow = np.asarray(uv - uv_prev)[np.asarray(ok)]
    assert len(flow) >= 20
    med = np.median(flow, axis=0)
    # cur(x) = prev(x + d) means features land at x - d in the current
    # image: the true flow is (-dx, -dy).
    assert np.abs(med - np.array([-1.3, 0.7])).max() < 0.2, med


def test_track_pipeline_with_pallas_impl():
    """Full fwd+FB track() with klt_impl='pallas' (level 0 kernel, coarse
    levels on the fallback path) agrees with the gather reference."""
    prev, cur, uv_prev, _ = _setup(7, H=64, W=512, K=48)
    base = dict(height=prev.shape[0], width=prev.shape[1], pyr_levels=3,
                k_tracks=48)
    pp = pyr.build_pyramid(prev, 3)
    cp = pyr.build_pyramid(cur, 3)
    gp = klt.frame_gradients(pp)
    gc = klt.frame_gradients(cp)
    valid = jnp.ones(uv_prev.shape[0], bool)
    r_ref = klt.track(pp, cp, gp, gc, uv_prev, valid,
                      VisionConfig(klt_impl="gather", **base))
    r_pal = klt.track(pp, cp, gp, gc, uv_prev, valid,
                      VisionConfig(klt_impl="pallas", **base))
    ok_ref = np.asarray(r_ref.ok)
    ok_pal = np.asarray(r_pal.ok)
    assert (ok_ref == ok_pal).mean() > 0.9
    both = ok_ref & ok_pal
    assert both.sum() >= 30
    d = np.abs(np.asarray(r_pal.uv)[both] - np.asarray(r_ref.uv)[both])
    assert d.max() < 0.05, d.max()


def test_level0_freezes_out_of_image():
    prev, cur, uv_prev, uv_cur = _setup(5)
    cfg = VisionConfig(height=prev.shape[0], width=prev.shape[1])
    bad = jnp.asarray(
        np.array([[2.0, 2.0], [500.0, 60.0], [np.nan, np.nan]], np.float32))
    uvp = jnp.concatenate([uv_prev[:5], bad])
    uvc = jnp.concatenate([uv_cur[:5], bad])
    uv, ok = klt_l0.track_level0(prev, cur, uvp, uvc, cfg, 4,
                                 interpret=True)
    assert not bool(ok[5]) and not bool(ok[6]) and not bool(ok[7])
