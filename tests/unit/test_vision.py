"""Visual front-end: corners, KLT (vs OpenCV oracle), depth association."""
import jax.numpy as jnp
import numpy as np
import pytest

from velo_tpu.config import VisionConfig
from velo_tpu.geom import camera as cam_mod
from velo_tpu.io import fixtures
from velo_tpu.vision import corners, depth_assoc, klt, pyramid, tracks


def _render(seed=0, h=128, w=384, pose_idx=0, n_poses=2, speed=6.0):
    world = fixtures.default_world(seed)
    P, T_cam_velo = fixtures.default_calib(h, w)
    poses = fixtures.make_trajectory(n_poses, speed=speed, seed=seed + 2)
    imgs = [
        fixtures.render_camera(world, p @ np.linalg.inv(T_cam_velo), P, h, w)
        for p in poses
    ]
    return imgs, P, T_cam_velo, poses


def vcfg(**kw):
    base = dict(height=128, width=384, k_tracks=128, grid_rows=8,
                grid_cols=24, pyr_levels=3)
    base.update(kw)
    return VisionConfig(**base)


def test_corner_response_on_checkerboard():
    yy, xx = np.indices((128, 128))
    img = (((yy // 32) + (xx // 32)) % 2).astype(np.float32)  # 32px checker
    resp = np.asarray(corners.shi_tomasi_response(jnp.asarray(img)))
    inner = resp[8:-8, 8:-8]
    # Square corners (e.g. near (32,32)) must outscore straight edges and
    # flat interiors by a large margin.
    corner_resp = resp[30:35, 30:35].max()
    edge_resp = resp[30:35, 14:18].max()  # on a vertical edge, far from corner
    flat_resp = np.abs(resp[14:18, 14:18]).max()
    assert corner_resp > 5 * max(edge_resp, 1e-9)
    assert corner_resp > 50 * max(flat_resp, 1e-9)


def test_detect_spreads_over_grid():
    imgs, *_ = _render()
    cfg = vcfg()
    c = corners.detect(jnp.asarray(imgs[0]), cfg)
    assert int(c.valid.sum()) > 50  # textured scene: most buckets fire
    uv = np.asarray(c.uv)[np.asarray(c.valid)]
    assert uv[:, 0].std() > 50 and uv[:, 1].std() > 20  # spread out


def test_klt_recovers_known_shift():
    """Track against a synthetically translated image: flow must match."""
    imgs, *_ = _render()
    img = imgs[0]
    shift = (3, 5)  # (dy, dx) integer so the warp is exact
    img2 = np.roll(np.roll(img, shift[0], axis=0), shift[1], axis=1)
    cfg = vcfg()
    c = corners.detect(jnp.asarray(img), cfg)
    p_prev = pyramid.build_pyramid(jnp.asarray(img), cfg.pyr_levels)
    p_cur = pyramid.build_pyramid(jnp.asarray(img2), cfg.pyr_levels)
    g_prev = klt.frame_gradients(p_prev)
    g_cur = klt.frame_gradients(p_cur)
    res = klt.track(p_prev, p_cur, g_prev, g_cur, c.uv, c.valid, cfg)
    ok = np.asarray(res.ok)
    assert ok.sum() > 30
    flow = np.asarray(res.uv) - np.asarray(c.uv)
    err = np.abs(flow[ok] - np.array([shift[1], shift[0]]))
    assert np.median(err) < 0.1, np.median(err)
    assert np.percentile(err, 90) < 0.5


def test_klt_vs_opencv_on_real_motion():
    """Rendered frame pair with camera motion: compare against cv2 LK."""
    cv2 = pytest.importorskip("cv2")
    imgs, *_ = _render(n_poses=2, speed=6.0)
    cfg = vcfg(klt_iters=12)
    c = corners.detect(jnp.asarray(imgs[0]), cfg)
    p_prev = pyramid.build_pyramid(jnp.asarray(imgs[0]), cfg.pyr_levels)
    p_cur = pyramid.build_pyramid(jnp.asarray(imgs[1]), cfg.pyr_levels)
    res = klt.track(p_prev, p_cur, klt.frame_gradients(p_prev),
                    klt.frame_gradients(p_cur), c.uv, c.valid, cfg)

    a = (np.asarray(imgs[0]) * 255).astype(np.uint8)
    b = (np.asarray(imgs[1]) * 255).astype(np.uint8)
    pts = np.asarray(c.uv, np.float32).reshape(-1, 1, 2)
    cv_pts, st, err = cv2.calcOpticalFlowPyrLK(
        a, b, pts, None, winSize=(15, 15), maxLevel=cfg.pyr_levels - 1
    )
    both = np.asarray(res.ok) & (st.reshape(-1) == 1) & np.asarray(c.valid)
    assert both.sum() > 30
    diff = np.linalg.norm(
        np.asarray(res.uv)[both] - cv_pts.reshape(-1, 2)[both], axis=1
    )
    # Sub-pixel agreement with OpenCV for the vast majority of tracks.
    assert np.median(diff) < 0.35, np.median(diff)


def test_track_table_replenish_and_cull():
    cfg = vcfg()
    t = tracks.empty_tracks(cfg)
    imgs, *_ = _render()
    c = corners.detect(jnp.asarray(imgs[0]), cfg)
    t = tracks.replenish(t, c, cfg)
    n0 = int(t.active.sum())
    assert n0 > 50
    # Fail half the tracks -> slots free -> replenish refills them.
    ok = jnp.asarray(np.arange(cfg.k_tracks) % 2 == 0)
    t = tracks.after_tracking(t, t.uv, ok)
    assert int(t.active.sum()) < n0
    t2 = tracks.replenish(t, c, cfg)
    assert int(t2.active.sum()) >= int(t.active.sum())
    # No two active tracks share a grid bucket (spacing invariant).
    b = np.asarray(tracks._bucket_of(t2.uv, cfg))[np.asarray(t2.active)]
    assert len(np.unique(b)) == len(b)


def test_depth_association_exact_on_fixture():
    """Depth at a projected LiDAR point must match its true depth."""
    world = fixtures.default_world()
    h, w = 128, 384
    P, T_cam_velo = fixtures.default_calib(h, w)
    poses = fixtures.make_trajectory(2)
    scan = fixtures.simulate_velodyne(world, poses[0], poses[0], 48, 1500,
                                      elev_max_deg=5.0, elev_min_deg=-25.0)
    cfg = vcfg()
    cam = cam_mod.Camera(P=jnp.asarray(P, jnp.float32),
                         T_cam_velo=jnp.asarray(T_cam_velo, jnp.float32),
                         width=w, height=h)
    pts = jnp.asarray(scan[:, :3])
    mask = jnp.ones(len(scan), dtype=bool)
    grid = depth_assoc.build_depth_grid(pts, mask, cam, cfg)
    assert int(grid.valid.sum()) > 200

    # Query at the exact projections of a subset of scan points.
    from velo_tpu.geom import se3

    p_cam = se3.apply(cam.T_cam_velo[None], pts[None])[0]
    uv, z, front = cam_mod.project_depth(cam.P, p_cam)
    inside = np.asarray(front) & (np.asarray(uv)[:, 0] > 10) & (
        np.asarray(uv)[:, 0] < w - 10
    ) & (np.asarray(uv)[:, 1] > 10) & (np.asarray(uv)[:, 1] < h - 10)
    sel = np.nonzero(inside)[0][:: max(1, inside.sum() // 64)][:64]
    res = depth_assoc.associate(
        grid, jnp.asarray(np.asarray(uv)[sel]),
        jnp.ones(len(sel), dtype=bool), cam, cfg,
    )
    ok = np.asarray(res.ok)
    assert ok.sum() > 20
    err = np.abs(np.asarray(res.depth)[ok] - np.asarray(z)[sel][ok])
    assert np.median(err) < 0.05, np.median(err)


def test_bilinear_patches_matmul_matches_gather(rng):
    """MXU patch formulation == flat-gather sampling (interior features)."""
    img = jnp.asarray(rng.random((96, 256)).astype(np.float32))
    centers = jnp.asarray(
        rng.uniform([20, 20], [236, 76], (64, 2)).astype(np.float32)
    )
    h = 7
    p_mm, inb_mm = pyramid.bilinear_patches_matmul(img, centers, h)
    offs = pyramid.patch_offsets(h)
    p_g, inb_g = pyramid.bilinear_sample(
        img, centers[:, None, :] + offs[None]
    )
    assert bool(inb_mm.all())
    np.testing.assert_allclose(
        np.asarray(p_mm).reshape(64, -1), np.asarray(p_g), atol=1e-5
    )
    # Border feature flagged, not NaN.
    edge = jnp.asarray([[2.0, 2.0]], jnp.float32)
    p_e, inb_e = pyramid.bilinear_patches_matmul(img, edge, h)
    assert not bool(inb_e[0])
    assert np.isfinite(np.asarray(p_e)).all()


def test_klt_matmul_bf16_matches_gather_path():
    """Production TPU paths (global-matmul and local-window, bf16 selection
    operands) track the same flows as the exact gather path to well under
    tracking noise."""
    imgs, *_ = _render(n_poses=2, speed=6.0)
    c = corners.detect(jnp.asarray(imgs[0]), vcfg())
    flows = {}
    for impl, dtype in (("gather", "f32"), ("matmul", "bf16"),
                        ("window", "bf16")):
        cfg = vcfg(klt_impl=impl, klt_dtype=dtype)
        p_prev = pyramid.build_pyramid(jnp.asarray(imgs[0]), cfg.pyr_levels)
        p_cur = pyramid.build_pyramid(jnp.asarray(imgs[1]), cfg.pyr_levels)
        res = klt.track(p_prev, p_cur, klt.frame_gradients(p_prev),
                        klt.frame_gradients(p_cur), c.uv, c.valid, cfg)
        flows[impl] = res
    for impl in ("matmul", "window"):
        ok = (np.asarray(flows["gather"].ok) & np.asarray(flows[impl].ok))
        assert ok.sum() > 30, impl
        d = np.linalg.norm(np.asarray(flows["gather"].uv)[ok]
                           - np.asarray(flows[impl].uv)[ok], axis=1)
        assert np.median(d) < 0.05, (impl, np.median(d))
        assert np.percentile(d, 90) < 0.2, (impl, np.percentile(d, 90))


def test_track_residual_gate():
    """The appearance gate keeps true matches and culls when implausibly
    strict — i.e. it actually gates on the final patch residual."""
    imgs, *_ = _render()
    img = imgs[0]
    img2 = np.roll(np.roll(img, 3, axis=0), 5, axis=1)
    c = corners.detect(jnp.asarray(img), vcfg())
    p_prev = pyramid.build_pyramid(jnp.asarray(img), 3)
    p_cur = pyramid.build_pyramid(jnp.asarray(img2), 3)
    g_prev, g_cur = klt.frame_gradients(p_prev), klt.frame_gradients(p_cur)

    loose = klt.track(p_prev, p_cur, g_prev, g_cur, c.uv, c.valid,
                      vcfg(max_track_residual=0.05))
    off = klt.track(p_prev, p_cur, g_prev, g_cur, c.uv, c.valid, vcfg())
    # On an exact integer shift, converged tracks have near-zero residual:
    # a moderate gate must keep (almost) all of them.
    assert np.asarray(loose.ok).sum() >= 0.9 * np.asarray(off.ok).sum()
    flow = np.asarray(loose.uv) - np.asarray(c.uv)
    ok = np.asarray(loose.ok)
    assert np.median(np.abs(flow[ok] - np.array([5.0, 3.0]))) < 0.1

    # Real rendered motion (appearance actually changes between frames):
    # an implausibly strict gate must cull nearly everything, proving the
    # gate reads the final patch residual (on the exact-copy roll pair
    # above, converged residuals are legitimately ~0 and nothing culls).
    imgs2, *_ = _render(n_poses=2, speed=6.0)
    pp = pyramid.build_pyramid(jnp.asarray(imgs2[0]), 3)
    pc = pyramid.build_pyramid(jnp.asarray(imgs2[1]), 3)
    c2 = corners.detect(jnp.asarray(imgs2[0]), vcfg())
    off2 = klt.track(pp, pc, klt.frame_gradients(pp), klt.frame_gradients(pc),
                     c2.uv, c2.valid, vcfg())
    strict = klt.track(pp, pc, klt.frame_gradients(pp),
                       klt.frame_gradients(pc), c2.uv, c2.valid,
                       vcfg(max_track_residual=1e-6))
    assert np.asarray(strict.ok).sum() < 0.2 * np.asarray(off2.ok).sum()


def _hand_grid(cfg, cam, entries):
    """DepthGrid with exactly the given (u, v, z) winners (camera frame)."""
    c = cfg.depth_grid_cell
    rows, cols = cfg.height // c, cfg.width // c
    xyz = np.zeros((rows * cols, 3), np.float32)
    uv = np.full((rows * cols, 2), -1e4, np.float32)
    valid = np.zeros((rows * cols,), bool)
    for u, v, z in entries:
        x = (u - float(cam.cx)) / float(cam.fx) * z
        y = (v - float(cam.cy)) / float(cam.fy) * z
        idx = (int(v) // c) * cols + (int(u) // c)
        xyz[idx] = (x, y, z)
        uv[idx] = (u, v)
        valid[idx] = True
    return depth_assoc.DepthGrid(xyz=jnp.asarray(xyz), uv=jnp.asarray(uv),
                                 valid=jnp.asarray(valid),
                                 rows=rows, cols=cols)


def _assoc_one(cfg, cam, grid, u, v):
    res = depth_assoc.associate(grid, jnp.asarray([[u, v]], jnp.float32),
                                jnp.asarray([True]), cam, cfg)
    return bool(res.ok[0]), float(res.depth[0])


def test_depth_gate_occlusion_edge_rejected():
    """A fence-top T-junction: 3-NN all on the near plane (coplanar, small
    spread — passes every classic gate) but a pixel-near candidate sits
    20 m behind.  The coplanarity gate must reject; with it disabled the
    association returns the (wrong) foreground depth — the exact failure
    that cost 12-18 %/100m fused on the held-out suburban world."""
    import dataclasses

    h, w = 128, 384
    P, T_cam_velo = fixtures.default_calib(h, w)
    cam = cam_mod.Camera(P=jnp.asarray(P, jnp.float32),
                         T_cam_velo=jnp.asarray(T_cam_velo, jnp.float32),
                         width=w, height=h)
    cfg = vcfg()
    fence = [(94.0, 68.0, 10.0), (98.0, 60.0, 10.0), (102.0, 68.0, 10.0)]
    background = [(99.0, 71.0, 30.0)]
    grid = _hand_grid(cfg, cam, fence + background)
    ok, _ = _assoc_one(cfg, cam, grid, 99.0, 64.0)
    assert not ok, "occlusion edge must be rejected"
    loose = dataclasses.replace(cfg, max_plane_outlier=1e9)
    ok2, t2 = _assoc_one(loose, cam, grid, 99.0, 64.0)
    assert ok2 and abs(t2 - 10.0) < 0.3, (ok2, t2)  # gate was the reason


def test_depth_gate_receding_plane_kept():
    """A smooth receding surface has depth spread but stays coplanar: the
    occlusion gates must NOT reject it (corridor walls carry the forward-
    recovery signal)."""
    h, w = 128, 384
    P, T_cam_velo = fixtures.default_calib(h, w)
    cam = cam_mod.Camera(P=jnp.asarray(P, jnp.float32),
                         T_cam_velo=jnp.asarray(T_cam_velo, jnp.float32),
                         width=w, height=h)
    cfg = vcfg()
    fx = float(cam.cx)
    # Frontal-ish plane tilted in depth: z grows 0.1 m per px of u.
    pts = [(u, v, 10.0 + 0.1 * (u - 98.0))
           for u, v in ((94.0, 68.0), (98.0, 60.0), (102.0, 68.0),
                        (105.0, 64.0))]
    grid = _hand_grid(cfg, cam, pts)
    ok, t = _assoc_one(cfg, cam, grid, 99.0, 64.0)
    assert ok, "coplanar receding plane must keep its depth"
    assert abs(t - 10.1) < 0.5, t


def test_depth_gate_sensitivity_rejects_grazing():
    """Horizon ground: meters of depth per pixel of track error.  The
    |dt/duv| gate must reject; with the gate disabled the same query
    succeeds (the gate, not geometry, is the discriminator)."""
    import dataclasses

    h, w = 128, 384
    P, T_cam_velo = fixtures.default_calib(h, w)
    cam = cam_mod.Camera(P=jnp.asarray(P, jnp.float32),
                         T_cam_velo=jnp.asarray(T_cam_velo, jnp.float32),
                         width=w, height=h)
    cfg = vcfg()
    fy, cy = float(cam.fy), float(cam.cy)
    ycam = 1.7  # ground plane 1.7 m below the camera (y down)

    def ground(u, z):
        v = cy + fy * ycam / z
        return (u, v, z)

    pts = [ground(94.0, 25.0), ground(98.0, 26.0), ground(102.0, 27.0),
           ground(105.0, 26.5)]
    grid = _hand_grid(cfg, cam, pts)
    u_q, v_q, _ = ground(99.0, 26.2)
    ok, _ = _assoc_one(cfg, cam, grid, u_q, v_q)
    assert not ok, "grazing horizon ground must be rejected"
    loose = dataclasses.replace(cfg, max_depth_grad=1e9,
                                max_depth_spread=1e9,
                                min_plane_incidence=0.0,
                                depth_range_slack=1e9)
    ok2, t2 = _assoc_one(loose, cam, grid, u_q, v_q)
    assert ok2 and 24.0 < t2 < 29.0, (ok2, t2)
