"""LiDAR front-end: range image, curvature, feature picks, deskew."""
import jax.numpy as jnp
import numpy as np

from velo_tpu.config import LidarConfig
from velo_tpu.io import fixtures
from velo_tpu.lidar import curvature, deskew, features, rangeimage


def small_cfg(**kw):
    base = dict(n_rings=16, n_azimuth=256, n_sectors=8, min_range=1.0,
                max_range=100.0)
    base.update(kw)
    return LidarConfig(**base)


def grid_points(cfg, radius_fn):
    """Exact (ring, col) lattice of points at given per-cell radius."""
    elev = np.deg2rad(
        np.linspace(cfg.elev_max_deg, cfg.elev_min_deg, cfg.n_rings)
    )
    phase = (np.arange(cfg.n_azimuth) + 0.5) / cfg.n_azimuth
    az = -2 * np.pi * phase
    E, A = np.meshgrid(elev, az, indexing="ij")
    r = radius_fn(E, A)
    pts = np.stack(
        [r * np.cos(E) * np.cos(A), r * np.cos(E) * np.sin(A), r * np.sin(E)],
        axis=-1,
    ).reshape(-1, 3).astype(np.float32)
    ph = np.broadcast_to(phase[None, :], E.shape).reshape(-1).astype(np.float32)
    return pts, ph


def test_range_image_roundtrip():
    cfg = small_cfg()
    pts, ph = grid_points(cfg, lambda E, A: 10.0 + 0 * E)
    mask = np.ones(len(pts), bool)
    ri = rangeimage.build_range_image(
        jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(ph), cfg
    )
    assert bool(ri.valid.all())
    np.testing.assert_allclose(
        np.asarray(ri.xyz).reshape(-1, 3), pts, atol=1e-5
    )


def test_range_image_nearest_wins():
    cfg = small_cfg()
    # Two points in the same cell: ranges 5 and 9 -> 5 must win.
    elev = np.deg2rad(cfg.elev_max_deg)
    d = np.array([np.cos(elev), 0.0, np.sin(elev)])
    pts = np.stack([5.0 * d, 9.0 * d]).astype(np.float32)
    ri = rangeimage.build_range_image(
        jnp.asarray(pts), jnp.ones(2, dtype=bool),
        jnp.zeros(2, dtype=jnp.float32), cfg,
    )
    v = np.asarray(ri.rng)[0, 0]
    np.testing.assert_allclose(v, 5.0, atol=1e-5)
    assert np.asarray(ri.valid).sum() == 1


def test_masked_points_ignored():
    cfg = small_cfg()
    pts, ph = grid_points(cfg, lambda E, A: 10.0 + 0 * E)
    mask = np.ones(len(pts), bool)
    # Append garbage with mask False — output must be identical.
    bad = np.full((100, 3), 7.7, np.float32)
    pts2 = np.concatenate([pts, bad])
    mask2 = np.concatenate([mask, np.zeros(100, bool)])
    ph2 = np.concatenate([ph, np.zeros(100, np.float32)])
    a = rangeimage.build_range_image(jnp.asarray(pts), jnp.asarray(mask),
                                     jnp.asarray(ph), cfg)
    b = rangeimage.build_range_image(jnp.asarray(pts2), jnp.asarray(mask2),
                                     jnp.asarray(ph2), cfg)
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    np.testing.assert_allclose(np.asarray(a.xyz), np.asarray(b.xyz))


def numpy_curvature(xyz, valid, h, phase=None):
    """Slow reference implementation of ring curvature."""
    R, W, _ = xyz.shape
    curv = np.zeros((R, W))
    scored = np.zeros((R, W), bool)
    for r in range(R):
        for c in range(W):
            if not valid[r, c]:
                continue
            idx = [(c + j) % W for j in range(-h, h + 1) if j != 0]
            if not all(valid[r, i] for i in idx):
                continue
            if phase is not None:
                # Sweep-seam rule: windows whose phase span exceeds half a
                # sweep mix points ~0.1 s apart and are not scored.
                win_ph = [phase[r, i] for i in idx] + [phase[r, c]]
                if max(win_ph) - min(win_ph) > 0.5:
                    continue
            A = np.mean([xyz[r, (c - j) % W] for j in range(1, h + 1)], axis=0)
            B = np.mean([xyz[r, (c + j) % W] for j in range(1, h + 1)], axis=0)
            u = B - A
            cross = np.cross(xyz[r, c] - A, u)
            curv[r, c] = 2 * np.linalg.norm(cross) / max((u * u).sum(), 1e-8)
            scored[r, c] = True
    return curv, scored


def test_curvature_vs_numpy_reference():
    cfg = small_cfg()
    rng = np.random.default_rng(5)
    pts, ph = grid_points(cfg, lambda E, A: 10.0 + np.sin(5 * A) * 2.0)
    mask = rng.random(len(pts)) > 0.1  # drop 10% to exercise masking
    ri = rangeimage.build_range_image(jnp.asarray(pts), jnp.asarray(mask),
                                      jnp.asarray(ph), cfg)
    cr = curvature.compute_curvature(ri, cfg)
    ref_c, ref_s = numpy_curvature(
        np.asarray(ri.xyz), np.asarray(ri.valid), cfg.curvature_halfwin,
        phase=np.asarray(ri.phase),
    )
    np.testing.assert_array_equal(np.asarray(cr.scored), ref_s)
    np.testing.assert_allclose(
        np.asarray(cr.curv)[ref_s], ref_c[ref_s], atol=1e-5
    )


def test_features_on_corner_scene():
    """Vertical corner between two walls -> edges at the corner azimuth,
    planars on the flats."""
    cfg = small_cfg(elev_max_deg=10.0, elev_min_deg=-10.0)

    def radius(E, A):
        # Two planes x=10 (front) and y=-10 (right): visible ranges.
        with np.errstate(divide="ignore"):
            r_front = np.where(np.cos(A) > 0.05, 10.0 / np.maximum(np.cos(A) * np.cos(E), 1e-3), np.inf)
            r_right = np.where(np.sin(A) < -0.05, -10.0 / np.minimum(np.sin(A) * np.cos(E), -1e-3), np.inf)
        return np.minimum(r_front, r_right).clip(0, 60.0)

    pts, ph = grid_points(cfg, radius)
    keep = np.linalg.norm(pts, axis=1) < 50.0
    ri = rangeimage.build_range_image(
        jnp.asarray(pts[keep]), jnp.asarray(np.ones(keep.sum(), bool)),
        jnp.asarray(ph[keep]), cfg,
    )
    cr = curvature.compute_curvature(ri, cfg)
    fts = features.select_features(ri, cr, cfg)

    edges = np.asarray(fts.edges)[np.asarray(fts.edge_mask)]
    planars = np.asarray(fts.planars)[np.asarray(fts.planar_mask)]
    assert len(edges) > 4 and len(planars) > 50
    # The physical corner is the line x=10, y=-10: all edges near it in xy.
    d_corner = np.linalg.norm(edges[:, :2] - np.array([10.0, -10.0]), axis=1)
    assert np.median(d_corner) < 1.5, d_corner
    # Planars lie on one of the two walls.
    wall_err = np.minimum(np.abs(planars[:, 0] - 10.0),
                          np.abs(planars[:, 1] + 10.0))
    assert np.percentile(wall_err, 90) < 0.05


def test_deskew_restores_geometry():
    """Motion-distorted scan of the box world: after deskew, points must lie
    on the world surfaces (raw distorted points do not)."""
    world = fixtures.default_world()
    poses = fixtures.make_trajectory(2, speed=12.0)
    scan = fixtures.simulate_velodyne(world, poses[0], poses[1], 32, 512)
    pts = jnp.asarray(scan[:, :3])

    delta = np.linalg.inv(poses[0]) @ poses[1]
    from velo_tpu.geom import se3

    xi = se3.log(jnp.asarray(delta, jnp.float32))
    fixed, s = deskew.deskew(pts, xi)

    def surface_dist(p_world):
        # Distance to the nearest box surface (outside distance only).
        world_min = fixtures.default_world().mins
        world_max = fixtures.default_world().maxs
        d = np.maximum(world_min[None] - p_world[:, None],
                       p_world[:, None] - world_max[None])
        inside = (d <= 0).all(axis=2)
        dmax = np.abs(d).min(axis=2)  # closest face when inside-ish
        per_box = np.where(inside, dmax, np.linalg.norm(np.maximum(d, 0), axis=2))
        return per_box.min(axis=1)

    T0 = poses[0]
    raw_w = (np.asarray(pts) @ T0[:3, :3].T) + T0[:3, 3]
    fix_w = (np.asarray(fixed) @ T0[:3, :3].T) + T0[:3, 3]
    # Ground points stay on the (infinite) ground plane under planar motion,
    # so restrict the raw-vs-fixed comparison to structure above the ground.
    off_ground = raw_w[:, 2] > -1.2
    err_raw = surface_dist(raw_w[off_ground])
    err_fix = surface_dist(fix_w[off_ground])
    assert np.median(err_fix) < 0.02, np.median(err_fix)
    assert np.median(err_raw) > 5 * np.median(err_fix), (
        np.median(err_raw), np.median(err_fix))


def test_apply_scaled_exp_matches_matrix_path(rng):
    """Axis-shared Rodrigues fast path == per-point exp(s*xi) matrices."""
    from velo_tpu.geom import se3

    pts = jnp.asarray(rng.normal(size=(500, 3)).astype(np.float32) * 20)
    s = jnp.asarray(rng.random(500).astype(np.float32))
    for xi_np in [
        np.array([0.8, -0.2, 0.05, 0.01, -0.02, 0.06], np.float32),
        np.array([0.5, 0.0, 0.0, 0.0, 0.0, 0.0], np.float32),  # pure trans
        np.zeros(6, np.float32),
        np.array([0.1, 0.2, 0.3, 0.3, -0.2, 0.25], np.float32),  # big rot
    ]:
        xi = jnp.asarray(xi_np)
        ref = se3.apply_one(se3.exp(s[:, None] * xi[None, :]), pts)
        fast = deskew.apply_scaled_exp(pts, s, xi)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                   atol=2e-4)


def test_hdl64e_ring_assignment():
    """Points generated on the nominal HDL-64E beam table must map back to
    their generating ring under ring_mode='hdl64e' (uniform interpolation
    misassigns the lower block)."""
    from velo_tpu.config import LidarConfig
    from velo_tpu.lidar import rangeimage as ri_mod

    beams = ri_mod.hdl64e_beam_elevations(64)
    rng = np.random.default_rng(0)
    rings = rng.integers(0, 64, 4096)
    az = rng.uniform(-np.pi, np.pi, 4096)
    r = rng.uniform(5.0, 40.0, 4096)
    elev = beams[rings]
    pts = np.stack([
        r * np.cos(elev) * np.cos(az),
        r * np.cos(elev) * np.sin(az),
        r * np.sin(elev),
    ], axis=1).astype(np.float32)

    from velo_tpu.lidar import deskew as deskew_mod

    cfg = LidarConfig(n_rings=64, n_azimuth=512, ring_mode="hdl64e")
    phase = deskew_mod.azimuth_phase(jnp.asarray(pts))
    ri = ri_mod.build_range_image(jnp.asarray(pts),
                                  jnp.ones(4096, bool), phase, cfg)
    # Every stored point must be on its generating ring: reconstruct ring
    # from stored xyz elevation and compare to the row it landed in.
    xyz = np.asarray(ri.xyz).reshape(64, 512, 3)
    valid = np.asarray(ri.valid).reshape(64, 512)
    rows, cols = np.nonzero(valid)
    stored = xyz[rows, cols]
    elev_s = np.arcsin(stored[:, 2] / np.linalg.norm(stored, axis=1))
    ring_true = np.argmin(np.abs(elev_s[:, None] - beams[None, :]), axis=1)
    assert np.array_equal(ring_true, rows)
    assert valid.sum() > 3000  # most points survive

    # Uniform interpolation on the same data misassigns lower-block rings.
    cfg_lin = LidarConfig(n_rings=64, n_azimuth=512, ring_mode="linear")
    ri_lin = ri_mod.build_range_image(jnp.asarray(pts),
                                      jnp.ones(4096, bool), phase, cfg_lin)
    valid_lin = np.asarray(ri_lin.valid).reshape(64, 512)
    rows_l, cols_l = np.nonzero(valid_lin)
    xyz_l = np.asarray(ri_lin.xyz).reshape(64, 512, 3)[rows_l, cols_l]
    elev_l = np.arcsin(xyz_l[:, 2] / np.linalg.norm(xyz_l, axis=1))
    ring_true_l = np.argmin(np.abs(elev_l[:, None] - beams[None, :]), axis=1)
    assert (ring_true_l != rows_l).mean() > 0.2  # demonstrably wrong


def test_az_start_phase_convention():
    """KITTI sweeps start near the rear (az ~ pi): with az_start=pi a point
    at azimuth pi has phase ~0 and one just clockwise of it phase ~>0."""
    from velo_tpu.lidar import deskew as deskew_mod

    # Clockwise spin from az_start=pi: pi -> pi/2 -> 0 -> -pi/2 -> -pi.
    pts = np.asarray([
        [-10.0, 0.01, 0.0],    # az ~ +pi-eps: first measured
        [-0.01, 10.0, 0.0],    # az ~ +pi/2: quarter sweep later
        [10.0, 0.0, 0.0],      # az = 0: half sweep
        [0.01, -10.0, 0.0],    # az = -pi/2: three quarters
    ], dtype=np.float32)
    s = np.asarray(deskew_mod.azimuth_phase(jnp.asarray(pts),
                                            az_start=float(np.pi)))
    assert s[0] < 0.01
    np.testing.assert_allclose(s[1], 0.25, atol=0.01)
    np.testing.assert_allclose(s[2], 0.5, atol=0.01)
    np.testing.assert_allclose(s[3], 0.75, atol=0.01)


def test_host_prebin_matches_device_path():
    """Host pre-binned grid == device scatter-min range image at zero motion,
    and the full step produces matching poses on a moving fixture."""
    import jax
    import jax.numpy as jnp

    from velo_tpu.config import LidarConfig
    from velo_tpu.io import fixtures, kitti
    from velo_tpu.lidar import deskew as deskew_mod
    from velo_tpu.lidar import rangeimage as ri_mod

    cfg = LidarConfig(n_rings=16, n_azimuth=256)
    fx = fixtures.make_fixture(n_frames=2, n_rings=16, n_azimuth=256,
                               with_images=False, seed=9)
    scan, mask = kitti.pad_scan(fx.scans[0], 16 * 256)

    # Device path at zero motion.
    pts3, phase = deskew_mod.deskew(jnp.asarray(scan[:, :3]),
                                    jnp.zeros(6, jnp.float32))
    ri_dev = ri_mod.build_range_image(pts3, jnp.asarray(mask), phase, cfg)
    # Host path.
    grid, valid = ri_mod.bin_scan_host(scan[mask], cfg)
    ri_host = ri_mod.range_image_from_grid(
        jnp.asarray(grid), jnp.asarray(valid), jnp.zeros(6, jnp.float32),
        cfg)
    np.testing.assert_array_equal(np.asarray(ri_dev.valid),
                                  np.asarray(ri_host.valid))
    v = np.asarray(ri_dev.valid)
    np.testing.assert_allclose(np.asarray(ri_dev.xyz)[v],
                               np.asarray(ri_host.xyz)[v], atol=1e-5)
    np.testing.assert_allclose(np.asarray(ri_dev.rng)[v],
                               np.asarray(ri_host.rng)[v], atol=1e-5)

    # With motion, winners may differ only at ring-boundary cells.
    xi = jnp.asarray([0.8, 0.05, 0.01, 0.004, 0.002, 0.02], jnp.float32)
    pts3m, phasem = deskew_mod.deskew(jnp.asarray(scan[:, :3]), xi)
    ri_dev_m = ri_mod.build_range_image(pts3m, jnp.asarray(mask), phasem,
                                        cfg)
    ri_host_m = ri_mod.range_image_from_grid(
        jnp.asarray(grid), jnp.asarray(valid), xi, cfg)
    same = (np.asarray(ri_dev_m.valid) == np.asarray(ri_host_m.valid))
    assert same.mean() > 0.94, same.mean()
    both = np.asarray(ri_dev_m.valid) & np.asarray(ri_host_m.valid)
    d = np.linalg.norm(np.asarray(ri_dev_m.xyz)[both]
                       - np.asarray(ri_host_m.xyz)[both], axis=-1)
    # Cells whose winner matches must deskew to identical coordinates.
    assert np.median(d) < 1e-5


def test_prebin_pipeline_matches_raw_pipeline():
    """End-to-end: prebin_host poses track the raw-scan poses closely."""
    import dataclasses

    from velo_tpu.config import (LidarConfig, MapConfig, SolverConfig,
                                 VeloConfig)
    from velo_tpu.io import fixtures, kitti
    from velo_tpu.lidar import rangeimage as ri_mod
    from velo_tpu.pipeline import odometry

    cfg = VeloConfig(
        lidar=LidarConfig(n_rings=16, n_azimuth=256, n_sectors=8),
        solver=SolverConfig(hash_capacity=1024, icp_iters_odom=2,
                            icp_iters_map=2, icp_iters_redeskew=1,
                            lm_iters=2),
        map=MapConfig(edge_capacity=1024, planar_capacity=2048),
        n_max_points=4096, use_vision=False, use_map=True,
    )
    fx = fixtures.make_fixture(n_frames=6, n_rings=16, n_azimuth=256,
                               with_images=False, seed=11)
    raw_frames = [kitti.pad_scan(s, 4096) for s in fx.scans]
    raw_poses, _ = odometry.run_sequence_host(raw_frames, cfg)

    pcfg = dataclasses.replace(cfg, prebin_host=True)
    grid_frames = [ri_mod.bin_scan_host(s, cfg.lidar) for s in fx.scans]
    pre_poses, _ = odometry.run_sequence_host(grid_frames, pcfg)
    # Identical except for ring-boundary winner flips under motion.
    np.testing.assert_allclose(pre_poses[:, :3, 3], raw_poses[:, :3, 3],
                               atol=0.03)


def test_seam_windows_not_scored():
    """Curvature windows crossing the sweep seam are excluded (the column
    order there no longer matches spatial order once the sensor moves —
    measured 20-30x inflated curvature medians, above the edge gate)."""
    from velo_tpu.io import fixtures, kitti
    from velo_tpu.lidar import rangeimage as ri_mod

    cfg = small_cfg()
    fx = fixtures.make_fixture(n_frames=1, n_rings=cfg.n_rings,
                               n_azimuth=cfg.n_azimuth, with_images=False,
                               seed=4, speed=8.0)
    grid, valid = ri_mod.bin_scan_host(fx.scans[0], cfg)
    xi = jnp.asarray([0.8, 0.02, 0.0, 0.0, 0.0, 0.01], jnp.float32)
    ri = ri_mod.range_image_from_grid(jnp.asarray(grid), jnp.asarray(valid),
                                      xi, cfg)
    cr = curvature.compute_curvature(ri, cfg)
    scored = np.asarray(cr.scored)
    ph = np.asarray(ri.phase)
    h = cfg.curvature_halfwin
    # Direct property: no scored window spans the wrap.
    for r, c in zip(*np.where(scored)):
        win = [ph[r, (c + j) % cfg.n_azimuth] for j in range(-h, h + 1)]
        assert max(win) - min(win) <= 0.5, (r, c)
    # And plenty of mid-sweep cells still score.
    assert scored.sum() > 0.5 * np.asarray(ri.valid).sum()
