"""Sanity checks on the synthetic KITTI-like simulator."""
import numpy as np

from velo_tpu.io import fixtures, kitti


def test_raycast_hits_ground():
    world = fixtures.default_world()
    o = np.array([[0.0, 0.0, 0.0]])
    d = np.array([[0.0, 0.0, -1.0]])
    t, idx, n = fixtures.raycast(world, o, d)
    np.testing.assert_allclose(t[0], 1.73, atol=1e-9)
    np.testing.assert_allclose(n[0], [0, 0, 1], atol=1e-12)


def test_scan_statistics():
    world = fixtures.default_world()
    poses = fixtures.make_trajectory(2)
    scan = fixtures.simulate_velodyne(world, poses[0], poses[1], n_rings=16,
                                      n_azimuth=256)
    assert scan.shape[1] == 4
    r = np.linalg.norm(scan[:, :3], axis=1)
    assert scan.shape[0] > 500  # plenty of returns in a street canyon
    assert (r >= 2.5).all() and (r <= 80.0 + 1e-3).all()


def test_motion_distortion_present():
    """Same world scanned static vs moving must differ (deskew testability)."""
    world = fixtures.default_world()
    poses = fixtures.make_trajectory(2, speed=10.0)
    static = fixtures.simulate_velodyne(world, poses[0], poses[0], 16, 256)
    moving = fixtures.simulate_velodyne(world, poses[0], poses[1], 16, 256)
    # Last-azimuth-column points must shift by roughly the frame motion (~1 m).
    assert static.shape[0] != moving.shape[0] or not np.allclose(static, moving)


def test_render_has_texture():
    world = fixtures.default_world()
    P, T_cam_velo = fixtures.default_calib(96, 320)
    poses = fixtures.make_trajectory(1)
    img = fixtures.render_camera(world, poses[0] @ np.linalg.inv(T_cam_velo), P,
                                 96, 320)
    assert img.shape == (96, 320)
    assert img.std() > 0.05  # textured, trackable
    assert 0.0 <= img.min() and img.max() <= 1.0


def test_pad_scan():
    scan = np.ones((10, 4), np.float32)
    out, mask = kitti.pad_scan(scan, 16)
    assert out.shape == (16, 4) and mask.sum() == 10
    assert (out[10:] == 1e6).all()


def test_fixture_end_to_end(tmp_path):
    fx = fixtures.make_fixture(n_frames=3, n_rings=16, n_azimuth=256,
                               height=64, width=192)
    assert len(fx.scans) == 3 and fx.images.shape == (3, 64, 192)
    # GT cam poses start at identity (KITTI convention).
    np.testing.assert_allclose(fx.gt_poses_cam[0], np.eye(4), atol=1e-12)
    # Round-trip through the KITTI pose writer.
    p = tmp_path / "poses.txt"
    kitti.write_poses(str(p), fx.gt_poses_cam)
    back = kitti.read_poses(str(p))
    np.testing.assert_allclose(back, fx.gt_poses_cam, atol=1e-7)
