"""Parity of the JAX-accelerated simulator vs the numpy reference.

fixtures_accel runs the identical slab raycast in f32 under jax.jit; these
tests pin that the fixture a consumer sees (scans, images, noise/dropout
realization) matches the numpy path to float32 tolerance, so A/Bs run on
accel-generated fixtures are comparable with the historical numpy ones.
"""
import numpy as np
import pytest

from velo_tpu.io import fixtures, fixtures_accel


def _make(accel, monkeypatch, **kw):
    monkeypatch.setenv("VELO_FIX_ACCEL", "1" if accel else "0")
    return fixtures.make_fixture(**kw)


@pytest.mark.parametrize("noise_std,dropout", [(0.0, 0.0), (0.02, 0.05)])
def test_fixture_parity(monkeypatch, noise_std, dropout):
    kw = dict(n_frames=3, n_rings=16, n_azimuth=256, height=48, width=96,
              with_images=True, speed=8.0, seed=3, noise_std=noise_std,
              dropout=dropout)
    ref = _make(False, monkeypatch, **kw)
    acc = _make(True, monkeypatch, **kw)
    np.testing.assert_allclose(acc.gt_poses_velo, ref.gt_poses_velo)
    for s_ref, s_acc in zip(ref.scans, acc.scans):
        # f32 raycast can flip borderline min/max-range survivors; the
        # overwhelming majority of points must agree to f32 precision.
        n = min(len(s_ref), len(s_acc))
        assert abs(len(s_ref) - len(s_acc)) <= max(2, 0.001 * n)
        # Compare common prefix where rows align (same filtering order).
        d = np.linalg.norm(s_ref[:n, :3] - s_acc[:n, :3], axis=1)
        assert np.percentile(d, 99) < 1e-3, d.max()
    # Images: shading identical up to f32 ray-t error; a handful of pixels
    # on box edges may pick a different (tied) normal axis.
    d = np.abs(ref.images - acc.images)
    assert np.percentile(d, 99.9) < 1e-2
    assert d.mean() < 1e-4


def test_sweep_batch_matches_raycast(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    world = fixtures.default_world(1)
    poses = fixtures.make_trajectory(3, speed=8.0, seed=5)
    t, dirs_s = fixtures_accel.simulate_sweep_batch(
        world, poses, n_rings=8, n_azimuth=128, elev_max_deg=2.0,
        elev_min_deg=-24.8, max_range=80.0)
    assert t.shape == (2, 8 * 128)
    # Frame 0 against the reference raycast at the interpolated poses.
    scan_ref = fixtures.simulate_velodyne(world, poses[0], poses[1],
                                          n_rings=8, n_azimuth=128)
    scan_acc = fixtures_accel.finish_scan(t[0], dirs_s, None, 0.0)
    assert abs(len(scan_ref) - len(scan_acc)) <= 2
    n = min(len(scan_ref), len(scan_acc))
    d = np.linalg.norm(scan_ref[:n, :3] - scan_acc[:n, :3], axis=1)
    assert np.percentile(d, 99) < 1e-3
