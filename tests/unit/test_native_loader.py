"""Native async scan loader vs the Python reference reader."""
import os

import numpy as np
import pytest

from velo_tpu.io import kitti

native = pytest.importorskip("velo_tpu.io.native_loader")


@pytest.fixture(scope="module")
def bin_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("velodyne")
    rng = np.random.default_rng(3)
    scans = []
    for i in range(6):
        scan = (rng.random((500 + 113 * i, 4)) * 50).astype(np.float32)
        scan.tofile(d / f"{i:06d}.bin")
        scans.append(scan)
    return d, scans


def test_matches_python_reader(bin_dir):
    d, scans = bin_dir
    if native.load_library() is None:
        pytest.skip("no g++ available")
    loader = native.NativeScanLoader(str(d), n_max=2048)
    assert len(loader) == 6
    for i, (pts, mask) in enumerate(loader):
        ref, ref_mask = kitti.pad_scan(
            kitti.read_velodyne_bin(str(d / f"{i:06d}.bin")), 2048
        )
        np.testing.assert_array_equal(pts, ref)
        np.testing.assert_array_equal(mask, ref_mask)


def test_truncates_oversized(bin_dir):
    d, scans = bin_dir
    if native.load_library() is None:
        pytest.skip("no g++ available")
    loader = native.NativeScanLoader(str(d), n_max=600)
    for i, (pts, mask) in enumerate(loader):
        assert mask.sum() == min(600, scans[i].shape[0])


def test_missing_dir():
    if native.load_library() is None:
        pytest.skip("no g++ available")
    with pytest.raises(FileNotFoundError):
        native.NativeScanLoader("/nonexistent/path", n_max=128)


def test_binned_loader_matches_numpy_binning(tmp_path):
    """C++ in-worker binning == rangeimage.bin_scan_host, bit for bit."""
    if native.load_library() is None:
        pytest.skip("no g++ available")
    from velo_tpu.config import LidarConfig
    from velo_tpu.io import fixtures
    from velo_tpu.lidar import rangeimage as ri_mod

    fx = fixtures.make_fixture(n_frames=3, n_rings=16, n_azimuth=256,
                               with_images=False, seed=21)
    d = tmp_path / "velodyne"
    d.mkdir()
    for i, s in enumerate(fx.scans):
        s.astype(np.float32).tofile(d / f"{i:06d}.bin")

    for mode in ("uniform", "hdl64e"):
        cfg = LidarConfig(n_rings=16, n_azimuth=256, ring_mode=mode)
        loader = native.NativeBinnedScanLoader(str(d), cfg, n_max=16 * 256)
        for i, (grid, valid) in enumerate(loader):
            ref_grid, ref_valid = ri_mod.bin_scan_host(fx.scans[i], cfg)
            np.testing.assert_array_equal(valid, ref_valid), mode
            np.testing.assert_allclose(grid, ref_grid, atol=1e-6)
        loader.close()
