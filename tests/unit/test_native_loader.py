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
