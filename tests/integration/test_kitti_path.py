"""End-to-end coverage of the REAL-data path (C1): --kitti-root CLI.

No KITTI data exists in this environment, so the simulator exports a
bit-faithful sequence directory (velodyne/*.bin float32 Nx4, image_0/*.png,
calib.txt P0-P3+Tr, times.txt, poses) under the real HDL-64E conventions
the CLI assumes (non-uniform two-block beam table, sweep start ~pi) —
exercising, in one pass: the native async loader + in-worker binning, the
hdl64e nearest-beam ring assignment, az_start=pi deskew phases, calib
parsing, threaded image read-ahead, and the fused solve.

Regression caught while building this: a scan with half the real azimuth
density (1024/ring in a 2048-bin image) leaves every other range-image
column empty, the curvature windows never qualify, and ALL frames
degenerate — so the exporter defaults to the real 2048.
"""
import json
import subprocess
import sys

import numpy as np
import pytest


@pytest.mark.slow
def test_cli_kitti_path_on_exported_sequence(tmp_path):
    from scripts import make_fake_kitti  # noqa: F401  (path check)

    root = tmp_path / "kitti"
    rc = subprocess.run(
        [sys.executable, "scripts/make_fake_kitti.py", "--out", str(root),
         "--frames", "5", "--azimuth", "2048"],
        capture_output=True, text=True, timeout=1200,
    )
    assert rc.returncode == 0, rc.stderr[-2000:]

    from velo_tpu import cli

    out = tmp_path / "out"
    assert cli.main(["--kitti-root", str(root), "--seq", "00",
                     "--frames", "5", "--out", str(out), "--json"]) == 0
    from velo_tpu.io import kitti

    est = kitti.read_poses(str(out / "00.txt"))
    gt = kitti.read_poses(str(root / "poses" / "00.txt"))
    assert est.shape == (5, 4, 4)
    # Relative per-frame motion within 10 cm of ground truth.
    rel_e = np.einsum("fij,fjk->fik", np.linalg.inv(est[:-1]), est[1:])
    rel_g = np.einsum("fij,fjk->fik", np.linalg.inv(gt[:-1]), gt[1:])
    err = np.linalg.norm(rel_e[:, :3, 3] - rel_g[:, :3, 3], axis=1)
    assert np.median(err) < 0.10, err
