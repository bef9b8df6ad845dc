"""Config-5 user-facing driver: batched multi-sequence CLI (SURVEY.md §2)."""
import json

import numpy as np
import pytest


@pytest.mark.slow
def test_batch_cli_sharded(tmp_path, capsys):
    """8 synthetic sequences vmapped + sharded over the fake 8-CPU mesh,
    in the production host-pre-binned (R, W, 5) grid layout (the default,
    matching bench.py / the single-sequence CLI)."""
    import jax

    from velo_tpu import cli

    assert len(jax.devices()) == 8  # conftest fake mesh
    rc = cli.main([
        "--synthetic", "--batch", "8", "--frames", "3",
        "--rings", "16", "--azimuth", "256",
        "--out", str(tmp_path), "--shard",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    result = json.loads(out)
    assert result["batch"] == 8 and result["sharded"]
    assert result["prebin"]  # grid layout actually exercised
    assert len(result["sequences"]) == 8
    assert all(np.isfinite(r["ate_rmse_m"]) for r in result["sequences"])
    # All 8 pose files written.
    for b in range(8):
        assert (tmp_path / f"seq{b:02d}.txt").exists()


@pytest.mark.slow
def test_batch_cli_sharded_raw_layout(tmp_path, capsys):
    """--no-prebin keeps the raw padded (N, 4) layout working sharded."""
    from velo_tpu import cli

    rc = cli.main([
        "--synthetic", "--batch", "8", "--frames", "3",
        "--rings", "16", "--azimuth", "256", "--no-prebin",
        "--out", str(tmp_path), "--shard", "--no-vision",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    result = json.loads(out)
    assert result["sharded"] and not result["prebin"]
    assert all(np.isfinite(r["ate_rmse_m"]) for r in result["sequences"])
