"""Full-scale drift-trail pins: the automated held-out regression net.

Post-seam-fix, CI-scale (32x1024) fixtures diverge *qualitatively* from the
full-scale (64x2048) behavior on the held-out suburban family (tiny scans
made fake seam edges load-bearing pseudo-landmarks), so CI-scale pins can no
longer catch a 2x held-out regression.  Instead the TPU revalidation queue
(scripts/longrun.py --trail DRIFT_TRAIL.jsonl) appends every full-scale
measurement — with git SHA, generator and run metadata — to a committed
JSONL, and THIS test asserts the newest base-config rows of each fixture
family against absolute pins.  A regression that lands in a measured round
fails the suite everywhere from then on, not just in the hand-run harness.

Skips cleanly when no trail exists (fresh clone before any TPU run).
"""
import json
import os

import numpy as np
import pytest

TRAIL = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "DRIFT_TRAIL.jsonl")

# Absolute t_err %/100m pins per (world, sixdof, vision), set ~1.8x the
# round-5 recorded full-scale means (so per-seed chaos of +-0.5 on a 3-5
# seed mean stays clear, while a 2x family regression fails).  Refresh these
# alongside every recorded revalidation table.
PINS = {
    ("canyon", False, False): 1.8,
    ("canyon", False, True): 1.6,
    ("canyon", True, False): 4.4,
    ("canyon", True, True): 4.6,
    ("suburban", False, False): 1.3,
    ("suburban", False, True): 2.1,
}


def _family_rows():
    rows = []
    with open(TRAIL) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    # Full-scale, shipped-default, noise-free rows only.
    rows = [r for r in rows
            if r.get("variant") == "base" and r.get("rings", 0) >= 64
            and r.get("frames", 0) >= 100 and not r.get("noise")
            and not r.get("dropout")]
    fams = {}
    for r in rows:  # file order == measurement order; last SHA wins
        key = (r["world"], bool(r["sixdof"]), bool(r["vision"]))
        fams.setdefault(key, []).append(r)
    return fams


@pytest.mark.skipif(not os.path.exists(TRAIL),
                    reason="no DRIFT_TRAIL.jsonl recorded yet")
def test_full_scale_drift_trail_within_pins():
    fams = _family_rows()
    assert fams, "trail exists but holds no full-scale base rows"
    failures = []
    for key, rows in fams.items():
        if key not in PINS:
            continue
        newest_sha = rows[-1]["sha"]
        latest = [r for r in rows if r["sha"] == newest_sha]
        mean = float(np.mean([r["t_err_pct"] for r in latest]))
        if mean > PINS[key]:
            failures.append((key, newest_sha, round(mean, 3), PINS[key],
                             [r["seed"] for r in latest]))
    assert not failures, failures
