"""Summarize longrun JSONL outputs into per-variant mean tables.

Usage: python scripts/summarize_runs.py /tmp/r4v_*.jsonl

Each input line is one scripts/longrun.py row ({variant, seed, t_err_pct,
r_err_deg, ...}); output is one table row per (file, variant) with seed
count, per-seed values, and means — the format BUILD_NOTES tables use.
"""
import json
import sys
from collections import defaultdict


def main(paths):
    for path in paths:
        groups = defaultdict(list)
        try:
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        row = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    groups[row.get("variant", "?")].append(row)
        except OSError as e:
            print(f"{path}: {e}")
            continue
        if not groups:
            print(f"{path}: empty")
            continue
        print(f"== {path}")
        for variant, rows in groups.items():
            rows.sort(key=lambda r: r.get("seed", 0))
            seeds = [r.get("seed") for r in rows]
            t = [r["t_err_pct"] for r in rows]
            r_ = [r.get("r_err_deg", float("nan")) for r in rows]
            t_s = "/".join(f"{v:.2f}" for v in t)
            r_s = "/".join(f"{v:.2f}" for v in r_)
            print(f"  {variant:40s} seeds={seeds} t={t_s} "
                  f"(mean {sum(t) / len(t):.3f})  r={r_s} "
                  f"(mean {sum(r_) / len(r_):.3f})")


if __name__ == "__main__":
    main(sys.argv[1:] or sorted(
        __import__("glob").glob("/tmp/r4v_*.jsonl")))
