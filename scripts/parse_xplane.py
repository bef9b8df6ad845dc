"""Parse a saved .xplane.pb into a per-op device-time table (see
profile_step.py for the capture side).

Usage: python scripts/parse_xplane.py <xplane.pb|logdir> [--steps N] [--top K]
"""
import argparse
import glob
import json
import os
import sys


def load_rows(xplane, tool="framework_op_stats"):
    from xprof.convert import raw_to_tool_data as conv

    data, _ = conv.xspace_to_tool_data([xplane], tool + "^", {})
    if isinstance(data, bytes):
        data = data.decode()
    tables = json.loads(data)
    if isinstance(tables, dict):
        tables = [tables]
    out = []
    for tb in tables:
        cols = [c["id"] for c in tb["cols"]]
        for row in tb.get("rows", []):
            vals = [c.get("v") if isinstance(c, dict) else c
                    for c in row.get("c", row)]
            out.append(dict(zip(cols, vals)))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path", nargs="?", default="/tmp/velo_profile")
    ap.add_argument("--steps", type=int, default=8,
                    help="steps captured, for ms/step normalization")
    ap.add_argument("--top", type=int, default=35)
    args = ap.parse_args()

    path = args.path
    if os.path.isdir(path):
        xs = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                              recursive=True), key=os.path.getmtime)
        assert xs, f"no xplane under {path}"
        path = xs[-1]
    print(f"xplane: {path}", file=sys.stderr)

    rows = load_rows(path)
    dev = [r for r in rows if str(r.get("host_or_device", "")).lower()
           == "device"]
    total = sum(float(r.get("total_self_time") or 0) for r in dev)
    print(f"== device self-time {total/1e3:.2f} ms total, "
          f"{total/1e3/args.steps:.2f} ms/step ==")
    dev.sort(key=lambda r: -float(r.get("total_self_time") or 0))
    for r in dev[:args.top]:
        t = float(r.get("total_self_time") or 0)
        print(f"{t/1e3:9.3f} ms {100*t/max(total,1e-9):5.1f}%  "
              f"x{int(float(r.get('occurrences') or 0)):5d}  "
              f"{str(r.get('type','?'))[:18]:18s} "
              f"{str(r.get('operation','?'))[:95]}")


if __name__ == "__main__":
    main()
