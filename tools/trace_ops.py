"""Aggregate a jax.profiler trace into a per-op time table.

Converts the xplane protobuf with xprof's ``raw_to_tool_data`` (the
tensorboard profile plugin backend) and prints the top HLO ops by total
device time — the measurement harness behind the round-2 hot-spot hunt.

Usage:
    python tools/profile_step.py --trace /tmp/tb ...   # capture
    python tools/trace_ops.py /tmp/tb [--top 40] [--by program]
"""

import argparse
import collections
import json
import sys
from pathlib import Path


def find_xplane(trace_dir: str) -> str:
    hits = sorted(Path(trace_dir).rglob("*.xplane.pb"),
                  key=lambda p: p.stat().st_mtime)
    if not hits:
        sys.exit(f"no *.xplane.pb under {trace_dir}")
    return str(hits[-1])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("trace_dir")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--by", default="op",
                   choices=["op", "category", "program"],
                   help="group rows by HLO op name, op category, or "
                        "program (jit function)")
    args = p.parse_args()

    from xprof.convert import raw_to_tool_data as convert

    xplane = find_xplane(args.trace_dir)
    data, _ = convert.xspace_to_tool_data([xplane], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    table = json.loads(data)
    # hlo_stats GViz JSON: {"cols": [...], "rows": [{"c": [{"v": ...}]}]}
    cols = [c["label"] for c in table["cols"]]
    idx = {label: i for i, label in enumerate(cols)}

    def col(row, label, default=None):
        i = idx.get(label)
        if i is None:
            return default
        cell = row["c"][i]
        return cell.get("v") if cell else default

    want = {"op": ("hlo op name", "op name"),
            "category": ("hlo op category", "op category"),
            "program": ("program name", "program id")}[args.by]
    key_label = next((c for c in cols if c.lower() in want), None)
    if key_label is None:
        cands = [c for c in cols if args.by in c.lower()]
        key_label = cands[0] if cands else cols[0]
    time_label = next((c for c in cols if "occurrences" not in c.lower()
                       and "time" in c.lower() and "%" not in c), None)

    agg = collections.Counter()
    cat_of = {}
    for row in table["rows"]:
        k = col(row, key_label, "?")
        t = col(row, time_label, 0.0) or 0.0
        agg[k] += float(t)
        cat_of[k] = col(row, "Op Category", "")

    total = sum(agg.values())
    unit = time_label or "time"
    print(f"# columns: {cols}")
    print(f"# grouped by {key_label!r}, metric {unit!r}, "
          f"total {total:.1f}")
    print(f"{'cum%':>6} {'%':>6} {unit:>14}  {'category':<22} name")
    cum = 0.0
    for k, t in agg.most_common(args.top):
        cum += t
        print(f"{100*cum/total:6.1f} {100*t/total:6.1f} {t:14.1f}  "
              f"{cat_of.get(k, ''):<22} {str(k)[:90]}")


if __name__ == "__main__":
    main()
