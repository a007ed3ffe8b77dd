"""Aggregate a jax.profiler TensorBoard trace into a per-op cost table.

Usage: python benchmarks/parse_trace.py [trace_root=/tmp/mmr_trace] [top_n=40]

Reads the newest ``*.trace.json.gz`` under the root, keeps device-side events
(the axon/TPU device pid carries 'hlo_category' args), and prints total
duration grouped by (a) hlo_category and (b) the op's long_name/source —
the decomposition evidence used for the roofline ledger in docs/PERF.md.
"""

from __future__ import annotations

import collections
import gzip
import json
import re
import sys
from pathlib import Path


def load_events(root: str):
    paths = sorted(Path(root).rglob("*.trace.json.gz"),
                   key=lambda p: p.stat().st_mtime)
    if not paths:
        raise SystemExit(f"no trace under {root}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", []), paths[-1]


def main():
    # --detail SUBSTR: itemize events whose name/category matches SUBSTR by
    # their full long_name (shapes included) — the drill-down used to break
    # open opaque fusion buckets (docs/PERF.md round-5, VERDICT r4 #4)
    detail = None
    argv = list(sys.argv[1:])
    if "--detail" in argv:
        i = argv.index("--detail")
        detail = argv[i + 1]
        del argv[i:i + 2]
    root = argv[0] if argv else "/tmp/mmr_trace"
    top_n = int(argv[1]) if len(argv) > 1 else 40
    events, path = load_events(root)
    print(f"# {path}")

    dev = [e for e in events
           if e.get("ph") == "X" and isinstance(e.get("args"), dict)
           and "hlo_category" in e["args"]]
    if not dev:  # fall back: any complete event with a duration
        dev = [e for e in events if e.get("ph") == "X" and e.get("dur")]
    total = sum(e["dur"] for e in dev)
    print(f"{len(dev)} device events, total {total / 1e3:.2f} ms "
          f"(all steps in trace)")

    by_cat = collections.Counter()
    by_name = collections.Counter()
    calls = collections.Counter()
    for e in dev:
        a = e.get("args", {})
        cat = a.get("hlo_category", "?")
        by_cat[cat] += e["dur"]
        # group fusions by their name stem (strip trailing .N / digits)
        name = e.get("name", "?")
        stem = re.sub(r"[.\d]+$", "", name)
        key = f"{cat:18s} {stem}"
        by_name[key] += e["dur"]
        calls[key] += 1

    print("\n== by hlo_category ==")
    for cat, dur in by_cat.most_common():
        print(f"{dur / 1e3:9.2f} ms  {100 * dur / total:5.1f}%  {cat}")

    print(f"\n== top {top_n} op groups ==")
    for key, dur in by_name.most_common(top_n):
        print(f"{dur / 1e3:9.2f} ms  {100 * dur / total:5.1f}%  "
              f"x{calls[key]:<5d} {key}")

    if detail:
        by_long = collections.Counter()
        lcalls = collections.Counter()
        for e in dev:
            a = e.get("args", {})
            name = e.get("name", "?")
            if detail not in name and detail not in a.get("hlo_category", ""):
                continue
            ln = a.get("long_name") or a.get("tf_op") or name
            by_long[ln] += e["dur"]
            lcalls[ln] += 1
        sub = sum(by_long.values())
        print(f"\n== detail '{detail}': {sub / 1e3:.2f} ms across "
              f"{sum(lcalls.values())} events ==")
        for ln, dur in by_long.most_common(top_n):
            print(f"{dur / 1e3:9.2f} ms  x{lcalls[ln]:<5d} {ln[:240]}")


if __name__ == "__main__":
    main()
