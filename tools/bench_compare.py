"""Canary-normalized per-query bench comparison (VERDICT r04 #5).

The bench VM's speed swings ±30% between identical-code runs (measured in
round 4: tpch_q1 moved 1.3 -> 10.0 s with zero code delta), so raw
per-query diffs across rounds mostly grade the host, not the code.
``bench.py`` therefore times fixed canary work every run (pure-CPU sum,
a lineitem parquet scan, a 3-micro-batch file stream); this tool divides
each query's wall time by its family's canary before comparing runs.

Usage:
    python tools/bench_compare.py OLD_DETAIL.json NEW_DETAIL.json [threshold]

- OLD/NEW are BENCH_DETAIL.json files (the full per-query map bench.py
  writes). Threshold defaults to 1.5 (normalized slowdown that flags).
- streaming_* queries normalize by the stream canary (fsync/scheduler
  latency dimension); everything else by the scan canary.
- Queries under 0.3 s in BOTH runs are never flagged (scheduler noise
  dominates there).

Exit code 0 always — the output table is the deliverable; the closing
sweep triages anything in the FLAGGED section.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as fh:
        return json.load(fh)


def canary_for(name: str, rec: dict) -> float:
    c = rec.get("canary") or {}
    if name.startswith("streaming"):
        return float(c.get("stream_sec") or c.get("scan_sec") or 1.0)
    return float(c.get("scan_sec") or 1.0)


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        raise SystemExit(2)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    oldq, newq = old["queries"], new["queries"]
    common = sorted(set(oldq) & set(newq))
    rows = []
    for name in common:
        to, tn = float(oldq[name]), float(newq[name])
        co, cn = canary_for(name, old), canary_for(name, new)
        norm_o, norm_n = to / co, tn / cn
        ratio = norm_n / norm_o if norm_o > 0 else float("inf")
        rows.append((ratio, name, to, tn, norm_o, norm_n))
    rows.sort(reverse=True)

    host = (new.get("canary", {}).get("scan_sec", 0) or 0) / max(
        old.get("canary", {}).get("scan_sec", 1) or 1, 1e-9
    )
    print(
        f"host speed ratio (new/old scan canary): {host:.2f}  "
        f"stream: {(new.get('canary', {}).get('stream_sec') or 0):.2f}s vs "
        f"{(old.get('canary', {}).get('stream_sec') or 0):.2f}s"
    )
    print(f"common queries: {len(common)}  threshold: {threshold}x normalized\n")

    flagged = [
        r for r in rows if r[0] > threshold and (r[2] > 0.3 or r[3] > 0.3)
    ]
    improved = [r for r in rows if r[0] < 1 / threshold and (r[2] > 0.3 or r[3] > 0.3)]

    def show(title, items, limit=None):
        print(title)
        if not items:
            print("  (none)")
        for ratio, name, to, tn, no_, nn in items[: limit or len(items)]:
            print(
                f"  {ratio:6.2f}x  {name:45s} {to:7.3f}s -> {tn:7.3f}s  "
                f"(normalized {no_:6.3f} -> {nn:6.3f})"
            )
        print()

    show(f"FLAGGED (> {threshold}x normalized slowdown):", flagged)
    show(f"improved (< {1/threshold:.2f}x):", improved, limit=10)

    tot_o = sum(float(oldq[n]) for n in common)
    tot_n = sum(float(newq[n]) for n in common)
    print(
        f"common-query wall: {tot_o:.1f}s -> {tot_n:.1f}s "
        f"(raw {tot_n / tot_o:.2f}x, canary-normalized "
        f"{(tot_n / tot_o) / host:.2f}x)"
    )


if __name__ == "__main__":
    main()
