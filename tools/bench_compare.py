"""Regression comparator: BENCH_LOCAL.json vs the per-key bar.

The driver's target is "BENCH within 2x of BASELINE at the same scale
factor" (BASELINE.json metric). The bar in ``tools/bench_bar.json`` is
each key's FIRST recorded BENCH_LOCAL median (sf0.1, local[32],
median-of-3, noop sink) — the number this engine published when the key
landed. This tool prints per-key ratios and flags everything above the
threshold, separating signal from this VM's documented block-device /
host-state drift by ALSO printing the run's median ratio: a uniform
shift across untouched keys is machine state (see BASELINE.md round-7
closing caveat), a lone key above the bar while the median sits near
1.0 is a real regression.

Usage: python tools/bench_compare.py [bench_json] [--bar bar_json] [--threshold 2.0]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys


def main() -> int:
    here = os.path.dirname(os.path.abspath(__file__))
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "bench", nargs="?",
        default=os.path.join(here, "..", "BENCH_LOCAL.json"),
    )
    ap.add_argument("--bar", default=os.path.join(here, "bench_bar.json"))
    ap.add_argument("--threshold", type=float, default=2.0)
    args = ap.parse_args()

    with open(args.bench) as f:
        bench = json.load(f)
    with open(args.bar) as f:
        bar = json.load(f)["bar"]

    current: dict[str, float] = dict(bench.get("queries", {}))
    current.update(bench.get("guards") or {})

    ratios: dict[str, float] = {}
    for key, sec in sorted(current.items()):
        if key not in bar or bar[key] <= 0:
            print(f"  NEW  {key}: {sec}s (no bar yet)")
            continue
        ratios[key] = sec / bar[key]

    if not ratios:
        print("no overlapping keys")
        return 1

    med = statistics.median(ratios.values())
    print(f"keys compared: {len(ratios)}   median ratio: {med:.2f} "
          f"(uniform shift = machine state, not regression)")
    flagged = {
        k: r for k, r in ratios.items() if r > args.threshold
    }
    # drift-adjusted view: a key is suspicious when it regresses well
    # beyond the run-wide shift, not merely with it
    suspicious = {
        k: r for k, r in ratios.items() if r > args.threshold * max(med, 1.0)
    }
    for k, r in sorted(ratios.items(), key=lambda x: -x[1]):
        mark = ("!!" if k in suspicious else
                " !" if k in flagged else "  ")
        print(f"{mark} {r:5.2f}x  {k}: {bar[k]}s -> {current[k]}s")
    print(f"\n{len(flagged)} over {args.threshold}x raw; "
          f"{len(suspicious)} over {args.threshold}x after drift adjustment")
    return 2 if suspicious else 0


if __name__ == "__main__":
    try:
        raise SystemExit(main())
    except BrokenPipeError:  # `| head` closed the pipe; not an error
        import os

        os._exit(0)
