"""Full-surface sf1 bench: the performance twin of the r15 sf1 oracle
differential (r15 VERDICT directive 1).

The correctness story gained a 100x axis in r15 (the sf1 oracle sweep
that caught q_tpch_q5/q9/q_winsorize); the performance story still
extrapolated from per-family probes. This tool runs the ENTIRE
``bench.py`` headline + guard surface at BOTH sf0.1 and the synthetic
sf1 corpus (``tools/scale_probe.py``-built: 10x-replicated facts with
per-replica key offsets, dims verbatim, documents with per-replica
vocabulary renaming so dup structure scales linearly) in one warm
session, and records the per-key wall ratio.

Reading the ratio: facts grow 10x while dims stay fixed, so a
shuffle-keyed linear plan lands at <= ~10x plus fixed overhead;
aggregate-output keys (small results, map-side combine) land well
under. Any key whose ratio exceeds ``FLAG_RATIO`` (15 = 10x data +
50% overhead allowance) is flagged for a plan read — the judge's
contract is every flagged key fixed or explained with a measurement.

Sampling: median-of-3 where a single sample costs < ``RESAMPLE_S``
seconds (small keys, where scheduler noise dominates); single sample
above it (wall >> noise there, and tripling 20 s keys would triple a
~1 h run for no signal). Which regime each key used is recorded.

Index-backed keys get the same untimed warm-up build pass as bench.py,
per scale, so the timed number is the serving path at both scales.

Usage::

    python tools/bench_sf1.py [sf1_dir] [--only k1,k2]
    # sf1_dir default /tmp/sparkgraft_scale/sf1

Output: ``BENCH_SF1.json`` at the repo root (full per-key walls +
ratios + flags) and a BASELINE.md-ready markdown summary on stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (HEADLINE / GUARD / INDEX_BACKED / _epoch_calib)

SF01 = "/root/testdata/sf0.1"
FLAG_RATIO = 15.0
RESAMPLE_S = 5.0


def _run_noop(qs, name, spark, sf_dir) -> float:
    t0 = time.perf_counter()
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _timed(qs, name, spark, sf_dir) -> tuple[float, int]:
    """Median wall and the sample count used (3 below RESAMPLE_S, else 1)."""
    first = _run_noop(qs, name, spark, sf_dir)
    if first >= RESAMPLE_S:
        return round(first, 3), 1
    samples = sorted([first, _run_noop(qs, name, spark, sf_dir), _run_noop(qs, name, spark, sf_dir)])
    return round(samples[1], 3), 3


def main() -> int:
    argv = sys.argv[1:]
    only: set[str] = set()
    rest = []
    it = iter(argv)
    for a in it:
        if a == "--only":
            only = set(next(it).split(","))
        else:
            rest.append(a)
    sf1_dir = rest[0] if rest else "/tmp/sparkgraft_scale/sf1"
    if not os.path.exists(os.path.join(sf1_dir, "lineitem.parquet")):
        print(f"sf1 corpus missing at {sf1_dir}; build with tools/scale_probe.py")
        return 2

    import __spark_entry__ as e
    from reactor_window_like_flink_spark.session import get_spark

    spark = get_spark(app_name="bench_sf1")
    qs = e.queries()
    keys = list(bench.HEADLINE) + list(bench.GUARD)
    if only:
        keys = [k for k in keys if k in only]

    calib_start = bench._epoch_calib()
    print(f"# epoch calibration: {calib_start}s", file=sys.stderr)

    result: dict = {
        "metric": "sf1_scale_bench",
        "sf_pair": [0.1, 1.0],
        "flag_ratio": FLAG_RATIO,
        "resample_below_s": RESAMPLE_S,
        "queries": {},
        "cold_build_s": {},
    }

    for label, sf_dir in (("sf0.1", SF01), ("sf1", sf1_dir)):
        # warm-up scans + untimed index builds, mirroring bench.py
        qs["q_scan_parquet"](spark, sf_dir).collect()
        for name in bench.INDEX_BACKED:
            if name not in qs or name not in keys:
                continue
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            result["cold_build_s"].setdefault(name, {})[label] = round(
                time.perf_counter() - t0, 3
            )

    t_start = time.time()
    for i, name in enumerate(keys):
        rec: dict = {}
        for label, sf_dir in (("sf0.1", SF01), ("sf1", sf1_dir)):
            wall, n = _timed(qs, name, spark, sf_dir)
            rec[label] = wall
            rec[f"{label}_samples"] = n
        rec["ratio"] = round(rec["sf1"] / max(rec["sf0.1"], 1e-9), 2)
        rec["guard"] = name in bench.GUARD
        result["queries"][name] = rec
        print(
            f"# [{i + 1}/{len(keys)}] {name}: {rec['sf0.1']}s -> {rec['sf1']}s"
            f" ({rec['ratio']}x){' GUARD' if rec['guard'] else ''}"
            f"  (cum {time.time() - t_start:.0f}s)",
            file=sys.stderr,
            flush=True,
        )

    flags = {
        k: v["ratio"]
        for k, v in sorted(result["queries"].items())
        if v["ratio"] > FLAG_RATIO
    }
    ratios = sorted(v["ratio"] for v in result["queries"].values())
    result["flags"] = flags
    result["median_ratio"] = ratios[len(ratios) // 2] if ratios else None
    result["total_sf1_s"] = round(
        sum(v["sf1"] for v in result["queries"].values()), 1
    )
    result["total_sf01_s"] = round(
        sum(v["sf0.1"] for v in result["queries"].values()), 1
    )
    result["epoch_calib_s"] = {"start": calib_start, "end": bench._epoch_calib()}

    out = os.path.join(REPO, "BENCH_SF1.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(json.dumps({k: v for k, v in result.items() if k != "queries"}))

    # BASELINE.md-ready table (stderr): flagged keys first, then the top
    # of the distribution, so the narrative table stays bounded.
    rows = sorted(
        result["queries"].items(), key=lambda kv: -kv[1]["ratio"]
    )
    print("\n| key | sf0.1 s | sf1 s | ratio |", file=sys.stderr)
    print("|---|---|---|---|", file=sys.stderr)
    for k, v in rows[:25]:
        print(
            f"| `{k}`{' (guard)' if v['guard'] else ''} | {v['sf0.1']} |"
            f" {v['sf1']} | {v['ratio']}x |",
            file=sys.stderr,
        )
    print(
        f"\nmedian ratio {result['median_ratio']}x, flags(>{FLAG_RATIO}x):"
        f" {flags or 'none'}",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
