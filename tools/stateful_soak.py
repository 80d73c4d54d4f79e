"""Stateful-streaming soak: the stateful twin of the r15 publisher soak
(r15 VERDICT directive 4).

``throughput_probe.py --sustained`` soaks the STATELESS publisher path
(admission -> windowed delivery -> exactly-once sink). This tool soaks
the three custom STATEFUL operator families concurrently, under the same
trickle/burst producer mix, with the state store's own telemetry
recorded and a kill-and-restart mid-soak proving checkpoint recovery for
*stateful* state (the sink replay tests cover stateless exactly-once
only):

- ``temporal_join_event_time`` (streaming/joins.py): event-time-exact
  versioned join — probes + versions on two file streams; this is the
  query that gets KILLED mid-soak and restarted from its checkpoint.
  At drain, its emitted bindings (accumulated across both query
  incarnations, deduped by probe_id against foreachBatch replay) must
  equal a pandas as-of oracle over every published probe/version row —
  exactness across the restart is the recovery proof.
- ``followed_by_chain_stateful`` (streaming/cep.py): 3-stage CEP chain;
  at drain its match set must equal the batch ``followed_by_chain``
  over the full published event log (the test_cep parity contract, now
  held under sustained load).
- ``continuous_cms`` (streaming/cms.py): bounded-state sketch; at drain
  each probe estimate must equal the Python-computed exact CMS counters
  over the published log (same md5 device), and n_seen must equal the
  per-key row count (conservation).

Per-query, per-batch telemetry comes from StreamingQuery.recentProgress
(captured before each stop, so the restart doesn't lose the first
segment): batch latency p50/p95/max, state-store rows, and state memory
— the plateau of numRowsTotal under a fixed key space is the bounded-
state demonstration.

Producers are rate-limited (same rationale as the publisher soak):
events ~2k rows/s on the CEP/CMS log, probes ~1k rows/s, versions one
per key every 2 s — a stateful pipeline's cost is per-row Python in the
state handler, so the soak demonstrates sustained exactness at a real
rate, not peak admission.

Usage::

    python tools/stateful_soak.py [soak_seconds=120] [restart_at=0.5]

Output: one JSON line (machine) + a BASELINE.md-ready table (stderr).
Exit 0 iff every exactness/conservation check passed.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import threading
import time
from datetime import datetime, timedelta, timezone

here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(here, ".."))

SCHEMA = "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"
BASE = datetime(2024, 1, 1, tzinfo=timezone.utc)
N_KEYS = 97
STAGES = ("a", "b", "c")


def _pct(xs: list[float], q: float) -> float | None:
    if not xs:
        return None
    xs = sorted(xs)
    return round(xs[min(len(xs) - 1, int(q * len(xs)))], 3)


class ProgressTrail:
    """Accumulates recentProgress segments across query incarnations,
    deduped by (runId, batchId)."""

    def __init__(self) -> None:
        self.batches: dict[tuple[str, int], dict] = {}

    def capture(self, query) -> None:
        for p in query.recentProgress:
            if not isinstance(p, dict):  # StreamingQueryProgress object
                p = json.loads(p.json)
            self.batches[(p["runId"], p["batchId"])] = p

    def summary(self) -> dict:
        lat = [
            b["durationMs"]["triggerExecution"] / 1000.0
            for b in self.batches.values()
            if b.get("durationMs", {}).get("triggerExecution") is not None
        ]
        state_rows = [
            op["numRowsTotal"]
            for b in self.batches.values()
            for op in b.get("stateOperators") or []
        ]
        state_mem = [
            op["memoryUsedBytes"]
            for b in self.batches.values()
            for op in b.get("stateOperators") or []
        ]
        rows_in = sum(b.get("numInputRows") or 0 for b in self.batches.values())
        return {
            "n_batches": len(self.batches),
            "rows_in": rows_in,
            "batch_s_p50": _pct(lat, 0.5),
            "batch_s_p95": _pct(lat, 0.95),
            "batch_s_max": _pct(lat, 1.0),
            "state_rows_max": max(state_rows, default=None),
            "state_mb_max": (
                round(max(state_mem) / 1e6, 2) if state_mem else None
            ),
        }


def main() -> int:
    soak_s = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    restart_at = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5

    from reactor_window_like_flink_spark.operators.analytics import (
        followed_by_chain,
    )
    from reactor_window_like_flink_spark.session import get_spark
    from reactor_window_like_flink_spark.streaming.cep import (
        followed_by_chain_stateful,
    )
    from reactor_window_like_flink_spark.streaming.cms import (
        cms_bucket,
        continuous_cms,
    )
    from reactor_window_like_flink_spark.streaming.joins import (
        temporal_join_event_time,
    )
    from reactor_window_like_flink_spark.streaming.publisher import (
        FileStreamInput,
    )

    spark = get_spark(app_name="stateful_soak", shuffle_partitions=8)
    tmp = tempfile.mkdtemp(prefix="stateful_soak_")
    ev_src = FileStreamInput(spark, SCHEMA, os.path.join(tmp, "events"))
    pr_src = FileStreamInput(spark, SCHEMA, os.path.join(tmp, "probes"))
    vr_src = FileStreamInput(spark, SCHEMA, os.path.join(tmp, "versions"))

    t0 = time.perf_counter()
    ts_of = lambda: BASE + timedelta(seconds=time.perf_counter() - t0)  # noqa: E731

    published: dict[str, list] = {"events": [], "probes": [], "versions": []}
    pub_lock = threading.Lock()
    next_id = [0]

    def _ids(n: int) -> int:
        with pub_lock:
            start = next_id[0]
            next_id[0] += n
        return start

    # ---- the three stateful pipelines ------------------------------------
    tj_rows: list = []
    tj_lock = threading.Lock()

    def tj_sink(df, bid) -> None:
        got = df.collect()
        with tj_lock:
            tj_rows.extend(got)

    def start_tj():
        out = temporal_join_event_time(
            pr_src.stream(),
            vr_src.stream(),
            watermark_delay="30 seconds",
        )
        return (
            out.writeStream.foreachBatch(tj_sink)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(tmp, "ckpt_tj"))
            .start()
        )

    cep_rows: list = []
    cms_rows: list = []

    cep_q = (
        followed_by_chain_stateful(
            ev_src.stream(), list(STAGES), watermark_delay="30 seconds",
            span_us=3600 * 1_000_000,
        )
        .writeStream.foreachBatch(lambda df, bid: cep_rows.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmp, "ckpt_cep"))
        .start()
    )
    cms_q = (
        continuous_cms(
            ev_src.stream(), "user_id", "event_type", STAGES, depth=4, width=64
        )
        .writeStream.foreachBatch(lambda df, bid: cms_rows.extend(df.collect()))
        .outputMode("update")
        .option("checkpointLocation", os.path.join(tmp, "ckpt_cms"))
        .start()
    )
    tj_q = start_tj()

    trails = {"temporal_join": ProgressTrail(), "cep_chain": ProgressTrail(),
              "continuous_cms": ProgressTrail()}
    live = {"temporal_join": tj_q, "cep_chain": cep_q, "continuous_cms": cms_q}
    sampling = [True]

    def sample_progress() -> None:
        # recentProgress keeps only the last ~100 batches; at a ~1 s
        # cadence a 120 s soak outgrows it, so sweep every 10 s
        while sampling[0]:
            for name, q in list(live.items()):
                try:
                    trails[name].capture(q)
                except Exception:
                    pass  # racing a stop(): the final capture still runs
            time.sleep(10)

    sampler = threading.Thread(target=sample_progress)
    sampler.start()

    # ---- producers (rate-limited trickle/burst) --------------------------
    stop_at = time.perf_counter() + soak_s

    def burst_phase() -> bool:
        return int((time.perf_counter() - t0) // 10) % 2 == 1

    def produce_events() -> None:
        # stage cycle per user so every 3rd event completes an a->b->c
        # chain; user round-robin over the fixed key space
        k = 0
        while time.perf_counter() < stop_at:
            n = 500 if burst_phase() else 50
            start = _ids(n)
            now = ts_of()
            rows = [
                (
                    start + j,
                    now + timedelta(microseconds=j),
                    (k + j) % N_KEYS,
                    STAGES[((start + j) // N_KEYS) % 3],
                    1.0,
                )
                for j in range(n)
            ]
            k = (k + n) % N_KEYS
            published["events"].extend(rows)
            ev_src.publish(rows)
            time.sleep(0.25 if burst_phase() else 0.025)

    def produce_probes() -> None:
        while time.perf_counter() < stop_at:
            n = 250 if burst_phase() else 25
            start = _ids(n)
            now = ts_of()
            rows = [
                (
                    start + j,
                    now + timedelta(microseconds=j),
                    (start + j) % N_KEYS,
                    "p",
                    0.0,
                )
                for j in range(n)
            ]
            published["probes"].extend(rows)
            pr_src.publish(rows)
            time.sleep(0.25 if burst_phase() else 0.025)

    def produce_versions() -> None:
        while time.perf_counter() < stop_at:
            start = _ids(N_KEYS)
            now = ts_of()
            rows = [
                (start + u, now, u, "v", float(start + u))
                for u in range(N_KEYS)
            ]
            published["versions"].extend(rows)
            vr_src.publish(rows)
            time.sleep(2.0)

    threads = [
        threading.Thread(target=produce_events),
        threading.Thread(target=produce_probes),
        threading.Thread(target=produce_versions),
    ]
    for t in threads:
        t.start()

    # ---- mid-soak kill-and-restart of the temporal join ------------------
    time.sleep(soak_s * restart_at)
    trails["temporal_join"].capture(tj_q)
    n_before_kill = len(tj_rows)
    t_kill = time.perf_counter()
    tj_q.stop()
    kill_wall = round(time.perf_counter() - t0, 1)
    time.sleep(2.0)  # producers keep publishing into the gap
    tj_q = start_tj()
    live["temporal_join"] = tj_q
    while tj_q.lastProgress is None:
        time.sleep(0.2)
    restart_to_first_batch_s = round(time.perf_counter() - t_kill - 2.0, 2)

    for t in threads:
        t.join()

    # ---- drain: far-future flush rows advance every watermark ------------
    flush_ts = BASE + timedelta(hours=6)
    fid = _ids(3)
    ev_src.publish([(fid, flush_ts, 10**6, "a", 0.0)])
    pr_src.publish([(fid + 1, flush_ts, 10**6, "p", 0.0)])
    vr_src.publish([(fid + 2, flush_ts, 10**6, "v", 0.0)])
    for q in (tj_q, cep_q, cms_q):
        q.processAllAvailable()
    sampling[0] = False
    sampler.join()
    trails["temporal_join"].capture(tj_q)
    trails["cep_chain"].capture(cep_q)
    trails["continuous_cms"].capture(cms_q)
    for q in (tj_q, cep_q, cms_q):
        q.stop()

    # ---- exactness checks ------------------------------------------------
    import pandas as pd

    # 1) temporal join vs pandas as-of oracle (excluding the flush key);
    #    foreachBatch replay across the restart may duplicate a batch —
    #    dedupe by probe_id but FAIL on conflicting duplicate values.
    emitted: dict[int, tuple] = {}
    dup_conflicts = 0
    replayed = 0
    with tj_lock:
        for r in tj_rows:
            if r["probe_id"] >= 10**6 or r["key"] == 10**6:
                continue
            val = (r["payload"], r["version_ts"])
            if r["probe_id"] in emitted:
                replayed += 1
                if emitted[r["probe_id"]] != val:
                    dup_conflicts += 1
            emitted[r["probe_id"]] = val

    vdf = pd.DataFrame(
        [(v[2], v[1], v[4]) for v in published["versions"]],
        columns=["key", "ts", "payload"],
    ).sort_values(["key", "ts"], kind="stable")
    expect: dict[int, tuple] = {}
    ver_by_key: dict[int, list] = {}
    for key, ts, payload in vdf.itertuples(index=False):
        ver_by_key.setdefault(key, []).append((ts, payload))
    import bisect

    for pid, ts, key, _et, _v in published["probes"]:
        vers = ver_by_key.get(key, [])
        i = bisect.bisect_right([v[0] for v in vers], ts)
        if i == 0:
            expect[pid] = (None, None)
        else:
            vts, vpay = vers[i - 1]
            expect[pid] = (vpay, vts.replace(tzinfo=None))
    tj_exact = emitted == expect

    # 2) CEP vs batch followed_by_chain over the full published log
    ev_df = spark.createDataFrame(published["events"], SCHEMA)
    want = {
        (r["user_id"], r["stage0_id"], r["stage1_id"], r["stage2_id"])
        for r in followed_by_chain(
            ev_df, list(STAGES), 3600 * 1_000_000
        ).collect()
    }
    got = {
        (r["user_id"], r["stage0_id"], r["stage1_id"], r["stage2_id"])
        for r in cep_rows
        if r["user_id"] != 10**6
    }
    cep_exact = got == want

    # 3) CMS: final estimate per (key, item) == python-exact counters
    truth_counters: dict[int, dict] = {}
    truth_n: dict[int, int] = {}
    for _eid, _ts, user, etype, _val in published["events"]:
        c = truth_counters.setdefault(user, {})
        c[etype] = c.get(etype, 0) + 1
        truth_n[user] = truth_n.get(user, 0) + 1
    final_cms: dict[tuple, tuple] = {}
    for r in cms_rows:
        # OUTPUT_SCHEMA types key as string; compare in int space
        k = (int(r["key"]), r["item"])
        if k[0] == 10**6:
            continue
        prev = final_cms.get(k)
        if prev is None or r["n_seen"] >= prev[1]:
            final_cms[k] = (r["cms_est"], r["n_seen"])
    import numpy as np

    cms_exact = True
    for user, items in truth_counters.items():
        counters = np.zeros(4 * 64, dtype="int64")
        for item, cnt in items.items():
            for d in range(4):
                counters[d * 64 + cms_bucket(item, d, 64)] += cnt
        for probe in STAGES:
            cells = [d * 64 + cms_bucket(probe, d, 64) for d in range(4)]
            want_est = int(min(counters[c] for c in cells))
            got_rec = final_cms.get((user, probe))
            if got_rec is None or got_rec[0] != want_est or got_rec[1] != truth_n[user]:
                cms_exact = False

    ok = tj_exact and cep_exact and cms_exact and dup_conflicts == 0
    payload = {
        "metric": "stateful_streaming_soak",
        "soak_seconds": soak_s,
        "published": {k: len(v) for k, v in published.items()},
        "restart": {
            "at_wall_s": kill_wall,
            "emitted_before_kill": n_before_kill,
            "restart_to_first_batch_s": restart_to_first_batch_s,
            "foreachbatch_replayed_rows": replayed,
            "replay_conflicts": dup_conflicts,
        },
        "exact": {
            "temporal_join_vs_asof_oracle": tj_exact,
            "probes_bound": len(emitted),
            "cep_vs_batch_chain": cep_exact,
            "cep_matches": len(got),
            "cms_vs_python_counters": cms_exact,
            "cms_keys": len(truth_counters),
        },
        "queries": {name: tr.summary() for name, tr in trails.items()},
    }
    print(json.dumps(payload))

    print("\n| pipeline | batches | rows in | batch p50/p95/max s | state rows max | state MB max |", file=sys.stderr)
    print("|---|---|---|---|---|---|", file=sys.stderr)
    for name, tr in trails.items():
        s = tr.summary()
        print(
            f"| {name} | {s['n_batches']} | {s['rows_in']} |"
            f" {s['batch_s_p50']}/{s['batch_s_p95']}/{s['batch_s_max']} |"
            f" {s['state_rows_max']} | {s['state_mb_max']} |",
            file=sys.stderr,
        )
    print(f"\nexact: {payload['exact']}", file=sys.stderr)
    print(f"restart: {payload['restart']}", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
