"""Streaming throughput probe at the reference's own scale.

The reference's only quantitative performance fact is its integration
test (``WindowPublisherTest.java:22-46``): 50,000 events from 10
concurrent producers must be fully delivered, exactly once, within a
10 s assertion budget — an implied sustained no-loss floor of
>= 5,000 events/s on one node (BASELINE.md §"reference numbers").

This probe runs the SAME workload through the Spark-side publisher
(``WindowedPublisher`` over a ``FileStreamInput``, max 15-item chunks,
0.5 s window — the A5/A7 surface) and prints measured events/s for two
clocks:

- ``producer_to_last_delivery_s``: first publish -> last chunk handed
  to the consumer (the reference test's clock);
- ``drain_s``: all-published -> all-delivered (pure engine drain, no
  producer think-time).

Single run, one JSON line on stdout — a parity probe, not a bench (no
bar; re-run ad hoc when the publisher path changes).

Usage: python tools/throughput_probe.py [n_events] [n_threads]
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


def _rows(n: int):
    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    return [
        (i, t0 + timedelta(seconds=i % 3600), i % 97, "view", float(i % 13))
        for i in range(n)
    ]


def main() -> int:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_threads = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from reactor_window_like_flink_spark.session import get_spark
    from reactor_window_like_flink_spark.streaming.publisher import (
        FileStreamInput,
        WindowedPublisher,
    )

    spark = get_spark(app_name="throughput_probe", shuffle_partitions=8)
    tmp = tempfile.mkdtemp(prefix="throughput_probe_")
    src = FileStreamInput(spark, SCHEMA, os.path.join(tmp, "in"))

    delivered = 0
    last_delivery = [0.0]
    lock = threading.Lock()

    def consumer(chunk) -> None:
        nonlocal delivered
        with lock:
            delivered += len(chunk)
            last_delivery[0] = time.perf_counter()

    pub = WindowedPublisher(
        window_max_batch_size=15, window_duration_seconds=0.5
    )
    query = pub.subscribe(
        src.stream(), consumer=consumer, checkpoint_dir=os.path.join(tmp, "ckpt")
    )
    all_rows = _rows(n_events)
    per = n_events // n_threads

    def produce(k: int) -> None:
        mine = all_rows[k * per : (k + 1) * per]
        step = 2500
        for i in range(0, len(mine), step):
            src.publish(mine[i : i + step])

    threads = [
        threading.Thread(target=produce, args=(k,)) for k in range(n_threads)
    ]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    t_published = time.perf_counter()
    try:
        deadline = time.time() + 300
        while time.time() < deadline:
            query.processAllAvailable()
            with lock:
                if delivered >= n_events:
                    break
            time.sleep(0.05)
    finally:
        query.stop()

    total_s = last_delivery[0] - t_start
    drain_s = last_delivery[0] - t_published
    ok = delivered == n_events
    print(
        json.dumps(
            {
                "metric": "publisher_throughput",
                "n_events": n_events,
                "n_producers": n_threads,
                "exactly_delivered": ok,
                "producer_to_last_delivery_s": round(total_s, 2),
                "events_per_s": round(n_events / total_s, 0) if total_s > 0 else None,
                "drain_s": round(drain_s, 2),
                "drain_events_per_s": (
                    round(n_events / drain_s, 0) if drain_s > 0 else None
                ),
                "reference_floor_events_per_s": 5000,
                "beats_reference_floor": bool(
                    ok and total_s > 0 and n_events / total_s >= 5000
                ),
            }
        )
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
