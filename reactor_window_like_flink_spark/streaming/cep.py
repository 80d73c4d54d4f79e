"""Streaming CEP: the watermarked stateful form of the batch
``operators.analytics.pattern_sequence`` key — Flink CEP's
``A followedBy B followedBy C within T`` (relaxed contiguity,
greedy/last-match binding) on a LIVE stream.

The reference's "not inferior to Flink" claim (``README.md:10,92``)
gestures at exactly this capability; its engine has no CEP at all, and
the batch key only replays history. This operator runs the same pattern
incrementally: per user, an ``applyInPandasWithState`` keeps the partial
chain (the last view, and the last click together with the view it
bound), finalizes events only once the watermark passes them — so
out-of-order arrival across micro-batches cannot change a binding — and
emits one row per completed view->click->purchase chain whose whole span
fits inside the pattern window.

Equivalence to the batch key: events are applied in (event-time,
event_id) order exactly like the batch form's window sort, and a probe
event is processed only when every earlier event is guaranteed present
(watermark contract), so on a replayed bounded stream the emitted set
EQUALS ``q_pattern_sequence``'s — asserted by ``tests/test_cep.py``.

State bounds (the "72 h TTL" in event time): a partial chain whose view
is older than ``watermark - span`` can never complete inside the span —
any future purchase is at-or-after the watermark — so it is evicted;
ditto a buffered-empty, fully-stale key (state removed outright). Plus
the pre-finalize buffer, O(events inside the watermark delay) per user.
So state per key = one struct + the in-flight window, bounded by
rate x delay, independent of stream lifetime.

Scale: one keyed shuffle (groupBy user) — the same shape as the batch
key's single sort-exchange; pattern depth adds struct fields, never
joins or extra shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reactor_window_like_flink_spark.operators.analytics import (
    FUNNEL_STAGES,
    PATTERN_SPAN_US,
)

CEP_OUTPUT_SCHEMA = (
    "user_id long, view_id long, click_id long, purchase_id long, "
    "span_us long"
)
CEP_STATE_SCHEMA = (
    "frontier_us long, "
    "v_us long, v_id long, "
    "c_us long, c_id long, cv_us long, cv_id long, "
    "buf_us array<long>, buf_id array<long>, buf_kind array<int>"
)

_NEG = -(1 << 62)


def pattern_sequence_stateful(
    events_stream: DataFrame,
    watermark_delay: str = "1 hour",
    span_us: int = PATTERN_SPAN_US,
) -> DataFrame:
    """Streaming view->click->purchase chain matcher (see module
    docstring). ``events_stream`` needs columns (event_id, ts, user_id,
    event_type); rows with other event types pass through the buffer and
    are ignored by the matcher, exactly like the batch form.

    ``watermark_delay`` is the out-of-orderness the operator absorbs:
    rows later than that are dropped (Flink's past-watermark discard) —
    the dial between buffer size and completeness."""
    import numpy as np
    import pandas as pd

    view_t, click_t, purchase_t = FUNNEL_STAGES
    kind_of = {view_t: 0, click_t: 1, purchase_t: 2}

    tagged = events_stream.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
    ).withWatermark("ts", watermark_delay)

    def match(key, pdfs, state):
        if state.exists:
            (frontier, v_us, v_id, c_us, c_id, cv_us, cv_id,
             buf_us, buf_id, buf_kind) = state.get
            buf_us, buf_id, buf_kind = (
                list(buf_us), list(buf_id), list(buf_kind)
            )
        else:
            frontier = v_us = v_id = c_us = c_id = cv_us = cv_id = _NEG
            buf_us, buf_id, buf_kind = [], [], []
        for pdf in pdfs:  # empty on timeout-only invocations
            if not len(pdf):
                continue
            ts_us = (
                pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000
            )
            for row_us, row_id, row_type in zip(
                ts_us, pdf["event_id"], pdf["event_type"]
            ):
                kind = kind_of.get(row_type)
                if kind is None or row_us < frontier:
                    continue  # non-pattern type, or late past the frontier
                buf_us.append(int(row_us))
                buf_id.append(int(row_id))
                buf_kind.append(kind)
        wm_us = state.getCurrentWatermarkMs() * 1000
        out = []
        if wm_us > 0 and buf_us:
            b_us = np.asarray(buf_us, dtype="int64")
            b_id = np.asarray(buf_id, dtype="int64")
            b_kind = np.asarray(buf_kind, dtype="int64")
            fin = b_us < wm_us
            if fin.any():
                order = np.lexsort((b_id[fin], b_us[fin]))
                for e_us, e_id, e_kind in zip(
                    b_us[fin][order], b_id[fin][order], b_kind[fin][order]
                ):
                    if e_kind == 0:
                        v_us, v_id = int(e_us), int(e_id)
                    elif e_kind == 1:
                        # click binds the CURRENT last view (greedy)
                        c_us, c_id = int(e_us), int(e_id)
                        cv_us, cv_id = v_us, v_id
                    else:
                        if c_us > _NEG and cv_us > _NEG:
                            span = int(e_us) - cv_us
                            if span <= span_us:
                                out.append(
                                    (int(key[0]), cv_id, c_id,
                                     int(e_id), span)
                                )
                keep = ~fin
                buf_us = [int(x) for x in b_us[keep]]
                buf_id = [int(x) for x in b_id[keep]]
                buf_kind = [int(x) for x in b_kind[keep]]
            frontier = max(frontier, wm_us)
        elif wm_us > 0:
            frontier = max(frontier, wm_us)
        # event-time TTL: a partial chain too old to ever complete inside
        # the span (future purchases are >= watermark) is dropped
        if wm_us > 0:
            if v_us > _NEG and wm_us - v_us > span_us:
                v_us = v_id = _NEG
            if cv_us > _NEG and wm_us - cv_us > span_us:
                c_us = c_id = cv_us = cv_id = _NEG
        if not buf_us and v_us == _NEG and c_us == _NEG:
            state.remove()  # fully stale key: no state row at all
        else:
            state.update(
                (frontier, v_us, v_id, c_us, c_id, cv_us, cv_id,
                 buf_us, buf_id, buf_kind)
            )
            wm_ms = wm_us // 1000
            if buf_us:
                # wake when the watermark passes the oldest buffered event
                state.setTimeoutTimestamp(max(min(buf_us) // 1000, wm_ms + 1))
            else:
                # wake when the chain goes stale, to evict it
                chain_anchor = max(v_us, cv_us)
                state.setTimeoutTimestamp(
                    max((chain_anchor + span_us) // 1000 + 1, wm_ms + 1)
                )
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "user_id", "view_id", "click_id", "purchase_id",
                    "span_us",
                ],
            )

    return tagged.groupBy("user_id").applyInPandasWithState(
        match,
        outputStructType=CEP_OUTPUT_SCHEMA,
        stateStructType=CEP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="EventTimeTimeout",
    )
