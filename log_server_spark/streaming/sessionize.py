"""Custom stateful streaming operator: gap-based sessionization.

Demonstrates the engine's arbitrary-stateful-processing surface
(``applyInPandasWithState``): per-user session state survives across
micro-batches, closed sessions are emitted exactly once, open sessions are
flushed by event-time timeout. The batch equivalent (queries.q_sessionize)
is the oracle-checked reference; this operator exists for continuous
pipelines where sessions must close as data arrives.

State per user: (session_start, last_ts, n_events, sum_value). A new event
either extends the open session (gap <= threshold) or closes it (emit) and
opens a new one. Watermark-driven timeout closes idle sessions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id long, session_start long, session_end long, n_events long, sum_value double"
)
_STATE_SCHEMA = "session_start long, last_ts long, n_events long, sum_value double"

GAP_MS = 30 * 60 * 1000


def _sessionize_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        if state.exists:
            start, last, n, sv = state.get
            state.remove()
            yield pd.DataFrame(
                [{"user_id": user_id, "session_start": start, "session_end": last,
                  "n_events": n, "sum_value": round(sv, 4)}]
            )
        return

    if state.exists:
        start, last, n, sv = state.get
    else:
        start = last = None
        n, sv = 0, 0.0

    closed = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts_ms", "event_id"])
        for ts, val in zip(pdf["ts_ms"], pdf["value"]):
            ts = int(ts)
            if start is None:
                start, last, n, sv = ts, ts, 1, float(val)
            elif ts - last > GAP_MS:
                closed.append((start, last, n, sv))
                start, last, n, sv = ts, ts, 1, float(val)
            elif ts >= start - GAP_MS:
                # a late-but-within-watermark event from an earlier micro-batch
                # may have ts < last (or even slightly < start): it EXTENDS the
                # open session, never moving bounds or the event-time timeout
                # backwards (session_end < session_start otherwise)
                start, last = min(start, ts), max(last, ts)
                n, sv = n + 1, sv + float(val)
            else:
                # an event more than GAP before the open session's start
                # belongs to history this operator can no longer reopen
                # (earlier sessions may already be emitted); emit it as its
                # own historical session rather than bridging a gap the
                # batch sessionizer would split. Known divergence: with
                # watermark >> gap, a batch recompute could merge it with
                # other equally-late events.
                closed.append((ts, ts, 1, float(val)))

    state.update((start, last, n, sv))
    state.setTimeoutTimestamp(last + GAP_MS)
    if closed:
        yield pd.DataFrame(
            [
                {"user_id": user_id, "session_start": s, "session_end": e,
                 "n_events": c, "sum_value": round(v, 4)}
                for s, e, c, v in closed
            ]
        )


def streaming_sessions(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """events stream (event_id, ts, user_id, value, ...) -> closed sessions."""
    prepared = (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .withColumn("ts_ms", F.unix_millis("ts"))
        .select("user_id", "event_id", "ts", "ts_ms", "value")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def run_sessionize_stream(
    spark, events_dir: str, out_dir: str, checkpoint_dir: str, available_now: bool = True
):
    """File-source wrapper: drain events parquet dir into closed-session parquet."""
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    writer = (
        streaming_sessions(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
