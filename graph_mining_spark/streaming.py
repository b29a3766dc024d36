"""Structured Streaming surface.

The reference has no streaming operators (SURVEY.md §2.4) — its
"dynamic" clusterers are in-memory incremental updates.  The engine's
streaming surface therefore covers the ingestion side of the pipeline:
the same declarative transformations used in batch (hourly rollups,
quality stats over arriving documents) run unchanged as streaming
queries; batch/stream parity is asserted in tests.

At production scale: readStream from the object store / Kafka,
watermark on event time, and foreachBatch into the edge table, after
which the iterative graph operators run on the refreshed snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_event_rollup(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """Tumbling 1-hour window count/sum per event_type.  Works on both
    batch DataFrames and streaming DataFrames; streaming gets a
    watermark for state cleanup."""
    e = events
    if watermark and e.isStreaming:
        # watermarks require TIMESTAMP (event time); parquet may carry NTZ
        if dict(e.dtypes).get("ts") == "timestamp_ntz":
            e = e.withColumn("ts", F.col("ts").cast("timestamp"))
        e = e.withWatermark("ts", watermark)
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .select(F.col("w.start").alias("hour"), "event_type", "n", "total")
    )


def streaming_document_stats(docs: DataFrame) -> DataFrame:
    """Per-document quality features as a streaming map — identical
    expression tree to functions.text.text_stats."""
    from graph_mining_spark.functions.text import text_stats

    return text_stats(docs)


SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)


def sessionize_events(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch gap-based sessionization: per user, events closer than
    ``gap_minutes`` chain into one session.  Output one row per session
    (user_id, session_start, session_end, n_events, total_value).

    This is the SQL-expressible batch twin of
    :func:`sessionize_events_stream` — stream/batch parity is asserted
    in tests/test_streaming.py.  The per-user window partitions by
    user_id, the natural key at scale (state per user is bounded by
    that user's events, and the shuffle is one hash exchange).
    """
    from pyspark.sql import Window

    gap_us = gap_minutes * 60 * 1_000_000  # microsecond-exact gap math
    if dict(events.dtypes).get("ts") == "timestamp_ntz":
        events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    e = (
        events.withColumn("_prev", F.lag("ts").over(w))
        .withColumn(
            "_new",
            (
                F.col("_prev").isNull()
                | (F.unix_micros("ts") - F.unix_micros("_prev") > gap_us)
            ).cast("int"),
        )
        .withColumn("_sid", F.sum("_new").over(cum))
    )
    return e.groupBy("user_id", "_sid").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum("value").alias("total_value"),
    ).drop("_sid")


def sessionize_events_stream(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "2 hours"
) -> DataFrame:
    """CUSTOM STATEFUL streaming operator via ``applyInPandasWithState``
    (the pattern the engine uses where built-in windowed aggregation
    can't express the semantics — a session's extent depends on the
    data itself, not a fixed window grid).

    Per user_id the state holds the one OPEN session as
    ``(start_us, end_us, n, total)`` — INTEGER microseconds end to end,
    matching the batch twin's ``unix_micros`` gap math exactly.  Each
    micro-batch treats the open session as an interval and gap-merges
    it with the batch's events in event-time order (so late
    watermark-admitted events that land before or inside the open
    session extend/merge it instead of corrupting its bounds), emits
    every interval closed by a gap immediately, keeps the LAST interval
    open, and arms an EVENT-TIME timeout at ``session_end + gap`` —
    when the watermark passes it, the timed-out callback flushes the
    session.  Late events beyond the watermark are dropped by the
    engine; an interval emitted early because a same-batch later event
    closed its gap is final under those same watermark semantics.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000
    e = events
    if dict(e.dtypes).get("ts") == "timestamp_ntz":
        e = e.withColumn("ts", F.col("ts").cast("timestamp"))
    e = e.withWatermark("ts", watermark)

    def fn(key, pdfs, state):
        import pandas as pd

        uid = int(key[0])

        def to_row(s0, e0, n0, t0):
            return pd.DataFrame(
                [
                    (
                        uid,
                        pd.Timestamp(s0, unit="us"),
                        pd.Timestamp(e0, unit="us"),
                        int(n0),
                        float(t0),
                    )
                ],
                columns=[
                    "user_id", "session_start", "session_end", "n_events", "total_value",
                ],
            )

        if state.hasTimedOut:
            s0, e0, n0, t0 = state.get
            state.remove()
            yield to_row(s0, e0, n0, t0)
            return

        batch = pd.concat(list(pdfs))
        if len(batch) == 0:
            return
        batch = batch.sort_values(["ts", "event_id"])
        ts = (batch["ts"].astype("int64") // 1000).to_numpy()  # epoch µs
        vals = batch["value"].to_numpy()

        # intervals in start order: the open session (if any) slots in
        # among the batch's events; standard gap-merge over the stream
        items = [(int(t), int(t), 1, float(v)) for t, v in zip(ts, vals)]
        if state.exists:
            s0, e0, n0, t0 = state.get
            items.append((int(s0), int(e0), int(n0), float(t0)))
            items.sort(key=lambda it: (it[0], it[1]))
        cur = items[0]
        for nxt in items[1:]:
            if nxt[0] - cur[1] > gap_us:
                yield to_row(*cur)
                cur = nxt
            else:
                cur = (cur[0], max(cur[1], nxt[1]), cur[2] + nxt[2], cur[3] + nxt[3])
        state.update((int(cur[0]), int(cur[1]), int(cur[2]), float(cur[3])))
        state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)

    return e.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType="s long, e long, n long, t double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
