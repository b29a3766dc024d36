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

    Per user_id the state holds ALL not-yet-final sessions as parallel
    arrays of ``(start_us, end_us, n, total)`` intervals — INTEGER
    microseconds end to end, matching the batch twin's ``unix_micros``
    gap math exactly.  Each micro-batch gap-merges the state's
    intervals with the batch's events in event-time order, then emits
    ONLY the intervals the watermark has made final: an interval
    ``[s, e]`` is final exactly when ``watermark > e + gap``, because a
    watermark-admitted event has ``t >= watermark > e + gap >= s``, so
    it can neither extend the interval nor bridge into it.  Everything
    else — including gap-closed intervals the old implementation
    emitted eagerly — stays buffered in state, and an EVENT-TIME
    timeout armed at the earliest ``end + gap`` flushes it once the
    watermark passes.  This is the same only-emit-on-watermark contract
    as Spark's built-in ``session_window`` append mode, and it holds
    for ANY watermark delay vs gap combination (the old early emission
    was only safe when the delay was ≤ the gap).

    MIGRATION: this rewrite changed the operator's state schema from
    one scalar open-session row to array-typed interval buffers, and
    ``applyInPandasWithState`` does not evolve state schemas — a query
    checkpointed on the old build cannot resume on this one.  Restart
    such queries with a FRESH checkpoint directory (replaying the
    source from an offset at least ``watermark + gap`` before the
    stop point reproduces every not-yet-final session).
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

        def to_rows(intervals):
            return pd.DataFrame(
                [
                    (
                        uid,
                        pd.Timestamp(s0, unit="us"),
                        pd.Timestamp(e0, unit="us"),
                        int(n0),
                        float(t0),
                    )
                    for (s0, e0, n0, t0) in intervals
                ],
                columns=[
                    "user_id", "session_start", "session_end", "n_events", "total_value",
                ],
            )

        def load_state():
            if not state.exists:
                return []
            ss, es, ns, ts_ = state.get
            return [
                (int(a), int(b), int(c), float(d))
                for a, b, c, d in zip(ss, es, ns, ts_)
            ]

        def split_final(intervals, wm_ms):
            # final iff the watermark strictly passed end + gap (same
            # clock the timeout is armed on, so nothing gets stuck)
            done = [it for it in intervals if (it[1] + gap_us) // 1000 < wm_ms]
            live = [it for it in intervals if (it[1] + gap_us) // 1000 >= wm_ms]
            return done, live

        def store_and_arm(live, wm_ms):
            if not live:
                state.remove()
                return
            state.update(
                (
                    [it[0] for it in live],
                    [it[1] for it in live],
                    [it[2] for it in live],
                    [it[3] for it in live],
                )
            )
            next_ms = min((it[1] + gap_us) // 1000 for it in live)
            state.setTimeoutTimestamp(max(int(next_ms), int(wm_ms) + 1))

        wm_ms = state.getCurrentWatermarkMs()

        if state.hasTimedOut:
            done, live = split_final(load_state(), wm_ms)
            store_and_arm(live, wm_ms)
            if done:
                yield to_rows(done)
            return

        batch = pd.concat(list(pdfs))
        if len(batch) == 0:
            return
        batch = batch.sort_values(["ts", "event_id"])
        # normalize to ns first: Arrow may hand pandas datetime64[us],
        # whose int64 view would be off by 1000x
        ts = (
            batch["ts"].astype("datetime64[ns]").astype("int64") // 1000
        ).to_numpy()  # epoch µs
        vals = batch["value"].to_numpy()

        # intervals in start order: buffered sessions slot in among the
        # batch's events (late watermark-admitted events land inside or
        # before them and merge); standard gap-merge over the stream
        items = [(int(t), int(t), 1, float(v)) for t, v in zip(ts, vals)]
        items.extend(load_state())
        items.sort(key=lambda it: (it[0], it[1]))
        merged = [items[0]]
        for nxt in items[1:]:
            cur = merged[-1]
            if nxt[0] - cur[1] > gap_us:
                merged.append(nxt)
            else:
                merged[-1] = (
                    cur[0], max(cur[1], nxt[1]), cur[2] + nxt[2], cur[3] + nxt[3]
                )
        done, live = split_final(merged, wm_ms)
        store_and_arm(live, wm_ms)
        if done:
            yield to_rows(done)

    return e.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=(
            "ss array<long>, es array<long>, ns array<long>, ts array<double>"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
