import os
import tempfile

from pyspark.sql import functions as F

from graph_mining_spark.streaming import hourly_event_rollup


def test_streaming_matches_batch(spark):
    src = "/root/testdata/sf0.001/events.parquet"
    batch = spark.read.parquet(src)
    want = {
        (str(r["hour"]), r["event_type"]): (r["n"], round(r["total"], 6))
        for r in hourly_event_rollup(batch).collect()
    }

    schema = batch.schema
    with tempfile.TemporaryDirectory() as tmp:
        # file streaming sources need a directory
        os.makedirs(f"{tmp}/in")
        os.symlink(src, f"{tmp}/in/events.parquet")
        ckpt = f"{tmp}/ckpt"
        stream = spark.readStream.schema(schema).parquet(f"{tmp}/in")
        agg = hourly_event_rollup(stream, watermark="2 hours")
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("hourly_out")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
            got = {
                (str(r["hour"]), r["event_type"]): (r["n"], round(r["total"], 6))
                for r in spark.sql("SELECT * FROM hourly_out").collect()
            }
        finally:
            q.stop()
    assert got == want
    assert len(got) > 0


def test_sessionize_stream_matches_batch(spark):
    """Stateful sessionization (applyInPandasWithState, event-time
    timeout) must emit exactly the batch twin's sessions once the
    watermark passes their close; the still-open trailing session is
    retained in state, not emitted."""
    import datetime as dt

    from graph_mining_spark.streaming import sessionize_events, sessionize_events_stream

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(eid, minutes, uid, val):
        return (eid, t0 + dt.timedelta(minutes=minutes), uid, "click", val, "{}")

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    file1 = [
        ev(0, 0, 1, 1.0), ev(1, 5, 1, 2.0), ev(2, 10, 1, 3.0),   # session A (user 1)
        ev(3, 120, 1, 4.0), ev(4, 130, 1, 5.0),                  # session B (user 1)
        ev(5, 1, 2, 7.0),                                        # session C (user 2)
    ]
    # watermark driver: far-future event keeps its own session open but
    # pushes the watermark past every earlier session's close
    file2 = [ev(6, 720, 99, 0.0)]

    gap = 30
    batch = spark.createDataFrame(file1 + file2, schema)
    want = {
        (r["user_id"], str(r["session_start"])): (
            str(r["session_end"]), r["n_events"], round(r["total_value"], 6)
        )
        for r in sessionize_events(batch, gap_minutes=gap).collect()
        if r["user_id"] != 99  # user 99's session never closes
    }
    assert len(want) == 3

    import os
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        os.makedirs(f"{tmp}/in")
        # two files -> two micro-batches (maxFilesPerTrigger=1), so the
        # second batch's advanced watermark fires the timeouts
        spark.createDataFrame(file1, schema).coalesce(1).write.parquet(f"{tmp}/f1")
        spark.createDataFrame(file2, schema).coalesce(1).write.parquet(f"{tmp}/f2")
        for i, src in enumerate(("f1", "f2")):
            part = [f for f in os.listdir(f"{tmp}/{src}") if f.endswith(".parquet")][0]
            os.rename(f"{tmp}/{src}/{part}", f"{tmp}/in/{i:02d}.parquet")
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/in")
        )
        out = sessionize_events_stream(stream, gap_minutes=gap, watermark="1 minute")
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("sessions_out")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .start()
        )
        try:
            q.processAllAvailable()
            got = {
                (r["user_id"], str(r["session_start"])): (
                    str(r["session_end"]), r["n_events"], round(r["total_value"], 6)
                )
                for r in spark.sql("SELECT * FROM sessions_out").collect()
            }
        finally:
            q.stop()
    assert got == want


def test_sessionize_stream_late_event_bridges_closed_intervals(spark):
    """The round-4 early-emission edge case: two gap-separated intervals
    arrive in one micro-batch (an eager implementation would emit the
    first immediately), then a watermark-admitted LATE event in a later
    micro-batch lands in the gap and BRIDGES them into one session.
    Correct append-mode semantics (emit only once the watermark passes
    session_end + gap) must produce exactly the batch twin's single
    merged session — no overlapping/duplicate emissions."""
    import datetime as dt
    import os
    import tempfile

    from graph_mining_spark.streaming import sessionize_events, sessionize_events_stream

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(eid, minutes, uid, val):
        return (eid, t0 + dt.timedelta(minutes=minutes), uid, "click", val, "{}")

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    # two intervals 60 min apart (gap 30) in the first micro-batch
    file1 = [ev(0, 0, 1, 1.0), ev(1, 60, 1, 2.0)]
    # late bridging event at minute 30 (within gap of both intervals;
    # admitted because watermark delay is 3 h) + watermark driver
    file2 = [ev(2, 30, 1, 4.0), ev(3, 600, 99, 0.0)]

    batch = spark.createDataFrame(file1 + file2, schema)
    want = {
        (r["user_id"], str(r["session_start"])): (
            str(r["session_end"]), r["n_events"], round(r["total_value"], 6)
        )
        for r in sessionize_events(batch, gap_minutes=30).collect()
        if r["user_id"] != 99
    }
    assert want == {(1, "2024-01-01 00:00:00"): ("2024-01-01 01:00:00", 3, 7.0)}

    with tempfile.TemporaryDirectory() as tmp:
        os.makedirs(f"{tmp}/in")
        spark.createDataFrame(file1, schema).coalesce(1).write.parquet(f"{tmp}/f1")
        spark.createDataFrame(file2, schema).coalesce(1).write.parquet(f"{tmp}/f2")
        for i, src in enumerate(("f1", "f2")):
            part = [f for f in os.listdir(f"{tmp}/{src}") if f.endswith(".parquet")][0]
            os.rename(f"{tmp}/{src}/{part}", f"{tmp}/in/{i:02d}.parquet")
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/in")
        )
        out = sessionize_events_stream(stream, gap_minutes=30, watermark="3 hours")
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("sessions_bridge_out")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .start()
        )
        try:
            q.processAllAvailable()
            got = {
                (r["user_id"], str(r["session_start"])): (
                    str(r["session_end"]), r["n_events"], round(r["total_value"], 6)
                )
                for r in spark.sql("SELECT * FROM sessions_bridge_out").collect()
            }
        finally:
            q.stop()
    assert got == want


def test_sessionize_stream_late_event_merges(spark):
    """A watermark-admitted LATE event arriving in a later micro-batch
    that lands inside the open session must merge into it (not corrupt
    its bounds): final emitted session == batch twin over all events."""
    import datetime as dt
    import os
    import tempfile

    from graph_mining_spark.streaming import sessionize_events, sessionize_events_stream

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(eid, minutes, uid, val):
        return (eid, t0 + dt.timedelta(minutes=minutes), uid, "click", val, "{}")

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    file1 = [ev(0, 0, 1, 1.0), ev(1, 10, 1, 2.0)]
    # late event at minute 5 (inside the open session) + a far-future
    # watermark driver that flushes user 1's session via timeout
    file2 = [ev(2, 5, 1, 4.0), ev(3, 600, 99, 0.0)]

    batch = spark.createDataFrame(file1 + file2, schema)
    want = {
        (r["user_id"], str(r["session_start"])): (
            str(r["session_end"]), r["n_events"], round(r["total_value"], 6)
        )
        for r in sessionize_events(batch, gap_minutes=30).collect()
        if r["user_id"] != 99
    }
    assert want == {(1, "2024-01-01 00:00:00"): ("2024-01-01 00:10:00", 3, 7.0)}

    with tempfile.TemporaryDirectory() as tmp:
        os.makedirs(f"{tmp}/in")
        spark.createDataFrame(file1, schema).coalesce(1).write.parquet(f"{tmp}/f1")
        spark.createDataFrame(file2, schema).coalesce(1).write.parquet(f"{tmp}/f2")
        for i, src in enumerate(("f1", "f2")):
            part = [f for f in os.listdir(f"{tmp}/{src}") if f.endswith(".parquet")][0]
            os.rename(f"{tmp}/{src}/{part}", f"{tmp}/in/{i:02d}.parquet")
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/in")
        )
        out = sessionize_events_stream(stream, gap_minutes=30, watermark="3 hours")
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("sessions_late_out")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .start()
        )
        try:
            q.processAllAvailable()
            got = {
                (r["user_id"], str(r["session_start"])): (
                    str(r["session_end"]), r["n_events"], round(r["total_value"], 6)
                )
                for r in spark.sql("SELECT * FROM sessions_late_out").collect()
            }
        finally:
            q.stop()
    assert got == want
