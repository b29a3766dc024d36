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
