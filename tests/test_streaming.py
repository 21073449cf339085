"""Structured Streaming variants: the same window expressions run
incrementally and converge to the batch answer."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from train_reports_etl_spark.streaming.windows import (
    streaming_tumbling_counts,
    tumbling_windows,
)


def test_streaming_tumbling_matches_batch(spark, tmp_path):
    # deterministic event file -> file-source stream (one micro-batch)
    events = spark.createDataFrame(
        [(i, f"2024-01-01 0{i % 3}:1{i % 6}:00", float(i)) for i in range(30)],
        ["event_id", "s", "value"],
    ).withColumn("ts", F.to_timestamp("s")).drop("s")
    src = str(tmp_path / "events_in")
    events.coalesce(1).write.mode("overwrite").parquet(src)

    batch = {
        (str(r.window_start), r.n_events)
        for r in tumbling_windows(events, agg_cols={"sum_value": "round(sum(value), 2)"}).collect()
    }

    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        streaming_tumbling_counts(stream, duration="1 hour", watermark="1 hour")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("tumbling_test")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (str(r.window_start), r.n_events)
            for r in spark.sql("SELECT * FROM tumbling_test").collect()
        }
    finally:
        q.stop()
    assert got == {(ws, n) for ws, n in batch}


def test_streaming_is_incremental(spark, tmp_path):
    src = str(tmp_path / "inc_in")
    spark.createDataFrame(
        [(1, "2024-01-01 00:05:00")], ["event_id", "s"]
    ).withColumn("ts", F.to_timestamp("s")).drop("s").coalesce(1).write.mode("overwrite").parquet(src)

    schema = "event_id bigint, ts timestamp"
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        streaming_tumbling_counts(stream, duration="1 hour", watermark="1 hour")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("inc_test")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT sum(n_events) AS s FROM inc_test").head().s == 1
        # append a second file -> next micro-batch picks it up
        spark.createDataFrame(
            [(2, "2024-01-01 00:06:00"), (3, "2024-01-01 02:00:00")],
            ["event_id", "s"],
        ).withColumn("ts", F.to_timestamp("s")).drop("s").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(0.1)
        q.processAllAvailable()
        rows = {
            (str(r.window_start), r.n_events)
            for r in spark.sql("SELECT * FROM inc_test").collect()
        }
        assert ("2024-01-01 00:00:00", 2) in rows
        assert ("2024-01-01 02:00:00", 1) in rows
    finally:
        q.stop()
