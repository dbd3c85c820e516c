"""Structured Streaming surface: file-source streams drained with
availableNow into memory sinks."""

from __future__ import annotations

import shutil
import tempfile
from datetime import datetime

import pytest

from hashquery_spark.streaming import (
    read_event_stream,
    run_to_memory,
    sessionize,
    streaming_step_counts,
    windowed_event_counts,
)

SCHEMA = "user_id long, event_type string, ts timestamp"

ROWS = [
    (1, "signup", datetime(2024, 1, 1, 10, 0)),
    (1, "click", datetime(2024, 1, 1, 10, 5)),
    (1, "purchase", datetime(2024, 1, 1, 11, 30)),  # new session (gap > 30m)
    (2, "signup", datetime(2024, 1, 1, 10, 20)),
    (2, "click", datetime(2024, 1, 2, 9, 0)),
]


@pytest.fixture(scope="module")
def stream_dir(spark):
    d = tempfile.mkdtemp(prefix="hq_stream_")
    spark.createDataFrame(ROWS, SCHEMA).coalesce(1).write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_windowed_event_counts(spark, stream_dir):
    stream = read_event_stream(spark, stream_dir, SCHEMA)
    assert stream.isStreaming
    out = run_to_memory(
        windowed_event_counts(stream, "ts", "event_type", window="1 hour"),
        "wc_test",
    )
    got = {
        (r["window_start"], r["event_type"]): r["n_events"] for r in out.collect()
    }
    assert got[(datetime(2024, 1, 1, 10, 0), "signup")] == 2
    assert got[(datetime(2024, 1, 1, 10, 0), "click")] == 1
    assert got[(datetime(2024, 1, 1, 11, 0), "purchase")] == 1


def test_sessionize_gap_splits(spark, stream_dir):
    stream = read_event_stream(spark, stream_dir, SCHEMA)
    out = run_to_memory(
        sessionize(stream, "ts", "user_id", gap="30 minutes"), "sess_test"
    )
    sessions = sorted(
        (r["user_id"], r["session_start"], r["n_events"]) for r in out.collect()
    )
    # user 1: (10:00-10:05) session of 2, then 11:30 session of 1
    # user 2: two single-event sessions on different days
    assert sessions == [
        (1, datetime(2024, 1, 1, 10, 0), 2),
        (1, datetime(2024, 1, 1, 11, 30), 1),
        (2, datetime(2024, 1, 1, 10, 20), 1),
        (2, datetime(2024, 1, 2, 9, 0), 1),
    ]


def test_streaming_step_counts(spark, stream_dir):
    stream = read_event_stream(spark, stream_dir, SCHEMA)
    out = run_to_memory(
        streaming_step_counts(
            stream, "ts", "event_type", ["signup", "click", "purchase"], window="1 day"
        ),
        "steps_test",
    )
    got = {r["window_start"]: r for r in out.collect()}
    day1 = got[datetime(2024, 1, 1)]
    assert (day1["signup_count"], day1["click_count"], day1["purchase_count"]) == (2, 1, 1)
    day2 = got[datetime(2024, 1, 2)]
    assert day2["click_count"] == 1


def test_watermark_drops_late_events(spark):
    """True watermark semantics: an event arriving in a later micro-batch,
    older than (max event time - watermark), is dropped from its window."""
    import shutil, tempfile
    from pyspark.sql import functions as F

    d = tempfile.mkdtemp(prefix="hq_late_")
    try:
        schema = "user_id long, event_type string, ts timestamp"
        # watermark is a MAY-drop lower bound: a late row landing in the
        # same batch that finalizes its window can still be included. So:
        # b1 advances watermark past the 9:00 window, b2 finalizes+evicts
        # it, and only then does b3 deliver the too-late row.
        b1 = [(1, "view", datetime(2024, 1, 1, 9, 30)),
              (2, "view", datetime(2024, 1, 1, 12, 0))]
        b2 = [(4, "view", datetime(2024, 1, 1, 12, 30))]
        b3 = [(3, "view", datetime(2024, 1, 1, 9, 45))]  # behind watermark
        import time as _time

        spark.createDataFrame(b1, schema).coalesce(1).write.parquet(f"{d}/b1")
        _time.sleep(1.5)  # file source orders by modification time
        spark.createDataFrame(b2, schema).coalesce(1).write.parquet(f"{d}/b2")
        _time.sleep(1.5)
        spark.createDataFrame(b3, schema).coalesce(1).write.parquet(f"{d}/b3")

        stream = (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/b*")
        )
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("ws"), "n")
        )
        q = (agg.writeStream.format("memory").queryName("late_test")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
        got = {r["ws"]: r["n"] for r in spark.table("late_test").collect()}
        # the 9:00 window was finalized before the late row arrived:
        # it contains ONLY the on-time event
        assert got[datetime(2024, 1, 1, 9, 0)] == 1
    finally:
        shutil.rmtree(d, ignore_errors=True)
