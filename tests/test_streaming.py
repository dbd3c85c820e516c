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


def test_streaming_funnel_progress_matches_batch(spark):
    """Single in-order batch: final per-entity progress equals the batch
    match_steps result on the reference's 7-user docstring fixture."""
    import shutil, tempfile
    from hashquery_spark.streaming import streaming_funnel_progress

    rows = [
        (0, "ad_impression", datetime(2024, 1, 1)), (0, "visit", datetime(2024, 1, 2)),
        (0, "purchase", datetime(2024, 1, 4)),
        (1, "ad_impression", datetime(2024, 1, 1)), (1, "visit", datetime(2024, 1, 2)),
        (1, "purchase", datetime(2024, 1, 3)), (1, "purchase", datetime(2024, 1, 4)),
        (2, "ad_impression", datetime(2024, 1, 1)), (2, "visit", datetime(2024, 1, 2)),
        (3, "ad_impression", datetime(2024, 1, 1)), (3, "visit", datetime(2024, 1, 2)),
        (4, "ad_impression", datetime(2024, 1, 1)),
        (5, "visit", datetime(2024, 1, 1)), (5, "purchase", datetime(2024, 1, 2)),
        (6, "other_event", datetime(2024, 1, 1)),
    ]
    d = tempfile.mkdtemp(prefix="hq_sfunnel_")
    try:
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(d)
        stream = read_event_stream(spark, d, SCHEMA)
        out = streaming_funnel_progress(
            stream, "user_id", "ts", "event_type",
            ["ad_impression", "visit", "purchase"],
        )
        q = (out.writeStream.format("memory").queryName("sfunnel_test")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
        got = {r["user_id"]: r["last_matched_step_index"]
               for r in spark.table("sfunnel_test").collect()}
        # batch answer: u0=2, u1=2, u2=1, u3=1, u4=0; u5/u6 never enter
        assert got == {0: 2, 1: 2, 2: 1, 3: 1, 4: 0}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_funnel_progress_carries_state_across_batches(spark):
    import shutil, tempfile, time as _time
    from hashquery_spark.streaming import streaming_funnel_progress

    d = tempfile.mkdtemp(prefix="hq_sfunnel2_")
    try:
        b1 = [(1, "signup", datetime(2024, 1, 1, 10, 0)),
              (2, "click", datetime(2024, 1, 1, 10, 0))]  # click before signup: no entry
        b2 = [(1, "click", datetime(2024, 1, 2, 10, 0)),
              (2, "signup", datetime(2024, 1, 2, 10, 0))]
        spark.createDataFrame(b1, SCHEMA).coalesce(1).write.parquet(f"{d}/b1")
        _time.sleep(1.5)
        spark.createDataFrame(b2, SCHEMA).coalesce(1).write.parquet(f"{d}/b2")
        stream = (spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1)
                  .parquet(f"{d}/b*"))
        out = streaming_funnel_progress(
            stream, "user_id", "ts", "event_type", ["signup", "click"])
        q = (out.writeStream.format("memory").queryName("sfunnel2_test")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
        rows = [(r["user_id"], r["last_matched_step_index"])
                for r in spark.table("sfunnel2_test").collect()]
        # u1: signup in b1 (idx 0), click in b2 advances to 1 via carried state
        # u2: click-before-signup never enters in b1; signup in b2 -> idx 0
        assert max(i for u, i in rows if u == 1) == 1
        assert (1, 0) in rows  # b1 emission before the state carried over
        assert max(i for u, i in rows if u == 2) == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_deterministic_sampling_is_streaming_compatible(spark, stream_dir):
    """stratified_sample / train_test_split are stateless narrow ops, so
    they apply unchanged to a streaming DataFrame — and because membership
    is md5(seed:id), the streamed sample equals the batch sample exactly
    (df.sample() can't promise that)."""
    from hashquery_spark.ops import train_test_split

    stream = (
        spark.readStream.schema(SCHEMA).parquet(stream_dir)
    )
    split_stream = train_test_split(stream, "user_id", test_fraction=0.5, seed=1)
    q = (
        split_stream.writeStream.format("memory")
        .queryName("split_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("split_sink").collect()
    batch = train_test_split(
        spark.read.schema(SCHEMA).parquet(stream_dir), "user_id", 0.5, seed=1
    )
    want = {(r["user_id"], r["event_type"]): r["split"] for r in batch.collect()}
    assert len(got) == len(ROWS)
    for r in got:
        assert r["split"] == want[(r["user_id"], r["event_type"])]


def test_streaming_curate_matches_batch(spark, tmp_path):
    """The streaming curation pipeline (stateless candidates + stateful
    dedup) must keep the same documents as batch curate when ids arrive
    in order (first-arrival == min-id)."""
    from hashquery_spark.ops import curate
    from hashquery_spark.streaming import streaming_curate

    docs = [
        (1, "the quick brown fox and the lazy dog in the sun"),
        (2, "the quick brown fox and the lazy dog in the sun"),  # dup of 1
        (3, "el la de que y en un por con los amigos"),           # filtered: es
        (4, "a perfectly fine english sentence for the test of it all"),
    ]
    path = str(tmp_path / "docs_stream")
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(1) \
        .sortWithinPartitions("doc_id").write.mode("overwrite").parquet(path)

    kwargs = dict(min_quality=0.2, langs=("en",), max_dup_line_ratio=0.5,
                  test_fraction=0.5, seed=4)
    stream = spark.readStream.schema("doc_id long, text string").parquet(path)
    q = (
        streaming_curate(stream, "text", "doc_id", **kwargs)
        .writeStream.format("memory").queryName("curate_sink")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        int(r["doc_id"]): (r["lang_pred"], r["split"])
        for r in spark.table("curate_sink").collect()
    }
    want = {
        r["doc_id"]: (r["lang_pred"], r["split"])
        for r in curate(
            spark.read.parquet(path), "text", "doc_id", **kwargs
        ).collect()
    }
    assert got == want and set(got) == {1, 4}


def test_enrich_stream_with_static_dim(spark, stream_dir):
    from hashquery_spark.streaming import enrich_stream

    stream = read_event_stream(spark, stream_dir, SCHEMA)
    dim = spark.createDataFrame(
        [("signup", "acquisition"), ("purchase", "revenue")],
        "event_type string, category string",
    )
    out = enrich_stream(stream, dim, on="event_type")
    # stream-static joins are append-mode (stateless per micro-batch)
    q = (
        out.writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("enriched").collect()
    cats = {(r.user_id, r.event_type): r.category for r in rows}
    assert len(rows) == len(ROWS)  # left join: no stream rows lost
    assert cats[(1, "signup")] == "acquisition"
    assert cats[(1, "purchase")] == "revenue"
    assert cats[(1, "click")] is None  # unmatched dim -> NULL


def test_write_stream_parquet_exactly_once_resume(spark, stream_dir, tmp_path):
    from hashquery_spark.streaming import write_stream_parquet

    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream = read_event_stream(spark, stream_dir, SCHEMA)
    q = write_stream_parquet(stream, out_dir, ckpt, trigger_once=True)
    q.awaitTermination()
    assert spark.read.parquet(out_dir).count() == len(ROWS)
    # resuming from the same checkpoint with no new input writes NOTHING
    q2 = write_stream_parquet(
        read_event_stream(spark, stream_dir, SCHEMA), out_dir, ckpt, trigger_once=True
    )
    q2.awaitTermination()
    assert spark.read.parquet(out_dir).count() == len(ROWS)


def test_join_streams_interval_attribution(spark, tmp_path):
    """Stream-stream interval join: conversions attribute to the
    impression within [imp_ts, imp_ts + within]; matches the equivalent
    batch join exactly once both streams drain."""
    from hashquery_spark.streaming import join_streams, read_event_stream

    imp_rows = [
        (1, "campA", datetime(2024, 1, 1, 10, 0)),
        (1, "campB", datetime(2024, 1, 1, 12, 0)),
        (2, "campA", datetime(2024, 1, 1, 10, 30)),
    ]
    conv_rows = [
        (1, 9.99, datetime(2024, 1, 1, 10, 10)),   # -> campA (within 15m)
        (1, 5.00, datetime(2024, 1, 1, 11, 0)),    # no impression within 15m
        (2, 7.50, datetime(2024, 1, 1, 10, 31)),   # -> campA/user2
        (3, 1.00, datetime(2024, 1, 1, 10, 5)),    # no impression at all
    ]
    imp_schema = "user_id long, campaign string, imp_ts timestamp"
    conv_schema = "user_id long, amount double, conv_ts timestamp"
    d1, d2 = str(tmp_path / "imp"), str(tmp_path / "conv")
    spark.createDataFrame(imp_rows, imp_schema).coalesce(1).write.parquet(d1)
    spark.createDataFrame(conv_rows, conv_schema).coalesce(1).write.parquet(d2)

    out = join_streams(
        read_event_stream(spark, d1, imp_schema),
        read_event_stream(spark, d2, conv_schema),
        on=["user_id"],
        left_ts="imp_ts",
        right_ts="conv_ts",
        within="15 minutes",
    )
    q = (
        out.writeStream.format("memory").queryName("attrib")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = sorted(
        (r.user_id, r.campaign, r.amount) for r in spark.table("attrib").collect()
    )
    assert got == [(1, "campA", 9.99), (2, "campA", 7.5)]
    assert set(spark.table("attrib").columns) == {
        "user_id", "campaign", "imp_ts", "amount", "conv_ts"
    }


def test_join_streams_rejects_bad_how(spark, tmp_path):
    from hashquery_spark.streaming import join_streams, read_event_stream

    d = str(tmp_path / "s")
    spark.createDataFrame([(1, datetime(2024, 1, 1))], "k long, ts timestamp") \
        .write.parquet(d)
    s = read_event_stream(spark, d, "k long, ts timestamp")
    with pytest.raises(ValueError):
        join_streams(s, s, on=["k"], left_ts="ts", right_ts="ts", how="semi")


def test_streaming_counter_delta_carries_state(spark):
    import shutil, tempfile, time as _time
    from hashquery_spark.streaming import streaming_counter_delta

    sch = "series string, ts timestamp, v double"
    d = tempfile.mkdtemp(prefix="hq_scd_")
    try:
        b1 = [("a", datetime(2024, 1, 1, 0, 0), 100.0),
              ("a", datetime(2024, 1, 1, 0, 30), 150.0)]
        b2 = [("a", datetime(2024, 1, 1, 1, 0), 30.0),    # reset
              ("a", datetime(2024, 1, 1, 1, 30), 40.0),
              ("b", datetime(2024, 1, 1, 1, 0), 5.0)]     # new series
        spark.createDataFrame(b1, sch).coalesce(1).write.parquet(f"{d}/b1")
        _time.sleep(1.5)
        spark.createDataFrame(b2, sch).coalesce(1).write.parquet(f"{d}/b2")
        stream = (spark.readStream.schema(sch).option("maxFilesPerTrigger", 1)
                  .parquet(f"{d}/b*"))
        out = streaming_counter_delta(stream, "series", "ts", "v")
        q = (out.writeStream.format("memory").queryName("scd_test")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
        got = {(r.series, r.ts.hour, r.ts.minute): r.increase
               for r in spark.table("scd_test").collect()}
        assert got[("a", 0, 0)] is None          # first-ever sample
        assert got[("a", 0, 30)] == 50.0
        assert got[("a", 1, 0)] == 30.0          # reset ACROSS batches via state
        assert got[("a", 1, 30)] == 10.0
        assert got[("b", 1, 0)] is None
        assert len(got) == 5
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_score_stream_matches_batch_classifier(spark, tmp_path):
    """score_stream (in-row HOF fold) == classifier_score (explode +
    broadcast-join rollup) on the same docs, and runs append-mode on an
    actual file stream with no state store."""
    from hashquery_spark.ops import classifier_score, token_bucket_py
    from hashquery_spark.streaming import score_stream

    docs = [
        (1, "good data pipeline"),
        (2, "bad spam offer spam"),
        (3, ""),
        (4, "neutral words only"),
    ]
    d = str(tmp_path / "docs")
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(1).write.parquet(d)
    n = 4096
    w = {token_bucket_py("data", n): 2.0, token_bucket_py("spam", n): -1.5}

    batch = spark.read.parquet(d)
    expected = {
        r["doc_id"]: (r["n_tokens"], r["margin"], r["keep"])
        for r in classifier_score(batch, "text", "doc_id", w, bias=0.25, n_features=n).collect()
    }

    stream = spark.readStream.schema("doc_id long, text string").parquet(d)
    scored = score_stream(stream, "text", "doc_id", w, bias=0.25, n_features=n)
    q = (
        scored.writeStream.format("memory")
        .queryName("scored_docs")
        .outputMode("append")  # stateless: append works with no watermark
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["doc_id"]: (r["n_tokens"], r["margin"], r["keep"])
        for r in spark.table("scored_docs").collect()
    }
    assert got == expected
    assert got[2][2] is False and got[2][1] == -2.75  # 2x spam + bias


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark keeps one row per key within the
    horizon; the emitted row set has one entry per distinct key and the
    state contract is bounded (documented complement to the forever-
    state streaming_dedup)."""
    from hashquery_spark.streaming import streaming_dedup_within

    rows = [
        (1, "a", datetime(2024, 1, 1, 10, 0)),
        (1, "a", datetime(2024, 1, 1, 10, 1)),   # dup within horizon
        (2, "b", datetime(2024, 1, 1, 10, 2)),
        (1, "a", datetime(2024, 1, 1, 10, 3)),   # still within horizon
        (3, "c", datetime(2024, 1, 1, 10, 4)),
    ]
    path = str(tmp_path / "dups")
    spark.createDataFrame(
        rows, "k long, payload string, ts timestamp"
    ).coalesce(1).sortWithinPartitions("ts").write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(
        "k long, payload string, ts timestamp"
    ).parquet(path)
    out = streaming_dedup_within(stream, "k", "ts", watermark="1 hour")
    q = (
        out.writeStream.format("memory").queryName("dedup_within")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = sorted((r["k"], r["payload"]) for r in spark.table("dedup_within").collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]


def test_streaming_drift_psi_per_window(spark, stream_dir):
    """PSI per window vs a static baseline: a window matching the
    baseline mix scores ~0; a window of pure unseen categories scores
    high; batch and streaming paths agree exactly (the score_stream
    consistency contract)."""
    import math

    from hashquery_spark.streaming import read_event_stream, run_to_memory
    from hashquery_spark.streaming import streaming_drift

    baseline = spark.createDataFrame(
        [("signup",), ("signup",), ("click",), ("purchase",)],
        "event_type string",
    )
    stream = read_event_stream(spark, stream_dir, SCHEMA)
    out = run_to_memory(
        streaming_drift(stream, "ts", "event_type", baseline, window="1 hour"),
        "drift_test",
    )
    got = {r["window_start"]: (r["n_events"], r["psi"]) for r in out.collect()}
    assert set(got) == {
        datetime(2024, 1, 1, 10, 0),
        datetime(2024, 1, 1, 11, 0),
        datetime(2024, 1, 2, 9, 0),
    }
    # the 10:00 window (2 signup, 1 click) is closest to the baseline
    assert got[datetime(2024, 1, 1, 10, 0)][0] == 3
    assert all(v[1] >= 0 for v in got.values())
    assert got[datetime(2024, 1, 1, 10, 0)][1] < got[datetime(2024, 1, 1, 11, 0)][1]

    # batch/stream consistency: identical math on the batch frame
    batch = spark.createDataFrame(ROWS, SCHEMA)
    bout = {
        r["window_start"]: (r["n_events"], r["psi"])
        for r in streaming_drift(
            batch, "ts", "event_type", baseline, window="1 hour"
        ).collect()
    }
    assert bout == got

    # hand-check one PSI: 11:00 window = 1 purchase only.
    # shares: signup .5 click .25 purchase .25; p = (sm, sm, 1.0), other sm
    sm = 1e-4
    exp = (
        (sm - 0.5) * math.log(sm / 0.5)
        + (sm - 0.25) * math.log(sm / 0.25)
        + (1.0 - 0.25) * math.log(1.0 / 0.25)
        + (sm - sm) * math.log(sm / sm)
    )
    assert abs(got[datetime(2024, 1, 1, 11, 0)][1] - exp) < 1e-9
