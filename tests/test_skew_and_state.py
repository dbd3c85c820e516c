"""Salted aggregation/join equivalence + stateful streaming dedup."""

from __future__ import annotations

import shutil
import tempfile
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from hashquery_spark.ops.skew import salted_aggregate, salted_join
from hashquery_spark.streaming import streaming_dedup


@pytest.fixture(scope="module")
def skewed(spark):
    rows = [(1, float(i % 7)) for i in range(500)]  # hot key 1
    rows += [(2, 1.0), (3, 2.0), (None, 5.0)]
    return spark.createDataFrame(rows, "k long, v double")


def test_salted_aggregate_equivalence(skewed):
    direct = {
        (r["k"],): (r["n"], r["total"], r["mx"])
        for r in skewed.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("total"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r["k"],): (r["n"], r["total"], r["mx"])
        for r in salted_aggregate(
            skewed, ["k"], {"n": ("count", "*"), "total": ("sum", "v"), "mx": ("max", "v")}
        ).collect()
    }
    assert direct == salted


def test_salted_aggregate_rejects_non_algebraic(skewed):
    with pytest.raises(ValueError):
        salted_aggregate(skewed, ["k"], {"a": ("avg", "v")})


def test_salted_join_equivalence(spark, skewed):
    dim = spark.createDataFrame([(1, "hot"), (2, "warm")], "k long, label string")
    direct = sorted(
        (r["k"], r["v"], r["label"]) for r in skewed.join(dim, "k").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["label"]) for r in salted_join(skewed, dim, "k").collect()
    )
    assert direct == salted


def test_streaming_dedup_across_batches(spark):
    d = tempfile.mkdtemp(prefix="hq_dedup_stream_")
    try:
        schema = "content_hash string, doc_id string, ts timestamp"
        batch1 = [("h1", "1", datetime(2024, 1, 1)), ("h2", "2", datetime(2024, 1, 1))]
        batch2 = [("h1", "3", datetime(2024, 1, 2)), ("h3", "4", datetime(2024, 1, 2))]
        spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(f"{d}/b1")
        spark.createDataFrame(batch2, schema).coalesce(1).write.parquet(f"{d}/b2")

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/b*")
        )
        deduped = streaming_dedup(stream, "content_hash", ["doc_id"])
        q = (
            deduped.writeStream.format("memory")
            .queryName("dedup_test")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = {r["content_hash"]: r["doc_id"] for r in spark.table("dedup_test").collect()}
        # h1 emitted once (whichever batch ran first), h2 and h3 once each
        assert set(out) == {"h1", "h2", "h3"}
    finally:
        shutil.rmtree(d, ignore_errors=True)
