"""Hashing-trick logistic-regression quality classifier
(hashquery_spark/ops/classifier.py).

``classifier_fit`` is iterative (no SQL oracle — same class as
kmeans_fit), so correctness is pinned here: loss descends, an easy
signal separates perfectly, and the fit is partitioning-independent
(integer-scaled gradients). ``classifier_score`` additionally has a
DuckDB oracle (`classifier_score` in __spark_entry__.py).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hashquery_spark.ops import (
    classifier_fit,
    classifier_score,
    token_bucket_py,
)


@pytest.fixture(scope="module")
def labeled_docs(spark):
    """120 docs: positives talk about spark/data, negatives about
    spam/junk; shared filler words force the model to find the signal."""
    rows = []
    for i in range(60):
        rows.append((i, f"the quick data spark pipeline number {i % 7}", 1))
        rows.append(
            (100 + i, f"the quick spam junk offer number {i % 7}", 0)
        )
    return spark.createDataFrame(rows, "doc_id: long, text: string, y: int")


def test_score_manual_weights(spark):
    df = spark.createDataFrame(
        [(1, "good data"), (2, "bad spam"), (3, "")],
        "doc_id: long, text: string",
    )
    n = 65536
    w = {
        token_bucket_py("data", n): 2.0,
        token_bucket_py("spam", n): -3.5,
    }
    out = classifier_score(df, "text", "doc_id", w, bias=0.5, n_features=n)
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[1]["margin"] == pytest.approx(2.5)
    assert got[1]["keep"] is True
    assert got[1]["n_tokens"] == 2
    assert got[2]["margin"] == pytest.approx(-3.0)
    assert got[2]["keep"] is False
    # empty doc survives scoring (explode_outer) with bias-only margin
    assert got[3]["n_tokens"] == 0
    assert got[3]["margin"] == pytest.approx(0.5)


def test_fit_loss_descends_and_separates(labeled_docs):
    model = classifier_fit(
        labeled_docs, "text", "doc_id", "y", n_features=1024, iters=6, lr=2.0
    )
    assert len(model.history) == 6
    assert model.history[-1] < model.history[0] * 0.5
    scored = model.score(labeled_docs, "text", "doc_id")
    joined = scored.join(labeled_docs.select("doc_id", "y"), "doc_id")
    agg = joined.agg(
        F.min(F.when(F.col("y") == 1, F.col("margin"))).alias("min_pos"),
        F.max(F.when(F.col("y") == 0, F.col("margin"))).alias("max_neg"),
    ).collect()[0]
    # perfect separation on the easy signal
    assert agg["min_pos"] > 0 > agg["max_neg"]


def test_fit_is_partitioning_independent(labeled_docs):
    a = classifier_fit(
        labeled_docs, "text", "doc_id", "y", n_features=256, iters=3, lr=1.0
    )
    b = classifier_fit(
        labeled_docs.repartition(13),
        "text",
        "doc_id",
        "y",
        n_features=256,
        iters=3,
        lr=1.0,
    )
    assert a.weights == b.weights
    assert a.bias == b.bias
    # loss history is informational (float avg → order-dependent last ulp)
    assert a.history == pytest.approx(b.history)


def test_bucket_py_matches_spark(spark):
    """Driver-side bucket twin == in-plan bucket for the same tokens."""
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "doc_id: long, text: string"
    )
    n = 4096
    out = classifier_score(
        df, "text", "doc_id", {token_bucket_py("beta", n): 1.0}, n_features=n
    )
    got = {r["doc_id"]: r["margin"] for r in out.collect()}
    assert got[2] == pytest.approx(1.0)
    assert got[1] == 0.0 and got[3] == 0.0


def test_fit_rejects_empty(spark):
    empty = spark.createDataFrame([], "doc_id: long, text: string, y: int")
    with pytest.raises(ValueError):
        classifier_fit(empty, "text", "doc_id", "y", iters=1)


def test_hash_features_buckets_and_values(spark):
    """Categoricals land at md5('salt:col=value') % n with value 1.0;
    numerics land at md5('salt:col') % n carrying their value; NULLs
    emit nothing — verified against the python twin bucket."""
    from hashquery_spark.ops import hash_features
    from hashquery_spark.ops.classifier import token_bucket_py
    import hashlib

    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, None, 7.0), (3, "b", None)],
        "id long, cat string, num double",
    )
    rows = sorted(
        (r["id"], r["feature_idx"], r["value"])
        for r in hash_features(df, ["cat", "num"], "id", n_features=16).collect()
    )

    def bucket(key):
        return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % 16

    assert rows == sorted([
        (1, bucket("fh:cat=a"), 1.0),
        (1, bucket("fh:num"), 2.5),
        (2, bucket("fh:num"), 7.0),
        (3, bucket("fh:cat=b"), 1.0),
    ])
