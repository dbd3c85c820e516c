"""Distributed text-quality classifier: hashing-trick logistic regression
(the fastText-style curation filter used by large-scale training-data
pipelines; net-new — the reference has no ML surface).

Two halves:

* :func:`classifier_score` — apply a (possibly trained) linear model to a
  corpus. The model is a ``{bucket: weight}`` dict over hashed token
  buckets; scoring is one explode + one broadcast join + one per-doc
  rollup. The corpus text never shuffles; only (id, bucket) pairs do, and
  the weight table (≤ ``n_features`` rows) broadcasts. Oracle-exact: the
  bucket hash is the repo-standard md5 scheme and weights are summed as
  integer micro-units, so Spark and DuckDB agree bit-for-bit.
* :func:`classifier_fit` — Lloyd's-style driver loop (the same bounded
  role as :func:`clustering.kmeans_fit`'s centroids): weights live on the
  driver (≤ ``n_features`` floats), each iteration costs one cached-
  feature pass — groupBy(id) margin rollup, an id-keyed residual join
  (co-located: features are pre-repartitioned by id and persisted, so the
  groupBy and the join-back reuse one partitioning), and a tiny
  groupBy(bucket) gradient shuffle of scalar longs. Gradients are summed
  as integer micro-units, so the fit is deterministic under any
  partitioning / AQE re-plan.

Scale: at 100 TB the only per-iteration shuffles move (id, bucket, cnt)
longs — never document text. ``n_features`` bounds driver memory exactly
like a broadcast variable (2^16 buckets = 0.5 MB of weights).
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass, field
from typing import Dict, List, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import fround, md5_hash32, tokens

_SCALE = 1_000_000  # micro-unit weight scaling (round-half-up, exact)


def _scale_weight(w: float) -> int:
    return int(math.floor(w * _SCALE + 0.5))


def token_bucket_py(token: str, n_features: int, salt: str = "qc") -> int:
    """Driver-side twin of the hashed-feature bucket (for building literal
    weight sets and oracle SQL): first 32 md5 bits of ``salt:token``, mod
    ``n_features``. Matches :func:`dedup.md5_hash32` and the DuckDB
    rendering in ``oracle_queries.H32``."""
    h = int(hashlib.md5(f"{salt}:{token}".encode()).hexdigest()[:8], 16)
    return h % n_features


def _bucketed_tokens(
    df: DataFrame, text_col: str, id_col: str, n_features: int, salt: str
) -> DataFrame:
    """(id, bucket) — one row per token; empty-token-filtered; documents
    with zero tokens survive as one NULL-bucket row (explode_outer), so
    scoring never silently drops rows."""
    toks = F.filter(tokens(F.col(text_col)), lambda t: t != "")
    ex = df.select(F.col(id_col), F.explode_outer(toks).alias("__tok__"))
    # md5_hash32 is in [0, 2^32) so plain % is non-negative in both engines
    bucket = (
        md5_hash32(F.concat(F.lit(f"{salt}:"), F.col("__tok__"))) % n_features
    )
    return ex.select(
        F.col(id_col),
        F.when(F.col("__tok__").isNotNull(), bucket).alias("bucket"),
    )


def classifier_score(
    df: DataFrame,
    text_col: str,
    id_col: str,
    weights: Mapping[int, float],
    bias: float = 0.0,
    *,
    n_features: int = 65536,
    salt: str = "qc",
) -> DataFrame:
    """(id, n_tokens, margin, keep) — linear score of each document under a
    hashed bag-of-tokens model: ``margin = bias + Σ_tokens w[bucket(tok)]``
    (missing buckets contribute 0), ``keep = margin > 0``.

    ``margin`` is exact to 6 decimals (integer micro-unit sums — no
    float-order dependence, no libm). The sigmoid is monotone, so a
    probability threshold is always expressible as a margin threshold;
    apply :func:`sigmoid` driver-side if calibrated probabilities are
    needed (transcendental → deliberately kept out of the exact output).
    """
    spark = df.sparkSession
    rows = [(int(b), _scale_weight(w)) for b, w in weights.items()]
    wdf = spark.createDataFrame(rows or [(-1, 0)], "bucket: long, ws: long")
    bt = _bucketed_tokens(df, text_col, id_col, n_features, salt)
    bias_s = _scale_weight(bias)
    rolled = (
        bt.join(F.broadcast(wdf), on="bucket", how="left")
        .groupBy(id_col)
        .agg(
            F.count("bucket").alias("n_tokens"),
            F.coalesce(F.sum("ws"), F.lit(0)).alias("__m__"),
        )
    )
    margin = fround((F.col("__m__") + F.lit(bias_s)) / F.lit(float(_SCALE)), 6)
    return rolled.select(
        F.col(id_col),
        "n_tokens",
        margin.alias("margin"),
        (margin > 0).alias("keep"),
    )


def sigmoid(margin: float) -> float:
    """Driver-side calibration helper: P(keep) for a scored margin."""
    return 1.0 / (1.0 + math.exp(-margin))


@dataclass
class ClassifierModel:
    """Trained hashed-feature logistic regression (driver-held, like a
    broadcast variable: ≤ n_features floats)."""

    weights: Dict[int, float]
    bias: float
    n_features: int
    salt: str
    history: List[float] = field(default_factory=list)  # mean logloss/iter

    def score(self, df: DataFrame, text_col: str, id_col: str) -> DataFrame:
        return classifier_score(
            df,
            text_col,
            id_col,
            self.weights,
            self.bias,
            n_features=self.n_features,
            salt=self.salt,
        )


def classifier_fit(
    df: DataFrame,
    text_col: str,
    id_col: str,
    label_col: str,
    *,
    n_features: int = 4096,
    iters: int = 8,
    lr: float = 1.0,
    l2: float = 0.0,
    salt: str = "qc",
) -> ClassifierModel:
    """Train hashed-feature logistic regression by full-batch gradient
    descent. ``label_col`` must be 0/1 (weak labels are the norm for
    curation filters: "looks like a reference corpus" vs "looks like raw
    crawl").

    Iterative ⇒ no SQL oracle (same class as ``kmeans_fit``); correctness
    is pinned by loss-descent / separation / determinism tests.
    """
    feats = (
        _bucketed_tokens(df, text_col, id_col, n_features, salt)
        .where(F.col("bucket").isNotNull())
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    labels = df.select(
        F.col(id_col), F.col(label_col).cast("double").alias("__y__")
    )
    # one shuffle up front; every iteration's groupBy(id) + id-join reuse
    # it. Explicit partition count (r10): a bare repartition(col) is
    # AQE-coalescable — the persisted frame could collapse to ~1
    # partition and every GD iteration's aggregates would run
    # single-core. The fit is partitioning-independent (test-pinned), so
    # the count only affects parallelism, never the weights.
    from .dedup import repartition_for_projection

    feats = repartition_for_projection(
        feats.join(labels, on=id_col), id_col
    ).persist()
    n_docs = labels.count()
    if n_docs == 0:
        raise ValueError("classifier_fit: empty input")

    w: Dict[int, float] = {}
    bias = 0.0
    history: List[float] = []
    spark = df.sparkSession
    for _ in range(iters):
        rows = [(int(b), _scale_weight(x)) for b, x in w.items()]
        wdf = spark.createDataFrame(rows or [(-1, 0)], "bucket: long, ws: long")
        margins = (
            feats.join(F.broadcast(wdf), on="bucket", how="left")
            .groupBy(id_col)
            .agg(
                F.first("__y__").alias("__y__"),
                F.coalesce(F.sum(F.col("ws") * F.col("cnt")), F.lit(0)).alias(
                    "__m__"
                ),
            )
        )
        # residual r = p - y, rounded to micro-units so gradient sums are
        # integer-exact (partitioning-independent fits)
        doc = margins.select(
            F.col(id_col),
            F.col("__y__"),
            (
                F.lit(1.0)
                / (
                    F.lit(1.0)
                    + F.exp(-(F.col("__m__") / F.lit(float(_SCALE)) + F.lit(bias)))
                )
            ).alias("__p__"),
        ).select(
            F.col(id_col),
            F.floor((F.col("__p__") - F.col("__y__")) * _SCALE + 0.5)
            .cast("long")
            .alias("__r__"),
            (
                -(
                    F.col("__y__") * F.log(F.greatest(F.col("__p__"), F.lit(1e-12)))
                    + (1 - F.col("__y__"))
                    * F.log(F.greatest(1 - F.col("__p__"), F.lit(1e-12)))
                )
            ).alias("__ll__"),
        )
        grad = (
            feats.join(doc.select(id_col, "__r__"), on=id_col)
            .groupBy("bucket")
            .agg(F.sum(F.col("__r__") * F.col("cnt")).alias("g"))
        )
        stats = doc.agg(
            F.sum("__r__").alias("rsum"), F.avg("__ll__").alias("loss")
        ).collect()[0]
        history.append(float(stats["loss"]))
        for row in grad.collect():
            b = int(row["bucket"])
            g = row["g"] / float(_SCALE) / n_docs + l2 * w.get(b, 0.0)
            w[b] = w.get(b, 0.0) - lr * g
        bias -= lr * (stats["rsum"] / float(_SCALE) / n_docs)
    feats.unpersist()
    return ClassifierModel(
        weights=w, bias=bias, n_features=n_features, salt=salt, history=history
    )


def hash_features(
    df: DataFrame,
    cols,
    id_col: str,
    n_features: int = 1024,
    salt: str = "fh",
) -> DataFrame:
    """Feature hashing (the hashing trick, Weinberger et al. 2009) for
    training export: each (column, value) pair maps to a bucket
    ``md5(salt:col=value) mod n_features``; numeric columns contribute
    their value at the bucket of their NAME, categoricals contribute
    1.0 at the bucket of ``col=value`` — the fixed-width sparse
    encoding a downstream trainer consumes without a vocabulary pass.
    Output: one row per (id, non-NULL feature): ``(id, feature_idx,
    value)``; collisions sum downstream (the hashing-trick contract).

    Exactness: buckets are the repo-standard portable md5 (identical in
    DuckDB); numeric values pass through as doubles.

    Scale: ONE narrow projection + a bounded per-row explode of
    len(cols) structs — no vocabulary build, no shuffle, no state;
    exactly why the hashing trick exists at 100 TB.
    """
    from pyspark.sql.types import NumericType

    cols = [cols] if isinstance(cols, str) else list(cols)
    schema = {f.name: f.dataType for f in df.schema.fields}
    items = []
    for c in cols:
        if c not in schema:
            raise ValueError(f"unknown column {c!r}")
        if isinstance(schema[c], NumericType):
            # numeric: fixed bucket from the column NAME, value carried
            key = F.lit(f"{salt}:{c}")
            val = F.col(c).cast("double")
        else:
            key = F.concat(
                F.lit(f"{salt}:{c}="), F.col(c).cast("string")
            )
            val = F.when(F.col(c).isNotNull(), F.lit(1.0))
        idx = (
            F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
            % n_features
        )
        items.append(
            F.when(
                F.col(c).isNotNull(),
                F.struct(idx.alias("feature_idx"), val.alias("value")),
            )
        )
    exploded = df.select(
        F.col(id_col),
        F.explode(
            F.filter(F.array(*items), lambda x: x.isNotNull())
        ).alias("__f__"),
    )
    return exploded.select(
        id_col,
        F.col("__f__.feature_idx").cast("int").alias("feature_idx"),
        F.col("__f__.value").alias("value"),
    )
