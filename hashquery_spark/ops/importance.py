"""Data Selection via Importance Resampling (DSIR, Xie et al. 2023):
score every corpus document by how target-like its hashed n-gram
distribution is — the standard way to skim a 100 TB raw crawl for the
slice that looks like a curated target set (Wikipedia, textbooks, code).

Method: hash unigrams into ``n_buckets`` features; estimate add-one-
smoothed bucket distributions p (target) and q (corpus); a document's
log importance weight is Σ_tokens ln(p[b]/q[b]). High = target-like.

Scale design: the two bucket tables are ONE count aggregate each
(bounded at n_buckets rows, map-side combined) joined into a single
broadcast log-ratio table; the corpus then streams once through
explode → broadcast-join → per-doc sum. Nothing driver-side, nothing
quadratic, no UDF.

Determinism: ln(p/q) snaps to a 1e-4-grid BIGINT per BUCKET (the
lm_score libm-ulp precedent), so per-doc sums are exact integers under
any partitioning, and ``dsir_logw = Σ/1e4`` is grid-exact (denominator
10^4 has no 2^5 factor — provably tie-free)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import ensure_parallelism, md5_hash32, tokens


def _bucketed_tokens(df: DataFrame, text_col: str, id_col, n_buckets: int):
    cols = [F.col(id_col)] if id_col else []
    return (
        ensure_parallelism(df.where(F.col(text_col).isNotNull()))
        .select(*cols, F.explode(tokens(F.col(text_col))).alias("__tok__"))
        .where(F.col("__tok__") != "")
        .select(
            *cols,
            F.pmod(
                md5_hash32(F.concat(F.lit("dsir:"), F.col("__tok__"))),
                F.lit(n_buckets),
            ).alias("__b__"),
        )
    )


def dsir_weights(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int = 4096,
) -> DataFrame:
    """(id, n_tokens, dsir_logw) — per-document DSIR log importance
    weight of every corpus doc against the target sample. Feed the
    result to :func:`~hashquery_spark.ops.sampling.weighted_sample` (on
    ``exp(dsir_logw)`` clipped to taste) or a top-fraction filter to
    materialize the resampled training set."""
    ct = _bucketed_tokens(corpus, text_col, None, n_buckets).groupBy("__b__").agg(
        F.count(F.lit(1)).alias("__nq__")
    )
    tt = _bucketed_tokens(target, text_col, None, n_buckets).groupBy("__b__").agg(
        F.count(F.lit(1)).alias("__np__")
    )
    spine = (
        corpus.sparkSession.range(n_buckets)
        .select(F.col("id").alias("__b__"))
        .join(tt, on="__b__", how="left")
        .join(ct, on="__b__", how="left")
        .fillna(0, subset=["__np__", "__nq__"])
    )
    # add-one smoothing; totals via an unpartitioned window over the
    # <= n_buckets spine (tiny by construction)
    from pyspark.sql import Window

    everything = Window.partitionBy()
    p = (F.col("__np__") + 1).cast("double") / (
        F.sum("__np__").over(everything) + F.lit(n_buckets)
    ).cast("double")
    q = (F.col("__nq__") + 1).cast("double") / (
        F.sum("__nq__").over(everything) + F.lit(n_buckets)
    ).cast("double")
    ratios = spine.select(
        "__b__",
        F.round(F.log(p / q) * F.lit(10000.0), 0).cast("long").alias("__lr__"),
    )
    return (
        _bucketed_tokens(corpus, text_col, id_col, n_buckets)
        .join(F.broadcast(ratios), on="__b__")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("__lr__").alias("__s__"),
        )
        .select(
            F.col(id_col),
            "n_tokens",
            (F.col("__s__") / F.lit(10000.0)).alias("dsir_logw"),
        )
    )
