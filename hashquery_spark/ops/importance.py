"""Data Selection via Importance Resampling (DSIR, Xie et al. 2023):
score every corpus document by how target-like its hashed n-gram
distribution is — the standard way to skim a 100 TB raw crawl for the
slice that looks like a curated target set (Wikipedia, textbooks, code).

Method: hash unigrams into ``n_buckets`` features; estimate add-one-
smoothed bucket distributions p (target) and q (corpus); a document's
log importance weight is Σ_tokens ln(p[b]/q[b]). High = target-like.

Scale design: the corpus is scanned ONCE — per-(doc, bucket) counts
are aggregated from a single explode pass and localCheckpointed; the
global corpus bucket table is a sum over that frame (bounded at
n_buckets rows), the target table is one count aggregate over the
(small) target sample, and scoring is a broadcast log-ratio join back
onto the same checkpointed frame. Nothing driver-side, nothing
quadratic, no UDF, no second pass over the raw text.

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
    # SINGLE corpus scan: per-(doc, bucket) token counts are built once
    # and feed BOTH the global corpus bucket table (sum over docs) and
    # the per-doc scoring join. The two consumers prune differently →
    # structurally different subtrees → no ReusedExchange without a
    # barrier (the dedup_against_fuzzy lesson), so the frame is
    # localCheckpointed; before this the op tokenized + scanned the
    # corpus twice — 2 full passes over the crawl at 100 TB.
    db = (
        _bucketed_tokens(corpus, text_col, id_col, n_buckets)
        .groupBy(id_col, "__b__")
        .agg(F.count(F.lit(1)).alias("__c__"))
        .localCheckpoint(eager=True)
    )
    ct = db.groupBy("__b__").agg(F.sum("__c__").alias("__nq__"))
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
    # floor form, not round(): a 1-ulp Spark-vs-DuckDB ln divergence
    # exactly at a .5 grid boundary would flip a bare round (the
    # mutual_information precedent); floor(x*1e4 + 0.5) is pure IEEE and
    # bit-identical in both engines.
    ratios = spine.select(
        "__b__",
        F.floor(F.log(p / q) * F.lit(1e4) + F.lit(0.5)).cast("long").alias("__lr__"),
    )
    # per-doc sums from the same checkpointed frame: Σ_tokens lr ==
    # Σ_buckets c·lr exactly (integer arithmetic, partitioning-free)
    return (
        db.join(F.broadcast(ratios), on="__b__")
        .groupBy(id_col)
        .agg(
            F.sum("__c__").alias("n_tokens"),
            F.sum(F.col("__c__") * F.col("__lr__")).alias("__s__"),
        )
        .select(
            F.col(id_col),
            "n_tokens",
            (F.col("__s__") / F.lit(10000.0)).alias("dsir_logw"),
        )
    )
