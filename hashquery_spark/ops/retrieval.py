"""BM25 full-text retrieval over a document corpus (net-new; the
reference has no retrieval surface). The standard lexical ranker for
contamination auditing, eval-set mining, and corpus search.

Scale design — everything pivots on "queries are tiny, the corpus is
not":

* ONE explode of the corpus feeds term frequencies, document lengths,
  and document frequencies (shared subframes; the per-doc rollups are
  partial-combined groupBys on the id).
* The query-term table broadcasts; the corpus explode is immediately
  semi-joined to it, so only rows whose token appears in SOME query
  survive past the scan — tf/df never materialize for the rest of the
  vocabulary.
* ``avgdl`` and ``N`` are single-row aggregates broadcast via a cross
  join (no driver collect).
* The final top-k is a per-query rank window over the scored rollup —
  bounded output, deterministic (score DESC rounded to 4 dp, doc id ASC
  tiebreak: the repo-standard similarity-ranking contract).

Determinism: idf is rounded to 4 decimals BEFORE entering the score
product (the tfidf/libm-ulp lesson); the saturation ratio is plain
IEEE-double arithmetic with identical operation order in the DuckDB
oracle, and the final score rounds to 4 dp pre-ranking.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import tokens


def bm25_search(
    docs: DataFrame,
    queries: Mapping[str, str],
    text_col: str,
    id_col: str,
    *,
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> DataFrame:
    """(query_id, doc_id_col, score, rank) — top-``top_k`` documents per
    query under BM25 (Robertson/Sparck-Jones idf with the +1 floor, so
    idf is never negative). ``queries`` maps query_id → query text; both
    sides tokenize with the corpus normalizer.
    """
    spark = docs.sparkSession
    qrows = []
    for qid, qtext in queries.items():
        seen = set()
        for tok in _py_tokens(qtext):
            if tok and tok not in seen:
                seen.add(tok)
                qrows.append((str(qid), tok))
    if not qrows:
        raise ValueError("bm25_search: no non-empty query terms")
    qterms = spark.createDataFrame(qrows, "query_id: string, token: string")

    ex = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    ).where(F.col("token") != "")
    # per-doc length (all tokens, BEFORE the query-term restriction)
    dl = ex.groupBy(id_col).agg(F.count(F.lit(1)).alias("__dl__"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("__n_docs__"),
        F.avg("__dl__").alias("__avgdl__"),
    )
    # restrict the explode to query terms as early as possible
    hits = ex.join(F.broadcast(qterms.select("token").distinct()), on="token")
    tf = hits.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("__tf__"))
    df_t = tf.groupBy("token").agg(F.count(F.lit(1)).alias("__df__"))

    idf = F.round(
        F.log(
            (F.col("__n_docs__") - F.col("__df__") + F.lit(0.5))
            / (F.col("__df__") + F.lit(0.5))
            + F.lit(1.0)
        ),
        4,
    )
    sat = (F.col("__tf__") * F.lit(k1 + 1.0)) / (
        F.col("__tf__")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl__") / F.col("__avgdl__"))
    )
    # each term score snaps to the 1e-4 grid and sums as an integer, so
    # the per-group sum order (≤ |query| doubles otherwise) can't differ
    # between engines
    term_scaled = F.round(idf * sat * F.lit(10000.0), 0).cast("long")
    scored = (
        tf.join(F.broadcast(df_t), on="token")
        .join(dl, on=id_col)
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(qterms), on="token")
        .groupBy("query_id", id_col)
        .agg(
            F.round(F.sum(term_scaled) / F.lit(10000.0), 4).alias("score")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= top_k)
        .select("query_id", id_col, "score", "rank")
    )


def _py_tokens(text: str):
    """Driver-side twin of dedup.tokens for query strings."""
    import re

    return re.sub(r"[^a-z0-9]+", " ", text.lower()).strip().split(" ")
