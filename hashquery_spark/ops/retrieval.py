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

from .dedup import fround

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

    idf = fround(
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
    term_scaled = F.floor(idf * sat * F.lit(10000.0) + F.lit(0.5)).cast("long")
    scored = (
        tf.join(F.broadcast(df_t), on="token")
        .join(dl, on=id_col)
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(qterms), on="token")
        .groupBy("query_id", id_col)
        .agg(
            fround(F.sum(term_scaled) / F.lit(10000.0), 4).alias("score")
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


def _ndcg_weight_micros(k: int):
    """floor(1e6/log2(rank+1) + 0.5) for rank = 1..k, plus the 0-prefixed
    cumulative sums — computed ONCE in Python and embedded as literals in
    BOTH engines (the classifier-fixture single-source pattern), so the
    log2 grid cannot drift between Spark, DuckDB and the docstring."""
    import math

    w = [int(math.floor(1e6 / math.log2(r + 1) + 0.5)) for r in range(1, k + 1)]
    cum = [0]
    for x in w:
        cum.append(cum[-1] + x)
    return w, cum


def retrieval_metrics(
    df: DataFrame,
    query_col: str,
    rank_col: str,
    rel_col: str,
    k: int = 10,
) -> DataFrame:
    """Ranking-quality metrics per query over a ranked results table
    (one row per (query, result) with its 1-based ``rank`` and a
    non-negative integer graded relevance): ``n_rel, dcg, idcg, ndcg,
    rr`` (reciprocal rank of the first relevant hit within top-k, 0 if
    none), ``p_at_k, r_at_k`` — the evaluation harness for bm25_search /
    ANN retrieval (Järvelin & Kekäläinen 2002 nDCG). Queries with zero
    relevant results carry no signal and are absent from the output.

    Exactness: the 1/log2(rank+1) discount lives on a Python-precomputed
    integer micro-unit grid shared verbatim with the oracle, so dcg/idcg
    are exact integer sums; ndcg is a double quotient of two integers,
    rr is the floor-form half-up micro-round of 1/rank, and p@k / r@k
    are tie-proof integer ratios — bit-identical cross-engine.

    Scale — ONE scan, one (query, rel) shuffle: per-(query, rel-level)
    aggregates carry the top-k discount sums; the IDCG closed form needs
    only the level counts and the cumulative discount literals (ranks
    ``prior+1 .. min(prior+count, k)`` of the ideal ordering), computed
    with a window partitioned by query over REL LEVELS (bounded by the
    relevance-grade cardinality, never by result-list length).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    w, cum = _ndcg_weight_micros(k)
    w_arr = "array(" + ",".join(f"{x}L" for x in w) + ")"
    cum_arr = "array(" + ",".join(f"{x}L" for x in cum) + ")"
    q, rank, rel = F.col(query_col), F.col(rank_col), F.col(rel_col)
    base = df.where(
        q.isNotNull() & rank.isNotNull() & (rel.cast("long") > 0)
    ).select(
        q.alias("__q__"),
        rank.cast("long").alias("__rank__"),
        rel.cast("long").alias("__rel__"),
    )
    lev = base.groupBy("__q__", "__rel__").agg(
        F.count(F.lit(1)).alias("__cnt__"),
        F.sum(
            F.when(
                F.col("__rank__") <= k,
                F.expr(f"try_element_at({w_arr}, CAST(__rank__ AS INT))"),
            )
        ).alias("__sumw__"),
        F.count(F.when(F.col("__rank__") <= k, 1)).alias("__hits__"),
        F.min(F.when(F.col("__rank__") <= k, F.col("__rank__"))).alias(
            "__minrank__"
        ),
    )
    wnd = (
        Window.partitionBy("__q__")
        .orderBy(F.col("__rel__").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    )
    lev2 = lev.withColumn(
        "__prior__", F.coalesce(F.sum("__cnt__").over(wnd), F.lit(0))
    ).withColumn(
        "__ipart__",
        F.col("__rel__")
        * (
            F.expr(
                f"try_element_at({cum_arr}, "
                f"CAST(least(__prior__ + __cnt__, {k}L) AS INT) + 1)"
            )
            - F.expr(
                f"try_element_at({cum_arr}, CAST(least(__prior__, {k}L) AS INT) + 1)"
            )
        ),
    )
    per_q = lev2.groupBy("__q__").agg(
        F.sum("__cnt__").alias("n_rel"),
        F.sum(F.col("__rel__") * F.coalesce(F.col("__sumw__"), F.lit(0))).alias(
            "__dcg__"
        ),
        F.sum("__ipart__").alias("__idcg__"),
        F.sum("__hits__").alias("__h__"),
        F.min("__minrank__").alias("__mr__"),
    )
    return per_q.selectExpr(
        f"__q__ AS `{query_col}`",
        "n_rel",
        "CAST(__dcg__ AS DOUBLE) / 1e6 AS dcg",
        "CAST(__idcg__ AS DOUBLE) / 1e6 AS idcg",
        "CAST(__dcg__ AS DOUBLE) / CAST(__idcg__ AS DOUBLE) AS ndcg",
        "CASE WHEN __mr__ IS NOT NULL THEN "
        "CAST((2000000L + __mr__) DIV (2L * __mr__) AS DOUBLE) / 1e6 "
        "ELSE CAST(0.0 AS DOUBLE) END AS rr",
        f"floor((CAST(100000 AS DOUBLE) * __h__ + CAST(5 AS DOUBLE) * {k}) "
        f"/ (CAST(10 AS DOUBLE) * {k})) / CAST(10000 AS DOUBLE) AS p_at_k",
        "floor((CAST(100000 AS DOUBLE) * __h__ + CAST(5 AS DOUBLE) * n_rel) "
        "/ (CAST(10 AS DOUBLE) * n_rel)) / CAST(10000 AS DOUBLE) AS r_at_k",
    )


def rank_biased_overlap(
    df: DataFrame,
    id_col: str,
    score_a: str,
    score_b: str,
    p: float = 0.9,
    k: int = 100,
) -> DataFrame:
    """RBO@k (Webber et al. 2010) between the two rankings induced by
    ``score_a`` and ``score_b`` (descending, id tiebreak) — "do my two
    quality scorers order the corpus the same way?", the top-weighted
    alternative to :func:`~hashquery_spark.ops.profile.spearman_corr`
    (which weights every rank equally). Output (one row): ``k,
    n_overlap, rbo`` where rbo = (1-p) * SUM_d p^(d-1) * |A_d ∩ B_d|/d
    truncated at depth k.

    Identity used: an item entering both prefixes at depth
    m = max(rank_a, rank_b) contributes SUM_{{d=m..k}} p^(d-1)/d — the
    suffix sums are PYTHON-PRECOMPUTED literals shared verbatim with
    the oracle (the retrieval_metrics discount-grid contract), snapped
    per item to a 1e-9 integer grid and summed exactly.

    Scale: two bounded TakeOrdered top-k heads; ranks are windows over
    k rows (bounded — the vocabulary rank-after-limit precedent); one
    k-row inner join.
    """
    from .dedup import fround

    # suffix sums S[m] = sum_{d=m..k} p^(d-1)/d, computed left-to-right
    # in Python once; S[k+1] = 0
    suffix = [0.0] * (k + 2)
    for d in range(k, 0, -1):
        suffix[d] = suffix[d + 1] + (p ** (d - 1)) / d

    def topk(score):
        w = Window.orderBy(F.col("__s__").desc(), F.col(id_col).asc())
        return (
            df.where(F.col(score).isNotNull())
            .select(F.col(id_col), F.col(score).alias("__s__"))
            .orderBy(F.col("__s__").desc(), F.col(id_col).asc())
            .limit(k)
            .select(F.col(id_col), F.row_number().over(w).alias("__r__"))
        )
    a = topk(score_a).select(id_col, F.col("__r__").alias("__ra__"))
    b = topk(score_b).select(id_col, F.col("__r__").alias("__rb__"))
    # ONE SQL-string literal array (100 F.lit Columns would pay 100
    # py4j round-trips — the measured bulk-expression rule)
    def _dlit(x):
        r = repr(x)
        return r + "D" if "e" not in r else f"CAST({r} AS DOUBLE)"

    arr = F.expr(
        "array(" + ",".join(_dlit(x) for x in suffix[1 : k + 1]) + ")"
    )
    m = F.greatest(F.col("__ra__"), F.col("__rb__"))
    contrib = F.floor(
        F.try_element_at(arr, m) * F.lit(1e9) + F.lit(0.5)
    ).cast("long")
    agg = a.join(b, on=id_col).agg(
        F.count(F.lit(1)).alias("n_overlap"),
        F.coalesce(F.sum(contrib), F.lit(0).cast("long")).alias("__s__"),
    )
    return agg.select(
        F.lit(k).alias("k"),
        "n_overlap",
        fround(
            F.lit(1.0 - p) * (F.col("__s__").cast("double") / F.lit(1e9)), 6
        ).alias("rbo"),
    )


def rrf_fuse(
    runs: Sequence[DataFrame],
    query_col: str,
    doc_col: str,
    rank_col: str = "rank",
    k: int = 60,
    top: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) — the
    score-calibration-free way to merge rankers (BM25 + ANN is the
    standard hybrid-retrieval pair): fused(d) = Σ_runs 1/(k + rank_r(d)),
    docs absent from a run contribute nothing. Output: ``(query_col,
    doc_col, rrf_score, rank)``, top-``top`` per query, ties to the
    lowest doc id.

    Determinism: each contribution snaps to the integer nano-grid
    ``floor(1e9/(k + rank))`` BEFORE summing, so fused scores are exact
    integers regardless of aggregation order (a raw double 1/(k+r) sum
    would depend on partial-aggregation order across runs);
    ``rrf_score`` = that integer / 1e9 — an exact rational, no rounding
    site.

    Scale: one union of the (already bounded, top-k-per-query) run
    frames, one map-side-combined aggregate on (query, doc), one
    per-query rank window over the bounded fused table. Nothing scans
    the corpus.
    """
    if not runs:
        raise ValueError("runs must be non-empty")
    parts = []
    for r in runs:
        parts.append(
            r.where(F.col(rank_col).isNotNull()).select(
                F.col(query_col).alias("__q__"),
                F.col(doc_col).alias("__d__"),
                F.expr(f"CAST(1000000000L DIV ({k}L + `{rank_col}`) AS BIGINT)")
                .alias("__c__"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionAll(p)
    fused = u.groupBy("__q__", "__d__").agg(F.sum("__c__").alias("__s__"))
    w = Window.partitionBy("__q__").orderBy(
        F.col("__s__").desc(), F.col("__d__").asc()
    )
    return fused.select(
        F.col("__q__").alias(query_col),
        F.col("__d__").alias(doc_col),
        (F.col("__s__").cast("double") / F.lit(1e9)).alias("rrf_score"),
        F.row_number().over(w).cast("int").alias("rank"),
    ).where(F.col("rank") <= top)
