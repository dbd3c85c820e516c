"""Corpus snapshot comparison and incremental deduplication — the
primitives an *incremental* training-data pipeline needs (net-new; the
reference has no notion of data versions).

Scale notes: both operators reduce each side to (id/hash, tiny payload)
BEFORE any shuffle — document text never moves. ``snapshot_diff`` is one
full-outer hash join on the id; ``dedup_against`` is one left-anti join
on the content hash (the canonical "new crawl minus everything we
already have" step, e.g. fresh CommonCrawl against last month's corpus).
Anti joins broadcast when the seen-set is small; AQE picks shuffle
otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import normalize_text


def _hashed(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col), F.md5(normalize_text(F.col(text_col))).alias("__h__")
    )


def snapshot_diff(
    old: DataFrame, new: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, status) for every id whose presence or content changed between
    two corpus snapshots: ``added`` (only in new), ``removed`` (only in
    old), ``changed`` (both, different normalized-content hash).
    Unchanged ids are omitted — at 100 TB the diff is the small output."""
    o = _hashed(old, id_col, text_col).withColumnRenamed("__h__", "__old_h__")
    n = _hashed(new, id_col, text_col).withColumnRenamed("__h__", "__new_h__")
    joined = o.join(n, on=id_col, how="full_outer")
    status = (
        F.when(F.col("__old_h__").isNull(), F.lit("added"))
        .when(F.col("__new_h__").isNull(), F.lit("removed"))
        .when(F.col("__old_h__") != F.col("__new_h__"), F.lit("changed"))
    )
    return (
        joined.select(F.col(id_col), status.alias("status"))
        .where(F.col("status").isNotNull())
    )


def dedup_against(
    new: DataFrame, seen: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Rows of ``new`` whose normalized content hash does NOT appear in
    ``seen`` — incremental exact dedup against an existing corpus. One
    left-anti join on the md5 hash; the seen side reduces to distinct
    hashes first (smallest possible build side). NULL-text rows hash to
    NULL, which an anti join never matches — they are always kept."""
    seen_hashes = (
        seen.select(F.md5(normalize_text(F.col(text_col))).alias("__h__")).distinct()
    )
    hashed_new = new.withColumn("__h__", F.md5(normalize_text(F.col(text_col))))
    return hashed_new.join(seen_hashes, on="__h__", how="left_anti").drop("__h__")


def dedup_against_fuzzy(
    new: DataFrame,
    seen: DataFrame,
    text_col: str,
    id_col: str,
    *,
    threshold: float = 0.8,
    num_perm: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    max_bucket_size: int | None = 500,
) -> DataFrame:
    """Rows of ``new`` with no NEAR-duplicate in ``seen`` — the fuzzy twin
    of :func:`dedup_against` (fresh crawl minus everything ~already in the
    corpus, the standard cross-snapshot MinHash dedup step).

    Block-then-verify across corpora: word-shingle KM min-signatures and
    LSH band buckets on each side (shared machinery with ops/dedup — the
    per-side shuffle moves (id, num_perm longs) only), candidate pairs
    from the (band, key) equi-join, then exact word-shingle Jaccard
    recomputed ONLY for candidate ids (semi-join reduction first). The
    final step is one left-anti join of ``new`` against the matched-id
    set; document text never shuffles anywhere.

    Exact duplicates always collide (identical signatures), so this
    subsumes :func:`dedup_against` for docs long enough to shingle. Docs
    with fewer than ``shingle_k`` words have no signature, never match,
    and are always kept — run :func:`dedup_against` after (cheap) if
    exact-dedup of short docs matters. ``max_bucket_size`` caps degenerate
    hot buckets before the pair join (see dedup.cap_bucket_size) — ON BY
    DEFAULT (500, r4 verdict; ``None`` opts out), mirrored by the DuckDB
    oracle.
    """
    from .dedup import (
        band_buckets,
        cap_bucket_size,
        minhash_signature,
        repartition_for_projection,
        word_shingles,
    )

    def buckets(df: DataFrame, out_id: str) -> DataFrame:
        b = band_buckets(
            minhash_signature(df, text_col, id_col, num_perm, shingle_k),
            id_col,
            num_perm,
            bands,
        )
        if max_bucket_size is not None:
            b = cap_bucket_size(b, max_bucket_size)
        return b.select(F.col(id_col).alias(out_id), "band", "key")

    # `cands` is consumed three times with DIFFERENT column pruning (idn
    # ids, and both), which makes the three blocking subtrees structurally
    # different — ReusedExchange never fires and the whole LSH pipeline
    # executes 3x (profiled: 1.1s blocking -> 3.4s of the query). It is
    # O(duplicate pairs) small, so materialize it once.
    cands = (
        buckets(new, "__idn__")
        .join(buckets(seen, "__ids__"), on=["band", "key"])
        .select("__idn__", "__ids__")
        .distinct()
        .localCheckpoint(eager=True)
    )

    # broadcast gate (r9 ADVICE): no pre-verify size screen — measured
    # net loss (see fuzzy._gated_bcast for the r10 negative result)
    from .fuzzy import _gated_bcast

    bcast = _gated_bcast(cands)

    def shingle_sets(df: DataFrame, out_id: str, alias: str) -> DataFrame:
        # candidate-id filter FIRST, shingle HOF after: the projection is
        # the expensive part, so it must run over O(candidates) rows, not
        # the whole side (profiled ~2x the query cost the other way — the
        # join does not reorder below a projection on its own). Then
        # repartition by the id BETWEEN filter and projection (the r9
        # containment_join lesson): otherwise the verify SortMergeJoin's
        # ENSURE_REQUIREMENTS exchange lands ABOVE the projection and
        # ships the shingle ARRAYS (~k× the text bytes).
        only = cands.select(out_id).distinct()
        return (
            df.select(F.col(id_col).alias(out_id), F.col(text_col))
            .join(bcast(only), on=out_id)
            .transform(lambda d: repartition_for_projection(d, out_id))
            .select(
                out_id,
                F.array_distinct(word_shingles(F.col(text_col), shingle_k)).alias(alias),
            )
        )

    from .dedup import round4_ratio

    inter = F.size(F.array_intersect("__shn__", "__shs__"))
    union = F.size(F.array_union("__shn__", "__shs__"))
    # tie-proof 4-dp half-up (round4_ratio): a round() here can flip the
    # >= threshold gate on exact decimal ties cross-engine
    jac = F.when(union > 0, round4_ratio(inter, union)).otherwise(F.lit(0.0))
    matched = (
        cands.join(shingle_sets(new, "__idn__", "__shn__"), on="__idn__")
        .join(shingle_sets(seen, "__ids__", "__shs__"), on="__ids__")
        .where(jac >= threshold)
        .select(F.col("__idn__").alias(id_col))
        .distinct()
    )
    return new.join(F.broadcast(matched), on=id_col, how="left_anti")


def scd2_build(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_cols,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Collapse an append-only change log into SCD-2 validity intervals:
    entity + value cols + ``(valid_from, valid_to, is_current)`` — the
    build side of :func:`~hashquery_spark.ops.range_join.validity_join`
    (which consumes exactly these intervals for point-in-time lookups).
    Consecutive rows with unchanged values merge into one interval
    (null-safe comparison); ``valid_to`` is the next change's timestamp
    (exclusive) and NULL marks the open current row.

    Scale: two entity-partitioned windows (change detection, then lead
    over the kept change rows) — the log shuffles once on the entity
    key and never globally sorts.

    Determinism: rows with equal timestamps are ordered by
    ``tiebreak_col`` (pass one whenever timestamps can tie).
    """
    value_cols = (
        [value_cols] if isinstance(value_cols, str) else list(value_cols)
    )
    order = [F.col(ts_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(entity_col).orderBy(*order)
    changed = F.lag(F.col(ts_col)).over(w).isNull()
    for c in value_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(F.col(c)).over(w))
    kept = (
        df.where(F.col(ts_col).isNotNull())
        .withColumn("__chg__", changed)
        .where(F.col("__chg__"))
    )
    order2 = [F.col(ts_col)]
    if tiebreak_col is not None:
        order2.append(F.col(tiebreak_col))
    w2 = Window.partitionBy(entity_col).orderBy(*order2)
    return kept.select(
        entity_col,
        *value_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())
