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

from pyspark.sql import DataFrame
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
