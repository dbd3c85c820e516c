"""Fused end-to-end corpus curation: the standard pre-training filter
chain (language ID → quality → repetition → exact dedup → split) as ONE
pipeline over ONE scan of the text (net-new; cf. C4 / Gopher / FineWeb
curation recipes).

Running the per-op functions separately scans the corpus once each; at
100 TB that's the difference between one pass and five. Here every
text-derived feature (language scores, quality heuristics, repetition
ratio, content hash) is computed in a single narrow projection — they all
share the same tokenization subtrees, which Spark's subexpression
elimination evaluates once — then the only wide operations are the exact-
dedup keep (one shuffle on content_hash) and nothing else: the split
assignment is the deterministic md5 draw (ops/sampling.py), a narrow
expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text
from .sampling import repetition_cols, uniform01
from .text import langid_cols, quality_cols


def curation_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_quality: float = 0.2,
    langs: tuple = ("en",),
    max_dup_line_ratio: float = 0.5,
    test_fraction: float = 0.1,
    seed: int = 0,
) -> DataFrame:
    """The STATELESS portion of the pipeline: features + filters + split as
    one narrow projection, returning ``(id, lang_pred, quality,
    dup_line_ratio, split, content_hash)``. Because nothing here holds
    state, the same code runs on a batch OR a streaming DataFrame —
    :func:`curate` finishes it with a window dedup (batch);
    ``streaming.streaming_curate`` finishes it with the stateful
    cross-batch dedup."""
    feats = df.select(
        F.col(id_col),
        *langid_cols(F.col(text_col)),
        *quality_cols(F.col(text_col)),
        *repetition_cols(F.col(text_col)),
        F.md5(normalize_text(F.col(text_col))).alias("content_hash"),
    )
    kept = feats.where(
        (F.col("quality") >= float(min_quality))
        & F.col("lang_pred").isin(*langs)
        & (F.col("dup_line_ratio") <= float(max_dup_line_ratio))
    )
    u = uniform01(F.col(id_col), seed)
    return kept.select(
        F.col(id_col),
        "lang_pred",
        "quality",
        "dup_line_ratio",
        F.when(u < float(test_fraction), F.lit("test"))
        .otherwise(F.lit("train"))
        .alias("split"),
        "content_hash",
    )


def curate(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_quality: float = 0.2,
    langs: tuple = ("en",),
    max_dup_line_ratio: float = 0.5,
    test_fraction: float = 0.1,
    seed: int = 0,
) -> DataFrame:
    """Returns the curated corpus as ``(id, lang_pred, quality,
    dup_line_ratio, split)``: documents that pass the language allowlist,
    the quality floor, and the repetition ceiling, exact-deduped to the
    smallest id per normalized content hash, with a leakage-safe
    deterministic train/test split."""
    cands = curation_candidates(
        df, text_col, id_col, min_quality, langs, max_dup_line_ratio,
        test_fraction, seed,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("content_hash").orderBy(F.col(id_col).asc())
    return (
        cands.withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") == 1)
        .select(id_col, "lang_pred", "quality", "dup_line_ratio", "split")
    )
