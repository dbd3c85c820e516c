"""Document chunking and paragraph-level deduplication for training-data
pipelines (net-new beyond the reference, which has no corpus surface;
closest analogue is its fold/pick row-shaping, src/model/model.py:939-995).

Scale notes:

* ``chunk_documents`` is a pure narrow generator pass — one scan, the
  explode multiplies rows but never shuffles; chunk text is derived by
  ``substring`` so the source column is read once per row. At 100 TB this
  is exactly one codegen'd stage.
* ``dedup_paragraphs`` is the C4/RefinedWeb-style exact paragraph dedup:
  explode paragraphs, keep only the globally-first occurrence of each
  distinct paragraph (by (doc_id, paragraph_index) order), and reassemble
  the surviving paragraphs per document. Keeper selection is a skew-safe
  groupBy-min on the paragraph md5 (map-side combine collapses corpus-wide
  hot paragraphs — cookie banners — before the shuffle) joined back on the
  hash; the re-group by doc_id is the only other shuffle.

Cross-engine determinism: ordering keys are exact integers
(``doc_id * 1_000_000 + paragraph_index`` — documents the supported bound
of <1e6 paragraphs per document), dedup keys are md5 strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Ordering-key stride: paragraph index must stay below this per document.
PARA_STRIDE = 1_000_000


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    size: int = 200,
    overlap: int = 20,
) -> DataFrame:
    """Split each document into fixed-width character chunks with overlap.

    Chunk *k* starts at 1-based offset ``1 + k*(size-overlap)`` and spans
    ``size`` characters (the final chunk may be shorter). Documents shorter
    than ``size`` yield exactly one chunk. NULL/empty documents yield no
    rows. Output: (id, chunk_idx, chunk_text, chunk_len).

    One narrow generator stage — sequence+posexplode+substring, all
    codegen'd; no shuffle, no UDF.
    """
    if not 0 <= overlap < size:
        raise ValueError("require 0 <= overlap < size")
    stride = size - overlap
    t, i = text_col, id_col
    starts = df.where(
        F.col(t).isNotNull() & (F.length(F.col(t)) > 0)
    ).selectExpr(
        i,
        t,
        f"posexplode(sequence(1, greatest(length({t}) - {overlap}, 1), {stride}))"
        " AS (chunk_idx, start)",
    )
    return starts.selectExpr(
        i,
        "CAST(chunk_idx AS BIGINT) AS chunk_idx",
        f"substring({t}, start, {size}) AS chunk_text",
        f"length(substring({t}, start, {size})) AS chunk_len",
    )


def repeated_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 15,
    stride: int = 5,
) -> DataFrame:
    """Cross-document exact-substring duplicate spans (the Lee et al.
    2022 "Deduplicating Training Data" idea at token-window granularity):
    sample a ``window``-token span every ``stride`` tokens and report
    every span whose exact token content occurs more than once anywhere
    in the corpus.

    Output: (id, span_start [1-based token index], span_hash,
    n_occurrences, is_first) — one row per duplicate occurrence;
    ``is_first`` marks the canonical (smallest (doc_id, start)) copy, so
    "drop every non-first duplicate span" is a filter on the result and
    the hash joins back to re-cut documents.

    Scale: tokenization and span hashing are one narrow generator stage
    (document text never shuffles — only (hash, okey) pairs move); the
    occurrence count + keeper selection is ONE groupBy-min/count on the
    span hash with map-side combine (corpus-wide hot spans — boilerplate
    — collapse before the shuffle, same skew story as dedup_paragraphs);
    the join-back on hash is the second and last shuffle.

    Documents shorter than ``window`` tokens yield no spans. Ordering
    keys are exact integers (doc_id * PARA_STRIDE + start; supported
    bound: < 1e6 tokens per document).
    """
    if window < 2 or stride < 1:
        raise ValueError("require window >= 2 and stride >= 1")
    i, t = id_col, text_col
    toks = df.where(
        F.col(t).isNotNull() & (F.trim(F.col(t)) != "")
    ).selectExpr(i, f"split(trim({t}), '\\\\s+') AS __toks__")
    starts = toks.where(F.size("__toks__") >= window).selectExpr(
        i,
        "__toks__",
        f"explode(sequence(1, size(__toks__) - {window - 1}, {stride})) AS s",
    )
    spans = starts.selectExpr(
        i,
        "s",
        f"md5(array_join(slice(__toks__, s, {window}), ' ')) AS span_hash",
        f"{i} * {PARA_STRIDE} + s AS __okey__",
    )
    counts = spans.groupBy("span_hash").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.min("__okey__").alias("__keep__"),
    )
    return (
        spans.join(counts, on="span_hash")
        .where(F.col("n_occurrences") > 1)
        .select(
            F.col(i),
            F.col("s").alias("span_start"),
            "span_hash",
            "n_occurrences",
            (F.col("__okey__") == F.col("__keep__")).alias("is_first"),
        )
    )


def dedup_paragraphs(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Corpus-wide exact paragraph dedup (the C4 "three-sentence span" idea
    reduced to newline paragraphs): every duplicate occurrence of a
    paragraph after its first (smallest (doc_id, index)) is dropped, and
    each document is reassembled from its surviving paragraphs in order.

    Output: (id, clean_text, n_kept, n_dropped); ``clean_text`` is NULL
    when every paragraph of the document was a duplicate. Paragraphs are
    trimmed; blank paragraphs are ignored entirely (neither kept nor
    counted as dropped).
    """
    i = id_col
    ex = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(i),
            F.posexplode(F.split(F.col(text_col), r"\n")).alias("idx", "raw"),
        )
        .where(F.trim(F.col("raw")) != "")
        .select(i, "idx", F.trim(F.col("raw")).alias("para"))
        .withColumn("okey", F.col(i) * PARA_STRIDE + F.col("idx"))
        .withColumn("__ph__", F.md5(F.col("para")))
    )
    # Global first occurrence per distinct paragraph via groupBy-min +
    # join back. A window min over hash partitions would avoid the join,
    # but a corpus-wide hot paragraph (the same cookie banner in 10M
    # docs) serializes into a single window task; groupBy-min collapses
    # hot keys map-side — the keeper shuffle moves only (hash, okey) —
    # and AQE splits any remaining skew in the join-back (which carries
    # the paragraph text exactly once, as reassembly requires).
    keepers = ex.groupBy("__ph__").agg(F.min("okey").alias("__keep__"))
    flagged = ex.join(keepers, on="__ph__").withColumn(
        "kept", F.col("okey") == F.col("__keep__")
    )
    return flagged.groupBy(i).agg(
        F.when(
            F.count_if(F.col("kept")) > 0,
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("kept"), F.struct("idx", "para"))
                        )
                    ),
                    lambda x: x["para"],
                ),
            ),
        ).alias("clean_text"),
        F.count_if(F.col("kept")).alias("n_kept"),
        (F.count(F.lit(1)) - F.count_if(F.col("kept"))).alias("n_dropped"),
    )
