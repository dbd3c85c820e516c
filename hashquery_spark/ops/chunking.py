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
