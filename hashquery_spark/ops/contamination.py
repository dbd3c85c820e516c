"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set (net-new beyond the reference —
the standard pre-training hygiene step, cf. GPT-3 appendix C / PaLM's
13-gram overlap checks).

Scale design (corpus = 100 TB, benchmark = MBs — always the asymmetry):

* The benchmark's distinct n-gram set is small, so the corpus⋈benchmark
  match is a **broadcast** hash join against the exploded corpus grams —
  the corpus never shuffles on gram.
* The per-document rollup groups by the corpus primary key with map-side
  combine, so the shuffle carries one narrow row per document, not one
  per gram.
* Gram extraction is the same JVM-side higher-order-function pipeline as
  dedup (ops/dedup.py): whole-stage codegen, no Python in the hot path.
* One scan of the corpus text, one evaluation of the gram pipeline per
  row: both the total-gram and contaminated-gram counts come out of the
  same post-explode rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import ensure_parallelism, fround, word_shingles


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Per corpus document: overlap between its distinct word ``n``-grams
    and the union of the benchmark's n-grams.

    Returns ``(id, n_grams, n_contaminated_grams, contamination,
    is_contaminated)`` where ``contamination`` is the contaminated
    fraction of the document's distinct grams (4-decimal rounded) and
    ``is_contaminated`` applies ``threshold``. Documents shorter than
    ``n`` words have zero grams and score 0.0."""
    # Flat formulation (the ops/dedup.py minhash lesson): the shingle HOF
    # tree is evaluated exactly ONCE, inside the Generate — explode the
    # per-doc distinct grams and derive BOTH counts in the rollup
    # (count(gram) = distinct-gram total since the array was distinct).
    # A size()+explode() twin projection duplicates the whole nested-HOF
    # tree and paid ~35 s of codegen/JIT on first execution (measured).
    bench_grams = (
        benchmark.select(F.explode(word_shingles(F.col(text_col), n)).alias("gram"))
        .distinct()
        .withColumn("__hit__", F.lit(1))
    )
    exploded = ensure_parallelism(corpus).select(
        F.col(id_col),
        F.explode_outer(F.array_distinct(word_shingles(F.col(text_col), n))).alias("gram"),
    )
    scored = (
        exploded.join(F.broadcast(bench_grams), on="gram", how="left")
        .groupBy(id_col)
        .agg(
            F.count("gram").alias("n_grams"),
            F.count("__hit__").alias("n_contaminated_grams"),
        )
    )
    contamination = fround(
        F.col("n_contaminated_grams")
        / F.greatest(F.col("n_grams"), F.lit(1)).cast("double"),
        4,
    )
    return scored.select(
        F.col(id_col),
        "n_grams",
        "n_contaminated_grams",
        contamination.alias("contamination"),
        (contamination >= threshold).alias("is_contaminated"),
    )
