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


def bloom_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    m_words: int = 1024,
    k: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """:func:`ngram_contamination` with the benchmark gram set compressed
    into a BLOOM FILTER — the 100 TB decontamination path when the
    benchmark union is itself large (a broadcast bitset of
    ``m_words``·8 bytes replaces a broadcast hash set of every gram
    string; e.g. 1 GB of grams compresses to an 8 MB / 1M-word filter).
    Same output shape ``(id, n_grams, n_flagged, contamination,
    is_contaminated)``; ``n_flagged`` may OVERCOUNT by the Bloom
    false-positive rate (≈ fill_ratio^k) — the filter never misses a
    truly contaminated gram, so the gate is conservative in the safe
    direction.

    Construction is fully deterministic (Kirsch–Mitzenmacher double
    hashing from one md5, ``pos_j = (h1 + j·h2) mod m_words·63``, 63
    bits per word so a DuckDB oracle reproduces the exact same filter —
    1<<63 overflows signed arithmetic there), so false positives are
    REPRODUCIBLE and the op is oracle-paired bit-for-bit.

    Scale: the filter builds with one groupBy(word) bit_or over the
    exploded benchmark grams (bounded output: m_words rows); the corpus
    probes it with ``k`` BROADCAST hash joins on the word index (the
    single broadcast exchange is reused) — the corpus never shuffles on
    gram; the per-doc rollup is the one corpus shuffle, map-side
    combined, one narrow row per document.
    """
    m = m_words * 63
    h1 = "CAST(conv(substring(md5(concat('bloom:', gram)), 1, 8), 16, 10) AS BIGINT)"
    h2 = "CAST(conv(substring(md5(concat('bloom:', gram)), 9, 8), 16, 10) AS BIGINT)"
    bench_grams = (
        benchmark.select(
            F.explode(word_shingles(F.col(text_col), n)).alias("gram")
        )
        .distinct()
        .selectExpr(f"{h1} AS __h1__", f"{h2} AS __h2__")
        .selectExpr(f"explode(sequence(0, {k - 1})) AS __j__", "__h1__", "__h2__")
        .selectExpr(f"pmod(__h1__ + __j__ * __h2__, {m}L) AS __pos__")
        .selectExpr(
            "__pos__ DIV 63 AS word",
            "shiftleft(1L, CAST(__pos__ % 63 AS INT)) AS mask",
        )
    )
    bloom = bench_grams.groupBy("word").agg(F.expr("bit_or(mask)").alias("bits"))

    probes = (
        ensure_parallelism(corpus)
        .select(
            F.col(id_col),
            F.explode_outer(
                F.array_distinct(word_shingles(F.col(text_col), n))
            ).alias("gram"),
        )
        .selectExpr(
            f"`{id_col}`",
            "gram",
            f"{h1} AS __h1__",
            f"{h2} AS __h2__",
        )
        .selectExpr(
            f"`{id_col}`",
            "gram",
            *[
                e
                for j in range(k)
                for e in (
                    f"pmod(__h1__ + {j} * __h2__, {m}L) DIV 63 AS __w{j}__",
                    f"shiftleft(1L, CAST(pmod(__h1__ + {j} * __h2__, {m}L) % 63 AS INT)) AS __mk{j}__",
                )
            ],
        )
    )
    joined = probes
    for j in range(k):
        bj = F.broadcast(
            bloom.selectExpr(f"word AS __bw{j}__", f"bits AS __bits{j}__")
        )
        joined = joined.join(
            bj, joined[f"__w{j}__"] == bj[f"__bw{j}__"], "left"
        )
    hit = F.col("gram").isNotNull()
    for j in range(k):
        hit = hit & (
            F.col(f"__bits{j}__").isNotNull()
            & (
                F.col(f"__bits{j}__").bitwiseAND(F.col(f"__mk{j}__"))
                == F.col(f"__mk{j}__")
            )
        )
    scored = (
        joined.withColumn("__hit__", F.when(hit, 1))
        .groupBy(id_col)
        .agg(
            F.count("gram").alias("n_grams"),
            F.count("__hit__").alias("n_flagged"),
        )
    )
    contamination = fround(
        F.col("n_flagged")
        / F.greatest(F.col("n_grams"), F.lit(1)).cast("double"),
        4,
    )
    return scored.select(
        F.col(id_col),
        "n_grams",
        "n_flagged",
        contamination.alias("contamination"),
        (contamination >= threshold).alias("is_contaminated"),
    )
