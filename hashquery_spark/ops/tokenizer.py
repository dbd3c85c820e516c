"""BPE tokenizer training over a distributed corpus.

Completes the tokenizer story (``vocabulary`` / ``bpe_pair_counts``): the
full byte-pair-encoding training loop and its application.

Scale design — the standard two-level factorization every real BPE
trainer uses (sentencepiece, HF tokenizers): the 100 TB corpus collapses
to a (word, count) frequency table in ONE distributed scan (capped at
``max_vocab_words`` by frequency — a bounded TakeOrdered, no full sort),
and the merge iterations then run on that bounded table driver-side.
Corpus size only affects the single scan; iteration cost depends on
vocabulary size alone. Applying the learned merges back to the corpus is
an Arrow-batched pandas UDF with a per-word memo (each DISTINCT word is
segmented once per batch, not per occurrence).

Determinism: word counts are exact; the merge argmax breaks ties on the
lexicographically smallest pair, so the merge sequence is a pure function
of the corpus. Iterative by nature → rows-only checked (the
dedup_clusters precedent); the per-scan word-count step is the
oracle-checkable ``vocabulary`` op.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def _word_counts(
    df: DataFrame, text_col: str, max_vocab_words: int
) -> List[Tuple[str, int]]:
    from .dedup import ensure_parallelism, tokens

    counts = (
        ensure_parallelism(df.where(F.col(text_col).isNotNull()))
        .select(F.explode(tokens(F.col(text_col))).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(max_vocab_words)
    )
    return [(r["w"], r["n"]) for r in counts.collect()]


def bpe_train(
    df: DataFrame,
    text_col: str,
    num_merges: int = 100,
    max_vocab_words: int = 100_000,
) -> List[Tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the merge
    list in learned order — ``[(left, right), ...]`` — where symbols are
    characters, previously-merged units, or the ``</w>`` end-of-word
    marker (Sennrich et al. 2016)."""
    vocab = {
        tuple(w) + (END_OF_WORD,): n
        for w, n in _word_counts(df, text_col, max_vocab_words)
    }
    merges: List[Tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict = {}
        for symbols, n in vocab.items():
            for a, b in zip(symbols, symbols[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + n
        if not pair_counts:
            break
        # deterministic argmax: highest count, then lexicographically first
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab = {}
        for symbols, n in vocab.items():
            out, i = [], 0
            while i < len(symbols):
                if (
                    i + 1 < len(symbols)
                    and symbols[i] == best[0]
                    and symbols[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def bpe_merges_df(
    df: DataFrame,
    text_col: str,
    num_merges: int = 100,
    max_vocab_words: int = 100_000,
) -> DataFrame:
    """The learned merge table as a DataFrame: (rank, left, right,
    merged) in learned order — the materialized artifact a tokenization
    pipeline ships."""
    merges = bpe_train(df, text_col, num_merges, max_vocab_words)
    spark = df.sparkSession
    rows = [(i, a, b, a + b) for i, (a, b) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "rank int, left string, right string, merged string"
    )


def _segment_word(word: str, ranks: dict) -> List[str]:
    symbols = list(word) + [END_OF_WORD]
    while len(symbols) > 1:
        best_rank, best_i = None, None
        for i, (a, b) in enumerate(zip(symbols, symbols[1:])):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return symbols


def bpe_apply(
    df: DataFrame,
    merges: List[Tuple[str, str]],
    text_col: str,
    id_col: str,
) -> DataFrame:
    """(id, bpe_tokens, n_bpe_tokens) — segment each document with the
    learned merges (lowest-rank merge first, the standard BPE inference
    order). Arrow-batched pandas UDF with a per-batch word memo: each
    DISTINCT word segments once, not once per occurrence."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    def seg_series(texts):
        from .dedup import tokens  # noqa: F401 (normalization parity note)
        import re

        memo: dict = {}
        out = []
        for t in texts:
            if t is None:
                out.append([])
                continue
            # same normalization as dedup.tokens()
            norm = re.sub(r"[^a-z0-9]+", " ", t.lower()).strip()
            toks: List[str] = []
            for w in norm.split():
                got = memo.get(w)
                if got is None:
                    got = _segment_word(w, ranks)
                    memo[w] = got
                toks.extend(got)
            out.append(toks)
        return pd.Series(out)

    seg = pandas_udf(seg_series, "array<string>")
    return df.select(
        F.col(id_col),
        seg(F.col(text_col)).alias("bpe_tokens"),
    ).withColumn("n_bpe_tokens", F.size(F.col("bpe_tokens")))
