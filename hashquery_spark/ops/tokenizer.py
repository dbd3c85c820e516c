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
    return _merge_loop(_word_counts(df, text_col, max_vocab_words), num_merges)


def _merge_loop(
    words: List[Tuple[str, int]], num_merges: int
) -> List[Tuple[str, str]]:
    """The driver-side merge iterations, VECTORIZED: the whole vocabulary
    lives in two flat numpy arrays (symbol id + word id per position), so
    each iteration is one masked-shift pair count (np.unique + bincount
    over packed 64-bit keys) and one masked replacement — ~10⁷ Python
    pair-ops per iteration at max_vocab_words=100k become a handful of
    array passes. Semantics identical to the textbook per-word dict loop
    (Sennrich et al. 2016): per-word pairs only (word-boundary mask),
    argmax by count desc then lexicographically-first pair (ties resolved
    on the symbol STRINGS over the tied subset — always tiny), merges
    applied left-to-right non-overlapping. A test pins this against the
    plain-Python reference loop on random corpora."""
    import numpy as np

    if not words or num_merges <= 0:
        return []
    id_to_sym: List[str] = []
    sym_to_id: dict = {}

    def sid(s: str) -> int:
        i = sym_to_id.get(s)
        if i is None:
            i = len(id_to_sym)
            sym_to_id[s] = i
            id_to_sym.append(s)
        return i

    seqs = [[sid(c) for c in w] + [sid(END_OF_WORD)] for w, _ in words]
    wcount = np.asarray([n for _, n in words], dtype=np.int64)
    flat = np.fromiter((s for seq in seqs for s in seq), dtype=np.int64)
    wid = np.fromiter(
        (i for i, seq in enumerate(seqs) for _ in seq), dtype=np.int64,
        count=flat.size,
    )
    merges: List[Tuple[str, str]] = []
    for _ in range(num_merges):
        if flat.size < 2:
            break
        a, b = flat[:-1], flat[1:]
        same_word = wid[:-1] == wid[1:]
        K = len(id_to_sym) + 1
        keys = a[same_word] * K + b[same_word]
        if keys.size == 0:
            break
        wts = wcount[wid[:-1][same_word]]
        if K * K <= 40_000_000:
            # dense count array: O(K² + n), no sort — the common case
            # (alphabetic charset + merges). Counts are exact in float64
            # below 2^53.
            cnts = np.bincount(keys, weights=wts, minlength=K * K)
            mx = int(cnts.max())
            if mx < 2:
                break
            tied = np.nonzero(cnts == mx)[0]
        else:
            # huge symbol table (CJK-scale charsets): sort-based unique
            uk, inv = np.unique(keys, return_inverse=True)
            cnts = np.bincount(inv, weights=wts).astype(np.int64)
            mx = int(cnts.max())
            if mx < 2:
                break
            tied = uk[cnts == mx]
        best_key = min(
            (int(k) for k in tied),
            key=lambda k: (id_to_sym[k // K], id_to_sym[k % K]),
        )
        ba, bb = best_key // K, best_key % K
        merges.append((id_to_sym[ba], id_to_sym[bb]))
        new_id = sid(id_to_sym[ba] + id_to_sym[bb])
        m = np.nonzero((a == ba) & (b == bb) & same_word)[0]
        if ba == bb:
            # greedy left-to-right: drop the second of any adjacent pair
            keep, last = [], -2
            for i in m.tolist():
                if i == last + 1:
                    continue
                keep.append(i)
                last = i
            m = np.asarray(keep, dtype=np.int64)
        flat[m] = new_id
        mask = np.ones(flat.size, dtype=bool)
        mask[m + 1] = False
        flat = flat[mask]
        wid = wid[mask]
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


# --------------------------------------------------------------------------
# Unigram language-model tokenizer (Kudo 2018, the SentencePiece unigram
# algorithm) — the BPE alternative used by T5/ALBERT/XLNet tokenizers.
# Same two-level factorization as bpe_train: ONE distributed (word, count)
# scan bounded at max_vocab_words, then EM + pruning driver-side on that
# bounded table, so corpus size only affects the single scan.
# --------------------------------------------------------------------------


def _viterbi(word: str, logp: dict, max_len: int = 16) -> Tuple[List[str], float]:
    """Best segmentation of ``word`` under piece log-probs (every single
    character is guaranteed in ``logp``, so a path always exists). Ties
    break toward FEWER pieces, then by the fixed split-point scan order
    — fully deterministic. ``max_len`` bounds the split-point scan and
    MUST be >= the longest piece in ``logp``, else long pieces silently
    never match (callers pass the trained max_piece_len / vocab max)."""
    n = len(word)
    best = [(0.0, 0, "")] + [(float("-inf"), 0, "")] * n  # (score, nseg, tie)
    back = [None] * (n + 1)
    for i in range(1, n + 1):
        cand = None
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None or best[j][0] == float("-inf"):
                continue
            key = (best[j][0] + lp, -(best[j][1] + 1))
            if cand is None or key > cand[0]:
                cand = (key, j, piece)
        if cand is not None:
            (score, negseg), j, piece = cand
            best[i] = (score, -negseg, "")
            back[i] = (j, piece)
    pieces = []
    i = n
    while i > 0:
        j, piece = back[i]
        pieces.append(piece)
        i = j
    return pieces[::-1], best[n][0]


def unigram_train(
    df: DataFrame,
    text_col: str,
    vocab_size: int = 512,
    max_piece_len: int = 8,
    em_iters: int = 4,
    prune_frac: float = 0.25,
    max_vocab_words: int = 100_000,
):
    """Learn a unigram-LM tokenizer vocabulary (Kudo 2018): seed with
    every ≤``max_piece_len``-char substring of the word table weighted by
    occurrence, then alternate Viterbi-EM re-estimation with pruning of
    the lowest-likelihood pieces (single characters are never pruned)
    until ``vocab_size`` pieces remain. Returns ``[(piece, logprob)]``
    sorted by logprob desc then piece — a pure function of the corpus
    (the word table is deterministic and the driver loop has no float
    nondeterminism sources), so fits are partitioning-independent.

    Iterative driver loop over the bounded word table ⇒ rows-only
    (the bpe_merges precedent); pinned by python-reference and
    determinism tests instead."""
    words = _word_counts(df, text_col, max_vocab_words)
    return unigram_train_from_words(
        words,
        vocab_size=vocab_size,
        max_piece_len=max_piece_len,
        em_iters=em_iters,
        prune_frac=prune_frac,
    )


def unigram_train_from_words(
    words,
    vocab_size: int = 512,
    max_piece_len: int = 8,
    em_iters: int = 4,
    prune_frac: float = 0.25,
):
    """Driver core of :func:`unigram_train` over an explicit
    ``[(word, count)]`` table — shared by the bench python twin so the
    single-node baseline runs the IDENTICAL algorithm."""
    import math

    if not words:
        return []
    # seed: substring counts (weighted by word frequency), all chars kept
    seed: dict = {}
    for w, c in words:
        for i in range(len(w)):
            for j in range(i + 1, min(len(w), i + max_piece_len) + 1):
                s = w[i:j]
                seed[s] = seed.get(s, 0) + c
    chars = {w[i] for w, _ in words for i in range(len(w))}
    # initial probs from seed counts
    total = sum(seed.values())
    logp = {s: math.log(c / total) for s, c in seed.items()}
    vocab = set(seed)
    while True:
        for _ in range(em_iters):
            counts: dict = {}
            for w, c in words:
                pieces, _ = _viterbi(w, logp, max_piece_len)
                for p in pieces:
                    counts[p] = counts.get(p, 0) + c
            tot = sum(counts.values())
            # unused pieces keep a floor so they can re-enter... no:
            # standard EM drops them; keep chars alive with count 1
            for ch in chars:
                counts.setdefault(ch, 1)
            tot = sum(counts.values())
            logp = {p: math.log(c / tot) for p, c in counts.items() if p in vocab}
        vocab = set(logp)
        if len(vocab) <= vocab_size:
            break
        # prune lowest-logprob multi-char pieces (chars immortal)
        prunable = sorted(
            (p for p in vocab if len(p) > 1),
            key=lambda p: (logp[p], p),
        )
        n_drop = max(1, int(len(vocab) * prune_frac))
        n_drop = min(n_drop, len(vocab) - vocab_size, len(prunable))
        if n_drop <= 0:
            break
        for p in prunable[:n_drop]:
            del logp[p]
        vocab = set(logp)
    out = sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))
    return out


def unigram_pieces_df(df: DataFrame, text_col: str, **kw) -> DataFrame:
    """:func:`unigram_train` as a DataFrame ``(piece, logprob, rank)`` —
    logprob floor-rounded to 6 dp for display stability."""
    import math

    pieces = unigram_train(df, text_col, **kw)
    rows = [
        (p, math.floor(lp * 1e6 + 0.5) / 1e6, i)
        for i, (p, lp) in enumerate(pieces)
    ]
    return df.sparkSession.createDataFrame(
        rows, "piece string, logprob double, rank long"
    )


def unigram_apply(
    df: DataFrame,
    text_col: str,
    id_col: str,
    pieces,
    broadcast_segments: bool = True,
) -> DataFrame:
    """(id, tokens array<string>, n_tokens) — Viterbi-segment every
    document's words with a trained unigram vocabulary.

    Scale design (r5 verdict #2): Python Viterbi work is proportional to
    the DISTINCT vocabulary, not the token stream — the corpus explodes
    to (id, pos, word) JVM-side, each distinct word Viterbi-segments
    ONCE (Arrow-batched pandas UDF over the bounded distinct-word
    table), segmentations join back (broadcast by default; set
    ``broadcast_segments=False`` for a web-scale distinct vocabulary
    and let the shuffle join run), and documents reassemble with one
    ordered-struct flatten. The previous form memoized per Arrow batch,
    so every batch on every task re-derived the same hot words —
    measured 3.34× the single-threaded python twin at sf1 despite 32
    cores.

    Two PRUNED corpus scans (plan-pinned ≤2): the token-stream branch
    reads (id, text), the distinct-vocabulary branch reads text ONLY —
    deliberately cheaper than the one-scan alternatives (localCheckpoint
    of the exploded token stream materializes ~corpus-sized state;
    a groupBy(word) with collected occurrence lists puts every
    occurrence of a stopword in ONE row — unbounded skew). NULL texts
    survive the explode as a ``posexplode_outer`` sentinel row, so no
    THIRD scan is needed to restore the NULL-tokens contract; zero-word
    documents yield []. Unknown characters fall back to themselves as
    singleton pieces."""
    from pyspark.sql.functions import pandas_udf

    from .dedup import ensure_parallelism

    logp = {p: lp for p, lp in pieces}
    # scan bound derived from the TRAINED vocab, not a hardcoded 16 —
    # pieces longer than the bound would silently never match
    vocab_max_len = max((len(p) for p in logp), default=1)

    def segment_words(s):
        def seg_word(w):
            lp = dict(logp)
            for ch in {c for c in w if c not in lp}:
                lp[ch] = -1e9  # OOV chars: worst prob, keeps a path
            return _viterbi(w, lp, vocab_max_len)[0]

        # no memo needed: the input is the globally-distinct word table
        return s.map(seg_word)

    seg_udf = pandas_udf(segment_words, "array<string>")

    base = df.select(
        F.col(id_col).alias("__id__"),
        F.when(
            F.col(text_col).isNotNull(),
            F.split(
                F.trim(
                    F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", " ")
                ),
                " ",
            ),
        ).alias("__arr__"),
    )
    # posexplode_outer: a NULL array (NULL text) still emits one
    # sentinel row (pos NULL, word NULL) — the null-text marker rides
    # the SAME scan; '' entries (zero-word docs) drop at the join
    words = base.select(
        "__id__", F.posexplode_outer("__arr__").alias("__pos__", "__w__")
    )
    distinct_words = ensure_parallelism(
        words.where(F.col("__w__") != "").select("__w__").distinct()
    )
    segs = distinct_words.select(
        "__w__", seg_udf(F.col("__w__")).alias("__seg__")
    )
    if broadcast_segments:
        segs = F.broadcast(segs)
    joined = words.join(segs, on="__w__", how="left")
    per_doc = joined.groupBy("__id__").agg(
        F.max(F.col("__w__").isNull()).alias("__null_text__"),
        F.flatten(
            F.array_sort(
                F.collect_list(  # collect_list skips NULL structs
                    F.when(
                        F.col("__seg__").isNotNull(),
                        F.struct(
                            F.col("__pos__").alias("p"),
                            F.col("__seg__").alias("s"),
                        ),
                    )
                )
            ).getField("s")
        ).alias("__toks__"),
    )
    return per_doc.select(
        F.col("__id__").alias(id_col),
        F.when(
            ~F.col("__null_text__"),
            F.coalesce(F.col("__toks__"), F.array().cast("array<string>")),
        ).alias("tokens"),
    ).select(
        id_col, "tokens", F.size("tokens").cast("long").alias("n_tokens")
    )
