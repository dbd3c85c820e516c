"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting.

Net-new beyond the reference. All pure JVM-side expressions (no UDFs), so
they run inside whole-stage codegen and cost one narrow pass over the
corpus — exactly what you want when the corpus is 100 TB. Every formula is
also expressible in ANSI SQL so the DuckDB oracle can verify bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import ensure_parallelism, fround, normalize_text, round4_ratio, tokens, word_shingles

# Tiny deterministic stopword lists per language — a real deployment would
# swap in fastText-style n-gram models; the *plumbing* (argmax over per-lang
# token-hit scores in one pass) is the part that matters at scale.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "fr": ["le", "la", "de", "et", "un", "en", "du", "pour", "que", "dans"],
    "de": ["der", "die", "das", "und", "zu", "in", "den", "von", "mit", "ist"],
}
LANGS = sorted(STOPWORDS)  # deterministic argmax order


def _hits(toks: Column, words) -> Column:
    wordset = set(words)
    return F.size(F.filter(toks, lambda t: t.isin(*wordset)))


def langid_cols(text_col: Column) -> list:
    """[lang_pred, lang_score] expression columns (shared by
    :func:`language_id` and the fused curation pipeline)."""
    toks = tokens(text_col)
    n = F.greatest(F.size(toks), F.lit(1))
    hits = {lang: _hits(toks, words) for lang, words in STOPWORDS.items()}
    scores = {lang: h / n for lang, h in hits.items()}
    best_score = F.greatest(*scores.values())
    best_hits = F.greatest(*hits.values())  # same n ⇒ same argmax
    lang = F.lit("unknown")
    for code in reversed(LANGS):  # first lang in order wins ties
        lang = F.when(
            (scores[code] > 0) & (scores[code] == best_score), F.lit(code)
        ).otherwise(lang)
    return [
        lang.alias("lang_pred"),
        round4_ratio(best_hits, n).alias("lang_score"),
    ]


def language_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, lang, lang_score) — argmax of per-language stopword hit ratios;
    'unknown' when no stopwords hit. Ties break by language name order."""
    return df.select(F.col(id_col), *langid_cols(F.col(text_col)))


def token_count(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, n_tokens_ws, n_tokens_bpe) — whitespace tokens plus a BPE-ish
    estimate (word & punctuation runs, the classic ``\\w+|[^\\w\\s]``)."""
    t = F.col(text_col)
    trimmed = F.trim(t)
    ws = F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )
    bpe = F.size(F.regexp_extract_all(t, F.lit(r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"), 0))
    return df.select(
        F.col(id_col), ws.alias("n_tokens_ws"), bpe.alias("n_tokens_bpe")
    )


def quality_cols(text_col: Column) -> list:
    """[alpha_ratio, stopword_ratio, mean_word_len, quality] expression
    columns (shared by :func:`quality_score` and the curation pipeline)."""
    t = text_col
    total_len = F.greatest(F.length(t), F.lit(1))
    alpha_len = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    alpha_ratio = alpha_len / total_len
    toks = tokens(t)
    n_toks = F.greatest(F.size(toks), F.lit(1))
    stop_ratio = _hits(toks, STOPWORDS["en"]) / n_toks
    mean_word_len = F.aggregate(
        toks, F.lit(0.0), lambda acc, x: acc + F.length(x)
    ) / n_toks
    word_len_ok = F.when((mean_word_len >= 3) & (mean_word_len <= 10), 1.0).otherwise(0.5)
    # the blend is a deep rational (int64-unsafe to express integer-
    # exactly), so the tie-proof form is fround's pure-IEEE floor round —
    # the three PLAIN integer ratios below use round4_ratio instead
    quality = fround(
        (alpha_ratio * 0.5 + F.least(stop_ratio * 5, F.lit(1.0)) * 0.3) * word_len_ok
        + 0.2 * F.least(n_toks / 100.0, F.lit(1.0)),
        4,
    )
    sum_word_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    return [
        round4_ratio(alpha_len, total_len).alias("alpha_ratio"),
        round4_ratio(_hits(toks, STOPWORDS["en"]), n_toks).alias("stopword_ratio"),
        round4_ratio(sum_word_len, n_toks).alias("mean_word_len"),
        quality.alias("quality"),
    ]


def quality_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, alpha_ratio, stopword_ratio, mean_word_len, quality) — classic
    cheap quality heuristics (Gopher/C4-style):

    * alpha_ratio: alphabetic chars / total chars
    * stopword_ratio: English stopword tokens / tokens
    * mean_word_len: avg token length
    * quality: 0..1 blend, penalizing degenerate docs
    """
    return df.select(F.col(id_col), *quality_cols(F.col(text_col)))


_SCRIPTS = [
    # (name, Java-regex character class — DuckDB RE2 accepts the same
    # \\u-range classes)
    ("latin", "A-Za-z"),
    ("cjk", "\\u4e00-\\u9fff\\u3040-\\u30ff\\uac00-\\ud7af"),
    ("cyrillic", "\\u0400-\\u04ff"),
    ("arabic", "\\u0600-\\u06ff"),
    ("digit", "0-9"),
]


def script_profile(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, n_chars, latin_ratio, cjk_ratio, cyrillic_ratio, arabic_ratio,
    digit_ratio, dominant_script) — per-document Unicode script mix, the
    cheap first gate of multilingual corpus routing (which tokenizer,
    which language pipeline, is this mojibake).

    One narrow codegen'd pass: each ratio is length(text) minus the
    length with that script class stripped, over total length; no
    tokenization, no UDF. ``dominant_script`` is the argmax with a fixed
    tie order (latin > cjk > cyrillic > arabic > digit), 'other' when no
    class reaches 30%. Ratios round to 4 dp (pure integer/double
    arithmetic — exact cross-engine)."""
    t = F.col(text_col)
    total = F.length(t)
    safe_total = F.greatest(total, F.lit(1))
    cols = [F.col(id_col), total.alias("n_chars")]
    ratios = []
    for name, cls in _SCRIPTS:
        cnt = total - F.length(F.regexp_replace(t, f"[{cls}]", ""))
        r = round4_ratio(cnt, safe_total)  # tie-proof 4-dp half-up
        cols.append(r.alias(f"{name}_ratio"))
        ratios.append((name, f"{name}_ratio"))
    out = df.where(t.isNotNull()).select(*cols)
    dominant = F.lit("other")
    best = F.lit(0.3)
    # reversed fixed order so earlier scripts win ties via >=
    for name, rcol in reversed(ratios):
        dominant = F.when(F.col(rcol) >= best, F.lit(name)).otherwise(dominant)
        best = F.when(F.col(rcol) >= best, F.col(rcol)).otherwise(best)
    return out.withColumn("dominant_script", dominant)


def compression_ratio(df: DataFrame, text_col: str, id_col: str, level: int = 6) -> DataFrame:
    """(id, raw_bytes, compressed_bytes, compression_ratio) — zlib
    compressibility as a quality signal (used by Gopher/RedPajama-style
    filters: highly repetitive or templated text compresses far below
    natural prose; binary junk barely compresses at all).

    Python is unavoidable here (no zlib in Spark SQL), so this is the
    Arrow-batched pandas UDF path: one vectorized batch transfer per
    partition, narrow (no shuffle), scales linearly with executors. The
    ratio is deterministic for a fixed zlib version/level but NOT
    cross-engine reproducible — correctness is covered by unit tests and
    a rows-only driver check, not a DuckDB oracle.

    Empty/NULL text yields NULL ratio; ratio = compressed/raw over UTF-8
    bytes (can exceed 1.0 for tiny inputs — zlib framing overhead).
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _z_batch(texts):  # pd.Series -> pd.DataFrame (struct); annotation-
        # free on purpose: `from __future__ import annotations` stringifies
        # hints, which pandas_udf's hint inference rejects
        import zlib

        def one(t):
            if t is None:
                return (None, None)
            b = t.encode("utf-8")
            return (len(b), len(zlib.compress(b, level)))

        out = [one(t) for t in texts]
        return pd.DataFrame(out, columns=["raw_bytes", "compressed_bytes"])

    _z = pandas_udf(_z_batch, "struct<raw_bytes: long, compressed_bytes: long>")

    z = _z(F.col(text_col))
    return df.select(F.col(id_col), z.alias("__z__")).select(
        id_col,
        F.col("__z__.raw_bytes").alias("raw_bytes"),
        F.col("__z__.compressed_bytes").alias("compressed_bytes"),
        F.when(
            F.col("__z__.raw_bytes") > 0,
            fround(
                F.col("__z__.compressed_bytes")
                / F.col("__z__.raw_bytes").cast("double"),
                4,
            ),
        ).alias("compression_ratio"),
    )


def doc_fingerprint(df: DataFrame, text_col: str, id_col: str, k: int = 5) -> DataFrame:
    """(id, fingerprint) — rolling-hash document fingerprint: the minimum
    32-bit md5 hash over all character k-grams of the normalized text
    (single-perm MinHash; equal fingerprints ⇒ likely shared content)."""
    norm = normalize_text(F.col(text_col))
    n = F.length(norm)
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: norm.substr(i, F.lit(k)),
        ),
    ).otherwise(F.array(norm))
    fp = F.array_min(
        F.transform(
            grams,
            lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long"),
        )
    )
    return df.select(F.col(id_col), fp.alias("fingerprint"))


def vocabulary(
    df: DataFrame, text_col: str, id_col: str, top_k: int = 100
) -> DataFrame:
    """(token, term_freq, doc_freq, rank) — the corpus's ``top_k`` most
    frequent normalized tokens (BPE-training prep / stopword discovery).

    Scale: explode → groupBy(token) with map-side partial counts, so the
    shuffle carries one row per distinct token per partition, not one per
    occurrence; doc_freq's distinct runs as Spark's standard two-phase
    expand. The top-k is a sort+limit (TakeOrderedAndProject — no global
    sort materialized); ties rank deterministically by token. The rank
    window runs AFTER the limit, over top_k rows, so its single-partition
    execution is bounded."""
    from pyspark.sql import Window

    from .dedup import ensure_parallelism

    ex = (
        ensure_parallelism(df)
        .select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token"))
        .where(F.col("token") != "")
    )
    agg = ex.groupBy("token").agg(
        F.count("*").alias("term_freq"),
        F.countDistinct(id_col).alias("doc_freq"),
    )
    order = [F.desc("term_freq"), F.asc("token")]
    bounded = agg.orderBy(*order).limit(top_k)
    return bounded.withColumn("rank", F.row_number().over(Window.orderBy(*order)))


def boilerplate_ngrams(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, min_docs: int = 5
) -> DataFrame:
    """(id, n_grams, n_boilerplate_grams, boilerplate_ratio) — fraction of
    each document's distinct word ``n``-grams that are *boilerplate*:
    grams shared by at least ``min_docs`` distinct documents (the
    CCNet/RefinedWeb-style repeated-template signal, applied at the
    phrase level since the corpus has no line structure).

    Scale: two passes over the exploded distinct grams — one groupBy(gram)
    to find the boilerplate set, one broadcast join back. Boilerplate
    grams are heavy hitters by construction (each appears in ≥ min_docs
    docs), so the set is orders of magnitude smaller than the corpus and
    broadcasting it is safe at any corpus size. The corpus itself never
    shuffles on gram; the per-doc rollup shuffles one narrow row per
    document with map-side combine."""
    exploded = ensure_parallelism(df).select(
        F.col(id_col),
        F.explode_outer(F.array_distinct(word_shingles(F.col(text_col), n))).alias("gram"),
    )
    boiler = (
        exploded.groupBy("gram")
        .agg(F.count("*").alias("df_docs"))  # grams are distinct per doc
        .where((F.col("df_docs") >= min_docs) & F.col("gram").isNotNull())
        .select("gram", F.lit(1).alias("__boiler__"))
    )
    rolled = (
        exploded.join(F.broadcast(boiler), on="gram", how="left")
        .groupBy(id_col)
        .agg(
            F.count("gram").alias("n_grams"),
            F.count("__boiler__").alias("n_boilerplate_grams"),
        )
    )
    ratio = fround(
        F.col("n_boilerplate_grams")
        / F.greatest(F.col("n_grams"), F.lit(1)).cast("double"),
        4,
    )
    return rolled.select(
        F.col(id_col), "n_grams", "n_boilerplate_grams", ratio.alias("boilerplate_ratio")
    )


def unigram_lm_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, n_tokens, lm_score) — mean unigram log-probability of each
    document under the corpus's own unigram language model (the KenLM-
    style fluency/quality signal: low = rare-token-heavy or degenerate).

    Scale: one explode feeds both the vocabulary build (groupBy token,
    map-side combine) and the per-doc rollup. The corpus total is a
    single-row broadcast cross join (no driver collect); token→logp joins
    back on token (vocab ≪ corpus; AQE broadcasts when it fits).

    Determinism: ln() is rounded to 4 decimals per TOKEN, scaled to an
    exact BIGINT, and summed as integers — double summation order can
    differ between engines, integer sums cannot."""
    ex = (
        ensure_parallelism(df)
        .select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token"))
        .where(F.col("token") != "")
    )
    vocab = ex.groupBy("token").agg(F.count("*").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    # floor form, not round(): immune to a 1-ulp ln divergence landing
    # exactly on the .5 grid boundary (mutual_information precedent)
    logp = vocab.crossJoin(F.broadcast(total)).select(
        "token",
        F.floor(F.log(F.col("cnt") / F.col("total")) * F.lit(1e4) + F.lit(0.5))
        .cast("long")
        .alias("logp_scaled"),
    )
    return (
        ex.join(logp, on="token")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("logp_scaled").alias("__lp__"),
        )
        .select(
            F.col(id_col),
            "n_tokens",
            fround(F.col("__lp__") / (F.col("n_tokens") * 10000.0), 4).alias("lm_score"),
        )
    )


# PII patterns — identical semantics under Java regex (Spark) and RE2
# (DuckDB): character classes, bounded repetition, \b word boundaries.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE = r"\+[0-9][0-9\- ]{6,}[0-9]"


def redact_pii(text_col: Column) -> Column:
    """Replace emails → <EMAIL>, IPv4 addresses → <IP>, international
    phone numbers → <PHONE>. Order matters: emails first (they contain
    digits/dots an IP pattern could partially claim), then IPs, then
    phones. Pure regexp_replace chain — whole-stage codegen, one pass."""
    c = F.regexp_replace(text_col, PII_EMAIL, "<EMAIL>")
    c = F.regexp_replace(c, PII_IP, "<IP>")
    return F.regexp_replace(c, PII_PHONE, "<PHONE>")


def pii_scrub(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, clean_text, n_emails, n_ips, n_phones) — redacted text plus
    per-class match counts (for audit/reporting). Counts come from
    regexp_extract_all over the SAME patterns used to redact, so
    count>0 ⟺ text changed."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        redact_pii(t).alias("clean_text"),
        F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(PII_IP), 0)).alias("n_ips"),
        F.size(F.regexp_extract_all(t, F.lit(PII_PHONE), 0)).alias("n_phones"),
    )


def tfidf_top_terms(
    df: DataFrame, text_col: str, id_col: str, top_terms: int = 5
) -> DataFrame:
    """(id, token, tf, tfidf, term_rank) — each document's ``top_terms``
    most characteristic tokens by tf·idf, idf = ln((N+1)/(df+1)).

    Scale: one explode feeds two aggregations — per-(doc,token) term
    counts and per-token doc frequencies — both with map-side partial
    combine. N (corpus size) joins in as a broadcast single-row cross
    join (no driver collect); the token→idf table joins back on token.
    Ranking is a window partitioned BY DOCUMENT (never global).

    Determinism: idf is rounded to 4 decimals BEFORE the tf·idf product,
    and ranking orders by the rounded score with a token tiebreak — libm
    ln() may differ by 1 ulp across engines, and an unrounded sort key
    would let that flip ranks."""
    from pyspark.sql import Window

    from .dedup import ensure_parallelism

    ex = (
        ensure_parallelism(df)
        .select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token"))
        .where(F.col("token") != "")
    )
    tf = ex.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    docfreq = ex.groupBy("token").agg(F.countDistinct(id_col).alias("df"))
    n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
    idf = docfreq.crossJoin(F.broadcast(n_docs)).select(
        "token",
        fround(
            F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 4
        ).alias("idf"),
    )
    scored = tf.join(idf, on="token").select(
        F.col(id_col),
        "token",
        "tf",
        fround(F.col("tf") * F.col("idf"), 4).alias("tfidf"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("tfidf"), F.asc("token")
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .where(F.col("term_rank") <= top_terms)
        .select(id_col, "token", "tf", "tfidf", "term_rank")
    )


def bpe_pair_counts(
    df: DataFrame, text_col: str, id_col: str, top_k: int = 50
) -> DataFrame:
    """(pair, n) — the ``top_k`` most frequent adjacent word pairs across
    the corpus, i.e. one iteration of the BPE-training inner loop (count
    all adjacent symbol pairs, take the most frequent) lifted to word
    level. Total order: (n DESC, pair ASC).

    Scale: one explode of per-doc 2-shingles (non-distinct — every
    occurrence counts, unlike :func:`boilerplate_ngrams`), one
    groupBy(pair) with map-side partial aggregation, and a bounded
    TakeOrderedAndProject for the top-k — no full sort, no second
    shuffle. Repeated iterations (real BPE) would re-tokenize with the
    merged symbol and rerun; each iteration is one scan."""
    from .dedup import ensure_parallelism, word_shingles

    ex = (
        ensure_parallelism(df.where(F.col(text_col).isNotNull()))
        .select(F.explode(word_shingles(F.col(text_col), 2)).alias("pair"))
    )
    counts = ex.groupBy("pair").agg(F.count(F.lit(1)).alias("n"))
    return counts.orderBy(F.desc("n"), F.asc("pair")).limit(top_k)


def char_entropy(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, n_chars_norm, entropy) — Shannon entropy (bits would be /ln 2;
    this is nats) of the normalized character distribution, the classic
    cheap gibberish / degenerate-text gate: natural prose sits ~2.7-3.1,
    "aaaa..." near 0, uniform random keyboard mash near ln(37)≈3.6.

    One narrow pass, two codegen'd projections, no tokenization, no
    shuffle, no UDF: per-symbol counts via the strip-and-measure trick
    (length minus length-with-symbol-removed — 37 plain expressions
    rendered as ONE selectExpr SQL string), then the entropy sum. Counts
    are materialized in their own projection so the CASE never re-derives
    them (the measured multi-reference codegen trap).

    Determinism: ln(p) is rounded to 4 decimals per SYMBOL, scaled to
    BIGINT, and multiplied by the integer count — sums are integer-exact
    cross-engine (the PSI/lm_score pattern). Empty normalized text gets
    entropy 0.0.
    """
    symbols = [chr(c) for c in range(ord("a"), ord("z") + 1)] + [
        str(d) for d in range(10)
    ] + [" "]
    norm_sql = (
        f"trim(regexp_replace(lower(`{text_col}`), '[^a-z0-9]+', ' '))"
    )
    base = df.where(F.col(text_col).isNotNull()).selectExpr(
        f"`{id_col}`", f"{norm_sql} AS __norm__"
    )
    cnt_exprs = [
        "length(__norm__) - length(replace(__norm__, '{s}', '')) AS __c{i}__".format(
            s=s, i=i
        )
        for i, s in enumerate(symbols)
    ]
    counted = base.selectExpr(
        f"`{id_col}`", "length(__norm__) AS n_chars_norm", *cnt_exprs
    )
    terms = " + ".join(
        f"(CASE WHEN __c{i}__ > 0 THEN __c{i}__ * CAST(floor(ln(__c{i}__ /"
        f" CAST(n_chars_norm AS DOUBLE)) * 1e4 + 5e-1) AS BIGINT) ELSE 0L END)"
        for i in range(len(symbols))
    )
    # The 4-dp rounding happens in EXACT integer arithmetic: with
    # P = -sum (a non-negative BIGINT) and n chars, the half-up-rounded
    # scaled entropy is (10*P + 5*n) DIV (10*n) — a float round() here
    # once hit a true decimal tie (P/n = x.5) where Spark rounds half-up
    # and DuckDB half-even, flipping the last digit at sf0.1.
    return counted.selectExpr(
        f"`{id_col}`",
        "n_chars_norm",
        "CASE WHEN n_chars_norm = 0 THEN CAST(0.0 AS DOUBLE) "
        f"ELSE CAST((10L * (-({terms})) + 5L * n_chars_norm) "
        "DIV (10L * n_chars_norm) AS DOUBLE) / CAST(10000.0 AS DOUBLE) "
        "END AS entropy",
    )


def pmi_bigrams(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_count: int = 5,
    top_k: int = 50,
) -> DataFrame:
    """(bigram, n_ab, n_a, n_b, pmi) — top collocations by pointwise
    mutual information, ``pmi = ln(N·c(ab) / (c(a)·c(b)))`` over corpus
    token counts (the classic collocation / multi-word-expression
    extractor; complements frequency-ranked ``bpe_pair_counts`` by
    normalizing away individually-common words). ``min_count`` gates
    rare-pair noise (PMI is notoriously high-variance at low counts).

    Scale: ONE token explode feeds both the unigram vocabulary and
    (shifted by one) the bigram counts; unigrams join back onto bigrams
    (vocab ≪ corpus — AQE broadcasts), the corpus total is a 1-row
    broadcast, and the top-k is a bounded TakeOrdered + rank over ≤ top_k
    rows. Determinism: the PMI argument computes with fixed operation
    order in doubles and ln rounds to 4 dp; ties rank by bigram text.
    """
    from .dedup import ensure_parallelism, tokens, word_shingles

    base = ensure_parallelism(df.where(F.col(text_col).isNotNull()))
    # NOTE (r9 negative result): checkpointing `uni` here measured SLOWER
    # (1.36 -> 1.86 s min-of-3) — the three re-derivations are pruned
    # scans + map-side aggs that execute as PARALLEL stages inside one
    # job, while an eager checkpoint serializes them behind a barrier
    # job. Rescan wins at this payload (verify SKILL.md checkpoint-vs-
    # rescan rule).
    uni = (
        base.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = uni.agg(F.sum("cnt").alias("n_total"))
    bi = (
        base.select(F.explode(word_shingles(F.col(text_col), 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_count)
        .withColumn("__a__", F.split(F.col("bigram"), " ")[0])
        .withColumn("__b__", F.split(F.col("bigram"), " ")[1])
    )
    joined = (
        bi.join(
            F.broadcast(uni.selectExpr("token AS __a__", "cnt AS n_a")), on="__a__"
        )
        .join(
            F.broadcast(uni.selectExpr("token AS __b__", "cnt AS n_b")), on="__b__"
        )
        .crossJoin(F.broadcast(total))
    )
    pmi = fround(
        F.log(
            (F.col("n_ab").cast("double") * F.col("n_total"))
            / (F.col("n_a").cast("double") * F.col("n_b"))
        ),
        4,
    )
    from pyspark.sql import Window

    top = (
        joined.select("bigram", "n_ab", "n_a", "n_b", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), F.asc("bigram"))
        .limit(top_k)
    )
    w = Window.orderBy(F.desc("pmi"), F.asc("bigram"))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def bigram_lm_score(
    df: DataFrame, text_col: str, id_col: str, barrier: bool = True
) -> DataFrame:
    """(id, n_bigrams, lm2_score) — mean bigram log-probability of each
    document under the corpus's own bigram model:
    ``mean ln P(w_i | w_{i-1}) = mean ln(c(ab) / c(a·))`` with ``c(a·)``
    the count of bigrams starting with ``a``. The second-order fluency
    twin of :func:`unigram_lm_score` — word-salad that fools unigram
    frequency (all common words, nonsense order) scores poorly here.

    Scale: ONE bigram explode feeds the bigram counts, the
    first-word-context counts (a groupBy over the already-tiny bigram
    vocabulary), and the per-doc rollup; count tables join back on the
    bigram (vocab ≪ corpus — AQE broadcasts). Documents with < 2 tokens
    have no bigrams and drop out.

    Determinism: ln is rounded to 4 dp per BIGRAM, integer-scaled, and
    summed as BIGINTs (the lm_score/PSI contract) — cross-engine exact.
    """
    from .dedup import ensure_parallelism, word_shingles

    ex = ensure_parallelism(df.where(F.col(text_col).isNotNull())).select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), 2)).alias("bigram")
    )
    # eager barrier (r9): ctx and logp both consume the bigram-count
    # table — live lineage re-ran the full corpus explode per consumer
    # (4 passes total); the frame is bounded by bigram vocabulary.
    # ``barrier=False`` keeps the live lineage — perplexity_buckets
    # passes it when its own scored-frame checkpoint already serializes
    # the path (r9 verdict #5: two chained eager barriers can cost more
    # than the rescan one of them saves; A/B'd in r10).
    bc = ex.groupBy("bigram").agg(F.count(F.lit(1)).alias("__cab__"))
    if barrier:
        bc = bc.localCheckpoint(eager=True)
    ctx = (
        bc.withColumn("__a__", F.split(F.col("bigram"), " ")[0])
        .groupBy("__a__")
        .agg(F.sum("__cab__").alias("__ca__"))
    )
    logp = (
        bc.withColumn("__a__", F.split(F.col("bigram"), " ")[0])
        .join(F.broadcast(ctx), on="__a__")
        .select(
            "bigram",
            F.floor(
                F.log(F.col("__cab__") / F.col("__ca__").cast("double"))
                * 10000.0
                + F.lit(0.5)
            )
            .cast("long")
            .alias("__lp__"),
        )
    )
    return (
        ex.join(logp, on="bigram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum("__lp__").alias("__s__"))
        .select(
            F.col(id_col),
            "n_bigrams",
            fround(
                F.col("__s__") / (F.col("n_bigrams") * F.lit(10000.0)), 4
            ).alias("lm2_score"),
        )
    )


def perplexity_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    lm_barrier: bool = False,
    scored_barrier: bool = True,
) -> DataFrame:
    """(id, lang_pred, lm2_score, bucket) — CCNet-style head/middle/tail
    corpus partition (Wenzek et al. 2020): score fluency with the
    corpus-trained bigram LM (:func:`bigram_lm_score`), then split each
    LANGUAGE at its own fluency terciles — ``head`` = most fluent third.
    CCNet buckets by per-language Wikipedia-LM perplexity; the in-corpus
    LM is the self-contained stand-in (higher mean logprob = lower
    perplexity, so ``head`` is ``lm2_score >= t2``).

    Scale: language-ID is a narrow pass, the LM join is the
    bigram_lm_score pipeline, and the tercile thresholds come from
    :func:`~hashquery_spark.ops.profile.grid_percentiles` — lm2 scores
    live on a 1e-4 grid, so the per-language score HISTOGRAM (not the
    docs) is what aggregates: exact terciles with bounded memory even
    when one language holds half of a 100 TB corpus (real corpora are
    English-skewed; a per-language exact ``percentile`` buffer aggregate
    would put billions of doubles on one reducer). Docs with < 2 tokens
    have no bigrams and drop out (CCNet also drops them).

    Determinism: lm2 scores are integer-scaled-exact; interpolated
    tercile thresholds are bit-identical cross-engine (lo + (hi-lo)*frac
    in doubles, see the quantiles query); tercile fractions are computed
    as 1/3 and 2/3 in double on BOTH engines.
    """
    from .profile import grid_percentiles

    lang = df.select(F.col(id_col), *langid_cols(F.col(text_col))).select(
        id_col, "lang_pred"
    )
    lm = bigram_lm_score(df, text_col, id_col, barrier=lm_barrier)
    # checkpoint: the tercile aggregate and the final join are two
    # structurally different consumers (different column pruning) — an
    # unmaterialized `scored` re-runs the whole bigram-LM pipeline for
    # each (the measured no-ReusedExchange trap; ~2x on this op).
    # ``lm_barrier``/``scored_barrier`` expose the two chained eager
    # checkpoints for A/B (r9 verdict #5). r10 MEASURED: lm_barrier=False
    # + scored_barrier=True wins — the scored checkpoint already
    # serializes the path, and the inner bigram-count barrier serialized
    # the ctx/logp sibling stages behind an extra job (sf0.1 quiet:
    # 3.24 s vs 4.59 with both barriers; sf1 interleaved min 14.4 vs
    # 17.1 — the r9 cheap-duplicated-work-runs-parallel lesson). The
    # standalone bigram_lm_score keeps ITS default barrier: without the
    # scored checkpoint the count table really is consumed 4x live.
    scored = lm.join(lang, on=id_col)
    if scored_barrier:
        scored = scored.localCheckpoint(eager=True)
    th = grid_percentiles(
        scored,
        "lm2_score",
        {"__t1__": 1.0 / 3.0, "__t2__": 2.0 / 3.0},
        by="lang_pred",
    )
    bucket = (
        F.when(F.col("lm2_score") >= F.col("__t2__"), "head")
        .when(F.col("lm2_score") >= F.col("__t1__"), "middle")
        .otherwise("tail")
    )
    return (
        scored.join(F.broadcast(th), on="lang_pred")
        .select(
            F.col(id_col),
            "lang_pred",
            "lm2_score",
            bucket.alias("bucket"),
        )
    )


def zipf_fit(
    df: DataFrame, text_col: str, f_min: int = 5
) -> DataFrame:
    """Zipf/power-law tail exponent of the corpus token-frequency
    distribution — the 'does this corpus look like natural language'
    diagnostic (natural text sits near alpha ≈ 2 on frequencies;
    templated/synthetic corpora drift). Continuous-MLE (Hill) estimator
    over token frequencies ≥ ``f_min`` (Clauset-Shalizi-Newman 2009
    eq. 3.1 applied to frequencies): ``alpha = 1 + m / Σ ln(f_i/f_min)``.
    Output (one row): ``n_tokens, n_types, m, f_min, alpha`` (alpha NULL
    when every qualifying frequency equals f_min).

    Exactness: frequencies are integers; the log sum lives on the integer
    micro-unit grid (Σ L(f_i) − m·L(f_min), L = floor(ln·1e6 + 0.5) — the
    mutual_information machinery), so alpha is 1 + an exact double
    quotient of two integers. Scale: one token explode + one
    groupBy(token) with map-side combine (bounded by vocabulary), then a
    single global aggregate over the type table.
    """
    from .dedup import tokens

    if f_min < 1:
        raise ValueError("f_min must be >= 1")
    toks = (
        df.select(F.explode(tokens(F.col(text_col))).alias("__tok__"))
        .where(F.col("__tok__") != "")
        .groupBy("__tok__")
        .agg(F.count(F.lit(1)).alias("__f__"))
    )
    lmicro = F.floor(
        F.log(F.col("__f__").cast("double")) * F.lit(1000000.0) + F.lit(0.5)
    ).cast("long")
    g = toks.groupBy().agg(
        F.sum("__f__").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.count(F.when(F.col("__f__") >= f_min, 1)).alias("m"),
        F.sum(F.when(F.col("__f__") >= f_min, lmicro)).alias("__sl__"),
    )
    import math

    lf_min = int(math.floor(math.log(f_min) * 1e6 + 0.5))
    denom = F.col("__sl__") - F.col("m") * F.lit(lf_min)
    return g.select(
        "n_tokens",
        "n_types",
        "m",
        F.lit(f_min).cast("long").alias("f_min"),
        F.when(
            denom > 0,
            F.lit(1.0)
            + (F.col("m") * F.lit(1000000)).cast("double") / denom.cast("double"),
        ).alias("alpha"),
    )


def ngram_novelty(
    df: DataFrame, text_col: str, id_col: str, n: int = 3
) -> DataFrame:
    """Per-document n-gram NOVELTY: the fraction of a document's
    distinct word ``n``-grams that appear in NO other document — the
    corpus-diversity / memorization-risk diagnostic (cf. McCoy et al.
    2023 "raw novelty"; low-novelty docs are template spam or near-dups
    that survived hashing). Output: ``(id, n_grams, n_novel, novelty)``
    with novelty on the exact 4-dp integer-ratio grid; gram-less docs
    score 0.

    Scale: one explode of per-doc DISTINCT grams feeds BOTH the global
    gram document-frequency aggregate and the per-doc rollup; the
    (gram → df) table joins back on the uniform gram key (shuffle join —
    the gram table is corpus-sized, never broadcast). Three shuffles
    total, all on uniform keys, text never moves.
    """
    from .dedup import ensure_parallelism, round4_ratio, word_shingles

    ex = ensure_parallelism(df).select(
        F.col(id_col),
        F.explode_outer(
            F.array_distinct(word_shingles(F.col(text_col), n))
        ).alias("__g__"),
    )
    dfreq = (
        ex.where(F.col("__g__").isNotNull())
        .groupBy("__g__")
        .agg(F.count(F.lit(1)).alias("__df__"))
    )
    scored = (
        ex.join(dfreq, on="__g__", how="left")
        .groupBy(id_col)
        .agg(
            F.count("__g__").alias("n_grams"),
            F.count(F.when(F.col("__df__") == 1, 1)).alias("n_novel"),
        )
    )
    return scored.select(
        F.col(id_col),
        "n_grams",
        "n_novel",
        round4_ratio(
            F.col("n_novel"), F.greatest(F.col("n_grams"), F.lit(1))
        ).alias("novelty"),
    )


def vocab_coverage(
    df: DataFrame, text_col: str, id_col: str, top_k: int = 1000
) -> DataFrame:
    """(id, n_tokens, n_oov, oov_rate, chars_per_token) — per-document
    coverage of a frequency vocabulary: the tokenizer-evaluation report
    (how much of each doc a ``top_k`` word vocabulary explains, and the
    fertility proxy chars-per-token that drives sequence-length budgets).
    High ``oov_rate`` flags foreign/garbage docs under a target vocab;
    ``chars_per_token`` rises on agglutinative or junk text.

    Scale: ONE explode feeds both the vocabulary build (token groupBy,
    map-side combined, top-k via sort+limit) and the per-doc rollup; the
    bounded vocab broadcasts back onto the exploded tokens (left join —
    misses are the OOVs). Ratios are exact integer ratios on the
    tie-proof 4-dp grid; deterministic top-k tie-break by token.
    """
    from .dedup import ensure_parallelism, round4_ratio

    ex = (
        ensure_parallelism(df)
        .select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token"))
        .where(F.col("token") != "")
    )
    vocab = (
        ex.groupBy("token")
        .agg(F.count(F.lit(1)).alias("__tf__"))
        .orderBy(F.desc("__tf__"), F.asc("token"))
        .limit(top_k)
        .select("token", F.lit(1).alias("__in__"))
    )
    rolled = (
        ex.join(F.broadcast(vocab), on="token", how="left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count(F.when(F.col("__in__").isNull(), 1)).alias("n_oov"),
            F.sum(F.length("token")).alias("__chars__"),
        )
    )
    return rolled.select(
        F.col(id_col),
        "n_tokens",
        "n_oov",
        round4_ratio(F.col("n_oov"), F.col("n_tokens")).alias("oov_rate"),
        round4_ratio(F.col("__chars__"), F.col("n_tokens")).alias(
            "chars_per_token"
        ),
    )


def flesch_reading_ease(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, n_sentences, n_words, n_syllables, flesch) — Flesch reading
    ease (206.835 − 1.015·words/sentences − 84.6·syllables/words), the
    classic readability gate some quality-filter stacks add next to the
    Gopher heuristics. Syllables use the standard vowel-group
    approximation (runs of ``[aeiouy]+`` per word); sentences are
    ``[.!?]+`` runs, floored at 1 so punctuation-free text degrades to
    one long sentence instead of dividing by zero.

    One narrow codegen'd pass (regexp counts only — no tokenize
    explode, no UDF, no shuffle); both component ratios are exact
    integer ratios and the blend uses the tie-proof fround, so the
    oracle matches bit-for-bit.
    """
    t = F.col(text_col)
    low = F.lower(t)
    n_sent = F.greatest(
        F.size(F.regexp_extract_all(t, F.lit(r"[.!?]+"), 0)), F.lit(1)
    )
    words = F.greatest(
        F.size(F.regexp_extract_all(low, F.lit(r"[a-z0-9]+"), 0)), F.lit(1)
    )
    syll = F.size(F.regexp_extract_all(low, F.lit(r"[aeiouy]+"), 0))
    flesch = fround(
        F.lit(206.835)
        - F.lit(1.015) * (words.cast("double") / n_sent.cast("double"))
        - F.lit(84.6) * (syll.cast("double") / words.cast("double")),
        4,
    )
    return df.where(t.isNotNull()).select(
        F.col(id_col),
        n_sent.alias("n_sentences"),
        words.alias("n_words"),
        syll.alias("n_syllables"),
        flesch.alias("flesch"),
    )


def distinct_n(df: DataFrame, text_col: str, max_n: int = 3) -> DataFrame:
    """(n, total_ngrams, distinct_ngrams, distinct_ratio) for n =
    1..``max_n`` — the corpus-level distinct-n diversity profile (Li et
    al. 2016's Distinct-N, the standard mode-collapse / template-spam
    readout: a synthetic or boilerplate-heavy corpus shows a collapsed
    distinct-2/distinct-3 ratio long before exact dedup finds anything).

    Scale: tokenize ONCE per row behind a Generate barrier (the measured
    HOF-capture trap — a lambda over the raw tokens() tree re-runs the
    regex tokenizer per shingle), emit all n-gram sizes in ONE tagged
    explode, then one groupBy(n, gram) with map-side combine (state
    bounded by vocabulary, not corpus) and a bounded rollup per n.
    distinct_ratio is the tie-proof integer ratio.
    """
    toked = ensure_parallelism(
        df.where(F.col(text_col).isNotNull())
    ).select(
        F.explode(F.array(F.struct(tokens(F.col(text_col)).alias("t")))).alias(
            "__tk__"
        )
    )
    toks = F.col("__tk__.t")
    sz = F.size(toks)

    def shingle_fn(n):
        return lambda i: F.concat_ws(
            "\x01", F.lit(str(n)), F.concat_ws(" ", F.slice(toks, i, n))
        )

    parts = [
        F.when(
            sz >= n,
            F.transform(F.sequence(F.lit(1), sz - (n - 1)), shingle_fn(n)),
        ).otherwise(F.array())
        for n in range(1, max_n + 1)
    ]
    exploded = (
        toked.select(F.explode(F.concat(*parts)).alias("__t__"))
        .select(
            F.split_part(F.col("__t__"), F.lit("\x01"), F.lit(1))
            .cast("int")
            .alias("n"),
            F.split_part(F.col("__t__"), F.lit("\x01"), F.lit(2)).alias("__g__"),
        )
        .where(F.col("__g__") != "")  # empty-normalized docs tokenize to ['']
    )
    per_gram = exploded.groupBy("n", "__g__").agg(
        F.count(F.lit(1)).alias("__c__")
    )
    return (
        per_gram.groupBy("n")
        .agg(
            F.sum("__c__").cast("long").alias("total_ngrams"),
            F.count(F.lit(1)).alias("distinct_ngrams"),
        )
        .select(
            "n",
            "total_ngrams",
            "distinct_ngrams",
            round4_ratio(
                F.col("distinct_ngrams"), F.greatest(F.col("total_ngrams"), F.lit(1))
            ).alias("distinct_ratio"),
        )
    )


def trigram_lm_score(
    df: DataFrame,
    text_col: str,
    id_col: str,
    model_df: DataFrame | None = None,
    alpha: float = 0.4,
) -> DataFrame:
    """(id, n_trigrams, n_tri_hits, n_bi_backoff, n_uni_backoff,
    lm3_score) — mean trigram log-score under a Stupid Backoff LM
    (Brants et al. 2007) trained on ``model_df`` (default: ``df``
    itself): S(w3|w1 w2) = c(w1w2w3)/c(w1w2) when the trigram is seen,
    else alpha * c(w2w3)/c(w2), else alpha^2 * c(w3)/N (OOV words floor
    at count 1). The third-order fluency gate above
    :func:`bigram_lm_score` — and with a held-out ``model_df`` the
    backoff counters become a train/score domain-shift readout.

    Scale: the model side is ONE tagged explode -> one vocab-bounded
    groupBy, localCheckpointed (three differently-pruned consumers — the
    measured no-ReusedExchange trap); the scored side explodes token
    positions once behind a Generate barrier and left-joins the three
    count tables on gram keys (vocab ≪ corpus — AQE broadcasts; at
    100 TB these are plain shuffle joins on uniform gram keys). N rides
    a 1-row broadcast crossJoin (the ab_test/bm25 pattern).

    Determinism: each position's ln is snapped to the 1e-4 grid with the
    floor form and summed as BIGINTs; the mean is the exact integer
    ratio fround(4) — the bigram_lm_score contract.
    """
    src = model_df if model_df is not None else df
    toked_m = ensure_parallelism(
        src.where(F.col(text_col).isNotNull())
    ).select(
        F.explode(F.array(F.struct(tokens(F.col(text_col)).alias("t")))).alias(
            "__tk__"
        )
    )
    mtoks = F.col("__tk__.t")
    msz = F.size(mtoks)

    def tag_fn(n):
        return lambda i: F.concat_ws(
            "\x01", F.lit(str(n)), F.concat_ws(" ", F.slice(mtoks, i, n))
        )

    mparts = [
        F.when(
            msz >= n,
            F.transform(F.sequence(F.lit(1), msz - (n - 1)), tag_fn(n)),
        ).otherwise(F.array())
        for n in (1, 2, 3)
    ]
    per_gram = (
        toked_m.select(F.explode(F.concat(*mparts)).alias("__t__"))
        .select(
            F.split_part(F.col("__t__"), F.lit("\x01"), F.lit(1))
            .cast("int")
            .alias("__n__"),
            F.split_part(F.col("__t__"), F.lit("\x01"), F.lit(2)).alias("__g__"),
        )
        .where(F.col("__g__") != "")
        .groupBy("__n__", "__g__")
        .agg(F.count(F.lit(1)).alias("__c__"))
        .localCheckpoint(eager=True)
    )
    f1 = per_gram.where(F.col("__n__") == 1).select(
        F.col("__g__").alias("__w__"), F.col("__c__").alias("__c1__")
    )
    f2 = per_gram.where(F.col("__n__") == 2).select(
        F.col("__g__").alias("__b__"), F.col("__c__").alias("__c2__")
    )
    f3 = per_gram.where(F.col("__n__") == 3).select(
        F.col("__g__").alias("__tri__"), F.col("__c__").alias("__c3__")
    )
    totals = f1.agg(F.sum("__c1__").cast("double").alias("__N__"))

    toked = ensure_parallelism(
        df.where(F.col(text_col).isNotNull())
    ).select(
        F.col(id_col),
        F.explode(F.array(F.struct(tokens(F.col(text_col)).alias("t")))).alias(
            "__tk__"
        ),
    )
    dtoks = F.col("__tk__.t")
    # per-position trigram strings built INSIDE one single-level
    # transform over the bound token attribute (exploding positions and
    # carrying the token array per row would copy the array O(len^2))
    tri_strings = F.when(
        F.size(dtoks) >= 3,
        F.transform(
            F.sequence(F.lit(3), F.size(dtoks)),
            lambda i: F.concat_ws(
                "\x01",
                F.try_element_at(dtoks, i - 2),
                F.try_element_at(dtoks, i - 1),
                F.try_element_at(dtoks, i),
            ),
        ),
    ).otherwise(F.array())
    pos = toked.select(
        id_col, F.explode(tri_strings).alias("__t3__")
    ).select(
        id_col,
        F.split_part(F.col("__t3__"), F.lit("\x01"), F.lit(1)).alias("__w1__"),
        F.split_part(F.col("__t3__"), F.lit("\x01"), F.lit(2)).alias("__w2__"),
        F.split_part(F.col("__t3__"), F.lit("\x01"), F.lit(3)).alias("__w3__"),
    ).where(F.col("__w1__") != "")
    keyed = pos.select(
        id_col,
        "__w2__",
        "__w3__",
        F.concat_ws(" ", "__w1__", "__w2__", "__w3__").alias("__tri__"),
        F.concat_ws(" ", "__w1__", "__w2__").alias("__bctx__"),
        F.concat_ws(" ", "__w2__", "__w3__").alias("__b__"),
    )
    joined = (
        keyed.join(f3, on="__tri__", how="left")
        .join(
            f2.select(
                F.col("__b__").alias("__bctx__"), F.col("__c2__").alias("__c2ctx__")
            ),
            on="__bctx__",
            how="left",
        )
        .join(f2, on="__b__", how="left")
        .join(
            f1.select(F.col("__w__").alias("__w2__"), F.col("__c1__").alias("__c1w2__")),
            on="__w2__",
            how="left",
        )
        .join(
            f1.select(F.col("__w__").alias("__w3__"), F.col("__c1__").alias("__c1w3__")),
            on="__w3__",
            how="left",
        )
        .crossJoin(F.broadcast(totals))
    )
    a = F.lit(float(alpha))
    score = (
        F.when(
            F.col("__c3__").isNotNull(),
            F.log(F.col("__c3__") / F.col("__c2ctx__").cast("double")),
        )
        .when(
            F.col("__c2__").isNotNull(),
            F.log(a * (F.col("__c2__") / F.col("__c1w2__").cast("double"))),
        )
        .otherwise(
            F.log(
                a
                * a
                * (F.coalesce(F.col("__c1w3__"), F.lit(1)).cast("double") / F.col("__N__"))
            )
        )
    )
    tier = (
        F.when(F.col("__c3__").isNotNull(), F.lit(3))
        .when(F.col("__c2__").isNotNull(), F.lit(2))
        .otherwise(F.lit(1))
    )
    scored = joined.select(
        id_col,
        tier.alias("__tier__"),
        F.floor(score * F.lit(10000.0) + F.lit(0.5)).cast("long").alias("__lp__"),
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_trigrams"),
        F.count(F.when(F.col("__tier__") == 3, 1)).alias("n_tri_hits"),
        F.count(F.when(F.col("__tier__") == 2, 1)).alias("n_bi_backoff"),
        F.count(F.when(F.col("__tier__") == 1, 1)).alias("n_uni_backoff"),
        fround(
            F.sum("__lp__") / (F.count(F.lit(1)) * F.lit(10000.0)), 4
        ).alias("lm3_score"),
    )


def cooccurrence(
    df: DataFrame,
    text_col: str,
    window: int = 2,
    min_count: int = 5,
    top_k: int = 50,
) -> DataFrame:
    """(pair, n_ab, n_a, n_b, pmi) — top WINDOWED co-occurrence
    collocations: unordered token pairs within ``window`` positions,
    scored by PMI against corpus unigram counts (the skip-gram
    statistics an embedding pipeline feeds on; the windowed
    generalization of :func:`pmi_bigrams`, same
    ``pmi = ln(N*c_ab / (c_a*c_b))`` convention). Pairs are
    canonicalized ``least greatest`` so (a,b) and (b,a) pool.

    Scale: tokenize ONCE behind a Generate barrier (the HOF-capture
    trap), emit all window offsets d = 1..window in one concat-of-
    transforms explode (O(len*window) strings, never the token array
    per row), count into the vocab-bounded pair table; unigrams join
    back broadcast; the 1-row total rides a broadcast crossJoin; top-k
    is a bounded TakeOrdered.

    Determinism: PMI's ln snaps with the floor form (fround 4; the
    pinned no-bare-round invariant); ties order by pair text.
    """
    from .dedup import ensure_parallelism, fround, tokens

    toked = ensure_parallelism(
        df.where(F.col(text_col).isNotNull())
    ).select(
        F.explode(F.array(F.struct(tokens(F.col(text_col)).alias("t")))).alias(
            "__tk__"
        )
    )
    toks = F.col("__tk__.t")
    sz = F.size(toks)

    def pair_fn(d):
        return lambda i: F.concat_ws(
            " ",
            F.least(F.try_element_at(toks, i), F.try_element_at(toks, i + d)),
            F.greatest(F.try_element_at(toks, i), F.try_element_at(toks, i + d)),
        )

    parts = [
        F.when(
            sz > d, F.transform(F.sequence(F.lit(1), sz - d), pair_fn(d))
        ).otherwise(F.array())
        for d in range(1, window + 1)
    ]
    pairs = (
        toked.select(F.explode(F.concat(*parts)).alias("pair"))
        .where(~F.col("pair").startswith(" ") & F.col("pair").contains(" "))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_count)
        .withColumn("__a__", F.split_part(F.col("pair"), F.lit(" "), F.lit(1)))
        .withColumn("__b__", F.split_part(F.col("pair"), F.lit(" "), F.lit(2)))
    )
    # NOTE (r9 negative result): checkpointing `uni` measured SLOWER
    # (1.06 -> 1.26 s) — see the pmi_bigrams note; parallel pruned
    # rescans beat a serializing barrier at this payload
    uni = (
        toked.select(F.explode(toks).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = uni.agg(F.sum("cnt").alias("n_total"))
    joined = (
        pairs.join(
            F.broadcast(uni.selectExpr("token AS __a__", "cnt AS n_a")), on="__a__"
        )
        .join(
            F.broadcast(uni.selectExpr("token AS __b__", "cnt AS n_b")), on="__b__"
        )
        .crossJoin(F.broadcast(total))
    )
    pmi = fround(
        F.log(
            (F.col("n_ab").cast("double") * F.col("n_total"))
            / (F.col("n_a").cast("double") * F.col("n_b"))
        ),
        4,
    )
    return (
        joined.select("pair", "n_ab", "n_a", "n_b", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), F.asc("pair"))
        .limit(top_k)
    )


def vocab_drift(df_a: DataFrame, df_b: DataFrame, text_col: str) -> DataFrame:
    """Jensen-Shannon divergence between the UNIGRAM DISTRIBUTIONS of
    two corpora (nats, 0..ln 2) plus the vocabulary overlap census —
    "did the crawl shift under me?" at the token level, where
    :func:`~hashquery_spark.ops.profile.js_divergence` compares a
    categorical column. Output (one row): ``n_a, n_b`` (token totals),
    ``n_vocab`` (union), ``n_vocab_a, n_vocab_b, n_shared, jsd``.

    Exactness: the js_divergence integer contract verbatim — with
    integer counts the per-token ratios reduce to integers, each ln
    lands on the 1e-6 floor grid, and the sums are order-independent
    DECIMAL(38,0); the final quotients are exact-rational doubles.

    Scale: one barrier tokenize + explode per corpus, one tagged-union
    groupBy(token) with map-side combine; totals via a window over the
    vocab-bounded count table.
    """
    from .dedup import ensure_parallelism, tokens

    def toks_of(df, sa, sb):
        toked = ensure_parallelism(
            df.where(F.col(text_col).isNotNull())
        ).select(
            F.explode(
                F.array(F.struct(tokens(F.col(text_col)).alias("t")))
            ).alias("__tk__")
        )
        return (
            toked.select(F.explode(F.col("__tk__.t")).alias("__v__"))
            .where(F.col("__v__") != "")
            .select(
                "__v__", F.lit(sa).alias("__sa__"), F.lit(sb).alias("__sb__")
            )
        )

    u = toks_of(df_a, 1, 0).unionAll(toks_of(df_b, 0, 1))
    counts = u.groupBy("__v__").agg(
        F.sum("__sa__").cast("long").alias("__a__"),
        F.sum("__sb__").cast("long").alias("__b__"),
    )
    everything = Window.partitionBy()
    with_tot = counts.select(
        "__a__",
        "__b__",
        F.sum("__a__").over(everything).alias("__na__"),
        F.sum("__b__").over(everything).alias("__nb__"),
    )
    lm = lambda x: F.floor(  # noqa: E731
        F.log(x.cast("double")) * F.lit(1000000.0) + F.lit(0.5)
    ).cast("long")
    # DECIMAL products, not BIGINT — same int64-overflow hazard as
    # js_divergence (this skeleton was inherited verbatim; r4 advice):
    # token totals ~1e12 x hot-token count ~1e7 exceeds int64.
    a19 = F.col("__a__").cast("decimal(19,0)")
    b19 = F.col("__b__").cast("decimal(19,0)")
    na19 = F.col("__na__").cast("decimal(19,0)")
    nb19 = F.col("__nb__").cast("decimal(19,0)")
    d = a19 * nb19 + b19 * na19
    ta = F.when(
        F.col("__a__") > 0,
        F.col("__a__").cast("decimal(38,0)")
        * (lm(F.lit(2).cast("decimal(19,0)") * a19 * nb19) - lm(d)),
    )
    tb = F.when(
        F.col("__b__") > 0,
        F.col("__b__").cast("decimal(38,0)")
        * (lm(F.lit(2).cast("decimal(19,0)") * b19 * na19) - lm(d)),
    )
    g = with_tot.select(
        "__na__",
        "__nb__",
        F.col("__a__"),
        F.col("__b__"),
        ta.alias("__ta__"),
        tb.alias("__tb__"),
    ).groupBy().agg(
        F.max("__na__").alias("n_a"),
        F.max("__nb__").alias("n_b"),
        F.count(F.lit(1)).alias("n_vocab"),
        F.count(F.when(F.col("__a__") > 0, 1)).alias("n_vocab_a"),
        F.count(F.when(F.col("__b__") > 0, 1)).alias("n_vocab_b"),
        F.count(F.when((F.col("__a__") > 0) & (F.col("__b__") > 0), 1)).alias(
            "n_shared"
        ),
        F.sum("__ta__").alias("__sa2__"),
        F.sum("__tb__").alias("__sb2__"),
    )
    return g.select(
        F.col("n_a").cast("long"),
        F.col("n_b").cast("long"),
        F.col("n_vocab").cast("long"),
        F.col("n_vocab_a").cast("long"),
        F.col("n_vocab_b").cast("long"),
        F.col("n_shared").cast("long"),
        (
            (
                F.coalesce(F.col("__sa2__"), F.lit(0).cast("decimal(38,0)")).cast(
                    "double"
                )
                / F.col("n_a").cast("double")
                + F.coalesce(F.col("__sb2__"), F.lit(0).cast("decimal(38,0)")).cast(
                    "double"
                )
                / F.col("n_b").cast("double")
            )
            / F.lit(2000000.0)
        ).alias("jsd"),
    )


def vocab_top_movers(
    df_a: DataFrame, df_b: DataFrame, text_col: str, top_k: int = 50
) -> DataFrame:
    """(token, n_a, n_b, share_a, share_b, dev) — the ``top_k`` tokens
    whose corpus share moved most between two corpora (|p - q|
    descending, token tiebreak) — the ACTIONABLE half of
    :func:`vocab_drift` (the JSD says "something shifted"; this says
    WHAT). Shares and deviation are tie-proof 4-dp integer forms:
    dev = |a·n_b - b·n_a| / (n_a·n_b) via the exact floor ratio.

    Scale: the vocab_drift skeleton (one barrier tokenize + tagged
    union + vocab-bounded counts); the top-k is a bounded TakeOrdered.
    """
    from .dedup import ensure_parallelism, round4_ratio, tokens

    def toks_of(df, sa, sb):
        toked = ensure_parallelism(
            df.where(F.col(text_col).isNotNull())
        ).select(
            F.explode(
                F.array(F.struct(tokens(F.col(text_col)).alias("t")))
            ).alias("__tk__")
        )
        return (
            toked.select(F.explode(F.col("__tk__.t")).alias("token"))
            .where(F.col("token") != "")
            .select(
                "token", F.lit(sa).alias("__sa__"), F.lit(sb).alias("__sb__")
            )
        )

    u = toks_of(df_a, 1, 0).unionAll(toks_of(df_b, 0, 1))
    counts = u.groupBy("token").agg(
        F.sum("__sa__").cast("long").alias("n_a"),
        F.sum("__sb__").cast("long").alias("n_b"),
    )
    everything = Window.partitionBy()
    with_tot = counts.select(
        "token",
        "n_a",
        "n_b",
        F.sum("n_a").over(everything).alias("__na__"),
        F.sum("n_b").over(everything).alias("__nb__"),
    )
    cross = F.abs(
        F.col("n_a").cast("decimal(38,0)") * F.col("__nb__")
        - F.col("n_b").cast("decimal(38,0)") * F.col("__na__")
    )
    dev = round4_ratio(
        cross.cast("double"),
        (F.col("__na__").cast("decimal(38,0)") * F.col("__nb__")).cast("double"),
    )
    return (
        with_tot.select(
            "token",
            "n_a",
            "n_b",
            round4_ratio(F.col("n_a"), F.col("__na__")).alias("share_a"),
            round4_ratio(F.col("n_b"), F.col("__nb__")).alias("share_b"),
            dev.alias("dev"),
        )
        .orderBy(F.desc("dev"), F.asc("token"))
        .limit(top_k)
    )


def heaps_law(
    df: DataFrame, text_col: str, id_col: str, n_points: int = 12
) -> DataFrame:
    """Heaps'-law vocabulary growth fit V(n) = K·n^β over the
    ``id_col``-ordered corpus prefix — the companion diagnostic to
    :func:`zipf_fit` ("is vocabulary still growing, and at the natural-
    language exponent β ≈ 0.4–0.6, or has the corpus saturated /
    templated out"). Output (one row): ``n_points, n_tokens, n_types,
    beta, ln_k`` (log-log OLS slope and intercept; NULL when the
    measurement points are degenerate).

    Exactness: the ``n_points`` prefix cutoffs come from
    :func:`~hashquery_spark.ops.profile.grid_percentiles` over the doc
    ids (bit-identical to DuckDB quantile_cont); prefix token counts
    N_j and vocabulary sizes V_j are exact integers from CASE sums; the
    OLS runs on the ln-microunit grid (L = floor(ln·1e6 + 0.5)) in
    exact DECIMAL arithmetic, so β and ln K are exact integer rationals
    divided once — no rounding site.

    Scale: ONE token explode feeds ONE per-type aggregate (bounded by
    vocabulary) that carries both the min-first-doc and the per-cutoff
    occurrence counts — the prefix token counts N_j are Σ of the
    per-type counts, so no second tokenize pass exists; the cutoff row
    broadcasts once; the regression runs on n_points rows."""
    from .dedup import tokens
    from .profile import grid_percentiles

    if n_points < 3:
        raise ValueError("n_points must be >= 3")
    did = F.col(id_col).cast("double")
    tok = (
        df.where(did.isNotNull())
        .select(
            did.alias("__did__"),
            F.explode(tokens(F.col(text_col))).alias("__tok__"),
        )
        .where(F.col("__tok__") != "")
    )
    qs = {f"__cut{j}__": j / float(n_points) for j in range(1, n_points + 1)}
    # barrier the narrow doc-id frame before the cutoff derivation (r9
    # verdict #4: grid_percentiles' three differently-pruned consumers —
    # GK sketch, below-counts, bracket window — each re-scanned the
    # corpus parquet; an 8-byte-per-doc checkpoint feeds all three, so
    # the whole op reads parquet twice: once here, once for the token
    # explode).
    ids = (
        df.where(did.isNotNull())
        .select(did.alias("__did__"))
        .localCheckpoint(eager=True)
    )
    cuts = grid_percentiles(ids, "__did__", qs)
    # ONE explode pass (r9): the per-type min-first-doc aggregate ALSO
    # carries the per-cutoff occurrence counts, so the prefix token
    # counts N_j ride the same groupBy(token) instead of a second full
    # tokenize+explode scan (N_j = Σ per-type counts — identical
    # integers); the cutoff row broadcasts once instead of twice.
    per_type = (
        tok.crossJoin(F.broadcast(cuts))
        .groupBy("__tok__")
        .agg(
            F.min("__did__").alias("__first__"),
            *[
                F.count(
                    F.when(F.col("__did__") <= F.col(f"__cut{j}__"), 1)
                ).alias(f"__c{j}__")
                for j in range(1, n_points + 1)
            ],
            *[
                F.min(F.col(f"__cut{j}__")).alias(f"__cut{j}__")
                for j in range(1, n_points + 1)
            ],
        )
    )
    both = per_type.agg(
        *[
            F.count(
                F.when(F.col("__first__") <= F.col(f"__cut{j}__"), 1)
            ).alias(f"__V{j}__")
            for j in range(1, n_points + 1)
        ],
        *[
            F.coalesce(F.sum(F.col(f"__c{j}__")), F.lit(0).cast("long")).alias(
                f"__N{j}__"
            )
            for j in range(1, n_points + 1)
        ],
    )
    lm = (
        "CAST(floor(ln(CAST({c} AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)"
    )
    pts = both.selectExpr(
        f"__N{n_points}__ AS n_tokens",
        f"__V{n_points}__ AS n_types",
        "stack("
        + str(n_points)
        + ", "
        + ", ".join(
            f"{lm.format(c=f'__N{j}__')}, {lm.format(c=f'__V{j}__')}"
            for j in range(1, n_points + 1)
        )
        + ") AS (__x__, __y__)",
    )
    # degenerate prefixes (N_j=0 or V_j=0 → ln NULL) drop BEFORE the
    # regression (r8 ADVICE: the sums skipped those NULLs while count(*)
    # didn't — the OLS silently used an inconsistent point count)
    pts = pts.where(F.col("__x__").isNotNull() & F.col("__y__").isNotNull())
    d = "decimal(38,0)"
    reg = pts.groupBy("n_tokens", "n_types").agg(
        F.count(F.lit(1)).alias("__m__"),
        F.sum(F.col("__x__").cast(d)).alias("__sx__"),
        F.sum(F.col("__y__").cast(d)).alias("__sy__"),
        F.sum(F.col("__x__").cast(d) * F.col("__y__")).alias("__sxy__"),
        F.sum(F.col("__x__").cast(d) * F.col("__x__")).alias("__sxx__"),
    )
    m = F.col("__m__").cast(d)
    num = m * F.col("__sxy__") - F.col("__sx__") * F.col("__sy__")
    den = m * F.col("__sxx__") - F.col("__sx__") * F.col("__sx__")
    beta = num.cast("double") / den.cast("double")
    # ln K in micro-units, exact rational: (Σy·den − num·Σx) / (m·den)
    lnk = (
        (F.col("__sy__") * den - num * F.col("__sx__")).cast("double")
        / ((m * den).cast("double") * F.lit(1000000.0))
    )
    return reg.select(
        F.lit(n_points).alias("n_points"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_types").cast("long").alias("n_types"),
        F.when(den > 0, beta + F.lit(0.0)).alias("beta"),
        F.when(den > 0, lnk + F.lit(0.0)).alias("ln_k"),
    )


def assoc_rules(
    df: DataFrame,
    id_col: str,
    item_col: str,
    min_pair_count: int = 2,
    max_items_per_basket: int = 200,
) -> DataFrame:
    """Pairwise association rules over (basket, item) rows — the
    market-basket support / confidence / lift trio ("customers whose
    orders span priority X also span priority Y"), and the co-occurrence
    mining shape for tag/label co-annotation audits. Output one row per
    unordered item pair (item_a < item_b): ``item_a, item_b, n_a, n_b,
    n_ab, support, conf_a_to_b, conf_b_to_a, lift``.

    Exactness: every statistic is a tie-proof integer ratio
    (:func:`~hashquery_spark.ops.dedup.round4_ratio` floor form, 4 dp);
    lift = n_ab·N / (n_a·n_b) with exact integer products.

    Scale: baskets collapse to DISTINCT (basket, item) rows first; the
    pair self-join is bounded by Σ basket_size² — baskets above
    ``max_items_per_basket`` are dropped whole BEFORE the join (the
    adamic_adar hub-cap contract, mirrored exactly in the oracle) so a
    pathological basket cannot go quadratic; ``min_pair_count`` prunes
    the long singleton tail at the aggregate. Item counts N_i count
    KEPT baskets only, keeping support/confidence internally
    consistent."""
    base = (
        df.where(F.col(id_col).isNotNull() & F.col(item_col).isNotNull())
        .select(
            F.col(id_col).alias("__bid__"),
            F.col(item_col).cast("string").alias("__item__"),
        )
        .distinct()
    )
    sizes = base.groupBy("__bid__").agg(F.count(F.lit(1)).alias("__bs__"))
    # eager barrier (r9): totals, item_counts and BOTH pair-join sides
    # consume `kept` — four differently-pruned consumers re-derived the
    # scan + distinct + size-filter join per consumer (20 parquet scans
    # in the measured plan; verify SKILL.md multi-consumer rule). The
    # frame is narrow (bid, item) and bounded by distinct basket-item
    # rows.
    kept = base.join(
        sizes.where(F.col("__bs__") <= max_items_per_basket).select("__bid__"),
        on="__bid__",
    ).localCheckpoint(eager=True)
    totals = kept.agg(
        F.count_distinct(F.col("__bid__")).cast("long").alias("__nb__")
    )
    item_counts = kept.groupBy("__item__").agg(
        F.count(F.lit(1)).cast("long").alias("__ni__")
    )
    lhs = kept.select("__bid__", F.col("__item__").alias("item_a"))
    rhs = kept.select("__bid__", F.col("__item__").alias("item_b"))
    pairs = (
        lhs.join(rhs, on="__bid__")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .where(F.col("n_ab") >= min_pair_count)
    )
    from .dedup import round4_ratio

    out = (
        pairs.join(
            item_counts.select(
                F.col("__item__").alias("item_a"), F.col("__ni__").alias("n_a")
            ),
            on="item_a",
        )
        .join(
            item_counts.select(
                F.col("__item__").alias("item_b"), F.col("__ni__").alias("n_b")
            ),
            on="item_b",
        )
        .crossJoin(F.broadcast(totals))
    )
    return out.select(
        "item_a",
        "item_b",
        "n_a",
        "n_b",
        "n_ab",
        round4_ratio(F.col("n_ab"), F.col("__nb__")).alias("support"),
        round4_ratio(F.col("n_ab"), F.col("n_a")).alias("conf_a_to_b"),
        round4_ratio(F.col("n_ab"), F.col("n_b")).alias("conf_b_to_a"),
        round4_ratio(
            F.col("n_ab") * F.col("__nb__"), F.col("n_a") * F.col("n_b")
        ).alias("lift"),
    )
