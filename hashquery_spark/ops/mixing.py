"""Deterministic corpus mixing — sample each source so the blended
output hits target per-source token proportions (net-new beyond the
reference; this is the "data mixture" step of a training pipeline:
Pile/Dolma-style source weighting).

Semantics: given ``weights = {source: share}`` (shares normalized to sum
to 1; unlisted sources are dropped), find the largest total token budget
``T`` achievable at exactly those proportions — ``T = min over s of
avail_s / w_s`` — then keep each row of source ``s`` independently with
probability ``keep_rate_s = w_s * T / avail_s`` (the binding source keeps
everything, over-represented sources are thinned). Membership is the
repo-standard deterministic md5 draw (ops/sampling.uniform01), so the
same document gets the same fate on every run, on every engine, at any
partitioning — and expected output token shares equal the weights.

Scale design: the per-source totals aggregate is tiny (|sources| rows)
and the achievable total ``T`` attaches to it via an unpartitioned window
over that tiny frame (NOT a cross join — no nested-loop join appears in
the plan); the rate table broadcast-joins back to the corpus, and the
final keep/drop is a codegen'd filter. The corpus itself NEVER shuffles
and the source-membership predicate pushes into both scans; the corpus is
read twice (once column-pruned to (source, text) for totals, once for the
output) — the unavoidable cost of rate-then-filter without persisting.

Cross-engine determinism: token counts are integers; ``avail`` casts to
DOUBLE before any division; ``T`` is a min of IEEE-exact quotients;
``keep_rate`` is two IEEE-exact double ops — DuckDB reproduces the rates
bit-for-bit, and the md5 draw is integer-derived.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .sampling import uniform01


def ws_token_count(text_col: Column) -> Column:
    """Whitespace token count (shared with ops/sampling.pack_sequences):
    0 for blank text, else the number of ``\\s+``-separated runs."""
    t = F.trim(text_col)
    return (
        F.when(F.length(t) == 0, F.lit(0))
        .otherwise(F.size(F.split(t, r"\s+")))
        .cast("long")
    )


def mix_corpora(
    df: DataFrame,
    source_col: str,
    id_col: str,
    weights: dict,
    text_col: str = "text",
    seed: int = 0,
) -> DataFrame:
    """Thin each source to hit target token proportions; returns the kept
    rows with ``n_tokens`` and the source's ``keep_rate`` appended.

    ``weights`` maps source value -> target share of output tokens; the
    shares are normalized, so ``{"a": 2, "b": 1}`` means a 2:1 token mix.
    Sources not listed (or with weight 0) are dropped entirely.
    """
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be a non-empty dict of >= 0 shares")
    total_w = float(sum(weights.values()))
    if total_w <= 0:
        raise ValueError("at least one weight must be positive")
    norm = {k: float(w) / total_w for k, w in weights.items() if w > 0}

    w_expr = None
    for value, w in sorted(norm.items()):
        cond = F.col(source_col) == value
        w_expr = F.when(cond, w) if w_expr is None else w_expr.when(cond, w)
    w_expr = w_expr.otherwise(F.lit(0.0))

    base = df.withColumn("n_tokens", ws_token_count(F.col(text_col)))
    totals = (
        base.groupBy(source_col)
        .agg(F.sum("n_tokens").cast("double").alias("__avail__"))
        .withColumn("__w__", w_expr)
        # a weighted source with ZERO available tokens is treated as
        # absent (it cannot contribute; the strict formula would force
        # T = 0 and empty output) — proportions are exact over the
        # sources that actually have tokens
        .where((F.col("__w__") > 0) & (F.col("__avail__") > 0))
    )
    # T = min(avail/w) attaches via an unpartitioned window over the
    # |sources|-row frame — tiny single partition, no nested-loop join.
    everything = Window.partitionBy()
    rates = totals.select(
        F.col(source_col),
        (
            F.col("__w__")
            * F.min(F.col("__avail__") / F.col("__w__")).over(everything)
            / F.col("__avail__")
        ).alias("keep_rate"),
    )
    return base.join(F.broadcast(rates), on=source_col).where(
        uniform01(F.col(id_col), seed) < F.col("keep_rate")
    )


def source_sampling_weights(
    df: DataFrame, source_col: str, alpha: float = 0.5
) -> DataFrame:
    """Temperature-scaled multinomial sampling weights per source — the
    multilingual/multi-corpus mixing recipe (mT5/XLM-R: sample source s
    with probability p_s^α / Σ p^α, α < 1 upsamples the tail). Output
    one row per source: ``{source_col}, n, share, share_alpha, factor``
    where ``factor = share_alpha / share`` is the up/down-sampling
    multiplier to feed :func:`mix_corpora`-style pipelines.

    Determinism: ``share`` is a tie-proof exact integer ratio;
    ``p^α = exp(α·ln n − α·ln N)`` runs on the ln-microunit grid — ln n
    and ln N snap to exact integers, α snaps to the 1e-6 grid, the
    exponent is an exact integer rational, and exp of the IDENTICAL
    double input matches cross-engine (the BLEU grid-snapped-exponent
    precedent); shares and factors fround to 6 dp.

    Scale: one map-side-combined aggregate over the source column, a
    bounded per-source frame, one broadcast total."""
    from .dedup import fround, round4_ratio

    if not 0 < alpha <= 1:
        raise ValueError("alpha must be in (0, 1]")
    a_us = int(round(alpha * 1e6))
    counts = (
        df.where(F.col(source_col).isNotNull())
        .groupBy(source_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = counts.agg(F.sum("n").cast("long").alias("__N__"))
    j = counts.crossJoin(F.broadcast(tot))
    ln_us = lambda c: F.floor(
        F.log(c.cast("double")) * F.lit(1000000.0) + F.lit(0.5)
    ).cast("long")
    # p^alpha per source, each exp'd from an exact integer-rational
    # exponent: (a_us * (ln_us(n) - ln_us(N))) / 1e12
    expo = (
        (F.lit(a_us) * (ln_us(F.col("n")) - ln_us(F.col("__N__"))))
        .cast("double")
        / F.lit(1e12)
    )
    pa = F.exp(expo)
    # normalizer Z = sum of p^alpha — bounded frame, computed once and
    # snapped to the 1e-9 grid BEFORE the ratio (order-proof)
    withpa = j.withColumn(
        "__pa9__", F.floor(pa * F.lit(1e9) + F.lit(0.5)).cast("long")
    )
    z = withpa.agg(F.sum("__pa9__").cast("long").alias("__Z__"))
    out = withpa.crossJoin(F.broadcast(z))
    share = round4_ratio(F.col("n"), F.col("__N__"))
    share_alpha = fround(
        F.col("__pa9__").cast("double") / F.col("__Z__").cast("double"), 6
    )
    factor = fround(
        (F.col("__pa9__").cast("double") * F.col("__N__"))
        / (F.col("__Z__").cast("double") * F.col("n")),
        6,
    )
    return out.select(
        source_col,
        "n",
        share.alias("share"),
        (share_alpha + F.lit(0.0)).alias("share_alpha"),
        (factor + F.lit(0.0)).alias("factor"),
    )
