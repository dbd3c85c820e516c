"""Published rule-set quality gates: Gopher rules and C4 line filters.

Net-new beyond the reference — the named, citable pretraining-corpus
gates (Rae et al. 2022 "Scaling Language Models" Appendix A1.1; Raffel
et al. 2020 "Exploring the Limits of Transfer Learning" §2.2), each as
one narrow whole-stage-codegen pass over the corpus with a DuckDB-
expressible formula for the oracle.

Scale design: the token/line arrays are materialized ONCE in their own
projection and every per-rule count derives from those columns (the
measured codegen trap: re-referencing a split() from N filter()/size()
call sites duplicates the expression tree N times — see verify
SKILL.md). No shuffle anywhere; the gates compose with ``Model.pipe``.
Ratios round to 4 decimals BEFORE threshold compares so pass flags can't
flip between engines on a ulp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the 8 "required words" of the Gopher stopword rule (Rae et al. A1.1)
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def round4_ratio_sql(num: str, den: str) -> str:
    """``round(num/den, 4)`` computed HALF-UP in EXACT integer arithmetic:
    ``(100000*num + 5*den) DIV (10*den) / 10^4``. A float round() hits a
    TRUE decimal tie whenever the reduced denominator divides 10^5 (e.g.
    1/32 = 0.03125) and Spark (half-up) and DuckDB (half-even) then
    disagree on the last digit — the char_entropy sf0.1 bug. ``num`` and
    ``den`` must be non-negative integer SQL expressions; the same
    formula with ``//`` is the DuckDB twin."""
    return (
        f"(CAST((100000L * ({num}) + 5L * ({den})) DIV (10L * ({den})) "
        "AS DOUBLE) / CAST(10000.0 AS DOUBLE))"
    )


def fround_sql(expr: str, dp: int) -> str:
    """SQL twin of :func:`hashquery_spark.ops.dedup.fround` — half-up
    round via pure-IEEE ``floor(x*10^dp + 0.5)/10^dp``; parses to the
    same double ops in Spark SQL and DuckDB (``1e{dp}``/``5e-1`` are
    DOUBLE literals in both; a bare ``0.5`` would be DECIMAL)."""
    return f"(floor(({expr}) * 1e{dp} + 5e-1) / 1e{dp})"


def _ws_strip(text):
    # trim() strips SPACES only in both engines — a leading/trailing
    # newline or tab would survive and split() would emit a phantom empty
    # token (caught by the python-reference hypothesis property)
    return F.regexp_replace(text, r"^\s+|\s+$", "")


def _raw_tokens(text):
    """Whitespace tokens of the RAW text (empty array for blank docs) —
    unlike dedup.tokens(), punctuation stays attached (the Gopher rules
    measure words as typed, e.g. 'words containing an alphabetic char')."""
    stripped = _ws_strip(text)
    return F.when(
        F.length(stripped) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(stripped, r"\s+"))


def gopher_rules(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Per-document Gopher quality-rule columns + overall ``passes`` flag.

    Rules (Rae et al. 2022, Appendix A1.1), each also emitted as its own
    measurement so thresholds can be re-tuned downstream without a rescan:

    * word count in [min_words, max_words]
    * mean word length in [3, 10] characters
    * '#'-symbol-to-word and ellipsis-to-word ratio < 0.1
    * < 90% of lines start with a bullet ('-', '*', '•')
    * < 30% of lines end with an ellipsis
    * > 80% of words contain at least one alphabetic character
    * at least 2 of the 8 required English stopwords appear
    """
    base = df.select(
        F.col(id_col),
        _raw_tokens(F.col(text_col)).alias("__toks__"),
        F.split(F.col(text_col), "\n").alias("__lines__"),
        F.col(text_col).alias("__t__"),
    ).withColumn("__ltoks__", F.transform(F.col("__toks__"), F.lower))
    n_words = F.size(F.col("__toks__"))
    sum_word_len = F.aggregate(
        F.col("__toks__"), F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    n_hash = F.length(F.col("__t__")) - F.length(F.regexp_replace("__t__", "#", ""))
    # chars removed by stripping '...' — exactly 3× the ellipsis count
    ellipsis_chars = F.length(F.col("__t__")) - F.length(
        F.regexp_replace("__t__", r"\.\.\.", "")
    )
    bullet_lines = F.size(
        F.filter(
            F.col("__lines__"),
            lambda x: F.ltrim(x).rlike(r"^[-*•]"),
        )
    )
    ellipsis_lines = F.size(
        F.filter(F.col("__lines__"), lambda x: F.rtrim(x).endswith("..."))
    )
    alpha_words = F.size(
        F.filter(F.col("__toks__"), lambda x: x.rlike("[A-Za-z]"))
    )
    stop_hits = F.lit(0)
    for w in GOPHER_STOPWORDS:
        stop_hits = stop_hits + F.array_contains(F.col("__ltoks__"), w).cast("int")

    counts = base.select(
        F.col(id_col),
        n_words.alias("n_words"),
        sum_word_len.alias("__swl__"),
        n_hash.alias("__nh__"),
        ellipsis_chars.alias("__ne3__"),
        F.greatest(F.size(F.col("__lines__")), F.lit(1)).alias("__nl__"),
        bullet_lines.alias("__bl__"),
        ellipsis_lines.alias("__el__"),
        alpha_words.alias("__aw__"),
        stop_hits.alias("stop_hits"),
    )
    # every ratio rounds HALF-UP in exact integer arithmetic (see
    # round4_ratio_sql); symbol_ratio = (n_hash + n_ellipsis/3) / nw
    # = (3*n_hash + ellipsis_chars) / (3*nw), still an integer ratio
    metrics = counts.selectExpr(
        f"`{id_col}`",
        "n_words",
        f"{round4_ratio_sql('__swl__', 'greatest(n_words, 1)')} AS mean_word_len",
        f"{round4_ratio_sql('3L * __nh__ + __ne3__', '3L * greatest(n_words, 1)')}"
        " AS symbol_ratio",
        f"{round4_ratio_sql('__bl__', '__nl__')} AS bullet_line_ratio",
        f"{round4_ratio_sql('__el__', '__nl__')} AS ellipsis_line_ratio",
        f"{round4_ratio_sql('__aw__', 'greatest(n_words, 1)')} AS alpha_word_ratio",
        "stop_hits",
    )
    passes = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= 3)
        & (F.col("mean_word_len") <= 10)
        & (F.col("symbol_ratio") < 0.1)
        & (F.col("bullet_line_ratio") < 0.9)
        & (F.col("ellipsis_line_ratio") < 0.3)
        & (F.col("alpha_word_ratio") > 0.8)
        & (F.col("stop_hits") >= min_stop_hits)
    )
    return metrics.withColumn("passes", passes)


def c4_filters(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """C4-style page cleaning (Raffel et al. 2020 §2.2) in one pass:

    * keep only lines ending in terminal punctuation (., !, ?, ")
      that contain >= 5 words and no 'javascript'
    * page flags: 'lorem ipsum' anywhere, a curly brace anywhere,
      fewer than 3 kept lines (the sentence-count proxy)

    Output: (id, clean_text, n_lines_kept, n_lines_total,
    has_lorem_ipsum, has_brace, passes). clean_text is the kept lines
    re-joined (empty string when nothing survives).
    """
    base = df.select(
        F.col(id_col),
        F.split(F.col(text_col), "\n").alias("__lines__"),
        F.lower(F.col(text_col)).alias("__lower__"),
    )
    kept = F.filter(
        F.col("__lines__"),
        lambda x: F.rtrim(x).rlike(r'[.!?"]$')
        & (F.size(_raw_tokens(x)) >= 5)
        & ~F.lower(x).contains("javascript"),
    )
    out = base.select(
        F.col(id_col),
        kept.alias("__kept__"),
        F.size(F.col("__lines__")).alias("n_lines_total"),
        F.col("__lower__").contains("lorem ipsum").alias("has_lorem_ipsum"),
        F.col("__lower__").contains("{").alias("has_brace"),
    ).select(
        F.col(id_col),
        F.coalesce(F.array_join(F.col("__kept__"), "\n"), F.lit("")).alias(
            "clean_text"
        ),
        F.size(F.col("__kept__")).alias("n_lines_kept"),
        F.col("n_lines_total"),
        F.col("has_lorem_ipsum"),
        F.col("has_brace"),
    )
    passes = (
        (F.col("n_lines_kept") >= 3)
        & ~F.col("has_lorem_ipsum")
        & ~F.col("has_brace")
    )
    return out.withColumn("passes", passes)
