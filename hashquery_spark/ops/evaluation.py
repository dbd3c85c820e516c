"""Classifier-evaluation operators: distributed ROC-AUC and calibration
bins — the metrics a quality-classifier gate (ops/classifier.py, the
fastText-style curation filter) is tuned and monitored with.

Net-new beyond the reference (its closest surface is the aggregate
engine); the published grounding is the standard Mann-Whitney
rank-statistic identity for AUC and reliability-diagram binning
(Guo et al. 2017) for calibration.

Scale design mirrors grid_percentiles: nothing ever buffers per-row data
on one reducer. AUC reduces the corpus to a ``(score) -> (n_pos, n_neg)``
HISTOGRAM first (map-side combined; bounded by score-grid cardinality,
not row count), computes tie-averaged ranks with one running-sum window
over histogram rows, and finishes with a tiny aggregate. All rank
arithmetic is EXACT integers (doubled to avoid half-ranks), so the AUC
is an integer ratio — oracle-checkable bit-for-bit via the tie-proof
floor round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import fround


def binary_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    by=None,
) -> DataFrame:
    """ROC-AUC of ``score_col`` against binary ``label_col`` (truthy =
    positive), optionally per ``by`` group. Output: group cols +
    ``n_pos, n_neg, auc`` (auc NULL when a class is absent).

    Identity: AUC = (R_pos − n_pos(n_pos+1)/2) / (n_pos·n_neg) where
    R_pos is the positives' rank sum under AVERAGE ranks for ties — the
    Mann-Whitney U normalization, which equals P(score_pos > score_neg)
    + ½·P(tie).

    Exactness: ranks are kept as 2× integers (average rank of a tie run
    of length c starting after ``prev`` items is ``prev + (c+1)/2``;
    doubled: ``2·prev + c + 1``), so
    ``auc = (2·R_pos − n_pos·(n_pos+1)·?) ...`` — concretely
    ``num = Σ_ties n_pos_tie·(2·prev + c + 1) − n_pos·(n_pos+1)`` and
    ``den = 2·n_pos·n_neg`` are exact DECIMAL(38,0) integers (2R is O(n²)
    — int64-unsafe past ~2e9 rows); the emitted double is the tie-proof
    floor round of num/den at 6 dp after correctly-rounded
    DECIMAL→DOUBLE casts, identical in both engines.
    """
    by = [by] if isinstance(by, str) else list(by or [])
    s, lab = F.col(score_col), F.col(label_col)
    pos = F.when(lab.cast("boolean"), 1).otherwise(0)
    hist = (
        df.where(s.isNotNull() & lab.isNotNull())
        .groupBy(*by, s.alias("__s__"))
        .agg(
            F.sum(pos).cast("long").alias("__p__"),
            F.sum(1 - pos).cast("long").alias("__q__"),
        )
    )
    # two-phase distributed prefix sum over the score histogram, NOT one
    # per-group ordered window (single-task sort on near-continuous
    # scores — the r5 spearman sf1 stall class)
    from .dedup import bucketed_running_sums

    hist = bucketed_running_sums(
        hist.withColumn("__cq__", F.col("__p__") + F.col("__q__")),
        by,
        "__s__",
        ["__cq__"],
    ).select(*by, "__p__", "__q__", F.col("__cum0__").alias("__cum__"))
    # tie run of size c = __p__+__q__ ends at __cum__; average rank
    # doubled = 2*(cum-c) + c + 1 = 2*cum - c + 1
    c = F.col("__p__") + F.col("__q__")
    two_rank = 2 * F.col("__cum__") - c + 1
    # DECIMAL(38,0) accumulators: 2R is O(n²) — int64 overflows past
    # ~2e9 rows, a 100 TB corpus is 1000x that. The CAST must sit on an
    # OPERAND, not the product: p·two_rank computed in LONG first would
    # overflow at exactly the scale the decimal protects against.
    # DECIMAL→DOUBLE casts are correctly rounded in both engines, so the
    # final fround still agrees.
    agg = hist.groupBy(*by).agg(
        F.sum("__p__").alias("n_pos"),
        F.sum("__q__").alias("n_neg"),
        F.sum(F.col("__p__").cast("decimal(38,0)") * two_rank).alias("__2R__"),
    )
    np_d = F.col("n_pos").cast("decimal(19,0)")
    num = F.col("__2R__") - np_d * (np_d + 1)  # exact DECIMAL(38,0)
    # denominator in DOUBLE with a fixed op order (2·np·nn): identical
    # IEEE products in both engines even past 2^53, where a decimal-exact
    # product cast to double could round differently than stepwise doubles
    den = (
        F.lit(2.0)
        * F.col("n_pos").cast("double")
        * F.col("n_neg").cast("double")
    )
    return agg.select(
        *by,
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            fround(num.cast("double") / den, 6),
        ).alias("auc"),
    )


def average_precision(
    df: DataFrame,
    score_col: str,
    label_col: str,
    by=None,
) -> DataFrame:
    """Average precision (the PR-AUC summary, sklearn's step-wise
    definition) of ``score_col`` against binary ``label_col``, optionally
    per ``by`` group — the class-imbalance-robust companion to
    :func:`binary_auc`. Output: group cols + ``n_pos, n_neg,
    average_precision`` (NULL when no positives).

    Definition: thresholds at DISTINCT scores descending;
    AP = Σ_blocks (ΔTP/n_pos)·P_block with P = TP/(TP+FP) at the block —
    exactly sklearn's ``average_precision_score`` (which also operates
    on distinct-score blocks, so tie handling matches).

    Scale/exactness: the corpus reduces to a (score)→(n_pos, n_neg)
    histogram first (map-side combined, the binary_auc shape), one
    descending running-sum window over histogram rows builds TP/FP, and
    each block's term ΔTP·TP/(n_pos·(TP+FP)) — an exact integer ratio
    in DECIMAL(38) (int64-unsafe past ~2e9 rows) — is snapped to a 1e-9
    BIGINT grid via correctly-rounded casts + identical IEEE ops, so
    per-group sums are partition-order-exact and the oracle matches
    bit-for-bit.
    """
    by = [by] if isinstance(by, str) else list(by or [])
    s, lab = F.col(score_col), F.col(label_col)
    pos = F.when(lab.cast("boolean"), 1).otherwise(0)
    hist = (
        df.where(s.isNotNull() & lab.isNotNull())
        .groupBy(*by, s.alias("__s__"))
        .agg(
            F.sum(pos).cast("long").alias("__p__"),
            F.sum(1 - pos).cast("long").alias("__q__"),
        )
    )
    # descending cumsum = ascending two-phase prefix sum over the NEGATED
    # score (the r5 spearman sf1 stall class: never one per-group ordered
    # window over a near-continuous score histogram); n_pos totals via a
    # bounded groupBy + broadcast join-back instead of a whole-group window
    from .dedup import bucketed_running_sums, null_safe_join

    cumf = bucketed_running_sums(
        hist.withColumn("__ns__", -F.col("__s__")).withColumn(
            "__cq__", F.col("__p__") + F.col("__q__")
        ),
        by,
        "__ns__",
        ["__p__", "__cq__"],
    )
    totals = hist.groupBy(*by).agg(F.sum("__p__").alias("__npos__"))
    hist = null_safe_join(cumf, totals, by, broadcast=True).select(
        *by,
        "__p__",
        "__q__",
        F.col("__cum0__").alias("__tp__"),
        F.col("__cum1__").alias("__cum__"),
        "__npos__",
    )
    num = F.col("__p__").cast("decimal(38,0)") * F.col("__tp__")
    den = F.col("__npos__").cast("decimal(38,0)") * F.col("__cum__")
    term = F.floor(
        num.cast("double") / den.cast("double") * F.lit(1e9)
    ).cast("long")
    agg = hist.groupBy(*by).agg(
        F.max("__npos__").alias("n_pos"),
        F.sum("__q__").alias("n_neg"),
        F.sum(F.when(F.col("__p__") > 0, term).otherwise(F.lit(0))).alias("__ap__"),
    )
    return agg.select(
        *by,
        "n_pos",
        "n_neg",
        F.when(
            F.col("n_pos") > 0, F.col("__ap__") / F.lit(1e9)
        ).alias("average_precision"),
    )


def roc_points(
    df: DataFrame,
    score_col: str,
    label_col: str,
    by=None,
) -> DataFrame:
    """The full ROC curve — one row per DISTINCT score threshold
    (classifier predicts positive when ``score >= threshold``),
    optionally per ``by`` group: ``threshold, tp, fp, fn, tn, tpr, fpr,
    precision``. The curve behind :func:`binary_auc`'s scalar — what a
    quality-classifier gate is actually TUNED with ("which threshold
    buys 95% recall at acceptable yield").

    Scale/exactness: the corpus reduces to the (score)→(n_pos, n_neg)
    histogram (map-side combined); TP/FP at every threshold are one
    DESCENDING two-phase prefix sum over the histogram (negated-score
    :func:`~hashquery_spark.ops.dedup.bucketed_running_sums` — never a
    per-group ordered window, the r5 near-continuous-histogram stall
    class); class totals attach via a bounded broadcast join-back. All
    counts are exact integers; every rate is the tie-proof 4-dp integer
    ratio, so the oracle matches bit-for-bit."""
    from .dedup import bucketed_running_sums, null_safe_join, round4_ratio

    by = [by] if isinstance(by, str) else list(by or [])
    s, lab = F.col(score_col), F.col(label_col)
    pos = F.when(lab.cast("boolean"), 1).otherwise(0)
    hist = (
        df.where(s.isNotNull() & lab.isNotNull())
        .groupBy(*by, s.cast("double").alias("__s__"))
        .agg(
            F.sum(pos).cast("long").alias("__p__"),
            F.sum(1 - pos).cast("long").alias("__q__"),
        )
    )
    cumf = bucketed_running_sums(
        hist.withColumn("__ns__", -F.col("__s__")),
        by,
        "__ns__",
        ["__p__", "__q__"],
    )
    totals = hist.groupBy(*by).agg(
        # NOT "__P__"/"__Q__": Spark resolves case-insensitively by
        # default, so they would collide with the histogram's __p__/__q__
        F.sum("__p__").alias("__ptot__"), F.sum("__q__").alias("__qtot__")
    )
    j = null_safe_join(cumf, totals, by, broadcast=True)
    tp, fp = F.col("__cum0__"), F.col("__cum1__")
    fn, tn = F.col("__ptot__") - tp, F.col("__qtot__") - fp
    one = F.lit(1)
    return j.select(
        *by,
        F.col("__s__").alias("threshold"),
        tp.alias("tp"),
        fp.alias("fp"),
        fn.alias("fn"),
        tn.alias("tn"),
        round4_ratio(tp, F.greatest(F.col("__ptot__"), one)).alias("tpr"),
        round4_ratio(fp, F.greatest(F.col("__qtot__"), one)).alias("fpr"),
        round4_ratio(tp, F.greatest(tp + fp, one)).alias("precision"),
    )


def slice_report(
    df: DataFrame,
    label_col: str,
    pred_col: str,
    slice_cols,
    z: float = 1.96,
) -> DataFrame:
    """Per-slice evaluation — accuracy with Wilson uncertainty bands
    for every value combination of ``slice_cols`` (the "is the model
    worse on short docs / rare languages / one source" report; the
    sliced-eval companion to the global
    :func:`classification_report`, with the :func:`win_rate` Wilson
    machinery so a 3-correct-of-3 slice doesn't outrank a 290-of-300
    one). Output per slice: ``n, n_correct, accuracy, wilson_lo,
    wilson_hi``.

    Scale: ONE groupBy over the slice keys, map-side combined; no
    joins, no windows. Exactness: accuracy is the tie-proof integer
    ratio; Wilson bounds are fixed-order IEEE chains over exact counts
    snapped at 6 dp (the win_rate contract)."""
    from .dedup import fround, round4_ratio

    slice_cols = (
        [slice_cols] if isinstance(slice_cols, str) else list(slice_cols)
    )
    lab, pred = F.col(label_col), F.col(pred_col)
    base = df.where(lab.isNotNull() & pred.isNotNull())
    g = base.groupBy(*slice_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count(F.when(lab == pred, 1)).cast("long").alias("n_correct"),
    )
    n = F.col("n").cast("double")
    p = F.col("n_correct").cast("double") / n
    zz = F.lit(float(z) * float(z))
    center = p + zz / (F.lit(2.0) * n)
    margin = F.lit(float(z)) * F.sqrt(
        (p * (F.lit(1.0) - p)) / n + zz / (F.lit(4.0) * (n * n))
    )
    denom = F.lit(1.0) + zz / n
    return g.select(
        *slice_cols,
        "n",
        "n_correct",
        round4_ratio(F.col("n_correct"), F.col("n")).alias("accuracy"),
        fround((center - margin) / denom, 6).alias("wilson_lo"),
        fround((center + margin) / denom, 6).alias("wilson_hi"),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """Reliability-diagram bins over ``[lo, hi)``: per bin the example
    count, positive fraction, and mean score — plus the total expected
    calibration error (ECE, Guo et al. 2017) repeated on every row.
    Scores outside the range clamp to the edge bins (every labelled row
    counts); empty bins are absent.

    Scale: ONE narrow binning pass + one groupBy(bin) (map-side
    combined); everything after runs on ≤ bins rows. Exactness:
    ``frac_pos`` is an integer ratio (tie-proof floor round); mean score
    and ECE stay exact by scaling scores to 1e-6-grid BIGINTs before
    summing (double-sum order never matters), then floor-rounding the
    final ratios.
    """
    if bins < 1:
        raise ValueError("bins must be >= 1")
    lo, hi = float(lo), float(hi)
    if not hi > lo:
        raise ValueError("require hi > lo")
    width = (hi - lo) / bins
    s, lab = F.col(score_col), F.col(label_col)
    pos = F.when(lab.cast("boolean"), 1).otherwise(0)
    binned = df.where(s.isNotNull() & lab.isNotNull()).select(
        F.least(
            F.lit(bins - 1),
            F.greatest(
                F.lit(0),
                F.floor((s.cast("double") - F.lit(lo)) / F.lit(width)).cast("int"),
            ),
        ).alias("bin"),
        pos.alias("__pos__"),
        # 1e-6-grid micro-units: exact integer sums, order-independent
        F.floor(s.cast("double") * F.lit(1e6) + F.lit(0.5)).alias("__s6__"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__pos__").cast("long").alias("__np__"),
        # DECIMAL(38,0): micro-unit score sums are ~1e6x row count —
        # int64-unsafe at corpus scale
        F.sum(F.col("__s6__").cast("decimal(38,0)")).alias("__ss__"),
    )
    everything = Window.partitionBy()
    total_n = F.sum("n").over(everything)
    frac = F.col("__np__").cast("double") / F.col("n").cast("double")
    mean_s = F.col("__ss__").cast("double") / (F.col("n") * F.lit(1e6))
    # per-bin |frac - mean| in exact 1e-6 units scaled by n:
    # |np*1e6 - ss| / 1e6  (both sides integer-exact)
    gap_units = F.abs(
        F.col("__np__").cast("decimal(38,0)") * 1000000 - F.col("__ss__")
    )
    return per_bin.select(
        "bin",
        "n",
        fround(frac, 6).alias("frac_pos"),
        fround(mean_s, 6).alias("mean_score"),
        fround(
            (
                F.sum(gap_units).over(everything).cast("double")
                / total_n.cast("double")
            )
            / F.lit(1e6),
            6,
        ).alias("ece"),
    ).orderBy("bin")


def pass_at_k(
    df: DataFrame,
    problem_col: str,
    correct_col: str,
    ks=(1, 5),
    by=None,
) -> DataFrame:
    """Unbiased pass@k (Chen et al. 2021, "Evaluating Large Language
    Models Trained on Code", eq. 1) over per-sample rows: each row is one
    attempt at ``problem_col`` with boolean ``correct_col``. Output: the
    ``by`` group columns (if any) + ``n_problems`` + one ``pass_at_{k}``
    column per k — the mean over problems of
    ``1 − C(n−c, k)/C(n, k)`` (n samples, c correct; 1 when n−c < k,
    0/undefined-problem rows with n < k are kept, estimator clamps k at n
    per the reference implementation's ``k > n`` guard: problems with
    n < k use pass@n semantics via the same product form, which
    telescopes to 1 − prod over the available terms).

    Scale: one groupBy(problem) (map-side combined) then one tiny
    groupBy(by). Exactness: the estimator is computed as a FIXED
    left-to-right product of IEEE double quotients
    ``prod_j (n−c−j)/(n−j)`` (each step correctly rounded — identical in
    any engine), snapped to a 1e-6 BIGINT grid per problem so the group
    mean is an exact integer ratio (floor-form round at 6 dp).
    """
    by = [by] if isinstance(by, str) else list(by or [])
    ks = sorted(set(int(k) for k in ks))
    if not ks or ks[0] < 1:
        raise ValueError("ks must be positive integers")
    lab = F.col(correct_col)
    per_problem = df.groupBy(problem_col, *by).agg(
        F.count(F.lit(1)).cast("long").alias("__n__"),
        F.sum(F.when(lab.cast("boolean"), 1).otherwise(0))
        .cast("long")
        .alias("__c__"),
    )

    def est6(k: int):
        # fail-prob product, unrolled: fixed left-to-right IEEE order.
        # term j exists only while j < k AND j <= n-c-1 AND j <= n-1;
        # guard each factor with CASE so short problems telescope.
        prod = "CAST(1.0 AS DOUBLE)"
        for j in range(k):
            prod = (
                f"({prod}) * (CASE WHEN __n__ - {j} > 0 AND __n__ - __c__ - {j} > 0 "
                f"THEN CAST(__n__ - __c__ - {j} AS DOUBLE) / CAST(__n__ - {j} AS DOUBLE) "
                f"ELSE 1.0 END)"
            )
        fail = (
            f"CASE WHEN __c__ = 0 THEN 1.0 "
            f"WHEN __n__ - __c__ < {k} THEN 0.0 ELSE {prod} END"
        )
        return F.expr(
            f"CAST(floor((1.0 - ({fail})) * 1e6 + 5e-1) AS BIGINT)"
        ).alias(f"__p{k}__")

    snapped = per_problem.select(*by, *[est6(k) for k in ks])
    out = snapped.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_problems"),
        *[F.sum(f"__p{k}__").alias(f"__s{k}__") for k in ks],
    )
    # exact integer-ratio mean at 6 dp: num = Σp6, den = n_problems·1e6
    cols = [*by, "n_problems"]
    for k in ks:
        num, den = F.col(f"__s{k}__"), F.col("n_problems") * F.lit(1000000)
        cols.append(
            (
                F.floor(
                    (F.lit(1e7) * num + F.lit(5.0) * den) / (F.lit(10.0) * den)
                )
                / F.lit(1e6)
            ).alias(f"pass_at_{k}")
        )
    return out.select(*cols)


def translation_metrics(
    pairs: DataFrame,
    cand_col: str,
    ref_col: str,
    id_col: str,
    max_n: int = 2,
) -> DataFrame:
    """Per (candidate, reference) row: clipped word n-gram precision
    ``p{n}`` and recall ``r{n}`` for n = 1..max_n (BLEU / ROUGE-N
    numerators, Papineni et al. 2002 / Lin 2004), token lengths, and an
    unsmoothed corpus-convention ``bleu`` = BP · (Π p_n)^(1/max_n)
    (NULL when any p_n is NULL; 0 when any p_n is 0; max_n must be 1, 2
    or 4 so the root is a chain of IEEE-exact sqrts).

    Plan shape (r6 rewrite): the computation is PAIR-CONFINED — every
    gram count compares only within its own row — so there is NO reason
    to shuffle a tagged gram explosion (the r5 design moved ~400 gram
    rows per pair through groupBy(id, gram): correct, uniform keys, but
    94 s at sf10 where this form runs in a few seconds). One Arrow-
    batched ``mapInPandas`` pass counts clipped matches per row with
    hash maps: zero shuffles, zero joins, output row count = input row
    count. This is the rouge_l precedent: a per-row pure function whose
    state never crosses rows is the one place the pandas path
    structurally beats any exchange-based plan.

    Exactness: every p/r is an exact integer ratio (floor-form 4 dp,
    identical IEEE ops in python floats); ``bleu`` multiplies
    grid-snapped ratios, takes sqrt (correctly rounded per IEEE-754),
    applies BP = exp(1 − ref_len/cand_len) with the exponent snapped to
    a 1e-4 grid, and floor-rounds at 4 dp. Tokenization replicates the
    engine's ``dedup.tokens`` exactly, including the ``['']`` result on
    empty-but-non-NULL text (one empty unigram) and the no-grams result
    on NULL text.
    """
    if max_n not in (1, 2, 4):
        raise ValueError("max_n must be 1, 2, or 4 (IEEE-exact sqrt root)")
    from .dedup import ensure_parallelism

    id_type = dict(
        (f.name, f.dataType.simpleString()) for f in pairs.schema.fields
    )[id_col]
    pr_cols = ", ".join(
        f"p{n} double, r{n} double" for n in range(1, max_n + 1)
    )
    schema = (
        f"`{id_col}` {id_type}, cand_len long, ref_len long, {pr_cols}, "
        "bleu double"
    )
    n_sqrts = max_n.bit_length() - 1  # 1->0, 2->1, 4->2

    def score_batches(batches):
        import math
        import re
        from collections import Counter

        import pandas as pd

        rx = re.compile(r"[^a-z0-9]+")
        ws = re.compile(r"\s+")

        def toks(t):
            # dedup.tokens parity: split('\s+') of the trimmed
            # normalization — '' yields [''] (ONE empty token), NULL
            # yields no grams at all
            if t is None or (isinstance(t, float) and t != t):
                return None
            return ws.split(rx.sub(" ", t.lower()).strip())

        def r4(m, t):
            # exact INTEGER arithmetic, matching round4_ratio bit-for-bit
            # (the float form was provably exact for bounded gram counts
            # but violated the integer-ratio rule — ADVICE r6)
            return (100000 * m + 5 * t) // (10 * t) / 10000.0

        def score(cand, ref):
            ct, rt = toks(cand), toks(ref)
            out = []
            cand_len = ref_len = 0
            ps = []
            for n in range(1, max_n + 1):
                cg = (
                    Counter(
                        tuple(ct[i : i + n]) for i in range(len(ct) - n + 1)
                    )
                    if ct is not None
                    else Counter()
                )
                rg = (
                    Counter(
                        tuple(rt[i : i + n]) for i in range(len(rt) - n + 1)
                    )
                    if rt is not None
                    else Counter()
                )
                tot_c = sum(cg.values())
                tot_r = sum(rg.values())
                m = sum(min(c, rg.get(g, 0)) for g, c in cg.items())
                if n == 1:
                    cand_len, ref_len = tot_c, tot_r
                p = r4(m, tot_c) if tot_c > 0 else None
                r = r4(m, tot_r) if tot_r > 0 else None
                ps.append(p)
                out += [p, r]
            if cand_len > 0 and all(p is not None for p in ps):
                geo = ps[0]
                for p in ps[1:]:
                    geo = geo * p
                for _ in range(n_sqrts):
                    geo = math.sqrt(geo)
                if cand_len >= ref_len:
                    bp = 1.0
                else:
                    e = math.floor(
                        (1.0 - ref_len / cand_len) * 10000.0 + 0.5
                    ) / 10000.0
                    bp = math.exp(e)
                bleu = math.floor(bp * geo * 10000.0 + 0.5) / 10000.0
            else:
                bleu = None
            return [cand_len, ref_len] + out + [bleu]

        cols = (
            [id_col, "cand_len", "ref_len"]
            + [c for n in range(1, max_n + 1) for c in (f"p{n}", f"r{n}")]
            + ["bleu"]
        )
        for pdf in batches:
            recs = [
                [pid] + score(cand, ref)
                for pid, cand, ref in zip(
                    pdf[id_col], pdf["__cand__"], pdf["__ref__"]
                )
            ]
            yield pd.DataFrame(recs, columns=cols)

    return ensure_parallelism(
        pairs.select(
            F.col(id_col),
            F.col(cand_col).alias("__cand__"),
            F.col(ref_col).alias("__ref__"),
        )
    ).mapInPandas(score_batches, schema)


def cohens_kappa(
    df: DataFrame,
    col_a: str,
    col_b: str,
    by=None,
) -> DataFrame:
    """Cohen's kappa inter-rater agreement between two label columns
    (the LLM-judge-agreement statistic), optionally per ``by`` group.
    Output: group cols + ``n, po, pe, kappa`` (NULL kappa when pe = 1,
    i.e. both raters constant).

    Exactness: with integer marginal counts a_k, b_k and agreement count
    A over n pairs, ``kappa = (n·A − Σ a_k b_k) / (n² − Σ a_k b_k)`` —
    a pure integer ratio; po = A/n and pe = Σ a_k b_k / n² likewise.
    All three round via the tie-proof floor form, so the oracle matches
    bit-for-bit. DECIMAL(38,0) accumulators: n² and Σ a_k b_k are
    int64-unsafe past ~3e9 pairs.

    Scale: one narrow agg for (n, A), one groupBy per rater for the
    marginals (all map-side combined, bounded by label cardinality),
    and a broadcast join of the two marginal frames — no shuffle of the
    pair rows beyond the partial aggregates.
    """
    from .dedup import round4_ratio

    by = [by] if isinstance(by, str) else list(by or [])
    a, b = F.col(col_a), F.col(col_b)
    base = df.where(a.isNotNull() & b.isNotNull()).select(
        *by, a.cast("string").alias("__a__"), b.cast("string").alias("__b__")
    )
    totals = base.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("__a__") == F.col("__b__"), 1)).alias("__agree__"),
    )
    ma = base.groupBy(*by, F.col("__a__").alias("__lab__")).agg(
        F.count(F.lit(1)).alias("__ca__")
    )
    mb = base.groupBy(*by, F.col("__b__").alias("__lab__")).agg(
        F.count(F.lit(1)).alias("__cb__")
    )
    from .dedup import null_safe_join

    join_keys = by + ["__lab__"]
    # marginal/product frames are bounded (groups × labels / one row per
    # group) — broadcast hints keep the null-safe helper-key joins off
    # the SMJ path (helper keys are invisible to the size estimator)
    prods = (
        null_safe_join(
            ma, mb, join_keys, never_null=["__lab__"], broadcast=True
        )
        .groupBy(*by)
        .agg(
            F.sum(
                F.col("__ca__").cast("decimal(38,0)") * F.col("__cb__")
            ).alias("__sab__")
        )
    )
    # LEFT join: a group where the raters use fully disjoint label sets
    # produces no prods row at all — it must still report pe=0, kappa=po
    # (the coalesce below), not vanish from the output.
    j = null_safe_join(totals, prods, by, how="left", broadcast=True)
    n_d = F.col("n").cast("decimal(38,0)")
    sab = F.coalesce(F.col("__sab__"), F.lit(0).cast("decimal(38,0)"))
    num = n_d * F.col("__agree__") - sab
    den = n_d * n_d - sab
    return j.select(
        *by,
        "n",
        round4_ratio(F.col("__agree__"), F.col("n")).alias("po"),
        # pe = Σab/n² — exact integer ratio, 4dp floor form
        (
            F.floor(
                (F.lit(100000.0) * sab.cast("double") + F.lit(5.0) * (n_d * n_d).cast("double"))
                / (F.lit(10.0) * (n_d * n_d).cast("double"))
            )
            / F.lit(10000.0)
        ).alias("pe"),
        F.when(
            den != 0,
            F.floor(
                (F.lit(100000.0) * num.cast("double") + F.lit(5.0) * den.cast("double"))
                / (F.lit(10.0) * den.cast("double"))
            )
            / F.lit(10000.0),
        ).alias("kappa"),
    )


def fleiss_kappa(
    df: DataFrame,
    subject_col: str,
    label_col: str,
    raters: int,
) -> DataFrame:
    """Fleiss' kappa multi-rater agreement over a long-form
    ``(subject, label)`` ratings table — the >2-annotator generalization
    of :func:`cohens_kappa` (Fleiss 1971). Each row is one rater's label
    for one subject; only subjects rated by EXACTLY ``raters`` raters
    enter the statistic (the fixed-r requirement of the formula —
    partially-rated subjects are dropped, standard practice).

    Output (one row): ``n_subjects, raters, po, pe, kappa`` (kappa NULL
    when pe = 1, i.e. every rating identical).

    Exactness: with per-(subject,label) integer counts n_ik, A = N·r,
    S2 = Σ n_ik², T_k = Σ_i n_ik, SS = Σ T_k²:

        po = (S2 − A) / (A·(r−1))        pe = SS / A²
        kappa = (A·(S2 − A) − (r−1)·SS) / ((r−1)·(A² − SS))

    — all pure integer ratios in DECIMAL(38,0) accumulators, rounded via
    the tie-proof floor form, so the DuckDB oracle matches bit-for-bit.
    (A² and SS are int64-unsafe past ~3e9 total ratings — same caveat as
    cohens_kappa.)

    Scale: one groupBy(subject,label) with map-side combine (the only
    shuffle of rating rows), a subject-partitioned window for the per-
    subject rater totals, then a groupBy(label) whose output is bounded
    by label cardinality and a final tiny aggregate. No per-subject data
    ever buffers on one reducer beyond its own label counts.
    """
    from .dedup import round4_ratio

    r = int(raters)
    if r < 2:
        raise ValueError("fleiss_kappa requires raters >= 2")
    counts = (
        df.where(F.col(subject_col).isNotNull() & F.col(label_col).isNotNull())
        .groupBy(
            F.col(subject_col).alias("__subj__"),
            F.col(label_col).cast("string").alias("__lab__"),
        )
        .agg(F.count(F.lit(1)).alias("__c__"))
    )
    w = Window.partitionBy("__subj__")
    kept = counts.withColumn("__ri__", F.sum("__c__").over(w)).where(
        F.col("__ri__") == r
    )
    per_label = kept.groupBy("__lab__").agg(
        F.sum("__c__").cast("decimal(38,0)").alias("__tk__"),
        F.sum(F.col("__c__") * F.col("__c__")).cast("decimal(38,0)").alias("__s2k__"),
    )
    g = per_label.groupBy().agg(
        F.sum("__tk__").alias("__a__"),
        F.sum(F.col("__tk__") * F.col("__tk__")).alias("__ss__"),
        F.sum("__s2k__").alias("__s2__"),
    )
    a = F.col("__a__")
    ss = F.col("__ss__")
    s2 = F.col("__s2__")
    d = F.lit(r - 1).cast("decimal(38,0)")
    kap_num = a * (s2 - a) - d * ss
    kap_den = d * (a * a - ss)
    return g.select(
        (a / F.lit(r)).cast("long").alias("n_subjects"),
        F.lit(r).alias("raters"),
        round4_ratio(
            (s2 - a).cast("double"), (a * d).cast("double")
        ).alias("po"),
        round4_ratio(ss.cast("double"), (a * a).cast("double")).alias("pe"),
        F.when(
            kap_den != 0,
            round4_ratio(kap_num.cast("double"), kap_den.cast("double")),
        ).alias("kappa"),
    )


def fairness_report(
    df: DataFrame,
    group_col: str,
    label_col: str,
    pred_col: str,
) -> DataFrame:
    """Per-group classification fairness audit — the bias check run on
    every quality/safety classifier before it gates a corpus. One row
    per group: ``n, base_rate`` (P(label)), ``pred_rate`` (P(pred) —
    demographic parity), ``tpr``/``fpr`` (equalized odds), plus the
    cross-group ``dp_gap``/``tpr_gap``/``fpr_gap`` (max − min) repeated
    on every row (the distribution_drift total-psi idiom). Groups where
    a rate's denominator is 0 have NULL for that rate and are skipped by
    the gap (max/min ignore NULLs in both engines).

    Exactness: every rate is a pure integer ratio through the tie-proof
    floor round; gaps subtract two correctly-rounded grid doubles —
    identical IEEE both engines, no further rounding site.

    Scale: ONE scan → one groupBy(group) with map-side-combined
    conditional counts (output bounded by group cardinality); the gap
    windows run over that tiny frame only.
    """
    from .dedup import round4_ratio

    lab = F.col(label_col).cast("boolean")
    prd = F.col(pred_col).cast("boolean")
    per = (
        df.where(lab.isNotNull() & prd.isNotNull())
        .groupBy(F.col(group_col).alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(lab, 1)).alias("__pos__"),
            F.count(F.when(~lab, 1)).alias("__neg__"),
            F.count(F.when(prd, 1)).alias("__ppos__"),
            F.count(F.when(lab & prd, 1)).alias("__tp__"),
            F.count(F.when(~lab & prd, 1)).alias("__fp__"),
        )
    )
    rates = per.select(
        "grp",
        "n",
        round4_ratio(F.col("__pos__"), F.col("n")).alias("base_rate"),
        round4_ratio(F.col("__ppos__"), F.col("n")).alias("pred_rate"),
        F.when(
            F.col("__pos__") > 0, round4_ratio(F.col("__tp__"), F.col("__pos__"))
        ).alias("tpr"),
        F.when(
            F.col("__neg__") > 0, round4_ratio(F.col("__fp__"), F.col("__neg__"))
        ).alias("fpr"),
    )
    everything = Window.orderBy("grp").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    gap = lambda c: (F.max(c).over(everything) - F.min(c).over(everything))  # noqa: E731
    return rates.select(
        "grp",
        "n",
        "base_rate",
        "pred_rate",
        "tpr",
        "fpr",
        gap("pred_rate").alias("dp_gap"),
        gap("tpr").alias("tpr_gap"),
        gap("fpr").alias("fpr_gap"),
    )


def rouge_l(
    pairs: DataFrame,
    cand_col: str,
    ref_col: str,
    id_col: str,
) -> DataFrame:
    """ROUGE-L (Lin 2004 §3) per (candidate, reference) row — the
    longest-common-subsequence companion to :func:`translation_metrics`'
    n-gram ROUGE-N. Output: ``(id, cand_len, ref_len, lcs_len,
    rouge_l_p, rouge_l_r, rouge_l_f)``; empty-token sides give NULL
    ratios. The F-measure reduces EXACTLY: with β=1,
    f = 2pr/(p+r) = 2·lcs/(cand_len+ref_len) — a pure integer ratio, so
    all three ratios use the tie-proof floor round.

    Python is unavoidable (LCS is a quadratic DP, not SQL-expressible:
    aggregation inside a recursive CTE is illegal — the bpe_merges
    precedent), so this is the Arrow-batched pandas UDF path:
    tokenization (same normalize-lowercase-split as ops.dedup.tokens)
    and the rolling-row DP run per batch, O(len_a·len_b) per pair, no
    shuffle — embarrassingly parallel. Rows-only driver check + a
    python-reference unit test; determinism is exact (pure integer DP).
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from .dedup import round4_ratio

    def _lcs_batch(cands, refs):  # annotation-free (pandas_udf hint trap)
        import re

        def toks(t):
            if t is None:
                return None
            return re.sub(r"[^a-z0-9]+", " ", t.lower()).split()

        out = []
        for a, b in zip(cands, refs):
            ta, tb = toks(a), toks(b)
            if ta is None or tb is None:
                out.append((None, None, None))
                continue
            if len(ta) > len(tb):  # DP over the shorter row
                ta, tb = tb, ta
                swapped = True
            else:
                swapped = False
            prev = [0] * (len(ta) + 1)
            for x in tb:
                cur = [0]
                for i, y in enumerate(ta):
                    cur.append(
                        prev[i] + 1 if x == y else max(prev[i + 1], cur[i])
                    )
                prev = cur
            la, lb = (len(tb), len(ta)) if swapped else (len(ta), len(tb))
            out.append((la, lb, prev[-1]))
        return pd.DataFrame(out, columns=["la", "lb", "lcs"])

    _lcs = pandas_udf(_lcs_batch, "struct<la: long, lb: long, lcs: long>")

    from .dedup import ensure_parallelism

    z = _lcs(F.col(cand_col), F.col(ref_col))
    # repartition first: a single-file scan feeds the quadratic DP one
    # Arrow batch on one core otherwise
    base = ensure_parallelism(pairs).select(F.col(id_col), z.alias("__z__")).select(
        id_col,
        F.col("__z__.la").alias("cand_len"),
        F.col("__z__.lb").alias("ref_len"),
        F.col("__z__.lcs").alias("lcs_len"),
    )
    return base.select(
        id_col,
        "cand_len",
        "ref_len",
        "lcs_len",
        F.when(
            F.col("cand_len") > 0,
            round4_ratio(F.col("lcs_len"), F.col("cand_len")),
        ).alias("rouge_l_p"),
        F.when(
            F.col("ref_len") > 0,
            round4_ratio(F.col("lcs_len"), F.col("ref_len")),
        ).alias("rouge_l_r"),
        F.when(
            F.col("cand_len") + F.col("ref_len") > 0,
            round4_ratio(
                F.lit(2) * F.col("lcs_len"),
                F.col("cand_len") + F.col("ref_len"),
            ),
        ).alias("rouge_l_f"),
    )


def ab_test_report(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    grid: float = 1e6,
) -> DataFrame:
    """Welch's unequal-variance t-test between the ``col`` means of two
    frames — the A/B experiment readout (and the numeric companion to
    :func:`~hashquery_spark.ops.profile.ks_test`, which compares whole
    distributions). Output (one row): ``n_a, n_b, mean_a, mean_b, diff,
    welch_t, welch_df`` (t/df NULL when either side has < 2 rows or both
    variances are 0).

    Exactness: values snap to an integer micro-unit grid
    (``floor(v·grid + 0.5)``, default 1e-6 units) so sums S and Σx² run
    order-independently in DECIMAL(38,0); means and sample variances are
    then exact-rational double quotients, and t / Welch–Satterthwaite df
    are short fixed-order IEEE chains (sqrt is correctly rounded) — both
    engines agree bit-for-bit with fround(6) only at the very end.

    Scale: one narrow aggregate per side over one scan each — no
    shuffle beyond the 1-row partials.
    """
    from .dedup import fround

    def side(df, tag):
        v = F.col(col).cast("double")
        m = F.floor(v * F.lit(float(grid)) + F.lit(0.5)).cast("decimal(38,0)")
        return df.where(v.isNotNull()).agg(
            F.count(F.lit(1)).alias(f"n_{tag}"),
            F.sum(m).alias(f"__s{tag}__"),
            F.sum(m * m).alias(f"__q{tag}__"),
        )

    g = side(df_a, "a").crossJoin(F.broadcast(side(df_b, "b")))
    out = []
    for tag in ("a", "b"):
        n = F.col(f"n_{tag}").cast("decimal(38,0)")
        s = F.col(f"__s{tag}__")
        q = F.col(f"__q{tag}__")
        mean = s.cast("double") / (
            F.col(f"n_{tag}").cast("double") * F.lit(float(grid))
        )
        # sample variance in grid^2 units: (n·Q − S²) / (n·(n−1))
        var = F.when(
            F.col(f"n_{tag}") >= 2,
            (n * q - s * s).cast("double")
            / (
                F.col(f"n_{tag}").cast("double")
                * (F.col(f"n_{tag}").cast("double") - F.lit(1.0))
            ),
        )
        out += [mean.alias(f"__m{tag}__"), var.alias(f"__v{tag}__")]
    g2 = g.select("n_a", "n_b", *out)
    g2_scale = float(grid) * float(grid)
    sea = F.col("__va__") / (F.col("n_a").cast("double") * F.lit(g2_scale))
    seb = F.col("__vb__") / (F.col("n_b").cast("double") * F.lit(g2_scale))
    se2 = sea + seb
    diff = F.col("__ma__") - F.col("__mb__")
    t = diff / F.sqrt(se2)
    dfree = (se2 * se2) / (
        sea * sea / (F.col("n_a").cast("double") - F.lit(1.0))
        + seb * seb / (F.col("n_b").cast("double") - F.lit(1.0))
    )
    ok = (
        (F.col("n_a") >= 2) & (F.col("n_b") >= 2) & (se2 > 0)
    )
    return g2.select(
        F.col("n_a").cast("long"),
        F.col("n_b").cast("long"),
        fround(F.col("__ma__"), 6).alias("mean_a"),
        fround(F.col("__mb__"), 6).alias("mean_b"),
        fround(diff, 6).alias("diff"),
        F.when(ok, fround(t, 6)).alias("welch_t"),
        F.when(ok, fround(dfree, 6)).alias("welch_df"),
    )


def anova_f(
    df: DataFrame,
    value_col: str,
    group_col: str,
    grid: float = 1e6,
) -> DataFrame:
    """One-way ANOVA of ``value_col`` across the levels of ``group_col``
    — "does the mean differ between sources/shards/label buckets?", the
    k-group generalization of :func:`ab_test_report`. Output (one row):
    ``k, n, f_stat, eta_sq`` (NULL stats when k < 2, n <= k, or SSW = 0).

    Exactness: values snap to the integer ``grid`` (micro-units by
    default) so per-group S_g and global Q = SUM(m^2) are exact
    DECIMAL(38,0) sums. The between-group sum of squares needs
    SUM_g(S_g^2 / n_g); each term is floored to an exact integer via
    remainder subtraction ((S^2 - S^2 mod n) / n — decimal-exact in
    Spark, ``//`` in DuckDB; per-group truncation < 1 grid^2 unit, i.e.
    < 1e-12 of a squared value, while keeping the sum order-independent).
    F and eta^2 are then single IEEE quotients of exact big integers,
    snapped with the tie-proof floor round at 6 dp.

    Scale: one scan -> one map-side-combined groupBy(group_col) to a
    k-row frame -> one global 1-row aggregate. S_g^2 is O(n^2 grid^2):
    DECIMAL(38) holds to ~1e19 micro-unit sums (n*|v| ~ 1e13 at a
    trillion rows of unit-scale values) — same accumulator contract as
    binary_auc's rank sums.
    """
    v = F.col(value_col).cast("double")
    m = F.floor(v * F.lit(float(grid)) + F.lit(0.5)).cast("decimal(19,0)")
    per_g = (
        df.where(v.isNotNull() & F.col(group_col).isNotNull())
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("decimal(19,0)").alias("__n__"),
            F.sum(m).cast("decimal(19,0)").alias("__s__"),
            F.sum(m.cast("decimal(38,0)") * m).alias("__q__"),
        )
    )
    s2 = F.col("__s__") * F.col("__s__")  # decimal(38,0), exact
    tg = (s2 - s2 % F.col("__n__")) / F.col("__n__")  # exact integer value
    agg = per_g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("__n__")).alias("__N__"),
        F.sum(F.col("__s__").cast("decimal(38,0)")).alias("__S__"),
        F.sum(F.col("__q__")).alias("__Q__"),
        F.sum(tg).alias("__A__"),
    )
    S2 = F.col("__S__") * F.col("__S__")
    big_n = F.col("__N__")
    b = (S2 - S2 % big_n) / big_n  # floor(S^2 / N), exact
    ssb = F.col("__A__").cast("double") - b.cast("double")
    ssw = F.col("__Q__").cast("double") - F.col("__A__").cast("double")
    sst = F.col("__Q__").cast("double") - b.cast("double")
    kd = F.col("k").cast("double")
    nd = big_n.cast("double")
    f_stat = (ssb / (kd - F.lit(1.0))) / (ssw / (nd - kd))
    ok = (F.col("k") >= 2) & (big_n > F.col("k")) & (ssw > 0)
    return agg.select(
        F.col("k").cast("long").alias("k"),
        big_n.cast("long").alias("n"),
        F.when(ok, fround(f_stat, 6)).alias("f_stat"),
        F.when(ok & (sst > 0), fround(ssb / sst, 6)).alias("eta_sq"),
    )


def mann_whitney(
    df: DataFrame,
    value_col: str,
    side_col: str,
    by=None,
) -> DataFrame:
    """Mann-Whitney U test of ``value_col`` between the two samples
    split by truthy ``side_col`` (truthy = sample A), optionally per
    ``by`` group — the nonparametric two-sample location test (the
    distribution-free companion to :func:`ab_test_report`, and the
    significance readout on top of :func:`binary_auc`'s effect size).
    Output: group cols + ``n_a, n_b, u, z`` (z is the tie-corrected
    normal approximation; NULL when a sample is empty or all values tie).

    Exactness: the same score-histogram reduction as binary_auc — exact
    doubled rank sums in DECIMAL(38,0), so 2U = 2R_a - n_a(n_a+1) is an
    exact integer (u emits 2U/2, exact in binary since halves are
    representable). The tie correction T = SUM(t^3 - t) over tie runs is
    an exact DECIMAL sum off the same histogram. z's variance term
    4*Var(U) = n_a*n_b*((N+1)*N*(N-1) - T) / (3*N*(N-1)) is evaluated as
    a fixed-order IEEE chain over correctly-rounded casts of those exact
    integers; z is snapped with the tie-proof floor round at 6 dp.

    Scale: histogram rows bound all state (score-grid cardinality, not
    row count); one running-sum window over the bounded histogram.
    """
    by = [by] if isinstance(by, str) else list(by or [])
    v, side = F.col(value_col), F.col(side_col)
    a_flag = F.when(side.cast("boolean"), 1).otherwise(0)
    hist = (
        df.where(v.isNotNull() & side.isNotNull())
        .groupBy(*by, v.alias("__s__"))
        .agg(
            F.sum(a_flag).cast("long").alias("__p__"),
            F.sum(1 - a_flag).cast("long").alias("__q__"),
        )
    )
    # two-phase distributed prefix sum (see binary_auc — same hazard)
    from .dedup import bucketed_running_sums

    hist = bucketed_running_sums(
        hist.withColumn("__cq__", F.col("__p__") + F.col("__q__")),
        by,
        "__s__",
        ["__cq__"],
    ).select(*by, "__p__", "__q__", F.col("__cum0__").alias("__cum__"))
    c = F.col("__p__") + F.col("__q__")
    two_rank = 2 * F.col("__cum__") - c + 1
    cd = c.cast("decimal(38,0)")
    agg = hist.groupBy(*by).agg(
        F.sum("__p__").alias("n_a"),
        F.sum("__q__").alias("n_b"),
        F.sum(F.col("__p__").cast("decimal(38,0)") * two_rank).alias("__2R__"),
        F.sum(cd * cd * cd - cd).alias("__T__"),
    )
    na = F.col("n_a").cast("decimal(19,0)")
    two_u = F.col("__2R__") - na * (na + 1)  # exact integer, = 2*U_a
    nad = F.col("n_a").cast("double")
    nbd = F.col("n_b").cast("double")
    nd = (F.col("n_a") + F.col("n_b")).cast("double")
    # 4*Var(2U/2)*4 — work with doubled U: Var(2U) = 4 Var(U), so
    # z = (2U - n_a n_b) / sqrt(4 Var(U)); fixed op order both engines
    big_b = (
        (nd + F.lit(1.0)) * nd * (nd - F.lit(1.0))
        - F.col("__T__").cast("double")
    )
    four_var = nad * nbd * big_b / (F.lit(3.0) * nd * (nd - F.lit(1.0)))
    z = (two_u.cast("double") - nad * nbd) / F.sqrt(four_var)
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0) & (four_var > 0)
    return agg.select(
        *by,
        "n_a",
        "n_b",
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0),
            two_u.cast("double") / F.lit(2.0),
        ).alias("u"),
        F.when(ok, fround(z, 6)).alias("z"),
    )


def krippendorff_alpha(
    df: DataFrame,
    item_col: str,
    value_col: str,
) -> DataFrame:
    """Krippendorff's alpha (nominal metric) over a long ratings table
    (one row per rating; rater identity is irrelevant for alpha, and
    unequal ratings-per-item are handled natively — the property that
    makes alpha the right inter-annotator statistic for crowdsourced
    label QA where :func:`fleiss_kappa` demands a complete rater grid).
    Output (one row): ``n_items, n_ratings, alpha`` (items with < 2
    ratings are excluded per the definition; alpha NULL when every
    rating is the same category).

    Exactness: per-item disagreement (m_i^2 - SUM_c n_ic^2)/(m_i - 1)
    is floored to the 1e-6 grid via decimal remainder-subtraction and
    summed exactly (per-item truncation < 1e-6, identical both
    engines); the margins term (n^2 - SUM_c n_c^2) is an exact DECIMAL
    integer, and alpha = 1 - Do*(n-1)/De is a fixed IEEE chain,
    fround(6).

    Scale: one groupBy(item, value) over the ratings, then bounded
    rollups — the (item) table is the only large intermediate and it
    aggregates with map-side combine.
    """
    pairs = (
        df.where(F.col(item_col).isNotNull() & F.col(value_col).isNotNull())
        .groupBy(item_col, value_col)
        .agg(F.count(F.lit(1)).cast("decimal(19,0)").alias("__c__"))
        .localCheckpoint(eager=True)
    )
    per_item = pairs.groupBy(item_col).agg(
        F.sum("__c__").cast("decimal(19,0)").alias("__m__"),
        F.sum(F.col("__c__").cast("decimal(38,0)") * F.col("__c__")).alias(
            "__sq__"
        ),
    ).where(F.col("__m__") >= 2)
    kk = F.lit(1000000).cast("decimal(19,0)")
    x = (F.col("__m__") * F.col("__m__") - F.col("__sq__")) * kk
    d = F.col("__m__") - 1
    item_do = (x - x % d) / d  # exact integer-valued decimal (1e-6 grid)
    do_tot = per_item.agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("__m__")).cast("decimal(19,0)").alias("__n__"),
        F.sum(item_do).alias("__do__"),
    )
    # margins over the SAME >=2-rating item population
    margins = (
        pairs.join(per_item.select(item_col), on=item_col)
        .groupBy(value_col)
        .agg(F.sum("__c__").cast("decimal(19,0)").alias("__nc__"))
        .agg(F.sum(F.col("__nc__").cast("decimal(38,0)") * F.col("__nc__")).alias("__sqc__"))
    )
    out = do_tot.crossJoin(F.broadcast(margins))
    n = F.col("__n__")
    de = (n * n - F.col("__sqc__")).cast("double")
    alpha = F.lit(1.0) - (
        F.col("__do__").cast("double") * (n.cast("double") - F.lit(1.0))
    ) / (F.lit(1000000.0) * de)
    from .dedup import fround

    return out.select(
        F.col("n_items").cast("long").alias("n_items"),
        n.cast("long").alias("n_ratings"),
        F.when(de > 0, fround(alpha, 6)).alias("alpha"),
    )


def classification_report(
    df: DataFrame,
    label_col: str,
    pred_col: str,
) -> DataFrame:
    """Per-class precision/recall/F1 over (label, prediction) pairs —
    the standard classifier eval table (the per-class companion to
    :func:`binary_auc`'s threshold-free summary and
    :func:`fairness_report`'s group gaps). Output: one row per class
    seen in EITHER column: ``clazz, support, tp, fp, fn, precision,
    recall, f1`` (ratios NULL when their denominator is 0 — no
    sklearn-style silent zero).

    Exactness: tp/fp/fn are exact counts; all three ratios are
    tie-proof integer ratios (f1 = 2tp / (2tp + fp + fn)).

    Scale: ONE groupBy over the bounded (label, pred) confusion table;
    per-class rollups run on that table, never the rows.
    """
    from .dedup import round4_ratio

    base = df.where(F.col(label_col).isNotNull() & F.col(pred_col).isNotNull())
    conf = base.groupBy(
        F.col(label_col).cast("string").alias("__l__"),
        F.col(pred_col).cast("string").alias("__p__"),
    ).agg(F.count(F.lit(1)).alias("__c__")).localCheckpoint(eager=True)
    as_label = conf.groupBy(F.col("__l__").alias("clazz")).agg(
        F.sum("__c__").cast("long").alias("support"),
        F.sum(F.when(F.col("__p__") == F.col("__l__"), F.col("__c__")))
        .cast("long")
        .alias("__tp_l__"),
    )
    as_pred = conf.groupBy(F.col("__p__").alias("clazz")).agg(
        F.sum("__c__").cast("long").alias("__pred_n__"),
    )
    out = as_label.join(as_pred, on="clazz", how="full_outer").select(
        "clazz",
        F.coalesce("support", F.lit(0)).alias("support"),
        F.coalesce("__tp_l__", F.lit(0)).alias("tp"),
        (
            F.coalesce("__pred_n__", F.lit(0)) - F.coalesce("__tp_l__", F.lit(0))
        ).alias("fp"),
        (
            F.coalesce("support", F.lit(0)) - F.coalesce("__tp_l__", F.lit(0))
        ).alias("fn"),
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    return out.select(
        "clazz",
        "support",
        "tp",
        "fp",
        "fn",
        F.when(tp + fp > 0, round4_ratio(tp, tp + fp)).alias("precision"),
        F.when(tp + fn > 0, round4_ratio(tp, tp + fn)).alias("recall"),
        F.when(
            2 * tp + fp + fn > 0, round4_ratio(2 * tp, 2 * tp + fp + fn)
        ).alias("f1"),
    )


def brier_score(
    df: DataFrame,
    score_col: str,
    label_col: str,
    by=None,
) -> DataFrame:
    """Brier score (mean squared probability error) of ``score_col``
    against binary ``label_col``, optionally per ``by`` group — the
    strictly-proper scoring companion to :func:`calibration_bins` (ECE
    can be gamed by binning; Brier cannot). Output: group cols +
    ``n, brier``.

    Exactness: probabilities snap to integer micro-units, so each
    squared error (m - y·1e6)^2 is an exact integer and the mean is an
    exact DECIMAL ratio, fround(6) after the 1e-12 rescale.

    Scale: one narrow aggregate, map-side combined.
    """
    from .dedup import fround

    by = [by] if isinstance(by, str) else list(by or [])
    s, lab = F.col(score_col), F.col(label_col)
    m = F.floor(s.cast("double") * F.lit(1000000.0) + F.lit(0.5)).cast(
        "decimal(19,0)"
    )
    y = F.when(lab.cast("boolean"), F.lit(1000000)).otherwise(F.lit(0)).cast(
        "decimal(19,0)"
    )
    e = m - y
    g = (
        df.where(s.isNotNull() & lab.isNotNull())
        .groupBy(*by)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(e.cast("decimal(38,0)") * e).alias("__se__"),
        )
    )
    return g.select(
        *by,
        F.col("n").cast("long").alias("n"),
        fround(
            F.col("__se__").cast("double")
            / (F.col("n").cast("double") * F.lit(1e12)),
            6,
        ).alias("brier"),
    )


def log_loss(
    df: DataFrame,
    score_col: str,
    label_col: str,
    by=None,
    eps: float = 1e-6,
) -> DataFrame:
    """Cross-entropy (log loss) of probability ``score_col`` against
    binary ``label_col``, optionally per ``by`` group — the likelihood
    twin of :func:`brier_score` (punishes confident wrongness
    unboundedly, hence the ``eps`` clamp). Output: group cols +
    ``n, log_loss``.

    Determinism: p clamps to [eps, 1-eps] as fixed IEEE ops, each
    -ln(p_or_1mp) snaps to the 1e-6 floor grid and sums as BIGINTs;
    the mean is the exact integer ratio fround(6) — the
    bigram_lm_score contract.

    Scale: one narrow aggregate, map-side combined.
    """
    from .dedup import fround

    by = [by] if isinstance(by, str) else list(by or [])
    s, lab = F.col(score_col), F.col(label_col)
    p = F.least(
        F.greatest(s.cast("double"), F.lit(float(eps))),
        F.lit(1.0 - float(eps)),
    )
    picked = F.when(lab.cast("boolean"), p).otherwise(F.lit(1.0) - p)
    lp = F.floor(-F.log(picked) * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    g = (
        df.where(s.isNotNull() & lab.isNotNull())
        .groupBy(*by)
        .agg(F.count(F.lit(1)).alias("n"), F.sum(lp).alias("__s__"))
    )
    return g.select(
        *by,
        F.col("n").cast("long").alias("n"),
        fround(
            F.col("__s__").cast("double")
            / (F.col("n").cast("double") * F.lit(1000000.0)),
            6,
        ).alias("log_loss"),
    )


def mcnemar_test(
    df: DataFrame,
    pred_a_col: str,
    pred_b_col: str,
    label_col: str,
    by=None,
) -> DataFrame:
    """McNemar's test for PAIRED classifier comparison — "is model A
    actually better than model B on the same eval set", the statistic a
    gate-swap decision should quote instead of two independent
    accuracies (which ignore that both models saw the same items).
    Output: group cols + ``n, b_discordant`` (A right, B wrong),
    ``c_discordant`` (A wrong, B right), ``mcnemar_chi2`` — the
    continuity-corrected ``(|b−c|−1)²/(b+c)``, NULL when ``b+c = 0``
    (χ²₁: > 3.84 ⇒ the two error patterns differ at p < .05).

    Exactness: b, c are exact counts and the statistic is a pure
    integer-over-integer double quotient — correctly rounded and
    bit-identical in both engines, no rounding site.

    Scale: ONE map-side-combined aggregate over one scan — counts only,
    nothing buffers. Rows where any of the three columns is NULL are
    excluded (a paired test needs both predictions and the label).
    """
    by = [by] if isinstance(by, str) else list(by or [])
    a = F.col(pred_a_col).cast("boolean")
    b = F.col(pred_b_col).cast("boolean")
    lab = F.col(label_col).cast("boolean")
    base = df.where(a.isNotNull() & b.isNotNull() & lab.isNotNull())
    g = base.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when((a == lab) & (b != lab), 1)).alias("b_discordant"),
        F.count(F.when((a != lab) & (b == lab), 1)).alias("c_discordant"),
    )
    bb, cc = F.col("b_discordant"), F.col("c_discordant")
    num = (F.abs(bb - cc) - 1) * (F.abs(bb - cc) - 1)
    return g.select(
        *by,
        "n",
        bb.cast("long").alias("b_discordant"),
        cc.cast("long").alias("c_discordant"),
        F.when(
            bb + cc > 0, num.cast("double") / (bb + cc).cast("double")
        ).alias("mcnemar_chi2"),
    )


def permutation_test(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_draws: int = 200,
    grid: float = 1e6,
    *,
    seed: str,
) -> DataFrame:
    """Paired-permutation (sign-flip) test on per-item differences —
    the distribution-free companion to :func:`ab_test_report` for
    PAIRED designs (same items scored by two models: d_i = score_A −
    score_B). H₀: the d_i are symmetric about 0; the test flips each
    item's sign in ``n_draws`` seeded pseudo-permutations and asks how
    often |Σ ±d| ≥ |Σ d|. Output (one row): ``n, d_sum, n_ge,
    p_value`` with the add-one estimator p = (n_ge + 1)/(n_draws + 1).

    Determinism (the dp/bootstrap contract): draws come from md5, not
    an RNG — ``seed`` is required and the release is exactly
    reproducible by a seed holder. One md5 per ROW; draw r's sign is
    bit 31 of the Kirsch-Mitzenmacher combination (h1 + r·h2) mod 2³²
    (bit 0 would alternate with r whenever h2 is odd). Values snap to
    an integer grid (default micro-units) so every replicate sum is an
    exact DECIMAL(38) integer and p is an exact integer-over-integer
    quotient — no rounding site anywhere.

    Scale: the md5 projection sits BELOW the Generate (explode of the
    draw sequence), so per-(row, draw) work is a few integer ops on
    bound attributes (the bootstrap_ci codegen lesson); the draw-group
    aggregate map-side combines to n_draws·n_partitions records and the
    final comparison runs on n_draws rows.
    """
    if n_draws < 1:
        raise ValueError("n_draws must be >= 1")
    v = F.col(value_col).cast("double")
    md5_expr = f"md5(concat('{seed}:', CAST(`{id_col}` AS STRING)))"
    # e0 only when repr has no exponent — repr(1e-07) is ALREADY
    # scientific and '1e-07e0' is an invalid literal (the rbo/mmr
    # literal rule).
    _gr = repr(float(grid))
    _glit = _gr + "e0" if "e" not in _gr else f"CAST({_gr} AS DOUBLE)"
    base = df.where(v.isNotNull()).selectExpr(
        f"CAST(conv(substr({md5_expr}, 1, 8), 16, 10) AS BIGINT) AS __h1__",
        f"CAST(conv(substr({md5_expr}, 9, 8), 16, 10) AS BIGINT) AS __h2__",
        f"CAST(floor(CAST(`{value_col}` AS DOUBLE) * {_glit} + 0.5e0) "
        "AS BIGINT) AS __u__",
    )
    ex = base.select(
        "__h1__",
        "__h2__",
        "__u__",
        F.explode(F.sequence(F.lit(0), F.lit(n_draws - 1))).alias("__r__"),
    )
    sign = F.expr(
        "CAST(1 - 2 * pmod(pmod(__h1__ + __r__ * __h2__, 4294967296L)"
        " DIV 2147483648L, 2) AS BIGINT)"
    )
    per_draw = (
        ex.select("__r__", (sign * F.col("__u__")).alias("__su__"))
        .groupBy("__r__")
        .agg(F.sum(F.col("__su__").cast("decimal(38,0)")).alias("__s__"))
    )
    obs = df.where(v.isNotNull()).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.floor(v * F.lit(float(grid)) + F.lit(0.5)).cast("decimal(38,0)")
        ).alias("__obs__"),
    )
    counted = per_draw.crossJoin(F.broadcast(obs)).agg(
        F.count(
            F.when(F.abs(F.col("__s__")) >= F.abs(F.col("__obs__")), 1)
        ).alias("n_ge")
    )
    return obs.crossJoin(F.broadcast(counted)).select(
        "n",
        (F.col("__obs__").cast("double") / F.lit(float(grid))).alias("d_sum"),
        F.col("n_ge").cast("long").alias("n_ge"),
        (
            (F.col("n_ge") + 1).cast("double")
            / F.lit(float(n_draws + 1))
        ).alias("p_value"),
    )


def conformal_interval(
    df_cal: DataFrame,
    df_eval: DataFrame,
    residual_col: str,
    alpha: float = 0.1,
    by=None,
) -> DataFrame:
    """Split-conformal prediction interval (Vovk; Lei et al.): from a
    CALIBRATION frame's residuals, the half-width ``q_hat`` = the
    ⌈(1−α)(n+1)⌉-th smallest |residual| gives distribution-free
    ≥ (1−α) coverage for ŷ ± q_hat on exchangeable data — the
    model-agnostic uncertainty wrapper an eval pipeline should quote
    instead of Gaussian bands. Output: group cols + ``n_cal, q_hat,
    n_eval, coverage`` (the EVAL frame's realized coverage — the
    honest check that exchangeability actually held; q_hat NULL with
    coverage 1.0 when the rank exceeds n_cal, the infinite-interval
    case).

    Exactness: α snaps to percents, the rank is the exact integer
    ``((100−α100)·(n+1) + 99) DIV 100``, q_hat is an exact DATA VALUE
    (an order statistic — no interpolation), and coverage is a
    tie-proof 4-dp integer ratio.

    Scale: the calibration side reduces to an |residual| histogram
    (map-side combined), the order statistic comes from the two-phase
    distributed prefix sum (no per-group sort), and the eval side is
    one broadcast join + one aggregate. Raw rows never shuffle.
    """
    from .dedup import (
        bucketed_running_sums,
        reify_null_safe_keys,
        round4_ratio,
    )

    if not 0 < alpha < 1:
        raise ValueError("alpha must be in (0, 1)")
    a100 = int(round(alpha * 100))
    by = [by] if isinstance(by, str) else list(by or [])
    r = F.col(residual_col).cast("double")

    cal = df_cal.where(r.isNotNull()).select(*by, F.abs(r).alias("__a__"))
    cal, safe_by, _ = reify_null_safe_keys(cal, by)
    hist = cal.groupBy(*safe_by, "__a__").agg(F.count(F.lit(1)).alias("__c__"))
    cum = bucketed_running_sums(hist, safe_by, "__a__", ["__c__"])
    totals = hist.groupBy(*safe_by).agg(F.sum("__c__").alias("n_cal"))
    rank = F.expr(f"({100 - a100}L * (n_cal + 1) + 99L) DIV 100L")
    if safe_by:
        joined = cum.join(F.broadcast(totals), on=safe_by)
    else:
        joined = cum.crossJoin(F.broadcast(totals))
    qhat = joined.groupBy(*safe_by).agg(
        F.max("n_cal").alias("n_cal"),
        F.min(
            F.when(F.col("__cum0__") >= rank, F.col("__a__"))
        ).alias("q_hat"),
    )

    ev = df_eval.where(r.isNotNull()).select(*by, F.abs(r).alias("__a__"))
    # reify with the same tag -> identical helper names as the cal side;
    # q_hat's group attributes are its aggregate's own grouping keys, so
    # the broadcast join-back keeps sane size estimates
    ev, ev_safe, _ = reify_null_safe_keys(ev, by)
    if safe_by:
        tagged = ev.join(F.broadcast(qhat), on=safe_by)
    else:
        tagged = ev.crossJoin(F.broadcast(qhat))
    out = tagged.groupBy(*by).agg(
        F.max("n_cal").alias("n_cal"),
        F.max("q_hat").alias("q_hat"),
        F.count(F.lit(1)).alias("n_eval"),
        F.count(
            F.when(F.col("q_hat").isNull() | (F.col("__a__") <= F.col("q_hat")), 1)
        ).alias("__cov__"),
    )
    return out.select(
        *by,
        "n_cal",
        "q_hat",
        "n_eval",
        round4_ratio(F.col("__cov__"), F.col("n_eval")).alias("coverage"),
    )


def pinball_loss(
    df: DataFrame,
    pred_col: str,
    actual_col: str,
    quantiles=(0.1, 0.5, 0.9),
    by=None,
) -> DataFrame:
    """Pinball (quantile) loss — THE proper scoring rule for quantile
    forecasts: loss_q = mean(max(q·(y−ŷ), (q−1)·(y−ŷ))). One output row
    per group × quantile: group cols + ``q, n, pinball_loss``. A
    model's q-th quantile head is calibrated iff this is minimized;
    compare heads across models at the same q.

    Exactness: quantiles snap to percents, errors snap to integer
    micro-units, so each contribution ``q100·u`` or ``(q100−100)·u`` is
    an exact integer summed in DECIMAL(38); the loss is an exact
    rational (sum / (n·100·1e6)) emitted as the correctly-rounded
    double quotient — no rounding site.

    Scale: one projection computes the error units once; ONE
    map-side-combined aggregate carries a sum per quantile (no row
    explosion); the bounded per-group result unpivots via one stack.
    """
    by = [by] if isinstance(by, str) else list(by or [])
    qs = [int(round(float(q) * 100)) for q in quantiles]
    if len(set(qs)) != len(qs):
        raise ValueError("quantiles must be distinct at percent precision")
    p, y = F.col(pred_col).cast("double"), F.col(actual_col).cast("double")
    base = df.where(p.isNotNull() & y.isNotNull()).select(
        *by,
        F.floor((y - p) * F.lit(1000000.0) + F.lit(0.5))
        .cast("long")
        .alias("__u__"),
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for q100 in qs:
        term = F.when(
            F.col("__u__") >= 0, F.lit(q100) * F.col("__u__")
        ).otherwise(F.lit(q100 - 100) * F.col("__u__"))
        aggs.append(
            F.sum(term.cast("decimal(38,0)")).alias(f"__s{q100}__")
        )
    g = base.groupBy(*by).agg(*aggs)
    stack = ", ".join(
        f"CAST({q100} AS DOUBLE) / 100.0D, __s{q100}__" for q100 in qs
    )
    unpivoted = g.selectExpr(
        *[f"`{c}`" for c in by],
        "n",
        f"stack({len(qs)}, {stack}) AS (q, __s__)",
    )
    return unpivoted.select(
        *by,
        "q",
        "n",
        (
            F.col("__s__").cast("double")
            / (F.col("n").cast("double") * F.lit(100.0) * F.lit(1000000.0))
        ).alias("pinball_loss"),
    )


# two-sided 95% normal quantile, precomputed in Python and embedded as
# the identical literal in both engines (the retrieval_metrics
# discount-grid contract — no runtime erfinv anywhere)
_Z975 = 1.959963984540054


def auc_ci(
    df: DataFrame,
    score_col: str,
    label_col: str,
    by=None,
) -> DataFrame:
    """ROC-AUC with a DeLong (1988) confidence interval — the
    uncertainty-aware companion to :func:`binary_auc` ("is this
    quality-classifier ACTUALLY better, or is the AUC gap noise").
    Output: group cols + ``n_pos, n_neg, auc, auc_se, ci_lo, ci_hi``
    (se/CI NULL when either class has < 2 rows).

    DeLong from the score HISTOGRAM: every positive at score s shares
    the structural component V10(s) = (#neg < s + ½·#neg = s)/n_neg, so
    the per-sample components reduce to per-distinct-score integers
    W10 = 2·cum_neg_below + neg_at (doubled to stay integral) and
    symmetrically W01 for negatives; S10/S01 are weighted variances of
    W over the histogram and Var(AUC) = S10/n_pos + S01/n_neg.

    Exactness: W sums and W² sums are exact DECIMAL(38) integers (the
    binary_auc class: O(n³) past int64 at ~2e5 rows); AUC is the
    tie-proof floor round of ΣpW10/(2·n_pos·n_neg); the SE is a short
    fixed-order IEEE chain over correctly-rounded casts (identical both
    engines) frounded at 6 dp, and the CI bounds are auc ± z·se with
    the z literal embedded identically in the oracle.

    Scale: one histogram groupBy (map-side combined, bounded by the
    score grid), ONE two-phase prefix-sum pass carrying both class
    cumulations, one bounded totals join-back — rows never sort.
    """
    from .dedup import (
        bucketed_running_sums,
        reify_null_safe_keys,
    )

    by = [by] if isinstance(by, str) else list(by or [])
    s, lab = F.col(score_col), F.col(label_col)
    pos = F.when(lab.cast("boolean"), 1).otherwise(0)
    base = df.where(s.isNotNull() & lab.isNotNull()).select(
        *by, s.alias("__s__"), pos.alias("__pos__")
    )
    key_types = {f.name: f.dataType for f in base.schema.fields}
    base, safe_by, created = reify_null_safe_keys(base, by)
    # the histogram pipeline drops the raw key columns (only the
    # reified helpers flow through) — rebuild them from the helpers at
    # the end: NULL iff the isnull flag, else the coalesced value
    restore = []
    for k in by:
        nsv, nsn = f"__nsv_g_{k}__", f"__nsn_g_{k}__"
        if nsv in created:
            restore.append(
                F.when(F.col(nsn), F.lit(None).cast(key_types[k]))
                .otherwise(F.col(nsv))
                .alias(k)
            )
        else:  # non-nullable passthrough key — still on the frame
            restore.append(F.col(k))
    hist = base.groupBy(*safe_by, "__s__").agg(
        F.sum("__pos__").cast("long").alias("__p__"),
        F.sum(1 - F.col("__pos__")).cast("long").alias("__q__"),
    )
    cum = bucketed_running_sums(hist, safe_by, "__s__", ["__p__", "__q__"])
    totals = hist.groupBy(*safe_by).agg(
        F.sum("__p__").alias("n_pos"), F.sum("__q__").alias("n_neg")
    )
    if safe_by:
        j = cum.join(F.broadcast(totals), on=safe_by)
    else:
        j = cum.crossJoin(F.broadcast(totals))
    # doubled structural components per distinct score (exact integers)
    w10 = 2 * (F.col("__cum1__") - F.col("__q__")) + F.col("__q__")
    w01 = 2 * (F.col("n_pos") - F.col("__cum0__")) + F.col("__p__")
    d38 = "decimal(38,0)"
    agg = j.groupBy(*safe_by).agg(
        F.max("n_pos").alias("n_pos"),
        F.max("n_neg").alias("n_neg"),
        F.sum(F.col("__p__").cast(d38) * w10).alias("__sw10__"),
        F.sum(F.col("__p__").cast(d38) * w10 * w10).alias("__sw10sq__"),
        F.sum(F.col("__q__").cast(d38) * w01).alias("__sw01__"),
        F.sum(F.col("__q__").cast(d38) * w01 * w01).alias("__sw01sq__"),
    )
    np_l, nn_l = F.col("n_pos"), F.col("n_neg")
    np_d = np_l.cast(d38)
    nn_d = nn_l.cast(d38)
    auc = F.when(
        (np_l > 0) & (nn_l > 0),
        fround(
            F.col("__sw10__").cast("double")
            / (
                F.lit(2.0)
                * np_l.cast("double")
                * nn_l.cast("double")
            ),
            6,
        ),
    )
    # exact integer variance numerators: n·Σw² − (Σw)²
    num10 = np_d * F.col("__sw10sq__") - F.col("__sw10__") * F.col("__sw10__")
    num01 = nn_d * F.col("__sw01sq__") - F.col("__sw01__") * F.col("__sw01__")
    # Var(AUC) = S10/n_pos + S01/n_neg with S10 = num10/(np(np−1)·4nn²):
    # fixed-order double chain, identical text in the oracle
    npd, nnd = np_l.cast("double"), nn_l.cast("double")
    v10 = num10.cast("double") / (
        npd * (npd - F.lit(1.0)) * F.lit(4.0) * nnd * nnd * npd
    )
    v01 = num01.cast("double") / (
        nnd * (nnd - F.lit(1.0)) * F.lit(4.0) * npd * npd * nnd
    )
    se = F.when(
        (np_l >= 2) & (nn_l >= 2), fround(F.sqrt(v10 + v01), 6)
    )
    out = agg.select(
        *restore,
        "n_pos",
        "n_neg",
        auc.alias("auc"),
        se.alias("auc_se"),
    )
    z = F.lit(_Z975)
    return out.select(
        *by,
        "n_pos",
        "n_neg",
        "auc",
        "auc_se",
        F.when(
            F.col("auc_se").isNotNull(),
            fround(F.col("auc") - z * F.col("auc_se"), 6),
        ).alias("ci_lo"),
        F.when(
            F.col("auc_se").isNotNull(),
            fround(F.col("auc") + z * F.col("auc_se"), 6),
        ).alias("ci_hi"),
    )


def effect_size(
    df: DataFrame, value_col: str, flag_col: str, by=None
) -> DataFrame:
    """Standardized mean difference between the flagged (treatment) and
    unflagged (control) rows — Cohen's d with the Hedges' g small-sample
    correction, the effect-size companion to :func:`ab_test_report`'s
    significance test ("is it significant" vs "does it MATTER"). Output:
    group cols + ``n_t, n_c, mean_diff, cohens_d, hedges_g`` (NULLs when
    either side has < 2 rows or the pooled variance is 0).

    Exactness: values snap to micro-units; per-side sums S and Q (Σu,
    Σu²) are exact BIGINT/DECIMAL(38) integers from ONE map-side-
    combined aggregate (CASE-routed, the ab_test moments pattern), the
    variance numerators n·Q − S² stay exact decimals, and the final d/g
    chain is a FIXED sequence of correctly-rounded double ops mirrored
    verbatim in the oracle (micro scales cancel between numerator and
    pooled sd, so no grid factor survives); d and g fround to 6 dp.

    Scale: one aggregate, no joins, no windows — NULL groups survive
    (groupBy keeps NULL keys; only joins drop them)."""
    by = [by] if isinstance(by, str) else list(by or [])
    v = F.col(value_col).cast("double")
    flag = F.col(flag_col).cast("boolean")
    u = F.floor(v * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    ud = u.cast("decimal(38,0)")
    base = df.where(v.isNotNull() & flag.isNotNull()).select(
        *by, flag.alias("__f__"), u.alias("__u__"), (ud * u).alias("__uu__")
    )
    agg = base.groupBy(*by).agg(
        F.count(F.when(F.col("__f__"), 1)).alias("n_t"),
        F.count(F.when(~F.col("__f__"), 1)).alias("n_c"),
        F.coalesce(
            F.sum(F.when(F.col("__f__"), F.col("__u__"))), F.lit(0)
        ).cast("decimal(38,0)").alias("__s1__"),
        F.coalesce(
            F.sum(F.when(~F.col("__f__"), F.col("__u__"))), F.lit(0)
        ).cast("decimal(38,0)").alias("__s0__"),
        F.coalesce(
            F.sum(F.when(F.col("__f__"), F.col("__uu__"))),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("__q1__"),
        F.coalesce(
            F.sum(F.when(~F.col("__f__"), F.col("__uu__"))),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("__q0__"),
    )
    n1, n0 = F.col("n_t"), F.col("n_c")
    n1d = n1.cast("decimal(38,0)")
    n0d = n0.cast("decimal(38,0)")
    va = n1d * F.col("__q1__") - F.col("__s1__") * F.col("__s1__")
    vb = n0d * F.col("__q0__") - F.col("__s0__") * F.col("__s0__")
    md_num = F.col("__s1__") * n0d - F.col("__s0__") * n1d
    mean_diff = md_num.cast("double") / (
        n1.cast("double") * n0.cast("double") * F.lit(1000000.0)
    )
    sp = F.sqrt(
        (
            va.cast("double") / n1.cast("double")
            + vb.cast("double") / n0.cast("double")
        )
        / (n1 + n0 - 2).cast("double")
    )
    d = (
        md_num.cast("double") / (n1.cast("double") * n0.cast("double"))
    ) / sp
    dfree = (4 * (n1 + n0) - 9).cast("double")
    g = d * (F.lit(1.0) - F.lit(3.0) / dfree)
    ok = (n1 >= 2) & (n0 >= 2) & (va + vb > 0)
    return agg.select(
        *by,
        n1.cast("long").alias("n_t"),
        n0.cast("long").alias("n_c"),
        F.when(
            (n1 >= 1) & (n0 >= 1), mean_diff + F.lit(0.0)
        ).alias("mean_diff"),
        F.when(ok, fround(d, 6) + F.lit(0.0)).alias("cohens_d"),
        F.when(ok, fround(g, 6) + F.lit(0.0)).alias("hedges_g"),
    )
