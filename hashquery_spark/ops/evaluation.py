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
    w_ord = (
        Window.partitionBy(*by)
        .orderBy("__s__")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (F.sum(F.col("__p__") + F.col("__q__")).over(w_ord)).alias("__cum__")
    hist = hist.select(*by, "__p__", "__q__", cum)
    # tie run of size c = __p__+__q__ ends at __cum__; average rank
    # doubled = 2*(cum-c) + c + 1 = 2*cum - c + 1
    c = F.col("__p__") + F.col("__q__")
    two_rank = 2 * F.col("__cum__") - c + 1
    # DECIMAL(38,0) accumulators: 2R is O(n²) — int64 overflows past
    # ~2e9 rows, a 100 TB corpus is 1000x that. DECIMAL→DOUBLE casts are
    # correctly rounded in both engines, so the final fround still agrees.
    agg = hist.groupBy(*by).agg(
        F.sum("__p__").alias("n_pos"),
        F.sum("__q__").alias("n_neg"),
        F.sum((F.col("__p__") * two_rank).cast("decimal(38,0)")).alias("__2R__"),
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
