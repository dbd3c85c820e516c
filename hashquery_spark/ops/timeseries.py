"""Multi-granularity time-series rollup (hypertable-style continuous
aggregate, computed as a batch cascade; net-new — the reference's only
temporal surface is scalar granularity truncation,
src/model/column_expression/granularity.py:8).

Scale design — the rollup CASCADE: the raw table is scanned exactly ONCE,
aggregated at the finest requested grain; every coarser grain then
re-aggregates the previous level's already-tiny output (hour → day →
month → year), so each extra grain costs a shuffle over buckets, not a
rescan of 100 TB. The shared finer levels appear in several union
branches of the logical plan, but Spark's exchange reuse (AQE
ReusedExchange, verified in tests) dedups them at runtime — the raw scan
and every intermediate aggregation execute exactly once, no explicit
caching needed. Decomposable measures re-aggregate exactly (count/sum
via sum, min/max via min/max); avg carries (decimal sum, count) partials
through the cascade and divides only at emit — never an avg of avgs.

Week (ISO Monday-start, Spark/DuckDB ``date_trunc('week')`` agree) is a
hierarchy LEAF: days nest in weeks, but weeks straddle month boundaries,
so week is always derived from the day-or-finer level and nothing derives
from week.

Cross-engine determinism: sums route through DECIMAL(18,4) so aggregation
order cannot change results; avg divides two exactly-equal numbers as
doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_ORDER = ["second", "minute", "hour", "day", "week", "month", "quarter", "year"]
# grain -> the finest grain it can be derived from (None = raw only);
# week must come from day or finer, month/coarser from day or finer too
_SUPPORTED_FNS = ("count", "sum", "min", "max", "avg")


def _partials(measures: dict, src_is_raw: bool):
    """Aggregate expressions carrying (fn-specific) partial state."""
    aggs = []
    for name, (fn, colname) in measures.items():
        if fn not in _SUPPORTED_FNS:
            raise ValueError(f"unsupported measure fn {fn!r}")
        if src_is_raw:
            arg = F.lit(1) if colname == "*" else F.col(colname)
            if fn == "count":
                aggs.append(F.count(arg).alias(f"__cnt_{name}"))
            elif fn in ("min", "max"):
                aggs.append(getattr(F, fn)(arg).alias(f"__ext_{name}"))
            else:  # sum / avg carry (decimal sum, count) partials
                aggs.append(
                    F.sum(arg.cast("decimal(18,4)")).alias(f"__sum_{name}")
                )
                if fn == "avg":
                    aggs.append(F.count(arg).alias(f"__cnt_{name}"))
        else:  # re-aggregate partials from the finer level
            if fn == "count":
                aggs.append(F.sum(f"__cnt_{name}").alias(f"__cnt_{name}"))
            elif fn in ("min", "max"):
                aggs.append(getattr(F, fn)(f"__ext_{name}").alias(f"__ext_{name}"))
            else:
                aggs.append(F.sum(f"__sum_{name}").alias(f"__sum_{name}"))
                if fn == "avg":
                    aggs.append(F.sum(f"__cnt_{name}").alias(f"__cnt_{name}"))
    return aggs


def _emit(level: DataFrame, grain: str, measures: dict) -> DataFrame:
    outs = [F.lit(grain).alias("grain"), F.col("bucket")]
    for name, (fn, _ ) in measures.items():
        if fn == "count":
            outs.append(F.col(f"__cnt_{name}").alias(name))
        elif fn in ("min", "max"):
            outs.append(F.col(f"__ext_{name}").alias(name))
        elif fn == "sum":
            outs.append(F.col(f"__sum_{name}").cast("double").alias(name))
        else:  # avg = exact decimal sum / exact count, divided as doubles
            outs.append(
                (
                    F.col(f"__sum_{name}").cast("double")
                    / F.col(f"__cnt_{name}")
                ).alias(name)
            )
    return level.select(*outs)


_STEP = {
    "second": "INTERVAL 1 SECOND",
    "minute": "INTERVAL 1 MINUTE",
    "hour": "INTERVAL 1 HOUR",
    "day": "INTERVAL 1 DAY",
    "week": "INTERVAL 7 DAY",
    "month": "INTERVAL 1 MONTH",
    "quarter": "INTERVAL 3 MONTH",
    "year": "INTERVAL 1 YEAR",
}


def _dense_partial_frame(df, ts_col, grain, group_col, measures):
    """Shared dense-spine machinery (gap_fill / trailing_agg): aggregate
    to grain buckets carrying _partials, then emit one row per bucket in
    the global [min, max] per group WITHOUT a spine join — each real row
    explodes itself plus the empty buckets it is responsible for.
    Output columns: [group?] + partial columns + __e__ struct(b=bucket,
    g=kind) where kind 0=real, 1=gap-after-a-real-bucket (the emitting
    row is its predecessor — the LOCF source), 2=leading gap."""
    step = F.expr(_STEP[grain])
    aggd = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(
            *([F.col(group_col)] if group_col else []),
            F.date_trunc(grain, F.col(ts_col)).alias("bucket"),
        )
        .agg(*_partials(measures, src_is_raw=True))
    )
    everything = Window.partitionBy()
    per_group = (
        Window.partitionBy(group_col) if group_col else Window.partitionBy()
    ).orderBy("bucket")
    nxt = F.lead("bucket").over(per_group)
    staged = aggd.select(
        "*",
        F.min("bucket").over(everything).alias("__lo__"),
        F.max("bucket").over(everything).alias("__hi__"),
        nxt.alias("__nxt__"),
        F.row_number().over(per_group).alias("__rn__"),
    )
    # gap buckets this row is responsible for: (bucket, next) exclusive —
    # or (bucket, global hi] on the group's last row, plus [global lo,
    # bucket) on its first row. Endpoints that are real buckets are
    # excluded; their own rows emit them.
    leading = F.when(
        F.col("__rn__") == 1,
        F.array_except(
            F.sequence(F.col("__lo__"), F.col("bucket"), step),
            F.array(F.col("bucket")),
        ),
    ).otherwise(F.array().cast("array<timestamp>"))
    trailing = F.array_except(
        F.sequence(F.col("bucket"), F.coalesce(F.col("__nxt__"), F.col("__hi__")), step),
        F.when(F.col("__nxt__").isNull(), F.array(F.col("bucket"))).otherwise(
            F.array(F.col("bucket"), F.col("__nxt__"))
        ),
    )
    emit = F.concat(
        F.array(F.struct(F.col("bucket").alias("b"), F.lit(0).alias("g"))),
        F.transform(
            leading, lambda b: F.struct(b.alias("b"), F.lit(2).alias("g"))
        ),
        F.transform(
            trailing, lambda b: F.struct(b.alias("b"), F.lit(1).alias("g"))
        ),
    )
    return staged.select(
        *([group_col] if group_col else []),
        *[
            c
            for c in staged.columns
            if c.startswith("__cnt_") or c.startswith("__sum_") or c.startswith("__ext_")
        ],
        F.explode(emit).alias("__e__"),
    )


def gap_fill(
    df: DataFrame,
    ts_col: str,
    grain: str = "day",
    group_col: str | None = None,
    measures: dict | None = None,
    fill: str = "zero",
) -> DataFrame:
    """Dense time series: aggregate to ``grain`` buckets, then emit one
    row for EVERY bucket in [min, max] (per group when ``group_col`` is
    given), zero-filling gaps — the "date spine" every dashboard /
    training-curve query needs, which a plain GROUP BY cannot produce
    (empty buckets simply don't exist in the input).

    ``measures`` as in :func:`multi_grain_rollup`. ``fill`` picks the gap
    semantics: ``"zero"`` (default — counts/sums fill 0, min/max/avg stay
    NULL: rate/counter semantics) or ``"locf"`` (last observation carried
    forward — every non-count measure repeats the most recent real
    bucket's value: gauge semantics; gaps BEFORE a group's first
    observation have nothing to carry and stay NULL, counts still fill
    0). LOCF costs nothing extra here: each gap row is emitted by exactly
    the real row that precedes it, so the carried value is already on the
    row — no second window pass. Adds ``is_gap``.

    Scale design: the raw table aggregates ONCE (map-side partials, one
    shuffle); everything after runs on the tiny bucket-level frame, and
    there is NO spine join — each aggregated row emits itself plus the
    empty buckets between it and its successor (``lead()`` within the
    group, ``sequence()`` for the range; the first row also back-fills
    from the global minimum, the last forward-fills to the global
    maximum), so the raw table is scanned exactly once and the plan is
    agg → two windows over the tiny frame → one explode. At 100 TB the
    cost is the one aggregation scan.

    Cross-engine determinism: sums route through DECIMAL(18,4); bucket
    arithmetic is calendar-exact (``sequence`` with calendar intervals ==
    DuckDB ``generate_series``).
    """
    if grain not in _STEP:
        raise ValueError(f"unsupported grain {grain!r}")
    if fill not in ("zero", "locf"):
        raise ValueError(f"unsupported fill mode {fill!r}")
    measures = measures or {"n": ("count", "*")}
    exploded = _dense_partial_frame(df, ts_col, grain, group_col, measures)
    kind = F.col("__e__.g")
    gap = kind != 0
    carry = (kind == 0) if fill == "zero" else (kind != 2)
    outs = ([F.col(group_col)] if group_col else []) + [
        F.col("__e__.b").alias("bucket")
    ]
    for name, (fn, _) in measures.items():
        if fn == "count":
            outs.append(
                F.when(gap, F.lit(0)).otherwise(F.col(f"__cnt_{name}")).alias(name)
            )
        elif fn in ("min", "max"):
            outs.append(
                F.when(carry, F.col(f"__ext_{name}")).alias(name)
            )
        elif fn == "sum":
            zero = F.lit(0.0) if fill == "zero" else F.lit(None).cast("double")
            outs.append(
                F.when(carry, F.col(f"__sum_{name}").cast("double"))
                .otherwise(zero)
                .alias(name)
            )
        else:  # avg
            outs.append(
                F.when(
                    carry,
                    F.col(f"__sum_{name}").cast("double") / F.col(f"__cnt_{name}"),
                ).alias(name)
            )
    outs.append(gap.alias("is_gap"))
    return exploded.select(*outs)


def trailing_agg(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    grain: str = "day",
    group_col: str | None = None,
    trailing: int = 7,
) -> DataFrame:
    """Rolling trailing-window aggregates — "7-day trailing revenue" —
    computed over a DENSE bucket spine so a ROWS frame equals a true
    time-range frame (with gaps in the data, a plain ROWS window over
    existing buckets silently reaches too far back; densifying first is
    the correct-by-construction formulation). Output per (group, bucket):
    trailing_sum, trailing_count, trailing_avg over the last ``trailing``
    buckets inclusive, plus ``window_buckets`` (< ``trailing`` while the
    window is still filling at the series start).

    Scale: the raw table aggregates once; the spine explode and the
    sliding window run over the tiny bucket-level frame, partitioned by
    group. Cross-engine determinism: the windowed sums accumulate
    DECIMAL(18,4) partials (exact), cast to double only at emit.
    """
    if trailing < 1:
        raise ValueError("trailing must be >= 1")
    measures = {"v": ("avg", value_col)}  # carries (__sum_v decimal, __cnt_v)
    exploded = _dense_partial_frame(df, ts_col, grain, group_col, measures)
    kind = F.col("__e__.g")
    g = [F.col(group_col)] if group_col else []
    dense = exploded.select(
        *g,
        F.col("__e__.b").alias("bucket"),
        F.when(kind == 0, F.col("__sum_v")).alias("__s__"),
        F.when(kind == 0, F.col("__cnt_v")).otherwise(F.lit(0)).alias("__c__"),
    )
    w = (
        (Window.partitionBy(group_col) if group_col else Window.partitionBy())
        .orderBy("bucket")
        .rowsBetween(-(trailing - 1), 0)
    )
    tsum = F.sum("__s__").over(w)
    tcnt = F.sum("__c__").over(w)
    return dense.select(
        *g,
        "bucket",
        F.coalesce(tsum.cast("double"), F.lit(0.0)).alias("trailing_sum"),
        tcnt.alias("trailing_count"),
        F.when(tcnt > 0, tsum.cast("double") / tcnt).alias("trailing_avg"),
        F.count(F.lit(1)).over(w).alias("window_buckets"),
    )


def counter_delta(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    grain: str = "hour",
    group_col: str | None = None,
) -> DataFrame:
    """Reset-aware counter increase per ``grain`` bucket (Prometheus
    ``increase()`` / Timescale counter_agg semantics): per series ordered
    by time, each sample contributes ``v - prev`` when the counter grew,
    or ``v`` when it shrank (a counter reset — the pre-reset remainder is
    unobservable and dropped, the standard convention); a series' first
    sample contributes nothing. Deltas attribute to the bucket of their
    own timestamp. Output: (group, bucket, increase, n_samples) for
    buckets that contain samples (compose with :func:`gap_fill` for a
    dense spine).

    Scale: one shuffle on the series key for the lag() window, then one
    (group, bucket) rollup with map-side combine. Cross-engine
    determinism: values route through DECIMAL(19,6) before subtraction,
    so deltas and their sums are exact scaled integers.
    """
    if grain not in _STEP:
        raise ValueError(f"unsupported grain {grain!r}")
    g = [F.col(group_col)] if group_col else []
    w = (
        Window.partitionBy(group_col) if group_col else Window.partitionBy()
    ).orderBy("__ts__", "__v__")
    base = df.where(
        F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        *g,
        F.col(ts_col).alias("__ts__"),
        F.col(value_col).cast("decimal(19,6)").alias("__v__"),
    )
    prev = F.lag("__v__").over(w)
    delta = F.when(prev.isNull(), F.lit(None)).otherwise(
        F.when(F.col("__v__") >= prev, F.col("__v__") - prev).otherwise(
            F.col("__v__")
        )
    )
    staged = base.select(
        *g,
        F.date_trunc(grain, F.col("__ts__")).alias("bucket"),
        delta.alias("__d__"),
    )
    return staged.groupBy(*g, "bucket").agg(
        F.coalesce(F.sum("__d__").cast("double"), F.lit(0.0)).alias("increase"),
        F.count(F.lit(1)).alias("n_samples"),
    )


def time_weighted_avg(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    grain: str = "hour",
    group_col: str | None = None,
) -> DataFrame:
    """Time-weighted average per ``grain`` bucket (the gauge rollup a
    plain ``avg`` gets wrong when observations are irregular: a value
    that held for 59 minutes must outweigh one that held for 1).

    Semantics: each observation's value holds from its timestamp until
    the group's next observation (LOCF step function); the final
    observation holds to the end of its own bucket. A segment spanning
    several buckets contributes to each in proportion to the overlap.
    Output: (group, bucket, twa, obs_seconds) for every bucket a segment
    overlaps — ``obs_seconds`` is the covered duration, < the full bucket
    at the edges.

    Scale: one shuffle on the group key for the lead() window, a narrow
    explode of segments across their buckets, then one (group, bucket)
    rollup with map-side combine. Cross-engine determinism: durations
    are integer microseconds; value×duration products route through
    DECIMAL (exact scaled integers) so accumulation order cannot change
    the result; the final divide is one double op, rounded to 6 dp.
    """
    if grain not in _STEP:
        raise ValueError(f"unsupported grain {grain!r}")
    step = F.expr(_STEP[grain])
    g = [F.col(group_col)] if group_col else []
    w = (
        Window.partitionBy(group_col) if group_col else Window.partitionBy()
    ).orderBy("__ts__", "__v__")
    base = df.where(
        F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        *g,
        F.col(ts_col).alias("__ts__"),
        F.col(value_col).cast("decimal(19,6)").alias("__v__"),
    )
    segs = base.select(
        *g,
        "__ts__",
        "__v__",
        F.coalesce(
            F.lead("__ts__").over(w),
            F.date_trunc(grain, F.col("__ts__")) + step,
        ).alias("__end__"),
    ).where(F.col("__end__") > F.col("__ts__"))
    spanned = segs.select(
        *g,
        "__ts__",
        "__v__",
        "__end__",
        F.explode(
            F.sequence(
                F.date_trunc(grain, F.col("__ts__")),
                F.date_trunc(grain, F.col("__end__")),
                step,
            )
        ).alias("bucket"),
    )
    # parquet timestamps arrive as TIMESTAMP_NTZ; unix_micros needs LTZ
    us = lambda c: F.unix_micros(c.cast("timestamp"))
    overlap_us = F.greatest(
        F.lit(0).cast("long"),
        F.least(us(F.col("__end__")), us(F.col("bucket") + step))
        - F.greatest(us(F.col("__ts__")), us(F.col("bucket"))),
    )
    weighted = spanned.select(
        *g,
        "bucket",
        overlap_us.alias("__dur__"),
        (F.col("__v__") * overlap_us.cast("decimal(19,0)")).alias("__wv__"),
    ).where(F.col("__dur__") > 0)
    from .dedup import fround

    return weighted.groupBy(*g, "bucket").agg(
        # fround: the quotient is an integer ratio (micro-unit sums) — the
        # decimal-tie class where native round() diverges cross-engine
        fround(
            F.sum("__wv__").cast("double") / F.sum("__dur__").cast("double"), 6
        ).alias("twa"),
        (F.sum("__dur__") / F.lit(1_000_000.0)).alias("obs_seconds"),
    )


def multi_grain_rollup(
    df: DataFrame,
    ts_col: str,
    grains=("hour", "day", "month"),
    measures: dict | None = None,
) -> DataFrame:
    """Long-format rollup ``(grain, bucket, <measures...>)`` at every
    requested grain, computed as a cascade (one raw scan total).

    ``measures`` maps output name -> ("count"|"sum"|"min"|"max"|"avg",
    column or "*")."""
    measures = measures or {"n": ("count", "*")}
    grains = sorted(set(grains), key=_ORDER.index)
    if not grains:
        raise ValueError("at least one grain required")
    # the cascade base: finest requested grain — but if week is requested
    # alongside coarser grains, base at day (nothing derives from week)
    base_grain = grains[0]
    needs_day_base = base_grain == "week" and len(grains) > 1
    if needs_day_base:
        base_grain = "day"

    base = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(F.date_trunc(base_grain, F.col(ts_col)).alias("bucket"))
        .agg(*_partials(measures, src_is_raw=True))
    )
    levels = {base_grain: base}
    out = [] if needs_day_base else [_emit(base, base_grain, measures)]
    if not needs_day_base:
        grains = grains[1:]
    # derive coarser grains from the finest compatible computed level:
    # week from day-or-finer; everything else from the finest non-week level
    for g in grains:
        candidates = [
            lg
            for lg in levels
            if _ORDER.index(lg) < _ORDER.index(g) and lg != "week"
        ]
        src = levels[max(candidates, key=_ORDER.index)] if candidates else None
        if src is None:
            raise ValueError(f"grain {g!r} cannot be derived")
        lvl = src.groupBy(
            F.date_trunc(g, F.col("bucket")).alias("bucket")
        ).agg(*_partials(measures, src_is_raw=False))
        levels[g] = lvl
        out.append(_emit(lvl, g, measures))
    result = out[0]
    for o in out[1:]:
        result = result.unionByName(o)
    return result


def refresh_rollup(
    existing: DataFrame,
    delta: DataFrame,
    keys,
    sum_cols,
    count_col: str = "n",
) -> DataFrame:
    """Incrementally maintain a stored rollup: merge an ``existing``
    aggregate frame (keys + per-column sums + ``count_col``) with NEW raw
    ``delta`` rows, producing the refreshed rollup WITHOUT rescanning the
    historical data — the batch materialized-view maintenance step
    (multi_grain_rollup builds from scratch; this keeps it current).

    Works because sum/count are decomposable: the delta aggregates alone
    (one partial-combined groupBy over only the new rows), then one tiny
    union+re-aggregate over (existing ∪ delta-partials) — both frames are
    key-cardinality small. Averages derive as sum/count downstream; for
    min/max store those partials the same way (also decomposable);
    non-decomposable aggregates (exact distinct, percentile) need the
    sketch path instead.

    Determinism: sums are DECIMAL(18,2)-routed end-to-end, so refresh
    order never matters and a refreshed rollup is BIT-IDENTICAL to a
    from-scratch rebuild (the oracle checks exactly that equivalence).
    ``existing``'s columns must be ``keys + [sum_cols...] + [count_col]``.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    sum_cols = [sum_cols] if isinstance(sum_cols, str) else list(sum_cols)
    delta_agg = delta.groupBy(*[F.col(k) for k in keys]).agg(
        *[
            F.sum(F.col(c).cast("decimal(18,2)")).alias(c)
            for c in sum_cols
        ],
        F.count(F.lit(1)).alias(count_col),
    )
    merged = existing.select(
        *keys,
        *[F.col(c).cast("decimal(18,2)").alias(c) for c in sum_cols],
        F.col(count_col),
    ).unionByName(delta_agg)
    return merged.groupBy(*[F.col(k) for k in keys]).agg(
        *[F.sum(F.col(c)).alias(c) for c in sum_cols],
        F.sum(F.col(count_col)).alias(count_col),
    )


def interarrival_stats(
    df: DataFrame,
    ts_col: str,
    group_col: str,
) -> DataFrame:
    """Per-group inter-arrival-time statistics — the burstiness /
    traffic-shape diagnostic for event streams (bot detection, crawler
    rate profiling): ``n_gaps, mean_gap_s`` and the squared coefficient
    of variation ``cv2`` (CV² = var/mean² — CV² ≈ 1 is Poisson, ≫ 1
    bursty, ≪ 1 metronomic; the standard burstiness measure without a
    cross-engine sqrt).

    Exactness: gaps are integer MICROSECONDS (unix_micros of adjacent
    events per group); with S = Σg and Q = Σg² (DECIMAL(38,0) — Q is
    int64-unsafe immediately: one 17-minute gap squares past 2^63),
    ``mean_gap_s = S/(n·1e6)`` is an exact double quotient and
    ``cv2 = (n·Q − S²)/S²`` a pure integer ratio through the tie-proof
    floor round. Groups with < 2 events have no gaps and are absent;
    all-identical timestamps give S = 0 and NULL stats.

    Scale: one window partitioned BY GROUP (lag) + one groupBy(group)
    with map-side combine — never a global ordering.
    """
    from pyspark.sql import Window

    from .dedup import round4_ratio

    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    # ordering by the gap value itself: ties give 0-gaps under any tie
    # order, so no tiebreak column is needed for determinism
    w = Window.partitionBy("grp").orderBy(F.col("__us__").asc())
    gaps = (
        df.where(F.col(ts_col).isNotNull() & F.col(group_col).isNotNull())
        .select(F.col(group_col).alias("grp"), us.alias("__us__"))
        .withColumn("__gap__", F.col("__us__") - F.lag("__us__").over(w))
        .where(F.col("__gap__").isNotNull())
    )
    g = gaps.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum(F.col("__gap__").cast("decimal(38,0)")).alias("__s__"),
        F.sum(
            F.col("__gap__").cast("decimal(38,0)") * F.col("__gap__")
        ).alias("__q__"),
    )
    s, q, n = F.col("__s__"), F.col("__q__"), F.col("n_gaps")
    return g.select(
        "grp",
        "n_gaps",
        F.when(
            n > 0,
            round4_ratio(s.cast("double"), (n.cast("decimal(38,0)") * 1000000).cast("double")),
        ).alias("mean_gap_s"),
        F.when(
            s > 0,
            round4_ratio(
                (n.cast("decimal(38,0)") * q - s * s).cast("double"),
                (s * s).cast("double"),
            ),
        ).alias("cv2"),
    )


def transition_matrix(
    df: DataFrame,
    entity_col: str,
    state_col: str,
    ts_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """(from_state, to_state, n, prob) — the first-order Markov
    transition matrix of per-entity state sequences (event-flow
    analytics: "what follows a page_view?"; also the behavioral
    anomaly baseline). ``prob`` row-normalizes per ``from_state`` on
    the tie-proof 4-dp grid; NULL states and single-event entities
    contribute no transitions.

    Scale: one entity-partitioned lead window (ordered by ts +
    ``tiebreak_col`` for determinism under equal timestamps) + one
    groupBy(from, to) with map-side combine — the pair table is bounded
    by |states|², and the row marginal is a window over that bounded
    table, never the events.
    """
    order = [F.col(ts_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(entity_col).orderBy(*order)
    pairs = (
        df.where(F.col(state_col).isNotNull())
        .select(
            F.col(state_col).cast("string").alias("from_state"),
            F.lead(F.col(state_col).cast("string")).over(w).alias("to_state"),
        )
        .where(F.col("to_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    row_total = F.sum("n").over(Window.partitionBy("from_state"))
    from .dedup import round4_ratio

    return pairs.select(
        "from_state",
        "to_state",
        "n",
        round4_ratio(F.col("n"), row_total).alias("prob"),
    )


def seasonal_baseline(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    by=None,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Weekly-seasonality anomaly gate: every event is z-scored against
    the mean/stddev of its own (group, day-of-week, hour-of-day) bucket
    — the standard ops-metrics baseline ("is this Tuesday-3pm spike
    abnormal *for* Tuesday 3pm?"). Output: ``by`` cols + ``dow, hour,
    value, z, is_anomaly`` per input row (z NULL when the bucket has
    < 2 rows or zero variance; is_anomaly = |z| > z_threshold).

    Exactness: bucket moments are integer micro-unit DECIMAL(38,0) sums
    (the ab_test contract), so mean/variance are exact-rational double
    quotients; z = (n·m − S) / (n·sqrt(n·Q − S² / (n−1)))-shaped fixed
    IEEE chain, snapped with fround(4) (sqrt-scaled — never bare round).

    Scale: one scan -> one map-side-combined groupBy over the bounded
    bucket table (|by| × 7 × 24) -> broadcast join back. The raw frame
    never shuffles.
    """
    from .dedup import fround

    by = [by] if isinstance(by, str) else list(by or [])
    v = F.col(value_col).cast("double")
    m = F.floor(v * F.lit(1000000.0) + F.lit(0.5)).cast("decimal(38,0)")
    base = df.where(v.isNotNull() & F.col(ts_col).isNotNull()).select(
        *by,
        F.dayofweek(F.col(ts_col)).alias("dow"),
        F.hour(F.col(ts_col)).alias("hour"),
        v.alias("value"),
        m.alias("__m__"),
    )
    keys = by + ["dow", "hour"]
    buckets = base.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__n__"),
        F.sum("__m__").alias("__s__"),
        F.sum(F.col("__m__") * F.col("__m__")).alias("__q__"),
    )
    joined = base.join(F.broadcast(buckets), on=keys)
    nd = F.col("__n__").cast("double")
    ndec = F.col("__n__").cast("decimal(38,0)")
    # sample variance in micro-unit^2: (n·Q − S²) / (n·(n−1)) — exact
    var = (ndec * F.col("__q__") - F.col("__s__") * F.col("__s__")).cast(
        "double"
    ) / (nd * (nd - F.lit(1.0)))
    # z = (n·m − S) / (n · sqrt(var)) — numerator exact DECIMAL
    num = (ndec * F.col("__m__") - F.col("__s__")).cast("double")
    z = num / (nd * F.sqrt(var))
    ok = (F.col("__n__") >= 2) & (var > 0)
    return joined.select(
        *keys,
        "value",
        F.when(ok, fround(z, 4)).alias("z"),
        F.when(ok, F.abs(fround(z, 4)) > F.lit(float(z_threshold))).alias(
            "is_anomaly"
        ),
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    by=None,
) -> DataFrame:
    """Kaplan-Meier survival curve over right-censored durations:
    ``by`` cols + ``(t, n_risk, n_events, n_censored, survival)`` —
    the retention/churn estimator that handles still-active entities
    correctly (a plain "fraction surviving past t" is biased by
    censoring). ``event_col`` truthy = the event (churn/death) was
    observed at ``duration_col``; falsy = censored there.

    survival(t) = PROD over event times t_i <= t of (1 - d_i / n_i),
    with n_i the at-risk count just before t_i.

    Scale: durations aggregate to a (group, t) table FIRST (bounded by
    distinct durations — bucket to days/weeks upstream for continuous
    data, the binary_auc histogram contract), then two running-sum
    windows over that bounded table; the raw frame never sorts.

    Determinism: each factor's ln((n-d)/n) is snapped to integer
    micro-units with the floor form and summed as BIGINTs; survival is
    fround(exp(sum/1e6), 6) — the dsir/BLEU grid-snapped-exponent
    contract. Groups extinguished at some t (d = n) emit exactly 0.0
    from there on (ln is never taken at 0).
    """
    from .dedup import fround

    by = [by] if isinstance(by, str) else list(by or [])
    ev = F.col(event_col)
    g = (
        df.where(F.col(duration_col).isNotNull() & ev.isNotNull())
        .groupBy(*by, F.col(duration_col).cast("long").alias("t"))
        .agg(
            F.count(F.when(ev.cast("boolean"), 1)).alias("n_events"),
            F.count(F.when(~ev.cast("boolean"), 1)).alias("n_censored"),
        )
        # the (group, t) table is BOUNDED by contract (distinct
        # durations; bucket continuous data upstream) and feeds TWO
        # chained prefix sums with two consumers each — without a
        # barrier the raw scan+agg re-derives 8x (measured in the r5
        # plan audit)
        .localCheckpoint(eager=True)
    )
    # descending cumsum via the two-phase prefix sum over the NEGATED
    # duration (the r5 spearman sf1 stall class: one per-group ordered
    # window buffers the whole duration histogram in a single task on
    # near-continuous durations)
    from .dedup import bucketed_running_sums

    g = bucketed_running_sums(
        g.withColumn("__nt__", -F.col("t")).withColumn(
            "__cq__", F.col("n_events") + F.col("n_censored")
        ),
        by,
        "__nt__",
        ["__cq__"],
    ).select(
        *by,
        "t",
        "n_events",
        "n_censored",
        F.col("__cum0__").alias("n_risk"),
    )
    term = F.when(
        (F.col("n_events") > 0) & (F.col("n_events") < F.col("n_risk")),
        F.floor(
            F.log(
                (F.col("n_risk") - F.col("n_events")).cast("double")
                / F.col("n_risk").cast("double")
            )
            * F.lit(1000000.0)
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    dead = F.when(F.col("n_events") == F.col("n_risk"), 1).otherwise(0)
    # ascending cumsums of the ln-term and the extinction flag (running
    # max of a 0/1 flag == running sum > 0) — same two-phase form
    cum2 = bucketed_running_sums(
        g.withColumn("__term__", term).withColumn("__dd__", dead),
        by,
        "t",
        ["__term__", "__dd__"],
    )
    out = cum2.select(
        *by,
        "t",
        "n_risk",
        "n_events",
        "n_censored",
        F.col("__cum0__").alias("__lns__"),
        F.when(F.col("__cum1__") > 0, 1).otherwise(0).alias("__dead__"),
    )
    return out.select(
        *by,
        "t",
        "n_risk",
        "n_events",
        "n_censored",
        F.when(F.col("__dead__") == 1, F.lit(0.0))
        .otherwise(fround(F.exp(F.col("__lns__") / F.lit(1000000.0)), 6))
        .alias("survival"),
    )


def cusum_changepoints(
    df: DataFrame,
    ts_col: str,
    threshold: float = 5.0,
    slack: float = 0.0,
) -> DataFrame:
    """Two-sided CUSUM over the daily event-count series — the
    level-shift / changepoint detector that complements
    :func:`seasonal_baseline`'s pointwise z-scores (CUSUM accumulates
    small sustained drifts a per-point gate never sees). Output: one
    row per day with ``t, x, cusum_pos, cusum_neg, is_alarm``
    (is_alarm when either side exceeds ``threshold`` in value units).

    The recursive definition S_t = max(0, S_{t-1} + (x_t - mean -
    slack)) is evaluated CLOSED-FORM via the prefix-min identity
    S_t = P_t - min_{j<=t} P_j with P the running sum of deviations —
    two windows, no recursion, no driver loop.

    Exactness: deviations are scaled by n (x_j*n - total - slack*n on
    the integer grid), so every prefix sum / min / max is an exact
    integer; the emitted cusum values are tie-proof integer ratios
    over n.

    Scale: everything after the one groupBy(day) runs on the bounded
    day table (windows over days, not rows).
    """
    from .dedup import round4_ratio

    days = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(F.to_date(F.col(ts_col)).alias("t"))
        .agg(F.count(F.lit(1)).alias("x"))
    )
    w_all = Window.partitionBy()
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    n = F.count(F.lit(1)).over(w_all)
    total = F.sum("x").over(w_all)
    slack_scaled = F.floor(F.lit(float(slack)) * n.cast("double") + F.lit(0.5)).cast(
        "long"
    )
    dev_pos = F.col("x") * n - total - slack_scaled  # scaled by n, exact
    dev_neg = total - F.col("x") * n - slack_scaled
    base = days.select(
        "t", "x", n.alias("__n__"),
        dev_pos.alias("__dp__"), dev_neg.alias("__dn__"),
    )
    # two selects: a window function can't nest inside another window
    prefixed = base.select(
        "t",
        "x",
        "__n__",
        F.sum("__dp__").over(w_cum).alias("__pp__"),
        F.sum("__dn__").over(w_cum).alias("__pn__"),
    )
    # S_t = P_t - min(0, min_{j<=t} P_j)  (P_0 = 0 enters via the clamp)
    scored = prefixed.select(
        "t",
        "x",
        "__n__",
        (
            F.col("__pp__")
            - F.least(F.min("__pp__").over(w_cum), F.lit(0).cast("long"))
        ).alias("__sp__"),
        (
            F.col("__pn__")
            - F.least(F.min("__pn__").over(w_cum), F.lit(0).cast("long"))
        ).alias("__sn__"),
    )
    cp = round4_ratio(F.col("__sp__"), F.col("__n__"))
    cn = round4_ratio(F.col("__sn__"), F.col("__n__"))
    return scored.select(
        "t",
        "x",
        cp.alias("cusum_pos"),
        cn.alias("cusum_neg"),
        ((cp > F.lit(float(threshold))) | (cn > F.lit(float(threshold)))).alias(
            "is_alarm"
        ),
    )


def period_over_period(
    df: DataFrame,
    ts_col: str,
    value_col: str | None = None,
    grain: str = "month",
    by=None,
) -> DataFrame:
    """Per-period rollup with the previous-period comparison — the
    MoM/WoW dashboard staple: ``by`` cols + ``period, value, prev,
    delta, pct_change`` (pct NULL on the first period or prev = 0).
    ``value_col=None`` counts rows; otherwise sums the column on the
    exact micro-unit grid.

    Exactness: values are exact integers (counts) or exact micro-unit
    DECIMAL sums; delta is exact; pct_change = fround(delta/prev, 4)
    over exact-rational doubles.

    Scale: one map-side-combined groupBy to the bounded period table +
    one lag window over it.
    """
    from .dedup import fround

    by = [by] if isinstance(by, str) else list(by or [])
    period = F.date_trunc(grain, F.col(ts_col)).alias("period")
    if value_col is None:
        agg = F.count(F.lit(1)).cast("decimal(38,0)")
    else:
        v = F.col(value_col).cast("double")
        agg = F.sum(
            F.floor(v * F.lit(1000000.0) + F.lit(0.5)).cast("decimal(38,0)")
        )
    g = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(*by, period)
        .agg(agg.alias("__v__"))
    )
    w = Window.partitionBy(*by).orderBy("period")
    scale = 1.0 if value_col is None else 1000000.0
    out = g.select(
        *by,
        "period",
        (F.col("__v__").cast("double") / F.lit(scale)).alias("value"),
        (F.lag("__v__").over(w)).alias("__p__"),
    )
    prev = F.col("__p__").cast("double") / F.lit(scale)
    delta = (F.col("__v__").cast("double") / F.lit(scale)) - prev
    return out.select(
        *by,
        "period",
        "value",
        prev.alias("prev"),
        (F.col("value") - prev).alias("delta"),
        F.when(
            F.col("__p__").isNotNull() & (F.col("__p__") != 0),
            fround((F.col("value") - prev) / prev, 4),
        ).alias("pct_change"),
    )


def ewma(
    df: DataFrame,
    ts_col: str,
    window: int = 14,
    alpha: float = 0.3,
) -> DataFrame:
    """(t, x, ewma) — truncated exponentially-weighted moving average
    of the daily event count (weights alpha·(1-alpha)^j for lags
    j = 0..window-1, renormalized over the lags actually available) —
    the smooth trend line under :func:`cusum_changepoints`'s alarms.

    Determinism: the weight grid is PYTHON-PRECOMPUTED integer
    micro-units shared verbatim with the oracle (the retrieval_metrics
    discount contract), so numerator and normalizer are exact integer
    sums; ewma is the tie-proof floor ratio at 4 dp.

    Scale: one groupBy(day) + ``window`` lag expressions over the
    bounded day table (one window pass).
    """
    from .dedup import round4_ratio

    w_micro = [
        int(round(alpha * ((1.0 - alpha) ** j) * 1000000))
        for j in range(window)
    ]
    days = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(F.to_date(F.col(ts_col)).alias("t"))
        .agg(F.count(F.lit(1)).alias("x"))
    )
    w_ord = Window.orderBy("t")
    num, den = None, None
    for j, wm in enumerate(w_micro):
        lagged = F.lag(F.col("x"), j).over(w_ord) if j else F.col("x")
        term = F.when(lagged.isNotNull(), lagged * F.lit(wm))
        nterm = F.when(lagged.isNotNull(), F.lit(wm)).otherwise(F.lit(0))
        num = term if num is None else F.coalesce(term, F.lit(0)) + num
        den = nterm if den is None else nterm + den
    # fixed fold order: j descending outermost — mirrored in the oracle
    return days.select(
        "t",
        "x",
        round4_ratio(
            F.coalesce(num, F.lit(0)).cast("double"), den.cast("double")
        ).alias("ewma"),
    )


def acf(
    df: DataFrame,
    order_col: str,
    value_col: str,
    max_lag: int = 12,
    grid: float = 100.0,
) -> DataFrame:
    """(lag, n_pairs, acf) for lags 1..``max_lag`` — the sample
    autocorrelation function of a REGULAR series (``order_col`` defines
    the sequence; the op indexes rows 1..n by its order, so pass an
    already-aggregated, gap-free series — :func:`gap_fill` first if the
    spine has holes). The seasonality/memory diagnostic: a spike at lag
    24 on hourly counts is the daily cycle; slow decay means trend.

    Uses the standard full-series-mean estimator
    ``r_k = Σ_{t≤n−k}(x_t−x̄)(x_{t+k}−x̄) / Σ_t(x_t−x̄)²``.

    Exactness: values snap to the integer ``grid`` (cents by default);
    with S=Σm, SS=Σm², H_k/T_k the head/tail sums and M_k = Σ m_t·m_{t+k},
    the estimator is the exact integer rational
    ``(n²·M_k − n·S·(H_k+T_k) + (n−k)·S²) / (n·(n·SS − S²))`` — every
    term an order-independent DECIMAL(38) sum, one final double divide,
    frounded to 6 dp.

    Scale: the series is an AGGREGATED frame (periods, not events), so
    the row_number window and the lag self-join run on a bounded table
    — the bootstrap-replicates contract. The lag join is one equi-join
    on the shifted index after a 1..max_lag explode (max_lag·n rows).
    """
    if max_lag < 1:
        raise ValueError("max_lag must be >= 1")
    d38 = "decimal(38,0)"
    w = Window.orderBy(order_col)
    series = df.select(
        F.row_number().over(w).alias("__t__"),
        F.floor(
            F.col(value_col).cast("double") * F.lit(float(grid)) + F.lit(0.5)
        )
        .cast("long")
        .alias("__m__"),
    ).localCheckpoint(eager=True)  # consumed 3x with different pruning
    stats = series.agg(
        F.count(F.lit(1)).alias("__n__"),
        F.sum(F.col("__m__").cast(d38)).alias("__s__"),
        F.sum(F.col("__m__").cast(d38) * F.col("__m__")).alias("__ss__"),
    )
    lagged = series.select(
        "__t__",
        "__m__",
        F.explode(F.sequence(F.lit(1), F.lit(int(max_lag)))).alias("lag"),
    ).select((F.col("__t__") + F.col("lag")).alias("__t2__"), "lag", "__m__")
    pairs = lagged.join(
        series.select(
            F.col("__t__").alias("__t2__"), F.col("__m__").alias("__m2__")
        ),
        on="__t2__",
    )
    per_lag = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col("__m__").cast(d38) * F.col("__m2__")).alias("__mm__"),
        F.sum(F.col("__m__").cast(d38)).alias("__h__"),
        F.sum(F.col("__m2__").cast(d38)).alias("__tl__"),
    )
    from .dedup import fround

    j = per_lag.crossJoin(F.broadcast(stats))
    n_d = F.col("__n__").cast(d38)
    num = (
        n_d * n_d * F.col("__mm__")
        - n_d * F.col("__s__") * (F.col("__h__") + F.col("__tl__"))
        + (n_d - F.col("lag")) * F.col("__s__") * F.col("__s__")
    ).cast("double")
    den = (n_d * (n_d * F.col("__ss__") - F.col("__s__") * F.col("__s__"))).cast(
        "double"
    )
    return j.select(
        F.col("lag").cast("int").alias("lag"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.when(den > 0, fround(num / den, 6)).alias("acf"),
    ).orderBy("lag")


def attribution(
    events: DataFrame,
    group_col: str,
    ts_col: str,
    event_col: str,
    conversion: str,
    model: str = "last_touch",
    lookback_seconds=None,
) -> DataFrame:
    """Multi-touch marketing/journey attribution: every ``conversion``
    event distributes one unit of credit over the SAME entity's
    preceding touch events (optionally within ``lookback_seconds``),
    and credit rolls up per touch channel. Models: ``first_touch`` /
    ``last_touch`` (the full unit to the earliest/latest touch, ties to
    the lexicographically-first channel), ``linear`` (1/k to each of
    the k touches). Output: ``(channel, n_touches, credit)`` —
    Σ credit = the attributed-conversion count (up to the 1e-12 floor
    grid per linear split).

    Exactness: per-touch credit is the exact integer
    ``floor(1e12 / k)`` (or the full 1e12) — never a float 1/k — so the
    rollup sum is order-independent and the final /1e12 division is the
    only (correctly-rounded) float op; a DuckDB oracle reproduces every
    credit exactly. A conversion with zero in-window touches earns no
    row (documented: "unattributed" is the count gap vs the conversion
    total).

    Scale: one equi-join on the entity with a timestamp range predicate
    (touch volume per conversion is lookback-bounded); k and the
    first/last pick run per (entity, conversion) — group sizes are
    lookback-bounded, so the window is skew-safe for any sane lookback
    (a bot entity's valve is the same max-events note as match_steps)."""
    if model not in ("first_touch", "last_touch", "linear"):
        raise ValueError(f"unknown attribution model: {model}")
    g, ts, ev = F.col(group_col), F.col(ts_col).cast("timestamp"), F.col(event_col)
    base = events.where(
        g.isNotNull() & ts.isNotNull() & ev.isNotNull()
    ).select(
        g.alias("__g__"),
        F.unix_micros(ts).alias("__us__"),
        ev.cast("string").alias("__e__"),
    )
    convs = base.where(F.col("__e__") == conversion).select(
        "__g__", F.col("__us__").alias("__cus__")
    )
    touches = base.where(F.col("__e__") != conversion).select(
        "__g__",
        F.col("__us__").alias("__tus__"),
        F.col("__e__").alias("channel"),
    )
    cond = F.col("__tus__") < F.col("__cus__")
    if lookback_seconds is not None:
        lb = int(float(lookback_seconds) * 1_000_000)
        cond = cond & (F.col("__tus__") >= F.col("__cus__") - F.lit(lb))
    pairs = touches.join(convs, on="__g__").where(cond)
    if model == "linear":
        # k as a count window over the same lookback-bounded
        # (entity, conversion) partition the first/last models already
        # window over — one exchange instead of the groupBy-k +
        # join-back double shuffle (r9; identical integer credits)
        wk = Window.partitionBy("__g__", "__cus__")
        credited = pairs.withColumn(
            "__k__", F.count(F.lit(1)).over(wk)
        ).select(
            "channel",
            F.expr("1000000000000L DIV __k__").alias("__credit__"),
        )
    else:
        order = (
            [F.col("__tus__").asc(), F.col("channel").asc()]
            if model == "first_touch"
            else [F.col("__tus__").desc(), F.col("channel").asc()]
        )
        w = Window.partitionBy("__g__", "__cus__").orderBy(*order)
        credited = (
            pairs.withColumn("__rn__", F.row_number().over(w))
            .where(F.col("__rn__") == 1)
            .select("channel", F.lit(1000000000000).alias("__credit__"))
        )
    return credited.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        (
            # DECIMAL: 1e12-unit credits overflow int64 past ~9M pairs
            F.sum(F.col("__credit__").cast("decimal(38,0)")).cast("double")
            / F.lit(1000000000000.0)
        ).alias("credit"),
    )
