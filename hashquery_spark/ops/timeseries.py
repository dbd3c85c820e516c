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

from pyspark.sql import DataFrame
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
