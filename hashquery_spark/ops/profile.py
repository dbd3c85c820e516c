"""One-pass table profiling: per-column row/null/distinct counts and
min/max, returned in long format (net-new; the closest reference surface
is its reflection-based schema probe, src/run/db/reflection.py:17-84,
which only discovers names/types — this op profiles the *data*).

Scale notes: ALL per-column statistics compile into ONE global aggregate
over ONE scan — Spark plans the multiple exact count(DISTINCT) via a
single Expand (rows multiply by the number of distinct aggregates, then
partial-aggregate map-side before the one shuffle). At extreme scale pass
``approx=True`` to swap exact distincts for HyperLogLog++
approx_count_distinct, which removes the Expand entirely; the exact
variant is the oracle-checkable default. The wide 1-row aggregate is then
unpivoted driver-free with ``stack`` — no per-column jobs, unlike
``df.summary()`` which cannot do distincts at all.

min/max are cast to string AFTER aggregating on the native type (so
ordering is native, rendering is uniform). Profile integer/string columns
for cross-engine parity — float rendering differs between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def profile_table(df: DataFrame, cols=None, approx: bool = False) -> DataFrame:
    """(column_name, n_rows, n_nonnull, n_null, n_distinct, min_value,
    max_value) — one row per profiled column, one scan total."""
    cols = list(cols) if cols is not None else df.columns
    distinct = (
        "approx_count_distinct(`{c}`)" if approx else "count(DISTINCT `{c}`)"
    )
    aggs = ["count(*) AS n_rows"]
    for c in cols:
        aggs += [
            f"count(`{c}`) AS __nn_{c}",
            distinct.format(c=c) + f" AS __nd_{c}",
            f"CAST(min(`{c}`) AS STRING) AS __mn_{c}",
            f"CAST(max(`{c}`) AS STRING) AS __mx_{c}",
        ]
    # ONE selectExpr over a global aggregate: selectExpr with aggregate
    # functions implies a global agg in Spark SQL
    wide = df.selectExpr(*aggs)
    stack_args = []
    for c in cols:
        stack_args.append(f"'{c}', __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}")
    long = wide.selectExpr(
        "n_rows",
        f"stack({len(cols)}, {', '.join(stack_args)}) AS "
        "(column_name, n_nonnull, n_distinct, min_value, max_value)",
    )
    return long.selectExpr(
        "column_name",
        "n_rows",
        "n_nonnull",
        "n_rows - n_nonnull AS n_null",
        "n_distinct",
        "min_value",
        "max_value",
    )
