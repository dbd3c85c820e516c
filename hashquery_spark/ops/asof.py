"""As-of (temporal) join — net-new custom operator the reference lacks.

For each left row, find the most recent right row (per key) whose
timestamp is <= (backward) or the earliest >= (forward) the left
timestamp. Implemented as a composition of existing DataFrame ops — the
union-sort-window technique:

1. tag both sides and union on (key, ts, side, right-payload, left-row) —
   each side carries the other's columns as NULL;
2. one window per key ordered by (ts, side): ``last(payload,
   ignorenulls=True)`` up to the current row fills each left row with the
   latest preceding right payload;
3. keep the left rows and unpack their carried struct — no join-back.

Cost: ONE shuffle on the key (the window), versus a naive range-join's
per-key cross product. This is the standard scale formulation for
point-in-time joins (feature lookups, slowly-changing dims). DuckDB's
native ASOF JOIN serves as the oracle.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: Optional[List[str]] = None,
    direction: str = "backward",
    tolerance_seconds: Optional[float] = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Returns all left columns plus ``<right_col><suffix>`` for each
    requested right column (NULL when no match). ``direction='backward'``
    matches the latest right row with ts <= left ts; ``'forward'`` the
    earliest with ts >= left ts. ``tolerance_seconds`` bounds the gap."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]

    l_struct = F.struct(*[F.col(c).alias(c) for c in left.columns])
    l = left.select(
        F.col(on).alias("__k__"),
        F.col(left_ts).alias("__ts__"),
        F.lit(1).alias("__side__"),
        l_struct.alias("__lrow__"),
    )
    r_payload = F.struct(
        F.col(right_ts).alias("__ats__"), *[F.col(c).alias(c) for c in right_cols]
    )
    r = right.select(
        F.col(on).alias("__k__"),
        F.col(right_ts).alias("__ts__"),
        F.lit(0).alias("__side__"),
        F.lit(None).cast(l.schema["__lrow__"].dataType).alias("__lrow__"),
        r_payload.alias("__p__"),
    )
    l = l.withColumn("__p__", F.lit(None).cast(r.schema["__p__"].dataType))

    unioned = r.unionByName(l)
    ts_order = F.col("__ts__").asc() if direction == "backward" else F.col("__ts__").desc()
    # right rows sort before left rows at equal ts, so ties match (<= / >=)
    w = (
        Window.partitionBy("__k__")
        .orderBy(ts_order, F.col("__side__").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn("__m__", F.last("__p__", ignorenulls=True).over(w))

    match = F.col("__m__")
    if tolerance_seconds is not None:
        gap = F.abs(
            F.unix_timestamp(match["__ats__"]) - F.unix_timestamp(F.col("__ts__"))
        )
        match = F.when(gap <= F.lit(tolerance_seconds), match)

    out = filled.where(F.col("__side__") == 1).select(
        F.col("__lrow__.*"),
        *[match[c].alias(f"{c}{suffix}") for c in right_cols],
    )
    return out
