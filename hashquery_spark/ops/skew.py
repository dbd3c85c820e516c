"""Skew-handling utilities for hot keys.

AQE's skew-join handling (enabled by default in connection.default_session)
covers sort-merge joins; these helpers cover the remaining hot spots:

* :func:`salted_aggregate` — two-stage aggregation for group-bys where a
  handful of keys hold most rows (classic: user_id with one bot user).
  Stage 1 aggregates on (key, salt) spreading each hot key over ``salts``
  reducers; stage 2 merges the partials per key. Only algebraic aggregates
  (count/sum/min/max) are supported — they re-aggregate losslessly.
* :func:`salted_join` — replicate the small side per salt so a skewed
  equi-join spreads each hot key over ``salts`` tasks.

Salts derive from a deterministic hash of the whole row (pmod of xxhash64),
not rand(), so retried tasks produce identical output.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERGE = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
_PARTIAL = {"count": F.count, "sum": F.sum, "min": F.min, "max": F.max}


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Dict[str, tuple],
    salts: int = 16,
) -> DataFrame:
    """``aggs``: out_name -> (fn, col) with fn in count/sum/min/max.

    Example::

        salted_aggregate(events, ["user_id"],
                         {"n": ("count", "*"), "total": ("sum", "value")})
    """
    for name, (fn, _) in aggs.items():
        if fn not in _PARTIAL:
            raise ValueError(
                f"{name}: {fn!r} is not algebraic; salted re-aggregation "
                "supports count/sum/min/max"
            )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salts))
    salted = df.withColumn("__salt__", salt)
    partial = salted.groupBy(*keys, "__salt__").agg(
        *[
            _PARTIAL[fn](F.lit(1) if col == "*" else F.col(col)).alias(f"__p_{name}__")
            for name, (fn, col) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _MERGE[fn](F.col(f"__p_{name}__")).alias(name)
            for name, (fn, _) in aggs.items()
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salts: int = 16,
) -> DataFrame:
    """Skewed equi-join: salt the big side, replicate the small side per
    salt value, join on (key, salt). Each hot key spreads over ``salts``
    tasks instead of one. Prefer AQE skew-join when it applies; this is
    for engines/paths where it doesn't (e.g. forced shuffle-hash joins)."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salts))
    big_s = big.withColumn("__salt__", salt)
    small_s = small.crossJoin(
        F.broadcast(
            big.sparkSession.range(salts).select(F.col("id").cast("int").alias("__salt__"))
        )
    )
    out = big_s.join(small_s, on=[on, "__salt__"], how=how)
    return out.drop("__salt__")
