"""Bucketed range join — net-new custom operator.

Joins points to intervals (``lo <= point < hi``) without the
all-pairs nested-loop a naive inequality join degenerates into: both sides
bucketize by ``bucket_width`` — each point lands in ONE bucket, each
interval replicates into every bucket it overlaps — the join becomes an
equi-join on the bucket id, and the exact containment predicate filters
within buckets.

Cost: interval replication factor = avg(interval span / bucket_width); the
join itself shuffles on uniform integer buckets (no skew unless the data
is). Pick ``bucket_width`` near the typical interval span so the
replication factor stays O(1). This is the standard scale formulation for
interval lookups (IP ranges, price bands, time windows) when there is no
equi-key to piggyback on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """All columns of both inputs for every (point, interval) pair with
    ``lo <= point < hi`` (half-open). ``how='left'`` keeps unmatched
    points with NULL interval columns."""
    p_bucket = F.floor(F.col(point_col) / F.lit(bucket_width)).cast("long")
    p = points.withColumn("__bucket__", p_bucket)

    lo_b = F.floor(F.col(lo_col) / F.lit(bucket_width)).cast("long")
    hi_b = F.floor(
        # hi is exclusive: an interval ending exactly on a bucket boundary
        # does not reach into the next bucket
        (F.col(hi_col) - F.lit(1e-9)) / F.lit(bucket_width)
    ).cast("long")
    i = intervals.withColumn(
        "__bucket__", F.explode(F.sequence(lo_b, F.greatest(hi_b, lo_b)))
    )

    cond = (
        (p["__bucket__"] == i["__bucket__"])
        & (p[point_col] >= i[lo_col])
        & (p[point_col] < i[hi_col])
    )
    out = p.join(i, on=cond, how=how)
    return out.drop("__bucket__")


def validity_join(
    facts: DataFrame,
    dim: DataFrame,
    on,
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """SCD-2 (slowly-changing-dimension) temporal-validity join: each fact
    row matches the dimension VERSION whose half-open
    ``[valid_from, valid_to)`` interval contains the fact's timestamp; a
    NULL ``valid_to`` marks the open-ended current version. The standard
    warehouse point-in-time lookup (price lists, customer tiers, feature
    flags) — the reference joins only on exact predicates
    (src/model/source/join_one.py:8), and an equality join against a
    versioned dim silently fans out.

    Scale: the version key(s) stay an EQUI-join (hash/broadcast — never a
    nested loop; Catalyst keeps the interval predicates as join filters),
    so this shuffles exactly like a plain dim join. Caller contract: dim
    versions per key must not overlap, or facts duplicate — check with
    ``check_constraints`` upstream.
    """
    on = [on] if isinstance(on, str) else list(on)
    f, d = facts.alias("__f__"), dim.alias("__d__")
    cond = None
    for k in on:
        c = F.col(f"__f__.{k}") == F.col(f"__d__.{k}")
        cond = c if cond is None else (cond & c)
    ts = F.col(f"__f__.{ts_col}")
    cond = cond & (ts >= F.col(f"__d__.{valid_from}"))
    cond = cond & (
        F.col(f"__d__.{valid_to}").isNull() | (ts < F.col(f"__d__.{valid_to}"))
    )
    payload = [c for c in dim.columns if c not in set(on)]
    return f.join(d, on=cond, how=how).select(
        "__f__.*", *[F.col(f"__d__.{c}").alias(c) for c in payload]
    )
