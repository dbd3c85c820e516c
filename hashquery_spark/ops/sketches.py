"""Mergeable DataSketches operators (Apache DataSketches via Spark 4's
native ``hll_sketch_agg`` / ``theta_sketch_agg`` / ``kll_sketch_agg_*``
SQL functions) — the 100 TB answer to "keep distinct counts, quantiles,
and set overlaps INCREMENTALLY maintainable".

Why sketches and not exact aggregates: an exact distinct count can't be
rolled up (distincts don't sum), so incremental pipelines either rescan
history or store exploded key sets. A sketch is a small mergeable binary:
store one per (fine-grained key, partition/day), then ``merge`` answers
any coarser grouping or any longer time range WITHOUT touching raw data —
the refresh_rollup story extended to distincts and quantiles.

Determinism: DataSketches HLL/Theta/KLL are hash-based and
insertion-order independent, so estimates are bit-stable under any
partitioning (unit-tested: merged-by-parts == direct). Estimates are
engine-specific, so driver oracles use the approx_distinct within-band
contract: emit the EXACT value plus an in-band boolean.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sketch_rollup(
    df: DataFrame,
    keys,
    col: str,
    lgk: int = 12,
) -> DataFrame:
    """(keys…, n_rows, distinct_sketch, n_distinct_est) — per-key row
    counts plus a mergeable HLL distinct sketch of ``col`` (lgK=12 ⇒
    ~1.6% relative standard error in ~4 KB). Store this instead of raw
    keys; :func:`merge_sketch_rollup` rolls it up later."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.hll_sketch_agg(F.col(col), F.lit(int(lgk))).alias("distinct_sketch"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col(col), F.lit(int(lgk)))
        ).alias("n_distinct_est"),
    )


def merge_sketch_rollup(parts: DataFrame, keys) -> DataFrame:
    """Roll stored sketch partials up to coarser keys — sums the row
    counts and UNIONs the HLL sketches; never rescans raw data. Input is
    :func:`sketch_rollup` output (or a union of many stored snapshots of
    it)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    return parts.groupBy(*keys).agg(
        F.sum("n_rows").alias("n_rows"),
        F.hll_union_agg(F.col("distinct_sketch")).alias("distinct_sketch"),
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col("distinct_sketch"))
        ).alias("n_distinct_est"),
    )


def corpus_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
) -> DataFrame:
    """One row: Theta-sketch distinct estimates for each side plus their
    intersection/union and the derived Jaccard — the cheap first answer
    to "how much does corpus B overlap corpus A?" before any pairwise
    dedup. Theta (unlike HLL) supports set INTERSECTION, which is the
    point: |A∩B| without ever joining A to B.

    Scale: each side reduces to one ~KB sketch in a single aggregate;
    the set algebra happens on two 1-row frames. Exactness: estimates
    only (emit alongside exact counts for toy-SF oracles)."""
    a = df_a.agg(F.theta_sketch_agg(F.col(col)).alias("__ska__"))
    b = df_b.agg(F.theta_sketch_agg(F.col(col)).alias("__skb__"))
    both = a.crossJoin(F.broadcast(b))
    inter = F.theta_sketch_estimate(
        F.theta_intersection(F.col("__ska__"), F.col("__skb__"))
    )
    union = F.theta_sketch_estimate(
        F.theta_union(F.col("__ska__"), F.col("__skb__"))
    )
    return both.select(
        F.theta_sketch_estimate(F.col("__ska__")).alias("est_a"),
        F.theta_sketch_estimate(F.col("__skb__")).alias("est_b"),
        inter.alias("est_intersection"),
        union.alias("est_union"),
        (inter.cast("double") / union.cast("double")).alias("jaccard_est"),
    )


def kll_quantiles(
    df: DataFrame,
    col: str,
    probs=(0.25, 0.5, 0.75, 0.9),
    by=None,
    k: int = 800,
) -> DataFrame:
    """(group…, prob, value) — MERGEABLE quantile estimates via KLL
    sketches (rank error ~1.7%/k=200-scaled; k=800 ⇒ ~0.4%). Unlike
    ``percentile_approx`` (whose GK sketch exists only inside one query),
    the KLL binary can be STORED per partition/day and merged later —
    pair with :func:`sketch_rollup` for incrementally-maintained
    distribution monitoring."""
    by = [by] if isinstance(by, str) else list(by or [])
    probs = [float(p) for p in probs]
    sk = F.kll_sketch_agg_double(F.col(col).cast("double"), F.lit(int(k)))
    agg = df.groupBy(*by).agg(sk.alias("__kll__"))
    pieces = []
    for p in probs:
        pieces.append(
            f"{p!r}D, kll_sketch_get_quantile_double(__kll__, {p!r}D)"
        )
    stack = f"stack({len(probs)}, " + ", ".join(pieces) + ") AS (prob, value)"
    return agg.selectExpr(*by, stack)


def cms_rollup(
    df: DataFrame,
    item_col: str,
    width: int = 1024,
    depth: int = 4,
    by=None,
    weight_col: str = None,
) -> DataFrame:
    """Count-min sketch of ``item_col`` frequencies — the MERGEABLE
    frequency summary completing the sketch family (HLL = distincts,
    KLL = quantiles, theta = set ops, CMS = per-item counts): store
    ``width × depth`` integer counters per group/partition/day instead
    of a full item count table, roll up by summing counters
    (:func:`cms_merge`), answer point queries later with
    :func:`cms_query` — estimates NEVER undercount, and overcount by
    at most ~2n/width with prob 1−2^−depth (Cormode-Muthukrishnan).
    Output: group cols + ``(depth_j, slot, counter)`` rows.

    Determinism: row j's slot for an item is Kirsch-Mitzenmacher double
    hashing ``(h1 + j·h2) mod width`` from ONE md5 per DISTINCT item
    (the minhash-permutation lesson) — reproducible bit-for-bit in any
    engine, insertion-order independent (counters are sums).

    Scale: two-level aggregate — per-(group, item) counts first
    (map-side combined, bounded by vocabulary), then the depth-way
    explode runs over DISTINCT items only, never the token stream;
    final state is ≤ width·depth counters per group."""
    by = [by] if isinstance(by, str) else list(by or [])
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    item = F.col(item_col).cast("string")
    counts = (
        df.where(item.isNotNull())
        .groupBy(*by, item.alias("__it__"))
        .agg(F.sum(w).alias("__c__"))
    )
    hashed = counts.selectExpr(
        *[f"`{c}`" for c in by],
        "__c__",
        "CAST(conv(substring(md5(__it__), 1, 8), 16, 10) AS BIGINT) AS __h1__",
        "CAST(conv(substring(md5(__it__), 9, 8), 16, 10) AS BIGINT) AS __h2__",
    )
    ex = hashed.select(
        *by,
        "__c__",
        F.explode(
            F.expr(
                f"transform(sequence(0, {int(depth) - 1}), "
                f"j -> named_struct('j', j, 's', "
                f"pmod(__h1__ + j * __h2__, {int(width)})))"
            )
        ).alias("__js__"),
    )
    return ex.groupBy(
        *by,
        F.col("__js__.j").cast("int").alias("depth_j"),
        F.col("__js__.s").cast("long").alias("slot"),
    ).agg(F.sum("__c__").cast("long").alias("counter"))


def cms_merge(parts: DataFrame, by=None) -> DataFrame:
    """Roll stored :func:`cms_rollup` partials up to coarser keys —
    counters simply sum (the CMS mergeability property); never rescans
    raw data. Sketches must share width/depth."""
    by = [by] if isinstance(by, str) else list(by or [])
    return parts.groupBy(*by, "depth_j", "slot").agg(
        F.sum("counter").cast("long").alias("counter")
    )


def cms_query(
    sketch: DataFrame,
    items,
    width: int = 1024,
    depth: int = 4,
    by=None,
) -> DataFrame:
    """Point-estimate item frequencies from a :func:`cms_rollup` sketch:
    ``est = min_j counter[(h1 + j·h2) mod width]`` (absent slot = 0).
    ``items`` is a python list of item strings (bounded, broadcast) or a
    1-column DataFrame of items. Output: group cols + ``(item,
    est_count)`` — an OVERESTIMATE of the true count, never an
    undercount."""
    by = [by] if isinstance(by, str) else list(by or [])
    spark = sketch.sparkSession
    if not isinstance(items, DataFrame):
        items = spark.createDataFrame(
            [(str(x),) for x in items], "item string"
        )
    else:
        items = items.toDF("item")
    probes = items.selectExpr(
        "item",
        "CAST(conv(substring(md5(item), 1, 8), 16, 10) AS BIGINT) AS __h1__",
        "CAST(conv(substring(md5(item), 9, 8), 16, 10) AS BIGINT) AS __h2__",
    ).select(
        "item",
        F.explode(
            F.expr(
                f"transform(sequence(0, {int(depth) - 1}), "
                f"j -> named_struct('j', j, 's', "
                f"pmod(__h1__ + j * __h2__, {int(width)})))"
            )
        ).alias("__js__"),
    ).select(
        "item",
        F.col("__js__.j").cast("int").alias("depth_j"),
        F.col("__js__.s").cast("long").alias("slot"),
    )
    # every (group, item, depth) combination must exist BEFORE the
    # left join — an absent counter row means "slot never hit" and
    # estimates 0 at that depth, which a plain join would silently drop
    if by:
        probes = sketch.select(*by).distinct().crossJoin(probes)
    joined = probes.join(
        sketch, on=by + ["depth_j", "slot"], how="left"
    )
    return joined.groupBy(*by, "item").agg(
        F.min(F.coalesce(F.col("counter"), F.lit(0))).cast("long").alias(
            "est_count"
        )
    )


def heavy_hitters(
    df: DataFrame,
    item_col: str,
    k: int = 10,
    by=None,
    max_tracked: int = 10000,
) -> DataFrame:
    """Per-group frequent items via Spark's ``approx_top_k`` sketch
    (Misra-Gries-family; counts are EXACT whenever a group's distinct
    items fit in ``max_tracked``, and over-estimates by at most the
    eviction error otherwise). Output: group cols + ``(item, est_count,
    rank)`` with rank ≤ k.

    The sketch's own top-k tie order is nondeterministic, so the op
    over-fetches (``min(4k, max_tracked)``) and re-ranks
    deterministically by (est_count desc, item asc) — for
    bounded-cardinality columns the result is therefore the exact
    deterministic top-k (oracle-checkable); for heavy-tailed columns
    it is the standard sketch contract. ``approx_top_k_accumulate`` /
    ``_combine`` / ``_estimate`` exist for mergeable rollups of the
    same sketch (the sketch_rollup pattern).

    Scale: ONE aggregate (partial-mergeable sketch, map-side combined,
    state bounded by max_tracked) + a window over ≤ min(4k, max_tracked)
    rows per group. No full (group, item) count table — the exact
    ``vocabulary`` op's shuffle is what this avoids at 100 TB.
    """
    from pyspark.sql import Window

    by = [by] if isinstance(by, str) else list(by or [])
    fetch = min(max(4 * k, k + 8), max_tracked)
    agg = df.where(F.col(item_col).isNotNull()).groupBy(*by).agg(
        F.expr(
            f"approx_top_k(`{item_col}`, {int(fetch)}, {int(max_tracked)})"
        ).alias("__tk__")
    )
    ex = agg.select(*by, F.explode("__tk__").alias("__e__")).select(
        *by,
        F.col("__e__.item").alias(item_col),
        F.col("__e__.count").cast("long").alias("est_count"),
    )
    w = Window.partitionBy(*by).orderBy(
        F.desc("est_count"), F.asc(item_col)
    )
    return (
        ex.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(*by, item_col, "est_count", "rank")
    )
