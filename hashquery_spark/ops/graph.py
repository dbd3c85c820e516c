"""Link-graph operators for crawl prioritization — degree centrality and
PageRank over an edge table (net-new; the reference has no graph surface).
Production data pipelines rank crawl frontiers / hosts by exactly these
signals (Common Crawl publishes host-level PageRank for corpus filtering).

Scale design:

* ``degree_centrality`` is two partial-combined groupBys unioned by a
  full-outer merge on the node key — edges shuffle once per direction as
  (node, long) pairs.
* ``pagerank`` is the standard synchronous iteration with the rank vector
  as a DataFrame (NEVER driver-collected — node count is unbounded; only
  scalar totals like the dangling mass are collected per iteration). Each
  iteration costs one contributions shuffle (join ranks→edges on src,
  groupBy dst). Out-degrees are computed once; the rank frame is
  localCheckpoint'ed each iteration so the logical plan stays bounded
  (persist alone leaves the full lineage in ANALYSIS and planning cost
  grows quadratically with iterations — measured).
* Determinism: ranks live in integer nano-units (BIGINT). Per-edge
  contributions use integer division, so every sum is exact under any
  partitioning / AQE re-plan — two runs (or two cluster layouts) produce
  bit-identical ranks. The deliberate cost: floor rounding leaks ≤1 nano
  per edge out of the total mass instead of redistributing it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import fround

_UNIT = 1_000_000_000  # nano-unit rank scaling


def degree_centrality(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """(node, out_degree, in_degree) — edge-count degrees per node; nodes
    appearing only as source (or only as destination) get 0 for the other
    side. NULL endpoints are ignored."""
    out_d = (
        edges.where(F.col(src).isNotNull())
        .groupBy(F.col(src).alias("node"))
        .agg(F.count(F.lit(1)).alias("out_degree"))
    )
    in_d = (
        edges.where(F.col(dst).isNotNull())
        .groupBy(F.col(dst).alias("node"))
        .agg(F.count(F.lit(1)).alias("in_degree"))
    )
    return (
        out_d.join(in_d, on="node", how="full_outer")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )


def pagerank(
    edges: DataFrame,
    src: str,
    dst: str,
    *,
    iters: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """(node, pagerank) — damped PageRank after ``iters`` synchronous
    iterations, uniform initialization. Parallel edges count as parallel
    (a host linking twice contributes twice). Dangling-node mass is
    redistributed uniformly each iteration (the standard correction).

    Iterative with a driver loop ⇒ rows-only (no SQL oracle); pinned by
    closed-form fixtures (cycle, star) and partitioning-independence
    tests. ``pagerank`` sums to ~1 (minus ≤1 nano/edge of deliberate
    floor-rounding leak — see module docstring).
    """
    e = edges.where(
        F.col(src).isNotNull() & F.col(dst).isNotNull()
    ).select(F.col(src).alias("__src__"), F.col(dst).alias("__dst__"))
    nodes = (
        e.select(F.col("__src__").alias("node"))
        .union(e.select(F.col("__dst__").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select(
            "node", F.lit(0.0).alias("pagerank")
        )
    out_deg = e.groupBy(F.col("__src__").alias("node")).agg(
        F.count(F.lit(1)).alias("__deg__")
    )
    # (node, deg) for every node; deg NULL marks dangling nodes.
    # localCheckpoint (not persist) everywhere in the loop: persist keeps
    # the full logical lineage, so per-iteration ANALYSIS cost grows with
    # the iteration count; checkpointing truncates the plan to the
    # materialized blocks (measured: 30 iterations went from minutes of
    # planning to seconds).
    from .dedup import persisted_rdd_ids, unpersist_rdd_ids

    sc = edges.sparkSession.sparkContext
    t_pre = persisted_rdd_ids(sc)
    topo = nodes.join(out_deg, on="node", how="left").localCheckpoint(eager=True)
    nodes.unpersist()

    d_num, d_den = int(round(damping * 100)), 100  # 0.85 -> 85/100, exact
    base = ((d_den - d_num) * _UNIT) // (d_den * n_nodes)  # (1-d)/N
    pre = persisted_rdd_ids(sc)
    topo_ids = (pre - t_pre) if t_pre is not None and pre is not None else None
    # the checkpointed rank frame CARRIES __deg__ (r10): the dangling
    # aggregate then scans the persisted checkpoint directly and the
    # contribution join binds __deg__ for free, so topo is joined ONCE
    # per iteration (for all-node coverage) instead of twice plus a
    # third ranks-joins-topo evaluation inside the old dangling collect.
    ranks = topo.select(
        "node", F.lit(_UNIT // n_nodes).cast("long").alias("__r__"), "__deg__"
    ).localCheckpoint(eager=True)
    post = persisted_rdd_ids(sc)
    prev_ids = (post - pre) if pre is not None and post is not None else None
    for _ in range(iters):
        # the damped-dangling-mass share rides the plan as a broadcast
        # 1-row aggregate over the persisted checkpoint instead of a
        # driver collect (r10): its broadcast-build job reads cached
        # blocks only — no join re-evaluation. Integer math identical to
        # the collected form: Python's // on the non-negative mass ==
        # SQL DIV.
        share = ranks.where(F.col("__deg__").isNull()).agg(
            F.expr(
                f"({d_num}L * coalesce(sum(__r__), 0L))"
                f" DIV ({d_den}L * {n_nodes}L) AS __share__"
            )
        )
        contribs = (
            e.join(
                ranks.where(F.col("__deg__").isNotNull()),
                on=F.col("__src__") == F.col("node"),
            )
            # damping folded into the per-edge integer division (one
            # rounding site, deterministic)
            .select(
                F.col("__dst__").alias("node"),
                # integer DIV, not float '/': a correctly-rounded double
                # quotient can truncate to the wrong floor near integers
                F.expr(f"({d_num}L * __r__) DIV ({d_den}L * __deg__)").alias(
                    "__c__"
                ),
            )
            .groupBy("node")
            .agg(F.sum("__c__").alias("__c__"))
        )
        before = persisted_rdd_ids(sc)
        ranks = (
            topo.join(contribs, on="node", how="left")
            .crossJoin(F.broadcast(share))
            .select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.col("__share__")
                    + F.coalesce(F.col("__c__"), F.lit(0).cast("long"))
                ).alias("__r__"),
                "__deg__",
            )
            .localCheckpoint(eager=True)
        )
        after = persisted_rdd_ids(sc)
        # superseded round's checkpoint is unreachable once the new one
        # materializes — free it (r9 ADVICE storage hygiene)
        unpersist_rdd_ids(sc, prev_ids)
        prev_ids = (
            (after - before)
            if before is not None and after is not None
            else None
        )
    unpersist_rdd_ids(sc, topo_ids)
    return ranks.select(
        "node", fround(F.col("__r__") / F.lit(float(_UNIT)), 9).alias("pagerank")
    )


def triangle_count(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """One-row global triangle census of the UNDIRECTED simple graph
    under ``edges``: ``(n_nodes, n_edges, n_wedges, n_triangles,
    transitivity)`` with transitivity = 3·triangles / wedges (the global
    clustering coefficient — the spam-farm / link-ring detector on a
    crawl graph: organic link neighborhoods close triangles, farms
    don't). Self-loops and duplicate/reverse edges are collapsed first.

    Scale: the standard degree-ordered orientation (compact-forward) —
    each edge points from the lower (degree, node) rank to the higher,
    which bounds every out-neighborhood by O(sqrt(m)); wedges are the
    self-join of the oriented edge list on the source (SUM outdeg^2 =
    O(m^1.5) total work, the provably optimal join order), and each
    wedge probes the oriented edge set once. No per-node adjacency list
    is ever buffered — everything is joins over (node, node) pairs.
    All outputs are exact integers; transitivity is the tie-proof
    integer ratio.
    """
    from .dedup import round4_ratio as _r4

    a = F.least(F.col(src).cast("string"), F.col(dst).cast("string"))
    b = F.greatest(F.col(src).cast("string"), F.col(dst).cast("string"))
    # eager barrier (r9): deg (×2 via the union), withdeg, the edge and
    # node censuses all consume `und` — live lineage re-derived the
    # scan + distinct per consumer and the oriented self-join compounded
    # it to 108 parquet scans in the measured plan (verify SKILL.md
    # multi-consumer rule). The frame is the narrow deduped edge list.
    und = (
        edges.where(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .select(a.alias("__a__"), b.alias("__b__"))
        .where(F.col("__a__") != F.col("__b__"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("__a__").alias("__n__"))
        .unionAll(und.select(F.col("__b__").alias("__n__")))
        .groupBy("__n__")
        .agg(F.count(F.lit(1)).cast("long").alias("__d__"))
    )
    # orient each edge low-rank -> high-rank, rank = (degree, node)
    withdeg = (
        und.join(deg.select(F.col("__n__").alias("__a__"), F.col("__d__").alias("__da__")), on="__a__")
        .join(deg.select(F.col("__n__").alias("__b__"), F.col("__d__").alias("__db__")), on="__b__")
    )
    ra = F.struct(F.col("__da__").alias("d"), F.col("__a__").alias("n"))
    rb = F.struct(F.col("__db__").alias("d"), F.col("__b__").alias("n"))
    # three consumers (both wedge sides + the closing probe) with
    # different pruning — checkpoint so the degree joins run once
    oriented = withdeg.select(
        F.when(ra < rb, F.col("__a__")).otherwise(F.col("__b__")).alias("__s__"),
        F.when(ra < rb, F.col("__b__")).otherwise(F.col("__a__")).alias("__t__"),
        F.when(ra < rb, rb).otherwise(ra).alias("__rt__"),
    ).localCheckpoint(eager=True)
    o1 = oriented.select(
        F.col("__s__"), F.col("__t__").alias("__u__"), F.col("__rt__").alias("__ru__")
    )
    o2 = oriented.select(
        F.col("__s__"), F.col("__t__").alias("__v__"), F.col("__rt__").alias("__rv__")
    )
    wedges = o1.join(o2, on="__s__").where(F.col("__ru__") < F.col("__rv__"))
    closing = oriented.select(
        F.col("__s__").alias("__u__"), F.col("__t__").alias("__v__")
    )
    tri = wedges.join(closing, on=["__u__", "__v__"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
    counts = und.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    # DECIMAL accumulator: a 1e9-degree hub alone contributes ~5e17
    # wedges — a long SUM(d*(d-1)) would overflow where the census is
    # most interesting. Halving is exact decimal remainder-subtraction
    # (never CAST(a/b AS LONG) — the pinned floor-truncation hazard).
    nodes = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum(F.col("__d__").cast("decimal(19,0)") * (F.col("__d__") - 1)).alias(
            "__w2__"
        ),
    )
    half = (F.col("__w2__") - F.col("__w2__") % F.lit(2)) / F.lit(2)
    out = (
        nodes.crossJoin(F.broadcast(counts))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            half.cast("long").alias("n_wedges"),
            "n_triangles",
            _r4(
                3 * F.col("n_triangles"),
                F.greatest(half, F.lit(1)),
            ).alias("transitivity"),
        )
    )
    return out


def label_propagation(
    edges: DataFrame, src: str, dst: str, iters: int = 5
) -> DataFrame:
    """(node, community) — synchronous label propagation (Raghavan et
    al. 2007) over the UNDIRECTED simple graph, ``iters`` fixed rounds:
    every node adopts the most frequent label among its neighbors
    (ties -> smallest label; isolated nodes keep their own). The cheap
    community detector for crawl/link graphs — finds the dense cliques
    (mirror farms, template rings) that :func:`triangle_count` only
    counts. Labels initialize to the node id, so a community's label is
    the smallest-ish member id (data-dependent but deterministic).

    Scale: per iteration, one join of the label frame onto the
    bidirectional edge list (shuffle on the node key) + one
    groupBy(node, label) with map-side combine + one struct-min argmax
    — no collect ever touches node-cardinality data. The label frame
    localCheckpoints each round (persist leaves the full lineage in
    ANALYSIS and planning grows quadratically — measured, pinned in
    the module docstring).

    Determinism: the argmax is min(struct(-count, label)) — identical
    to the oracle's ORDER BY count DESC, label tiebreak. Fixed
    iteration counts unroll into MATERIALIZED chained CTEs on the
    DuckDB side (CTE-by-copy inlining is exponential otherwise).
    """
    a = F.least(F.col(src).cast("string"), F.col(dst).cast("string"))
    b = F.greatest(F.col(src).cast("string"), F.col(dst).cast("string"))
    und = (
        edges.where(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .select(a.alias("__a__"), b.alias("__b__"))
        .where(F.col("__a__") != F.col("__b__"))
        .distinct()
    )
    from .dedup import persisted_rdd_ids, unpersist_rdd_ids

    sc = edges.sparkSession.sparkContext
    b_pre = persisted_rdd_ids(sc)
    bi = und.select(
        F.col("__a__").alias("__s__"), F.col("__b__").alias("__d__")
    ).unionAll(
        und.select(F.col("__b__").alias("__s__"), F.col("__a__").alias("__d__"))
    ).localCheckpoint(eager=True)
    b_post = persisted_rdd_ids(sc)
    bi_ids = (
        (b_post - b_pre) if b_pre is not None and b_post is not None else None
    )
    labels = (
        bi.select(F.col("__s__").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("__lbl__"))
        .localCheckpoint(eager=True)
    )
    l_post = persisted_rdd_ids(sc)
    prev_ids = (
        (l_post - b_post)
        if b_post is not None and l_post is not None
        else None
    )
    for _ in range(iters):
        cnt = (
            bi.join(
                labels.select(
                    F.col("node").alias("__s__"), F.col("__lbl__")
                ),
                on="__s__",
            )
            .groupBy(F.col("__d__").alias("node"), "__lbl__")
            .agg(F.count(F.lit(1)).alias("__c__"))
        )
        pick = cnt.groupBy("node").agg(
            F.min(
                F.struct(
                    (-F.col("__c__")).alias("nc"), F.col("__lbl__").alias("l")
                )
            ).alias("__p__")
        )
        before = persisted_rdd_ids(sc)
        labels = (
            labels.join(pick, on="node", how="left")
            .select(
                "node",
                F.coalesce(F.col("__p__.l"), F.col("__lbl__")).alias("__lbl__"),
            )
            .localCheckpoint(eager=True)
        )
        after = persisted_rdd_ids(sc)
        # superseded round freed once the new round materializes (r9
        # ADVICE storage hygiene — the dedup_clusters pattern)
        unpersist_rdd_ids(sc, prev_ids)
        prev_ids = (
            (after - before)
            if before is not None and after is not None
            else None
        )
    unpersist_rdd_ids(sc, bi_ids)
    return labels.select("node", F.col("__lbl__").alias("community"))


def adamic_adar(
    edges: DataFrame,
    src: str,
    dst: str,
    max_degree: int = 10000,
    min_score: float = 0.0,
) -> DataFrame:
    """Adamic–Adar link-prediction scores over the UNDIRECTED simple
    graph: for every node pair (u, w) sharing at least one neighbor,
    ``score = Σ_{v ∈ N(u) ∩ N(w)} 1 / ln(deg(v))`` — rare shared
    neighbors count more than hubs (the classic "which links are
    missing" / entity-resolution-by-context signal). Output:
    ``(node_a, node_b, n_common, aa_score)`` with node_a < node_b.

    Determinism: each common neighbor contributes the exact integer
    ``floor(1e12 / floor(ln(deg)·1e6))`` (the ln-microunit grid of the
    bigram-LM family — never a raw double sum); ``aa_score`` is the
    contribution sum divided by 1e6, so equal-score ties are exact.

    Scale: wedge enumeration through each common neighbor —
    O(Σ deg(v)²) pair work, the same bound as :func:`triangle_count`'s
    census. ``max_degree`` drops hub centers above the cap BEFORE the
    self-join (a 1e6-degree hub alone contributes 5e11 wedges; its
    1/ln ≈ 0.07 contribution is noise by design of the statistic) —
    dropped hubs are a DOCUMENTED approximation, mirrored exactly in
    the oracle. ``min_score`` prunes the (large) low-signal tail of
    1-common-neighbor pairs at the final aggregate."""
    a = F.least(F.col(src).cast("string"), F.col(dst).cast("string"))
    b = F.greatest(F.col(src).cast("string"), F.col(dst).cast("string"))
    und = (
        edges.where(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .select(a.alias("__a__"), b.alias("__b__"))
        .where(F.col("__a__") != F.col("__b__"))
        .distinct()
    )
    # symmetric adjacency: one row per (center v, endpoint u).
    # eager barrier (r9): deg and both wedge-join sides consume `adj`
    # (and `und` twice inside it) — the live lineage re-derived the
    # edge scan + distinct per consumer (16 parquet scans in the
    # measured plan; verify SKILL.md multi-consumer rule).
    adj = (
        und.select(F.col("__a__").alias("__v__"), F.col("__b__").alias("__u__"))
        .unionAll(
            und.select(F.col("__b__").alias("__v__"), F.col("__a__").alias("__u__"))
        )
        .localCheckpoint(eager=True)
    )
    deg = adj.groupBy("__v__").agg(F.count(F.lit(1)).alias("__d__"))
    centers = deg.where(
        (F.col("__d__") >= 2) & (F.col("__d__") <= max_degree)
    ).selectExpr(
        "__v__",
        # exact integer contribution on the ln-microunit grid
        "CAST(1000000000000L DIV CAST(floor(ln(CAST(__d__ AS DOUBLE)) "
        "* 1000000.0) AS BIGINT) AS BIGINT) AS __w__",
    )
    # both self-join sides prune `wadj` differently (node_a side keeps
    # __w__) — checkpoint so the deg aggregate + center join run once
    wadj = adj.join(centers, on="__v__").localCheckpoint(eager=True)
    left = wadj.select("__v__", "__w__", F.col("__u__").alias("node_a"))
    right = wadj.select("__v__", F.col("__u__").alias("node_b"))
    pairs = left.join(right, on="__v__").where(
        F.col("node_a") < F.col("node_b")
    )
    out = pairs.groupBy("node_a", "node_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_common"),
        (
            F.sum("__w__").cast("double") / F.lit(1000000.0)
        ).alias("aa_score"),
    )
    if min_score > 0:
        out = out.where(F.col("aa_score") >= min_score)
    return out
