"""Link-graph operators (hashquery_spark/ops/graph.py).

``pagerank`` is iterative (rows-only — no SQL oracle), so its semantics
are pinned here against closed-form fixtures; ``degree_centrality``
additionally has a DuckDB oracle (`degree_centrality` in
__spark_entry__.py).
"""

from __future__ import annotations

import pytest

from hashquery_spark.ops import degree_centrality, pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src: string, dst: string")


def test_degree_centrality_counts_and_zeros(spark):
    e = _edges(
        spark,
        [("a", "b"), ("a", "b"), ("a", "c"), ("b", "c"), (None, "c"), ("d", None)],
    )
    got = {
        r["node"]: (r["out_degree"], r["in_degree"])
        for r in degree_centrality(e, "src", "dst").collect()
    }
    # parallel edges count; NULL endpoints ignored per side
    assert got == {
        "a": (3, 0),
        "b": (1, 2),
        "c": (0, 3),
        "d": (1, 0),
    }


def test_pagerank_cycle_is_uniform(spark):
    """A directed 4-cycle is rank-symmetric: every node gets exactly 1/4
    at every iteration (integer arithmetic makes this exact)."""
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
    got = {r["node"]: r["pagerank"] for r in pagerank(e, "src", "dst", iters=5).collect()}
    assert set(got) == {"a", "b", "c", "d"}
    for v in got.values():
        assert v == pytest.approx(0.25, abs=1e-6)


def test_pagerank_star_center_dominates(spark):
    """Star a,b,c -> hub: hub rank -> (1-d)/N + d*3*leaf; leaves hold
    (1-d)/N + their share of the hub's dangling mass."""
    e = _edges(spark, [("a", "hub"), ("b", "hub"), ("c", "hub")])
    got = {
        r["node"]: r["pagerank"]
        for r in pagerank(e, "src", "dst", iters=30).collect()
    }
    assert got["hub"] > 2.5 * got["a"]
    assert got["a"] == pytest.approx(got["b"]) == pytest.approx(got["c"])
    # mass conservation (floor leak <= ~1 nano/edge/iter)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-5)


def test_pagerank_matches_python_reference(spark):
    """Exact match (to the 1e-9 grid) against a plain-Python integer
    replica of the same iteration on an asymmetric graph with a dangling
    node and a parallel edge."""
    pairs = [
        ("a", "b"), ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "a"),
        ("c", "e"),  # e is dangling
    ]
    e = _edges(spark, pairs)
    got = {
        r["node"]: r["pagerank"]
        for r in pagerank(e, "src", "dst", iters=7, damping=0.85).collect()
    }

    UNIT = 1_000_000_000
    nodes = sorted({s for s, _ in pairs} | {d for _, d in pairs})
    n = len(nodes)
    deg = {}
    for s, _ in pairs:
        deg[s] = deg.get(s, 0) + 1
    r = {v: UNIT // n for v in nodes}
    base = (15 * UNIT) // (100 * n)
    for _ in range(7):
        dangling = sum(r[v] for v in nodes if v not in deg)
        share = (85 * dangling) // (100 * n)
        c = {v: 0 for v in nodes}
        for s, d in pairs:
            c[d] += (85 * r[s]) // (100 * deg[s])
        r = {v: base + share + c[v] for v in nodes}
    expected = {v: round(r[v] / UNIT, 9) for v in nodes}
    assert got == expected


def test_pagerank_is_partitioning_independent(spark):
    pairs = [(f"n{i}", f"n{(i * 7 + 3) % 20}") for i in range(60)]
    e = _edges(spark, pairs)
    a = {r["node"]: r["pagerank"] for r in pagerank(e, "src", "dst", iters=4).collect()}
    b = {
        r["node"]: r["pagerank"]
        for r in pagerank(e.repartition(17), "src", "dst", iters=4).collect()
    }
    assert a == b


def test_pagerank_empty_graph(spark):
    e = _edges(spark, []).where("src IS NOT NULL")
    assert pagerank(e, "src", "dst", iters=2).count() == 0
