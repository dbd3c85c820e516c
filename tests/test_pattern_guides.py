"""The reference's documented pattern guides, reproduced through this
engine over the driver testdata and checked against DuckDB.

Each test is one guide from /root/reference/docs/pattern_guides/ — these
are the reference's only executable composition examples (it ships no
test suite, SURVEY.md §5), so running their exact DSL shapes is the
closest thing to running the reference's own acceptance suite:

* segments.md  — two-level aggregation + membership join on a derived set
* binning.md   — timestamp grain binning and manual numeric binning
* joins.md     — foreign_key + arbitrary-condition join, group by rel attr
* timeframes.md — self-join of an aggregated model on shifted time keys
* events.md    — funnel comparison: joining two funnel outputs
"""

from __future__ import annotations

import os

import duckdb
import pytest

from hashquery_spark import Connection, Model, attr, column, func, msr, rel

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def conn(spark):
    c = Connection(spark)
    c.register_dir(SF_DIR)
    return c


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("orders", "lineitem", "part", "customer", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def test_segments_guide_loyal_customer_ltv(conn, duck):
    """segments.md: derive a customer segment with a two-level aggregate,
    join it back by condition, filter to members, then average the
    per-customer totals."""
    orders = Model(conn, "orders")
    loyal = (
        orders.filter(attr.o_totalprice > 150000)
        .aggregate(groups=[func.distinct(attr.o_custkey)])
    )
    ltv = (
        orders.with_join_one(
            loyal,
            condition=attr.o_custkey == rel.loyal.distinct_o_custkey,
            named="loyal",
        )
        .filter(rel.loyal.distinct_o_custkey != None)  # noqa: E711
        .with_measures(
            total_revenue=func.sum(attr.o_totalprice.cast("decimal(18,2)"))
        )
        .aggregate(groups=[attr.o_custkey], measures=[msr.total_revenue])
        .aggregate(
            measures=[func.avg(attr.total_revenue.cast("double")).named("avg_ltv")]
        )
    )
    got = ltv.to_df().collect()[0].avg_ltv
    want = duck.execute(
        """
        WITH loyal AS (
          SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 150000
        ),
        per AS (
          SELECT o.o_custkey,
                 CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS t
          FROM orders o JOIN loyal l ON o.o_custkey = l.o_custkey
          GROUP BY o.o_custkey
        )
        SELECT avg(t) FROM per
        """
    ).fetchone()[0]
    assert got == pytest.approx(want, rel=1e-12)


def test_binning_guide_numeric_cases(conn, duck):
    """binning.md: manual numeric binning with func.cases as a group."""
    m = (
        Model(conn, "orders")
        .aggregate(
            groups=[
                func.cases(
                    ((attr.o_totalprice > 0) & (attr.o_totalprice < 50000), "0-50k"),
                    (
                        (attr.o_totalprice >= 50000)
                        & (attr.o_totalprice < 150000),
                        "50-150k",
                    ),
                    other="150k+",
                ).named("price_bin")
            ],
            measures=[func.count().named("n")],
        )
        .sort(column("price_bin"))
    )
    got = [(r.price_bin, r.n) for r in m.to_df().collect()]
    want = duck.execute(
        """
        SELECT CASE
                 WHEN o_totalprice > 0 AND o_totalprice < 50000 THEN '0-50k'
                 WHEN o_totalprice >= 50000 AND o_totalprice < 150000 THEN '50-150k'
                 ELSE '150k+' END AS price_bin,
               count(*) AS n
        FROM orders GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    assert got == [tuple(w) for w in want]


def test_binning_guide_timestamp_grain(conn, duck):
    """binning.md: timestamp binning via by_month as an aggregate group."""
    m = (
        Model(conn, "events")
        .aggregate(
            groups=[attr.ts.by_month().named("month")],
            measures=[func.count().named("n")],
        )
        .sort(column("month"))
    )
    got = [(str(r.month), r.n) for r in m.to_df().collect()]
    want = duck.execute(
        """
        SELECT CAST(date_trunc('month', ts) AS TIMESTAMP) AS month, count(*) AS n
        FROM events GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    assert got == [(str(w[0]), w[1]) for w in want]


def test_joins_guide_conditional_join(conn, duck):
    """joins.md: foreign_key join + arbitrary extra condition, grouped by
    a relation attribute, sorted by the post-agg attribute name."""
    part = Model(conn, "part").with_primary_key(column("p_partkey"))
    m = (
        Model(conn, "lineitem")
        .with_join_one(
            part,
            named="product",
            foreign_key=attr.l_partkey,
            condition=rel.product.p_size != 30,
        )
        .aggregate(
            groups=[rel.product.p_type],
            measures=[func.count().named("n")],
        )
        .sort(column("p_type"))
    )
    got = [(r.p_type, r.n) for r in m.to_df().collect()]
    want = duck.execute(
        """
        SELECT p.p_type, count(*) AS n
        FROM lineitem l LEFT JOIN part p
          ON l.l_partkey = p.p_partkey AND p.p_size != 30
        GROUP BY 1 ORDER BY 1 NULLS FIRST
        """
    ).fetchall()
    assert got == [tuple(w) for w in want]


def test_timeframes_guide_self_join_wow(conn, duck):
    """timeframes.md: weekly series self-joined on a shifted week key to
    put this week's and last week's totals on one row."""
    from datetime import timedelta

    ev = Model(conn, "events")
    weekly = (
        ev.with_attributes(
            week=attr.ts.by_week(),
            prev_week=attr.ts.by_week() - timedelta(days=7),
        )
        .with_measures(
            revenue=func.sum(attr.value.cast("decimal(18,4)")).cast("double")
        )
        .aggregate(groups=[attr.week, attr.prev_week], measures=[msr.revenue])
        .with_primary_key(attr.week)
    )
    summary = (
        weekly.with_join_one(weekly, foreign_key=attr.prev_week, named="prior")
        .pick(
            attr.week,
            attr.revenue.named("this_week"),
            rel.prior.revenue.named("last_week"),
            (attr.revenue - rel.prior.revenue).named("wow_change"),
        )
        .sort(column("week"))
        .limit(5)
    )
    got = [
        (str(r.week), r.this_week, r.last_week, r.wow_change)
        for r in summary.to_df().collect()
    ]
    want = duck.execute(
        """
        WITH weekly AS (
          -- Sunday-start weeks (the engine's reference-default
          -- first-day-of-week): shift forward a day, ISO-truncate, shift back
          SELECT CAST(date_trunc('week', ts + INTERVAL 1 DAY) - INTERVAL 1 DAY
                   AS TIMESTAMP) AS week,
                 CAST(date_trunc('week', ts + INTERVAL 1 DAY) - INTERVAL 1 DAY
                   AS TIMESTAMP) - INTERVAL 7 DAY AS prev_week,
                 CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS revenue
          FROM events GROUP BY 1, 2
        )
        SELECT a.week, a.revenue AS this_week, b.revenue AS last_week,
               a.revenue - b.revenue AS wow_change
        FROM weekly a LEFT JOIN weekly b ON a.prev_week = b.week
        ORDER BY a.week LIMIT 5
        """
    ).fetchall()
    assert got == [(str(w[0]), w[1], w[2], w[3]) for w in want]


def test_events_guide_funnel_comparison(conn, duck):
    """events.md "Comparing Funnels": run two funnels, join their output
    models on a step-name condition, project counts side by side."""
    ev = Model(conn, "events").with_activity_schema(
        group=attr.user_id, timestamp=attr.ts, event_key=attr.event_type
    )
    funnel_a = ev.funnel(["signup", "click", "purchase"])
    funnel_b = ev.funnel(["view", "click", "purchase"])
    funnels = (
        funnel_a.with_join_one(
            funnel_b,
            named="funnel_b",
            condition=func.or_(
                attr.step == rel.funnel_b.step,
                func.and_(
                    attr.step == "signup", rel.funnel_b.step == "view"
                ),
            ),
        )
        .pick(
            attr.step,
            attr.entities.named("a_funnel"),
            rel.funnel_b.entities.named("b_funnel"),
        )
    )
    rows = funnels.to_df().collect()
    a = {r.step: r.a_funnel for r in rows}
    b = {r.step: r.b_funnel for r in rows}
    # funnels strictly decrease downward (events.md), and the top-of-funnel
    # rows pair signup<->view while shared steps pair to themselves
    assert list(a) == ["signup", "click", "purchase"]
    assert a["signup"] >= a["click"] >= a["purchase"]
    assert b["signup"] >= b["click"] >= b["purchase"]  # b's "view" row joins to signup

    def duck_funnel(first):
        return dict(
            duck.execute(
                f"""
                WITH j AS (
                  SELECT user_id,
                         min(CASE WHEN event_type = '{first}' THEN ts END) AS t1
                  FROM events GROUP BY user_id
                ),
                s2 AS (
                  SELECT j.user_id, min(e.ts) AS t2
                  FROM j JOIN events e ON e.user_id = j.user_id
                   AND e.event_type = 'click' AND e.ts > j.t1
                  GROUP BY j.user_id
                ),
                s3 AS (
                  SELECT s2.user_id, min(e.ts) AS t3
                  FROM s2 JOIN events e ON e.user_id = s2.user_id
                   AND e.event_type = 'purchase' AND e.ts > s2.t2
                  GROUP BY s2.user_id
                )
                SELECT '{first}', count(*) FILTER (WHERE t1 IS NOT NULL) FROM j
                UNION ALL SELECT 'click', count(*) FROM s2
                UNION ALL SELECT 'purchase', count(*) FROM s3
                """
            ).fetchall()
        )

    wa = duck_funnel("signup")
    assert a["signup"] == wa["signup"]
    assert a["click"] == wa["click"]
    assert a["purchase"] == wa["purchase"]
