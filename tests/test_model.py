"""Model-level semantics: builder immutability, attribute/measure
propagation, joins (laziness + drop_unmatched), union, fold, wire format."""

from __future__ import annotations

import pytest

from hashquery_spark import Connection, Model, column, func, attr, msr, rel


@pytest.fixture(scope="module")
def conn(spark):
    c = Connection(spark)
    c.register_records(
        "sales",
        [
            (1, 100, 10.0, 2),
            (2, 100, 20.0, 1),
            (3, 200, 5.0, 4),
            (4, None, 8.0, 1),
            (5, 999, 1.0, 1),  # no matching customer
        ],
        schema="id long, customer_id long, price double, qty int",
    )
    c.register_records(
        "customers",
        [(100, "Ada", "Gold"), (200, "Bo", None)],
        schema="id long, name string, loyalty string",
    )
    return c


def test_builder_immutability(conn):
    base = Model(conn, "sales")
    filtered = base.filter(attr.price > 6)
    assert base.to_df().count() == 5
    assert filtered.to_df().count() == 3


def test_measures_resolve_in_aggregate(conn):
    m = Model(conn, "sales").with_measures(
        revenue=func.sum(attr.price * attr.qty), n=func.count()
    )
    out = m.aggregate(measures=[msr.revenue, msr.n]).run().py_records[0]
    assert out == {"revenue": 10 * 2 + 20 + 5 * 4 + 8 + 1, "n": 5}


def test_post_aggregate_attribute_reset(conn):
    m = (
        Model(conn, "sales")
        .aggregate(groups=[attr.customer_id], measures=[func.count().named("n")])
        .filter(attr.n > 1)  # measure became an attribute (HAVING semantics)
    )
    recs = m.run().py_records
    assert recs == [{"customer_id": 100, "n": 2}]
    with pytest.raises(AttributeError):
        m.filter(attr.price > 0).to_df()  # pre-agg attrs are gone


def test_join_one_null_fill_and_drop_unmatched(conn):
    cust = Model(conn, "customers")
    base = Model(conn, "sales").with_join_one(cust, foreign_key=attr.customer_id, named="c")
    left = base.pick(attr.id, rel.c.loyalty.named("loyalty"))
    got = {r["id"]: r["loyalty"] for r in left.run().py_records}
    assert got == {1: "Gold", 2: "Gold", 3: None, 4: None, 5: None}

    inner = (
        Model(conn, "sales")
        .with_join_one(cust, foreign_key=attr.customer_id, named="c", drop_unmatched=True)
        .pick(attr.id, rel.c.name.named("who"))
    )
    assert sorted(r["id"] for r in inner.run().py_records) == [1, 2, 3]


def test_dead_join_elision(conn):
    cust = Model(conn, "customers")
    m = Model(conn, "sales").with_join_one(cust, foreign_key=attr.customer_id, named="c")
    plan = m.limit(10).to_df()._jdf.queryExecution().optimizedPlan().toString()
    assert "customers" not in plan  # never referenced -> never joined


def test_union_all_positional(conn):
    a = Model(conn, "sales").filter(attr.id == 1).pick(attr.id, attr.price)
    b = Model(conn, "sales").filter(attr.id == 3).pick(attr.id, attr.price)
    assert a.union_all(b).to_df().count() == 2


def test_fold_matches_reference_docstring(conn):
    conn.register_records(
        "finances",
        [(2023, 150000, 30000), (2024, 500000, 130000)],
        schema="year int, income long, expenses long",
    )
    folded = Model(conn, "finances").fold(
        ids=[attr.year], values=[attr.income, attr.expenses],
        key_name="type", value_name="value",
    )
    got = sorted(tuple(r) for r in folded.to_df().collect())
    assert got == [
        (2023, "expenses", 30000), (2023, "income", 150000),
        (2024, "expenses", 130000), (2024, "income", 500000),
    ]


def test_in_model_subquery(conn):
    gold = Model(conn, "customers").filter(attr.loyalty == "Gold").pick(attr.id)
    m = Model(conn, "sales").filter(attr.customer_id.in_(gold))
    assert sorted(r["id"] for r in m.pick(attr.id).run().py_records) == [1, 2]


def test_exists_subquery(conn):
    nonempty = Model(conn, "customers").filter(attr.loyalty == "Gold")
    empty = Model(conn, "customers").filter(attr.loyalty == "Platinum")
    m1 = Model(conn, "sales").filter(func.exists(nonempty))
    m2 = Model(conn, "sales").filter(func.exists(empty))
    assert m1.to_df().count() == 5
    assert m2.to_df().count() == 0


def test_wire_format_roundtrip(conn):
    m = (
        Model(conn, "sales")
        .with_measures(n=func.count())
        .filter(attr.price > 5)
        .aggregate(groups=[attr.customer_id], measures=[msr.n])
        .sort(attr.n, dir="desc")
        .limit(3)
    )
    wire = m.to_wire()
    import json

    restored = Model.from_wire(json.loads(json.dumps(wire)), connection=conn)
    key = lambda rows: sorted((str(r) for r in rows))
    assert key(m.to_df().collect()) == key(restored.to_df().collect())


def test_limit_offset(conn):
    m = Model(conn, "sales").sort(attr.id).limit(2, offset=1)
    assert [r["id"] for r in m.pick(attr.id).run().py_records] == [2, 3]


def test_csv_json_sources(spark, tmp_path):
    import os
    pdf_dir = str(tmp_path / "csvsrc")
    conn = Connection(spark)
    spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string") \
        .coalesce(1).write.mode("overwrite").option("header", True).csv(pdf_dir)
    conn.register_csv("csv_t", pdf_dir)
    assert Model(conn, "csv_t").to_df().count() == 2

    jdir = str(tmp_path / "jsonsrc")
    spark.createDataFrame([(3, "z")], "id long, v string") \
        .coalesce(1).write.mode("overwrite").json(jdir)
    conn.register_json("json_t", jdir)
    got = Model(conn, "json_t").pick(column("v")).run().py_records
    assert got == [{"v": "z"}]


def test_model_write_sink(spark, tmp_path, conn):
    out = str(tmp_path / "sink")
    m = Model(conn, "sales").filter(attr.price > 6)
    m.write(out, partition_by=["customer_id"])
    back = spark.read.parquet(out)
    assert back.count() == 3
    assert any(f.name == "customer_id" for f in back.schema.fields)


def test_sample_and_repartition(conn):
    base = Model(conn, "sales")
    s1 = base.sample(0.5, seed=7).pick(attr.id).run().py_records
    s2 = base.sample(0.5, seed=7).pick(attr.id).run().py_records
    assert s1 == s2  # seeded determinism (same layout)
    assert 0 <= len(s1) <= 5

    rp = base.repartitioned(4, by=[attr.customer_id])
    assert rp.to_df().rdd.getNumPartitions() == 4
    assert sorted(r["id"] for r in rp.pick(attr.id).run().py_records) == [1, 2, 3, 4, 5]


def test_write_bucketed_join_has_no_exchange(spark, tmp_path, conn):
    """Two tables bucketed by the same key into the same bucket count must
    join with ZERO shuffle exchanges — the layout pays the shuffle once at
    write time (the decisive optimization for repeatedly-joined fact
    tables at scale)."""
    left = Model(conn, "sales")
    left.write_bucketed(
        "b_sales", 4, ["customer_id"], sort_by=["customer_id"],
        path=str(tmp_path / "b_sales"),
    )
    right = Model(conn, "sales").aggregate(
        groups=[attr.customer_id],
        measures=[func.count().named("n")],
    )
    right.write_bucketed(
        "b_counts", 4, ["customer_id"], sort_by=["customer_id"],
        path=str(tmp_path / "b_counts"),
    )
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_sales").join(spark.table("b_counts"), "customer_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 4  # NULL customer_id row drops in the inner join
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_sales")
        spark.sql("DROP TABLE IF EXISTS b_counts")


def test_model_as_scalar_operand(conn):
    """attr <op> Model compiles as a scalar subquery (the reference
    declares this but its as_scalar_column_expression is missing —
    reference: column_expression.py:637-638)."""
    avg_price = Model(conn, "sales").aggregate(
        measures=[(func.sum(attr.price.cast("decimal(18,2)")).cast("double")
                   / func.count()).named("avg_price")]
    )
    got = sorted(
        r["id"]
        for r in Model(conn, "sales")
        .filter(attr.price > func.scalar(avg_price))
        .pick(attr.id).run().py_records
    )
    # avg = (10+20+5+8+1)/5 = 8.8 -> ids with price > 8.8: 1 (10.0), 2 (20.0)
    assert got == [1, 2]
    # operator sugar: Model directly as the right operand
    got2 = sorted(
        r["id"]
        for r in Model(conn, "sales")
        .filter(attr.price > avg_price)
        .pick(attr.id).run().py_records
    )
    assert got2 == [1, 2]


def test_sessionize_gap_boundary(spark):
    from datetime import datetime, timedelta

    c = Connection(spark)
    c.register_records(
        "sess_ev",
        [
            (1, 1, datetime(2024, 1, 1, 10, 0)),
            (2, 1, datetime(2024, 1, 1, 10, 30)),  # exactly gap: same session
            (3, 1, datetime(2024, 1, 1, 11, 1)),   # 31 min: new session
            (4, 2, datetime(2024, 1, 1, 9, 0)),
        ],
        schema="event_id long, user_id long, ts timestamp",
    )
    m = Model(c, "sess_ev").sessionize(
        group=attr.user_id, timestamp=attr.ts,
        gap=timedelta(minutes=30), tiebreak=[attr.event_id],
    )
    got = {r["event_id"]: r["session_id"] for r in m.to_df().collect()}
    # a gap of EXACTLY 30 min does not break (strict >)
    assert got == {1: 1, 2: 1, 3: 2, 4: 1}
    # session_id is an attribute on the model and survives the wire format
    import json
    restored = Model.from_wire(json.loads(json.dumps(m.to_wire())), connection=c)
    got2 = {r["event_id"]: r["session_id"] for r in restored.to_df().collect()}
    assert got2 == got


def test_pivot_inverse_of_fold(conn):
    conn.register_records(
        "pv_finances",
        [(2023, "income", 150000), (2023, "expenses", 30000),
         (2024, "income", 500000), (2024, "expenses", 130000)],
        schema="year int, type string, value long",
    )
    wide = Model(conn, "pv_finances").pivot(
        ids=[attr.year], key=attr.type, value=attr.value,
        values=["income", "expenses"],
    )
    got = sorted(tuple(r) for r in wide.to_df().collect())
    assert got == [(2023, 150000, 30000), (2024, 500000, 130000)]
    assert wide.to_df().columns == ["year", "income", "expenses"]
    # missing pivot values become NULL columns, never dropped
    partial = Model(conn, "pv_finances").filter(attr.type == "income").pivot(
        ids=[attr.year], key=attr.type, value=attr.value,
        values=["income", "expenses"],
    )
    row = {r["year"]: (r["income"], r["expenses"]) for r in partial.to_df().collect()}
    assert row[2023] == (150000, None)


def test_register_orc_roundtrip(spark, tmp_path):
    from hashquery_spark import Connection

    src = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    path = str(tmp_path / "nation_orc")
    src.write.mode("overwrite").orc(path)
    conn = Connection(spark).register_orc("nation_o", path)
    m = Model(conn, "nation_o").aggregate(groups=[], measures=[func.count().named("n")])
    assert m.run().df["n"][0] == 25


def test_register_excel_plumbing(spark, tmp_path, monkeypatch):
    """register_excel loads a sheet through pandas into a Spark frame
    (reference duckdb_connection.py:91-111). No excel engine ships in this
    container, so the pandas decode is faked deterministically — the real
    surface under test is the register/createDataFrame/query plumbing and
    the extension dispatch of register_file."""
    import pandas as pd

    from hashquery_spark import Connection

    fake = pd.DataFrame({"region": ["EU", "US", "EU"], "quota": [10, 20, 30]})
    seen = {}

    def fake_read_excel(path, **options):
        seen["path"] = path
        return fake

    monkeypatch.setattr(pd, "read_excel", fake_read_excel)
    xlsx = tmp_path / "quotas.xlsx"
    xlsx.write_bytes(b"")
    conn = Connection(spark).register_file("quotas", str(xlsx))
    assert seen["path"] == str(xlsx)
    m = Model(conn, "quotas").aggregate(
        groups=[attr.region], measures=[func.sum(attr.quota).named("total")]
    )
    got = {r["region"]: r["total"] for r in m.to_df().collect()}
    assert got == {"EU": 40, "US": 20}

    with pytest.raises(ValueError, match="Cannot load file"):
        Connection(spark).register_file("nope", "data.txt")


def test_dead_join_elision_applies_to_inner_joins_too(conn):
    """Reference-pinned footgun (compilers/join_one.py:59-60): an
    UNREFERENCED join is elided even with drop_unmatched=True, so a
    filter-only inner join silently does nothing. The row-restricting
    form is a membership filter (in_), which must NOT be elided."""
    cust = Model(conn, "customers").filter(attr.loyalty == "Gold").with_primary_key(
        column("id")
    )
    base = Model(conn, "sales")
    n_all = base.to_df().count()

    elided = base.with_join_one(
        cust, foreign_key=attr.customer_id, named="c", drop_unmatched=True
    )
    assert elided.to_df().count() == n_all  # join never referenced -> elided

    referenced = elided.filter(rel.c.loyalty == "Gold")
    semi = base.filter(attr.customer_id.in_(cust.pick(attr.id)))
    assert referenced.to_df().count() == semi.to_df().count() < n_all


def test_join_many_measures_as_attributes(conn):
    sales = Model(conn, "sales").with_measures(
        func.count().named("n_sales"), func.sum(attr.qty).named("total_qty")
    )
    cust = (
        Model(conn, "customers")
        .with_primary_key(attr.id)
        .with_join_many(sales, foreign_key=attr.customer_id, named="sales")
    )
    rows = {
        r["name"]: r
        for r in cust.pick(
            attr.name,
            rel.sales.n_sales.named("n_sales"),
            rel.sales.total_qty.named("total_qty"),
        ).run().py_records
    }
    assert rows["Ada"]["n_sales"] == 2 and rows["Ada"]["total_qty"] == 3
    assert rows["Bo"]["n_sales"] == 1 and rows["Bo"]["total_qty"] == 4
    # customers with no children read NULL (left join), never drop
    assert len(rows) == 2


def test_join_many_never_fans_out(conn):
    sales = Model(conn, "sales").with_measures(func.count().named("n_sales"))
    cust = (
        Model(conn, "customers")
        .with_primary_key(attr.id)
        .with_join_many(sales, foreign_key=attr.customer_id, named="sales")
    )
    # referencing the relation must not duplicate outer rows
    out = cust.aggregate(
        measures=[func.count().named("n"), func.sum(rel.sales.n_sales).named("t")]
    ).run().py_records[0]
    assert out["n"] == 2  # still one row per customer
    assert out["t"] == 3  # 2 (Ada) + 1 (Bo); sale with customer 999 unmatched


def test_join_many_elided_when_unreferenced(conn):
    sales = Model(conn, "sales").with_measures(func.count().named("n_sales"))
    cust = (
        Model(conn, "customers")
        .with_primary_key(attr.id)
        .with_join_many(sales, foreign_key=attr.customer_id, named="sales")
    )
    plan = cust.limit(10).to_df()._jdf.queryExecution().optimizedPlan().toString()
    assert "sales" not in plan


def test_join_many_requires_measures(conn):
    with pytest.raises(ValueError, match="measures"):
        Model(conn, "customers").with_join_many(
            Model(conn, "sales"), foreign_key=attr.customer_id, named="s"
        )


def test_join_many_wire_roundtrip(conn):
    import json

    sales = Model(conn, "sales").with_measures(func.count().named("n_sales"))
    m = (
        Model(conn, "customers")
        .with_primary_key(attr.id)
        .with_join_many(sales, foreign_key=attr.customer_id, named="sales")
        .pick(attr.name, rel.sales.n_sales.named("n_sales"))
    )
    restored = Model.from_wire(json.loads(json.dumps(m.to_wire())), connection=conn)
    key = lambda rows: sorted(str(r) for r in rows)
    assert key(m.to_df().collect()) == key(restored.to_df().collect())


def test_model_describe_profiles_result(conn):
    rows = {
        r.column_name: r
        for r in Model(conn, "sales").filter(attr.price > 6).describe().collect()
    }
    assert rows["customer_id"].n_rows == 3
    assert rows["customer_id"].n_null == 1  # the NULL-customer sale at price 8
    assert rows["id"].n_distinct == 3


def test_model_explode_inner_and_outer(conn):
    conn.register_records(
        "words", [(1, "a b c"), (2, "x"), (3, None)], schema="id long, s string"
    )
    m = Model(conn, "words").explode(func.split(attr.s, r"\s+"), named="tok")
    inner = sorted((r["id"], r["tok"]) for r in m.pick(attr.id, attr.tok).run().py_records)
    assert inner == [(1, "a"), (1, "b"), (1, "c"), (2, "x")]  # NULL array drops
    mo = Model(conn, "words").explode(func.split(attr.s, r"\s+"), named="tok", outer=True)
    outer = sorted((r["id"], r["tok"]) for r in mo.pick(attr.id, attr.tok).run().py_records)
    assert (3, None) in outer  # outer keeps the NULL-array row
    # exploded element is a first-class attribute: group by it
    agg = {
        r["tok"]: r["n"]
        for r in m.aggregate(groups=[attr.tok], measures=[func.count().named("n")])
        .run()
        .py_records
    }
    assert agg == {"a": 1, "b": 1, "c": 1, "x": 1}
    # wire round-trip
    import json

    restored = Model.from_wire(json.loads(json.dumps(m.to_wire())), connection=conn)
    assert sorted(map(str, m.to_df().collect())) == sorted(
        map(str, restored.to_df().collect())
    )


def test_retention_curve_churn(spark):
    """Model.retention: cohorts by first-activity week; rates reflect the
    entities actually active at each offset; offset-0 row defines the
    cohort size and is always 1.0."""
    from datetime import datetime

    from hashquery_spark import Connection, Model, attr

    conn = Connection(spark)
    # week of 2024-01-07 (Sunday): users 1,2,3 start; user 3 never returns;
    # users 1,2 active next week; only user 2 two weeks out.
    # week of 2024-01-14: user 4 starts, returns the following week.
    rows = [
        (1, datetime(2024, 1, 8)), (2, datetime(2024, 1, 9)), (3, datetime(2024, 1, 10)),
        (1, datetime(2024, 1, 15)), (2, datetime(2024, 1, 16)),
        (2, datetime(2024, 1, 22)),
        (4, datetime(2024, 1, 17)), (4, datetime(2024, 1, 24)),
    ]
    conn.register_records("ret_ev", rows, schema="user_id long, ts timestamp")
    m = Model(conn, "ret_ev").retention(
        grain="week", group=attr.user_id, timestamp=attr.ts
    )
    got = {
        (str(r.cohort)[:10], r.period_offset): (r.active, r.cohort_size, r.retention_rate)
        for r in m.to_df().collect()
    }
    assert got[("2024-01-07", 0)] == (3, 3, 1.0)
    assert got[("2024-01-07", 1)] == (2, 3, round(2 / 3, 4))
    assert got[("2024-01-07", 2)] == (1, 3, round(1 / 3, 4))
    assert got[("2024-01-14", 0)] == (1, 1, 1.0)
    assert got[("2024-01-14", 1)] == (1, 1, 1.0)
    assert len(got) == 5

    with pytest.raises(ValueError):
        Model(conn, "ret_ev").retention(grain="hour", group=attr.user_id, timestamp=attr.ts)
    with pytest.raises(ValueError):
        Model(conn, "ret_ev").retention()  # no activity schema configured


def test_map_batches_and_transform_group(spark):
    """Model.map_batches (mapInPandas) and Model.transform_group
    (applyInPandas): arbitrary Python frame transforms inside the DSL,
    composable with further Model operations."""
    from hashquery_spark import Connection, Model, attr, column, func

    conn = Connection(spark)
    conn.register_records(
        "pm_t",
        [("a", 1.0), ("a", 4.0), ("b", 10.0), ("b", 20.0), ("b", 30.0)],
        schema="g string, v double",
    )

    def double_v(batches):
        for pdf in batches:
            pdf = pdf[pdf["v"] > 1.0].copy()
            pdf["v2"] = pdf["v"] * 2
            yield pdf[["g", "v2"]]

    m = Model(conn, "pm_t").map_batches(double_v, "g string, v2 double")
    got = sorted((r.g, r.v2) for r in m.to_df().collect())
    assert got == [("a", 8.0), ("b", 20.0), ("b", 40.0), ("b", 60.0)]
    # composable: the new schema is the attribute surface
    n = m.aggregate(groups=[attr.g], measures=[func.count().named("n")])
    assert sorted((r.g, r.n) for r in n.to_df().collect()) == [("a", 1), ("b", 3)]

    def demean(pdf):
        pdf = pdf.copy()
        pdf["centered"] = pdf["v"] - pdf["v"].mean()
        return pdf[["g", "centered"]]

    t = (
        Model(conn, "pm_t")
        .transform_group(demean, "g string, centered double", group=attr.g)
        .sort(column("g"))
    )
    got2 = sorted((r.g, r.centered) for r in t.to_df().collect())
    assert got2 == [("a", -1.5), ("a", 1.5), ("b", -10.0), ("b", 0.0), ("b", 10.0)]

    with pytest.raises(ValueError):
        Model(conn, "pm_t").transform_group(demean, "g string, centered double")


def test_model_catalog_save_load_roundtrip(spark, tmp_path):
    """ModelCatalog: the local analogue of the reference's project import
    (SURVEY §3.3) — save a full semantic model (joins, measures, activity
    schema) as JSON, load it in a fresh context, run it, and get the same
    results."""
    from hashquery_spark import Connection, Model, ModelCatalog, attr, column, func, msr, rel

    conn = Connection(spark)
    conn.register_records(
        "cat_orders",
        [(1, 10, 5.0), (2, 10, 7.0), (3, 20, 1.0), (4, None, 9.0)],
        schema="id long, cust long, amount double",
    )
    conn.register_records(
        "cat_cust", [(10, "gold"), (20, "silver")], schema="id long, tier string"
    )
    customers = Model(conn, "cat_cust").with_primary_key(column("id"))
    orders = (
        Model(conn, "cat_orders")
        .with_join_one(customers, foreign_key=attr.cust, named="customer")
        .with_measures(revenue=func.sum(attr.amount.cast("decimal(10,2)")))
    )
    cat = ModelCatalog(str(tmp_path / "models"))
    cat.save("orders", orders)
    assert cat.names() == ["orders"]

    loaded = cat.load("orders", connection=conn)
    q = lambda m: sorted(
        (
            (r.tier, float(r.revenue))
            for r in m.aggregate(groups=[rel.customer.tier], measures=[msr.revenue])
            .to_df().collect()
        ),
        key=lambda t: (t[0] is None, t),
    )
    assert q(loaded) == q(orders)

    # version guard: documents from a NEWER engine are refused loudly
    import json, os
    doc = json.load(open(cat._file("orders")))
    doc["version"] = Model.WIRE_VERSION + 1
    json.dump(doc, open(cat._file("orders"), "w"))
    with pytest.raises(ValueError, match="wire version"):
        cat.load("orders", connection=conn)
    with pytest.raises(ValueError):
        cat.save("../evil", orders)

    cat.delete("orders")
    assert cat.names() == []


def test_pipe_chains_ops_into_the_dsl(spark, sf_dir):
    """Model.pipe applies an ops() operator to the compiled frame, resets
    attributes to the op's output schema, and stays chainable."""
    from hashquery_spark import Model, attr, func
    from hashquery_spark.connection import connection_for_dir
    from hashquery_spark.ops import winsorize

    conn = connection_for_dir(sf_dir, spark)
    m = (
        Model(conn, "orders")
        .pipe(winsorize, "o_totalprice", lo=0.1, hi=0.9, by="o_orderstatus")
        .aggregate(
            groups=[attr.o_orderstatus],
            measures=[
                func.max(attr.o_totalprice_winsorized.cast("decimal(18,2)"))
                .cast("double")
                .named("max_w"),
                func.max(attr.o_totalprice.cast("decimal(18,2)"))
                .cast("double")
                .named("max_raw"),
            ],
        )
    )
    rows = m.run().df
    assert len(rows) > 0
    # the winsorized max is clipped strictly below the raw max
    assert all(rows["max_w"] < rows["max_raw"])
    # new attribute from the op's schema is addressable via attr
    m2 = Model(conn, "orders").pipe(winsorize, "o_totalprice")
    assert "o_totalprice_winsorized" in [a.identifier for a in m2._attributes]


def test_union_by_name_matches_columns_and_fills_missing(spark):
    from hashquery_spark import Connection

    conn = Connection(spark)
    conn.register_records("ubn_a", [(1, "x")], schema="id long, name string")
    conn.register_records("ubn_b", [("y", 2)], schema="name string, id long")
    out = Model(conn, "ubn_a").union_by_name(Model(conn, "ubn_b")).to_df()
    rows = sorted((r["id"], r["name"]) for r in out.collect())
    assert rows == [(1, "x"), (2, "y")]

    conn.register_records("ubn_c", [(3,)], schema="id long")
    filled = (
        Model(conn, "ubn_a")
        .union_by_name(Model(conn, "ubn_c"), allow_missing=True)
        .to_df()
    )
    rows = sorted((r["id"], r["name"]) for r in filled.collect())
    assert rows == [(1, "x"), (3, None)]

    # wire round-trip keeps the by-name semantics
    m = Model(conn, "ubn_a").union_by_name(Model(conn, "ubn_b"))
    again = Model.from_wire(m.to_wire(), conn).to_df()
    assert sorted((r["id"], r["name"]) for r in again.collect()) == [
        (1, "x"),
        (2, "y"),
    ]
