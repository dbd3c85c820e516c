"""Reference wire-format v7 interop (SURVEY §3.3 "Port the wire format").

Round-trips every §2.1 source type plus the expression vocabulary through
the reference's JSON shape (reference src/model/model.py:1102-1152,
src/utils/serializable.py:10-15): build with our DSL → emit
``to_wire(format="reference")`` → json round-trip → hydrate via
``Model.from_wire`` (auto-detects the reference envelope) → run → exact
row match against the directly-built model.
"""

from __future__ import annotations

import datetime
import json

import pytest

from hashquery_spark import Model, attr, column, func, rel
from hashquery_spark.connection import connection_for_dir
from hashquery_spark.wire_reference import (
    REFERENCE_WIRE_VERSION,
    ReferenceWireError,
    native_to_reference,
)


def _roundtrip_rows(model, conn):
    direct = sorted(tuple(r) for r in model.to_df().collect())
    wire = model.to_wire(format="reference")
    wire = json.loads(json.dumps(wire))  # must be pure JSON
    hydrated = Model.from_wire(wire, conn)
    again = sorted(tuple(r) for r in hydrated.to_df().collect())
    assert direct == again, f"round-trip changed results: {direct[:2]} vs {again[:2]}"
    return wire


def test_envelope_matches_reference_shape(spark, sf_dir):
    conn = connection_for_dir(sf_dir, spark)
    m = Model(conn, "nation").filter(attr.n_regionkey == 0)
    wire = m.to_wire(format="reference")
    assert wire["type"] == "model"
    assert wire["_version"] == REFERENCE_WIRE_VERSION == 7
    assert wire["connection"]["type"] == "connection"
    src = wire["source"]
    assert src["type"] == "source" and src["subType"] == "filter"
    assert src["_version"] == 7
    cond = src["condition"]
    assert cond["type"] == "columnExpression" and cond["subType"] == "binaryOp"
    assert "manuallySetIdentifier" in cond and "__denormalized" in cond
    assert src["base"]["subType"] == "tableName"
    assert src["base"]["tableName"] == "nation"


def test_version_guard(spark, sf_dir):
    conn = connection_for_dir(sf_dir, spark)
    wire = Model(conn, "nation").to_wire(format="reference")
    wire["_version"] = 6
    with pytest.raises(ReferenceWireError, match="version"):
        Model.from_wire(wire, conn)


def test_scan_filter_sort_limit_roundtrip(spark, sf_dir):
    conn = connection_for_dir(sf_dir, spark)
    m = (
        Model(conn, "orders")
        .filter(attr.o_totalprice > 1000)
        .sort(column("o_totalprice"), dir="desc")
        .limit(20, offset=5)
    )
    wire = _roundtrip_rows(m, conn)
    subtypes = []
    node = wire["source"]
    while node:
        subtypes.append(node["subType"])
        node = node.get("base")
    assert subtypes == ["limit", "sort", "filter", "tableName"]


def test_sql_text_source_roundtrip(spark, sf_dir):
    conn = connection_for_dir(sf_dir, spark)
    m = Model(conn, sql_query="SELECT n_name, n_regionkey FROM nation")
    wire = _roundtrip_rows(m, conn)
    assert wire["source"]["subType"] == "sqlText"
    assert "sql" in wire["source"]


def test_pick_union_aggregate_roundtrip(spark, sf_dir):
    conn = connection_for_dir(sf_dir, spark)
    a = Model(conn, "nation").pick(column("n_name"), column("n_regionkey"))
    b = Model(conn, "nation").pick(column("n_name"), column("n_regionkey"))
    m = a.union_all(b).aggregate(
        groups=[attr.n_regionkey],
        measures=[func.count().named("n")],
    )
    wire = _roundtrip_rows(m, conn)
    assert wire["source"]["subType"] == "aggregate"
    assert wire["source"]["base"]["subType"] == "union"
    assert wire["source"]["measures"][0]["functionName"] == "count"


def test_join_one_roundtrip(spark, sf_dir):
    conn = connection_for_dir(sf_dir, spark)
    nation = Model(conn, "nation").with_primary_key(column("n_nationkey"))
    m = (
        Model(conn, "customer")
        .with_join_one(nation, foreign_key=attr.c_nationkey, named="nat")
        .aggregate(
            groups=[rel.nat.n_name],
            measures=[func.count().named("n_cust")],
        )
    )
    wire = _roundtrip_rows(m, conn)
    join = wire["source"]["base"]
    assert join["subType"] == "joinOne"
    assert join["relation"]["type"] == "modelNamespace"
    assert join["relation"]["identifier"] == "nat"
    assert join["dropUnmatched"] is False


def test_expression_vocabulary_roundtrip(spark, sf_dir):
    conn = connection_for_dir(sf_dir, spark)
    m = (
        Model(conn, "orders")
        .filter(attr.o_orderstatus.in_(["F", "O"]))
        .filter(attr.o_orderpriority.contains("URGENT"))
        .filter(attr.o_orderdate < datetime.datetime(1998, 1, 1))
        .aggregate(
            groups=[
                attr.o_orderdate.by_month().named("month"),
                func.cases(
                    (attr.o_totalprice > 200000, "big"), other="small"
                ).named("bucket"),
            ],
            measures=[
                func.count().named("n"),
                func.sum(attr.o_totalprice).named("total"),
            ],
        )
        .sort(column("month"))
        .limit(10)
    )
    wire = _roundtrip_rows(m, conn)
    agg = wire["source"]["base"]["base"]  # limit → sort → aggregate
    assert agg["groups"][0]["subType"] == "granularity"
    assert agg["groups"][0]["granularity"] == "month"
    assert agg["groups"][1]["subType"] == "case"


def test_in_subquery_and_exists_roundtrip(spark, sf_dir):
    conn = connection_for_dir(sf_dir, spark)
    asia = Model(conn, "region").filter(attr.r_name == "ASIA").pick(
        column("r_regionkey")
    )
    m = Model(conn, "nation").filter(attr.n_regionkey.in_(asia))
    wire = _roundtrip_rows(m, conn)
    cond = wire["source"]["condition"]
    assert cond["subType"] == "binaryOp" and cond["op"] == "IN"
    assert cond["right"]["subType"] == "subquery"

    has_nation = Model(conn, "nation").filter(attr.n_regionkey == 1).limit(1)
    m2 = Model(conn, "region").filter(func.exists(has_nation))
    wire2 = _roundtrip_rows(m2, conn)
    cond2 = wire2["source"]["condition"]
    assert cond2["subType"] == "sqlFunction"
    assert cond2["functionName"] == "exists"
    assert cond2["args"][0]["subType"] == "subquery"


def test_format_timestamp_and_sql_text_expr_roundtrip(spark, sf_dir):
    conn = connection_for_dir(sf_dir, spark)
    m = (
        Model(conn, "orders")
        .with_attributes(revenue=column(sql="o_totalprice * 2"))
        .pick(
            column("o_orderkey"),
            attr.o_orderdate.format_timestamp("%Y-%m").named("ym"),
            attr.revenue,
        )
        .limit(5)
    )
    wire = _roundtrip_rows(m, conn)
    cols = wire["source"]["base"]["columns"]
    assert any(c["subType"] == "formatTimestamp" for c in cols)
    assert any(c["subType"] == "sqlText" for c in cols)


def test_match_steps_roundtrip(spark, sf_dir):
    conn = connection_for_dir(sf_dir, spark)
    ev = Model(conn, "events").with_activity_schema(
        group=attr.user_id, timestamp=attr.ts, event_key=attr.event_type
    )
    m = ev.match_steps(
        ["view", "click", "purchase"], time_limit=datetime.timedelta(days=30)
    ).aggregate(groups=[], measures=[func.count().named("n_entities")])
    wire = _roundtrip_rows(m, conn)

    def find(node, sub):
        if isinstance(node, dict):
            if node.get("subType") == sub:
                return node
            for v in node.values():
                got = find(v, sub)
                if got:
                    return got
        elif isinstance(node, list):
            for v in node:
                got = find(v, sub)
                if got:
                    return got
        return None

    ms = find(wire, "matchSteps")
    assert ms is not None
    assert ms["activitySchema"]["type"] == "modelActivitySchema"
    assert ms["timeLimit"] == {"$typeKey": "py.timedelta", "seconds": 30 * 86400}


def test_net_new_nodes_refuse_reference_emit(spark, sf_dir):
    conn = connection_for_dir(sf_dir, spark)
    m = Model(conn, "orders").pick(
        column("o_orderkey"), attr.o_totalprice.cast("double").named("p")
    )
    with pytest.raises(ReferenceWireError, match="no reference wire-format"):
        native_to_reference(m.to_wire())


def test_primary_key_and_custom_meta_roundtrip(spark, sf_dir):
    conn = connection_for_dir(sf_dir, spark)
    m = (
        Model(conn, "nation")
        .with_primary_key(column("n_nationkey"))
        .with_custom_meta("owner", "analytics")
    )
    wire = m.to_wire(format="reference")
    assert wire["primaryKey"]["columnName"] == "n_nationkey"
    assert wire["customMeta"] == {"owner": "analytics"}
    hydrated = Model.from_wire(json.loads(json.dumps(wire)), conn)
    assert hydrated._custom_meta == {"owner": "analytics"}
    assert hydrated._primary_key.to_wire()["name"] == "n_nationkey"


def test_union_by_name_refuses_reference_emit(spark, sf_dir):
    """The reference's union is positional; a by-name union must refuse
    reference-format emit instead of silently changing semantics."""
    conn = connection_for_dir(sf_dir, spark)
    a = Model(conn, "nation").pick(column("n_name"), column("n_regionkey"))
    b = Model(conn, "nation").pick(column("n_regionkey"), column("n_name"))
    m = a.union_by_name(b)
    with pytest.raises(ReferenceWireError, match="no reference wire-format"):
        m.to_wire(format="reference")
