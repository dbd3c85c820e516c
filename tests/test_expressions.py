"""Expression-level semantics (SURVEY.md §5): null handling, in_, cases,
granularity week offsets, format tokens, interval normalization."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from hashquery_spark import Connection, Model, column, func, attr
from hashquery_spark.timeinterval import normalize_timedelta, timeinterval


@pytest.fixture(scope="module")
def m(spark):
    conn = Connection(spark)
    conn.register_records(
        "t",
        [
            (1, "apple", 10.0, datetime(2024, 1, 15, 10, 30)),
            (2, "banana", None, datetime(2024, 3, 2)),
            (3, None, 5.0, None),
            (4, "apple pie", -2.5, datetime(2023, 12, 31, 23, 59, 59)),
        ],
        schema="id long, name string, score double, ts timestamp",
    )
    return Model(conn, "t")


def rows(model):
    return [tuple(r) for r in model.to_df().collect()]


def vals(model, col="id"):
    return sorted(r[0] for r in model.pick(column(col)).to_df().collect())


def test_eq_none_is_null(m):
    assert vals(m.filter(attr.name == None)) == [3]  # noqa: E711
    assert vals(m.filter(attr.name != None)) == [1, 2, 4]  # noqa: E711


def test_none_eq_none_folds_true(m):
    assert vals(m.filter(column(value=None) == None)) == [1, 2, 3, 4]  # noqa: E711


def test_null_aware_in_list(m):
    assert vals(m.filter(attr.name.in_(["apple", None]))) == [1, 3]
    assert vals(m.filter(attr.name.in_([None]))) == [3]
    assert vals(m.filter(attr.name.in_([]))) == []


def test_null_aware_in_model(m, spark):
    """in_(Model) truth table via the null-safe equi-join: a NULL needle
    matches iff the subquery contains a NULL (reference:
    column_expression.py:513-544); a non-null needle with no match is
    FALSE even when the subquery has NULLs (reference-pinned, non-SQL-
    standard)."""
    conn = m._connection  # one connection per query, like the reference
    conn.register_records("in_with_null", [("apple",), (None,)], schema="v string")
    conn.register_records("in_no_null", [("apple",), ("kiwi",)], schema="v string")
    with_null = Model(conn, "in_with_null")
    no_null = Model(conn, "in_no_null")
    # rows: 1 apple, 2 banana, 3 NULL, 4 'apple pie'
    assert vals(m.filter(attr.name.in_(with_null))) == [1, 3]
    assert vals(m.filter(attr.name.in_(no_null))) == [1]
    assert vals(m.filter(func.not_(attr.name.in_(with_null)))) == [2, 4]
    assert vals(m.filter(func.not_(attr.name.in_(no_null)))) == [2, 3, 4]


def test_contains(m):
    assert vals(m.filter(attr.name.contains("apple"))) == [1, 4]
    assert vals(m.filter(attr.name.contains("APPLE", case_insensitive=True))) == [1, 4]
    assert vals(m.filter(attr.name.like("apple%"))) == [1, 4]
    assert vals(m.filter(attr.name.ilike("APPLE"))) == [1]


def test_not_rewrite(m):
    # not_(a < b) -> a >= b (NULL score passes neither side)
    assert vals(m.filter(func.not_(attr.score < 5.0))) == [1, 3]


def test_cases_with_other(m):
    out = m.pick(
        attr.id,
        func.cases(
            (attr.score > 5, "high"), (attr.score > 0, "low"), other="none"
        ).named("bucket"),
    )
    got = dict(rows(out))
    assert got == {1: "high", 2: "none", 3: "low", 4: "none"}


def test_arithmetic_and_floordiv(m):
    out = dict(
        rows(m.filter(attr.score != None).pick(attr.id, (attr.score // 3).named("d")))  # noqa: E711
    )
    assert out == {1: 3.0, 3: 1.0, 4: -1.0}  # floor(-0.833) = -1


def test_granularity_week_sunday(m):
    # 2024-01-15 is a Monday; Sunday-start week begins 2024-01-14
    out = dict(rows(m.filter(attr.id == 1).pick(attr.id, attr.ts.by_week().named("w"))))
    assert out[1] == datetime(2024, 1, 14)


def test_granularity_quarter_year(m):
    out = dict(
        rows(m.filter(attr.id == 2).pick(attr.id, attr.ts.by_quarter().named("q")))
    )
    assert out[2] == datetime(2024, 1, 1)


def test_format_timestamp_tokens(m):
    out = dict(
        rows(
            m.filter(attr.id == 1).pick(
                attr.id, attr.ts.format_timestamp("%Y-%m-%d %H:%M Q%Q").named("s")
            )
        )
    )
    assert out[1] == "2024-01-15 10:30 Q1"


def test_interval_arithmetic(m):
    out = dict(
        rows(
            m.filter(attr.id == 1).pick(
                attr.id, (attr.ts + timedelta(days=30)).named("t2")
            )
        )
    )
    assert out[1] == datetime(2024, 2, 14, 10, 30)


def test_timedelta_normalization():
    assert normalize_timedelta(timedelta(days=14)) == timeinterval("week", 2)
    assert normalize_timedelta(timedelta(hours=36)) == timeinterval("hour", 36)
    assert normalize_timedelta(timedelta(seconds=90)) == timeinterval("second", 90)
    assert normalize_timedelta(timedelta(minutes=5)) == timeinterval("minute", 5)


def test_sort_nulls_auto(m):
    got = [r[0] for r in m.sort(attr.score).pick(attr.id).to_df().collect()]
    assert got[0] == 2  # NULL first when ascending (reference "auto")
    got_desc = [r[0] for r in m.sort(attr.score, dir="desc").pick(attr.id).to_df().collect()]
    assert got_desc[-1] == 2  # NULL last when descending


def test_now_materialized(m):
    # is_this_* uses compile-time now(); 2024 data is not "this year" in 2026+
    assert vals(m.filter(attr.ts.is_this_year())) == []


def test_sql_text_star_and_fragment(m):
    out = m.filter(column(sql="score > 5 AND name IS NOT NULL")).pick(column("*"))
    assert sorted(r[0] for r in out.to_df().collect()) == [1]


def test_private_columns_stripped(m):
    out = m.pick(attr.id, attr.score.named("__internal__"))
    assert out.to_df().columns == ["id"]


def test_duplicate_columns_renamed(m):
    with pytest.warns(UserWarning):
        cols = m.pick(attr.id, attr.id, attr.id).to_df().columns
    assert cols == ["id", "id_2", "id_3"]


def test_quarter_interval_and_sugar(m):
    # Spark has no INTERVAL ... QUARTER unit; quarters render as 3 months
    from hashquery_spark.timeinterval import timeinterval

    out = dict(
        rows(
            m.filter(attr.id == 1).pick(
                attr.id, (attr.ts + timeinterval("quarter", 1)).named("t2")
            )
        )
    )
    assert out[1] == datetime(2024, 4, 15, 10, 30)
    # is_this_quarter / is_last_quarter compile and run (2024 data -> empty)
    assert vals(m.filter(attr.ts.is_this_quarter())) == []
    assert vals(m.filter(attr.ts.is_last_quarter())) == []


def test_format_timestamp_literal_runs(m):
    # literal alpha runs must quote as one block ('day'), never per-char
    out = dict(
        rows(
            m.filter(attr.id == 1).pick(
                attr.id,
                attr.ts.format_timestamp("day %j of %Y at %I:%M %p %% done").named("s"),
            )
        )
    )
    assert out[1] == "day 015 of 2024 at 10:30 AM % done"


def test_python_udf_vectorized(m):
    # Arrow-batched pandas_udf: fn sees pandas Series
    upper = func.python_udf(lambda s: s.str.upper(), "string", attr.name).named("u")
    out = dict(rows(m.pick(attr.id, upper)))
    assert out == {1: "APPLE", 2: "BANANA", 3: None, 4: "APPLE PIE"}


def test_python_udf_row_at_a_time(m):
    def shout(name, score):
        if name is None or score is None:
            return None
        return f"{name}:{int(score)}"

    expr = func.python_udf(shout, "string", attr.name, attr.score, vectorized=False)
    out = dict(rows(m.pick(attr.id, expr.named("s"))))
    assert out == {1: "apple:10", 2: None, 3: None, 4: "apple pie:-2"}


def test_python_udf_in_aggregate(m):
    squared = func.python_udf(lambda s: s * s, "double", attr.score).named("sq")
    got = m.aggregate(measures=[func.sum(squared).named("total")]).run().py_records
    assert got[0]["total"] == pytest.approx(100.0 + 25.0 + 6.25)


def test_python_udf_not_serializable(m):
    expr = func.python_udf(lambda s: s, "string", column("name"))
    with pytest.raises(NotImplementedError):
        expr.to_wire()


def test_json_value_extraction(spark):
    conn = Connection(spark)
    conn.register_records(
        "jt",
        [(1, '{"k": 7, "tag": "a"}'), (2, '{"k": 9}'), (3, None), (4, "{}")],
        schema="id long, props string",
    )
    m = Model(conn, "jt").pick(
        attr.id,
        func.json_value(attr.props, "$.k").cast("long").named("k"),
        func.json_value(attr.props, "$.tag").named("tag"),
    )
    got = {r["id"]: (r["k"], r["tag"]) for r in m.to_df().collect()}
    assert got == {1: (7, "a"), 2: (9, None), 3: (None, None), 4: (None, None)}


def test_window_functions(spark):
    """Net-new window surface: rank / running totals / lag in pick()."""
    conn = Connection(spark).register_records(
        "sales",
        [
            {"grp": "a", "seq": 1, "amt": 10.0},
            {"grp": "a", "seq": 2, "amt": 20.0},
            {"grp": "a", "seq": 3, "amt": 5.0},
            {"grp": "b", "seq": 1, "amt": 7.0},
            {"grp": "b", "seq": 2, "amt": 7.0},
        ],
    )
    m = Model(conn, "sales").pick(
        attr.grp,
        attr.seq,
        func.over(
            func.sum(attr.amt), partition=[attr.grp], order=[attr.seq]
        ).named("running"),
        func.row_number(
            partition=[attr.grp], order=[(attr.amt, "desc"), attr.seq]
        ).named("amt_rank"),
        func.lag(attr.amt, partition=[attr.grp], order=[attr.seq]).named("prev_amt"),
    )
    rows = {(r["grp"], r["seq"]): r for r in m.run().df.to_dict("records")}
    assert rows[("a", 1)]["running"] == 10.0
    assert rows[("a", 2)]["running"] == 30.0
    assert rows[("a", 3)]["running"] == 35.0
    assert rows[("a", 2)]["amt_rank"] == 1  # 20 is the biggest in a
    assert rows[("b", 1)]["amt_rank"] == 1  # 7==7 tie -> seq tiebreak
    assert rows[("b", 2)]["amt_rank"] == 2
    import math
    assert math.isnan(rows[("a", 1)]["prev_amt"]) or rows[("a", 1)]["prev_amt"] is None
    assert rows[("a", 3)]["prev_amt"] == 20.0


def test_window_explicit_frame_trailing(spark):
    conn = Connection(spark).register_records(
        "t", [{"g": 1, "i": n, "v": 1.0} for n in range(5)]
    )
    m = Model(conn, "t").pick(
        attr.i,
        func.over(
            func.sum(attr.v), partition=[attr.g], order=[attr.i], frame=(-1, 0)
        ).named("trailing2"),
    )
    got = {r["i"]: r["trailing2"] for r in m.run().df.to_dict("records")}
    assert got == {0: 1.0, 1: 2.0, 2: 2.0, 3: 2.0, 4: 2.0}


def test_window_wire_roundtrip(spark):
    import json

    from hashquery_spark.expr import ColumnExpression

    node = func.over(
        func.sum(column("x")), partition=[column("g")],
        order=[(column("ts"), "desc")], frame=(None, 0),
    ).named("w")
    restored = ColumnExpression.from_wire(json.loads(json.dumps(node.to_wire())))
    assert restored.function == "sum"
    assert restored.frame == (None, 0)
    assert restored.order[0][1] == "desc"
    assert restored._identifier == "w"


def test_window_validation_errors():
    with pytest.raises(ValueError, match="requires order"):
        func.row_number(partition=[column("g")])
    with pytest.raises(ValueError, match="aggregate builder"):
        func.over(column("x"), partition=[column("g")])
    with pytest.raises(ValueError, match="asc/desc"):
        func.lag(column("x"), order=[(column("ts"), "sideways")])


def test_window_ntile_and_edges(spark):
    conn = Connection(spark).register_records(
        "t", [{"g": 1, "i": n, "v": float(n)} for n in range(8)]
    )
    m = Model(conn, "t").pick(
        attr.i,
        func.ntile(4, partition=[attr.g], order=[attr.i]).named("quartile"),
        func.first_value(attr.v, partition=[attr.g], order=[attr.i]).named("first_v"),
        func.last_value(attr.v, partition=[attr.g], order=[attr.i]).named("last_v"),
    )
    rows = {r["i"]: r for r in m.run().df.to_dict("records")}
    assert [rows[i]["quartile"] for i in range(8)] == [1, 1, 2, 2, 3, 3, 4, 4]
    # last_value sees the whole partition (not the current-row frame trap)
    assert all(rows[i]["first_v"] == 0.0 and rows[i]["last_v"] == 7.0 for i in range(8))


def test_scalar_convenience_functions(spark):
    conn = Connection(spark).register_records(
        "t", [(-3, "  Hello  ", None), (4, "world", "x")],
        schema="n long, s string, opt string",
    )
    m = Model(conn, "t").pick(
        func.abs(attr.n).named("a"),
        func.sqrt(func.abs(attr.n) * func.abs(attr.n)).named("sq"),
        func.round(attr.n / 7.0, 2).named("r"),
        func.length(func.trim(attr.s)).named("len"),
        func.concat(func.upper(func.trim(attr.s)), func.lower(attr.s)).named("c"),
        func.coalesce(attr.opt, column(value="fallback")).named("co"),
    )
    rows = sorted(m.run().py_records, key=lambda r: r["a"])
    assert rows[0]["a"] == 3 and rows[0]["sq"] == 3.0 and rows[0]["r"] == -0.43
    assert rows[0]["len"] == 5
    assert rows[0]["c"] == "HELLO  hello  "
    assert rows[0]["co"] == "fallback" and rows[1]["co"] == "x"

    # wire round-trip with the scale attribute
    import json
    from hashquery_spark.expr import ColumnExpression
    node = func.round(column("x"), 3)
    back = ColumnExpression.from_wire(json.loads(json.dumps(node.to_wire())))
    assert back.round_scale == 3


def test_scalar_batch_edge_semantics(spark):
    conn = Connection(spark)
    conn.register_records(
        "sb",
        [(1, "ab1cd", -5.0), (2, None, 0.0), (3, "xyz", 2.5)],
        schema="id long, s string, x double",
    )
    rows = {
        r["id"]: r
        for r in Model(conn, "sb")
        .pick(
            attr.id,
            func.nullif(attr.s, column(value="xyz")).named("nz"),
            func.mod(attr.id - 2, 2).named("m"),  # -1 % 2 -> -1 (dividend sign)
            func.greatest(attr.x, column(value=1.0)).named("g"),
            func.regexp_extract(attr.s, r"(\d+)", 1).named("num"),
            func.instr(attr.s, column(value="cd")).named("pos"),
            func.sign(attr.x).named("sg"),
        )
        .run()
        .py_records
    }
    assert rows[1]["nz"] == "ab1cd" and rows[3]["nz"] is None  # ANSI NULLIF
    assert rows[2]["nz"] is None  # NULL input falls through to NULL
    assert rows[1]["m"] == -1 and rows[3]["m"] == 1
    assert rows[1]["g"] == 1.0 and rows[3]["g"] == 2.5
    assert rows[1]["num"] == "1" and rows[3]["num"] == ""  # no match -> ''
    assert rows[1]["pos"] == 4 and rows[3]["pos"] == 0  # absent -> 0
    assert rows[1]["sg"] == -1.0 and rows[2]["sg"] == 0.0


def test_scalar_batch_wire_roundtrip(spark):
    import json

    conn = Connection(spark)
    conn.register_records("sbw", [(1, "a-b")], schema="id long, s string")
    m = Model(conn, "sbw").pick(
        func.lpad(attr.s, 5, "*").named("p"),
        func.repeat(attr.s, 3).named("r"),
        func.regexp_replace(attr.s, r"-", "_").named("u"),
        func.split(attr.s, r"-").named("parts"),
    )
    restored = Model.from_wire(json.loads(json.dumps(m.to_wire())), connection=conn)
    assert [str(r) for r in m.to_df().collect()] == [
        str(r) for r in restored.to_df().collect()
    ]


def test_python_udaf_measure_in_aggregate(spark):
    """func.python_udaf: custom Python aggregate (grouped-agg pandas UDF)
    usable as a measure, grouped and global."""
    from hashquery_spark import Connection, Model, attr, func, column

    conn = Connection(spark)
    conn.register_records(
        "udaf_t",
        [("a", 1.0), ("a", 3.0), ("a", 5.0), ("b", 10.0), ("b", 30.0)],
        schema="g string, v double",
    )

    def midrange(s):
        return (s.min() + s.max()) / 2.0

    m = (
        Model(conn, "udaf_t")
        .aggregate(
            groups=[attr.g],
            measures=[func.python_udaf(midrange, "double", attr.v).named("mid")],
        )
        .sort(column("g"))
    )
    got = [(r.g, r.mid) for r in m.to_df().collect()]
    assert got == [("a", 3.0), ("b", 20.0)]
    # Spark cannot mix grouped-agg pandas UDFs with built-in aggregates in
    # one Aggregate node — the DSL surfaces that limit eagerly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="python_udaf"):
        Model(conn, "udaf_t").aggregate(
            groups=[attr.g],
            measures=[
                func.python_udaf(midrange, "double", attr.v).named("mid"),
                func.count().named("n"),
            ],
        ).to_df()
    # global (no groups)
    g = Model(conn, "udaf_t").aggregate(
        measures=[func.python_udaf(midrange, "double", attr.v).named("mid")]
    )
    assert [r.mid for r in g.to_df().collect()] == [15.5]


def test_bucket_other_literals_and_model(spark):
    """ColumnExpression.bucket_other (reference column_expression.py:352):
    values outside the buckets coerce to `other`; Model buckets use the
    null-aware membership join; identifier is inherited."""
    from hashquery_spark import Connection, Model, attr, column, func

    conn = Connection(spark)
    conn.register_records(
        "bo_t",
        [(1, "red"), (2, "blue"), (3, "green"), (4, None), (5, "red")],
        schema="id long, color string",
    )
    m = (
        Model(conn, "bo_t")
        .aggregate(
            groups=[attr.color.bucket_other("red", "blue")],
            measures=[func.count().named("n")],
        )
        .sort(column("color"))
    )
    got = [(r.color, r.n) for r in m.to_df().collect()]
    assert got == [("Other", 2), ("blue", 1), ("red", 2)]

    # Model bucket: colors that appear more than once
    common = (
        Model(conn, "bo_t")
        .aggregate(groups=[attr.color], measures=[func.count().named("n")])
        .filter(column("n") > 1)
        .pick(attr.color)
    )
    m2 = (
        Model(conn, "bo_t")
        .pick(attr.id, attr.color.bucket_other(common, other="rare"))
        .sort(column("id"))
    )
    got2 = [(r.id, r.color) for r in m2.to_df().collect()]
    assert got2 == [(1, "red"), (2, "rare"), (3, "rare"), (4, "rare"), (5, "red")]


def test_model_df_shortcut(spark):
    from hashquery_spark import Connection, Model

    conn = Connection(spark)
    conn.register_records("df_t", [(1,), (2,)], schema="id long")
    pdf = Model(conn, "df_t").df()
    assert sorted(pdf["id"].tolist()) == [1, 2]


def test_window_nth_value(spark):
    from hashquery_spark import Connection, Model, attr, column, func

    conn = Connection(spark)
    conn.register_records(
        "nth_t",
        [("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 30.0), ("b", 4, 5.0)],
        schema="g string, id long, v double",
    )
    out = (
        Model(conn, "nth_t")
        .pick(
            attr.g,
            attr.id,
            func.nth_value(
                attr.v, 2, partition=[attr.g], order=[attr.v, attr.id]
            ).named("second_v"),
        )
        .to_df()
        .collect()
    )
    got = {r["id"]: r["second_v"] for r in out}
    # whole-partition frame: every 'a' row sees the 2nd value; the 1-row
    # partition 'b' has none
    assert got[1] == got[2] == got[3] == 20.0
    assert got[4] is None
