"""Property-based differential testing (hypothesis): random predicates over
a random-but-fixed frame must agree with DuckDB row-for-row.

Null semantics are the reference's core correctness surface (SURVEY.md §7
"what's hard" #4) — these properties hammer `== None`, null-aware `in_`,
comparison chains, and case expressions with adversarial value/null mixes.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from hashquery_spark import Connection, Model, column, func

VALUES = [None, -3, 0, 1, 2, 5, 7, 100]
STRINGS = [None, "", "a", "ab", "apple", "Z"]


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        (i, v, s)
        for i, (v, s) in enumerate((v, s) for v in VALUES for s in STRINGS)
    ]
    conn = Connection(spark)
    conn.register_records("prop_t", rows, schema="id long, num long, s string")
    duck = duckdb.connect()
    duck.execute("CREATE TABLE prop_t (id BIGINT, num BIGINT, s VARCHAR)")
    duck.executemany("INSERT INTO prop_t VALUES (?, ?, ?)", rows)
    return Model(conn, "prop_t"), duck


def ids_spark(model, cond):
    return sorted(
        r["id"] for r in model.filter(cond).pick(column("id")).to_df().collect()
    )


def ids_duck(duck, where):
    return sorted(r[0] for r in duck.execute(f"SELECT id FROM prop_t WHERE {where}").fetchall())


lit_int = st.sampled_from([v for v in VALUES if v is not None])
cmp_op = st.sampled_from(["<", "<=", ">", ">=", "=", "!="])

SLOW = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@SLOW
@given(op=cmp_op, rhs=lit_int)
def test_comparison_null_semantics(frame, op, rhs):
    model, duck = frame
    c = column("num")
    expr = {
        "<": c < rhs, "<=": c <= rhs, ">": c > rhs,
        ">=": c >= rhs, "=": c == rhs, "!=": c != rhs,
    }[op]
    sql_op = {"=": "=", "!=": "<>"}.get(op, op)
    assert ids_spark(model, expr) == ids_duck(duck, f"num {sql_op} {rhs}")


@SLOW
@given(
    items=st.lists(st.sampled_from(VALUES), min_size=0, max_size=5),
)
def test_null_aware_in_list(frame, items):
    model, duck = frame
    got = ids_spark(model, column("num").in_(items))
    non_null = [str(i) for i in items if i is not None]
    clauses = []
    if non_null:
        clauses.append(f"num IN ({', '.join(non_null)})")
    if None in items:
        clauses.append("num IS NULL")
    where = " OR ".join(clauses) if clauses else "FALSE"
    assert got == ids_duck(duck, where)


@SLOW
@given(op=cmp_op, rhs=lit_int)
def test_not_rewrite_equals_sql_not(frame, op, rhs):
    model, duck = frame
    c = column("num")
    expr = {
        "<": c < rhs, "<=": c <= rhs, ">": c > rhs,
        ">=": c >= rhs, "=": c == rhs, "!=": c != rhs,
    }[op]
    sql_op = {"=": "=", "!=": "<>"}.get(op, op)
    # NOT in SQL filters out NULL comparisons too — the flip rewrite must
    # preserve that (reference: compilers/sql_function.py:116-136)
    assert ids_spark(model, func.not_(expr)) == ids_duck(duck, f"NOT (num {sql_op} {rhs})")


@SLOW
@given(
    needle=st.sampled_from([s for s in STRINGS if s is not None]),
    ci=st.booleans(),
)
def test_contains_matches_like(frame, needle, ci):
    model, duck = frame
    got = ids_spark(model, column("s").contains(needle, case_insensitive=ci))
    esc = needle.replace("'", "''")
    where = (
        f"lower(s) LIKE '%' || lower('{esc}') || '%'"
        if ci
        else f"s LIKE '%' || '{esc}' || '%'"
    )
    assert got == ids_duck(duck, where)


@SLOW
@given(t1=lit_int, t2=lit_int)
def test_cases_first_match_wins(frame, t1, t2):
    model, duck = frame
    expr = func.cases(
        (column("num") > t1, "hi"), (column("num") > t2, "mid"), other="lo"
    ) == "hi"
    where = (
        f"(CASE WHEN num > {t1} THEN 'hi' WHEN num > {t2} THEN 'mid' "
        f"ELSE 'lo' END) = 'hi'"
    )
    assert ids_spark(model, expr) == ids_duck(duck, where)
