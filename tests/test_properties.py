"""Property-based differential testing (hypothesis): random predicates over
a random-but-fixed frame must agree with DuckDB row-for-row.

Null semantics are the reference's core correctness surface (SURVEY.md §7
"what's hard" #4) — these properties hammer `== None`, null-aware `in_`,
comparison chains, and case expressions with adversarial value/null mixes.
"""

from __future__ import annotations

import math

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


@SLOW
@given(
    dir=st.sampled_from(["asc", "desc"]),
    nulls=st.sampled_from(["auto", "first", "last"]),
    limit=st.integers(min_value=1, max_value=10),
    offset=st.integers(min_value=0, max_value=5),
)
def test_sort_nulls_limit_offset(frame, dir, nulls, limit, offset):
    """sort dir × nulls placement × limit/offset against DuckDB, with an id
    tiebreak so both orders are total."""
    model, duck = frame
    got = [
        r["id"]
        for r in model.sort(column("num"), dir=dir, nulls=nulls)
        .sort(column("id"))
        .limit(limit, offset=offset)
        .pick(column("id"))
        .to_df()
        .collect()
    ]
    resolved = nulls if nulls != "auto" else ("first" if dir == "asc" else "last")
    want = [
        r[0]
        for r in duck.execute(
            f"SELECT id FROM prop_t ORDER BY num {dir} NULLS {resolved}, id "
            f"LIMIT {limit} OFFSET {offset}"
        ).fetchall()
    ]
    assert got == want


# --------------------------------------------------------------------------
# temporal properties
# --------------------------------------------------------------------------

from datetime import datetime, timedelta  # noqa: E402

TS_STRATEGY = st.datetimes(
    min_value=datetime(1995, 1, 3, 4, 5, 6),
    max_value=datetime(2030, 12, 28, 21, 22, 23),
).map(lambda d: d.replace(microsecond=0))


@pytest.fixture(scope="module")
def ts_conn(spark):
    return Connection(spark)


@SLOW
@given(
    ts=st.lists(TS_STRATEGY, min_size=1, max_size=6, unique=True),
    grain=st.sampled_from(
        ["second", "minute", "hour", "day", "week", "month", "quarter", "year"]
    ),
)
def test_granularity_truncation_matches_duckdb(ts_conn, ts, grain):
    """All 8 grains against DuckDB date_trunc; weeks use the reference's
    SUNDAY start (DuckDB weeks are Monday-start, hence the ±1 day shift)."""
    ts_conn.register_records("prop_ts", [(i, t) for i, t in enumerate(ts)], "id long, t timestamp")
    m = Model(ts_conn, "prop_ts")
    got = {
        r["id"]: r["g"]
        for r in m.pick(column("id"), getattr(column("t"), f"by_{grain}")().named("g"))
        .to_df()
        .collect()
    }
    duck = duckdb.connect()
    duck.execute("CREATE TABLE prop_ts (id BIGINT, t TIMESTAMP)")
    duck.executemany("INSERT INTO prop_ts VALUES (?, ?)", [(i, t) for i, t in enumerate(ts)])
    expr = (
        "date_trunc('week', t + INTERVAL 1 DAY) - INTERVAL 1 DAY"
        if grain == "week"
        else f"date_trunc('{grain}', t)"
    )
    want = {r[0]: r[1] for r in duck.execute(f"SELECT id, CAST({expr} AS TIMESTAMP) FROM prop_ts").fetchall()}
    assert got == want


@SLOW
@given(
    ts=TS_STRATEGY,
    days=st.integers(min_value=-400, max_value=400),
    seconds=st.integers(min_value=-90000, max_value=90000),
)
def test_interval_arithmetic_matches_python(ts_conn, ts, days, seconds):
    """ts ± timedelta computed by the engine equals Python's ground truth."""
    delta = timedelta(days=days, seconds=seconds)
    ts_conn.register_records("prop_iv", [(0, ts)], "id long, t timestamp")
    m = Model(ts_conn, "prop_iv")
    [row] = m.pick((column("t") + delta).named("r")).to_df().collect()
    assert row["r"] == ts + delta


@SLOW
@given(
    ts=TS_STRATEGY,
    fmt=st.lists(
        st.sampled_from(
            ["%Y", "%m", "%d", "%H", "%M", "%S", "%y", "%j", "%Q", "-", " ", ":", "T"]
        ),
        min_size=1,
        max_size=6,
    ).map("".join),
)
def test_format_timestamp_matches_python_strftime(ts_conn, ts, fmt):
    """format_timestamp output equals Python's strftime (the reference's
    token semantics); %Q = quarter number, which Python lacks."""
    # C strftime truncates at NUL, so use a printable pass-through sentinel
    expected = ts.strftime(fmt.replace("%Q", "[[Q]]")).replace(
        "[[Q]]", str((ts.month - 1) // 3 + 1)
    )
    ts_conn.register_records("prop_fmt", [(0, ts)], "id long, t timestamp")
    m = Model(ts_conn, "prop_fmt")
    [row] = m.pick(column("t").format_timestamp(fmt).named("r")).to_df().collect()
    assert row["r"] == expected


# --------------------------------------------------------------------------
# funnel / match_steps vs a pure-Python reference matcher
# --------------------------------------------------------------------------


def _ref_funnel_counts(rows, steps, time_limit=None):
    """Reference implementation of the pinned journey semantics: one char
    per (event, matched step), sorted by (ts, step DESC); greedy first-match
    per step; time_limit nulls steps with ts - ts[step0] >= limit (strict <,
    pessimistic — matches tests/test_funnel.py's fixture behavior)."""
    by_entity = {}
    for uid, ev, ts in rows:
        by_entity.setdefault(uid, []).append((ts, ev))
    counts = {s: 0 for s in steps}
    for uid, evs in by_entity.items():
        chars = [
            (ts, si)
            for ts, ev in evs
            for si, s in enumerate(steps)
            if ev == s
        ]
        chars.sort(key=lambda x: (x[0], -x[1]))
        pos, idxs = -1, []
        for si in range(len(steps)):
            nxt = next(
                (i for i in range(pos + 1, len(chars)) if chars[i][1] == si), None
            )
            if nxt is None:
                break
            idxs.append(nxt)
            pos = nxt
        if not idxs:
            continue
        t0 = chars[idxs[0]][0]
        for k, i in enumerate(idxs):
            t = chars[i][0]
            if time_limit is None or k == 0 or (t - t0) < time_limit:
                counts[steps[k]] += 1
    return counts


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),  # entity
            st.sampled_from(["a", "b", "c", "x"]),  # event type
            st.integers(min_value=0, max_value=20),  # minutes offset
        ),
        min_size=1,
        max_size=24,
    ),
    limit_minutes=st.sampled_from([None, 3, 7]),
)
def test_funnel_matches_python_reference(ts_conn, rows, limit_minutes):
    from hashquery_spark.keypath import attr as kp_attr

    base = datetime(2024, 1, 1)
    recs = [(u, e, base + timedelta(minutes=m)) for u, e, m in rows]
    ts_conn.register_records(
        "prop_funnel", recs, "user_id long, event string, timestamp timestamp"
    )
    m = Model(ts_conn, "prop_funnel").with_activity_schema(
        group=kp_attr.user_id, timestamp=kp_attr.timestamp, event_key=kp_attr.event
    )
    steps = ["a", "b", "c"]
    limit = timedelta(minutes=limit_minutes) if limit_minutes else None
    got = {
        r["step"]: r["entities"]
        for r in m.funnel(steps, time_limit=limit).run().py_records
    }
    want = _ref_funnel_counts(
        [(u, e, t) for u, e, t in recs], steps, time_limit=limit
    )
    assert got == want


@SLOW
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),    # group
            st.integers(min_value=0, max_value=50),   # order key (may tie)
            st.integers(min_value=-5, max_value=9),   # value
        ),
        min_size=1,
        max_size=30,
    ),
)
def test_window_ops_match_python_reference(spark, rows):
    """Running sum / row_number / lag through the window surface must equal
    a direct Python computation under the same (order-key, row-id) total
    order — hammers frame semantics and tie handling."""
    from hashquery_spark.keypath import attr as kp_attr

    recs = [(i, g, k, float(v)) for i, (g, k, v) in enumerate(rows)]
    conn = Connection(spark)
    conn.register_records("prop_win", recs, "rid long, g long, k long, v double")
    m = Model(conn, "prop_win").pick(
        kp_attr.rid,
        func.over(
            func.sum(kp_attr.v), partition=[kp_attr.g], order=[kp_attr.k, kp_attr.rid]
        ).named("running"),
        func.row_number(
            partition=[kp_attr.g], order=[kp_attr.k, kp_attr.rid]
        ).named("rn"),
        func.lag(
            kp_attr.v, partition=[kp_attr.g], order=[kp_attr.k, kp_attr.rid]
        ).named("prev"),
    )
    got = {r["rid"]: r for r in m.run().py_records}

    by_group: dict = {}
    for rid, g, k, v in recs:
        by_group.setdefault(g, []).append((k, rid, v))
    for g, items in by_group.items():
        items.sort()
        run = 0.0
        for n, (k, rid, v) in enumerate(items):
            run += v
            assert got[rid]["running"] == run
            assert got[rid]["rn"] == n + 1
            if n > 0:
                assert got[rid]["prev"] == items[n - 1][2]
            else:
                # py_records (pandas) renders the window-head NULL as NaN
                p = got[rid]["prev"]
                assert p is None or (isinstance(p, float) and p != p)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    lens=st.lists(st.integers(min_value=0, max_value=37), min_size=1, max_size=40),
    budget=st.integers(min_value=5, max_value=200),
    seed=st.integers(min_value=0, max_value=3),
)
def test_pack_sequences_matches_python_reference(spark, lens, budget, seed):
    """pack_sequences == a sequential Python packer over the same
    (bucket, id) order: same starts, same pack ids, same offsets."""
    import hashlib

    from hashquery_spark.ops import pack_sequences

    rows = [(i, " ".join(["w"] * n) if n else "") for i, n in enumerate(lens)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["pack_id"], r["seq_offset"])
        for r in pack_sequences(df, "text", "doc_id", budget=budget, seed=seed, n_buckets=8).collect()
    }

    def bucket(i):
        h = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
        return int(h[:8], 16) % 8

    order = sorted(range(len(lens)), key=lambda i: (bucket(i), i))
    pos = 0
    for i in order:
        n = lens[i]
        assert got[i] == (n, pos // budget, pos % budget), f"doc {i}"
        pos += n


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    groups=st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=30),
    n=st.integers(min_value=1, max_value=6),
    seed=st.integers(min_value=0, max_value=3),
)
def test_cap_per_group_matches_python_reference(spark, groups, n, seed):
    import hashlib

    from hashquery_spark.ops import cap_per_group

    rows = [(i, g) for i, g in enumerate(groups)]
    df = spark.createDataFrame(rows, "doc_id long, g string")
    got = sorted(
        (r["doc_id"], r["g"], r["cap_rank"])
        for r in cap_per_group(df, "g", "doc_id", n=n, seed=seed).collect()
    )

    def h(i):
        return int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8], 16)

    expect = []
    for g in set(groups):
        members = sorted((i for i, gg in enumerate(groups) if gg == g), key=lambda i: (h(i), i))
        expect += [(i, g, r + 1) for r, i in enumerate(members[:n])]
    assert got == sorted(expect)


# --- histogram vs numpy reference ---------------------------------------


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    xs=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False), min_size=1, max_size=60
    ),
    bins=st.integers(min_value=1, max_value=7),
)
def test_histogram_matches_numpy(spark, xs, bins):
    import numpy as np

    from hashquery_spark.ops import histogram

    lo, hi = -100.0, 100.0
    # floor-formula binning and numpy's edge-comparison binning can
    # legitimately disagree for values within float-rounding distance of
    # a bin edge (e.g. -2.2e-16 + 100.0 == 100.0 exactly); the formula is
    # the documented, oracle-consistent convention — test away from edges
    width = (hi - lo) / bins
    xs = [
        x
        for x in xs
        if abs((x - lo) / width - round((x - lo) / width)) > 1e-9
    ] or [lo + width / 2]
    df = spark.createDataFrame([(float(x),) for x in xs], "x double")
    got = {r.bin: r.n for r in histogram(df, "x", bins=bins, lo=lo, hi=hi).collect()}
    expected, _ = np.histogram(np.array(xs), bins=bins, range=(lo, hi))
    for b, n in enumerate(expected):
        assert got.get(b, 0) == n  # numpy last-bin-inclusive == our clamp


# --- chunking reconstruction invariant ----------------------------------


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    text=st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=126),
        min_size=1,
        max_size=400,
    ),
    size=st.integers(min_value=2, max_value=80),
    overlap=st.integers(min_value=0, max_value=40),
)
def test_chunk_documents_reconstructs_any_text(spark, text, size, overlap):
    from hashquery_spark.ops import chunk_documents

    if overlap >= size:
        overlap = size - 1
    stride = size - overlap
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    chunks = sorted(
        chunk_documents(df, "text", "doc_id", size=size, overlap=overlap).collect(),
        key=lambda r: r.chunk_idx,
    )
    # stitching chunks at stride offsets reproduces the document exactly
    rebuilt = chunks[0].chunk_text
    for c in chunks[1:]:
        rebuilt = rebuilt[: c.chunk_idx * stride] + c.chunk_text
    assert rebuilt == text
    # every chunk except the last is exactly `size` wide
    assert all(c.chunk_len == size for c in chunks[:-1])
    assert 0 < chunks[-1].chunk_len <= size


# --- fuzzy_join precision vs a Python Jaccard reference ------------------


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    names=st.lists(
        st.text(alphabet="abcdef ", min_size=4, max_size=14), min_size=2, max_size=10, unique=True
    )
)
def test_fuzzy_join_precision_and_sim_values(spark, names):
    """Every returned pair must have true char-3-gram Jaccard >= threshold
    with the exact Python-computed value (LSH may MISS pairs — recall is
    probabilistic — but must never return a wrong pair or a wrong sim)."""
    import re

    from hashquery_spark.ops import fuzzy_join

    def norm(s):
        return re.sub(r"[^a-z0-9]+", " ", s.lower()).strip()

    def grams(s):
        n = norm(s)
        return {n[i : i + 3] for i in range(len(n) - 2)} if len(n) >= 3 else set()

    left = spark.createDataFrame(list(enumerate(names)), "lid long, name string")
    right = spark.createDataFrame(
        [(i + 1000, n) for i, n in enumerate(names)], "rid long, name string"
    )
    out = fuzzy_join(left, right, "name", "name", "lid", "rid", threshold=0.4).collect()
    for r in out:
        gl, gr = grams(names[r.id_l]), grams(names[r.id_r - 1000])
        true_j = round(len(gl & gr) / len(gl | gr), 4)
        assert r.sim == true_j
        assert true_j >= 0.4
    # identical strings always collide (every band matches)
    assert all((i, i + 1000) in {(r.id_l, r.id_r) for r in out}
               for i, n in enumerate(names) if len(grams(n)) > 0)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    lens=st.lists(st.integers(min_value=0, max_value=25), min_size=2, max_size=30),
    seed=st.integers(min_value=0, max_value=3),
)
def test_mix_corpora_matches_python_reference(spark, lens, seed):
    """mix_corpora == the same rate formula + md5 membership computed in
    pure Python (IEEE double ops are identical)."""
    import hashlib

    from hashquery_spark.ops import mix_corpora

    sources = ["a", "b", "c"]
    rows = [(i, sources[i % 3], " ".join(["w"] * n) if n else "") for i, n in enumerate(lens)]
    weights = {"a": 0.5, "b": 0.25, "c": 0.25}
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = sorted(
        (r.doc_id, r.keep_rate) for r in mix_corpora(
            df, "source", "doc_id", weights, seed=seed
        ).select("doc_id", "keep_rate").collect()
    )

    avail = {}
    for i, s, _t in rows:
        avail[s] = avail.get(s, 0) + lens[i]
    live = {s: w for s, w in weights.items() if avail.get(s, 0) > 0}
    if not live:
        assert got == []
        return
    T = min(float(avail[s]) / w for s, w in live.items())
    rate = {s: w * T / float(avail[s]) for s, w in live.items()}

    def u(i):
        return int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8], 16) / 2**32

    expect = sorted(
        (i, rate[s]) for i, s, _t in rows if s in rate and u(i) < rate[s]
    )
    assert got == expect


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["x", "y", "z"]), min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    ),
    window=st.integers(min_value=2, max_value=4),
    stride=st.integers(min_value=1, max_value=3),
)
def test_repeated_spans_matches_python_reference(spark, docs, window, stride):
    """repeated_spans == brute-force Python span extraction + counting
    over the same sampled start positions."""
    from hashquery_spark.ops import repeated_spans

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.span_start, r.n_occurrences, r.is_first)
        for r in repeated_spans(df, "text", "doc_id", window=window, stride=stride).collect()
    )

    occurrences = {}  # span content -> [(doc, start_1based)]
    for i, toks in enumerate(docs):
        if len(toks) < window:
            continue
        for s in range(0, len(toks) - window + 1, stride):
            key = tuple(toks[s : s + window])
            occurrences.setdefault(key, []).append((i, s + 1))
    expect = []
    for occ in occurrences.values():
        if len(occ) < 2:
            continue
        first = min(occ)
        expect += [(d, s, len(occ), (d, s) == first) for d, s in occ]
    assert got == sorted(expect)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    samples=st.lists(
        st.tuples(st.integers(min_value=0, max_value=70),   # minute offset
                  st.integers(min_value=0, max_value=500)), # counter value
        min_size=1, max_size=25,
    ),
)
def test_counter_delta_matches_python_reference(spark, samples):
    """counter_delta == a sequential Python pass over the samples sorted
    by (ts, value): nonneg diffs, resets contribute the new value, first
    sample nothing; bucketed by the sample's own hour."""
    from datetime import datetime, timedelta

    from hashquery_spark.ops import counter_delta

    base = datetime(2024, 1, 1)
    rows = [("s", base + timedelta(minutes=m), float(v)) for m, v in samples]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    got = {
        r.bucket.hour: (r.increase, r.n_samples)
        for r in counter_delta(df, "ts", "v", grain="hour", group_col="g").collect()
    }

    expect = {}
    prev = None
    for m, v in sorted(samples, key=lambda x: (x[0], x[1])):
        h = m // 60
        inc, n = expect.get(h, (0.0, 0))
        if prev is not None:
            inc += (v - prev) if v >= prev else v
        expect[h] = (inc, n + 1)
        prev = v
    assert got == {h: (float(i), n) for h, (i, n) in expect.items()}


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    days=st.lists(
        st.tuples(st.integers(min_value=1, max_value=20),   # day of month
                  st.integers(min_value=-50, max_value=50)),
        min_size=1, max_size=20,
    ),
    trailing=st.integers(min_value=1, max_value=6),
)
def test_trailing_agg_matches_python_reference(spark, days, trailing):
    """trailing_agg == a dense-spine sliding window computed in Python."""
    from datetime import datetime

    from hashquery_spark.ops import trailing_agg

    rows = [("g", datetime(2024, 1, d), float(v)) for d, v in days]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    got = {
        r.bucket.day: (r.trailing_sum, r.trailing_count, r.window_buckets)
        for r in trailing_agg(df, "ts", "v", grain="day", group_col="g",
                              trailing=trailing).collect()
    }

    per_day = {}
    for d, v in days:
        s, c = per_day.get(d, (0.0, 0))
        per_day[d] = (s + v, c + 1)
    lo, hi = min(per_day), max(per_day)
    expect = {}
    for d in range(lo, hi + 1):
        win = [per_day.get(x, (0.0, 0)) for x in range(max(lo, d - trailing + 1), d + 1)]
        expect[d] = (
            float(sum(w[0] for w in win)),
            sum(w[1] for w in win),
            len(win),
        )
    assert got == expect


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "x9", ""]),
            min_size=0,
            max_size=8,
        ),
        min_size=1,
        max_size=12,
    ),
    bias=st.integers(min_value=-4, max_value=4),
)
def test_classifier_score_matches_python_reference(spark, docs, bias):
    """classifier_score margin == a pure-Python hashed-linear model over
    the same tokens (micro-unit exact, zero-token docs included)."""
    from hashquery_spark.ops import classifier_score, token_bucket_py

    n = 256  # small feature space so bucket collisions are exercised
    weights = {
        token_bucket_py(w, n): wt
        for w, wt in [("alpha", 1.5), ("beta", -0.75), ("x9", 0.125)]
    }
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["margin"], r["keep"])
        for r in classifier_score(
            df, "text", "doc_id", weights, bias=float(bias), n_features=n
        ).collect()
    }
    assert set(got) == set(range(len(docs)))
    for i, toks in enumerate(docs):
        # the engine normalizes then splits: digits survive, '' drops
        kept = [t for t in toks if t]
        ws = sum(
            round(weights.get(token_bucket_py(t, n), 0.0) * 1e6) for t in kept
        )
        margin = round((ws + bias * 1_000_000) / 1e6, 6)
        assert got[i] == (len(kept), margin, margin > 0), f"doc {i}"


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["spark", "engine", "data", "row", "x1"]),
            min_size=1,
            max_size=10,
        ),
        min_size=2,
        max_size=15,
    ),
)
def test_bm25_matches_python_reference(spark, docs):
    """bm25_search == an exact Python replica of the same grid-snapped
    scoring (idf rounded to 4dp, term scores snapped to 1e-4 and summed
    as integers, (score DESC, id) ranking)."""
    import math

    from hashquery_spark.ops import bm25_search

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["query_id"], r["doc_id"]): (r["score"], r["rank"])
        for r in bm25_search(df, {"q": "spark data"}, "text", "doc_id", top_k=100).collect()
    }

    k1, b = 1.2, 0.75
    n = len(docs)
    dl = {i: len(t) for i, t in enumerate(docs)}
    avgdl = sum(dl.values()) / n
    scores = {}
    for term in ["spark", "data"]:
        dft = sum(1 for t in docs if term in t)
        if dft == 0:
            continue
        # Spark rounds HALF_UP; Python round() is banker's — replicate
        idf = math.floor(math.log((n - dft + 0.5) / (dft + 0.5) + 1.0) * 10000.0 + 0.5) / 10000.0
        for i, t in enumerate(docs):
            tf = t.count(term)
            if tf == 0:
                continue
            sat = (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * dl[i] / avgdl))
            scores[i] = scores.get(i, 0) + int(math.floor(idf * sat * 10000.0 + 0.5))
    expected_scores = {i: round(s / 10000.0, 4) for i, s in scores.items()}
    order = sorted(expected_scores, key=lambda i: (-expected_scores[i], i))
    expected = {
        ("q", i): (expected_scores[i], rank + 1) for rank, i in enumerate(order)
    }
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vals=st.lists(
        st.floats(min_value=-1000, max_value=1000, allow_nan=False),
        min_size=3,
        max_size=40,
    ),
    lo=st.floats(min_value=0.0, max_value=0.4),
    hi=st.floats(min_value=0.6, max_value=1.0),
)
def test_winsorize_matches_numpy_percentiles(spark, vals, lo, hi):
    """winsorize clips exactly to numpy's linear-interpolated percentiles
    (Spark percentile == PERCENTILE_CONT == np.percentile 'linear')."""
    import numpy as np

    rows = [(i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v double")
    from hashquery_spark.ops import winsorize

    got = {
        r["id"]: r["v_winsorized"]
        for r in winsorize(df, "v", lo=lo, hi=hi, exact=True).collect()
    }
    plo = float(np.percentile(vals, lo * 100, method="linear"))
    phi = float(np.percentile(vals, hi * 100, method="linear"))
    for i, v in enumerate(vals):
        expected = min(max(v, plo), phi)
        assert got[i] == pytest.approx(expected, rel=1e-12, abs=1e-12), (
            i, v, plo, phi
        )


@given(
    texts=st.lists(
        st.text(
            alphabet="ab C.#\n-•*…xyz the of and 0123",
            min_size=0,
            max_size=200,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_gopher_rules_match_python_reference(spark, texts):
    """Every Gopher metric equals a straightforward Python replica on
    arbitrary text (newlines, bullets, ellipses, hashes, unicode)."""
    import re

    from hashquery_spark.ops import gopher_rules
    from hashquery_spark.ops.rules import GOPHER_STOPWORDS

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in gopher_rules(df, "text", "doc_id", min_words=2).collect()
    }

    def round4(num, den):
        import math

        return math.floor((100000.0 * num + 5.0 * den) / (10.0 * den)) / 10000.0

    for i, t in enumerate(texts):
        toks = t.strip().split() if t.strip() else []
        nw1 = max(len(toks), 1)
        lines = t.split("\n")
        nl1 = max(len(lines), 1)
        n_hash = t.count("#")
        n_ell3 = len(t) - len(t.replace("...", ""))
        exp = {
            "n_words": len(toks),
            "mean_word_len": round4(sum(len(w) for w in toks), nw1),
            "symbol_ratio": round4(3 * n_hash + n_ell3, 3 * nw1),
            "bullet_line_ratio": round4(
                sum(bool(re.match(r"^[-*•]", l.lstrip())) for l in lines), nl1
            ),
            "ellipsis_line_ratio": round4(
                sum(l.rstrip().endswith("...") for l in lines), nl1
            ),
            "alpha_word_ratio": round4(
                sum(bool(re.search("[A-Za-z]", w)) for w in toks), nw1
            ),
            "stop_hits": sum(
                w in {x.lower() for x in toks} for w in GOPHER_STOPWORDS
            ),
        }
        for k, v in exp.items():
            assert got[i][k] == v, (i, k, got[i][k], v, repr(t))


@given(
    texts=st.lists(
        st.text(
            alphabet='ab c.!?" {}\nlorem ipsum javascript xyz',
            min_size=0,
            max_size=160,
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_c4_filters_match_python_reference(spark, texts):
    """Every C4 output equals a straightforward Python replica on
    arbitrary multi-line pages."""
    import re

    from hashquery_spark.ops import c4_filters

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict() for r in c4_filters(df, "text", "doc_id").collect()
    }

    for i, t in enumerate(texts):
        lines = t.split("\n")

        def kept_line(l):
            r = l.rstrip(" ")  # Spark rtrim strips spaces only — match it
            return (
                bool(re.search(r'[.!?"]$', r))
                and len(l.strip().split()) >= 5
                and "javascript" not in l.lower()
            )

        kept = [l for l in lines if kept_line(l)]
        exp = {
            "clean_text": "\n".join(kept),
            "n_lines_kept": len(kept),
            "n_lines_total": len(lines),
            "has_lorem_ipsum": "lorem ipsum" in t.lower(),
            "has_brace": "{" in t.lower(),
            "passes": len(kept) >= 3
            and "lorem ipsum" not in t.lower()
            and "{" not in t.lower(),
        }
        for k, v in exp.items():
            assert got[i][k] == v, (i, k, got[i][k], v, repr(t))


@given(
    vecs=st.lists(
        st.lists(
            st.integers(min_value=-3, max_value=3).map(float),
            min_size=4,
            max_size=4,
        ).filter(lambda v: any(x != 0 for x in v)),
        min_size=3,
        max_size=12,
    ),
    threshold=st.sampled_from([0.5, 0.8, 0.95]),
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_semantic_dedup_matches_numpy_reference(spark, vecs, threshold):
    """Kept set equals a straight numpy replica of the whole algorithm:
    first-k centroids, 4-dp-rounded cosine cell assignment with
    lowest-centroid tiebreak, in-cell lower-id-similar drop rule."""
    import math

    from hashquery_spark.ops import semantic_dedup

    k = 2
    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: r["cell"]
        for r in semantic_dedup(
            df, "embedding", "vec_id", n_clusters=k, threshold=threshold
        ).collect()
    }

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(dot / (na * nb), 4)

    cents = [(cid, vecs[cid]) for cid in range(min(k, len(vecs)))]
    cell = {
        i: min(cents, key=lambda c: (-cos(v, c[1]), c[0]))[0]
        for i, v in enumerate(vecs)
    }
    dropped = {
        j
        for j in range(len(vecs))
        for i in range(j)
        if cell[i] == cell[j] and cos(vecs[i], vecs[j]) >= threshold
    }
    expected = {i: cell[i] for i in range(len(vecs)) if i not in dropped}
    assert got == expected, (got, expected)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    nums=st.lists(st.integers(1, 10**7), min_size=8, max_size=40),
    b=st.integers(0, 4),
    dp=st.sampled_from([3, 4, 6, 8, 9]),
)
def test_fround_agrees_cross_engine_on_decimal_ties(spark, nums, b, dp):
    """fround (the pure-IEEE floor-form round) must agree bit-for-bit
    between Spark, DuckDB, and Python ON THE TIE GRID: values num/den with
    den = 2^(dp+1)*5^b are EXACTLY representable doubles whose (dp+1)-th
    decimal can be a literal 5 — the class where Spark round() (shortest-
    repr half-up) and DuckDB round() (binary half-even) disagree (two
    sf0.1 red rows in round 2). Sweeps the quality-blend/psi/twa dps."""
    import math

    from pyspark.sql import functions as F

    from hashquery_spark.ops.dedup import fround
    from hashquery_spark.ops.rules import fround_sql

    den = (2 ** (dp + 1)) * (5**b)
    xs = sorted({n / den for n in nums} | {-n / den for n in nums})
    df = spark.createDataFrame([(x,) for x in xs], "x DOUBLE")
    got_spark = [
        r["v"]
        for r in df.select(fround(F.col("x"), dp).alias("v"))
        .orderBy("x")
        .collect()
    ]
    sql_vals = ", ".join(f"({x!r})" for x in xs)
    got_duck = [
        r[0]
        for r in duckdb.sql(
            f"SELECT {fround_sql('x', dp)} FROM (VALUES {sql_vals}) t(x) ORDER BY x"
        ).fetchall()
    ]
    expect = [math.floor(x * 10**dp + 0.5) / 10**dp for x in xs]
    assert list(map(repr, got_spark)) == list(map(repr, got_duck))
    assert list(map(repr, got_spark)) == list(map(repr, expect))


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    problems=st.lists(
        st.tuples(st.integers(1, 30), st.integers(0, 30)).map(
            lambda t: (t[0] + t[1], min(t[1], t[0] + t[1]))
        ),
        min_size=1,
        max_size=12,
    ),
    k=st.integers(1, 8),
)
def test_pass_at_k_matches_math_comb(spark, problems, k):
    """pass_at_k == the closed-form 1 - C(n-c,k)/C(n,k) estimator mean
    (math.comb), for arbitrary (n, c) mixes and k."""
    import math

    from hashquery_spark.ops import pass_at_k

    rows = [
        (f"p{i}", j < c) for i, (n, c) in enumerate(problems) for j in range(n)
    ]
    df = spark.createDataFrame(rows, "prob string, ok boolean")
    got = pass_at_k(df, "prob", "ok", ks=(k,)).collect()[0]

    vals = []
    for n, c in problems:
        if c == 0:
            est = 0.0
        elif n - c < k:
            est = 1.0
        else:
            est = 1.0 - math.comb(n - c, k) / math.comb(n, k)
        vals.append(math.floor(est * 1e6 + 0.5))
    num, den = sum(vals), len(vals) * 10**6
    want = math.floor((1e7 * num + 5.0 * den) / (10.0 * den)) / 1e6
    assert got["n_problems"] == len(problems)
    assert abs(got[f"pass_at_{k}"] - want) < 1e-12


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    pairs=st.lists(
        st.tuples(
            st.lists(st.sampled_from("ab cd ef gh ij".split()), min_size=0, max_size=8),
            st.lists(st.sampled_from("ab cd ef gh ij".split()), min_size=0, max_size=8),
        ),
        min_size=1,
        max_size=6,
    )
)
def test_translation_metrics_match_python_reference(spark, pairs):
    """Clipped n-gram precision/recall == a Counter-based python
    reference for arbitrary token streams (incl. empty sides)."""
    import math
    from collections import Counter

    from hashquery_spark.ops import translation_metrics

    rows = [(i, " ".join(c), " ".join(r)) for i, (c, r) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "id long, cand string, ref string")
    got = {
        r["id"]: r
        for r in translation_metrics(df, "cand", "ref", "id", max_n=2).collect()
    }

    def grams(toks, n):
        return Counter(
            tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)
        )

    def r4(num, den):
        return math.floor((1e5 * num + 5.0 * den) / (10.0 * den)) / 1e4

    for i, (c, r) in enumerate(pairs):
        # empty text tokenizes to [''] (split semantics) in the engine
        c2, r2 = (c or [""]), (r or [""])
        row = got[i]
        assert row["cand_len"] == len(c2) and row["ref_len"] == len(r2)
        for n in (1, 2):
            gc, gr = grams(c2, n), grams(r2, n)
            m = sum(min(gc[g], gr[g]) for g in gc)
            ct, rt = sum(gc.values()), sum(gr.values())
            assert row[f"p{n}"] == (r4(m, ct) if ct else None)
            assert row[f"r{n}"] == (r4(m, rt) if rt else None)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    a=st.lists(
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        min_size=1,
        max_size=60,
    ),
    b=st.lists(
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        min_size=1,
        max_size=60,
    ),
)
def test_ks_test_matches_python_ecdf(spark, a, b):
    """ks_test equals the brute-force ECDF sup-distance on arbitrary
    float samples (negatives, zeros, denormals, duplicates) — hammers
    the monotone octave bucketing and the two-phase prefix sum."""
    from hashquery_spark.ops import ks_test

    dfa = spark.createDataFrame([(float(x),) for x in a], "value double")
    dfb = spark.createDataFrame([(float(x),) for x in b], "value double")
    got = ks_test(dfa, dfb, "value").collect()[0]
    xs = sorted(set(a) | set(b))
    d_num = max(
        abs(
            sum(1 for v in a if v <= x) * len(b)
            - sum(1 for v in b if v <= x) * len(a)
        )
        for x in xs
    )
    assert got["d_num"] == d_num
    assert got["n_a"] == len(a) and got["n_b"] == len(b)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 3)),
        min_size=1,
        max_size=200,
    )
)
def test_mutual_information_matches_python_reference(spark, pairs):
    """mutual_information equals the integer log-microunit replica for
    arbitrary categorical pairs, and mi = h_x + h_y - h_xy exactly."""
    import math
    from collections import Counter

    from hashquery_spark.ops import mutual_information

    df = spark.createDataFrame(pairs, "x long, y long")
    got = mutual_information(df, "x", "y").collect()[0]

    L = lambda c: math.floor(math.log(c) * 1e6 + 0.5)  # noqa: E731
    n = len(pairs)
    cxy = Counter(pairs)
    cx = Counter(x for x, _ in pairs)
    cy = Counter(y for _, y in pairs)

    def h(counter):
        return (n * L(n) - sum(c * L(c) for c in counter.values())) / (n * 1e6)

    assert got["n"] == n
    assert got["h_x"] == h(cx) and got["h_y"] == h(cy) and got["h_xy"] == h(cxy)
    # the exact identity holds in MICROUNITS (float h sums may differ in
    # the last ulp): recompute mi the op's way
    mi_micro = (
        n * L(n)
        + sum(c * L(c) for c in cxy.values())
        - sum(c * L(c) for c in cx.values())
        - sum(c * L(c) for c in cy.values())
    )
    assert got["mi"] == mi_micro / (n * 1e6)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    data=st.lists(
        st.tuples(st.integers(0, 6), st.booleans()), min_size=2, max_size=40
    )
)
def test_average_precision_matches_python_reference(spark, data):
    """AP on random (score, label) multisets with heavy ties must equal
    the step-wise python reference exactly (1e-9-grid block terms)."""
    import math

    from hashquery_spark.ops import average_precision

    df = spark.createDataFrame(
        [(float(s), int(y)) for s, y in data], "s double, y int"
    )
    r = average_precision(df, "s", "y").collect()[0]
    blocks = {}
    for s, y in data:
        p, q = blocks.get(float(s), (0, 0))
        blocks[float(s)] = (p + 1, q) if y else (p, q + 1)
    npos = sum(p for p, _ in blocks.values())
    if npos == 0:
        assert r["average_precision"] is None
        return
    tp = cum = nano = 0
    for s in sorted(blocks, reverse=True):
        p, q = blocks[s]
        tp += p
        cum += p + q
        if p > 0:
            nano += math.floor(p * tp / (npos * cum) * 1e9)
    assert r["average_precision"] == nano / 1e9


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    pairs=st.lists(
        st.tuples(st.integers(-5, 5), st.integers(-5, 5)),
        min_size=3,
        max_size=30,
    )
)
def test_spearman_matches_python_reference(spark, pairs):
    """Tie-averaged Spearman on random integer pairs == the python
    Pearson-on-ranks reference (exact integer sums, fround 6)."""
    import math

    from hashquery_spark.ops import spearman_corr

    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in pairs], "x double, y double"
    )
    r = spearman_corr(df, "x", "y").collect()[0]

    def avg_ranks2(vals):
        order = {}
        for v in vals:
            order[v] = order.get(v, 0) + 1
        cum, r2 = 0, {}
        for v in sorted(order):
            c = order[v]
            cum += c
            r2[v] = 2 * cum - c + 1
        return [r2[v] for v in vals]

    xs = [float(x) for x, _ in pairs]
    ys = [float(y) for _, y in pairs]
    rx, ry = avg_ranks2(xs), avg_ranks2(ys)
    n = len(pairs)
    sx, sy = sum(rx), sum(ry)
    a = n * sum(v * v for v in rx) - sx * sx
    b = n * sum(v * v for v in ry) - sy * sy
    if a <= 0 or b <= 0:
        assert r["spearman_rho"] is None
        return
    num = n * sum(p * q for p, q in zip(rx, ry)) - sx * sy
    rho = float(num) / (math.sqrt(float(a)) * math.sqrt(float(b)))
    assert r["spearman_rho"] == math.floor(rho * 1e6 + 0.5) / 1e6


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vals=st.lists(
        st.integers(0, 1000).map(lambda v: v / 4.0), min_size=2, max_size=40
    )
)
def test_gini_matches_python_reference(spark, vals):
    """Gini over random non-negative values (quarter-grid → exact cents)
    == the sorted average-rank python reference."""
    import math

    from hashquery_spark.ops import gini

    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id long, v double")
    r = gini(df, "v").collect()[0]
    cents = [math.floor(v * 100.0 + 0.5) for v in vals]
    n, tot = len(cents), sum(cents)
    if tot == 0:
        assert r["gini"] is None
        return
    s = sorted(cents)
    num = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(s))
    assert r["gini"] == math.floor(num / (n * tot) * 1e6 + 0.5) / 1e6
    assert r["total"] == tot / 100.0


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 20), st.booleans()), min_size=4, max_size=60
    ).filter(lambda p: any(s for _, s in p) and any(not s for _, s in p))
)
def test_mann_whitney_matches_python_reference(spark, pairs):
    """Tie-corrected U/z on random tie-heavy samples == the python
    doubled-rank reference (exact integers; z a fixed IEEE chain)."""
    import math

    from hashquery_spark.ops import mann_whitney

    df = spark.createDataFrame(
        [(float(v), s) for v, s in pairs], "v double, side boolean"
    )
    out = mann_whitney(df, "v", "side").collect()[0]
    a = sorted(v for v, s in pairs if s)
    b = sorted(v for v, s in pairs if not s)
    na, nb = len(a), len(b)
    # doubled tie-averaged ranks over the pooled sample
    from collections import Counter

    cnt = Counter(v for v, _ in pairs)
    cum, rank2 = 0, {}
    for v in sorted(cnt):
        c = cnt[v]
        cum += c
        rank2[v] = 2 * cum - c + 1
    r2a = sum(rank2[v] for v in a)
    two_u = r2a - na * (na + 1)
    assert out["u"] == two_u / 2.0
    n = na + nb
    t_corr = sum(c**3 - c for c in cnt.values())
    big_b = (n + 1.0) * n * (n - 1.0) - float(t_corr)
    four_var = na * nb * big_b / (3.0 * n * (n - 1.0))
    if four_var <= 0:
        assert out["z"] is None
        return
    z = (float(two_u) - float(na) * float(nb)) / math.sqrt(four_var)
    assert out["z"] == math.floor(z * 1e6 + 0.5) / 1e6


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    data=st.lists(
        st.tuples(st.integers(0, 12), st.booleans()), min_size=2, max_size=50
    )
)
def test_kaplan_meier_matches_python_reference(spark, data):
    """KM survival on random censored samples == the python
    product-limit reference under the identical micro-unit ln snap."""
    import math
    from collections import Counter

    from hashquery_spark.ops import kaplan_meier

    df = spark.createDataFrame(
        [(t, e) for t, e in data], "dur long, ev boolean"
    )
    rows = {r["t"]: r for r in kaplan_meier(df, "dur", "ev").collect()}
    deaths = Counter(t for t, e in data if e)
    censors = Counter(t for t, e in data if not e)
    times = sorted(set(deaths) | set(censors))
    at_risk = len(data)
    lns, dead = 0, False
    for t in times:
        d, c = deaths.get(t, 0), censors.get(t, 0)
        r = rows[t]
        assert (r["n_risk"], r["n_events"], r["n_censored"]) == (at_risk, d, c)
        if d == at_risk:
            dead = True
        elif d > 0:
            lns += math.floor(math.log((at_risk - d) / at_risk) * 1e6 + 0.5)
        want = 0.0 if dead else math.floor(math.exp(lns / 1e6) * 1e6 + 0.5) / 1e6
        assert r["survival"] == want
        at_risk -= d + c


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40), st.integers(0, 40)),
        min_size=3, max_size=40,
    )
)
def test_corr_matrix_matches_numpy(spark, rows):
    """One-pass exact-DECIMAL Pearson == numpy.corrcoef within the
    fround(6) snap (integer-valued inputs sit on the micro grid)."""
    import numpy as np

    from hashquery_spark.ops import corr_matrix

    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in rows],
        "x double, y double, z double",
    )
    out = {(r["col_x"], r["col_y"]): r["corr"]
           for r in corr_matrix(df, ["x", "y", "z"]).collect()}
    arr = np.array(rows, dtype=float)
    for (i, j), key in [((0, 1), ("x", "y")), ((0, 2), ("x", "z")),
                        ((1, 2), ("y", "z"))]:
        vx, vy = arr[:, i], arr[:, j]
        if vx.std() == 0 or vy.std() == 0:
            assert out[key] is None
            continue
        want = float(np.corrcoef(vx, vy)[0, 1])
        assert out[key] is not None and abs(out[key] - want) < 1e-5


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    data=st.lists(
        st.tuples(st.integers(0, 8), st.sampled_from(["a", "b", "c"])),
        min_size=2, max_size=50,
    )
)
def test_krippendorff_matches_python_reference(spark, data):
    """Nominal alpha on random long-format ratings == the python
    coincidence-matrix reference under the identical 1e-6 floor."""
    import math
    from collections import Counter, defaultdict

    from hashquery_spark.ops import krippendorff_alpha

    df = spark.createDataFrame(data, "i long, v string")
    out = krippendorff_alpha(df, "i", "v").collect()[0]
    per_item = defaultdict(Counter)
    for i, v in data:
        per_item[i][v] += 1
    items = {i: c for i, c in per_item.items() if sum(c.values()) >= 2}
    if not items:
        assert out["n_items"] == 0
        return
    n = sum(sum(c.values()) for c in items.values())
    dsum = 0
    for c in items.values():
        m = sum(c.values())
        sq = sum(x * x for x in c.values())
        dsum += (m * m - sq) * 1000000 // (m - 1)
    margins = Counter()
    for c in items.values():
        margins.update(c)
    sqc = sum(x * x for x in margins.values())
    de = float(n * n - sqc)
    assert (out["n_items"], out["n_ratings"]) == (len(items), n)
    if de <= 0:
        assert out["alpha"] is None
        return
    alpha = 1.0 - (float(dsum) * (float(n) - 1.0)) / (1000000.0 * de)
    assert out["alpha"] == math.floor(alpha * 1e6 + 0.5) / 1e6


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    data=st.lists(
        st.tuples(st.sampled_from(["g1", "g2", "g3"]),
                  st.sampled_from(["a", "b", "c", "d"])),
        min_size=1, max_size=60,
    )
)
def test_t_closeness_matches_python_reference(spark, data):
    """TV distances on random (quasi, sensitive) tables == the python
    exact-fraction reference on the 4-dp grid."""
    import math
    from collections import Counter

    from hashquery_spark.ops import t_closeness

    df = spark.createDataFrame(data, "q string, s string")
    out = {r["q"]: r["tv_distance"] for r in t_closeness(df, "q", "s").collect()}
    glob = Counter(s for _, s in data)
    big_n = sum(glob.values())
    groups = {}
    for q, s in data:
        groups.setdefault(q, Counter())[s] += 1
    for q, cnt in groups.items():
        ng = sum(cnt.values())
        num = sum(abs(c * big_n - glob[v] * ng) for v, c in cnt.items())
        num += ng * (big_n - sum(glob[v] for v in cnt))
        den = 2 * ng * big_n
        want = math.floor((100000.0 * float(num) + 5.0 * float(den))
                          / (10.0 * float(den))) / 10000.0
        assert out[q] == want


# --------------------------------------------------------------------------
# bucketed_running_sums / monotone_value_bucket direct coverage (ADVICE r5):
# the two-phase prefix sum underpins 8+ oracle-paired ops but had only
# indirect parity coverage on a corpus whose values never stress the
# octave-boundary / denormal / non-finite claims.
# --------------------------------------------------------------------------

_BRS_SPECIALS = [
    0.0, -0.0, 5e-324, -5e-324, 2.2250738585072014e-308,  # denormal edge
    1.0, -1.0, 2.0, 4.0, 1024.0,                          # exact octaves
    math.nextafter(2.0, 0.0), math.nextafter(2.0, 3.0),   # 2^k ± ulp
    math.nextafter(1024.0, 0.0), math.nextafter(1024.0, 2000.0),
    -math.nextafter(2.0, 0.0), -math.nextafter(2.0, 3.0),
    float("inf"), float("-inf"), float("nan"),
    1e308, -1e308, 3.141592653589793, -2.718281828459045,
]


def _float_key(v):
    return "nan" if math.isnan(v) else repr(v + 0.0)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vals=st.lists(
        st.one_of(
            st.floats(allow_nan=False, allow_infinity=False, width=64),
            st.sampled_from(_BRS_SPECIALS),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_bucketed_running_sums_matches_single_window_exactly(spark, vals):
    """Two-phase bucketed prefix sum == the naive single-window ordered
    cumsum, bit-for-bit, on adversarial doubles: denormals, 2^k ± ulp
    octave boundaries, mixed signs, ±Inf, and NaN (which Spark sorts
    ABOVE +Inf — the r5 ADVICE NaN-bucket hazard)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hashquery_spark.ops.dedup import bucketed_running_sums

    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    hist = df.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    brs = {
        _float_key(r["v"]): r["cum"]
        for r in bucketed_running_sums(hist, [], "v", ["c"], ["cum"]).collect()
    }
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    naive = {
        _float_key(r["v"]): r["cum"]
        for r in hist.select("v", F.sum("c").over(w).alias("cum")).collect()
    }
    assert brs == naive


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vals=st.lists(
        st.one_of(
            st.floats(allow_nan=False, allow_infinity=False, width=64),
            st.sampled_from(_BRS_SPECIALS),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_monotone_value_bucket_is_weakly_monotone(spark, vals):
    """Bucket keys must be weakly monotone in Spark's SORT order
    (-Inf < finites < +Inf < NaN) — the correctness precondition for the
    two-phase prefix sum."""
    from pyspark.sql import functions as F

    from hashquery_spark.ops.dedup import monotone_value_bucket

    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    rows = (
        df.distinct()
        .select("v", monotone_value_bucket(F.col("v")).alias("b"))
        .orderBy("v")
        .collect()
    )
    keys = [r["b"] for r in rows]
    assert keys == sorted(keys), [(r["v"], r["b"]) for r in rows]


def test_bucketed_running_sums_preserves_null_groups(spark):
    """A NULL ``by`` key must keep its running sums (ADVICE r5: the plain
    equi-join form silently dropped NULL groups — the replaced
    Window.partitionBy form preserved them), end-to-end through a
    migrated op: binary_auc's NULL group equals the same AUC computed on
    the NULL-subset alone."""
    from pyspark.sql import functions as F

    from hashquery_spark.ops import binary_auc
    from hashquery_spark.ops.dedup import bucketed_running_sums

    rows = [
        ("a", 0.9, 1), ("a", 0.8, 0), ("a", 0.7, 1), ("a", 0.1, 0),
        (None, 0.95, 1), (None, 0.6, 0), (None, 0.5, 1), (None, 0.2, 0),
        (None, 0.4, 1),
    ]
    df = spark.createDataFrame(rows, "g string, score double, label int")

    # direct: the helper keeps the NULL group
    hist = df.groupBy("g", "score").agg(F.count(F.lit(1)).alias("c"))
    out = bucketed_running_sums(hist, ["g"], "score", ["c"], ["cum"])
    null_rows = [r for r in out.collect() if r["g"] is None]
    assert len(null_rows) == 5
    assert sorted(r["cum"] for r in null_rows) == [1, 2, 3, 4, 5]

    # end-to-end: grouped AUC for the NULL group == ungrouped AUC on the
    # NULL subset
    grouped = {r["g"]: r["auc"] for r in binary_auc(df, "score", "label", by="g").collect()}
    assert None in grouped and "a" in grouped
    solo = binary_auc(
        df.where(F.col("g").isNull()), "score", "label"
    ).collect()[0]["auc"]
    assert grouped[None] == solo


def test_null_groups_survive_migrated_prefix_sum_ops(spark):
    """quantile_normalize / average_precision / dp_quantile keep rows
    whose group key is NULL (the totals join-backs were plain equi-joins
    before the ADVICE-r5 fix)."""
    from pyspark.sql import functions as F

    from hashquery_spark.ops import average_precision, dp_quantile, quantile_normalize

    rows = [
        ("a", 1, 10.0, 1), ("a", 2, 20.0, 0), ("a", 3, 30.0, 1),
        (None, 4, 5.0, 1), (None, 5, 15.0, 0), (None, 6, 25.0, 1),
        (None, 7, 35.0, 0),
    ]
    df = spark.createDataFrame(rows, "g string, id int, v double, lab int")

    qn = quantile_normalize(df, "v", id_col="id", by="g")
    assert qn.where(F.col("g").isNull()).count() == 4
    assert qn.count() == 7

    ap = average_precision(df, "v", "lab", by="g")
    assert ap.where(F.col("g").isNull()).count() == 1
    assert ap.count() == 2

    dq = dp_quantile(df, "v", q=0.5, epsilon=1e6, seed="t", by="g")
    assert dq.where(F.col("g").isNull()).count() == 1
    assert dq.count() == 2


def _ungrouped_by_sweep_ops():
    """Every op with an optional ``by`` that routes the null-safe
    prefix-sum helpers, as (name, call(df, by)) pairs — the r6
    quantile_normalize regression class ("refactor validated only on
    the grouped path")."""
    from hashquery_spark.ops import (
        average_precision,
        binary_auc,
        dp_quantile,
        gini,
        kendall_tau_continuous,
        mann_whitney,
        quantile_normalize,
        spearman_corr,
    )
    from hashquery_spark.ops.timeseries import kaplan_meier

    return [
        ("binary_auc", lambda df, by: binary_auc(df, "v", "lab", by=by)),
        ("average_precision",
         lambda df, by: average_precision(df, "v", "lab", by=by)),
        ("mann_whitney",
         lambda df, by: mann_whitney(df, "v", "lab", by=by)),
        ("gini", lambda df, by: gini(df, "v", by=by)),
        ("kendall_tau_continuous",
         lambda df, by: kendall_tau_continuous(df, "v", "y", by=by)),
        ("spearman_corr",
         lambda df, by: spearman_corr(df, "v", "y", by=by)),
        ("quantile_normalize",
         lambda df, by: quantile_normalize(df, "v", id_col="id", by=by)),
        ("dp_quantile",
         lambda df, by: dp_quantile(df, "v", q=0.5, epsilon=1e6, seed="t",
                                    by=by)),
        ("kaplan_meier",
         lambda df, by: kaplan_meier(df, "dur", "ev", by=by)),
    ]


def _by_sweep_frame(spark):
    rows = []
    for i in range(24):
        rows.append((
            i,
            float(i % 7) + (0.5 if i % 3 == 0 else 0.0),  # ties on purpose
            float((i * 13) % 11),
            i % 2,
            "l" if i % 2 == 0 else "r",
            float(i % 9 + 1),
            i % 3 != 0,
        ))
    return spark.createDataFrame(
        rows, "id int, v double, y double, lab int, side string, "
              "dur double, ev boolean"
    )


@pytest.mark.parametrize(
    "name,call", _ungrouped_by_sweep_ops(), ids=lambda p: p if isinstance(p, str) else ""
)
def test_ungrouped_by_none_matches_constant_group(spark, name, call):
    """by=None, by=[], and by=<constant column> must all work and agree —
    the r6 quantile_normalize regression was an ungrouped-only crash
    (join(on=[]) IndexError) invisible to every grouped test.
    dp_quantile's released value is exempt from the constant-group value
    check (its noise key hashes the group columns by design), but its
    ungrouped path must still run and agree across by=None / by=[]."""
    from pyspark.sql import functions as F

    df = _by_sweep_frame(spark)

    def canon(frame, drop=()):
        cols = [c for c in frame.columns if c not in drop]
        return sorted(
            tuple(row[c] for c in cols) for row in frame.select(*cols).collect()
        ), cols

    out_none, cols_none = canon(call(df, None))
    out_empty, cols_empty = canon(call(df, []))
    assert cols_none == cols_empty
    assert out_none == out_empty, name

    grouped_df = call(df.withColumn("const", F.lit("x")), "const")
    out_const, cols_const = canon(grouped_df, drop=("const",))
    assert cols_const == cols_none, name
    if name == "dp_quantile":
        assert len(out_const) == len(out_none) == 1
    else:
        assert out_const == out_none, name


def test_null_group_equals_null_subset_ungrouped(spark):
    """For every by-sweep op: the NULL group's grouped result equals the
    ungrouped result computed on the NULL-subset alone (extends the
    binary_auc end-to-end check to the whole helper-caller family;
    dp_quantile exempt from value equality — group-seeded noise)."""
    from pyspark.sql import functions as F

    df = _by_sweep_frame(spark).withColumn(
        "g", F.when(F.col("id") % 3 == 0, F.lit(None)).otherwise(
            (F.col("id") % 2).cast("string"))
    )
    null_subset = df.where(F.col("g").isNull()).drop("g")
    for name, call in _ungrouped_by_sweep_ops():
        grouped = call(df, "g")
        null_rows = sorted(
            tuple(r[c] for c in grouped.columns if c != "g")
            for r in grouped.where(F.col("g").isNull()).collect()
        )
        assert null_rows, name
        if name == "dp_quantile":
            continue
        solo_df = call(null_subset, None)
        solo = sorted(
            tuple(r[c] for c in solo_df.columns) for r in solo_df.collect()
        )
        assert null_rows == solo, name


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    data=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", None]),
            st.one_of(
                st.integers(min_value=-20, max_value=20).map(float),
                st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False, allow_infinity=False, width=64),
            ),
            st.one_of(
                st.integers(min_value=-20, max_value=20).map(float),
                st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False, allow_infinity=False, width=64),
            ),
        ),
        min_size=2,
        max_size=80,
    )
)
def test_kendall_tau_continuous_matches_brute_force(spark, data):
    """The bucket-decomposed exact tau-b (grid 2-D prefix + per-bucket
    Fenwick locals) == the O(n²) python brute force on adversarial
    (ties-heavy, mixed-magnitude, NULL-group) inputs."""
    import math
    from collections import defaultdict

    from hashquery_spark.ops import kendall_tau_continuous

    df = spark.createDataFrame(data, "g string, x double, y double")
    out = {
        r["g"]: (r["n"], r["kendall_tau"])
        for r in kendall_tau_continuous(df, "x", "y", by="g").collect()
    }
    groups = defaultdict(list)
    for g, x, y in data:
        groups[g].append((x, y))
    for g, pts in groups.items():
        P = Q = 0
        n = len(pts)
        for i in range(n):
            for j in range(i + 1, n):
                (xa, ya), (xb, yb) = pts[i], pts[j]
                if xa == xb or ya == yb:
                    continue
                if (xa < xb) == (ya < yb):
                    P += 1
                else:
                    Q += 1
        tcx = defaultdict(int)
        tcy = defaultdict(int)
        for x, y in pts:
            tcx[x] += 1
            tcy[y] += 1
        da = n * (n - 1) - sum(t * (t - 1) for t in tcx.values())
        db = n * (n - 1) - sum(t * (t - 1) for t in tcy.values())
        if n >= 2 and da > 0 and db > 0:
            tau = 2.0 * (P - Q) / (math.sqrt(float(da)) * math.sqrt(float(db)))
            want = (n, math.floor(tau * 1e6 + 0.5) / 1e6)
        else:
            want = (n, None)
        assert out[g] == want, (g, out[g], want)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    data=st.lists(
        st.lists(
            st.floats(min_value=-100, max_value=100,
                      allow_nan=False, allow_infinity=False, width=32),
            min_size=8, max_size=8,
        ),
        min_size=4, max_size=24,
    )
)
def test_pq_encode_matches_numpy_argmin(spark, data):
    """PQ codes == numpy per-subspace squared-L2 argmin (lowest code on
    ties) and recon_sq_err == the summed subspace minima, on random
    float32 vectors (m=2 subspaces, k=4 first-vector codebooks)."""
    import numpy as np

    from hashquery_spark.ops import pq_encode

    m, k, dim = 2, 4, 8
    if len(data) < k:
        return
    emb = spark.createDataFrame(
        [(i, v) for i, v in enumerate(data)],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in pq_encode(
        emb, "embedding", "vec_id", m=m, k=k).collect()}
    # float32 storage: replicate the cast the engine reads back
    mat = np.array(data, dtype=np.float32).astype(np.float64)
    books = mat[:k]
    dsub = dim // m
    for i, _ in enumerate(data):
        expect_err = 0.0
        for s in range(m):
            sub = mat[i, s * dsub:(s + 1) * dsub]
            d2 = ((books[:, s * dsub:(s + 1) * dsub] - sub) ** 2).sum(axis=1)
            best = int(np.argmin(d2))  # numpy argmin takes the first min
            got = rows[i][f"code_{s}"]
            # the engine's chain is |c|^2 - 2 v.c (ties to lowest code);
            # compare via distance equality to tolerate float ties
            assert abs(d2[got] - d2[best]) < 1e-6, (i, s, got, best)
            expect_err += float(d2[got])
        assert abs(rows[i]["recon_sq_err"] - expect_err) < 1e-6, i


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    a=st.lists(
        st.floats(min_value=-50, max_value=50, allow_nan=False).map(
            lambda x: round(x, 3)
        ),
        min_size=1,
        max_size=40,
    ),
    b=st.lists(
        st.floats(min_value=-50, max_value=50, allow_nan=False).map(
            lambda x: round(x, 3)
        ),
        min_size=1,
        max_size=40,
    ),
)
def test_wasserstein_matches_python_brute_force(spark, a, b):
    """W1 equals the brute-force ECDF integral computed in python over
    the micro-grid-snapped values (the op's own grid), for random
    samples of any shape."""
    from hashquery_spark.ops import wasserstein_1d

    mk = lambda vals: spark.createDataFrame(
        [(float(v),) for v in vals], "x double"
    )
    got = wasserstein_1d(mk(a), mk(b), "x").collect()
    ai = sorted(int(math.floor(v * 1e6 + 0.5)) for v in a)
    bi = sorted(int(math.floor(v * 1e6 + 0.5)) for v in b)
    values = sorted(set(ai) | set(bi))
    if len(values) < 2:
        assert got == []
        return
    na, nb = len(ai), len(bi)
    total = 0
    for lo, hi in zip(values, values[1:]):
        fa = sum(1 for v in ai if v <= lo)
        fb = sum(1 for v in bi if v <= lo)
        total += abs(fa * nb - fb * na) * (hi - lo)
    want = total / (na * nb * 1e6)
    (row,) = got
    assert row["n_a"] == na and row["n_b"] == nb
    assert row["w1"] == pytest.approx(want, rel=1e-12, abs=1e-15)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),      # user
            st.integers(min_value=0, max_value=50),     # second offset
            st.sampled_from(["click", "view", "buy"]),  # event
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda t: (t[0], t[1]),
    ),
)
def test_attribution_matches_python_replica(spark, events):
    """Linear and last-touch attribution agree with a per-journey python
    replica (exact floor(1e12/k) units) on random event streams."""
    from hashquery_spark.ops import attribution

    rows = [
        (u, datetime(2024, 1, 1, 0, 0, s), e) for u, s, e in events
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event string")

    def replica(model):
        cred: dict = {}
        touches_n: dict = {}
        by_user: dict = {}
        for u, s, e in events:
            by_user.setdefault(u, []).append((s, e))
        for u, evs in by_user.items():
            evs.sort()
            for s, e in evs:
                if e != "buy":
                    continue
                prior = [(ts, ch) for ts, ch in evs if ts < s and ch != "buy"]
                if not prior:
                    continue
                if model == "linear":
                    unit = 10**12 // len(prior)
                    for _, ch in prior:
                        cred[ch] = cred.get(ch, 0) + unit
                        touches_n[ch] = touches_n.get(ch, 0) + 1
                else:
                    # last: max ts; first: min ts. unique (u, ts) by
                    # the strategy => no timestamp ties to break.
                    key = max(prior) if model == "last_touch" else min(prior)
                    ch = key[1]
                    cred[ch] = cred.get(ch, 0) + 10**12
                    touches_n[ch] = touches_n.get(ch, 0) + 1
        return {
            ch: (touches_n[ch], cred[ch] / 1e12) for ch in cred
        }

    for model in ("linear", "last_touch", "first_touch"):
        got = {
            r["channel"]: (r["n_touches"], r["credit"])
            for r in attribution(
                df, "user_id", "ts", "event", "buy", model=model
            ).collect()
        }
        assert got == replica(model), model


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(1, 9)),
        min_size=1,
        max_size=60,
    )
)
def test_cms_counters_match_python_replica(spark, pairs):
    """CMS counters over arbitrary weighted item multisets equal the
    python replica of the same KM-double-hashed sketch exactly, and
    every point estimate is >= the true count (the one-sided CMS
    guarantee) while equaling the replica's min-over-depths."""
    import hashlib
    from collections import Counter

    from hashquery_spark.ops import cms_query, cms_rollup

    W, D = 32, 3
    rows = [(f"i{a}", w) for a, w in pairs]
    df = spark.createDataFrame(rows, "item string, w int")
    sketch = cms_rollup(df, "item", width=W, depth=D, weight_col="w")
    true = Counter()
    for it, w in rows:
        true[it] += w
    py = Counter()
    for it, c in true.items():
        h = hashlib.md5(it.encode()).hexdigest()
        h1, h2 = int(h[:8], 16), int(h[8:16], 16)
        for j in range(D):
            py[(j, (h1 + j * h2) % W)] += c
    got = {(r["depth_j"], r["slot"]): r["counter"] for r in sketch.collect()}
    assert got == dict(py)
    est = {
        r["item"]: r["est_count"]
        for r in cms_query(sketch, sorted(true), width=W, depth=D).collect()
    }
    for it, c in true.items():
        h = hashlib.md5(it.encode()).hexdigest()
        h1, h2 = int(h[:8], 16), int(h[8:16], 16)
        want = min(py[(j, (h1 + j * h2) % W)] for j in range(D))
        assert est[it] == want
        assert est[it] >= c


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.booleans()),
        min_size=2,
        max_size=80,
    )
)
def test_roc_points_match_sklearn_style_replica(spark, pairs):
    """tp/fp at every threshold equal the python brute-force count of
    (score >= t) items per class; the curve covers every distinct
    score."""
    from hashquery_spark.ops import roc_points

    rows = [(float(s), 1 if y else 0) for s, y in pairs]
    df = spark.createDataFrame(rows, "s double, y int")
    got = {
        r["threshold"]: (r["tp"], r["fp"])
        for r in roc_points(df, "s", "y").collect()
    }
    thresholds = sorted({s for s, _ in rows})
    assert set(got) == set(float(t) for t in thresholds)
    for t in thresholds:
        tp = sum(1 for s, y in rows if y == 1 and s >= t)
        fp = sum(1 for s, y in rows if y == 0 and s >= t)
        assert got[float(t)] == (tp, fp), t


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 40), st.integers(-5, 5)),
        min_size=1,
        max_size=60,
    )
)
def test_dpo_pairs_match_python_replica(spark, triples):
    """Chosen/rejected/margin per prompt equal the python argmax/argmin
    with (score, id) tiebreaks; prompts without a positive margin or a
    second completion never emit."""
    from hashquery_spark.ops import dpo_pair_build

    rows = [(f"p{p}", f"c{c:03d}", float(s)) for p, c, s in triples]
    # completion ids may repeat across prompts; dedupe (prompt, cid)
    seen = set()
    uniq = []
    for p, c, s in rows:
        if (p, c) not in seen:
            seen.add((p, c))
            uniq.append((p, c, s))
    df = spark.createDataFrame(uniq, "p string, c string, s double")
    got = {
        r["prompt"]: (r["chosen"], r["rejected"], r["margin"])
        for r in dpo_pair_build(df, "p", "c", "s").collect()
    }
    from collections import defaultdict

    groups = defaultdict(list)
    for p, c, s in uniq:
        groups[p].append((c, s))
    for p, cs in groups.items():
        ch = min(cs, key=lambda x: (-x[1], x[0]))
        rj = min(cs, key=lambda x: (x[1], x[0]))
        margin = ch[1] - rj[1]
        if len(cs) >= 2 and margin > 0:
            assert got[p] == (ch[0], rj[0], margin), p
        else:
            assert p not in got, p
