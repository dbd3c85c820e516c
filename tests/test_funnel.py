"""match_steps / funnel semantics against the reference's canonical 7-user
docstring fixture (reference: src/model/model.py:578-628)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from hashquery_spark import Connection, Model, column, func, attr, rel

ROWS = [
    (0, "ad_impression", "2024-01-01"), (0, "visit", "2024-01-02"), (0, "purchase", "2024-01-04"),
    (1, "ad_impression", "2024-01-01"), (1, "visit", "2024-01-02"),
    (1, "purchase", "2024-01-03"), (1, "purchase", "2024-01-04"),
    (2, "ad_impression", "2024-01-01"), (2, "visit", "2024-01-02"),
    (3, "ad_impression", "2024-01-01"), (3, "visit", "2024-01-02"),
    (4, "ad_impression", "2024-01-01"),
    (5, "visit", "2024-01-01"), (5, "purchase", "2024-01-02"),
    (6, "other_event", "2024-01-01"),
]


@pytest.fixture(scope="module")
def events(spark):
    conn = Connection(spark)
    conn.register_records(
        "fixture_events",
        [(u, e, datetime.fromisoformat(t)) for u, e, t in ROWS],
        schema="user_id long, event string, timestamp timestamp",
    )
    return Model(conn, "fixture_events").with_activity_schema(
        group=attr.user_id, timestamp=attr.timestamp, event_key=attr.event
    )


STEPS = ["ad_impression", "visit", "purchase"]


def test_funnel_reference_fixture(events):
    got = {r["step"]: r["entities"] for r in events.funnel(STEPS).run().py_records}
    assert got == {"ad_impression": 5, "visit": 4, "purchase": 2}


def test_funnel_top_of_funnel_row(events):
    recs = events.funnel(STEPS, top_of_funnel="users").run().py_records
    assert recs[0] == {"step": "users", "entities": 7}


def test_funnel_row_order(events):
    steps = [r["step"] for r in events.funnel(STEPS).run().py_records]
    assert steps == ["ad_impression", "visit", "purchase"]


def test_conversion_rate(events):
    rec = events.funnel_conversion_rate(STEPS).run().py_records[0]
    assert rec["startedCount"] == 5
    assert rec["convertedCount"] == 2
    assert rec["rate"] == pytest.approx(0.4)
    # user 0: 3 days; user 1: 2 days -> avg 2.5 days
    assert rec["avgSecondsToConvert"] == pytest.approx(2.5 * 86400)


def test_time_limit_strictly_less(events):
    # 3-day limit: user 0 (3 days, not < 3d) excluded; user 1 (2 days) kept
    got = {
        r["step"]: r["entities"]
        for r in events.funnel(STEPS, time_limit=timedelta(days=3)).run().py_records
    }
    assert got == {"ad_impression": 5, "visit": 4, "purchase": 1}


def test_match_steps_attributes(events):
    matched = events.match_steps(STEPS)
    recs = {
        r["user_id"]: r
        for r in matched.pick(
            attr.user_id, attr.last_matched_step_name, attr.last_matched_step_index
        ).run().py_records
    }
    assert recs[0]["last_matched_step_name"] == "purchase"
    assert recs[0]["last_matched_step_index"] == 2
    assert recs[2]["last_matched_step_name"] == "visit"
    assert recs[4]["last_matched_step_name"] == "ad_impression"
    assert recs[5]["last_matched_step_name"] is None  # never entered
    assert recs[6]["last_matched_step_name"] is None


def test_match_steps_step_namespace_full_row(events):
    # referencing a non-timestamp event attribute triggers the lazy
    # join-back to the positioned event rows
    matched = events.match_steps(STEPS)
    recs = {
        r["user_id"]: r["visit_event"]
        for r in matched.pick(
            attr.user_id, rel.visit.event.named("visit_event")
        ).run().py_records
    }
    assert recs[0] == "visit"
    assert recs[4] is None


def test_greedy_first_match(events):
    # user 1 has two purchases; greedy matching takes the FIRST one after
    # the visit (2024-01-03)
    matched = events.match_steps(STEPS)
    recs = {
        r["user_id"]: r["purchase_ts"]
        for r in matched.pick(
            attr.user_id, rel.purchase.timestamp.named("purchase_ts")
        ).run().py_records
    }
    assert recs[1] == datetime(2024, 1, 3)


def test_empty_steps_funnel(events):
    recs = events.funnel([]).run().py_records
    assert recs == [{"step": "entities", "entities": 7}]


def test_62_step_limit(events):
    with pytest.raises(ValueError):
        events.match_steps([(f"e{i}", f"s{i}") for i in range(63)])


def test_partition_start_events(spark):
    conn = Connection(spark)
    conn.register_records(
        "pevents",
        [
            # user 1 starts in both channels; converts only via web
            (1, "start", "web", datetime(2024, 1, 1)),
            (1, "start", "email", datetime(2024, 1, 2)),
            (1, "buy", None, datetime(2024, 1, 3)),
            # user 2 starts via email only, no buy
            (2, "start", "email", datetime(2024, 1, 1)),
            # user 3 never starts
            (3, "buy", None, datetime(2024, 1, 1)),
        ],
        schema="user_id long, event string, channel string, timestamp timestamp",
    )
    m = Model(conn, "pevents").with_activity_schema(
        group=attr.user_id, timestamp=attr.timestamp, event_key=attr.event
    )
    recs = m.funnel(
        ["start", "buy"], partition_start_events=[column("channel")]
    ).run().py_records
    got = {(r["channel"], r["step"]): r["entities"] for r in recs}
    # web journey of user 1: start(01-01) -> buy(01-03) matched
    # email journey of user 1: start(01-02) -> buy(01-03) matched
    # email journey of user 2: start only
    assert got[("web", "start")] == 1
    assert got[("web", "buy")] == 1
    assert got[("email", "start")] == 2
    assert got[("email", "buy")] == 1


def test_same_event_matching_multiple_steps(spark):
    """An event matching several steps can satisfy only ONE of them: the
    journey hash orders duplicate-(ts) chars by step DESC, so matching an
    earlier step moves the cursor past the same event's later-step chars
    (reference: compilers/match_steps.py:513-521)."""
    conn = Connection(spark)
    conn.register_records(
        "multi_events",
        [
            (1, "both", datetime(2024, 1, 1)),  # matches step A and step B
            (2, "both", datetime(2024, 1, 1)),
            (2, "b_only", datetime(2024, 1, 2)),  # later event for step B
        ],
        schema="user_id long, event string, timestamp timestamp",
    )
    m = Model(conn, "multi_events").with_activity_schema(
        group=attr.user_id, timestamp=attr.timestamp, event_key=attr.event
    )
    step_a = (column("event").in_(["both"])).named("step_a")
    step_b = (column("event").in_(["both", "b_only"])).named("step_b")
    got = {r["step"]: r["entities"] for r in m.funnel([step_a, step_b]).run().py_records}
    # user 1: single event consumed by step_a; step_b needs a LATER event -> unmatched
    # user 2: step_a at day 1, step_b at day 2
    assert got == {"step_a": 2, "step_b": 1}


def test_duplicate_timestamp_ordering(spark):
    """Exact-duplicate timestamps across different steps: the (ts, step
    DESC) ordering puts the later step's char first, so the earlier step
    still matches and the later step's event at the same instant counts."""
    conn = Connection(spark)
    conn.register_records(
        "dup_ts_events",
        [
            (1, "a", datetime(2024, 1, 1, 12, 0)),
            (1, "b", datetime(2024, 1, 1, 12, 0)),  # same instant
        ],
        schema="user_id long, event string, timestamp timestamp",
    )
    m = Model(conn, "dup_ts_events").with_activity_schema(
        group=attr.user_id, timestamp=attr.timestamp, event_key=attr.event
    )
    got = {r["step"]: r["entities"] for r in m.funnel(["a", "b"]).run().py_records}
    # journey = 'BA'; step a matches at index 2, step b searches after -> none
    # (pessimistic-but-faithful: reference orders dup chars step-DESC)
    assert got == {"a": 1, "b": 0}


def test_partition_matches_grouping(events):
    """partition_matches: boolean cohort expressions resolved against the
    POST-match_steps model split the funnel output
    (reference: model.py:630-632 'resolved via the model outputted by
    match_steps')."""
    from hashquery_spark.keypath import attr as kp_attr

    res = events.funnel_conversion_rate(
        STEPS,
        partition_matches=[(kp_attr.last_matched_step_index >= 2).named("converted_cohort")],
    ).run().py_records
    by_cohort = {r["converted_cohort"]: r for r in res}
    # cohort True = users whose last matched step is purchase (0 and 1)
    assert by_cohort[True]["startedCount"] == 2
    assert by_cohort[True]["convertedCount"] == 2
    # cohort False = entered but didn't convert (2, 3, 4)
    assert by_cohort[False]["startedCount"] == 3
    assert by_cohort[False]["convertedCount"] == 0


def test_preserved_group_join_through_match_steps(spark):
    """A relation joined exactly on the activity-schema group survives
    match_steps and is reattached to the entity table
    (reference: model.py:462-477)."""
    conn = Connection(spark)
    conn.register_records(
        "je_events",
        [
            (1, "start", datetime(2024, 1, 1)), (1, "buy", datetime(2024, 1, 2)),
            (2, "start", datetime(2024, 1, 1)),
        ],
        schema="user_id long, event string, timestamp timestamp",
    )
    conn.register_records(
        "je_users",
        [(1, "pro"), (2, "free")],
        schema="id long, plan string",
    )
    users = Model(conn, "je_users")
    m = (
        Model(conn, "je_events")
        .with_join_one(users, foreign_key=attr.user_id, named="profile")
        .with_activity_schema(group=attr.user_id, timestamp=attr.timestamp, event_key=attr.event)
    )
    matched = m.match_steps(["start", "buy"])
    assert "profile" in matched._namespaces
    recs = {
        r["user_id"]: (r["plan"], r["last_matched_step_name"])
        for r in matched.pick(
            attr.user_id, rel.profile.plan.named("plan"), attr.last_matched_step_name
        ).run().py_records
    }
    assert recs == {1: ("pro", "buy"), 2: ("free", "start")}


def test_partitioned_funnel_with_time_limit(spark):
    conn = Connection(spark)
    conn.register_records(
        "ptl_events",
        [
            (1, "start", "web", datetime(2024, 1, 1)),
            (1, "buy", None, datetime(2024, 1, 10)),   # 9 days later: over limit
            (2, "start", "app", datetime(2024, 1, 1)),
            (2, "buy", None, datetime(2024, 1, 2)),    # 1 day: within limit
        ],
        schema="user_id long, event string, channel string, timestamp timestamp",
    )
    m = Model(conn, "ptl_events").with_activity_schema(
        group=attr.user_id, timestamp=attr.timestamp, event_key=attr.event
    )
    recs = m.funnel(
        ["start", "buy"],
        partition_start_events=[column("channel")],
        time_limit=timedelta(days=3),
    ).run().py_records
    got = {(r["channel"], r["step"]): r["entities"] for r in recs}
    assert got[("web", "start")] == 1 and got[("web", "buy")] == 0
    assert got[("app", "start")] == 1 and got[("app", "buy")] == 1


def test_max_events_per_entity_cap(events):
    # cap journeys to the first 2 matching events: purchases (3rd+ event)
    # fall outside every journey
    capped = events.match_steps(STEPS, max_events_per_entity=2)
    agg = capped.aggregate(measures=list(capped._measures))
    rec = agg.run().py_records[0]
    assert rec["ad_impression_count"] == 5
    assert rec["visit_count"] == 4
    assert rec["purchase_count"] == 0  # purchase was always event #3+


def test_partitioned_full_row_join_no_duplication(spark):
    """Partitioned match_steps multiplies journeys per partition; the lazy
    full-row step join must derive from the PRE-join frame or every entity
    row would duplicate per partition value."""
    conn = Connection(spark)
    conn.register_records(
        "pfr_events",
        [
            (1, "start", "web", "w1", datetime(2024, 1, 1)),
            (1, "start", "email", "e1", datetime(2024, 1, 2)),
            (1, "buy", None, "b1", datetime(2024, 1, 3)),
        ],
        schema="user_id long, event string, channel string, label string, timestamp timestamp",
    )
    m = Model(conn, "pfr_events").with_activity_schema(
        group=attr.user_id, timestamp=attr.timestamp, event_key=attr.event
    )
    matched = m.match_steps(
        ["start", "buy"], partition_start_events=[column("channel")]
    )
    # reference a NON-timestamp step attribute -> triggers the full-row join
    recs = matched.pick(
        attr.user_id, column("channel"), rel.start.label.named("start_label")
    ).run().py_records
    got = sorted((r["channel"], r["start_label"]) for r in recs)
    assert got == [("email", "e1"), ("web", "w1")]  # exactly one row each


def test_salted_journey_assembly_equivalence(events):
    """salt_partials spreads hot entities over N partial aggregations;
    results must equal the single-shuffle path exactly."""
    direct = events.match_steps(STEPS)
    salted = events.match_steps(STEPS, salt_partials=4)
    key = lambda m: sorted(
        str(r) for r in m.pick(
            attr.user_id, attr.last_matched_step_name, attr.last_matched_step_index
        ).run().py_records
    )
    assert key(direct) == key(salted)
    f = {r["step"]: r["entities"]
         for r in events.funnel(STEPS).run().py_records}
    assert f == {"ad_impression": 5, "visit": 4, "purchase": 2}


def test_salting_threshold_guidance_documented():
    """r6 verdict #8: the measured salt-vs-plain crossover (~6M events /
    50% hot share) must be documented where a 100 TB user will read it,
    so they don't pay the extra shuffle blind — pin the guidance text."""
    import hashquery_spark.match_steps as ms

    doc = ms.__doc__
    assert "WHEN TO SALT" in doc
    # the measured crossover and the real valve must both be stated
    assert "6M" in doc and "max_events_per_entity" in doc


def test_match_steps_wire_roundtrip(events):
    """The funnel source tree (activity schema + steps + time limit) must
    survive wire-format serialization (reference: serializable v7)."""
    import json
    from hashquery_spark import Model

    m = events.match_steps(STEPS, time_limit=timedelta(days=3)).pick(
        attr.user_id, attr.last_matched_step_name, attr.last_matched_step_index
    )
    wire = json.loads(json.dumps(m.to_wire()))
    restored = Model.from_wire(wire, connection=m._connection)
    key = lambda model: sorted(str(r) for r in model.to_df().collect())
    assert key(m) == key(restored)
