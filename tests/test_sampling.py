"""Unit tests for deterministic sampling / splitting / shuffling
(ops/sampling.py). The key property everywhere: a row's fate depends only
on (seed, id), never on partitioning or execution order."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from hashquery_spark.ops import (
    global_shuffle,
    repetition_score,
    stratified_sample,
    train_test_split,
)


def _py_uniform01(seed: int, value) -> float:
    return int(hashlib.md5(f"{seed}:{value}".encode()).hexdigest()[:8], 16) / 2**32


def test_stratified_sample_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(200)], "id long, s string"
    )
    got = {
        r["id"]
        for r in stratified_sample(
            df, "id", {"a": 0.5, "b": 0.1}, strata_col="s", seed=7
        ).collect()
    }
    want = {
        i
        for i in range(200)
        if _py_uniform01(7, i) < (0.5 if i % 2 == 0 else 0.1)
    }
    assert got == want


def test_stratified_sample_stable_under_repartition(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "id long")
    a = {r["id"] for r in stratified_sample(df, "id", 0.3, seed=1).collect()}
    b = {
        r["id"]
        for r in stratified_sample(df.repartition(17), "id", 0.3, seed=1).collect()
    }
    assert a == b
    # rate lands near the target (md5 is uniform enough at n=500)
    assert 0.2 < len(a) / 500 < 0.4


def test_stratified_sample_unlisted_stratum_dropped(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, s string")
    out = stratified_sample(df, "id", {"x": 1.0}, strata_col="s", seed=0).collect()
    assert [r["s"] for r in out] == ["x"]


def test_train_test_split_partitions_every_row(spark):
    df = spark.createDataFrame([(i,) for i in range(300)], "id long")
    out = train_test_split(df, "id", test_fraction=0.25, seed=3).collect()
    assert len(out) == 300
    by_split = {r["id"]: r["split"] for r in out}
    for i in range(300):
        want = "test" if _py_uniform01(3, i) < 0.25 else "train"
        assert by_split[i] == want


def test_train_test_split_disjoint_across_seeds(spark):
    # different seeds give (near-)independent assignments, same seed is stable
    df = spark.createDataFrame([(i,) for i in range(300)], "id long")
    s1 = {r["id"] for r in train_test_split(df, "id", 0.5, seed=1).collect() if r["split"] == "test"}
    s1b = {r["id"] for r in train_test_split(df, "id", 0.5, seed=1).collect() if r["split"] == "test"}
    s2 = {r["id"] for r in train_test_split(df, "id", 0.5, seed=2).collect() if r["split"] == "test"}
    assert s1 == s1b
    assert s1 != s2


def test_repetition_score_values(spark):
    df = spark.createDataFrame(
        [
            (1, "a\nb\nc"),          # no repeats
            (2, "a\na\na\nb"),       # 4 lines, 2 distinct
            (3, "x\n\n  \nx"),       # blank lines ignored; 2 lines 1 distinct
            (4, ""),                  # empty doc
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_score(df, "text", "doc_id").collect()}
    assert (out[1]["n_lines"], out[1]["dup_line_ratio"]) == (3, 0.0)
    assert (out[2]["n_distinct_lines"], out[2]["dup_line_ratio"]) == (2, 0.5)
    assert (out[3]["n_lines"], out[3]["dup_line_ratio"]) == (2, 0.5)
    assert (out[4]["n_lines"], out[4]["dup_line_ratio"]) == (0, 0.0)


def test_global_shuffle_deterministic_and_seed_sensitive(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "id long")
    o1 = [r["id"] for r in global_shuffle(df, "id", seed=5).collect()]
    o1b = [r["id"] for r in global_shuffle(df.repartition(13), "id", seed=5).collect()]
    o2 = [r["id"] for r in global_shuffle(df, "id", seed=6).collect()]
    assert o1 == o1b          # stable across partitioning
    assert o1 != o2           # seed changes the permutation
    assert sorted(o1) == list(range(100))  # it IS a permutation
    # matches the Python reference order
    want = sorted(range(100), key=lambda i: hashlib.md5(f"5:{i}".encode()).hexdigest())
    assert o1 == want


def test_curate_matches_composed_ops(spark):
    """The fused pipeline must equal composing the individual operators."""
    from hashquery_spark.ops import (
        curate,
        language_id,
        quality_score,
        repetition_score,
        train_test_split,
    )

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox and the lazy dog in the sun"),
            (2, "the quick brown fox and the lazy dog in the sun"),  # dup of 1
            (3, "el la de que y en un por con los amigos"),           # spanish
            (4, "zz\nzz\nzz\nzz"),                                     # repetitive junk
            (5, "a different but perfectly fine english sentence for the test of it"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in curate(
        df, "text", "doc_id", min_quality=0.2, langs=("en",),
        max_dup_line_ratio=0.4, test_fraction=0.5, seed=9,
    ).collect()}

    langs = {r["doc_id"]: r["lang_pred"] for r in language_id(df, "text", "doc_id").collect()}
    quals = {r["doc_id"]: r["quality"] for r in quality_score(df, "text", "doc_id").collect()}
    reps = {r["doc_id"]: r["dup_line_ratio"] for r in repetition_score(df, "text", "doc_id").collect()}
    splits = {r["doc_id"]: r["split"] for r in train_test_split(df, "doc_id", 0.5, seed=9).collect()}

    assert 3 not in got          # spanish filtered
    assert 4 not in got          # repetition filtered
    assert 2 not in got and 1 in got  # dedup keeps min id
    for i, r in got.items():
        assert (r["lang_pred"], r["quality"], r["dup_line_ratio"], r["split"]) == (
            langs[i], quals[i], reps[i], splits[i]
        )


def test_weighted_sample_proportional_and_stable(spark):
    from hashquery_spark.ops import weighted_sample

    rows = [(i, 1.0 if i < 4000 else 4.0) for i in range(5000)] + [
        (9000, None), (9001, -2.0), (9002, 0.0)
    ]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    out = weighted_sample(df, "doc_id", "w", 0.2, seed=1)
    got = {r.doc_id: r.keep_prob for r in out.collect()}
    assert not {9000, 9001, 9002} & set(got)  # null/non-positive dropped
    light = sum(1 for i in got if i < 4000)
    heavy = sum(1 for i in got if 4000 <= i < 5000)
    # mean(w)=1.6: p_light=0.125, p_heavy=0.5 -> heavy kept ~4x as often
    assert abs(light / 4000 - 0.125) < 0.03
    assert abs(heavy / 1000 - 0.5) < 0.06
    probs = {r.keep_prob for r in out.where("doc_id < 4000").collect()}
    assert probs == {0.125}
    # membership is a pure (seed, id) function: stable under repartition
    got2 = {r.doc_id for r in weighted_sample(
        df.repartition(7), "doc_id", "w", 0.2, seed=1).collect()}
    assert set(got) == got2


def test_kfold_split_stable_and_balanced(spark):
    from hashquery_spark.ops import kfold_split

    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    out = kfold_split(df, "doc_id", k=5, seed=3)
    folds = {r["doc_id"]: r["fold"] for r in out.collect()}
    assert set(folds.values()) == {0, 1, 2, 3, 4}
    # every fold within 20% of uniform (md5 is uniform; 1000 rows)
    from collections import Counter

    counts = Counter(folds.values())
    assert all(140 <= c <= 260 for c in counts.values()), counts
    # repartition-stable (leakage-safe contract)
    again = {
        r["doc_id"]: r["fold"]
        for r in kfold_split(df.repartition(7), "doc_id", k=5, seed=3).collect()
    }
    assert again == folds


def test_kfold_split_rejects_k1(spark):
    import pytest

    from hashquery_spark.ops import kfold_split

    with pytest.raises(ValueError):
        kfold_split(spark.range(3), "id", k=1)


def test_time_split_explicit_cutoff_and_nulls(spark):
    """Explicit cutoff: strict < boundary; NULL ts gets NULL split."""
    import datetime

    from pyspark.sql import functions as F

    from hashquery_spark.ops import time_split

    rows = [
        (1, datetime.datetime(2024, 1, 1)),
        (2, datetime.datetime(2024, 1, 2)),
        (3, datetime.datetime(2024, 1, 3)),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    out = {r["id"]: r["split"] for r in time_split(
        df, "ts", cutoff="2024-01-02 00:00:00").collect()}
    # the cutoff row itself is TEST (strict <)
    assert out == {1: "train", 2: "test", 3: "test", 4: None}


def test_time_split_derived_cutoff_fraction(spark):
    """Derived cutoff = exact (1-f) quantile: 10 hourly rows at f=0.2
    put exactly the last 2 in test (cutoff interpolates between ranks
    7 and 8 -> rows 0..7 train is wrong; quantile_cont(0.8) of 0..9 is
    7.2 -> rows with value < 7.2, i.e. 0..7, train; 8,9 test)."""
    import datetime

    from hashquery_spark.ops import time_split

    base = datetime.datetime(2024, 1, 1)
    rows = [(i, base + datetime.timedelta(hours=i)) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    out = {r["id"]: r["split"] for r in time_split(
        df, "ts", test_fraction=0.2).collect()}
    assert [out[i] for i in range(10)] == ["train"] * 8 + ["test"] * 2
    # every train timestamp strictly precedes every test timestamp
    trains = [r for r, s in out.items() if s == "train"]
    tests = [r for r, s in out.items() if s == "test"]
    assert max(trains) < min(tests)


def test_negative_sample_invariants(spark):
    """k negatives per anchor, never the anchor itself, ids from the
    pool, and the draw is partitioning-independent (md5, not RNG)."""
    from hashquery_spark.ops import negative_sample

    df = spark.createDataFrame([(i,) for i in range(37)], "doc_id long")
    out = sorted(
        (r["doc_id"], r["neg_index"], r["negative_id"])
        for r in negative_sample(df, "doc_id", k=4, seed="x").collect()
    )
    assert len(out) == 37 * 4
    ids = set(range(37))
    for a, j, n in out:
        assert a != n and n in ids and 0 <= j < 4
    # repartitioned input -> identical picks
    out2 = sorted(
        (r["doc_id"], r["neg_index"], r["negative_id"])
        for r in negative_sample(
            df.repartition(7), "doc_id", k=4, seed="x"
        ).collect()
    )
    assert out == out2
    # single-row pool: no negatives possible, empty result
    one = spark.createDataFrame([(1,)], "doc_id long")
    assert negative_sample(one, "doc_id", k=2, seed="x").count() == 0


def test_time_series_cv_fold_structure(spark):
    """12 hourly rows / 3 folds: cuts at the exact quartiles; each
    fold's train strictly precedes its test window, fold windows nest
    (expanding), and the corpus max lands in the last fold's test."""
    import datetime

    from hashquery_spark.ops import time_series_cv

    base = datetime.datetime(2024, 1, 1)
    rows = [(i, base + datetime.timedelta(hours=i)) for i in range(12)]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    out = [
        (r["fold"], r["split"], r["id"])
        for r in time_series_cv(df, "ts", n_folds=3).collect()
    ]
    folds = {}
    for fold, split, rid in out:
        folds.setdefault(fold, {"train": set(), "test": set()})[split].add(rid)
    assert set(folds) == {1, 2, 3}
    for f in (1, 2, 3):
        tr, te = folds[f]["train"], folds[f]["test"]
        assert tr and te
        assert max(tr) < min(te)           # train strictly before test
        assert not (tr & te)
    # expanding window: each fold's train contains the previous fold's
    assert folds[1]["train"] < folds[2]["train"] < folds[3]["train"]
    # the corpus maximum participates in the last fold's test
    assert 11 in folds[3]["test"]
    # every fold's test window equals the next fold's train increment
    assert folds[2]["train"] - folds[1]["train"] == folds[1]["test"]


def test_negative_sample_duplicate_ids_dense_ranks(spark):
    """Duplicated anchor ids must not leave holes in the rank space:
    the op operates on the DISTINCT id set (dense 0..n-1 ranks, unit
    weights), so a duplicated frame yields exactly one anchor row per
    distinct id with the SAME picks as the pre-deduped frame — and
    never fewer than k negatives per anchor (the ADVICE-r07 latent
    drop: targets landing on missing sparse ranks vanished in the
    pick join)."""
    from hashquery_spark.ops import negative_sample

    uniq = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    dup = spark.createDataFrame(
        [(i,) for i in range(12) for _ in range(1 + i % 3)],
        "doc_id long",
    )
    key = lambda df: sorted(
        (r["doc_id"], r["neg_index"], r["negative_id"])
        for r in negative_sample(df, "doc_id", k=3, seed="dup").collect()
    )
    got_u, got_d = key(uniq), key(dup)
    assert got_u == got_d
    assert len(got_d) == 12 * 3  # no silently-dropped picks
