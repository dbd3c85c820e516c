"""Second measured decade for the r5 perf-weak ops (r5 verdict #5).

BENCH_sf1.json proved one decade (sf0.1 -> sf1, 10 replicas). This
script measures the NEXT decade — sf1 (10 replicas) vs sf10 (100
replicas, workload-linear construction identical to bench_sf1's
generator: disjoint diversity-preserving per-replica vocabularies,
fresh seeded-random embeddings, FK-consistent id strides) — for the
five ops the r5 verdict graded perf-weak plus spearman (the r5
prefix-sum conversion under test):

    semantic_dedup_auto   (the r6 k = ceil(sqrt(n)) fix under test;
                           the fixed-k row stays in bench_sf1 as the
                           workload_superlinear control)
    embedding_outliers
    containment_join
    translation_metrics
    unigram_tokenize      (the r6 distinct-word Viterbi rewrite)
    spearman

Done-criterion from the verdict: no query's Spark/twin ratio worsens
decade-over-decade. Twins run the IDENTICAL oracle SQL (or python twin)
with an interrupt cap — a capped twin records its lower bound with a
"+" suffix, which biases the ratio AGAINST Spark, never for it.

Usage: python scripts/bench_sf10.py [--force-regen]
Writes ./bench_sf10_data/ (gitignored, ~1.7 GB) and BENCH_sf10.json.
Check /proc/loadavg < ~1 first; NEVER run concurrently with any other
Spark job or pytest session.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_sf1 import DEST as SF1_DEST  # noqa: E402
from bench_sf1 import _duck_con, generate  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEST10 = os.path.join(REPO, "bench_sf10_data")

PERF = [
    "semantic_dedup_auto",
    "embedding_outliers",
    "containment_join",
    "translation_metrics",
    "unigram_tokenize",
    "spearman",
    # the library-default double-accumulator path (r6 verdict #5) —
    # "spearman" above stays the exact/oracle variant for continuity
    "spearman_fast",
    # r7 verdict #5/#7 second-decade additions: the dedup/fuzzy family
    # whose LSH hot-bucket caps and salting valves exist precisely for
    # this decade, plus funnel and the bootstrap explode volume.
    "dedup_against_fuzzy",
    "fuzzy_dedup_e2e",
    "funnel",
    "bootstrap_ci",
    # r9 additions: the bootstrap vectorized-vs-explode A/B (r8 verdict
    # bootstrap item) and the two-phase top-k A/B at the decade where
    # one probe's candidate set (~600k rows) finally exceeds
    # _SINGLE_WINDOW_MAX_CANDIDATES — the crossover evidence
    "bootstrap_ci_explode",
    "ann_topk_salted",
    "ann_topk_single",
    "leakage_index",
]


def main() -> None:
    force = "--force-regen" in sys.argv
    t0 = time.time()
    generate(force=force)  # sf1 tier (10 replicas)
    generate(DEST10, force=force, replicas=100)  # sf10 tier
    gen_sec = round(time.time() - t0, 1)

    import __spark_entry__ as entry_mod
    from hashquery_spark.connection import default_session
    from hashquery_spark.py_twins import PY_TWINS

    spark = default_session("hashquery_spark_bench_sf10")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    py_twins = {name: fn for name, (fn, _o) in PY_TWINS.items()}

    for name in PERF:  # JIT warmup, excluded from timings
        queries[name](spark, "/root/testdata/sf0.001").collect()

    repeats_1 = int(os.environ.get("SPARK_GRAFT_SF1_REPEATS", "2"))
    repeats_10 = int(os.environ.get("SPARK_GRAFT_SF10_REPEATS", "1"))

    def time_spark(sf_dir: str, repeats: int) -> dict:
        out = {}
        for name in PERF:
            best = float("inf")
            for _ in range(repeats):
                t = time.perf_counter()
                queries[name](spark, sf_dir).collect()
                best = min(best, time.perf_counter() - t)
            out[name] = round(best, 3)
        return out

    def time_twin(sf_dir: str, cap: float) -> dict:
        # ONE SUBPROCESS PER TWIN (r8, measured twice): a failing twin
        # must not poison the rest. The first r8 run shared one
        # connection — the semantic twin's disk-full spill poisoned the
        # buffer pool and every later twin OOM'd on 16 KB allocations;
        # a fresh-connection retry STILL OOM'd, because a closed DuckDB
        # connection does not promptly return process memory. Process
        # isolation is the only clean boundary; per-twin startup
        # (python + view registration) is excluded from the timing.
        import subprocess
        import sys as _sys

        runner = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "_twin_one.py"
        )
        out = {}
        for name in PERF:
            try:
                proc = subprocess.run(
                    [_sys.executable, runner, sf_dir, name, str(cap)],
                    capture_output=True,
                    text=True,
                    timeout=cap + 300,
                )
                line = proc.stdout.strip().splitlines()[-1]
                out[name] = json.loads(line)[name]
            except Exception as exc:  # runner crash: fail loud
                out[name] = {
                    "error": f"twin runner failed: {type(exc).__name__}: {exc}",
                    "elapsed_sec": 0.0,
                }
        return out

    cap = float(os.environ.get("SPARK_GRAFT_SF10_TWIN_TIMEOUT", "600"))
    with open("/proc/loadavg") as f:
        load_before = f.read().split()[0]
    spark_1 = time_spark(SF1_DEST, repeats_1)
    spark_10 = time_spark(DEST10, repeats_10)
    twin_1 = time_twin(SF1_DEST, cap)
    twin_10 = time_twin(DEST10, cap)
    with open("/proc/loadavg") as f:
        load_after = f.read().split()[0]

    def num(v) -> float:
        # errored twins (dict entries) contribute 0 — they must not
        # masquerade as a capped lower bound in totals or ratios.
        if isinstance(v, dict):
            return 0.0
        return float(str(v).rstrip("+"))

    per_query = {}
    for name in PERF:
        r1 = round(spark_1[name] / num(twin_1[name]), 2) if num(twin_1[name]) > 0 else None
        r10 = round(spark_10[name] / num(twin_10[name]), 2) if num(twin_10[name]) > 0 else None
        per_query[name] = {
            "spark_sf1": spark_1[name],
            "spark_sf10": spark_10[name],
            "twin_sf1": twin_1[name],
            "twin_sf10": twin_10[name],  # "N+" = capped, lower bound
            "spark_scaling_10x": round(spark_10[name] / spark_1[name], 2)
            if spark_1[name] > 0
            else None,
            "ratio_sf1": r1,
            "ratio_sf10": r10,
            "ratio_improves_decade": (
                r1 is not None and r10 is not None and r10 <= r1
            ),
            "twin_kind": "duckdb" if name in oracles else "python",
        }

    out = {
        "metric": "perf_weak_second_decade",
        "unit": "sec",
        "replicas_sf10": 100,
        "gen_sec": gen_sec,
        "twin_cap_sec": cap,
        "loadavg_before": load_before,
        "loadavg_after": load_after,
        "spark_sf1_total": round(sum(spark_1.values()), 3),
        "spark_sf10_total": round(sum(spark_10.values()), 3),
        "twin_sf1_total": round(sum(num(v) for v in twin_1.values()), 3),
        "twin_sf10_total": round(sum(num(v) for v in twin_10.values()), 3),
        "queries": per_query,
    }
    line = json.dumps(out)
    print(line)
    with open(os.path.join(REPO, "BENCH_sf10.json"), "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
