#!/usr/bin/env python
"""Measured scale evidence for the 100x claim (round-5 verdict item #1):
one decade of data scaling for the heavy corpus operators.

The driver's testdata tops out at sf0.1, so this script GENERATES a 10x
tier ("sf1") by replicating sf0.1 with workload-linear transforms, then
times the ~17 heaviest queries() entries — Spark AND their DuckDB/python
twins — at BOTH sf0.1 and sf1 in the same quiet window, and writes
BENCH_sf1.json with per-query scaling factors and Spark/twin ratios.

Workload-linearity of the generator (so "time scales ~linearly" tests
the ENGINE, not a quadratically growing pair workload):

* documents: 10 replicas; replica k > 0 maps every token w to a
  same-length md5(w, k)-derived hex token — one consistent vocabulary
  REMAP per replica. Replica vocabularies are DISJOINT (zero
  cross-replica near-dup pairs) while word-level co-occurrence
  structure is preserved exactly (same token -> same mapped token), so
  shingle/LSH/n-gram workloads are 10 independent sf0.1-shaped copies
  and pair counts scale ~10x. (A first attempt suffixed every token
  with a constant ``r{k}`` — the shared suffix collapsed char-5-gram
  selectivity and blew containment matches 240x; per-token hashing
  keeps gram diversity.)
* embeddings: replica vectors are fresh seeded-random unit-scale
  float32 (same dim/label distribution) — cosine-pair density per cell
  stays sparse instead of every vector gaining 9 exact twins.
  NOTE: semantic_dedup keeps the entry's oracle-pinned FIXED
  n_clusters=16, so in-cell pair work grows ~quadratically at 10x BY
  WORKLOAD CONSTRUCTION (real SemDeDup scales k with n — which is what
  the r6 semantic_dedup_auto row measures: k = ceil(sqrt(n)) derived
  from a corpus count, identical in the DuckDB twin); the fixed row's
  Spark-vs-twin RATIO on the identical workload is the fair readout,
  and the JSON marks it workload_superlinear. embedding_outliers is
  NOT in that set (r6): its work is Θ(k·n) — centroid assignment plus
  per-cluster percentiles, no pair join — linear at fixed k.
* orders/lineitem/customer/events/part/supplier: id columns shift by a
  per-replica stride (FK-consistent); value/timestamp columns unchanged
  — funnels, bootstrap weights, percentile work all scale 10x linearly.
* nation/region: single copy (bounded dims).

Usage: python scripts/bench_sf1.py [--force-regen]
Writes ./bench_sf1_data/ (gitignored, ~170 MB) and BENCH_sf1.json.
Check /proc/loadavg < ~1 first — shared-core noise is not rejectable
by min-of-N under sustained load.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEST = os.path.join(REPO, "bench_sf1_data")
REPLICAS = 10

# the verdict-named heavy set + the heaviest bench rows that stress data
# volume. lsh_tuning is excluded: its entry samples a fixed 500 docs by
# contract (the exact-truth stage is quadratic by design), so its cost
# is sample-bound and says nothing about data scaling.
HEAVY = [
    "dedup_minhash",
    "curation_pipeline",
    "containment_join",
    "bootstrap_ci",
    "translation_metrics",
    "lm3_score",
    "split_by_cluster",
    "semantic_dedup",
    "bpe_merges",
    "unigram_tokenize",
    "funnel",
    "dedup_against_fuzzy",
    "dedup_cluster_stats",
    "perplexity_buckets",
    "spearman",
    "embedding_outliers",
    "fuzzy_dedup_e2e",
    # --- round 6 (appended) ---
    "semantic_dedup_auto",   # k = ceil(sqrt(n)) — the r5 superlinear fix
    "kendall_tau_continuous",
    # --- round 7 (appended) ---
    "rouge_l",               # the last >1s sf0.1 op with no decade record
    "spearman_fast",         # the new library-default double path
    # --- round 9 (appended): decade rows for the r8 ops (r8 verdict
    # #3 — "measure the decade, don't assert it") ---
    "wasserstein_1d",
    "effect_size",
    "adamic_adar",
    "attribution_linear",
    "attribution_last",
    "heaps_law",
    "assoc_rules",
    "embedding_drift",
    "leakage_report",
    "sampling_weights",
    "winnowing",
    "leakage_index",         # r9: the persisted-LSH incremental audit
    "bootstrap_ci_explode",  # r9 A/B: the pre-r9 Generate path (below)
]
# fixed-parameter cluster blocking makes in-cell pair work grow faster
# than the data (see module docstring) — flagged in the output JSON.
# semantic_dedup keeps the entry's oracle-pinned k=16 BY CONSTRUCTION
# (its auto-k twin above is the fixed path); embedding_outliers was
# dropped from this set in r6 — its work is Θ(k·n) (assignment +
# per-cluster percentiles, no pair join), linear at fixed k, and the r5
# flag was mis-attributed.
WORKLOAD_SUPERLINEAR = {"semantic_dedup"}


def generate(dest: str = DEST, force: bool = False, replicas: int = None) -> None:
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    REPLICAS = replicas if replicas is not None else globals()["REPLICAS"]
    marker = os.path.join(dest, ".complete")
    if os.path.exists(marker) and not force:
        return
    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    # spill OUTSIDE the repo — in-memory DuckDB spills to cwd/.tmp by
    # default, and an sf10 run once committed 1.7 GB of blocks to git.
    con.execute("SET temp_directory='/tmp/duckdb_spill'")

    def write(table_sql: str, name: str):
        con.execute(
            f"COPY ({table_sql}) TO '{dest}/{name}.parquet' (FORMAT PARQUET)"
        )

    # bounded dims: single copy
    for t in ("nation", "region"):
        write(f"SELECT * FROM '{SRC}/{t}.parquet'", t)

    # documents: disjoint-vocab replicas (k=0 verbatim; k>0 = consistent
    # per-replica token remap onto same-length md5-hex tokens)
    doc_parts = [f"SELECT * FROM '{SRC}/documents.parquet'"]
    for k in range(1, REPLICAS):
        remap = (
            "array_to_string(list_transform(string_split(text, ' '), "
            f"w -> CASE WHEN w = '' THEN w ELSE "
            f"substr(md5(w || ':{k}'), 1, greatest(length(w), 3)) END), ' ')"
        )
        doc_parts.append(
            f"""SELECT doc_id + {k * 10_000_000} AS doc_id,
                {remap} AS text,
                lang, source, n_chars
                FROM '{SRC}/documents.parquet'"""
        )
    write(" UNION ALL ".join(doc_parts), "documents")

    # embeddings: replica 0 verbatim; k>0 fresh seeded-random float32
    src_emb = con.execute(
        f"SELECT vec_id, embedding, label FROM '{SRC}/embeddings.parquet' ORDER BY vec_id"
    ).fetch_df()
    dim = len(src_emb["embedding"].iloc[0])
    n = len(src_emb)
    vec_ids, embs, labels = [], [], []
    vec_ids.extend(int(v) for v in src_emb["vec_id"])
    embs.extend([list(map(float, e)) for e in src_emb["embedding"]])
    labels.extend(int(x) for x in src_emb["label"])
    rng = np.random.default_rng(20260815)
    lab_src = np.asarray(src_emb["label"])
    for k in range(1, REPLICAS):
        mat = rng.standard_normal((n, dim)).astype(np.float32) * np.float32(0.25)
        vec_ids.extend(int(v) + k * 1_000_000 for v in src_emb["vec_id"])
        embs.extend(mat.tolist())
        labels.extend(int(x) for x in rng.permutation(lab_src))
    tbl = pa.table(
        {
            "vec_id": pa.array(vec_ids, pa.int64()),
            "embedding": pa.array(embs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(tbl, f"{dest}/embeddings.parquet")

    # id-shifted fact/dim replicas (strides chosen >> sf0.1 key ranges,
    # FK-consistent across tables)
    shifted = {
        "customer": "SELECT c_custkey + {k} * 1000000 AS c_custkey, c_name, "
        "c_nationkey, c_acctbal, c_mktsegment FROM '{src}/customer.parquet'",
        "orders": "SELECT o_orderkey + {k} * 10000000 AS o_orderkey, "
        "o_custkey + {k} * 1000000 AS o_custkey, o_orderstatus, o_totalprice, "
        "o_orderdate, o_orderpriority FROM '{src}/orders.parquet'",
        "lineitem": "SELECT l_orderkey + {k} * 10000000 AS l_orderkey, "
        "l_partkey + {k} * 1000000 AS l_partkey, "
        "l_suppkey + {k} * 100000 AS l_suppkey, l_linenumber, l_quantity, "
        "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
        "l_shipdate FROM '{src}/lineitem.parquet'",
        "events": "SELECT event_id + {k} * 10000000 AS event_id, ts, "
        "user_id + {k} * 10000000 AS user_id, event_type, value, props "
        "FROM '{src}/events.parquet'",
        "part": "SELECT p_partkey + {k} * 1000000 AS p_partkey, p_name, "
        "p_brand, p_type, p_size, p_retailprice FROM '{src}/part.parquet'",
        "supplier": "SELECT s_suppkey + {k} * 100000 AS s_suppkey, s_name, "
        "s_nationkey, s_acctbal FROM '{src}/supplier.parquet'",
    }
    for t, tmpl in shifted.items():
        parts = [tmpl.format(k=k, src=SRC) for k in range(REPLICAS)]
        write(" UNION ALL ".join(parts), t)
    con.close()
    with open(marker, "w") as f:
        f.write("ok\n")


def _duck_con(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def main() -> None:
    force = "--force-regen" in sys.argv
    t0 = time.time()
    generate(force=force)
    gen_sec = round(time.time() - t0, 1)

    import __spark_entry__ as entry_mod
    from hashquery_spark.connection import default_session
    from hashquery_spark.py_twins import PY_TWINS

    spark = default_session("hashquery_spark_bench_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    py_twins = {name: fn for name, (fn, _o) in PY_TWINS.items()}

    # JIT warmup at the smallest SF (excluded from timings, bench.py
    # contract)
    for name in HEAVY:
        queries[name](spark, "/root/testdata/sf0.001").collect()

    repeats_01 = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    repeats_1 = int(os.environ.get("SPARK_GRAFT_SF1_REPEATS", "2"))
    # twin repeats at sf1 default to 1: the recursive-CTE twins run
    # minutes each at 10x and DuckDB has no JIT-warmup variance — the
    # dominant noise (sustained external load) is not rejectable by
    # min-of-N anyway (quote the loadavg fields instead)
    twin_repeats_1 = int(os.environ.get("SPARK_GRAFT_SF1_TWIN_REPEATS", "1"))

    def time_spark(sf_dir: str, repeats: int) -> dict:
        out = {}
        for name in HEAVY:
            best = float("inf")
            for _ in range(repeats):
                t = time.perf_counter()
                queries[name](spark, sf_dir).collect()
                best = min(best, time.perf_counter() - t)
            out[name] = round(best, 3)
        return out

    def time_twin(sf_dir: str, repeats: int) -> dict:
        import threading

        # safety valve: a recursive-CTE twin can go superlinear at 10x;
        # interrupt after the cap and record the cap as a LOWER BOUND
        # (marked with "+") rather than stalling the whole bench
        cap = float(os.environ.get("SPARK_GRAFT_SF1_TWIN_TIMEOUT", "900"))
        con = _duck_con(sf_dir)
        out = {}
        for name in HEAVY:
            best = float("inf")
            timed_out = False
            for _ in range(repeats):
                timer = threading.Timer(cap, con.interrupt)
                timer.start()
                t = time.perf_counter()
                try:
                    if name in oracles:
                        con.execute(oracles[name]).fetchall()
                    else:
                        py_twins[name](con)
                    best = min(best, time.perf_counter() - t)
                except Exception:
                    timed_out = True
                    best = min(best, time.perf_counter() - t)
                finally:
                    timer.cancel()
            out[name] = f"{round(best, 3)}+" if timed_out else round(best, 3)
        con.close()
        return out

    with open("/proc/loadavg") as f:
        load_before = f.read().split()[0]
    spark_01 = time_spark(SRC, repeats_01)
    spark_1 = time_spark(DEST, repeats_1)
    twin_01 = time_twin(SRC, repeats_01)
    twin_1 = time_twin(DEST, twin_repeats_1)
    with open("/proc/loadavg") as f:
        load_after = f.read().split()[0]

    def num(v) -> float:
        return float(str(v).rstrip("+"))

    per_query = {}
    for name in HEAVY:
        s0, s1 = spark_01[name], spark_1[name]
        t0_, t1 = twin_01[name], twin_1[name]
        t1n = num(t1)
        per_query[name] = {
            "spark_sf01": s0,
            "spark_sf1": s1,
            "twin_sf01": t0_,
            "twin_sf1": t1,  # "N+" = interrupted at the cap, lower bound
            # 10x data: <=10 is sub-linear-or-linear wall-clock scaling
            "spark_scaling_10x": round(s1 / s0, 2) if s0 > 0 else None,
            "twin_scaling_10x": round(t1n / num(t0_), 2) if num(t0_) > 0 else None,
            "ratio_sf01": round(s0 / num(t0_), 2) if num(t0_) > 0 else None,
            "ratio_sf1": round(s1 / t1n, 2) if t1n > 0 else None,
            "workload_superlinear": name in WORKLOAD_SUPERLINEAR,
            "twin_kind": "duckdb" if name in oracles else "python",
        }

    out = {
        "metric": "heavy_ops_scale_decade",
        "unit": "sec",
        "replicas": REPLICAS,
        "gen_sec": gen_sec,
        "loadavg_before": load_before,
        "loadavg_after": load_after,
        "spark_sf01_total": round(sum(spark_01.values()), 3),
        "spark_sf1_total": round(sum(spark_1.values()), 3),
        "twin_sf01_total": round(sum(num(v) for v in twin_01.values()), 3),
        "twin_sf1_total": round(sum(num(v) for v in twin_1.values()), 3),
        "queries": per_query,
    }
    line = json.dumps(out)
    print(line)
    with open(os.path.join(REPO, "BENCH_sf1.json"), "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
