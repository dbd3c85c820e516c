#!/usr/bin/env python
"""r10 A/B for r9 verdict #5: perplexity_buckets has TWO chained eager
localCheckpoints — the bigram-count barrier inside bigram_lm_score (r9)
and its own scored-frame barrier (r2). Two serialized eager checkpoints
on one path may cost more than the rescan one of them saves (the r9
negative-result lesson). Times all four on/off combinations with the
noop sink, min-of-N, warmup at sf0.001, at $SPARK_GRAFT_SF_DIR.

Usage: python scripts/exp_perplexity_barriers.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARMUP = "/root/testdata/sf0.001"
REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))

COMBOS = [
    ("lmT_scT", True, True),
    ("lmT_scF", True, False),
    ("lmF_scT", False, True),
    ("lmF_scF", False, False),
]


def build(spark, sf_dir, lm_barrier, scored_barrier):
    from pyspark.sql import functions as F

    from hashquery_spark.connection import connection_for_dir
    from hashquery_spark.ops import perplexity_buckets

    docs = (
        connection_for_dir(sf_dir, spark)
        .table("documents")
        .where(F.col("text").isNotNull())
    )
    return perplexity_buckets(
        docs,
        "text",
        "doc_id",
        lm_barrier=lm_barrier,
        scored_barrier=scored_barrier,
    )


def main() -> int:
    from hashquery_spark.connection import default_session

    spark = default_session("exp_perplexity_barriers")
    spark.sparkContext.setLogLevel("ERROR")
    for name, lm_b, sc_b in COMBOS:
        build(spark, WARMUP, lm_b, sc_b).write.format("noop").mode(
            "overwrite"
        ).save()
        runs = []
        for i in range(REPEATS):
            spark.sparkContext.setJobDescription(f"perp:{name}:{i}")
            t0 = time.perf_counter()
            build(spark, SF_DIR, lm_b, sc_b).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: min {min(runs):.3f}s  runs {runs}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
