#!/usr/bin/env python
"""r10 optimization measurement harness (guide §1).

Usage:
  python scripts/measure_r10.py plans <outdir> [name ...]
      Write .explain("formatted") for each named headline query (default:
      all) to <outdir>/<name>.txt. Plan-only OUTPUT — but queries with
      eager localCheckpoints (dedup_clusters loop, fuzzy/containment
      cands, grid_percentiles gk, assoc_rules kept, ...) still execute
      their barrier jobs at $SPARK_GRAFT_SF_DIR during construction, so
      NEVER run this concurrently with a bench (r9 ADVICE).
  python scripts/measure_r10.py time <name> [name ...]
      Isolated timing: warm each query's plan at sf0.001, then time
      min-of-N (SPARK_GRAFT_BENCH_REPEATS, default 3) at
      $SPARK_GRAFT_SF_DIR with the noop sink (computes every column,
      discards output) and setJobDescription labels.

The noop sink times the computation, not the collect; bench.py keeps its
collect-based methodology for round-over-round comparability — this
harness is for isolating WHERE time goes, not for the headline number.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARMUP = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")


def _session():
    from hashquery_spark.connection import default_session

    spark = default_session("measure_r10")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def cmd_plans(outdir: str, names: list[str]) -> int:
    import __spark_entry__ as entry_mod

    spark = _session()
    queries = entry_mod.queries()
    names = names or list(queries)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = queries[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(name, "ok")
    return 0


def cmd_time(names: list[str]) -> int:
    import __spark_entry__ as entry_mod

    spark = _session()
    queries = entry_mod.queries()
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    for name in names:
        if os.path.isdir(WARMUP):
            queries[name](spark, WARMUP).write.format("noop").mode(
                "overwrite"
            ).save()
        best, runs = float("inf"), []
        for i in range(repeats):
            spark.sparkContext.setJobDescription(f"r10:{name}:{i}")
            t0 = time.perf_counter()
            queries[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            runs.append(round(dt, 3))
            best = min(best, dt)
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: min {best:.3f}s  runs {runs}")
    return 0


if __name__ == "__main__":
    if len(sys.argv) < 2 or sys.argv[1] not in ("plans", "time"):
        print(__doc__)
        raise SystemExit(2)
    if sys.argv[1] == "plans":
        if len(sys.argv) < 3:
            print(__doc__)
            raise SystemExit(2)
        raise SystemExit(cmd_plans(sys.argv[2], sys.argv[3:]))
    raise SystemExit(cmd_time(sys.argv[2:]))
