"""THROWAWAY experiment (r8 verdict #5): one more spearman structural
contender, measured head-to-head at sf10 against the shipped
histogram-prefix-sum pipeline.

Contender "ranksort": keep the tiny-x broadcast rank join exactly as
shipped, but replace the y HISTOGRAM pipeline (groupBy(by, y) moment
histogram -> eager checkpoint -> two-phase bucketed prefix sums) with a
RANGE-PARTITIONED physical sort + Arrow mapInPandas local rank pass:

  1. withrx = base broadcast-joined to the x-rank table (unchanged)
  2. repartitionByRange(by, y) + sortWithinPartitions(by, y) — ONE
     full-row range exchange (equal keys never straddle partitions)
  3. per-partition numpy pass: tie-averaged doubled local ranks plus
     per-(partition, group) row counts emitted as side rows
  4. tiny offsets frame (partitions x groups, driver-collected) turns
     local ranks global; Pearson sums aggregate the mapInPandas output

Rationale for the attempt: on a near-continuous y the moment histogram
is row-sized anyway, so the r6 "agg partials beat raw-row repartition"
lesson does not obviously apply; the contender trades the histogram
exchange + checkpoint write for a range exchange + Arrow round trip.

Verdict criterion: beat the shipped exact path at sf10 or be recorded
as a negative result in verify SKILL.md (spearman then downgrades to
accepted structural cost).

Usage: python scripts/exp_spearman_ranksort.py [sf_dir]
NEVER run concurrently with another Spark job; check loadavg < ~1.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "bench_sf10_data"


def spearman_ranksort(df, col_x, col_y, by, exact=True):
    """The contender. Returns the same (by, n, spearman_rho) frame."""
    from hashquery_spark.ops.dedup import bucketed_running_sums, fround

    by = [by] if isinstance(by, str) else list(by or [])
    x, y = F.col(col_x), F.col(col_y)
    base = df.where(x.isNotNull() & y.isNotNull()).select(
        *by, x.cast("double").alias("__x__"), y.cast("double").alias("__y__")
    )
    safe_by = list(by)  # experiment: non-null group keys only

    # ---- x ranks exactly as shipped (tiny grid, broadcast join) ----
    hist_x = base.groupBy(*safe_by, F.col("__x__")).agg(
        F.count(F.lit(1)).alias("__c__")
    )
    cum_x = bucketed_running_sums(hist_x, safe_by, "__x__", ["__c__"])
    rx = cum_x.select(
        *safe_by,
        "__x__",
        (2 * F.col("__cum0__") - F.col("__c__") + 1).alias("__rx__"),
    ).localCheckpoint(eager=True)
    withrx = base.join(rx, on=safe_by + ["__x__"])

    # ---- contender: range-sort y, Arrow local-rank pass ----
    npart = df.sparkSession.sparkContext.defaultParallelism * 2
    arranged = (
        withrx.repartitionByRange(
            npart, *[F.col(c) for c in safe_by], F.col("__y__")
        )
        .sortWithinPartitions(*safe_by, "__y__")
        .withColumn("__pid__", F.spark_partition_id())
    )

    gcols = list(safe_by)

    def local_pass(batches):
        # per physical partition: consume ALL batches (mapInPandas
        # batches one partition), compute per-(group, y) tie runs with
        # doubled local end-rank, emit per-group partial Pearson terms
        # keyed by a partition id + per-group counts for the offsets
        import numpy as np
        import pandas as pd

        rows = []
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return iter(())
        pdf = pd.concat(pdfs, ignore_index=True)
        pid = int(pdf["__pid__"].iloc[0])
        for key, g in pdf.groupby(gcols, dropna=False, sort=True):
            yv = g["__y__"].to_numpy()
            rxv = g["__rx__"].to_numpy("float64")
            n = len(yv)
            # tie runs within the partition (sorted input)
            change = np.empty(n, dtype=bool)
            change[0] = True
            change[1:] = yv[1:] != yv[:-1]
            run_id = np.cumsum(change) - 1
            counts = np.bincount(run_id)
            ends = np.cumsum(counts)  # local end rank per run
            # doubled local tie-averaged rank: 2*end - c + 1
            dr_local = (2 * ends - counts + 1).astype("float64")
            dr_row = dr_local[run_id]
            key_t = key if isinstance(key, tuple) else (key,)
            rows.append(
                key_t
                + (
                    pid,
                    float(n),
                    float(rxv.sum()),
                    float((rxv * rxv).sum()),
                    float(dr_row.sum()),
                    float((dr_row * dr_row).sum()),
                    float((dr_row * rxv).sum()),
                )
            )
        cols = gcols + [
            "__pid__",
            "__n__",
            "__sx__",
            "__sxx__",
            "__sy_loc__",
            "__syy_loc__",
            "__sxy_loc__",
        ]
        return iter([pd.DataFrame(rows, columns=cols)])

    # NOTE: local doubled ranks need a +2*offset shift per (pid, group):
    # global_dr = local_dr + 2*prior. The shifted sums are
    #   Σdr_g   = Σdr_loc + 2*off*n
    #   Σdr_g²  = Σdr_loc² + 4*off*Σdr_loc + 4*off²*n
    #   Σdr_g·rx = Σdr_loc·rx + 2*off*Σrx
    # so per-(pid,group) partials + the offsets are ENOUGH — no second
    # pass over rows. (Ties cannot straddle partitions: range
    # partitioning keeps equal (group, y) keys together... except ties
    # AT a partition boundary of the same group split across pids when
    # the range boundary lands mid-run — RangePartitioner does not
    # split equal keys, so a run is always within one pid.)
    # infer group dtypes from the frame
    gschema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in arranged.schema.fields
        if f.name in gcols
    )
    out_schema = (gschema + ", " if gschema else "") + (
        "__pid__ int, __n__ double, __sx__ double, __sxx__ double, "
        "__sy_loc__ double, __syy_loc__ double, __sxy_loc__ double"
    )
    part = arranged.mapInPandas(local_pass, out_schema)
    part = part.localCheckpoint(eager=True)

    # offsets: prior row count per (group) over pid order — tiny frame
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*gcols)
        .orderBy("__pid__")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    )
    off = part.select(
        *gcols,
        "__pid__",
        F.coalesce(F.sum("__n__").over(w), F.lit(0.0)).alias("__off__"),
    )
    j = part.join(off, on=gcols + ["__pid__"])
    shifted = j.select(
        *gcols,
        "__n__",
        "__sx__",
        "__sxx__",
        (
            F.col("__sy_loc__") + 2 * F.col("__off__") * F.col("__n__")
        ).alias("__sy__"),
        (
            F.col("__syy_loc__")
            + 4 * F.col("__off__") * F.col("__sy_loc__")
            + 4 * F.col("__off__") * F.col("__off__") * F.col("__n__")
        ).alias("__syy__"),
        (
            F.col("__sxy_loc__") + 2 * F.col("__off__") * F.col("__sx__")
        ).alias("__sxy__"),
    )
    agg = shifted.groupBy(*gcols).agg(
        F.sum("__n__").alias("n"),
        F.sum("__sx__").alias("sx"),
        F.sum("__sy__").alias("sy"),
        F.sum("__sxy__").alias("sxy"),
        F.sum("__sxx__").alias("sxx"),
        F.sum("__syy__").alias("syy"),
    )
    n_d = F.col("n")
    num = n_d * F.col("sxy") - F.col("sx") * F.col("sy")
    a = n_d * F.col("sxx") - F.col("sx") * F.col("sx")
    b = n_d * F.col("syy") - F.col("sy") * F.col("sy")
    den = F.sqrt(a) * F.sqrt(b)
    return agg.select(
        *by,
        F.col("n").cast("long").alias("n"),
        F.when((a > 0) & (b > 0), fround(num / den, 6)).alias(
            "spearman_rho"
        ),
    )


def main():
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .appName("exp_spearman")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from hashquery_spark.ops import spearman_corr

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    li = li.select("l_returnflag", "l_quantity", "l_extendedprice")

    # correctness first, on a small slice
    small = li.limit(200000)
    want = {
        r["l_returnflag"]: (r["n"], r["spearman_rho"])
        for r in spearman_corr(
            small, "l_quantity", "l_extendedprice", by="l_returnflag"
        ).collect()
    }
    got = {
        r["l_returnflag"]: (r["n"], r["spearman_rho"])
        for r in spearman_ranksort(
            small, "l_quantity", "l_extendedprice", by="l_returnflag"
        ).collect()
    }
    print("small-slice agreement:", want == got)
    for k in want:
        if want[k] != got.get(k):
            print("  DIFF", k, want[k], got.get(k))

    for name, fn in (
        (
            "shipped_fast",
            lambda: spearman_corr(
                li, "l_quantity", "l_extendedprice", by="l_returnflag"
            ),
        ),
        (
            "shipped_exact",
            lambda: spearman_corr(
                li,
                "l_quantity",
                "l_extendedprice",
                by="l_returnflag",
                exact=True,
            ),
        ),
        (
            "ranksort",
            lambda: spearman_ranksort(
                li, "l_quantity", "l_extendedprice", by="l_returnflag"
            ),
        ),
    ):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn().collect()
            best = min(best, time.perf_counter() - t0)
        with open("/proc/loadavg") as f:
            load = f.read().split()[0]
        print(f"{name}: {best:.2f} s (min-of-2, loadavg {load})")


if __name__ == "__main__":
    main()
