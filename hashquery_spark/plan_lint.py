"""Physical-plan scale linting — run BEFORE submitting to a real cluster.

The repo's plan-regression tests (tests/test_plans.py) encode what a
scale-safe plan looks like; this module exposes the same checks as a
library feature so users can lint their own compositions:

    report = Model(conn, "lineitem").filter(...).scale_report()
    report["warnings"]  # human-readable scale smells

Checks are string-level inspections of the executed plan (the same
technique the test suite uses) — no execution happens; building the
report costs one Spark ANALYSIS + physical planning pass.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List


def plan_report(df) -> Dict[str, Any]:
    """Inspect a DataFrame's physical plan for scale smells. Returns
    counters plus a ``warnings`` list (empty = nothing suspicious).

    Checked smells (each one has bitten a real pipeline):

    * ``CartesianProduct`` — an all-pairs join; at scale this is |L|·|R|.
    * ``BroadcastNestedLoopJoin`` — tolerable only for deliberately tiny
      replicated sides (1-row stats frames); flagged so the author
      confirms intent.
    * Unpartitioned windows — ``Window`` with an empty partition spec
      moves EVERY row to one partition (the WindowExec warning, but
      visible before running).
    * ``SortMergeJoin`` count — fine per se, but each one is a shuffle +
      sort of both sides; listed so wide plans are conscious choices.
    * Exchange count — total shuffle stages.
    * Scan count — how many separate file scans the plan performs (a
      frame consumed N times with different pruning re-scans N times;
      see the verify-skill gotcha).
    * In-memory relation scans (``Scan ExistingRDD`` / local tables) at
      the leaf of a big pipeline usually mean driver-materialized data.
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_scans = plan.count("Scan parquet") + plan.count("Scan orc") + plan.count(
        "Scan avro"
    )
    n_exchanges = plan.count("Exchange ")
    n_smj = plan.count("SortMergeJoin")
    n_cartesian = plan.count("CartesianProduct")
    n_bnlj = plan.count("BroadcastNestedLoopJoin")
    # windowspecdefinition(..., specifiedwindowframe...) with no partition
    # columns: the spec starts directly with the order spec
    unpartitioned_windows = len(
        re.findall(r"windowspecdefinition\((?:[^,()]+ (?:ASC|DESC))", plan)
    )
    # exact `percentile(...)` inside an aggregate with NO grouping keys:
    # every distinct value buffers on one reducer — unbounded memory at
    # scale. (percentile_approx / approx_percentile never match the
    # `percentile(` literal.)
    unpartitioned_exact_percentiles = len(
        re.findall(r"keys=\[\],\s*functions=\[[^\]]*\bpercentile\(", plan)
    )
    # exact percentile over a GROUPED aggregate is the same smell wearing
    # a disguise: the buffer is per GROUP, and plans can't see group
    # cardinality — a low-cardinality skewed key (language, status code)
    # still puts billions of values on one reducer. Safe only when every
    # group is provably small; prefer percentile_approx or the
    # histogram-based ops.grid_percentiles (exact AND spillable).
    grouped_exact_percentiles = len(
        re.findall(r"keys=\[[^\]]+\],\s*functions=\[[^\]]*\bpercentile\(", plan)
    )
    warnings: List[str] = []
    if n_cartesian:
        warnings.append(
            f"{n_cartesian} CartesianProduct(s): an all-pairs join — at scale "
            "this is |L|x|R|; add an equi-key, bucketize the range predicate "
            "(ops.range_join), or broadcast a provably tiny side."
        )
    if n_bnlj:
        warnings.append(
            f"{n_bnlj} BroadcastNestedLoopJoin(s): only safe when the "
            "broadcast side is deliberately tiny (1-row stats frames); "
            "verify the build side is bounded."
        )
    if unpartitioned_exact_percentiles:
        warnings.append(
            f"{unpartitioned_exact_percentiles} unpartitioned EXACT "
            "percentile(s): the aggregate buffers every distinct value on "
            "one reducer — unbounded memory at scale. Use percentile_approx "
            "(ops.approx_quantiles / exact=False) or group the percentile."
        )
    if grouped_exact_percentiles:
        warnings.append(
            f"{grouped_exact_percentiles} grouped EXACT percentile(s): the "
            "aggregate buffers every value of a GROUP on one reducer — safe "
            "only if every group is provably small (a low-cardinality skewed "
            "key is the classic trap). Prefer percentile_approx or the "
            "distributed histogram percentile (ops.grid_percentiles)."
        )
    if unpartitioned_windows:
        warnings.append(
            f"{unpartitioned_windows} unpartitioned window(s): every row "
            "moves to ONE partition. Partition the window, or bound the "
            "input first (TakeOrdered/limit) like ops.urls.host_rollup."
        )
    if n_scans > 2:
        warnings.append(
            f"{n_scans} separate file scans: a frame consumed several times "
            "with different column pruning re-executes its pipeline per "
            "consumer (no ReusedExchange). Consider cached()/localCheckpoint "
            "for small intermediate frames."
        )
    return {
        "scans": n_scans,
        "exchanges": n_exchanges,
        "sort_merge_joins": n_smj,
        "cartesian_products": n_cartesian,
        "broadcast_nested_loop_joins": n_bnlj,
        "unpartitioned_windows": unpartitioned_windows,
        "unpartitioned_exact_percentiles": unpartitioned_exact_percentiles,
        "grouped_exact_percentiles": grouped_exact_percentiles,
        "warnings": warnings,
    }


def run_metrics(df, collect: bool = True) -> Dict[str, Any]:
    """Execute (optionally) and read back the executed plan's SQL metrics
    — the post-run twin of :func:`plan_report`. Where plan_report predicts
    scale smells from plan SHAPE, this measures what actually happened:
    shuffle volume, spill, per-operator rows, peak aggregate memory — the
    numbers you check before promoting a pipeline from a sample run to
    the 100 TB cluster ("did it spill?", "how many bytes crossed the
    wire?", "did the filter actually cut the rows?").

    Returns ``{"totals": {...}, "nodes": [(node, metric, value), ...]}``.
    Totals (summed across operators, zeros omitted from nodes):

    * ``shuffle_bytes_written`` / ``shuffle_records_written`` — Exchange
      write volume (the wire cost a bigger cluster multiplies)
    * ``spill_bytes_memory`` / ``spill_bytes_disk`` — sort/agg spills; any
      non-zero here means executor memory was too small for a partition
    * ``scan_output_rows`` / ``files_read`` / ``scan_bytes_read`` — leaf
      scan volume (pushdown effectiveness)
    * ``peak_memory_max`` — largest single-operator memory high-water mark
    """
    jdf = df._jdf
    if collect:
        df.collect()
    nodes: List[tuple] = []

    def walk(n):
        cls = n.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            walk(n.executedPlan())
            return
        if cls.endswith("QueryStageExec"):
            walk(n.plan())
        it = n.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            v = kv._2().value()
            if v:
                nodes.append((n.nodeName(), kv._1(), v))
        ch = n.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(jdf.queryExecution().executedPlan())
    totals = {
        "shuffle_bytes_written": 0,
        "shuffle_records_written": 0,
        "spill_bytes_memory": 0,
        "spill_bytes_disk": 0,
        "scan_output_rows": 0,
        "files_read": 0,
        "scan_bytes_read": 0,
        "peak_memory_max": 0,
    }
    for node, name, value in nodes:
        if node == "Exchange" and name == "shuffleBytesWritten":
            totals["shuffle_bytes_written"] += value
        elif node == "Exchange" and name == "shuffleRecordsWritten":
            totals["shuffle_records_written"] += value
        elif name == "spillSize" or name == "memoryBytesSpilled":
            totals["spill_bytes_memory"] += value
        elif name == "diskBytesSpilled":
            totals["spill_bytes_disk"] += value
        elif node.startswith("Scan") and name == "numOutputRows":
            totals["scan_output_rows"] += value
        elif name == "numFiles":
            totals["files_read"] += value
        elif name in ("filesSize", "bytesRead") and node.startswith("Scan"):
            totals["scan_bytes_read"] += value
        elif name == "peakMemory":
            totals["peak_memory_max"] = max(totals["peak_memory_max"], value)
    return {"totals": totals, "nodes": nodes}
