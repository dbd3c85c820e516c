"""Structured Streaming surface — net-new beyond the reference.

The reference is batch-only (SURVEY.md §2.7: "Streaming ... absent"); this
module adds the streaming counterparts a large-scale event pipeline needs,
expressed with Spark's native streaming primitives so state management,
watermark-based late-data handling, and incremental execution come from the
engine:

* :func:`read_event_stream` — file-source stream with schema, the
  streaming twin of ``Connection.register_parquet``.
* :func:`windowed_event_counts` — tumbling/sliding windowed counts with a
  watermark (late events beyond the watermark are dropped by Spark, not by
  hand-rolled logic).
* :func:`sessionize` — native ``session_window`` gap sessionization; the
  streaming analogue of the activity-schema grouping the batch funnel uses.
* :func:`streaming_step_counts` — per-micro-batch funnel *step event*
  counts (how many events matched each step predicate), the incremental
  feed for a funnel dashboard. Full journey matching needs the entity's
  whole history and is a batch op (match_steps); this keeps the streaming
  side to what streaming semantics can answer exactly.

All sinks are the caller's choice (``.writeStream`` on the returned frame);
tests use ``trigger(availableNow=True)`` + a memory sink.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_event_stream(
    spark: SparkSession,
    path: str,
    schema,
    format: str = "parquet",
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """File-source event stream (each new file = new data)."""
    reader = spark.readStream.format(format).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def windowed_event_counts(
    events: DataFrame,
    ts_col: str,
    key_col: str,
    window: str = "1 hour",
    slide: Optional[str] = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked windowed counts per key.

    Output columns: window_start, window_end, <key_col>, n_events.
    With a slide this is a sliding window; otherwise tumbling. The
    watermark bounds state: windows older than (max event time − watermark)
    are finalized and dropped from the state store."""
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("__w__"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("__w__.start").alias("window_start"),
            F.col("__w__.end").alias("window_end"),
            F.col(key_col),
            F.col("n_events"),
        )
    )


def sessionize(
    events: DataFrame,
    ts_col: str,
    group_col: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based sessionization via native ``session_window`` — sessions
    close after ``gap`` of inactivity per group. State is merged by the
    engine (no applyInPandasWithState needed for pure gap sessions).

    Output: <group_col>, session_start, session_end, n_events."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("__s__"), F.col(group_col)
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(group_col),
            F.col("__s__.start").alias("session_start"),
            F.col("__s__.end").alias("session_end"),
            F.col("n_events"),
        )
    )


def streaming_step_counts(
    events: DataFrame,
    ts_col: str,
    event_key_col: str,
    steps: Sequence[str],
    window: str = "1 day",
    watermark: str = "1 hour",
) -> DataFrame:
    """Windowed per-step event counts for a funnel dashboard: one row per
    (window, step) with the number of events matching that step value.

    The count_if is expressed as SUM(CASE ...) so it folds into the
    streaming aggregation's incremental state (same sugar as the batch
    engine, reference: src/model/func/_sql_functions.py:25-30)."""
    aggs = [
        F.sum(F.when(F.col(event_key_col) == s, 1).otherwise(0)).alias(f"{s}_count")
        for s in steps
    ]
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("__w__"))
        .agg(*aggs)
        .select(
            F.col("__w__.start").alias("window_start"),
            *[F.col(f"{s}_count") for s in steps],
        )
    )


def streaming_dedup(
    events: DataFrame,
    key_col: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    """Custom stateful streaming operator: exact dedup across micro-batches.

    Keeps one bit of state per dedup key via Arrow-batched
    ``applyInPandasWithState``; only a key's FIRST occurrence (ever, across
    all micro-batches) is emitted. This is the streaming twin of
    ``ops.exact_dedup`` and the template for any custom stateful operator
    Spark lacks natively (the state store shards by key, so it scales with
    the key space, not the stream length).

    Output schema: <key_col> string, <payload_cols...> as strings."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = ", ".join(
        [f"{key_col} string"] + [f"{c} string" for c in payload_cols]
    )
    state_schema = "seen boolean"

    def dedup_fn(key, pdf_iter, state):
        if state.exists:
            # key already emitted in an earlier batch — drop everything
            for _ in pdf_iter:
                pass
            return
        state.update((True,))
        first = None
        for pdf in pdf_iter:
            if len(pdf) and first is None:
                first = pdf.iloc[[0]]
        if first is not None:
            yield pd.DataFrame(
                {
                    key_col: first[key_col].astype(str),
                    **{c: first[c].astype(str) for c in payload_cols},
                }
            )

    return (
        events.groupBy(F.col(key_col))
        .applyInPandasWithState(
            dedup_fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_counter_delta(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Streaming twin of ``ops.counter_delta``: per-series reset-aware
    counter increases computed incrementally — ONE double of state per
    series (the last observed value) via ``applyInPandasWithState``, so
    a fleet of counters streams deltas forever with state proportional to
    the number of series, not the stream length.

    Emits one row per sample: (key, ts, value, increase) — nonneg diff
    vs the previous observation, the raw value after a reset, NULL for a
    series' first-ever sample (exact batch semantics). Within a
    micro-batch samples sort by (ts, value); cross-batch out-of-order
    samples are attributed against the carried last value (the same
    inherent limitation as the streaming funnel — documented, not
    hidden)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = f"{key_col} string, {ts_col} timestamp, value double, increase double"
    state_schema = "last double"

    def delta_fn(key, pdf_iter, state):
        last = state.get[0] if state.exists else None
        out = []
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            pdf = pdf.sort_values([ts_col, value_col])
            for t, v in zip(pdf[ts_col], pdf[value_col]):
                if v is None or pd.isna(v):
                    continue
                v = float(v)
                if last is None:
                    inc = None
                elif v >= last:
                    inc = v - last
                else:
                    inc = v  # counter reset: pre-reset remainder is lost
                out.append((str(key[0]), t, v, inc))
                last = v
        if last is not None:
            state.update((last,))
        if out:
            yield pd.DataFrame(
                out, columns=[key_col, ts_col, "value", "increase"]
            )

    return events.groupBy(F.col(key_col)).applyInPandasWithState(
        delta_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_funnel_progress(
    events: DataFrame,
    group_col: str,
    ts_col: str,
    event_key_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Incremental funnel: a per-entity furthest-step tracker across
    micro-batches — the custom stateful operator Spark lacks natively,
    built on Arrow-batched ``applyInPandasWithState``.

    State per entity = the last matched step index. Within each
    micro-batch, events are processed in (ts, step-index DESC) order — the
    same duplicate-timestamp ordering the batch journey hash pins
    (match_steps.py; reference: compilers/match_steps.py:513-521) — and the
    entity advances greedily one step per matching event. Emits one row per
    entity whose progress changed in the batch:
    (group, last_matched_step_index, last_matched_step_name).

    Streaming caveat (inherent, documented): an event arriving in a LATER
    micro-batch with an EARLIER timestamp cannot retro-match — state only
    moves forward. On in-order streams the final state equals the batch
    ``match_steps`` result (tested); out-of-order delivery within one batch
    is handled by the sort.

    Scale: state is one int per entity, sharded by the state store across
    executors; no journey strings, no event retention."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    steps = list(steps)
    step_of = {s: i for i, s in enumerate(steps)}
    out_schema = (
        f"{group_col} long, last_matched_step_index int, last_matched_step_name string"
    )

    def track(key, pdf_iter, state):
        idx = state.get[0] if state.exists else -1
        rows = pd.concat(list(pdf_iter), ignore_index=True)
        rows["__si__"] = rows[event_key_col].map(lambda e: step_of.get(e, -1))
        rows = rows[rows["__si__"] >= 0].sort_values(
            [ts_col, "__si__"], ascending=[True, False]
        )
        start = idx
        for si in rows["__si__"]:
            if idx + 1 < len(steps) and si == idx + 1:
                idx += 1
        if idx != start:
            state.update((idx,))
            yield pd.DataFrame(
                {
                    group_col: [key[0]],
                    "last_matched_step_index": [idx],
                    "last_matched_step_name": [steps[idx]],
                }
            )

    return (
        events.groupBy(F.col(group_col))
        .applyInPandasWithState(
            track,
            outputStructType=out_schema,
            stateStructType="idx int",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_curate(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    min_quality: float = 0.2,
    langs: tuple = ("en",),
    max_dup_line_ratio: float = 0.5,
    test_fraction: float = 0.1,
    seed: int = 0,
) -> DataFrame:
    """Streaming twin of ``ops.curation.curate``: the feature computation,
    filters, and split are the SAME stateless narrow expressions
    (``curation_candidates``), and the exact-dedup keep becomes
    :func:`streaming_dedup` — one bit of state per content hash, sharded
    by the state store, so a corpus can be curated as it arrives.

    Semantic difference vs batch, by construction: streaming keeps each
    hash's FIRST ARRIVAL (cross-batch), batch keeps the smallest id.
    Output columns are strings (streaming_dedup's payload contract)."""
    from .ops.curation import curation_candidates

    cands = curation_candidates(
        docs, text_col, id_col, min_quality, langs, max_dup_line_ratio,
        test_fraction, seed,
    )
    return streaming_dedup(
        cands, "content_hash",
        [id_col, "lang_pred", "quality", "dup_line_ratio", "split"],
    )


def streaming_dedup_within(
    stream: DataFrame,
    key_cols,
    ts_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Bounded-state streaming dedup: drop duplicate keys arriving within
    the watermark horizon via Spark's native
    ``dropDuplicatesWithinWatermark`` — the production complement to
    :func:`streaming_dedup`, whose one-bit-per-key state grows with the
    ever-seen key SPACE and never expires. Here the state store holds
    only keys younger than the watermark, so memory is bounded by the
    ingest rate x horizon — the right contract for at-least-once
    sources (Kafka redeliveries, retried batch loads) where duplicates
    arrive close together and a key legitimately recurring days later
    is NOT a duplicate.

    Semantics: the first arrival of a key is emitted; later arrivals
    are dropped as long as they land within ``watermark`` of the first
    one's event time (Spark keeps the key's state until the watermark
    passes it). Use :func:`streaming_dedup` when keys must be unique
    FOREVER (content-hash corpus dedup against an unbounded history).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on,
    how: str = "left",
    broadcast: bool = True,
) -> DataFrame:
    """Stream-static dimension enrichment — the canonical streaming-ETL
    join. The static side is re-resolved against its source every
    micro-batch, so a slowly-changing dimension table refreshes without
    restarting the query.

    ``broadcast=True`` (default) ships the dim to every task: a
    stream-static join must never shuffle the *stream* side, and for the
    usual small-dim case broadcasting removes the state store entirely
    (stateless per-batch hash join). Set it False only for a dim too big
    to broadcast — Spark then shuffles each micro-batch against the dim."""
    d = F.broadcast(dim) if broadcast else dim
    return stream.join(d, on=on, how=how)


def join_streams(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    within: str = "15 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join — the click-attribution
    shape: pair a right-stream event with a left-stream event sharing the
    join key(s) when ``right_ts`` falls in ``[left_ts, left_ts + within]``.

    Both sides carry watermarks AND the join condition bounds the two
    event times against each other, which is exactly what Spark needs to
    keep the join *state store* finite: a buffered left row can be GC'd
    once the right watermark passes ``left_ts + within``, and vice versa
    (without the interval bound, stream-stream join state grows forever).
    Outer variants emit the unmatched side only after the watermark
    closes its match window, so late results are complete, not racy.

    The two input column sets must be disjoint apart from ``on`` (rename
    upstream if needed); ``how`` may be inner / leftOuter / rightOuter /
    fullOuter."""
    if how not in ("inner", "leftOuter", "rightOuter", "fullOuter"):
        raise ValueError(f"unsupported stream-stream join type {how!r}")
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = None
    for k in on:
        c = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = c if cond is None else cond & c
    lo = F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}")
    hi = F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(
        f"INTERVAL {within}"
    )
    cond = (cond & lo & hi) if cond is not None else (lo & hi)
    joined = l.join(r, cond, how)
    # drop the duplicated key columns from the right side
    keep = [F.col(f"l.{c}") for c in left.columns] + [
        F.col(f"r.{c}") for c in right.columns if c not in set(on)
    ]
    return joined.select(*keep)


def write_stream_parquet(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: Optional[Sequence[str]] = None,
    trigger_once: bool = False,
):
    """Exactly-once parquet sink: append mode + a checkpoint directory
    gives atomic, resumable output (Spark tracks committed files in the
    checkpoint — a crashed job resumes without duplicating data).
    ``partition_by`` prunes downstream reads; ``trigger_once`` drains all
    available input then stops (incremental batch). Returns the running
    StreamingQuery."""
    w = (
        stream.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()


def run_to_memory(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Drain a (bounded) stream into an in-memory table with
    ``availableNow`` and return the result as a batch frame — the test
    harness for every op above."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)


def score_stream(
    stream: DataFrame,
    text_col: str,
    id_col: str,
    weights,
    bias: float = 0.0,
    n_features: int = 65536,
    salt: str = "qc",
) -> DataFrame:
    """Stateless streaming twin of ``ops.classifier.classifier_score`` —
    apply a trained quality filter to documents as they arrive.

    The batch op rolls up an exploded (id, bucket) frame (an aggregation —
    unbounded state on a stream); here the margin folds INSIDE the row
    with a single-level ``aggregate`` HOF over the token array and the
    weight table inlined as a map literal, so scoring is a narrow
    projection: no state store, no shuffle, append-mode, identical margins
    (same micro-unit integer arithmetic). Practical bound: the inlined map
    is part of the plan — fine for distilled filter models (≤ ~10k
    buckets); batch-score with the broadcast-join op beyond that.

    Works identically on a batch DataFrame (pure narrow expressions) —
    the consistency test scores both ways and compares."""
    from .ops.classifier import _SCALE, _scale_weight

    scaled = {int(b): _scale_weight(w) for b, w in weights.items()}
    pairs = ",".join(f"{b}L,{w}L" for b, w in sorted(scaled.items()))
    lookup = (
        f"coalesce(try_element_at(map({pairs}), __b__), 0L)" if pairs else "0L"
    )
    bucket = (
        f"pmod(CAST(conv(substring(md5(concat('{salt}:', t)), 1, 8), 16, 10) "
        f"AS BIGINT), {n_features})"
    )
    # Spark regexp_replace is global by default (NORMALIZE_SQL in
    # ops.dedup is the DuckDB rendering — its 'g' flag arg parses as a
    # position int here)
    norm = f"trim(regexp_replace(lower(`{text_col}`), '[^a-z0-9]+', ' '))"
    toks = rf"filter(split({norm}, '\\s+'), t -> t <> '')"
    fold = (
        f"aggregate(__toks__, 0L, (acc, t) -> acc + "
        + lookup.replace("__b__", bucket)
        + f") + {_scale_weight(bias)}L"
    )
    return (
        stream.selectExpr("*", f"{toks} AS __toks__")
        .selectExpr(
            "*",
            "size(__toks__) AS n_tokens",
            f"round(({fold}) / {float(_SCALE)}, 6) AS margin",
        )
        .selectExpr("*", "margin > 0 AS keep")
        .drop("__toks__")
    )


def streaming_drift(
    events: DataFrame,
    ts_col: str,
    cat_col: str,
    baseline: DataFrame,
    window: str = "1 hour",
    watermark: str = "1 hour",
    smooth: float = 1e-4,
) -> DataFrame:
    """Per-window categorical drift (PSI) of a live stream against a
    STATIC baseline distribution — the production data-quality monitor
    ("did the upstream schema/traffic mix shift this hour"). Output one
    row per window: ``window_start, window_end, n_events, psi`` where
    ``psi = Σ_c (p_c − b_c)·ln(p_c/b_c)`` over the baseline's category
    set (stream categories outside it pool into ``__other__``; shares
    are ``smooth``-floored so empty cells stay finite — the standard
    PSI smoothing).

    Streaming shape: the baseline is bounded and collected ONCE at plan
    time (shares become plan literals — the score_stream inlined-model
    contract), so the whole monitor is ONE watermarked windowed
    aggregate with a CASE-sum column per category and the PSI folded as
    a flat per-row expression over that single state row — no second
    stateful operator, no stream-stream join, append-compatible state
    bounded by live windows × 1 row.

    Works identically on a batch frame (the score_stream consistency
    contract)."""
    rows = (
        baseline.where(F.col(cat_col).isNotNull())
        .groupBy(F.col(cat_col).cast("string").alias("__c__"))
        .agg(F.count(F.lit(1)).alias("__n__"))
        .collect()
    )
    if not rows:
        raise ValueError("baseline has no categories")
    total = float(sum(r["__n__"] for r in rows))
    shares = {r["__c__"]: r["__n__"] / total for r in rows}
    if "__other__" in shares:
        # the pooled-unseen sentinel must not collide with a real
        # baseline category (r8 ADVICE: pooled rows would double-count
        # — once in that category's CASE sum and once in __koth__)
        raise ValueError(
            "baseline contains a category literally named '__other__', "
            "which collides with the pooled-unseen sentinel; rename it "
            "upstream before monitoring"
        )
    cats = sorted(shares)

    c = F.col(cat_col).cast("string")
    tagged = events.withColumn(
        "__cat__",
        F.when(c.isin(cats), c).otherwise(F.lit("__other__")),
    )
    aggs = [F.count(F.lit(1)).alias("n_events")] + [
        F.count(F.when(F.col("__cat__") == cat, 1)).alias(f"__k{i}__")
        for i, cat in enumerate(cats)
    ] + [
        F.count(F.when(F.col("__cat__") == "__other__", 1)).alias("__koth__")
    ]
    win = F.window(F.col(ts_col), window)
    agg = (
        tagged.withWatermark(ts_col, watermark)
        .groupBy(win.alias("__w__"))
        .agg(*aggs)
    )
    sm = float(smooth)
    terms = []
    n_d = F.col("n_events").cast("double")
    for i, cat in enumerate(cats):
        b = max(shares[cat], sm)
        p = F.greatest(F.col(f"__k{i}__").cast("double") / n_d, F.lit(sm))
        terms.append((p - F.lit(b)) * F.log(p / F.lit(b)))
    # baseline share for unseen categories is the smoothing floor
    p_oth = F.greatest(F.col("__koth__").cast("double") / n_d, F.lit(sm))
    terms.append((p_oth - F.lit(sm)) * F.log(p_oth / F.lit(sm)))
    psi = terms[0]
    for t in terms[1:]:
        psi = psi + t
    return agg.select(
        F.col("__w__.start").alias("window_start"),
        F.col("__w__.end").alias("window_end"),
        F.col("n_events"),
        psi.alias("psi"),
    )
