"""The sequence-match / funnel engine: ``MatchStepsSource``.

Re-expresses the reference's flagship operator (reference:
src/run/compile/source/compilers/match_steps.py:35-330, the largest file in
the repo at 696 LoC) with a Spark-first physical design.

Reference semantics (ported exactly):

* Each entity's event stream is matched greedily against an ordered list of
  step predicates: per-entity "journey hash" string built from one char per
  matching event, ordered by (timestamp ASC, step DESC) — the DESC tiebreak
  places earlier steps last within duplicate-timestamp groups so a single
  event matching steps a and c appears "ca" and matching `a` advances the
  cursor past the `c` (reference :513-521).
* Step i's match index = first occurrence of step i's char at or after the
  index of step i-1's match (+1). NULL propagates: once a step is unmatched
  all later steps are unmatched (reference :587-608).
* ``time_limit`` is enforced pessimistically at join-back time: a step's
  event columns are NULLed if its timestamp is not strictly within
  ``time_limit`` of the *first* step's timestamp; match indices are NOT
  re-derived (the reference documents this naivete at :173-178).
* ``partition_start_events``: the journey is split per (entity, partition)
  where the partition values are read from the *first* step-0 event of each
  partition group (reference :386-447); entities that never matched step 0
  are dropped when partitioning (reference :271-283).
* ≤62 steps, chars A-Za-z0-9 (reference :496-506).

Physical design (Spark-first, NOT the reference's N-way self-join cascade):

* ONE scan of the events source: each event computes an array of (step)
  matches and explode_outer's — the reference instead unions N filtered
  copies of the table (reference :79-113) and re-scans the base for the
  distinct-entity universe (reference :234-283); here zero-match events
  ride the same aggregate as NULL structs (skipped by collect_list), so
  entity presence is the group key and no second scan/join exists.
* ONE shuffle: ``groupBy(entity).agg(array_sort(collect_list(struct(...))))``
  gives the journey hash, the match indices (string arithmetic), AND every
  step's timestamp (``element_at``) with no join-backs. The reference needs
  a LEFT JOIN per step; we only join per-step when a step's *full event row*
  is referenced downstream (lazy, like dead-join elision). This is the
  struct-array formulation the reference itself uses on Databricks
  (:526-537), generalized to avoid the join cascade — at 100 TB the string
  journey hash and per-step joins are the scale hazards the reference
  documents (Redshift 64KB LISTAGG handler, :682-693).
* Skew note: one entity with millions of events lands in one task during the
  groupBy. The per-group payload is (ts, step) pairs only (full rows are
  collected only for lazily-joined steps), so hundreds of thousands of
  events per entity stay in the tens of MB. For hotter keys,
  ``salt_partials=N`` assembles each entity's array via N partial
  aggregations before the merge (two shuffles, N-way spread per entity);
  results are proven identical to the single-shuffle path.

  WHEN TO SALT (measured r6, local[32]): salting pays only past roughly
  ~6M events with ≥50% of them on one entity — at 2M events / 20% hot
  the plain path wins (3.1 s vs 3.5 s salted: the extra shuffle costs
  more than the skew), at 10M / 60% hot the salted path wins (30.5 s vs
  33.9 s). ``salt_partials="auto"`` applies exactly that crossover from
  one bounded 1%-sample job at compile time (see
  :func:`_auto_salt_partials`). Rule of thumb for a cluster: salt when
  (hottest-entity event count) × ~32 bytes approaches one executor
  task's comfortable working set, i.e. tens of millions of events on a
  single entity; N = a small multiple of the executor core count.
  Salting relieves only the COLLECT side — the final per-entity merge
  still sorts one journey in one task, so ``max_events_per_entity`` is
  the real valve for pathological entities (bots, monitoring keys).
"""

from __future__ import annotations

import datetime
from typing import List, Optional

from pyspark.sql import functions as F

from .expr import ColumnExpression
from .sources import (
    CompileState,
    FrameState,
    NamespaceSlot,
    Source,
    ns_prefixed,
)

GROUP_LABEL = "__group__"
TIMESTAMP_LABEL = "__timestamp__"
EVENT_INDEX_LABEL = "__event_index__"
JOURNEY_HASH_LABEL = "__journey_hash__"
EVENTS_ARRAY_LABEL = "__events__"

# step chars in the reference's order (reference :498-500)
import string as _string

_CHARS = _string.ascii_uppercase + _string.ascii_lowercase + _string.digits


def step_hash_id(step_index: int) -> str:
    if step_index >= len(_CHARS):
        raise ValueError(
            f"match_steps supports at most {len(_CHARS)} distinct step "
            "types; reduce the number of unique steps."
        )
    return _CHARS[step_index]


_AUTO_SALT_MIN_EVENTS = 6_000_000
_AUTO_SALT_HOT_FRACTION = 0.5


def _auto_salt_partials(ev) -> Optional[int]:
    """``salt_partials="auto"``: pick the salted path from the MEASURED
    r6 crossover (salting pays only past ~6M events with ≥50% of them
    on one entity — below that the extra shuffle costs more than the
    skew). One bounded sampling job at compile time: a deterministic 1%
    event sample (xxhash64(entity, ts) mod 100 — md5-class, never an
    RNG) → per-entity sampled counts → (total, hottest). An entity hot
    enough to matter (millions of events) is visible in any 1% sample;
    small corpora cheaply resolve to the plain path. Returns the
    partial count (2× the scheduler's default parallelism, the r6
    "small multiple of core count" rule) or None.

    The sample hash covers EVERY column the caller provides (entity, ts,
    and the activity schema's event key when one exists — r8 ADVICE:
    hashing only (entity, ts) sampled duplicate rows in lockstep, so a
    hot entity with few distinct timestamps could be badly mis-estimated;
    the event key shrinks that collision class to true duplicate rows,
    which genuinely co-sample under any deterministic scheme)."""
    samp = ev.where(
        F.pmod(F.xxhash64(*[F.col(c) for c in ev.columns]), F.lit(100)) == 0
    )
    stats = (
        samp.groupBy(GROUP_LABEL)
        .agg(F.count(F.lit(1)).alias("__c__"))
        .agg(F.sum("__c__").alias("__n__"), F.max("__c__").alias("__h__"))
        .collect()[0]
    )
    n = (stats["__n__"] or 0) * 100
    hot = (stats["__h__"] or 0) * 100
    if n >= _AUTO_SALT_MIN_EVENTS and hot >= _AUTO_SALT_HOT_FRACTION * n:
        sc = ev.sparkSession.sparkContext
        return max(8, 2 * sc.defaultParallelism)
    return None


def _step_index_col(i: int) -> str:
    return f"step_{i}_event_index"


def step_ts_label(i: int) -> str:
    return f"__step_{i}_ts__"


class ModelActivitySchema:
    """(group, timestamp, event_key) triple
    (reference: src/model/activity_schema.py:7)."""

    def __init__(self, group, timestamp, event_key) -> None:
        self.group = group
        self.timestamp = timestamp
        self.event_key = event_key

    def to_wire(self):
        return {
            "type": "modelActivitySchema",
            "group": self.group.to_wire() if self.group is not None else None,
            "timestamp": self.timestamp.to_wire() if self.timestamp is not None else None,
            "eventKey": self.event_key.to_wire() if self.event_key is not None else None,
        }

    @classmethod
    def from_wire(cls, data):
        w = lambda v: ColumnExpression.from_wire(v) if v else None
        return cls(w(data["group"]), w(data["timestamp"]), w(data["eventKey"]))


class MatchStepsSource(Source):
    __TYPE_KEY__ = "matchSteps"

    def __init__(
        self,
        base: Source,
        activity_schema: ModelActivitySchema,
        steps: List[ColumnExpression],
        partition_start_events: Optional[List[ColumnExpression]] = None,
        time_limit: Optional[datetime.timedelta] = None,
        max_events_per_entity: Optional[int] = None,
        salt_partials: Optional[int] = None,
    ) -> None:
        self.base = base
        self.activity_schema = activity_schema
        self.steps = list(steps)
        self.partition_start_events = list(partition_start_events or [])
        self.time_limit = time_limit
        # net-new safety valve for the journey-size hazard the reference
        # documents (Redshift 64KB LISTAGG failure, reference :682-693):
        # cap each entity's journey to its first N matching events
        self.max_events_per_entity = max_events_per_entity
        # net-new skew valve: assemble each entity's event array in
        # salt_partials partial aggregations first (spreads a hot entity
        # over N tasks), then merge. Two shuffles instead of one — only
        # worth it when single entities dominate tasks.
        self.salt_partials = salt_partials
        for i in range(len(self.steps)):
            step_hash_id(i)  # validate step count

    def child_sources(self):
        return [self.base]

    def expressions(self):
        return (
            list(self.steps)
            + [self.activity_schema.group, self.activity_schema.timestamp]
            + self.partition_start_events
        )

    def default_identifier(self):
        return self.base.default_identifier()

    # ------------------------------------------------------------------

    def compile(self, state: CompileState) -> FrameState:
        group_expr = self.activity_schema.group
        ts_expr = self.activity_schema.timestamp
        gid = group_expr.identifier
        ts_identifier = ts_expr.identifier
        n_steps = len(self.steps)
        partitions = self.partition_start_events
        part_names = [p.identifier for p in partitions]

        # which steps need their full event row joined back? (lazy —
        # only if downstream references a step attribute other than the
        # timestamp, which is served without any join)
        full_row_steps = {
            ns
            for (ns, colname) in state.global_ns_refs
            if ns in {s.identifier for s in self.steps} and colname != ts_identifier
        }
        need_full_rows = bool(full_row_steps)

        # ---- 1. one scan: per-event step-match array, exploded ----
        fs = self.base.compile(state)
        all_exprs = list(self.steps) + [group_expr, ts_expr] + list(partitions)
        ctx = fs.prepare(all_exprs)
        base_df = fs.df

        match_structs = []
        for i, step in enumerate(self.steps):
            cond = step.compile(ctx)
            match_structs.append(
                F.when(
                    cond,
                    F.struct(
                        F.lit(n_steps - 1 - i).alias("inv"),  # sort key: step DESC
                        F.lit(step_hash_id(i)).alias("ch"),
                    ),
                )
            )
        matches_arr = F.filter(F.array(*match_structs), lambda x: x.isNotNull())

        event_cols = [
            group_expr.compile(ctx).alias(GROUP_LABEL),
            ts_expr.compile(ctx).alias(TIMESTAMP_LABEL),
            *[p.compile(ctx).alias(p.identifier) for p in partitions],
        ]
        if need_full_rows:
            event_cols.append(F.struct(*[F.col(c) for c in base_df.columns]).alias("__row__"))
        # explode_outer, not explode: non-matching events pass through with a
        # NULL match so their ENTITY still reaches the journey aggregate —
        # entity presence comes free from the group key and the old second
        # scan (distinct entities + left join back) disappears. The NULL
        # matches are skipped when the array is collected, so shuffle volume
        # for them is just the per-task partial group entry — the same bytes
        # the distinct's partial aggregation used to shuffle.
        events = (
            base_df.select(*event_cols, F.explode_outer(matches_arr).alias("__m__"))
            .withColumn("__inv__", F.col("__m__.inv"))
            .withColumn("__ch__", F.col("__m__.ch"))
            .drop("__m__")
        )

        # ---- 2. one shuffle: per-entity sorted event array ----
        struct_fields = [
            F.col(TIMESTAMP_LABEL).alias("ts"),
            F.col("__inv__").alias("inv"),
            F.col("__ch__").alias("ch"),
            *[F.col(p).alias(f"p_{p}") for p in part_names],
        ]
        if need_full_rows:
            struct_fields.append(F.col("__row__").alias("row"))
        # NULL-match events (and NULL-entity matches, mirroring the
        # reference's uniq-LEFT-JOIN semantics where a NULL entity never
        # equi-joins its journey) collapse to NULL structs, which
        # collect_list skips — the group row survives with an empty array.
        event_struct = F.when(
            F.col("__ch__").isNotNull() & F.col(GROUP_LABEL).isNotNull(),
            F.struct(*struct_fields),
        )
        salt_partials = self.salt_partials
        if salt_partials == "auto":
            sample_cols = list(event_cols[:2])
            ek = getattr(self.activity_schema, "event_key", None)
            if ek is not None:
                sample_cols.append(ek.compile(ctx).alias("__ek__"))
            salt_partials = _auto_salt_partials(base_df.select(*sample_cols))
        if salt_partials:
            # two-stage assembly: partial sorted arrays per (entity, salt),
            # then merge — array_sort(flatten(partials)) == full sort
            salt = F.pmod(
                F.xxhash64(F.col(TIMESTAMP_LABEL), F.col("__ch__")),
                F.lit(salt_partials),
            )
            partials = (
                events.withColumn("__salt__", salt)
                .groupBy(F.col(GROUP_LABEL), F.col("__salt__"))
                .agg(F.collect_list(event_struct).alias("__part__"))
            )
            sorted_events = F.array_sort(F.flatten(F.collect_list(F.col("__part__"))))
            if self.max_events_per_entity is not None:
                sorted_events = F.slice(sorted_events, 1, self.max_events_per_entity)
            grouped = partials.groupBy(F.col(GROUP_LABEL)).agg(
                sorted_events.alias(EVENTS_ARRAY_LABEL)
            )
        else:
            sorted_events = F.array_sort(F.collect_list(event_struct))
            if self.max_events_per_entity is not None:
                sorted_events = F.slice(sorted_events, 1, self.max_events_per_entity)
            grouped = events.groupBy(F.col(GROUP_LABEL)).agg(
                sorted_events.alias(EVENTS_ARRAY_LABEL)
            )
        journeys = (
            grouped
            .withColumn(
                JOURNEY_HASH_LABEL,
                F.concat_ws(
                    "", F.transform(F.col(EVENTS_ARRAY_LABEL), lambda x: x["ch"])
                ),
            )
        )

        # ---- 3. match indices via string arithmetic (reference :587-608) ----
        # one row per entity — the partitioned path below multiplies
        # `journeys` per partition value, so per-step event join-backs must
        # derive from this pre-join frame or they'd duplicate matches
        journeys_base = journeys
        jh = JOURNEY_HASH_LABEL
        if partitions:
            # first step-0 event per (entity, partition values): its position
            # in the per-entity ordered array is the global event index
            # (reference :418-447)
            pos = journeys.select(
                F.col(GROUP_LABEL),
                F.posexplode(F.col(EVENTS_ARRAY_LABEL)).alias("__pos__", "__e__"),
            )
            firsts = (
                pos.where(F.col("__e__.ch") == step_hash_id(0))
                .groupBy(
                    F.col(GROUP_LABEL).alias("__fg__"),
                    *[F.col(f"__e__.p_{p}").alias(p) for p in part_names],
                )
                .agg((F.min("__pos__") + 1).alias(_step_index_col(0)))
            )
            journeys = journeys.join(
                firsts, journeys[GROUP_LABEL] == firsts["__fg__"], "inner"
            ).drop("__fg__")
        else:
            journeys = journeys.withColumn(
                _step_index_col(0),
                F.expr(f"nullif(instr({jh}, '{step_hash_id(0)}'), 0)"),
            )

        for i in range(1, n_steps):
            prev = _step_index_col(i - 1)
            ch = step_hash_id(i)
            journeys = journeys.withColumn(
                _step_index_col(i),
                F.expr(f"{prev} + nullif(instr(substr({jh}, {prev} + 1), '{ch}'), 0)"),
            )

        # ---- 4. per-step timestamps from the array (no join-back) ----
        # try_element_at, not element_at: under ANSI mode (Spark 4 default)
        # element_at with a NULL computed index wrongly returns the last
        # element instead of NULL (observed on 4.1; try_element_at is correct)
        raw_ts = [
            F.try_element_at(F.col(EVENTS_ARRAY_LABEL), F.col(_step_index_col(i)))["ts"]
            for i in range(n_steps)
        ]
        journeys = journeys.withColumn(step_ts_label(0), raw_ts[0])
        for i in range(1, n_steps):
            col = raw_ts[i]
            if self.time_limit is not None:
                limit_s = self.time_limit.total_seconds()
                within = (
                    F.unix_timestamp(col) - F.unix_timestamp(F.col(step_ts_label(0)))
                ) < F.lit(limit_s)
                col = F.when(within, col)
            journeys = journeys.withColumn(step_ts_label(i), col)

        # ---- 5. every unique entity is ALREADY a journey row ----
        # The reference re-scans the base for distinct entities and LEFT
        # JOINs journeys back (reference :234-283); here explode_outer in
        # step 1 routed zero-match entities through the same aggregate with
        # empty arrays, so the entity universe is the journey group keys —
        # ONE scan, ONE shuffle, no join.
        entity = journeys.select(
            F.col(GROUP_LABEL).alias(gid),
            *[F.col(p) for p in part_names],
            *[F.col(_step_index_col(i)) for i in range(n_steps)],
            *[F.col(step_ts_label(i)) for i in range(n_steps)],
        )
        if partitions:
            entity = entity.where(F.col(_step_index_col(0)).isNotNull())

        out = FrameState(df=entity, state=state)

        # ---- 6. lazy per-step namespaces ----
        # timestamp resolves instantly via colmap; any other event attribute
        # attaches a join against the positioned event rows
        if need_full_rows:
            pos_events = journeys_base.select(
                F.col(GROUP_LABEL),
                F.posexplode(F.col(EVENTS_ARRAY_LABEL)).alias("__pos__", "__e__"),
            ).select(
                F.col(GROUP_LABEL),
                (F.col("__pos__") + 1).alias(EVENT_INDEX_LABEL),
                F.col("__e__.ts").alias(TIMESTAMP_LABEL),
                F.col("__e__.row.*"),
            )
        else:
            pos_events = None

        for i, step in enumerate(self.steps):
            name = step.identifier
            slot = NamespaceSlot(
                name=name,
                build_df=(lambda pe=pos_events: pe),
                condition=None,
                how="left",
                colmap={ts_identifier: step_ts_label(i)},
            )
            if pos_events is not None:
                idx_col = _step_index_col(i)

                def cond_builder(ns=name, idx_col=idx_col, i=i, lim=self.time_limit):
                    on = (F.col(ns_prefixed(ns, GROUP_LABEL)) == F.col(gid)) & (
                        F.col(ns_prefixed(ns, EVENT_INDEX_LABEL)) == F.col(idx_col)
                    )
                    if lim is not None and i > 0:
                        # time limit enforced on the join (reference :307-315)
                        on = on & (
                            (
                                F.unix_timestamp(F.col(ns_prefixed(ns, TIMESTAMP_LABEL)))
                                - F.unix_timestamp(F.col(step_ts_label(0)))
                            )
                            < F.lit(lim.total_seconds())
                        )
                    return on

                slot.condition = cond_builder
            out.namespaces[name] = slot
        return out

    # ------------------------------------------------------------------

    def to_wire(self):
        return {
            **super().to_wire(),
            "base": self.base.to_wire(),
            "activitySchema": self.activity_schema.to_wire(),
            "steps": [s.to_wire() for s in self.steps],
            "partitionStartEvents": [p.to_wire() for p in self.partition_start_events],
            "timeLimit": self.time_limit.total_seconds() if self.time_limit else None,
            "maxEventsPerEntity": self.max_events_per_entity,
            "saltPartials": self.salt_partials,
        }

    @classmethod
    def _from_wire(cls, data):
        return cls(
            Source.from_wire(data["base"]),
            ModelActivitySchema.from_wire(data["activitySchema"]),
            [ColumnExpression.from_wire(s) for s in data["steps"]],
            [ColumnExpression.from_wire(p) for p in data["partitionStartEvents"]],
            (
                datetime.timedelta(seconds=data["timeLimit"])
                if data.get("timeLimit") is not None
                else None
            ),
            data.get("maxEventsPerEntity"),
            data.get("saltPartials"),
        )


from .sources import _register_wire  # noqa: E402

_register_wire(MatchStepsSource)
