"""Relational source nodes and their compilation to lazy DataFrames.

The reference compiles an immutable ``Source`` tree to a chain of SQL CTEs
via SQLAlchemy (reference: src/model/source/source.py:7, compiler registry
src/run/compile/source/compile_source.py:10-36). Here each Source compiles
to a transformation on a lazy ``pyspark.sql.DataFrame`` — Spark's logical
plan *is* the CTE chain, and Catalyst provides layer fusion, predicate
pushdown, column pruning and join reordering that the reference left to the
warehouse (SURVEY.md §4).

Design notes for 100 TB scale:

* Everything stays declarative DataFrame API — no RDDs, no collect().
* Joins attach lazily: a ``with_join_one`` relation is only joined into the
  plan if one of its columns is actually referenced downstream, replicating
  the reference's dead-join elision (reference:
  src/run/compile/source/compilers/join_one.py:54-67). An un-joined dim
  table is never scanned.
* ``broadcast=True`` (or "auto" + AQE) turns dim joins into broadcast hash
  joins, avoiding a shuffle of the fact side.
* Namespaced (joined) columns are physically prefixed ``__ns_{name}__{col}``
  so multi-join disambiguation never relies on Spark alias scoping; Catalyst
  prunes unused prefixed columns out of the scan.
* ``fold`` compiles to native ``DataFrame.unpivot`` — one scan instead of
  the reference's N-way self-union (reference: src/model/model.py:984-995).
"""

from __future__ import annotations

import datetime
import re
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Set, Tuple

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .connection import Connection
from .expr import (
    ColumnExpression,
    ExprContext,
    RESERVED_NAME_RE,
    StarExpression,
    SubqueryExpression,
    column,
)

NS_SEP = "__ns_"


def ns_prefixed(namespace: str, col: str) -> str:
    return f"{NS_SEP}{namespace}__{col}"


# --------------------------------------------------------------------------
# Compile state
# --------------------------------------------------------------------------


@dataclass
class NamespaceSlot:
    """A joined relation that may or may not be physically attached yet."""

    name: str
    build_df: Callable[[], DataFrame]  # deferred: don't even read the source
    condition: Optional[ColumnExpression]
    how: str  # "left" | "inner"
    broadcast: bool = False
    attached: bool = False
    # fast-path column aliases that resolve without attaching the join
    # (used by match_steps for per-step timestamps)
    colmap: Dict[str, str] = field(default_factory=dict)


@dataclass
class CompileState:
    """Global compile state for one Model execution."""

    connection: Connection
    now: datetime.datetime = field(default_factory=datetime.datetime.now)
    first_day_of_week: int = 0
    # (namespace, column) pairs referenced anywhere in the full source tree
    global_ns_refs: Set[Tuple[str, str]] = field(default_factory=set)
    name_counter: int = 0

    @property
    def spark(self) -> SparkSession:
        return self.connection.spark

    def fresh_name(self, base: str) -> str:
        self.name_counter += 1
        return f"__{base}_{self.name_counter}__"


@dataclass
class FrameState:
    """A DataFrame plus the semantic bookkeeping Spark doesn't track."""

    df: DataFrame
    state: CompileState
    namespaces: Dict[str, NamespaceSlot] = field(default_factory=dict)
    sort_exprs: List[Column] = field(default_factory=list)  # accumulated ORDER BY
    sql_bindings: Dict[str, ColumnExpression] = field(default_factory=dict)

    # --- expression compilation with lazy join / subquery attachment ---

    def expr_ctx(self) -> ExprContext:
        def ns_col(ns: str, col: str) -> str:
            slot = self.namespaces.get(ns)
            if slot is None:
                raise KeyError(f"no joined relation named {ns!r} in scope")
            if col in slot.colmap:
                return slot.colmap[col]
            return ns_prefixed(ns, col)

        return ExprContext(
            spark=self.state.spark,
            df=self.df,
            now=self.state.now,
            ns_col=ns_col,
            first_day_of_week=self.state.first_day_of_week,
            sql_bindings=self.sql_bindings,
        )

    def prepare(self, exprs: List[ColumnExpression]) -> ExprContext:
        """Attach any joins / subquery markers the expressions need, then
        return a context ready to compile them against ``self.df``."""
        needed: List[Tuple[str, str]] = []
        subqueries: List[SubqueryExpression] = []
        for e in exprs:
            if not isinstance(e, ColumnExpression):
                continue
            for node in e.walk():
                if node._namespace:
                    name = getattr(node, "name", None) or node.identifier
                    needed.append((node._namespace, name))
                if isinstance(node, SubqueryExpression):
                    subqueries.append(node)
        for ns, colname in needed:
            self._ensure_namespace(ns, colname)
        for sub in subqueries:
            self._attach_subquery(sub, self.expr_ctx())
        ctx = self.expr_ctx()
        ctx.subquery_cols = self._subquery_cols
        return ctx

    def _ensure_namespace(self, ns: str, colname: str) -> None:
        slot = self.namespaces.get(ns)
        if slot is None:
            raise KeyError(f"no joined relation named {ns!r} in scope")
        if slot.attached or colname in slot.colmap:
            return
        self._attach_join(slot)

    def _attach_join(self, slot: NamespaceSlot) -> None:
        """Physically add the (so-far elided) join into the plan."""
        joined = slot.build_df()
        if joined is None:
            raise KeyError(
                f"relation {slot.name!r} only exposes fast-path columns "
                f"({sorted(slot.colmap)}); no joinable frame is available"
            )
        # prefix every column so disambiguation is purely lexical
        joined = joined.select(
            *[F.col(c).alias(ns_prefixed(slot.name, c)) for c in joined.columns]
        )
        if slot.broadcast:
            joined = F.broadcast(joined)
        cond_expr = slot.condition
        if callable(cond_expr) and not isinstance(cond_expr, ColumnExpression):
            # internal joins (match_steps step namespaces) build their ON
            # clause directly as a pyspark Column
            slot.attached = True
            self.df = self.df.join(joined, on=cond_expr(), how=slot.how)
            return
        # the ON condition may itself reference other namespaces
        sub_needs = [
            (n._namespace, getattr(n, "name", None) or n.identifier)
            for n in cond_expr.walk()
            if n._namespace and n._namespace != slot.name
        ]
        for ns, colname in sub_needs:
            self._ensure_namespace(ns, colname)
        slot.attached = True  # set before compiling ON (self-references OK)
        probe = self.df.crossJoin(joined.limit(0))
        ctx = ExprContext(
            spark=self.state.spark,
            df=probe,
            now=self.state.now,
            ns_col=lambda ns, col: (
                self.namespaces[ns].colmap.get(col) or ns_prefixed(ns, col)
            ),
            first_day_of_week=self.state.first_day_of_week,
            sql_bindings=self.sql_bindings,
        )
        on = cond_expr.compile(ctx)
        self.df = self.df.join(joined, on=on, how=slot.how)

    # --- subquery (IN / EXISTS) join rewrites ---

    @property
    def _subquery_cols(self) -> dict:
        if not hasattr(self, "_sq_cols"):
            self._sq_cols = {}
        return self._sq_cols

    def _attach_subquery(self, sub: SubqueryExpression, ctx: ExprContext) -> None:
        if id(sub) in self._subquery_cols:
            return
        sub_df = compile_model_df(sub.model, self.state)
        if sub.kind == "in":
            if len(sub_df.columns) != 1:
                # default to the model's single attribute or primary key
                sub_df = sub_df.select(sub_df.columns[0])
            val_col = sub_df.columns[0]
            marker = self.state.fresh_name("in_marker")
            val_alias = self.state.fresh_name("in_val")
            rhs = (
                sub_df.select(F.col(val_col).alias(val_alias))
                .distinct()
                .withColumn(marker, F.lit(True))
            )
            needle = sub.needle.compile(ctx)
            # Null semantics (reference: column_expression.py:513-544): a
            # NULL needle matches iff the subquery contains a NULL. A
            # single NULL-SAFE equi-join (needle <=> val, still a hash
            # join) encodes that truth table exactly — the distinct rhs
            # keeps its NULL row, which only a NULL needle can hit. This
            # replaced a separate has-null aggregate branch + 1-row cross
            # join per membership (an extra subquery scan and exchange,
            # ~0.3 s of plan/runtime per membership at bench scale).
            # Join strategy left to AQE: a small distinct set broadcasts
            # at runtime, a huge IN-subquery becomes a shuffle join
            # instead of an OOM'ing forced broadcast.
            self.df = self.df.join(rhs, on=needle.eqNullSafe(F.col(val_alias)), how="left")
            self._subquery_cols[id(sub)] = F.col(marker).isNotNull()
        elif sub.kind == "scalar":
            # scalar subquery: a one-row one-column frame broadcast-cross-
            # joined in (the reference declares Model-as-operand but its
            # as_scalar_column_expression is missing — latent bug,
            # reference: column_expression.py:637-638). The sub-model is
            # expected to produce exactly one row (e.g. a global
            # aggregate); extra rows are cut, zero rows yield NULL.
            val_name = self.state.fresh_name("scalar_val")
            one = sub_df.select(F.col(sub_df.columns[0]).alias(val_name)).limit(1)
            self.df = self.df.join(F.broadcast(one), on=F.lit(True), how="left")
            self._subquery_cols[id(sub)] = F.col(val_name)
        else:  # exists — uncorrelated: "subquery has >= 1 row"
            flag_name = self.state.fresh_name("exists_flag")
            flag = sub_df.limit(1).select(F.lit(1).alias(flag_name))
            # left-join a 0-or-1 row frame on TRUE
            self.df = self.df.join(F.broadcast(flag), on=F.lit(True), how="left")
            self._subquery_cols[id(sub)] = F.col(flag_name).isNotNull()

    # --- layer transitions ---

    def flatten_namespaces(self) -> None:
        """pick/aggregate/union flatten joined relations away
        (reference: src/model/model.py:403-407, 881-887, 934-936)."""
        self.namespaces = {}


# --------------------------------------------------------------------------
# Source nodes
# --------------------------------------------------------------------------


class Source:
    """Immutable relational transform node (reference:
    src/model/source/source.py:7)."""

    __TYPE_KEY__ = "abstract"

    def compile(self, fs_factory, state: CompileState) -> FrameState:
        raise NotImplementedError

    def default_identifier(self) -> Optional[str]:
        return None

    def walk_sources(self):
        yield self
        for child in self.child_sources():
            yield from child.walk_sources()

    def child_sources(self) -> list:
        return []

    def expressions(self) -> List[ColumnExpression]:
        return []

    def to_wire(self) -> dict:
        return {"type": self.__TYPE_KEY__}

    @staticmethod
    def from_wire(data: dict) -> "Source":
        return _SOURCE_WIRE_REGISTRY[data["type"]]._from_wire(data)


class TableNameSource(Source):
    """Scan of a registered table (reference: src/model/source/table_name.py:6)."""

    __TYPE_KEY__ = "tableName"

    def __init__(self, table: str, schema: Optional[str] = None) -> None:
        self.table = table
        self.schema = schema

    def default_identifier(self):
        return self.table

    def compile(self, state: CompileState) -> FrameState:
        name = f"{self.schema}.{self.table}" if self.schema else self.table
        return FrameState(df=state.connection.table(name), state=state)

    def to_wire(self):
        return {**super().to_wire(), "table": self.table, "schema": self.schema}

    @classmethod
    def _from_wire(cls, data):
        return cls(data["table"], data.get("schema"))


class SqlTextSource(Source):
    """Raw SQL as a source (reference: src/model/source/sql_text.py:6).
    Trailing ``;`` and comments stripped like the reference
    (compilers/sql_text.py:41-45)."""

    __TYPE_KEY__ = "sqlText"

    def __init__(self, query: str) -> None:
        self.query = query

    def default_identifier(self):
        return None

    def compile(self, state: CompileState) -> FrameState:
        query = re.sub(r"--[^\n]*", "", self.query)
        query = query.strip().rstrip(";").strip()
        return FrameState(df=state.connection.sql(query), state=state)

    def to_wire(self):
        return {**super().to_wire(), "query": self.query}

    @classmethod
    def _from_wire(cls, data):
        return cls(data["query"])


class FilterSource(Source):
    """Row predicate (reference: src/model/source/filter.py:7). Spark needs
    no WHERE/HAVING split — a filter after groupBy().agg() is naturally a
    post-aggregation filter (compilers/filter.py:11-22)."""

    __TYPE_KEY__ = "filter"

    def __init__(self, base: Source, condition: ColumnExpression) -> None:
        self.base = base
        self.condition = condition

    def child_sources(self):
        return [self.base]

    def expressions(self):
        return [self.condition]

    def default_identifier(self):
        return self.base.default_identifier()

    def compile(self, state: CompileState) -> FrameState:
        fs = self.base.compile(state)
        ctx = fs.prepare([self.condition])
        fs.df = fs.df.filter(self.condition.compile(ctx))
        return fs

    def to_wire(self):
        return {**super().to_wire(), "base": self.base.to_wire(), "condition": self.condition.to_wire()}

    @classmethod
    def _from_wire(cls, data):
        return cls(Source.from_wire(data["base"]), ColumnExpression.from_wire(data["condition"]))


class PickSource(Source):
    """Projection (reference: src/model/source/pick.py:7). Resets namespaces."""

    __TYPE_KEY__ = "pick"

    def __init__(self, base: Source, columns: List[ColumnExpression]) -> None:
        self.base = base
        self.columns = list(columns)

    def child_sources(self):
        return [self.base]

    def expressions(self):
        return list(self.columns)

    def default_identifier(self):
        return self.base.default_identifier()

    def compile(self, state: CompileState) -> FrameState:
        fs = self.base.compile(state)
        ctx = fs.prepare(self.columns)
        cols: List[Column] = []
        for c in self.columns:
            if isinstance(c, StarExpression):
                cols.append(F.col("*"))
            else:
                cols.append(c.compile(ctx).alias(c.identifier))
        fs.df = fs.df.select(*cols)
        fs.flatten_namespaces()
        fs.sort_exprs = []
        return fs

    def to_wire(self):
        return {
            **super().to_wire(),
            "base": self.base.to_wire(),
            "columns": [c.to_wire() for c in self.columns],
        }

    @classmethod
    def _from_wire(cls, data):
        return cls(
            Source.from_wire(data["base"]),
            [ColumnExpression.from_wire(c) for c in data["columns"]],
        )


class SortSource(Source):
    """ORDER BY one expression; consecutive sorts accumulate in call order,
    matching SQLAlchemy's order_by chaining in the reference
    (compilers/sort.py:12-42). "auto" nulls = first when asc, last when desc
    — which is exactly Spark's default, but we set it explicitly.

    ``small=True`` declares the input provably tiny (e.g. a funnel's
    steps×cohorts output): sort on a single coalesced partition instead of
    a range exchange, skipping the range-partitioner's sampling job."""

    __TYPE_KEY__ = "sort"

    def __init__(
        self,
        base: Source,
        sort: ColumnExpression,
        dir: str = "asc",
        nulls: str = "auto",
        small: bool = False,
    ) -> None:
        if dir not in ("asc", "desc"):
            raise ValueError(f"Invalid sort direction: {dir}")
        if nulls not in ("auto", "first", "last"):
            raise ValueError(f"Invalid nulls ordering: {nulls}")
        self.base = base
        self.sort = sort
        self.dir = dir
        self.nulls = nulls
        self.small = small

    def child_sources(self):
        return [self.base]

    def expressions(self):
        return [self.sort]

    def default_identifier(self):
        return self.base.default_identifier()

    def compile(self, state: CompileState) -> FrameState:
        fs = self.base.compile(state)
        ctx = fs.prepare([self.sort])
        col = self.sort.compile(ctx)
        nulls = self.nulls
        if nulls == "auto":
            nulls = "first" if self.dir == "asc" else "last"
        if self.dir == "asc":
            col = col.asc_nulls_first() if nulls == "first" else col.asc_nulls_last()
        else:
            col = col.desc_nulls_first() if nulls == "first" else col.desc_nulls_last()
        fs.sort_exprs = fs.sort_exprs + [col]
        if self.small:
            fs.df = fs.df.coalesce(1).sortWithinPartitions(*fs.sort_exprs)
        else:
            fs.df = fs.df.orderBy(*fs.sort_exprs)
        return fs

    def to_wire(self):
        return {
            **super().to_wire(),
            "base": self.base.to_wire(),
            "sort": self.sort.to_wire(),
            "dir": self.dir,
            "nulls": self.nulls,
            "small": self.small,
        }

    @classmethod
    def _from_wire(cls, data):
        return cls(
            Source.from_wire(data["base"]),
            ColumnExpression.from_wire(data["sort"]),
            data["dir"],
            data["nulls"],
            data.get("small", False),
        )


class LimitSource(Source):
    """LIMIT n OFFSET m (reference: src/model/source/limit.py:6)."""

    __TYPE_KEY__ = "limit"

    def __init__(self, base: Source, limit: int, offset: int = 0) -> None:
        self.base = base
        self.limit = limit
        self.offset = offset

    def child_sources(self):
        return [self.base]

    def default_identifier(self):
        return self.base.default_identifier()

    def compile(self, state: CompileState) -> FrameState:
        fs = self.base.compile(state)
        df = fs.df
        if self.offset:
            df = df.offset(self.offset)
        fs.df = df.limit(self.limit)
        return fs

    def to_wire(self):
        return {**super().to_wire(), "base": self.base.to_wire(), "limit": self.limit, "offset": self.offset}

    @classmethod
    def _from_wire(cls, data):
        return cls(Source.from_wire(data["base"]), data["limit"], data.get("offset", 0))


class UnionSource(Source):
    """UNION ALL by column position (reference: src/model/source/union.py:6).
    ``DataFrame.union`` is positional and ALL — an exact match; Catalyst's
    CombineUnions folds consecutive unions (compilers/union.py:19-23).
    ``by_name=True`` (net-new) matches columns by NAME instead — with
    ``allow_missing`` filling absent columns with NULL — the schema-drift-
    tolerant union a multi-snapshot corpus pipeline needs."""

    __TYPE_KEY__ = "union"

    def __init__(
        self,
        base: Source,
        union_source: Source,
        by_name: bool = False,
        allow_missing: bool = False,
    ) -> None:
        self.base = base
        self.union_source = union_source
        self.by_name = by_name
        self.allow_missing = allow_missing

    def child_sources(self):
        return [self.base, self.union_source]

    def default_identifier(self):
        return self.base.default_identifier()

    def compile(self, state: CompileState) -> FrameState:
        fs = self.base.compile(state)
        other = self.union_source.compile(state)
        if self.by_name:
            fs.df = fs.df.unionByName(
                other.df, allowMissingColumns=self.allow_missing
            )
        else:
            fs.df = fs.df.union(other.df)
        fs.flatten_namespaces()
        fs.sort_exprs = []
        return fs

    def to_wire(self):
        return {
            **super().to_wire(),
            "base": self.base.to_wire(),
            "unionSource": self.union_source.to_wire(),
            "byName": self.by_name,
            "allowMissing": self.allow_missing,
        }

    @classmethod
    def _from_wire(cls, data):
        return cls(
            Source.from_wire(data["base"]),
            Source.from_wire(data["unionSource"]),
            data.get("byName", False),
            data.get("allowMissing", False),
        )


class TopKSource(Source):
    """Per-group top-k — net-new (the reference only composes global
    sort+limit, SURVEY §2.7). Compiles to a ``row_number`` window, which
    Spark executes with partial top-k pushdown per partition; the shuffle
    key is the group columns."""

    __TYPE_KEY__ = "topK"

    def __init__(
        self,
        base: Source,
        k: int,
        by: ColumnExpression,
        per: List[ColumnExpression],
        dir: str = "desc",
        rank_name: Optional[str] = None,
        tiebreak: Optional[List[ColumnExpression]] = None,
    ) -> None:
        if dir not in ("asc", "desc"):
            raise ValueError(f"Invalid direction: {dir}")
        self.base = base
        self.k = k
        self.by = by
        self.per = list(per)
        self.dir = dir
        self.rank_name = rank_name
        # ascending secondary order keys for a deterministic total order
        self.tiebreak = list(tiebreak or [])

    def child_sources(self):
        return [self.base]

    def expressions(self):
        return [self.by] + self.per + self.tiebreak

    def compile(self, state: CompileState) -> FrameState:
        from pyspark.sql import Window

        fs = self.base.compile(state)
        ctx = fs.prepare([self.by] + self.per + self.tiebreak)
        order = self.by.compile(ctx)
        order = order.desc_nulls_last() if self.dir == "desc" else order.asc_nulls_first()
        orders = [order] + [t.compile(ctx).asc() for t in self.tiebreak]
        if self.per:
            w = Window.partitionBy(*[p.compile(ctx) for p in self.per]).orderBy(*orders)
        else:
            w = Window.partitionBy().orderBy(*orders)
        rank = self.rank_name or "__rank__"
        fs.df = (
            fs.df.withColumn(rank, F.row_number().over(w))
            .where(F.col(rank) <= self.k)
        )
        if self.rank_name is None:
            fs.df = fs.df.drop(rank)
        fs.sort_exprs = []
        return fs

    def to_wire(self):
        return {
            **super().to_wire(),
            "base": self.base.to_wire(),
            "k": self.k,
            "by": self.by.to_wire(),
            "per": [p.to_wire() for p in self.per],
            "dir": self.dir,
            "rankName": self.rank_name,
            "tiebreak": [t.to_wire() for t in self.tiebreak],
        }

    @classmethod
    def _from_wire(cls, data):
        return cls(
            Source.from_wire(data["base"]),
            data["k"],
            ColumnExpression.from_wire(data["by"]),
            [ColumnExpression.from_wire(p) for p in data["per"]],
            data["dir"],
            data.get("rankName"),
            [ColumnExpression.from_wire(t) for t in data.get("tiebreak", [])],
        )


class SessionizeSource(Source):
    """Gap-based batch sessionization — net-new (the reference has no
    session concept; our streaming surface has the session_window twin).
    Adds a ``session_id`` column: per entity, a new session starts when
    the time since the previous event exceeds ``gap_seconds``. Compiles to
    lag + running count over ONE window partitioning (a single shuffle on
    the entity key); timestamps diff as double epoch seconds so
    sub-second gaps resolve identically across engines."""

    __TYPE_KEY__ = "sessionize"

    def __init__(
        self,
        base: Source,
        group: ColumnExpression,
        timestamp: ColumnExpression,
        gap_seconds: float,
        session_name: str = "session_id",
        tiebreak: Optional[List[ColumnExpression]] = None,
    ) -> None:
        self.base = base
        self.group = group
        self.timestamp = timestamp
        self.gap_seconds = float(gap_seconds)
        self.session_name = session_name
        # ascending keys after ts for a deterministic total order on ties
        self.tiebreak = list(tiebreak or [])

    def child_sources(self):
        return [self.base]

    def expressions(self):
        return [self.group, self.timestamp] + self.tiebreak

    def compile(self, state: CompileState) -> FrameState:
        from pyspark.sql import Window

        fs = self.base.compile(state)
        ctx = fs.prepare([self.group, self.timestamp] + self.tiebreak)
        g = self.group.compile(ctx)
        ts = self.timestamp.compile(ctx)
        order = [ts.asc()] + [t.compile(ctx).asc() for t in self.tiebreak]
        w = Window.partitionBy(g).orderBy(*order)
        prev = F.lag(ts).over(w)
        # TIMESTAMP_NTZ can't cast straight to DOUBLE; route through LTZ
        # (session tz is pinned UTC, so this is exact incl. microseconds).
        ts_s = ts.cast("timestamp_ltz").cast("double")
        prev_s = prev.cast("timestamp_ltz").cast("double")
        brk = F.when(
            prev.isNull() | ((ts_s - prev_s) > self.gap_seconds),
            F.lit(1),
        ).otherwise(F.lit(0))
        running = Window.partitionBy(g).orderBy(*order).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        fs.df = fs.df.withColumn(self.session_name, F.sum(brk).over(running))
        fs.sort_exprs = []
        return fs

    def to_wire(self):
        return {
            **super().to_wire(),
            "base": self.base.to_wire(),
            "group": self.group.to_wire(),
            "timestamp": self.timestamp.to_wire(),
            "gapSeconds": self.gap_seconds,
            "sessionName": self.session_name,
            "tiebreak": [t.to_wire() for t in self.tiebreak],
        }

    @classmethod
    def _from_wire(cls, data):
        return cls(
            Source.from_wire(data["base"]),
            ColumnExpression.from_wire(data["group"]),
            ColumnExpression.from_wire(data["timestamp"]),
            data["gapSeconds"],
            data.get("sessionName", "session_id"),
            [ColumnExpression.from_wire(t) for t in data.get("tiebreak", [])],
        )


class CacheSource(Source):
    """persist() the compiled frame (net-new): shared subtrees and
    iterative exploration reuse the materialization (MEMORY_AND_DISK)."""

    __TYPE_KEY__ = "cache"

    def __init__(self, base: Source) -> None:
        self.base = base

    def child_sources(self):
        return [self.base]

    def compile(self, state: CompileState) -> FrameState:
        fs = self.base.compile(state)
        fs.df = fs.df.persist()
        return fs

    def to_wire(self):
        return {**super().to_wire(), "base": self.base.to_wire()}

    @classmethod
    def _from_wire(cls, data):
        return cls(Source.from_wire(data["base"]))


class SampleSource(Source):
    """Seeded Bernoulli sampling (net-new)."""

    __TYPE_KEY__ = "sample"

    def __init__(self, base: Source, fraction: float, seed: int = 42) -> None:
        self.base = base
        self.fraction = fraction
        self.seed = seed

    def child_sources(self):
        return [self.base]

    def compile(self, state: CompileState) -> FrameState:
        fs = self.base.compile(state)
        fs.df = fs.df.sample(fraction=self.fraction, seed=self.seed)
        return fs

    def to_wire(self):
        return {**super().to_wire(), "base": self.base.to_wire(),
                "fraction": self.fraction, "seed": self.seed}

    @classmethod
    def _from_wire(cls, data):
        return cls(Source.from_wire(data["base"]), data["fraction"], data["seed"])


class RepartitionSource(Source):
    """Explicit hash/round-robin repartitioning (net-new scale control)."""

    __TYPE_KEY__ = "repartition"

    def __init__(self, base: Source, num_partitions: int, by: List[ColumnExpression]) -> None:
        self.base = base
        self.num_partitions = num_partitions
        self.by = list(by)

    def child_sources(self):
        return [self.base]

    def expressions(self):
        return list(self.by)

    def compile(self, state: CompileState) -> FrameState:
        fs = self.base.compile(state)
        if self.by:
            ctx = fs.prepare(self.by)
            fs.df = fs.df.repartition(self.num_partitions, *[b.compile(ctx) for b in self.by])
        else:
            fs.df = fs.df.repartition(self.num_partitions)
        return fs

    def to_wire(self):
        return {**super().to_wire(), "base": self.base.to_wire(),
                "numPartitions": self.num_partitions,
                "by": [b.to_wire() for b in self.by]}

    @classmethod
    def _from_wire(cls, data):
        return cls(Source.from_wire(data["base"]), data["numPartitions"],
                   [ColumnExpression.from_wire(b) for b in data["by"]])


class SetOpSource(Source):
    """INTERSECT / EXCEPT / UNION DISTINCT — net-new beyond the reference,
    which supports only UNION ALL (SURVEY.md §2.7). Positional, DISTINCT
    semantics, matching the ANSI set operators."""

    __TYPE_KEY__ = "setOp"

    def __init__(self, base: Source, other: Source, kind: str) -> None:
        if kind not in ("intersect", "except", "unionDistinct", "intersectAll", "exceptAll"):
            raise ValueError(f"unknown set op {kind!r}")
        self.base = base
        self.other = other
        self.kind = kind

    def child_sources(self):
        return [self.base, self.other]

    def default_identifier(self):
        return self.base.default_identifier()

    def compile(self, state: CompileState) -> FrameState:
        fs = self.base.compile(state)
        other = self.other.compile(state)
        if self.kind == "intersect":
            fs.df = fs.df.intersect(other.df)
        elif self.kind == "except":
            fs.df = fs.df.exceptAll(other.df).distinct()
        elif self.kind == "intersectAll":
            fs.df = fs.df.intersectAll(other.df)
        elif self.kind == "exceptAll":
            fs.df = fs.df.exceptAll(other.df)
        else:
            fs.df = fs.df.union(other.df).distinct()
        fs.flatten_namespaces()
        fs.sort_exprs = []
        return fs

    def to_wire(self):
        return {
            **super().to_wire(),
            "base": self.base.to_wire(),
            "other": self.other.to_wire(),
            "kind": self.kind,
        }

    @classmethod
    def _from_wire(cls, data):
        return cls(Source.from_wire(data["base"]), Source.from_wire(data["other"]), data["kind"])


class AggregateSource(Source):
    """GROUP BY groups, compute measures (reference:
    src/model/source/aggregate.py:7). Spark's partial aggregation
    (map-side combine) applies automatically; the shuffle is on the group
    keys only."""

    __TYPE_KEY__ = "aggregate"

    def __init__(
        self,
        base: Source,
        groups: List[ColumnExpression],
        measures: List[ColumnExpression],
        grouping_mode: str = "group",
    ) -> None:
        if grouping_mode not in ("group", "rollup", "cube"):
            raise ValueError(f"unknown grouping_mode {grouping_mode!r}")
        self.base = base
        self.groups = list(groups)
        self.measures = list(measures)
        # rollup/cube are net-new: absent from the reference (SURVEY §2.7)
        self.grouping_mode = grouping_mode

    def child_sources(self):
        return [self.base]

    def expressions(self):
        return self.groups + self.measures

    def default_identifier(self):
        return self.base.default_identifier()

    def compile(self, state: CompileState) -> FrameState:
        from .expr import PythonUdfExpression

        py_aggs = [
            m
            for m in self.measures
            if isinstance(m, PythonUdfExpression) and m.agg
        ]
        if py_aggs and len(py_aggs) != len(self.measures):
            # Spark cannot evaluate grouped-agg pandas UDFs and built-in
            # aggregate functions in the same Aggregate node
            # (INVALID_PANDAS_UDF_PLACEMENT) — surface the limit at the
            # DSL layer with a workaround instead of a deep Catalyst error
            raise ValueError(
                "python_udaf measures cannot be mixed with built-in "
                "aggregate measures in one aggregate() (Spark grouped-agg "
                "pandas UDF limitation); aggregate them separately and "
                "join on the groups"
            )
        fs = self.base.compile(state)
        ctx = fs.prepare(self.groups + self.measures)

        def group_col(g):
            # `distinct(x)` as a GROUP is the reference-documented segment
            # idiom (docs/pattern_guides/segments.md): grouping already
            # dedups, so it compiles to its argument with the inferred
            # `distinct_<base>` identifier preserved
            from .expr import SqlFunctionExpression

            if (
                isinstance(g, SqlFunctionExpression)
                and g.function == "distinct"
                and len(g.args) == 1
            ):
                return g.args[0].compile(ctx).alias(g.identifier)
            return g.compile(ctx).alias(g.identifier)

        group_cols = [group_col(g) for g in self.groups]
        measure_cols = [m.compile(ctx).alias(m.identifier) for m in self.measures]
        if measure_cols:
            if self.grouping_mode == "rollup":
                grouped = fs.df.rollup(*group_cols)
            elif self.grouping_mode == "cube":
                grouped = fs.df.cube(*group_cols)
            else:
                grouped = fs.df.groupBy(*group_cols)
            fs.df = grouped.agg(*measure_cols)
        elif group_cols:
            fs.df = fs.df.select(*group_cols).distinct()
        else:
            raise ValueError("aggregate() requires at least one group or measure")
        fs.flatten_namespaces()
        fs.sort_exprs = []
        return fs

    def to_wire(self):
        return {
            **super().to_wire(),
            "base": self.base.to_wire(),
            "groups": [g.to_wire() for g in self.groups],
            "measures": [m.to_wire() for m in self.measures],
            "groupingMode": self.grouping_mode,
        }

    @classmethod
    def _from_wire(cls, data):
        return cls(
            Source.from_wire(data["base"]),
            [ColumnExpression.from_wire(g) for g in data["groups"]],
            [ColumnExpression.from_wire(m) for m in data["measures"]],
            data.get("groupingMode", "group"),
        )


class JoinOneSource(Source):
    """Many-to-one join of a named sub-model (reference:
    src/model/source/join_one.py:8). LEFT OUTER by default, INNER when
    ``drop_unmatched=True``; the join is only emitted if the relation is
    actually referenced downstream (compilers/join_one.py:54-67) — including
    the drop_unmatched filter, which the reference also elides."""

    __TYPE_KEY__ = "joinOne"

    def __init__(
        self,
        base: Source,
        relation,  # ModelNamespace
        join_condition: ColumnExpression,
        drop_unmatched: bool = False,
        broadcast: bool = False,
    ) -> None:
        self.base = base
        self.relation = relation
        self.join_condition = join_condition
        self.drop_unmatched = drop_unmatched
        self.broadcast = broadcast

    def child_sources(self):
        return [self.base]

    def expressions(self):
        # join_condition intentionally excluded from global ns-reference
        # scans: a join must not justify itself (reference defers the ON
        # compile to finalize for the same reason)
        return []

    def default_identifier(self):
        return self.base.default_identifier()

    def compile(self, state: CompileState) -> FrameState:
        fs = self.base.compile(state)
        name = self.relation._identifier
        nested = self.relation._nested_model

        def build_df() -> DataFrame:
            return compile_model_df(nested, state)

        fs.namespaces[name] = NamespaceSlot(
            name=name,
            build_df=build_df,
            condition=self.join_condition,
            how="inner" if self.drop_unmatched else "left",
            broadcast=self.broadcast,
        )
        return fs

    def to_wire(self):
        return {
            **super().to_wire(),
            "base": self.base.to_wire(),
            "relation": self.relation.to_wire(),
            "joinCondition": self.join_condition.to_wire(),
            "dropUnmatched": self.drop_unmatched,
            "broadcast": self.broadcast,
        }

    @classmethod
    def _from_wire(cls, data):
        from .model import ModelNamespace

        return cls(
            Source.from_wire(data["base"]),
            ModelNamespace.from_wire(data["relation"]),
            ColumnExpression.from_wire(data["joinCondition"]),
            data["dropUnmatched"],
            data.get("broadcast", False),
        )


class PivotSource(Source):
    """Pivot long format to wide — the inverse of fold (net-new; the
    reference has no pivot). ``values`` must be explicit so the output
    schema is deterministic (never data-dependent): one column per pivot
    value, each holding the aggregated measure. Compiles to Spark's
    ``groupBy().pivot(col, values)`` — one shuffle, map-side partials."""

    __TYPE_KEY__ = "pivot"

    def __init__(
        self,
        base: Source,
        ids: List[ColumnExpression],
        key: ColumnExpression,
        value: ColumnExpression,
        values: List,
        agg: str = "sum",
    ) -> None:
        self.base = base
        self.ids = list(ids)
        self.key = key
        self.value = value
        self.values = list(values)
        self.agg = agg

    def child_sources(self):
        return [self.base]

    def expressions(self):
        return self.ids + [self.key, self.value]

    def compile(self, state: CompileState) -> FrameState:
        fs = self.base.compile(state)
        ctx = fs.prepare(self.ids + [self.key, self.value])
        id_cols = [c.compile(ctx).alias(c.identifier) for c in self.ids]
        key_col = self.key.compile(ctx).alias("__pivot_key__")
        val_col = self.value.compile(ctx).alias("__pivot_val__")
        projected = fs.df.select(*id_cols, key_col, val_col)
        agg_fn = getattr(F, self.agg)
        fs.df = (
            projected.groupBy(*[F.col(c.identifier) for c in self.ids])
            .pivot("__pivot_key__", self.values)
            .agg(agg_fn("__pivot_val__"))
        )
        fs.flatten_namespaces()
        fs.sort_exprs = []
        return fs

    def to_wire(self):
        return {
            **super().to_wire(),
            "base": self.base.to_wire(),
            "ids": [c.to_wire() for c in self.ids],
            "key": self.key.to_wire(),
            "value": self.value.to_wire(),
            "values": self.values,
            "agg": self.agg,
        }

    @classmethod
    def _from_wire(cls, data):
        return cls(
            Source.from_wire(data["base"]),
            [ColumnExpression.from_wire(c) for c in data["ids"]],
            ColumnExpression.from_wire(data["key"]),
            ColumnExpression.from_wire(data["value"]),
            data["values"],
            data.get("agg", "sum"),
        )


class FoldSource(Source):
    """Unpivot/melt N value columns into (key, value) long format.

    The reference composes this from pick × N -> union_all
    (reference: src/model/model.py:939-995); Spark has a native ``unpivot``
    which reads the input ONCE instead of N times — the semantic spec is the
    union chain, the physical plan is the single-scan unpivot."""

    __TYPE_KEY__ = "fold"

    def __init__(
        self,
        base: Source,
        ids: List[ColumnExpression],
        values: List[ColumnExpression],
        key_name: str = "key",
        value_name: str = "value",
    ) -> None:
        self.base = base
        self.ids = list(ids)
        self.values = list(values)
        self.key_name = key_name
        self.value_name = value_name

    def child_sources(self):
        return [self.base]

    def expressions(self):
        return self.ids + self.values

    def compile(self, state: CompileState) -> FrameState:
        fs = self.base.compile(state)
        ctx = fs.prepare(self.ids + self.values)
        id_names = [i.identifier for i in self.ids]
        value_names = [v.identifier for v in self.values]
        pre = fs.df.select(
            *[i.compile(ctx).alias(i.identifier) for i in self.ids],
            *[v.compile(ctx).alias(v.identifier) for v in self.values],
        )
        fs.df = pre.unpivot(id_names, value_names, self.key_name, self.value_name)
        fs.flatten_namespaces()
        fs.sort_exprs = []
        return fs

    def to_wire(self):
        return {
            **super().to_wire(),
            "base": self.base.to_wire(),
            "ids": [i.to_wire() for i in self.ids],
            "values": [v.to_wire() for v in self.values],
            "keyName": self.key_name,
            "valueName": self.value_name,
        }

    @classmethod
    def _from_wire(cls, data):
        return cls(
            Source.from_wire(data["base"]),
            [ColumnExpression.from_wire(i) for i in data["ids"]],
            [ColumnExpression.from_wire(v) for v in data["values"]],
            data["keyName"],
            data["valueName"],
        )


class PandasMapSource(Source):
    """Arrow-batched Python transform of the frame: ``mapInPandas`` over
    the whole frame (fn: iterator[pd.DataFrame] -> iterator[pd.DataFrame])
    or ``applyInPandas`` per group (fn: pd.DataFrame -> pd.DataFrame)
    when group expressions are given (net-new escape hatch; the
    reference's only escape hatch is raw SQL text, SURVEY.md §2.7).

    Local-only — Python callables have no wire format (same contract as
    PythonUdfExpression). Scale: mapInPandas is a narrow stage (Arrow
    batches stream through Python, no shuffle); applyInPandas shuffles
    once on the group keys and each group must fit in one task's memory.
    """

    __TYPE_KEY__ = "pandasMap"

    def __init__(self, base: Source, fn, schema: str, groups=None) -> None:
        self.base = base
        self.fn = fn
        self.schema = schema
        self.groups = list(groups or [])

    def child_sources(self):
        return [self.base]

    def expressions(self):
        return list(self.groups)

    def default_identifier(self):
        return self.base.default_identifier()

    def compile(self, state: CompileState) -> FrameState:
        fs = self.base.compile(state)
        if self.groups:
            ctx = fs.prepare(self.groups)
            cols = [g.compile(ctx) for g in self.groups]
            fs.df = fs.df.groupBy(*cols).applyInPandas(self.fn, schema=self.schema)
        else:
            fs.df = fs.df.mapInPandas(self.fn, schema=self.schema)
        # brand-new schema: joined relations / pending sorts don't survive
        fs.namespaces = {}
        fs.sort_exprs = []
        return fs

    def to_wire(self):
        raise NotImplementedError(
            "pandas-transform sources are local-only and cannot be serialized"
        )


class ExplodeSource(Source):
    """Lateral array expansion: one row per element of an array-valued
    expression, keeping all existing columns (net-new; the reference has
    no array-producing functions so nothing to explode — ours has
    func.split). Physical plan is a Generate inside whole-stage codegen —
    a narrow row multiplication, no shuffle. ``outer=True`` keeps rows
    whose array is NULL/empty (element reads NULL), mirroring
    LEFT JOIN LATERAL semantics."""

    __TYPE_KEY__ = "explode"

    def __init__(
        self,
        base: Source,
        expr: ColumnExpression,
        name: str,
        outer: bool = False,
    ) -> None:
        self.base = base
        self.expr = expr
        self.name = name
        self.outer = outer

    def child_sources(self):
        return [self.base]

    def expressions(self):
        return [self.expr]

    def default_identifier(self):
        return self.base.default_identifier()

    def compile(self, state: CompileState) -> FrameState:
        fs = self.base.compile(state)
        ctx = fs.prepare([self.expr])
        col = self.expr.compile(ctx)
        gen = F.explode_outer(col) if self.outer else F.explode(col)
        fs.df = fs.df.withColumn(self.name, gen)
        return fs

    def to_wire(self):
        return {
            **super().to_wire(),
            "base": self.base.to_wire(),
            "expr": self.expr.to_wire(),
            "name": self.name,
            "outer": self.outer,
        }

    @classmethod
    def _from_wire(cls, data):
        return cls(
            Source.from_wire(data["base"]),
            ColumnExpression.from_wire(data["expr"]),
            data["name"],
            data.get("outer", False),
        )


# --------------------------------------------------------------------------
# Entry points
# --------------------------------------------------------------------------


def compile_model_df(model, state: CompileState) -> DataFrame:
    """Compile a Model's source tree into a lazy DataFrame (no execution)."""
    fs = model._source.compile(state)
    return fs.df


def strip_private_columns(df: DataFrame) -> DataFrame:
    """Drop ``__dunder__`` internal columns from the final output
    (reference: src/run/execute/post_process.py:8-17)."""
    keep = [c for c in df.columns if not RESERVED_NAME_RE.match(c) and not c.startswith(NS_SEP)]
    if len(keep) != len(df.columns):
        return df.select(*keep)
    return df


_SOURCE_WIRE_REGISTRY: Dict[str, type] = {}


def _register_wire(*classes):
    for cls in classes:
        _SOURCE_WIRE_REGISTRY[cls.__TYPE_KEY__] = cls


_register_wire(
    ExplodeSource,
    CacheSource,
    SampleSource,
    RepartitionSource,
    TopKSource,
    SessionizeSource,
    PivotSource,
    SetOpSource,
    TableNameSource,
    SqlTextSource,
    FilterSource,
    PickSource,
    SortSource,
    LimitSource,
    UnionSource,
    AggregateSource,
    JoinOneSource,
    FoldSource,
)


class FrameOpSource(Source):
    """Apply an arbitrary DataFrame -> DataFrame operator (anything in
    ``hashquery_spark.ops``) as a source step — the glue that lets the
    operator library chain inside the Model DSL (``Model.pipe``).

    Local-only: Python callables have no wire format (same contract as
    PandasMapSource). The op sees the fully-compiled upstream frame;
    whatever plan it builds is planned by Catalyst like any other — no
    materialization boundary is introduced here."""

    __TYPE_KEY__ = "frameOp"

    def __init__(self, base: Source, fn, label: str = "op") -> None:
        self.base = base
        self.fn = fn
        self.label = label

    def child_sources(self):
        return [self.base]

    def default_identifier(self):
        return self.base.default_identifier()

    def compile(self, state: CompileState) -> FrameState:
        fs = self.base.compile(state)
        fs.df = self.fn(fs.df)
        # brand-new schema: joined relations / pending sorts don't survive
        fs.namespaces = {}
        fs.sort_exprs = []
        return fs

    def to_wire(self):
        raise NotImplementedError(
            f"frame-op sources ({self.label}) are local-only and cannot be serialized"
        )
