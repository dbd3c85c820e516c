"""The ``func`` namespace: aggregate / scalar / boolean function builders.

Mirrors the reference's public surface (reference:
src/model/func/__init__.py:1-38, builders in src/model/func/_sql_functions.py,
_logical.py, _cases.py, _temporal.py). Every builder returns a
ColumnExpression node; compilation to pyspark Columns lives in expr.py.
"""

from __future__ import annotations

from typing import Any, Optional

from .keypath import defer_keypath_args
from .expr import (
    CasesExpression,
    ColumnExpression,
    SqlFunctionExpression,
    SubqueryExpression,
    to_expr,
)


@defer_keypath_args
def count(expr: Optional[Any] = None) -> SqlFunctionExpression:
    """COUNT(*) or COUNT(expr) (reference: _sql_functions.py:16-21)."""
    args = [] if expr is None else [expr]
    return SqlFunctionExpression("count", args)


@defer_keypath_args
def count_if(condition: Any) -> SqlFunctionExpression:
    """Sugar for SUM(CASE WHEN cond THEN 1 ELSE 0 END)
    (reference: _sql_functions.py:25-30)."""
    return SqlFunctionExpression("countIf", [condition])


@defer_keypath_args
def distinct(expr: Any) -> SqlFunctionExpression:
    """DISTINCT(expr) — compose as ``count(distinct(x))``
    (reference: _sql_functions.py:34-38)."""
    return SqlFunctionExpression("distinct", [expr])


@defer_keypath_args
def min(expr: Any) -> SqlFunctionExpression:  # noqa: A001 - mirrors reference
    return SqlFunctionExpression("min", [expr])


@defer_keypath_args
def max(expr: Any) -> SqlFunctionExpression:  # noqa: A001
    return SqlFunctionExpression("max", [expr])


@defer_keypath_args
def sum(expr: Any) -> SqlFunctionExpression:  # noqa: A001
    return SqlFunctionExpression("sum", [expr])


@defer_keypath_args
def avg(expr: Any) -> SqlFunctionExpression:
    return SqlFunctionExpression("avg", [expr])


@defer_keypath_args
def floor(expr: Any) -> SqlFunctionExpression:
    return SqlFunctionExpression("floor", [expr])


@defer_keypath_args
def ceiling(expr: Any) -> SqlFunctionExpression:
    return SqlFunctionExpression("ceiling", [expr])


def now() -> SqlFunctionExpression:
    """Materialized to a Python ``datetime.now()`` literal at compile time,
    not engine-evaluated (reference: _sql_functions.py:89-95,
    compilers/sql_function.py:47-53)."""
    return SqlFunctionExpression("now", [])


@defer_keypath_args
def exists(model) -> SubqueryExpression:
    """EXISTS(subquery) (reference: _sql_functions.py:99-103).

    Compiled Spark-side as a broadcast-joined boolean marker."""
    return SubqueryExpression("exists", model)


@defer_keypath_args
def and_(*conditions: Any) -> ColumnExpression:
    """Variadic AND (reference: _logical.py:8-28)."""
    if not conditions:
        raise ValueError("and_() requires at least one condition")
    return SqlFunctionExpression("and", list(conditions))


@defer_keypath_args
def or_(*conditions: Any) -> ColumnExpression:
    if not conditions:
        raise ValueError("or_() requires at least one condition")
    return SqlFunctionExpression("or", list(conditions))


@defer_keypath_args
def not_(condition: Any) -> ColumnExpression:
    """NOT, with the reference's comparison-flip rewrite
    (``not_(a < b)`` -> ``a >= b``, compilers/sql_function.py:116-136)."""
    return SqlFunctionExpression("not", [condition])


@defer_keypath_args
def cases(*cases: tuple, other: Any = None) -> CasesExpression:
    """CASE WHEN chain; non-expression values are coerced to literals;
    ``other`` defaults to NULL (reference: _cases.py:12-38)."""
    return CasesExpression(list(cases), other)


@defer_keypath_args
def approx_distinct(expr: Any, rsd: float = 0.05) -> SqlFunctionExpression:
    """HyperLogLog++ approximate count-distinct (net-new sketch; maps to
    Spark's approx_count_distinct). Constant memory per group at any
    cardinality — the scale path when exact count(distinct(x)) would
    shuffle every distinct value."""
    node = SqlFunctionExpression("approxDistinct", [expr])
    node.rsd = rsd
    return node


@defer_keypath_args
def percentile(expr: Any, p: float) -> SqlFunctionExpression:
    """Exact linear-interpolated percentile (net-new; maps to Spark's
    ``percentile``, equals ANSI PERCENTILE_CONT / DuckDB quantile_cont)."""
    node = SqlFunctionExpression("percentile", [expr])
    node.percentile_p = p
    return node


@defer_keypath_args
def diff_seconds(ts1: Any, ts2: Any) -> SqlFunctionExpression:
    """Whole seconds between two timestamps: ts1 - ts2
    (reference: _temporal.py:6-10)."""
    return SqlFunctionExpression("diffSeconds", [ts1, ts2])


@defer_keypath_args
def python_udf(fn, returns: str, *args, vectorized: bool = True):
    """User Python function as an expression (net-new; SURVEY.md §2.7 —
    the reference's only escape hatch is raw SQL text).

    ``vectorized=True`` (default) compiles to an Arrow-batched pandas_udf:
    ``fn`` receives and returns ``pandas.Series``. Set ``vectorized=False``
    for row-at-a-time functions (slow path; avoid in hot loops)."""
    from .expr import PythonUdfExpression

    return PythonUdfExpression(fn, returns, list(args), vectorized=vectorized)


@defer_keypath_args
def python_udaf(fn, returns: str, *args):
    """User Python aggregate function (net-new): ``fn`` receives one
    ``pandas.Series`` per argument holding the GROUP's values and returns
    a single scalar; usable anywhere a measure is (``aggregate(measures=
    [func.python_udaf(gini, "double", attr.price).named("gini")])``).

    Compiles to a grouped-agg pandas UDF (Arrow batch per group). No
    partial aggregation/merge exists for custom UDAFs — each group's
    values are collected to one task, so keep groups bounded (use the
    built-in decomposable aggregates for global/extreme-cardinality
    rollups). Spark cannot mix grouped-agg pandas UDFs with built-in
    aggregates in one Aggregate node; ``aggregate()`` raises eagerly on
    the mix — compute them in separate aggregates and join on the
    groups."""
    from .expr import PythonUdfExpression

    return PythonUdfExpression(fn, returns, list(args), agg=True)


@defer_keypath_args
def scalar(model) -> SubqueryExpression:
    """A Model as a scalar value (one row, one column) usable anywhere an
    expression is: comparisons, arithmetic, filters. The reference declares
    Model operands on binary ops but its as_scalar_column_expression is
    missing (latent bug, reference: column_expression.py:637-638); here it
    compiles to a broadcast one-row cross join."""
    return SubqueryExpression("scalar", model)


# --- scalar conveniences (net-new; the reference has no general string/
# math function library — SURVEY §2.7 — and routes these through raw
# column(sql=...) text) ---


@defer_keypath_args
def abs(expr: Any) -> SqlFunctionExpression:  # noqa: A001 - mirrors builtins like min/max
    return SqlFunctionExpression("abs", [expr])


@defer_keypath_args
def sqrt(expr: Any) -> SqlFunctionExpression:
    return SqlFunctionExpression("sqrt", [expr])


@defer_keypath_args
def round(expr: Any, scale: int = 0) -> SqlFunctionExpression:  # noqa: A001
    node = SqlFunctionExpression("round", [expr])
    node.round_scale = int(scale)
    return node


@defer_keypath_args
def length(expr: Any) -> SqlFunctionExpression:
    return SqlFunctionExpression("length", [expr])


@defer_keypath_args
def lower(expr: Any) -> SqlFunctionExpression:
    return SqlFunctionExpression("lower", [expr])


@defer_keypath_args
def upper(expr: Any) -> SqlFunctionExpression:
    return SqlFunctionExpression("upper", [expr])


@defer_keypath_args
def trim(expr: Any) -> SqlFunctionExpression:
    return SqlFunctionExpression("trim", [expr])


@defer_keypath_args
def concat(*exprs: Any) -> SqlFunctionExpression:
    return SqlFunctionExpression("concat", list(exprs))


@defer_keypath_args
def coalesce(*exprs: Any) -> SqlFunctionExpression:
    return SqlFunctionExpression("coalesce", list(exprs))


# --- window functions (net-new; the reference has no window surface,
# SURVEY §2.6 — windows there are internal to its match_steps compiler) ---


@defer_keypath_args
def row_number(*, partition=None, order=None) -> "ColumnExpression":
    """1-based row index within each partition, in ``order``. Use in
    ``pick()`` projections: ``Model.pick(attr.x, func.row_number(
    partition=[attr.grp], order=[(attr.ts, "desc")]).named("rn"))``."""
    from .expr import WindowExpression

    return WindowExpression("row_number", [], partition, order)


@defer_keypath_args
def rank(*, partition=None, order=None) -> "ColumnExpression":
    """SQL RANK() (gaps after ties) within each partition."""
    from .expr import WindowExpression

    return WindowExpression("rank", [], partition, order)


@defer_keypath_args
def dense_rank(*, partition=None, order=None) -> "ColumnExpression":
    """SQL DENSE_RANK() (no gaps) within each partition."""
    from .expr import WindowExpression

    return WindowExpression("dense_rank", [], partition, order)


@defer_keypath_args
def percent_rank(*, partition=None, order=None) -> "ColumnExpression":
    """SQL PERCENT_RANK(): (rank − 1) / (partition rows − 1) — relative
    standing in [0, 1]; deterministic under ties (peers share a value)."""
    from .expr import WindowExpression

    return WindowExpression("percent_rank", [], partition, order)


@defer_keypath_args
def cume_dist(*, partition=None, order=None) -> "ColumnExpression":
    """SQL CUME_DIST(): fraction of partition rows ordered at-or-before
    the current row (peers inclusive) — the empirical CDF value."""
    from .expr import WindowExpression

    return WindowExpression("cume_dist", [], partition, order)


@defer_keypath_args
def ntile(n: int, *, partition=None, order=None) -> "ColumnExpression":
    """Bucket each partition's rows into ``n`` equal-count tiles (1-based)
    in ``order`` — quartiles/deciles per group."""
    from .expr import WindowExpression

    return WindowExpression("ntile", [], partition, order, offset=int(n))


@defer_keypath_args
def first_value(expr: Any, *, partition=None, order=None) -> "ColumnExpression":
    """First value of ``expr`` in the partition's order (whole-partition
    frame, so every row sees it)."""
    from .expr import WindowExpression

    return WindowExpression("first_value", [expr], partition, order)


@defer_keypath_args
def nth_value(expr: Any, n: int, *, partition=None, order=None) -> "ColumnExpression":
    """SQL NTH_VALUE(expr, n): the n-th value (1-based) in the
    partition's order, whole-partition framed like first/last_value
    (NULL when the partition has fewer than ``n`` rows)."""
    from .expr import WindowExpression

    return WindowExpression("nth_value", [expr], partition, order, offset=int(n))


@defer_keypath_args
def last_value(expr: Any, *, partition=None, order=None) -> "ColumnExpression":
    """Last value of ``expr`` in the partition's order. Framed to the
    WHOLE partition (not SQL's default current-row frame, the classic
    last_value trap)."""
    from .expr import WindowExpression

    return WindowExpression("last_value", [expr], partition, order)


@defer_keypath_args
def lag(expr: Any, offset: int = 1, default: Any = None, *, partition=None, order=None):
    """Value of ``expr`` ``offset`` rows earlier in the partition's order
    (NULL / ``default`` at the head)."""
    from .expr import WindowExpression

    return WindowExpression("lag", [expr], partition, order, offset=offset, default=default)


@defer_keypath_args
def lead(expr: Any, offset: int = 1, default: Any = None, *, partition=None, order=None):
    """Value of ``expr`` ``offset`` rows later in the partition's order."""
    from .expr import WindowExpression

    return WindowExpression("lead", [expr], partition, order, offset=offset, default=default)


@defer_keypath_args
def over(agg: Any, *, partition=None, order=None, frame=None) -> "ColumnExpression":
    """Window an aggregate builder: ``func.over(func.sum(attr.x),
    partition=[attr.grp], order=[attr.ts])`` is a per-group running total.
    With ``order`` and no ``frame``, the frame defaults to ROWS
    unbounded-preceding..current-row; ``frame=(lo, hi)`` sets explicit row
    offsets with None = unbounded (e.g. ``frame=(-6, 0)`` = trailing 7)."""
    from .expr import WindowExpression

    if not isinstance(agg, SqlFunctionExpression) or agg.function not in (
        "sum", "avg", "min", "max", "count",
    ):
        raise ValueError(
            "func.over() windows an aggregate builder: func.sum/avg/min/max/count"
        )
    return WindowExpression(agg.function, agg.args, partition, order, frame=frame)


@defer_keypath_args
def json_value(expr: Any, path: str) -> SqlFunctionExpression:
    """Extract a JSONPath value from a JSON string column as a string
    (net-new; compiles to get_json_object). Cast the result for typed use:
    ``func.json_value(attr.props, "$.k").cast("long")``."""
    node = SqlFunctionExpression("jsonValue", [expr])
    node.json_path = path
    return node


# --- net-new scalar string/math batch (the reference routes ALL of these
# through raw column(sql=...) text — SURVEY §2.7 "no general string
# function library"; here they are first-class, typed, wire-serializable) ---


@defer_keypath_args
def exp(expr: Any) -> SqlFunctionExpression:
    return SqlFunctionExpression("exp", [expr])


@defer_keypath_args
def ln(expr: Any) -> SqlFunctionExpression:
    return SqlFunctionExpression("ln", [expr])


@defer_keypath_args
def log2(expr: Any) -> SqlFunctionExpression:
    return SqlFunctionExpression("log2", [expr])


@defer_keypath_args
def log10(expr: Any) -> SqlFunctionExpression:
    return SqlFunctionExpression("log10", [expr])


@defer_keypath_args
def sign(expr: Any) -> SqlFunctionExpression:
    return SqlFunctionExpression("sign", [expr])


@defer_keypath_args
def reverse(expr: Any) -> SqlFunctionExpression:
    return SqlFunctionExpression("reverse", [expr])


@defer_keypath_args
def initcap(expr: Any) -> SqlFunctionExpression:
    return SqlFunctionExpression("initcap", [expr])


@defer_keypath_args
def ltrim(expr: Any) -> SqlFunctionExpression:
    return SqlFunctionExpression("ltrim", [expr])


@defer_keypath_args
def rtrim(expr: Any) -> SqlFunctionExpression:
    return SqlFunctionExpression("rtrim", [expr])


@defer_keypath_args
def md5(expr: Any) -> SqlFunctionExpression:
    return SqlFunctionExpression("md5", [expr])


@defer_keypath_args
def pow(expr: Any, exponent: Any) -> SqlFunctionExpression:  # noqa: A001
    return SqlFunctionExpression("pow", [expr, exponent])


@defer_keypath_args
def mod(expr: Any, divisor: Any) -> SqlFunctionExpression:
    """Remainder with the sign of the dividend (Spark ``%``; identical to
    DuckDB ``%``/``mod``)."""
    return SqlFunctionExpression("mod", [expr, divisor])


@defer_keypath_args
def greatest(*exprs: Any) -> SqlFunctionExpression:
    """Largest non-NULL argument (NULL only if all are NULL) — the
    null-skipping semantics Spark and DuckDB share."""
    return SqlFunctionExpression("greatest", list(exprs))


@defer_keypath_args
def least(*exprs: Any) -> SqlFunctionExpression:
    return SqlFunctionExpression("least", list(exprs))


@defer_keypath_args
def nullif(expr: Any, match: Any) -> SqlFunctionExpression:
    """ANSI NULLIF: NULL when the two are equal, else the first value."""
    return SqlFunctionExpression("nullif", [expr, match])


@defer_keypath_args
def substring(expr: Any, pos: Any, length: Any) -> SqlFunctionExpression:
    """1-based substring; pos/length may be expressions."""
    return SqlFunctionExpression("substring", [expr, pos, length])


@defer_keypath_args
def replace(expr: Any, search: Any, replacement: Any) -> SqlFunctionExpression:
    """Literal (non-regex) substring replacement."""
    return SqlFunctionExpression("replace", [expr, search, replacement])


@defer_keypath_args
def instr(expr: Any, substr: Any) -> SqlFunctionExpression:
    """1-based position of the first occurrence; 0 when absent."""
    return SqlFunctionExpression("instr", [expr, substr])


@defer_keypath_args
def levenshtein(a: Any, b: Any) -> SqlFunctionExpression:
    """Edit distance between two strings (net-new; Spark and DuckDB agree
    on plain Levenshtein semantics)."""
    return SqlFunctionExpression("levenshtein", [a, b])


@defer_keypath_args
def lpad(expr: Any, width: int, pad: str = " ") -> SqlFunctionExpression:
    node = SqlFunctionExpression("lpad", [expr])
    node.pad_len, node.pad_str = int(width), str(pad)
    return node


@defer_keypath_args
def rpad(expr: Any, width: int, pad: str = " ") -> SqlFunctionExpression:
    node = SqlFunctionExpression("rpad", [expr])
    node.pad_len, node.pad_str = int(width), str(pad)
    return node


@defer_keypath_args
def repeat(expr: Any, n: int) -> SqlFunctionExpression:
    node = SqlFunctionExpression("repeat", [expr])
    node.repeat_n = int(n)
    return node


@defer_keypath_args
def regexp_extract(expr: Any, pattern: str, group: int = 1) -> SqlFunctionExpression:
    """First match of ``pattern``, returning capture ``group`` ('' when no
    match). Keep patterns RE2-compatible (no backrefs/lookaround) so they
    run identically on Spark (Java regex) and DuckDB (RE2) — the same
    portability rule as ops/text.redact_pii."""
    node = SqlFunctionExpression("regexpExtract", [expr])
    node.regex_pattern, node.regex_group = str(pattern), int(group)
    return node


@defer_keypath_args
def regexp_replace(expr: Any, pattern: str, replacement: str) -> SqlFunctionExpression:
    """Replace ALL matches of ``pattern`` (RE2-compatible patterns only —
    see :func:`regexp_extract`)."""
    node = SqlFunctionExpression("regexpReplace", [expr])
    node.regex_pattern, node.regex_repl = str(pattern), str(replacement)
    return node


@defer_keypath_args
def split(expr: Any, pattern: str) -> SqlFunctionExpression:
    """Split into an array<string> on a regex pattern."""
    node = SqlFunctionExpression("split", [expr])
    node.regex_pattern = str(pattern)
    return node


@defer_keypath_args
def stddev(expr: Any) -> SqlFunctionExpression:
    """Sample standard deviation (net-new; maps to Spark stddev_samp).
    Double accumulation is merge-order-dependent — for cross-engine-exact
    results route moments through DECIMAL sums (the zscore_outliers /
    standardize pattern) or round the output."""
    return SqlFunctionExpression("stddev", [expr])


@defer_keypath_args
def variance(expr: Any) -> SqlFunctionExpression:
    """Sample variance (net-new; maps to Spark var_samp)."""
    return SqlFunctionExpression("variance", [expr])


@defer_keypath_args
def corr(x: Any, y: Any) -> SqlFunctionExpression:
    """Pearson correlation (net-new; maps to Spark corr)."""
    return SqlFunctionExpression("corr", [x, y])


@defer_keypath_args
def covar(x: Any, y: Any) -> SqlFunctionExpression:
    """Sample covariance (net-new; maps to Spark covar_samp)."""
    return SqlFunctionExpression("covar", [x, y])


@defer_keypath_args
def median(expr: Any) -> SqlFunctionExpression:
    """Exact interpolated median — sugar for percentile(expr, 0.5)."""
    node = SqlFunctionExpression("percentile", [expr])
    node.percentile_p = 0.5
    return node


@defer_keypath_args
def any_value(expr: Any) -> SqlFunctionExpression:
    """An arbitrary (first-seen, non-deterministic across partitionings)
    value per group — the cheap representative-picker."""
    return SqlFunctionExpression("anyValue", [expr])
