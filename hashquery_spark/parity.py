"""Driver-gate replica: the exact comparison the round driver applies to
``__spark_entry__.queries()`` vs ``oracle_sql()`` (row count, column
names, dtype kinds, order-insensitive exact value canon), exposed as a
library so the parity suite, the pre-audit script, and ad-hoc checks all
share ONE implementation — a gate that drifts from the driver's is how
red rows sneak in.

Canonicalization notes (all measured failure modes):

* floats compare by ``repr`` (shortest round-trip) — EXACT; a 6-sig-fig
  canon hid the sql_text_binding divergence for a whole round.
* NaN/None/NaT all canon to the same null token: both engines arrive
  through pandas/Arrow so null rendering is symmetric.
* dtype KINDS must match (int-width differences allowed) — catches
  DuckDB HUGEINT→float64 Arrow degradation structurally even when the
  degraded values would still compare equal.
* DuckDB renders DATE as midnight Timestamp via ``.df()``; both canon to
  the bare date string.
"""

from __future__ import annotations

import math
import os
from typing import Any, Dict, List

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str):
    """DuckDB connection with every testdata table registered as a view
    (the driver's oracle-side setup)."""
    import duckdb

    con = duckdb.connect()
    # spill outside the repo (in-memory DuckDB defaults to cwd/.tmp)
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def canon_value(value) -> str:
    if value is None:
        return "∅"
    if isinstance(value, float):
        if math.isnan(value):
            return "∅"
        return repr(value)
    if isinstance(value, (list, tuple)) or type(value).__name__ == "ndarray":
        return "[" + ",".join(canon_value(v) for v in value) + "]"
    if hasattr(value, "isoformat"):
        iso = value.isoformat().replace("+00:00", "")
        if "." in iso:
            iso = iso.rstrip("0").rstrip(".")
        if iso.endswith("T00:00:00"):
            iso = iso[: -len("T00:00:00")]
        return iso
    return str(value)


def canon_rows(columns: List[str], rows) -> List[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(canon_value(r[i]) for i in order) for r in rows)


def pdf_cells(pdf) -> List[tuple]:
    """Rows as python objects from a pandas frame (NaT→None via canon)."""
    import pandas as pd

    out = []
    for row in pdf.itertuples(index=False, name=None):
        out.append(
            tuple(
                None
                if v is pd.NaT
                else (
                    v.item()
                    if type(v).__module__ == "numpy" and getattr(v, "ndim", 1) == 0
                    else v
                )
                for v in row
            )
        )
    return out


def dtype_kinds_ok(spark_pdf, duck_pdf) -> List[str]:
    """Columns whose dtype KINDS structurally disagree (HUGEINT class)."""
    bad = []
    for c in spark_pdf.columns:
        sk, dk = spark_pdf[c].dtype.kind, duck_pdf[c].dtype.kind
        if "O" in (sk, dk) or len(spark_pdf) == 0:
            continue
        if not ((sk == dk) or ({sk, dk} <= {"i", "u"}) or ({sk, dk} <= {"M", "m"})):
            bad.append(f"{c}: spark={spark_pdf[c].dtype} duck={duck_pdf[c].dtype}")
    return bad


def compare_frames(spark_pdf, duck_pdf) -> Dict[str, Any]:
    """The full driver gate. Returns per-check booleans plus diagnostics;
    ``ok`` is the conjunction the driver would record as a green row."""
    spark_cols = list(spark_pdf.columns)
    duck_cols = list(duck_pdf.columns)
    res: Dict[str, Any] = {
        "spark_rows": len(spark_pdf),
        "oracle_rows": len(duck_pdf),
        "rows_match": len(spark_pdf) == len(duck_pdf),
        "schema_match": sorted(spark_cols) == sorted(duck_cols),
    }
    if not res["schema_match"]:
        res.update(hash_match=False, dtype_kinds=[], first_mismatches=[],
                   ok=False)
        return res
    res["dtype_kinds"] = dtype_kinds_ok(spark_pdf, duck_pdf)
    sc = canon_rows(spark_cols, pdf_cells(spark_pdf))
    dc = canon_rows(duck_cols, pdf_cells(duck_pdf))
    mismatches = [(a, b) for a, b in zip(sc, dc) if a != b]
    res["hash_match"] = res["rows_match"] and not mismatches
    res["first_mismatches"] = mismatches[:3]
    res["ok"] = (
        res["rows_match"]
        and res["schema_match"]
        and res["hash_match"]
        and not res["dtype_kinds"]
    )
    return res


def compare_frames_tolerant(spark_pdf, twin_pdf, atol: float) -> Dict[str, Any]:
    """Twin gate with a declared float tolerance: rows align on the
    non-float columns (exact canon), floats compare by |Δ| <= atol —
    for the documented engine-float twins (Java Math.exp vs C libm
    class) where the exact repr canon would be flaky by construction."""
    res: Dict[str, Any] = {
        "spark_rows": len(spark_pdf),
        "oracle_rows": len(twin_pdf),
        "rows_match": len(spark_pdf) == len(twin_pdf),
        "schema_match": sorted(spark_pdf.columns) == sorted(twin_pdf.columns),
    }
    if not (res["schema_match"] and res["rows_match"]):
        res.update(hash_match=False, dtype_kinds=[], first_mismatches=[], ok=False)
        return res
    res["dtype_kinds"] = dtype_kinds_ok(spark_pdf, twin_pdf)
    cols = sorted(spark_pdf.columns)
    float_cols = {
        c for c in cols
        if spark_pdf[c].dtype.kind == "f" or twin_pdf[c].dtype.kind == "f"
    }
    key_cols = [c for c in cols if c not in float_cols]

    def keyed(pdf):
        cells = pdf_cells(pdf[cols])
        idx = {c: i for i, c in enumerate(cols)}
        return sorted(
            cells, key=lambda r: tuple(canon_value(r[idx[c]]) for c in key_cols)
        )

    sc, tc = keyed(spark_pdf), keyed(twin_pdf)
    # rows are paired by sorting on the NON-float columns; two rows with
    # an identical key tuple would pair their float values arbitrarily
    # across engines (order-dependent false results — r4 advice). Fail
    # loudly: a tolerant-compared query must emit a unique key per row.
    idx = {c: i for i, c in enumerate(cols)}
    for label, rows in (("spark", sc), ("twin", tc)):
        keys = [tuple(canon_value(r[idx[c]]) for c in key_cols) for r in rows]
        if len(keys) != len(set(keys)):
            dup = next(k for k in keys if keys.count(k) > 1)
            raise AssertionError(
                f"compare_frames_tolerant: duplicate non-float key tuple in "
                f"{label} result ({dup!r} over key cols {key_cols}); float "
                "pairing would be order-dependent — add a distinguishing "
                "key column to the query."
            )
    mismatches = []
    for a, b in zip(sc, tc):
        for i, c in enumerate(cols):
            if c in float_cols:
                va, vb = a[i], b[i]
                na = va is None or (isinstance(va, float) and math.isnan(va))
                nb = vb is None or (isinstance(vb, float) and math.isnan(vb))
                if na != nb or (not na and abs(va - vb) > atol):
                    mismatches.append((c, va, vb))
            elif canon_value(a[i]) != canon_value(b[i]):
                mismatches.append((c, a[i], b[i]))
    res["hash_match"] = not mismatches
    res["first_mismatches"] = mismatches[:3]
    res["ok"] = res["hash_match"] and not res["dtype_kinds"]
    return res


def audit_query(spark, sf_dir: str, name: str, queries=None, oracles=None,
                con=None) -> Dict[str, Any]:
    """Run one queries() entry through the driver gate at ``sf_dir``.
    Rows-only entries check against their python-reference twin
    (py_twins.PY_TWINS) when one exists — "rows-only" never means
    "runs but unchecked"; entries with neither report ``paired=False,
    twinned=False``."""
    import __spark_entry__ as entry_mod

    queries = queries or entry_mod.queries()
    oracles = oracles or entry_mod.oracle_sql()
    spark_pdf = queries[name](spark, sf_dir).toPandas()
    if name not in oracles:
        from .py_twins import PY_TWINS

        if name in PY_TWINS:
            fn, opts = PY_TWINS[name]
            con = con or duck_connection(sf_dir)
            twin_pdf = fn(con)
            drop = [c for c in opts.get("drop_cols", ())]
            sp = spark_pdf.drop(columns=[c for c in drop if c in spark_pdf.columns])
            tw = twin_pdf.drop(columns=[c for c in drop if c in twin_pdf.columns])
            atol = opts.get("float_atol")
            res = (
                compare_frames(sp, tw)
                if atol is None
                else compare_frames_tolerant(sp, tw, atol)
            )
            res["paired"] = False
            res["twinned"] = True
            res["nonempty"] = len(spark_pdf) > 0 and len(twin_pdf) > 0
            return res
        return {
            "paired": False,
            "twinned": False,
            "spark_rows": len(spark_pdf),
            "nonempty": len(spark_pdf) > 0,
            "ok": True,
        }
    con = con or duck_connection(sf_dir)
    duck_pdf = con.execute(oracles[name]).df()
    res = compare_frames(spark_pdf, duck_pdf)
    res["paired"] = True
    # the empty-oracle trap: a threshold query whose result set is EMPTY
    # compares green while verifying nothing (embedding_near_dup class)
    res["nonempty"] = len(spark_pdf) > 0 and len(duck_pdf) > 0
    return res
