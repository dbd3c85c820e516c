"""Differential testing against the DuckDB oracle (SURVEY.md §5).

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet files, then compares
row counts, column names, and order-insensitively canonicalized values —
the same gate the driver applies at sf=0.01.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon(value):
    """Exact canonicalization — replicates the driver's value-hash gate.

    Both sides arrive through pandas/Arrow (Spark ``toPandas`` vs DuckDB
    ``.df()``), so NULL handling is symmetric (NaN/NaT on both). Floats use
    ``repr`` (shortest round-trip — EXACT, not 6 significant digits): any
    cross-engine double divergence the driver would flag, this flags too.
    """
    if value is None:
        return "∅"
    if isinstance(value, float):
        if math.isnan(value):
            return "∅"  # pandas renders NULL as NaN; symmetric on both sides
        return repr(value)
    if isinstance(value, (list, tuple)) or type(value).__name__ == "ndarray":
        return "[" + ",".join(_canon(v) for v in value) + "]"
    if hasattr(value, "isoformat"):
        iso = value.isoformat().replace("+00:00", "")
        if "." in iso:
            iso = iso.rstrip("0").rstrip(".")
        if iso.endswith("T00:00:00"):
            # DuckDB .df() renders DATE as midnight Timestamp; Spark keeps
            # datetime.date — canonicalize both to the bare date string.
            iso = iso[: -len("T00:00:00")]
        return iso
    return str(value)


def _canon_rows(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def _pdf_cells(pdf):
    """Rows as python objects from a pandas frame (NaT→None handled by canon)."""
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


QUERY_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_oracle_parity(spark, sf_dir, name):
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    sdf = queries[name](spark, sf_dir)
    spark_pdf = sdf.toPandas()
    spark_cols = list(spark_pdf.columns)

    if name not in oracles:
        assert len(spark_pdf) >= 0  # rows-only check
        return

    con = _duck(sf_dir)
    duck_pdf = con.execute(oracles[name]).df()
    duck_cols = list(duck_pdf.columns)

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    # dtype-kind parity: catches DuckDB HUGEINT→float64 Arrow degradation
    # (the driver-red sessionize/json_extraction failure mode) structurally.
    for c in spark_cols:
        sk = spark_pdf[c].dtype.kind
        dk = duck_pdf[c].dtype.kind
        if "O" in (sk, dk) or len(spark_pdf) == 0:
            continue  # object columns (strings/dates/lists) compare by value
        assert (sk == dk) or ({sk, dk} <= {"i", "u"}) or ({sk, dk} <= {"M", "m"}), (
            f"{name}: dtype kind mismatch on {c}: spark={spark_pdf[c].dtype} duck={duck_pdf[c].dtype}"
        )
    sc = _canon_rows(spark_cols, _pdf_cells(spark_pdf))
    dc = _canon_rows(duck_cols, _pdf_cells(duck_pdf))
    mismatches = [(a, b) for a, b in zip(sc, dc) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} differing rows; first 3: {mismatches[:3]}"
