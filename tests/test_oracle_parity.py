"""Differential testing against the DuckDB oracle (SURVEY.md §5).

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet files, then compares
row counts, column names, and order-insensitively canonicalized values —
the same gate the driver applies at sf=0.01. The gate itself lives in
``hashquery_spark.parity`` (shared with scripts/preaudit.py so the
pre-audit can never drift from what this suite enforces).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from hashquery_spark.parity import audit_query, duck_connection

QUERY_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_oracle_parity(spark, sf_dir, name):
    res = audit_query(spark, sf_dir, name)
    if not res["paired"]:
        assert res["spark_rows"] >= 0  # rows-only check
        return
    assert res["schema_match"], f"{name}: column mismatch"
    assert res["rows_match"], (
        f"{name}: row count spark={res['spark_rows']} oracle={res['oracle_rows']}"
    )
    assert not res["dtype_kinds"], f"{name}: dtype kind mismatch {res['dtype_kinds']}"
    assert res["hash_match"], (
        f"{name}: differing rows; first 3: {res['first_mismatches']}"
    )
