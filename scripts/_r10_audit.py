#!/usr/bin/env python
"""Targeted re-audit of queries touched by r10 optimization batches —
the exact driver gate (hashquery_spark.parity.audit_query) at the named
SFs. Usage: python scripts/_r10_audit.py <sf_dir> <name> [name ...]"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from hashquery_spark.parity import audit_query, duck_connection  # noqa: E402


def main(sf_dir: str, names: list[str]) -> int:
    from hashquery_spark.connection import default_session

    spark = default_session("r10_audit")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    con = duck_connection(sf_dir)
    bad = 0
    for name in names:
        try:
            res = audit_query(spark, sf_dir, name, queries, oracles, con)
        except Exception as e:  # noqa: BLE001
            res = {"ok": False, "error": f"{type(e).__name__}: {e}"}
        ok = res.get("ok") and (not res.get("paired") or res.get("nonempty"))
        print(("OK  " if ok else "FAIL"), name, "" if ok else res)
        bad += 0 if ok else 1
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1], sys.argv[2:]))
