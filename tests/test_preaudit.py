"""CI hook for the driver-gate pre-audit (slow marker): every paired
queries() entry must pass the exact driver gate AND return a non-empty
result at the driver SF (sf0.01) and the bench SF (sf0.1) — the
empty-oracle trap (a threshold query comparing two empty sets) is the
one event the per-query parity test can't see as a failure."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from hashquery_spark.parity import audit_query, duck_connection


@pytest.mark.slow
@pytest.mark.parametrize("audit_sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_preaudit_all_queries_green_and_nonempty(spark, audit_sf):
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    con = duck_connection(audit_sf)
    bad = []
    for name in sorted(queries):
        res = audit_query(spark, audit_sf, name, queries, oracles, con)
        if not res.get("ok"):
            bad.append(f"{name}: gate failed {res}")
        elif res.get("paired") and not res.get("nonempty"):
            bad.append(f"{name}: EMPTY paired result")
    assert not bad, f"{audit_sf}: {len(bad)} failures: " + "; ".join(bad[:5])


def _load_preaudit_module():
    import importlib.util
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "scripts", "preaudit.py"
    )
    spec = importlib.util.spec_from_file_location("preaudit_script", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_committed_preaudit_artifact_is_fresh():
    """The committed PREAUDIT.json must cover EVERY current queries()
    entry at both SFs — a query that lands after the last preaudit run
    fails CI here until `python scripts/preaudit.py` is re-run (the
    js_divergence staleness from round 3, now enforced) — AND its
    recorded source hash must match the current tree: r9 committed a
    green artifact BEFORE the round's op changes, which the name/green
    checks could not see (r9 verdict #2). Any edit to a semantics-
    bearing source after the last preaudit run now fails CI until the
    preaudit is re-run, restoring the preaudit-is-the-last-commit
    invariant."""
    import json
    import os

    root = os.path.dirname(os.path.dirname(__file__))
    path = os.path.join(root, "PREAUDIT.json")
    assert os.path.exists(path), "run scripts/preaudit.py before round end"
    with open(path) as f:
        report = json.load(f)
    names = set(entry_mod.queries())
    assert report, "PREAUDIT.json is empty — run scripts/preaudit.py"
    meta = report.pop("__meta__", None)
    assert meta and meta.get("source_hash"), (
        "PREAUDIT.json lacks __meta__.source_hash — regenerate with the "
        "current scripts/preaudit.py"
    )
    current = _load_preaudit_module().source_tree_hash(os.path.abspath(root))
    assert meta["source_hash"] == current, (
        "PREAUDIT.json is GREEN-BUT-STALE: a semantics-bearing source "
        "file (hashquery_spark/**, __spark_entry__.py, oracle_queries.py, "
        "py_twins.py) changed after the last preaudit run — re-run "
        "scripts/preaudit.py as the LAST commit of the round"
    )
    for sf_dir, r in report.items():
        covered = set(r["queries"])
        missing = names - covered
        assert not missing, (
            f"{sf_dir}: PREAUDIT.json is stale — missing {sorted(missing)}; "
            "re-run scripts/preaudit.py"
        )
        # the r9 '--help' incident: an artifact can cover every name and
        # still be all-red (preaudit run against a bogus data dir) — the
        # committed artifact must also be GREEN, not merely complete
        red = [n for n, res in r["queries"].items() if not res.get("ok")]
        assert not red, (
            f"{sf_dir}: PREAUDIT.json has {len(red)} failed queries "
            f"(e.g. {sorted(red)[:5]}); re-run scripts/preaudit.py"
        )
