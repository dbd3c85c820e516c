"""Structured-format validation operators: JSON payload hygiene and
chat-transcript (SFT/instruction data) structure checks.

Net-new beyond the reference. Training pipelines ingest huge volumes of
"supposed to be JSON" (tool-call traces, metadata sidecars) and
"supposed to be a chat" (instruction-tuning transcripts); both ops are
single narrow JVM-side passes (``try_parse_json`` / ``from_json`` + array
higher-order functions — no UDF, no shuffle) that turn format contracts
into filterable boolean columns. Planted-fixture oracles replicate every
check in DuckDB's JSON functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHAT_SCHEMA = "array<struct<role:string,content:string>>"


def validate_json(
    df: DataFrame, json_col: str, id_col: str, required_keys
) -> DataFrame:
    """(id, is_valid, n_missing, missing_keys, ok) — per-row JSON
    validity plus presence of ``required_keys`` at the top level
    (missing-or-null semantics: a key explicitly set to JSON ``null``
    counts as missing, which is what a downstream consumer cares about).
    ``missing_keys`` is a deterministic comma-joined sorted list;
    ``ok = is_valid AND n_missing = 0``.

    One narrow codegen'd projection (``try_parse_json`` validity +
    ``get_json_object`` per key); Spark's parser and DuckDB's agree on
    RFC-valid inputs — exotic near-JSON (NaN literals, trailing commas)
    is exactly what ``is_valid = false`` is for.
    """
    keys = sorted(required_keys)
    if not keys:
        raise ValueError("required_keys must be non-empty")
    miss_parts = ", ".join(
        f"CASE WHEN get_json_object({json_col}, '$.{k}') IS NULL THEN '{k}' END"
        for k in keys
    )
    return df.selectExpr(
        id_col,
        f"(try_parse_json({json_col}) IS NOT NULL) AS is_valid",
        f"concat_ws(',', {miss_parts}) AS __miss__",
    ).selectExpr(
        id_col,
        "is_valid",
        "CASE WHEN is_valid THEN size(filter(split(__miss__, ','),"
        " x -> x != '')) ELSE NULL END AS n_missing",
        "CASE WHEN is_valid THEN __miss__ END AS missing_keys",
        "(is_valid AND __miss__ = '') AS ok",
    )


def chat_validate(
    df: DataFrame, messages_col: str, id_col: str
) -> DataFrame:
    """(id, is_parsed, n_turns, starts_ok, alternates, contents_ok,
    ends_assistant, chat_ok) — structural validation of chat transcripts
    stored as JSON arrays of ``{role, content}`` (the SFT-data hygiene
    gate): parses, an optional leading ``system`` turn, then strict
    user/assistant alternation starting at ``user``, every role/content
    present and non-blank, the transcript ends on ``assistant``, and at
    least one full exchange. Unparsable rows report ``is_parsed=false``
    with NULL detail columns and ``chat_ok=false``.

    One narrow pass: ``from_json`` + array HOFs (``try_element_at``
    only — the ANSI ``element_at`` trap), all checks in a single
    selectExpr SQL block (the per-Column py4j round-trip lesson).
    """
    c = messages_col
    return df.selectExpr(
        id_col,
        f"from_json({c}, '{CHAT_SCHEMA}') AS __arr__",
    ).selectExpr(
        id_col,
        "__arr__",
        "(__arr__ IS NOT NULL) AS is_parsed",
        "CASE WHEN __arr__ IS NOT NULL THEN size(__arr__) END AS n_turns",
        # body = transcript minus an optional leading system turn
        "CASE WHEN __arr__ IS NOT NULL THEN (CASE WHEN"
        " try_element_at(__arr__, 1).role = 'system'"
        " THEN slice(__arr__, 2, size(__arr__)) ELSE __arr__ END)"
        " END AS __body__",
    ).selectExpr(
        id_col,
        "is_parsed",
        "n_turns",
        "CASE WHEN is_parsed THEN IF(size(__body__) = 0, false,"
        " try_element_at(__body__, 1).role = 'user') END AS starts_ok",
        # sequence(1, 0) generates DESCENDING [1, 0] in Spark — guard the
        # empty body (system-only transcript) explicitly
        "CASE WHEN is_parsed THEN IF(size(__body__) = 0, false,"
        " NOT exists(sequence(1, size(__body__)),"
        " i -> try_element_at(__body__, i).role !="
        " IF(i % 2 = 1, 'user', 'assistant'))) END AS alternates",
        "CASE WHEN is_parsed THEN NOT exists(__arr__,"
        " m -> m.role IS NULL OR m.content IS NULL"
        " OR length(trim(m.content)) = 0) END AS contents_ok",
        "CASE WHEN is_parsed THEN"
        " try_element_at(__arr__, size(__arr__)).role = 'assistant'"
        " END AS ends_assistant",
    ).selectExpr(
        id_col,
        "is_parsed",
        "n_turns",
        "starts_ok",
        "alternates",
        "contents_ok",
        "ends_assistant",
        "coalesce(is_parsed AND n_turns >= 2 AND starts_ok AND alternates"
        " AND contents_ok AND ends_assistant, false) AS chat_ok",
    )
