"""PII detection and redaction — the pre-release scrub every public
training corpus gets (C4 strips lines by keyword; FineWeb/Dolma redact
emails, IPs and phone numbers with placeholder tokens; see also
Subramani et al. 2023 on PII in web-scale corpora).

Pure regexp passes over the text column: JVM-side, codegen-friendly, no
UDF. The patterns are deliberately the conservative, high-precision
forms the public pipelines use (emails, IPv4, international-ish phone
numbers, 16-digit card numbers) — recall-tuned NER-style PII detection
is a model, not a regex, and out of scope.

Determinism: counts come from ``regexp_count`` and redaction from
``regexp_replace`` — identical POSIX-ish semantics in Spark and DuckDB
for these character-class-only patterns (no lookaround, no lazy
quantifiers; the parenthesized groups are plain alternations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# pattern table: (kind, regex, replacement token). Order matters:
# redaction applies top to bottom (cards before phones so a 16-digit run
# isn't half-eaten as a phone number).
PII_PATTERNS = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "card",
        r"\b(?:\d{4}[ -]){3}\d{4}\b",
        "<CARD>",
    ),
    (
        "ipv4",
        r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
        "<IP>",
    ),
    (
        "phone",
        r"\+\d{1,3}[ -]?\(?\d{1,4}\)?(?:[ -]?\d{2,4}){2,3}",
        "<PHONE>",
    ),
]


def pii_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, n_email, n_card, n_ipv4, n_phone, n_pii, has_pii) — per-doc
    PII match counts by kind, in ONE narrow projection (four
    regexp_count calls over the same string; no explode, no shuffle)."""
    t = F.col(text_col)
    counts = [
        F.regexp_count(t, F.lit(rx)).cast("long").alias(f"n_{kind}")
        for kind, rx, _ in PII_PATTERNS
    ]
    out = df.select(F.col(id_col), *counts)
    total = None
    for kind, _, _ in PII_PATTERNS:
        c = F.col(f"n_{kind}")
        total = c if total is None else (total + c)
    return out.select(
        "*", total.alias("n_pii"), (total > 0).alias("has_pii")
    )


def pii_redact(
    df: DataFrame, text_col: str, out_col: str | None = None
) -> DataFrame:
    """Replace every PII match with its placeholder token (``<EMAIL>``,
    ``<CARD>``, ``<IP>``, ``<PHONE>``), preserving all other columns.
    One chained regexp_replace projection — a single streaming pass, no
    shuffle; order is cards before phones so digit runs aren't
    half-consumed by the looser pattern."""
    out_col = out_col or text_col
    expr = F.col(text_col)
    for _, rx, token in PII_PATTERNS:
        expr = F.regexp_replace(expr, F.lit(rx), F.lit(token))
    return df.withColumn(out_col, expr)


# Prompt-injection / jailbreak surface patterns — lowercase-normalized
# phrase regexes (Java-regex and RE2 compatible; the PII_PATTERNS
# contract). A real deployment swaps in its own list; the plumbing —
# one narrow regexp_count projection per pattern — is what scales.
INJECTION_PATTERNS = [
    ("override", r"ignore (all )?(previous|prior) instructions"),
    ("disregard", r"disregard (the )?(above|earlier)"),
    ("exfil", r"(reveal|print|show) (your|the) (system )?prompt"),
    ("roleplay", r"you are now (dan|developer mode)"),
]


def injection_scan(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, n_override, n_disregard, n_exfil, n_roleplay, n_injection,
    has_injection) — per-document prompt-injection phrase census over
    lowercased text, in ONE narrow regexp_count projection (the
    pii_stats skeleton) — the instruction-data hygiene gate that keeps
    jailbreak templates out of an SFT corpus. Patterns are a seed
    list; pass-through of clean docs is the common case, so the scan
    must stay a single codegen pass (it does: no explode, no shuffle).
    """
    t = F.lower(F.col(text_col))
    counts = [
        F.regexp_count(t, F.lit(rx)).cast("long").alias(f"n_{kind}")
        for kind, rx in INJECTION_PATTERNS
    ]
    out = df.select(F.col(id_col), *counts)
    total = None
    for kind, _ in INJECTION_PATTERNS:
        c = F.col(f"n_{kind}")
        total = c if total is None else (total + c)
    return out.select(
        "*", total.alias("n_injection"), (total > 0).alias("has_injection")
    )
