"""Span-corruption planning — deterministic selection of mask spans per
document (the T5/UL2 denoising-objective preparation step; net-new, the
reference has no training-objective surface).

Scale: ONE narrow generator pass — tokenize, derive the span count from
the mask ratio, explode a ``sequence`` of span ids, place each span with
pure md5 integer arithmetic. No shuffle, no UDF, no randomness source:
placement is a deterministic function of (id, span index), so the plan
is reproducible across runs/partitionings AND across engines (DuckDB
oracle bit-for-bit).

Placement contract (documented determinism over statistical purity):
the token stream divides into ``n_spans`` equal buckets; each span sits
inside its own bucket at an md5-chosen offset — spans never overlap by
construction, order is by position, and a doc yields
``floor(n_tokens · mask_ratio / span_len)`` spans (0 spans → no rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def plan_span_corruption(
    df: DataFrame,
    text_col: str,
    id_col: str,
    mask_ratio: float = 0.15,
    span_len: int = 3,
    seed: int = 0,
) -> DataFrame:
    """(id, mask_id, span_start, span_len, span_text) — one row per mask
    span; ``span_start`` is the 0-based token index, ``span_text`` the
    masked tokens joined by spaces."""
    if span_len < 1:
        raise ValueError("span_len must be >= 1")
    if not 0 < mask_ratio < 1:
        raise ValueError("mask_ratio must be in (0, 1)")
    ratio_scaled = int(round(mask_ratio * 1000))  # exact integer arithmetic
    base = df.where(F.col(text_col).isNotNull()).selectExpr(
        f"`{id_col}`",
        f"split(trim(regexp_replace(lower(`{text_col}`), '[^a-z0-9]+', ' ')),"
        " '\\\\s+') AS __t__",
    )
    sized = base.selectExpr(
        f"`{id_col}`",
        "__t__",
        "CASE WHEN size(__t__) = 1 AND try_element_at(__t__, 1) = '' THEN 0"
        " ELSE size(__t__) END AS __n__",
    ).selectExpr(
        f"`{id_col}`",
        "__t__",
        "__n__",
        f"(__n__ * {ratio_scaled}) DIV {1000 * span_len} AS __k__",
    )
    ex = sized.where(F.col("__k__") > 0).selectExpr(
        f"`{id_col}`",
        "__t__",
        "__n__",
        "__k__",
        "__n__ DIV __k__ AS __bucket__",
        "explode(sequence(0, CAST(__k__ - 1 AS INT))) AS mask_id",
    )
    # md5-derived in-bucket offset; bucket_len >= span_len is guaranteed
    # because k <= n·ratio/span_len  =>  bucket = n DIV k >= span_len/ratio
    h = (
        f"CAST(conv(substring(md5(concat('{seed}:', CAST(`{id_col}` AS STRING),"
        " ':', CAST(mask_id AS STRING))), 1, 8), 16, 10) AS BIGINT)"
    )
    return ex.selectExpr(
        f"`{id_col}`",
        "mask_id",
        f"CAST(mask_id * __bucket__ + {h} % (__bucket__ - {span_len} + 1)"
        " AS BIGINT) AS span_start",
        f"{span_len} AS span_len",
        f"array_join(slice(__t__, CAST(mask_id * __bucket__ + {h} %"
        f" (__bucket__ - {span_len} + 1) AS INT) + 1, {span_len}), ' ')"
        " AS span_text",
    )
