"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Net-new beyond the reference. Image/audio/video payloads are treated as
opaque ``binary`` columns with typed metadata extracted by Arrow-batched
``mapInPandas`` — the Spark-side plumbing (schema contract, batch shape,
partition behavior) is real and tested; the actual codec call is stubbed
behind ``decode_image`` because no image/audio libraries exist in this
container. A real deployment replaces exactly one function.

Scale notes: mapInPandas streams Arrow batches — no per-row Python
dispatch, no driver collect; binary payloads stay in the executor. Batch
size is governed by ``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, n_bytes int, head_hex string, fake_width int, fake_height int"
)


def decode_image(payload: bytes):
    """The real codec hook. STUB: no image libraries in this container
    (would be e.g. PIL.Image.open(io.BytesIO(payload)))."""
    raise NotImplementedError(
        "image decoding requires an image library not present in this "
        "environment; decode_blob_metadata uses deterministic fake features"
    )


def with_binary_column(df: DataFrame, text_col: str, out_col: str = "payload") -> DataFrame:
    """Manufacture an opaque binary column (UTF-8 bytes of a text column) —
    stands in for real image/audio payloads in tests."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


def decode_blob_metadata(
    df: DataFrame, blob_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Extract typed metadata from an opaque binary column via Arrow-batched
    mapInPandas. Output schema: (doc_id, n_bytes, head_hex, fake_width,
    fake_height). The "decode" is a deterministic fake (byte-length
    arithmetic) so results are oracle-checkable; swap :func:`decode_image`
    in for real features."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(blob_col).alias("__blob__"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = pdf["__blob__"]
            n_bytes = blobs.map(lambda b: len(b) if b is not None else 0)
            head_hex = blobs.map(
                lambda b: b[:4].hex().upper() if b is not None else ""
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes.astype("int32"),
                    # deterministic fake decode: a real impl calls decode_image
                    "head_hex": head_hex,
                    "fake_width": (n_bytes % 640).astype("int32"),
                    "fake_height": (n_bytes % 480).astype("int32"),
                }
            )

    return src.mapInPandas(batches, schema=DECODED_SCHEMA)
