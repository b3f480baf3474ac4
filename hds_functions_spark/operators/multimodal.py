"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Extension layer (SURVEY.md §7). Image/audio/video payloads are carried as
``binary`` columns with metadata columns alongside. The Spark-side plumbing
(schemas, Arrow-batched ``mapInPandas`` signatures, partition-safe batch
processing) is real and tested; the actual media decoding is STUBBED — the
decode libraries are not available in this environment — behind
``decoder='fake'`` (deterministic pseudo-features derived from the bytes)
or ``decoder='real'`` which raises ``NotImplementedError``.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "attach_binary_payload",
    "binary_metadata",
    "decode_image_features",
    "IMAGE_FEATURE_SCHEMA",
]


def attach_binary_payload(
    df: DataFrame, source_col: str, payload_col: str = "payload"
) -> DataFrame:
    """Encode a string column to a binary payload column (UTF-8).

    Stand-in ingestion path for environments where the real media bytes
    would be read from object storage; gives tests a real BinaryType column.
    """
    return df.withColumn(payload_col, F.encode(F.col(source_col), "UTF-8"))


def binary_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Add size + content-hash metadata for a binary column (JVM-side)."""
    return df.withColumns(
        {
            f"{payload_col}_bytes": F.length(F.col(payload_col)).cast("long"),
            f"{payload_col}_md5": F.md5(F.col(payload_col)),
        }
    )


#: Output schema of the (stubbed) image decoder: one row per input row.
IMAGE_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mode", StringType()),
        StructField("payload_bytes", LongType()),
    ]
)


def decode_image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder: str = "fake",
) -> DataFrame:
    """Arrow-batched image decode via ``mapInPandas``.

    The distributed plumbing is real: binary payloads stream to Python in
    Arrow batches, one output row per image, schema enforced. The decode
    itself is stubbed (``decoder='fake'``): deterministic width/height/mode
    derived from the payload's md5 — byte-for-byte reproducible. Passing
    ``decoder='real'`` raises NotImplementedError (no imaging library in
    this environment); swap in PIL/torchvision there.
    """
    if decoder not in ("fake", "real"):
        raise ValueError("decoder must be 'fake' or 'real'")

    def process(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real image decoding requires an imaging library "
                    "(PIL/torchvision) not present in this environment"
                )
            digests = [
                hashlib.md5(bytes(p)).digest() if p is not None else None
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": [
                        1 + int.from_bytes(d[0:2], "big") % 4096 if d else None
                        for d in digests
                    ],
                    "height": [
                        1 + int.from_bytes(d[2:4], "big") % 4096 if d else None
                        for d in digests
                    ],
                    "mode": [
                        ["RGB", "RGBA", "L"][d[4] % 3] if d else None
                        for d in digests
                    ],
                    "payload_bytes": [
                        len(bytes(p)) if p is not None else None
                        for p in pdf[payload_col]
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        process, schema=IMAGE_FEATURE_SCHEMA
    )
