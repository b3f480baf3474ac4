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

from pyspark.sql import DataFrame
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
    "decode_audio_features",
    "resize_image",
    "sample_video_frames",
    "IMAGE_FEATURE_SCHEMA",
    "AUDIO_FEATURE_SCHEMA",
    "RESIZED_IMAGE_SCHEMA",
    "VIDEO_FRAME_SCHEMA",
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


#: Output schema of the (stubbed) resize: one row per input row.
RESIZED_IMAGE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_image(
    df: DataFrame,
    target_width: int,
    target_height: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder: str = "fake",
) -> DataFrame:
    """Arrow-batched image resize via ``mapInPandas`` (1 row -> 1 row,
    binary in / binary out). Stubbed resize (``decoder='fake'``) emits a
    deterministic payload: the first ``target_width*target_height`` bytes of
    the input repeated/truncated — byte-for-byte reproducible so the
    dataflow (binary columns through Arrow both directions, schema
    enforcement, batch iteration) is fully testable without an imaging
    library. ``decoder='real'`` raises NotImplementedError; swap in
    PIL.Image.resize there.
    """
    if decoder not in ("fake", "real"):
        raise ValueError("decoder must be 'fake' or 'real'")
    n_bytes = target_width * target_height

    def process(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real image resizing requires an imaging library "
                    "(PIL/torchvision) not present in this environment"
                )
            out_payloads = []
            for p in pdf[payload_col]:
                if p is None:
                    out_payloads.append(None)
                    continue
                b = bytes(p)
                reps = (n_bytes // max(len(b), 1)) + 1
                out_payloads.append((b * reps)[:n_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": out_payloads,
                    "width": target_width,
                    "height": target_height,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        process, schema=RESIZED_IMAGE_SCHEMA
    )


#: Output schema of the (stubbed) frame sampler: one row per sampled frame.
VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame_ts_ms", LongType()),
        StructField("frame_md5", StringType()),
    ]
)


def sample_video_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_frames: int = 8,
    decoder: str = "fake",
) -> DataFrame:
    """Arrow-batched video frame sampling via ``mapInPandas`` — the
    1-row-to-N-rows batch shape (each video row explodes into its sampled
    frames inside the Python worker; Spark sees a plain schema'd stream, so
    downstream operators parallelise over frames, not videos).

    Stubbed sampler: frame count = 1 + (md5 byte 5 of the payload) %
    ``max_frames``, frame timestamps at 1000 ms intervals, per-frame content
    hash md5(payload || frame_index) — all deterministic and reproducible in
    SQL, which keeps the plumbing oracle-checkable. ``decoder='real'``
    raises NotImplementedError (no av/ffmpeg in this environment).
    """
    if decoder not in ("fake", "real"):
        raise ValueError("decoder must be 'fake' or 'real'")

    def process(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real frame sampling requires a video library "
                    "(av/ffmpeg) not present in this environment"
                )
            ids, idxs, tss, hashes = [], [], [], []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    continue
                b = bytes(p)
                h = hashlib.md5(b).hexdigest()
                n_frames = 1 + int(h[10:12], 16) % max_frames
                for i in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(i)
                    tss.append(i * 1000)
                    hashes.append(
                        hashlib.md5(b + str(i).encode("utf-8")).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_index": idxs,
                    "frame_ts_ms": tss,
                    "frame_md5": hashes,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        process, schema=VIDEO_FRAME_SCHEMA
    )


#: Output schema of the (stubbed) audio feature extractor.
AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("rms_q8", IntegerType()),
    ]
)


def decode_audio_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder: str = "fake",
) -> DataFrame:
    """Arrow-batched audio decode via ``mapInPandas`` (1 row -> 1 row).

    Stubbed decoder: sample rate / channels / duration / quantised RMS all
    derived deterministically from the payload's md5 — reproducible without
    an audio library. ``decoder='real'`` raises NotImplementedError (no
    soundfile/librosa in this environment); the Spark-side plumbing (binary
    Arrow transfer, enforced schema, batch iteration) is identical either
    way.
    """
    if decoder not in ("fake", "real"):
        raise ValueError("decoder must be 'fake' or 'real'")

    _RATES = [8000, 16000, 22050, 44100, 48000]

    def process(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real audio decoding requires an audio library "
                    "(soundfile/librosa) not present in this environment"
                )
            ids, rates, chans, durs, rms = [], [], [], [], []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    continue
                d = hashlib.md5(bytes(p)).digest()
                ids.append(doc_id)
                rates.append(_RATES[d[5] % len(_RATES)])
                chans.append(1 + d[6] % 2)
                durs.append(100 + int.from_bytes(d[7:9], "big") % 600_000)
                rms.append(d[9])
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "sample_rate": rates,
                    "n_channels": chans,
                    "duration_ms": durs,
                    "rms_q8": rms,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        process, schema=AUDIO_FEATURE_SCHEMA
    )
