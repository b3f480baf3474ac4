"""WARC / WET corpus source (ISO 28500) — pure-stdlib, quarantining.

The container 100 TB web corpora actually arrive in (Common Crawl
ships ~1 GB ``.warc.gz`` / ``.warc.wet.gz`` files: concatenated gzip
members, one WARC record per member). Spark-first shape:

- **Files are the split unit.** ``spark.read.format("binaryFile")``
  gives one task per archive — per-record gzip members are not
  byte-splittable without an external index, and one ~1 GB file per
  task is exactly how production crawlers consume these archives.
  Pushdown: ``pathGlobFilter`` narrows the listing; the scan carries
  no row-level predicate to push.
- **Parsing is the justified Python crossing** (a byte-format walk, no
  Spark builtin), Arrow-batched via ``mapInPandas``: decompress the
  member chain with ``zlib`` (handles both per-record members and
  whole-file gzip, plus uncompressed ``.warc``), then walk records.
- **Quarantine contract** (the ``read_jsonl_corpus`` contract, carried
  over): a malformed record — bad magic, unparsable or missing
  Content-Length, truncated payload, undecodable text, torn gzip
  tail — yields a row with ``_corrupt_record`` set and null fields,
  then the walker RESYNCS to the next ``\\r\\nWARC/`` boundary. One
  bad record never kills the file; a reader that dies on record 3
  billion is not a reader.
"""

from __future__ import annotations

import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "build_warc_record",
    "build_warc_gz",
    "decompress_warc_payload",
    "parse_warc_stream",
    "read_warc_corpus",
    "WARC_SCHEMA",
]

#: One row per WARC record (or per quarantined stretch of bytes).
WARC_SCHEMA = StructType(
    [
        StructField("file_path", StringType()),
        StructField("record_index", IntegerType()),
        StructField("warc_type", StringType()),
        StructField("record_id", StringType()),
        StructField("target_uri", StringType()),
        StructField("warc_date", StringType()),
        StructField("content_language", StringType()),
        StructField("content_length", LongType()),
        StructField("payload", StringType()),
        StructField("_corrupt_record", StringType()),
    ]
)


def build_warc_record(headers: dict[str, str], payload: bytes) -> bytes:
    """Serialize one WARC/1.0 record (Content-Length derived from the
    payload; header order = insertion order for byte determinism)."""
    lines = [b"WARC/1.0"]
    for k, v in headers.items():
        lines.append(f"{k}: {v}".encode("utf-8"))
    lines.append(f"Content-Length: {len(payload)}".encode("ascii"))
    return b"\r\n".join(lines) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def build_warc_gz(records: "list[bytes]") -> bytes:
    """Concatenated per-record gzip members (the Common Crawl layout),
    mtime pinned to 0 so archive bytes are deterministic."""
    import gzip

    return b"".join(gzip.compress(r, mtime=0) for r in records)


def decompress_warc_payload(data: bytes) -> tuple[bytes, str | None]:
    """Decompress a (possibly multi-member) gzip archive, or pass
    uncompressed bytes through. Returns ``(stream, error)`` — on a torn
    or corrupt member the bytes decompressed so far are kept and the
    error recorded (the already-sound records still parse)."""
    if data[:2] != b"\x1f\x8b":
        return data, None
    out: list[bytes] = []
    buf = data
    while buf:
        d = zlib.decompressobj(31)
        try:
            out.append(d.decompress(buf))
        except zlib.error as exc:
            return b"".join(out), f"gzip member corrupt: {exc}"
        if not d.eof:
            return b"".join(out), "gzip member truncated"
        buf = d.unused_data
    return b"".join(out), None


def _corrupt(idx: int, reason: str) -> dict:
    return {
        "record_index": idx,
        "warc_type": None,
        "record_id": None,
        "target_uri": None,
        "warc_date": None,
        "content_language": None,
        "content_length": None,
        "payload": None,
        "_corrupt_record": reason,
    }


def parse_warc_stream(data: bytes) -> list[dict]:
    """Walk a decompressed WARC stream into record dicts; malformed
    stretches become quarantine rows and the walk resyncs at the next
    ``\\r\\nWARC/`` boundary. Never raises on any byte input."""
    s = bytes(data)
    rows: list[dict] = []
    i = 0
    idx = 0

    def resync(start: int, reason: str) -> int:
        rows.append(_corrupt(len(rows), reason))
        nxt = s.find(b"\r\nWARC/", start)
        return len(s) if nxt == -1 else nxt + 2

    while i < len(s):
        while i < len(s) and s[i : i + 1] in (b"\r", b"\n"):
            i += 1
        if i >= len(s):
            break
        if s[i : i + 5] != b"WARC/":
            i = resync(i, f"bad record magic at offset {i}")
            continue
        hdr_end = s.find(b"\r\n\r\n", i)
        if hdr_end == -1:
            rows.append(_corrupt(len(rows), "truncated header block"))
            break
        headers: dict[str, str] = {}
        try:
            lines = s[i:hdr_end].decode("utf-8").split("\r\n")
        except UnicodeDecodeError:
            i = resync(i + 5, "undecodable header block")
            continue
        for line in lines[1:]:
            name, sep, value = line.partition(":")
            if sep:
                headers[name.strip().lower()] = value.strip()
        try:
            clen = int(headers["content-length"])
            if clen < 0:
                raise ValueError(clen)
        except (KeyError, ValueError):
            i = resync(i + 5, "missing or invalid Content-Length")
            continue
        body = s[hdr_end + 4 : hdr_end + 4 + clen]
        if len(body) < clen:
            rows.append(
                _corrupt(len(rows), f"payload truncated ({len(body)}/{clen})")
            )
            break
        try:
            payload = body.decode("utf-8")
        except UnicodeDecodeError:
            i = resync(hdr_end + 4 + clen, "undecodable payload")
            continue
        rows.append(
            {
                "record_index": idx,
                "warc_type": headers.get("warc-type"),
                "record_id": headers.get("warc-record-id"),
                "target_uri": headers.get("warc-target-uri"),
                "warc_date": headers.get("warc-date"),
                "content_language": headers.get(
                    "warc-identified-content-language"
                ),
                "content_length": clen,
                "payload": payload,
                "_corrupt_record": None,
            }
        )
        idx += 1
        i = hdr_end + 4 + clen
    return rows


def read_warc_corpus(
    path: str,
    spark: SparkSession | None = None,
    glob: str = "*.warc*",
) -> DataFrame:
    """Distributed WARC/WET reader: one row per record with its WARC
    headers and text payload, plus ``_corrupt_record`` quarantine rows
    for malformed stretches. Filter ``_corrupt_record IS NULL`` for the
    clean subset. One task per archive file (see module docstring)."""
    if spark is None:
        from .environment import get_spark_session

        spark = get_spark_session()
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    def process(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out: list[dict] = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                stream, err = decompress_warc_payload(bytes(content))
                rows = parse_warc_stream(stream)
                if err is not None:
                    rows.append(_corrupt(len(rows), err))
                for r in rows:
                    r["file_path"] = fpath
                    out.append(r)
            yield pd.DataFrame(
                out, columns=[f.name for f in WARC_SCHEMA.fields]
            )

    return files.mapInPandas(process, WARC_SCHEMA)
