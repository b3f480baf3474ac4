"""WARC/WET source reader: roundtrip, quarantine, and fuzz tests."""

import gzip

from hds_functions_spark.sources.warc import (
    build_warc_gz,
    build_warc_record,
    decompress_warc_payload,
    parse_warc_stream,
    read_warc_corpus,
)


def _rec(i, text="hello world", lang="en"):
    return build_warc_record(
        {
            "WARC-Type": "conversion",
            "WARC-Record-ID": f"<urn:doc:{i}>",
            "WARC-Target-URI": f"http://example.com/doc/{i}",
            "WARC-Date": "2024-01-01T00:00:00Z",
            "WARC-Identified-Content-Language": lang,
        },
        text.encode("utf-8"),
    )


def test_roundtrip_parse():
    stream, err = decompress_warc_payload(
        build_warc_gz([_rec(1), _rec(2, "bye", "fr")])
    )
    assert err is None
    rows = parse_warc_stream(stream)
    assert [r["_corrupt_record"] for r in rows] == [None, None]
    assert rows[0]["record_id"] == "<urn:doc:1>"
    assert rows[0]["target_uri"] == "http://example.com/doc/1"
    assert rows[0]["warc_type"] == "conversion"
    assert rows[0]["payload"] == "hello world"
    assert rows[0]["content_length"] == 11
    assert rows[1]["content_language"] == "fr"
    # uncompressed .warc parses identically
    assert parse_warc_stream(_rec(1) + _rec(2, "bye", "fr")) == rows


def test_quarantine_resyncs_past_bad_records():
    # garbage between two good records: one corrupt row, both goods kept
    s = _rec(1) + b"this is not a warc record\r\n" + _rec(2)
    rows = parse_warc_stream(s)
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(good) == 2 and len(bad) == 1
    assert "bad record magic" in bad[0]["_corrupt_record"]
    # unparsable Content-Length: record quarantined, next record kept
    broken = _rec(1).replace(b"Content-Length: 11", b"Content-Length: zz")
    rows = parse_warc_stream(broken + _rec(2))
    assert [r["_corrupt_record"] is None for r in rows] == [False, True]
    assert "Content-Length" in rows[0]["_corrupt_record"]
    # truncated payload at the tail (cut 10 bytes: payload 11 + 4-byte
    # trailer, header intact): quarantined, walk stops cleanly
    rows = parse_warc_stream(_rec(1) + _rec(2)[:-10])
    assert rows[-1]["_corrupt_record"].startswith("payload truncated")
    assert rows[0]["payload"] == "hello world"
    # undecodable payload bytes
    raw = build_warc_record({"WARC-Type": "conversion"}, b"\xff\xfe\x00")
    rows = parse_warc_stream(raw + _rec(2))
    assert rows[0]["_corrupt_record"] == "undecodable payload"
    assert rows[1]["payload"] == "hello world"


def test_torn_gzip_tail_keeps_sound_members():
    m1 = gzip.compress(_rec(1), mtime=0)
    archive = m1 + gzip.compress(_rec(2), mtime=0)
    # cut into the LAST member's deflate data: first record must
    # survive, the torn one is flagged, nothing raises
    stream, err = decompress_warc_payload(archive[: len(m1) + 15])
    assert err is not None
    rows = parse_warc_stream(stream)
    clean = [r for r in rows if r["_corrupt_record"] is None]
    assert [r["record_id"] for r in clean] == ["<urn:doc:1>"]
    # losing only the 8-byte gzip trailer still recovers ALL records
    # (the deflate stream is complete) while flagging the tear
    stream, err = decompress_warc_payload(archive[:-8])
    assert err == "gzip member truncated"
    ids = [r["record_id"] for r in parse_warc_stream(stream)
           if r["_corrupt_record"] is None]
    assert ids == ["<urn:doc:1>", "<urn:doc:2>"]
    # non-gzip bytes pass through untouched
    assert decompress_warc_payload(b"WARC/1.0")[0] == b"WARC/1.0"


def test_fuzz_never_raises():
    """Every prefix truncation and every byte flip of a 3-record
    archive parses without raising — the mapInPandas contract."""
    archive = build_warc_gz([_rec(1), _rec(2), _rec(3)])
    for cut in range(0, len(archive), 7):
        stream, _err = decompress_warc_payload(archive[:cut])
        parse_warc_stream(stream)
    plain = _rec(1) + _rec(2) + _rec(3)
    for cut in range(len(plain)):
        parse_warc_stream(plain[:cut])
    for pos in range(0, len(plain), 11):
        mut = bytearray(plain)
        mut[pos] ^= 0xFF
        parse_warc_stream(bytes(mut))
    assert parse_warc_stream(b"") == []


def test_read_warc_corpus_through_spark(spark, tmp_path):
    (tmp_path / "a.warc.gz").write_bytes(build_warc_gz([_rec(1), _rec(2)]))
    (tmp_path / "b.warc.gz").write_bytes(
        # torn mid-deflate: the record is unrecoverable, must quarantine
        build_warc_gz([_rec(3, "third doc", "de")])[:30]
    )
    (tmp_path / "ignored.txt").write_bytes(b"not a warc")
    df = read_warc_corpus(str(tmp_path), spark)
    rows = df.collect()
    clean = {
        r["record_id"]: r for r in rows if r["_corrupt_record"] is None
    }
    assert set(clean) == {"<urn:doc:1>", "<urn:doc:2>"}
    assert clean["<urn:doc:1>"]["payload"] == "hello world"
    assert clean["<urn:doc:1>"]["file_path"].endswith("a.warc.gz")
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(bad) >= 1  # the torn member quarantined, job alive
    assert all(r["file_path"].endswith("b.warc.gz") for r in bad)
