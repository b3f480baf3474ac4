"""Multimodal plumbing tests: binary payloads, metadata, stubbed decode."""

import pytest

from hds_functions_spark.operators.multimodal import (
    attach_binary_payload,
    binary_metadata,
    decode_image_features,
)


@pytest.fixture()
def payloads(spark):
    df = spark.createDataFrame(
        [(1, "fake image bytes one"), (2, "fake image bytes two"), (3, None)],
        "doc_id: long, raw: string",
    )
    return attach_binary_payload(df, "raw")


def test_payload_is_binary(payloads):
    assert dict(payloads.dtypes)["payload"] == "binary"


def test_binary_metadata(payloads):
    out = binary_metadata(payloads)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["payload_bytes"] == 20
    assert len(rows[1]["payload_md5"]) == 32
    assert rows[3]["payload_bytes"] is None


def test_fake_decode_deterministic(payloads):
    a = {r["doc_id"]: tuple(r) for r in decode_image_features(payloads).collect()}
    b = {r["doc_id"]: tuple(r) for r in decode_image_features(payloads).collect()}
    assert a == b  # byte-deterministic features
    assert a[1] != a[2]  # different payloads -> different features
    r1 = a[1]
    assert 1 <= r1[1] <= 4096 and 1 <= r1[2] <= 4096
    assert r1[3] in ("RGB", "RGBA", "L")
    assert a[3][1] is None  # null payload -> null features


def test_real_decoder_raises(payloads):
    df = decode_image_features(payloads, decoder="real")
    with pytest.raises(Exception, match="NotImplementedError|imaging"):
        df.collect()


def test_invalid_decoder(payloads):
    with pytest.raises(ValueError, match="decoder"):
        decode_image_features(payloads, decoder="nope")


def test_resize_image_deterministic(spark):
    from hds_functions_spark.operators.multimodal import resize_image

    df = spark.createDataFrame(
        [(1, b"abc"), (2, b"0123456789" * 5), (3, None)],
        "doc_id: long, payload: binary",
    )
    out = {r["doc_id"]: r for r in resize_image(df, 4, 3).collect()}
    assert out[1]["payload"] == b"abcabcabcabc"  # repeated to 12 bytes
    assert out[2]["payload"] == b"012345678901"  # truncated to 12 bytes
    assert out[3]["payload"] is None
    assert all(r["width"] == 4 and r["height"] == 3 for r in out.values())


def test_resize_real_decoder_raises(spark):
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    from hds_functions_spark.operators.multimodal import resize_image

    df = spark.createDataFrame([(1, b"abc")], "doc_id: long, payload: binary")
    with _pytest.raises(Exception):  # NotImplementedError inside the worker
        resize_image(df, 2, 2, decoder="real").collect()


def test_sample_video_frames_shape(spark):
    import hashlib

    from hds_functions_spark.operators.multimodal import sample_video_frames

    payload = b"fake video bytes"
    df = spark.createDataFrame(
        [(7, payload), (8, None)], "doc_id: long, payload: binary"
    )
    rows = sample_video_frames(df, max_frames=8).collect()
    h = hashlib.md5(payload).hexdigest()
    expected_frames = 1 + int(h[10:12], 16) % 8
    assert len(rows) == expected_frames  # null payload contributes nothing
    assert [r["frame_index"] for r in rows] == list(range(expected_frames))
    assert all(r["frame_ts_ms"] == r["frame_index"] * 1000 for r in rows)
    assert rows[0]["frame_md5"] == hashlib.md5(payload + b"0").hexdigest()


def test_decode_audio_features(spark):
    import hashlib

    from hds_functions_spark.operators.multimodal import decode_audio_features

    payload = b"fake audio bytes"
    df = spark.createDataFrame(
        [(1, payload), (2, None)], "doc_id: long, payload: binary"
    )
    rows = decode_audio_features(df).collect()
    assert len(rows) == 1  # null payload skipped
    d = hashlib.md5(payload).digest()
    r = rows[0]
    assert r["sample_rate"] in (8000, 16000, 22050, 44100, 48000)
    assert r["n_channels"] in (1, 2)
    assert 100 <= r["duration_ms"] < 600100
    assert r["rms_q8"] == d[9]
