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
