"""Binary blob storage tests: 32 KiB chunking, reassembly, content
addressing, and the parquet-backed store round trip."""

from __future__ import annotations

import hashlib
import zlib

import pytest

from scalligraph_spark.blobs import (
    CHUNK_SIZE,
    assemble_blobs,
    chunk_blobs,
    content_hash,
    multi_hash,
    read_blob_store,
    write_blob_store,
)


def _payloads():
    big = (b"0123456789abcdef" * 4096) + b"tail"  # 64 KiB + 4 → 3 chunks
    small = b"tiny"
    empty = b""
    return [(1, big), (2, small), (3, empty)]


def test_chunking_shape(spark):
    df = spark.createDataFrame(_payloads(), "blob_id long, payload binary")
    chunks = chunk_blobs(df).collect()
    by_blob = {}
    for r in chunks:
        by_blob.setdefault(r["blob_id"], []).append(r)
    assert len(by_blob[1]) == 3
    assert sorted(r["chunk_no"] for r in by_blob[1]) == [0, 1, 2]
    assert all(len(r["chunk"]) <= CHUNK_SIZE for r in chunks)
    assert len(by_blob[2]) == 1 and by_blob[2][0]["chunk"] == b"tiny"
    assert len(by_blob[3]) == 1  # empty payload still yields one (empty) chunk row


def test_roundtrip_exact(spark):
    df = spark.createDataFrame(_payloads(), "blob_id long, payload binary")
    back = assemble_blobs(chunk_blobs(df)).collect()
    got = {r["blob_id"]: bytes(r["payload"]) for r in back}
    for bid, payload in _payloads():
        assert got[bid] == payload


def test_content_hash_addressing(spark):
    df = spark.createDataFrame(_payloads(), "blob_id long, payload binary")
    hashed = {r["blob_id"]: r["sha256"] for r in content_hash(df).collect()}
    for bid, payload in _payloads():
        assert hashed[bid] == hashlib.sha256(payload).hexdigest()


def test_multi_hash_matches_stdlib(spark):
    df = spark.createDataFrame(_payloads(), "blob_id long, payload binary")
    rows = {
        r["blob_id"]: r
        for r in multi_hash(
            df, algorithms=("sha256", "sha1", "md5", "sha512", "crc32")
        ).collect()
    }
    for bid, payload in _payloads():
        r = rows[bid]
        assert r["sha256"] == hashlib.sha256(payload).hexdigest()
        assert r["sha1"] == hashlib.sha1(payload).hexdigest()
        assert r["md5"] == hashlib.md5(payload).hexdigest()
        assert r["sha512"] == hashlib.sha512(payload).hexdigest()
        assert r["crc32"] == str(zlib.crc32(payload))


def test_multi_hash_xxh64_deterministic(spark):
    df = spark.createDataFrame(_payloads(), "blob_id long, payload binary")
    a = {r["blob_id"]: r["xxh64"] for r in multi_hash(df, algorithms=("xxh64",)).collect()}
    b = {r["blob_id"]: r["xxh64"] for r in multi_hash(df, algorithms=("xxh64",)).collect()}
    assert a == b
    assert len(set(a.values())) == len(a)  # distinct payloads → distinct digests


def test_multi_hash_rejects_unknown_algorithm(spark):
    df = spark.createDataFrame(_payloads(), "blob_id long, payload binary")
    with pytest.raises(ValueError, match="unsupported hash algorithm"):
        multi_hash(df, algorithms=("blake9",))


def test_blob_store_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(_payloads(), "blob_id long, payload binary")
    path = str(tmp_path / "blobstore")
    write_blob_store(chunk_blobs(df), path)
    back = assemble_blobs(read_blob_store(spark, path)).collect()
    got = {r["blob_id"]: bytes(r["payload"]) for r in back}
    assert got[1] == _payloads()[0][1]
