"""Chunked binary blob storage: the reference's attachment machinery.

Reference: binary payloads are chunked into 32 KiB ``Binary`` vertices
linked by ``NextChunk`` edges and reassembled on read
(core/.../models/Database.scala:210,322-394); ``StorageSrv`` fronts
pluggable backends — in-graph chunks, local FS, HDFS, S3
(core/.../services/StorageSrv.scala:31-46) — addressing attachments by
content hash.

Spark re-expression: a chunk is a ROW, not a vertex — the chunk table
``(blob_id, chunk_no, chunk)`` replaces the NextChunk linked list (ordering
by ``chunk_no`` is free; a linked list forces sequential traversal, which
is exactly wrong on a cluster).  The "backend" is wherever the chunk table
is written — local parquet here, object storage in production — so
FS/HDFS/S3 portability comes from the Hadoop filesystem layer rather than
per-backend code.  Content addressing keeps sha256 over the whole payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHUNK_SIZE = 32 * 1024  # Database.scala:210


def content_hash(df: DataFrame, payload_col: str = "payload", alias: str = "sha256") -> DataFrame:
    """Content-address blobs (StorageSrv hash addressing)."""
    return df.withColumn(alias, F.sha2(F.col(payload_col), 256))


def multi_hash(
    df: DataFrame,
    payload_col: str = "payload",
    algorithms: tuple[str, ...] = ("sha256", "sha1", "md5"),
) -> DataFrame:
    """Multi-algorithm content hashing in ONE projection — the
    ``Hasher(algorithms*)`` analog (utils/Hash.scala:17-40): attachment
    rows carry every configured digest (TheHive stores
    sha256+sha1+md5 per attachment for IOC matching against feeds that
    key on any of them).  All digests are JVM builtin expressions over
    the same payload scan — one pass, no UDF, map-only.

    Supported: md5, sha1, sha224/sha256/sha384/sha512 (SHA-2 family via
    ``F.sha2``), crc32, xxh64 (xxhash64 as hex — the cheap non-crypto
    option for partition-local dedup).
    """
    out = df
    for alg in algorithms:
        a = alg.lower()
        if a == "md5":
            col = F.md5(F.col(payload_col))
        elif a == "sha1":
            col = F.sha1(F.col(payload_col))
        elif a in ("sha224", "sha256", "sha384", "sha512"):
            col = F.sha2(F.col(payload_col), int(a[3:]))
        elif a == "crc32":
            col = F.crc32(F.col(payload_col)).cast("string")
        elif a == "xxh64":
            col = F.hex(F.xxhash64(F.col(payload_col)))
        else:
            raise ValueError(f"unsupported hash algorithm {alg!r}")
        out = out.withColumn(a, col)
    return out


def chunk_blobs(
    blobs: DataFrame,
    id_col: str = "blob_id",
    payload_col: str = "payload",
    chunk_size: int = CHUNK_SIZE,
) -> DataFrame:
    """Split payloads into ordered chunks (Database.scala:322-347).

    Map-only: ``sequence`` generates chunk indexes per row, ``substring``
    slices the binary — no UDF, no shuffle.  Chunk rows carry
    (blob_id, chunk_no, n_chunks, chunk).
    """
    n = F.ceil(F.length(F.col(payload_col)) / F.lit(chunk_size)).cast("int")
    out = blobs.select(
        F.col(id_col).alias("blob_id"),
        n.alias("n_chunks"),
        F.explode(F.sequence(F.lit(0), F.greatest(n, F.lit(1)) - 1)).alias("chunk_no"),
        F.col(payload_col).alias("__p"),
    )
    chunk = F.expr(f"substring(__p, chunk_no * {chunk_size} + 1, {chunk_size})")
    return out.select("blob_id", "chunk_no", "n_chunks", chunk.alias("chunk"))


def assemble_blobs(chunks: DataFrame) -> DataFrame:
    """Reassemble payloads from chunk rows (Database.scala:349-394 read
    path).  One shuffle on blob_id; chunks sort inside the aggregated array
    (no linked-list walk)."""
    ordered = F.array_sort(F.collect_list(F.struct("chunk_no", "chunk")))
    joined = F.aggregate(
        F.transform(ordered, lambda s: s.chunk),
        F.lit(b""),
        lambda acc, c: F.concat(acc, c),
    )
    return chunks.groupBy("blob_id").agg(joined.alias("payload"))


def write_blob_store(chunks: DataFrame, path: str) -> None:
    """Persist the chunk table (local FS / HDFS / S3 via the Hadoop FS
    layer — the path scheme IS the backend selection)."""
    chunks.write.mode("overwrite").parquet(path)


def read_blob_store(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
