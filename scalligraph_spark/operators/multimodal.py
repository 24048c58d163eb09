"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed via Arrow-batched Pandas UDFs.

The container has no image/audio codecs, so the *decode kernels* are
deterministic fakes behind ``_decode_stub`` (clearly marked); everything
Spark-side — schema, batch iteration, partitioning, output shapes — is real
and tested (tests/test_operators.py).  Swapping the stub for PIL/ffmpeg is a
one-function change that does not touch the plan.

Scale shape: ``mapInPandas`` streams Arrow batches; binary payloads never
round-trip through Python row objects.  Partition sizing is controlled by
``spark.sql.files.maxPartitionBytes`` upstream; feature extraction is
map-only (no shuffle).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", T.StringType(), True),  # JSON sidecar
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_stub(payload: bytes, kind: str) -> dict:
    """DETERMINISTIC FAKE decoder — stands in for PIL/soundfile/ffmpeg,
    which are not installed in this container.  Produces stable
    pseudo-dimensions and an 8-dim byte-histogram feature so downstream
    plumbing is fully exercisable.  Replace with a real codec in prod."""
    n = len(payload)
    hist = [0] * 8
    for b in payload[:4096]:
        hist[b >> 5] += 1
    total = max(sum(hist), 1)
    return {
        "n_bytes": n,
        "width": (n % 640) + 1 if kind == "image" else None,
        "height": (n % 480) + 1 if kind == "image" else None,
        "feature": [h / total for h in hist],
    }


def extract_features(media: DataFrame) -> DataFrame:
    """Decode + featurize media rows via Arrow-batched ``mapInPandas``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_stub(p, k) for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [d["n_bytes"] for d in decoded],
                    "width": pd.array([d["width"] for d in decoded], dtype="Int32"),
                    "height": pd.array([d["height"] for d in decoded], dtype="Int32"),
                    "feature": [d["feature"] for d in decoded],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """"Frame"-sample video payloads: emit one row per sampled offset —
    demonstrates the 1→N expansion shape (explode after a Pandas UDF is
    wrong; expansion happens inside the batch iterator)."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_no", T.IntegerType(), False),
            T.StructField("chunk", T.BinaryType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames, chunks = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for i, off in enumerate(range(0, len(payload), every_n_bytes)):
                    ids.append(mid)
                    frames.append(i)
                    chunks.append(bytes(payload[off : off + every_n_bytes]))
            yield pd.DataFrame({"media_id": ids, "frame_no": frames, "chunk": chunks})

    return media.where(F.col("kind") == "video").mapInPandas(run, schema=schema)


def fake_media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a deterministic media table from the documents fixture (the
    driver ships no binary table): payload = utf-8 text bytes."""
    kind = F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("doc_id") % 3 + 1).cast("int"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.to_json(F.struct(F.col("lang"), F.col("source"))).alias("meta"),
    )


def resize_media(media: DataFrame, target_w: int = 16, target_h: int = 4) -> DataFrame:
    """STUB resize — nearest-neighbor BYTE sampling standing in for a real
    image resample (PIL/opencv are not in this container; swap
    ``_resize_stub`` for a real codec in prod — the Spark plumbing,
    schema, and batch shape are the real thing).

    Output payload is exactly ``target_w * target_h`` bytes sampled evenly
    from the source (``src[(i * n) // target_n]``) — deterministic, so the
    oracle replays it character-by-character with ``substr``.  Image rows
    only; empty payloads pass through empty.
    """
    target_n = target_w * target_h
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("src_bytes", T.LongType(), False),
            T.StructField("resized", T.BinaryType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, srcs, outs = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n = len(payload)
                ids.append(mid)
                srcs.append(n)
                if n == 0:
                    outs.append(b"")
                else:
                    outs.append(bytes(payload[(i * n) // target_n] for i in range(target_n)))
            yield pd.DataFrame({"media_id": ids, "src_bytes": srcs, "resized": outs})

    return media.where(F.col("kind") == "image").mapInPandas(run, schema=schema)
