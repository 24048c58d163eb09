"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed via Arrow-batched Pandas UDFs.

Decode tiers (pick with ``extract_features(decoder=...)``):

* ``"real"`` — actual byte decoding: PIL when installed, else pure-stdlib
  codecs (``_decode_png``: full spec-filter 8-bit PNG via zlib;
  ``_decode_wav``: stdlib ``wave``), else the stub fallback.  Tested
  against hand-built PNGs/WAVs byte-exactly (tests/test_operators.py).
* ``"stub"`` — the deterministic fake (``_decode_stub``, clearly marked):
  the cross-engine-replayable path the suite oracle verifies, and the
  stand-in for codecs the container lacks (video/JPEG → ffmpeg/PIL in
  prod).

Everything Spark-side — schema, batch iteration, partitioning, output
shapes — is identical across tiers; swapping decoders never touches the
plan.

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


# -- real codecs (stdlib-only fallbacks; PIL used when installed) -------------


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _decode_png(payload: bytes) -> dict | None:
    """Minimal REAL PNG decoder — pure stdlib (zlib + struct), no PIL
    needed: non-interlaced 8-bit gray/RGB/RGBA/gray+alpha, all five scanline
    filters (None/Sub/Up/Average/Paeth per the PNG spec §9).  Returns
    (width, height, 8-bin luminance histogram) or None when the payload is
    not a supported PNG.  The luminance histogram (ITU-R BT.601 weights,
    integer-truncated — identical on every platform) is the deterministic
    stand-in for a model embedding; swap the feature fn, keep the decode.
    """
    import struct
    import zlib

    if len(payload) < 8 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, w = 8, None
    idat = b""
    try:
        while pos + 8 <= len(payload):
            ln, typ = struct.unpack(">I4s", payload[pos : pos + 8])
            data = payload[pos + 8 : pos + 8 + ln]
            if typ == b"IHDR":
                w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", data)
                if depth != 8 or interlace != 0 or color not in (0, 2, 4, 6):
                    return None
                ch = {0: 1, 2: 3, 4: 2, 6: 4}[color]
            elif typ == b"IDAT":
                idat += data
            elif typ == b"IEND":
                break
            pos += 12 + ln  # len + type + data + crc
        if w is None or not idat:
            return None
        raw = zlib.decompress(idat)
    except Exception:
        return None
    stride = w * ch
    if len(raw) < h * (stride + 1):
        return None
    prev = bytearray(stride)
    hist = [0] * 8
    off = 0
    for _y in range(h):
        f = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        off += stride + 1
        if f == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif f != 0:
            return None
        for x in range(0, stride, ch):
            if ch >= 3:
                lum = (299 * line[x] + 587 * line[x + 1] + 114 * line[x + 2]) // 1000
            else:
                lum = line[x]
            hist[lum >> 5] += 1
        prev = line
    total = max(sum(hist), 1)
    return {"n_bytes": len(payload), "width": w, "height": h, "feature": [v / total for v in hist]}


def _decode_wav(payload: bytes) -> dict | None:
    """Minimal REAL WAV decoder — stdlib ``wave``: frame count / channels /
    sample width, plus an 8-bin absolute-amplitude histogram over the
    first 4096 samples (16-bit PCM).  Returns None for non-WAV payloads.
    ``width`` carries n_channels and ``height`` the sample width in bits —
    the schema's typed-metadata slots for non-image media."""
    import io
    import struct
    import wave

    try:
        with wave.open(io.BytesIO(payload)) as wf:
            nch, sw, rate, nframes = (
                wf.getnchannels(),
                wf.getsampwidth(),
                wf.getframerate(),
                wf.getnframes(),
            )
            frames = wf.readframes(min(nframes, 4096))
    except Exception:
        return None
    hist = [0] * 8
    if sw == 2:
        n = len(frames) // 2
        for (s,) in struct.iter_unpack("<h", frames[: 2 * n]):
            hist[min(abs(s) >> 12, 7)] += 1
    else:  # 8-bit unsigned PCM
        for b in frames:
            hist[b >> 5] += 1
    total = max(sum(hist), 1)
    return {
        "n_bytes": len(payload),
        "width": nch,
        "height": sw * 8,
        "feature": [v / total for v in hist],
    }


def _decode_real(payload: bytes, kind: str) -> dict:
    """REAL decode path: PIL when installed (any format), else the
    stdlib PNG/WAV decoders, else fall back to the clearly-fake stub so a
    mixed corpus with unsupported payloads degrades loudly-documented
    rather than crashing a 100 TB job (quarantine upstream if that
    matters — `validate_rows` composes)."""
    try:  # pragma: no cover - PIL absent in this container
        import io

        from PIL import Image  # type: ignore

        if kind == "image":
            img = Image.open(io.BytesIO(payload)).convert("L")
            hist = [0] * 8
            for px in img.getdata():
                hist[px >> 5] += 1
            total = max(sum(hist), 1)
            return {
                "n_bytes": len(payload),
                "width": img.width,
                "height": img.height,
                "feature": [v / total for v in hist],
            }
    except Exception:
        # ImportError (no PIL) — but ALSO UnidentifiedImageError/OSError/
        # ValueError on corrupt or unsupported payloads: a 100 TB corpus
        # WILL contain broken bytes, and one bad row must degrade to the
        # stdlib decoders / stub below, never crash the job
        pass
    if kind == "image":
        out = _decode_png(payload)
        if out is not None:
            return out
    if kind == "audio":
        out = _decode_wav(payload)
        if out is not None:
            return out
    return _decode_stub(payload, kind)


_DECODERS = {"stub": _decode_stub, "real": _decode_real}


def extract_features(media: DataFrame, decoder: str = "stub") -> DataFrame:
    """Decode + featurize media rows via Arrow-batched ``mapInPandas``.

    ``decoder="stub"`` (default) keeps the deterministic fake — the
    cross-engine-replayable path the suite oracle verifies.
    ``decoder="real"`` decodes actual bytes: PIL when installed, else the
    pure-stdlib PNG/WAV decoders (tests decode real tiny PNGs/WAVs
    byte-exactly), falling back to the stub for unsupported payloads.
    Either way the Spark shape is identical: binary stays in Arrow
    batches, map-only, no shuffle."""
    if decoder not in _DECODERS:
        raise ValueError(f"unknown decoder {decoder!r}; use 'stub' or 'real'")
    decode = _DECODERS[decoder]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode(p, k) for p, k in zip(pdf["payload"], pdf["kind"])]
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
