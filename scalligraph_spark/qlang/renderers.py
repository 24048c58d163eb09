"""Output renderers: DataFrame results → the reference's JSON shapes.

Reference: output type → Renderer resolution
(core/.../query/QueryExecutor.scala:64-113, traversal/Output.scala), and the
aggregation JSON folding (Aggregation.scala:369-399 — ``field`` renders
``{"<key>": {"<subagg>": value, ...}, ...}``); golden expectations in
core-test/.../QueryTest.scala:63-104.

These run driver-side on already-small results (aggregation outputs, pages)
— never on the full dataset.
"""

from __future__ import annotations

import datetime as _dt
import json
from typing import Any

from pyspark.sql import DataFrame


def _json_value(v: Any) -> Any:
    if isinstance(v, _dt.datetime):
        # the reference renders dates as epoch millis (java.util.Date)
        return int(v.timestamp() * 1000)
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        import base64

        return base64.b64encode(v).decode()
    return v


class RenderStats:
    """Skip counter for lenient rendering (safeIterator analog)."""

    def __init__(self):
        self.skipped = 0


def _convert_row(row, convert) -> dict:
    d = {k: _json_value(v) for k, v in row.asDict(recursive=True).items()}
    return convert(d) if convert is not None else d


def render_rows(df: DataFrame, convert=None, lenient: bool = False, stats: RenderStats | None = None) -> list[dict]:
    """Traversal results → list of JSON objects (chunked-array analog).

    ``convert`` is the per-row domain conversion hook (the reference's
    ``UMapping.toDomain`` applied during iteration).  With
    ``lenient=True`` this is the safeIterator contract
    (core/.../traversal/TraversalOps.scala:56-87): a row whose conversion
    fails is SKIPPED (and counted on ``stats``) instead of aborting the
    whole result — lenient reads over drifted data, which the reference
    explicitly supports (NoValue defaults, models/Mapping.scala:179-186).
    Strict mode (the default) raises on the first bad row.
    """
    out: list[dict] = []
    for row in df.collect():
        try:
            out.append(_convert_row(row, convert))
        except Exception:
            if not lenient:
                raise
            if stats is not None:
                stats.skipped += 1
    return out


def render_grouped(df: DataFrame, key: str) -> dict:
    """``field``/``time`` aggregation → map key → sub-agg map
    (QueryTest.scala:63-104's ``{"27": {"count": 1}}`` shape)."""
    out: dict = {}
    for row in df.collect():
        d = row.asDict(recursive=True)
        k = _json_value(d.pop(key))
        out[str(k)] = {name: _json_value(v) for name, v in d.items()}
    return out


def render_stream(df: DataFrame, chunk_size: int = 1000, convert=None, lenient: bool = False, stats: RenderStats | None = None):
    """Streamed result chunks (IteratorOutput / chunked-JSON analog,
    traversal/IteratorOutput.scala:7-15, JanusDatabase.scala:191-209):
    yields lists of JSON objects via ``toLocalIterator`` — partitions are
    fetched incrementally, so the driver never holds the full result.
    ``lenient`` skips (and counts) conversion failures mid-stream instead
    of aborting — the safeIterator contract (TraversalOps.scala:56-87)."""
    chunk: list[dict] = []
    for row in df.toLocalIterator():
        try:
            chunk.append(_convert_row(row, convert))
        except Exception:
            if not lenient:
                raise
            if stats is not None:
                stats.skipped += 1
            continue
        if len(chunk) >= chunk_size:
            yield chunk
            chunk = []
    if chunk:
        yield chunk


def render_scalar(df: DataFrame):
    """count/sum/… → bare value; empty aggregation renders null
    (Aggregation.scala:208,231-239)."""
    rows = df.collect()
    if not rows:
        return None
    return _json_value(rows[0][0])


def to_json(obj: Any) -> str:
    return json.dumps(obj, sort_keys=False, separators=(",", ":"))
