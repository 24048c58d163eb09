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


def render_rows(df: DataFrame) -> list[dict]:
    """Traversal results → list of JSON objects (chunked-array analog)."""
    return [{k: _json_value(v) for k, v in row.asDict(recursive=True).items()} for row in df.collect()]


def render_grouped(df: DataFrame, key: str) -> dict:
    """``field``/``time`` aggregation → map key → sub-agg map
    (QueryTest.scala:63-104's ``{"27": {"count": 1}}`` shape)."""
    out: dict = {}
    for row in df.collect():
        d = row.asDict(recursive=True)
        k = _json_value(d.pop(key))
        out[str(k)] = {name: _json_value(v) for name, v in d.items()}
    return out


def render_stream(df: DataFrame, chunk_size: int = 1000):
    """Streamed result chunks (IteratorOutput / chunked-JSON analog,
    traversal/IteratorOutput.scala:7-15, JanusDatabase.scala:191-209):
    yields lists of JSON objects via ``toLocalIterator`` — partitions are
    fetched incrementally, so the driver never holds the full result."""
    chunk: list[dict] = []
    for row in df.toLocalIterator():
        chunk.append({k: _json_value(v) for k, v in row.asDict(recursive=True).items()})
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
