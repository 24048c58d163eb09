"""Corpus ingest/export boundary (sources.py): JSONL/CSV/text readers with
the safeIterator lenient contract, deterministic sharded export."""

from __future__ import annotations

import glob
import os
import re

import pytest
from py4j.protocol import Py4JJavaError

from scalligraph_spark.sources import (
    CORRUPT_COL,
    read_csv,
    read_jsonl,
    read_text_docs,
    split_corrupt,
    write_jsonl_shards,
)

DOCS_SCHEMA = "doc_id bigint, text string, lang string"


def _docs(spark):
    return spark.createDataFrame(
        [(i, f"text {i}", "en" if i % 2 == 0 else "fr") for i in range(40)],
        DOCS_SCHEMA,
    )


def test_jsonl_roundtrip_shards(spark, tmp_path):
    path = str(tmp_path / "drop")
    write_jsonl_shards(_docs(spark), path, n_shards=4, id_col="doc_id")
    files = glob.glob(os.path.join(path, "part-*"))
    assert 1 <= len(files) <= 4  # membership is deterministic; file count ≤ n_shards
    back = read_jsonl(spark, path, schema=DOCS_SCHEMA)
    clean, corrupt = split_corrupt(back)
    assert corrupt.collect() == []
    got = sorted(tuple(r) for r in clean.collect())
    want = sorted(tuple(r) for r in _docs(spark).collect())
    assert got == want


def test_jsonl_shard_membership_deterministic(spark, tmp_path):
    """md5(id)-hashed export: same doc → same shard index across re-runs,
    regardless of input partitioning (reproducible training-data drops)."""

    def membership(path, df):
        write_jsonl_shards(df, path, n_shards=3, id_col="doc_id")
        from pyspark.sql import functions as F

        rows = (
            read_jsonl(spark, path, schema=DOCS_SCHEMA)
            .withColumn("f", F.input_file_name())
            .select("doc_id", "f")
            .collect()
        )
        return {r["doc_id"]: int(re.search(r"part-(\d+)", r["f"]).group(1)) for r in rows}

    m1 = membership(str(tmp_path / "a"), _docs(spark))
    m2 = membership(str(tmp_path / "b"), _docs(spark).repartition(7))
    assert m1 == m2


def test_jsonl_lenient_quarantines_bad_lines(spark, tmp_path):
    p = tmp_path / "corpus.jsonl"
    lines = [
        '{"doc_id": 1, "text": "ok", "lang": "en"}',
        "{this is not json",
        '{"doc_id": 2, "text": "also ok", "lang": "fr"}',
        '[1, 2, 3]',  # valid JSON, wrong shape → quarantined too
    ]
    p.write_text("\n".join(lines) + "\n")
    df = read_jsonl(spark, str(p), schema=DOCS_SCHEMA, lenient=True)
    clean, corrupt = split_corrupt(df)
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 2]
    bad = [r[CORRUPT_COL] for r in corrupt.collect()]  # full-row collect: corrupt-only scans are disallowed
    assert len(bad) == 2 and "{this is not json" in bad


def test_jsonl_strict_aborts(spark, tmp_path):
    p = tmp_path / "corpus.jsonl"
    p.write_text('{"doc_id": 1, "text": "ok", "lang": "en"}\n{bad\n')
    df = read_jsonl(spark, str(p), schema=DOCS_SCHEMA, lenient=False)
    with pytest.raises(Py4JJavaError):
        df.collect()


def test_csv_lenient(spark, tmp_path):
    p = tmp_path / "corpus.csv"
    p.write_text("doc_id,text,lang\n1,hello,en\nnot_a_number,x,y\n2,world,fr\n")
    df = read_csv(spark, str(p), schema=DOCS_SCHEMA, header=True, lenient=True)
    clean, corrupt = split_corrupt(df)
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 2]
    assert len(corrupt.collect()) == 1


def test_read_text_whole_files(spark, tmp_path):
    (tmp_path / "a.txt").write_text("doc one\nline two")
    (tmp_path / "b.txt").write_text("doc two")
    df = read_text_docs(spark, str(tmp_path / "*.txt"), whole_files=True)
    rows = {os.path.basename(r["doc_path"]): r["text"] for r in df.collect()}
    assert rows == {"a.txt": "doc one\nline two", "b.txt": "doc two"}


def test_read_text_lines(spark, tmp_path):
    (tmp_path / "a.txt").write_text("l1\nl2\nl3")
    df = read_text_docs(spark, str(tmp_path / "a.txt"), whole_files=False)
    assert sorted(r["text"] for r in df.collect()) == ["l1", "l2", "l3"]


def test_jsonl_stream_ingest_quarantine(spark, tmp_path):
    """Streaming twin of the lenient read: identical quarantine semantics
    (shared parse_json_lines), clean and corrupt drains from one source."""
    from scalligraph_spark.streaming import jsonl_doc_stream, run_available_now

    src = tmp_path / "in"
    src.mkdir()
    (src / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en"}\n'
        "{broken line\n"
        '{"doc_id": 2, "text": "fine", "lang": "fr"}\n'
    )
    clean, corrupt = jsonl_doc_stream(spark, str(src), DOCS_SCHEMA, max_files_per_trigger=1)
    got_clean = run_available_now(clean, query_name="jsonl_clean", output_mode="append")
    got_corrupt = run_available_now(corrupt, query_name="jsonl_corrupt", output_mode="append")
    assert sorted(r["doc_id"] for r in got_clean.collect()) == [1, 2]
    assert [r[CORRUPT_COL] for r in got_corrupt.collect()] == ["{broken line"]


def test_jsonl_roundtrip_hostile_text(spark, tmp_path):
    """Embedded newlines/tabs/quotes/unicode/backslashes survive the
    export→import cycle byte-for-byte (JSON escaping handles them)."""
    hostile = [
        (1, 'line one\nline two\r\nthree'),
        (2, 'tab\there "quoted" back\\slash'),
        (3, 'unicode: héllø 世界 🚀  ls  ps'),
        (4, ''),
        (5, ' leading and trailing '),
    ]
    df = spark.createDataFrame(hostile, "doc_id long, text string")
    path = str(tmp_path / "hostile")
    write_jsonl_shards(df, path, n_shards=2, id_col="doc_id")
    back, corrupt = split_corrupt(
        read_jsonl(spark, path, schema="doc_id bigint, text string")
    )
    assert corrupt.collect() == []
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    assert got == dict(hostile)
