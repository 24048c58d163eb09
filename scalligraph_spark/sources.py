"""Text-format corpus ingest / export: JSONL, CSV, raw text files.

Reference scope: the reference ingests elements over HTTP JSON — the
FieldsParser tier validates each record and `tryTransaction` commits it
(core/.../controllers/Fields.scala:12-95, FieldsParser usage in every
service); bulk *file* ingest is outside its surface.  At 100 TB the data
arrives as jsonl(.gz) / csv / raw-text shards, so this module is that
boundary for the Spark engine, carrying over the reference's two relevant
contracts:

* **safeIterator at the file boundary** — a bad line must not abort a
  100 TB job (TraversalOps.scala:56-87 skips unconvertible rows; here
  `mode=PERMISSIVE` + `columnNameOfCorruptRecord` quarantines them into a
  side column instead).  `split_corrupt` separates clean rows from the
  quarantine so pipelines can count/inspect rejects — the renderers'
  `RenderStats` idea applied to ingest.
* **schema-first** — like the FieldsParser tier, readers take an explicit
  schema; schema inference is a convenience for exploration only (it costs
  an extra full pass over the files and can mis-type sparse columns, both
  unacceptable at scale).

Scale notes:
* `spark.read.json` / `.csv` / `.text` are splittable distributed scans for
  uncompressed, bzip2 or zstd-seekable inputs; `.gz` shards are ONE SPLIT
  each — a corpus of 4 huge .gz files runs on 4 cores no matter the
  cluster.  Shard counts are a data-layout decision, hence
  `write_jsonl_shards(n_shards=...)` on the export side.
* Readers never infer when a schema is given → single pass, predicate
  pushdown for csv via the Univocity parser, column pruning everywhere.
* Export repartitions BY HASH of an id column (deterministic shard
  membership, same md5 idiom as pipeline.split_corpus) rather than
  round-robin, so re-runs produce identical shards — reproducible
  training-data drops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    """PERMISSIVE mode only materializes the quarantine column if it is part
    of the declared schema — append it (reader contract since Spark 2.3)."""
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)])


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    lenient: bool = True,
) -> DataFrame:
    """Read newline-delimited JSON (the LLM-corpus interchange format).

    ``lenient=True`` (default) is the safeIterator contract: malformed
    lines land in ``_corrupt_record`` with every data column null, the job
    never aborts.  ``lenient=False`` is FAILFAST — first bad line raises
    (strict validation runs, e.g. re-reading a corpus this engine wrote).

    With no ``schema`` Spark samples the files to infer one (extra pass —
    exploration only; corrupt-record quarantine requires an explicit
    schema, so inference implies DROPMALFORMED-like nulls instead).

    Implementation note: the lenient path deliberately does NOT use the
    json datasource's ``columnNameOfCorruptRecord`` — Spark rejects any
    plan whose file scan reads only that internal column
    (``UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN``), which
    breaks even a bare ``clean.count()`` after the quarantine split.
    Instead it is a plain ``text`` scan + ``from_json`` — a fully
    relational plan with no special-column semantics, same single pass
    (a json line scan reads whole lines either way, so nothing is lost
    to pushdown), and every downstream query shape works.
    """
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if schema is None:
        # exploration: native reader + inference pass
        return spark.read.option("mode", "PERMISSIVE").json(path)
    if not lenient:
        return spark.read.schema(schema).option("mode", "FAILFAST").json(path)
    return parse_json_lines(spark.read.text(path), schema)


def parse_json_lines(lines: DataFrame, schema: T.StructType | str) -> DataFrame:
    """Relational JSONL parse with quarantine over a ``value: string``
    DataFrame — shared by batch (`read_jsonl`) and streaming
    (`streaming.jsonl_doc_stream`) so both boundaries have IDENTICAL
    lenient semantics.  Pure expressions (filter + from_json + projections):
    works unchanged under Structured Streaming."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    parsed = (
        lines.filter(F.trim(F.col("value")) != "")  # the json source skips blank lines; match it
        .select(
            F.col("value"),
            F.from_json(
                F.col("value"),
                _with_corrupt(schema),
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
            ).alias("__r"),
        )
    )
    # total parse failure → null struct (quarantine the raw line); partial
    # failure → struct carries the raw line in its corrupt field
    corrupt = F.when(F.col("__r").isNull(), F.col("value")).otherwise(F.col("__r")[CORRUPT_COL])
    return parsed.select(
        *[F.col("__r")[f.name].alias(f.name) for f in schema.fields],
        corrupt.alias(CORRUPT_COL),
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    lenient: bool = True,
    **options: str,
) -> DataFrame:
    """CSV ingest with the same lenient/strict contract as `read_jsonl`.

    Uses the native csv reader (header handling, Univocity parser), so the
    `split_corrupt` caveat applies: don't run a bare ``.count()`` over a
    lenient read's quarantine — Spark disallows corrupt-column-only scans.
    """
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(_with_corrupt(schema) if lenient else schema)
    reader = reader.option("mode", "PERMISSIVE" if lenient else "FAILFAST")
    if lenient and schema is not None:
        reader = reader.option("columnNameOfCorruptRecord", CORRUPT_COL)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_text_docs(spark: SparkSession, path: str, whole_files: bool = True) -> DataFrame:
    """Raw text → document rows.

    ``whole_files=True``: one row per FILE (``doc_path``, ``text``) — the
    one-document-per-file crawl layout.  Whole-file reads are not
    splittable (each file is one task), which is the correct trade: a
    document must land in one row.  ``whole_files=False``: one row per
    LINE with its source path — splittable, for line-oriented corpora.
    """
    if whole_files:
        df = spark.read.text(path, wholetext=True)
        return df.select(
            F.input_file_name().alias("doc_path"),
            F.col("value").alias("text"),
        )
    return spark.read.text(path).select(
        F.input_file_name().alias("doc_path"),
        F.col("value").alias("text"),
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Separate clean rows from the PERMISSIVE quarantine.

    Returns ``(clean, corrupt)``: clean rows with the quarantine column
    dropped, corrupt rows with ALL columns (partial parses keep whatever
    fields did parse, plus the raw line).  Both are plain filters over the
    same scan — Catalyst shares it.

    Caveat — native-reader inputs only (``read_csv``): Spark rejects a
    plan whose csv/json file scan reads ONLY the internal quarantine
    column (``UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN``), so
    a bare ``.count()`` on either side of a native PERMISSIVE read
    raises; select a data column too, or persist first.  ``read_jsonl``'s
    lenient path builds the quarantine relationally (text + from_json)
    and has no such restriction — every query shape works.
    """
    if CORRUPT_COL not in df.columns:
        return df, df.sparkSession.createDataFrame(
            [], T.StructType([T.StructField(CORRUPT_COL, T.StringType(), True)])
        )
    # Spark's PERMISSIVE contract: corrupt rows carry the raw line in the
    # quarantine column; a row can also be PARTIALLY corrupt (some fields
    # parsed) — it still carries the raw line, so the filter is exact.
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    corrupt = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, corrupt


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str | None = None,
    compression: str | None = None,
) -> None:
    """Export as n_shards JSONL files (the training-data drop format).

    ``id_col`` given → deterministic shard membership by md5(id) % n_shards
    (same portable idiom as pipeline.split_corpus; re-runs produce
    identical shard membership regardless of input partitioning).  Note
    the file count is AT MOST n_shards: shard values are hash-distributed
    over n_shards write tasks, so two shard values can land in one task
    (and an empty task writes no file) — membership, not file layout, is
    the deterministic contract.  Without ``id_col``, plain repartition(n)
    round-robins — balanced but run-dependent.  ``compression``:
    'gzip'|'zstd'|... (remember: gzip shards are one split each on
    re-read).
    """
    if id_col is not None:
        shard = (
            F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
            .cast("bigint") % n_shards
        ).cast("int")
        out = df.repartition(n_shards, shard)
    else:
        out = df.repartition(n_shards)
    writer = out.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
