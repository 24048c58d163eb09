"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The actual suite lives in ``scalligraph_spark/suite.py`` — one entry per
implemented operator from SURVEY.md §2 plus the LLM-data-pipeline operators;
this module only adapts it to the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: Q1-shaped pricing summary
    through the traversal surface; driver checks rows>0."""
    from scalligraph_spark.suite import SUITE

    return SUITE["q1_pricing_summary"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from scalligraph_spark.suite import SUITE

    return {name: q.spark for name, q in SUITE.items()}


def oracle_sql() -> dict[str, str]:
    from scalligraph_spark.suite import SUITE

    return {name: q.sql for name, q in SUITE.items() if q.sql is not None}


def bounds_sql() -> dict[str, str]:
    """OPTIONAL extension the driver ignores: for sketch-backed entries
    with no bit-identical SQL twin, DuckDB SQL whose exact columns compare
    exactly and whose ``<col>_lo``/``<col>_hi`` pairs must bracket the
    Spark result — the sketch's published error bound, asserted by
    tools/check.py as a distinct ``bound`` tier."""
    from scalligraph_spark.suite import SUITE

    return {name: q.bounds_sql for name, q in SUITE.items() if q.bounds_sql is not None}
