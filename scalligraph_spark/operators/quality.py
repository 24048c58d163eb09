"""Dataset-level data-quality audit: declarative constraints → ONE
aggregation pass → (check, column, metric, threshold, passed) report.

Complements the two existing validation tiers: ``writes.validate_rows``
quarantines individual BAD ROWS at write time (row-level CHECK
constraints), and the integrity tier finds structural defects
(duplicates/dangling/orphans, IntegrityCheckOps.scala:485-493 class).
What neither answers is the dataset-level question a pipeline gate asks
before promoting a table: "is this table ≥99% complete on these columns,
unique on its key, within bounds, and referentially closed?" — the
constraint-suite shape (Deequ / dbt-test / Delta expectations).

Scale design: every non-referential constraint compiles to ONE metric
expression inside a SINGLE ``agg`` over the table — completeness,
bounds, set-membership and pattern fractions are plain
conditional-sum/count arithmetic (map-side combined; one 1-row result),
and uniqueness is a ``count_distinct`` in the same pass.  The 1-row
result is unpivoted with ``stack``, exactly like
:func:`~scalligraph_spark.operators.summary.corr_matrix`.  Referential
checks each need their own join by nature — they run as a broadcast-or
hash LEFT join + the same 1-row agg, unioned into the report.  Nothing
collects driver-side; the report is a lazy DataFrame a caller can gate
on (``report.where(~F.col("passed")).isEmpty()``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["completeness", "uniqueness", "in_range", "in_set", "matches", "row_count", "referential", "run_quality_checks"]


def completeness(col: str, min_ratio: float = 1.0) -> dict:
    """Fraction of rows where ``col`` is non-null must be ≥ min_ratio."""
    return {"check": "completeness", "col": col, "min_ratio": float(min_ratio)}


def uniqueness(cols: list[str] | str, min_ratio: float = 1.0) -> dict:
    """distinct(cols)/rows must be ≥ min_ratio (1.0 = a candidate key)."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    return {"check": "uniqueness", "cols": cols, "min_ratio": float(min_ratio)}


def in_range(col: str, lo, hi, min_ratio: float = 1.0) -> dict:
    """Fraction of NON-NULL values inside [lo, hi] must be ≥ min_ratio."""
    return {"check": "in_range", "col": col, "lo": lo, "hi": hi, "min_ratio": float(min_ratio)}


def in_set(col: str, values: list, min_ratio: float = 1.0) -> dict:
    """Fraction of NON-NULL values in the allowed set must be ≥ min_ratio."""
    return {"check": "in_set", "col": col, "values": list(values), "min_ratio": float(min_ratio)}


def matches(col: str, regex: str, min_ratio: float = 1.0) -> dict:
    """Fraction of NON-NULL values matching the regex must be ≥ min_ratio."""
    return {"check": "matches", "col": col, "regex": regex, "min_ratio": float(min_ratio)}


def row_count(min_rows: int = 1) -> dict:
    """Table must hold at least ``min_rows`` rows."""
    return {"check": "row_count", "min_rows": int(min_rows)}


def referential(col: str, ref: DataFrame, ref_col: str, min_ratio: float = 1.0) -> dict:
    """Fraction of NON-NULL foreign keys present in ``ref.ref_col`` must
    be ≥ min_ratio (1.0 = referentially closed)."""
    return {"check": "referential", "col": col, "ref": ref, "ref_col": ref_col, "min_ratio": float(min_ratio)}


def _nn_ratio(cond, col) -> F.Column:
    """sum(cond over non-null col) / count(col non-null); 1.0 for an
    all-null column (no evaluable value violates the constraint — the
    completeness check is the one that judges nulls)."""
    num = F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))).cast("double")
    den = F.count(col).cast("double")
    return F.when(den == 0, F.lit(1.0)).otherwise(num / den)


def run_quality_checks(df: DataFrame, checks: list[dict]) -> DataFrame:
    """Evaluate every constraint; returns the lazy report
    ``(check, column, metric, threshold, passed)`` — one row per
    constraint, metrics rounded to 12 decimals for engine-portable
    comparison.  All non-referential constraints share ONE aggregation
    pass; each referential constraint adds one left join + agg, unioned
    in."""
    if not checks:
        raise ValueError("run_quality_checks: at least one check required")
    aggs, rows = [], []  # rows: (check, column, threshold) per agg slot
    ref_checks = []
    for c in checks:
        kind = c["check"]
        if kind == "completeness":
            col = F.col(c["col"])
            aggs.append((F.count(col).cast("double") / F.count(F.lit(1)).cast("double")))
            rows.append(("completeness", c["col"], c["min_ratio"]))
        elif kind == "uniqueness":
            cols = [F.col(x) for x in c["cols"]]
            aggs.append(F.count_distinct(*cols).cast("double") / F.count(F.lit(1)).cast("double"))
            rows.append(("uniqueness", ",".join(c["cols"]), c["min_ratio"]))
        elif kind == "in_range":
            col = F.col(c["col"])
            aggs.append(_nn_ratio(col.between(F.lit(c["lo"]), F.lit(c["hi"])), col))
            rows.append(("in_range", c["col"], c["min_ratio"]))
        elif kind == "in_set":
            col = F.col(c["col"])
            aggs.append(_nn_ratio(col.isin(c["values"]), col))
            rows.append(("in_set", c["col"], c["min_ratio"]))
        elif kind == "matches":
            col = F.col(c["col"])
            aggs.append(_nn_ratio(col.rlike(c["regex"]), col))
            rows.append(("matches", c["col"], c["min_ratio"]))
        elif kind == "row_count":
            aggs.append(F.count(F.lit(1)).cast("double"))
            rows.append(("row_count", "*", float(c["min_rows"])))
        elif kind == "referential":
            ref_checks.append(c)
        else:
            raise ValueError(f"unknown check kind {kind!r}")

    parts = []
    if aggs:
        one = df.agg(*[a.alias(f"__m{i}") for i, a in enumerate(aggs)])
        stack_args = ", ".join(
            f"'{k}', '{col}', __m{i}, CAST({thr} AS DOUBLE)" for i, (k, col, thr) in enumerate(rows)
        )
        parts.append(
            one.select(
                F.expr(f"stack({len(rows)}, {stack_args}) AS (check, column, metric, threshold)")
            )
        )
    for c in ref_checks:
        col, ref, ref_col = c["col"], c["ref"], c["ref_col"]
        keys = ref.select(F.col(ref_col).alias(col)).distinct().withColumn("__hit", F.lit(1))
        joined = df.select(col).join(keys, col, "left")
        m = joined.agg(
            _nn_ratio(F.col("__hit").isNotNull(), F.col(col)).alias("metric")
        )
        parts.append(
            m.select(
                F.lit("referential").alias("check"),
                F.lit(f"{col}->{ref_col}").alias("column"),
                F.col("metric"),
                F.lit(float(c["min_ratio"])).cast("double").alias("threshold"),
            )
        )
    report = parts[0]
    for p in parts[1:]:
        report = report.unionByName(p)
    return report.select(
        "check",
        "column",
        F.round(F.col("metric"), 12).alias("metric"),
        "threshold",
        (F.round(F.col("metric"), 12) >= F.col("threshold")).alias("passed"),
    )
