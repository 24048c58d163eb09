"""JSON query language (SURVEY.md §3.A): filters, sorts, aggregations,
and the chain-folding executor.

Reference: POST /api/v{n}/query accepts a JSON array of named steps folded
into one composed query (core/.../query/QueryExecutor.scala:17-171,
core/.../query/Query.scala:42-49).
"""

from scalligraph_spark.qlang.aggs import compile_aggregation
from scalligraph_spark.qlang.cache import QueryCache
from scalligraph_spark.qlang.executor import AuthorizationError, QueryExecutor
from scalligraph_spark.qlang.filters import compile_filter
from scalligraph_spark.qlang.sorts import compile_sort

__all__ = ["QueryExecutor", "QueryCache",
    "AuthorizationError", "compile_aggregation", "compile_filter", "compile_sort"]
