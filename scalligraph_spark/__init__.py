"""scalligraph_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of TheHive-Project/ScalliGraph.

The reference (see /root/reference, SURVEY.md) is a typed graph-database
framework executing Gremlin traversals on JanusGraph. This engine computes the
same results with idiomatic Spark: entities are columnar label tables
(``nodes_<L>`` / ``edges_<L>``), traversal steps are DataFrame transformations,
graph hops are equi-joins, and the declarative JSON query language compiles to
Catalyst plans.

Layout (SURVEY.md §7.1):
  model.py       typed entity models + audit envelope        (§1)
  catalog.py     label → table registry, FK edges, versions  (§1.3)
  traversal.py   the ~90-operator traversal DSL              (§2)
  properties.py  public-property registry                    (§2.2/2.11)
  qlang/         JSON query language (filters/sorts/aggs)    (§2.3/2.5/2.6, §3.A)
  writes.py      create/update/delete with audit stamping    (§3.B.4)
  integrity.py   dedup + link integrity checks               (§2.11-adjacent)
  migrations.py  schema-versioned Operation set (all 10 kinds)  (§3.B.5)
  fields.py      Field tree + FieldsParser validation tier    (§2.10)
  eventsrv.py    pub/sub commit notifications                 (§2.9)
  store.py       versioned label storage: snapshot swap, compaction, Z-order
  stats.py       ANALYZE tier: one-pass column stats, stored row-count hints
  sources.py     corpus ingest/export: JSONL/CSV/text, lenient quarantine
  profiling.py   runtime per-operator metrics (TraversalPrinter PROFILE)
  blobs.py       chunked binary blob storage (FS/HDFS/S3)
  operators/     scale operators: dedup, similarity, temporal joins,
                 corpus pipeline, multimodal, graph analytics
  functions/     scalar function library (text, vectors, hashing)
  streaming/     structured-streaming surface (windows, dedup, joins, state)
"""

from scalligraph_spark.catalog import EdgeSpec, GraphCatalog, VertexSpec, tpch_catalog
from scalligraph_spark.eventsrv import EventSrv
from scalligraph_spark.fields import AttributeCheckingError, FieldsParser, validate_chain
from scalligraph_spark.migrations import Operations, SchemaUpdater, VersionStore
from scalligraph_spark.model import AUDIT_COLUMNS, EntityModel, FieldSpec
from scalligraph_spark.properties import PublicProperties, PublicProperty
from scalligraph_spark.session import get_spark
from scalligraph_spark.store import LabelStore
from scalligraph_spark.traversal import P, SortBy, TextP, Traversal
from scalligraph_spark.config import ApplicationConfig, BadConfigurationError
from scalligraph_spark.auth import (
    AuthContext,
    AuthenticationError,
    HeaderAuthSrv,
    KeyAuthSrv,
    DirectoryAuthSrv,
    MultiAuthSrv,
    OAuth2AuthSrv,
    PasswordAuthSrv,
    PkiAuthSrv,
    SessionAuthSrv,
)
from scalligraph_spark.writes import WriteConflictError, WriteSession, try_transaction
from scalligraph_spark.graphql import GraphQLError, GraphQLSchema, generate_schema

__all__ = [
    "GraphQLError",
    "GraphQLSchema",
    "generate_schema",
    "AUDIT_COLUMNS",
    "AttributeCheckingError",
    "EventSrv",
    "FieldsParser",
    "Operations",
    "WriteSession",
    "AuthContext",
    "ApplicationConfig",
    "BadConfigurationError",
    "AuthenticationError",
    "DirectoryAuthSrv",
    "OAuth2AuthSrv",
    "PasswordAuthSrv",
    "PkiAuthSrv",
    "HeaderAuthSrv",
    "KeyAuthSrv",
    "SessionAuthSrv",
    "MultiAuthSrv",
    "WriteConflictError",
    "try_transaction",
    "validate_chain",
    "EdgeSpec",
    "EntityModel",
    "FieldSpec",
    "GraphCatalog",
    "LabelStore",
    "P",
    "PublicProperties",
    "PublicProperty",
    "SchemaUpdater",
    "SortBy",
    "TextP",
    "Traversal",
    "VersionStore",
    "VertexSpec",
    "get_spark",
    "tpch_catalog",
]

__version__ = "0.1.0"
