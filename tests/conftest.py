"""Shared fixtures: one local SparkSession + the reference's Modern test
graph (core-test/.../Modern.scala:13-42) rebuilt as label tables.

Modern graph: people marko(29) vadas(27) josh(32) peter(35), software
lop(java) ripple(java); knows edges marko→vadas(0.5) marko→josh(1.0);
created edges marko→lop(0.4) josh→ripple(1.0) josh→lop(0.4) peter→lop(0.2).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scalligraph_spark.catalog import EdgeSpec, GraphCatalog, VertexSpec
from scalligraph_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def modern(spark):
    """GraphCatalog over the Modern fixture (Modern.scala:13-42)."""
    person = spark.createDataFrame(
        [(1, "marko", 29), (2, "vadas", 27), (4, "josh", 32), (6, "peter", 35)],
        "person_id long, name string, age long",
    )
    software = spark.createDataFrame(
        [(3, "lop", "java"), (5, "ripple", "java")],
        "software_id long, name string, lang string",
    )
    knows = spark.createDataFrame(
        [(1, 2, 0.5), (1, 4, 1.0)],
        "src long, dst long, weight double",
    )
    created = spark.createDataFrame(
        [(1, 3, 0.4), (4, 5, 1.0), (4, 3, 0.4), (6, 3, 0.2)],
        "src long, dst long, weight double",
    )
    cat = GraphCatalog(spark)
    cat.add_vertex(VertexSpec("person", "person_id", lambda: person, name_col="name"))
    cat.add_vertex(VertexSpec("software", "software_id", lambda: software, name_col="name"))
    cat.add_edge(
        EdgeSpec(
            label="knows",
            src_label="person",
            dst_label="person",
            loader=lambda: knows,
            src_key="src",
            dst_key="dst",
            src_join_col="person_id",
            dst_join_col="person_id",
            kind="table",
        )
    )
    cat.add_edge(
        EdgeSpec(
            label="created",
            src_label="person",
            dst_label="software",
            loader=lambda: created,
            src_key="src",
            dst_key="dst",
            src_join_col="person_id",
            dst_join_col="software_id",
            kind="table",
        )
    )
    return cat


@pytest.fixture(scope="session")
def tpch(spark):
    from scalligraph_spark.catalog import tpch_catalog

    return tpch_catalog(spark, SF_DIR)
