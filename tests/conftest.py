import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from pidb_rdf_spark.session import get_spark

    s = get_spark("pidb-rdf-spark-tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def graph(spark):
    from pidb_rdf_spark.graph import graphify

    g = graphify(spark, SF_DIR)
    g.nodes = g.nodes.cache()
    g.edges = g.edges.cache()
    return g
