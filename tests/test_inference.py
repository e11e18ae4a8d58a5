"""Closure / micro-reasoner tests: synthetic DAGs (diamond, two
roots — FIXTURES.md §F4 shape) with a pure-python oracle, plus
reasoners over the graphified testdata vs DuckDB."""

import pytest
from pyspark.sql import functions as F

from pidb_rdf_spark.inference import (
    get_nodes_with_label,
    get_rels,
    has_label_inferred,
    sub_closure,
    transitive_closure,
)
from tests.test_sparql_basic import oracle


def py_closure(pairs):
    """Oracle: naive python transitive closure."""
    out = set(pairs)
    changed = True
    while changed:
        changed = False
        for a, b in list(out):
            for c, d in list(out):
                if b == c and (a, d) not in out:
                    out.add((a, d))
                    changed = True
    return out


DAG = [
    # 5-level chain + diamond (B,C -> D) + disjoint second root
    ("B", "A"), ("C", "A"), ("D", "B"), ("D", "C"), ("E", "D"),
    ("F", "E"), ("X2", "X1"), ("X3", "X2"),
]


def test_closure_matches_python_oracle(spark):
    edges = spark.createDataFrame(DAG, ["child", "parent"])
    got = {(r["child"], r["parent"]) for r in transitive_closure(edges).collect()}
    assert got == py_closure(DAG)


def test_closure_cycle_terminates(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["child", "parent"]
    )
    got = {(r["child"], r["parent"]) for r in transitive_closure(edges).collect()}
    assert got == py_closure([("a", "b"), ("b", "c"), ("c", "a")])


def test_sub_closure(spark):
    h = spark.createDataFrame(
        [(c, p, "SLO") for c, p in DAG], ["child", "parent", "kind"]
    )
    subs = {r["name"] for r in sub_closure(h, "A").collect()}
    assert subs == {"A", "B", "C", "D", "E", "F"}


@pytest.fixture(scope="module")
def label_hierarchy(spark):
    return spark.createDataFrame(
        [
            ("Customer", "Actor", "SLO"),
            ("Supplier", "Actor", "SLO"),
            ("Nation", "Place", "SLO"),
            ("Region", "Place", "SLO"),
            ("IN_NATION", "LOCATED", "SRO"),
            ("IN_REGION", "LOCATED", "SRO"),
        ],
        ["child", "parent", "kind"],
    )


def test_get_nodes_with_label(graph, label_hierarchy):
    got = sorted(
        r["uri"] for r in get_nodes_with_label(graph, label_hierarchy, "Actor").collect()
    )
    want = sorted(
        r[0]
        for r in oracle(
            """SELECT 'urn:customer:' || c_custkey FROM customer
               UNION ALL SELECT 'urn:supplier:' || s_suppkey FROM supplier"""
        )
    )
    assert got == want


def test_get_rels_inferred(graph, label_hierarchy):
    n = get_rels(graph, label_hierarchy, "LOCATED").count()
    want = oracle(
        """SELECT (SELECT COUNT(*) FROM customer)
                + (SELECT COUNT(*) FROM supplier)
                + (SELECT COUNT(*) FROM nation)"""
    )[0][0]
    assert n == want


def test_has_label_inferred(graph, label_hierarchy):
    df = has_label_inferred(graph, label_hierarchy, "Place")
    rows = df.filter(F.col("has_label")).count()
    assert rows == 25 + 5  # nations + regions
