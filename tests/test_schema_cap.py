"""Driver-memory guard for pathological schemaless corpora: every
schema-inventory collect (property keys, namespaces, predicates) is
capped at the top-K keys by frequency (VERDICT r2 "What's wrong" #4).
Overflow keys stay readable through the props map; overflow
namespaces stay unshortened."""

import warnings

import pytest
from pyspark.sql import functions as F

import pidb_rdf_spark.graph as G
from pidb_rdf_spark.sources.importer import discover_namespaces, import_triples
from pidb_rdf_spark.sources.rdf_reader import TRIPLES_SCHEMA


@pytest.fixture()
def low_cap(monkeypatch):
    monkeypatch.setattr(G, "MAX_SCHEMA_KEYS", 50)


def _pathological_triples(spark, n_keys=500):
    # one node, n_keys distinct property keys; key0 is the most
    # frequent (appears on a second node too)
    rows = [
        (f"urn:n:{i % 10}", f"urn:k:{i}", f"v{i}", True, None, None)
        for i in range(n_keys)
    ]
    rows.append(("urn:n:extra", "urn:k:0", "hot", True, None, None))
    return spark.createDataFrame(rows, TRIPLES_SCHEMA)


def test_prop_key_collect_capped(spark, low_cap):
    t = _pathological_triples(spark)
    g = import_triples(spark, t, shorten=False)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        fams = g.prop_type_families()
    assert len(fams) == 50
    assert any("prop_type_families" in str(x.message) for x in w)
    # most frequent key survives the cap
    assert "urn:k:0" in fams
    # overflow keys remain READABLE via the props map (family lost,
    # value intact)
    overflow = sorted(set(f"urn:k:{i}" for i in range(500)) - set(fams))[0]
    vals = {
        r[0]
        for r in g.nodes.select(g.node_prop(overflow)).collect()
        if r[0] is not None
    }
    assert len(vals) == 1

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        keys = g.node_prop_keys()
    assert len(keys) <= 51  # 50 map keys + hot columns (none here)


def test_namespace_collect_capped(spark, low_cap):
    rows = [
        (f"urn:s:{i}", f"http://ns{i}.example.org/p", "x", True, None, None)
        for i in range(200)
    ]
    # one frequent namespace that must survive
    rows += [
        (f"urn:s:{i}", "http://hot.example.org/p", "y", True, None, None)
        for i in range(5)
    ]
    t = spark.createDataFrame(rows, TRIPLES_SCHEMA)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ns = discover_namespaces(t, known={})
    assert len(ns) == 50
    assert "http://hot.example.org/" in ns
    assert any("discover_namespaces" in str(x.message) for x in w)
    # import with the capped registry: overflow IRIs stay unshortened
    g = import_triples(spark, t, namespaces=ns)
    some_keys = g.node_prop_keys()
    assert any(k.startswith("http://ns") for k in some_keys) or any(
        "__" in k for k in some_keys
    )


def test_edge_predicate_collect_capped(spark, low_cap):
    rows = [
        (f"urn:s:{i}", f"urn:p:{i % 80}", f"urn:o:{i}", False, None, None)
        for i in range(400)
    ]
    t = spark.createDataFrame(rows, TRIPLES_SCHEMA)
    g = import_triples(spark, t, shorten=False)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        preds = g.edge_predicate_names()
    assert len(preds) == 50
    assert any("edge_predicate_names" in str(x.message) for x in w)
