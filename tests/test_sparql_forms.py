"""SPARQL 1.1 query forms beyond SELECT: ASK, CONSTRUCT, DESCRIBE
(§16). The reference's query surface is SELECT-only
(``SparqlToGremlinCompiler.java``), but its describe REST endpoints
(``RDFEndpoint.java:206-291``) are DESCRIBE semantics — these forms
close the standard surface."""

import duckdb

from pidb_rdf_spark.sparql import sparql
from tests.conftest import SF_DIR


def oracle(sql: str):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "orders"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.execute(sql).fetchall()


# ---- ASK ------------------------------------------------------------------


def test_ask_true_false(graph):
    assert sparql(graph, 'ASK { ?c v:c_mktsegment "BUILDING" }').collect()[0].ask
    assert not sparql(graph, 'ASK { ?c v:c_mktsegment "NOPE" }').collect()[0].ask


def test_ask_empty_pattern_is_true(graph):
    # the empty group is matched by the empty solution (W3C semantics)
    assert sparql(graph, "ASK { }").collect()[0].ask


def test_ask_with_filter(graph):
    assert sparql(
        graph, "ASK { ?o v:o_totalprice ?t . FILTER(?t > 100000) }"
    ).collect()[0].ask
    assert not sparql(
        graph, "ASK { ?o v:o_totalprice ?t . FILTER(?t > 1000000000) }"
    ).collect()[0].ask


# ---- CONSTRUCT ------------------------------------------------------------


def test_construct_derived_edge(graph):
    rows = sparql(
        graph,
        'CONSTRUCT { ?c e:IN_REGION ?r } WHERE { ?c v:label "Customer" . '
        "?c e:IN_NATION/e:IN_REGION ?r }",
    ).collect()
    exp = oracle(
        """
        SELECT DISTINCT 'urn:customer:' || CAST(c_custkey AS VARCHAR),
               'urn:region:' || CAST(n_regionkey AS VARCHAR)
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        """
    )
    assert sorted((r.subject, r.object) for r in rows) == sorted(exp)
    assert all(r.predicate == "IN_REGION" and not r.is_literal for r in rows)


def test_construct_multi_template_and_literal_flag(graph):
    rows = sparql(
        graph,
        "CONSTRUCT { ?c v:segment ?seg . ?c a <urn:Buyer> } WHERE "
        "{ ?c v:c_mktsegment ?seg }",
    ).collect()
    n_cust = oracle("SELECT COUNT(*) FROM customer")[0][0]
    lit = [r for r in rows if r.is_literal]
    typ = [r for r in rows if not r.is_literal]
    assert len(lit) == n_cust and all(r.predicate == "segment" for r in lit)
    assert len(typ) == n_cust and all(r.object == "urn:Buyer" for r in typ)


def test_construct_is_set_of_triples(graph):
    # two customers in the same nation → one distinct (nation, region) triple
    rows = sparql(
        graph,
        "CONSTRUCT { ?n e:IN_REGION ?r } WHERE { ?c e:IN_NATION ?n . "
        "?n e:IN_REGION ?r }",
    ).collect()
    n_nations = oracle(
        "SELECT COUNT(DISTINCT c_nationkey) FROM customer"
    )[0][0]
    assert len(rows) == n_nations


# ---- DESCRIBE -------------------------------------------------------------


def test_describe_iri_matches_describe_api(graph):
    from pidb_rdf_spark.sources.rdf_writer import describe

    via_query = sparql(graph, "DESCRIBE <urn:region:1>").collect()
    via_api = describe(graph, uri="urn:region:1").collect()
    assert sorted(map(tuple, via_query)) == sorted(map(tuple, via_api))
    assert len(via_query) > 0


def test_describe_no_duplicate_property_triples(graph):
    rows = sparql(graph, "DESCRIBE <urn:region:1>").collect()
    keyed = [(r.subject, r.predicate, r.object) for r in rows]
    assert len(keyed) == len(set(keyed))


def test_describe_var_where(graph):
    rows = sparql(
        graph, 'DESCRIBE ?n WHERE { ?n v:label "Region" . ?n v:r_name "ASIA" }'
    ).collect()
    # region props + rdf:type + incoming IN_REGION edges from its nations
    subjects = {r.subject for r in rows}
    n_nations = oracle(
        "SELECT COUNT(*) FROM nation JOIN region ON n_regionkey = r_regionkey "
        "WHERE r_name = 'ASIA'"
    )[0][0]
    edge_rows = [r for r in rows if not r.is_literal and "IN_REGION" in r.predicate]
    assert len(edge_rows) == n_nations
    assert any(s.startswith("urn:region:") for s in subjects)


def test_describe_multiple_targets(graph):
    one = sparql(graph, "DESCRIBE <urn:region:1>").count()
    two = sparql(graph, "DESCRIBE <urn:region:1> <urn:region:2>").count()
    assert two > one


def test_sparql_update_on_importless_graph(spark):
    """sparql_update works on graphs built OUTSIDE the RDF importer
    (graphify/manual PropertyGraph — no namespace registry): the
    merge seeds an empty registry instead of crashing on None (r12)."""
    from tests.conftest import SF_DIR

    from pidb_rdf_spark.graph import graphify
    from pidb_rdf_spark.sparql import sparql_update

    g = graphify(spark, SF_DIR)
    assert g.namespaces is None  # the precondition that crashed
    g2 = sparql_update(
        g, "INSERT DATA { <urn:x:1> <urn:p:likes> <urn:x:2> }"
    )
    assert g2.edges.filter("predicate like '%likes%'").count() == 1
    g3 = sparql_update(
        g2,
        "DELETE { ?s <urn:p:likes> ?o } INSERT { ?o <urn:p:likedBy> ?s } "
        "WHERE { ?s <urn:p:likes> ?o }",
    )
    # the probe edge flipped direction under the new predicate
    assert g3.edges.filter("predicate like '%likedBy%'").count() >= 1


def test_construct_unbound_template_var_drops_triple(spark):
    """W3C section 10.2: a template triple with a variable the WHERE
    never binds produces no triples (not an analysis error); other
    template triples still instantiate."""
    from tests.conftest import SF_DIR

    from pidb_rdf_spark.graph import graphify
    from pidb_rdf_spark.sparql import sparql

    g = graphify(spark, SF_DIR)
    df = sparql(
        g,
        "CONSTRUCT { ?r <urn:p:name> ?n . ?r <urn:p:ghost> ?never } "
        'WHERE { ?r v:label "Region" . ?r v:r_name ?n }',
    )
    assert df.count() == 5
    assert {r["predicate"] for r in df.collect()} == {"urn:p:name"}
    # all template triples unbound -> typed empty result
    empty = sparql(
        g,
        "CONSTRUCT { ?x <urn:p:ghost> ?never } "
        'WHERE { ?r v:label "Region" }',
    )
    assert empty.count() == 0
    assert empty.columns == ["subject", "predicate", "object", "is_literal"]
