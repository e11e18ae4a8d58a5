"""SPARQL 1.1 property paths (§9): ^ / | + * ? ! over the graphified
sf0.001 testdata, cross-checked against DuckDB on the raw tables.

The reference's only transitive surface is its Cypher variable-length
paths (``semantics/inference/MicroReasoners.java:20-22``); property
paths are the standard SPARQL front door to the same closure compute
(SURVEY.md §2.10), so +/* compile to ``inference.transitive_closure``.
"""

import duckdb

from pidb_rdf_spark.sparql import parse_sparql, sparql
from pidb_rdf_spark.sparql import algebra as A
from tests.conftest import SF_DIR


def oracle(sql: str):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "orders"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.execute(sql).fetchall()


# ---- parser ---------------------------------------------------------------


def test_parse_path_forms():
    q = parse_sparql(
        "SELECT ?x WHERE { ?x (e:A|e:B)/^e:C/e:D+ ?y . ?x !(e:E|e:F) ?z }"
    )
    seq = q.where.elements[0].p
    assert isinstance(seq, A.PathSeq) and len(seq.parts) == 3
    assert isinstance(seq.parts[0], A.PathAlt)
    assert isinstance(seq.parts[1], A.PathInverse)
    assert isinstance(seq.parts[2], A.PathMod) and seq.parts[2].mod == "+"
    neg = q.where.elements[1].p
    assert isinstance(neg, A.PathNeg) and len(neg.iris) == 2


def test_parse_path_mod_binding():
    # '^e:C+' is inverse-of-(C+), not (inverse-of-C)+
    q = parse_sparql("SELECT ?x WHERE { ?x ^e:C+ ?y }")
    p = q.where.elements[0].p
    assert isinstance(p, A.PathInverse) and isinstance(p.path, A.PathMod)


# ---- sequence / inverse / alternative (rewrite into plain algebra) -------


def test_path_sequence(graph):
    rows = sparql(
        graph,
        """
        SELECT ?cust ?region WHERE {
          ?c v:c_name ?cust . ?c e:IN_NATION/e:IN_REGION ?r .
          ?r v:r_name ?region .
        } ORDER BY ?cust
        """,
    ).collect()
    exp = oracle(
        """
        SELECT c_name, r_name FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        ORDER BY c_name
        """
    )
    assert [(r.cust, r.region) for r in rows] == exp


def test_path_sequence_into_value_property(graph):
    # value step allowed as the last hop of a sequence
    rows = sparql(
        graph,
        "SELECT ?cust ?nation WHERE { ?c v:c_name ?cust . "
        "?c e:IN_NATION/v:n_name ?nation } ORDER BY ?cust",
    ).collect()
    exp = oracle(
        "SELECT c_name, n_name FROM customer "
        "JOIN nation ON c_nationkey = n_nationkey ORDER BY c_name"
    )
    assert [(r.cust, r.nation) for r in rows] == exp


def test_path_inverse_and_alternative(graph):
    # members of a nation = ^IN_NATION from customers OR suppliers
    rows = sparql(
        graph,
        """
        SELECT ?nation ?m WHERE {
          ?n v:n_name ?nation . ?n ^e:IN_NATION ?m .
        } ORDER BY ?nation ?m
        """,
    ).collect()
    exp = oracle(
        """
        SELECT n_name, m FROM (
          SELECT n_name, 'urn:customer:' || CAST(c_custkey AS VARCHAR) AS m
          FROM customer JOIN nation ON c_nationkey = n_nationkey
          UNION ALL
          SELECT n_name, 'urn:supplier:' || CAST(s_suppkey AS VARCHAR)
          FROM supplier JOIN nation ON s_nationkey = n_nationkey
        ) ORDER BY n_name, m
        """
    )
    assert [(r.nation, r.m) for r in rows] == exp


def test_path_alternative_bag_semantics(graph):
    # | is bag union: no implicit dedup across branches
    n_alt = sparql(
        graph, "SELECT ?s ?o WHERE { ?s (e:IN_NATION|e:IN_REGION) ?o }"
    ).count()
    n_nation = sparql(graph, "SELECT ?s ?o WHERE { ?s e:IN_NATION ?o }").count()
    n_region = sparql(graph, "SELECT ?s ?o WHERE { ?s e:IN_REGION ?o }").count()
    assert n_alt == n_nation + n_region


# ---- repetition (closure) -------------------------------------------------


def test_path_plus_closure(graph):
    rows = sparql(
        graph,
        "SELECT ?x ?anc WHERE { ?x (e:IN_NATION|e:IN_REGION)+ ?anc }",
    ).collect()
    exp = oracle(
        """
        WITH RECURSIVE base(child, parent) AS (
            SELECT 'urn:customer:' || CAST(c_custkey AS VARCHAR),
                   'urn:nation:' || CAST(c_nationkey AS VARCHAR) FROM customer
            UNION ALL
            SELECT 'urn:supplier:' || CAST(s_suppkey AS VARCHAR),
                   'urn:nation:' || CAST(s_nationkey AS VARCHAR) FROM supplier
            UNION ALL
            SELECT 'urn:nation:' || CAST(n_nationkey AS VARCHAR),
                   'urn:region:' || CAST(n_regionkey AS VARCHAR) FROM nation
        ), clo(child, parent) AS (
            SELECT child, parent FROM base
            UNION
            SELECT b.child, c.parent FROM base b JOIN clo c ON b.parent = c.child
        )
        SELECT child, parent FROM clo
        """
    )
    assert sorted((r.x, r.anc) for r in rows) == sorted(exp)


def test_path_optional_hop(graph):
    # p? = zero or one step: every Nation itself plus its region
    rows = sparql(
        graph,
        'SELECT ?n ?x WHERE { ?n v:label "Nation" . ?n e:IN_REGION? ?x }',
    ).collect()
    exp = oracle(
        """
        SELECT u, u FROM (SELECT 'urn:nation:' || CAST(n_nationkey AS VARCHAR) AS u
                          FROM nation)
        UNION ALL
        SELECT 'urn:nation:' || CAST(n_nationkey AS VARCHAR),
               'urn:region:' || CAST(n_regionkey AS VARCHAR) FROM nation
        """
    )
    assert sorted((r.n, r.x) for r in rows) == sorted(exp)


def test_path_star_includes_self(graph):
    plus = sparql(
        graph, 'SELECT ?n ?x WHERE { ?n v:label "Region" . ?n e:IN_REGION+ ?x }'
    ).count()
    star = sparql(
        graph, 'SELECT ?n ?x WHERE { ?n v:label "Region" . ?n e:IN_REGION* ?x }'
    ).count()
    n_regions = oracle("SELECT COUNT(*) FROM region")[0][0]
    assert plus == 0  # regions have no outgoing IN_REGION
    assert star == n_regions  # zero-length self-pairs only


def test_path_plus_bound_subject(graph):
    rows = sparql(
        graph,
        "SELECT ?anc WHERE { <urn:customer:1> (e:IN_NATION|e:IN_REGION)+ ?anc } ORDER BY ?anc",
    ).collect()
    exp = oracle(
        """
        SELECT u FROM (
          SELECT 'urn:nation:' || CAST(c_nationkey AS VARCHAR) AS u
          FROM customer WHERE c_custkey = 1
          UNION ALL
          SELECT 'urn:region:' || CAST(n_regionkey AS VARCHAR)
          FROM customer JOIN nation ON c_nationkey = n_nationkey
          WHERE c_custkey = 1
        ) ORDER BY u
        """
    )
    assert [r.anc for r in rows] == [e[0] for e in exp]


# ---- negated property set -------------------------------------------------


def test_path_negated_set(graph):
    # all edges except the two containment predicates
    n_neg = sparql(
        graph, "SELECT ?s ?o WHERE { ?s !(e:IN_NATION|e:IN_REGION) ?o }"
    ).count()
    n_all = graph.edges.count()
    n_cont = sparql(
        graph, "SELECT ?s ?o WHERE { ?s (e:IN_NATION|e:IN_REGION) ?o }"
    ).count()
    assert n_neg == n_all - n_cont


def test_path_mod_over_value_property_rejected(graph):
    import pytest

    with pytest.raises(NotImplementedError):
        sparql(graph, "SELECT ?s ?o WHERE { ?s v:c_name+ ?o }").collect()
