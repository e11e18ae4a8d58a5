"""Cypher front-end tests: the MATCH/WHERE/RETURN subset vs the
DuckDB oracle over the same tables (reference surface:
``neo4j/structure/Neo4jGraph.java:288-304``)."""

import pytest

from pidb_rdf_spark.cypher import CypherSyntaxError, cypher
from tests.test_sparql_basic import oracle


def rows(df):
    return [tuple(r) for r in df.collect()]


def test_match_filter_order_limit(graph):
    got = rows(
        cypher(
            graph,
            "MATCH (c:Customer)-[:IN_NATION]->(n:Nation) "
            "WHERE c.c_acctbal > 9000 "
            "RETURN c.c_name AS name, n.n_name AS nation "
            "ORDER BY name LIMIT 10",
        )
    )
    want = oracle(
        """SELECT c_name, n_name FROM customer JOIN nation
           ON c_nationkey = n_nationkey
           WHERE c_acctbal > 9000 ORDER BY c_name LIMIT 10"""
    )
    assert got == want


def test_implicit_grouping_aggregates(graph):
    got = rows(
        cypher(
            graph,
            "MATCH (c:Customer)-[:IN_NATION]->(n) "
            "RETURN n.n_name AS nation, count(*) AS custs, "
            "avg(c.c_acctbal) AS bal ORDER BY nation",
        )
    )
    want = oracle(
        """SELECT n_name, COUNT(*), AVG(c_acctbal) FROM customer
           JOIN nation ON c_nationkey = n_nationkey
           GROUP BY n_name ORDER BY n_name"""
    )
    assert [(g[0], g[1]) for g in got] == [(w[0], w[1]) for w in want]
    for g, w in zip(got, want):
        assert g[2] == pytest.approx(w[2])


def test_keyword_label_and_reversed_arrow(graph):
    """``Orders`` tokenizes like the ORDER keyword; ``<-[..]-``
    reverses the join direction."""
    got = rows(
        cypher(
            graph,
            "MATCH (c:Customer)<-[:PLACED_BY]-(o:Orders) "
            "WHERE o.o_totalprice > 100000 AND c.c_acctbal < 0 "
            "RETURN count(*) AS n",
        )
    )
    want = oracle(
        """SELECT COUNT(*) FROM orders JOIN customer
           ON o_custkey = c_custkey
           WHERE o_totalprice > 100000 AND c_acctbal < 0"""
    )
    assert got == want


def test_three_hop_chain(graph):
    got = rows(
        cypher(
            graph,
            "MATCH (o:Orders)-[:PLACED_BY]->(c)-[:IN_NATION]->(n)"
            "-[:IN_REGION]->(r) "
            "RETURN r.r_name AS region, count(*) AS orders ORDER BY region",
        )
    )
    want = oracle(
        """SELECT r_name, COUNT(*) FROM orders
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           GROUP BY r_name ORDER BY r_name"""
    )
    assert got == want


def test_string_predicates_and_in(graph):
    got = rows(
        cypher(
            graph,
            "MATCH (c:Customer) WHERE c.c_name ENDS WITH '7' "
            "AND c.c_mktsegment IN ['BUILDING', 'MACHINERY'] "
            "RETURN count(*) AS n",
        )
    )
    want = oracle(
        """SELECT COUNT(*) FROM customer WHERE c_name LIKE '%7'
           AND c_mktsegment IN ('BUILDING', 'MACHINERY')"""
    )
    assert got == want


def test_distinct_skip_limit(graph):
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation)-[:IN_REGION]->(r) "
            "RETURN DISTINCT r.r_name AS name ORDER BY name SKIP 1 LIMIT 2",
        )
    )
    want = oracle(
        "SELECT DISTINCT r_name FROM region ORDER BY r_name OFFSET 1 LIMIT 2"
    )
    assert got == want


def test_property_map_and_count_distinct(graph):
    got = rows(
        cypher(
            graph,
            "MATCH (c:Customer {c_mktsegment: 'BUILDING'})-[:IN_NATION]->(n) "
            "RETURN count(DISTINCT n) AS nations",
        )
    )
    want = oracle(
        """SELECT COUNT(DISTINCT n_nationkey) FROM customer
           JOIN nation ON c_nationkey = n_nationkey
           WHERE c_mktsegment = 'BUILDING'"""
    )
    assert got == want


def test_undirected_and_arithmetic(graph):
    got = rows(
        cypher(
            graph,
            "MATCH (c:Customer)-[:IN_NATION]-(n:Nation) "
            "RETURN sum(c.c_acctbal * 2) AS doubled",
        )
    )
    want = oracle("SELECT SUM(c_acctbal * 2) FROM customer")
    assert got[0][0] == pytest.approx(want[0][0])


def test_var_length_bounded(graph):
    """1..2 hops out of a customer: its nation (1) + region (2)."""
    got = rows(
        cypher(
            graph,
            "MATCH (c:Customer {c_custkey: 1})-[:IN_NATION|IN_REGION*1..2]->(x) "
            "RETURN count(*) AS reach",
        )
    )
    assert got == [(2,)]


def test_var_length_unbounded_closure(graph):
    """``*`` reaches the full containment closure: every customer
    reaches exactly nation + region."""
    got = rows(
        cypher(
            graph,
            "MATCH (c:Customer)-[:IN_NATION|IN_REGION*]->(x) "
            "RETURN count(*) AS paths",
        )
    )
    want = oracle("SELECT 2 * COUNT(*) FROM customer")
    assert got == [(want[0][0],)]


def test_multi_pattern_shared_variable(graph):
    """Comma patterns join on the shared variable, not cartesian."""
    got = rows(
        cypher(
            graph,
            "MATCH (c:Customer)-[:IN_NATION]->(n), (s:Supplier)-[:IN_NATION]->(n) "
            "RETURN count(*) AS pairs",
        )
    )
    want = oracle(
        """SELECT COUNT(*) FROM customer JOIN supplier
           ON c_nationkey = s_nationkey"""
    )
    assert got == want


def test_null_handling(graph):
    got = rows(
        cypher(
            graph,
            "MATCH (c:Customer) WHERE c.c_name IS NOT NULL "
            "AND NOT c.c_acctbal < 0 RETURN count(*) AS n",
        )
    )
    want = oracle(
        "SELECT COUNT(*) FROM customer WHERE c_name IS NOT NULL AND NOT c_acctbal < 0"
    )
    assert got == want


def test_syntax_errors_have_position(graph):
    with pytest.raises(CypherSyntaxError, match="position"):
        cypher(graph, "MATCH (a) DELETE a")
    with pytest.raises(CypherSyntaxError, match="variable-length"):
        cypher(graph, "MATCH (a)-[r*]->(b) RETURN a")
    with pytest.raises(CypherSyntaxError, match="undefined variable"):
        cypher(graph, "MATCH (a:Customer) RETURN b.c_name AS x")
    with pytest.raises(CypherSyntaxError):
        cypher(graph, "MATCH (a:Customer) RETURN")


def test_relationship_uniqueness(graph):
    """Cypher edge-isomorphism: the same relationship cannot match
    twice in one MATCH, so the diamond pattern excludes a = b."""
    got = rows(
        cypher(
            graph,
            "MATCH (a:Customer)-[:IN_NATION]->(n)<-[:IN_NATION]-(b:Customer) "
            "RETURN count(*) AS pairs",
        )
    )
    want = oracle(
        """SELECT COUNT(*) FROM customer c1 JOIN customer c2
           ON c1.c_nationkey = c2.c_nationkey
           AND c1.c_custkey <> c2.c_custkey"""
    )
    assert got == want


def test_optional_match_left_join(graph):
    """OPTIONAL MATCH keeps unmatched rows with NULLs: only some
    nations have suppliers; count(s) counts the matched ones."""
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation) OPTIONAL MATCH (s:Supplier)-[:IN_NATION]->(n) "
            "RETURN n.n_name AS nation, count(s) AS sups ORDER BY nation",
        )
    )
    want = oracle(
        """SELECT n_name, COUNT(s_suppkey) FROM nation
           LEFT JOIN supplier ON s_nationkey = n_nationkey
           GROUP BY n_name ORDER BY n_name"""
    )
    assert got == want
    assert any(g[1] == 0 for g in got)  # the join really is optional


def test_optional_match_block_where(graph):
    """A WHERE attached to OPTIONAL MATCH filters inside the block
    (before the left join), not after it."""
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation) "
            "OPTIONAL MATCH (c:Customer)-[:IN_NATION]->(n) "
            "WHERE c.c_acctbal > 9990 "
            "RETURN n.n_name AS nation, count(c) AS rich ORDER BY nation",
        )
    )
    want = oracle(
        """SELECT n_name, COUNT(c_custkey) FROM nation
           LEFT JOIN customer ON c_nationkey = n_nationkey
                             AND c_acctbal > 9990
           GROUP BY n_name ORDER BY n_name"""
    )
    assert got == want
    assert len(got) == 25  # every nation row survives


def test_optional_match_requires_shared_variable(graph):
    with pytest.raises(CypherSyntaxError, match="share"):
        cypher(
            graph,
            "MATCH (n:Nation) OPTIONAL MATCH (c:Customer) RETURN n.n_name AS x",
        )


def test_order_by_non_returned_expression(graph):
    """Mixed sort keys: a non-projected expression plus a returned
    alias — both must participate in the sort."""
    got = rows(
        cypher(
            graph,
            "MATCH (c:Customer) RETURN c.c_mktsegment AS seg "
            "ORDER BY c.c_acctbal DESC, seg LIMIT 5",
        )
    )
    want = oracle(
        """SELECT c_mktsegment FROM customer
           ORDER BY c_acctbal DESC, c_mktsegment LIMIT 5"""
    )
    assert got == want


def test_order_by_distinct_requires_returned_key(graph):
    with pytest.raises(CypherSyntaxError, match="DISTINCT"):
        cypher(
            graph,
            "MATCH (c:Customer) RETURN DISTINCT c.c_mktsegment AS seg "
            "ORDER BY c.c_acctbal",
        )
