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
        cypher(graph, "MATCH (a) FOO a")
    with pytest.raises(CypherSyntaxError, match="cypher_write"):
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


# ---------------------------------------------------------------------------
# regression tests: var-length semantics + bound-variable rebinding
# (round-8 ADVICE fixes)
# ---------------------------------------------------------------------------


def _mk_graph(spark, nodes, edges):
    """Tiny literal graph: nodes = [(id, [labels], name)], edges =
    [(src, dst, type)]."""
    from pidb_rdf_spark.graph import PropertyGraph

    return PropertyGraph(
        spark=spark,
        nodes=spark.createDataFrame(
            [(i, f"urn:n{i}", labs, {"name": name}) for i, labs, name in nodes],
            "id long, uri string, labels array<string>, props map<string,string>",
        ),
        edges=spark.createDataFrame(
            [(k, s, d, t, {}) for k, (s, d, t) in enumerate(edges)],
            "id long, src long, dst long, predicate string, props map<string,string>",
        ),
    )


def _chain5(spark):
    return _mk_graph(
        spark,
        [(i, ["N"], f"n{i}") for i in range(1, 6)],
        [(i, i + 1, "T") for i in range(1, 5)],
    )


def test_var_length_min_len_three(spark):
    """*3..4 must NOT return pairs at distance < 3 (r8 ADVICE high)."""
    g = _chain5(spark)
    got = sorted(
        rows(
            cypher(
                g,
                "MATCH (a)-[:T*3..4]->(b) RETURN a.name AS s, b.name AS t",
            )
        )
    )
    assert got == [("n1", "n4"), ("n1", "n5"), ("n2", "n5")]


def test_var_length_exact_three(spark):
    g = _chain5(spark)
    got = sorted(
        rows(cypher(g, "MATCH (a)-[:T*3]->(b) RETURN a.name AS s, b.name AS t"))
    )
    assert got == [("n1", "n4"), ("n2", "n5")]


def test_unaliased_property_return_items(spark):
    """Unaliased items keep their dotted source text as the column
    name and still resolve in the aggregate reorder and ORDER BY."""
    g = _chain5(spark)
    df = cypher(g, "MATCH (a)-[:T]->(b) RETURN a.name, count(*) ORDER BY a.name")
    assert df.columns == ["a.name", "count(*)"]
    assert rows(df) == [(f"n{i}", 1) for i in range(1, 5)]
    # non-aggregating unaliased ORDER BY as well
    df2 = cypher(g, "MATCH (a)-[:T]->(b) RETURN b.name ORDER BY b.name DESC LIMIT 2")
    assert df2.columns == ["b.name"]
    assert rows(df2) == [("n5",), ("n4",)]


def test_var_length_far_node_already_bound(spark):
    """A var-length hop whose far node is bound joins through a temp
    column (no duplicate-name AMBIGUOUS_REFERENCE)."""
    g = _mk_graph(
        spark,
        [(i, ["N"], f"n{i}") for i in range(1, 4)],
        [(1, 2, "T"), (2, 3, "T"), (1, 3, "T")],
    )
    # pairs with BOTH a direct edge and a 2-hop path: only (1, 3)
    got = rows(
        cypher(
            g,
            "MATCH (a)-[:T]->(b), (a)-[:T*2..2]->(b) "
            "RETURN a.name AS s, b.name AS t",
        )
    )
    assert got == [("n1", "n3")]


def test_bound_far_node_label_filter(spark):
    """Label/prop constraints on a re-bound far node must apply
    (single-hop and var-length branches)."""
    g = _mk_graph(
        spark,
        [(1, ["N"], "a"), (2, ["N", "Admin"], "b"), (3, ["N"], "b2"), (4, ["N"], "c")],
        [(1, 2, "T"), (1, 3, "T"), (4, 2, "S"), (4, 3, "S")],
    )
    got = rows(
        cypher(
            g,
            "MATCH (a)-[:T]->(b), (c)-[:S]->(b:Admin) "
            "RETURN a.name AS s, b.name AS t",
        )
    )
    assert got == [("a", "b")]
    got2 = rows(
        cypher(
            g,
            "MATCH (a)-[:T]->(b), (c)-[:S*1..2]->(b:Admin) "
            "RETURN a.name AS s, b.name AS t",
        )
    )
    assert got2 == [("a", "b")]


def test_unbounded_min_two_keeps_pairs_with_short_paths(spark):
    """*2.. keeps a pair reachable at >= 2 hops even when a 1-hop
    path also exists (prefix-compose, not anti-join)."""
    g = _mk_graph(
        spark,
        [(1, ["N"], "a"), (2, ["N"], "b"), (3, ["N"], "x")],
        [(1, 2, "T"), (1, 3, "T"), (3, 2, "T")],
    )
    got = rows(
        cypher(g, "MATCH (s)-[:T*2..]->(t) RETURN s.name AS s, t.name AS t")
    )
    assert got == [("a", "b")]


# ---------------------------------------------------------------------------
# WITH pipeline stages + UNWIND (round 8)
# ---------------------------------------------------------------------------


def test_with_aggregate_then_filter(graph):
    """WITH ... WHERE = HAVING: nations with more than 8 customers."""
    got = rows(
        cypher(
            graph,
            "MATCH (c:Customer)-[:IN_NATION]->(n) "
            "WITH n, count(*) AS custs WHERE custs > 8 "
            "RETURN n.n_name AS nation, custs ORDER BY nation",
        )
    )
    want = oracle(
        """SELECT n_name, COUNT(*) AS custs FROM customer
           JOIN nation ON c_nationkey = n_nationkey
           GROUP BY n_name HAVING COUNT(*) > 8 ORDER BY n_name"""
    )
    assert got == want


def test_with_then_match_expansion(graph):
    """A node variable piped through WITH still expands: top-3 richest
    customers' nations."""
    got = rows(
        cypher(
            graph,
            "MATCH (c:Customer) "
            "WITH c ORDER BY c.c_acctbal DESC LIMIT 3 "
            "MATCH (c)-[:IN_NATION]->(n) "
            "RETURN c.c_name AS name, n.n_name AS nation ORDER BY name",
        )
    )
    want = oracle(
        """WITH top3 AS (SELECT * FROM customer ORDER BY c_acctbal DESC LIMIT 3)
           SELECT c_name, n_name FROM top3 JOIN nation
           ON c_nationkey = n_nationkey ORDER BY c_name"""
    )
    assert got == want


def test_with_chained_aggregation(graph):
    """Two WITH stages: per-nation counts, then the max count."""
    got = rows(
        cypher(
            graph,
            "MATCH (c:Customer)-[:IN_NATION]->(n) "
            "WITH n, count(*) AS custs "
            "WITH max(custs) AS biggest "
            "RETURN biggest",
        )
    )
    want = oracle(
        """SELECT MAX(custs) FROM (SELECT COUNT(*) AS custs FROM customer
           GROUP BY c_nationkey)"""
    )
    assert got == want


def test_with_value_then_where_on_prop(graph):
    """Post-WITH WHERE on a property of a carried node variable."""
    got = rows(
        cypher(
            graph,
            "MATCH (c:Customer) WITH c, c.c_acctbal AS bal "
            "WHERE c.c_mktsegment = 'BUILDING' AND bal > 9000 "
            "RETURN count(*) AS n",
        )
    )
    want = oracle(
        """SELECT COUNT(*) FROM customer
           WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9000"""
    )
    assert got == want


def test_with_requires_alias(graph):
    with pytest.raises(CypherSyntaxError, match="aliased"):
        cypher(graph, "MATCH (c:Customer) WITH c.c_name RETURN count(*) AS n")


def test_unwind_literal_list(spark, graph):
    got = rows(cypher(graph, "UNWIND [3, 1, 2] AS x RETURN x ORDER BY x"))
    assert got == [(1,), (2,), (3,)]


def test_unwind_collected_list(graph):
    """collect() then UNWIND round-trips the rows (per group)."""
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation)-[:IN_REGION]->(r) "
            "WITH r, collect(n.n_name) AS names "
            "UNWIND names AS name "
            "RETURN r.r_name AS region, name ORDER BY region, name",
        )
    )
    want = oracle(
        """SELECT r_name, n_name FROM nation JOIN region
           ON n_regionkey = r_regionkey ORDER BY r_name, n_name"""
    )
    assert got == want


def test_unwind_cross_product_per_row(graph):
    """UNWIND multiplies each input row by the list length."""
    got = rows(
        cypher(
            graph,
            "MATCH (r:Region) UNWIND [1, 2] AS k RETURN count(*) AS n",
        )
    )
    want = oracle("SELECT 2 * COUNT(*) FROM region")
    assert got == [(want[0][0],)]


def test_optional_match_after_with(graph):
    """OPTIONAL MATCH directly after a WITH stage."""
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation) WITH n ORDER BY n.n_name LIMIT 5 "
            "OPTIONAL MATCH (s:Supplier)-[:IN_NATION]->(n) "
            "RETURN n.n_name AS nation, count(s) AS sups ORDER BY nation",
        )
    )
    want = oracle(
        """WITH top5 AS (SELECT * FROM nation ORDER BY n_name LIMIT 5)
           SELECT n_name, COUNT(s_suppkey) FROM top5 LEFT JOIN supplier
           ON s_nationkey = n_nationkey GROUP BY n_name ORDER BY n_name"""
    )
    assert got == want


def test_var_length_within_path_edge_uniqueness(spark):
    """A single undirected edge must NOT make a 2-hop path by being
    traversed forward then backward (Cypher relationship uniqueness
    within a variable-length path)."""
    g = _mk_graph(spark, [(1, ["N"], "a"), (2, ["N"], "b")], [(1, 2, "T")])
    assert rows(cypher(g, "MATCH (x)-[:T*2]-(y) RETURN x.name AS s, y.name AS t")) == []
    # two distinct parallel-ish edges DO make the round trip
    g2 = _mk_graph(
        spark, [(1, ["N"], "a"), (2, ["N"], "b")], [(1, 2, "T"), (2, 1, "T")]
    )
    got = sorted(
        rows(cypher(g2, "MATCH (x)-[:T*2]->(y) RETURN x.name AS s, y.name AS t"))
    )
    assert got == [("a", "a"), ("b", "b")]


def test_var_length_directed_cycle_no_edge_reuse(spark):
    """Directed 2-cycle: *3 would need an edge twice -> no matches."""
    g = _mk_graph(
        spark, [(1, ["N"], "a"), (2, ["N"], "b")], [(1, 2, "T"), (2, 1, "T")]
    )
    assert rows(cypher(g, "MATCH (x)-[:T*3]->(y) RETURN x.name AS s")) == []


def test_cartesian_warning_and_opt_in(spark):
    import warnings as W

    from pidb_rdf_spark.cypher import CypherCartesianWarning

    g = _chain5(spark)
    with pytest.warns(CypherCartesianWarning):
        cypher(g, "MATCH (a:N), (b:N) RETURN count(*) AS n")
    with W.catch_warnings():
        W.simplefilter("error", CypherCartesianWarning)
        # opt-in silences
        df = cypher(g, "MATCH (a:N), (b:N) RETURN count(*) AS n", allow_cartesian=True)
        assert rows(df) == [(25,)]
        # connected patterns never warn
        cypher(g, "MATCH (a)-[:T]->(b), (b)-[:T]->(c) RETURN count(*) AS n").collect()


# ---------------------------------------------------------------------------
# scalar functions (r8): id/labels/type + string/number/list library
# ---------------------------------------------------------------------------


def test_scalar_string_and_numeric_functions(graph):
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation) WHERE toLower(n.n_name) STARTS WITH 'nation_1' "
            "RETURN toUpper(n.n_name) AS up, size(n.n_name) AS len, "
            "abs(0 - n.n_nationkey) AS k ORDER BY up",
        )
    )
    want = oracle(
        """SELECT UPPER(n_name), LENGTH(n_name), ABS(0 - n_nationkey)
           FROM nation WHERE LOWER(n_name) LIKE 'nation\\_1%' ESCAPE '\\'
           ORDER BY UPPER(n_name)"""
    )
    assert got == want


def test_labels_type_id_functions(spark):
    g = _mk_graph(
        spark,
        [(1, ["N", "Admin"], "a"), (2, ["N"], "b")],
        [(1, 2, "T")],
    )
    got = rows(
        cypher(
            g,
            "MATCH (a)-[r]->(b) RETURN id(a) AS ia, type(r) AS t, "
            "size(labels(a)) AS nl, head(labels(b)) AS lb",
        )
    )
    assert got == [(1, "T", 2, "N")]


def test_substring_split_replace_coalesce(graph):
    got = rows(
        cypher(
            graph,
            "MATCH (c:Customer {c_custkey: 7}) "
            "RETURN substring(c.c_name, 0, 8) AS pre, "
            "head(split(c.c_name, '#')) AS brand, "
            "replace(c.c_name, 'Customer', 'Cust') AS rep, "
            "coalesce(c.no_such_prop, c.c_name) AS co",
        )
    )
    want = oracle(
        """SELECT SUBSTRING(c_name, 1, 8), STR_SPLIT(c_name, '#')[1],
           REPLACE(c_name, 'Customer', 'Cust'), c_name
           FROM customer WHERE c_custkey = 7"""
    )
    assert got == want


def test_scalar_over_aggregate_and_casts(graph):
    got = rows(
        cypher(
            graph,
            "MATCH (c:Customer)-[:IN_NATION]->(n) "
            "RETURN n.n_name AS nation, round(avg(c.c_acctbal), 1) AS bal, "
            "toInteger(max(c.c_acctbal)) AS mx ORDER BY nation LIMIT 5",
        )
    )
    want = oracle(
        """SELECT n_name, ROUND(AVG(c_acctbal), 1),
           CAST(TRUNC(MAX(c_acctbal)) AS BIGINT)
           FROM customer JOIN nation ON c_nationkey = n_nationkey
           GROUP BY n_name ORDER BY n_name LIMIT 5"""
    )
    for g_, w in zip(got, want):
        assert g_[0] == w[0]
        assert g_[1] == pytest.approx(w[1])
        assert g_[2] == w[2]


def test_labels_filter_in_where(spark):
    g = _mk_graph(
        spark,
        [(1, ["N", "Admin"], "a"), (2, ["N"], "b")],
        [],
    )
    got = rows(
        cypher(g, "MATCH (n) WHERE size(labels(n)) > 1 RETURN n.name AS x")
    )
    assert got == [("a",)]


def test_unknown_function_raises(graph):
    with pytest.raises(CypherSyntaxError, match="unknown function"):
        cypher(graph, "MATCH (n:Nation) RETURN frobnicate(n.n_name) AS x")


def test_case_expression_generic_and_simple(graph):
    got = rows(
        cypher(
            graph,
            "MATCH (c:Customer) "
            "RETURN CASE WHEN c.c_acctbal < 0 THEN 'debt' "
            "WHEN c.c_acctbal < 5000 THEN 'low' ELSE 'high' END AS band, "
            "count(*) AS k ORDER BY band",
        )
    )
    want = oracle(
        """SELECT CASE WHEN c_acctbal < 0 THEN 'debt'
                       WHEN c_acctbal < 5000 THEN 'low'
                       ELSE 'high' END AS band, COUNT(*)
           FROM customer GROUP BY band ORDER BY band"""
    )
    assert got == want
    got2 = rows(
        cypher(
            graph,
            "MATCH (n:Region) "
            "RETURN n.r_name AS r, "
            "CASE n.r_regionkey WHEN 0 THEN 'zero' WHEN 1 THEN 'one' END AS w "
            "ORDER BY r",
        )
    )
    want2 = oracle(
        """SELECT r_name, CASE r_regionkey WHEN 0 THEN 'zero'
           WHEN 1 THEN 'one' END FROM region ORDER BY r_name"""
    )
    assert got2 == want2


def test_case_with_aggregate_inside_where_clause(graph):
    """CASE usable in WHERE and inside aggregated items."""
    got = rows(
        cypher(
            graph,
            "MATCH (c:Customer) "
            "WHERE CASE WHEN c.c_acctbal < 0 THEN true ELSE false END "
            "RETURN count(*) AS n",
        )
    )
    want = oracle("SELECT COUNT(*) FROM customer WHERE c_acctbal < 0")
    assert got == want
    got2 = rows(
        cypher(
            graph,
            "MATCH (c:Customer) "
            "RETURN sum(CASE WHEN c.c_acctbal < 0 THEN 1 ELSE 0 END) AS neg",
        )
    )
    assert got2 == want


def test_standalone_return_and_leading_with(graph):
    assert rows(cypher(graph, "RETURN 1 + 2 AS x")) == [(3,)]
    assert rows(
        cypher(graph, "WITH 2 AS k MATCH (r:Region) RETURN k, count(*) AS n")
    ) == [(2, 5)]


def test_unbounded_min_two_documented_approximation(spark):
    """Documented divergence (see _var_length_pairs docstring): for
    *2.. on the two-node cycle, the prefix-compose returns (a,b) even
    though the only length>=2 a->b walk reuses an edge; Neo4j's path
    enumeration returns only (a,a) and (b,b). Exact unbounded trail
    semantics are NP-hard — this pin makes the approximation visible
    instead of silent."""
    g = _mk_graph(
        spark, [(1, ["N"], "a"), (2, ["N"], "b")], [(1, 2, "T"), (2, 1, "T")]
    )
    got = sorted(
        rows(cypher(g, "MATCH (x)-[:T*2..]->(y) RETURN x.name AS s, y.name AS t"))
    )
    assert got == [("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")]


def test_exists_pattern_predicate(graph):
    """[NOT] exists(pattern) as semi/anti joins: nations with /
    without suppliers (suppliers exist in only some nations)."""
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation) WHERE exists((s:Supplier)-[:IN_NATION]->(n)) "
            "RETURN count(*) AS k",
        )
    )
    want = oracle(
        "SELECT COUNT(DISTINCT s_nationkey) FROM supplier"
    )
    assert got == want
    got2 = rows(
        cypher(
            graph,
            "MATCH (n:Nation) WHERE NOT exists((s:Supplier)-[:IN_NATION]->(n)) "
            "RETURN count(*) AS k",
        )
    )
    want2 = oracle(
        """SELECT COUNT(*) FROM nation WHERE n_nationkey NOT IN
           (SELECT s_nationkey FROM supplier)"""
    )
    assert got2 == want2


def test_exists_combined_with_residual_where(graph):
    got = rows(
        cypher(
            graph,
            "MATCH (c:Customer) "
            "WHERE c.c_acctbal > 0 AND exists((o:Orders)-[:PLACED_BY]->(c)) "
            "RETURN count(*) AS k",
        )
    )
    want = oracle(
        """SELECT COUNT(*) FROM customer WHERE c_acctbal > 0
           AND c_custkey IN (SELECT o_custkey FROM orders)"""
    )
    assert got == want


def test_exists_property_form_and_deep_pattern(graph):
    got = rows(
        cypher(graph, "MATCH (c:Customer) WHERE exists(c.c_name) RETURN count(*) AS k")
    )
    want = oracle("SELECT COUNT(*) FROM customer WHERE c_name IS NOT NULL")
    assert got == want
    # a pattern predicate under OR compiles to a match-count column
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation) WHERE exists((s:Supplier)-[:IN_NATION]->(n)) "
            "OR n.n_nationkey = 0 RETURN count(*) AS k",
        )
    )
    want = oracle(
        """SELECT COUNT(*) FROM nation
           WHERE EXISTS (SELECT 1 FROM supplier WHERE s_nationkey = n_nationkey)
              OR n_nationkey = 0"""
    )
    assert got == want


# ---------------------------------------------------------------------------
# query parameters ($name) — typed plan literals, no string splicing
# ---------------------------------------------------------------------------


def test_parameters_in_where_pattern_and_limit(graph):
    got = rows(
        cypher(
            graph,
            "MATCH (c:Customer {c_mktsegment: $seg})-[:IN_NATION]->(n) "
            "WHERE c.c_acctbal > $minbal AND n.n_name IN $nations "
            "RETURN c.c_name AS name ORDER BY name LIMIT $k",
            params={
                "seg": "BUILDING",
                "minbal": 5000,
                "nations": ["NATION_1", "NATION_2", "NATION_3"],
                "k": 5,
            },
        )
    )
    want = oracle(
        """SELECT c_name FROM customer JOIN nation ON c_nationkey = n_nationkey
           WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 5000
           AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
           ORDER BY c_name LIMIT 5"""
    )
    assert got == want


def test_parameters_no_injection(graph):
    """A hostile string parameter is a VALUE, never query text."""
    evil = "' OR 1=1 RETURN x //"
    got = rows(
        cypher(
            graph,
            "MATCH (c:Customer) WHERE c.c_name = $v RETURN count(*) AS n",
            params={"v": evil},
        )
    )
    assert got == [(0,)]


def test_missing_parameter_raises(graph):
    with pytest.raises(CypherSyntaxError, match="missing parameter"):
        cypher(graph, "MATCH (c:Customer {c_custkey: $k}) RETURN c.c_name AS x").collect()


def test_parameters_in_writes(spark):
    from pidb_rdf_spark.cypher_write import cypher_write
    from pidb_rdf_spark.graph import PropertyGraph

    g = PropertyGraph(
        spark=spark,
        nodes=spark.createDataFrame(
            [(1, "urn:a", ["P"], {"name": "a"})],
            "id long, uri string, labels array<string>, props map<string,string>",
        ),
        edges=spark.createDataFrame(
            [],
            "id long, src long, dst long, predicate string, props map<string,string>",
        ),
    )
    from pyspark.sql import functions as F

    g2 = cypher_write(
        g,
        "MERGE (n:P {name: $name}) ",
        params={"name": "bob"},
    )
    assert g2.nodes.count() == 2
    g3 = cypher_write(
        g2,
        "MATCH (n:P {name: $name}) SET n.age = $age",
        params={"name": "bob", "age": 33},
    )
    row = g3.nodes.filter(F.col("props").getItem("name") == "bob").collect()[0]
    assert row["props"]["age"] == "33"


# ---------------------------------------------------------------------------
# shortestPath
# ---------------------------------------------------------------------------


@pytest.fixture()
def chain_graph(spark):
    """1->2->3->4->5 chain plus a 1->3 shortcut, all :T edges."""
    from pidb_rdf_spark.graph import PropertyGraph

    return PropertyGraph(
        spark=spark,
        nodes=spark.createDataFrame(
            [(i, f"urn:n{i}", ["P"], {"name": f"n{i}"}) for i in range(1, 6)],
            "id long, uri string, labels array<string>, props map<string,string>",
        ),
        edges=spark.createDataFrame(
            [
                (10, 1, 2, "T", {}),
                (11, 2, 3, "T", {}),
                (12, 3, 4, "T", {}),
                (13, 4, 5, "T", {}),
                (14, 1, 3, "T", {}),
            ],
            "id long, src long, dst long, predicate string, props map<string,string>",
        ),
    )


def test_shortest_path_basic(chain_graph):
    got = rows(
        cypher(
            chain_graph,
            "MATCH p = shortestPath((a:P {name: 'n1'})-[:T*]->(b)) "
            "RETURN b.name AS name, length(p) AS hops ORDER BY name",
        )
    )
    # the 1->3 shortcut makes n3 distance 1, n4 distance 2, n5 distance 3
    assert got == [("n2", 1), ("n3", 1), ("n4", 2), ("n5", 3)]


def test_shortest_path_bounded_and_zero_lower(chain_graph):
    got = rows(
        cypher(
            chain_graph,
            "MATCH p = shortestPath((a:P {name: 'n1'})-[:T*..2]->(b)) "
            "RETURN b.name AS name, length(p) AS hops ORDER BY name",
        )
    )
    assert got == [("n2", 1), ("n3", 1), ("n4", 2)]
    got = rows(
        cypher(
            chain_graph,
            "MATCH p = shortestPath((a:P {name: 'n1'})-[:T*0..1]->(b)) "
            "RETURN b.name AS name, length(p) AS hops ORDER BY name",
        )
    )
    # zero lower bound includes the zero-length self path
    assert got == [("n1", 0), ("n2", 1), ("n3", 1)]


def test_shortest_path_both_endpoints_constrained(chain_graph):
    got = rows(
        cypher(
            chain_graph,
            "MATCH p = shortestPath((a:P {name: 'n1'})-[:T*]->(b:P {name: 'n5'})) "
            "RETURN length(p) AS hops",
        )
    )
    assert got == [(3,)]


def test_shortest_path_prebound_far_node_and_where(chain_graph):
    got = rows(
        cypher(
            chain_graph,
            "MATCH (b:P {name: 'n4'}) "
            "MATCH p = shortestPath((a:P {name: 'n1'})-[:T*]->(b)) "
            "RETURN length(p) AS hops",
        )
    )
    assert got == [(2,)]
    got = rows(
        cypher(
            chain_graph,
            "MATCH p = shortestPath((a:P {name: 'n1'})-[:T*]->(b)) "
            "WHERE length(p) >= 2 "
            "RETURN b.name AS name ORDER BY name",
        )
    )
    assert got == [("n4",), ("n5",)]


def test_shortest_path_undirected(chain_graph):
    got = rows(
        cypher(
            chain_graph,
            "MATCH p = shortestPath((a:P {name: 'n3'})-[:T*]-(b)) "
            "RETURN b.name AS name, length(p) AS hops ORDER BY name",
        )
    )
    # undirected: n1 via the shortcut (1), n2 via either chain hop (1),
    # n4 forward (1), n5 forward (2)
    assert got == [("n1", 1), ("n2", 1), ("n4", 1), ("n5", 2)]


def test_shortest_path_oracle_customer_region(graph):
    got = rows(
        cypher(
            graph,
            "MATCH p = shortestPath("
            "(c:Customer)-[:IN_NATION|IN_REGION*]->(r:Region)) "
            "RETURN c.c_name AS name, r.r_name AS region, "
            "length(p) AS hops ORDER BY name",
        )
    )
    want = oracle(
        """SELECT c_name, r_name, 2 FROM customer
           JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           ORDER BY c_name"""
    )
    assert got == [tuple(w) for w in want]


def test_all_shortest_paths_multiplicity(spark):
    """allShortestPaths (r9): each pair appears once per distinct
    shortest path — the diamond has TWO 2-hop routes 1->4."""
    from pidb_rdf_spark.graph import PropertyGraph

    g = PropertyGraph(
        spark=spark,
        nodes=spark.createDataFrame(
            [(i, f"urn:n{i}", ["P"], {"name": f"n{i}"}) for i in range(1, 6)],
            "id long, uri string, labels array<string>, props map<string,string>",
        ),
        edges=spark.createDataFrame(
            [
                (10, 1, 2, "T", {}),
                (11, 1, 3, "T", {}),
                (12, 2, 4, "T", {}),
                (13, 3, 4, "T", {}),
                (14, 4, 5, "T", {}),
            ],
            "id long, src long, dst long, predicate string, props map<string,string>",
        ),
    )
    got = rows(
        cypher(
            g,
            "MATCH p = allShortestPaths((a:P {name: 'n1'})-[:T*]->(b)) "
            "RETURN b.name AS name, length(p) AS hops ORDER BY name",
        )
    )
    # n2/n3: one 1-hop path each; n4: TWO 2-hop paths; n5: two 3-hop
    assert got == [
        ("n2", 1), ("n3", 1), ("n4", 2), ("n4", 2), ("n5", 3), ("n5", 3)
    ]
    # plain shortestPath keeps one row per pair
    got1 = rows(
        cypher(
            g,
            "MATCH p = shortestPath((a:P {name: 'n1'})-[:T*]->(b)) "
            "RETURN b.name AS name, length(p) AS hops ORDER BY name",
        )
    )
    assert got1 == [("n2", 1), ("n3", 1), ("n4", 2), ("n5", 3)]
    # aggregate over the bag: count(*) = number of shortest paths
    gotc = rows(
        cypher(
            g,
            "MATCH p = allShortestPaths("
            "(a:P {name: 'n1'})-[:T*]->(b:P {name: 'n5'})) "
            "RETURN count(*) AS n_paths, min(length(p)) AS hops",
        )
    )
    assert gotc == [(2, 3)]


def test_all_shortest_paths_brute_force_oracle(chain_graph):
    """Multiplicities on the chain+shortcut graph match explicit path
    enumeration (every minimal-length route counted once)."""
    # chain 1->2->3->4->5 with shortcut 1->3: from 1, every target has
    # exactly ONE shortest route (the shortcut strictly dominates)
    got = rows(
        cypher(
            chain_graph,
            "MATCH p = allShortestPaths((a:P {name: 'n1'})-[:T*]->(b)) "
            "RETURN b.name AS name, length(p) AS hops ORDER BY name",
        )
    )
    assert got == [("n2", 1), ("n3", 1), ("n4", 2), ("n5", 3)]
    # undirected from n3: n2 is reachable in 1 hop two ways? no —
    # 3<-2 only (3->2 does not exist; the 1->3 shortcut gives a
    # second 2-hop route to n1... n1 at 1 hop via the shortcut)
    got = rows(
        cypher(
            chain_graph,
            "MATCH p = allShortestPaths((a:P {name: 'n3'})-[:T*]-(b)) "
            "RETURN b.name AS name, length(p) AS hops ORDER BY name",
        )
    )
    assert got == [("n1", 1), ("n2", 1), ("n4", 1), ("n5", 2)]


def test_shortest_path_rejections(chain_graph):
    with pytest.raises(CypherSyntaxError):
        cypher(
            chain_graph,
            "MATCH p = shortestPath((a:P)-[:T*2..]->(b)) RETURN length(p) AS h",
        )
    with pytest.raises(CypherSyntaxError):
        # bare path variable outside length()
        cypher(
            chain_graph,
            "MATCH p = shortestPath((a:P)-[:T*]->(b)) RETURN p AS p",
        )
    with pytest.raises(CypherSyntaxError, match="only"):
        # shortestPath must be the clause's only pattern under OPTIONAL
        cypher(
            chain_graph,
            "MATCH (a:P) OPTIONAL MATCH p = shortestPath((a)-[:T*]->(b)), "
            "(a)-[:T]->(c) RETURN length(p) AS h",
        )
    with pytest.raises(CypherSyntaxError):
        # relationship variable inside shortestPath
        cypher(
            chain_graph,
            "MATCH p = shortestPath((a:P)-[r:T*]->(b)) RETURN length(p) AS h",
        )


def test_length_still_means_string_length(graph):
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation) RETURN n.n_name AS name, "
            "length(n.n_name) AS len ORDER BY name LIMIT 3",
        )
    )
    want = oracle(
        "SELECT n_name, LENGTH(n_name) FROM nation ORDER BY n_name LIMIT 3"
    )
    assert got == [tuple(w) for w in want]


# ---------------------------------------------------------------------------
# =~ regex, properties()/keys(), collect(DISTINCT)
# ---------------------------------------------------------------------------


def test_regex_match_is_anchored(graph):
    # nation names are NATION_0 .. NATION_24 (no zero padding):
    # NATION_[0-9] full-matches exactly the ten single-digit ones
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation) WHERE n.n_name =~ 'NATION_[0-9]' "
            "RETURN n.n_name AS name ORDER BY name",
        )
    )
    want = oracle(
        """SELECT n_name FROM nation
           WHERE regexp_full_match(n_name, 'NATION_[0-9]')
           ORDER BY n_name"""
    )
    assert len(got) == 10
    assert got == [tuple(w) for w in want]
    # Cypher string escapes: '\\d' in source reaches the engine as \d
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation) WHERE n.n_name =~ 'NATION_\\\\d' "
            "RETURN count(*) AS n",
        )
    )
    assert got == [(10,)]
    # anchored: a prefix that would substring-match must NOT match
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation) WHERE n.n_name =~ 'NATION' "
            "RETURN count(*) AS n",
        )
    )
    assert got == [(0,)]


def test_regex_param_and_nonliteral_rejected(graph):
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation) WHERE n.n_name =~ $rx RETURN count(*) AS n",
            params={"rx": "NATION_.*"},
        )
    )
    want = oracle("SELECT COUNT(*) FROM nation")
    assert got == [tuple(w) for w in want]
    with pytest.raises(CypherSyntaxError):
        cypher(
            graph,
            "MATCH (n:Nation) WHERE n.n_name =~ n.n_name RETURN count(*) AS n",
        )


def test_collect_distinct_sorted(graph):
    got = rows(
        cypher(
            graph,
            "MATCH (c:Customer)-[:IN_NATION]->(n:Nation)-[:IN_REGION]->(r:Region) "
            "WHERE r.r_name = 'ASIA' "
            "RETURN collect(DISTINCT n.n_name) AS nations",
        )
    )
    want = oracle(
        """SELECT DISTINCT n_name FROM customer
           JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           WHERE r_name = 'ASIA' ORDER BY n_name"""
    )
    assert got == [(sorted(w[0] for w in want),)]


def test_properties_and_keys(graph):
    got = rows(
        cypher(
            graph,
            "MATCH (r:Region) WHERE r.r_name = 'ASIA' "
            "RETURN keys(r) AS ks",
        )
    )
    assert len(got) == 1
    ks = got[0][0]
    # hot typed columns surface through keys()
    assert "r_name" in ks and "r_regionkey" in ks and ks == sorted(ks)
    got = rows(
        cypher(
            graph,
            "MATCH (r:Region) WHERE r.r_name = 'ASIA' "
            "RETURN properties(r) AS ps",
        )
    )
    ps = got[0][0]
    assert ps["r_name"] == "ASIA"


def test_properties_of_relationship(spark):
    from pidb_rdf_spark.graph import PropertyGraph

    g = PropertyGraph(
        spark=spark,
        nodes=spark.createDataFrame(
            [(1, "urn:a", ["P"], {}), (2, "urn:b", ["P"], {})],
            "id long, uri string, labels array<string>, props map<string,string>",
        ),
        edges=spark.createDataFrame(
            [(10, 1, 2, "T", {"w": "5"})],
            "id long, src long, dst long, predicate string, props map<string,string>",
        ),
    )
    got = rows(cypher(g, "MATCH (a:P)-[r:T]->(b:P) RETURN properties(r) AS ps"))
    assert got == [({"w": "5"},)]


# ---------------------------------------------------------------------------
# list comprehensions, list predicates, range()
# ---------------------------------------------------------------------------


def test_range_and_unwind(graph):
    got = rows(
        cypher(
            graph,
            "UNWIND range(1, 5) AS x RETURN x ORDER BY x",
        )
    )
    assert got == [(1,), (2,), (3,), (4,), (5,)]
    got = rows(cypher(graph, "UNWIND range(0, 10, 5) AS x RETURN x ORDER BY x"))
    assert got == [(0,), (5,), (10,)]


def test_list_comprehension_filter_and_map(graph):
    got = rows(
        cypher(
            graph,
            "WITH [1, 2, 3, 4, 5] AS xs "
            "RETURN [x IN xs WHERE x % 2 = 0 | x * 10] AS evens",
        )
    )
    assert got == [([20, 40],)]
    # filter-only and map-only forms
    got = rows(
        cypher(graph, "WITH range(1, 4) AS xs RETURN [x IN xs WHERE x > 2] AS t")
    )
    assert got == [([3, 4],)]
    got = rows(
        cypher(graph, "WITH range(1, 3) AS xs RETURN [x IN xs | x + 1] AS t")
    )
    assert got == [([2, 3, 4],)]


def test_list_predicates(graph):
    q = (
        "WITH {lst} AS xs RETURN any(x IN xs WHERE x > 3) AS a, "
        "all(x IN xs WHERE x > 0) AS b, none(x IN xs WHERE x = 2) AS c, "
        "single(x IN xs WHERE x = 1) AS d"
    )
    got = rows(cypher(graph, q.format(lst="[1, 2, 3]")))
    assert got == [(False, True, False, True)]
    got = rows(cypher(graph, q.format(lst="[4, 5]")))
    assert got == [(True, True, True, False)]


def test_list_comprehension_over_collected(graph):
    # collect nation names per region, then comprehension-filter them
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation)-[:IN_REGION]->(r:Region) "
            "WITH r.r_name AS region, collect(DISTINCT n.n_name) AS nations "
            "RETURN region, size([x IN nations WHERE x ENDS WITH '1']) AS n1 "
            "ORDER BY region",
        )
    )
    want = oracle(
        """SELECT r_name, COUNT(*) FILTER (WHERE n_name LIKE '%1') FROM nation
           JOIN region ON n_regionkey = r_regionkey
           GROUP BY r_name ORDER BY r_name"""
    )
    assert got == [tuple(w) for w in want]


def test_lambda_var_shadows_outer_binding(graph):
    # x bound by UNWIND, shadowed inside the comprehension
    got = rows(
        cypher(
            graph,
            "UNWIND [10, 20] AS x "
            "RETURN x, [x IN range(1, 2) | x] AS inner ORDER BY x",
        )
    )
    assert got == [(10, [1, 2]), (20, [1, 2])]


def test_list_predicate_in_where(graph):
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation)-[:IN_REGION]->(r:Region) "
            "WITH r.r_name AS region, collect(DISTINCT n.n_name) AS nations "
            "WHERE any(x IN nations WHERE x = 'NATION_3') "
            "RETURN region",
        )
    )
    want = oracle(
        """SELECT r_name FROM nation JOIN region
           ON n_regionkey = r_regionkey WHERE n_name = 'NATION_3'"""
    )
    assert got == [tuple(w) for w in want]


def test_reduce(graph):
    got = rows(
        cypher(
            graph,
            "WITH [1, 2, 3, 4] AS xs "
            "RETURN reduce(acc = 0, x IN xs | acc + x) AS total, "
            "reduce(acc = 1, x IN [2, 3, 4] | acc * x) AS prod",
        )
    )
    assert got == [(10, 24)]
    # over collected real data: total customers across nations = count
    got = rows(
        cypher(
            graph,
            "MATCH (c:Customer)-[:IN_NATION]->(n:Nation) "
            "WITH n.n_name AS nation, count(*) AS custs "
            "WITH collect(custs) AS per_nation "
            "RETURN reduce(acc = 0, x IN per_nation | acc + x) AS total",
        )
    )
    want = oracle("SELECT COUNT(*) FROM customer")
    assert got == [tuple(w) for w in want]


def test_startnode_endnode(graph):
    got = rows(
        cypher(
            graph,
            "MATCH (c:Customer)-[r:IN_NATION]->(n:Nation) "
            "WHERE startNode(r) = id(c) AND endNode(r) = id(n) "
            "RETURN count(*) AS ok",
        )
    )
    want = oracle("SELECT COUNT(*) FROM customer")
    assert got == [tuple(w) for w in want]
    # endpoints of a reversed arrow still follow the stored edge
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation)<-[r:IN_NATION]-(c:Customer) "
            "WHERE startNode(r) = id(c) RETURN count(*) AS ok",
        )
    )
    assert got == [tuple(w) for w in want]


# ---------------------------------------------------------------------------
# CALL procedures
# ---------------------------------------------------------------------------


def test_call_db_labels_and_types(graph):
    got = rows(cypher(graph, "CALL db.labels()"))
    labels = [g[0] for g in got]
    for expected in ("Customer", "Supplier", "Nation", "Region", "Orders", "Part"):
        assert expected in labels
    assert labels == sorted(labels) and len(labels) == len(set(labels))
    got = rows(cypher(graph, "CALL db.relationshipTypes()"))
    names = [g[0] for g in got]
    assert "IN_NATION" in names and "PLACED_BY" in names
    assert names == sorted(names)


def test_call_yield_alias_and_errors(graph):
    got = rows(cypher(graph, "CALL db.labels() YIELD label AS l"))
    assert got and all(len(g) == 1 for g in got)
    keys = rows(cypher(graph, "CALL db.propertyKeys()"))
    flat = [k[0] for k in keys]
    assert "c_name" in flat and "n_name" in flat and flat == sorted(flat)
    with pytest.raises(CypherSyntaxError, match="unknown procedure"):
        cypher(graph, "CALL db.nothing()")
    with pytest.raises(CypherSyntaxError, match="yields"):
        cypher(graph, "CALL db.labels() YIELD foo")
    with pytest.raises(CypherSyntaxError, match="first clause"):
        cypher(graph, "MATCH (n) CALL db.labels()")


def test_date_filters(graph):
    # explicit date() cast and implicit string comparison both work
    got = rows(
        cypher(
            graph,
            "MATCH (o:Orders) WHERE o.o_orderdate >= date('1997-01-01') "
            "RETURN count(*) AS n",
        )
    )
    want = oracle(
        "SELECT COUNT(*) FROM orders WHERE o_orderdate >= DATE '1997-01-01'"
    )
    assert got == [tuple(w) for w in want]
    # o_orderdate lives in the schemaless props map (string-typed);
    # date() casts it for typed comparison, and min/max over the
    # ISO format agree with the timestamp oracle
    got = rows(
        cypher(
            graph,
            "MATCH (o:Orders) "
            "RETURN max(date(o.o_orderdate)) AS latest, "
            "min(date(o.o_orderdate)) AS first",
        )
    )
    want = oracle("SELECT MAX(o_orderdate), MIN(o_orderdate) FROM orders")
    assert [(str(a), str(b)) for a, b in got] == [
        (str(w[0].date()), str(w[1].date())) for w in want
    ]


# ---------------------------------------------------------------------------
# UNION / UNION ALL
# ---------------------------------------------------------------------------


def test_union_dedups_and_union_all_keeps(graph):
    got = rows(
        cypher(
            graph,
            "MATCH (c:Customer)-[:IN_NATION]->(n:Nation) RETURN n.n_name AS name "
            "UNION "
            "MATCH (s:Supplier)-[:IN_NATION]->(n:Nation) RETURN n.n_name AS name",
        )
    )
    want = oracle(
        """SELECT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
           UNION
           SELECT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey"""
    )
    assert sorted(g[0] for g in got) == sorted(w[0] for w in want)
    got_all = rows(
        cypher(
            graph,
            "MATCH (n:Nation) RETURN n.n_name AS name "
            "UNION ALL MATCH (n:Nation) RETURN n.n_name AS name",
        )
    )
    want_all = oracle(
        "SELECT n_name FROM nation UNION ALL SELECT n_name FROM nation"
    )
    assert sorted(g[0] for g in got_all) == sorted(w[0] for w in want_all)


def test_union_with_aggregates_and_order_in_parts(graph):
    got = rows(
        cypher(
            graph,
            "MATCH (c:Customer) RETURN 'customers' AS kind, count(*) AS n "
            "UNION ALL "
            "MATCH (s:Supplier) RETURN 'suppliers' AS kind, count(*) AS n",
        )
    )
    want = oracle(
        """SELECT 'customers' AS kind, COUNT(*) FROM customer
           UNION ALL SELECT 'suppliers', COUNT(*) FROM supplier"""
    )
    assert sorted(got) == sorted(tuple(w) for w in want)


def test_union_errors(graph):
    with pytest.raises(CypherSyntaxError, match="same column names"):
        cypher(
            graph,
            "MATCH (n:Nation) RETURN n.n_name AS a "
            "UNION MATCH (n:Nation) RETURN n.n_name AS b",
        )
    with pytest.raises(CypherSyntaxError, match="combination"):
        cypher(
            graph,
            "MATCH (n:Nation) RETURN n.n_name AS a "
            "UNION MATCH (n:Nation) RETURN n.n_name AS a "
            "UNION ALL MATCH (n:Nation) RETURN n.n_name AS a",
        )
    from pidb_rdf_spark.cypher_write import cypher_write
    with pytest.raises(CypherSyntaxError):
        # UNION is a read-surface construct; the write parser stops at it
        cypher_write(graph, "CREATE (n:X) UNION CREATE (m:Y)")


def test_call_subquery_post_union_aggregation(graph):
    got = rows(
        cypher(
            graph,
            "CALL { "
            "  MATCH (c:Customer)-[:IN_NATION]->(n:Nation) "
            "  RETURN n.n_name AS nation, count(*) AS members "
            "  UNION ALL "
            "  MATCH (s:Supplier)-[:IN_NATION]->(n:Nation) "
            "  RETURN n.n_name AS nation, count(*) AS members "
            "} "
            "RETURN nation, sum(members) AS total ORDER BY nation",
        )
    )
    want = oracle(
        """SELECT nation, SUM(members) FROM (
             SELECT n_name AS nation, COUNT(*) AS members FROM customer
               JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name
             UNION ALL
             SELECT n_name, COUNT(*) FROM supplier
               JOIN nation ON s_nationkey = n_nationkey GROUP BY n_name
           ) GROUP BY nation ORDER BY nation"""
    )
    assert got == [tuple(w) for w in want]


def test_call_subquery_then_where_and_limit(graph):
    got = rows(
        cypher(
            graph,
            "CALL { MATCH (n:Nation) RETURN n.n_name AS name } "
            "WITH name WHERE name ENDS WITH '1' "
            "RETURN name ORDER BY name LIMIT 2",
        )
    )
    want = oracle(
        """SELECT n_name FROM nation WHERE n_name LIKE '%1'
           ORDER BY n_name LIMIT 2"""
    )
    assert got == [tuple(w) for w in want]


def test_call_procedure_must_lead(graph):
    """Mid-query CALL is the { subquery } form only — a mid-query
    procedure call is rejected (subset rule; leading procedures
    work)."""
    with pytest.raises(CypherSyntaxError):
        cypher(
            graph,
            "MATCH (n:Nation) CALL db.labels() RETURN n.n_name AS x",
        )


def test_statistical_aggregates(graph):
    got = rows(
        cypher(
            graph,
            "MATCH (c:Customer) "
            "RETURN stDev(c.c_acctbal) AS sd, stDevP(c.c_acctbal) AS sdp, "
            "percentileCont(c.c_acctbal, 0.5) AS med, "
            "percentileDisc(c.c_acctbal, 0.5) AS medd",
        )
    )
    want = oracle(
        """SELECT STDDEV_SAMP(c_acctbal), STDDEV_POP(c_acctbal),
                  PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY c_acctbal),
                  PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY c_acctbal)
           FROM customer"""
    )
    g0, w0 = got[0], want[0]
    for i in range(4):
        assert g0[i] == pytest.approx(w0[i]), (i, g0[i], w0[i])
    # grouped percentileDisc picks an actual member value
    got = rows(
        cypher(
            graph,
            "MATCH (c:Customer)-[:IN_NATION]->(n:Nation) "
            "RETURN n.n_name AS nation, percentileDisc(c.c_acctbal, 0.5) AS m "
            "ORDER BY nation",
        )
    )
    want = oracle(
        """SELECT n_name, PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY c_acctbal)
           FROM customer JOIN nation ON c_nationkey = n_nationkey
           GROUP BY n_name ORDER BY n_name"""
    )
    assert [(g[0],) for g in got] == [(w[0],) for w in want]
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1])


def test_math_function_library(graph):
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation {n_nationkey: 4}) "
            "RETURN exp(1) AS ex, log(e()) AS ln1, log10(100) AS lg, "
            "sin(0) AS s, cos(0) AS c, atan2(1, 1) AS a2, "
            "round(degrees(pi()), 3) AS deg, radians(180) AS rad",
        )
    )
    want = oracle(
        """SELECT EXP(1), LN(EXP(1)), LOG10(100), SIN(0), COS(0),
                  ATAN2(1, 1), ROUND(DEGREES(PI()), 3), RADIANS(180)
           FROM nation WHERE n_nationkey = 4"""
    )
    for g, w in zip(got[0], want[0]):
        assert g == pytest.approx(w)


def test_left_right_functions(graph):
    got = rows(
        cypher(
            graph,
            "MATCH (c:Customer {c_custkey: 7}) "
            "RETURN left(c.c_name, 8) AS pre, right(c.c_name, 3) AS suf",
        )
    )
    want = oracle(
        """SELECT LEFT(c_name, 8), RIGHT(c_name, 3)
           FROM customer WHERE c_custkey = 7"""
    )
    assert got == want


# ---------------------------------------------------------------------------
# named paths: p = (a)-[r]->(b), nodes(p)/relationships(p)/length(p)
# ---------------------------------------------------------------------------


def test_named_path_observations(graph):
    got = rows(
        cypher(
            graph,
            "MATCH p = (c:Customer)-[:IN_NATION]->(n:Nation) "
            "WHERE c.c_custkey = 7 "
            "RETURN length(p) AS l, size(nodes(p)) AS nn, "
            "size(relationships(p)) AS nr, "
            "head(nodes(p)) = id(c) AS first_is_c, "
            "last(nodes(p)) = id(n) AS last_is_n",
        )
    )
    assert got == [(1, 2, 1, True, True)]


def test_named_path_longer_chain_anonymous_middle(graph):
    got = rows(
        cypher(
            graph,
            "MATCH p = (c:Customer)-[:IN_NATION]->()-[:IN_REGION]->(r:Region) "
            "WHERE c.c_custkey = 7 "
            "RETURN length(p) AS l, size(nodes(p)) AS nn, r.r_name AS reg",
        )
    )
    want = oracle(
        """SELECT 2, 3, r_name FROM customer
           JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           WHERE c_custkey = 7"""
    )
    assert got == [tuple(w) for w in want]


def test_named_path_rel_var_and_uniqueness(spark):
    g = _chain5(spark)
    # the two hops of one named path may not reuse a relationship
    got = rows(
        cypher(
            g,
            "MATCH p = (a)-[r1:T]->(b)-[r2:T]->(c) "
            "RETURN length(p) AS l, count(*) AS n",
        )
    )
    assert got == [(2, 3)]  # 1-2-3, 2-3-4, 3-4-5
    # relationships(p) carries the same edge ids as the bound vars
    got = rows(
        cypher(
            g,
            "MATCH p = (a)-[r1:T]->(b) "
            "RETURN head(relationships(p)) = id(r1) AS same LIMIT 1",
        )
    )
    assert got == [(True,)]


def test_named_path_errors(graph):
    with pytest.raises(CypherSyntaxError, match="variable-length"):
        cypher(graph, "MATCH p = (a)-[:T*1..2]->(b) RETURN length(p) AS l")
    with pytest.raises(CypherSyntaxError, match="nodes\\(\\)/relationships"):
        cypher(graph, "MATCH p = (a)-[:IN_NATION]->(b) RETURN p")
    with pytest.raises(CypherSyntaxError, match="named path"):
        cypher(
            graph,
            "MATCH (a:Customer) OPTIONAL MATCH p = (a)-[:IN_NATION]->(b) "
            "RETURN length(p) AS l",
        )
    with pytest.raises(CypherSyntaxError, match="already bound"):
        cypher(
            graph,
            "MATCH p = (a)-[:IN_NATION]->(b), p = (a)-[:IN_NATION]->(c) "
            "RETURN length(p) AS l",
        )


# ---------------------------------------------------------------------------
# EXISTS { } / COUNT { } subquery expressions
# ---------------------------------------------------------------------------


def test_exists_subquery_top_level(graph):
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation) "
            "WHERE EXISTS { (s:Supplier)-[:IN_NATION]->(n) } "
            "RETURN n.n_name AS name ORDER BY name",
        )
    )
    want = oracle(
        """SELECT n_name FROM nation
           WHERE EXISTS (SELECT 1 FROM supplier WHERE s_nationkey = n_nationkey)
           ORDER BY n_name"""
    )
    assert got == want


def test_exists_subquery_with_match_and_where(graph):
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation) "
            "WHERE NOT EXISTS { MATCH (c:Customer)-[:IN_NATION]->(n) "
            "WHERE c.c_acctbal > 9900 } "
            "RETURN count(*) AS k",
        )
    )
    want = oracle(
        """SELECT COUNT(*) FROM nation WHERE NOT EXISTS
           (SELECT 1 FROM customer
            WHERE c_nationkey = n_nationkey AND c_acctbal > 9900)"""
    )
    assert got == want


def test_count_subquery_in_return(graph):
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation) "
            "RETURN n.n_name AS name, "
            "COUNT { (c:Customer)-[:IN_NATION]->(n) } AS custs "
            "ORDER BY name",
        )
    )
    want = oracle(
        """SELECT n_name,
                  (SELECT COUNT(*) FROM customer WHERE c_nationkey = n_nationkey)
           FROM nation ORDER BY n_name"""
    )
    assert got == want  # includes 0-customer nations


def test_count_subquery_with_where_in_filter(graph):
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation) "
            "WHERE COUNT { (c:Customer)-[:IN_NATION]->(n) "
            "WHERE c.c_acctbal > 5000 } >= 3 "
            "RETURN n.n_name AS name ORDER BY name",
        )
    )
    want = oracle(
        """SELECT n_name FROM nation
           WHERE (SELECT COUNT(*) FROM customer
                  WHERE c_nationkey = n_nationkey AND c_acctbal > 5000) >= 3
           ORDER BY n_name"""
    )
    assert got == want


def test_count_subquery_uncorrelated_and_in_with(graph):
    # uncorrelated COUNT{}: a global constant per row
    got = rows(
        cypher(
            graph,
            "MATCH (r:Region) "
            "RETURN r.r_name AS name, COUNT { (n:Nation) } AS nations "
            "ORDER BY name LIMIT 2",
        )
    )
    want = oracle(
        """SELECT r_name, (SELECT COUNT(*) FROM nation)
           FROM region ORDER BY r_name LIMIT 2"""
    )
    assert got == want
    # COUNT{} in a WITH item, filtered by the post-WITH WHERE
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation) "
            "WITH n.n_name AS name, "
            "COUNT { (s:Supplier)-[:IN_NATION]->(n) } AS sups "
            "WHERE sups > 0 RETURN name, sups ORDER BY name",
        )
    )
    want = oracle(
        """SELECT n_name, (SELECT COUNT(*) FROM supplier
                           WHERE s_nationkey = n_nationkey) AS sups
           FROM nation WHERE sups > 0 ORDER BY n_name"""
    )
    assert got == want


def test_exists_subquery_correlated_on_property(graph):
    # the subquery WHERE references an outer variable's property
    got = rows(
        cypher(
            graph,
            "MATCH (c:Customer)-[:IN_NATION]->(n:Nation) "
            "WHERE EXISTS { MATCH (s:Supplier)-[:IN_NATION]->(n) "
            "WHERE s.s_acctbal > c.c_acctbal } "
            "RETURN count(*) AS k",
        )
    )
    want = oracle(
        """SELECT COUNT(*) FROM customer JOIN nation ON c_nationkey = n_nationkey
           WHERE EXISTS (SELECT 1 FROM supplier
                         WHERE s_nationkey = n_nationkey
                           AND s_acctbal > c_acctbal)"""
    )
    assert got == want


def test_exists_subquery_in_case_and_return(graph):
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation) "
            "RETURN n.n_name AS name, "
            "CASE WHEN EXISTS { (s:Supplier)-[:IN_NATION]->(n) } "
            "THEN 'has' ELSE 'none' END AS sup "
            "ORDER BY name LIMIT 5",
        )
    )
    want = oracle(
        """SELECT n_name,
                  CASE WHEN EXISTS (SELECT 1 FROM supplier
                                    WHERE s_nationkey = n_nationkey)
                       THEN 'has' ELSE 'none' END
           FROM nation ORDER BY n_name LIMIT 5"""
    )
    assert got == want


def test_unwind_batch_of_maps_read(graph):
    got = rows(
        cypher(
            graph,
            "UNWIND $batch AS row "
            "RETURN row.name AS name, row.age * 2 AS dbl ORDER BY name",
            params={"batch": [{"name": "b", "age": 2}, {"name": "a", "age": 1}]},
        )
    )
    assert got == [("a", 2), ("b", 4)]


def test_return_star_and_with_star(graph):
    got = rows(
        cypher(
            graph,
            "MATCH (c:Customer)-[:IN_NATION]->(n:Nation) "
            "WHERE c.c_custkey <= 3 RETURN * ORDER BY c",
        )
    )
    want = oracle(
        """SELECT c_custkey, n_nationkey FROM customer
           JOIN nation ON c_nationkey = n_nationkey
           WHERE c_custkey <= 3 ORDER BY c_custkey"""
    )
    # node variables project as ids; ids here are xxhash64 of uris, so
    # compare shapes and grouping instead of raw values
    assert len(got) == len(want) and all(len(r) == 2 for r in got)
    # star + extra aggregate: star vars become the group keys
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation)<-[:IN_NATION]-(c:Customer) "
            "WITH n.n_name AS name, c WITH name, count(c) AS k "
            "RETURN *, k * 2 AS dbl ORDER BY name LIMIT 3",
        )
    )
    want = oracle(
        """SELECT n_name, COUNT(*), COUNT(*) * 2 FROM nation
           JOIN customer ON c_nationkey = n_nationkey
           GROUP BY n_name ORDER BY n_name LIMIT 3"""
    )
    assert got == [tuple(w) for w in want]


def test_star_errors(graph):
    with pytest.raises(CypherSyntaxError, match="no variables"):
        cypher(graph, "RETURN *")
    with pytest.raises(CypherSyntaxError, match="same name"):
        cypher(
            graph,
            "MATCH (n:Nation) RETURN n.n_name AS x, n.n_nationkey AS x",
        )
    with pytest.raises(CypherSyntaxError, match="path variable"):
        cypher(
            graph,
            "MATCH p = (c:Customer)-[:IN_NATION]->(n) RETURN *",
        )


def test_parser_fuzz_no_crash():
    """Hypothesis fuzz over grammar fragments: any text either parses
    or raises CypherSyntaxError — never another exception type, never
    a hang (same contract as the SPARQL/Turtle parser fuzz)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pidb_rdf_spark.cypher import _Parser

    fragments = st.sampled_from([
        "MATCH", "OPTIONAL MATCH", "RETURN", "WITH", "WHERE", "UNWIND",
        "EXISTS", "COUNT", "(n:Person)", "(m)", "-[:T]->", "<-[r:T]-",
        "-[*1..3]->", "p =", "shortestPath", "*", "{", "}", "(", ")",
        ",", "n.name", "AS x", "count(*)", "collect(DISTINCT n)",
        "'str'", "42", "-7", "[1, 2]", "ORDER BY", "SKIP 1", "LIMIT 3",
        "CREATE", "MERGE", "SET", "REMOVE", "DETACH DELETE", "=", "+=",
        "{k: 1}", "CASE", "WHEN", "THEN", "END", "UNION", "ALL",
        "CALL", "db.labels()", "YIELD", "$param", "AND", "OR", "NOT",
        "=~", "STARTS WITH", "IS NULL", "nodes(p)", "length(p)",
        "FOREACH", "(x IN [1, 2] |", "|", "[(a)-[:T]->(b) | a.x]",
        "n {.k, y: 1}", "{.*}", "CALL { WITH n", "RETURN n }",
        # r9 surfaces
        "allShortestPaths", "OPTIONAL MATCH p = shortestPath",
        "ORDER BY x LIMIT 2 }", "SKIP 2 }", "reduce(s = 0, y IN xs | s + y)",
        "any(y IN xs WHERE y > 1)", "percentileDisc(n.x, 0.5)",
        "stDev(n.x)", "round(n.x, 1)",
        # late-r9 surfaces
        "COLLECT {", "RETURN DISTINCT n.x }", "RETURN n.x }",
    ])

    @given(st.lists(fragments, min_size=1, max_size=12))
    @settings(max_examples=300, deadline=None)
    def run(parts):
        text = " ".join(parts)
        try:
            _Parser(text).parse_multi()
        except SyntaxError:
            pass  # CypherSyntaxError subclasses SyntaxError

    run()


def test_pattern_comprehension_collects_per_row(graph):
    """[(c)-[:T]->(n) WHERE p | e] joins one collect_list per outer
    row; unmatched rows get [] (elements sorted — order is
    unspecified in Cypher, pinned ascending here)."""
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation) "
            "RETURN n.n_name AS nation, "
            "[(c:Customer)-[:IN_NATION]->(n) WHERE c.c_acctbal > 9900 "
            "| c.c_name] AS rich ORDER BY nation",
        )
    )
    want = oracle(
        """SELECT n_name,
                  COALESCE(LIST(c_name ORDER BY c_name)
                           FILTER (c_name IS NOT NULL), []) AS rich
           FROM nation LEFT JOIN customer
             ON c_nationkey = n_nationkey AND c_acctbal > 9900
           GROUP BY n_name ORDER BY n_name"""
    )
    assert got == want


def test_pattern_comprehension_in_where_and_size(graph):
    """size([...]) inside WHERE — the rewritten list column filters
    the outer rows (per-nation degree test)."""
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation) "
            "WHERE size([(c:Customer)-[:IN_NATION]->(n) | c.c_name]) > 7 "
            "RETURN n.n_name AS nation ORDER BY nation",
        )
    )
    want = oracle(
        """SELECT n_name FROM nation JOIN customer
             ON c_nationkey = n_nationkey
           GROUP BY n_name HAVING COUNT(*) > 7 ORDER BY n_name"""
    )
    assert got == want


def test_pattern_comprehension_backtracks_to_list_literal(graph):
    """A parenthesized expression opening a list stays a list literal
    — the pattern-comprehension try backtracks cleanly."""
    got = rows(cypher(graph, "RETURN [(1 + 2), 3] AS l"))
    assert got == [(([3, 3]),)]


def test_pattern_comprehension_requires_relationship(graph):
    with pytest.raises(CypherSyntaxError, match="at least one relationship"):
        cypher(graph, "MATCH (n:Nation) RETURN [(n) | n.n_name] AS x")


def test_map_projection_props_and_computed(graph):
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation) WHERE n.n_name = 'NATION_7' "
            "RETURN n {.n_name, kind: 'nation'} AS m",
        )
    )
    assert got == [({"n_name": "NATION_7", "kind": "nation"},)]


def test_map_projection_spread_and_override(graph):
    """.* spreads the full property map; explicit entries win."""
    got = rows(
        cypher(
            graph,
            "MATCH (r:Region) WHERE r.r_name = 'ASIA' "
            "RETURN r {.*, r_name: 'x'} AS m",
        )
    )
    assert len(got) == 1
    m = got[0][0]
    assert m["r_name"] == "x"
    assert "r_regionkey" in m  # spread kept the other properties


def test_map_projection_duplicate_key_rejected(graph):
    with pytest.raises(CypherSyntaxError, match="duplicate key"):
        cypher(
            graph,
            "MATCH (n:Nation) RETURN n {.n_name, n_name: 'x'} AS m",
        )


def test_call_subquery_correlated_aggregate_fills(graph):
    """Correlated CALL { WITH n ... RETURN count(...) }: per-invocation
    aggregation grouped by the imported key; nations with no match
    keep their row with count 0 (Neo4j empty-invocation fill)."""
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation) "
            "CALL { WITH n "
            "  MATCH (s:Supplier)-[:IN_NATION]->(n) RETURN count(s) AS sups } "
            "RETURN n.n_name AS nation, sups ORDER BY nation",
        )
    )
    want = oracle(
        """SELECT n_name,
                  (SELECT COUNT(*) FROM supplier
                   WHERE s_nationkey = n_nationkey) AS sups
           FROM nation ORDER BY n_name"""
    )
    assert got == want
    assert any(w[1] == 0 for w in want)  # the fill case is exercised


def test_call_subquery_non_aggregate_inner_join(graph):
    """A non-aggregating subquery with zero rows eliminates the outer
    row (Cypher cardinality)."""
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation) "
            "CALL { WITH n "
            "  MATCH (s:Supplier)-[:IN_NATION]->(n) RETURN s.s_name AS sup } "
            "RETURN n.n_name AS nation, sup ORDER BY nation, sup",
        )
    )
    want = oracle(
        """SELECT n_name, s_name FROM nation
           JOIN supplier ON s_nationkey = n_nationkey
           ORDER BY n_name, s_name"""
    )
    assert got == want


def test_call_subquery_piped_node_hops_after(graph):
    """A returned node variable keeps its kind: the outer query can
    keep hopping from it."""
    got = rows(
        cypher(
            graph,
            "MATCH (r:Region) "
            "CALL { WITH r MATCH (n:Nation)-[:IN_REGION]->(r) RETURN n } "
            "MATCH (c:Customer)-[:IN_NATION]->(n) "
            "RETURN r.r_name AS region, count(c) AS custs ORDER BY region",
        )
    )
    want = oracle(
        """SELECT r_name, COUNT(*) FROM region
           JOIN nation ON n_regionkey = r_regionkey
           JOIN customer ON c_nationkey = n_nationkey
           GROUP BY r_name ORDER BY r_name"""
    )
    assert got == want


def test_call_subquery_uncorrelated_mid_query(graph):
    got = rows(
        cypher(
            graph,
            "MATCH (r:Region) "
            "CALL { MATCH (n:Nation) RETURN count(n) AS n_nations } "
            "RETURN r.r_name AS region, n_nations ORDER BY region",
        )
    )
    want = oracle(
        """SELECT r_name, (SELECT COUNT(*) FROM nation) AS n_nations
           FROM region ORDER BY r_name"""
    )
    assert got == want


def test_call_subquery_with_star_import(graph):
    got = rows(
        cypher(
            graph,
            "MATCH (r:Region) "
            "CALL { WITH * MATCH (n:Nation)-[:IN_REGION]->(r) "
            "  RETURN count(n) AS nats } "
            "RETURN r.r_name AS region, nats ORDER BY region",
        )
    )
    want = oracle(
        """SELECT r_name, (SELECT COUNT(*) FROM nation
                           WHERE n_regionkey = r_regionkey) AS nats
           FROM region ORDER BY r_name"""
    )
    assert got == want


def test_call_subquery_collect_fill_and_intermediate_with(graph):
    """collect() fills [] for empty invocations; the body may contain
    its own WITH pipeline."""
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation) WHERE n.n_name IN ['NATION_0', 'NATION_1'] "
            "CALL { WITH n "
            "  MATCH (s:Supplier)-[:IN_NATION]->(n) "
            "  WITH s WHERE s.s_acctbal > -1000 "
            "  RETURN collect(s.s_name) AS sups } "
            "RETURN n.n_name AS nation, size(sups) AS n_sups ORDER BY nation",
        )
    )
    want = oracle(
        """SELECT n_name,
                  CAST((SELECT COUNT(*) FROM supplier
                        WHERE s_nationkey = n_nationkey
                          AND s_acctbal > -1000) AS INTEGER) AS n_sups
           FROM nation WHERE n_name IN ('NATION_0', 'NATION_1')
           ORDER BY n_name"""
    )
    assert got == want


def test_call_subquery_errors(graph):
    with pytest.raises(CypherSyntaxError, match="per-invocation"):
        cypher(
            graph,
            "MATCH (n:Nation) CALL { WITH n "
            "MATCH (c:Customer)-[:IN_NATION]->(n) RETURN c LIMIT 1 } "
            "RETURN n.n_name AS x",
        )
    with pytest.raises(CypherSyntaxError, match="already bound"):
        cypher(
            graph,
            "MATCH (n:Nation) CALL { WITH n "
            "MATCH (c:Customer)-[:IN_NATION]->(n) RETURN n } "
            "RETURN n.n_name AS x",
        )
    with pytest.raises(CypherSyntaxError, match="not bound"):
        cypher(
            graph,
            "MATCH (n:Nation) CALL { WITH z MATCH (z)-->(c) RETURN c } "
            "RETURN n.n_name AS x",
        )
    with pytest.raises(CypherSyntaxError, match="must end with RETURN|expected a clause keyword"):
        cypher(
            graph,
            "MATCH (n:Nation) CALL { MATCH (c:Customer) } RETURN n.n_name AS x",
        )


def test_call_subquery_return_star_rejected(graph):
    with pytest.raises(CypherSyntaxError, match="RETURN \\* inside"):
        cypher(
            graph,
            "MATCH (n:Nation) CALL { WITH n "
            "MATCH (c:Customer)-[:IN_NATION]->(n) RETURN * } "
            "RETURN n.n_name AS x",
        )


def test_call_subquery_grouped_aggregation_drops_empty(graph):
    """A body mixing grouping keys with aggregates is a GROUPED
    aggregation per invocation: zero subquery rows -> zero groups ->
    the outer row is eliminated (unlike the aggregate-only body,
    which fills)."""
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation) "
            "CALL { WITH n MATCH (s:Supplier)-[:IN_NATION]->(n) "
            "  RETURN s.s_name AS sup, count(*) AS k } "
            "RETURN n.n_name AS nation, sup, k ORDER BY nation, sup",
        )
    )
    want = oracle(
        """SELECT n_name, s_name, CAST(1 AS BIGINT) FROM nation
           JOIN supplier ON s_nationkey = n_nationkey
           ORDER BY n_name, s_name"""
    )
    assert got == want  # nations without suppliers absent


def test_pattern_comprehension_with_map_projection_element(graph):
    """A map projection as the comprehension's map expression — the
    projected var must correlate (exercises the _expr_vars mapproj
    branch)."""
    got = rows(
        cypher(
            graph,
            "MATCH (r:Region) WHERE r.r_name = 'ASIA' "
            "RETURN size([(n:Nation)-[:IN_REGION]->(r) "
            "| n {.n_name}]) AS cnt",
        )
    )
    want = oracle(
        """SELECT CAST((SELECT COUNT(*) FROM nation
                        JOIN region ON n_regionkey = r_regionkey
                        WHERE r_name = 'ASIA') AS INTEGER)"""
    )
    assert got == want


def test_inline_node_where_equals_clause_where(graph):
    """Neo4j 5 inline pattern predicate: (n:L WHERE e) behaves as the
    clause WHERE."""
    inline = rows(
        cypher(
            graph,
            "MATCH (c:Customer WHERE c.c_acctbal > 9000)-[:IN_NATION]->(n) "
            "RETURN c.c_name AS name, n.n_name AS nation ORDER BY name",
        )
    )
    clause = rows(
        cypher(
            graph,
            "MATCH (c:Customer)-[:IN_NATION]->(n) WHERE c.c_acctbal > 9000 "
            "RETURN c.c_name AS name, n.n_name AS nation ORDER BY name",
        )
    )
    assert inline == clause and len(inline) > 0


def test_inline_rel_where(spark):
    from pidb_rdf_spark.graph import PropertyGraph

    g = PropertyGraph(
        spark,
        spark.createDataFrame(
            [(1, ["P"], {}), (2, ["P"], {}), (3, ["P"], {})],
            "id long, labels array<string>, props map<string,string>",
        ),
        spark.createDataFrame(
            [(10, 1, 2, "T", {"w": "5"}), (11, 1, 3, "T", {"w": "9"})],
            "id long, src long, dst long, predicate string, props map<string,string>",
        ),
    )
    got = rows(
        cypher(
            g,
            "MATCH (a)-[r:T WHERE r.w = '9']->(b) RETURN id(b) AS b",
        )
    )
    assert got == [(3,)]


def test_inline_where_in_optional_match_filters_before_left_join(graph):
    """The inline predicate is part of the match: unmatched rows stay
    with NULL, they are not eliminated."""
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation) "
            "OPTIONAL MATCH (s:Supplier WHERE s.s_acctbal > 1e9)"
            "-[:IN_NATION]->(n) "
            "RETURN n.n_name AS nation, s.s_name AS sup ORDER BY nation",
        )
    )
    want = oracle("SELECT n_name, NULL FROM nation ORDER BY n_name")
    assert got == want


def test_label_alternation_matches_either(graph):
    got = rows(
        cypher(
            graph,
            "MATCH (x:Customer|Supplier)-[:IN_NATION]->(n:Nation) "
            "WHERE n.n_name = 'NATION_3' RETURN count(x) AS k",
        )
    )
    want = oracle(
        """SELECT (SELECT COUNT(*) FROM customer JOIN nation
                   ON c_nationkey = n_nationkey WHERE n_name = 'NATION_3')
                + (SELECT COUNT(*) FROM supplier JOIN nation
                   ON s_nationkey = n_nationkey WHERE n_name = 'NATION_3')"""
    )
    assert got == want


def test_label_alternation_and_inline_where_rejected_in_create(spark):
    from pidb_rdf_spark.cypher_write import cypher_write
    from pidb_rdf_spark.graph import PropertyGraph

    g = PropertyGraph(
        spark,
        spark.createDataFrame(
            [(1, ["P"], {})],
            "id long, labels array<string>, props map<string,string>",
        ),
        spark.createDataFrame(
            [],
            "id long, src long, dst long, predicate string, props map<string,string>",
        ),
    )
    with pytest.raises(CypherSyntaxError, match="read-only"):
        cypher_write(g, "CREATE (n:A|B {k: 1})")
    with pytest.raises(CypherSyntaxError, match="match predicate"):
        cypher_write(g, "CREATE (n:A WHERE n.k = 1)")


def test_inline_where_varlength_rejected(graph):
    with pytest.raises(CypherSyntaxError, match="variable-length"):
        cypher(
            graph,
            "MATCH (a)-[:IN_NATION*1..2 WHERE true]->(b) RETURN id(a) AS x",
        )


def test_map_literal_and_unwind_over_literal_maps(graph):
    """{k: v} map literals compile to structs, so field access and
    UNWIND-over-literal-maps work without $parameters."""
    got = rows(
        cypher(
            graph,
            "UNWIND [{id: 1, name: 'a'}, {id: 2, name: 'b'}] AS row "
            "RETURN row.id AS i, row.name AS n ORDER BY i",
        )
    )
    assert got == [(1, "a"), (2, "b")]
    got = rows(cypher(graph, "RETURN {x: 1 + 1, y: 'z'} AS m"))
    assert got[0][0].asDict() == {"x": 2, "y": "z"}


def test_map_literal_duplicate_key_rejected(graph):
    with pytest.raises(CypherSyntaxError, match="duplicate key"):
        cypher(graph, "RETURN {a: 1, a: 2} AS m")


def test_var_length_property_vs_bruteforce(spark):
    """Property net over the var-length compiler: on random small
    multigraphs, MATCH (a)-[:T*lo..hi]->(b) must equal the distinct
    (start, end) pairs of edge-unique paths with lo <= length <= hi
    (the class of bug the r7 advisory found — min_len handling,
    rebinding, uniqueness)."""
    from collections import defaultdict

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pidb_rdf_spark.graph import PropertyGraph

    def brute(edges, lo, hi, nodes):
        adj = defaultdict(list)
        for eid, s, d in edges:
            adj[s].append((eid, d))
        out = set()

        def walk(start, cur, used, depth):
            if lo <= depth <= hi:
                out.add((start, cur))
            if depth == hi:
                return
            for eid, nxt in adj[cur]:
                if eid not in used:
                    walk(start, nxt, used | {eid}, depth + 1)

        for n in nodes:
            walk(n, n, frozenset(), 0)
        return {(a, b) for a, b in out if True}

    edge_strat = st.lists(
        st.tuples(st.integers(1, 4), st.integers(1, 4)),
        min_size=1,
        max_size=6,
    )

    @given(
        edge_strat,
        st.integers(1, 3),
        st.integers(0, 2),
    )
    @settings(max_examples=15, deadline=None)
    def run(pairs_list, lo, extra):
        hi = lo + extra
        nodes = sorted({x for p in pairs_list for x in p})
        edges = [(100 + i, s, d) for i, (s, d) in enumerate(pairs_list)]
        g = PropertyGraph(
            spark,
            spark.createDataFrame(
                [(n, ["P"], {}) for n in nodes],
                "id long, labels array<string>, props map<string,string>",
            ),
            spark.createDataFrame(
                [(eid, s, d, "T", {}) for eid, s, d in edges],
                "id long, src long, dst long, predicate string, "
                "props map<string,string>",
            ),
        )
        got = {
            (r["a"], r["b"])
            for r in cypher(
                g,
                f"MATCH (a)-[:T*{lo}..{hi}]->(b) "
                "RETURN id(a) AS a, id(b) AS b",
            ).collect()
        }
        want = brute(edges, lo, hi, nodes)
        assert got == want, (pairs_list, lo, hi)

    run()


def test_inline_where_inside_pattern_comprehension(graph):
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation) "
            "RETURN n.n_name AS nation, "
            "size([(c:Customer WHERE c.c_acctbal > 9000)-[:IN_NATION]->(n) "
            "| c.c_name]) AS rich ORDER BY nation",
        )
    )
    want = oracle(
        """SELECT n_name,
                  CAST((SELECT COUNT(*) FROM customer
                        WHERE c_nationkey = n_nationkey
                          AND c_acctbal > 9000) AS INTEGER)
           FROM nation ORDER BY n_name"""
    )
    assert got == want


def test_label_alternation_on_rebound_variable(graph):
    """Re-binding a variable with an alternation applies it as a
    semi-join constraint."""
    got = rows(
        cypher(
            graph,
            "MATCH (x:Customer)-[:IN_NATION]->(n:Nation), (x:Customer|Supplier) "
            "RETURN count(*) AS k",
        )
    )
    want = oracle("SELECT COUNT(*) FROM customer")
    assert got == want


def test_call_subquery_with_rebinding_import_rejected(graph):
    """ADVICE r8: an intermediate WITH that rebinds the imported
    variable would corrupt the correlation join-back — reject it
    (Neo4j also rejects such queries)."""
    with pytest.raises(CypherSyntaxError, match="rebinds"):
        cypher(
            graph,
            "MATCH (n:Nation) "
            "CALL { WITH n WITH n.n_name AS n "
            "  RETURN count(n) AS c } "
            "RETURN c",
        )


def test_call_subquery_with_passthrough_import_still_ok(graph):
    """The identity pass-through `WITH n, ...` must stay legal."""
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation) "
            "CALL { WITH n "
            "  MATCH (s:Supplier)-[:IN_NATION]->(n) "
            "  WITH n, s.s_acctbal AS bal WHERE bal > 0 "
            "  RETURN count(bal) AS pos_sups } "
            "RETURN n.n_name AS nation, pos_sups ORDER BY nation",
        )
    )
    want = oracle(
        """SELECT n_name,
                  (SELECT COUNT(*) FROM supplier
                   WHERE s_nationkey = n_nationkey AND s_acctbal > 0)
                  AS pos_sups
           FROM nation ORDER BY n_name"""
    )
    assert got == want


def test_call_subquery_per_invocation_topk(graph):
    """r9: ORDER BY + LIMIT inside a correlated CALL { } compile to a
    row_number window over the import keys — top-2 suppliers by
    balance per nation, nations with no suppliers eliminated."""
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation) "
            "CALL { WITH n "
            "  MATCH (s:Supplier)-[:IN_NATION]->(n) "
            "  RETURN s.s_name AS sup, s.s_acctbal AS bal "
            "  ORDER BY bal DESC, sup LIMIT 2 } "
            "RETURN n.n_name AS nation, sup, bal "
            "ORDER BY nation, bal DESC, sup",
        )
    )
    want = oracle(
        """SELECT n_name, s_name, s_acctbal FROM (
               SELECT n_name, s_name, s_acctbal,
                      ROW_NUMBER() OVER (
                          PARTITION BY s_nationkey
                          ORDER BY s_acctbal DESC, s_name) AS rn
               FROM supplier JOIN nation ON s_nationkey = n_nationkey
           ) WHERE rn <= 2
           ORDER BY n_name, s_acctbal DESC, s_name"""
    )
    assert got == [tuple(w) for w in want]
    assert len(got) > 0


def test_call_subquery_per_invocation_skip(graph):
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation) "
            "CALL { WITH n "
            "  MATCH (s:Supplier)-[:IN_NATION]->(n) "
            "  RETURN s.s_name AS sup ORDER BY sup SKIP 1 } "
            "RETURN n.n_name AS nation, sup ORDER BY nation, sup",
        )
    )
    want = oracle(
        """SELECT n_name, s_name FROM (
               SELECT n_name, s_name, ROW_NUMBER() OVER (
                   PARTITION BY s_nationkey ORDER BY s_name) AS rn
               FROM supplier JOIN nation ON s_nationkey = n_nationkey
           ) WHERE rn > 1 ORDER BY n_name, s_name"""
    )
    assert got == [tuple(w) for w in want]


def test_call_subquery_agg_limit_keeps_empty_fill(graph):
    """Aggregate-only body + LIMIT 1: the count-0 fill row for
    nations without suppliers survives (Neo4j keeps it — LIMIT 1 of
    one row)."""
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation) "
            "CALL { WITH n "
            "  MATCH (s:Supplier)-[:IN_NATION]->(n) "
            "  RETURN count(s) AS sups ORDER BY sups LIMIT 1 } "
            "RETURN n.n_name AS nation, sups ORDER BY nation",
        )
    )
    want = oracle(
        """SELECT n_name, (SELECT COUNT(*) FROM supplier
                           WHERE s_nationkey = n_nationkey) AS sups
           FROM nation ORDER BY n_name"""
    )
    assert got == [tuple(w) for w in want]
    assert any(w[1] == 0 for w in want)
    # ...but SKIP 1 drops every invocation's single aggregate row,
    # fills included: zero rows survive
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation) "
            "CALL { WITH n "
            "  MATCH (s:Supplier)-[:IN_NATION]->(n) "
            "  RETURN count(s) AS sups ORDER BY sups SKIP 1 } "
            "RETURN n.n_name AS nation, sups",
        )
    )
    assert got == []


def test_call_subquery_order_limit_rejections(graph):
    with pytest.raises(CypherSyntaxError, match="need an ORDER BY"):
        cypher(
            graph,
            "MATCH (n:Nation) "
            "CALL { WITH n MATCH (s:Supplier)-[:IN_NATION]->(n) "
            "  RETURN s.s_name AS sup LIMIT 2 } "
            "RETURN sup",
        )
    with pytest.raises(CypherSyntaxError, match="must name a returned"):
        cypher(
            graph,
            "MATCH (n:Nation) "
            "CALL { WITH n MATCH (s:Supplier)-[:IN_NATION]->(n) "
            "  RETURN s.s_name AS sup ORDER BY s.s_acctbal LIMIT 2 } "
            "RETURN sup",
        )


def test_optional_match_shortest_path(chain_graph):
    """r9: OPTIONAL MATCH shortestPath = left-join reachability —
    node n5 (a sink) keeps its row with NULL length."""
    got = rows(
        cypher(
            chain_graph,
            "MATCH (a:P) "
            "OPTIONAL MATCH p = shortestPath((a)-[:T*]->(b:P {name: 'n5'})) "
            "RETURN a.name AS name, length(p) AS hops ORDER BY name",
        )
    )
    assert got == [
        ("n1", 3), ("n2", 3), ("n3", 2), ("n4", 1), ("n5", None)
    ]
    # unbound far endpoint: every (a, b) reachable pair, sinks kept
    got = rows(
        cypher(
            chain_graph,
            "MATCH (a:P) "
            "OPTIONAL MATCH p = shortestPath((a)-[:T*]->(b)) "
            "RETURN a.name AS name, count(b) AS n_reached "
            "ORDER BY name",
        )
    )
    assert got == [("n1", 4), ("n2", 3), ("n3", 2), ("n4", 1), ("n5", 0)]


# ---------------------------------------------------------------------------
# COLLECT { } subquery expressions (Neo4j 5.6)
# ---------------------------------------------------------------------------


def test_collect_subquery_correlated(graph):
    """Per-nation list of rich customers; [] where none, ascending
    order pinned (the pattern-comprehension convention)."""
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation) "
            "RETURN n.n_name AS name, "
            "COLLECT { MATCH (c:Customer)-[:IN_NATION]->(n) "
            "WHERE c.c_acctbal > 9000 RETURN c.c_name } AS rich "
            "ORDER BY name",
        )
    )
    want = oracle(
        """SELECT n_name,
                  coalesce((SELECT list(c_name ORDER BY c_name)
                            FROM customer
                            WHERE c_nationkey = n_nationkey
                              AND c_acctbal > 9000), []) AS rich
           FROM nation ORDER BY n_name"""
    )
    assert [(n, list(r)) for n, r in got] == [(n, list(r)) for n, r in want]
    assert any(len(r) == 0 for _, r in got)  # empty fills exercised


def test_collect_subquery_distinct(graph):
    """COLLECT { ... RETURN DISTINCT e } = collect_set (compare as
    sets — DISTINCT order is unspecified)."""
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation) "
            "RETURN n.n_name AS name, "
            "COLLECT { MATCH (c:Customer)-[:IN_NATION]->(n) "
            "RETURN DISTINCT c.c_mktsegment } AS segs "
            "ORDER BY name",
        )
    )
    want = oracle(
        """SELECT n_name,
                  coalesce((SELECT list(DISTINCT c_mktsegment)
                            FROM customer
                            WHERE c_nationkey = n_nationkey), []) AS segs
           FROM nation ORDER BY n_name"""
    )
    assert [(n, sorted(s)) for n, s in got] == [
        (n, sorted(s)) for n, s in want
    ]


def test_collect_subquery_uncorrelated_and_size(graph):
    """Uncorrelated body evaluates once (cross join); size() composes."""
    got = rows(
        cypher(
            graph,
            "MATCH (r:Region) "
            "RETURN r.r_name AS name, "
            "size(COLLECT { MATCH (n:Nation) RETURN n.n_name }) AS k "
            "ORDER BY name",
        )
    )
    want = oracle(
        """SELECT r_name, (SELECT COUNT(*) FROM nation) FROM region
           ORDER BY r_name"""
    )
    assert got == want


def test_collect_subquery_multi_pattern_in_with(graph):
    """Multi-pattern body (the shape pattern comprehensions cannot
    express) + WITH pipeline consumption."""
    got = rows(
        cypher(
            graph,
            "MATCH (n:Nation) "
            "WITH n.n_name AS name, "
            "COLLECT { MATCH (c:Customer)-[:IN_NATION]->(n), "
            "(o:Orders)-[:PLACED_BY]->(c) "
            "WHERE o.o_totalprice > 300000 RETURN o.o_orderkey } AS big "
            "WHERE size(big) > 0 "
            "RETURN name, size(big) AS n_big ORDER BY name",
        )
    )
    want = oracle(
        """SELECT n_name, COUNT(*) FROM nation
           JOIN customer ON c_nationkey = n_nationkey
           JOIN orders ON o_custkey = c_custkey
           WHERE o_totalprice > 300000
           GROUP BY n_name ORDER BY n_name"""
    )
    assert got == want


def test_collect_subquery_errors(graph):
    with pytest.raises(CypherSyntaxError, match="needs a RETURN"):
        cypher(graph, "RETURN COLLECT { MATCH (n:Nation) } AS x")
    with pytest.raises(CypherSyntaxError, match="exactly one item"):
        cypher(
            graph,
            "RETURN COLLECT { MATCH (n:Nation) "
            "RETURN n.n_name, n.n_nationkey } AS x",
        )
    with pytest.raises(CypherSyntaxError, match="aggregates are not"):
        cypher(
            graph,
            "MATCH (n:Nation) RETURN COLLECT { "
            "MATCH (c:Customer)-[:IN_NATION]->(n) "
            "RETURN count(c) } AS x",
        )


def test_collect_subquery_size_rewrite(graph):
    """size(COLLECT{...}) compiles to a count aggregate — the
    optimized plan carries NO collect_list/collect_set — and its
    NULL-element semantics still match the list's size (collect
    drops NULLs, so the CASE below counts only the > 9000 rows)."""
    q = (
        "MATCH (n:Nation) "
        "RETURN n.n_name AS name, "
        "size(COLLECT { MATCH (c:Customer)-[:IN_NATION]->(n) "
        "RETURN CASE WHEN c.c_acctbal > 9000 THEN c.c_name END }) AS k "
        "ORDER BY name"
    )
    df = cypher(graph, q)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "collect_list" not in plan and "collect_set" not in plan
    got = rows(df)
    want = oracle(
        """SELECT n_name,
                  (SELECT COUNT(*) FROM customer
                   WHERE c_nationkey = n_nationkey AND c_acctbal > 9000)
           FROM nation ORDER BY n_name"""
    )
    assert got == want
    # DISTINCT variant: count distinct non-null elements
    qd = (
        "MATCH (n:Nation) "
        "RETURN n.n_name AS name, "
        "size(COLLECT { MATCH (c:Customer)-[:IN_NATION]->(n) "
        "RETURN DISTINCT c.c_mktsegment }) AS k ORDER BY name"
    )
    dfd = cypher(graph, qd)
    pland = dfd._jdf.queryExecution().optimizedPlan().toString()
    assert "collect_set" not in pland
    wantd = oracle(
        """SELECT n_name,
                  (SELECT COUNT(DISTINCT c_mktsegment) FROM customer
                   WHERE c_nationkey = n_nationkey)
           FROM nation ORDER BY n_name"""
    )
    assert rows(dfd) == wantd


def test_patcomp_size_rewrite(graph):
    """size([pattern comprehension]) takes the same count-aggregate
    shortcut as size(COLLECT{}) — no list in the plan."""
    q = (
        "MATCH (n:Nation) "
        "RETURN n.n_name AS name, "
        "size([(c:Customer)-[:IN_NATION]->(n) "
        "WHERE c.c_acctbal > 9000 | c.c_name]) AS k ORDER BY name"
    )
    df = cypher(graph, q)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "collect_list" not in plan
    want = oracle(
        """SELECT n_name,
                  (SELECT COUNT(*) FROM customer
                   WHERE c_nationkey = n_nationkey AND c_acctbal > 9000)
           FROM nation ORDER BY n_name"""
    )
    assert rows(df) == want


def test_order_by_nulls_and_empty_sum_and_safe_casts(graph):
    """Neo4j semantics pinned: NULL sorts LAST under ORDER BY ASC
    (FIRST under DESC), sum() over zero rows is 0 (not SQL NULL),
    toInteger of an unparseable string is null (not an ANSI crash),
    and head() of an empty list is null."""
    from pidb_rdf_spark.cypher import cypher

    # zero-match sum -> one row, 0
    rows = cypher(
        graph, "MATCH (n:Nation) WHERE n.n_name = 'NOWHERE' "
        "RETURN sum(n.n_nationkey) AS s"
    ).collect()
    assert len(rows) == 1 and rows[0]["s"] == 0
    # toInteger null-on-unparseable + head of empty list
    r = cypher(
        graph,
        "MATCH (n:Region) WHERE n.r_regionkey = 0 "
        "RETURN toInteger(n.r_name) AS ti, "
        "head([x IN [1,2] WHERE x > 5]) AS h",
    ).first()
    assert r["ti"] is None and r["h"] is None
    # NULL ordering: optional hop yields NULLs; ASC puts them last
    out = cypher(
        graph,
        "MATCH (n:Nation) OPTIONAL MATCH (n)<-[:IN_NATION]-(c:Customer) "
        "WITH n.n_name AS nation, count(c) AS nc "
        "RETURN nation, CASE WHEN nc = 0 THEN null ELSE nc END AS v "
        "ORDER BY v ASC, nation LIMIT 5",
    ).collect()
    vals = [r["v"] for r in out]
    assert all(v is not None for v in vals)  # nulls (if any) sort last


def test_string_escape_sequences(graph):
    """Cypher \\n / \\t / \\uXXXX escapes decode to their characters —
    previously 'a\\nb' compiled to the literal letters 'anb'."""
    from pidb_rdf_spark.cypher import cypher

    r = cypher(
        graph,
        'MATCH (n:Region) WHERE n.r_regionkey = 0 '
        'RETURN "a\\nb" AS s, "\\u0041x" AS u, "x\\ty" AS t',
    ).first()
    assert r["s"] == "a\nb" and r["u"] == "Ax" and r["t"] == "x\ty"


def test_shortest_path_unbounded_budget_raises(graph):
    """An unbounded * shortestPath that is still expanding at the
    default 50-hop budget raises (silently reporting farther pairs
    unreachable would be a wrong answer); an explicit *..m bound is
    the user's own cap and never raises."""
    # the containment graph settles in < 50 hops, so exercise the
    # guard through the code path with a tiny explicit bound: no raise
    from pidb_rdf_spark.cypher import cypher

    out = cypher(
        graph,
        "MATCH p = shortestPath((c:Customer)-[:IN_NATION*..1]->(n:Nation)) "
        "WHERE c.c_custkey = 1 RETURN length(p) AS l",
    ).first()
    assert out["l"] == 1


def test_list_index_and_slice(graph):
    """Neo4j list subscripts (r11): 0-based indexing, negatives from
    the end, half-open slices with omissible bounds, out-of-range ->
    null/clamped — all codegen (try_element_at / slice)."""
    from pidb_rdf_spark.cypher import cypher

    r = cypher(
        graph,
        "WITH [10,20,30,40] AS xs RETURN xs[0] AS a, xs[-1] AS b, "
        "xs[1..3] AS c, xs[..2] AS d, xs[-2..] AS e, xs[9] AS f, "
        "xs[2..99] AS g, xs[3..1] AS h",
    ).first()
    assert (r["a"], r["b"]) == (10, 40)
    assert r["c"] == [20, 30] and r["d"] == [10, 20] and r["e"] == [30, 40]
    assert r["f"] is None          # out of range -> null
    assert r["g"] == [30, 40]      # hi clamps to len
    assert r["h"] == []            # inverted slice -> empty


def test_plus_polymorphic_dispatch(graph):
    """Neo4j + is polymorphic (r11): string concatenation when either
    side is a string ('v' + 1 = 'v1'), list concatenation for lists,
    numeric addition otherwise — resolved statically from literals
    and the bound frame's schema."""
    from pidb_rdf_spark.cypher import cypher

    rows = cypher(
        graph,
        "MATCH (r:Region) RETURN r.r_name + '!' AS a, "
        "'v' + r.r_regionkey AS b, r.r_regionkey + 1 AS c "
        "ORDER BY a LIMIT 2",
    ).collect()
    assert [r["a"] for r in rows] == ["AFRICA!", "AMERICA!"]
    assert [r["b"] for r in rows] == ["v0", "v1"]
    assert [r["c"] for r in rows] == [1, 2]
    lr = cypher(graph, "WITH [1,2] AS a, [3] AS b RETURN a + b AS ab").first()
    assert lr["ab"] == [1, 2, 3]


def test_dynamic_property_access(graph):
    """n[key] dynamic property access (r11): literal, WITH-bound and
    $parameter keys all read through the full merged property map;
    unknown keys yield null; list subscripts are unaffected."""
    from pidb_rdf_spark.cypher import cypher

    a = cypher(
        graph, "MATCH (r:Region) RETURN r['r_name'] AS n ORDER BY n LIMIT 2"
    ).collect()
    b = cypher(
        graph,
        "WITH 'r_name' AS k MATCH (r:Region) RETURN r[k] AS n "
        "ORDER BY n LIMIT 2",
    ).collect()
    c = cypher(
        graph,
        "MATCH (r:Region) RETURN r[$key] AS n ORDER BY n LIMIT 2",
        params={"key": "r_name"},
    ).collect()
    assert [r["n"] for r in a] == [r["n"] for r in b] == [r["n"] for r in c] \
        == ["AFRICA", "AMERICA"]
    missing = cypher(
        graph, "MATCH (r:Region) RETURN r['nope'] AS x LIMIT 1"
    ).first()
    assert missing["x"] is None


def test_plus_rel_prop_numeric_not_string_concat(spark):
    """Relationship props (and sidecar-less node props) materialize as
    strings from the map<string,string> store, so their dtype is NOT
    evidence of a string value — r.qty + 1 must add, not concatenate
    '51' (ADVICE r11). Unknown operands cast to the known number's
    family: integral -> long, fractional -> double."""
    from pidb_rdf_spark.cypher import cypher
    from pidb_rdf_spark.graph import PropertyGraph

    g = PropertyGraph(
        spark=spark,
        nodes=spark.createDataFrame(
            [(1, "urn:a", ["P"], {"n": "x"}), (2, "urn:b", ["P"], {"n": "y"})],
            "id long, uri string, labels array<string>, props map<string,string>",
        ),
        edges=spark.createDataFrame(
            [(10, 1, 2, "R", {"qty": "50"})],
            "id long, src long, dst long, predicate string, props map<string,string>",
        ),
    )
    r = cypher(
        g,
        "MATCH ()-[r:R]->() RETURN r.qty + 1 AS a, 1 + r.qty AS b, "
        "r.qty + 0.5 AS c, 'v' + r.qty AS d",
    ).first()
    assert r["a"] == 51 and r["b"] == 51      # long family
    assert r["c"] == 50.5                      # fractional -> double
    assert r["d"] == "v50"                     # explicit string wins
    # two unknown operands: the uniform schemaless-numeric contract —
    # both try_cast double (a stored non-number reads NULL)
    two = cypher(g, "MATCH ()-[r:R]->() RETURN r.qty + r.qty AS s").first()
    assert two["s"] == 100.0


def test_plus_list_scalar_append(graph):
    """Neo4j list + scalar appends (and scalar + list prepends) — the
    non-list operand wraps in F.array() instead of failing analysis
    (ADVICE r11)."""
    from pidb_rdf_spark.cypher import cypher

    r = cypher(
        graph,
        "WITH [1,2] AS xs RETURN xs + 3 AS a, 0 + xs AS b, xs + [4] AS c",
    ).first()
    assert r["a"] == [1, 2, 3]
    assert r["b"] == [0, 1, 2]
    assert r["c"] == [1, 2, 4]


def test_plus_in_lambda_no_analysis_probe(graph):
    """+ on comprehension lambda variables keeps numeric addition and
    must NOT select-probe the operands — an unresolved lambda variable
    probe logs an ERROR-level UNRESOLVED_COLUMN stack trace JVM-side
    (VERDICT r11 #6); the dispatch decides statically."""
    from pidb_rdf_spark.cypher import _expr_uses_lambda_var, cypher

    r = cypher(
        graph,
        "WITH [1,2,3] AS xs "
        "RETURN [x IN xs | x + 10] AS m, "
        "reduce(acc = 0, x IN xs | acc + x) AS s",
    ).first()
    assert r["m"] == [11, 12, 13] and r["s"] == 6

    class _C:
        lambda_vars = {"x": None}

    c = _C()
    assert _expr_uses_lambda_var(c, ("plus", ("var", "x"), ("lit", 1)))
    assert not _expr_uses_lambda_var(c, ("plus", ("var", "y"), ("lit", 1)))
    assert _expr_uses_lambda_var(
        c, ("fn", "size", [("plus", ("lit", 1), ("var", "x"))])
    )


def test_scalar_tail_functions(graph):
    """r12 scalar tail: elementId() (stringified id), timestamp()
    (epoch millis), randomUUID(), nullIf(), isEmpty() for lists and
    strings — all JVM-side expressions."""
    from pidb_rdf_spark.cypher import cypher

    r = cypher(
        graph,
        "MATCH (n:Region) WITH n LIMIT 1 "
        "RETURN elementId(n) AS eid, id(n) AS nid, timestamp() AS ts, "
        "randomUUID() AS u, nullIf(1, 1) AS n1, nullIf(1, 2) AS n2, "
        "isEmpty([]) AS e1, isEmpty([1]) AS e2, isEmpty('') AS e3",
    ).first()
    assert r["eid"] == str(r["nid"])
    assert r["ts"] > 1_500_000_000_000  # epoch millis, not seconds
    assert len(r["u"]) == 36 and r["u"].count("-") == 4
    assert r["n1"] is None and r["n2"] == 1
    assert r["e1"] is True and r["e2"] is False and r["e3"] is True


def test_map_literal_subscript(graph):
    """Map literals compile to structs, so a literal string subscript
    is getField (unknown keys read null, matching map access); list
    subscripts on struct-typed bases are unaffected."""
    from pidb_rdf_spark.cypher import cypher

    r = cypher(
        graph,
        "RETURN {a: 1, b: 'x'}['b'] AS v, {a: 1}['zz'] AS missing",
    ).first()
    assert r["v"] == "x" and r["missing"] is None


def test_xor_in_expr_order_by_aggregate(graph):
    """r12 clause tail: XOR (OR < XOR < AND precedence), IN over a
    list-VALUED expression (labels(n), slices — not just literal
    lists), and ORDER BY on a verbatim aggregate expression of an
    aggregating query."""
    from pidb_rdf_spark.cypher import cypher

    r = cypher(
        graph,
        "RETURN true XOR false AS a, true XOR true AS b, "
        "false OR true XOR true AS prec",  # OR(false, XOR(true,true))
    ).first()
    assert r["a"] is True and r["b"] is False and r["prec"] is False

    n = cypher(
        graph, "MATCH (n) WHERE 'Region' IN labels(n) RETURN count(*) AS c"
    ).first()["c"]
    want = cypher(graph, "MATCH (n:Region) RETURN count(*) AS c").first()["c"]
    assert n == want == 5
    s = cypher(
        graph, "WITH [1,2,3,4] AS xs RETURN 2 IN xs[1..3] AS hit, "
        "9 IN xs[1..3] AS miss"
    ).first()
    assert s["hit"] is True and s["miss"] is False

    rows = cypher(
        graph,
        "MATCH (n:Nation) RETURN n.n_regionkey AS rk, count(*) AS c "
        "ORDER BY count(*) DESC, rk LIMIT 2",
    ).collect()
    assert [r["rk"] for r in rows] == [0, 1]  # 5 each; rk tiebreak


def test_duration_temporal_arithmetic(graph):
    """duration() (r12): ISO-8601 literals and literal component maps
    fold to make_interval, so date/datetime +- duration is native
    interval arithmetic (calendar-aware: leap years, month ends)."""
    from pidb_rdf_spark.cypher import CypherSyntaxError, cypher

    r = cypher(
        graph,
        "RETURN date('2024-01-01') + duration('P1D') AS d, "
        "datetime('2024-01-01T00:00:00') + duration('P1DT2H30M') AS t, "
        "date('2024-03-01') - duration({days: 1}) AS leap, "
        "date('2024-01-31') + duration('P1M') AS feb",
    ).first()
    import datetime as dt

    assert r["d"] == dt.date(2024, 1, 2)
    assert r["t"] == dt.datetime(2024, 1, 2, 2, 30)
    assert r["leap"] == dt.date(2024, 2, 29)   # calendar-aware
    assert r["feb"] == dt.date(2024, 2, 29)    # month-end clamp
    with pytest.raises(CypherSyntaxError, match="ISO-8601"):
        cypher(graph, "RETURN duration('nope') AS x")
    with pytest.raises(CypherSyntaxError, match="unknown component"):
        cypher(graph, "RETURN duration({eons: 1}) AS x")


def test_bare_pattern_predicate(graph):
    """Neo4j's legacy bare pattern predicate in boolean position —
    WHERE (n)-[:T]->(m) == WHERE exists((n)-[:T]->(m)) — including
    negation and OR composition; parenthesized arithmetic is
    unaffected (the probe backtracks)."""
    from pidb_rdf_spark.cypher import cypher

    a = cypher(
        graph,
        "MATCH (n:Nation) WHERE (n)-[:IN_REGION]->(:Region {r_name: "
        "'AFRICA'}) RETURN count(*) AS c",
    ).first()["c"]
    b = cypher(
        graph,
        "MATCH (n:Nation) WHERE exists((n)-[:IN_REGION]->(:Region "
        "{r_name: 'AFRICA'})) RETURN count(*) AS c",
    ).first()["c"]
    assert a == b == 5
    neg = cypher(
        graph,
        "MATCH (n:Nation) WHERE NOT (n)-[:IN_REGION]->(:Region "
        "{r_name: 'AFRICA'}) RETURN count(*) AS c",
    ).first()["c"]
    assert neg == 20
    # composable under OR (rewrites to a match-count column)
    both = cypher(
        graph,
        "MATCH (n:Nation) WHERE (n)-[:IN_REGION]->({r_name: 'AFRICA'})"
        " OR n.n_regionkey = 1 RETURN count(*) AS c",
    ).first()["c"]
    assert both == 10
    # parenthesized arithmetic still parses (probe backtracks)
    r = cypher(
        graph,
        "WITH 3 AS a, 2 AS b RETURN (a) - (b) AS d, (a + b) * 2 AS m",
    ).first()
    assert r["d"] == 1 and r["m"] == 10


def test_subscript_slice_differential_vs_python(graph):
    """Differential sweep: xs[i] over every index in [-6, 6] and
    xs[lo..hi] over every bound pair in [-5, 5] must match Python
    semantics (0-based, negatives from the end, out-of-range -> null,
    half-open clamped slices) — indices are COLUMN values here, not
    literals, so the dynamic paths are exercised."""
    from pidb_rdf_spark.cypher import cypher

    xs = [10, 20, 30, 40]
    got = {
        r["i"]: r["v"]
        for r in cypher(
            graph,
            "UNWIND range(-6, 6) AS i WITH [10,20,30,40] AS xs, i "
            "RETURN i, xs[i] AS v",
        ).collect()
    }
    for i in range(-6, 7):
        want = xs[i] if -len(xs) <= i < len(xs) else None
        assert got[i] == want, (i, got[i], want)

    rows = cypher(
        graph,
        "UNWIND range(-5, 5) AS lo UNWIND range(-5, 5) AS hi "
        "WITH [10,20,30,40] AS xs, lo, hi "
        "RETURN lo, hi, xs[lo..hi] AS s",
    ).collect()
    def norm(b):
        return max(len(xs) + b, 0) if b < 0 else min(b, len(xs))
    for r in rows:
        lo, hi = r["lo"], r["hi"]
        want = xs[norm(lo):norm(hi)]
        assert r["s"] == want, (lo, hi, r["s"], want)


def test_isempty_dtype_routing(graph):
    """ADVICE r12: isEmpty(n.stringProp) routes through length() by
    probing the RESOLVED column's dtype (F.size on a string column is
    an AnalysisException); statically-known non-(string/list/map)
    operands raise as in Neo4j; isEmpty(null) is null."""
    from pidb_rdf_spark.cypher import CypherSyntaxError, cypher

    r = cypher(
        graph,
        "MATCH (n:Region) WHERE NOT isEmpty(n.r_name) "
        "RETURN count(*) AS c",
    ).first()
    assert r["c"] == 5
    n = cypher(graph, "RETURN isEmpty(null) AS x").first()["x"]
    assert n is None
    with pytest.raises(CypherSyntaxError, match="string, list or map"):
        cypher(graph, "RETURN isEmpty(1) AS x")
    with pytest.raises(CypherSyntaxError, match="string, list or map"):
        cypher(graph, "MATCH (n:Region) RETURN isEmpty(id(n)) AS x")


def test_duration_fractional_components(graph):
    """ADVICE r12: fractional duration components spill into smaller
    units (Neo4j DurationValue semantics) instead of int()-truncating
    to zero — exact ratios cascade (years->months, weeks/days/hours/
    minutes -> seconds); fractional months use Neo4j's average-month
    constant 2629746 s."""
    import datetime as dt

    from pidb_rdf_spark.cypher import cypher

    r = cypher(
        graph,
        "RETURN datetime('2024-01-01T00:00:00') + duration('P0.5D') AS h12, "
        "datetime('2024-01-01T00:00:00') + duration('PT1.5H') AS m90, "
        "datetime('2024-01-01T00:00:00') + duration({days: 1.5}) AS d15, "
        "datetime('2024-01-01T00:00:00') + duration('P0.5M') AS halfm, "
        "date('2024-01-01') + duration('P0.5Y') AS halfy",
    ).first()
    assert r["h12"] == dt.datetime(2024, 1, 1, 12, 0)
    assert r["m90"] == dt.datetime(2024, 1, 1, 1, 30)
    assert r["d15"] == dt.datetime(2024, 1, 2, 12, 0)
    # 0.5 * 2629746 s = 15 d 05:14:33
    assert r["halfm"] == dt.datetime(2024, 1, 16, 5, 14, 33)
    assert r["halfy"] == dt.date(2024, 7, 1)  # 0.5Y -> 6 whole months


def test_xor_non_boolean_raises(graph):
    """ADVICE r12: XOR on statically-known non-boolean operands is a
    type error (Neo4j), not a silent inequality; boolean expressions
    and map-stored (unknown-typed) props keep working."""
    from pidb_rdf_spark.cypher import CypherSyntaxError, cypher

    with pytest.raises(CypherSyntaxError, match="XOR"):
        cypher(graph, "RETURN 1 XOR 2 AS x")
    with pytest.raises(CypherSyntaxError, match="XOR"):
        cypher(graph, "RETURN 'a' XOR 'b' AS x")
    with pytest.raises(CypherSyntaxError, match="XOR"):
        cypher(graph, "MATCH (n:Nation) RETURN n.n_nationkey XOR true AS x")
    got = cypher(
        graph,
        "MATCH (n:Nation) "
        "WHERE (n.n_nationkey > 9) XOR (n.n_regionkey = 0) "
        "RETURN count(*) AS c",
    ).first()["c"]
    # nationkey 10..24 (15) xor regionkey 0 (5 of 25, keys 0,5,10,15,20)
    # -> >9 and not rk0: 10..24 minus {10,15,20} = 12; rk0 and <=9: {0,5} = 2
    assert got == 14


def test_temporal_component_accessors(graph):
    """r13: Neo4j temporal component accessors as postfix property
    access on date/timestamp expressions — date('..').year,
    ts.dayOfWeek (ISO, Monday=1), millisecond/epochMillis on
    timestamps; raises on components the type cannot carry."""
    import datetime as dt

    from pidb_rdf_spark.cypher import CypherSyntaxError, cypher

    r = cypher(
        graph,
        "WITH date('2024-01-05') AS d "
        "RETURN d.year AS y, d.quarter AS q, d.month AS m, d.week AS w, "
        "d.day AS dd, d.ordinalDay AS od, d.dayOfWeek AS dow, "
        "d.weekYear AS wy",
    ).first()
    # 2024-01-05 is a Friday in ISO week 1 of week-year 2024
    assert (r["y"], r["q"], r["m"], r["w"], r["dd"], r["od"], r["dow"],
            r["wy"]) == (2024, 1, 1, 1, 5, 5, 5, 2024)

    # direct postfix on a call (no WITH projection in between)
    r = cypher(
        graph,
        "RETURN date('2023-01-01').dayOfWeek AS dow, "
        "date('2023-01-01').week AS w, date('2023-01-01').weekYear AS wy",
    ).first()
    # 2023-01-01 is a Sunday, ISO week 52 of week-year 2022
    assert (r["dow"], r["w"], r["wy"]) == (7, 52, 2022)

    r = cypher(
        graph,
        "WITH datetime('2024-03-10T15:30:45.123456') AS ts "
        "RETURN ts.hour AS h, ts.minute AS mi, ts.second AS s, "
        "ts.millisecond AS ms, ts.microsecond AS us, "
        "ts.epochSeconds AS es, ts.epochMillis AS em",
    ).first()
    want_es = int(
        dt.datetime(2024, 3, 10, 15, 30, 45,
                    tzinfo=dt.timezone.utc).timestamp()
    )
    assert (r["h"], r["mi"], r["s"], r["ms"], r["us"]) == (
        15, 30, 45, 123, 123456)
    assert r["es"] == want_es and r["em"] == want_es * 1000 + 123

    # node-prop expression path (order dates stored as strings)
    rows = cypher(
        graph,
        "MATCH (o:Order) WITH date(o.o_orderdate) AS d "
        "RETURN d.year AS y, count(*) AS c ORDER BY y LIMIT 3",
    ).collect()
    assert all(row["y"] is not None and row["c"] > 0 for row in rows)

    with pytest.raises(CypherSyntaxError, match="not a component"):
        cypher(graph, "RETURN date('2024-01-05').hour AS h")
    with pytest.raises(CypherSyntaxError, match="not a component"):
        cypher(graph, "RETURN date('2024-01-05').nope AS x")
    with pytest.raises(CypherSyntaxError, match="property access"):
        cypher(graph, "RETURN (1).year AS x")


def test_namespaced_temporal_functions(graph):
    """r13: duration.between / duration.inMonths / duration.inSeconds
    and date.truncate / datetime.truncate; interval component
    accessors over the results."""
    import datetime as dt

    from pidb_rdf_spark.cypher import CypherSyntaxError, cypher

    r = cypher(
        graph,
        "WITH duration.between(datetime('2024-01-01T00:00:00'), "
        "datetime('2024-01-03T06:30:15')) AS dur "
        "RETURN dur.days AS d, dur.hours AS h, dur.minutes AS m, "
        "dur.seconds AS s",
    ).first()
    assert (r["d"], r["h"], r["m"], r["s"]) == (2, 6, 30, 15)

    r = cypher(
        graph,
        "WITH duration.inMonths(date('2022-01-15'), date('2024-04-10')) "
        "AS dur RETURN dur.years AS y, dur.months AS m",
    ).first()
    # 26 whole months = 2 years 2 months
    assert (r["y"], r["m"]) == (2, 2)

    with pytest.raises(CypherSyntaxError, match="components"):
        cypher(
            graph,
            "RETURN duration.between(datetime('2024-01-01T00:00:00'), "
            "datetime('2024-01-02T00:00:00')).months AS x",
        )

    r = cypher(
        graph,
        "RETURN date.truncate('month', date('2024-03-15')) AS dm, "
        "date.truncate('year', date('2024-03-15')) AS dy, "
        "datetime.truncate('hour', datetime('2024-03-10T15:30:45')) AS th, "
        "datetime.truncate('day', datetime('2024-03-10T15:30:45')) AS td",
    ).first()
    assert r["dm"] == dt.date(2024, 3, 1)
    assert r["dy"] == dt.date(2024, 1, 1)
    assert r["th"] == dt.datetime(2024, 3, 10, 15, 0)
    assert r["td"] == dt.datetime(2024, 3, 10, 0, 0)

    with pytest.raises(CypherSyntaxError, match="cannot truncate"):
        cypher(graph, "RETURN date.truncate('hour', date('2024-03-15')) AS x")
    with pytest.raises(CypherSyntaxError, match="literal unit"):
        cypher(
            graph,
            "WITH 'month' AS u "
            "RETURN date.truncate(u, date('2024-03-15')) AS x",
        )


def test_vprop_struct_and_map_access(graph):
    """r13: postfix .key on arbitrary expressions reads struct fields
    and map values — {a: 1}.a, nested chains, unknown struct keys
    read NULL (the map-literal subscript contract)."""
    from pidb_rdf_spark.cypher import cypher

    r = cypher(
        graph,
        "WITH {a: 1, b: {c: 'x'}} AS m "
        "RETURN m.a AS a, m.b.c AS c, m.nope AS n",
    ).first()
    assert (r["a"], r["c"], r["n"]) == (1, "x", None)


def test_spatial_points(graph):
    """r13 spatial family: point() cartesian/geographic constructors
    (Neo4j srids), component accessors through the vprop struct path,
    point.distance (euclidean / haversine at Neo4j's 6378140 m
    radius, NULL across CRS), and point.withinBBox incl. the
    antimeridian wrap."""
    import math

    from pidb_rdf_spark.cypher import CypherSyntaxError, cypher

    r = cypher(
        graph,
        "WITH point({x: 0, y: 0}) AS a, point({x: 3, y: 4}) AS b, "
        "point({latitude: 48.8566, longitude: 2.3522}) AS paris, "
        "point({latitude: 51.5074, longitude: -0.1278}) AS london "
        "RETURN point.distance(a, b) AS d2, "
        "distance(a, b) AS legacy, "
        "point.distance(point({x:0,y:0,z:0}), point({x:2,y:3,z:6})) AS d3, "
        "point.distance(paris, london) AS geo, "
        "point.distance(a, paris) AS mixed, "
        "a.x AS ax, b.srid AS srid, b.crs AS crs, "
        "paris.latitude AS plat, paris.crs AS pcrs, paris.x AS px",
    ).first()
    assert r["d2"] == 5.0 and r["legacy"] == 5.0 and r["d3"] == 7.0
    assert r["mixed"] is None
    assert (r["ax"], r["srid"], r["crs"]) == (0.0, 7203, "cartesian")
    assert (r["plat"], r["pcrs"], r["px"]) == (48.8566, "wgs-84", 2.3522)

    # python haversine twin at the documented constant
    la1, lo1, la2, lo2 = map(
        math.radians, (48.8566, 2.3522, 51.5074, -0.1278)
    )
    hav = (
        math.sin((la2 - la1) / 2) ** 2
        + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2
    )
    want = 2 * 6378140.0 * math.asin(math.sqrt(hav))
    assert r["geo"] == pytest.approx(want, rel=1e-12)

    r = cypher(
        graph,
        "RETURN point.withinBBox(point({x: 2, y: 2}), "
        "point({x: 0, y: 0}), point({x: 3, y: 4})) AS inbox, "
        "point.withinBBox(point({x: 9, y: 2}), "
        "point({x: 0, y: 0}), point({x: 3, y: 4})) AS outbox, "
        "point.withinBBox(point({longitude: 179.5, latitude: 0}), "
        "point({longitude: 179, latitude: -1}), "
        "point({longitude: -179, latitude: 1})) AS wrap, "
        "point.withinBBox(point({longitude: 170, latitude: 0}), "
        "point({longitude: 179, latitude: -1}), "
        "point({longitude: -179, latitude: 1})) AS wrapout",
    ).first()
    assert (r["inbox"], r["outbox"], r["wrap"], r["wrapout"]) == (
        True, False, True, False)

    # 3d geographic: height delta folds in pythagorean-style
    r = cypher(
        graph,
        "RETURN point.distance("
        "point({latitude: 10, longitude: 20, height: 0}), "
        "point({latitude: 10, longitude: 20, height: 300})) AS dh, "
        "point({latitude: 1, longitude: 2, height: 3}).srid AS s3",
    ).first()
    assert r["dh"] == pytest.approx(300.0) and r["s3"] == 4979

    with pytest.raises(CypherSyntaxError, match="map literal"):
        cypher(graph, "RETURN point(1) AS p")
    with pytest.raises(CypherSyntaxError, match="both latitude"):
        cypher(graph, "RETURN point({latitude: 1}) AS p")
    with pytest.raises(CypherSyntaxError, match="mix"):
        cypher(graph, "RETURN point({latitude: 1, longitude: 2, x: 3}) AS p")
    with pytest.raises(CypherSyntaxError, match="unknown keys"):
        cypher(graph, "RETURN point({x: 1, y: 2, w: 9}) AS p")


def test_temporal_components_iso_boundaries(graph):
    """Temporal component accessors across the tricky calendar edges
    — ISO week/weekYear at year boundaries, leap years, century
    rules — pinned against Python's datetime.isocalendar."""
    import datetime as dt

    from pidb_rdf_spark.cypher import cypher

    dates = [
        "2020-12-31", "2021-01-01", "2021-01-03", "2021-01-04",
        "2015-12-28", "2016-01-01", "2016-02-29", "2016-03-01",
        "1999-12-31", "2000-01-01", "2000-02-29", "2100-03-01",
        "2024-12-30", "2025-01-05", "2026-12-31", "2027-01-01",
    ]
    lits = ", ".join(f"'{d}'" for d in dates)
    rows = cypher(
        graph,
        f"UNWIND [{lits}] AS s WITH date(s) AS d, s "
        "RETURN s, d.year AS y, d.month AS m, d.day AS dd, "
        "d.week AS w, d.weekYear AS wy, d.dayOfWeek AS dow, "
        "d.ordinalDay AS od, d.quarter AS q",
    ).collect()
    assert len(rows) == len(dates)
    for r in rows:
        py = dt.date.fromisoformat(r["s"])
        iso = py.isocalendar()
        assert (r["y"], r["m"], r["dd"]) == (py.year, py.month, py.day)
        assert (r["wy"], r["w"], r["dow"]) == (
            iso.year, iso.week, iso.weekday), r["s"]
        assert r["od"] == py.timetuple().tm_yday
        assert r["q"] == (py.month - 1) // 3 + 1
