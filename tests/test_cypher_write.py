"""Cypher write-clause tests: CREATE / MERGE / SET / REMOVE / DELETE
routed through the mutation primitives (reference write shapes:
``loader/StatementPreviewer.java:100-107``,
``semantics/LiteOntologyImporter.java:82-86``)."""

import pytest
from pyspark.sql import functions as F

from pidb_rdf_spark.cypher import CypherSyntaxError, cypher
from pidb_rdf_spark.cypher_write import CypherWriteError, cypher_write
from pidb_rdf_spark.graph import PropertyGraph


@pytest.fixture()
def wg(spark):
    g = PropertyGraph(
        spark=spark,
        nodes=spark.createDataFrame(
            [
                (1, "urn:a", ["Person"], {"name": "Alice", "age": "30"}),
                (2, "urn:b", ["Person"], {"name": "Bob"}),
                (3, "urn:c", ["City"], {"name": "Paris"}),
            ],
            "id long, uri string, labels array<string>, props map<string,string>",
        ),
        edges=spark.createDataFrame(
            [(10, 1, 2, "KNOWS", {"since": "2020"}), (11, 1, 3, "LIVES_IN", {})],
            "id long, src long, dst long, predicate string, props map<string,string>",
        ),
    )
    return g


def names(g, label=None):
    nd = g.nodes
    if label:
        nd = nd.filter(F.array_contains("labels", label))
    return sorted(r[0] for r in nd.select(nd.props.getItem("name")).collect())


def test_create_node(wg):
    g2 = cypher_write(wg, "CREATE (n:Person {name: 'Carol', age: 25})")
    assert names(g2, "Person") == ["Alice", "Bob", "Carol"]
    row = g2.nodes.filter(F.col("props").getItem("name") == "Carol").collect()[0]
    assert row["props"]["age"] == "25"
    # CREATE is not idempotent: a second identical CREATE adds another
    g3 = cypher_write(g2, "CREATE (n:Person {name: 'Carol', age: 25})")
    assert g3.nodes.filter(F.array_contains("labels", "Person")).count() == 4


def test_merge_node_idempotent(wg):
    g2 = cypher_write(wg, "MERGE (n:Person {name: 'Carol'})")
    g3 = cypher_write(g2, "MERGE (n:Person {name: 'Carol'})")
    assert names(g3, "Person") == ["Alice", "Bob", "Carol"]


def test_create_relationship_between_matched(wg):
    g2 = cypher_write(
        wg,
        "MATCH (a:Person {name: 'Bob'}), (c:City) "
        "CREATE (a)-[:LIVES_IN {since: 2021}]->(c)",
    )
    e = g2.edges.filter(F.col("predicate") == "LIVES_IN").collect()
    assert len(e) == 2
    new = [r for r in e if r["src"] == 2][0]
    assert new["dst"] == 3 and new["props"]["since"] == "2021"
    # CREATE is per-row and multi-edge: repeating it ADDS another
    # relationship (Cypher semantics; MERGE is the dedup form)
    g3 = cypher_write(
        g2,
        "MATCH (a:Person {name: 'Bob'}), (c:City) CREATE (a)-[:LIVES_IN]->(c)",
    )
    assert g3.edges.filter(F.col("predicate") == "LIVES_IN").count() == 3
    assert g3.edges.select("id").distinct().count() == g3.edges.count()


def test_merge_relationship(wg):
    # already exists -> no-op
    g2 = cypher_write(
        wg,
        "MATCH (a:Person {name: 'Alice'}), (b:Person {name: 'Bob'}) "
        "MERGE (a)-[:KNOWS]->(b)",
    )
    assert g2.edges.count() == wg.edges.count()


def test_create_standalone_chain(wg):
    g2 = cypher_write(
        wg,
        "CREATE (x:Person {name: 'Dan'})-[:LIVES_IN]->(y:City {name: 'Lyon'})",
    )
    assert "Dan" in names(g2, "Person") and "Lyon" in names(g2, "City")
    pair = (
        g2.edges.filter(F.col("predicate") == "LIVES_IN")
        .join(g2.nodes.select(F.col("id").alias("src"), F.col("props").getItem("name").alias("sn")), "src")
        .filter(F.col("sn") == "Dan")
        .count()
    )
    assert pair == 1


def test_set_property_and_label(wg):
    g2 = cypher_write(
        wg,
        "MATCH (n:Person) WHERE n.name = 'Bob' SET n.age = 41, n:Employee",
    )
    row = g2.nodes.filter(F.col("uri") == "urn:b").collect()[0]
    assert row["props"]["age"] == "41"
    assert "Employee" in row["labels"]
    # others untouched
    assert g2.nodes.filter(F.array_contains("labels", "Employee")).count() == 1


def test_set_edge_property(wg):
    g2 = cypher_write(
        wg, "MATCH (a)-[r:KNOWS]->(b) SET r.since = 2019"
    )
    assert g2.edges.filter(F.col("predicate") == "KNOWS").collect()[0]["props"][
        "since"
    ] == "2019"


def test_remove_property_and_label(wg):
    g2 = cypher_write(wg, "MATCH (n:Person {name: 'Alice'}) REMOVE n.age, n:Person")
    row = g2.nodes.filter(F.col("uri") == "urn:a").collect()[0]
    assert "age" not in row["props"]
    assert row["labels"] == []


def test_delete_relationship_then_node(wg):
    g2 = cypher_write(wg, "MATCH (a)-[r]->(b) WHERE b.name = 'Bob' DELETE r")
    assert g2.edges.count() == 1
    g3 = cypher_write(g2, "MATCH (n {name: 'Bob'}) DELETE n")
    assert names(g3) == ["Alice", "Paris"]


def test_plain_delete_with_edges_raises(wg):
    with pytest.raises(CypherWriteError, match="DETACH"):
        cypher_write(wg, "MATCH (n:Person {name: 'Alice'}) DELETE n")


def test_detach_delete_cascades(wg):
    g2 = cypher_write(wg, "MATCH (n:Person {name: 'Alice'}) DETACH DELETE n")
    assert names(g2) == ["Bob", "Paris"]
    assert g2.edges.count() == 0


def test_same_statement_rel_and_node_delete(wg):
    g2 = cypher_write(
        wg, "MATCH (n:Person {name: 'Alice'})-[r]->(m) DELETE r, n"
    )
    assert names(g2) == ["Bob", "Paris"]


def test_write_through_with_pipeline(wg):
    """WITH limits the write target set."""
    g2 = cypher_write(
        wg,
        "MATCH (n:Person) WITH n ORDER BY n.name LIMIT 1 SET n.flag = true",
    )
    flagged = g2.nodes.filter(F.col("props").getItem("flag").isNotNull()).collect()
    assert len(flagged) == 1 and flagged[0]["props"]["name"] == "Alice"


def test_read_api_rejects_writes(wg):
    with pytest.raises(CypherSyntaxError, match="cypher_write"):
        cypher(wg, "CREATE (n:Person {name: 'X'})")
    with pytest.raises(CypherSyntaxError, match="read queries"):
        cypher_write(wg, "MATCH (n) RETURN n")


def test_rel_prop_pattern_filters_match(wg):
    got = cypher(
        wg,
        "MATCH (a)-[r:KNOWS {since: '2020'}]->(b) RETURN b.name AS n",
    ).collect()
    assert [r["n"] for r in got] == ["Bob"]
    got2 = cypher(
        wg,
        "MATCH (a)-[r:KNOWS {since: '1999'}]->(b) RETURN b.name AS n",
    ).collect()
    assert got2 == []


def test_mixed_endpoint_create_rejected(wg):
    with pytest.raises(CypherSyntaxError, match="all new|all\\s+bound"):
        cypher_write(
            wg,
            "MATCH (a:Person {name: 'Alice'}) CREATE (a)-[:VISITED]->(x:City {name: 'Rome'})",
        )


def test_create_node_per_matched_row(wg):
    """CREATE after MATCH mints one node PER matched row; zero matched
    rows create nothing (r8 review fix)."""
    g2 = cypher_write(wg, "MATCH (p:Person) CREATE (t:Tag {kind: 'x'})")
    assert g2.nodes.filter(F.array_contains("labels", "Tag")).count() == 2
    # distinct ids/uris per minted node
    tags = g2.nodes.filter(F.array_contains("labels", "Tag"))
    assert tags.select("id").distinct().count() == 2
    g3 = cypher_write(wg, "MATCH (p:Person {name: 'nobody'}) CREATE (t:Tag)")
    assert g3.nodes.filter(F.array_contains("labels", "Tag")).count() == 0
    # MERGE with zero matched rows also merges nothing
    g4 = cypher_write(wg, "MATCH (p:Person {name: 'nobody'}) MERGE (t:Tag {kind: 'y'})")
    assert g4.nodes.filter(F.array_contains("labels", "Tag")).count() == 0


def test_self_loop_pattern_matches(spark):
    from pidb_rdf_spark.cypher import cypher
    from pidb_rdf_spark.graph import PropertyGraph

    g = PropertyGraph(
        spark=spark,
        nodes=spark.createDataFrame(
            [(1, "urn:a", ["N"], {"name": "a"}), (2, "urn:b", ["N"], {"name": "b"})],
            "id long, uri string, labels array<string>, props map<string,string>",
        ),
        edges=spark.createDataFrame(
            [(10, 1, 1, "T", {}), (11, 1, 2, "T", {})],
            "id long, src long, dst long, predicate string, props map<string,string>",
        ),
    )
    got = [tuple(r) for r in cypher(g, "MATCH (n)-[:T]->(n) RETURN n.name AS x").collect()]
    assert got == [("a",)]


def test_var_length_zero_lower_bound(spark):
    from pidb_rdf_spark.cypher import cypher
    from pidb_rdf_spark.graph import PropertyGraph

    g = PropertyGraph(
        spark=spark,
        nodes=spark.createDataFrame(
            [(i, f"urn:{i}", ["N"], {"name": f"n{i}"}) for i in (1, 2, 3)],
            "id long, uri string, labels array<string>, props map<string,string>",
        ),
        edges=spark.createDataFrame(
            [(10, 1, 2, "T", {})],
            "id long, src long, dst long, predicate string, props map<string,string>",
        ),
    )
    # *0 = identity pairs only
    got0 = sorted(
        tuple(r)
        for r in cypher(g, "MATCH (a)-[:T*0]->(b) RETURN a.name AS s, b.name AS t").collect()
    )
    assert got0 == [("n1", "n1"), ("n2", "n2"), ("n3", "n3")]
    # *0..1 = identity + the single hop
    got01 = sorted(
        tuple(r)
        for r in cypher(g, "MATCH (a)-[:T*0..1]->(b) RETURN a.name AS s, b.name AS t").collect()
    )
    assert got01 == [("n1", "n1"), ("n1", "n2"), ("n2", "n2"), ("n3", "n3")]


def test_unwind_alias_collision_same_error_in_write_path(wg):
    from pidb_rdf_spark.cypher import CypherSyntaxError

    with pytest.raises(CypherSyntaxError, match="already bound"):
        cypher_write(wg, "MATCH (n:Person) UNWIND [1, 2] AS n SET n.x = 1")


def test_create_chain_repeated_variable_self_loop(wg):
    """A repeated chain variable reuses its binding: CREATE self-loop
    (r8 review fix #3)."""
    g2 = cypher_write(wg, "CREATE (a:X {name: 'loop'})-[:T]->(a)")
    xs = g2.nodes.filter(F.array_contains("labels", "X")).collect()
    assert len(xs) == 1
    e = g2.edges.filter(F.col("predicate") == "T").collect()
    assert len(e) == 1 and e[0]["src"] == e[0]["dst"] == xs[0]["id"]
    with pytest.raises(CypherSyntaxError, match="already declared"):
        cypher_write(wg, "CREATE (a:X {p: 1})-[:T]->(a {p: 2})")


def test_params_in_optional_match_and_exists(spark):
    from pidb_rdf_spark.cypher import cypher

    g = PropertyGraph(
        spark=spark,
        nodes=spark.createDataFrame(
            [(1, "urn:a", ["P"], {"name": "a"}), (2, "urn:b", ["P"], {"name": "b"})],
            "id long, uri string, labels array<string>, props map<string,string>",
        ),
        edges=spark.createDataFrame(
            [(10, 1, 2, "T", {})],
            "id long, src long, dst long, predicate string, props map<string,string>",
        ),
    )
    got = [
        tuple(r)
        for r in cypher(
            g,
            "MATCH (x:P {name: 'a'}) OPTIONAL MATCH (x)-[:T]->(y {name: $t}) "
            "RETURN x.name AS a, y.name AS b",
            params={"t": "b"},
        ).collect()
    ]
    assert got == [("a", "b")]
    got2 = [
        tuple(r)
        for r in cypher(
            g,
            "MATCH (x:P) WHERE exists((x)-[:T]->({name: $t})) RETURN x.name AS n",
            params={"t": "b"},
        ).collect()
    ]
    assert got2 == [("a",)]


def test_leading_with_no_cartesian_warning(spark, wg):
    import warnings as W

    from pidb_rdf_spark.cypher import CypherCartesianWarning, cypher

    with W.catch_warnings():
        W.simplefilter("error", CypherCartesianWarning)
        got = [
            tuple(r)
            for r in cypher(
                wg, "WITH 2 AS k MATCH (p:Person) RETURN k, count(*) AS n"
            ).collect()
        ]
        assert got == [(2, 2)]


# ---------------------------------------------------------------------------
# MERGE ... ON CREATE SET / ON MATCH SET
# ---------------------------------------------------------------------------


def _props_of(g, name):
    row = g.nodes.filter(F.col("props").getItem("name") == name).collect()[0]
    return dict(row["props"])


def test_merge_on_create_set_fires_only_on_create(wg):
    q = (
        "MERGE (n:Person {name: 'Carol'}) "
        "ON CREATE SET n.created = 1 ON MATCH SET n.seen = 1"
    )
    g2 = cypher_write(wg, q)
    p = _props_of(g2, "Carol")
    assert p.get("created") == "1" and "seen" not in p
    # second run: node exists -> ON MATCH branch
    g3 = cypher_write(g2, q)
    p = _props_of(g3, "Carol")
    assert p.get("created") == "1" and p.get("seen") == "1"
    # still exactly one Carol
    assert g3.nodes.filter(F.col("props").getItem("name") == "Carol").count() == 1


def test_merge_on_match_set_existing_node(wg):
    # Alice pre-exists with the same content identity the MERGE names
    g2 = cypher_write(
        wg, "MERGE (n:Person {name: 'Alice'}) ON CREATE SET n.created = 1 "
        "ON MATCH SET n.age = 31"
    )
    # the merge matched by content uri only if the uri scheme matches;
    # a non-matching content identity creates instead — assert one
    # branch fired and not the other
    carols = g2.nodes.filter(F.col("props").getItem("age") == "31").count()
    created = g2.nodes.filter(F.col("props").getItem("created") == "1").count()
    assert (carols, created) in ((1, 0), (0, 1))


def test_merge_on_create_set_label(wg):
    g2 = cypher_write(
        wg, "MERGE (n:Person {name: 'Dave'}) ON CREATE SET n:Admin"
    )
    row = g2.nodes.filter(F.col("props").getItem("name") == "Dave").collect()[0]
    assert "Admin" in row["labels"]


def test_merge_rel_on_create_vs_on_match(wg):
    # (1)-[:KNOWS]->(2) exists; (2)-[:KNOWS]->(3) does not
    q = (
        "MATCH (a:Person {name: 'Alice'}), (b:Person {name: 'Bob'}) "
        "MERGE (a)-[r:KNOWS]->(b) "
        "ON CREATE SET r.origin = 'new' ON MATCH SET r.origin = 'old'"
    )
    g2 = cypher_write(wg, q)
    e = g2.edges.filter(
        (F.col("src") == 1) & (F.col("dst") == 2) & (F.col("predicate") == "KNOWS")
    ).collect()
    assert len(e) == 1 and e[0]["props"]["origin"] == "old"
    # untouched pre-existing prop survives the ON MATCH SET
    assert e[0]["props"]["since"] == "2020"
    q2 = (
        "MATCH (b:Person {name: 'Bob'}), (c:City {name: 'Paris'}) "
        "MERGE (b)-[r:LIVES_IN]->(c) "
        "ON CREATE SET r.origin = 'new' ON MATCH SET r.origin = 'old'"
    )
    g3 = cypher_write(g2, q2)
    e = g3.edges.filter(
        (F.col("src") == 2) & (F.col("dst") == 3) & (F.col("predicate") == "LIVES_IN")
    ).collect()
    assert len(e) == 1 and e[0]["props"]["origin"] == "new"
    # other edges untouched
    assert g3.edges.filter(F.col("props").getItem("origin").isNotNull()).count() == 2


def test_merge_on_set_wrong_variable_rejected(wg):
    with pytest.raises(CypherSyntaxError):
        cypher_write(
            wg,
            "MATCH (a:Person {name: 'Alice'}), (b:Person {name: 'Bob'}) "
            "MERGE (a)-[r:KNOWS]->(b) ON CREATE SET a.x = 1",
        )


def test_merge_on_set_literal_chain_rejected(wg):
    with pytest.raises(CypherSyntaxError):
        cypher_write(
            wg,
            "MERGE (a:P {name: 'X'})-[:T]->(b:P {name: 'Y'}) "
            "ON CREATE SET a.x = 1",
        )


def test_merge_on_create_zero_matched_rows_is_noop(wg):
    g2 = cypher_write(
        wg,
        "MATCH (a:Person {name: 'Nobody'}) "
        "MERGE (n:Person {name: 'Ghost'}) ON CREATE SET n.created = 1",
    )
    assert g2.nodes.filter(F.col("props").getItem("name") == "Ghost").count() == 0


def test_set_plus_equals_map(wg):
    g2 = cypher_write(
        wg,
        "MATCH (n:Person {name: 'Alice'}) SET n += {age: 31, city: 'Oslo'}",
    )
    p = _props_of(g2, "Alice")
    # merged keys updated/added, untouched keys survive
    assert p["age"] == "31" and p["city"] == "Oslo" and p["name"] == "Alice"
    # Bob untouched
    assert "city" not in _props_of(g2, "Bob")
    # on a relationship
    g3 = cypher_write(
        g2,
        "MATCH (:Person {name: 'Alice'})-[r:KNOWS]->(:Person) "
        "SET r += {since: 2024, via: 'work'}",
    )
    e = g3.edges.filter(F.col("predicate") == "KNOWS").collect()[0]
    assert e["props"]["since"] == "2024" and e["props"]["via"] == "work"


def test_merge_on_create_set_plus_equals(wg):
    g2 = cypher_write(
        wg,
        "MERGE (n:Person {name: 'Eve'}) ON CREATE SET n += {age: 1, x: 'y'}",
    )
    p = _props_of(g2, "Eve")
    assert p["age"] == "1" and p["x"] == "y"


def test_set_equals_map_full_replacement(wg):
    g2 = cypher_write(
        wg,
        "MATCH (n:Person {name: 'Alice'}) SET n = {name: 'Alice2', job: 'eng'}",
    )
    p = _props_of(g2, "Alice2")
    # old keys are gone, new set is exactly the map
    assert p == {"name": "Alice2", "job": "eng"}
    # Bob untouched
    assert _props_of(g2, "Bob") == {"name": "Bob"}
    # empty map clears every property
    g3 = cypher_write(g2, "MATCH (n:City) SET n = {}")
    row = g3.nodes.filter(F.col("uri") == "urn:c").collect()[0]
    assert row["props"] == {}
    # on a relationship
    g4 = cypher_write(
        wg, "MATCH ()-[r:KNOWS]->() SET r = {mode: 'online'}"
    )
    e = g4.edges.filter(F.col("predicate") == "KNOWS").collect()[0]
    assert e["props"] == {"mode": "online"}


def test_merge_on_match_set_equals_map(wg):
    # MERGE matches by content identity (M11): create via MERGE first
    g1 = cypher_write(
        wg, "MERGE (n:Person {name: 'Eve'}) ON CREATE SET n.tmp = 'x'"
    )
    g2 = cypher_write(
        g1,
        "MERGE (n:Person {name: 'Eve'}) ON MATCH SET n = {name: 'Eve', v: '2'}",
    )
    assert _props_of(g2, "Eve") == {"name": "Eve", "v": "2"}


def test_unwind_batch_create_bulk_ingest(wg):
    """UNWIND $batch AS row CREATE (...row.k...): the bulk-load shape."""
    batch = [
        {"name": "Dan", "age": 40},
        {"name": "Erin", "age": 35},
        {"name": "Frank"},  # missing key -> property omitted
    ]
    g2 = cypher_write(
        wg,
        "UNWIND $batch AS row "
        "CREATE (n:Loaded {name: row.name, age: row.age, src: 'batch'})",
        params={"batch": batch},
    )
    rows_ = g2.nodes.filter(F.array_contains("labels", "Loaded")).collect()
    assert len(rows_) == 3
    by_name = {r["props"]["name"]: dict(r["props"]) for r in rows_}
    assert by_name["Dan"] == {"name": "Dan", "age": "40", "src": "batch"}
    assert by_name["Erin"]["age"] == "35"
    assert "age" not in by_name["Frank"]  # NULL omitted


def test_create_property_from_matched_node(wg):
    g2 = cypher_write(
        wg,
        "MATCH (p:Person) CREATE (s:Shadow {of: p.name})",
    )
    shadows = sorted(
        r["props"]["of"]
        for r in g2.nodes.filter(F.array_contains("labels", "Shadow")).collect()
    )
    assert shadows == ["Alice", "Bob"]


def test_create_edge_property_from_row(wg):
    """CREATE relationship property from a row expression."""
    g2 = cypher_write(
        wg,
        "MATCH (a:Person)-[:KNOWS]->(b:Person) "
        "CREATE (a)-[:GREETS {to: b.name, mode: 'hi'}]->(b)",
    )
    e = g2.edges.filter(F.col("predicate") == "GREETS").collect()
    assert len(e) == 1
    assert dict(e[0]["props"]) == {"to": "Bob", "mode": "hi"}
    # MERGE rejects row-expression properties
    with pytest.raises(CypherSyntaxError, match="CREATE-only"):
        cypher_write(
            wg,
            "MATCH (a:Person)-[:KNOWS]->(b:Person) "
            "MERGE (a)-[:GREETS {to: b.name}]->(b)",
        )


def test_foreach_create_over_literal_list(wg):
    g2 = cypher_write(
        wg, "FOREACH (x IN [1, 2, 3] | CREATE (n:Num {v: x}))"
    )
    got = sorted(
        r[0]
        for r in g2.nodes.filter(F.array_contains("labels", "Num"))
        .select(F.col("props").getItem("v"))
        .collect()
    )
    assert got == ["1", "2", "3"]


def test_foreach_marks_path_nodes(wg):
    """The canonical idiom: FOREACH (n IN nodes(p) | SET ...) — the
    unwound elements keep their node kind, so SET resolves them."""
    g2 = cypher_write(
        wg,
        "MATCH p = (a:Person {name: 'Alice'})-[:LIVES_IN]->(c) "
        "FOREACH (n IN nodes(p) | SET n.mark = 'y')",
    )
    marked = sorted(
        r[0]
        for r in g2.nodes.filter(F.col("props").getItem("mark") == "y")
        .select(F.col("props").getItem("name"))
        .collect()
    )
    assert marked == ["Alice", "Paris"]


def test_foreach_relationships_set_property(wg):
    g2 = cypher_write(
        wg,
        "MATCH p = (a:Person {name: 'Alice'})-[:KNOWS]->(b) "
        "FOREACH (r IN relationships(p) | SET r.checked = '1')",
    )
    row = g2.edges.filter(F.col("predicate") == "KNOWS").collect()[0]
    assert row["props"]["checked"] == "1"


def test_foreach_does_not_change_outer_cardinality(wg):
    """Writes after a FOREACH still see the pre-FOREACH row set: one
    SET per matched row, not per FOREACH element."""
    g2 = cypher_write(
        wg,
        "MATCH (a:Person {name: 'Bob'}) "
        "FOREACH (x IN [1, 2, 3] | CREATE (n:T {v: x})) "
        "SET a.seen = 'once'",
    )
    assert (
        g2.nodes.filter(F.col("props").getItem("seen") == "once").count() == 1
    )
    assert g2.nodes.filter(F.array_contains("labels", "T")).count() == 3


def test_foreach_nested(wg):
    g2 = cypher_write(
        wg,
        "FOREACH (x IN [1, 2] | FOREACH (y IN [1, 2] | CREATE (n:P)))",
    )
    assert g2.nodes.filter(F.array_contains("labels", "P")).count() == 4


def test_foreach_scalar_element_not_a_set_target(wg):
    with pytest.raises(CypherSyntaxError, match="not a node or relationship"):
        cypher_write(wg, "FOREACH (x IN [1, 2] | SET x.k = 1)")


def test_foreach_empty_body_rejected(wg):
    with pytest.raises(CypherSyntaxError, match="at least one write"):
        cypher_write(wg, "FOREACH (x IN [1, 2] | )")


def test_foreach_merge_body_idempotent(wg):
    g2 = cypher_write(
        wg, "FOREACH (x IN [1, 2, 1] | MERGE (n:Tag {name: 'hot'}))"
    )
    assert (
        g2.nodes.filter(F.array_contains("labels", "Tag")).count() == 1
    )  # MERGE inside FOREACH stays idempotent across elements


def test_create_explicit_uri_is_identity(wg):
    """CREATE with an explicit literal uri gives the node THAT
    identity (r11 fix — a random urn was silently substituted, so a
    later MERGE {uri: ...} duplicated the node); per-row CREATE takes
    row-expression uris, and a CONSTANT uri per-row raises."""
    import pytest as _pytest

    from pidb_rdf_spark.cypher import cypher
    from pidb_rdf_spark.cypher_write import CypherSyntaxError, cypher_write

    g = cypher_write(
        wg, 'CREATE (n:Thing {uri: "urn:t:fixed", tag: "v"})'
    )
    assert g.nodes.filter(g.nodes.uri == "urn:t:fixed").count() == 1
    before = g.nodes.count()
    g = cypher_write(
        g, 'MERGE (n:Thing {uri: "urn:t:fixed"}) ON MATCH SET n.seen = "y"'
    )
    assert g.nodes.count() == before  # matched, not duplicated
    got = cypher(
        g, 'MATCH (n {uri: "urn:t:fixed"}) RETURN n.seen AS s'
    ).first()
    assert got["s"] == "y"
    g2 = cypher_write(
        g,
        "UNWIND $batch AS row CREATE (n:Doc {uri: row.u, k: row.k})",
        params={"batch": [{"u": "urn:d:1", "k": "x"},
                          {"u": "urn:d:2", "k": "y"}]},
    )
    assert g2.nodes.filter(g2.nodes.uri.startswith("urn:d:")).count() == 2
    with _pytest.raises(CypherSyntaxError, match="constant uri"):
        cypher_write(g, 'UNWIND [1,2] AS i CREATE (n {uri: "urn:dup"})')


def test_create_chain_explicit_uri_is_identity(wg):
    """The standalone-chain CREATE branch honors explicit literal uris
    too (ADVICE r11: it minted a random urn and _node_row popped the
    uri prop, so MERGE {uri: ...} later duplicated the node)."""
    g = cypher_write(
        wg,
        'CREATE (a:Doc {uri: "urn:ch:a"})-[:REF]->(b:Doc {uri: "urn:ch:b"})',
    )
    assert g.nodes.filter(g.nodes.uri == "urn:ch:a").count() == 1
    assert g.nodes.filter(g.nodes.uri == "urn:ch:b").count() == 1
    before = g.nodes.count()
    g = cypher_write(g, 'MERGE (a:Doc {uri: "urn:ch:a"})')
    assert g.nodes.count() == before  # matched the chain-created node
    # the edge connects the two explicit identities
    got = cypher(
        g,
        'MATCH (a {uri: "urn:ch:a"})-[:REF]->(b) RETURN b.uri AS u',
    ).first()
    assert got["u"] == "urn:ch:b"


def test_create_duplicate_explicit_uri_raises(wg):
    """CREATE never upserts: re-creating an existing explicit uri would
    union a second node row with the identical xxhash64 id and fan out
    every later join — both the bare and chain branches raise and point
    at MERGE (ADVICE r11)."""
    g = cypher_write(wg, 'CREATE (n:Doc {uri: "urn:dup:x"})')
    with pytest.raises(CypherWriteError, match="use MERGE"):
        cypher_write(g, 'CREATE (n:Doc {uri: "urn:dup:x"})')
    with pytest.raises(CypherWriteError, match="use MERGE"):
        cypher_write(
            g, 'CREATE (a {uri: "urn:dup:x"})-[:REF]->(b {uri: "urn:dup:y"})'
        )
    # existing graph uris count too
    with pytest.raises(CypherWriteError, match="use MERGE"):
        cypher_write(g, 'CREATE (n {uri: "urn:a"})')
