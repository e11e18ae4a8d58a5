"""End-to-end SPARQL tests on the graphified sf0.001 testdata,
cross-checked against DuckDB on the raw relational tables."""

import duckdb
import pytest

from pidb_rdf_spark.sparql import parse_sparql, sparql
from tests.conftest import SF_DIR


def oracle(sql: str):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con.execute(sql).fetchall()


def test_parse_smoke():
    q = parse_sparql(
        """
        PREFIX ex: <http://example.org/>
        SELECT DISTINCT ?name (COUNT(?o) AS ?n) WHERE {
          ?c v:label "Customer" .
          ?c v:c_name ?name .
          ?o e:PLACED_BY ?c .
          OPTIONAL { ?o v:o_orderstatus ?st }
          FILTER(?name != "x" && 1 < 2)
        } GROUP BY ?name ORDER BY DESC(?n) ?name LIMIT 5 OFFSET 1
        """
    )
    assert q.distinct and q.limit == 5 and q.offset == 1
    assert q.group_by == ["name"] and len(q.order_by) == 2


def test_value_filter_order_limit(graph):
    # M1 flagship slice: label scan + edge join + value + FILTER + ORDER + LIMIT
    df = sparql(
        graph,
        """
        SELECT ?name ?total WHERE {
          ?c v:label "Customer" .
          ?c v:c_name ?name .
          ?o e:PLACED_BY ?c .
          ?o v:o_totalprice ?total .
          FILTER(?total > 100000)
        } ORDER BY DESC(?total) ?name LIMIT 10
        """,
    )
    got = [(r["name"], r["total"]) for r in df.collect()]
    want = oracle(
        """
        SELECT c_name AS name, o_totalprice AS total
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_totalprice > 100000
        ORDER BY total DESC, name LIMIT 10
        """
    )
    assert got == [tuple(r) for r in want]


def test_bgp_three_hop(graph):
    df = sparql(
        graph,
        """
        SELECT ?cust ?nation ?region WHERE {
          ?c v:label "Customer" .
          ?c v:c_name ?cust .
          ?c e:IN_NATION ?n .
          ?n v:n_name ?nation .
          ?n e:IN_REGION ?r .
          ?r v:r_name ?region .
        }
        """,
    )
    got = sorted(tuple(r) for r in df.collect())
    want = sorted(
        tuple(r)
        for r in oracle(
            """
            SELECT c_name, n_name, r_name FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            """
        )
    )
    assert got == want


def test_group_count(graph):
    df = sparql(
        graph,
        """
        SELECT ?seg (COUNT(?c) AS ?n) WHERE {
          ?c v:label "Customer" . ?c v:c_mktsegment ?seg .
        } GROUP BY ?seg ORDER BY ?seg
        """,
    )
    got = [(r["seg"], r["n"]) for r in df.collect()]
    want = [
        tuple(r)
        for r in oracle(
            "SELECT c_mktsegment, COUNT(*) FROM customer GROUP BY 1 ORDER BY 1"
        )
    ]
    assert got == want


def test_optional_null(graph):
    # supplier with no orders relationship -> OPTIONAL binds NULL
    df = sparql(
        graph,
        """
        SELECT ?s ?o WHERE {
          ?s v:label "Supplier" .
          OPTIONAL { ?o e:PLACED_BY ?s }
        }
        """,
    )
    rows = df.collect()
    assert len(rows) == 10  # sf0.001 suppliers
    assert all(r["o"] is None for r in rows)


def test_union(graph):
    df = sparql(
        graph,
        """
        SELECT ?name WHERE {
          { ?x v:label "Region" . ?x v:r_name ?name }
          UNION
          { ?x v:label "Nation" . ?x v:n_name ?name }
        }
        """,
    )
    got = sorted(r["name"] for r in df.collect())
    want = sorted(
        r[0]
        for r in oracle(
            "SELECT r_name FROM region UNION ALL SELECT n_name FROM nation"
        )
    )
    assert got == want


def test_exists_not_exists(graph):
    df = sparql(
        graph,
        """
        SELECT ?name WHERE {
          ?c v:label "Customer" . ?c v:c_name ?name .
          FILTER NOT EXISTS { ?o e:PLACED_BY ?c }
        }
        """,
    )
    got = sorted(r["name"] for r in df.collect())
    want = sorted(
        r[0]
        for r in oracle(
            "SELECT c_name FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)"
        )
    )
    assert got == want


def test_distinct_and_count_distinct(graph):
    df = sparql(
        graph,
        """
        SELECT (COUNT(DISTINCT ?seg) AS ?n) WHERE {
          ?c v:label "Customer" . ?c v:c_mktsegment ?seg .
        }
        """,
    )
    assert df.collect()[0]["n"] == oracle(
        "SELECT COUNT(DISTINCT c_mktsegment) FROM customer"
    )[0][0]


# ---- standard extensions: BIND / VALUES / MINUS --------------------------


def test_bind(graph):
    from pidb_rdf_spark.sparql import sparql

    rows = sparql(
        graph,
        """
        SELECT ?r ?double WHERE {
          ?x v:label "Region" . ?x v:r_regionkey ?r .
          BIND(?r * 2 AS ?double)
        } ORDER BY ?r
        """,
    ).collect()
    assert [(r["r"], r["double"]) for r in rows] == [(i, i * 2) for i in range(5)]


def test_values_single_and_row_form(graph):
    from pidb_rdf_spark.sparql import sparql

    rows = sparql(
        graph,
        """
        SELECT ?name WHERE {
          VALUES ?name { "AMERICA" "ASIA" }
          ?x v:label "Region" . ?x v:r_name ?name .
        } ORDER BY ?name
        """,
    ).collect()
    assert [r["name"] for r in rows] == ["AMERICA", "ASIA"]

    rows = sparql(
        graph,
        """
        SELECT ?name ?k WHERE {
          VALUES (?name ?k) { ("AMERICA" 1) ("ASIA" 2) }
          ?x v:label "Region" . ?x v:r_name ?name .
        } ORDER BY ?name
        """,
    ).collect()
    assert [(r["name"], r["k"]) for r in rows] == [("AMERICA", 1), ("ASIA", 2)]


def test_minus_shared_and_disjoint(graph):
    from pidb_rdf_spark.sparql import sparql

    n_all = sparql(
        graph, 'SELECT ?n WHERE { ?x v:label "Region" . ?x v:r_name ?n }'
    ).count()
    n_minus = sparql(
        graph,
        """
        SELECT ?n WHERE {
          ?x v:label "Region" . ?x v:r_name ?n .
          MINUS { ?x v:r_name "ASIA" }
        }
        """,
    ).count()
    assert (n_all, n_minus) == (5, 4)
    # W3C: MINUS with no shared variables removes nothing
    n_disjoint = sparql(
        graph,
        """
        SELECT ?n WHERE {
          ?x v:label "Region" . ?x v:r_name ?n .
          MINUS { ?y v:label "Nation" }
        }
        """,
    ).count()
    assert n_disjoint == 5


def test_meta_pseudo_key_value(graph):
    """P7: v:key / v:value bind the subject's property keys / values
    (reference hasKey/hasValue, TraversalBuilder.java:63-79)."""
    from pidb_rdf_spark.sparql import sparql

    keys = sparql(
        graph,
        'SELECT DISTINCT ?k WHERE { ?x v:label "Region" . ?x v:key ?k } ORDER BY ?k',
    ).collect()
    assert [r["k"] for r in keys] == ["r_name", "r_regionkey"]
    n = sparql(
        graph, 'SELECT ?x WHERE { ?x v:label "Region" . ?x v:value "ASIA" }'
    ).count()
    assert n == 1


def test_property_element_pattern(graph):
    """P6: p: binds the property element (key + value struct)."""
    from pidb_rdf_spark.sparql import sparql

    rows = sparql(
        graph,
        'SELECT ?pe WHERE { ?x v:label "Region" . ?x p:r_name ?pe } LIMIT 2',
    ).collect()
    assert all(r["pe"]["key"] == "r_name" for r in rows)
    assert all(isinstance(r["pe"]["value"], str) for r in rows)


def test_bare_group_by_collects(graph):
    """A5: GROUP BY with no aggregator collects rows per key
    (reference group() step)."""
    from pidb_rdf_spark.sparql import sparql

    rows = sparql(
        graph,
        """
        SELECT ?seg WHERE {
          ?c v:label "Customer" . ?c v:c_mktsegment ?seg . ?c v:c_name ?n .
        } GROUP BY ?seg
        """,
    ).collect()
    assert len(rows) == 5
    assert all(len(r["group"]) > 0 for r in rows)


def test_offset(graph):
    """O2: OFFSET slices after ORDER BY."""
    from pidb_rdf_spark.sparql import sparql

    q = 'SELECT ?n WHERE { ?x v:label "Nation" . ?x v:n_name ?n } ORDER BY ?n'
    all_names = [r["n"] for r in sparql(graph, q).collect()]
    sliced = [r["n"] for r in sparql(graph, q + " LIMIT 5 OFFSET 3").collect()]
    assert sliced == all_names[3:8]


def test_nested_optional(graph):
    """OPTIONAL inside OPTIONAL: inner misses leave NULLs without
    dropping outer matches."""
    from pidb_rdf_spark.sparql import sparql

    rows = sparql(
        graph,
        """
        SELECT ?sname ?nname ?rname WHERE {
          ?s v:label "Supplier" . ?s v:s_name ?sname .
          OPTIONAL {
            ?s e:IN_NATION ?n . ?n v:n_name ?nname .
            OPTIONAL { ?n e:IN_REGION ?r . ?r v:r_name ?rname }
          }
        } ORDER BY ?sname
        """,
    ).collect()
    assert len(rows) == 10  # all suppliers kept
    assert all(r["nname"] is not None and r["rname"] is not None for r in rows)


def test_filter_bound_on_optional_var(graph):
    """FILTER(BOUND(?x)) / !BOUND(?x) evaluate after OPTIONAL."""
    from pidb_rdf_spark.sparql import sparql

    n_bound = sparql(
        graph,
        """
        SELECT ?name WHERE {
          ?c v:label "Customer" . ?c v:c_name ?name .
          OPTIONAL { ?o e:PLACED_BY ?c . ?o v:o_totalprice ?t }
          FILTER(BOUND(?t))
        }
        """,
    ).count()
    n_unbound = sparql(
        graph,
        """
        SELECT ?name WHERE {
          ?c v:label "Customer" . ?c v:c_name ?name .
          OPTIONAL { ?o e:PLACED_BY ?c . ?o v:o_totalprice ?t }
          FILTER(!BOUND(?t))
        }
        """,
    ).count()
    # sf0.001: every customer has orders -> no unbound rows
    assert n_unbound == 0
    assert n_bound == 1500  # one row per order (bag semantics)


def test_union_inside_optional(graph):
    from pidb_rdf_spark.sparql import sparql

    rows = sparql(
        graph,
        """
        SELECT ?name ?other WHERE {
          ?x v:label "Region" . ?x v:r_name ?name .
          OPTIONAL {
            { ?x v:r_regionkey ?other } UNION { ?x v:r_name ?other }
          }
        }
        """,
    ).collect()
    # 5 regions x (key binding + name binding) = 10 rows
    assert len(rows) == 10


def test_filter_inside_optional(graph):
    """A FILTER inside an OPTIONAL group restricts the right side
    BEFORE the left join (reference filter-in-OPTIONAL handling,
    SparqlToGremlinCompiler.java:274-281): non-matching left rows
    survive with NULLs instead of being dropped."""
    from pidb_rdf_spark.sparql import sparql

    rows = sparql(
        graph,
        """
        SELECT ?name ?t WHERE {
          ?c v:label "Customer" . ?c v:c_name ?name .
          OPTIONAL {
            ?o e:PLACED_BY ?c . ?o v:o_totalprice ?t .
            FILTER(?t > 400000)
          }
        }
        """,
    ).collect()
    # every customer appears; only high-value orders bind ?t
    names = {r["name"] for r in rows}
    assert len(names) == 150
    bound = [r for r in rows if r["t"] is not None]
    assert all(r["t"] > 400000 for r in bound)
    unbound = [r for r in rows if r["t"] is None]
    assert len(unbound) > 0  # customers with no qualifying order kept


def test_projecting_unbound_var_yields_null(graph):
    # W3C: projecting a variable no pattern binds is legal — the
    # binding is simply absent (NULL), not an analysis error
    from pyspark.sql import functions as F

    df = sparql(graph, "SELECT ?name ?never WHERE { ?c v:c_name ?name } LIMIT 5")
    assert df.columns == ["name", "never"]
    assert df.filter(F.col("never").isNotNull()).count() == 0


def test_avg_distinct(graph):
    """AVG(DISTINCT) averages the distinct value set (was silently
    compiled as plain AVG)."""
    got = sparql(
        graph,
        'SELECT (AVG(DISTINCT ?q) AS ?a) (AVG(?q) AS ?plain) WHERE { '
        '?l v:label "Lineitem" . ?l v:l_quantity ?q }',
    ).collect()[0]
    want = oracle(
        "SELECT AVG(DISTINCT l_quantity), AVG(l_quantity) FROM lineitem"
    )[0]
    assert got["a"] == pytest.approx(want[0])
    assert got["plain"] == pytest.approx(want[1])
    assert got["a"] != pytest.approx(want[1])  # the two really differ


def test_variable_predicate_constant_object(graph):
    """<s> ?p <o> constrains the OBJECT too — previously the constant
    object was silently ignored and every outgoing edge matched."""
    from pidb_rdf_spark.sparql import sparql

    nat = oracle(
        "SELECT c_nationkey FROM customer WHERE c_custkey = 1"
    )[0][0]
    got = sorted(
        r["p"]
        for r in sparql(
            graph,
            f"SELECT ?p WHERE {{ <urn:customer:1> ?p <urn:nation:{nat}> }}",
        ).collect()
    )
    assert got == ["IN_NATION"]
    # a WRONG object yields nothing even though outgoing edges exist
    none = sparql(
        graph,
        f"SELECT ?p WHERE {{ <urn:customer:1> ?p <urn:nation:{(nat + 1) % 25}> }}",
    ).collect()
    assert none == []


def test_bind_on_bound_variable_raises(graph):
    """W3C: BIND's target must not already be in scope — previously a
    withColumn silently OVERWROTE the matched values."""
    import pytest

    from pidb_rdf_spark.sparql import sparql

    with pytest.raises(SyntaxError, match="already bound"):
        sparql(
            graph,
            'SELECT ?s ?n WHERE { ?s v:n_name ?n . BIND("X" AS ?n) }',
        )
