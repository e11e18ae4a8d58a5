"""SPARQL 1.1 subselects, GROUP_CONCAT/SAMPLE aggregates, and the
extended scalar builtins, cross-checked against DuckDB."""

import duckdb
import pytest

from pidb_rdf_spark.sparql import parse_sparql, sparql
from pidb_rdf_spark.sparql import algebra as A
from tests.conftest import SF_DIR


def oracle(sql: str):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "orders"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.execute(sql).fetchall()


def test_parse_subselect():
    q = parse_sparql(
        "SELECT ?x WHERE { ?x v:n_name ?nm . "
        "{ SELECT ?x (COUNT(?c) AS ?n) WHERE { ?c e:IN_NATION ?x } GROUP BY ?x } }"
    )
    subs = [e for e in q.where.elements if isinstance(e, A.SubSelect)]
    assert len(subs) == 1
    assert subs[0].query.group_by == ["x"]


def test_subselect_joins_on_node_ids(graph):
    # inner aggregation over node ids; outer joins names on the same ids
    rows = sparql(
        graph,
        """
        SELECT ?nation ?n WHERE {
          ?nat v:n_name ?nation .
          { SELECT ?nat (COUNT(?o) AS ?n) WHERE {
              ?c e:IN_NATION ?nat . ?o e:PLACED_BY ?c .
            } GROUP BY ?nat }
        } ORDER BY DESC(?n) ?nation
        """,
    ).collect()
    exp = oracle(
        """
        SELECT n_name, COUNT(*) AS n
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n DESC, n_name
        """
    )
    assert [(r.nation, r.n) for r in rows] == exp


def test_subselect_limit_applies_inside(graph):
    # LIMIT inside the subselect restricts the inner solutions only
    rows = sparql(
        graph,
        """
        SELECT ?nation WHERE {
          ?nat v:n_name ?nation .
          { SELECT ?nat WHERE { ?nat v:label "Nation" } ORDER BY ?nat LIMIT 3 }
        } ORDER BY ?nation
        """,
    ).collect()
    assert len(rows) == 3


def test_group_concat(graph):
    rows = sparql(
        graph,
        """
        SELECT ?region (GROUP_CONCAT(DISTINCT ?nation; SEPARATOR=", ") AS ?nations)
        WHERE {
          ?n e:IN_REGION ?r . ?r v:r_name ?region . ?n v:n_name ?nation .
        } GROUP BY ?region ORDER BY ?region
        """,
    ).collect()
    exp = oracle(
        """
        SELECT r_name, string_agg(DISTINCT n_name, ', ' ORDER BY n_name)
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name
        """
    )
    assert [(r.region, r.nations) for r in rows] == exp


def test_sample_single_valued_group(graph):
    # SAMPLE picks an arbitrary value; pin it on single-value groups
    rows = sparql(
        graph,
        """
        SELECT ?nation (SAMPLE(?region) AS ?r) WHERE {
          ?n v:n_name ?nation . ?n e:IN_REGION/v:r_name ?region .
        } GROUP BY ?nation ORDER BY ?nation
        """,
    ).collect()
    exp = oracle(
        """
        SELECT n_name, r_name FROM nation
        JOIN region ON n_regionkey = r_regionkey ORDER BY n_name
        """
    )
    assert [(r.nation, r.r) for r in rows] == exp


@pytest.mark.parametrize(
    "expr,sql",
    [
        ('STRBEFORE(?x, "_")', "CASE WHEN instr(n_name, '_') > 0 THEN "
                               "substr(n_name, 1, instr(n_name, '_') - 1) ELSE '' END"),
        ('STRAFTER(?x, "_")', "CASE WHEN instr(n_name, '_') > 0 THEN "
                              "substr(n_name, instr(n_name, '_') + 1) ELSE '' END"),
        ('CONCAT(?x, "!")', "n_name || '!'"),
        ('SUBSTR(?x, 2, 3)', "substr(n_name, 2, 3)"),
        ('REPLACE(?x, "[0-9]+", "#")', "regexp_replace(n_name, '[0-9]+', '#', 'g')"),
        ('IF(STRLEN(?x) > 8, "long", "short")',
         "CASE WHEN length(n_name) > 8 THEN 'long' ELSE 'short' END"),
        ('COALESCE(?x, "none")', "coalesce(n_name, 'none')"),
    ],
)
def test_scalar_builtins(graph, expr, sql):
    rows = sparql(
        graph,
        f"SELECT ?x ({expr} AS ?out) WHERE {{ ?n v:n_name ?x }} ORDER BY ?x",
    ).collect()
    exp = oracle(f"SELECT n_name, {sql} FROM nation ORDER BY n_name")
    assert [(r.x, r.out) for r in rows] == exp


def test_ceil_floor_year(graph):
    rows = sparql(
        graph,
        "SELECT ?t (CEIL(?t / 1000) AS ?c) (FLOOR(?t / 1000) AS ?f) "
        "WHERE { ?o v:o_totalprice ?t } ORDER BY ?t LIMIT 20",
    ).collect()
    exp = oracle(
        "SELECT o_totalprice, CAST(ceil(o_totalprice / 1000) AS BIGINT), "
        "CAST(floor(o_totalprice / 1000) AS BIGINT) "
        "FROM orders ORDER BY o_totalprice LIMIT 20"
    )
    assert [(round(r.t, 2), r.c, r.f) for r in rows] == [
        (round(t, 2), c, f) for t, c, f in exp
    ]


@pytest.mark.parametrize(
    "expr,sql",
    [
        ("MD5(?x)", "md5(n_name)"),
        ("SHA256(?x)", "sha256(n_name)"),
        ('SAMETERM(?x, "ALGERIA")', "n_name = 'ALGERIA'"),
        ("ISNUMERIC(?x)", "FALSE"),
    ],
)
def test_hash_and_term_builtins(graph, expr, sql):
    rows = sparql(
        graph,
        f"SELECT ?x ({expr} AS ?out) WHERE {{ ?n v:n_name ?x }} ORDER BY ?x",
    ).collect()
    exp = oracle(f"SELECT n_name, {sql} FROM nation ORDER BY n_name")
    assert [(r.x, r.out) for r in rows] == exp


def test_sha1_family_matches_hashlib(graph):
    import hashlib

    rows = sparql(
        graph,
        "SELECT ?x (SHA1(?x) AS ?h1) (SHA384(?x) AS ?h384) "
        "(SHA512(?x) AS ?h512) WHERE { ?n v:n_name ?x } ORDER BY ?x",
    ).collect()
    for r in rows:
        b = r.x.encode()
        assert r.h1 == hashlib.sha1(b).hexdigest()
        assert r.h384 == hashlib.sha384(b).hexdigest()
        assert r.h512 == hashlib.sha512(b).hexdigest()


def test_encode_for_uri_matches_rfc3986(graph, spark):
    """ENCODE_FOR_URI percent-encodes everything but RFC3986
    unreserved chars (W3C semantics; checked vs urllib.parse.quote)."""
    from urllib.parse import quote

    from pidb_rdf_spark.graph import graphify
    from pidb_rdf_spark.mutation import add_vertices

    g = graphify(spark, SF_DIR)
    g = add_vertices(
        g,
        [
            {
                "uri": "urn:t:enc",
                "labels": ["T"],
                "props": {"s": "a b/c?d&e=f~g_h-i.j:k"},
            }
        ],
    )
    rows = sparql(
        g,
        'SELECT (ENCODE_FOR_URI(?s) AS ?e) WHERE { ?n v:label "T" . ?n v:s ?s }',
    ).collect()
    assert rows[0].e == quote("a b/c?d&e=f~g_h-i.j:k", safe="")


def test_time_part_builtins(graph, spark):
    """HOURS/MINUTES/SECONDS on timestamp-valued properties (session
    TZ is UTC, so parts are read off the literal verbatim)."""
    from pidb_rdf_spark.graph import graphify
    from pidb_rdf_spark.mutation import add_vertices

    g = graphify(spark, SF_DIR)
    g = add_vertices(
        g,
        [
            {"uri": "urn:t:ts1", "labels": ["Stamp"],
             "props": {"at": "2026-08-13 17:45:09"}},
            {"uri": "urn:t:ts2", "labels": ["Stamp"],
             "props": {"at": "2026-01-02 03:04:05"}},
        ],
    )
    got = sparql(
        g,
        """
        SELECT ?at (HOURS(?at) AS ?h) (MINUTES(?at) AS ?m)
               (SECONDS(?at) AS ?s)
        WHERE { ?e v:label "Stamp" . ?e v:at ?at } ORDER BY ?at
        """,
    ).collect()
    assert [(r.h, r.m, r.s) for r in got] == [(3, 4, 5), (17, 45, 9)]


def test_term_type_builtins(graph):
    """ISIRI/ISURI/ISBLANK/ISLITERAL over node + value vars (W3C term
    tests re-expressed on the value model: node vars are IRIs except
    ``_:``-prefixed blank nodes; value vars are literals)."""
    rows = sparql(
        graph,
        """
        SELECT ?x (ISIRI(?n) AS ?ni) (ISBLANK(?n) AS ?nb)
               (ISLITERAL(?n) AS ?nl) (ISLITERAL(?x) AS ?xl)
               (ISIRI(?x) AS ?xi)
        WHERE { ?n v:n_name ?x } ORDER BY ?x LIMIT 3
        """,
    ).collect()
    for r in rows:
        assert (r.ni, r.nb, r.nl) == (True, False, False)
        assert (r.xl, r.xi) == (True, False)


def test_isblank_filter_on_bnode(spark):
    """A blank node (uri ``_:...``) must satisfy FILTER(ISBLANK(?n))
    and fail FILTER(ISIRI(?n)) — the flag join resolves ids to uri
    prefixes inside the FILTER context."""
    from pidb_rdf_spark.graph import graphify
    from pidb_rdf_spark.mutation import add_vertices

    g = graphify(spark, SF_DIR)
    g = add_vertices(
        g,
        [
            {"uri": "_:anon1", "labels": ["BT"], "props": {"k": "a"}},
            {"uri": "urn:t:named", "labels": ["BT"], "props": {"k": "b"}},
        ],
    )
    blanks = sparql(
        g,
        'SELECT ?k WHERE { ?n v:label "BT" . ?n v:k ?k . FILTER(ISBLANK(?n)) }',
    ).collect()
    iris = sparql(
        g,
        'SELECT ?k WHERE { ?n v:label "BT" . ?n v:k ?k . FILTER(ISIRI(?n)) }',
    ).collect()
    assert [r.k for r in blanks] == ["a"]
    assert [r.k for r in iris] == ["b"]


def test_iri_bnode_constructors(graph):
    rows = sparql(
        graph,
        """
        SELECT ?x (IRI(CONCAT("urn:n:", ?x)) AS ?u) (BNODE(?x) AS ?b)
               (ISIRI(IRI(?x)) AS ?ui) (ISBLANK(BNODE(?x)) AS ?bb)
        WHERE { ?n v:n_name ?x } ORDER BY ?x LIMIT 2
        """,
    ).collect()
    for r in rows:
        assert r.u == "urn:n:" + r.x
        assert r.b.startswith("_:b") and len(r.b) == 35  # _:b + md5 hex
        assert r.ui is True and r.bb is True
    # BNODE(str) is stable per lexical form
    again = sparql(
        graph,
        "SELECT (BNODE(?x) AS ?b) WHERE { ?n v:n_name ?x } ORDER BY ?x LIMIT 2",
    ).collect()
    assert [r.b for r in again] == [r.b for r in rows]


def test_strdt_strlang_casts(graph):
    rows = sparql(
        graph,
        """
        SELECT (STRDT("42", <http://www.w3.org/2001/XMLSchema#integer>) AS ?i)
               (STRDT("2.5", <http://www.w3.org/2001/XMLSchema#double>) AS ?d)
               (STRDT("true", <http://www.w3.org/2001/XMLSchema#boolean>) AS ?t)
               (STRLANG("chat", "fr") AS ?s)
        WHERE { ?n v:n_name ?x } LIMIT 1
        """,
    ).collect()
    r = rows[0]
    assert (r.i, r.d, r.t, r.s) == (42, 2.5, True, "chat")


def test_nondeterministic_builtins_shape(graph):
    """UUID/STRUUID/RAND/NOW/TZ: values are fresh per call, so assert
    shape/range only."""
    import re

    rows = sparql(
        graph,
        """
        SELECT (UUID() AS ?u) (STRUUID() AS ?su) (RAND() AS ?r)
               (NOW() AS ?now) (TZ(?x) AS ?tz) (TIMEZONE(?x) AS ?dur)
        WHERE { ?n v:n_name ?x } LIMIT 5
        """,
    ).collect()
    hex_ = r"[0-9a-f]"
    pat = re.compile(rf"^{hex_}{{8}}-{hex_}{{4}}-{hex_}{{4}}-{hex_}{{4}}-{hex_}{{12}}$")
    for r in rows:
        assert r.u.startswith("urn:uuid:") and pat.match(r.u[9:])
        assert pat.match(r.su)
        assert 0.0 <= r.r < 1.0
        assert r.now is not None
        assert r.tz == "Z" and r.dur == "PT0S"
