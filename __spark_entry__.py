"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Every query here is an operator exercise from SURVEY.md §2 (the
reference system's operator inventory) or a scale-extension operator,
run through pidb_rdf_spark's public APIs over the graphified /
relational testdata.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_GRAPH_CACHE: dict = {}


def _graph(spark: SparkSession, sf_dir: str):
    from pidb_rdf_spark.graph import graphify

    key = (id(spark), sf_dir)
    if key not in _GRAPH_CACHE:
        _GRAPH_CACHE[key] = graphify(spark, sf_dir)
    return _GRAPH_CACHE[key]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: SPARQL BGP join +
    filter + order + limit through the full parse->algebra->DataFrame
    compile pipeline (SURVEY.md §3.1)."""
    from pidb_rdf_spark.sparql import sparql

    g = _graph(spark, "/root/testdata/sf0.001")
    return sparql(
        g,
        """
        SELECT ?cust ?nation ?total WHERE {
          ?c v:label "Customer" .
          ?c v:c_name ?cust .
          ?c e:IN_NATION ?n .
          ?n v:n_name ?nation .
          ?o e:PLACED_BY ?c .
          ?o v:o_totalprice ?total .
          FILTER(?total > 100000)
        } ORDER BY DESC(?total) ?cust LIMIT 20
        """,
    )


# ---------------------------------------------------------------------------
# queries: name -> (spark, sf_dir) -> DataFrame
# oracle_sql: name -> equivalent DuckDB SQL over the raw tables
# ---------------------------------------------------------------------------


def _sparql_query(text: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pidb_rdf_spark.sparql import sparql

        return sparql(_graph(spark, sf_dir), text)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # -- S5/S6: label scan + property seek (SURVEY §2.1) ----------------
    q["label_scan_prop_seek"] = _sparql_query(
        """
        SELECT ?name WHERE {
          ?c v:label "Customer" .
          ?c v:c_mktsegment "BUILDING" .
          ?c v:c_name ?name .
        }
        """
    )

    # -- J1: BGP 3-hop join (SURVEY §2.4) -------------------------------
    q["bgp_three_hop"] = _sparql_query(
        """
        SELECT ?cust ?nation ?region WHERE {
          ?c v:label "Customer" . ?c v:c_name ?cust .
          ?c e:IN_NATION ?n . ?n v:n_name ?nation .
          ?n e:IN_REGION ?r . ?r v:r_name ?region .
        }
        """
    )

    # -- P8/P9 + O1/O2: FILTER + ORDER + LIMIT --------------------------
    q["filter_order_limit"] = _sparql_query(
        """
        SELECT ?cust ?total WHERE {
          ?c v:label "Customer" . ?c v:c_name ?cust .
          ?o e:PLACED_BY ?c . ?o v:o_totalprice ?total .
          FILTER(?total > 100000)
        } ORDER BY DESC(?total) ?cust LIMIT 50
        """
    )

    # -- A3: GROUP BY + COUNT ------------------------------------------
    q["group_count"] = _sparql_query(
        """
        SELECT ?seg (COUNT(?c) AS ?n) WHERE {
          ?c v:label "Customer" . ?c v:c_mktsegment ?seg .
        } GROUP BY ?seg ORDER BY ?seg
        """
    )

    # -- A2: COUNT DISTINCT --------------------------------------------
    q["count_distinct"] = _sparql_query(
        """
        SELECT (COUNT(DISTINCT ?seg) AS ?n) WHERE {
          ?c v:label "Customer" . ?c v:c_mktsegment ?seg .
        }
        """
    )

    # -- A4 + A1..A5 extensions: full aggregate set over a join ---------
    q["agg_full"] = _sparql_query(
        """
        SELECT ?status (COUNT(?o) AS ?n) (ROUND(SUM(?total), 2) AS ?sum_total)
               (ROUND(AVG(?total), 2) AS ?avg_total) (MIN(?total) AS ?min_total)
               (MAX(?total) AS ?max_total)
        WHERE {
          ?o v:label "Orders" . ?o v:o_orderstatus ?status .
          ?o v:o_totalprice ?total .
        } GROUP BY ?status ORDER BY ?status
        """
    )

    # -- J2: OPTIONAL left join ----------------------------------------
    q["optional_left_join"] = _sparql_query(
        """
        SELECT ?sname ?nname WHERE {
          ?s v:label "Supplier" . ?s v:s_name ?sname .
          OPTIONAL { ?s e:IN_NATION ?n . ?n v:n_name ?nname }
        } ORDER BY ?sname
        """
    )

    # -- J3: UNION ------------------------------------------------------
    q["union_names"] = _sparql_query(
        """
        SELECT ?name WHERE {
          { ?x v:label "Region" . ?x v:r_name ?name }
          UNION
          { ?x v:label "Nation" . ?x v:n_name ?name }
        }
        """
    )

    # -- J4/J5: EXISTS / NOT EXISTS ------------------------------------
    q["not_exists_anti"] = _sparql_query(
        """
        SELECT ?name WHERE {
          ?c v:label "Customer" . ?c v:c_name ?name .
          FILTER NOT EXISTS { ?o e:PLACED_BY ?c }
        } ORDER BY ?name
        """
    )
    q["exists_semi"] = _sparql_query(
        """
        SELECT DISTINCT ?name WHERE {
          ?c v:label "Customer" . ?c v:c_name ?name .
          FILTER EXISTS { ?o e:PLACED_BY ?c }
        } ORDER BY ?name
        """
    )

    # -- A6: DISTINCT projection ---------------------------------------
    q["distinct_projection"] = _sparql_query(
        """
        SELECT DISTINCT ?seg WHERE {
          ?c v:label "Customer" . ?c v:c_mktsegment ?seg .
        } ORDER BY ?seg
        """
    )

    # -- Gremlin-role DSL (SURVEY §3.2): hops + predicate + group ------
    def dsl_two_hop_group(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pidb_rdf_spark.dsl import P, traversal

        return (
            traversal(_graph(spark, sf_dir))
            .V()
            .has_label("Customer")
            .has("c_acctbal", P.gt(5000))
            .out("IN_NATION")
            .group_count("n_name")
            .withColumnsRenamed({"key": "nation", "count": "n"})
        )

    q["dsl_two_hop_group"] = dsl_two_hop_group

    # -- S11: SQL pass-through (Cypher's role, SURVEY §3.3) ------------
    def sql_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
        g = _graph(spark, sf_dir)
        g.register_views()
        return g.sql(
            """
            SELECT n.n_name AS nation, COUNT(*) AS n_suppliers
            FROM edges e
            JOIN nodes s ON e.src = s.id
            JOIN nodes n ON e.dst = n.id
            WHERE e.predicate = 'IN_NATION'
              AND array_contains(s.labels, 'Supplier')
            GROUP BY n.n_name ORDER BY nation
            """
        )

    q["sql_passthrough"] = sql_passthrough

    # -- R1-R4: transitive closure + inferred reasoners (SURVEY §2.10) -
    def closure_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pidb_rdf_spark.inference import transitive_closure

        g = _graph(spark, sf_dir)
        containment = g.edges.filter(
            F.col("predicate").isin("IN_NATION", "IN_REGION")
        )
        src_uri = g.nodes.select(F.col("id").alias("src"), F.col("uri").alias("child"))
        dst_uri = g.nodes.select(F.col("id").alias("dst"), F.col("uri").alias("parent"))
        pairs = containment.join(src_uri, on="src").join(dst_uri, on="dst").select(
            "child", "parent"
        )
        return transitive_closure(pairs).select(
            F.col("child").alias("descendant"), F.col("parent").alias("ancestor")
        )

    q["closure_reachability"] = closure_reachability

    def nodes_with_label_inferred(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pidb_rdf_spark.inference import get_nodes_with_label

        g = _graph(spark, sf_dir)
        hierarchy = spark.createDataFrame(
            [
                ("Customer", "Actor", "SLO"),
                ("Supplier", "Actor", "SLO"),
                ("Nation", "Place", "SLO"),
                ("Region", "Place", "SLO"),
            ],
            ["child", "parent", "kind"],
        )
        return get_nodes_with_label(g, hierarchy, "Actor").select("uri").withColumnRenamed(
            "uri", "node_uri"
        )

    q["nodes_with_label_inferred"] = nodes_with_label_inferred

    def rels_inferred(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pidb_rdf_spark.inference import get_rels

        g = _graph(spark, sf_dir)
        hierarchy = spark.createDataFrame(
            [("IN_NATION", "LOCATED", "SRO"), ("IN_REGION", "LOCATED", "SRO")],
            ["child", "parent", "kind"],
        )
        edges = get_rels(g, hierarchy, "LOCATED")
        src_uri = g.nodes.select(F.col("id").alias("src"), F.col("uri").alias("src_uri"))
        dst_uri = g.nodes.select(F.col("id").alias("dst"), F.col("uri").alias("dst_uri"))
        return edges.join(src_uri, on="src").join(dst_uri, on="dst").select(
            "src_uri", "predicate", "dst_uri"
        )

    q["rels_inferred"] = rels_inferred

    # -- O3: per-group limit via window (SURVEY §2.7) -------------------
    def topk_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pidb_rdf_spark.operators import topk_per_group

        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
        joined = orders.join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == customer.c_custkey,
        )
        return topk_per_group(
            joined, ["c_mktsegment"], "o_totalprice", 3, tie_break=["o_orderkey"]
        ).select(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderkey").alias("okey"),
            F.col("o_totalprice").alias("total"),
        )

    q["topk_orders_per_segment"] = topk_orders_per_segment

    return q


def oracle_sql() -> dict[str, str]:
    return {
        "label_scan_prop_seek": """
            SELECT c_name AS name FROM customer
            WHERE c_mktsegment = 'BUILDING'
        """,
        "bgp_three_hop": """
            SELECT c_name AS cust, n_name AS nation, r_name AS region
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
        """,
        "filter_order_limit": """
            SELECT c_name AS cust, o_totalprice AS total
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE o_totalprice > 100000
            ORDER BY total DESC, cust LIMIT 50
        """,
        "group_count": """
            SELECT c_mktsegment AS seg, COUNT(*) AS n
            FROM customer GROUP BY 1 ORDER BY 1
        """,
        "count_distinct": """
            SELECT COUNT(DISTINCT c_mktsegment) AS n FROM customer
        """,
        "agg_full": """
            SELECT o_orderstatus AS status, COUNT(*) AS n,
                   ROUND(SUM(o_totalprice), 2) AS sum_total,
                   ROUND(AVG(o_totalprice), 2) AS avg_total,
                   MIN(o_totalprice) AS min_total,
                   MAX(o_totalprice) AS max_total
            FROM orders GROUP BY 1 ORDER BY 1
        """,
        "optional_left_join": """
            SELECT s_name AS sname, n_name AS nname
            FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey
            ORDER BY sname
        """,
        "union_names": """
            SELECT r_name AS name FROM region
            UNION ALL
            SELECT n_name AS name FROM nation
        """,
        "not_exists_anti": """
            SELECT c_name AS name FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
            ORDER BY name
        """,
        "exists_semi": """
            SELECT DISTINCT c_name AS name FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders)
            ORDER BY name
        """,
        "distinct_projection": """
            SELECT DISTINCT c_mktsegment AS seg FROM customer ORDER BY 1
        """,
        "dsl_two_hop_group": """
            SELECT n_name AS nation, COUNT(*) AS n
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            WHERE c_acctbal > 5000 GROUP BY 1
        """,
        "sql_passthrough": """
            SELECT n_name AS nation, COUNT(*) AS n_suppliers
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            GROUP BY 1 ORDER BY 1
        """,
        "closure_reachability": """
            WITH RECURSIVE base(child, parent) AS (
                SELECT 'urn:customer:' || CAST(c_custkey AS VARCHAR),
                       'urn:nation:' || CAST(c_nationkey AS VARCHAR) FROM customer
                UNION ALL
                SELECT 'urn:supplier:' || CAST(s_suppkey AS VARCHAR),
                       'urn:nation:' || CAST(s_nationkey AS VARCHAR) FROM supplier
                UNION ALL
                SELECT 'urn:nation:' || CAST(n_nationkey AS VARCHAR),
                       'urn:region:' || CAST(n_regionkey AS VARCHAR) FROM nation
            ), clo(descendant, ancestor) AS (
                SELECT child, parent FROM base
                UNION
                SELECT b.child, c.ancestor FROM base b
                JOIN clo c ON b.parent = c.descendant
            )
            SELECT descendant, ancestor FROM clo
        """,
        "nodes_with_label_inferred": """
            SELECT 'urn:customer:' || CAST(c_custkey AS VARCHAR) AS node_uri FROM customer
            UNION ALL
            SELECT 'urn:supplier:' || CAST(s_suppkey AS VARCHAR) FROM supplier
        """,
        "rels_inferred": """
            SELECT 'urn:customer:' || CAST(c_custkey AS VARCHAR) AS src_uri,
                   'IN_NATION' AS predicate,
                   'urn:nation:' || CAST(c_nationkey AS VARCHAR) AS dst_uri FROM customer
            UNION ALL
            SELECT 'urn:supplier:' || CAST(s_suppkey AS VARCHAR), 'IN_NATION',
                   'urn:nation:' || CAST(s_nationkey AS VARCHAR) FROM supplier
            UNION ALL
            SELECT 'urn:nation:' || CAST(n_nationkey AS VARCHAR), 'IN_REGION',
                   'urn:region:' || CAST(n_regionkey AS VARCHAR) FROM nation
        """,
        "topk_orders_per_segment": """
            SELECT seg, okey, total FROM (
                SELECT c_mktsegment AS seg, o_orderkey AS okey,
                       o_totalprice AS total,
                       ROW_NUMBER() OVER (
                           PARTITION BY c_mktsegment
                           ORDER BY o_totalprice DESC, o_orderkey
                       ) AS rn
                FROM orders JOIN customer ON o_custkey = c_custkey
            ) t WHERE rn <= 3
        """,
    }
