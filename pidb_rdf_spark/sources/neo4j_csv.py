"""Neo4j bulk-CSV (`neo4j-admin database import`) reader: the
realistic migration path for users of the reference stack, whose
data lives in Neo4j (`neo4j/structure/Neo4jGraph.java`) — export
with the standard admin tooling, load here as a PropertyGraph.

Format (Neo4j operations-manual CSV header syntax):
- nodes file: ``name:ID``, ``:LABEL`` (``;``-separated multi-labels),
  plain property columns, optionally typed ``age:int`` (the type
  suffix is accepted and stripped; values stay strings in the props
  map, matching this engine's open-schema property layout).
- relationships file: ``:START_ID``, ``:END_ID``, ``:TYPE`` + plain
  property columns.

Scale shape: two plain Spark CSV scans (splittable, parallel) +
column projections; node ids come from ``xxhash64`` of the CSV id
string — the same no-coordination executor-side id scheme graphify
uses, so a 1000-executor load has no id-assignment choke point.
Malformed rows (missing id / dangling endpoints are NOT validated
here — run ``operators.profile.check_constraints`` with an fk rule
for that; this reader stays a pure projection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pidb_rdf_spark.graph import PropertyGraph


def _header_meta(cols: list[str]):
    """Split CSV columns into (id_col, label_col, [(col, prop_name)])
    following the admin-import header syntax ``name:ID`` / ``:LABEL``
    / ``prop`` / ``prop:type``."""
    import re

    id_col = label_col = None
    props = []
    for c in cols:
        # 'name:ID' and the id-space form 'name:ID(Person)' are both
        # admin-import syntax; ':IGNORE' drops the column whether the
        # name part is empty or not ('tmp:IGNORE' must NOT import as
        # a property named 'tmp')
        if re.search(r":ID(\([^)]*\))?$", c):
            id_col = c
        elif c == ":LABEL":
            label_col = c
        elif re.search(r":IGNORE$", c):
            continue
        elif c.startswith(":"):
            continue  # other pseudo-columns
        else:
            props.append((c, c.split(":")[0]))  # strip any type suffix
    if id_col is None:
        raise ValueError("nodes CSV needs a ':ID' column (e.g. 'name:ID')")
    return id_col, label_col, props


def read_neo4j_csv(
    spark: SparkSession,
    nodes_path: str,
    rels_path: str | None = None,
    id_space: str = "neo4j",
) -> PropertyGraph:
    """Load a Neo4j admin-import CSV pair as a PropertyGraph.

    ``uri`` is ``urn:<id_space>:<csv id>`` (stable, re-exportable);
    node/edge ids are xxhash64 of that uri — executor-side, no
    coordination. Multi-labels split on ``;``; property values load
    into the open-schema ``props`` map as strings (cast downstream;
    the engine's typed-hot-column promotion happens on save/graphify,
    not here)."""
    ncsv = spark.read.option("header", True).csv(nodes_path)
    id_col, label_col, nprops = _header_meta(ncsv.columns)
    uri = F.concat(F.lit(f"urn:{id_space}:"), F.col(id_col))
    labels = (
        F.split(F.col(label_col), ";")
        if label_col is not None
        else F.array().cast("array<string>")
    )
    props_map = (
        F.map_filter(
            F.create_map(
                *[x for c, name in nprops for x in (F.lit(name), F.col(c))]
            ),
            lambda _k, v: v.isNotNull(),
        )
        if nprops
        else F.create_map().cast("map<string,string>")
    )
    nodes = ncsv.select(
        F.xxhash64(uri).alias("id"),
        uri.alias("uri"),
        labels.alias("labels"),
        props_map.alias("props"),
    ).dropDuplicates(["id"])
    if rels_path is None:
        edges = spark.createDataFrame(
            [],
            "id long, src long, dst long, predicate string, "
            "props map<string,string>",
        )
        return PropertyGraph(spark=spark, nodes=nodes, edges=edges)
    import re

    rcsv = spark.read.option("header", True).csv(rels_path)
    cols = rcsv.columns

    def _find(kind):
        for c in cols:
            if re.search(rf":{kind}(\([^)]*\))?$", c):
                return c
        raise ValueError(f"relationships CSV needs a ':{kind}' column")

    start_col, end_col, type_col = (
        _find("START_ID"), _find("END_ID"), _find("TYPE"),
    )
    eprops = [
        (c, c.split(":")[0])
        for c in cols
        if c not in (start_col, end_col, type_col)
        and not c.startswith(":")
        and not re.search(r":IGNORE$", c)
    ]
    eprops_map = (
        F.map_filter(
            F.create_map(
                *[x for c, name in eprops for x in (F.lit(name), F.col(c))]
            ),
            lambda _k, v: v.isNotNull(),
        )
        if eprops
        else F.create_map().cast("map<string,string>")
    )
    s_uri = F.concat(F.lit(f"urn:{id_space}:"), F.col(start_col))
    d_uri = F.concat(F.lit(f"urn:{id_space}:"), F.col(end_col))
    edges = rcsv.select(
        F.xxhash64(s_uri, d_uri, F.col(type_col)).alias("id"),
        F.xxhash64(s_uri).alias("src"),
        F.xxhash64(d_uri).alias("dst"),
        F.col(type_col).alias("predicate"),
        eprops_map.alias("props"),
    )
    return PropertyGraph(spark=spark, nodes=nodes, edges=edges)


def write_neo4j_csv(
    graph: PropertyGraph, nodes_path: str, rels_path: str
) -> None:
    """Export a PropertyGraph as a `neo4j-admin database import` CSV
    pair — the reverse migration (this engine -> Neo4j). ``uri`` is
    the ``:ID``; labels join with ``;``; the props map flattens to
    one column per distinct key (bounded by the engine's schema cap,
    the namespace-registry class of collect). Edge endpoints resolve
    id -> uri through two joins against the node table.

    Written with Spark's parallel CSV writer (one directory per
    table, splittable parts) — `neo4j-admin` accepts multiple files
    per table, so no single-stream choke point."""
    from pidb_rdf_spark.graph import _capped_key_collect

    nodes, edges = graph.nodes, graph.edges
    nkeys = sorted(
        r[0]
        for r in _capped_key_collect(
            nodes.select(F.explode(F.map_keys("props")).alias("k"))
            .groupBy("k")
            .agg(F.count("*").alias("n")),
            "write_neo4j_csv node props",
        )
    )
    out_n = nodes.select(
        F.col("uri").alias("name:ID"),
        F.array_join("labels", ";").alias(":LABEL"),
        *[F.col("props")[k].alias(k) for k in nkeys],
    )
    out_n.write.mode("overwrite").option("header", True).csv(nodes_path)
    ekeys = sorted(
        r[0]
        for r in _capped_key_collect(
            edges.select(F.explode(F.map_keys("props")).alias("k"))
            .groupBy("k")
            .agg(F.count("*").alias("n")),
            "write_neo4j_csv edge props",
        )
    )
    uri_of = nodes.select("id", "uri")
    out_e = (
        edges.join(
            uri_of.withColumnsRenamed({"id": "src", "uri": ":START_ID"}),
            on="src",
        )
        .join(
            uri_of.withColumnsRenamed({"id": "dst", "uri": ":END_ID"}),
            on="dst",
        )
        .select(
            ":START_ID",
            ":END_ID",
            F.col("predicate").alias(":TYPE"),
            *[F.col("props")[k].alias(k) for k in ekeys],
        )
    )
    out_e.write.mode("overwrite").option("header", True).csv(rels_path)
