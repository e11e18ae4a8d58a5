"""GraphSON adjacency-list export/import for PropertyGraph.

TinkerPop's ``io()`` surface (the reference exposes it through its
graph adapter, ``neo4j/structure/Neo4jGraph.java:61``) reads and
writes GraphSON: one JSON document PER VERTEX carrying the vertex,
its properties and its outgoing edges — the line-oriented adjacency
layout that made GraphSON the bulk-load format for TinkerPop stacks.
This module speaks that adjacency shape in its untyped form (every
property value a string, matching this engine's open-schema ``props``
map; the typed ``g:Int64``-wrapper dialect adds nothing over parquet
for a Spark-to-Spark hop and is deliberately out of scope):

    {"id": "urn:x:1", "label": "Person::Employee",
     "outE": {"KNOWS": [{"id": "...", "inV": "urn:x:2",
                         "properties": {"since": "2010"}}]},
     "properties": {"name": [{"value": "marko"}]}}

Multi-labels join with ``::`` (TinkerPop's multi-label convention);
vertex property values are single-element ``[{"value": ...}]`` arrays
(the GraphSON vertex-property shape, sans meta-properties).

Scale shape: the export is one edge→uri hash join (inV resolution)
plus two aggregations keyed on src — the unavoidable cost of an
adjacency format; everything else is per-row JSON construction
(``to_json``, codegen) and a parallel text write, no driver
materialization anywhere. One vertex's document carries its full
out-adjacency — the format's own constraint (a 10M-out-degree hub is
one 10M-element JSON line in ANY GraphSON writer); shard hubs
upstream if that bites. The import is a schema-projected JSON scan
(splittable, parallel) + one explode chain for edges; ids are
xxhash64 of the uri — executor-side, no id-assignment coordination,
the same scheme as ``neo4j_csv`` (edge ids are REGENERATED as
xxhash64(src uri, dst uri, predicate), not round-tripped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pidb_rdf_spark.graph import PropertyGraph

_EDGE_ARR = "array<struct<id: string, inV: string, properties: map<string,string>>>"
_OUT_E = f"map<string, {_EDGE_ARR}>"
_VPROPS = "map<string, array<struct<value: string>>>"


def graphson_documents(graph: PropertyGraph) -> DataFrame:
    """One-column (``value``) DataFrame of GraphSON vertex documents —
    the writable form, exposed separately so tests and streaming
    sinks can consume the JSON lines without touching disk."""
    nodes, edges = graph.nodes, graph.edges
    eid = (
        F.col("id").cast("string")
        if "id" in edges.columns
        else F.xxhash64("src", "dst", "predicate").cast("string")
    )
    uri_of = nodes.select(F.col("id").alias("dst"), F.col("uri").alias("__in_uri"))
    per_pred = (
        edges.join(uri_of, on="dst")
        .groupBy("src", "predicate")
        .agg(
            F.collect_list(
                F.struct(
                    eid.alias("id"),
                    F.col("__in_uri").alias("inV"),
                    F.coalesce(
                        F.col("props"),
                        F.create_map().cast("map<string,string>"),
                    ).alias("properties"),
                )
            ).alias("__es")
        )
    )
    adj = per_pred.groupBy("src").agg(
        F.map_from_entries(
            F.collect_list(F.struct("predicate", "__es"))
        ).alias("outE")
    )
    vprops = F.transform_values(
        F.coalesce(F.col("props"), F.create_map().cast("map<string,string>")),
        lambda _k, v: F.array(F.struct(v.alias("value"))),
    )
    return (
        nodes.join(adj, nodes["id"] == adj["src"], "left")
        .select(
            F.to_json(
                F.struct(
                    F.col("uri").alias("id"),
                    F.array_join("labels", "::").alias("label"),
                    F.coalesce(F.col("outE"), F.create_map().cast(_OUT_E)).alias(
                        "outE"
                    ),
                    vprops.alias("properties"),
                )
            ).alias("value")
        )
    )


def write_graphson(graph: PropertyGraph, path: str) -> None:
    """Export the graph as GraphSON adjacency JSON lines under
    ``path`` (a directory of splittable text parts — TinkerPop's
    readers take a directory glob, so no single-stream choke)."""
    graphson_documents(graph).write.mode("overwrite").text(path)


def read_graphson(spark: SparkSession, path: str) -> PropertyGraph:
    """Load GraphSON adjacency JSON lines as a PropertyGraph.

    Accepts this module's output and any untyped adjacency GraphSON
    with string ids (documents missing ``outE``/``properties`` load
    as isolated/bare vertices). Malformed JSON lines raise — silent
    row drops corrupt a graph's referential integrity, unlike a
    document corpus."""
    schema = (
        f"id string, label string, outE {_OUT_E}, properties {_VPROPS},"
        " _corrupt_record string"
    )
    raw = spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)
    bad = raw.filter(F.col("_corrupt_record").isNotNull() | F.col("id").isNull())
    first_bad = bad.select(
        F.coalesce("_corrupt_record", F.lit("<missing id>")).alias("r")
    ).limit(1).collect()
    if first_bad:
        raise ValueError(
            f"read_graphson: malformed document: {first_bad[0]['r'][:200]!r}"
        )
    labels = F.when(
        F.length(F.coalesce(F.col("label"), F.lit(""))) > 0,
        F.split("label", "::"),
    ).otherwise(F.array().cast("array<string>"))
    # F.get (0-indexed) returns NULL on an empty value array, where
    # element_at(v, 1) raises INVALID_ARRAY_INDEX under ANSI — a
    # foreign document with "properties": {"k": []} degrades to an
    # absent property instead of failing the whole load
    props = F.map_filter(
        F.transform_values(
            F.coalesce(F.col("properties"), F.create_map().cast(_VPROPS)),
            lambda _k, v: F.get(v, 0)["value"],
        ),
        lambda _k, v: v.isNotNull(),
    )
    nodes = raw.select(
        F.xxhash64("id").alias("id"),
        F.col("id").alias("uri"),
        labels.alias("labels"),
        props.alias("props"),
    ).dropDuplicates(["id"])
    flat = (
        raw.select(
            F.col("id").alias("__src_uri"),
            F.explode(
                F.coalesce(F.col("outE"), F.create_map().cast(_OUT_E))
            ).alias("predicate", "__arr"),
        )
        .select("__src_uri", "predicate", F.explode("__arr").alias("__e"))
    )
    edges = flat.select(
        F.xxhash64("__src_uri", F.col("__e.inV"), "predicate").alias("id"),
        F.xxhash64("__src_uri").alias("src"),
        F.xxhash64(F.col("__e.inV")).alias("dst"),
        "predicate",
        F.coalesce(
            F.col("__e.properties"), F.create_map().cast("map<string,string>")
        ).alias("props"),
    )
    return PropertyGraph(spark=spark, nodes=nodes, edges=edges)
