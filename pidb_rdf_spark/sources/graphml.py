"""GraphML export/import for PropertyGraph — the XML half of
TinkerPop's ``io()`` surface (``neo4j/structure/Neo4jGraph.java:61``;
GraphSON in ``graphson.py`` is the JSON half and the SCALE path).

GraphML is ONE XML document by definition, so a faithful writer
cannot shard: this one streams element lines through the driver
(``toLocalIterator`` — driver memory holds one partition, not the
graph) into a single file, guarded by ``max_elements`` with a
fail-fast limit-probe (the ``embedding_near_dup_pairs`` bounded-tier
pattern). Element XML is built JVM-side (concat + entity escaping,
codegen) — the driver only writes bytes. For graphs past the cap,
use GraphSON: same information, splittable parts, no driver stream.

The reader accepts one-element-per-line GraphML (what this writer
and TinkerPop's normalized ``GraphMLWriter`` emit): a splittable
line scan + ``regexp_extract`` projections, no XML library.
TinkerPop conventions: vertex label in ``labelV``, edge label in
``labelE``; all property values as strings (this engine's
open-schema map).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pidb_rdf_spark.graph import PropertyGraph

_HEADER = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">\n'
)
_FOOTER = "</graph>\n</graphml>\n"


def _py_xml_escape(s: str) -> str:
    """Driver-side twin of :func:`_xml_escape` for the ``<key>``
    header declarations (attribute values must escape like data)."""
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
        .replace("\n", "&#10;")
        .replace("\r", "&#13;")
    )


def _xml_escape(col: Column) -> Column:
    # newline/CR become character references (valid XML, and required
    # here: the one-element-per-line layout is what keeps the reader
    # a splittable line scan — a literal newline inside a value would
    # tear its element across lines)
    out = F.regexp_replace(col, "&", "&amp;")
    out = F.regexp_replace(out, "<", "&lt;")
    out = F.regexp_replace(out, ">", "&gt;")
    out = F.regexp_replace(out, '"', "&quot;")
    out = F.regexp_replace(out, "\n", "&#10;")
    return F.regexp_replace(out, "\r", "&#13;")


def _data_entries(props: Column) -> Column:
    """props map → concatenated ``<data key="k">v</data>`` string,
    key-sorted for deterministic output."""
    entries = F.transform(
        F.array_sort(F.map_entries(props)),
        lambda e: F.concat(
            F.lit('<data key="'),
            _xml_escape(e["key"]),
            F.lit('">'),
            _xml_escape(e["value"]),
            F.lit("</data>"),
        ),
    )
    return F.array_join(entries, "")


def write_graphml(
    graph: PropertyGraph, path: str, max_elements: int = 5_000_000
) -> None:
    """Write the graph as ONE GraphML file at ``path`` (a file, not a
    directory). Raises when nodes+edges exceed ``max_elements`` —
    the driver-stream guard; GraphSON is the uncapped path."""
    nodes, edges = graph.nodes, graph.edges
    probe = (
        nodes.select(F.lit(1))
        .unionAll(edges.select(F.lit(1)))
        .limit(max_elements + 1)
        .count()
    )
    if probe > max_elements:
        raise ValueError(
            f"write_graphml streams ONE XML document through the "
            f"driver; the graph exceeds max_elements={max_elements} "
            f"elements — export GraphSON instead (splittable parts, "
            f"no driver stream)"
        )
    # distinct property keys -> <key> declarations (schema-cap-class
    # bounded collects, same as write_neo4j_csv)
    nkeys = sorted(
        r[0]
        for r in nodes.select(F.explode(F.map_keys("props")).alias("k"))
        .distinct()
        .collect()
    )
    ekeys = sorted(
        r[0]
        for r in edges.select(F.explode(F.map_keys("props")).alias("k"))
        .distinct()
        .collect()
    )
    reserved = {"labelV", "labelE"}.intersection(nkeys) | {
        "labelV",
        "labelE",
    }.intersection(ekeys)
    if reserved:
        raise ValueError(
            f"write_graphml: property key(s) {sorted(reserved)} collide "
            f"with the reserved TinkerPop label pseudo-keys — rename "
            f"them before export (the reader could not tell them apart)"
        )
    node_lines = nodes.select(
        F.concat(
            F.lit('<node id="'),
            _xml_escape(F.col("uri")),
            F.lit('"><data key="labelV">'),
            _xml_escape(F.array_join("labels", "::")),
            F.lit("</data>"),
            # NULL props map (nullable column off a user join/load)
            # must not null the whole concat — same coalesce the edge
            # path applies
            _data_entries(
                F.coalesce(
                    F.col("props"), F.create_map().cast("map<string,string>")
                )
            ),
            F.lit("</node>"),
        ).alias("line")
    )
    uri_of = nodes.select("id", "uri")
    edge_lines = (
        edges.join(
            uri_of.withColumnsRenamed({"id": "src", "uri": "__su"}), on="src"
        )
        .join(uri_of.withColumnsRenamed({"id": "dst", "uri": "__du"}), on="dst")
        .select(
            F.concat(
                F.lit('<edge source="'),
                _xml_escape(F.col("__su")),
                F.lit('" target="'),
                _xml_escape(F.col("__du")),
                F.lit('"><data key="labelE">'),
                _xml_escape(F.col("predicate")),
                F.lit("</data>"),
                _data_entries(
                    F.coalesce(
                        F.col("props"), F.create_map().cast("map<string,string>")
                    )
                ),
                F.lit("</edge>"),
            ).alias("line")
        )
    )
    with open(path, "w", encoding="utf-8") as f:
        f.write(_HEADER)
        f.write(
            '<key id="labelV" for="node" attr.name="labelV"'
            ' attr.type="string"/>\n'
        )
        f.write(
            '<key id="labelE" for="edge" attr.name="labelE"'
            ' attr.type="string"/>\n'
        )
        for k in nkeys:
            ek = _py_xml_escape(k)
            f.write(
                f'<key id="{ek}" for="node" attr.name="{ek}"'
                ' attr.type="string"/>\n'
            )
        for k in ekeys:
            ek = _py_xml_escape(k)
            f.write(
                f'<key id="{ek}" for="edge" attr.name="{ek}"'
                ' attr.type="string"/>\n'
            )
        f.write('<graph id="G" edgedefault="directed">\n')
        for row in node_lines.toLocalIterator():
            f.write(row["line"] + "\n")
        for row in edge_lines.toLocalIterator():
            f.write(row["line"] + "\n")
        f.write(_FOOTER)


_DATA_RE = r'<data key="([^"]*)">([^<]*)</data>'


def _unescape(col: Column) -> Column:
    out = F.regexp_replace(col, "&lt;", "<")
    out = F.regexp_replace(out, "&gt;", ">")
    out = F.regexp_replace(out, "&quot;", '"')
    out = F.regexp_replace(out, "&#10;", "\n")
    out = F.regexp_replace(out, "&#13;", "\r")
    return F.regexp_replace(out, "&amp;", "&")


def _props_from_data(line: Column, drop_key: str) -> Column:
    """All <data> entries of an element line as a props map, minus
    the label pseudo-key."""
    entries = F.transform(
        F.regexp_extract_all(line, F.lit(_DATA_RE), 0),
        lambda d: F.struct(
            _unescape(F.regexp_extract(d, _DATA_RE, 1)).alias("key"),
            _unescape(F.regexp_extract(d, _DATA_RE, 2)).alias("value"),
        ),
    )
    return F.map_filter(
        F.map_from_entries(entries), lambda k, _v: k != drop_key
    )


def read_graphml(spark: SparkSession, path: str) -> PropertyGraph:
    """Load one-element-per-line GraphML (this writer's output /
    TinkerPop's normalized writer) as a PropertyGraph: a splittable
    line scan + regexp projections; ids are xxhash64 of the element
    id (executor-side, no coordination — the `neo4j_csv`/`graphson`
    scheme)."""
    lines = spark.read.text(path).select(F.trim("value").alias("l"))
    nl = lines.filter(F.col("l").startswith("<node "))
    el = lines.filter(F.col("l").startswith("<edge "))
    uri = _unescape(F.regexp_extract("l", r'<node id="([^"]*)"', 1))
    labelv = _unescape(
        F.regexp_extract("l", r'<data key="labelV">([^<]*)</data>', 1)
    )
    labels = F.when(
        F.length(labelv) > 0, F.split(labelv, "::")
    ).otherwise(F.array().cast("array<string>"))
    nodes = nl.select(
        F.xxhash64(uri).alias("id"),
        uri.alias("uri"),
        labels.alias("labels"),
        _props_from_data(F.col("l"), "labelV").alias("props"),
    ).dropDuplicates(["id"])
    su = _unescape(F.regexp_extract("l", r'source="([^"]*)"', 1))
    du = _unescape(F.regexp_extract("l", r'target="([^"]*)"', 1))
    pred = _unescape(
        F.regexp_extract("l", r'<data key="labelE">([^<]*)</data>', 1)
    )
    edges = el.select(
        F.xxhash64(su, du, pred).alias("id"),
        F.xxhash64(su).alias("src"),
        F.xxhash64(du).alias("dst"),
        pred.alias("predicate"),
        _props_from_data(F.col("l"), "labelE").alias("props"),
    )
    return PropertyGraph(spark=spark, nodes=nodes, edges=edges)
