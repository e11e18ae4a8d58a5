"""Namespace / vocabulary mapping admin (SURVEY.md §2.1 S14).

Reference: ``semantics/mapping/MappingUtils.java`` — CRUD procedures
over ``_MapNs`` (schema namespace + prefix) and ``_MapDef`` (graph
element name → external vocabulary element) nodes, used by the RDF
export endpoints to rewrite internal property/label/relationship
names to public vocabulary IRIs (``addSchema`` :21-34,
``addCommonSchemas`` :36-61, ``listSchemas`` :63-73,
``addMappingToSchema`` :75-103, ``dropSchema`` :105-119,
``dropMapping`` :122-128, ``listMappings`` :130-140).

Spark shape: one small ``mappings`` DataFrame (schema_ns, prefix,
graph_name, external_name). It is vocabulary-sized, so every use
site broadcasts it; mutations are full-overwrite of the tiny table —
no merge machinery needed at this scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAPPINGS_SCHEMA = (
    "schema_ns string, prefix string, graph_name string, external_name string"
)

# reference addCommonSchemas, MappingUtils.java:36-61
COMMON_SCHEMAS = [
    ("http://schema.org/", "sch"),
    ("http://purl.org/dc/elements/1.1/", "dc"),
    ("http://purl.org/dc/terms/", "dct"),
    ("http://www.w3.org/2004/02/skos/core#", "skos"),
    ("http://www.w3.org/2000/01/rdf-schema#", "rdfs"),
    ("http://www.w3.org/2002/07/owl#", "owl"),
    ("http://xmlns.com/foaf/0.1/", "foaf"),
]


def empty_mappings(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], MAPPINGS_SCHEMA)


def add_schema(mappings: DataFrame, namespace: str, prefix: str) -> DataFrame:
    """Register a schema namespace under a prefix. Re-adding an
    existing prefix re-points it (reference MERGE semantics,
    ``MappingUtils.java:26-31``). Prefixes must be word characters
    with no ``__``: the shortened form is ``prefix__local`` and
    ``build_uri`` recovers the prefix as the text before the FIRST
    ``__`` — a prefix containing the separator (or characters the
    ``\\w+`` recovery regex cannot match) would corrupt every IRI
    round-trip under it."""
    import re

    if not re.fullmatch(r"\w+", prefix) or "__" in prefix:
        raise ValueError(
            f"prefix must be word characters without '__': {prefix!r}"
        )
    spark = mappings.sparkSession
    kept = mappings.filter(F.col("prefix") != prefix)
    new = spark.createDataFrame([(namespace, prefix, None, None)], MAPPINGS_SCHEMA)
    return kept.unionByName(new)


def add_common_schemas(mappings: DataFrame) -> DataFrame:
    out = mappings
    for ns, prefix in COMMON_SCHEMAS:
        out = add_schema(out, ns, prefix)
    return out


def list_schemas(mappings: DataFrame) -> DataFrame:
    return (
        mappings.select("schema_ns", "prefix").distinct().orderBy("prefix")
    )


def add_mapping_to_schema(
    mappings: DataFrame, prefix: str, graph_name: str, external_name: str
) -> DataFrame:
    """Map a graph element name (property key / label / edge type) to
    an element of a registered schema (``MappingUtils.java:75-103``;
    one mapping per graph name — re-adding replaces)."""
    spark = mappings.sparkSession
    schema = (
        mappings.filter(F.col("prefix") == prefix)
        .select("schema_ns")
        .limit(1)
        .collect()
    )
    if not schema:
        raise ValueError(f"no schema registered under prefix {prefix!r}")
    ns = schema[0][0]
    kept = mappings.filter(
        (F.col("graph_name").isNull()) | (F.col("graph_name") != graph_name)
    )
    new = spark.createDataFrame(
        [(ns, prefix, graph_name, external_name)], MAPPINGS_SCHEMA
    )
    return kept.unionByName(new)


def drop_schema(mappings: DataFrame, prefix: str) -> DataFrame:
    """Remove a schema and every mapping defined on it
    (``MappingUtils.java:105-119`` — DETACH DELETE cascades)."""
    return mappings.filter(F.col("prefix") != prefix)


def drop_mapping(mappings: DataFrame, graph_name: str) -> DataFrame:
    return mappings.filter(
        (F.col("graph_name").isNull()) | (F.col("graph_name") != graph_name)
    )


def list_mappings(mappings: DataFrame, schema_filter: str | None = None) -> DataFrame:
    out = mappings.filter(F.col("graph_name").isNotNull()).select(
        "prefix",
        "graph_name",
        F.concat(F.col("schema_ns"), F.col("external_name")).alias("external_iri"),
    )
    if schema_filter:
        out = out.filter(F.col("prefix").contains(schema_filter))
    return out.orderBy("graph_name")


def apply_mappings(
    triples: DataFrame, mappings: DataFrame, mapped_only: bool = False
) -> DataFrame:
    """Rewrite predicate names through the mapping table on export
    (the reference applies mappings in its serializers,
    ``RDFEndpoint.java:356-387`` with ``showOnlyMappedInfo``).

    Broadcast left join on the vocabulary-sized table; unmapped
    predicates pass through unchanged unless ``mapped_only``. A
    mapping matches the raw graph name AND its default-namespace
    expansion (``urn:default#name``) — the exporter expands unmapped
    names first (``build_uri``), and the reference consults mappings
    before that fallback (``RDFEndpoint.java:317-337``)."""
    defs = mappings.filter(F.col("graph_name").isNotNull())
    mapped_iri = F.concat(F.col("schema_ns"), F.col("external_name"))
    m = defs.select(
        F.col("graph_name").alias("predicate"), mapped_iri.alias("__mapped")
    ).unionByName(
        defs.select(
            F.concat(F.lit("urn:default#"), F.col("graph_name")).alias("predicate"),
            mapped_iri.alias("__mapped"),
        )
    )
    joined = triples.join(F.broadcast(m), on="predicate", how="left")
    if mapped_only:
        joined = joined.filter(F.col("__mapped").isNotNull())
    return joined.withColumn(
        "predicate", F.coalesce(F.col("__mapped"), F.col("predicate"))
    ).drop("__mapped")
