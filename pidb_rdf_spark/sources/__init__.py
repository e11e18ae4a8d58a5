from pidb_rdf_spark.sources.rdf_reader import (
    TRIPLES_SCHEMA,
    read_rdf,
    read_ntriples,
    parse_rdf_snippet,
)
from pidb_rdf_spark.sources.rdf_writer import export_ntriples, graph_to_triples

__all__ = [
    "TRIPLES_SCHEMA",
    "export_ntriples",
    "graph_to_triples",
    "parse_rdf_snippet",
    "read_ntriples",
    "read_rdf",
]
