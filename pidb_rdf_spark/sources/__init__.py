from pidb_rdf_spark.sources.rdf_reader import (
    TRIPLES_SCHEMA,
    read_rdf,
    read_ntriples,
    read_nquads,
    parse_rdf_snippet,
)
from pidb_rdf_spark.sources.graphml import (
    read_graphml,
    write_graphml,
)
from pidb_rdf_spark.sources.graphson import (
    graphson_documents,
    read_graphson,
    write_graphson,
)
from pidb_rdf_spark.sources.rdf_writer import (
    export_nquads,
    export_ntriples,
    export_trig,
    graph_to_triples,
)

__all__ = [
    "TRIPLES_SCHEMA",
    "export_nquads",
    "export_ntriples",
    "export_trig",
    "graph_to_triples",
    "graphson_documents",
    "read_graphml",
    "read_graphson",
    "write_graphml",
    "write_graphson",
    "parse_rdf_snippet",
    "read_nquads",
    "read_ntriples",
    "read_rdf",
]
