from pidb_rdf_spark.functions.iri import (
    build_uri,
    iri_local_name,
    iri_namespace,
    shorten_iri,
    typed_literal,
    xsd_typed_columns,
)

__all__ = [
    "build_uri",
    "iri_local_name",
    "iri_namespace",
    "shorten_iri",
    "typed_literal",
    "xsd_typed_columns",
]
