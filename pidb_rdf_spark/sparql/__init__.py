"""SPARQL front-end: parser (text -> algebra) and compiler
(algebra -> DataFrame plan).

Reference pipeline (SURVEY.md §3.1): Jena parse -> SPARQL algebra ->
Gremlin traversal fragments -> match()/coalesce() assembly
(``sparql/SparqlToGremlinCompiler.java``). Here: hand-written
recursive-descent parser (no rdflib in the image) -> algebra
dataclasses -> DataFrame joins/filters/aggregates, with Catalyst as
the physical optimizer.
"""

from pidb_rdf_spark.sparql.compiler import SparqlCompiler, sparql
from pidb_rdf_spark.sparql.parser import parse_sparql
from pidb_rdf_spark.sparql.update import sparql_update

__all__ = ["SparqlCompiler", "parse_sparql", "sparql", "sparql_update"]
