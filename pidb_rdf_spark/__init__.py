"""pidb_rdf_spark — a PySpark-native RDF / property-graph analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference system ``cas-bigdatalab/pidb-rdf`` (an
RDF layer over an embedded property-graph store, queryable via
SPARQL / Gremlin / Cypher) as an idiomatic Spark DataFrame engine:

- data model: ``nodes`` / ``edges`` / ``triples`` DataFrames
  (SURVEY.md §1.5) instead of record-at-a-time LPG storage
- SPARQL subset -> DataFrame plan compiler (reference:
  ``sparql/SparqlToGremlinCompiler.java``)
- fluent graph DSL playing Gremlin's role, Spark SQL playing
  Cypher's pass-through role (reference: ``Neo4jGraph.cypher``)
- RDF import/export jobs (reference: ``semantics/*``)
- ontology inference via iterative-join transitive closure
  (reference: ``semantics/inference/MicroReasoners.java``)
- large-scale data-pipeline operators (dedup / similarity / text
  analysis) layered on the same tables.

Everything here is plain PySpark: logical plans are declared with the
DataFrame API and Catalyst/Tungsten pick the physical strategy.
"""

from pidb_rdf_spark.graph import PropertyGraph, graphify
from pidb_rdf_spark.session import get_spark

__all__ = ["PropertyGraph", "get_spark", "graphify"]

# query surfaces (imported lazily by most callers; re-exported for
# discoverability): sparql.sparql, cypher.cypher, dsl.traversal

__version__ = "0.1.0"
