"""Query-plan explain for the text front-ends: what every engine's
EXPLAIN gives (the reference proxies Neo4j's EXPLAIN/PROFILE through
its Cypher endpoint) — here the compiled DataFrame's Catalyst plan,
in Spark's standard formats.

Usage::

    from pidb_rdf_spark.explain import explain_query
    print(explain_query(g, "MATCH (n:Nation) RETURN n.n_name AS x",
                        dialect="cypher"))
    print(explain_query(g, "SELECT ?n WHERE { ?c v:c_name ?n }",
                        dialect="sparql", mode="formatted"))

``mode`` is Spark's explain mode: ``simple`` (physical plan),
``extended`` (parsed/analyzed/optimized/physical), ``formatted``
(scan details: PushedFilters, ReadSchema), ``cost``, ``codegen`` —
the same audit levers SCALE.md's plan-shape tests use
(``plans.audit.plan_summary``) exposed to users."""

from __future__ import annotations

from pyspark.sql import DataFrame

_MODES = ("simple", "extended", "codegen", "cost", "formatted")


def explain_df(df: DataFrame, mode: str = "formatted") -> str:
    """The Catalyst plan of an already-built DataFrame as a string
    (``df.explain`` prints to stdout; this returns it)."""
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}")
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def explain_query(
    graph, text: str, dialect: str = "sparql", mode: str = "formatted"
) -> str:
    """Compile a SPARQL or Cypher query WITHOUT executing it and
    return the Catalyst plan — compile errors surface exactly as
    they would on execution (same parser/compiler path)."""
    d = dialect.lower()
    if d == "sparql":
        from pidb_rdf_spark.sparql import sparql

        return explain_df(sparql(graph, text), mode)
    if d == "cypher":
        from pidb_rdf_spark.cypher import cypher

        return explain_df(cypher(graph, text), mode)
    raise ValueError("dialect must be 'sparql' or 'cypher'")
