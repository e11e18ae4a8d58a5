"""Structured-Streaming RDF import.

The reference's import is incremental-but-batch: parse, buffer,
periodic commit every ``commitSize`` (default 25,000) triples on a
worker thread pool (``semantics/DirectStatementLoader.java:175-181``,
``RDFImport.java:36``, ``semantics/Util.java:20-67``). The Spark
analog is a file-source stream of triple rows micro-batched through
``foreachBatch`` into the same set-oriented merge path the batch
importer uses (``sources/importer.merge_triples``) — each micro-batch
plays the role of one periodic commit, with exactly-once bookkeeping
from the streaming checkpoint instead of ad-hoc transactions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pidb_rdf_spark.sources.rdf_reader import TRIPLES_SCHEMA


def read_triples_stream(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """File-source stream of triples rows (the streamed-statement
    shape, ``semantics/result/StreamedStatement.java:3-20``). New
    files dropped into ``path`` become micro-batches."""
    reader = spark.readStream.schema(TRIPLES_SCHEMA)
    if fmt == "parquet":
        return reader.parquet(path)
    if fmt == "json":
        return reader.json(path)
    raise ValueError(f"unsupported stream format: {fmt}")


def stream_import_triples(
    spark: SparkSession,
    stream: DataFrame,
    nodes_path: str,
    edges_path: str,
    checkpoint: str,
    trigger_available_now: bool = False,
    **import_kwargs,
):
    """Run the streaming import: each micro-batch of triples is
    merged into the nodes/edges parquet tables (upsert-by-uri for
    nodes, (src, predicate, dst)-dedup for edges — M10/M11).

    Returns the StreamingQuery. The commit unit is the micro-batch —
    the exact analog of the reference's periodic commit — and restart
    recovery comes from the checkpoint dir.
    """
    from pidb_rdf_spark.graph import PropertyGraph
    from pidb_rdf_spark.sources.importer import import_triples, merge_triples

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark_b = batch_df.sparkSession
        try:
            existing_nodes = spark_b.read.parquet(nodes_path)
            existing_edges = spark_b.read.parquet(edges_path)
            g = PropertyGraph(
                spark=spark_b, nodes=existing_nodes, edges=existing_edges
            )
            merged = merge_triples(g, batch_df, **import_kwargs)
        except Exception:
            # first batch: nothing on disk yet
            merged = import_triples(spark_b, batch_df, **import_kwargs)
        # drop non-parquet-friendly side column before persisting
        nodes_out = merged.nodes
        if "__prop_types" in nodes_out.columns:
            nodes_out = nodes_out.drop("__prop_types")
        nodes_out.write.mode("overwrite").parquet(nodes_path + "_tmp")
        merged.edges.write.mode("overwrite").parquet(edges_path + "_tmp")
        # atomic-swap-style publish (batch jobs + table swaps replace
        # the reference's transactions, SURVEY.md §3)
        spark_b.read.parquet(nodes_path + "_tmp").write.mode("overwrite").parquet(
            nodes_path
        )
        spark_b.read.parquet(edges_path + "_tmp").write.mode("overwrite").parquet(
            edges_path
        )

    writer = stream.writeStream.foreachBatch(merge_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
