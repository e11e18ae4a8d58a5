"""Typed readers for the relational testdata tables.

The one interesting case: ``events.parquet`` stores
``TIMESTAMP(NANOS)`` which Spark's vectorized parquet reader rejects
outright (PARQUET_TYPE_ILLEGAL). We read nanos as raw longs
(``spark.sql.legacy.parquet.nanosAsLong``) and convert to a
microsecond TIMESTAMP column — lossy below 1µs, which is irrelevant
for second-granularity windowing/sessionization, and the ordering
tie-break risk only exists for events within the same microsecond.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table with ``ts`` as a proper TIMESTAMP column."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # timestamp → string formatting is session-tz-dependent; pin UTC so
    # results match the (naive-timestamp) oracle under ANY host session
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes)["ts"] == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long"))
        )
    return df
