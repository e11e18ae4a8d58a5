"""Table profiling: per-column row/null/distinct counts — the
data-validation step a pipeline runs before and after every transform
(schema drift, null regressions, key-uniqueness checks).

No reference analog (the reference is a graph store); this extends
the curation family with the QA primitive.

Scale shape: ONE aggregation pass computes every column's metrics
(count + null count + distinct) — a single job whose output is one
row of 3 x n_columns values, collected driver-side (bounded by the
SCHEMA size, not the data — the namespace-registry class of collect).
``exact_distinct=False`` (default) uses HyperLogLog++ partial
aggregation — the bounded-state 100 TB tier; ``True`` switches to
exact ``count_distinct`` (Spark expands multiple distinct aggregates
into a union of plans — fine for validation-sized tables, and the
form a SQL oracle can replay exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """(column, dtype, n_rows, n_null, n_distinct) per column.

    ``n_distinct`` counts non-null distinct values (approximate via
    HLL++ unless ``exact_distinct``); ``n_null`` counts NULLs.
    Row order follows the schema.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"no such column(s): {missing}")
    distinct = F.count_distinct if exact_distinct else F.approx_count_distinct
    aggs: list = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(F.count(F.col(c)).alias(f"__nn{i}"))
        aggs.append(distinct(F.col(c)).alias(f"__nd{i}"))
    row = df.agg(*aggs).collect()[0]  # one row, 2n+1 values — bounded
    dtypes = dict(df.dtypes)
    out = [
        (
            c,
            dtypes[c],
            row["__n"],
            row["__n"] - row[f"__nn{i}"],
            row[f"__nd{i}"],
        )
        for i, c in enumerate(cols)
    ]
    schema = T.StructType(
        [
            T.StructField("column", T.StringType(), False),
            T.StructField("dtype", T.StringType(), False),
            T.StructField("n_rows", T.LongType(), False),
            T.StructField("n_null", T.LongType(), False),
            T.StructField("n_distinct", T.LongType(), False),
        ]
    )
    return df.sparkSession.createDataFrame(out, schema=schema)


def profile_diff(
    before: DataFrame,
    after: DataFrame,
    null_frac_tol: float = 0.01,
    distinct_rel_tol: float = 0.10,
) -> DataFrame:
    """Drift report between two ``profile_table`` outputs: one row
    per column with the before/after metrics and a ``drift`` flag —
    dtype changes, added/removed columns, null-fraction movement
    beyond ``null_frac_tol`` (absolute), or distinct-count movement
    beyond ``distinct_rel_tol`` (relative). The standard pre/post
    transform gate: fail the pipeline when ``drift`` is set on a
    column you did not mean to touch.

    Both inputs are profile frames (schema-bounded), so every join
    here is broadcast-trivial at any corpus size."""
    b = before.select(
        "column",
        F.col("dtype").alias("dtype_before"),
        F.col("n_rows").alias("rows_before"),
        F.col("n_null").alias("null_before"),
        F.col("n_distinct").alias("distinct_before"),
    )
    a = after.select(
        "column",
        F.col("dtype").alias("dtype_after"),
        F.col("n_rows").alias("rows_after"),
        F.col("n_null").alias("null_after"),
        F.col("n_distinct").alias("distinct_after"),
    )
    j = b.join(a, on="column", how="full_outer")
    nf_b = F.col("null_before") / F.nullif(F.col("rows_before"), F.lit(0))
    nf_a = F.col("null_after") / F.nullif(F.col("rows_after"), F.lit(0))
    rel = F.abs(F.col("distinct_after") - F.col("distinct_before")) / F.nullif(
        F.greatest("distinct_before", "distinct_after"), F.lit(0)
    )
    drift = (
        F.col("dtype_before").isNull()  # column added
        | F.col("dtype_after").isNull()  # column removed
        | (F.col("dtype_before") != F.col("dtype_after"))
        | (F.abs(F.coalesce(nf_a, F.lit(0.0)) - F.coalesce(nf_b, F.lit(0.0)))
           > null_frac_tol)
        | (F.coalesce(rel, F.lit(0.0)) > distinct_rel_tol)
    )
    return j.select(
        "column",
        "dtype_before",
        "dtype_after",
        "rows_before",
        "rows_after",
        "null_before",
        "null_after",
        "distinct_before",
        "distinct_after",
        drift.alias("drift"),
    )
