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
