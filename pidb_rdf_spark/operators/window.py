"""Window-function operators.

The reference's only windowed construct is the per-group limit:
``range(Scope.local, offset, offset+limit)`` emitted for grouped +
ordered SPARQL queries (``SparqlToGremlinCompiler.java:198-199``,
SURVEY.md §2.7 O3). Spark expresses it as a rank over a window —
one shuffle on the group key, no driver involvement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    offset: int = 0,
    ascending: bool = False,
    tie_break: list[str] | None = None,
) -> DataFrame:
    """Per-group LIMIT/OFFSET: rows ranked ``offset+1 .. offset+k``
    within each group by ``order_col``.

    ``tie_break`` columns make the ranking total (deterministic
    results — row_number over a non-total order is partition-order
    dependent, which breaks oracle comparison and repeatability)."""
    ordering = [
        F.col(order_col).asc() if ascending else F.col(order_col).desc()
    ] + [F.col(c).asc() for c in (tie_break or [])]
    w = Window.partitionBy(*group_cols).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") > offset) & (F.col("__rn") <= offset + k))
        .drop("__rn")
    )
