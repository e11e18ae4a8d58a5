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


def running_agg_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    value_col: str,
    window_rows: int | None = None,
) -> DataFrame:
    """Running / moving aggregates per group, ordered by
    ``order_cols``: cumulative sum and count plus a trailing-
    ``window_rows`` moving average (unbounded when None). One shuffle
    on the group key; the frame is evaluated in a single pass per
    partition. The analytic-window family the reference lacks
    entirely (SURVEY.md §2.6)."""
    ordering = [F.col(c).asc() for c in order_cols]
    base = Window.partitionBy(*group_cols).orderBy(*ordering)
    cum = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    if window_rows is None:
        mov = cum
    else:
        mov = base.rowsBetween(-(window_rows - 1), Window.currentRow)
    return (
        df.withColumn("running_sum", F.sum(F.col(value_col)).over(cum))
        .withColumn("running_n", F.count(F.lit(1)).over(cum).cast("long"))
        .withColumn("moving_avg", F.avg(F.col(value_col)).over(mov))
    )


def exact_quantiles_per_group(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    quantiles: list[float],
) -> DataFrame:
    """EXACT linear-interpolated quantiles per group
    (``F.percentile``, the SQL PERCENTILE_CONT semantics — not the
    sketch-based percentile_approx). Exactness makes the result
    oracle-comparable; the documented scale path for heavy groups is
    ``percentile_approx`` with the same call shape."""
    names = [f"p{round(q * 100):g}" for q in quantiles]
    if len(set(names)) != len(names):
        raise ValueError(
            f"quantiles collide at integer-percent column names: "
            f"{names} — use distinct whole-percent quantiles"
        )
    # round(), not int(): int truncates the IEEE product (0.29*100 =
    # 28.999... -> 'p28' holding the 29th percentile)
    aggs = [
        F.percentile(F.col(value_col), F.lit(q)).alias(n)
        for q, n in zip(quantiles, names)
    ]
    return df.groupBy(*group_cols).agg(*aggs)
