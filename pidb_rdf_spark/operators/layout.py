"""Storage-layout operators: Z-order (Morton) clustering for
multi-column data skipping.

No reference analog (the reference's layout is its native store);
this is the warehouse-side step that makes 100 TB scans cheap: sort
by an interleaved-bit key and parquet row-group min/max stats become
tight on EVERY participating column at once, so selective filters on
any of them prune row groups at the scan (the Delta/Iceberg OPTIMIZE
ZORDER BY idea, expressed as plain DataFrame ops).

Scale shape: the key is pure codegen bit math (the classic
spread-bits magic-mask sequence — 5 shift/mask ops per column, no
Python, no UDF); the layout write is ONE range repartition on the
key + a per-partition local sort. Range boundaries come from Spark's
built-in reservoir sampling of the key column (the same mechanism
every ORDER BY uses), so there is no driver-side histogram to build.

Determinism: the interleave is exact integer math on the raw column
values — replayable bit-for-bit in any engine with 64-bit shifts,
which is what lets the SQL oracle check the key itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# magic masks that spread a 32-bit value's bits to even positions of
# a 64-bit lane: x = abcd -> a0b0c0d0 (Morton encoding building block)
_SPREAD_MASKS = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def ensure_min_parallelism(df: DataFrame) -> DataFrame:
    """Round-robin ``df`` up to the core count IF its current plan
    carries fewer partitions — the small-input parallelism gate for
    shuffle-free CPU-bound map stages (vectorized shingle/signature/
    bucket kernels).

    Without a shuffle upstream, such a stage inherits the scan's
    partitioning; a tiny input (one parquet file) would run the whole
    kernel on one or two threads (measured 2-3× end-to-end at sf0.1
    for both the MinHash and hyperplane-LSH pipelines). A real corpus
    scan already carries far more partitions than cores, so at scale
    the gate never fires and the caller's zero-shuffle plan survives
    verbatim; when it does fire, the input is by construction small
    enough that the repartition is noise."""
    cores = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < cores:
        return df.repartition(cores)
    return df


def spread_bits(col: Column) -> Column:
    """Spread the low 32 bits of ``col`` to the even bit positions of
    a 64-bit value (0babcd -> 0b0a0b0c0d): five shift+mask rounds,
    all whole-stage codegen."""
    x = col.cast("long").bitwiseAND(F.lit(0xFFFFFFFF))
    for sh, mask in _SPREAD_MASKS:
        x = (x.bitwiseOR(F.shiftleft(x, sh))).bitwiseAND(F.lit(mask))
    return x


def zorder_key(cols: list[Column | str]) -> Column:
    """64-bit Z-order (Morton) key interleaving the low 32 bits of
    two columns, or the low 21 bits of three (3x21=63). Columns must
    be non-negative integers in range (cast/normalize first — e.g.
    ``xxhash64 & mask`` for strings, epoch seconds for timestamps);
    out-of-range bits are masked off, never an error."""
    cols = [F.col(c) if isinstance(c, str) else c for c in cols]
    if len(cols) == 2:
        a, b = (c.cast("long") for c in cols)
        return spread_bits(a).bitwiseOR(F.shiftleft(spread_bits(b), 1))
    if len(cols) == 3:
        out = F.lit(0).cast("long")
        for idx, c in enumerate(cols):
            x = c.cast("long").bitwiseAND(F.lit((1 << 21) - 1))
            # 21-bit spread to every 3rd position: plain per-bit OR
            # chain (63 codegen ops — constant, still JVM-side)
            sp = F.lit(0).cast("long")
            for bit in range(21):
                sp = sp.bitwiseOR(
                    F.shiftleft(
                        F.shiftright(x, bit).bitwiseAND(F.lit(1)),
                        bit * 3,
                    )
                )
            out = out.bitwiseOR(F.shiftleft(sp, idx))
        return out
    raise ValueError("zorder_key takes exactly 2 or 3 columns")


def zorder_layout(
    df: DataFrame, cols: list[str], n_files: int = 64
) -> DataFrame:
    """Cluster ``df`` for multi-column data skipping: add ``__z`` =
    the Morton key, range-partition into ``n_files`` output chunks
    and sort within each — writing the result gives parquet files
    whose min/max stats are tight on every ``cols`` member. ONE
    shuffle (the range exchange); the local sort never spills past a
    file's worth of rows."""
    if n_files < 1:
        raise ValueError("n_files must be >= 1")
    keyed = df.withColumn("__z", zorder_key(cols))
    return keyed.repartitionByRange(n_files, "__z").sortWithinPartitions("__z")


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 64,
    mode: str = "overwrite",
    sort: bool = True,
) -> None:
    """Persist ``df`` as a parquet table hash-bucketed (and by
    default sorted) by ``key`` — the co-located-join layout: two
    tables bucketed by the same key into the same bucket count join
    WITHOUT ANY EXCHANGE, because matching keys are already in
    matching files. At 100 TB this converts every recurring
    fact-to-fact join on the bucket key from the cluster's biggest
    shuffle into a zero-movement zip of file pairs (the classic
    warehouse trick Spark exposes via ``bucketBy`` + the session
    catalog; on a real cluster the metastore makes the layout
    permanent). ``sort=True`` additionally enables sort-merge joins
    with no Sort node.

    ``n_buckets`` bounds join parallelism — size it to the target
    cluster (buckets >= executors) at write time."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def count_exchanges(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the final physical
    plan — the plan-shape metric the bucketing layout exists to drive
    to zero (and a cheap regression probe for any operator's claimed
    shuffle count). Under AQE the captured QueryExecution must be
    EXECUTED to finalize: ``qe.toRdd().count()`` runs THIS
    QueryExecution's physical plan and flips ``isFinalPlan=true`` on
    it, whereas ``df.count()`` builds a NEW QueryExecution and leaves
    the inspected one at its initial (pre-AQE-replan) shape — the
    exchange count would then reflect a plan that never ran. The RDD
    count stays JVM-side (no rows reach the driver), so probing a
    corpus-scale frame is safe where ``df.collect()`` would OOM."""
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    if "AdaptiveSparkPlan isFinalPlan=false" in plan:
        qe.toRdd().count()  # executes THIS QueryExecution, JVM-side
        plan = qe.executedPlan().toString()
        assert "isFinalPlan=false" not in plan, "AQE plan not finalized"
    import re as _re

    return len(_re.findall(r"\bExchange\b|\bShuffleExchange", plan))
