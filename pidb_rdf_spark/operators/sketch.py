"""Distinct-count sketches.

Two tiers, per the repo's standing pattern (SCALE.md "tiers"):

- ``approx_distinct`` — Spark's native HyperLogLog++
  (``approx_count_distinct``): bounded mergeable state, map-side
  combinable, fully JVM-side. THE scale path for 100 TB cardinality
  estimation; its exact register contents are implementation-defined,
  so it is pinned by an error-bound test, not a value oracle.
- ``kmv_distinct`` — a K-Minimum-Values sketch built from
  deterministic md5-derived hashes, so every intermediate (the k
  smallest hash values, the threshold, the estimate) replays
  bit-for-bit in any engine — this is the ORACLE-CHECKABLE tier that
  proves the sketch algebra. Its per-group state here is the distinct
  hash set (same shuffle class as exact count-distinct); at scale one
  keeps only the k smallest per partition via a custom aggregate —
  the estimator and its guarantees are identical.

KMV estimator (Bar-Yossef et al. 2002): with h uniform on [0,1) and
h_k the k-th smallest distinct hash, E[h_k] ~ k/(n+1), so
n_hat = (k-1)/h_k; when fewer than k distinct hashes exist the count
of hashes IS the exact distinct count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pidb_rdf_spark.operators.hashing import md5_prefix_long

__all__ = ["approx_distinct", "kmv_distinct", "heavy_hitters"]

# 52 bits: the largest md5 prefix whose integer value is exact in a
# double, so hash/2^52 is an exact dyadic in [0,1) and every engine
# computes the identical estimate
_KMV_BITS_DIV = float(1 << 52)


def _unit_hash(col: Column) -> Column:
    """Deterministic uniform-[0,1) hash: first 52 bits of md5."""
    return md5_prefix_long(col, 52).cast("double") / F.lit(_KMV_BITS_DIV)


def kmv_distinct(
    df: DataFrame,
    col: str,
    k: int = 64,
    by: list[str] | None = None,
) -> DataFrame:
    """K-Minimum-Values distinct-count estimate per ``by`` group.

    Output: the ``by`` columns + ``n_hashes`` (min(k, distinct
    hashes seen) — the sketch size actually used) + ``distinct_est``
    (exact when the group has < k distinct values, else (k-1)/h_k,
    rounded to 4 decimals so the dyadic division replays identically
    everywhere).
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    by = by or []
    hashed = df.select(
        *by, _unit_hash(F.col(col)).alias("__h")
    ).dropDuplicates([*by, "__h"])
    grouped = hashed.groupBy(*by) if by else hashed.groupBy()
    mins = grouped.agg(
        F.slice(F.array_sort(F.collect_list("__h")), 1, k).alias("__mins")
    )
    n = F.size("__mins")
    est = F.when(
        n < k, n.cast("double")
    ).otherwise(F.lit(float(k - 1)) / F.element_at("__mins", k))
    return mins.select(
        *by,
        n.cast("long").alias("n_hashes"),
        F.round(est, 4).alias("distinct_est"),
    )


def approx_distinct(
    df: DataFrame,
    col: str,
    by: list[str] | None = None,
    rsd: float = 0.05,
) -> DataFrame:
    """HyperLogLog++ distinct count per ``by`` group (the 100 TB
    tier): bounded state, map-side partials, no Python. ``rsd`` is
    the target relative standard deviation."""
    by = by or []
    grouped = df.groupBy(*by) if by else df.groupBy()
    return grouped.agg(
        F.approx_count_distinct(col, rsd).alias("distinct_approx")
    )


def _cms_pairs(col: Column, width: int, depth: int) -> Column:
    """Per-row (d, bucket) pairs for every CMS row — bucket_d =
    md5(value ':' d) mod width, the Bloom positions' determinism
    contract (replays bit-for-bit in any engine with md5 + hex)."""
    return F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                (
                    md5_prefix_long(
                        F.concat(col.cast("string"), F.lit(f":{d}")), 52
                    )
                    % F.lit(width)
                ).alias("bucket"),
            )
            for d in range(depth)
        ]
    )


def cms_build(
    df: DataFrame, col: str, width: int = 1024, depth: int = 4
) -> DataFrame:
    """Count-Min sketch of a column's value frequencies: a
    (d, bucket, cnt) frame of at most depth x width rows — the
    mergeable bounded-memory frequency summary (union two sketches
    and re-sum to merge; state never grows with distinct values).

    Scale shape: one explode to depth rows per input row (all
    codegen), one map-side-combinable aggregation — the ONLY shuffle
    is sketch-sized. Estimates are upward-biased only (classic CMS
    guarantee: est >= true, est <= true + eps*N with prob 1-delta for
    width=e/eps, depth=ln(1/delta)), and because the bucket hashes
    are the deterministic md5 contract, even the over-estimates
    replay exactly in a SQL oracle. NULL values are not counted
    (and ``cms_query`` skips NULL probes) — a NULL bucket could
    never be matched by an equi-join probe."""
    if width < 2 or depth < 1:
        raise ValueError("need width >= 2 and depth >= 1")
    # NULL values are NOT counted: they would hash to NULL buckets
    # that no equi-join probe can ever match, silently breaking the
    # est >= true guarantee and leaving dead rows in the sketch.
    return (
        df.filter(F.col(col).isNotNull())
        .select(F.explode(_cms_pairs(F.col(col), width, depth)).alias("p"))
        .groupBy(F.col("p.d").alias("d"), F.col("p.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_query(
    sketch: DataFrame,
    probes: DataFrame,
    col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Frequency estimates for a probe set: (col, est) with
    est = min over rows d of sketch[d][bucket_d(value)], 0 when a
    bucket was never touched. The sketch side is sketch-sized —
    broadcast — so probing never reshuffles the corpus. width/depth
    must match the build call."""
    keyed = (
        probes.select(F.col(col))
        .filter(F.col(col).isNotNull())
        .dropDuplicates()
        .select(col, F.explode(_cms_pairs(F.col(col), width, depth)).alias("p"))
        .select(col, F.col("p.d").alias("d"), F.col("p.bucket").alias("bucket"))
    )
    return (
        keyed.join(F.broadcast(sketch), on=["d", "bucket"], how="left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def _mg_insert(sketch: dict, item, w: int, capacity: int) -> int:
    """Weighted Misra-Gries insert. Returns the mass discarded by
    decrements (0 when the item merged or a slot was free). Each
    decrement event subtracts d from every counter AND from the
    incoming weight — d*(capacity+1) total mass per event — so the
    summed discards are <= N/(capacity+1), the classic MG error
    bound, with at most two passes per insert (the first decrement
    frees a slot or exhausts w)."""
    discarded = 0
    while True:
        if item in sketch:
            sketch[item] += w
            return discarded
        if len(sketch) < capacity:
            sketch[item] = w
            return discarded
        d = min(min(sketch.values()), w)
        for key in list(sketch):
            nv = sketch[key] - d
            if nv:
                sketch[key] = nv
            else:
                del sketch[key]
        w -= d
        discarded += d * (capacity + 1)
        if not w:
            return discarded


def heavy_hitters(
    df: DataFrame, col: str, k: int = 10, capacity: int = 256
) -> DataFrame:
    """Exact global top-``k`` most frequent values of ``col``, found
    WITHOUT shuffling the full distinct-key space: a per-partition
    weighted Misra-Gries summary (bounded at ``capacity`` counters,
    Arrow-batched ``value_counts`` feeding the sketch) nominates
    candidates, then only the candidate rows are re-counted exactly.

    Output: (``col``, ``cnt`` exact count, ``guaranteed``) ordered by
    cnt DESC then value, LIMIT k. ``guaranteed`` is the a-priori MG
    bound ``cnt > N/(capacity+1)``: every value above that threshold
    provably survives some partition's sketch (pigeonhole over the
    per-partition bounds), so when ALL k output rows are guaranteed
    the top-k is provably the exact answer; below it the flag is
    conservative — the result is still exact whenever the candidate
    set covers the tail (always true when the column's distinct count
    is <= capacity). NULL values are not counted (the ``cms_build``
    convention).

    Scale shape (100 TB): pass 1 reads ONE column, keeps
    O(capacity) state per partition, and emits capacity+1 rows per
    partition — no shuffle; the sketch union is localCheckpointed so
    its two consumers (candidates, total-N) cost one upstream
    execution. Pass 2 re-reads the column, broadcast-semi-joins the
    tiny candidate set, and aggregates ONLY candidate rows — the
    shuffle carries at most capacity * n_partitions keys instead of
    every distinct value. The alternative (groupBy the raw column)
    shuffles the full key space, which at 100 TB of high-cardinality
    keys is the bottleneck this operator exists to avoid.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if capacity < k:
        raise ValueError("capacity must be >= k")
    src = df.select(F.col(col).alias("item")).filter(
        F.col("item").isNotNull()
    )
    item_type = src.schema["item"].dataType

    def mg_partition(batches):
        import pandas as pd

        sketch: dict = {}
        total = 0
        for pdf in batches:
            vc = pdf["item"].value_counts()
            total += int(vc.sum())
            for item, w in vc.items():
                _mg_insert(sketch, item, int(w), capacity)
        out = [(it, int(w)) for it, w in sketch.items()]
        out.append((None, total))  # the partition's row count
        yield pd.DataFrame(out, columns=["item", "w"])

    sk_schema = T.StructType(
        [
            T.StructField("item", item_type),
            T.StructField("w", T.LongType()),
        ]
    )
    # capacity+1 rows per partition; checkpoint so candidates and
    # total-N don't each re-run the scan
    sketches = src.mapInPandas(mg_partition, schema=sk_schema)
    sketches = sketches.localCheckpoint(eager=False)
    cand = sketches.filter(F.col("item").isNotNull()).select("item").distinct()
    total_n = sketches.filter(F.col("item").isNull()).agg(
        F.sum("w").alias("n")
    )
    exact = (
        src.join(F.broadcast(cand), on="item", how="left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(total_n))
        .withColumn(
            "guaranteed",
            F.col("cnt") > F.col("n") / F.lit(float(capacity + 1)),
        )
        .drop("n")
        .orderBy(F.col("cnt").desc(), F.col("item"))
        .limit(k)
        .withColumnRenamed("item", col)
    )
