"""Corpus curation operators: deterministic sampling and sequence
packing for training-data assembly.

No counterpart in the reference engine; these are the last-mile ops
between a cleaned corpus and a training run.

Determinism policy: no RNG state anywhere. Sampling decisions hash
document CONTENT KEYS (md5, the engine's cross-checkable hash family
— see dedup.py), so a sample is reproducible across runs, engines,
partitionings, and corpus growth (adding documents never flips the
decision for an existing one). That also makes every operator here
verifiable against a SQL oracle — an RNG-based `df.sample` is not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BUCKETS = 1 << 32  # md5-derived bucket space


def _hash_bucket(key: Column, salt: str) -> Column:
    """Uniform bucket in [0, 2^32) from md5(salt || key)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8), 16, 10
    ).cast("long")


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided per row by content-key hash
    — stable under reruns, repartitioning, and corpus growth. Narrow
    filter, zero shuffle; the predicate reaches the scan.

    Rows with a NULL sampling key are EXCLUDED at any fraction
    (including 1.0): the replayable-draw contract needs a key value,
    and silently hashing NULL would drop them anyway (md5(NULL) is
    NULL, which fails every threshold) — the exclusion is the stated
    behavior, not an accident. Filter or fill keys upstream if
    NULL-keyed rows must participate."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    thr = int(fraction * _BUCKETS)
    return df.filter(
        F.col(key_col).isNotNull()
        & (_hash_bucket(F.col(key_col), salt) < F.lit(thr))
    )


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict,
    default: float = 1.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum sampling rates (the standard language/domain
    rebalancing step): ``fractions`` maps stratum value -> keep rate;
    unlisted strata keep ``default``. Same hash-stable, zero-shuffle
    decision as ``hash_sample`` — including its NULL-key exclusion."""
    thr: Column = F.lit(int(default * _BUCKETS))
    for value, frac in sorted(fractions.items()):
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {value!r} must be in [0, 1]")
        thr = F.when(
            F.col(strata_col) == F.lit(value), F.lit(int(frac * _BUCKETS))
        ).otherwise(thr)
    return df.filter(
        F.col(key_col).isNotNull()
        & (_hash_bucket(F.col(key_col), salt) < thr)
    )


def pack_token_stream(
    df: DataFrame,
    id_col: str = "doc_id",
    token_count_col: str = "n_tokens",
    budget: int = 2048,
    n_shards: int = 1,
) -> DataFrame:
    """Concat-and-chunk sequence packing (GPT-style pretraining): docs
    are laid out contiguously in deterministic ``id`` order and the
    stream is cut into ``budget``-token chunks; a doc may span chunks.
    Returns per-doc placement:

    (id, shard, start_offset, end_offset, chunk_start, chunk_end).

    ``n_shards > 1`` partitions the stream by ``id % n_shards`` so the
    running offsets — the one inherently sequential step — parallelize
    per shard; everything else stays a narrow projection. At 100 TB,
    shard count ≈ executor count and each shard's window is one local
    sort, no global ordering bottleneck."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    shard = (F.col(id_col) % n_shards).cast("long")
    w = Window.partitionBy("shard").orderBy(F.col(id_col).asc())
    out = (
        df.select(
            F.col(id_col),
            shard.alias("shard"),
            F.col(token_count_col).cast("long").alias("__n"),
        )
        # zero/NULL-token docs occupy no stream space and get NO
        # placement row (keeping them would emit inverted chunk
        # ranges — chunk_end = floor((end-1)/budget) underflows when
        # __n = 0 — and NULL-count rows would carry NULL offsets)
        .filter(F.col("__n") > 0)
        .withColumn("end_offset", F.sum("__n").over(w))
        .withColumn("start_offset", F.col("end_offset") - F.col("__n"))
    )
    return out.select(
        id_col,
        "shard",
        "start_offset",
        "end_offset",
        F.floor(F.col("start_offset") / budget).cast("long").alias("chunk_start"),
        F.floor((F.col("end_offset") - 1) / budget).cast("long").alias("chunk_end"),
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """Snapshot diff between two corpus versions: one row per id that
    is ``added`` (only in ``new``), ``removed`` (only in ``old``) or
    ``changed`` (in both, content md5 differs) — the dataset-
    versioning primitive (audit what a crawl refresh actually did;
    feed ONLY added+changed docs to incremental dedup/index updates
    instead of reprocessing the corpus).

    Scale shape: both sides reduce to (id, md5) BEFORE the join —
    the shuffle carries two narrow columns, never the payloads — then
    one full-outer equi-join on the id; unchanged rows are filtered
    out. Content equality by md5, the engine's cross-checkable hash
    family (a 128-bit collision is below hardware-error rates).
    Presence comes from explicit per-side flags, NOT from hash
    nullness — md5(NULL) is NULL, so a doc whose content is NULL on
    one side would otherwise masquerade as absent and be
    misclassified added/removed instead of changed."""
    o = old.select(
        F.col(id_col).alias("id"),
        F.md5(F.col(content_col)).alias("__ho"),
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        F.col(id_col).alias("id"),
        F.md5(F.col(content_col)).alias("__hn"),
        F.lit(True).alias("__in_new"),
    )
    joined = o.join(n, on="id", how="full_outer")
    return (
        joined.withColumn(
            "change",
            F.when(F.col("__in_old").isNull(), F.lit("added"))
            .when(F.col("__in_new").isNull(), F.lit("removed"))
            .when(
                ~(F.col("__ho").eqNullSafe(F.col("__hn"))), F.lit("changed")
            ),
        )
        .filter(F.col("change").isNotNull())
        .select(F.col("id").alias(id_col), "change")
    )


def leakage_free_split(
    docs: DataFrame,
    dup_pairs: DataFrame,
    val_fraction: float = 0.1,
    id_col: str = "doc_id",
    a: str = "a",
    b: str = "b",
    salt: str = "split",
) -> DataFrame:
    """Train/validation split that cannot leak near-duplicates across
    the boundary: connected components over ``dup_pairs`` group
    transitive duplicates, and the WHOLE component goes to one side,
    decided by the md5 hash of its canonical (minimum) member id.
    Splitting docs i.i.d. instead silently places a near-copy of a
    validation document in train — the classic eval-inflation bug
    this operator exists to prevent.

    Returns every input column plus ``split_group`` (the component
    canonical) and ``split`` ('train' | 'val'). Deterministic and
    growth-stable the same way ``hash_sample`` is: adding documents
    never flips an existing component that keeps its canonical, and
    rerunning is byte-identical.

    Scale shape: components over the (sparse) verified pair set —
    LSH-sized, not corpus-sized — then ONE broadcast-friendly join of
    (id, group) back to the corpus; the split decision is a codegen
    hash filter. The corpus is scanned once and shuffled never."""
    if not 0.0 <= val_fraction <= 1.0:
        raise ValueError("val_fraction must be in [0, 1]")
    from pidb_rdf_spark.analytics import near_dup_clusters

    groups = near_dup_clusters(dup_pairs, a=a, b=b).withColumnsRenamed(
        {"id": id_col, "cluster": "split_group"}
    )
    thr = int(val_fraction * _BUCKETS)
    out = docs.join(groups, on=id_col, how="left").withColumn(
        "split_group", F.coalesce(F.col("split_group"), F.col(id_col))
    )
    return out.withColumn(
        "split",
        F.when(
            _hash_bucket(F.col("split_group"), salt) < F.lit(thr), "val"
        ).otherwise("train"),
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    n: int,
    salt: str = "wsample",
    by: str | None = None,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement of ``n`` rows, inclusion
    probability proportional to ``weight_col`` — the quality-weighted
    corpus-selection step (sample high-scoring documents harder
    without ever dropping the tail to zero).

    Efraimidis-Spirakis A-ES: each row draws an exponential key
    ``-ln(u)/w`` from a DETERMINISTIC md5 unit uniform u (the
    engine's cross-checkable hash family, salted), and the n SMALLEST
    keys win — provably equivalent to sequential weighted draws
    without replacement, yet stable under reruns, repartitioning and
    engine choice, so a SQL oracle replays the exact sample. Ties
    (and the rounding of the emitted score) break by key value.

    Rows with NULL or non-positive weight are excluded — they have no
    defined draw probability. Rows with a NULL key are excluded too
    (the deterministic draw needs a key value; left in, their NULL
    score would sort nulls-first and unconditionally win the sample —
    the same exclusion hash_sample documents).

    Output: (``key_col``, ``weight_col``, ``sample_score`` rounded to
    6 decimals), the n winners.

    With ``by``, the draw runs independently PER GROUP (n winners in
    each stratum — "sample 1000 docs per language, quality-weighted"),
    and the group column rides along in the output.

    Scale shape: one narrow projection (hash + ln, all JVM
    codegen), then a global top-n via ORDER BY + LIMIT — Spark
    executes that as TakeOrdered (per-partition heaps merged on the
    driver), so nothing shuffles and driver memory is O(n). The
    ``by`` form is one shuffle on the group key + a per-group
    row_number window (never driver-sized), the right tier when
    n x groups exceeds driver scale."""
    if n < 1:
        raise ValueError("n must be >= 1")
    from pidb_rdf_spark.operators.hashing import md5_prefix_long

    w = F.col(weight_col).cast("double")
    # (h+1)/(2^52+1): exact dyadic-ish rational in (0,1), never 0 —
    # ln is finite — and identical in any engine with md5 + conv
    u = (
        md5_prefix_long(
            F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string")), 52
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(float((1 << 52) + 1))
    score = -F.log(u) / w
    kept = df.filter(
        w.isNotNull() & (w > 0) & F.col(key_col).isNotNull()
    )
    if by is not None:
        ranked = kept.select(
            F.col(by),
            F.col(key_col),
            F.col(weight_col),
            F.round(score, 6).alias("sample_score"),
            F.row_number()
            .over(
                Window.partitionBy(by).orderBy(
                    F.round(score, 9), F.col(key_col)
                )
            )
            .alias("__rn"),
        )
        return ranked.filter(F.col("__rn") <= n).drop("__rn")
    return (
        kept.select(
            F.col(key_col),
            F.col(weight_col),
            F.round(score, 6).alias("sample_score"),
        )
        .orderBy(F.round(score, 9), F.col(key_col))
        .limit(n)
    )


def quantile_band_filter(
    df: DataFrame,
    value_col: str,
    by: str | None = None,
    lower: float = 0.05,
    upper: float = 0.95,
    approx: bool = False,
) -> DataFrame:
    """Keep rows whose ``value_col`` lies inside the per-group
    [``lower``, ``upper``] quantile band — the outlier-trimming
    curation step ("drop the shortest 5% and longest 5% of documents
    per language" before training). NULL values never pass, and —
    when ``by`` is given — neither do rows whose GROUP KEY is NULL
    (both tiers agree: an unknown group has no meaningful band).

    Two tiers, the repo's standing pattern:

    - exact (default): RANK-INTERVAL semantics over a per-group sort
      — a row whose values occupy ranks (#below, #below + #equal]
      covers the rank interval [#below/n, (#below+#equal)/n]; it is
      kept iff that interval INTERSECTS [lower, upper]. Ties share
      an interval, so equal values are kept or dropped together; a
      singleton group covers [0, 1] and is always kept, and a 2-row
      group keeps both rows under any band that touches each half —
      matching the approx tier, whose inclusive value-bound compare
      also keeps small groups (a plain ``percent_rank`` band instead
      assigns a singleton rank 0.0 and ERASES it under any
      lower > 0 — rare-language strata would silently vanish). The
      compare is integer-ratio arithmetic (rank counts / n), exact
      in any engine. With ``by=None`` this is ONE global sort — a
      single task holds the whole table, so it warns (the approx
      tier is the 100 TB path, exactly like the Cypher cartesian
      guard).
    - ``approx=True`` — THE 100 TB tier: one
      ``approx_percentile`` aggregate (bounded mergeable state,
      map-side combinable) computes per-group value bounds, which
      broadcast-join back as a codegen range filter. Two scans, no
      sort, no full-group shuffle; boundary rows within the sketch's
      rank error may differ from the exact tier (inclusive value
      comparison against the estimated bounds).
    """
    if not 0.0 <= lower <= upper <= 1.0:
        raise ValueError("need 0 <= lower <= upper <= 1")
    clash = {"__b", "__pr"} & set(df.columns)
    if clash:
        raise ValueError(f"df already has reserved column(s): {sorted(clash)}")
    v = F.col(value_col)
    if by is not None:
        # both tiers drop NULL-keyed rows identically (the approx
        # tier's inner join would drop them anyway; the exact tier's
        # window would otherwise band-filter the NULL group)
        df = df.filter(F.col(by).isNotNull())
    elif not approx:
        import warnings

        warnings.warn(
            "quantile_band_filter(by=None, approx=False) sorts the"
            " whole table in ONE task (global percent_rank); use"
            " approx=True at scale",
            stacklevel=2,
        )
    if approx:
        agg = F.percentile_approx(
            value_col, [float(lower), float(upper)], 10000
        ).alias("__b")
        if by is None:
            b = df.agg(agg)
            out = df.crossJoin(F.broadcast(b))
        else:
            b = df.groupBy(by).agg(agg)
            out = df.join(F.broadcast(b), on=by)
        return (
            out.filter(
                v.isNotNull()
                & (v >= F.col("__b")[0])
                & (v <= F.col("__b")[1])
            ).drop("__b")
        )
    w = (
        Window.partitionBy(by) if by is not None else Window.partitionBy()
    ).orderBy(v)
    wg = Window.partitionBy(by) if by is not None else Window.partitionBy()
    base = df.filter(v.isNotNull())
    # rank interval [#below/n, (#below+#equal)/n]: #below = rank()-1
    # (min rank among ties), upper end = cume_dist; keep on overlap
    n = F.count(F.lit(1)).over(wg).cast("double")
    lo_frac = (F.rank().over(w) - F.lit(1)).cast("double") / n
    hi_frac = F.cume_dist().over(w)
    return (
        base.withColumn("__pr", lo_frac)
        .withColumn("__b", hi_frac)
        .filter(
            (F.col("__pr") <= F.lit(float(upper)))
            & (F.col("__b") >= F.lit(float(lower)))
        )
        .drop("__pr", "__b")
    )
