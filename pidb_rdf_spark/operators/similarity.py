"""Similarity search over an embedding column (array<float>).

Scale extension (no counterpart in the reference engine — its
nearest concept is index-backed equality seek,
``neo4j/Neo4jGraphAPIImpl.java:89-91``).

Three tiers, one column contract (id: long, vec: array<float>):

- **brute-force cosine top-k** — the exact baseline. Query set is
  broadcast (it is small by construction); the corpus streams
  through one scan; per-partition partial top-k then a final merge.
- **IVF (inverted-file) search** — k-means-partitioned corpus; a
  query probes only ``nprobe`` nearest centroids. With
  ``nprobe == n_clusters`` it degrades to exact brute force (how the
  correctness oracle validates the plumbing); with small nprobe it
  reads ~nprobe/n_clusters of the corpus — the 100 TB path, where
  cluster id becomes a partition/bucket column and probing =
  partition pruning.
- **random-hyperplane LSH bucketing** — sign-bit signature restricts
  candidate pairs to same-bucket vectors (used by
  dedup.embedding_near_dup_pairs).

All dot products are JVM-side array folds (zip_with + aggregate in
double precision) — no Python in the hot path; a Pandas-UDF BLAS
variant is a drop-in swap where numpy throughput wins at very high
dimensions.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a left-to-right double fold (deterministic,
    bit-reproducible summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def with_norm(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return df.withColumn("norm", F.sqrt(_dot(F.col(vec_col), F.col(vec_col))))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors by cosine for each query vector.

    Output: (query_id, rank, neighbor_id) — rank 1..k, ties broken
    by neighbor id (total order ⇒ deterministic, oracle-comparable).
    The query side is broadcast; ranking is TWO-PHASE top-k, the
    shape the module docstring promises: a bounded per-Arrow-batch
    selection keeps at most k candidates per (batch, query) — any
    global top-k row is top-k within its batch — so the final exact
    window ranks ≤ k·batches·queries rows instead of pulling EVERY
    scored (query, candidate) row of a query into one window task
    (the single-partition-per-query sort that breaks at corpus
    scale). Zero-norm vectors have no cosine direction: zero-norm
    CANDIDATES are excluded, a zero-norm QUERY returns no rows
    (otherwise division by the zero norm product would rank garbage
    — or raise under ANSI)."""
    c = with_norm(corpus, id_col, vec_col).select(
        F.col(id_col).alias("_nid"), F.col(vec_col).alias("_nvec"), F.col("norm").alias("_nnorm")
    )
    q = with_norm(queries, query_id_col, vec_col).select(
        F.col(query_id_col).alias("_qid"), F.col(vec_col).alias("_qvec"), F.col("norm").alias("_qnorm")
    )
    prod = F.col("_qnorm") * F.col("_nnorm")
    scored = (
        c.join(F.broadcast(q), F.col("_nid") != F.col("_qid"))
        .withColumn(
            "cosine",
            F.when(
                prod != 0,
                _dot(F.col("_qvec"), F.col("_nvec")) / prod,
            ),
        )
        .filter(F.col("cosine").isNotNull())
        .select("_qid", "_nid", "cosine")
    )
    qt = queries.schema[query_id_col].dataType.simpleString()
    nt = corpus.schema[id_col].dataType.simpleString()

    def _batch_topk(batches):
        for pdf in batches:
            if len(pdf):
                yield (
                    pdf.sort_values(
                        ["_qid", "cosine", "_nid"],
                        ascending=[True, False, True],
                    )
                    .groupby("_qid", sort=False)
                    .head(k)
                )

    part = scored.mapInPandas(
        _batch_topk, f"_qid {qt}, _nid {nt}, cosine double"
    )
    w = Window.partitionBy("_qid").orderBy(F.col("cosine").desc(), F.col("_nid").asc())
    return (
        part.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias("query_id"),
            F.col("rank"),
            F.col("_nid").alias("neighbor_id"),
        )
    )


# ---------------------------------------------------------------------------
# random-hyperplane LSH
# ---------------------------------------------------------------------------


def _hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes: components
    derived from md5(plane, coord) mapped to [-1, 1]. No RNG state —
    reproducible across sessions and engines."""
    planes = []
    for p in range(n_planes):
        row = []
        for i in range(dim):
            hv = int.from_bytes(
                hashlib.md5(f"plane{p}:{i}".encode()).digest()[:8], "big"
            )
            row.append((hv / float(1 << 63)) - 1.0)
        planes.append(row)
    return planes


def with_hyperplane_bucket(
    df: DataFrame, vec_col: str, n_planes: int = 8, dim: int | None = None
) -> DataFrame:
    """Sign-bit signature over ``n_planes`` fixed hyperplanes →
    integer ``bucket`` column. Narrow projection, zero shuffle; at
    scale write the table bucketed/partitioned by this column.

    Pass ``dim`` when known — deriving it costs a 1-row probe job."""
    if dim is None:
        probe = df.select(vec_col).first()
        if probe is None or probe[0] is None:
            raise ValueError(
                "with_hyperplane_bucket: cannot derive the vector "
                "dimension from an empty frame / NULL first vector — "
                "pass dim explicitly"
            )
        dim = len(probe[0])
    planes = _hyperplanes(dim, n_planes)
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        proj = _dot(F.col(vec_col), F.array(*[F.lit(v) for v in plane]))
        bucket = bucket + F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return df.withColumn("bucket", bucket)


def with_hyperplane_buckets(
    df: DataFrame, vec_col: str, n_planes: int = 4, n_tables: int = 8
) -> DataFrame:
    """OR-amplified LSH: ``n_tables`` independent ``n_planes``-bit
    signatures, exploded to one (table, bucket) row per table. A pair
    is a candidate if it collides in ANY table — recall
    1-(1-p^k)^L vs a single table's p^k — and an exact verification
    step downstream keeps precision at 1. Vectorized Pandas UDF (one
    matmul against all L·k planes per Arrow batch).

    The plane matrix is derived from the batch's own vector length
    inside the UDF (deterministic seed → identical planes on every
    executor), so no driver-side probe job is needed.

    PLAN-SHAPE CONTRACT: the bucket UDF is marked
    ``asNondeterministic()`` purely to stop the optimizer duplicating
    it below pushed filters (guide §4.4) — the function itself is
    pure. Because nondeterministic expressions constrain where
    Catalyst may place them, callers that reuse this output on
    multiple plan branches (self-joins, repeated aggregates) MUST
    materialize it first (``localCheckpoint``), as
    ``embedding_near_dup_pairs`` does; joining or aggregating the raw
    frame on bucket columns across branches may change plan shape or
    be rejected where nondeterministic expressions are disallowed."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    weights = (1 << np.arange(n_planes)).astype(np.int64)
    plane_cache: dict = {}

    def buckets(v):
        if len(v) == 0:
            return pd.Series([], dtype=object)
        M = np.array(list(v), dtype=np.float64)
        dim = M.shape[1]
        P = plane_cache.get(dim)
        if P is None:
            P = np.array(_hyperplanes(dim, n_planes * n_tables), dtype=np.float64)
            plane_cache[dim] = P
        bits = (M @ P.T > 0).astype(np.int64)  # (n, L*k)
        per_table = bits.reshape(len(M), n_tables, n_planes) @ weights  # (n, L)
        return pd.Series(list(per_table))

    buckets.__annotations__ = {"v": pd.Series, "return": pd.Series}
    # asNondeterministic (guide §4.4): the downstream posexplode makes
    # Catalyst infer a `size(__bkts)>0 AND isnotnull(__bkts)` filter on
    # the UDF column, which it then pushes below any repartition and
    # satisfies by RE-EVALUATING the UDF there — one full extra pass
    # over the corpus, single-threaded when the pre-repartition scan is
    # one file (measured: a 4.7 s 1-task stage inside a 7.3 s query at
    # sf0.1). The function itself is pure (md5-seeded planes), so
    # blocking the optimizer from duplicating it cannot change results.
    buckets_udf = pandas_udf(buckets, "array<long>").asNondeterministic()
    return (
        df.withColumn("__bkts", buckets_udf(F.col(vec_col)))
        .select("*", F.posexplode("__bkts").alias("table", "bucket"))
        .drop("__bkts")
    )


# ---------------------------------------------------------------------------
# IVF (inverted file) index
# ---------------------------------------------------------------------------


def make_dot_udf():
    """The Arrow-batched row-wise dot kernel (one einsum per batch)
    shared by every cosine-verify path — ivf_search, the SemDeDup
    pair verify, the hyperplane-LSH verify, and the semantic index
    probe all score candidates through this one definition so a
    numerical change cannot silently diverge between them (their SQL
    oracles replay the same float64 math)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _dot_batch(x, y):
        X = np.array(list(x), dtype=np.float64)
        Y = np.array(list(y), dtype=np.float64)
        return pd.Series(np.einsum("ij,ij->i", X, Y))

    _dot_batch.__annotations__ = {
        "x": pd.Series, "y": pd.Series, "return": pd.Series,
    }
    return pandas_udf(_dot_batch, "double")


def make_probe_udf(centroids: list[list[float]], nprobe: int):
    """``array<int>`` of each vector's ``nprobe`` nearest centroids:
    squared-L2 expansion + STABLE argsort, i.e. distance-then-
    cluster-id tie-break — the single definition of the probe order
    that ``_ivf_probe_sql``-style oracles replay
    (``ORDER BY list_distance(...), cl``). Shared by ``ivf_search``
    and ``dedup.semantic_query_index``; a tie-break change in one
    place cannot strand the other."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.array(centroids, dtype=np.float64)
    k_probe = min(nprobe, len(centroids))

    def probe_list(v):
        M = np.array(list(v), dtype=np.float64)
        d2 = (
            (M * M).sum(1, keepdims=True)
            - 2.0 * (M @ C.T)
            + (C * C).sum(1)[None, :]
        )
        order = np.argsort(d2, axis=1, kind="stable")[:, :k_probe]
        return pd.Series(list(order))

    probe_list.__annotations__ = {"v": pd.Series, "return": pd.Series}
    # pure function; the marking only stops the optimizer duplicating
    # the kernel below pushed filters (guide §4.4 — same plan-shape
    # contract as with_hyperplane_buckets, r14)
    return pandas_udf(probe_list, "array<int>").asNondeterministic()


def kmeans_centroids(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 8,
    iters: int = 5,
    max_train: int = 100_000,
) -> list[list[float]]:
    """Deterministic Lloyd's k-means, trained on the driver over a
    bounded sample. Init = vectors of the ``n_clusters`` lowest ids
    (fixed, seedless); training set = the ``max_train`` lowest ids.

    Why driver-side: centroid TRAINING is O(sample × dim × clusters)
    — at any corpus scale one trains on a sample (the centroids are
    k × dim floats; more data past ~100k rows moves them
    negligibly), while ASSIGNMENT of the full corpus stays
    distributed (``assign_clusters``). The previous in-cluster
    training loop spent ~1 s of job overhead per iteration moving
    kilobytes; the dense loop is milliseconds for the same result."""
    import numpy as np

    rows = (
        df.orderBy(F.col(id_col).asc())
        .limit(max_train)
        .select(vec_col)
        .collect()
    )
    if not rows:
        raise ValueError(
            "kmeans_centroids: empty training input (the numpy kernel "
            "would fail with a cryptic axis error)"
        )
    M = np.array([r[0] for r in rows], dtype=np.float64)
    return lloyd_numpy(M, n_clusters, iters)


def lloyd_numpy(M, n_clusters: int, iters: int) -> list[list[float]]:
    """The driver-side Lloyd's kernel shared by ``kmeans_centroids``
    and ``quantize.pq_train`` (which slices ONE collected training
    matrix into subspaces rather than re-collecting per subspace).
    Init = first ``n_clusters`` rows; ties -> first minimum, same
    argmin convention as ``assign_clusters``. A training matrix with
    fewer than ``n_clusters`` rows returns that many centroids (the
    slice is short) — callers see a smaller codebook, not a crash."""
    C = M[:n_clusters].copy()
    for _ in range(iters):
        d2 = (
            (M * M).sum(1, keepdims=True)
            - 2.0 * (M @ C.T)
            + (C * C).sum(1)[None, :]
        )
        a = d2.argmin(1)
        for c in range(n_clusters):
            members = M[a == c]
            if len(members):
                C[c] = members.mean(axis=0)
    return [[float(x) for x in row] for row in C]


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment: vectorized Arrow-batched Pandas
    UDF over the (tiny, closure-captured) centroid matrix — no
    shuffle. Squared L2; ties go to the lower cluster index
    (``argmin`` returns the first minimum). A pure-expression
    when-chain fold works too but its codegen grows with
    clusters × dim and dominates wall time on wide centroids."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.array(centroids, dtype=np.float64)

    def nearest(v):
        M = np.array(list(v), dtype=np.float64)
        # ||x-c||² = ||x||² - 2x·c + ||c||²; argmin over c
        d2 = (
            (M * M).sum(1, keepdims=True)
            - 2.0 * (M @ C.T)
            + (C * C).sum(1)[None, :]
        )
        return pd.Series(d2.argmin(1))

    # real (non-stringified) annotations — `from __future__ import
    # annotations` would otherwise break pandas_udf type inference
    nearest.__annotations__ = {"v": pd.Series, "return": pd.Series}
    # pure; asNondeterministic blocks §4.4 duplicate evaluation below
    # pushed filters (Catalyst infers isnotnull(cluster) from the IVF
    # probe join and re-ran the kernel under it — 8 ArrowEvalPython
    # for the ann composite, 4 after)
    nearest_udf = pandas_udf(nearest, "int").asNondeterministic()
    return df.withColumn("cluster", nearest_udf(F.col(vec_col)))


def ivf_search(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF top-k: corpus rows carry their cluster id; each query
    probes its ``nprobe`` nearest centroids and ranks only vectors
    in those clusters. At scale the corpus is written partitioned by
    ``cluster`` so the probe is partition pruning, and the
    (query × probed-cluster) join is a broadcast.

    ``nprobe >= len(centroids)`` ⇒ exact (== cosine_topk).

    ``assigned``: optionally the precomputed
    ``assign_clusters(corpus, centroids)`` frame — callers running
    several searches over one corpus (the ANN composite) materialize
    the assignment once and share it, instead of paying one
    full-corpus Arrow kernel pass per search (r14, guide §1.2/§8:
    don't compute things twice).
    """
    if assigned is None:
        assigned = assign_clusters(corpus, centroids, id_col, vec_col)

    # query → nprobe nearest centroids, as an exploded (query, cluster) map
    probe_udf = make_probe_udf(centroids, nprobe)
    qprobe = queries.withColumn("cluster", F.explode(probe_udf(F.col(vec_col))))

    c = with_norm(assigned, id_col, vec_col).select(
        "cluster",
        F.col(id_col).alias("_nid"),
        F.col(vec_col).alias("_nvec"),
        F.col("norm").alias("_nnorm"),
    )
    q = with_norm(qprobe, query_id_col, vec_col).select(
        "cluster",
        F.col(query_id_col).alias("_qid"),
        F.col(vec_col).alias("_qvec"),
        F.col("norm").alias("_qnorm"),
    )
    dot_udf = make_dot_udf()
    # zero-norm vectors have no cosine direction: guard the division
    # (NULL instead of garbage / an ANSI DivideByZero) and drop the
    # unrankable rows — cosine_topk's contract
    _prod = F.col("_qnorm") * F.col("_nnorm")
    scored = (
        c.join(F.broadcast(q), on="cluster")
        .filter(F.col("_nid") != F.col("_qid"))
        .withColumn(
            "cosine",
            F.when(
                _prod != 0,
                dot_udf(F.col("_qvec"), F.col("_nvec")) / _prod,
            ),
        )
        .filter(F.col("cosine").isNotNull())
    )
    w = Window.partitionBy("_qid").orderBy(F.col("cosine").desc(), F.col("_nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias("query_id"),
            F.col("rank"),
            F.col("_nid").alias("neighbor_id"),
        )
    )


# ---------------------------------------------------------------------------
# IVF index persistence: cluster-partitioned store -> probes are
# partition pruning at the parquet scan
# ---------------------------------------------------------------------------


def save_ivf_index(
    corpus: DataFrame,
    path: str,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assigned: DataFrame | None = None,
) -> None:
    """Write the corpus partitioned by its IVF cluster + a centroid
    sidecar. A probe then reads ONLY the probed clusters' partitions
    (static partition pruning, pinned by plan test) — at 100 TB this
    is the difference between scanning nprobe/n_clusters of the data
    and all of it. ``assigned``: see :func:`ivf_search`."""
    import json
    import os

    if assigned is None:
        assigned = assign_clusters(corpus, centroids, id_col, vec_col)
    assigned.write.mode("overwrite").partitionBy("cluster").parquet(
        os.path.join(path, "vectors")
    )
    with open(os.path.join(path, "centroids.json"), "w") as f:
        json.dump(centroids, f)


def load_ivf_index(spark, path: str):
    """(vectors DataFrame with ``cluster`` partition column, centroid
    list) from a ``save_ivf_index`` store."""
    import json
    import os

    with open(os.path.join(path, "centroids.json")) as f:
        centroids = json.load(f)
    return spark.read.parquet(os.path.join(path, "vectors")), centroids


def ivf_search_indexed(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    max_queries: int = 100_000,
) -> DataFrame:
    """IVF top-k against a saved index. The union of probed clusters
    over all queries is collected driver-side (bounded by n_clusters,
    never by data) and applied as a static ``cluster IN (...)`` filter
    so the scan prunes unprobed partitions before the per-query join
    narrows further.

    ``max_queries``: the QUERY VECTORS are collected driver-side to
    compute the probe set — right for point/batch lookups, wrong for
    corpus-sized query sets; past the cap the call fails fast (the
    ``embedding_near_dup_pairs`` limit-probe idiom) and points at
    :func:`ivf_search` over the loaded vectors, whose probe assignment
    stays distributed."""
    import numpy as np

    corpus, centroids = load_ivf_index(spark, path)
    C = np.array(centroids, dtype=np.float64)
    nprobe = min(nprobe, len(centroids))
    probe_n = queries.select(query_id_col).limit(max_queries + 1).count()
    if probe_n > max_queries:
        raise ValueError(
            f"ivf_search_indexed collects the query vectors to the "
            f"driver to build the static partition-pruning filter; "
            f"input exceeds max_queries={max_queries} rows — for "
            f"corpus-sized query sets call ivf_search(corpus, queries, "
            f"centroids) on the loaded index, which keeps probe "
            f"assignment distributed"
        )
    qrows = [r[0] for r in queries.select(vec_col).collect()]
    if not qrows:
        # no queries probe nothing — return the typed empty result
        # rather than letting numpy fail on a shape-(0,) matrix
        qt = queries.schema[query_id_col].dataType.simpleString()
        it = corpus.schema[id_col].dataType.simpleString()
        return spark.createDataFrame(
            [], f"query_id {qt}, rank int, neighbor_id {it}"
        )
    qv = np.array(qrows, dtype=np.float64)
    d2 = (
        (qv * qv).sum(1, keepdims=True) - 2.0 * (qv @ C.T) + (C * C).sum(1)[None, :]
    )
    probed = sorted(
        {int(c) for row in np.argsort(d2, axis=1, kind="stable")[:, :nprobe] for c in row}
    )
    pruned = corpus.filter(F.col("cluster").isin(probed))
    # hand ivf_search the pruned subset WITHOUT the stored cluster
    # column: assignment is deterministic, so re-deriving it on the
    # pruned rows is identical — and ivf_search's own code path stays
    # byte-for-byte shared with the in-memory entries
    return ivf_search(
        pruned.drop("cluster"), queries, centroids, k=k, nprobe=nprobe,
        id_col=id_col, vec_col=vec_col, query_id_col=query_id_col,
    )
