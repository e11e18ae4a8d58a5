"""Winnowing fingerprints + exact-substring duplicate detection.

The document-fingerprinting scheme of Schleimer/Wilkerson/Aiken
(SIGMOD 2003, the MOSS algorithm), the standard tool for "these two
documents share a literal substring" at corpus scale — the
span-level complement of MinHash (whole-doc resemblance) and line
dedup (line-exact): training-data work uses it to find long verbatim
overlaps (Lee et al. 2022 substring dedup) without an all-pairs
scan.

Guarantee: with k-gram hashes and window w, any shared substring of
length >= w + k - 1 produces at least one shared fingerprint
(every length-w window keeps its minimum, and a substring that long
contains a full window). Density ~ 2/(w+1) of positions.

Everything is deterministic md5-derived hashing and windowed minima,
so the whole pipeline replays in any SQL engine for the oracle (the
Arrow sliding-min kernel picks exactly what min(struct(hash, pos))
over a row window picks).

Scale shape: fingerprint selection is a shuffle-free per-doc map
(JVM md5 array + one vectorized sliding-min per Arrow batch); the
pair step shuffles only (hash, doc_id) fingerprint rows, and
``max_df`` drops boilerplate hashes seen in too many docs (the same
frequency-pruning idea as AllPairs prefix filtering) so a hot header
line cannot create a quadratic bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pidb_rdf_spark.operators.hashing import md5_prefix_long

__all__ = ["winnow_fingerprints", "substring_dup_pairs"]


def _seq1(n: Column) -> Column:
    """sequence(1, n), EMPTY when n < 1 — Spark's sequence() counts
    DOWN when stop < start ([1, 0] for n=0), so the guard is load-
    bearing for short/empty documents."""
    return F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )


def _kgram_hashes(text: Column, k: int) -> Column:
    """Array of 52-bit k-gram hashes at every position (1-based)."""
    return F.transform(
        _seq1(F.length(text) - F.lit(k - 1)),
        lambda i: md5_prefix_long(text.substr(i, F.lit(k)), 52),
    )


def winnow_fingerprints(
    df: DataFrame,
    k: int = 16,
    w: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Select winnowing fingerprints per document.

    Output: (id_col, pos, fp_hash) — ``pos`` is the 1-based character
    position of the chosen k-gram. Selection rule: in every window of
    ``w`` consecutive k-gram hashes keep the LEFTMOST minimum (any
    consistent tie rule preserves the guarantee; leftmost is what
    min(struct(hash, pos)) gives here and ``list_position`` gives in
    the SQL oracle).
    Documents shorter than w + k - 1 chars yield no fingerprints.
    """
    if k < 2 or w < 1:
        raise ValueError("require k >= 2 and w >= 1")
    import numpy as np
    import pandas as pd

    from pidb_rdf_spark.operators.layout import ensure_min_parallelism

    # The k-gram md5 array is built JVM-side exactly once per document
    # (an all-array formulation with slice() inside a transform()
    # lambda re-inlines the n-md5 array into every slice reference and
    # goes O(n^2) in md5 calls), then the window minima are ONE
    # vectorized sliding-min per Arrow batch — no posexplode, no
    # per-doc window sort, ZERO shuffle (the r7 shape exploded every
    # position and paid a full-corpus sort+shuffle to pick ~2/(w+1) of
    # them back out; isolated sf0.1 entry: 6.3 s → 2.0 s). argmin's
    # first-occurrence rule IS the leftmost-minimum tie rule the SQL
    # oracle replays via min(struct(hash, pos))/list_position.
    # Scale note: one row holds one doc's hash array — same per-doc
    # memory as the window partition it replaces; chunk pathological
    # multi-MB docs first (``chunk_documents``).
    id_type = df.schema[id_col].dataType.simpleString()

    def _select(batches):
        for pdf in batches:
            ids, poss, hs = [], [], []
            for doc_id, h in zip(pdf[id_col], pdf["__h"]):
                H = np.asarray(h, dtype=np.int64)
                n = len(H)
                if n < w:
                    continue
                Wv = np.lib.stride_tricks.sliding_window_view(H, w)
                pos = np.unique(
                    np.arange(n - w + 1, dtype=np.int64) + Wv.argmin(axis=1)
                )
                ids.append(np.full(len(pos), doc_id))
                poss.append(pos + 1)
                hs.append(H[pos])
            if ids:
                yield pd.DataFrame(
                    {
                        id_col: np.concatenate(ids),
                        "pos": np.concatenate(poss),
                        "fp_hash": np.concatenate(hs),
                    }
                )

    base = ensure_min_parallelism(
        df.filter(F.col(text_col).isNotNull()).select(
            F.col(id_col), F.col(text_col).alias("__text")
        )
    )
    return base.select(
        id_col, _kgram_hashes(F.col("__text"), k).alias("__h")
    ).mapInPandas(_select, f"{id_col} {id_type}, pos long, fp_hash long")


def substring_dup_pairs(
    df: DataFrame,
    k: int = 16,
    w: int = 8,
    min_shared: int = 2,
    max_df: int | None = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowing
    fingerprints — candidates for verbatim substring overlap of
    length >= w + k - 1.

    ``max_df`` drops fingerprint hashes present in more than that
    many documents before pairing (boilerplate guard: a hash shared
    by d docs creates d^2/2 pairs, so ubiquitous strings must not
    reach the self-join). Output: (a, b, n_shared) with a < b,
    counting DISTINCT shared hashes.
    """
    fps = (
        winnow_fingerprints(df, k=k, w=w, id_col=id_col, text_col=text_col)
        .select(F.col(id_col).alias("id"), "fp_hash")
        .dropDuplicates()
        # consumed up to 4x below (df-count agg, leftsemi probe, both
        # self-join sides) and Catalyst does not share common
        # subplans — without this the full per-doc window sort reruns
        # per consumer
        .localCheckpoint(eager=False)
    )
    if max_df is not None:
        keep = (
            fps.groupBy("fp_hash")
            .agg(F.countDistinct("id").alias("__df"))
            .filter(F.col("__df") <= max_df)
            .select("fp_hash")
        )
        fps = fps.join(keep, on="fp_hash", how="leftsemi")
    pairs = (
        fps.alias("x")
        .join(fps.alias("y"), on="fp_hash")
        .filter(F.col("x.id") < F.col("y.id"))
        .groupBy(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .agg(F.countDistinct("fp_hash").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return pairs
