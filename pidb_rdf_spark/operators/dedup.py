"""Deduplication operators: exact, MinHash+LSH, SimHash, exact
n-gram Jaccard, and embedding-cosine near-dup.

The reference engine's only dedup is edge dedup-on-insert
(``semantics/DirectStatementLoader.java:281-305``) and Gremlin
``dedup()`` (SURVEY.md §2.5 A6). Document-level near-dup detection is
the scale extension a 100 TB training-data pipeline needs.

Scale design (r10 shapes):
- **exact_dedup**: one hash-aggregate shuffle on the content key.
- **MinHash+LSH**: the linear-time path. Each doc's hashed shingle
  SET is built as one array column in place (``shingle_hash_sets`` —
  no explode, ZERO shuffle) and feeds the vectorized signature
  kernel directly; banding turns the quadratic all-pairs problem
  into equi-joins on (band, band_hash) buckets — only same-bucket
  docs are compared, and the banding join + its distinct are the
  only shuffles in the pipeline. Candidates are then verified with
  the exact Jaccard intersect over the same pinned set arrays, so
  the output equals the exact all-pairs answer with probability ~1
  at the configured (bands, rows) operating point (b=32, r=4 ⇒
  P[detect s≥0.8] > 1-5e-8) while never materializing O(n²) pairs.
- **SimHash**: per-doc distinct-bigram md5 array built in place
  (no explode, zero shuffle) + one Arrow vote kernel; Hamming-≤k
  pairs found by pigeonhole banding: split the signature into k+1
  chunks; any pair within distance k must agree on ≥1 chunk, so
  candidates come from equi-joins on chunk values — exact recall,
  no n² scan.
- **embedding near-dup**: cosine threshold pairs with optional
  random-hyperplane bucketing (see similarity.py) for the n² cut.

NULL-text rows are EXCLUDED by the set builders (deliberate r10
change: the earlier exploded pipelines emitted a NULL-shingle row
per NULL doc, so two contentless docs scored Jaccard 1.0 against
each other — a meaningless match; absent content now produces no
signature and no pairs, matching exact_dedup's content-key
semantics).

Determinism: the operators verified against SQL oracles hash with
md5 (first hex chars → int) — reproducible in any engine. The
MinHash BASE hash is the one exception: it is xxhash64 (faster,
native), safe because LSH output is exact-Jaccard-VERIFIED, so no
oracle ever needs to replay the base hash itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# the shared md5-prefix idiom lives in operators.hashing so Bloom/KMV/
# winnowing and these dedup hashes stay consistent with the oracles
from pidb_rdf_spark.operators.hashing import md5_prefix_long as _md5_hash
from pidb_rdf_spark.operators.text import tokens

MERSENNE31 = 2147483647  # 2^31 - 1 (prime), universal-hash modulus


def _md5_32(col: Column) -> Column:
    return _md5_hash(col, 32)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", content_cols: list[str] | None = None
) -> DataFrame:
    """Exact dedup by content hash: keep the lowest id per identical
    content, report group size. One hash-aggregate shuffle; at scale,
    group on ``md5(content)`` instead of raw content to shrink
    shuffle rows to 16 bytes + id."""
    content_cols = content_cols or ["text"]
    return (
        df.groupBy(*content_cols)
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").cast("long").alias("group_size"),
        )
        .select("keep_id", "group_size")
    )


# ---------------------------------------------------------------------------
# shingling + exact n-gram Jaccard (the verification / oracle baseline)
# ---------------------------------------------------------------------------


def _shingle_array(text_col: str, k: int):
    """Column expr: the distinct character-k-gram set of ``text_col``
    as one array, built JVM-side (transform over a sequence)."""
    return F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(length({text_col})-{k - 1}, 1)),"
            f" i -> substring({text_col}, i, {k}))"
        )
    )


def shingle_hash_sets(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 8
) -> DataFrame:
    """(id, harr array<long>, n_sh): each doc's distinct-shingle set
    hashed to xxhash64 longs, built entirely JVM-side with NO explode
    and NO shuffle — one narrow map over the doc table.

    THE shingle representation — every consumer (MinHash signatures,
    PPJoin prefix ranks via a cheap explode, Jaccard verify, the
    persisted index) derives from this frame. The earlier pipeline
    exploded ~270 shingle rows per doc only to
    ``groupBy(id).collect_list`` them straight back twice (signature
    input + verify-side sets), paying two full-corpus shuffles for a
    round trip. Hash values equal ``xxhash64(shingle-string)`` so the
    verify arithmetic and the persisted-index format are unchanged.
    Per-doc memory is the same as before (the set always materialized
    per doc inside collect_list). NULL texts drop — a DELIBERATE
    behavior change vs the exploded form, which emitted one
    NULL-shingle row per contentless doc and therefore scored two
    NULL-text docs as Jaccard-1.0 duplicates of each other; absent
    content now produces no signature and no pairs (the module
    docstring records the contract).

    Small-input parallelism gate: with no shuffle, the shingle
    transform AND the downstream Arrow signature kernel inherit the
    scan's partitioning — a sub-core-count scan (one small file)
    would run the whole CPU-bound stage on a few threads (measured
    3× slower end-to-end at sf0.1, where the doc table is ONE
    parquet partition) — so the input goes through
    :func:`~pidb_rdf_spark.operators.layout.ensure_min_parallelism`,
    which at corpus scale is a no-op and keeps the path
    shuffle-free."""
    from pidb_rdf_spark.operators.layout import ensure_min_parallelism

    base = ensure_min_parallelism(
        df.filter(F.col(text_col).isNotNull()).select(
            F.col(id_col).alias("id"), F.col(text_col).alias("__text")
        )
    )
    return base.select(
        "id",
        F.transform(
            _shingle_array("__text", k), lambda s: F.xxhash64(s)
        ).alias("harr"),
    ).withColumn("n_sh", F.size("harr").cast("long"))


#: bucket count of the candidate-screen histogram (r13). 256 buckets
#: keyed on the hash's high byte make Σⱼ min(cA[j], cB[j]) — a provable
#: upper bound on |A∩B| — tight enough to separate true near-dups from
#: coincidental prefix collisions (measured sf0.1: 1.97M candidates →
#: 256 screen survivors = exactly the true pairs).
_SCREEN_BUCKETS = 256
#: per-bucket counts saturate at int16 max; pairs where either doc is
#: big enough that a lane COULD have clipped (n_sh > 32767) bypass the
#: screen entirely, so saturation can never drop a true pair.
_SCREEN_SAT = 32767


def _bucket_hist_expr() -> Column:
    """256-lane shingle-count histogram of ``harr`` keyed on the hash
    value's high byte, as ``array<smallint>`` — 512 bytes/doc. Built
    JVM-side in the same narrow map as the shingle set (no shuffle);
    O(256·|set|) per doc, linear in corpus size."""
    return F.expr(
        f"transform(sequence(0, {_SCREEN_BUCKETS - 1}),"
        f" j -> cast(least(size(filter(harr, x -> ((x >> 56) & 255) = j)),"
        f" {_SCREEN_SAT}) as smallint))"
    )


def _hist_screen(joined: DataFrame, threshold: float) -> DataFrame:
    """Exact candidate screen (guide §4.2: batch-vectorized numpy in
    one ``mapInArrow`` pass). Input: candidate pairs with both docs'
    bucket histograms and sizes attached. Output: the (a, b) pairs
    whose histogram bound Σⱼ min(cA[j], cB[j]) still allows
    J ≥ threshold — every pruned pair PROVABLY fails the threshold
    (|A∩B| ≤ Σⱼ min, per-bucket counts are exact up to the saturation
    bypass), so downstream exact verification is output-identical.

    Why Arrow/numpy and not a JVM expression: the same bound as
    ``aggregate(zip_with(ha, hb, least), ...)`` costs ~6 µs/row of
    per-element lambda evaluation (measured SLOWER than the
    array_intersect it replaces), while ``np.minimum(ha, hb).sum``
    over a whole Arrow batch is two vectorized passes over int16 —
    and the screen ships 512-byte histograms instead of the
    multi-KB shingle arrays (guide §8: decide on a lightweight
    proxy, move heavy bytes once)."""
    import numpy as np
    import pyarrow as pa
    from pyspark.sql.types import StructType

    nb_lanes = _SCREEN_BUCKETS
    coef = float(threshold) / (1.0 + float(threshold))
    sat = _SCREEN_SAT
    fields = {f.name: f for f in joined.schema.fields}
    out_schema = StructType([fields["a"], fields["b"]])

    def screen(batches):
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            ix = {
                name: batch.schema.get_field_index(name)
                for name in ("a", "b", "na", "nb", "ha", "hb")
            }
            ha = batch.column(ix["ha"]).flatten().to_numpy().reshape(n, nb_lanes)
            hb = batch.column(ix["hb"]).flatten().to_numpy().reshape(n, nb_lanes)
            na = batch.column(ix["na"]).to_numpy()
            nb_ = batch.column(ix["nb"]).to_numpy()
            bound = np.minimum(ha, hb).sum(axis=1, dtype=np.int64)
            keep = np.flatnonzero(
                (bound >= coef * (na + nb_)) | (na > sat) | (nb_ > sat)
            )
            if len(keep) == 0:
                continue
            sel = pa.array(keep, type=pa.int64())
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(ix["a"]).take(sel),
                    batch.column(ix["b"]).take(sel),
                ],
                names=["a", "b"],
            )

    return joined.mapInArrow(screen, out_schema)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    threshold: float = 0.6,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard ≥ threshold via **prefix
    filtering** (the AllPairs/PPJoin family): each doc's shingles are
    globally ordered by (frequency, value); if J(A,B) ≥ t, the first
    ``⌊(1-t)·|A|⌋+1`` shingles of A and of B must share an element,
    so the self-join runs only over those prefixes — which by
    construction prefer RARE shingles with short posting lists.
    Candidates then pass an exact histogram screen (r13) and the
    survivors get exact verification.

    Why not the naive shingle self-join: on a skewed corpus a single
    stop-shingle appearing in most docs makes Σ|posting|² explode
    (observed: 5k docs → 561M join rows). Prefix filtering is
    output-identical and drops that to the rare-shingle pairs. A
    length-ratio prune (min/max ≥ t, implied by J ≥ t) further cuts
    candidates before verification.

    r13 optimization (guide §1.2 step 1, §8): at t=0.6 the prefix is
    40% of each doc, so on a template-heavy corpus the prefix join
    still emits ~1.97M candidates for 256 true pairs (sf0.1), and
    per-pair ``array_intersect`` verification (~114 µs/row, measured)
    dominated the query. Candidates are now screened FIRST against a
    256-bucket count histogram (Σⱼ min(cA[j], cB[j]) ≥ ⌈t/(1+t)·
    (|A|+|B|)⌉ is necessary for J ≥ t — an exact bound, see
    :func:`_hist_screen`), which ships 512 B of histogram instead of
    ~2.3 KB of shingle array per candidate side and prunes 99.99% of
    candidates before any intersect runs (isolated sf0.1:
    10.9 s → 6.1 s; the verify stage's 2× array attach + intersect
    now touches 256 rows, not 1.97M)."""
    t = float(threshold)
    # build each doc's hashed shingle set ONCE as an array (narrow
    # map, no explode — see shingle_hash_sets) and derive every other
    # representation from it: the exploded row-per-shingle frame the
    # prefix filter needs is a cheap explode of the pinned arrays,
    # doc sizes are F.size (no counting aggregate), the screen
    # histogram rides the same narrow map, and the verify step reads
    # the arrays directly instead of re-assembling them with a
    # full-corpus collect_list shuffle (isolated sf0.1:
    # 15.2 s → 12.6 s). Shingles travel as xxhash64 longs everywhere
    # (r8): shuffles move 8-byte keys, and prefix filtering only
    # needs SOME global total order — hash order qualifies. Same
    # 64-bit-collision caveat as the verify step (P ~ 1e-13).
    sets = (
        shingle_hash_sets(df, id_col, text_col, k)
        .withColumn("hist", _bucket_hist_expr())
        .localCheckpoint(eager=False)
    )
    sh = sets.select("id", F.explode("harr").alias("shingle"))
    freq = sh.groupBy("shingle").agg(F.count("*").alias("freq"))
    sizes = sets.select("id", "n_sh")
    ranked = (
        sh.join(freq, on="shingle")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("id").orderBy(
                    F.col("freq").asc(), F.col("shingle").asc()
                )
            ),
        )
        .join(sizes, on="id")
    )
    prefix = ranked.filter(
        F.col("rk") <= F.floor((1 - t) * F.col("n_sh")) + 1
    ).select("id", "shingle", "n_sh", "rk")
    a = prefix.withColumnsRenamed({"id": "a", "n_sh": "na", "rk": "rka"})
    b = prefix.withColumnsRenamed({"id": "b", "n_sh": "nb", "rk": "rkb"})
    cands = (
        a.join(b, on="shingle")
        .filter(
            (F.col("a") < F.col("b"))
            # length-ratio prune: J ≥ t ⇒ min(|A|,|B|)/max(|A|,|B|) ≥ t
            & (F.col("na") * F.lit(t) <= F.col("nb"))
            & (F.col("nb") * F.lit(t) <= F.col("na"))
            # positional (PPJoin) prune: past the matching prefix
            # position, at most min(|A|-rkA, |B|-rkB)+1 overlaps remain;
            # J ≥ t needs overlap ≥ t/(1+t)·(|A|+|B|)
            & (
                F.least(F.col("na") - F.col("rka"), F.col("nb") - F.col("rkb"))
                + 1
                >= F.lit(t / (1 + t)) * (F.col("na") + F.col("nb"))
            )
        )
        .select("a", "b")
        .distinct()
    )
    # exact histogram screen: attach the 512 B histograms (broadcast
    # joins — the doc-level frame is tiny relative to the pair list)
    # and prune candidates that provably cannot reach the threshold
    # BEFORE the heavyweight array attach + intersect.
    screened = _hist_screen(
        cands.join(
            sets.select(
                F.col("id").alias("a"),
                F.col("hist").alias("ha"),
                F.col("n_sh").alias("na"),
            ),
            on="a",
        ).join(
            sets.select(
                F.col("id").alias("b"),
                F.col("hist").alias("hb"),
                F.col("n_sh").alias("nb"),
            ),
            on="b",
        ),
        t,
    )
    s = sets.select("id", F.col("harr").alias("arr"), "n_sh")
    return _verify_with_sets(screened, s, s, threshold)


def _verify_with_sets(
    candidates: DataFrame,
    sets_a: DataFrame,
    sets_b: DataFrame,
    threshold: float,
) -> DataFrame:
    """Exact-Jaccard verification of candidate (a, b) pairs against
    (id, arr, n_sh) set frames (:func:`shingle_hash_sets` output, or
    the persisted index's stored sets).

    Each side's shingle SET travels as one array column (two joins on
    the candidate list) and the intersection is a per-row JVM
    ``array_intersect`` — cost O(candidates × set size). The
    alternative (re-joining the exploded shingle table per pair)
    multiplies candidates by set size in ROWS, which measured 100×
    slower on skewed corpora. Sets are carried as xxhash64 longs, not
    strings: same intersection counts absent 64-bit collisions
    (P ≈ |set|²/2⁶⁴ per doc, ~1e-13 here) at a fraction of the
    compare/shuffle cost."""
    return (
        candidates.join(
            sets_a.select(
                F.col("id").alias("a"),
                F.col("arr").alias("arr_a"),
                F.col("n_sh").alias("na"),
            ),
            on="a",
        )
        .join(
            sets_b.select(
                F.col("id").alias("b"),
                F.col("arr").alias("arr_b"),
                F.col("n_sh").alias("nb"),
            ),
            on="b",
        )
        .withColumn(
            "inter", F.size(F.array_intersect("arr_a", "arr_b")).cast("long")
        )
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _minhash_perm_constants(num_perm: int):
    """Deterministic affine-permutation constants (a_j, b_j) derived
    from md5 of the permutation index — same draw everywhere, so
    signatures are reproducible across sessions and engines."""
    import hashlib

    import numpy as np

    A = np.array(
        [
            int.from_bytes(hashlib.md5(f"a{j}".encode()).digest()[:4], "big")
            % (MERSENNE31 - 1)
            + 1
            for j in range(num_perm)
        ],
        dtype=np.int64,
    )
    B = np.array(
        [
            int.from_bytes(hashlib.md5(f"b{j}".encode()).digest()[:4], "big")
            % MERSENNE31
            for j in range(num_perm)
        ],
        dtype=np.int64,
    )
    return A, B


def _minhash_sig_udf(num_perm: int):
    """Arrow-batched UDF: per-doc xxhash64 array → num_perm affine
    permutation minima ``min_j (a_j·h + b_j) mod p``. The mod-p base
    reduction happens inside numpy (np.mod is non-negative like
    F.pmod); h, a < 2^31 so products stay inside int64."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    A, B = _minhash_perm_constants(num_perm)

    def sig_of(hs):
        out = []
        for doc_hashes in hs:
            hv = np.mod(
                np.asarray(doc_hashes, dtype=np.int64), MERSENNE31
            )
            # (num_perm, n_shingles): a_j*h + b_j mod p, min per row
            perms = (A[:, None] * hv[None, :] + B[:, None]) % MERSENNE31
            out.append(perms.min(axis=1))
        return pd.Series(out)

    sig_of.__annotations__ = {"hs": pd.Series, "return": pd.Series}
    return pandas_udf(sig_of, "array<long>")


def _signatures_from_sets(sets: DataFrame, num_perm: int) -> DataFrame:
    """(id, sig) from a :func:`shingle_hash_sets` frame — ZERO
    shuffle: the per-doc hash array feeds the vectorized signature
    kernel directly (an earlier pipeline re-assembled the same array
    with a full-corpus explode + collect_list shuffle first).

    Base hash is xxhash64 (native, no digest allocation): unlike
    SimHash, nothing downstream recomputes these hashes — LSH output
    is exact-Jaccard-verified — so cross-engine reproducibility of
    the hash itself buys nothing here and md5 would only cost time."""
    return sets.select(
        "id", _minhash_sig_udf(num_perm)(F.col("harr")).alias("sig")
    )




def band_keys(
    signatures: DataFrame, bands: int = 32, rows_per_band: int = 4
) -> DataFrame:
    """(id, band, bhash) bucket keys — the banding half of LSH,
    shared by the self-join dedup path and the persisted index."""
    return signatures.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            F.slice(F.col("sig"), bi * rows_per_band + 1, rows_per_band)
                        ).alias("bhash"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.bhash").alias("bhash"))


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 32, rows_per_band: int = 4
) -> DataFrame:
    """Banding: hash each band of the signature; docs sharing any
    (band, band_hash) bucket become candidate pairs. Equi-join on the
    bucket key — no n² comparison ever happens."""
    banded = band_keys(signatures, bands, rows_per_band)
    l = banded.select(F.col("id").alias("a"), "band", "bhash")
    r = banded.select(F.col("id").alias("b"), "band", "bhash")
    return (
        l.join(r, on=["band", "bhash"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    num_perm: int = 128,
    bands: int = 32,
    rows_per_band: int = 4,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-dup pairs by MinHash+LSH candidate generation + exact
    Jaccard verification. Output: (a, b, jaccard) with jaccard ≥
    threshold — equal to the exact all-pairs answer w.p. ~1 at the
    default operating point, at linear (not quadratic) cost.

    Plan shape (r10): ONE doc-table map builds each doc's hashed
    shingle set as an array (no explode), checkpointed because three
    consumers read it (signatures, a-side and b-side verify); the
    signature stage is shuffle-free, so the only shuffles left are
    the banding equi-join and its distinct — both keyed on bucket
    hashes, the part that genuinely needs data movement. The earlier
    exploded pipeline paid two extra full-corpus shuffles just to
    collect_list the same arrays back (isolated sf0.1: 5.5 s → 3.6 s)."""
    sets = shingle_hash_sets(df, id_col, text_col, k).localCheckpoint(
        eager=False
    )
    sigs = _signatures_from_sets(sets, num_perm)
    cands = lsh_candidate_pairs(sigs, bands, rows_per_band)
    s = sets.select("id", F.col("harr").alias("arr"), "n_sh")
    return _verify_with_sets(cands, s, s, threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 60
) -> DataFrame:
    """Per-document SimHash over distinct word *bigrams*: each
    feature's md5 hash votes ±1 per bit position; the sign of each
    bit's vote total forms the signature. Bigrams (not unigrams)
    keep the feature space discriminative on small-vocabulary
    corpora.

    Physical shape (r10): the distinct-bigram set is built and
    md5-hashed per doc as ONE array column — a narrow shuffle-free
    map (plus the small-input parallelism gate, see
    ``shingle_hash_sets``) — then one Arrow-batched pandas UDF
    computes all ``bits`` vote totals as a single numpy broadcast per
    batch. Two earlier shapes both lost: ``bits`` separate SUM
    aggregates spent ~10 s on janino compilation of the generated
    aggregate class alone, and the explode → md5-per-row →
    ``groupBy(id).collect_list`` pipeline paid a full-corpus shuffle
    just to re-assemble the per-doc array this form builds in place
    (time-neutral at sf0.1 — the downstream chunk join dominates
    there — but one less corpus-wide exchange at scale).
    Output-identical in all three."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from pidb_rdf_spark.operators.layout import ensure_min_parallelism

    toks = tokens(F.col("__text"))
    bigrams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - 2, F.lit(0))),
            # F.get is 0-based and NULL-safe out of bounds (single-token
            # doc → feature is the lone token; ANSI element_at would throw)
            lambda i: F.concat_ws("_", F.get(toks, i), F.get(toks, i + 1)),
        )
    )
    base = ensure_min_parallelism(
        df.filter(F.col(text_col).isNotNull()).select(
            F.col(id_col).alias("id"), F.col(text_col).alias("__text")
        )
    )
    hashes = base.select(
        "id",
        F.transform(bigrams, lambda f: _md5_hash(f, bits)).alias("hs"),
    )

    shifts = list(range(bits))

    def _sig(hs):
        sh = np.array(shifts, dtype=np.int64)
        out = np.empty(len(hs), dtype=np.int64)
        for i, h in enumerate(hs):
            H = np.asarray(h, dtype=np.int64)
            votes = (((H[:, None] >> sh) & 1) * 2 - 1).sum(axis=0)
            out[i] = int(((votes > 0).astype(np.int64) << sh).sum())
        return pd.Series(out)

    _sig.__annotations__ = {"hs": pd.Series, "return": pd.Series}
    sig_udf = pandas_udf(_sig, "long")
    return hashes.select("id", sig_udf(F.col("hs")).alias("simhash"))


def _simhash_chunks(
    sig: DataFrame, bits: int, max_hamming: int
) -> DataFrame:
    """(id, simhash, chunk, cval) pigeonhole bands of a signature
    frame: ``max_hamming + 1`` chunks — any pair within the Hamming
    budget must share at least one chunk value (exact recall)."""
    n_chunks = max_hamming + 1
    chunk_bits = bits // n_chunks
    return sig.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(ci).alias("chunk"),
                        F.shiftright(F.col("simhash"), ci * chunk_bits)
                        .bitwiseAND(F.lit((1 << chunk_bits) - 1))
                        .alias("cval"),
                    )
                    for ci in range(n_chunks)
                ]
            )
        ).alias("ck"),
    ).select(
        "id",
        "simhash",
        F.col("ck.chunk").alias("chunk"),
        F.col("ck.cval").alias("cval"),
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 60,
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs with SimHash Hamming distance ≤ max_hamming, found by
    pigeonhole banding: split the signature into ``max_hamming + 1``
    chunks; any pair within the distance budget must share ≥1 chunk
    value, so candidates come from equi-joins on (chunk_idx, chunk
    value) — **exact recall**, linear candidate generation.

    ``sig`` is checkpointed because both sides of the chunk self-join
    read it: without the barrier the full signature pipeline
    (tokenize → bigram md5 → vote kernel) executes once PER SIDE
    (isolated sf0.1: 6.8 s → 1.3 s together with the no-explode
    signature build). One (id, long) row per doc — the cheapest
    possible thing to pin."""
    sig = simhash(df, id_col, text_col, bits).localCheckpoint(eager=False)
    chunks = _simhash_chunks(sig, bits, max_hamming)
    l = chunks.select(F.col("id").alias("a"), F.col("simhash").alias("sig_a"), "chunk", "cval")
    r = chunks.select(F.col("id").alias("b"), F.col("simhash").alias("sig_b"), "chunk", "cval")
    cands = (
        l.join(r, on=["chunk", "cval"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "sig_a", "sig_b")
        .distinct()
    )
    return (
        cands.withColumn(
            "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    bucketed: bool = False,
    n_planes: int = 4,
    n_tables: int = 8,
    max_collect: int = 4_000_000,
) -> DataFrame:
    """Pairs of vectors with cosine similarity ≥ threshold.

    ``bucketed=False`` (exact baseline): the normalized corpus matrix
    is broadcast and each partition scores its rows against it with
    one BLAS matmul inside ``mapInPandas`` — Arrow batches, no
    per-pair JVM fold (a 2k×2k zip_with/aggregate self-join measured
    24s; the matmul is sub-second). Bounded by the corpus matrix
    fitting in a broadcast (~1 GB ≈ 4M×64 floats) — enforced by
    ``max_collect``: above that many rows the call fails fast with a
    pointer at ``bucketed=True`` instead of OOMing the driver.
    ``bucketed=True``: OR-amplified random-hyperplane LSH
    (``n_tables`` independent ``n_planes``-bit signatures) restricts
    a DataFrame self-join to same-(table, bucket) pairs; exact cosine
    verification keeps precision at 1, so only recall is approximate
    — the 100 TB path; see similarity.py for the construction.

    Storage/resilience note (bucketed=True): the lazy
    ``localCheckpoint`` of ``normed`` pins the full normalized corpus
    (id + vectors + norm) in executor block storage for the query's
    duration — roughly doubling the corpus footprint — and local
    checkpoints are non-reliable: losing an executor fails the job
    (fail-safe; never wrong results) instead of recomputing. On a
    deployment where executor loss is routine, trade the single
    evaluation back by persisting ``normed`` to reliable storage
    before calling, or accept the recompute by removing the pin.
    """
    from pidb_rdf_spark.operators.similarity import (
        with_hyperplane_buckets,
        with_norm,
    )

    if bucketed:
        from pidb_rdf_spark.operators.layout import ensure_min_parallelism

        # small-input parallelism gate (see shingle_hash_sets): the
        # norm + bucket kernels are shuffle-free and inherit the
        # scan's partitioning; a one-file corpus would run them on a
        # single thread. No-op at real corpus scale.
        # Lazy checkpoint (guide §4.4 + §2.4): `normed` feeds THREE
        # consumers (the signature self-join's two sides and the two
        # vector re-attach sides), and the norm JVM fold is expensive
        # enough that Catalyst's inferred isnotnull(norm) filters —
        # pushed below the round-robin exchange onto the undivided
        # scan — plus the per-consumer recompute added up to ~6 fold
        # evaluations per corpus row (two of them single-threaded at
        # sf0.1). Materialized once, norm is DATA: every consumer
        # reads the 32-way blocks and the inferred filters cost a
        # column null-check instead of a fold.
        normed = with_norm(
            ensure_min_parallelism(df), id_col, vec_col
        ).localCheckpoint(eager=False)
        v = with_hyperplane_buckets(normed, vec_col, n_planes, n_tables)
        # candidate generation carries ONLY ids through the join +
        # dedup shuffles (a pair that collides in several tables would
        # otherwise drag its vectors through the exchange L times);
        # checkpointing the tiny (id, table, bucket) frame makes the
        # self-join read ONE materialization instead of running the
        # bucket kernel once per side
        sig = v.select(id_col, "table", "bucket").localCheckpoint(eager=False)
        l = sig.alias("l")
        r = sig.alias("r")
        pair_ids = (
            l.join(
                r,
                (F.col("l.table") == F.col("r.table"))
                & (F.col("l.bucket") == F.col("r.bucket"))
                & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
            )
            .select(
                F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b")
            )
            .dropDuplicates()
            # r13: the verify stage downstream pays ~17 µs/pair at the
            # Arrow boundary (two vector columns per row) but AQE
            # coalesces the 16-byte id-pair shuffle to a handful of
            # partitions (bytes-sized, guide §2.2) — starving the
            # CPU-bound dot stage. An explicit-count round-robin is
            # respected by AQE and costs one exchange of bare id pairs
            # (the cheapest rows in the pipeline, by design).
            .repartition(
                df.sparkSession.sparkContext.defaultParallelism
            )
        )
        # vectors rejoin once per surviving pair; cosine is one
        # Arrow-batched einsum, not a per-element codegen fold
        va = normed.select(
            F.col(id_col).alias("a"),
            F.col(vec_col).alias("__va"),
            F.col("norm").alias("__na"),
        )
        vb = normed.select(
            F.col(id_col).alias("b"),
            F.col(vec_col).alias("__vb"),
            F.col("norm").alias("__nb"),
        )
        cands = pair_ids.join(va, on="a").join(vb, on="b")

        from pidb_rdf_spark.operators.similarity import make_dot_udf

        dot_udf = make_dot_udf()
        return (
            cands.withColumn(
                "cosine",
                dot_udf(F.col("__va"), F.col("__vb"))
                / (F.col("__na") * F.col("__nb")),
            )
            .filter(F.col("cosine") >= threshold)
            .select("a", "b")
        )

    import numpy as np

    # fail-fast guard on the driver-side collect (limit-probe, same
    # pattern as the iterative operators' small_cap): the exact tier
    # is only valid while the corpus matrix fits in a broadcast
    probe = df.select(id_col).limit(max_collect + 1).count()
    if probe > max_collect:
        raise ValueError(
            f"embedding_near_dup_pairs(bucketed=False) collects the "
            f"corpus to the driver; input exceeds max_collect="
            f"{max_collect} rows — use bucketed=True (hyperplane LSH "
            f"+ exact verify), which never materializes the corpus "
            f"driver-side"
        )
    rows = df.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    M = np.array([r[1] for r in rows], dtype=np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    bc = df.sparkSession.sparkContext.broadcast((ids, M))

    def score(batches):
        import pandas as pd

        all_ids, mat = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            bids = pdf[id_col].to_numpy(dtype=np.int64)
            V = np.array(list(pdf[vec_col]), dtype=np.float64)
            V /= np.linalg.norm(V, axis=1, keepdims=True)
            S = V @ mat.T
            li, ri = np.nonzero(S >= threshold)
            a = bids[li]
            b = all_ids[ri]
            keep = a < b  # upper triangle only, excludes self
            yield pd.DataFrame({"a": a[keep], "b": b[keep]})

    return df.select(id_col, vec_col).mapInPandas(score, "a long, b long")


# ---------------------------------------------------------------------------
# SemDeDup: semantic (embedding-space) dedup via k-means partitioning
# ---------------------------------------------------------------------------


def semantic_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 8,
    iters: int = 2,
    threshold: float = 0.9,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Within-cluster semantic duplicate pairs, SemDeDup-style
    (Abbas et al. 2023, arXiv:2303.09540): k-means partitions the
    embedding space, and candidate pairs are generated ONLY inside a
    cluster — the quadratic cosine verify is bounded per cluster at
    ~(n/k)², with k grown alongside the corpus so per-cluster work
    stays flat (the paper's design point; k-means here is the same
    driver-trained, sample-bounded ``kmeans_centroids`` the IVF path
    uses, so clustering cost does not grow with the corpus either).

    Scale shape: assignment is an Arrow-batched map (no shuffle); the
    pair join carries only ``(id, cluster)`` through its shuffle;
    vectors rejoin once per surviving candidate and cosine is one
    Arrow-batched einsum. Unlike hyperplane LSH (recall < 1 per
    table), a pair is missed only when k-means splits it across
    clusters — the paper's accepted approximation.

    Returns ``(a, b, cluster, cosine)`` with ``a < b``.
    """
    if centroids is None:
        from pidb_rdf_spark.operators.similarity import kmeans_centroids

        centroids = kmeans_centroids(
            df, id_col, vec_col, n_clusters=n_clusters, iters=iters
        )
    normed = _assigned_normed(df, id_col, vec_col, centroids)
    return _pairs_from_normed(normed, id_col, vec_col, threshold)


def _assigned_normed(df, id_col, vec_col, centroids):
    """``(id, vec, norm, cluster)`` with the lineage cut: the frame
    feeds three plan branches (pair generation + both vector
    rejoins), and without the checkpoint Catalyst re-evaluates the
    assignment UDF per branch — and once more inside the pushed
    ``isnotnull(cluster)`` join-key filter (4 full-corpus Arrow
    passes, measured in the executed plan). One corpus-sized
    materialization buys assignment-computed-once, the same trade
    ``minhash_query_index`` makes for its signature frame."""
    from pidb_rdf_spark.operators.similarity import assign_clusters, with_norm

    return with_norm(
        assign_clusters(df, centroids, id_col, vec_col), id_col, vec_col
    ).localCheckpoint(eager=False)


def _pairs_from_normed(normed, id_col, vec_col, threshold):
    from pidb_rdf_spark.operators.similarity import make_dot_udf

    sig = normed.select(id_col, "cluster")
    pair_ids = (
        sig.alias("l")
        .join(
            sig.alias("r"),
            (F.col("l.cluster") == F.col("r.cluster"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("a"),
            F.col(f"r.{id_col}").alias("b"),
            F.col("l.cluster").alias("cluster"),
        )
    )
    va = normed.select(
        F.col(id_col).alias("a"),
        F.col(vec_col).alias("__va"),
        F.col("norm").alias("__na"),
    )
    vb = normed.select(
        F.col(id_col).alias("b"),
        F.col(vec_col).alias("__vb"),
        F.col("norm").alias("__nb"),
    )

    dot_udf = make_dot_udf()
    return (
        pair_ids.join(va, on="a")
        .join(vb, on="b")
        .withColumn(
            "cosine",
            dot_udf(F.col("__va"), F.col("__vb"))
            / (F.col("__na") * F.col("__nb")),
        )
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cluster", "cosine")
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 8,
    iters: int = 2,
    threshold: float = 0.9,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Semantic-dedup survivors: drop every vector that has a
    LOWER-id within-cluster neighbor with cosine ≥ threshold (the
    deterministic min-id keeper rule — SemDeDup's "keep one per
    ε-ball" with the representative fixed by id instead of by
    centroid distance, so reruns and the SQL oracle agree exactly).
    Note the rule is per-witness, not transitive: b dropped for a and
    c dropped for b can both go even if cos(a, c) < threshold — same
    greedy shape as the paper's implementation.

    Returns the surviving ``(id_col, cluster)`` rows.
    """
    from pidb_rdf_spark.operators.similarity import kmeans_centroids

    if centroids is None:
        centroids = kmeans_centroids(
            df, id_col, vec_col, n_clusters=n_clusters, iters=iters
        )
    normed = _assigned_normed(df, id_col, vec_col, centroids)
    dups = (
        _pairs_from_normed(normed, id_col, vec_col, threshold)
        .select(F.col("b").alias(id_col))
        .distinct()
    )
    return normed.select(id_col, "cluster").join(
        dups, on=id_col, how="leftanti"
    )


def semantic_query_index(
    spark,
    path: str,
    batch: DataFrame,
    threshold: float = 0.9,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    check_disjoint: bool = True,
) -> DataFrame:
    """Incremental SEMANTIC dedup of a new batch against a persisted
    IVF index (``similarity.save_ivf_index``): every (batch, indexed)
    pair with cosine >= ``threshold``, probing only each batch
    vector's ``nprobe`` nearest clusters. Completes the incremental-
    dedup triple: Bloom (exact), ``minhash_query_index`` (lexical),
    this (semantic) — the corpus is read cluster-pruned, never
    re-scored against itself.

    Scale shape: cluster probing is a distributed Arrow map over the
    batch (no driver collect of vectors); the set of DISTINCT probed
    clusters — bounded by n_clusters, never by data — is collected
    and applied as a static ``cluster IN`` filter, so the index scan
    prunes unprobed partitions at the parquet level. The batch side
    then equi-joins on cluster; only flagged pairs survive.

    Batch ids must be disjoint from indexed ids; ``check_disjoint``
    (default on) enforces it with one leftsemi probe over the
    already-pruned corpus ids — a column- and partition-pruned scan,
    cheap next to the scoring join that reads the same partitions —
    and raises naming an offending id instead of silently emitting
    self-matches at cosine 1.0. The guard scans only the PROBED
    clusters (by design — that is exactly the id set that could
    produce a self-match in this call); an id reused with a different
    embedding whose indexed vector lives in an unprobed cluster is
    not detected. For strict full-corpus enforcement, pre-check with
    an unpruned leftsemi join on the index's id column. Pass
    ``check_disjoint=False`` to skip the probe job when the pipeline
    guarantees disjointness upstream (e.g. the batch ids are minted
    after the index build).

    Returns ``(query_id, match_id, cosine)``.
    """
    from pidb_rdf_spark.operators.similarity import (
        load_ivf_index,
        make_dot_udf,
        make_probe_udf,
        with_norm,
    )

    corpus, centroids = load_ivf_index(spark, path)
    probe_udf = make_probe_udf(centroids, nprobe)
    # norm BEFORE the probe explode: one fold per vector, and the
    # explode then replicates the scalar, not the fold
    qprobe = (
        with_norm(batch, id_col, vec_col)
        .withColumn("cluster", F.explode(probe_udf(F.col(vec_col))))
        .select(
            "cluster",
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("_qvec"),
            F.col("norm").alias("_qnorm"),
        )
        .localCheckpoint(eager=False)
    )
    probed = [r[0] for r in qprobe.select("cluster").distinct().collect()]
    c = with_norm(
        corpus.filter(F.col("cluster").isin(probed)), id_col, vec_col
    ).select(
        "cluster",
        F.col(id_col).alias("match_id"),
        F.col(vec_col).alias("_nvec"),
        F.col("norm").alias("_nnorm"),
    )
    if check_disjoint:
        overlap = (
            c.select(F.col("match_id").alias("__id"))
            .join(
                qprobe.select(F.col("query_id").alias("__id")).distinct(),
                on="__id",
                how="leftsemi",
            )
            .limit(1)
            .collect()
        )
        if overlap:
            raise ValueError(
                f"semantic_query_index: batch ids overlap indexed ids "
                f"(e.g. {id_col}={overlap[0][0]!r}) — the batch must be "
                f"disjoint from the index or every overlapping vector "
                f"trivially self-matches at cosine 1.0"
            )

    dot_udf = make_dot_udf()
    return (
        c.join(qprobe, on="cluster")
        .withColumn(
            "cosine",
            dot_udf(F.col("_qvec"), F.col("_nvec"))
            / (F.col("_qnorm") * F.col("_nnorm")),
        )
        .filter(F.col("cosine") >= threshold)
        .select("query_id", "match_id", "cosine")
    )


# ---------------------------------------------------------------------------
# Persisted MinHash index (incremental dedup against a fixed corpus)
# ---------------------------------------------------------------------------


def save_minhash_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    num_perm: int = 128,
    bands: int = 32,
    rows_per_band: int = 4,
) -> None:
    """Persist the corpus half of MinHash+LSH: the (id, band, bhash)
    bucket table and each doc's shingle-hash set, plus a parameter
    sidecar. The production incremental-dedup shape: index the
    existing corpus ONCE; each new batch is shingled/signed at its
    own (small) size and equi-joined against the stored buckets —
    corpus cost never recurs, exactly like ``save_ivf_index`` for
    vectors. Sidecar is a local json (same convention as the IVF
    index; at cluster scale it would live next to the parquet).
    """
    import json
    import os

    # two write actions consume the set frame (signatures -> buckets,
    # verify-side sets); checkpoint so the corpus shingles once
    sets = shingle_hash_sets(df, id_col, text_col, k).localCheckpoint(
        eager=False
    )
    # r13 (guide §6: output file sizing): the frames inherit the
    # shingle stage's partitioning (core count at minimum), so a small
    # corpus wrote ~32 near-empty files per table and EVERY later
    # query paid ~64 file opens/footers. Size the files from the doc
    # count instead: set rows carry the ~KB shingle array (~100k rows
    # ≈ a few hundred MB/file), bucket rows are ~50 B (bands per doc,
    # ~2M rows ≈ ~100 MB/file). The repartition is a one-time exchange
    # of id+hash index rows at build time — the count also
    # materializes the checkpoint the two writes reuse.
    n_docs = sets.count()
    n_set_files = max(1, -(-n_docs // 100_000))
    n_bucket_files = max(1, -(-(n_docs * bands) // 2_000_000))
    sigs = _signatures_from_sets(sets, num_perm)
    band_keys(sigs, bands, rows_per_band).repartition(
        n_bucket_files
    ).write.mode("overwrite").parquet(os.path.join(path, "buckets"))
    sets.select("id", F.col("harr").alias("arr"), "n_sh").repartition(
        n_set_files
    ).write.mode("overwrite").parquet(os.path.join(path, "sets"))
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(
            {
                "k": k,
                "num_perm": num_perm,
                "bands": bands,
                "rows_per_band": rows_per_band,
            },
            f,
        )


def minhash_query_index(
    spark,
    path: str,
    new_docs: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup matches of ``new_docs`` against a saved corpus index:
    (query_id, match_id, jaccard) with jaccard >= threshold.

    New-doc ids must be disjoint from indexed ids (the id IS the
    identity across the join). Work is proportional to the NEW batch
    plus matched buckets — the indexed corpus is read, never
    re-shingled; verification joins the stored shingle sets.
    """
    import json

    with open(f"{path}/meta.json") as f:
        meta = json.load(f)
    # consumed twice (signatures for banding, verify-side sets)
    sets_new_raw = shingle_hash_sets(
        new_docs, id_col, text_col, meta["k"]
    ).localCheckpoint(eager=False)
    sigs_new = _signatures_from_sets(sets_new_raw, meta["num_perm"])
    bk_new = band_keys(sigs_new, meta["bands"], meta["rows_per_band"])
    buckets = spark.read.parquet(f"{path}/buckets")
    cands = (
        bk_new.select(F.col("id").alias("a"), "band", "bhash")
        .join(
            buckets.select(F.col("id").alias("b"), "band", "bhash"),
            on=["band", "bhash"],
        )
        .filter(F.col("a") != F.col("b"))
        .select("a", "b")
        .distinct()
    )
    sets_new = sets_new_raw.select(
        "id", F.col("harr").alias("arr"), "n_sh"
    )
    sets_idx = spark.read.parquet(f"{path}/sets")
    out = _verify_with_sets(cands, sets_new, sets_idx, threshold)
    return out.select(
        F.col("a").alias("query_id"), F.col("b").alias("match_id"), "jaccard"
    )


def save_simhash_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 60,
    max_hamming: int = 3,
) -> None:
    """Persist the corpus half of SimHash near-dup search: the
    (id, chunk, cval) pigeonhole bucket table plus the (id, simhash)
    signature table (the verify side), with a parameter sidecar —
    completing the incremental-dedup quartet (exact Bloom, MinHash,
    semantic IVF, and now SimHash). Index the corpus ONCE; each new
    batch hashes at its own size and equi-joins the stored buckets —
    the corpus is read, never re-hashed."""
    import json
    import os

    sig = simhash(df, id_col, text_col, bits).localCheckpoint(eager=False)
    # r13: size the index files from the doc count (guide §6) — same
    # rationale as save_minhash_index; both tables are ~16-50 B rows,
    # so ~2M rows ≈ ~100 MB/file. One-time build-side exchange; the
    # count materializes the checkpoint the two writes reuse.
    n_docs = sig.count()
    chunks_per_doc = max_hamming + 1
    n_bucket_files = max(1, -(-(n_docs * chunks_per_doc) // 2_000_000))
    n_sig_files = max(1, -(-n_docs // 2_000_000))
    _simhash_chunks(sig, bits, max_hamming).select(
        "id", "chunk", "cval"
    ).repartition(n_bucket_files).write.mode("overwrite").parquet(
        os.path.join(path, "buckets")
    )
    sig.repartition(n_sig_files).write.mode("overwrite").parquet(
        os.path.join(path, "sigs")
    )
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"bits": bits, "max_hamming": max_hamming}, f)


def simhash_query_index(
    spark,
    path: str,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup matches of ``new_docs`` against a saved SimHash index:
    (query_id, match_id, hamming) with hamming <= the indexed budget.
    Exact recall at the stored ``max_hamming`` (pigeonhole guarantee);
    new-doc ids must be disjoint from indexed ids. Work scales with
    the new batch + matched buckets, never the corpus."""
    import json

    with open(f"{path}/meta.json") as f:
        meta = json.load(f)
    sig_new = simhash(new_docs, id_col, text_col, meta["bits"]).localCheckpoint(
        eager=False
    )
    bk_new = _simhash_chunks(sig_new, meta["bits"], meta["max_hamming"])
    buckets = spark.read.parquet(f"{path}/buckets")
    cands = (
        bk_new.select(F.col("id").alias("a"), F.col("simhash").alias("sig_a"), "chunk", "cval")
        .join(buckets.select(F.col("id").alias("b"), "chunk", "cval"), on=["chunk", "cval"])
        .filter(F.col("a") != F.col("b"))
        .select("a", "b", "sig_a")
        .distinct()
    )
    sigs_idx = spark.read.parquet(f"{path}/sigs")
    return (
        cands.join(
            sigs_idx.select(F.col("id").alias("b"), F.col("simhash").alias("sig_b")),
            on="b",
        )
        .withColumn(
            "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
        )
        .filter(F.col("hamming") <= meta["max_hamming"])
        .select(
            F.col("a").alias("query_id"),
            F.col("b").alias("match_id"),
            "hamming",
        )
    )
