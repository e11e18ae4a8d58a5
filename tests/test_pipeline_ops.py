"""Tests for the scale-extension operators (dedup, similarity, text,
multimodal) — micro-fixtures with hand-computable answers, plus
property-style checks against numpy on the driver testdata."""

import math

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------


def test_exact_dedup(spark):
    from pidb_rdf_spark.operators import exact_dedup

    df = spark.createDataFrame(
        [(1, "aa"), (2, "bb"), (3, "aa"), (4, "aa")], ["doc_id", "text"]
    )
    rows = {r["keep_id"]: r["group_size"] for r in exact_dedup(df).collect()}
    assert rows == {1: 3, 2: 1}


def test_ngram_jaccard_identical_and_disjoint(spark):
    from pidb_rdf_spark.operators import ngram_jaccard_pairs

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),  # dup of 1
            (3, "zzzzzzzzzzzzzzzzzzzzzzzzzz"),  # disjoint
        ],
        ["doc_id", "text"],
    )
    rows = ngram_jaccard_pairs(df, k=4, threshold=0.5).collect()
    assert len(rows) == 1
    assert (rows[0]["a"], rows[0]["b"]) == (1, 2)
    assert rows[0]["jaccard"] == 1.0


def test_minhash_matches_exact_jaccard(docs):
    """LSH candidates + verification must reproduce the exact
    all-pairs answer at the default operating point."""
    from pidb_rdf_spark.operators import minhash_lsh_dedup, ngram_jaccard_pairs

    exact = {
        (r["a"], r["b"]) for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    approx = {
        (r["a"], r["b"]) for r in minhash_lsh_dedup(docs, threshold=0.8).collect()
    }
    assert approx == exact
    assert len(exact) > 0  # fixture contains planted near-dups


def test_simhash_hamming_zero_for_identical(spark):
    from pidb_rdf_spark.operators.dedup import simhash_pairs

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "one two three four five six seven eight"),
        ],
        ["doc_id", "text"],
    )
    rows = simhash_pairs(df, max_hamming=3).collect()
    assert {(r["a"], r["b"], r["hamming"]) for r in rows} == {(1, 2, 0)}


def test_simhash_banding_is_exact_recall(docs):
    """Pigeonhole banding must find every pair that a (trusted)
    driver-side all-pairs hamming scan finds."""
    from pidb_rdf_spark.operators.dedup import simhash, simhash_pairs

    sigs = {r["id"]: r["simhash"] for r in simhash(docs).collect()}
    ids = sorted(sigs)
    expected = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if bin(sigs[a] ^ sigs[b]).count("1") <= 3:
                expected.add((a, b))
    got = {(r["a"], r["b"]) for r in simhash_pairs(docs, max_hamming=3).collect()}
    assert got == expected


def test_embedding_near_dup_vs_numpy(emb):
    import numpy as np

    from pidb_rdf_spark.operators import embedding_near_dup_pairs

    rows = emb.orderBy("vec_id").collect()
    M = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = [r["vec_id"] for r in rows]
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    C = Mn @ Mn.T
    expected = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if C[i, j] >= 0.45:
                expected.add((ids[i], ids[j]))
    got = {
        (r["a"], r["b"])
        for r in embedding_near_dup_pairs(emb, threshold=0.45).collect()
    }
    assert got == expected


def test_embedding_near_dup_exact_collect_cap(emb):
    """The exact tier's driver-side collect fails fast above
    max_collect, pointing at the bucketed scale path."""
    import pytest

    from pidb_rdf_spark.operators import embedding_near_dup_pairs

    n = emb.count()
    with pytest.raises(ValueError, match="bucketed=True"):
        embedding_near_dup_pairs(emb, threshold=0.45, max_collect=n - 1)
    # at exactly the cap it still runs
    out = embedding_near_dup_pairs(emb, threshold=0.45, max_collect=n)
    assert out.count() >= 0


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------


def test_cosine_topk_vs_numpy(emb):
    import numpy as np

    from pidb_rdf_spark.operators import cosine_topk

    rows = emb.orderBy("vec_id").collect()
    M = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)

    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = cosine_topk(emb, q, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    for qid, pairs in by_q.items():
        qi = int(np.where(ids == qid)[0][0])
        sims = Mn @ Mn[qi]
        sims[qi] = -math.inf
        order = sorted(
            range(len(ids)), key=lambda i: (-sims[i], ids[i])
        )[:5]
        expected = [(rk + 1, int(ids[i])) for rk, i in enumerate(order)]
        assert sorted(pairs) == expected, f"query {qid}"


def test_ivf_exact_probe_equals_brute_force(emb):
    from pidb_rdf_spark.operators import cosine_topk, ivf_search, kmeans_centroids

    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = kmeans_centroids(emb, n_clusters=4, iters=2)
    brute = {tuple(r) for r in cosine_topk(emb, q, k=5).collect()}
    ivf = {tuple(r) for r in ivf_search(emb, q, cents, k=5, nprobe=4).collect()}
    assert ivf == brute


def test_ivf_partial_probe_recall(emb):
    """nprobe=1 must return k results per query with decent recall
    against brute force (sanity bound, not a tight guarantee)."""
    from pidb_rdf_spark.operators import cosine_topk, ivf_search, kmeans_centroids

    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = kmeans_centroids(emb, n_clusters=4, iters=2)
    brute = {tuple(r) for r in cosine_topk(emb, q, k=5).collect()}
    ivf = {tuple(r) for r in ivf_search(emb, q, cents, k=5, nprobe=1).collect()}
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.3, f"nprobe=1 recall suspiciously low: {recall}"


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


def test_language_id(spark):
    from pidb_rdf_spark.operators import language_id

    df = spark.createDataFrame(
        [
            (1, "the cat is in the house and it is warm"),
            (2, "der Hund ist nicht mit der Katze"),
            (3, "le chat est dans la maison pour dormir"),
            (4, "xyzzy plugh abracadabra"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["lang_pred"] for r in language_id(df).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_token_count(spark):
    from pidb_rdf_spark.operators import token_count

    df = spark.createDataFrame([(1, "Hello, world! 42 times")], ["doc_id", "text"])
    r = token_count(df).first()
    assert r["ws_tokens"] == 4
    # hello / , / world / ! / 42 / times
    assert r["bpe_tokens"] == 6


def test_fingerprint_deterministic_and_distinct(spark):
    from pidb_rdf_spark.operators import fingerprint

    df = spark.createDataFrame(
        [(1, "abc"), (2, "abc"), (3, "abd")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r["fingerprint"] for r in fingerprint(df).collect()}
    # abc: ((0*31+97)*31+98)*31+99 = 96354
    assert rows[1] == 96354
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]


def test_quality_score_components(spark):
    from pidb_rdf_spark.operators import quality_score

    df = spark.createDataFrame([(1, "the cat!!")], ["doc_id", "text"])
    r = quality_score(df).first()
    assert r["n_chars_q"] == 9
    assert r["n_tokens"] == 2
    assert r["n_punct"] == 2
    assert r["n_stopwords"] == 1  # 'the'
    # 1/10 + 0.5 (mean token len 4.5 in [3,12]) - 2/9
    assert abs(r["quality"] - (0.1 + 0.5 - 2 / 9)) < 1e-12


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------


def test_decode_media_stub(spark):
    from pidb_rdf_spark.operators import attach_media, decode_media

    df = spark.createDataFrame([(7, "abcd")], ["doc_id", "text"])
    media = attach_media(df)
    feat = decode_media(media, stub=True).first()
    assert feat["media_id"] == 7
    assert feat["n_bytes"] == 4
    assert feat["first_byte"] == ord("a")
    hist = feat["byte_hist"]
    assert len(hist) == 16 and sum(hist) == 4
    # a=97→1, b=98→2, c=99→3, d=100→4 (mod 16)
    assert hist[1] == 1 and hist[2] == 1 and hist[3] == 1 and hist[4] == 1


def test_decode_media_real_path_is_gated(spark):
    from pidb_rdf_spark.operators import attach_media, decode_media

    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(NotImplementedError):
        decode_media(attach_media(df))


def test_sample_frames(spark):
    from pidb_rdf_spark.operators import attach_media, sample_frames

    df = spark.createDataFrame([(1, "x" * 130)], ["doc_id", "text"])
    rows = sample_frames(attach_media(df), every_n_bytes=64, max_frames=8).collect()
    # 130 bytes → 3 frames (64, 64, 2)
    assert [r["frame_idx"] for r in sorted(rows, key=lambda r: r["frame_idx"])] == [0, 1, 2]
    frames = {r["frame_idx"]: bytes(r["frame"]) for r in rows}
    assert len(frames[0]) == 64 and len(frames[1]) == 64 and len(frames[2]) == 2


def test_embedding_lsh_bucketed_recall(emb):
    """OR-amplified hyperplane LSH: decent recall vs the exact
    baseline, perfect precision (candidates are exact-verified)."""
    from pidb_rdf_spark.operators import embedding_near_dup_pairs

    exact = {
        tuple(r)
        for r in embedding_near_dup_pairs(emb, threshold=0.45).collect()
    }
    lsh = {
        tuple(r)
        for r in embedding_near_dup_pairs(
            emb, threshold=0.45, bucketed=True, n_planes=4, n_tables=16
        ).collect()
    }
    assert lsh <= exact  # precision 1 (exact verification)
    # E[recall] ≈ 1-(1-p^4)^16 ≈ 0.95 for pairs at the 0.45 threshold
    assert len(lsh) >= 0.6 * len(exact), (len(lsh), len(exact))


def test_semantic_dedup_vs_numpy(emb):
    """SemDeDup semantics re-derived independently: Lloyd's k-means
    (lowest-id init, first-minimum argmin), within-cluster cosine
    witness pairs, min-id keeper rule."""
    import numpy as np

    from pidb_rdf_spark.operators import semantic_dedup, semantic_dup_pairs

    n_clusters, iters, thr = 4, 2, 0.4
    rows = emb.orderBy("vec_id").collect()
    ids = [r["vec_id"] for r in rows]
    M = np.array([r["embedding"] for r in rows], dtype=np.float64)
    C = M[:n_clusters].copy()
    for _ in range(iters + 1):  # iters updates + final assignment
        d2 = (
            (M * M).sum(1, keepdims=True) - 2.0 * (M @ C.T)
            + (C * C).sum(1)[None, :]
        )
        a = d2.argmin(1)
        for c in range(n_clusters):
            if (a == c).any():
                C[c] = M[a == c].mean(axis=0)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = Mn @ Mn.T
    exp_pairs, dropped = set(), set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if a[i] == a[j] and S[i, j] >= thr:
                exp_pairs.add((ids[i], ids[j]))
                dropped.add(ids[j])
    exp_survivors = {(ids[i], int(a[i])) for i in range(len(ids))
                     if ids[i] not in dropped}

    got_pairs = {
        (r["a"], r["b"])
        for r in semantic_dup_pairs(
            emb, n_clusters=n_clusters, iters=iters, threshold=thr
        ).collect()
    }
    assert got_pairs == exp_pairs
    got = {
        (r["vec_id"], r["cluster"])
        for r in semantic_dedup(
            emb, n_clusters=n_clusters, iters=iters, threshold=thr
        ).collect()
    }
    assert got == exp_survivors
    assert len(exp_pairs) > 0  # fixture actually exercises the drop rule


def test_repetition_signals(spark):
    from pidb_rdf_spark.operators import repetition_signals

    rows = [
        (1, "a b a b a b a b"),
        (2, "one two three four five"),
        (3, "x y\nx y\nz"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    # doc 1: bigrams a_b x4, b_a x3 over 7 slots
    assert got[1]["top_bigram_count"] == 4
    assert got[1]["top_bigram_frac"] == pytest.approx(4 / 7)
    assert got[1]["dup_token_frac"] == pytest.approx(1 - 2 / 8)
    # doc 2: clean text, everything distinct
    assert got[2]["top_bigram_count"] == 1 and got[2]["dup_line_frac"] == 0.0
    # doc 3: "x y" line duplicated -> 1 - 2/3
    assert got[3]["n_lines"] == 3 and got[3]["n_distinct_lines"] == 2
    assert got[3]["dup_line_frac"] == pytest.approx(1 / 3)


def test_probe_media_headers(spark):
    """Real container-header parsing on hand-crafted minimal files."""
    import struct

    from pidb_rdf_spark.operators import probe_media_headers

    png = (b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR"
           + struct.pack(">II", 640, 480) + b"\x08\x02" + b"\x00" * 3)
    # JPEG: SOI, APP0 stub, SOF0 (height=99, width=77, 3 channels)
    jpeg = (b"\xff\xd8\xff\xe0" + struct.pack(">H", 4) + b"JF"
            + b"\xff\xc0" + struct.pack(">H", 8) + b"\x08"
            + struct.pack(">HH", 99, 77) + b"\x03")
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 4
    wav = (b"RIFF" + struct.pack("<I", 36) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16) + struct.pack("<HH", 1, 2)
           + struct.pack("<I", 44100) + b"\x00" * 8)
    rows = [(1, png), (2, jpeg), (3, gif), (4, wav), (5, b"plain text")]
    df = spark.createDataFrame(rows, ["media_id", "content"])
    got = {r["media_id"]: r for r in probe_media_headers(df).collect()}
    assert (got[1]["format"], got[1]["width"], got[1]["height"]) == ("png", 640, 480)
    assert (got[2]["format"], got[2]["width"], got[2]["height"], got[2]["channels"]) == (
        "jpeg", 77, 99, 3,
    )
    assert (got[3]["format"], got[3]["width"], got[3]["height"]) == ("gif", 320, 200)
    assert (got[4]["format"], got[4]["channels"], got[4]["sample_rate"]) == (
        "wav", 2, 44100,
    )
    assert got[5]["format"] == "unknown" and got[5]["width"] is None


def test_tfidf_top_terms(spark):
    from pidb_rdf_spark.operators import tfidf_top_terms

    rows = [
        (1, "apple apple banana"),
        (2, "banana cherry"),
        (3, "cherry cherry cherry date"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r["doc_id"], r["rank"]): r for r in tfidf_top_terms(df, k=2).collect()}
    import math

    # doc 1: apple tf=2 df=1 -> 2*ln(3); banana tf=1 df=2 -> ln(1.5)
    assert got[(1, 1)]["term"] == "apple"
    assert got[(1, 1)]["tfidf"] == pytest.approx(2 * math.log(3.0))
    assert got[(1, 2)]["term"] == "banana"
    # doc 3: cherry tf=3 df=2 beats date tf=1 df=1
    assert got[(3, 1)]["term"] == "cherry"
    assert got[(3, 1)]["tfidf"] == pytest.approx(3 * math.log(1.5))


def test_bm25_search(spark):
    from pidb_rdf_spark.operators import bm25_search

    rows = [
        (1, "spark shuffles data across the cluster"),
        (2, "spark spark spark and nothing else"),
        (3, "completely unrelated text here now"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = bm25_search(df, "spark cluster", top_n=3).collect()
    # doc 1 matches both query terms; doc 2 only one (saturated tf);
    # doc 3 matches none and must be absent
    assert [r["doc_id"] for r in got] == [1, 2]
    assert got[0]["score"] > got[1]["score"] > 0


def test_hash_sample_deterministic_and_stable(spark):
    from pidb_rdf_spark.operators import hash_sample

    df = spark.range(0, 10000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"] for r in hash_sample(df, "doc_id", 0.3).collect()}
    b = {r["doc_id"] for r in hash_sample(df, "doc_id", 0.3).collect()}
    assert a == b  # rerun-stable
    assert 0.25 < len(a) / 10000 < 0.35  # ~fraction
    # growth-stable: sampling a superset never flips earlier decisions
    big = spark.range(0, 20000).withColumnRenamed("id", "doc_id")
    c = {r["doc_id"] for r in hash_sample(big, "doc_id", 0.3).collect()}
    assert a == {x for x in c if x < 10000}


def test_stratified_hash_sample(spark):
    from pidb_rdf_spark.operators import stratified_hash_sample
    from pyspark.sql import functions as F

    df = spark.range(0, 10000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    out = stratified_hash_sample(df, "doc_id", "lang", {"de": 0.1}, default=1.0)
    by = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by["en"] == 5000  # default 1.0 keeps everything
    assert 300 < by["de"] < 700  # ~10% of 5000


def test_pack_token_stream(spark):
    from pidb_rdf_spark.operators import pack_token_stream

    rows = [(1, 100), (2, 50), (3, 80), (4, 200), (5, 10)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    got = {r["doc_id"]: r for r in pack_token_stream(df, budget=128).collect()}
    # contiguous layout in id order: offsets 0,100,150,230,430
    assert [got[i]["start_offset"] for i in (1, 2, 3, 4, 5)] == [0, 100, 150, 230, 430]
    assert got[1]["chunk_start"] == 0 and got[1]["chunk_end"] == 0
    assert got[2]["chunk_start"] == 0 and got[2]["chunk_end"] == 1  # spans 100..149
    assert got[4]["chunk_start"] == 1 and got[4]["chunk_end"] == 3  # 230..429
    # shards pack independently
    sharded = pack_token_stream(df, budget=128, n_shards=2).collect()
    assert {r["shard"] for r in sharded} == {0, 1}


def test_semantic_overlap_vs_numpy(emb):
    """Embedding-level decontamination matches a dense numpy
    cross-product reference, including the cosine values."""
    import numpy as np

    from pidb_rdf_spark.operators import semantic_overlap

    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    M = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    is_ev = ids % 10 == 0
    S = Mn[~is_ev] @ Mn[is_ev].T
    ti, ei = np.nonzero(S >= 0.35)
    expected = {
        (int(ids[~is_ev][t]), int(ids[is_ev][e]), round(S[t, e], 9))
        for t, e in zip(ti, ei)
    }
    assert expected  # fixture exercises the flag path

    ev = emb.filter(F.col("vec_id") % 10 == 0)
    tr = emb.filter(F.col("vec_id") % 10 != 0)
    got = {
        (r["train_id"], r["eval_id"], round(r["cosine"], 9))
        for r in semantic_overlap(tr, ev, threshold=0.35).collect()
    }
    assert got == expected


def test_semantic_overlap_empty_eval(emb):
    """An empty benchmark side yields an empty result frame, not a
    numpy axis error."""
    from pidb_rdf_spark.operators import semantic_overlap

    out = semantic_overlap(emb, emb.filter(F.col("vec_id") < 0), threshold=0.0)
    assert out.count() == 0
    assert out.columns == ["train_id", "eval_id", "cosine"]


def test_semantic_overlap_eval_side_cap(emb):
    """The eval-matrix collect fails fast when the 'eval' side is
    corpus-sized."""
    import pytest as _pytest

    from pidb_rdf_spark.operators import semantic_overlap

    with _pytest.raises(ValueError, match="max_eval_collect"):
        semantic_overlap(emb, emb, threshold=0.9, max_eval_collect=10)


def test_semantic_overlap_zero_norm_raises(spark):
    """Degenerate all-zero embeddings fail loudly on either side
    (cosine is undefined; silently dropping them would let them pass
    decontamination) — ADVICE r5."""
    import pytest as _pytest

    from pidb_rdf_spark.operators import semantic_overlap

    ok = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.5, 0.5])], ["vec_id", "embedding"]
    )
    zero = spark.createDataFrame(
        [(3, [0.0, 0.0]), (4, [1.0, 1.0])], ["vec_id", "embedding"]
    )
    with _pytest.raises(ValueError, match="zero-norm eval"):
        semantic_overlap(ok, zero, threshold=0.5)
    # train-side zero norm raises from the scoring task at action time
    with _pytest.raises(Exception, match="zero-norm train"):
        semantic_overlap(zero, ok, threshold=0.5).collect()


def test_semantic_overlap_string_ids(spark):
    """Ids pass through with their input dtype — string ids are not
    coerced to long (ADVICE r5: the id contract follows the schema)."""
    from pidb_rdf_spark.operators import semantic_overlap

    tr = spark.createDataFrame(
        [("ta", [1.0, 0.0]), ("tb", [0.0, 1.0])], ["vec_id", "embedding"]
    )
    ev = spark.createDataFrame(
        [("e1", [2.0, 0.0])], ["vec_id", "embedding"]
    )
    out = semantic_overlap(tr, ev, threshold=0.9)
    assert dict(out.dtypes) == {
        "train_id": "string",
        "eval_id": "string",
        "cosine": "double",
    }
    assert [(r["train_id"], r["eval_id"]) for r in out.collect()] == [("ta", "e1")]


def test_semantic_overlap_materialize_destroys_broadcast(spark):
    """materialize=True eagerly computes the pair frame and releases
    the eval-matrix broadcast (long-session hygiene — ADVICE r5)."""
    from pidb_rdf_spark.operators import semantic_overlap

    tr = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], ["vec_id", "embedding"]
    )
    ev = spark.createDataFrame([(9, [1.0, 0.0])], ["vec_id", "embedding"])
    out = semantic_overlap(tr, ev, threshold=0.9, materialize=True)
    # broadcast already destroyed; the checkpointed frame still serves
    assert [(r["train_id"], r["eval_id"]) for r in out.collect()] == [(1, 9)]


def test_semantic_query_index_disjoint_guard(spark, tmp_path):
    """A batch that overlaps the indexed ids raises instead of
    emitting trivial self-matches at cosine 1.0 (ADVICE r5); the
    explicit opt-out skips the probe job."""
    import pytest as _pytest

    from pidb_rdf_spark.operators import kmeans_centroids, semantic_query_index
    from pidb_rdf_spark.operators.similarity import save_ivf_index
    from tests.conftest import SF_DIR

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    idx_side = emb.filter(F.col("vec_id") % 5 != 0)
    cents = kmeans_centroids(idx_side, n_clusters=4, iters=2)
    path = str(tmp_path / "sem_idx_guard")
    save_ivf_index(idx_side, path, cents)

    overlapping = emb.limit(20)  # ids 0..19 include indexed ids
    with _pytest.raises(ValueError, match="disjoint"):
        semantic_query_index(spark, path, overlapping, threshold=0.99)
    # opt-out: the same batch runs, and the self-matches it produces
    # are exactly the overlap the guard protects against
    out = semantic_query_index(
        spark, path, overlapping, threshold=0.999999, check_disjoint=False
    )
    assert any(r["query_id"] == r["match_id"] for r in out.collect())


def test_ngram_overlap_hash_equals_string(spark):
    """Hash-join and raw-string-join produce identical overlap pairs
    (xxhash64 carries the gram identity through the shuffle)."""
    from pidb_rdf_spark.operators import ngram_overlap

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a quick brown fox jumps over a sleeping cat"),
            (3, "completely different text with no shared phrases here"),
            (10, "the quick brown fox jumps over the lazy dog indeed"),
        ],
        ["doc_id", "text"],
    )
    ev = docs.filter("doc_id >= 10")
    tr = docs.filter("doc_id < 10")
    a = {
        tuple(r)
        for r in ngram_overlap(tr, ev, n=4, min_overlap=1, hashed=True).collect()
    }
    b = {
        tuple(r)
        for r in ngram_overlap(tr, ev, n=4, min_overlap=1, hashed=False).collect()
    }
    assert a == b
    # doc 1 shares 6 distinct 4-grams with doc 10 ("the quick brown
    # fox" .. "over the lazy dog"); doc 2 shares 2 ("quick brown fox
    # jumps", "brown fox jumps over"); doc 3 none
    assert a == {(1, 10, 6), (2, 10, 2)}


def test_ngram_overlap_short_and_dup_grams(spark):
    """Docs shorter than n produce no shingles; repeated grams inside
    one doc count once (distinct-shingle semantics)."""
    from pidb_rdf_spark.operators import contaminated_ids, ngram_overlap

    docs = spark.createDataFrame(
        [
            (1, "too short"),
            (2, "spam spam spam spam spam spam spam spam"),
            (10, "spam spam spam"),
        ],
        ["doc_id", "text"],
    )
    ev = docs.filter("doc_id >= 10")
    tr = docs.filter("doc_id < 10")
    got = {
        tuple(r)
        for r in ngram_overlap(tr, ev, n=3, min_overlap=1).collect()
    }
    # doc 2 has ONE distinct 3-gram ("spam spam spam") = doc 10's one
    assert got == {(2, 10, 1)}
    flagged = {r["train_id"] for r in contaminated_ids(tr, ev, n=3).collect()}
    assert flagged == {2}


def test_quantize_roundtrip_error_bound(spark):
    """Dequantized vectors stay within scale/2 per component, and
    cosine top-1 neighbors are preserved on the fixture corpus."""
    from pidb_rdf_spark.operators import (
        dequantize_embeddings,
        quantize_embeddings,
    )
    from tests.conftest import SF_DIR

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = quantize_embeddings(emb)
    back = dequantize_embeddings(q)
    orig = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    rec = {r["vec_id"]: r["embedding"] for r in back.collect()}
    scales = {r["vec_id"]: r["scale"] for r in q.collect()}
    for vid, v in orig.items():
        s, w = scales[vid], rec[vid]
        assert len(v) == len(w)
        tol = s / 2 + 1e-12
        assert all(abs(a - b) <= tol for a, b in zip(v, w))
    # int range respected
    for r in q.collect():
        assert all(-127 <= x <= 127 for x in r["qvec"])


def test_quantize_zero_vector(spark):
    from pidb_rdf_spark.operators import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])],
        "vec_id long, embedding array<double>",
    )
    rows = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert rows[1]["scale"] == 0.0 and rows[1]["qvec"] == [0, 0, 0]
    assert rows[2]["qvec"][1] == -127


def test_ivf_index_roundtrip_and_pruning(spark, tmp_path):
    """save_ivf_index → ivf_search_indexed equals the in-memory IVF
    search, and the probe scan carries a cluster partition filter
    (static partition pruning at the store)."""
    from pidb_rdf_spark.operators import (
        ivf_search,
        ivf_search_indexed,
        kmeans_centroids,
        load_ivf_index,
        save_ivf_index,
    )
    from pidb_rdf_spark.plans import plan_summary
    from pyspark.sql import functions as F
    from tests.conftest import SF_DIR

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter("vec_id < 5").withColumnRenamed("vec_id", "query_id")
    cents = kmeans_centroids(emb, n_clusters=4, iters=3)
    idx = str(tmp_path / "ivf")
    save_ivf_index(emb, idx, cents)

    got = ivf_search_indexed(spark, idx, queries, k=5, nprobe=2)
    want = ivf_search(emb, queries, cents, k=5, nprobe=2)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    # pruning pinned: the probed-cluster filter reaches the scan as a
    # partition filter
    vectors, _ = load_ivf_index(spark, idx)
    pruned = vectors.filter(F.col("cluster").isin([0, 1]))
    s = plan_summary(pruned)
    assert s["partition_filter_scans"] >= 1
    # and the pruned read returns only those clusters
    assert {r["cluster"] for r in pruned.select("cluster").distinct().collect()} <= {0, 1}

    # the query-side collect is cap-guarded (VERDICT r11 #5): past
    # max_queries the call fails fast and points at the distributed
    # ivf_search path
    with pytest.raises(ValueError, match="max_queries"):
        ivf_search_indexed(spark, idx, queries, k=5, nprobe=2,
                           max_queries=2)


def test_semantic_query_index_vs_numpy(spark, tmp_path):
    """Incremental semantic dedup against a saved IVF index matches a
    numpy replay of probe-then-threshold (the probe-recall
    approximation is part of the contract, so the reference replays
    it too)."""
    import numpy as np

    from pidb_rdf_spark.operators import (
        kmeans_centroids,
        semantic_query_index,
    )
    from pidb_rdf_spark.operators.similarity import save_ivf_index
    from tests.conftest import SF_DIR

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    idx_side = emb.filter(F.col("vec_id") % 5 != 0)
    batch = emb.filter(F.col("vec_id") % 5 == 0)
    cents = kmeans_centroids(idx_side, n_clusters=4, iters=2)
    path = str(tmp_path / "sem_idx")
    save_ivf_index(idx_side, path, cents)

    rows_i = idx_side.orderBy("vec_id").collect()
    rows_b = batch.orderBy("vec_id").collect()
    C = np.array(cents, dtype=np.float64)
    I = np.array([r["embedding"] for r in rows_i], dtype=np.float64)
    B = np.array([r["embedding"] for r in rows_b], dtype=np.float64)
    iid = np.array([r["vec_id"] for r in rows_i])
    bid = np.array([r["vec_id"] for r in rows_b])
    assign = (
        (I * I).sum(1, keepdims=True) - 2.0 * (I @ C.T) + (C * C).sum(1)
    ).argmin(1)
    d2b = (B * B).sum(1, keepdims=True) - 2.0 * (B @ C.T) + (C * C).sum(1)
    probes = np.argsort(d2b, axis=1, kind="stable")[:, :2]
    In = I / np.linalg.norm(I, axis=1, keepdims=True)
    Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
    S = Bn @ In.T
    thr = 0.35
    expected = {
        (int(bid[q]), int(iid[m]))
        for q in range(len(bid))
        for m in range(len(iid))
        if assign[m] in probes[q] and S[q, m] >= thr
    }
    assert expected  # fixture exercises matches

    got = {
        (r["query_id"], r["match_id"])
        for r in semantic_query_index(
            spark, path, batch, threshold=thr, nprobe=2
        ).collect()
    }
    assert got == expected


def test_boilerplate_strip(spark):
    """Cross-document repeated lines are detected and stripped; rare
    lines survive with document line order preserved."""
    from pidb_rdf_spark.operators import boilerplate_lines, strip_boilerplate

    docs = spark.createDataFrame(
        [
            (1, "COOKIE BANNER\nreal content one\nFOOTER"),
            (2, "COOKIE BANNER\nreal content two\nFOOTER"),
            (3, "COOKIE BANNER\nunique text\nFOOTER"),
            (4, "no chrome here\njust content"),
        ],
        ["doc_id", "text"],
    )
    boiler = {
        (r["line"], r["n_docs"])
        for r in boilerplate_lines(docs, min_docs=3).collect()
    }
    assert boiler == {("COOKIE BANNER", 3), ("FOOTER", 3)}
    out = {r["doc_id"]: r for r in strip_boilerplate(docs, min_docs=3).collect()}
    assert out[1]["text"] == "real content one"
    assert out[1]["n_lines_kept"] == 1 and out[1]["n_lines_removed"] == 2
    assert out[4]["text"] == "no chrome here\njust content"
    assert out[4]["n_lines_removed"] == 0
    # no boilerplate at all -> empty map path (coalesce guard)
    clean = spark.createDataFrame([(1, "a\nb")], ["doc_id", "text"])
    r = strip_boilerplate(clean, min_docs=2).collect()[0]
    assert r["text"] == "a\nb" and r["n_lines_removed"] == 0


def test_boilerplate_duplicate_lines_within_doc(spark):
    """A line repeated INSIDE one doc counts that doc once for the
    cross-doc threshold, but every occurrence is stripped."""
    from pidb_rdf_spark.operators import boilerplate_lines, strip_boilerplate

    docs = spark.createDataFrame(
        [
            (1, "AD\nbody\nAD"),
            (2, "AD\nother"),
        ],
        ["doc_id", "text"],
    )
    assert {
        (r["line"], r["n_docs"])
        for r in boilerplate_lines(docs, min_docs=2).collect()
    } == {("AD", 2)}
    out = {r["doc_id"]: r for r in strip_boilerplate(docs, min_docs=2).collect()}
    assert out[1]["text"] == "body" and out[1]["n_lines_removed"] == 2


def test_salted_join_equals_plain_join(spark):
    """Salting must be result-transparent: inner and left joins match
    the unsalted join exactly, including duplicate-key bags."""
    from pidb_rdf_spark.operators import salted_join

    left = spark.createDataFrame(
        [(k, i) for k in ("hot", "hot", "hot", "cold") for i in range(3)],
        ["k", "lv"],
    )
    right = spark.createDataFrame(
        [("hot", "H1"), ("hot", "H2"), ("cold", "C"), ("orphan", "O")],
        ["k", "rv"],
    )
    for how in ("inner", "left"):
        got = sorted(map(tuple, salted_join(left, right, "k", 4, how).collect()))
        want = sorted(map(tuple, left.join(right, on="k", how=how).collect()))
        assert got == want, how


# ---------------------------------------------------------------------------
# scrubbing + chunking
# ---------------------------------------------------------------------------


def test_pii_scrub_replaces_and_counts(spark):
    from pidb_rdf_spark.operators import pii_scrub

    df = spark.createDataFrame(
        [
            (1, "mail a@b.com and c.d@e.org, call +1-555-123-4567, ip 10.0.0.1"),
            (2, "clean text with no pii at all"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert rows[1]["n_email"] == 2
    assert rows[1]["n_phone"] == 1
    assert rows[1]["n_ip"] == 1
    t = rows[1]["text"]
    assert "<EMAIL>" in t and "<PHONE>" in t and "<IP>" in t
    assert "a@b.com" not in t and "555" not in t and "10.0.0.1" not in t
    assert rows[2]["text"] == "clean text with no pii at all"
    assert rows[2]["n_email"] == rows[2]["n_phone"] == rows[2]["n_ip"] == 0


def test_chunk_documents_windows(spark):
    from pidb_rdf_spark.operators import chunk_documents

    words = " ".join(f"w{i}" for i in range(25))
    df = spark.createDataFrame(
        [(1, words), (2, "tiny doc")], "doc_id long, text string"
    )
    out = chunk_documents(df, max_tokens=10, overlap=2)
    chunks = {
        (r["doc_id"], r["chunk_id"]): r for r in out.collect()
    }
    # 25 tokens, stride 8 -> starts 0, 8, 16 -> 3 chunks
    assert sorted(k for k in chunks if k[0] == 1) == [(1, 0), (1, 1), (1, 2)]
    assert chunks[(1, 0)]["chunk_text"].split() == [f"w{i}" for i in range(10)]
    assert chunks[(1, 1)]["chunk_text"].split() == [f"w{i}" for i in range(8, 18)]
    assert chunks[(1, 2)]["chunk_text"].split() == [f"w{i}" for i in range(16, 25)]
    assert chunks[(1, 2)]["n_tokens"] == 9
    # short doc: exactly one unpadded chunk
    assert sorted(k for k in chunks if k[0] == 2) == [(2, 0)]
    assert chunks[(2, 0)]["chunk_text"] == "tiny doc"
    assert chunks[(2, 0)]["n_tokens"] == 2
    # consecutive chunks overlap by exactly `overlap` tokens
    import pytest

    with pytest.raises(ValueError):
        chunk_documents(df, max_tokens=10, overlap=10)


# ---------------------------------------------------------------------------
# product quantization
# ---------------------------------------------------------------------------


def test_pq_encode_reconstruct_roundtrip(emb):
    """Codes pick each subspace's NEAREST centroid, so PQ
    reconstruction must beat the trivial all-zeros baseline and every
    per-subspace assignment must match a numpy argmin reference."""
    import numpy as np

    from pidb_rdf_spark.operators import pq_encode, pq_reconstruct, pq_train

    books = pq_train(emb, m=4, k=8, iters=2)
    codes = pq_encode(emb, books)
    rows = emb.orderBy("vec_id").collect()
    M = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = [r["vec_id"] for r in rows]
    sub = M.shape[1] // 4

    got = {(r["vec_id"], r["subspace"]): r["code"] for r in codes.collect()}
    for i, vid in enumerate(ids):
        for s in range(4):
            C = np.array(books[s])
            d2 = ((M[i, s * sub:(s + 1) * sub] - C) ** 2).sum(1)
            assert got[(vid, s)] == d2.argmin(), (vid, s)

    recon = {
        r["vec_id"]: np.array(r["embedding"])
        for r in pq_reconstruct(codes, books).collect()
    }
    err = np.mean([((recon[v] - M[i]) ** 2).mean() for i, v in enumerate(ids)])
    base = np.mean(M ** 2)
    assert err < base, f"PQ reconstruction no better than zeros: {err} vs {base}"


def test_pq_topk_matches_numpy_adc(emb):
    """ADC ranking from codes alone == numpy dot(q, reconstruction)
    ranking (ties by neighbor id)."""
    import numpy as np

    from pidb_rdf_spark.operators import pq_encode, pq_topk, pq_train

    books = pq_train(emb, m=4, k=8, iters=2)
    codes = pq_encode(emb, books)
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {}
    for r in pq_topk(codes, q, books, k=5).collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))

    rows = emb.orderBy("vec_id").collect()
    M = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    sub = M.shape[1] // 4
    R = np.zeros_like(M)
    for s in range(4):
        C = np.array(books[s])
        X = M[:, s * sub:(s + 1) * sub]
        a = ((X[:, None, :] - C[None, :, :]) ** 2).sum(2).argmin(1)
        R[:, s * sub:(s + 1) * sub] = C[a]
    for qid in (0, 1, 2):
        if qid not in got:
            continue
        qi = int(np.where(ids == qid)[0][0])
        scores = R @ M[qi]
        order = sorted(
            (int(i) for i in range(len(ids)) if ids[i] != qid),
            key=lambda i: (-scores[i], ids[i]),
        )[:5]
        want = [(rk + 1, int(ids[i])) for rk, i in enumerate(order)]
        assert sorted(got[qid]) == want, f"query {qid}"


# ---------------------------------------------------------------------------
# unigram LM quality
# ---------------------------------------------------------------------------


def test_unigram_quality_hand_computed(spark):
    """2-doc corpus with hand-computable unigram probabilities; the
    repeated-token doc must score lower perplexity than the
    rare-token doc."""
    import math

    from pidb_rdf_spark.operators import unigram_quality

    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "c d")],
        "doc_id long, text string",
    )
    # counts: a=3 b=1 c=1 d=1, total=6, vocab=4+1 (OOV), alpha=1
    out = {r["doc_id"]: r for r in unigram_quality(df).collect()}
    p = lambda c: (c + 1.0) / (6 + 5.0)
    want1 = (3 * math.log(p(3)) + math.log(p(1))) / 4
    want2 = math.log(p(1))
    assert out[1]["n_tokens"] == 4
    assert abs(out[1]["avg_logprob"] - want1) < 1e-12
    assert abs(out[2]["avg_logprob"] - want2) < 1e-12
    assert out[1]["ppl_proxy"] < out[2]["ppl_proxy"]


def test_unigram_quality_oov_and_external_model(spark):
    """Scoring against an external model: unseen tokens take the
    smoothed OOV mass, never -inf."""
    import math

    from pidb_rdf_spark.operators import unigram_model, unigram_quality

    train = spark.createDataFrame([(1, "a a b")], "doc_id long, text string")
    score = spark.createDataFrame([(9, "a zzz")], "doc_id long, text string")
    model = unigram_model(train)
    out = unigram_quality(score, model=model).collect()[0]
    # counts a=2 b=1, total=3, vocab=2+1
    want = (math.log((2 + 1) / 6.0) + math.log((0 + 1) / 6.0)) / 2
    assert out["n_tokens"] == 2
    assert abs(out["avg_logprob"] - want) < 1e-12


def test_ivfpq_exhaustive_probe_equals_pq_topk(emb):
    """nprobe = n_clusters makes the IVF prune a no-op, so IVFPQ must
    equal plain PQ ADC ranking exactly."""
    from pidb_rdf_spark.operators import (
        ivfpq_topk,
        kmeans_centroids,
        pq_encode,
        pq_topk,
        pq_train,
    )

    books = pq_train(emb, m=4, k=8, iters=2)
    codes = pq_encode(emb, books)
    coarse = kmeans_centroids(emb, n_clusters=4, iters=2)
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    full = {tuple(r) for r in pq_topk(codes, q, books, k=5).collect()}
    ivfpq = {
        tuple(r)
        for r in ivfpq_topk(emb, q, coarse, books, k=5, nprobe=4).collect()
    }
    assert ivfpq == full and len(full) == 15


def test_ivfpq_partial_probe_subset(emb):
    """nprobe=1 results come only from the probed cell: every
    neighbor must share the query's nearest coarse cluster set, and
    each query still gets k rows on this corpus."""
    from pidb_rdf_spark.operators import (
        ivfpq_topk,
        kmeans_centroids,
        pq_encode,
        pq_topk,
        pq_train,
    )

    books = pq_train(emb, m=4, k=8, iters=2)
    coarse = kmeans_centroids(emb, n_clusters=4, iters=2)
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivfpq_topk(emb, q, coarse, books, k=5, nprobe=1).collect()
    from pidb_rdf_spark.operators.similarity import assign_clusters

    cl = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters(emb, coarse).select("vec_id", "cluster").collect()
    }
    for r in out:
        assert cl[r["neighbor_id"]] == cl[r["query_id"]]


def test_gopher_quality_rules(spark):
    """Each Gopher rule flips the pass flag independently."""
    from pidb_rdf_spark.operators import gopher_quality

    good = " ".join(
        ["the be to of and that have with"] + ["word"] * 50
    )
    short = "the be to of and"  # < min_words
    symbols = " ".join(["the be to of and ###"] * 20)  # symbol ratio
    no_stop = " ".join(["zulu"] * 60)  # no required stopwords
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols), (4, no_stop)],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in gopher_quality(df).collect()}
    assert out[1]["passes_gopher"] is True
    assert out[2]["passes_gopher"] is False and out[2]["n_words"] == 5
    assert out[3]["passes_gopher"] is False
    assert out[3]["symbol_word_ratio"] > 0.1
    assert out[4]["passes_gopher"] is False
    assert out[4]["n_required_stopwords"] == 0
    assert out[1]["n_required_stopwords"] == 8


def test_gopher_bullet_and_ellipsis_lines(spark):
    from pidb_rdf_spark.operators import gopher_quality

    bullets = "\n".join(["- item " + "w " * 20] * 10)
    df = spark.createDataFrame([(1, bullets)], ["doc_id", "text"])
    r = gopher_quality(df).collect()[0]
    assert r["bullet_line_frac"] == 1.0 and r["passes_gopher"] is False
    ell = "\n".join(["the be to of and that have with more..."] * 10)
    r2 = gopher_quality(
        spark.createDataFrame([(1, ell)], ["doc_id", "text"])
    ).collect()[0]
    assert r2["ellipsis_line_frac"] == 1.0 and r2["passes_gopher"] is False


def test_line_dedup_global(spark):
    """First occurrence (lowest doc_id, pos) keeps the line; empty
    lines survive everywhere; doc order of kept lines preserved."""
    from pidb_rdf_spark.operators import line_dedup_global

    df = spark.createDataFrame(
        [
            (1, "alpha\nshared\n\nbeta"),
            (2, "shared\ngamma\nalpha"),
            (3, "shared"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in line_dedup_global(df).collect()}
    assert out[1]["text"] == "alpha\nshared\n\nbeta"
    assert out[1]["n_lines_removed"] == 0
    assert out[2]["text"] == "gamma"
    assert out[2]["n_lines_kept"] == 1 and out[2]["n_lines_removed"] == 2
    assert out[3]["text"] == "" and out[3]["n_lines_kept"] == 0


def test_line_dedup_within_doc_repeats(spark):
    """A line repeated WITHIN one doc keeps only its first position."""
    from pidb_rdf_spark.operators import line_dedup_global

    df = spark.createDataFrame([(7, "x\ny\nx\nx")], ["doc_id", "text"])
    r = line_dedup_global(df).collect()[0]
    assert r["text"] == "x\ny"
    assert r["n_lines_kept"] == 2 and r["n_lines_removed"] == 2


# ---------------------------------------------------------------------------
# Bloom membership
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives(spark):
    from pidb_rdf_spark.operators import bloom_build, bloom_probe

    corpus = spark.createDataFrame(
        [(i, f"member-{i}") for i in range(200)], ["id", "text"]
    )
    bloom = bloom_build(corpus, "text", m_bits=1 << 14, k_hashes=5)
    probed = bloom_probe(corpus, bloom, "text", m_bits=1 << 14, k_hashes=5)
    assert probed.filter(~F.col("might_contain")).count() == 0


def test_bloom_rejects_nonmembers_and_fp_rate(spark):
    from pidb_rdf_spark.operators import bloom_build, bloom_fp_rate, bloom_probe

    n, m = 200, 1 << 14
    corpus = spark.createDataFrame(
        [(i, f"member-{i}") for i in range(n)], ["id", "text"]
    )
    others = spark.createDataFrame(
        [(i, f"stranger-{i}") for i in range(1000)], ["id", "text"]
    )
    bloom = bloom_build(corpus, "text", m_bits=m, k_hashes=5)
    hits = (
        bloom_probe(others, bloom, "text", m_bits=m, k_hashes=5)
        .filter(F.col("might_contain"))
        .count()
    )
    # expected fp rate ~ (1 - e^(-5*200/16384))^5 ~ 7e-7; allow slack
    assert hits / 1000 <= max(bloom_fp_rate(n, m, 5) * 50, 0.01)


def test_bloom_empty_filter_probe(spark):
    """Probing against an empty filter: nothing might_contain (the
    empty-map coalesce guard)."""
    from pidb_rdf_spark.operators import bloom_build, bloom_probe

    empty = spark.createDataFrame([], "id long, text string")
    bloom = bloom_build(empty, "text")
    probed = bloom_probe(
        spark.createDataFrame([(1, "x")], ["id", "text"]), bloom, "text"
    )
    rows = probed.collect()
    assert len(rows) == 1 and rows[0]["might_contain"] is False


def test_bloom_bit_math_matches_duckdb(spark):
    """The determinism contract: Spark's bit positions and word masks
    equal DuckDB's for the same values — collisions replay exactly."""
    import duckdb

    from pidb_rdf_spark.operators import bloom_build

    vals = [f"v{i}" for i in range(50)]
    df = spark.createDataFrame([(v,) for v in vals], ["text"])
    got = {
        (r["word"], r["bits"])
        for r in bloom_build(df, "text", m_bits=1 << 10, k_hashes=3).collect()
    }
    want = {
        tuple(r)
        for r in duckdb.sql(
            """
            WITH v AS (SELECT unnest([{vals}]) AS text),
            pos AS (
                SELECT (('0x' || substr(md5(text || ':' || i), 1, 8))::BIGINT
                        % 1024) AS p
                FROM v, (SELECT unnest([0,1,2]) AS i)
            )
            SELECT (p // 32) AS word, bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS bits
            FROM pos GROUP BY 1
            """.replace("{vals}", ",".join(f"'{v}'" for v in vals))
        ).fetchall()
    }
    assert got == want


# ---------------------------------------------------------------------------
# Semi-structured (JSON) extraction
# ---------------------------------------------------------------------------


def test_json_extract_fields_typed(spark):
    from pidb_rdf_spark.operators import json_extract_fields

    df = spark.createDataFrame(
        [
            (1, '{"k": 7, "tag": "a"}'),
            (2, '{"k": 9}'),          # missing key -> NULL
            (3, "not json at all"),    # malformed -> NULLs, no job failure
            (4, None),                 # null payload
        ],
        ["id", "props"],
    )
    out = {
        r["id"]: (r["k"], r["tag"])
        for r in json_extract_fields(
            df, "props", {"k": "int", "tag": "string"}
        ).collect()
    }
    assert out[1] == (7, "a")
    assert out[2] == (9, None)
    assert out[3] == (None, None)
    assert out[4] == (None, None)


def test_json_extract_fields_drop_source_and_empty(spark):
    import pytest

    from pidb_rdf_spark.operators import json_extract_fields

    df = spark.createDataFrame([(1, '{"k": 1}')], ["id", "props"])
    cols = json_extract_fields(df, "props", {"k": "int"}, drop_source=True).columns
    assert cols == ["id", "k"]
    with pytest.raises(ValueError):
        json_extract_fields(df, "props", {})


def test_json_kv_explode_open_schema(spark):
    from pidb_rdf_spark.operators import json_kv_explode

    df = spark.createDataFrame(
        [(1, '{"a": 1, "b": "x"}'), (2, "{}"), (3, None)], ["id", "props"]
    )
    rows = {
        (r["id"], r["key"], r["value"])
        for r in json_kv_explode(df, "props").collect()
    }
    # scalar values verbatim; empty/null objects keep the row (explode_outer)
    assert (1, "a", "1") in rows and (1, "b", "x") in rows
    assert (2, None, None) in rows and (3, None, None) in rows


def test_json_extract_stays_jvm_side(spark):
    """The parse must be a codegen'd projection: no BatchEvalPython /
    shuffle in the plan."""
    from pidb_rdf_spark.operators import json_extract_fields

    df = spark.createDataFrame([(1, '{"k": 1}')], ["id", "props"])
    plan = (
        json_extract_fields(df, "props", {"k": "int"})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# Distinct-count sketches
# ---------------------------------------------------------------------------


def test_kmv_exact_below_k(spark):
    from pidb_rdf_spark.operators import kmv_distinct

    df = spark.createDataFrame(
        [(i % 10,) for i in range(1000)], ["v"]
    )
    r = kmv_distinct(df, "v", k=64).collect()[0]
    assert r["n_hashes"] == 10 and r["distinct_est"] == 10.0


def test_kmv_estimates_above_k(spark):
    from pidb_rdf_spark.operators import kmv_distinct

    n = 2000
    df = spark.createDataFrame([(f"u{i}",) for i in range(n)], ["v"])
    r = kmv_distinct(df, "v", k=128).collect()[0]
    assert r["n_hashes"] == 128
    # KMV rse ~ 1/sqrt(k-2) ~ 9%; allow 3 sigma
    assert abs(r["distinct_est"] - n) / n < 0.27


def test_kmv_grouped_matches_duckdb(spark):
    """Full cross-engine replay: same hashes, same k-th minimum, same
    estimate — the determinism contract behind the driver oracle."""
    import duckdb

    from pidb_rdf_spark.operators import kmv_distinct

    rows = [("g1", f"x{i}") for i in range(50)] + [
        ("g2", f"y{i}") for i in range(7)
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {
        (r["g"], r["n_hashes"], r["distinct_est"])
        for r in kmv_distinct(df, "v", k=16, by=["g"]).collect()
    }
    vals = ", ".join(f"('{g}', '{v}')" for g, v in rows)
    want = {
        tuple(r)
        for r in duckdb.sql(
            f"""
            WITH raw(g, v) AS (VALUES {vals}),
            h AS (
                SELECT DISTINCT g,
                       ('0x' || substr(md5(v), 1, 13))::BIGINT
                           / 4503599627370496.0 AS hh
                FROM raw
            ),
            mins AS (
                SELECT g, hh,
                       row_number() OVER (PARTITION BY g ORDER BY hh) AS rn
                FROM h
            ),
            est AS (
                SELECT g, COUNT(*) AS n_distinct,
                       MAX(CASE WHEN rn = 16 THEN hh END) AS hk
                FROM mins GROUP BY g
            )
            SELECT g, CAST(LEAST(n_distinct, 16) AS BIGINT) AS n_hashes,
                   round(CASE WHEN n_distinct < 16
                              THEN CAST(n_distinct AS DOUBLE)
                              ELSE 15.0 / hk END, 4) AS distinct_est
            FROM est
            """
        ).fetchall()
    }
    assert got == want


def test_approx_distinct_within_bound(spark):
    from pidb_rdf_spark.operators import approx_distinct

    df = spark.createDataFrame([(f"u{i}",) for i in range(5000)], ["v"])
    got = approx_distinct(df, "v", rsd=0.02).collect()[0]["distinct_approx"]
    assert abs(got - 5000) / 5000 < 0.06  # 3 sigma at rsd=0.02


# ---------------------------------------------------------------------------
# Winnowing fingerprints / exact-substring dup detection
# ---------------------------------------------------------------------------


def test_winnow_guarantee_shared_substring_detected(spark):
    """Any shared substring of length >= w+k-1 must yield a shared
    fingerprint (the MOSS guarantee, one-directional)."""
    from pidb_rdf_spark.operators import substring_dup_pairs

    shared = "a very long verbatim passage that appears in both documents"
    df = spark.createDataFrame(
        [
            (1, "prefix one " + shared + " suffix alpha"),
            (2, "other intro " + shared + " closing beta"),
            (3, "nothing in common with the rest of this tiny corpus at all"),
        ],
        ["doc_id", "text"],
    )
    pairs = {
        (r["a"], r["b"])
        for r in substring_dup_pairs(
            df, k=8, w=4, min_shared=1, max_df=None
        ).collect()
    }
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_winnow_short_docs_yield_nothing(spark):
    from pidb_rdf_spark.operators import winnow_fingerprints

    df = spark.createDataFrame([(1, "tiny"), (2, "")], ["doc_id", "text"])
    assert winnow_fingerprints(df, k=8, w=4).count() == 0


def test_winnow_max_df_drops_boilerplate(spark):
    """A span shared by EVERY doc must not reach the pair join when
    max_df excludes it."""
    from pidb_rdf_spark.operators import substring_dup_pairs

    chrome = " universal footer present in absolutely every document here"
    rows = [(i, f"unique body text number {i} with filler words{chrome}")
            for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    everybody = substring_dup_pairs(df, k=8, w=4, min_shared=1, max_df=None)
    assert everybody.count() == 45  # all 10C2 pairs via the footer
    pruned = substring_dup_pairs(df, k=8, w=4, min_shared=1, max_df=5)
    assert pruned.count() == 0


def test_winnow_matches_duckdb(spark):
    """Full cross-engine replay of hashing, windowed minima, and
    leftmost-tie selection — the determinism behind the entry oracle."""
    import duckdb

    from pidb_rdf_spark.operators import winnow_fingerprints

    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "pack my box with five dozen liquor jugs right now ok"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["pos"], r["fp_hash"])
        for r in winnow_fingerprints(df, k=8, w=4).collect()
    }
    vals = ", ".join(f"({i}, '{t}')" for i, t in rows)
    want = {
        tuple(r)
        for r in duckdb.sql(
            f"""
            WITH d(doc_id, text) AS (VALUES {vals}),
            h AS (
                SELECT doc_id,
                       list_transform(
                           generate_series(1, greatest(length(text) - 7, 0)),
                           i -> ('0x' || substr(md5(substr(text, i, 8)), 1, 13))
                                    ::BIGINT) AS hs
                FROM d
            ),
            p0 AS (
                SELECT doc_id,
                       list_transform(
                           generate_series(1, greatest(len(hs) - 3, 0)),
                           j -> struct_pack(
                               pos := CAST(j + list_position(
                                   list_slice(hs, j, j + 3),
                                   list_min(list_slice(hs, j, j + 3))) - 1
                                   AS BIGINT),
                               fp := list_min(list_slice(hs, j, j + 3)))) AS ps
                FROM h
            )
            SELECT DISTINCT doc_id, s.pos, s.fp
            FROM p0, LATERAL (SELECT unnest(ps) AS s) u
            """
        ).fetchall()
    }
    assert got == want


# ---------------------------------------------------------------------------
# Persisted MinHash index (incremental dedup)
# ---------------------------------------------------------------------------


def test_minhash_index_query_equals_batch_pairs(spark, docs, tmp_path):
    """Indexing a corpus then querying a held-out batch must find
    exactly the cross pairs the one-shot batch dedup finds between
    the two groups."""
    from pidb_rdf_spark.operators import (
        minhash_lsh_dedup,
        minhash_query_index,
        save_minhash_index,
    )

    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    path = str(tmp_path / "mh_index")
    save_minhash_index(corpus, path)
    got = {
        (r["query_id"], r["match_id"], round(r["jaccard"], 6))
        for r in minhash_query_index(spark, path, batch).collect()
    }
    full = minhash_lsh_dedup(docs, threshold=0.8).collect()
    want = set()
    for r in full:
        qa, qb = r["a"], r["b"]
        j = round(r["jaccard"], 6)
        if qa % 5 == 0 and qb % 5 != 0:
            want.add((qa, qb, j))
        elif qb % 5 == 0 and qa % 5 != 0:
            want.add((qb, qa, j))
    assert got == want
    assert len(want) > 0  # fixture's planted near-dups straddle the split


def test_minhash_index_query_no_corpus_reshingle(spark, docs, tmp_path):
    """Query-time plan must read the stored parquet, not recompute
    corpus shingles: only the NEW batch flows through the signature
    Python stage."""
    from pidb_rdf_spark.operators import minhash_query_index, save_minhash_index

    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    path = str(tmp_path / "mh_index2")
    save_minhash_index(corpus, path)
    out = minhash_query_index(
        spark, path, docs.filter(F.col("doc_id") % 5 == 0)
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # stored buckets + stored sets parquet are scanned (the new-batch
    # doc scan sits behind the shingle checkpoint barrier)
    assert plan.count("FileScan") >= 2
    # exactly ONE Arrow signature stage: the new batch; the corpus is
    # never re-shingled or re-signed
    assert plan.count("ArrowEvalPython") == 1


def test_json_kv_explode_rejects_alias_collision(spark):
    import pytest

    from pidb_rdf_spark.operators import json_kv_explode

    df = spark.createDataFrame([(1, 2.0, '{"a": 1}')], ["id", "value", "props"])
    with pytest.raises(ValueError, match="collide"):
        json_kv_explode(df, "props")
    out = json_kv_explode(df, "props", value_alias="json_value")
    assert out.columns == ["id", "value", "key", "json_value"]


def test_bloom_probe_rejects_param_mismatch_and_reads_metadata(spark):
    """Probe must inherit (m_bits, k_hashes) from the filter's column
    metadata and refuse contradicting explicit values — a silent
    mismatch means false negatives."""
    import pytest

    from pidb_rdf_spark.operators import bloom_build, bloom_probe

    corpus = spark.createDataFrame(
        [(i, f"member-{i}") for i in range(100)], ["id", "text"]
    )
    bloom = bloom_build(corpus, "text", m_bits=1 << 14, k_hashes=3)
    # no explicit params: inherited from metadata; still zero false negatives
    probed = bloom_probe(corpus, bloom, "text")
    assert probed.filter(~F.col("might_contain")).count() == 0
    with pytest.raises(ValueError, match="disagrees"):
        bloom_probe(corpus, bloom, "text", m_bits=1 << 20)
    with pytest.raises(ValueError, match="disagrees"):
        bloom_probe(corpus, bloom, "text", k_hashes=5)


# ---------------------------------------------------------------------------
# REAL PNG pixel decode (r8, verdict #8): stdlib zlib + unfilter
# ---------------------------------------------------------------------------


def _make_png(width, height, pixels, color_type=2, filters=None, palette=None):
    """Minimal PNG writer for tests: 8-bit, optional per-row filter
    types (pre-filtered according to the PNG spec so the decoder's
    unfilter is genuinely exercised)."""
    import struct
    import zlib

    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    stride = width * ch
    filters = filters or [0] * height
    raw = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        line = bytearray(pixels[y * stride:(y + 1) * stride])
        ft = filters[y]
        enc = bytearray(line)
        if ft == 1:
            for x in range(stride - 1, ch - 1, -1):
                enc[x] = (line[x] - line[x - ch]) & 0xFF
        elif ft == 2:
            for x in range(stride):
                enc[x] = (line[x] - prev[x]) & 0xFF
        elif ft == 3:
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                enc[x] = (line[x] - ((a + prev[x]) >> 1)) & 0xFF
        elif ft == 4:
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if pa <= pb and pa <= pc else b if pb <= pc else c
                enc[x] = (line[x] - pr) & 0xFF
        raw += bytes([ft]) + bytes(enc)
        prev = line

    def chunk(ctype, data):
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", palette)
    out += chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    return out


def test_png_decode_roundtrip_all_filters():
    from pidb_rdf_spark.operators import png_decode

    w, h = 4, 5
    pixels = bytes(range(w * h * 3))
    for filters in ([0] * h, [1] * h, [2] * h, [3] * h, [4] * h, [0, 1, 2, 3, 4]):
        png = _make_png(w, h, pixels, color_type=2, filters=filters)
        gw, gh, gch, gpx = png_decode(png)
        assert (gw, gh, gch) == (w, h, 3)
        assert gpx == pixels, f"filters={filters}"


def test_png_decode_color_types():
    from pidb_rdf_spark.operators import png_decode

    # grayscale
    g = _make_png(3, 2, bytes([10, 20, 30, 40, 50, 60]), color_type=0)
    assert png_decode(g)[2:] == (1, bytes([10, 20, 30, 40, 50, 60]))
    # RGBA
    px = bytes(range(3 * 2 * 4))
    assert png_decode(_make_png(3, 2, px, color_type=6))[2:] == (4, px)
    # palette -> RGB expansion
    pal = bytes([255, 0, 0, 0, 255, 0])  # idx0=red, idx1=green
    p = _make_png(2, 1, bytes([0, 1]), color_type=3, palette=pal)
    assert png_decode(p)[2:] == (3, bytes([255, 0, 0, 0, 255, 0]))


def test_png_decode_rejects_unsupported():
    import struct
    import zlib

    import pytest

    from pidb_rdf_spark.operators import png_decode

    with pytest.raises(ValueError, match="signature"):
        png_decode(b"JUNK")

    def chunk(ctype, data):
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr16 = struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)
    png16 = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr16)
    with pytest.raises(ValueError, match="bit depth"):
        png_decode(png16)


def test_decode_png_operator(spark):
    from pidb_rdf_spark.operators import decode_png

    solid = _make_png(4, 4, bytes([100, 150, 200]) * 16, color_type=2)
    rows = [(1, bytearray(solid)), (2, bytearray(b"not a png"))]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r for r in decode_png(df).collect()}
    assert got[1]["width"] == 4 and got[1]["height"] == 4
    assert got[1]["n_pixels"] == 16
    assert got[1]["channel_means"] == [100.0, 150.0, 200.0]
    assert got[2]["width"] is None  # undecodable set auditable as NULLs


def test_decode_media_gate_mentions_real_png_path(spark):
    import pytest

    from pidb_rdf_spark.operators import attach_media, decode_media

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(NotImplementedError, match="decode_png"):
        decode_media(attach_media(docs))


# ---------------------------------------------------------------------------
# training-mixture construction (operators/mixing.py)
# ---------------------------------------------------------------------------


def _unit_hash_py(doc_id, epoch):
    import hashlib

    h = hashlib.md5(f"{doc_id}:{epoch}".encode()).hexdigest()
    return int(h[:13], 16) / float(1 << 52)


def test_mixture_rates_and_epochs(spark):
    from pidb_rdf_spark.operators.mixing import mix_sources, mixture_rates

    docs = spark.createDataFrame(
        [(i, "a", 100) for i in range(50)]
        + [(1000 + i, "b", 100) for i in range(50)],
        "doc_id long, source string, n_chars long",
    )
    weights = {"a": 3.0, "b": 1.0}
    rates = {s: r for s, _a, _t, r in mixture_rates(docs, weights, 7500)}
    assert rates["a"] == pytest.approx(1.125)
    assert rates["b"] == pytest.approx(0.375)

    got = mix_sources(docs, weights, 7500).collect()
    a_rows = [(r["doc_id"], r["epoch"]) for r in got if r["source"] == "a"]
    b_rows = [(r["doc_id"], r["epoch"]) for r in got if r["source"] == "b"]
    # source a: one full epoch 0 + fractional epoch 1 at 0.125
    assert {(i, 0) for i in range(50)} <= set(a_rows)
    want_a1 = {
        (i, 1) for i in range(50) if _unit_hash_py(i, 1) < 1.125 - 1
    }
    assert {x for x in a_rows if x[1] == 1} == want_a1
    # source b: fractional epoch 0 at 0.375, no full epochs
    want_b = {
        (1000 + i, 0)
        for i in range(50)
        if _unit_hash_py(1000 + i, 0) < 0.375
    }
    assert set(b_rows) == want_b
    # a doc never repeats within an epoch
    assert len(got) == len({(r["doc_id"], r["epoch"]) for r in got})


def test_mixture_temperature_flattens(spark):
    from pidb_rdf_spark.operators.mixing import mixture_rates

    docs = spark.createDataFrame(
        [(i, "a", 100) for i in range(10)]
        + [(100 + i, "b", 100) for i in range(10)],
        "doc_id long, source string, n_chars long",
    )
    # T=2 takes sqrt of the weights: 9:1 -> 3:1
    rates = {
        s: r
        for s, _a, _t, r in mixture_rates(
            docs, {"a": 9.0, "b": 1.0}, 4000, temperature=2.0
        )
    }
    assert rates["a"] / rates["b"] == pytest.approx(3.0)


def test_mixture_excludes_zero_weight_and_validates(spark):
    from pidb_rdf_spark.operators.mixing import mix_sources, mixture_rates

    docs = spark.createDataFrame(
        [(1, "a", 100), (2, "b", 100)],
        "doc_id long, source string, n_chars long",
    )
    got = mix_sources(docs, {"a": 1.0, "b": 0.0}, 100)
    assert {r["source"] for r in got.collect()} == {"a"}
    with pytest.raises(ValueError, match="positive"):
        mixture_rates(docs, {"a": 1.0}, -5)
    with pytest.raises(ValueError, match="no source"):
        mixture_rates(docs, {"zzz": 1.0}, 100)


# ---------------------------------------------------------------------------
# Count-Min sketch (operators/sketch.py)
# ---------------------------------------------------------------------------


def test_cms_estimates_dominate_and_converge(spark):
    from pidb_rdf_spark.operators.sketch import cms_build, cms_query

    rows = [(v,) for v in ["a"] * 50 + ["b"] * 30 + ["c"] * 5 + ["d"]]
    df = spark.createDataFrame(rows, "k string")
    exact = {"a": 50, "b": 30, "c": 5, "d": 1}
    # tiny width forces collisions: estimates must still DOMINATE
    tiny = cms_query(cms_build(df, "k", width=2, depth=2), df, "k",
                     width=2, depth=2)
    for r in tiny.collect():
        assert r["est"] >= exact[r["k"]]
    # ample width: estimates are exact
    wide = cms_query(cms_build(df, "k", width=1024, depth=4), df, "k",
                     width=1024, depth=4)
    assert {r["k"]: r["est"] for r in wide.collect()} == exact


def test_cms_merge_by_union_resum(spark):
    from pyspark.sql import functions as F_

    from pidb_rdf_spark.operators.sketch import cms_build, cms_query

    a = spark.createDataFrame([("x",)] * 4 + [("y",)], "k string")
    b = spark.createDataFrame([("x",)] * 6, "k string")
    merged = (
        cms_build(a, "k", width=64, depth=3)
        .unionAll(cms_build(b, "k", width=64, depth=3))
        .groupBy("d", "bucket")
        .agg(F_.sum("cnt").alias("cnt"))
    )
    got = {
        r["k"]: r["est"]
        for r in cms_query(
            merged, a.unionAll(b), "k", width=64, depth=3
        ).collect()
    }
    assert got == {"x": 10, "y": 1}


def test_cms_matches_duckdb_bit_math(spark):
    """The bucket hash replays bit-for-bit in DuckDB — the property
    the oracle relies on (same contract as the Bloom positions)."""
    import duckdb

    from pidb_rdf_spark.operators.sketch import cms_build

    df = spark.createDataFrame([(i,) for i in range(97)], "v long")
    got = sorted(
        map(tuple, cms_build(df, "v", width=32, depth=2).collect())
    )
    want = sorted(
        map(
            tuple,
            duckdb.sql(
                """
        SELECT d, ('0x' || substr(md5(v::VARCHAR || ':' || d), 1, 13))::BIGINT
               % 32 AS bucket, COUNT(*) AS cnt
        FROM range(97) t(v), UNNEST([0, 1]) u(d)
        GROUP BY 1, 2
        """
            ).fetchall(),
        )
    )
    assert got == want


# ---------------------------------------------------------------------------
# table profiling (operators/profile.py)
# ---------------------------------------------------------------------------


def test_profile_table_exact(spark):
    from pidb_rdf_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (None, "b")],
        "x long, s string",
    )
    got = {
        r["column"]: (r["dtype"], r["n_rows"], r["n_null"], r["n_distinct"])
        for r in profile_table(df, exact_distinct=True).collect()
    }
    assert got == {
        "x": ("bigint", 4, 1, 3),
        "s": ("string", 4, 1, 2),
    }


def test_profile_table_subset_order_and_errors(spark):
    import pytest as _pytest

    from pidb_rdf_spark.operators.profile import profile_table

    df = spark.createDataFrame([(1, 2, 3)], "a long, b long, c long")
    rows_ = profile_table(df, cols=["c", "a"], exact_distinct=True).collect()
    assert [r["column"] for r in rows_] == ["c", "a"]
    with _pytest.raises(ValueError, match="no such column"):
        profile_table(df, cols=["zz"])


def test_profile_table_approx_within_tolerance(spark):
    from pidb_rdf_spark.operators.profile import profile_table

    df = spark.range(10_000).select(F.col("id"), (F.col("id") % 37).alias("m"))
    got = {
        r["column"]: r["n_distinct"] for r in profile_table(df).collect()
    }
    assert abs(got["id"] - 10_000) / 10_000 < 0.1
    assert abs(got["m"] - 37) <= 4


def test_profile_diff_flags_drift(spark):
    from pidb_rdf_spark.operators.profile import profile_diff, profile_table

    before = spark.createDataFrame(
        [(i, "x") for i in range(100)], "id long, s string"
    )
    # drop the s column's variety, null out 20% of ids, add a column
    after = spark.createDataFrame(
        [(i if i % 5 else None, "x", 1.5) for i in range(100)],
        "id long, s string, extra double",
    )
    d = {
        r["column"]: r["drift"]
        for r in profile_diff(
            profile_table(before, exact_distinct=True),
            profile_table(after, exact_distinct=True),
        ).collect()
    }
    assert d["id"] is True      # null fraction moved 0 -> 0.2
    assert d["s"] is False      # unchanged
    assert d["extra"] is True   # column added


def test_profile_diff_dtype_change(spark):
    from pidb_rdf_spark.operators.profile import profile_diff, profile_table

    b = spark.createDataFrame([(1,)], "v long")
    a = spark.createDataFrame([("1",)], "v string")
    row = profile_diff(
        profile_table(b, exact_distinct=True),
        profile_table(a, exact_distinct=True),
    ).collect()[0]
    assert row["drift"] is True


# ---------------------------------------------------------------------------
# round-9 advice regressions
# ---------------------------------------------------------------------------


def test_mixture_survives_huge_doc_ids(spark):
    """ADVICE r8: the old multiplicative unit hash overflowed int64
    under ANSI mode for ids >= ~3.5e9; the md5 contract must not."""
    from pidb_rdf_spark.operators.mixing import mix_sources

    big = 4_000_000_000
    docs = spark.createDataFrame(
        [(big + i, "a", 100) for i in range(40)],
        "doc_id long, source string, n_chars long",
    )
    # rate 0.5: fractional epoch 0 only — must select the md5 subset
    got = {r["doc_id"] for r in mix_sources(docs, {"a": 1.0}, 2000).collect()}
    want = {big + i for i in range(40) if _unit_hash_py(big + i, 0) < 0.5}
    assert got == want
    assert 0 < len(got) < 40


def test_mixture_rates_null_token_sum_excluded(spark):
    """ADVICE r8: an all-NULL token column must exclude the source
    cleanly (available=0), not TypeError on None > 0."""
    from pidb_rdf_spark.operators.mixing import mixture_rates

    docs = spark.createDataFrame(
        [(1, "a", 100), (2, "b", None)],
        "doc_id long, source string, n_chars long",
    )
    rates = mixture_rates(docs, {"a": 1.0, "b": 1.0}, 100)
    assert [r[0] for r in rates] == ["a"]


def test_cms_null_values_skipped(spark):
    """ADVICE r8: NULLs must not enter the sketch (dead buckets) and
    NULL probes must not return est=0 rows that violate est>=true."""
    from pidb_rdf_spark.operators.sketch import cms_build, cms_query

    df = spark.createDataFrame(
        [("x",), (None,), ("x",), (None,)], "v string"
    )
    sk = cms_build(df, "v", width=16, depth=2)
    assert sk.filter(F.col("bucket").isNull()).count() == 0
    est = cms_query(sk, df, "v", width=16, depth=2).collect()
    assert len(est) == 1 and est[0]["v"] == "x" and est[0]["est"] >= 2


# ---------------------------------------------------------------------------
# REAL WAV/PCM sample decode (operators/multimodal.py decode_wav)
# ---------------------------------------------------------------------------


def _wav_blob(samples, channels=1, rate=8000, bits=16, tag=1):
    """Build a RIFF/WAVE blob from float samples in [-1, 1]."""
    import struct

    import numpy as np

    a = np.asarray(samples, dtype=np.float64)
    if bits == 16 and tag == 1:
        data = (a * 32768.0).clip(-32768, 32767).astype("<i2").tobytes()
    elif bits == 8 and tag == 1:
        data = ((a * 128.0) + 128).clip(0, 255).astype(np.uint8).tobytes()
    elif bits == 24 and tag == 1:
        v = (a * float(1 << 23)).clip(-(1 << 23), (1 << 23) - 1).astype("<i4")
        data = b"".join(int(x).to_bytes(3, "little", signed=True) for x in v)
    elif bits == 32 and tag == 3:
        data = a.astype("<f4").tobytes()
    else:
        raise AssertionError("unsupported fixture combo")
    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", tag, channels, rate, rate * block, block, bits)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_decode_wav_pcm16_exact_rms(spark):
    import math

    from pidb_rdf_spark.operators.multimodal import decode_wav

    # stereo: L = +0.5 constant, R = -0.25 constant, 100 frames
    inter = []
    for _ in range(100):
        inter += [0.5, -0.25]
    blob = _wav_blob(inter, channels=2, rate=4000)
    df = spark.createDataFrame([(1, bytearray(blob))], "media_id long, content binary")
    row = decode_wav(df).collect()[0]
    assert (row["channels"], row["sample_rate"], row["n_frames"]) == (2, 4000, 100)
    assert row["duration_s"] == pytest.approx(0.025)
    assert row["channel_rms"][0] == pytest.approx(0.5, abs=1e-3)
    assert row["channel_rms"][1] == pytest.approx(0.25, abs=1e-3)
    assert row["peak"] == pytest.approx(0.5, abs=1e-3)


def test_decode_wav_all_sample_formats(spark):
    from pidb_rdf_spark.operators.multimodal import decode_wav, wav_decode

    sig = [0.0, 0.5, -0.5, 0.25]
    blobs = [
        (8, _wav_blob(sig, bits=8)),
        (16, _wav_blob(sig, bits=16)),
        (24, _wav_blob(sig, bits=24)),
        (32, _wav_blob(sig, bits=32, tag=3)),
    ]
    for bits, blob in blobs:
        ch, sr, a = wav_decode(blob)
        assert (ch, sr, a.shape) == (1, 8000, (4, 1)), bits
        tol = 1e-2 if bits == 8 else 1e-6
        assert abs(a[1, 0] - 0.5) < tol and abs(a[2, 0] + 0.5) < tol
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, (_bits, b) in enumerate(blobs)]
        + [(99, bytearray(b"not audio"))],
        "media_id long, content binary",
    )
    rows = {r["media_id"]: r for r in decode_wav(df).collect()}
    assert len(rows) == 5
    assert all(rows[i]["n_frames"] == 4 for i in range(4))
    assert rows[99]["channels"] is None  # undecodable row kept, NULLs


def test_decode_wav_rejects_compressed_tag(spark):
    import struct

    from pidb_rdf_spark.operators.multimodal import wav_decode

    fmt = struct.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 16)  # MP3 tag
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    blob = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(ValueError, match="codec"):
        wav_decode(blob)


# ---------------------------------------------------------------------------
# deterministic global shuffle / sharding (operators/mixing.py)
# ---------------------------------------------------------------------------


def test_deterministic_shuffle_contract(spark):
    import hashlib

    from pidb_rdf_spark.operators.mixing import deterministic_shuffle

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(200)], "doc_id long, text string"
    )
    got = deterministic_shuffle(docs, n_shards=4).collect()
    # pure function of (salt, id): replay in python
    def hpos(i, salt="shuffle"):
        return int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:13], 16)

    want_shard = {i: hpos(i) % 4 for i in range(200)}
    assert {r["doc_id"]: r["shard"] for r in got} == want_shard
    # seq is dense 0..n-1 per shard, ordered by the hash
    for s in range(4):
        rows = sorted(
            (r for r in got if r["shard"] == s), key=lambda r: r["seq"]
        )
        assert [r["seq"] for r in rows] == list(range(len(rows)))
        hashes = [hpos(r["doc_id"]) for r in rows]
        assert hashes == sorted(hashes)
    # stable under repartitioning of the input
    again = deterministic_shuffle(docs.repartition(13), n_shards=4).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
    # a different salt is a different permutation
    other = deterministic_shuffle(docs, n_shards=4, salt="epoch1").collect()
    assert {r["doc_id"]: r["shard"] for r in other} != want_shard
    with pytest.raises(ValueError, match="n_shards"):
        deterministic_shuffle(docs, 0)


def test_corpus_diff_added_removed_changed(spark):
    from pidb_rdf_spark.operators.curation import corpus_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "C!"), (4, "d")], "doc_id long, text string"
    )
    got = {(r["doc_id"], r["change"]) for r in corpus_diff(old, new).collect()}
    assert got == {(1, "removed"), (3, "changed"), (4, "added")}
    # identical snapshots diff to empty
    assert corpus_diff(old, old).count() == 0


def test_simhash_index_query_equals_batch_pairs(spark, docs, tmp_path):
    """SimHash index (r9): querying a held-out batch against the
    saved index finds exactly the cross pairs the one-shot batch
    search finds between the two groups, at identical hamming."""
    from pidb_rdf_spark.operators import (
        save_simhash_index,
        simhash_pairs,
        simhash_query_index,
    )

    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    path = str(tmp_path / "sh_index")
    save_simhash_index(corpus, path)
    got = {
        (r["query_id"], r["match_id"], r["hamming"])
        for r in simhash_query_index(spark, path, batch).collect()
    }
    want = set()
    for r in simhash_pairs(docs).collect():
        if r["a"] % 5 == 0 and r["b"] % 5 != 0:
            want.add((r["a"], r["b"], r["hamming"]))
        elif r["b"] % 5 == 0 and r["a"] % 5 != 0:
            want.add((r["b"], r["a"], r["hamming"]))
    assert got == want
    assert len(want) > 0


def test_simhash_index_query_no_corpus_rehash(spark, docs, tmp_path):
    """Query-time plan reads the stored parquet: only the NEW batch
    flows through the signature stage (one ArrowEval, not two)."""
    from pidb_rdf_spark.operators import save_simhash_index, simhash_query_index

    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    path = str(tmp_path / "sh_index2")
    save_simhash_index(corpus, path)
    out = simhash_query_index(spark, path, docs.filter(F.col("doc_id") % 5 == 0))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") <= 1
    assert "parquet" in plan.lower()


def test_check_constraints_all_kinds(spark):
    from pidb_rdf_spark.operators.profile import check_constraints

    ref = spark.createDataFrame([(1,), (2,)], "k long")
    df = spark.createDataFrame(
        [
            (1, "a@x.io", 5, 1),
            (2, None, 50, 2),
            (2, "bad", -1, 3),
            (None, "c@y.io", 5, 9),
        ],
        "id long, email string, score long, fk long",
    )
    got = {
        (r["rule"], r["column"]): (r["n_violations"], round(r["frac_violations"], 4))
        for r in check_constraints(
            df,
            [
                {"kind": "not_null", "col": "id"},
                {"kind": "range", "col": "score", "min": 0, "max": 10},
                {"kind": "regex", "col": "email", "pattern": r"[^@]+@[^@]+\.[a-z]+"},
                {"kind": "in_set", "col": "score", "values": [5, 50]},
                {"kind": "unique", "col": "id"},
                {"kind": "fk", "col": "fk", "ref": ref, "ref_col": "k"},
            ],
        ).collect()
    }
    assert got[("not_null", "id")] == (1, 0.25)
    assert got[("range", "score")] == (2, 0.5)       # 50 and -1
    assert got[("regex", "email")] == (1, 0.25)      # 'bad'; NULL exempt
    assert got[("in_set", "score")] == (1, 0.25)     # -1
    assert got[("unique", "id")] == (1, round(1 / 3, 4))  # one extra '2'
    assert got[("fk", "fk")] == (2, 0.5)             # 3 and 9 orphaned
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown constraint"):
        check_constraints(df, [{"kind": "nope", "col": "id"}])
    with _pytest.raises(ValueError, match="min and/or max"):
        check_constraints(df, [{"kind": "range", "col": "id"}])


# ---------------------------------------------------------------------------
# Z-order layout (operators/layout.py)
# ---------------------------------------------------------------------------


def _morton2_py(a, b):
    z = 0
    for bit in range(32):
        z |= ((a >> bit) & 1) << (2 * bit)
        z |= ((b >> bit) & 1) << (2 * bit + 1)
    return z


def test_zorder_key_matches_reference_bit_interleave(spark):
    from pidb_rdf_spark.operators.layout import zorder_key

    rows = [(i, (i * 7919) % 100_000, (i * 104729) % 100_000) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {
        r["id"]: r["z"]
        for r in df.select("id", zorder_key(["x", "y"]).alias("z")).collect()
    }
    for i, x, y in rows:
        assert got[i] == _morton2_py(x, y), (i, x, y)


def test_zorder_key_three_columns(spark):
    from pidb_rdf_spark.operators.layout import zorder_key

    df = spark.createDataFrame([(1, 1, 0, 0), (2, 0, 1, 0), (3, 0, 0, 1)],
                               "id long, a long, b long, c long")
    got = {r["id"]: r["z"] for r in df.select(
        "id", zorder_key(["a", "b", "c"]).alias("z")).collect()}
    assert got == {1: 1, 2: 2, 3: 4}  # bit 0 of each col -> positions 0/1/2
    import pytest as _pytest

    with _pytest.raises(ValueError, match="2 or 3"):
        zorder_key(["a"])


def test_zorder_layout_tightens_both_column_ranges(spark):
    """The point of Z-order: per-chunk min/max spans shrink on BOTH
    dimensions vs a single-column sort (which leaves the other
    column's span at ~full width in every chunk)."""
    from pidb_rdf_spark.operators.layout import zorder_layout

    n, chunks = 4096, 16
    df = spark.createDataFrame(
        [(i, (i * 7919) % 1024, (i * 104729) % 1024) for i in range(n)],
        "id long, x long, y long",
    )

    def mean_y_span(frame):
        import statistics

        spans = [
            (r["mx"] - r["mn"])
            for r in frame.withColumn("__p", F.spark_partition_id())
            .groupBy("__p")
            .agg(F.min("y").alias("mn"), F.max("y").alias("mx"))
            .collect()
        ]
        return statistics.mean(spans)

    zordered = zorder_layout(df, ["x", "y"], n_files=chunks)
    xsorted = df.repartitionByRange(chunks, "x").sortWithinPartitions("x")
    assert mean_y_span(zordered) < 0.6 * mean_y_span(xsorted)


def test_leakage_free_split_components_stay_together(spark):
    import hashlib

    from pidb_rdf_spark.operators.curation import leakage_free_split

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(100)], "doc_id long, text string"
    )
    # dup chains: (0,1),(1,2) one family; (10,11) another
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "a long, b long"
    )
    got = leakage_free_split(docs, pairs, val_fraction=0.3).collect()
    by_id = {r["doc_id"]: (r["split_group"], r["split"]) for r in got}
    # transitive family shares group AND side
    assert by_id[0] == by_id[1] == by_id[2]
    assert by_id[10] == by_id[11]
    assert by_id[0][0] == 0 and by_id[10][0] == 10
    # singletons: group = own id, side = md5 decision
    def side(g):
        h = int(hashlib.md5(f"split{g}".encode()).hexdigest()[:8], 16)
        return "val" if h < int(0.3 * (1 << 32)) else "train"

    for i in range(100):
        assert by_id[i][1] == side(by_id[i][0]), i
    # both sides are populated at 30%
    sides = {s for _g, s in by_id.values()}
    assert sides == {"train", "val"}


def test_random_projection_exact_replay_and_distance_preservation(spark, emb):
    import numpy as np

    from pidb_rdf_spark.operators.quantize import jl_matrix, random_projection

    sample = emb.limit(60)
    rows = sample.collect()
    in_dim = len(rows[0]["embedding"])
    out = random_projection(sample, out_dim=16)
    got = {r["vec_id"]: np.array(r["embedding"]) for r in out.collect()}
    m = jl_matrix(in_dim, 16)
    for r in rows:
        want = np.asarray(r["embedding"], dtype=np.float64) @ m.T
        assert np.allclose(got[r["vec_id"]], want), r["vec_id"]
    # JL property (loose): relative pairwise-distance distortion is
    # bounded on average for this out_dim
    ids = [r["vec_id"] for r in rows[:20]]
    orig = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in rows[:20]}
    dists = []
    for i in range(0, 18, 2):
        a, b = ids[i], ids[i + 1]
        d0 = np.linalg.norm(orig[a] - orig[b])
        d1 = np.linalg.norm(got[a] - got[b])
        if d0 > 0:
            dists.append(d1 / d0)
    assert 0.5 < sum(dists) / len(dists) < 1.5
    import pytest as _pytest

    with _pytest.raises(ValueError, match="out_dim"):
        random_projection(sample, out_dim=0)


def test_blocklist_hits_counts_and_flag(spark):
    from pidb_rdf_spark.operators.text import blocklist_hits

    df = spark.createDataFrame(
        [
            (1, "clean words only here"),
            (2, "one BAD word"),
            (3, "bad bad worse bad"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_blocked"], round(r["blocked_frac"], 4), r["blocklist_ok"])
        for r in blocklist_hits(df, ["bad", "worse"]).collect()
    }
    assert got[1] == (0, 0.0, True)
    assert got[2] == (1, round(1 / 3, 4), False)   # case-insensitive
    assert got[3] == (4, 1.0, False)
    assert got[4] == (0, 0.0, True)                # empty text safe
    # tolerance threshold
    lax = {
        r["doc_id"]: r["blocklist_ok"]
        for r in blocklist_hits(df, ["bad"], max_frac=0.4).collect()
    }
    assert lax[2] is True and lax[3] is False
    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-empty"):
        blocklist_hits(df, [])
    with _pytest.raises(ValueError, match="whitespace"):
        blocklist_hits(df, ["two words"])


def test_write_training_shards_layout(spark, tmp_path):
    import os

    from pidb_rdf_spark.operators.mixing import (
        deterministic_shuffle,
        write_training_shards,
    )

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(300)], "doc_id long, text string"
    )
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, n_shards=4)
    dirs = sorted(d for d in os.listdir(path) if d.startswith("shard="))
    assert dirs == [f"shard={i}" for i in range(4)]
    back = spark.read.parquet(path)
    assert back.count() == 300
    # the written permutation equals the operator's output exactly
    want = {
        (r["doc_id"], r["shard"], r["seq"])
        for r in deterministic_shuffle(docs, 4).collect()
    }
    got = {(r["doc_id"], r["shard"], r["seq"]) for r in back.collect()}
    assert got == want
    # within one shard file, rows are physically seq-ordered
    one = spark.read.parquet(path + "/shard=0").collect()
    seqs = [r["seq"] for r in one]
    assert seqs == sorted(seqs)


# ---------------------------------------------------------------------------
# heavy_hitters: Misra-Gries candidates + exact recount
# ---------------------------------------------------------------------------


def test_mg_insert_bounds():
    """Pure-python MG invariants on an adversarial weighted stream:
    estimates never overcount, undercount respects the discarded-mass
    bound, and every above-threshold item survives."""
    import random

    from pidb_rdf_spark.operators.sketch import _mg_insert

    rng = random.Random(7)
    for cap in (4, 16, 64):
        sketch, discarded = {}, 0
        truth = {}
        # zipf-ish head + long uniform tail + adversarial burst
        stream = (
            [(f"h{i}", rng.randint(50, 80)) for i in range(3) for _ in range(20)]
            + [(f"t{rng.randint(0, 500)}", rng.randint(1, 3)) for _ in range(2000)]
            + [("burst", 5000)]
        )
        rng.shuffle(stream)
        for item, w in stream:
            truth[item] = truth.get(item, 0) + w
            discarded += _mg_insert(sketch, item, w, cap)
        n = sum(truth.values())
        assert len(sketch) <= cap
        max_under = discarded / (cap + 1)
        assert discarded <= n  # the mass accounting closes
        for item, true_cnt in truth.items():
            est = sketch.get(item, 0)
            assert est <= true_cnt  # MG never overcounts
            assert true_cnt - est <= max_under + 1e-9
            if true_cnt > n / (cap + 1):  # the survival guarantee
                assert item in sketch, (cap, item, true_cnt, n)


def test_heavy_hitters_exact_on_planted_heads(spark):
    """2000-key tail + planted heads, capacity far below the distinct
    count: all guaranteed rows must equal the exact oracle ranks."""
    import random
    from collections import Counter

    from pidb_rdf_spark.operators import heavy_hitters

    rng = random.Random(11)
    vals = ["head_a"] * 3000 + ["head_b"] * 2500 + ["head_c"] * 2000
    vals += [f"tail_{rng.randint(0, 1999)}" for _ in range(4000)]
    rng.shuffle(vals)
    df = spark.createDataFrame(
        [(v,) for v in vals], "item string"
    ).repartition(8)
    got = heavy_hitters(df, "item", k=3, capacity=32).collect()
    truth = Counter(vals)
    want = sorted(truth.items(), key=lambda t: (-t[1], t[0]))[:3]
    assert all(r.guaranteed for r in got)
    assert [(r.item, r.cnt) for r in got] == want


def test_heavy_hitters_exact_when_distinct_fits(spark):
    """distinct <= capacity: MG never decrements, so the answer is
    the exact top-k for ANY distribution (uniform worst case)."""
    from collections import Counter

    vals = [i % 37 for i in range(1110)]  # near-uniform ints
    from pidb_rdf_spark.operators import heavy_hitters

    df = spark.createDataFrame([(v,) for v in vals], "item int").repartition(5)
    got = heavy_hitters(df, "item", k=10, capacity=64).collect()
    truth = Counter(vals)
    want = sorted(truth.items(), key=lambda t: (-t[1], t[0]))[:10]
    assert [(r.item, r.cnt) for r in got] == want


def test_heavy_hitters_ignores_nulls_and_validates(spark):
    import pytest as _pytest

    from pidb_rdf_spark.operators import heavy_hitters

    df = spark.createDataFrame(
        [("a",), (None,), ("a",), ("b",), (None,)], "item string"
    )
    got = heavy_hitters(df, "item", k=5, capacity=8).collect()
    assert [(r.item, r.cnt) for r in got] == [("a", 2), ("b", 1)]
    with _pytest.raises(ValueError):
        heavy_hitters(df, "item", k=0)
    with _pytest.raises(ValueError):
        heavy_hitters(df, "item", k=9, capacity=8)


# ---------------------------------------------------------------------------
# weighted_sample: deterministic Efraimidis-Spirakis
# ---------------------------------------------------------------------------


def _es_oracle(rows, salt, n):
    """hashlib replay of the A-ES draw: smallest -ln(u)/w keys."""
    import hashlib
    import math

    scored = []
    for key, w in rows:
        if w is None or w <= 0:
            continue
        h = int(
            hashlib.md5(f"{salt}:{key}".encode()).hexdigest()[:13], 16
        )
        u = (h + 1) / float((1 << 52) + 1)
        scored.append((round(-math.log(u) / w, 9), key, w))
    scored.sort()
    return [(k, w) for _, k, w in scored[:n]]


def test_weighted_sample_exact_replay(spark):
    """The Spark sample IS the hashlib oracle's sample — bit-level
    determinism across engines (two salts, with nulls and zero
    weights excluded)."""
    from pidb_rdf_spark.operators import weighted_sample

    rows = [(f"d{i}", float(1 + (i * 7) % 13)) for i in range(200)]
    rows += [("null_w", None), ("zero_w", 0.0), ("neg_w", -2.0)]
    df = spark.createDataFrame(rows, "doc_id string, quality double")
    for salt in ("s1", "s2"):
        got = [
            (r.doc_id, r.quality)
            for r in weighted_sample(
                df, "doc_id", "quality", n=25, salt=salt
            ).collect()
        ]
        assert got == _es_oracle(rows, salt, 25)
        assert all(k not in ("null_w", "zero_w", "neg_w") for k, _ in got)


def test_weighted_sample_inclusion_proportional_to_weight():
    """Statistical contract, checked on the hashlib twin (no Spark
    round-trips): an item with 9x the weight wins the n=1 draw ~90%
    of the time over 500 salts."""
    rows = [("heavy", 9.0), ("light", 1.0)]
    wins = sum(
        1
        for i in range(500)
        if _es_oracle(rows, f"salt{i}", 1)[0][0] == "heavy"
    )
    assert 420 <= wins <= 480  # binomial(500, .9): +-4 sigma


def test_weighted_sample_validates(spark):
    import pytest as _pytest

    from pidb_rdf_spark.operators import weighted_sample

    df = spark.createDataFrame([("a", 1.0)], "doc_id string, w double")
    with _pytest.raises(ValueError):
        weighted_sample(df, "doc_id", "w", n=0)


# ---------------------------------------------------------------------------
# quantile_band_filter
# ---------------------------------------------------------------------------


def test_quantile_band_filter_exact_per_group(spark):
    """Exact tier vs a numpy-free python oracle: RANK-INTERVAL band
    per group (keep iff [#below/n, (#below+#eq)/n] intersects the
    band), ties kept or dropped together, NULLs never pass — and the
    small-group contract: 1- and 2-row groups SURVIVE the default
    band (a percent_rank band would erase them)."""
    rows = []
    for g, n in (("a", 20), ("b", 7)):
        rows += [(g, float(i % 10)) for i in range(n)]  # ties galore
    rows += [("a", None), ("solo", 42.0), ("duo", 1.0), ("duo", 2.0)]
    df = spark.createDataFrame(rows, "lang string, quality double")
    from pidb_rdf_spark.operators import quantile_band_filter

    got = sorted(
        (r.lang, r.quality)
        for r in quantile_band_filter(
            df, "quality", by="lang", lower=0.2, upper=0.8
        ).collect()
    )

    def oracle():
        from collections import defaultdict

        groups = defaultdict(list)
        for g, v in rows:
            if v is not None:
                groups[g].append(v)
        keep = []
        for g, vs in groups.items():
            n = len(vs)
            for v in vs:
                below = sum(1 for x in vs if x < v)
                eq = sum(1 for x in vs if x == v)
                if below / n <= 0.8 and (below + eq) / n >= 0.2:
                    keep.append((g, v))
        return sorted(keep)

    assert got == oracle()
    assert all(v is not None for _, v in got)
    # small groups survive: the singleton covers [0,1], both duo
    # rows cover a half that intersects [0.2, 0.8]
    assert ("solo", 42.0) in got
    assert ("duo", 1.0) in got and ("duo", 2.0) in got


def test_quantile_band_filter_null_group_keys_both_tiers(spark):
    """Rows whose GROUP KEY is NULL are dropped identically by both
    tiers (ADVICE r9: the approx tier's inner join dropped them while
    the exact tier's window banded the NULL group)."""
    from pidb_rdf_spark.operators import quantile_band_filter

    rows = [("a", float(i)) for i in range(1, 21)]
    rows += [(None, 5.0), (None, 500.0)]
    df = spark.createDataFrame(rows, "lang string, quality double")
    exact = quantile_band_filter(
        df, "quality", by="lang", lower=0.0, upper=1.0
    ).collect()
    approx = quantile_band_filter(
        df, "quality", by="lang", lower=0.0, upper=1.0, approx=True
    ).collect()
    assert all(r.lang is not None for r in exact)
    assert all(r.lang is not None for r in approx)
    assert len(exact) == len(approx) == 20


def test_quantile_band_filter_global_exact_warns(spark):
    """by=None + approx=False is a single-task global sort -> warns
    (the approx tier is the scale path), mirroring the Cypher
    cartesian guard."""
    import warnings

    from pidb_rdf_spark.operators import quantile_band_filter

    df = spark.createDataFrame([(float(i),) for i in range(10)], "x double")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = quantile_band_filter(df, "x", lower=0.0, upper=1.0)
        assert any("ONE task" in str(x.message) for x in w)
    assert out.count() == 10
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        quantile_band_filter(df, "x", lower=0.0, upper=1.0, approx=True)
        assert not any("ONE task" in str(x.message) for x in w)


def test_quantile_band_filter_approx_tier(spark):
    """Approx tier: bounds from approx_percentile, inclusive value
    filter; on data where the quantiles are unambiguous it matches
    the exact band."""
    vals = [float(i) for i in range(1, 101)]
    df = spark.createDataFrame([(v,) for v in vals], "x double").repartition(4)
    from pidb_rdf_spark.operators import quantile_band_filter

    got = sorted(
        r.x
        for r in quantile_band_filter(
            df, "x", lower=0.1, upper=0.9, approx=True
        ).collect()
    )
    assert got[0] >= 9.0 and got[-1] <= 91.0  # sketch is near-exact here
    assert len(got) >= 79
    import pytest as _pytest

    with _pytest.raises(ValueError):
        quantile_band_filter(df, "x", lower=0.9, upper=0.1)


# ---------------------------------------------------------------------------
# resize_png / audio_features: real decode-stage transforms
# ---------------------------------------------------------------------------


def test_resize_png_nearest_neighbor_exact(spark):
    """4x4 grayscale with distinct cell values -> 2x2 NN resize must
    pick the center-aligned sources exactly (indices 1 and 3)."""
    import numpy as np

    from pidb_rdf_spark.operators import resize_png

    px = bytes(range(16))  # 4x4, value = y*4 + x
    png = _make_png(4, 4, px, color_type=0)
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(b"not a png"))],
        "media_id long, content binary",
    )
    rows = {r.media_id: r for r in resize_png(df, 2, 2).collect()}
    got = np.frombuffer(bytes(rows[1].pixels), dtype=np.uint8).reshape(2, 2)
    # src index = floor((i + 0.5) * 4 / 2) = 1, 3
    assert got.tolist() == [[5, 7], [13, 15]]
    assert rows[1].channel_means == [float(got.mean())]
    assert rows[2].pixels is None  # undecodable keeps its id row


def test_resize_png_upscale_rgb(spark):
    import numpy as np

    from pidb_rdf_spark.operators import resize_png

    # 1x2 RGB: left red, right blue -> 2x4 upscale replicates columns
    px = bytes([255, 0, 0, 0, 0, 255])
    png = _make_png(2, 1, px, color_type=2)
    df = spark.createDataFrame(
        [(1, bytearray(png))], "media_id long, content binary"
    )
    r = resize_png(df, 4, 2).collect()[0]
    a = np.frombuffer(bytes(r.pixels), dtype=np.uint8).reshape(2, 4, 3)
    assert a[:, :2].tolist() == [[[255, 0, 0]] * 2] * 2
    assert a[:, 2:].tolist() == [[[0, 0, 255]] * 2] * 2
    import pytest as _pytest

    with _pytest.raises(ValueError):
        resize_png(df, 0, 2)


def test_audio_features_sine_analytics(spark):
    """440 Hz sine at 8 kHz: ZCR = 2*440/8000 crossings/frame and
    spectral centroid ~= 440 Hz (energy in one rFFT bin); a stereo
    blob with silence on channel 1 gets rms 0 there."""
    import math

    import numpy as np

    from pidb_rdf_spark.operators import audio_features

    sr, n, f = 8000, 8000, 440.0
    t = np.arange(n) / sr
    sine = 0.5 * np.sin(2 * math.pi * f * t)
    stereo = np.zeros(2 * n)
    stereo[0::2] = sine  # interleaved: ch0 sine, ch1 silence
    df = spark.createDataFrame(
        [
            (1, bytearray(_wav_blob(sine, rate=sr))),
            (2, bytearray(_wav_blob(stereo, channels=2, rate=sr))),
            (3, bytearray(b"RIFFjunk")),
        ],
        "media_id long, content binary",
    )
    rows = {(r.media_id, r.channel): r for r in audio_features(df).collect()}
    s = rows[(1, 0)]
    assert s.rms == pytest.approx(0.5 / math.sqrt(2), rel=1e-3)
    assert s.zero_crossing_rate == pytest.approx(2 * f / sr, rel=0.01)
    assert s.spectral_centroid_hz == pytest.approx(f, rel=0.01)
    assert rows[(2, 0)].spectral_centroid_hz == pytest.approx(f, rel=0.01)
    assert rows[(2, 1)].rms == 0.0
    assert rows[(3, None)].rms is None  # undecodable row kept


# ---------------------------------------------------------------------------
# skew_report
# ---------------------------------------------------------------------------


def test_skew_report_exact_vs_oracle(spark):
    """Planted 40% hot key: per-key rows and the summary row match a
    python oracle; NULL keys excluded."""
    rows = (
        [("hot",)] * 40 + [("warm",)] * 20
        + [(f"cold{i}",) for i in range(40)] + [(None,)] * 5
    )
    df = spark.createDataFrame(rows, "k string").repartition(4)
    from pidb_rdf_spark.operators import skew_report

    got = skew_report(df, "k", top_k=3).orderBy(
        F.col("rank").asc_nulls_last()
    ).collect()
    per_key = [r for r in got if r.key is not None]
    summ = [r for r in got if r.key is None][0]
    assert [(r.key, r.cnt, r.rank) for r in per_key] == [
        ("hot", 40, 1), ("warm", 20, 2), ("cold0", 1, 3)
    ]
    n, d = 100, 42
    assert per_key[0].share == round(40 / n, 6)
    assert per_key[2].running_share == round(61 / n, 6)
    assert summ.n_rows == n and summ.n_distinct == d
    assert summ.share == round(40 / n, 6)  # top1_share
    assert summ.running_share == round(61 / n, 6)  # topk_share
    assert summ.skew_ratio == round(40.0 * d / n, 6)


def test_skew_report_approx_tier_matches_heads(spark):
    """Approx tier: MG candidates + exact recount give the same heavy
    keys and counts; only n_distinct is the HLL estimate."""
    rows = [("hot",)] * 500 + [(f"c{i % 200}",) for i in range(1000)]
    df = spark.createDataFrame(rows, "k string").repartition(8)
    from pidb_rdf_spark.operators import skew_report

    exact = {
        r.key: (r.cnt, r.share)
        for r in skew_report(df, "k", top_k=2).collect()
        if r.key
    }
    approx = {
        r.key: (r.cnt, r.share)
        for r in skew_report(df, "k", top_k=2, approx=True).collect()
        if r.key
    }
    assert exact == approx  # counts are exact in both tiers
    import pytest as _pytest

    with _pytest.raises(ValueError):
        skew_report(df, "k", top_k=0)


# ---------------------------------------------------------------------------
# strip_html
# ---------------------------------------------------------------------------


def test_extract_html_text_pure():
    from pidb_rdf_spark.operators.text import _extract_html_text

    html = (
        "<html><head><title>T</title><style>p{color:red}</style>"
        "<script>var x = '<p>not text</p>';</script></head>"
        "<body><h1>Header</h1><p>One &amp; two.</p>"
        "<div>Three<br>four</div>"
        "<ul><li>a</li><li>b</li></ul>"
        "<noscript>hidden</noscript>"
        "<p>spaced   out</p></body></html>"
    )
    got = _extract_html_text(html)
    assert got.split("\n") == [
        "T", "Header", "One & two.", "Three", "four", "a", "b",
        "spaced out",
    ]
    # script/style/noscript content is gone
    assert "not text" not in got and "color" not in got
    # malformed markup degrades, never raises
    assert _extract_html_text("<p>ok <b>bold") == "ok bold"
    assert _extract_html_text("<<<>>&bogus; plain") != ""


def test_strip_html_dataframe(spark):
    from pidb_rdf_spark.operators import strip_html

    df = spark.createDataFrame(
        [
            (1, "<p>Hello <b>world</b></p><script>x</script>"),
            (2, None),
            (3, "plain text, no markup"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.plain_text for r in strip_html(df).collect()}
    assert got[1] == "Hello world"
    assert got[2] is None
    assert got[3] == "plain text, no markup"
    # original columns survive
    assert set(strip_html(df).columns) == {"doc_id", "text", "plain_text"}


# ---------------------------------------------------------------------------
# bpe_encode
# ---------------------------------------------------------------------------


def test_bpe_word_merge_order():
    """Merges apply by RANK, not left-to-right: with ranks
    (e,s)<(s,t), 'test' becomes t + es + t</w> at step limits."""
    from pidb_rdf_spark.operators.text import _bpe_word

    ranks = {("e", "s"): 0, ("s", "t"): 1, ("t", "es"): 2,
             ("t", "</w>"): 3, ("tes", "t</w>"): 4}
    got = _bpe_word("test", ranks, {})
    # e+s -> es; t+es -> tes; t+</w> -> t</w>; tes+t</w> -> test</w>
    assert got == ["test</w>"]
    assert _bpe_word("set", ranks, {}) == ["s", "e", "t</w>"]
    # unknown word: plain characters + end marker
    assert _bpe_word("xy", ranks, {}) == ["x", "y", "</w>"]


def test_bpe_encode_counts_and_tokens(spark):
    from pidb_rdf_spark.operators import bpe_encode

    merges = [("e", "s"), ("s", "t"), ("t", "es"), ("t", "</w>"),
              ("tes", "t</w>")]
    df = spark.createDataFrame(
        [(1, "Test test SET"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in bpe_encode(
        df, merges, emit_tokens=True
    ).collect()}
    # 'test' -> 1 token twice, 'set' -> 3 tokens
    assert got[1].n_bpe_tokens == 5
    assert got[1].bpe_tokens == [
        "test</w>", "test</w>", "s", "e", "t</w>"
    ]
    assert got[2].n_bpe_tokens is None
    assert got[3].n_bpe_tokens == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bpe_encode(df, merges + [("e", "s")])


def test_text_output_column_clash_guards(spark):
    """strip_html / bpe_encode raise on inputs that already carry
    their output columns (the reserved-column convention the sibling
    ops follow), instead of yielding a duplicate-name schema."""
    import pytest as _pytest

    from pidb_rdf_spark.operators import bpe_encode, strip_html

    df = spark.createDataFrame(
        [(1, "<p>x</p>", "y")], "doc_id long, text string, plain_text string"
    )
    with _pytest.raises(ValueError, match="plain_text"):
        strip_html(df)
    assert strip_html(df, out_col="clean").columns[-1] == "clean"
    df2 = spark.createDataFrame(
        [(1, "a b", 7)], "doc_id long, text string, n_bpe_tokens long"
    )
    with _pytest.raises(ValueError, match="n_bpe_tokens"):
        bpe_encode(df2, [("a", "b")])
    df3 = spark.createDataFrame(
        [(1, "a b", ["x"])],
        "doc_id long, text string, bpe_tokens array<string>",
    )
    with _pytest.raises(ValueError, match="bpe_tokens"):
        bpe_encode(df3, [("a", "b")], emit_tokens=True)
    # without emit_tokens an existing bpe_tokens column is NOT reserved
    assert "n_bpe_tokens" in bpe_encode(df3, [("a", "b")]).columns


def test_bpe_encode_matches_python_twin(spark):
    """Random words + random merge table: distributed counts equal a
    pure-python replay (the determinism contract)."""
    import random

    from pidb_rdf_spark.operators import bpe_encode
    from pidb_rdf_spark.operators.text import _bpe_word

    rng = random.Random(3)
    alpha = "abcd"
    words = ["".join(rng.choice(alpha) for _ in range(rng.randint(1, 8)))
             for _ in range(300)]
    pairs = set()
    while len(pairs) < 30:
        pairs.add((rng.choice(alpha), rng.choice(alpha)))
        pairs.add((rng.choice(alpha) + rng.choice(alpha), rng.choice(alpha)))
    merges = sorted(pairs)
    rng.shuffle(merges)
    docs = [" ".join(words[i::7]) for i in range(7)]
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    ).repartition(4)
    ranks = {p: i for i, p in enumerate(merges)}
    want = {
        i: sum(len(_bpe_word(w, ranks, {})) for w in d.split())
        for i, d in enumerate(docs)
    }
    got = {
        r.doc_id: r.n_bpe_tokens for r in bpe_encode(df, merges).collect()
    }
    assert got == want


def test_weighted_sample_per_group(spark):
    """by= draws n winners independently per stratum; each group's
    winners replay the hashlib oracle restricted to that group."""
    from pidb_rdf_spark.operators import weighted_sample

    rows = [
        (f"d{i}", float(1 + i % 5), "en" if i % 3 else "fr")
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id string, q double, lang string")
    got = {}
    for r in weighted_sample(
        df, "doc_id", "q", n=7, salt="g1", by="lang"
    ).collect():
        got.setdefault(r.lang, []).append((r.doc_id, r.q))
    for lang in ("en", "fr"):
        grp = [(d, q) for d, q, lg in rows if lg == lang]
        assert sorted(got[lang]) == sorted(_es_oracle(grp, "g1", 7))


def _bpe_train_twin(texts, n_merges, min_pair_count=2):
    """Pure-python subword-nmt trainer (lexicographic tie-break)."""
    from collections import Counter

    vocab = Counter()
    for t in texts:
        for w in t.lower().split():
            vocab[tuple(list(w) + ["</w>"])] += 1
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b), _ = best
        merges.append((a, b))
        nv = Counter()
        for syms, f in vocab.items():
            syms = list(syms)
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [a + b]
                else:
                    i += 1
            nv[tuple(syms)] += f
        vocab = nv
    return merges


def test_bpe_train_matches_python_twin(spark):
    """Distributed training replays the subword-nmt twin exactly
    (same merges, same order), and the learned table round-trips
    through bpe_encode."""
    import random

    from pidb_rdf_spark.operators import bpe_encode, bpe_train

    rng = random.Random(17)
    words = ["low", "lower", "lowest", "newer", "new", "wider"]
    texts = [
        " ".join(rng.choice(words) for _ in range(20)) for _ in range(12)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).repartition(4)
    merges = bpe_train(df, n_merges=12)  # driver tier (type table fits)
    assert merges == _bpe_train_twin(texts, 12)
    # tier parity: forcing the distributed rounds (driver_cap=0) and
    # an overflow-probe fallback (cap smaller than the type count)
    # must both yield the identical table
    assert bpe_train(df, n_merges=12, driver_cap=0) == merges
    assert bpe_train(df, n_merges=12, driver_cap=3) == merges
    assert len(merges) >= 8  # the corpus supports many merges
    # the learned table drives the encoder: frequent whole words
    # collapse to few tokens
    enc = {
        r.doc_id: r.n_bpe_tokens for r in bpe_encode(df, merges).collect()
    }
    assert all(v > 0 for v in enc.values())
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bpe_train(df, n_merges=0)


def test_bpe_train_min_pair_floor(spark):
    """Training stops when no pair reaches min_pair_count."""
    from pidb_rdf_spark.operators import bpe_train

    df = spark.createDataFrame([(1, "ab cd ef")], "id long, text string")
    merges = bpe_train(df, n_merges=50, min_pair_count=2)
    assert merges == []  # every pair occurs once
    merges1 = bpe_train(df, n_merges=3, min_pair_count=1)
    assert len(merges1) == 3


def test_url_normalize_contract(spark):
    """Canonicalization applies the documented steps: case, default
    ports, fragment, tracking params, param sort, trailing slash;
    malformed (scheme-less) input normalizes to NULL."""
    from pidb_rdf_spark.operators import url_normalize

    rows = [
        (1, "  HTTPS://Example.COM:443/a/b/?utm_source=x&z=2&a=1#frag  "),
        (2, "http://example.com:80"),
        (3, "http://example.com:8080/path//"),
        (4, "https://example.com/?fbclid=abc&UTM_CAMPAIGN=y"),
        (5, "example.com/no-scheme"),
        (6, "ftp://Host.Example.com:21/File.TXT"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r.doc_id: r.url_norm for r in url_normalize(df).collect()}
    assert got[1] == "https://example.com/a/b?a=1&z=2"
    assert got[2] == "http://example.com/"
    assert got[3] == "http://example.com:8080/path"
    assert got[4] == "https://example.com/"  # tracking-only query drops
    assert got[5] is None
    # non-http(s) schemes keep their port; path case preserved
    assert got[6] == "ftp://host.example.com:21/File.TXT"
    # strip_www option
    got2 = {
        r.doc_id: r.url_norm
        for r in url_normalize(
            spark.createDataFrame(
                [(1, "https://WWW.Example.com/x")], "doc_id long, url string"
            ),
            strip_www=True,
        ).collect()
    }
    assert got2[1] == "https://example.com/x"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="reserved"):
        url_normalize(df.withColumn("url_norm", F.lit("x")))


def test_registrable_domain(spark):
    """Public-suffix-list registrable domains (r12): multi-label
    suffixes group at the registrable level (example.co.uk, not
    co.uk), wildcards and exceptions follow the publicsuffix.org
    algorithm, unlisted TLDs take the default last-two-labels rule,
    hosts that ARE a public suffix (or single labels) return
    themselves; full URLs and ports still accepted."""
    from pidb_rdf_spark.operators import registrable_domain_col

    cases = {
        1: ("https://a.b.Example.com:8443/x?q=1", "example.com"),
        2: ("news.example.org", "example.org"),
        3: ("localhost:9000", "localhost"),
        # multi-label ICANN suffixes (the r11 over-trim fix)
        4: ("www.example.co.uk", "example.co.uk"),
        5: ("EXAMPLE.CO.UK.", "example.co.uk"),
        6: ("shop.foo.com.au", "foo.com.au"),
        7: ("www.pref.tokyo.jp", "pref.tokyo.jp"),
        8: ("k12-site.schools.k12.ca.us", "schools.k12.ca.us"),
        # wildcard rule *.kawasaki.jp: the child IS a public suffix
        9: ("foo.kawasaki.jp", "foo.kawasaki.jp"),
        10: ("bar.foo.kawasaki.jp", "bar.foo.kawasaki.jp"),
        # exception rule !city.kawasaki.jp beats the wildcard
        11: ("www.city.kawasaki.jp", "city.kawasaki.jp"),
        12: ("www.www.ck", "www.ck"),
        # private-section hosting suffixes: per-publisher grouping
        13: ("someblog.blogspot.com", "someblog.blogspot.com"),
        14: ("https://user.github.io/repo", "user.github.io"),
        # a host that IS a public suffix returns itself
        15: ("co.uk", "co.uk"),
        16: ("com", "com"),
        # userinfo strips before label work
        17: ("https://u:p@www.shop.example.co.uk:443/", "example.co.uk"),
    }
    df = spark.createDataFrame(
        [(k, v[0]) for k, v in cases.items()], "id long, u string"
    )
    got = {
        r.id: r.d
        for r in df.select(
            "id", registrable_domain_col(F.col("u")).alias("d")
        ).collect()
    }
    assert got == {k: v[1] for k, v in cases.items()}
    # user-supplied full PSL rules override the snapshot (verbatim
    # .dat lines: comments skipped, wildcard + exception syntax)
    custom = ["// test rules", "zz", "two.zz", "*.wild.zz", "!ok.wild.zz"]
    df2 = spark.createDataFrame(
        [(1, "a.two.zz"), (2, "b.x.wild.zz"), (3, "www.ok.wild.zz"),
         (4, "plain.zz")],
        "id long, u string",
    )
    got2 = {
        r.id: r.d
        for r in df2.select(
            "id", registrable_domain_col(F.col("u"), psl=custom).alias("d")
        ).collect()
    }
    assert got2 == {1: "a.two.zz", 2: "b.x.wild.zz", 3: "ok.wild.zz",
                    4: "plain.zz"}


def test_url_dedup_and_cap_per_domain(spark):
    """url_dedup keeps the min id per canonical URL and excludes
    NULLs; cap_per_domain keeps exactly cap rows per domain,
    deterministically (same salt replays on any partitioning,
    a different salt draws differently)."""
    from pidb_rdf_spark.operators import (
        cap_per_domain,
        url_dedup,
        url_normalize,
    )

    rows = [
        (10, "https://a.com/p?utm_source=x"),
        (11, "https://A.COM/p/"),
        (12, "https://a.com/q"),
        (13, "not a url"),
    ]
    df = url_normalize(
        spark.createDataFrame(rows, "doc_id long, url string")
    )
    d = {r.url_norm: (r.keep_id, r.n_dups) for r in url_dedup(df).collect()}
    assert d == {
        "https://a.com/p": (10, 2),
        "https://a.com/q": (12, 1),
    }
    big = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("d"), (F.col("id") % 3).cast("string"), F.lit(".com")
        ).alias("domain"),
    )
    kept = cap_per_domain(big, "domain", cap=5)
    per = {
        r.domain: r.n
        for r in kept.groupBy("domain").agg(F.count("*").alias("n")).collect()
    }
    assert per == {"d0.com": 5, "d1.com": 5, "d2.com": 5}
    again = sorted(r.doc_id for r in cap_per_domain(
        big.repartition(13), "domain", cap=5).collect())
    assert again == sorted(r.doc_id for r in kept.collect())
    other = sorted(r.doc_id for r in cap_per_domain(
        big, "domain", cap=5, salt="other").collect())
    assert other != again
    import pytest as _pytest

    with _pytest.raises(ValueError):
        cap_per_domain(big, "domain", cap=0)


def test_url_pct_normalization(spark):
    """RFC 3986 §6.2.2: percent-escapes of unreserved characters
    decode (%7E ≡ ~, %41 ≡ A), remaining escapes uppercase their hex
    digits (%3a ≡ %3A), reserved escapes do NOT decode (%2F stays an
    escape — decoding it would change path structure), dangling or
    short escapes pass through untouched."""
    from pidb_rdf_spark.operators import url_normalize

    rows = [
        (1, "https://example.com/%7Euser/"),
        (2, "https://example.com/~user"),
        (3, "https://example.com/a%2Fb"),     # reserved: keep escape
        (4, "https://example.com/a%2fb"),     # ...but uppercase hex
        (5, "https://example.com/%41%62c"),   # decode unreserved
        (6, "https://example.com/100%"),      # dangling %
        (7, "https://example.com/x%4"),       # short escape
        (8, "https://EX%41MPLE.com/p"),       # decode + host lowercase
        (9, "https://example.com/?b=%7e&a=%3c"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r.doc_id: r.url_norm for r in url_normalize(df).collect()}
    assert got[1] == got[2] == "https://example.com/~user"
    assert got[3] == got[4] == "https://example.com/a%2Fb"
    assert got[5] == "https://example.com/Abc"
    assert got[6] == "https://example.com/100%"
    assert got[7] == "https://example.com/x%4"
    assert got[8] == "https://example.com/p"
    # params sort AFTER normalization; %7e decodes, %3c uppercases
    assert got[9] == "https://example.com/?a=%3C&b=~"


def test_cap_per_domain_two_pass(spark):
    """The hot-domain tier is output-identical to the exact one-pass
    window (every survivor's draw is below every non-survivor's), the
    hot window's input is pre-filtered (plan carries the draw
    threshold against the 52-bit space), and the result replays on
    any partitioning."""
    from pidb_rdf_spark.operators import cap_per_domain

    big = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        # one monster domain (2901 rows) + 99 singleton domains
        F.when(F.col("id") < 2901, F.lit("hot.com"))
        .otherwise(F.concat(F.lit("c"), F.col("id").cast("string"),
                            F.lit(".com")))
        .alias("domain"),
    )
    one_pass = cap_per_domain(big, "domain", cap=3, hot_threshold=10**9)
    two_pass = cap_per_domain(big, "domain", cap=3, hot_threshold=1000)
    assert sorted(r.doc_id for r in two_pass.collect()) == sorted(
        r.doc_id for r in one_pass.collect()
    )
    per = {
        r.domain: r.n
        for r in two_pass.groupBy("domain")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert per["hot.com"] == 3 and len(per) == 100
    # plan pin: the pre-filter (draw < fraction-of-2^52) sits below
    # the hot window — the window never sorts the full hot domain
    plan = two_pass._jdf.queryExecution().optimizedPlan().toString()
    # 2^52 (4.503599627370496e15) appears only in the draw threshold;
    # Catalyst folds the pre-filter into the broadcast-join condition,
    # below the hot branch's Window
    assert "4.503599627370496E15" in plan
    # replays bit-for-bit on any partitioning
    again = cap_per_domain(
        big.repartition(17), "domain", cap=3, hot_threshold=1000
    )
    assert sorted(r.doc_id for r in again.collect()) == sorted(
        r.doc_id for r in two_pass.collect()
    )


def test_dedup_null_text_produces_no_pairs(spark):
    """Contentless (NULL-text) docs produce no signature and no pairs
    in MinHash and SimHash — the deliberate r10 contract (the earlier
    exploded pipelines scored two NULL docs as Jaccard-1.0 duplicates
    of each other); empty-STRING docs still participate."""
    from pidb_rdf_spark.operators import minhash_lsh_dedup
    from pidb_rdf_spark.operators.dedup import simhash

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "the same text here"),
         (4, "the same text here")],
        "doc_id long, text string",
    )
    pairs = minhash_lsh_dedup(df, threshold=0.8).collect()
    assert [(r.a, r.b) for r in pairs] == [(3, 4)]
    sigs = {r.id for r in simhash(df).collect()}
    assert sigs == {3, 4}


def test_exact_contamination(spark):
    """Exact-substring contamination: verbatim eval strings found
    inside training docs (case-folded by default, verbatim under
    case_sensitive=True); sub-min_len and NULL eval strings are
    excluded; zero-match and NULL-text docs still get rows; the
    benchmark-size cap fails fast."""
    import pytest as _pytest

    from pidb_rdf_spark.operators import exact_contamination

    train = spark.createDataFrame(
        [
            (1, "The QUICK brown fox jumps over the dog"),
            (2, "nothing to see here at all folks"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    evals = spark.createDataFrame(
        [
            ("the quick BROWN fox",),
            ("short",),
            ("  jumps over the dog  ",),
            (None,),
        ],
        "text string",
    )
    got = {
        r.doc_id: (r.n_contaminated, r.contaminated)
        for r in exact_contamination(train, evals).collect()
    }
    assert got == {1: (2, True), 2: (0, False), 3: (0, False)}
    cs = {
        r.doc_id: r.n_contaminated
        for r in exact_contamination(
            train, evals, case_sensitive=True
        ).collect()
    }
    assert cs == {1: 1, 2: 0, 3: 0}  # only the trimmed verbatim needle
    # empty eval set (everything under min_len): all-zero rows remain
    none = exact_contamination(train, evals, min_len=1000)
    assert {r.n_contaminated for r in none.collect()} == {0}
    with _pytest.raises(ValueError, match="max_eval_collect"):
        exact_contamination(train, evals, max_eval_collect=1)


def test_pii_scrub_ip_never_scrubs_as_phone(spark):
    """Dotted-quad IPs with 3-digit octets match PHONE_RE's digit
    groups, so the IP rule must run first: 192.168.100.1 scrubs as
    <IP> with n_ip=1, n_phone=0 — while a real phone still scrubs."""
    from pidb_rdf_spark.operators import pii_scrub

    df = spark.createDataFrame(
        [(1, "server at 192.168.100.1 failed"),
         (2, "call +1-555-123-4567 now")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.text, r.n_email, r.n_phone, r.n_ip)
           for r in pii_scrub(df).collect()}
    assert got[1] == ("server at <IP> failed", 0, 0, 1)
    assert got[2] == ("call <PHONE> now", 0, 1, 0)


def test_chunk_documents_empty_doc_zero_tokens(spark):
    """Empty/whitespace-only docs yield one EMPTY chunk with
    n_tokens=0 (split('') is [''] — must not count as one token);
    NULL-text docs yield no chunks."""
    from pidb_rdf_spark.operators import chunk_documents

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None), (4, "a b c")],
        "doc_id long, text string",
    )
    rows = chunk_documents(df, max_tokens=2, overlap=0).collect()
    got = {(r.doc_id, r.chunk_id): (r.chunk_text, r.n_tokens) for r in rows}
    assert got[(1, 0)] == ("", 0) and got[(2, 0)] == ("", 0)
    assert got[(4, 0)] == ("a b", 2) and got[(4, 1)] == ("c", 1)
    assert not any(k[0] == 3 for k in got)


def test_corpus_diff_null_content_is_changed(spark):
    """A doc present in both snapshots with NULL content on one side
    is 'changed', never 'added'/'removed' (presence comes from
    per-side flags, not hash nullness); NULL -> NULL is unchanged."""
    from pidb_rdf_spark.operators import corpus_diff

    old = spark.createDataFrame(
        [(1, None), (2, "x"), (3, None), (4, "same")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "x"), (2, None), (3, None), (4, "same"), (5, "new")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.change for r in corpus_diff(old, new).collect()}
    assert got == {1: "changed", 2: "changed", 5: "added"}


def test_sampling_null_keys_excluded(spark):
    """hash_sample/stratified/weighted_sample EXCLUDE NULL-key rows
    (documented): fraction=1.0 keeps every keyed row and none of the
    NULL-keyed ones; weighted_sample winners are never NULL-keyed."""
    from pidb_rdf_spark.operators import hash_sample, weighted_sample

    df = spark.createDataFrame(
        [(None, 1.0)] * 5 + [(float(i), 1.0) for i in range(20)],
        "k double, w double",
    )
    kept = hash_sample(df, "k", 1.0).collect()
    assert len(kept) == 20 and all(r.k is not None for r in kept)
    win = weighted_sample(df, "k", "w", n=3).collect()
    assert len(win) == 3 and all(r.k is not None for r in win)


def test_pack_token_stream_zero_token_docs_no_placement(spark):
    """Zero/NULL-token docs occupy no stream space and get no
    placement row; offsets of later docs are unaffected."""
    from pidb_rdf_spark.operators import pack_token_stream

    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, None), (4, 7)],
        "doc_id long, n_tokens int",
    )
    rows = {r.doc_id: (r.start_offset, r.end_offset, r.chunk_start,
                       r.chunk_end)
            for r in pack_token_stream(df, budget=4).collect()}
    assert set(rows) == {1, 4}
    assert rows[1] == (0, 5, 0, 1)
    assert rows[4] == (5, 12, 1, 2)
    assert all(ce >= cs for (_, _, cs, ce) in rows.values())


def test_cap_per_domain_guard_catches_zero_survivor_domain(spark):
    """The under-select guard is anchored on the hot list: a hot
    domain whose pre-filter kept ZERO rows (no survivor group at all)
    must raise, not silently vanish from the output (ADVICE r11).
    The tail is p ~ e^-68 with real md5 draws, so the guard helper is
    exercised directly with crafted frames."""
    from pidb_rdf_spark.operators.urls import _raise_if_underselected

    hot = spark.createDataFrame(
        [("gone.com", 5000), ("ok.com", 5000)], "domain string, __n long"
    )
    survivors = spark.createDataFrame(
        [("ok.com", i) for i in range(10)], "domain string, doc_id long"
    )
    with pytest.raises(RuntimeError, match="fewer than cap"):
        _raise_if_underselected(hot, survivors, "domain", cap=3)
    # both domains adequately covered -> no raise
    both = survivors.unionByName(
        spark.createDataFrame(
            [("gone.com", i) for i in range(10)], "domain string, doc_id long"
        )
    )
    _raise_if_underselected(hot, both, "domain", cap=3)
    # partial under-select (1 < cap survivors) still raises
    partial = survivors.unionByName(
        spark.createDataFrame([("gone.com", 1)], "domain string, doc_id long")
    )
    with pytest.raises(RuntimeError, match="fewer than cap"):
        _raise_if_underselected(hot, partial, "domain", cap=3)


def test_registrable_domain_matches_python_reference(spark):
    """Differential pin of the PSL when-cascade: ~200 generated hosts
    (label pool x suffix tails, incl. wildcard/exception/private
    rules and hosts that ARE suffixes) must group exactly as a
    straightforward pure-Python implementation of the publicsuffix.org
    algorithm over the same snapshot rules."""
    from pidb_rdf_spark.operators import registrable_domain_col
    from pidb_rdf_spark.operators.psl_snapshot import SNAPSHOT_RULES
    from pidb_rdf_spark.operators.urls import _parse_psl

    plain, wild, exc = _parse_psl(SNAPSHOT_RULES)
    plain_all = {s for g in plain.values() for s in g}
    wild_all = {s for g in wild.values() for s in g}
    exc_all = {s for g in exc.values() for s in g}

    def ref(host: str) -> str:
        host = host.lower().rstrip(".")
        labels = host.split(".")
        n = len(labels)
        pub = None
        for k in sorted((e.count(".") + 1 for e in exc_all), reverse=True):
            if n >= k and ".".join(labels[-k:]) in exc_all:
                pub = k - 1
                break
        if pub is None:
            pub = 1
            for k in range(1, n + 1):
                if ".".join(labels[-k:]) in plain_all:
                    pub = max(pub, k)
                if k >= 2 and ".".join(labels[-(k - 1):]) in wild_all:
                    pub = max(pub, k)
        return ".".join(labels[-(pub + 1):]) if n > pub else host

    tails = [
        "com", "co.uk", "uk", "kawasaki.jp", "city.kawasaki.jp", "jp",
        "ck", "www.ck", "github.io", "io", "k12.ca.us", "ca.us", "us",
        "tokyo.jp", "gov.pl", "example.dev", "blogspot.com",
    ]
    prefixes = [[], ["www"], ["a", "b"], ["city"], ["foo", "bar", "baz"]]
    hosts = sorted({".".join(p + [t]) for t in tails for p in prefixes})
    df = spark.createDataFrame([(h,) for h in hosts], "h string")
    got = {
        r["h"]: r["d"]
        for r in df.select(
            "h", registrable_domain_col(F.col("h")).alias("d")
        ).collect()
    }
    want = {h: ref(h) for h in hosts}
    diffs = {h: (got[h], want[h]) for h in hosts if got[h] != want[h]}
    assert not diffs, diffs


def test_normalize_text_unicode_forms(spark):
    """normalize_text (r12): composed/decomposed sequences collide
    under NFC, fullwidth/compatibility forms fold under NFKC, control
    chars strip (tab/newline survive as whitespace), whitespace
    collapses, NULLs pass through; reserved out_col and bad forms
    raise."""
    from pidb_rdf_spark.operators import normalize_text

    df = spark.createDataFrame(
        [
            (1, "Café  x"),        # decomposed e + acute
            (2, "Café  x"),          # composed é
            (3, "Ｈｉ there"),    # fullwidth "Hi" (NFKC-only)
            (4, "a\x00b\tc\nd"),          # control + tab + newline
            (5, None),
        ],
        "id long, text string",
    )
    nfc = {r["id"]: r["text_norm"]
           for r in normalize_text(df, form="NFC").collect()}
    assert nfc[1] == nfc[2] == "Café x"   # collide under NFC
    assert nfc[3] == "Ｈｉ there"      # NFC keeps fullwidth
    assert nfc[4] == "ab c d"                  # \x00 gone, \t\n folded
    assert nfc[5] is None
    nfkc = {r["id"]: r["text_norm"]
            for r in normalize_text(df, form="NFKC",
                                    lowercase=True).collect()}
    assert nfkc[3] == "hi there"               # fullwidth folds + lower
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown normalization"):
        normalize_text(df, form="NFX")
    with _pytest.raises(ValueError, match="reserved"):
        normalize_text(normalize_text(df), text_col="text")


def test_pca_fit_project_vs_numpy(spark):
    """pca_fit/pca_project (r12): the distributed Gram-matrix pass
    matches a numpy eigh twin (same sign canonicalization), components
    are orthonormal with descending eigenvalues, projection and
    whitening replay exactly, and the fit is partitioning-invariant."""
    import numpy as np

    from pidb_rdf_spark.operators import pca_fit, pca_project

    rng = [(i, [float((i * 7 + j * 3) % 11) + (0.1 * ((i + j) % 5))
                for j in range(6)]) for i in range(200)]
    df = spark.createDataFrame(rng, "vec_id long, embedding array<double>")

    model = pca_fit(df, k=3)
    X = np.array([v for _, v in rng])
    mean = X.mean(axis=0)
    cov = (X.T @ X) / len(X) - np.outer(mean, mean)
    ev, vec = np.linalg.eigh(cov)
    order = np.argsort(ev)[::-1][:3]
    comps = vec[:, order].T
    for i in range(3):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    assert np.allclose(model["mean"], mean)
    assert np.allclose(model["components"], comps, atol=1e-9)
    assert np.allclose(model["eigenvalues"], ev[order])
    # descending spectrum, orthonormal rows
    evs = model["eigenvalues"]
    assert evs == sorted(evs, reverse=True)
    W = np.array(model["components"])
    assert np.allclose(W @ W.T, np.eye(3), atol=1e-9)
    # projection replays numpy; whitening scales by 1/sqrt(eig)
    got = {r["vec_id"]: r["embedding"]
           for r in pca_project(df, model).collect()}
    want = (X - mean) @ W.T
    for i, (vid, _) in enumerate(rng):
        assert np.allclose(got[vid], want[i], atol=1e-9)
    gw = {r["vec_id"]: r["embedding"]
          for r in pca_project(df, model, whiten=True).collect()}
    ww = want / np.sqrt(np.array(evs))
    assert np.allclose(gw[rng[0][0]], ww[0], atol=1e-9)
    # across partitionings the fit reproduces to float64 summation
    # error; sign orientation agrees exactly (canonicalized)
    model2 = pca_fit(df.repartition(17), k=3)
    assert np.allclose(model2["mean"], model["mean"], atol=1e-9)
    assert np.allclose(model2["components"], model["components"],
                       atol=1e-6)
    assert np.allclose(model2["eigenvalues"], model["eigenvalues"],
                       atol=1e-9)


def test_registrable_domain_full_psl(spark):
    """r13 (VERDICT r12 #4): the bundled snapshot is the FULL
    publicsuffix.org list, so private-section suffixes absent from
    the old curated subset (*.blogspot.<cc>-class) group per
    publisher, and IDN rules match hosts in BOTH unicode and
    punycode form (the idna twin)."""
    from pidb_rdf_spark.operators import registrable_domain_col

    cases = {
        # blogspot country variants were NOT in the curated subset
        1: ("myblog.blogspot.co.uk", "myblog.blogspot.co.uk"),
        2: ("a.myblog.blogspot.com.ar", "myblog.blogspot.com.ar"),
        # deep private multi-label rules from the full list
        3: ("app.s3.dualstack.eu-west-1.amazonaws.com",
            "app.s3.dualstack.eu-west-1.amazonaws.com"),
        # IDN rule 公司.cn — unicode host and punycode twin group alike
        4: ("example.公司.cn", "example.公司.cn"),
        5: ("example.xn--55qx5d.cn", "example.xn--55qx5d.cn"),
        6: ("www.example.xn--55qx5d.cn", "example.xn--55qx5d.cn"),
        # sanity: a plain .com host is untouched by the bigger rule set
        7: ("www.example.com", "example.com"),
    }
    df = spark.createDataFrame(
        [(k, v[0]) for k, v in cases.items()], "id long, u string"
    )
    got = {
        r.id: r.d
        for r in df.select(
            "id", registrable_domain_col(F.col("u")).alias("d")
        ).collect()
    }
    assert got == {k: v[1] for k, v in cases.items()}


def test_registrable_domain_sql_fast_path(spark):
    """r13: with the full ~9.5k-rule PSL the cascade must build via
    ONE F.expr parse (the Column-by-Column path creates a JVM literal
    per rule through py4j — ~6 s of driver time per call). Pin that
    the fast path engages for ordinary inputs, that the fallback
    agrees with it, and that _column_sql round-trip-rejects rather
    than misrenders."""
    import time

    from pidb_rdf_spark.operators import registrable_domain_col
    from pidb_rdf_spark.operators.psl_snapshot import SNAPSHOT_RULES
    from pidb_rdf_spark.operators.urls import (
        _column_sql,
        _parse_psl,
        _psl_cascade_columns,
        _psl_cascade_sql,
    )

    assert _column_sql(F.col("u")) == "u"
    assert _column_sql(F.lower(F.col("u"))) == "lower(u)"

    t0 = time.perf_counter()
    col = registrable_domain_col(F.col("u"))
    assert time.perf_counter() - t0 < 3.0  # the slow path measures ~6 s

    # fallback parity on a small custom rule set (exercises plain,
    # wildcard and exception tiers through both builders)
    rules = ["co.zz", "*.wild.zz", "!ok.wild.zz"]
    plain, wild, exc = _parse_psl(rules)
    hosts = ["a.co.zz", "x.y.wild.zz", "www.ok.wild.zz", "plain.zz",
             "co.zz", "single"]
    df = spark.createDataFrame([(h,) for h in hosts], "u string")
    fast = df.select(
        F.expr(_psl_cascade_sql("u", plain, wild, exc)).alias("d")
    ).collect()
    slow = df.select(
        _psl_cascade_columns(F.col("u"), plain, wild, exc).alias("d")
    ).collect()
    assert [r["d"] for r in fast] == [r["d"] for r in slow]


def test_bigram_perplexity_hand_computed(spark):
    """Interpolated bigram perplexity (r13): <s>-prefixed pairs,
    lambda * ML-bigram + (1 - lambda) * add-alpha unigram, verified
    against hand arithmetic; empty docs emit no row."""
    import math

    from pidb_rdf_spark.operators import bigram_model, bigram_perplexity

    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "a b"), (3, "c"), (4, "   ")],
        "doc_id long, text string",
    )
    bi = {
        (r["w1"], r["w2"]): r["n"] for r in bigram_model(docs).collect()
    }
    assert bi == {("<s>", "a"): 2, ("a", "b"): 2, ("b", "a"): 1,
                  ("<s>", "c"): 1}

    out = {r["doc_id"]: r for r in bigram_perplexity(docs).collect()}
    assert set(out) == {1, 2, 3}  # doc 4 is whitespace-only: no row
    # unigram (no <s>): a:3 b:2 c:1 -> total 6, vocab 3+1 OOV = 4
    pu = {"a": 0.4, "b": 0.3, "c": 0.2}
    lam = 0.7

    def p(w1, w2, ctx):
        return lam * bi.get((w1, w2), 0) / ctx + (1 - lam) * pu[w2]

    d1 = [p("<s>", "a", 3), p("a", "b", 2), p("b", "a", 1)]
    want = sum(math.log(x) for x in d1) / 3
    assert out[1]["n_bigrams"] == 3
    assert abs(out[1]["avg_logprob"] - want) < 1e-12
    assert abs(out[1]["ppl"] - math.exp(-want)) < 1e-9
    assert out[3]["n_bigrams"] == 1
    want3 = math.log(p("<s>", "c", 3))
    assert abs(out[3]["avg_logprob"] - want3) < 1e-12

    # min_count pruning: dropped pairs fall back to the unigram term,
    # and a pruned-away CONTEXT zeroes the bigram term entirely
    pruned = bigram_model(docs, min_count=2)
    assert {(r["w1"], r["w2"]) for r in pruned.collect()} == {
        ("<s>", "a"), ("a", "b")
    }
    out_p = {
        r["doc_id"]: r
        for r in bigram_perplexity(docs, bigram=pruned).collect()
    }
    # d3's (<s>, c) survives as (1-lam) * p_uni(c) only — but the
    # <s> context itself is still in the pruned model (ctx_n = 2)
    want3p = math.log(lam * 0.0 / 2 + (1 - lam) * pu["c"])
    assert abs(out_p[3]["avg_logprob"] - want3p) < 1e-12


def test_pack_manifest_synthetic(spark):
    """Hand-computed packing: md5-shuffled global order replayed in
    Python, slices verified against a literal token-stream layout."""
    import hashlib

    from pidb_rdf_spark.operators import pack_manifest

    rows = [(1, 5), (2, 3), (3, 9), (4, 1), (5, 4)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    L, SEP = 8, 1
    got = pack_manifest(
        df, seq_len=L, n_shards=2, tokens_col="n_tokens", sep_tokens=SEP
    ).collect()

    # replay the deterministic_shuffle order: 52-bit md5 prefix of
    # 'shuffle:<id>', shard = hv % 2, order (shard, hv, id)
    def hv(i):
        return int(hashlib.md5(f"shuffle:{i}".encode()).hexdigest()[:13], 16)

    order = sorted(rows, key=lambda r: (hv(r[0]) % 2, hv(r[0]), r[0]))
    # python reference packing
    want = []
    off = 0
    for doc, n in order:
        start, end = off, off + n
        c = start // L
        while c * L < end:
            s = max(start, c * L)
            e = min(end, (c + 1) * L)
            want.append((c, doc, s - start, s - c * L, e - s, n))
            c += 1
        off = end + SEP
    assert sorted(
        (r["seq_id"], r["doc_id"], r["doc_offset"], r["seq_offset"],
         r["length"], r["n_tokens"])
        for r in got
    ) == sorted(want)


def test_pack_manifest_invariants(docs):
    """Structural invariants on the real documents table: per-doc
    slices are contiguous and sum to n_tokens; per-sequence slices
    never overlap and stay in [0, seq_len); only the LAST sequence
    may be under-filled (separators excepted); zero-token docs are
    dropped; a rerun is byte-identical."""
    from collections import defaultdict

    from pidb_rdf_spark.operators import pack_manifest, pack_stats

    L = 256
    m = pack_manifest(docs, seq_len=L, n_shards=4, sep_tokens=1)
    rows = m.collect()
    assert rows

    per_doc = defaultdict(list)
    per_seq = defaultdict(list)
    for r in rows:
        assert 0 <= r["seq_offset"] < L and 0 < r["length"] <= L
        assert r["seq_offset"] + r["length"] <= L
        per_doc[r["doc_id"]].append(r)
        per_seq[r["seq_id"]].append(r)

    for _doc, sl in per_doc.items():
        sl.sort(key=lambda r: r["doc_offset"])
        assert sl[0]["doc_offset"] == 0
        assert sum(r["length"] for r in sl) == sl[0]["n_tokens"]
        for a, b in zip(sl, sl[1:]):
            assert a["doc_offset"] + a["length"] == b["doc_offset"]
            assert b["seq_id"] == a["seq_id"] + 1  # consecutive seqs
            # a mid-doc cut always fills the earlier sequence
            assert a["seq_offset"] + a["length"] == L

    n_seq = max(per_seq) + 1
    assert sorted(per_seq) == list(range(n_seq))  # dense ids
    for sid, sl in per_seq.items():
        sl.sort(key=lambda r: r["seq_offset"])
        for a, b in zip(sl, sl[1:]):
            assert a["seq_offset"] + a["length"] <= b["seq_offset"]
        # fill accounting: doc tokens + one separator per doc ending
        # in this sequence must reach seq_len for every non-last seq
        fill = sum(r["length"] for r in sl)
        seps = sum(
            1 for r in sl if r["doc_offset"] + r["length"] == r["n_tokens"]
        )
        if sid < n_seq - 1:
            assert fill + seps >= L - 1  # trailing sep may spill over

    st = pack_stats(m, seq_len=L)
    assert st["n_sequences"] == n_seq
    assert st["doc_tokens"] == sum(r["length"] for r in rows)
    assert 0 < st["utilization"] <= 1.0

    again = pack_manifest(docs, seq_len=L, n_shards=4, sep_tokens=1).collect()
    key = lambda r: (r["seq_id"], r["doc_id"], r["doc_offset"])  # noqa: E731
    assert sorted(map(tuple, again), key=lambda t: t[:3]) == sorted(
        map(tuple, rows), key=lambda t: t[:3]
    )


def test_pack_manifest_edges(spark):
    """Boundary alignment (doc ends exactly at a cut), a doc spanning
    3+ sequences, sep_tokens=0, and input validation."""
    import pytest as _pytest

    from pidb_rdf_spark.operators import pack_manifest

    df = spark.createDataFrame(
        [(1, 8), (2, 20), (3, 0)], ["doc_id", "n_tokens"]
    )
    # sep_tokens=0, single shard: stream is md5 order; with one shard
    # the order is (hv, id) — compute slices purely from counts
    rows = pack_manifest(
        df, seq_len=8, n_shards=1, tokens_col="n_tokens", sep_tokens=0
    ).collect()
    assert {r["doc_id"] for r in rows} == {1, 2}  # zero-token doc dropped
    total = sum(r["length"] for r in rows)
    assert total == 28
    d1 = sorted(
        (r for r in rows if r["doc_id"] == 1), key=lambda r: r["doc_offset"]
    )
    # the 8-token doc occupies whole-sequence-aligned slices only if
    # its start is aligned; either way it has <= 2 slices
    assert 1 <= len(d1) <= 2
    d2 = sorted(
        (r for r in rows if r["doc_id"] == 2), key=lambda r: r["doc_offset"]
    )
    assert len(d2) >= 3  # 20 tokens across 8-token seqs spans >= 3

    with _pytest.raises(ValueError, match="seq_len"):
        pack_manifest(df, seq_len=0, tokens_col="n_tokens")
    with _pytest.raises(ValueError, match="sep_tokens"):
        pack_manifest(df, seq_len=8, tokens_col="n_tokens", sep_tokens=-1)


def test_hashed_features_replay(spark):
    """Feature indexing replays the md5 contract in Python; tf values
    are exact count/n fractions; zero-token docs emit nothing."""
    import hashlib

    from pidb_rdf_spark.operators import hashed_features

    df = spark.createDataFrame(
        [(1, "Red red BLUE"), (2, "  "), (3, "green")],
        ["doc_id", "text"],
    )
    got = sorted(
        (r["doc_id"], r["f"], r["v"])
        for r in hashed_features(df, n_features=64).collect()
    )

    def fh(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:13], 16) % 64

    want = sorted(
        [
            (1, fh("red"), 2 / 3),
            (1, fh("blue"), 1 / 3),
            (3, fh("green"), 1.0),
        ]
    )
    assert got == want


def test_quality_classifier_fit_separates(spark):
    """Driver fit on linearly separable pseudo-labels: loss is small,
    the model ranks every positive above every negative, and a refit
    is byte-identical (seedless contract)."""
    from pidb_rdf_spark.operators import (
        quality_classifier_fit,
        quality_classifier_score,
    )

    rows = []
    for i in range(40):
        good = i % 2 == 0
        words = ("insight study detail " if good else "spam click buy ") * 3
        rows.append((i, words + f"doc{i}", 1 if good else 0))
    df = spark.createDataFrame(rows, ["doc_id", "text", "label"])

    m = quality_classifier_fit(df, "label", n_features=256, epochs=120)
    assert m["n_train"] == 40 and m["loss"] < 0.15
    scores = {
        r["doc_id"]: r["score"]
        for r in quality_classifier_score(df, m).collect()
    }
    assert min(scores[i] for i in range(0, 40, 2)) > max(
        scores[i] for i in range(1, 40, 2)
    )
    m2 = quality_classifier_fit(df, "label", n_features=256, epochs=120)
    assert m2["weights"] == m["weights"] and m2["bias"] == m["bias"]


def test_quality_classifier_score_contract(spark):
    """Scoring with pinned weights matches a Python replay (md5
    feature hash + tf x w + sigmoid); token-less docs keep a row at
    sigmoid(bias); external models just need the dict shape."""
    import hashlib
    import math

    from pidb_rdf_spark.operators import quality_classifier_score

    D = 32
    model = {
        "weights": [((i * 7) % 11) / 11.0 - 0.5 for i in range(D)],
        "bias": 0.25,
        "n_features": D,
    }
    df = spark.createDataFrame(
        [(1, "alpha beta beta"), (2, ""), (3, "Gamma")],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r["score"]
        for r in quality_classifier_score(df, model).collect()
    }

    def fh(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:13], 16) % D

    def sig(x):
        return 1.0 / (1.0 + math.exp(-x))

    m1 = (2 / 3) * model["weights"][fh("beta")] + (1 / 3) * model[
        "weights"
    ][fh("alpha")]
    assert got[1] == pytest.approx(sig(m1 + 0.25), rel=1e-12)
    assert got[2] == pytest.approx(sig(0.25), rel=1e-12)
    assert got[3] == pytest.approx(
        sig(model["weights"][fh("gamma")] + 0.25), rel=1e-12
    )
    with pytest.raises(ValueError, match="weights length"):
        quality_classifier_score(df, {**model, "weights": [0.0]})


def test_unigram_fit_and_encode(spark):
    """Unigram-LM tokenizer: driver and distributed tiers produce the
    IDENTICAL model (the bpe_train parity contract); encoding replays
    the Python Viterbi twin; segmentations losslessly reconstruct
    in-vocabulary text; refits are byte-identical."""
    from pidb_rdf_spark.operators import unigram_encode, unigram_fit
    from pidb_rdf_spark.operators.tokenizer import _viterbi

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cats sat on mats"),
        (3, "a catalog of cats and mats"),
        (4, "the the the cat cat mat"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    m = unigram_fit(df, vocab_size=40, em_rounds=2)
    m_dist = unigram_fit(df, vocab_size=40, em_rounds=2, driver_cap=0)
    assert m["pieces"] == m_dist["pieces"]
    m_again = unigram_fit(df, vocab_size=40, em_rounds=2)
    assert m_again["pieces"] == m["pieces"]
    # every single character of the corpus is in the inventory
    chars = {c for _, t in rows for w in t.split() for c in w}
    assert chars <= set(m["pieces"])

    got = {
        r["doc_id"]: r["pieces"]
        for r in unigram_encode(df, m).collect()
    }
    for i, text in rows:
        want = []
        for w in text.split():
            want.extend(_viterbi(w, m["pieces"], m["max_piece_len"]))
        assert got[i] == want
        assert "".join(got[i]) == text.replace(" ", "")  # lossless


def test_unigram_encode_unknowns_and_edges(spark):
    """Characters unseen at fit time surface as the explicit <unk>
    piece; NULL/empty/whitespace-only texts encode to []; vocab_size
    below the charset keeps every single char (coverage floor)."""
    from pidb_rdf_spark.operators import unigram_encode, unigram_fit
    from pidb_rdf_spark.operators.tokenizer import UNK

    df = spark.createDataFrame(
        [(1, "abc abc ab"), (2, "cab")], ["doc_id", "text"]
    )
    m = unigram_fit(df, vocab_size=2, em_rounds=1)
    assert {"a", "b", "c"} <= set(m["pieces"])  # floor beats vocab_size

    test = spark.createDataFrame(
        [(1, "abc xyz"), (2, None), (3, "   ")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r["pieces"]
        for r in unigram_encode(test, m).collect()
    }
    assert got[2] == [] and got[3] == []
    assert UNK in got[1] and got[1].count(UNK) == 3  # x, y, z
    with pytest.raises(ValueError, match="vocab_size"):
        unigram_fit(df, vocab_size=0)


def test_unigram_soft_em(spark):
    """Soft (forward-backward) EM: expected counts over the full
    lattice sum to each word's length (per-word mass check against
    the quantum), driver/distributed tier parity holds bit-exactly
    (the 1e-6 quantization contract), and the fitted model still
    segments the corpus losslessly."""
    from pidb_rdf_spark.operators import unigram_encode, unigram_fit
    from pidb_rdf_spark.operators.tokenizer import (
        _Q,
        _expected_counts,
    )

    # lattice mass: for an inventory covering all substrings the
    # expected TOKEN counts weighted by piece length must cover every
    # character exactly once in expectation
    import math

    logp = {p: math.log(1 / 6) for p in ("a", "b", "ab", "ba", "aba", "bab")}
    ec = _expected_counts("abab", logp, 3)
    char_mass = sum(q * len(p) for p, q in ec.items())
    assert abs(char_mass - 4 * _Q) <= 8  # 4 chars, quantization slack

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cats sat on mats"),
        (3, "a catalog of cats and mats"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    m = unigram_fit(df, vocab_size=40, em_rounds=2, em="soft")
    m_dist = unigram_fit(
        df, vocab_size=40, em_rounds=2, em="soft", driver_cap=0
    )
    assert m["pieces"] == m_dist["pieces"]
    got = {
        r["doc_id"]: r["pieces"]
        for r in unigram_encode(df, m).collect()
    }
    for i, text in rows:
        assert "".join(got[i]) == text.replace(" ", "")
    with pytest.raises(ValueError, match="em must be"):
        unigram_fit(df, vocab_size=10, em="viterbi")


def test_unigram_fit_empty_corpus_raises(spark):
    """A corpus with no non-whitespace tokens raises instead of
    dividing by zero inside seeding (both tiers)."""
    from pidb_rdf_spark.operators import unigram_fit

    df = spark.createDataFrame([(1, "   "), (2, None)], ["doc_id", "text"])
    with pytest.raises(ValueError, match="empty corpus"):
        unigram_fit(df, vocab_size=5)
    with pytest.raises(ValueError, match="empty corpus"):
        unigram_fit(df, vocab_size=5, driver_cap=0)


def test_unigram_vocab_ids(spark):
    """unigram_vocab is a stable id ordering (<unk> = 0, then by
    descending log-prob, lexicographic ties) and ids=True encoding
    maps exactly onto the string encoding through it."""
    from pidb_rdf_spark.operators import unigram_encode, unigram_fit
    from pidb_rdf_spark.operators.tokenizer import UNK, unigram_vocab

    df = spark.createDataFrame(
        [(1, "aa ab aa b"), (2, "ab aa")], ["doc_id", "text"]
    )
    m = unigram_fit(df, vocab_size=10, em_rounds=1)
    vocab = unigram_vocab(m)
    assert vocab[0] == UNK and len(vocab) == len(m["pieces"]) + 1
    assert len(set(vocab)) == len(vocab)

    test = spark.createDataFrame([(1, "aa zb")], ["doc_id", "text"])
    strs = unigram_encode(test, m).first()["pieces"]
    nums = unigram_encode(test, m, ids=True).first()["pieces"]
    assert [vocab[i] for i in nums] == strs
    assert UNK in strs and 0 in nums  # 'z' is unseen
