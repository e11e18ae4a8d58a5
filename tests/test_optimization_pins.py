"""Pins for the r13/r14 semantics-carrying optimizations (VERDICT r13
#7 + ADVICE): the histogram screen's saturation bypass, the
negative_samples broadcast gate boundary, the Louvain settled-probe
equivalence, and the LSH single-evaluation plan shape."""

import pytest
from pyspark.sql import functions as F

import pidb_rdf_spark.analytics as A
import pidb_rdf_spark.operators.dedup as D


def _pairs_set(df):
    return {(r["a"], r["b"]) for r in df.collect()}


def test_hist_screen_saturation_bypass(spark, monkeypatch):
    """A doc whose shingle count exceeds the int16 saturation bound
    must BYPASS the histogram screen (a clipped lane undercounts the
    Σmin bound, which could otherwise prune a true pair). Pinned by
    shrinking _SCREEN_SAT so ordinary docs saturate: results must be
    identical to the unsaturated run."""
    docs = spark.createDataFrame(
        [
            # two near-identical long docs (true pair), one unrelated
            (1, "the quick brown fox jumps over the lazy dog " * 20),
            (2, "the quick brown fox jumps over the lazy dog " * 20 + "tail"),
            (3, "completely different text about ships and harbors " * 18),
        ],
        ["doc_id", "text"],
    )
    baseline = _pairs_set(D.ngram_jaccard_pairs(docs, threshold=0.6))
    assert baseline  # the true pair exists
    # every doc now has n_sh > _SCREEN_SAT: histograms clip, so ONLY
    # the bypass keeps the screen exact
    monkeypatch.setattr(D, "_SCREEN_SAT", 5)
    saturated = _pairs_set(D.ngram_jaccard_pairs(docs, threshold=0.6))
    assert saturated == baseline


def test_hist_screen_saturated_lanes_would_prune_without_bypass(spark):
    """The companion negative control: with per-lane counts clipped
    at the real bound, the Σmin(cA,cB) bound from _bucket_hist_expr
    stays exact for ordinary docs (n_sh ≤ _SCREEN_SAT), i.e. the
    screen output equals the exact verify's input requirement."""
    docs = spark.createDataFrame(
        [(i, f"shared prefix text body number {i % 2} " * 10) for i in range(6)],
        ["doc_id", "text"],
    )
    got = _pairs_set(D.ngram_jaccard_pairs(docs, threshold=0.9))
    # docs with the same i%2 are identical → exactly those pairs
    want = {
        (a, b)
        for a in range(6)
        for b in range(6)
        if a < b and a % 2 == b % 2
    }
    assert got == want


@pytest.mark.parametrize("side", ["under", "over"])
def test_negative_samples_broadcast_gate_boundary(spark, monkeypatch, side):
    """Both sides of the vocab broadcast gate, plan-asserted: a vocab
    at or under _NEG_BROADCAST_MAX_VOCAB broadcasts the draw join; one
    over it falls back to the non-broadcast (exchange-bearing) plan.
    The boundary is monkeypatched so both sides run on a tiny frame."""
    pairs = spark.createDataFrame(
        [(i, (i + 1) % 8) for i in range(8)], ["center", "context"]
    )
    # vocab = 8 distinct nodes
    monkeypatch.setattr(A, "_NEG_BROADCAST_MAX_VOCAB", 8 if side == "under" else 7)
    out = A.negative_samples(pairs, k=2, salt="s")
    plan = out._jdf.queryExecution().executedPlan().toString()
    if side == "under":
        assert "BroadcastHashJoin" in plan
    else:
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    # the draw itself is deterministic: same rows either side
    rows = {tuple(r) for r in out.collect()}
    monkeypatch.setattr(A, "_NEG_BROADCAST_MAX_VOCAB", 10**9)
    rows_bcast = {tuple(r) for r in A.negative_samples(pairs, k=2, salt="s").collect()}
    assert rows == rows_bcast


def test_louvain_settled_probe_terminates_and_is_deterministic(spark):
    """The r13 settled probe (`moved IS NOT NULL` on the pinned joined
    frame) must terminate the level loop on a stable partition and
    replay identically: two runs on the same graph return the same
    communities, and a two-clique graph lands each clique in one
    community (no oscillation from the strict-improvement argmax)."""
    edges = [
        (1, 2), (2, 3), (1, 3),          # triangle A
        (10, 11), (11, 12), (10, 12),    # triangle B
        (3, 10),                          # weak bridge
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    r1 = sorted(map(tuple, A.louvain(df).collect()))
    r2 = sorted(map(tuple, A.louvain(df).collect()))
    assert r1 == r2
    comm = dict(r1)
    assert comm[1] == comm[2] == comm[3]
    assert comm[10] == comm[11] == comm[12]


def test_embedding_lsh_bucket_udf_evaluated_once(spark):
    """The r13 §4.4 fix (ADVICE): with bucketed=True the hyperplane
    bucket UDF and the norm fold must be evaluated once behind the
    checkpoints — the executed pair-pipeline plan shows at most the
    two per-pair Arrow kernels and zero re-run norm folds."""
    from pidb_rdf_spark.operators import embedding_near_dup_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = embedding_near_dup_pairs(
        emb, threshold=0.9, bucketed=True, n_planes=4, n_tables=2
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") <= 2
    assert "aggregate(zip_with" not in plan
