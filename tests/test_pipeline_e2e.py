"""End-to-end curation-pipeline composition: the full
corpus-to-training-set chain — normalize -> learned quality filter ->
exact dedup -> deterministic shuffle -> sequence packing — run as ONE
composed lazy plan over the documents table, with cross-stage
invariants pinned. Each stage is unit-proven elsewhere; this file
proves they COMPOSE (column contracts line up, filters propagate,
determinism survives chaining)."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def test_curation_chain_composes(spark, docs):
    from pidb_rdf_spark.operators import (
        exact_dedup,
        normalize_text,
        pack_manifest,
        pack_stats,
        quality_classifier_fit,
        quality_classifier_score,
    )

    n_raw = docs.count()

    # 1. normalize (zero-shuffle projection)
    norm = normalize_text(docs, text_col="text", out_col="text_norm")

    # 2. learned quality filter: fit on pseudo-labels (longer docs
    #    "good") over the SAME frame, then score and keep the top
    labeled = norm.withColumn(
        "label",
        (F.length("text_norm") > 200).cast("int"),
    )
    model = quality_classifier_fit(
        labeled, "label", n_features=256, text_col="text_norm",
        epochs=60, max_train=1000,
    )
    scored = quality_classifier_score(
        norm, model, text_col="text_norm"
    )
    kept = norm.join(
        scored.filter(F.col("score") >= 0.5).select("doc_id"), "doc_id"
    )
    n_kept = kept.count()
    assert 0 < n_kept <= n_raw

    # 3. exact dedup on the normalized text (keeper ids join back)
    keepers = exact_dedup(kept, content_cols=["text_norm"]).select(
        F.col("keep_id").alias("doc_id")
    )
    deduped = kept.join(keepers, "doc_id")
    n_dedup = deduped.count()
    assert 0 < n_dedup <= n_kept

    # 4+5. deterministic shuffle + packing manifest (pack_manifest
    #      runs the shuffle internally — same salt/shape)
    manifest = pack_manifest(
        deduped, seq_len=256, n_shards=4, text_col="text_norm",
        sep_tokens=1,
    )
    rows = manifest.collect()
    st = pack_stats(manifest, seq_len=256)
    assert st["n_docs"] <= n_dedup  # zero-token docs drop
    assert st["n_sequences"] >= 1 and 0 < st["utilization"] <= 1.0
    # every packed doc's slices reconstruct its full token count
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], [0, r["n_tokens"]])
        per_doc[r["doc_id"]][0] += r["length"]
    assert all(got == want for got, want in per_doc.values())

    # whole-chain determinism: a rerun of the composed plan yields
    # the byte-identical manifest
    model2 = quality_classifier_fit(
        labeled, "label", n_features=256, text_col="text_norm",
        epochs=60, max_train=1000,
    )
    assert model2["weights"] == model["weights"]
    kept2 = norm.join(
        quality_classifier_score(norm, model2, text_col="text_norm")
        .filter(F.col("score") >= 0.5)
        .select("doc_id"),
        "doc_id",
    )
    again = pack_manifest(
        kept2.join(
            exact_dedup(kept2, content_cols=["text_norm"]).select(
                F.col("keep_id").alias("doc_id")
            ),
            "doc_id",
        ),
        seq_len=256, n_shards=4, text_col="text_norm", sep_tokens=1,
    ).collect()
    key = lambda r: (r["seq_id"], r["doc_id"], r["doc_offset"])  # noqa: E731
    assert sorted(map(tuple, again), key=lambda t: t[:3]) == sorted(
        map(tuple, rows), key=lambda t: t[:3]
    )


def test_tokenizer_feeds_packing(spark, docs):
    """The tokenizer-aware path: unigram piece counts (not whitespace
    proxies) drive the packing manifest via tokens_col — the
    at-scale contract from the packing scale note."""
    from pidb_rdf_spark.operators import (
        pack_manifest,
        unigram_encode,
        unigram_fit,
    )

    sample = docs.limit(200)
    model = unigram_fit(sample, vocab_size=300, em_rounds=1)
    enc = unigram_encode(sample, model).withColumn(
        "n_pieces", F.size("pieces").cast("long")
    )
    manifest = pack_manifest(
        enc, seq_len=128, n_shards=2, tokens_col="n_pieces"
    )
    # per-doc slice totals equal the encoded piece counts
    per_doc = {
        r["doc_id"]: r["n_pieces"]
        for r in enc.select("doc_id", "n_pieces").collect()
        if r["n_pieces"] > 0
    }
    got = {}
    for r in manifest.collect():
        got[r["doc_id"]] = got.get(r["doc_id"], 0) + r["length"]
    assert got == per_doc
