"""Sequence packing: the concat-and-chunk step that turns a curated,
shuffled corpus into fixed-length training sequences (GPT/LLaMA-style
packing — every pretraining pipeline ends here).

No reference analog (the reference is a graph store); this completes
the curation family's layout chain: ``mixing.deterministic_shuffle``
fixes the global document order, ``pack_manifest`` assigns every
document token to a (sequence, offset) slot. It is the loader-grade
refinement of ``curation.pack_token_stream`` (per-doc chunk RANGES
over id-ordered, independently-packed shard streams): here the
stream order is the md5 permutation, shards carry into one global
dense ``seq_id`` space, and the output is per-SLICE — exactly the
rows a data loader joins against to assemble each sequence. The output is a MANIFEST
(seq_id, doc_id, doc_offset, seq_offset, length) rather than
materialized token arrays: the data loader streams documents and
assembles sequences from the manifest, so Spark never shuffles token
payloads — only ids and counts.

Packing semantics (the standard concat-everything layout):
- documents are concatenated in the ``deterministic_shuffle`` order
  (shard-major, md5-permuted within shard — bit-replayable on any
  engine, salt-controlled), each followed by ``sep_tokens`` separator
  positions (EOS); zero-token documents are dropped;
- the concatenated stream is cut every ``seq_len`` tokens; documents
  crossing a cut are SPLIT (each slice is one manifest row);
- separator/padding positions get no manifest row — any position of a
  sequence not covered by a slice is a separator (between the slices)
  or trailing padding (only ever in the last sequence); loaders write
  EOS/pad there. ``pack_stats`` audits the arithmetic.

Scale shape: ONE data-sized exchange end to end — the hash partition
on ``shard`` that ``deterministic_shuffle`` already pays; the
intra-shard offset window reuses that partitioning (same key, no new
exchange). The cross-shard carry is a two-level prefix sum: per-shard
token totals (an ``n_shards``-row aggregate that Catalyst pushes to
the scan as map-side partial sums — its exchange carries n_shards x
partitions rows, never data) get their running offset on a single
tiny partition and broadcast-join back — the global window that would
otherwise serialize the corpus through one task never touches
row-level data. Like every prefix sum over an immutable source this
is TWO passes over the token-count input; at 100 TB pass a
precomputed ``tokens_col`` so each pass is a 16-byte-per-doc columnar
read (packing straight off raw text tokenizes twice — persist the
slim (id, n_tokens) projection first if tokenization dominates). The
explode emits ~(corpus_tokens / seq_len + n_docs) rows —
manifest-sized, not text-sized. No Python in the row path; every
expression is whole-stage codegen.

Determinism: the order is ``deterministic_shuffle``'s md5 contract;
offsets and cuts are integer arithmetic over it — the same corpus +
salt + seq_len yields a byte-identical manifest at any partitioning,
on any engine (the driver's DuckDB oracle replays it exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pidb_rdf_spark.operators.mixing import deterministic_shuffle

__all__ = ["whitespace_token_count", "pack_manifest", "pack_stats"]


def whitespace_token_count(text_col) -> "F.Column":
    """Whitespace token count as a codegen Column — non-empty ``\\s+``
    splits, the repo's token convention (``text.py`` quality metrics;
    DuckDB twin: ``len(list_filter(string_split_regex(text, '\\s+'),
    x -> len(x) > 0))``). For real tokenizers pass a precomputed
    ``tokens_col`` (e.g. ``operators.text.bpe_encode`` lengths)
    instead."""
    return F.size(
        F.filter(F.split(text_col, r"\s+"), lambda w: w != "")
    ).cast("long")


def pack_manifest(
    df: DataFrame,
    seq_len: int,
    n_shards: int = 1024,
    id_col: str = "doc_id",
    tokens_col: str | None = None,
    text_col: str = "text",
    sep_tokens: int = 1,
    salt: str = "shuffle",
) -> DataFrame:
    """Pack documents into ``seq_len``-token training sequences;
    return the slice manifest.

    Columns out (all long): ``seq_id`` (global sequence index, dense
    from 0), ``id_col``, ``doc_offset`` (slice start within the
    document), ``seq_offset`` (slice start within the sequence),
    ``length`` (slice token count), ``n_tokens`` (the document's full
    token count, for loader-side slicing sanity checks).

    Invariants (pinned in tests): per document, slices are contiguous
    and sum to ``n_tokens``; per sequence, slices never overlap and
    ``seq_offset + length <= seq_len``; consecutive slices of one
    document land in consecutive sequences.

    ``tokens_col`` names a precomputed token-count column (the real-
    tokenizer path); when None, counts are whitespace tokens of
    ``text_col`` (``whitespace_token_count``). ``sep_tokens`` >= 0
    separator positions follow every document (1 = a single EOS, the
    GPT convention). ``n_shards`` is the shuffle fan-out — it changes
    the permutation, not the packing arithmetic."""
    if seq_len < 1:
        raise ValueError("seq_len must be >= 1")
    if sep_tokens < 0:
        raise ValueError("sep_tokens must be >= 0")
    n_tok = (
        F.col(tokens_col).cast("long")
        if tokens_col is not None
        else whitespace_token_count(F.col(text_col))
    )
    docs = df.withColumn("__n_tokens", n_tok).filter(F.col("__n_tokens") > 0)
    sh = deterministic_shuffle(docs, n_shards, id_col=id_col, salt=salt)
    n_eff = F.col("__n_tokens") + F.lit(sep_tokens)

    # two-level prefix sum for the global start offset:
    # (1) intra-shard running total — reuses the shard hash partition
    #     deterministic_shuffle already created (same key, no new
    #     exchange, just the local sort by seq);
    w = (
        Window.partitionBy("shard")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = sh.withColumn(
        "__loc", F.coalesce(F.sum(n_eff).over(w), F.lit(0)).cast("long")
    )
    # (2) cross-shard carry — an n_shards-row aggregate gets its
    #     running offset on one (tiny) partition and broadcast-joins
    #     back; the corpus never serializes through a global window.
    #     Catalyst pushes this agg below the shuffle/window straight
    #     onto the scan (map-side partial sums, the exchange carries
    #     n_shards x partitions rows) — the second pass of the
    #     standard immutable-source prefix sum; see the module scale
    #     note on making that pass a slim columnar read.
    totals = sh.groupBy("shard").agg(F.sum(n_eff).alias("__t"))
    wt = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "shard",
        F.coalesce(F.sum("__t").over(wt), F.lit(0))
        .cast("long")
        .alias("__shard_off"),
    )
    placed = local.join(F.broadcast(offsets), "shard").select(
        F.col(id_col),
        F.col("__n_tokens").alias("n_tokens"),
        (F.col("__shard_off") + F.col("__loc")).alias("__start"),
    )

    # cut every seq_len tokens; a document covering token positions
    # [start, start + n_tokens) contributes one slice per sequence it
    # touches (separator positions [start + n_tokens, start + n_eff)
    # deliberately emit nothing — loaders fill EOS there)
    # integral `div`, not floor(double /): offsets are exact at any
    # corpus size (a double loses token positions past 2^53)
    L = F.lit(int(seq_len)).cast("long")
    end = F.col("__start") + F.col("n_tokens")
    spans = placed.withColumn(
        "seq_id",
        F.explode(
            F.sequence(
                F.expr(f"__start div {int(seq_len)}"),
                F.expr(f"(__start + n_tokens - 1) div {int(seq_len)}"),
            )
        ),
    )
    s = F.greatest(F.col("__start"), F.col("seq_id") * L)
    e = F.least(end, (F.col("seq_id") + 1) * L)
    return spans.select(
        F.col("seq_id").cast("long"),
        F.col(id_col),
        (s - F.col("__start")).cast("long").alias("doc_offset"),
        (s - F.col("seq_id") * L).cast("long").alias("seq_offset"),
        (e - s).cast("long").alias("length"),
        F.col("n_tokens"),
    )


def pack_stats(manifest: DataFrame, seq_len: int) -> dict:
    """Audit a ``pack_manifest`` result: one bounded aggregate row ->
    ``{n_sequences, n_docs, n_slices, doc_tokens, utilization}``.
    ``utilization`` = document tokens / (n_sequences * seq_len) — the
    complement is separators + the last sequence's padding."""
    r = manifest.agg(
        (F.max("seq_id") + 1).alias("n_sequences"),
        F.countDistinct(manifest.columns[1]).alias("n_docs"),
        F.count(F.lit(1)).alias("n_slices"),
        F.sum("length").alias("doc_tokens"),
    ).first()
    n_seq = r["n_sequences"] or 0
    return {
        "n_sequences": int(n_seq),
        "n_docs": int(r["n_docs"] or 0),
        "n_slices": int(r["n_slices"] or 0),
        "doc_tokens": int(r["doc_tokens"] or 0),
        "utilization": (
            float(r["doc_tokens"]) / float(n_seq * seq_len) if n_seq else 0.0
        ),
    }
