"""Text scrubbing + chunking for training-data pipelines.

Both operators are pure built-in column expressions (regexp /
array ops — whole-stage codegen, zero shuffle, no Python in the hot
path), so they compose into ingest pipelines at parquet-scan speed:
scrub → quality-filter → dedup → chunk → pack.

``pii_scrub``: replace emails / phone numbers / IPv4 addresses with
typed placeholder tokens (the C4/CCNet-style pre-training hygiene
pass). Patterns are deliberately conservative (high precision):
recall-heavy PII detection needs NER, which is out of scope for a
column expression — consumers can swap patterns per policy.

``chunk_documents``: split each document into overlapping
fixed-token-count windows (context-window packing prep). Whitespace
tokenization (matches ``operators.text.token_counts``'s ws tier);
one posexplode per chunk — output rows ≈ corpus tokens / stride,
fully parallel, no state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# conservative, engine-portable patterns (no lookarounds: identical
# semantics in Java regex and RE2-style engines, incl. DuckDB's)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

_RULES = [
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ip", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
]


def pii_scrub(
    df: DataFrame, text_col: str = "text", rules: list | None = None
) -> DataFrame:
    """Original columns with ``text_col`` scrubbed + one
    ``n_<kind>`` count column per rule (how many spans were
    replaced). Rules apply in order; default order matters twice:
    emails before IPs (an email's host part can contain a dotted
    quad) and IPs before PHONES (PHONE_RE's digit-group pattern
    matches dotted quads with 3-digit octets — 192.168.100.1 must
    scrub as <IP>, not <PHONE>)."""
    rules = _RULES if rules is None else rules
    out = df
    scrubbed = F.col(text_col)
    for kind, pat, repl in rules:
        out = out.withColumn(
            f"n_{kind}",
            F.size(F.regexp_extract_all(scrubbed, F.lit(pat), F.lit(0)))
            .cast("long"),
        )
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return out.withColumn(text_col, scrubbed)


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """One row per (document, chunk): ``(id, chunk_id, chunk_text,
    n_tokens)``. Chunks are windows of ``max_tokens`` whitespace
    tokens advancing by ``max_tokens - overlap``; the final window is
    short rather than padded, and a document shorter than
    ``max_tokens`` yields exactly one chunk (an empty/whitespace-only
    document: one EMPTY chunk with ``n_tokens = 0`` — split of an
    empty string yields [''], which would otherwise count as one
    token, disagreeing with ``text.token_count``'s empties-dropped
    contract)."""
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    n = F.size(toks)
    # starts: 0, stride, 2*stride, ... while start < n (>=1 chunk)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(stride)), F.lit(1)
    ).cast("int")
    starts = F.sequence(F.lit(0), n_chunks - 1)
    return (
        # NULL-text docs yield NO chunks (greatest() skips NULLs, so
        # they would otherwise emit one all-NULL placement row)
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            toks.alias("__toks"),
            F.posexplode(starts).alias("chunk_id", "__ci"),
        )
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.array_join(
                F.slice(
                    F.col("__toks"), F.col("__ci") * stride + 1, max_tokens
                ),
                " ",
            ).alias("chunk_text"),
            F.least(
                F.size(F.col("__toks")) - F.col("__ci") * stride,
                F.lit(max_tokens),
            ).cast("long").alias("n_tokens"),
        )
    )
