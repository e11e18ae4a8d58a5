"""Unigram language-model quality scoring (perplexity proxy).

The CCNet/Gopher pipelines rank documents by LM perplexity to filter
low-quality text; a full KenLM is out of scope for a column engine,
but a corpus-trained unigram model captures the same first-order
signal (gibberish and boilerplate tokens are rare → high perplexity)
and is exactly computable in-plan:

    p(t) = (count(t) + alpha) / (total + alpha * |V'|)
    avg_logprob(doc) = mean over doc tokens of ln p(t)
    ppl_proxy(doc)   = exp(-avg_logprob)

with add-alpha smoothing over the vocabulary including one OOV
bucket (|V'| = |V| + 1), so unseen tokens in scoring (score corpus ≠
train corpus) get finite mass.

Scale shape: the model is one token-frequency aggregate (map-side
combined hash shuffle — the same plan as word count) optionally
truncated to ``max_vocab`` (everything past it scores as OOV),
broadcast to the scoring join: the corpus itself is exploded but
never re-shuffled — token rows join against the broadcast vocab and
re-aggregate per doc on the SAME doc key the explode preserved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unigram_model(
    df: DataFrame,
    text_col: str = "text",
    max_vocab: int | None = None,
) -> DataFrame:
    """(token, n) corpus frequencies, lowercased whitespace tokens.
    ``max_vocab``: keep only the most frequent N (ties by token) —
    the rest become OOV at scoring time."""
    toks = (
        df.select(
            F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
            .alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("n"))
    )
    if max_vocab is not None:
        toks = toks.orderBy(F.col("n").desc(), F.col("token")).limit(max_vocab)
    return toks


def unigram_quality(
    df: DataFrame,
    model: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
) -> DataFrame:
    """(id, n_tokens, avg_logprob, ppl_proxy) per document, scored
    against ``model`` (default: train on ``df`` itself — the
    self-scoring configuration CCNet uses for in-corpus ranking).
    Documents with ZERO tokens (empty/whitespace-only/NULL text) have
    no token rows and therefore NO output row — left-join the result
    back to the corpus if every doc needs a score."""
    model = unigram_model(df, text_col) if model is None else model
    # total + vocab as a 1-row broadcast (no driver round-trip)
    stats = model.agg(
        F.sum("n").cast("double").alias("__total"),
        (F.count("*") + 1).cast("double").alias("__vocab"),  # +1: OOV bucket
    )
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
        .alias("token"),
    ).filter(F.col("token") != "")
    joined = (
        toks.join(F.broadcast(model), on="token", how="left")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__logp",
            F.log(
                (F.coalesce(F.col("n"), F.lit(0)) + F.lit(alpha))
                / (F.col("__total") + F.lit(alpha) * F.col("__vocab"))
            ),
        )
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.avg("__logp").alias("avg_logprob"),
        )
        .withColumn("ppl_proxy", F.exp(-F.col("avg_logprob")))
    )
