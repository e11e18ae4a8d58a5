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


def bigram_model(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """(w1, w2, n) corpus bigram frequencies over lowercased
    whitespace tokens, each document prefixed with a ``<s>`` start
    token so the first real token is conditioned too (the KenLM/CCNet
    convention). ``min_count`` prunes rare bigrams — the standard
    model-size control: pruned pairs fall back to the interpolated
    unigram term at scoring time, and the model shrinks from
    O(distinct pairs) toward the head of the Zipf curve.

    Scale shape: one explode + one map-side-combined hash aggregate —
    the word-count plan on pair keys. The token array builds with JVM
    higher-order functions (filter/slice/zip_with), zero Python."""
    pairs = _doc_pairs(F.col(text_col))
    out = (
        df.select(F.explode(pairs).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("n"))
    )
    if min_count > 1:
        out = out.filter(F.col("n") >= min_count)
    return out


def _start_tokens(text: "F.Column"):
    toks = F.filter(
        F.split(F.trim(F.lower(text)), r"\s+"), lambda x: x != ""
    )
    return F.when(
        F.size(toks) > 0, F.concat(F.array(F.lit("<s>")), toks)
    ).otherwise(toks)


def _doc_pairs(text: "F.Column"):
    """Adjacent (w1, w2) struct pairs of the <s>-prefixed token
    array; empty/whitespace-only docs yield an empty array (slice
    length clamps at 0 — a bare size-1 is a runtime error there)."""
    arr = _start_tokens(text)
    k = F.greatest(F.size(arr) - 1, F.lit(0))
    return F.zip_with(
        F.slice(arr, 1, k),
        F.slice(arr, 2, k),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )


def bigram_perplexity(
    df: DataFrame,
    bigram: DataFrame | None = None,
    unigram: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.7,
    alpha: float = 1.0,
) -> DataFrame:
    """(id, n_bigrams, avg_logprob, ppl) per document under an
    interpolated bigram model — the CCNet-style perplexity filter one
    order up from :func:`unigram_quality`:

        p(w2 | w1) = lam * c(w1, w2) / c(w1, .)
                   + (1 - lam) * p_uni(w2)

    with ``p_uni`` the add-alpha unigram (OOV bucket included, as in
    :func:`unigram_quality`), so the score is finite for unseen
    bigrams AND unseen contexts (c(w1, .) = 0 drops the first term).
    Defaults train both models on ``df`` itself (in-corpus ranking);
    pass held-out models to score a different corpus. Documents with
    zero tokens have no bigrams and therefore no output row.

    Scale shape: context totals reduce FROM the bigram model (one
    aggregate over model rows, never the corpus); the corpus explodes
    to pair rows once and joins model-side frames without
    re-shuffling the corpus — model joins are broadcast here (the
    pruned model is vocab-sized, not corpus-sized); at trillion-token
    scale drop the hints and let AQE pick shuffle hash joins on the
    pair key, the plan is otherwise unchanged."""
    bigram = bigram_model(df, text_col) if bigram is None else bigram
    unigram = unigram_model(df, text_col) if unigram is None else unigram
    ctx = bigram.groupBy("w1").agg(
        F.sum("n").cast("double").alias("__ctx_n")
    )
    stats = unigram.agg(
        F.sum("n").cast("double").alias("__total"),
        (F.count("*") + 1).cast("double").alias("__vocab"),
    )

    pairs = _doc_pairs(F.col(text_col))
    tok_pairs = df.select(F.col(id_col), F.explode(pairs).alias("p")).select(
        id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    uni2 = unigram.select(F.col("token").alias("w2"), F.col("n").alias("__uni_n"))
    joined = (
        tok_pairs.join(F.broadcast(bigram), on=["w1", "w2"], how="left")
        .join(F.broadcast(ctx), on="w1", how="left")
        .join(F.broadcast(uni2), on="w2", how="left")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__p_uni",
            (F.coalesce(F.col("__uni_n"), F.lit(0)) + F.lit(alpha))
            / (F.col("__total") + F.lit(alpha) * F.col("__vocab")),
        )
        .withColumn(
            "__logp",
            F.log(
                F.lit(lam)
                * F.coalesce(
                    F.col("n") / F.col("__ctx_n"), F.lit(0.0)
                )
                + F.lit(1.0 - lam) * F.col("__p_uni")
            ),
        )
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.avg("__logp").alias("avg_logprob"),
        )
        .withColumn("ppl", F.exp(-F.col("avg_logprob")))
    )
