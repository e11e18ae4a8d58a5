"""Train/eval decontamination: n-gram overlap between a training
corpus and an evaluation set.

The standard pre-training hygiene step (WebText/GPT-style 8-gram to
13-gram overlap checks): any training document sharing >= K word
n-grams with a benchmark document is flagged (and usually dropped).
No reference counterpart — this is one of the LLM-data-pipeline
operators the engine adds beyond the reference's surface, next to
dedup and quality scoring.

Scale shape: each side tokenizes and shingles with built-in
expressions only (split / sequence / slice / array_join — all
whole-stage-codegen), dedups shingles per document, and the join
carries ``(doc_id, xxhash64(gram))`` pairs ONLY — no text through the
shuffle. The eval side is benchmark-sized in practice, so it
broadcasts; the train side streams through one hash join at scan
parallelism. At 100 TB nothing here is wider than the shingle
explode, and the explode feeds a hash-aggregate dedup before any
exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _shingle_hashes(
    df: DataFrame, id_col: str, text_col: str, out_id: str, n: int,
    hashed: bool = True,
) -> DataFrame:
    """One row per distinct word-``n``-gram per document:
    ``(out_id, __g)`` with ``__g`` the gram's xxhash64 (or the raw
    gram string with ``hashed=False`` — used by tests to pin
    hash-join ≡ string-join)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    starts = F.when(
        F.size(toks) >= n,
        F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    with_tok = df.select(
        F.col(id_col).alias(out_id), toks.alias("__t"), starts.alias("__s")
    )
    gram = F.array_join(F.slice(F.col("__t"), F.col("__i"), n), " ")
    return (
        with_tok.select(out_id, "__t", F.explode("__s").alias("__i"))
        .select(out_id, (F.xxhash64(gram) if hashed else gram).alias("__g"))
        .dropDuplicates()
    )


def ngram_overlap(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_overlap: int = 1,
    broadcast_eval: bool = True,
    hashed: bool = True,
) -> DataFrame:
    """Per (train doc, eval doc) pair: the number of distinct word
    ``n``-grams they share, keeping pairs with at least
    ``min_overlap``. Output: ``train_id, eval_id, n_overlap``.

    ``broadcast_eval=True`` pins the broadcast of the (benchmark-
    sized) eval shingle set; pass False when the eval side is large
    enough that a shuffle hash join is the right plan and let AQE
    decide."""
    t = _shingle_hashes(train, id_col, text_col, "train_id", n, hashed)
    e = _shingle_hashes(eval_df, id_col, text_col, "eval_id", n, hashed)
    if broadcast_eval:
        e = F.broadcast(e)
    return (
        t.join(e, on="__g")
        .groupBy("train_id", "eval_id")
        .agg(F.count("*").cast("long").alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
    )


def semantic_overlap(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    max_eval_collect: int = 1_000_000,
    materialize: bool = False,
) -> DataFrame:
    """Embedding-level decontamination: every (train, eval) vector
    pair with cosine >= ``threshold`` — the semantic complement of
    ``ngram_overlap``, catching paraphrased/reworded benchmark leaks
    that shared word n-grams miss (the eval-similarity check run for
    modern pretraining corpora alongside exact n-gram overlap).

    Scale shape: the EVAL matrix (benchmark-sized by nature — the
    same asymmetry ``ngram_overlap`` exploits with its broadcast) is
    collected once, L2-normalized, and broadcast; the train corpus
    streams through ``mapInPandas`` at scan parallelism with one
    BLAS matmul per Arrow batch. No join, no shuffle, nothing moves
    but the flagged pairs. ``max_eval_collect`` fail-fasts if the
    "eval" side is actually corpus-sized (at ~1M x 64 floats the
    broadcast is ~500 MB; past that, flip the sides or use
    ``dedup.semantic_dup_pairs`` on the union).

    A zero-norm embedding on either side raises (eval side at build
    time, train side from the scoring task): cosine is undefined for
    the zero vector, and silently dropping it would let a degenerate
    row pass decontamination unexamined.

    Broadcast lifetime: the eval matrix broadcast lives until the
    returned (lazy) frame's last job — i.e. for the SESSION unless
    released. With ``materialize=True`` the result is eagerly
    computed (``localCheckpoint``) and the broadcast destroyed before
    returning, so repeated calls in a long-lived session don't
    accumulate eval-matrix broadcasts.

    Ids pass through with their input types (long, string, ...);
    the output id columns mirror the input id dtypes.

    Output: ``(train_id, eval_id, cosine)``.
    """
    import numpy as np

    t_id_type = train.schema[id_col].dataType.simpleString()
    e_id_type = eval_df.schema[id_col].dataType.simpleString()
    out_schema = f"train_id {t_id_type}, eval_id {e_id_type}, cosine double"

    # one eval-side scan: the limit-probe and the matrix collect are
    # the same job (len > cap == the probe tripping)
    rows = (
        eval_df.select(id_col, vec_col).limit(max_eval_collect + 1).collect()
    )
    if len(rows) > max_eval_collect:
        raise ValueError(
            f"semantic_overlap broadcasts the eval matrix; eval side "
            f"exceeds max_eval_collect={max_eval_collect} rows — this "
            f"side should be the benchmark set, not the corpus"
        )
    if not rows:
        # empty benchmark -> no pairs (np.linalg.norm would raise on
        # the 0-d matrix)
        return train.sparkSession.createDataFrame([], out_schema)
    eids = np.array([r[0] for r in rows])
    E = np.array([r[1] for r in rows], dtype=np.float64)
    En_ = np.linalg.norm(E, axis=1, keepdims=True)
    zero = np.nonzero(En_[:, 0] == 0.0)[0]
    if zero.size:
        raise ValueError(
            f"semantic_overlap: {zero.size} zero-norm eval embedding(s) "
            f"(e.g. {id_col}={eids[zero[0]]!r}) — cosine is undefined; "
            f"drop or fix them before decontamination"
        )
    E /= En_
    bc = train.sparkSession.sparkContext.broadcast((eids, E))

    def score(batches):
        import pandas as pd

        ev_ids, En = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            T = np.array(list(pdf.iloc[:, 1]), dtype=np.float64)
            Tn = np.linalg.norm(T, axis=1, keepdims=True)
            tz = np.nonzero(Tn[:, 0] == 0.0)[0]
            if tz.size:
                bad = pdf.iloc[:, 0].to_numpy()[tz[0]]
                raise ValueError(
                    f"semantic_overlap: zero-norm train embedding "
                    f"({id_col}={bad!r}) — cosine is undefined; drop or "
                    f"fix it before decontamination"
                )
            T /= Tn
            S = T @ En.T
            ti, ei = np.nonzero(S >= threshold)
            yield pd.DataFrame(
                {
                    "train_id": pdf.iloc[:, 0].to_numpy()[ti],
                    "eval_id": ev_ids[ei],
                    "cosine": S[ti, ei],
                }
            )

    out = train.select(id_col, vec_col).mapInPandas(score, out_schema)
    if materialize:
        out = out.localCheckpoint(eager=True)
        bc.destroy()
    return out


def contaminated_ids(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_overlap: int = 1,
) -> DataFrame:
    """Distinct train doc ids flagged by ``ngram_overlap`` — the set
    to drop before training (one column, ``train_id``)."""
    return (
        ngram_overlap(
            train, eval_df, id_col, text_col, n=n, min_overlap=min_overlap
        )
        .select("train_id")
        .dropDuplicates()
    )


def exact_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 16,
    case_sensitive: bool = False,
    max_eval_collect: int = 100_000,
) -> DataFrame:
    """Exact-substring contamination: per training doc, how many eval
    strings appear VERBATIM inside its text. The third member of the
    decontamination family — :func:`ngram_overlap` needs ``n`` whole
    words and :func:`semantic_overlap` catches paraphrases, but a
    short verbatim answer string ("42", a 3-word quote, a code
    snippet with punctuation) slips past both; benchmark answer-key
    leakage checks are run exactly this way.

    Output: ``(id_col, n_contaminated, contaminated bool)`` — one row
    per training doc (zero-match docs included, the usual filter
    input). Eval strings shorter than ``min_len`` characters (after
    trim) are EXCLUDED — tiny strings match everything and say
    nothing; tune per benchmark.

    Scale shape: the eval strings are benchmark-sized — they are
    limit-probed against ``max_eval_collect`` (fail-fast, same
    contract as :func:`semantic_overlap`) and enter the plan as ONE
    array literal, so the scan side does a zero-shuffle,
    whole-stage-codegen ``aggregate(filter(contains))`` pass per doc:
    no join, no explode, nothing moves but the scan itself. Cost is
    O(|doc| x n_evals) per row — the Aho-Corasick trade documented
    honestly: at thousands of eval strings prefer ``ngram_overlap``
    as a prefilter and run this on the flagged survivors."""
    ev = F.trim(F.col(text_col))
    if not case_sensitive:
        ev = F.lower(ev)
    rows = (
        eval_df.select(ev.alias("__e"))
        .filter(F.length("__e") >= min_len)
        .dropDuplicates()
        .limit(max_eval_collect + 1)
        .collect()
    )
    if len(rows) > max_eval_collect:
        raise ValueError(
            f"exact_contamination builds an eval-string literal; eval "
            f"side exceeds max_eval_collect={max_eval_collect} distinct "
            f"strings — this side should be the benchmark set, not the "
            f"corpus (or prefilter with ngram_overlap)"
        )
    evals = sorted(r["__e"] for r in rows)
    hay = F.col(text_col)
    if not case_sensitive:
        hay = F.lower(hay)
    needles = F.array(*[F.lit(s) for s in evals])
    n_hit = F.size(
        F.filter(needles, lambda s: F.contains(hay, s))
    ).cast("long")
    n_hit = F.when(F.col(text_col).isNotNull(), n_hit).otherwise(F.lit(0))
    return train.select(
        F.col(id_col),
        n_hit.alias("n_contaminated"),
        (n_hit > 0).alias("contaminated"),
    )
