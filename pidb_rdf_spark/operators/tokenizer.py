"""Unigram-LM subword tokenizer (SentencePiece's default algorithm,
Kudo 2018): seed a large candidate-piece inventory from frequent
substrings, fit piece probabilities by EM over the segmentation
lattice, prune to the target vocabulary, then encode by Viterbi
segmentation — the second half of the tokenizer family next to
``text.bpe_train``/``bpe_encode`` (Sennrich BPE).

No reference analog (the reference is a graph store).

Two E-steps, selected by ``em=``: the default "hard" counts the
pieces of each word's Viterbi path (fast, exact integer counts); 
"soft" is the true SentencePiece E-step — forward-backward expected
counts over the full segmentation lattice — with expectations
QUANTIZED to 1e-6 units so the cross-partition aggregation sums
exact longs, keeping even the soft path bit-deterministic at any
partitioning. One deliberate divergence remains, pinned: pruning
keeps the top ``vocab_size`` pieces by fitted count (single
characters always retained for coverage), not SentencePiece's
leave-one-out likelihood-loss ranking.

Scale doctrine (the ``text.bpe_train`` two-tier contract): the
corpus ALWAYS collapses to the WORD-TYPE table first — one tokenize
+ groupBy, the only corpus-sized shuffle; every later stage is
vocabulary-sized. Seeding is one substring explode + sum (map-side
combinable) + a top-``seed_size`` take; each EM round is one
Arrow-batched Viterbi pass over the type table (piece log-probs ride
along broadcast-closure-captured, vocab-sized) + one piece-keyed
aggregation collected to the driver (vocab-sized state, corpus-size-
independent — the k-means/PCA/BPE class). A limit-probe routes type
tables under ``driver_cap`` to a pure-Python driver loop (EM rounds
cost memory passes, not Spark jobs of scheduler overhead),
parity-pinned against the distributed tier.

Determinism: seeding ties break lexicographically; Viterbi ties
prefer the LONGER final piece (smaller split point), then the
lexicographically smaller path implicitly via the fixed candidate
scan order; EM counts aggregate exactly (longs) with probabilities
normalized driver-side in sorted piece order — the same corpus yields
the same model on any engine, at any partitioning, on reruns.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["unigram_fit", "unigram_encode", "unigram_vocab", "UNK"]

UNK = "<unk>"
_UNK_LOGP = -1e3  # effectively -inf, finite so sums stay ordered


def _viterbi(word: str, logp: dict, max_len: int) -> list:
    """Best segmentation of ``word`` under piece log-probs: maximize
    the path log-prob; characters absent from the inventory become
    UNK at ``_UNK_LOGP``. Ties prefer the longer final piece (the
    smaller split point wins on >=... scan order below). Returns the
    piece list."""
    n = len(word)
    best = [0.0] + [-math.inf] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        lo = max(0, i - max_len)
        for j in range(lo, i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j == 1:
                    lp = _UNK_LOGP  # single-char fallback keeps cover
                else:
                    continue
            cand = best[j] + lp
            # strict > with ascending j: the SMALLEST j (longest
            # final piece) that attains the max is kept
            if cand > best[i]:
                best[i] = cand
                back[i] = j
    out = []
    i = n
    while i > 0:
        j = back[i]
        piece = word[j:i]
        out.append(piece if piece in logp else UNK)
        i = j
    out.reverse()
    return out


_Q = 1_000_000  # soft-EM count quantum (see _expected_counts)


def _expected_counts(word: str, logp: dict, max_len: int) -> dict:
    """Soft-EM E-step for one word: forward-backward over the
    segmentation lattice -> expected piece counts, QUANTIZED to
    1/_Q units (integers). The quantization is what keeps soft EM
    deterministic at any partitioning: per-word lattice sums run in a
    fixed scan order (pure), and the cross-word/cross-partition
    aggregation then sums exact longs instead of order-sensitive
    doubles. UNK arcs participate in the lattice mass but emit no
    counts (mirror of the hard E-step)."""
    n = len(word)
    neg = -math.inf

    def lse(xs):
        m = max(xs)
        if m == neg:
            return neg
        return m + math.log(sum(math.exp(x - m) for x in xs))

    def arcs_into(i):
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j == 1:
                    yield j, None, _UNK_LOGP
                continue
            else:
                yield j, piece, lp

    alpha = [0.0] + [neg] * n
    for i in range(1, n + 1):
        alpha[i] = lse([alpha[j] + lp for j, _, lp in arcs_into(i)])
    beta = [neg] * n + [0.0]
    for j in range(n - 1, -1, -1):
        acc = []
        for i in range(j + 1, min(n, j + max_len) + 1):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j == 1:
                    lp = _UNK_LOGP
                else:
                    continue
            acc.append(lp + beta[i])
        beta[j] = lse(acc)
    z = alpha[n]
    out: dict = {}
    if z == neg:
        return out
    for i in range(1, n + 1):
        for j, piece, lp in arcs_into(i):
            if piece is None:
                continue
            q = round(math.exp(alpha[j] + lp + beta[i] - z) * _Q)
            if q:
                out[piece] = out.get(piece, 0) + q
    return out


def _fit_local(word_freqs: list, vocab_size: int, seed_size: int,
               max_piece_len: int, em_rounds: int,
               em: str = "hard") -> dict:
    """The driver-tier fit — also the exact twin the distributed tier
    must reproduce (parity-pinned in tests)."""
    # seed: substring frequencies (occurrence-weighted), all chars in
    from collections import Counter

    if not word_freqs:
        raise ValueError(
            "unigram_fit: empty corpus (no non-whitespace tokens)"
        )
    sub = Counter()
    chars = set()
    for w, f in word_freqs:
        chars.update(w)
        for ln in range(1, min(len(w), max_piece_len) + 1):
            for j in range(len(w) - ln + 1):
                sub[w[j : j + ln]] += f
    singles = {c for c in chars}
    multi = sorted(
        (p for p in sub if len(p) > 1),
        key=lambda p: (-sub[p], p),
    )[: max(0, seed_size - len(singles))]
    pieces = sorted(singles | set(multi))
    total = sum(sub[p] for p in pieces)
    logp = {p: math.log(sub[p] / total) for p in pieces}

    floor = _Q if em == "soft" else 1
    for r in range(em_rounds):
        counts = Counter()
        for w, f in word_freqs:
            if em == "soft":
                for piece, q in _expected_counts(
                    w, logp, max_piece_len
                ).items():
                    counts[piece] += f * q
            else:
                for piece in _viterbi(w, logp, max_piece_len):
                    if piece != UNK:
                        counts[piece] += f
        # prune on the LAST round only: EM first converges the probs
        # over the full seed inventory
        if r == em_rounds - 1:
            keep = sorted(
                (p for p in counts if len(p) > 1),
                key=lambda p: (-counts[p], p),
            )[: max(0, vocab_size - len(singles))]
            pieces = sorted(singles | set(keep))
        # pieces with no E-step mass get a floor of one (quantized)
        # count so they stay finite (single chars must remain
        # encodable)
        tot = 0
        cs = {}
        for p in pieces:
            cs[p] = counts.get(p, 0) or floor
            tot += cs[p]
        logp = {p: math.log(cs[p] / tot) for p in sorted(pieces)}
    return logp


def unigram_fit(
    df: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    lowercase: bool = True,
    max_piece_len: int = 8,
    seed_factor: int = 4,
    em_rounds: int = 3,
    em: str = "hard",
    driver_cap: int = 1_000_000,
) -> dict:
    """LEARN a unigram-LM piece inventory -> ``{"pieces": {piece:
    logprob}, "max_piece_len", "vocab_size"}``. Feed to
    :func:`unigram_encode`.

    ``seed_factor * vocab_size`` frequent substrings (plus every
    single character, always retained) enter EM; after ``em_rounds``
    EM rounds the inventory prunes to ``vocab_size``. ``em="hard"``
    counts Viterbi-path pieces (fast, exact integer counts);
    ``em="soft"`` uses the true SentencePiece E-step — forward-
    backward expected counts over the full segmentation lattice —
    quantized to 1e-6 so the distributed aggregation sums exact longs
    (deterministic at any partitioning) instead of order-sensitive
    doubles. See the module docstring for the tiering and determinism
    contracts."""
    if vocab_size < 1:
        raise ValueError("vocab_size must be >= 1")
    if max_piece_len < 1:
        raise ValueError("max_piece_len must be >= 1")
    if em_rounds < 1:
        raise ValueError("em_rounds must be >= 1")
    if em not in ("hard", "soft"):
        raise ValueError("em must be 'hard' or 'soft'")
    toks = df.select(
        F.explode(
            F.split(
                F.lower(F.col(text_col)) if lowercase else F.col(text_col),
                r"\s+",
            )
        ).alias("w")
    ).filter(F.length("w") > 0)
    word_freq = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .localCheckpoint(eager=False)
    )
    seed_size = vocab_size * seed_factor

    if driver_cap > 0:
        probe = word_freq.limit(driver_cap + 1).count()
        if probe <= driver_cap:
            logp = _fit_local(
                [(r["w"], r["freq"]) for r in word_freq.collect()],
                vocab_size, seed_size, max_piece_len, em_rounds, em,
            )
            return {
                "pieces": logp,
                "max_piece_len": max_piece_len,
                "vocab_size": vocab_size,
            }

    # ---- distributed tier ------------------------------------------
    import pandas as pd

    wf = word_freq.localCheckpoint(eager=True)  # type-table-sized

    # seeding: substring explode (occurrence-weighted, words capped
    # at max_piece_len windows) + sum + top-k; single chars unioned in
    subs = wf.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(
                        F.lit(1),
                        F.least(F.length("w"), F.lit(max_piece_len)),
                    ),
                    lambda ln: F.transform(
                        F.sequence(F.lit(1), F.length("w") - ln + 1),
                        lambda j: F.substring(F.col("w"), j, ln),
                    ),
                )
            )
        ).alias("p"),
        "freq",
    ).groupBy("p").agg(F.sum("freq").alias("cnt"))
    singles = {
        r["p"]: r["cnt"]
        for r in subs.filter(F.length("p") == 1).collect()
    }
    multi_rows = (
        subs.filter(F.length("p") > 1)
        .orderBy(F.col("cnt").desc(), F.col("p"))
        .limit(max(0, seed_size - len(singles)))
        .collect()
    )
    sub_cnt = dict(singles)
    sub_cnt.update({r["p"]: r["cnt"] for r in multi_rows})
    if not sub_cnt:
        raise ValueError(
            "unigram_fit: empty corpus (no non-whitespace tokens)"
        )
    pieces = sorted(sub_cnt)
    total = sum(sub_cnt[p] for p in pieces)
    logp = {p: math.log(sub_cnt[p] / total) for p in pieces}

    floor = _Q if em == "soft" else 1
    for r in range(em_rounds):
        cur_logp, mpl, cur_em = logp, max_piece_len, em

        def e_step(batches, cur_logp=cur_logp, mpl=mpl, cur_em=cur_em):
            from collections import Counter

            for pdf in batches:
                c = Counter()
                for w, f in zip(pdf["w"], pdf["freq"]):
                    if cur_em == "soft":
                        for piece, q in _expected_counts(
                            w, cur_logp, mpl
                        ).items():
                            c[piece] += int(f) * q
                    else:
                        for piece in _viterbi(w, cur_logp, mpl):
                            if piece != UNK:
                                c[piece] += int(f)
                yield pd.DataFrame(
                    {"p": list(c.keys()), "c": list(c.values())}
                )

        counts = {
            r["p"]: r["c"]
            for r in wf.mapInPandas(e_step, schema="p string, c long")
            .groupBy("p")
            .agg(F.sum("c").alias("c"))
            .collect()
        }
        sing = {p for p in pieces if len(p) == 1}
        if r == em_rounds - 1:
            keep = sorted(
                (p for p in counts if len(p) > 1),
                key=lambda p: (-counts[p], p),
            )[: max(0, vocab_size - len(sing))]
            pieces = sorted(sing | set(keep))
        tot, cs = 0, {}
        for p in pieces:
            cs[p] = counts.get(p, 0) or floor
            tot += cs[p]
        logp = {p: math.log(cs[p] / tot) for p in sorted(pieces)}
    return {
        "pieces": logp,
        "max_piece_len": max_piece_len,
        "vocab_size": vocab_size,
    }


def unigram_vocab(model: dict) -> list:
    """Stable piece-id ordering for a fitted model: id 0 is ``<unk>``,
    then pieces by descending log-prob with lexicographic tie-break —
    deterministic for a fixed model, the contract loaders pin their
    embedding rows to. ``unigram_encode(..., ids=True)`` emits these
    ids."""
    return [UNK] + sorted(
        model["pieces"], key=lambda p: (-model["pieces"][p], p)
    )


def unigram_encode(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    lowercase: bool = True,
    out_col: str = "pieces",
    ids: bool = False,
) -> DataFrame:
    """Viterbi-segment every document under a fitted (or external)
    unigram model -> input columns + ``out_col: array<string>``.
    One Arrow-batched pass; the piece table rides along in the task
    closure (vocab-sized); per-batch word-TYPE memoization — encoding
    cost scales with distinct words per batch, not tokens. Unknown
    characters surface as the explicit ``<unk>`` piece, never a
    silent drop. ``ids=True`` emits ``array<int>`` token ids under
    the :func:`unigram_vocab` ordering instead of strings."""
    from pyspark.sql.types import (
        ArrayType,
        StringType,
        StructField,
        StructType,
    )

    from pyspark.sql.types import IntegerType

    logp = model["pieces"]
    mpl = int(model["max_piece_len"])
    piece_id = (
        {p: i for i, p in enumerate(unigram_vocab(model))} if ids else None
    )
    cols = df.columns
    # a fresh StructType — StructType.add MUTATES the df's cached
    # schema object and desyncs df.columns from the JVM plan
    schema = StructType(
        list(df.schema.fields)
        + [
            StructField(
                out_col,
                ArrayType(IntegerType() if ids else StringType()),
            )
        ]
    )

    def run(batches):
        cache: dict = {}
        for pdf in batches:
            out = []
            for text in pdf[text_col]:
                ps = []
                if text is not None:
                    t = text.lower() if lowercase else text
                    for w in t.split():
                        hit = cache.get(w)
                        if hit is None:
                            hit = _viterbi(w, logp, mpl)
                            cache[w] = hit
                        ps.extend(hit)
                out.append(
                    [piece_id[p] for p in ps] if piece_id is not None
                    else ps
                )
            pdf = pdf.copy()
            pdf[out_col] = out
            yield pdf

    return df.mapInPandas(run, schema=schema).select(*cols, out_col)
