"""Text-analysis operators for large-scale training-data pipelines.

The reference engine has no text surface beyond IRI munging
(``semantics/RDFImport.java:188-196``); these operators are the
scale extensions a 100 TB document pipeline needs: language ID,
quality scoring, token counting, and document fingerprinting.

Design rules for scale:
- everything is built-in ``pyspark.sql.functions`` (JVM-side,
  whole-stage codegen, no Python in the hot path);
- no shuffles at all — every operator here is a narrow projection,
  so it runs at scan speed and composes with any downstream
  dedup/filter stage;
- deterministic: same input → same output bit-for-bit, so results
  are verifiable against a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small, fixed stopword inventories for the n-gram-free heuristic
# language identifier. Deliberately tiny and frozen: the operator's
# contract is deterministic scoring, not linguistic completeness —
# swap in fastText/CLD3 via the same column contract when available.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "pour", "dans", "que"],
}

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation.
# Mirrors the common GPT-2-style pre-split (without the merge table).
BPE_SPLIT_REGEX = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

FNV_MOD = 2147483647  # 2^31 - 1, keeps the rolling hash in 32 bits


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_norm",
    form: str = "NFC",
    lowercase: bool = False,
    collapse_whitespace: bool = True,
    strip_control: bool = True,
) -> DataFrame:
    """Unicode-normalize a text column — the corpus-prep step every
    dedup/fingerprint stage wants FIRST, so visually-identical strings
    with different codepoint sequences (composed vs decomposed accents,
    fullwidth forms under NFKC) collide instead of surviving as fake
    distinct documents.

    ``form``: NFC/NFKC/NFD/NFKD (``unicodedata.normalize`` forms; NFC
    is DuckDB-oracle-checkable via ``nfc_normalize``, NFKC is the
    usual training-pipeline fold). ``strip_control`` drops C0/C1
    control characters (except tab/newline); ``collapse_whitespace``
    folds runs of whitespace to one space and trims.

    Scale shape: Unicode normalization has no Spark built-in, so this
    is the documented exception to the no-Python rule — ONE
    Arrow-batched pandas UDF (vectorized ``str`` ops + per-value
    ``unicodedata.normalize``), still a zero-shuffle narrow
    projection; the control/whitespace passes stay JVM-side regexp
    codegen so the Python work is only the normalize call."""
    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    if out_col in df.columns:
        raise ValueError(f"df already has reserved column: {out_col!r}")

    def _norm_batch(s):
        import unicodedata

        return s.map(
            lambda v: unicodedata.normalize(form, v)
            if v is not None
            else None
        )

    _norm = pandas_udf(_norm_batch, "string")
    col = _norm(F.col(text_col))
    if lowercase:
        col = F.lower(col)
    out = df.withColumn(out_col, col)
    if strip_control:
        out = out.withColumn(
            out_col,
            F.regexp_replace(
                F.col(out_col), r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F-\x9F]", ""
            ),
        )
    if collapse_whitespace:
        # [\s\p{Z}]: Java's \s is ASCII-only — include the Unicode
        # separator categories (NBSP, em/en spaces, line/paragraph
        # separators) so visually-equal spacing collides; with
        # control chars stripped first this matches Python's str \s
        # exactly (the property test's twin)
        out = out.withColumn(
            out_col,
            F.regexp_replace(F.col(out_col), r"[\s\p{Z}]+", " "),
        )
        out = out.withColumn(
            out_col,
            F.regexp_replace(F.col(out_col), r"^ | $", ""),
        )
    return out


def tokens(col: Column) -> Column:
    """Whitespace tokens of lowercased text, empties dropped."""
    return F.filter(F.split(F.lower(col), " "), lambda t: t != "")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count.

    Narrow projection — runs inside the scan stage at any scale.
    """
    c = F.col(text_col)
    return df.withColumns(
        {
            "ws_tokens": F.size(tokens(c)).cast("long"),
            "bpe_tokens": F.size(
                F.regexp_extract_all(F.lower(c), F.lit(BPE_SPLIT_REGEX), 0)
            ).cast("long"),
        }
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: count *distinct* stopwords of each
    language present in the token set; highest count wins, ties and
    zero-evidence rows fall back to ``und`` (by descending count,
    then language code — a total, deterministic order).
    """
    toks = F.array_distinct(tokens(F.col(text_col)))
    scored = F.array(
        *[
            F.struct(
                F.size(
                    F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))
                ).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, words in sorted(STOPWORDS.items())
        ]
    )
    # left fold keeps the alphabetically-first language on score ties
    # (strict > comparison, languages visited in sorted order)
    best = F.aggregate(
        scored,
        F.struct(F.lit(-1).alias("score"), F.lit("und").alias("lang")),
        lambda acc, s: F.when(s["score"] > acc["score"], s).otherwise(acc),
    )
    return df.withColumn(
        "lang_pred",
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document quality metrics + composite score.

    Integer sub-metrics (counts) make the derived double score
    bit-reproducible across engines. All narrow, all codegen'd.
    """
    c = F.col(text_col)
    toks = tokens(c)
    en_stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_chars = F.length(c).cast("long")
    n_tokens = F.size(toks).cast("long")
    n_punct = F.size(F.regexp_extract_all(c, F.lit(r"[^A-Za-z0-9\s]"), 0)).cast("long")
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), en_stop)).cast("long")
    out = df.withColumns(
        {
            "n_chars_q": n_chars,
            "n_tokens": n_tokens,
            "n_punct": n_punct,
            "n_stopwords": n_stop,
        }
    )
    # composite: word-length sanity + low punctuation + stopword
    # evidence. No rounding: the inputs are integers, so the derived
    # double is bit-identical on any engine computing the same
    # formula (round() implementations differ across engines and
    # would INTRODUCE divergence, not remove it).
    mean_tok_len = F.col("n_chars_q") / F.greatest(F.col("n_tokens"), F.lit(1))
    return out.withColumn(
        "quality",
        (F.col("n_stopwords") / F.lit(10.0))
        + F.when((mean_tok_len >= 3) & (mean_tok_len <= 12), 0.5).otherwise(0.0)
        - (F.col("n_punct") / F.greatest(F.col("n_chars_q"), F.lit(1))),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Rolling polynomial hash (base 31, mod 2^31-1) over the
    document's characters — the classic content fingerprint for
    incremental exact dedup and shard-stable sampling.

    Left fold over the char array, all JVM-side (``F.aggregate``),
    zero shuffle. At 100 TB this is scan-bound.
    """
    chars = F.split(F.col(text_col), "")
    codes = F.transform(chars, lambda ch: F.ascii(ch).cast("long"))
    fp = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % FNV_MOD,
    )
    return df.withColumn("fingerprint", fp)


def repetition_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher/C4-style repetition metrics — the standard filters for
    boilerplate and degenerate (looping) generations in web-scale
    training corpora:

    - ``n_lines`` / ``n_distinct_lines``: duplicate-line evidence
      (navigation chrome, repeated footers);
    - ``dup_line_frac``: 1 - distinct/total lines;
    - ``top_bigram_frac``: occurrences of the most frequent word
      bigram over all bigram slots (loop detection);
    - ``dup_token_frac``: 1 - distinct/total tokens.

    Same scale rules as the rest of the module: narrow built-in
    projections only, zero shuffle, integer sub-metrics so every
    derived fraction is bit-reproducible against a SQL oracle.
    """
    c = F.col(text_col)
    toks = tokens(c)
    lines = F.filter(F.split(c, "\n"), lambda x: F.length(x) > 0)
    bigrams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - 2, F.lit(0))),
        lambda i: F.concat_ws("_", F.get(toks, i), F.get(toks, i + 1)),
    )
    # most-frequent-bigram count via a per-row fold: sort the bigram
    # array, then the longest run of equal neighbors is the max count
    sorted_bg = F.sort_array(bigrams)
    run = F.aggregate(
        sorted_bg,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(acc["prev"].isNotNull() & (x == acc["prev"]), acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(acc["prev"].isNotNull() & (x == acc["prev"]), acc["run"] + 1)
                .otherwise(F.lit(1).cast("long")),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    n_lines = F.size(lines).cast("long")
    n_dlines = F.size(F.array_distinct(lines)).cast("long")
    n_toks = F.size(toks).cast("long")
    n_dtoks = F.size(F.array_distinct(toks)).cast("long")
    n_bigrams = F.size(bigrams).cast("long")
    return df.withColumns(
        {
            "n_lines": n_lines,
            "n_distinct_lines": n_dlines,
            "dup_line_frac": F.lit(1.0)
            - n_dlines / F.greatest(n_lines, F.lit(1)).cast("double"),
            "top_bigram_count": run,
            "top_bigram_frac": run / F.greatest(n_bigrams, F.lit(1)).cast("double"),
            "dup_token_frac": F.lit(1.0)
            - n_dtoks / F.greatest(n_toks, F.lit(1)).cast("double"),
        }
    )


def boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 3,
) -> DataFrame:
    """Lines that repeat across at least ``min_docs`` distinct
    documents — headers, footers, nav chrome, cookie banners (the
    CCNet/C4 boilerplate signal). Output: (line, n_docs).

    One explode + one distinct-count aggregate; the result is
    vocabulary-sized (boilerplate is by definition repeated), so
    downstream consumers can broadcast it."""
    lines = df.select(
        F.col(id_col).alias("__id"),
        F.explode(F.split(F.col(text_col), "\n")).alias("line"),
    )
    return (
        lines.groupBy("line")
        .agg(F.countDistinct("__id").cast("long").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def strip_boilerplate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 3,
) -> DataFrame:
    """Documents with cross-document repeated lines removed. Output:
    original columns with ``text_col`` rewritten + ``n_lines_kept`` /
    ``n_lines_removed`` counters.

    Scale shape: the boilerplate set is broadcast (vocabulary-sized)
    as a MAP so membership tests are hash lookups, not per-line array
    scans; each doc is rewritten with array expressions — no shuffle
    of the corpus, no per-row Python. Line order within a document is
    preserved (filter, not rebuild)."""
    blist = F.collect_list("line")
    boiler = F.broadcast(
        boilerplate_lines(df, id_col, text_col, min_docs).select(
            F.map_from_arrays(
                blist, F.transform(blist, lambda _: F.lit(True))
            ).alias("__bmap")
        )
    )
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(
        lines, lambda x: ~F.map_contains_key(F.col("__bmap"), x)
    )
    out_cols = [c for c in df.columns if c != text_col]
    return (
        df.crossJoin(F.broadcast(boiler))
        .withColumn(
            "__bmap",
            F.coalesce(
                F.col("__bmap"), F.from_json(F.lit("{}"), "map<string,boolean>")
            ),
        )
        .select(
            *out_cols,
            F.array_join(kept, "\n").alias(text_col),
            F.size(kept).cast("long").alias("n_lines_kept"),
            (F.size(lines) - F.size(kept)).cast("long").alias("n_lines_removed"),
        )
    )


# Gopher quality-rule thresholds (Rae et al. 2021, "Scaling Language
# Models: Methods, Analysis & Insights from Training Gopher", table A1).
# Public, frozen numbers — callers can override any of them.
GOPHER_REQUIRED_WORDS = [
    "the", "be", "to", "of", "and", "that", "have", "with",
]


def gopher_quality(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_required_stopwords: int = 2,
) -> DataFrame:
    """Gopher-rule document quality signals + the composite pass flag.

    Emits the per-document evidence columns (so a pipeline can audit
    WHY a document failed) and ``passes_gopher``:

    - ``n_words``: whitespace word count in [min_words, max_words];
    - ``mean_word_len``: mean characters per word in [3, 10];
    - ``symbol_word_ratio``: '#'-or-'...' occurrences per word < 0.1;
    - ``bullet_line_frac``: lines starting with a bullet < 0.9;
    - ``ellipsis_line_frac``: lines ending with '...' < 0.3;
    - ``alpha_word_frac``: words containing a letter > 0.8;
    - ``n_required_stopwords``: distinct hits in the 8-word required
      set >= 2.

    Scale shape: identical to the rest of this module — narrow
    built-in projections only (array ops + regexp counts inside
    whole-stage codegen), zero shuffle, integer sub-metrics so every
    derived fraction is bit-reproducible against a SQL oracle.
    """
    c = F.col(text_col)
    words = F.filter(F.split(c, r"\s+"), lambda w: w != "")
    lines = F.filter(F.split(c, "\n"), lambda x: F.length(x) > 0)
    n_words = F.size(words).cast("long")
    n_word_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    n_symbols = F.size(
        F.regexp_extract_all(c, F.lit(r"#|\.\.\."), 0)
    ).cast("long")
    n_bullet_lines = F.size(
        F.filter(lines, lambda x: x.rlike(r"^\s*([-*•‣◦])"))
    ).cast("long")
    n_ellipsis_lines = F.size(
        F.filter(lines, lambda x: x.rlike(r"\.\.\.\s*$"))
    ).cast("long")
    n_alpha_words = F.size(
        F.filter(words, lambda w: w.rlike("[A-Za-z]"))
    ).cast("long")
    req = F.array(*[F.lit(w) for w in GOPHER_REQUIRED_WORDS])
    n_req = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(words, F.lower)), req
        )
    ).cast("long")

    out = df.withColumns(
        {
            "n_words": n_words,
            "mean_word_len": n_word_chars
            / F.greatest(n_words, F.lit(1)).cast("double"),
            "symbol_word_ratio": n_symbols
            / F.greatest(n_words, F.lit(1)).cast("double"),
            "bullet_line_frac": n_bullet_lines
            / F.greatest(F.size(lines), F.lit(1)).cast("double"),
            "ellipsis_line_frac": n_ellipsis_lines
            / F.greatest(F.size(lines), F.lit(1)).cast("double"),
            "alpha_word_frac": n_alpha_words
            / F.greatest(n_words, F.lit(1)).cast("double"),
            "n_required_stopwords": n_req,
        }
    )
    return out.withColumn(
        "passes_gopher",
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("symbol_word_ratio") < max_symbol_word_ratio)
        & (F.col("bullet_line_frac") < max_bullet_line_frac)
        & (F.col("ellipsis_line_frac") < max_ellipsis_line_frac)
        & (F.col("alpha_word_frac") > min_alpha_word_frac)
        & (F.col("n_required_stopwords") >= min_required_stopwords),
    )


def line_dedup_global(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-global exact line dedup (the C4 three-sentence-span rule
    at line granularity): every non-empty line is kept only in its
    FIRST occurrence — lowest (doc id, position in doc) — and removed
    everywhere else. Empty lines are structural, not content, and are
    always kept. Output: original columns with ``text_col`` rewritten
    + ``n_lines_kept`` / ``n_lines_removed``.

    Scale shape: first-occurrence is a ``groupBy(line).agg(min(struct
    (id, pos)))`` — a map-side-combinable aggregate, NOT a window over
    lines (a window would sort every replica of a hot line in one
    partition; the min-aggregate reduces duplicates map-side, so a
    line repeated a billion times costs one row per input partition in
    the shuffle). One line-keyed shuffle + one doc-keyed shuffle to
    reassemble; both AQE-managed.
    """
    lines = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos", "__line"),
    )
    firsts = (
        lines.filter(F.col("__line") != "")
        .groupBy("__line")
        .agg(F.min(F.struct("__id", "__pos")).alias("__first"))
    )
    kept = lines.join(firsts, on="__line", how="left").filter(
        (F.col("__line") == "")
        | (
            (F.col("__first.__id") == F.col("__id"))
            & (F.col("__first.__pos") == F.col("__pos"))
        )
    )
    rebuilt = kept.groupBy("__id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                lambda s: s["__line"],
            ),
            "\n",
        ).alias("__new_text"),
        F.count("*").cast("long").alias("n_lines_kept"),
    )
    out_cols = [c for c in df.columns if c != text_col]
    n_lines = F.size(F.split(F.col(text_col), "\n")).cast("long")
    return (
        df.join(rebuilt, df[id_col] == rebuilt["__id"], "left")
        .select(
            *out_cols,
            F.coalesce(F.col("__new_text"), F.lit("")).alias(text_col),
            F.coalesce(F.col("n_lines_kept"), F.lit(0).cast("long")).alias(
                "n_lines_kept"
            ),
            (n_lines - F.coalesce(F.col("n_lines_kept"), F.lit(0))).cast(
                "long"
            ).alias("n_lines_removed"),
        )
    )


def blocklist_hits(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    max_frac: float = 0.0,
) -> DataFrame:
    """Wordlist filtering — the toxicity / NSFW / spam blocklist step
    every production corpus pipeline runs (C4 used the "List of
    Dirty, Naughty ..." wordlist; Gopher and Dolma keep variants).
    Adds ``n_blocked`` (token occurrences whose lowercase form is in
    ``terms``), ``blocked_frac`` (of all tokens) and ``blocklist_ok``
    (frac <= ``max_frac``; the default 0.0 is the strict C4 rule —
    any hit fails).

    Scale shape: the term set folds into the projection as a literal
    array (wordlists are 1e2-1e4 terms — expression-sized, broadcast
    with the plan itself); the count is one ``filter`` higher-order
    function over the token array. Zero shuffle, zero Python, same
    scan-stage contract as the rest of text.py. Matching is exact on
    whitespace tokens (lowercased) — substring/obfuscation matching
    is a different operator (see winnow.py for verbatim spans)."""
    if not terms:
        raise ValueError("terms must be a non-empty list")
    if any(" " in t or t == "" for t in terms):
        raise ValueError("terms are single whitespace-tokens (no spaces)")
    tset = F.array(*[F.lit(t.lower()) for t in sorted(set(terms))])
    toks = tokens(F.col(text_col))
    n_blocked = F.size(F.filter(toks, lambda t: F.array_contains(tset, t)))
    n_tok = F.greatest(F.size(toks), F.lit(1))
    return df.withColumns(
        {
            "n_blocked": n_blocked.cast("long"),
            "blocked_frac": n_blocked / n_tok,
            "blocklist_ok": (n_blocked / n_tok) <= F.lit(float(max_frac)),
        }
    )


def _extract_html_text(html: str) -> str:
    """Plain text from one HTML document via the stdlib parser:
    script/style/template/noscript subtrees drop, block-level tags
    break lines, entities unescape, whitespace collapses per line,
    blank lines squeeze. Malformed markup never raises — the stdlib
    parser is recovering by design."""
    from html.parser import HTMLParser

    _SKIP = {"script", "style", "template", "noscript"}
    _BLOCK = {
        "p", "div", "br", "li", "ul", "ol", "table", "tr", "td", "th",
        "h1", "h2", "h3", "h4", "h5", "h6", "section", "article",
        "header", "footer", "blockquote", "pre", "hr", "nav", "aside",
        "figure", "figcaption", "form", "dl", "dt", "dd",
    }

    class _P(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            self.parts: list[str] = []
            self.skip = 0

        def handle_starttag(self, tag, attrs):
            if tag in _SKIP:
                self.skip += 1
            elif tag in _BLOCK:
                self.parts.append("\n")

        def handle_endtag(self, tag):
            if tag in _SKIP and self.skip:
                self.skip -= 1
            elif tag in _BLOCK:
                self.parts.append("\n")

        def handle_data(self, data):
            if not self.skip and data:
                self.parts.append(data)

    p = _P()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # recovering parser; keep whatever was extracted
    lines = []
    for ln in "".join(p.parts).split("\n"):
        ln = " ".join(ln.split())
        if ln:
            lines.append(ln)
    return "\n".join(lines)


def strip_html(
    df: DataFrame, text_col: str = "text", out_col: str = "plain_text"
) -> DataFrame:
    """HTML -> plain-text extraction for web-corpus ingestion: drops
    script/style subtrees, turns block elements into line breaks,
    unescapes entities, collapses whitespace — the pre-quality-filter
    step every crawled corpus runs. Stdlib ``html.parser`` only (a
    recovering parser: malformed markup degrades, never raises).
    NULL input -> NULL output.

    Scale shape: one Arrow-batched ``mapInPandas`` stage (HTML
    parsing is inherently per-document sequential work, but it is
    embarrassingly parallel across documents and Arrow moves the
    strings in batches); no shuffle; output is strictly smaller than
    input."""
    import pandas as pd

    if out_col in df.columns:
        raise ValueError(f"df already has reserved column: {out_col!r}")

    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    schema = f"{fields}, `{out_col}` string"

    def run(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [
                None if t is None else _extract_html_text(t)
                for t in pdf[text_col]
            ]
            yield pdf

    return df.mapInPandas(run, schema)


def _bpe_word(word: str, ranks: dict, cache: dict) -> list:
    """Merge-loop BPE for one word (Sennrich subword-nmt semantics):
    start from characters + a '</w>' end marker, repeatedly merge the
    adjacent pair with the LOWEST merge rank until none applies.
    ``cache`` memoizes per distinct word — corpora are zipfian, so the
    hit rate is the point."""
    got = cache.get(word)
    if got is not None:
        return got
    syms = list(word) + ["</w>"]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    cache[word] = syms
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list,
    text_col: str = "text",
    lowercase: bool = True,
    emit_tokens: bool = False,
) -> DataFrame:
    """Apply a FIXED subword-BPE merge table to a text column — the
    budget-deciding tokenization a training pipeline runs (sequence
    packing, mixture token budgets and per-doc costs all count THESE
    tokens, not whitespace words). ``merges`` is the ordered list of
    (left, right) merge pairs, rank = position (the subword-nmt /
    GPT-2 merges.txt shape, minus the byte-level remap). Output adds
    ``n_bpe_tokens`` (and ``bpe_tokens`` when ``emit_tokens`` — mind
    the driver-hash caveat on array columns).

    Scale shape: the merge table broadcasts inside the mapInPandas
    closure (vocab-sized); per-partition processing memoizes by
    distinct word, so zipfian corpora pay the merge loop once per
    TYPE, not per token; no shuffle. NULL text -> NULL count.
    """
    import pandas as pd

    clash = {"n_bpe_tokens"} | ({"bpe_tokens"} if emit_tokens else set())
    clash &= set(df.columns)
    if clash:
        raise ValueError(
            f"df already has reserved column(s): {sorted(clash)}"
        )
    ranks = {(a, b): i for i, (a, b) in enumerate(merges)}
    if len(ranks) != len(merges):
        raise ValueError("duplicate merge pair in merges")
    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{fields}, `n_bpe_tokens` bigint"
    if emit_tokens:
        schema += ", `bpe_tokens` array<string>"

    def run(batches):
        cache: dict = {}
        for pdf in batches:
            pdf = pdf.copy()
            counts = []
            toks_out = [] if emit_tokens else None
            for t in pdf[text_col]:
                if t is None:
                    counts.append(None)
                    if emit_tokens:
                        toks_out.append(None)
                    continue
                words = (t.lower() if lowercase else t).split()
                n = 0
                toks = [] if emit_tokens else None
                for w in words:
                    syms = _bpe_word(w, ranks, cache)
                    n += len(syms)
                    if emit_tokens:
                        toks.extend(syms)
                counts.append(n)
                if emit_tokens:
                    toks_out.append(toks)
            pdf["n_bpe_tokens"] = pd.array(counts, dtype="Int64")
            if emit_tokens:
                pdf["bpe_tokens"] = toks_out
            yield pdf

    return df.mapInPandas(run, schema)


def _bpe_train_local(word_freqs: list, n_merges: int, min_pair_count: int) -> list:
    """Driver-side merge training over the (word, freq) TYPE table —
    the same argmax/tie-break/floor semantics as the distributed
    rounds (parity-pinned in tests), at in-memory loop speed."""
    vocab: dict = {}
    for w, f in word_freqs:
        key = tuple(list(w) + ["</w>"])
        vocab[key] = vocab.get(key, 0) + f
    merges: list = []
    for _ in range(n_merges):
        pc: dict = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pc[p] = pc.get(p, 0) + f
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b), _ = best
        merges.append((a, b))
        nv: dict = {}
        for syms, f in vocab.items():
            syms = list(syms)
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [a + b]
                else:
                    i += 1
            key = tuple(syms)
            nv[key] = nv.get(key, 0) + f
        vocab = nv
    return merges


def bpe_train(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    lowercase: bool = True,
    min_pair_count: int = 2,
    driver_cap: int = 1_000_000,
) -> list:
    """LEARN a subword-BPE merge table from a corpus (Sennrich
    subword-nmt training): repeatedly merge the most frequent
    adjacent symbol pair, weighted by word frequency. Returns the
    ordered merge list — feed it to :func:`bpe_encode`.

    Deterministic: ties on pair count break lexicographically, so the
    same corpus always yields the same table on any engine or
    partitioning (pinned against a pure-python twin in tests).

    Two tiers (VERDICT r9 #5). The corpus ALWAYS collapses to the
    WORD-TYPE table first (one groupBy over tokenized words — the
    only corpus-sized shuffle); even a 100 TB corpus usually has a
    type table of a few million rows, so:

    - driver tier (default): when a limit-probe shows the type table
      fits under ``driver_cap`` rows, it is collected once and the
      merge loop runs driver-side in pure Python — 32k merges cost
      32k in-memory rounds, not 32k Spark jobs of scheduler
      overhead. Identical output to the distributed tier
      (parity-pinned).
    - distributed tier (``driver_cap=0`` or probe overflow): every
      merge round runs on the distributed vocabulary — one
      explode-pairs + sum aggregate (vocabulary-sized, map-side
      combinable), one 1-row argmax collect, one Arrow pass applying
      the merge. N merges = N vocab-sized rounds; the corpus is
      never rescanned.

    Rounds stop early when no pair reaches ``min_pair_count`` (the
    subword-nmt floor)."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    import pandas as pd

    toks = df.select(
        F.explode(
            F.split(
                F.lower(F.col(text_col)) if lowercase else F.col(text_col),
                r"\s+",
            )
        ).alias("w")
    ).filter(F.length("w") > 0)
    # pinned: BOTH tiers read this frame twice (limit-probe then
    # collect / vocab build) — without the checkpoint the corpus
    # scan + shuffle behind it runs once per consumer
    word_freq = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .localCheckpoint(eager=False)
    )
    if driver_cap > 0:
        probe = word_freq.limit(driver_cap + 1).count()
        if probe <= driver_cap:
            return _bpe_train_local(
                [(r["w"], r["freq"]) for r in word_freq.collect()],
                n_merges,
                min_pair_count,
            )
    vocab = (
        word_freq
        .select(
            F.concat(
                F.split(F.col("w"), ""), F.array(F.lit("</w>"))
            ).alias("syms"),
            "freq",
        )
        .localCheckpoint(eager=True)  # vocabulary-sized
    )
    merges: list = []
    for _ in range(n_merges):
        pairs = vocab.select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("syms"), 1, F.size("syms") - 1),
                    F.slice(F.col("syms"), 2, F.size("syms") - 1),
                    lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                )
            ).alias("p"),
            "freq",
        ).groupBy("p").agg(F.sum("freq").alias("cnt"))
        best = pairs.orderBy(
            F.col("cnt").desc(), F.col("p.a"), F.col("p.b")
        ).first()
        if best is None or best["cnt"] < min_pair_count:
            break
        a, b = best["p"]["a"], best["p"]["b"]
        merges.append((a, b))
        ab = a + b

        def apply_merge(batches, a=a, b=b, ab=ab):
            for pdf in batches:
                out = []
                for syms in pdf["syms"]:
                    syms = list(syms)
                    i = 0
                    while i < len(syms) - 1:
                        if syms[i] == a and syms[i + 1] == b:
                            syms[i : i + 2] = [ab]
                        else:
                            i += 1
                    out.append(syms)
                pdf = pdf.copy()
                pdf["syms"] = out
                yield pdf

        vocab = vocab.mapInPandas(
            apply_merge, schema="syms array<string>, freq long"
        ).localCheckpoint(eager=True)
    return merges
