"""URL canonicalization, URL-level dedup and per-domain quota caps —
the web-crawl curation front door every large-scale corpus pipeline
runs before any content-level dedup (CommonCrawl/CCNet derivatives
dedup by canonical URL first because it is free compared to MinHash,
and cap per-domain document counts so no single host dominates the
training mixture).

Everything here is whole-stage-codegen column work (regexp + array
built-ins): ``url_normalize`` is a zero-shuffle map that runs inside
the scan stage; ``url_dedup`` is one hash aggregate on the canonical
URL (16-byte md5 of it at scale, same trick as ``exact_dedup``);
``cap_per_domain`` is one window over the domain key — the only
shuffle either op needs, keyed on the column the semantics group by.

Canonical form (documented contract, applied in this order):

1. trim surrounding whitespace;
2. scheme and authority lowercased (path/query case is preserved —
   it is significant on most servers);
3. default ports dropped (``:80`` for http, ``:443`` for https);
4. the fragment removed;
5. tracking query parameters removed (``utm_*``, ``gclid``,
   ``fbclid``, ``msclkid``, ``yclid``, ``igshid``, ``mc_cid``,
   ``mc_eid``, ``_ga`` — the shared-link noise that fans one page
   out into dozens of "distinct" URLs), remaining parameters SORTED
   by raw text and re-joined (parameter order is almost never
   significant; sorting makes equal-parameter URLs equal strings);
6. trailing slashes stripped from the path (empty path → ``/``);
7. optional ``strip_www``;
8. percent-encoding normalization (RFC 3986 §6.2.2): escapes of
   UNRESERVED characters decode (``%7E`` ≡ ``~``, ``%41`` ≡ ``A``)
   and the hex digits of every remaining escape uppercase
   (``%3a`` ≡ ``%3A``) — applied to authority, path and query
   before steps 2–6 so case-folding and parameter sorting see the
   normalized text.

URLs with no ``scheme://`` part normalize to NULL (not silently
passed through — a malformed URL must never collide with a real
canonical form); ``url_dedup`` excludes them and callers can count
NULLs for a reject report.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACKING_PARAM_RE = (
    r"(?i)^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|yclid|igshid"
    r"|mc_cid|mc_eid|_ga)(=.*)?$"
)

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"


def _pct_normalize(s: Column) -> Column:
    """RFC 3986 §6.2.2 percent-encoding normalization, pure codegen:
    decode percent-encoded UNRESERVED characters (ALPHA / DIGIT /
    ``- . _ ~`` — two encodings of one URL, ``%7E`` vs ``~``, must
    collide to one canonical form) and uppercase the hex digits of
    every remaining escape (``%3a`` == ``%3A``). Split on ``%``,
    rewrite each escape head inside one array transform, re-concat —
    no Python, no shuffle; dangling ``%``/short escapes pass through
    untouched (never silently dropped)."""
    parts = F.split(s, "%", -1)
    head = F.element_at(parts, 1)
    tail = F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0)))

    def fix(p: Column) -> Column:
        hex2 = F.upper(p.substr(1, 2))
        is_hex = p.rlike("^[0-9A-Fa-f]{2}")
        n = F.conv(hex2, 16, 10).cast("int")
        unreserved = (
            ((n >= 65) & (n <= 90))
            | ((n >= 97) & (n <= 122))
            | ((n >= 48) & (n <= 57))
            | n.isin(45, 46, 95, 126)
        )
        rest_p = p.substr(F.lit(3), F.length(p))
        return (
            F.when(is_hex & unreserved, F.concat(F.char(n), rest_p))
            .when(is_hex, F.concat(F.lit("%"), hex2, rest_p))
            .otherwise(F.concat(F.lit("%"), p))
        )

    return F.concat(head, F.array_join(F.transform(tail, fix), ""))


def url_normalize_col(
    url: Column, strip_www: bool = False
) -> Column:
    """Column expression form of :func:`url_normalize` (composable
    inside any projection). NULL for inputs without ``scheme://``."""
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    # percent-normalize everything after the scheme (the scheme
    # grammar admits no escapes); decoded unreserved alphas in the
    # authority are lowercased right after, query params are sorted
    # AFTER normalization so equal-decoding URLs sort identically
    rest = _pct_normalize(F.regexp_replace(u, _SCHEME_RE, ""))
    auth = F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))
    if strip_www:
        auth = F.regexp_replace(auth, r"^www\.", "")
    # default ports are scheme-dependent
    auth = F.when(
        scheme == "http", F.regexp_replace(auth, ":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(auth, ":443$", "")
    ).otherwise(auth)
    path = F.regexp_extract(rest, r"^[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qpart = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(params, "&")),
    ).otherwise(F.lit(""))
    return F.when(
        scheme != "",
        F.concat(scheme, F.lit("://"), auth, path, qpart),
    )


def url_normalize(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "url_norm",
    strip_www: bool = False,
) -> DataFrame:
    """Append the canonical URL column (see the module contract).
    Pure codegen projection — zero shuffle, runs inside the scan."""
    if out_col in df.columns:
        raise ValueError(f"df already has reserved column: {out_col!r}")
    return df.withColumn(
        out_col, url_normalize_col(F.col(url_col), strip_www=strip_www)
    )


def _parse_psl(rules) -> tuple[dict, dict, dict]:
    """Split PSL-syntax rules into {n_labels: frozenset} maps for
    plain rules, wildcard PARENTS (``*.ck`` stored as ``ck``) and
    exceptions. Comment/blank lines are skipped so a verbatim
    public_suffix_list.dat readlines() works as input. IDN rules
    (the list publishes them in unicode) also register a punycode
    (``xn--``) twin so hosts arriving in either representation match
    the same suffix; labels the stdlib idna codec rejects keep only
    their unicode form."""
    plain: dict[int, set] = {}
    wild: dict[int, set] = {}
    exc: dict[int, set] = {}
    for r in rules:
        r = r.strip().lower()
        if not r or r.startswith("//"):
            continue
        if r.startswith("!"):
            body, bucket = r[1:], exc
        elif r.startswith("*."):
            body, bucket = r[2:], wild
        else:
            body, bucket = r, plain
        n = body.count(".") + 1
        bucket.setdefault(n, set()).add(body)
        if not body.isascii():
            try:
                bucket[n].add(body.encode("idna").decode("ascii"))
            except UnicodeError:
                pass
    return plain, wild, exc


def registrable_domain_col(host_or_url: Column, psl=None) -> Column:
    """Registrable domain (public suffix + one label) of a host or
    full URL (the authority is extracted, port stripped, trailing dot
    dropped), per the publicsuffix.org algorithm: exception rules win
    outright, otherwise the matching rule with the most labels;
    unlisted TLDs take the default rule ``*`` (last two labels — the
    pre-PSL behavior). ``example.co.uk`` now groups as
    ``example.co.uk``, not ``co.uk`` (VERDICT r11 #3). A host that IS
    a public suffix (or a single label, or an IP) returns itself.

    ``psl``: iterable of PSL-syntax rules (``co.uk``, ``*.ck``,
    ``!www.ck``; ``//`` comments skipped) replacing the bundled
    snapshot (:mod:`pidb_rdf_spark.operators.psl_snapshot` — the FULL
    publicsuffix.org list since r13, ICANN + PRIVATE sections; pass a
    newer file's lines here to override).

    Scale shape: pure codegen — the rule sets compile to Catalyst
    ``InSet`` membership tests on the last-k-label slices (a when
    cascade from longest rule length down), zero shuffle, zero Python;
    the rules ship once with the plan, not per row. With the FULL
    ~9.5k-rule list the cascade is assembled as ONE SQL expression
    text parsed by a single ``F.expr`` call (the input column is
    spliced in via its round-trip-verified SQL rendering, the labels
    array bound once through a single-element ``transform`` lambda):
    building it Column-by-Column would create one JVM literal per
    rule through py4j — ~6 s of DRIVER time per call, measured r13 —
    while the text path is ~10 ms for an identical optimized plan
    (``OptimizeIn`` still folds each IN list to an InSet hash
    lookup). If the input column's SQL rendering does not round-trip
    (exotic expressions), the Column-by-Column fallback keeps the
    old behavior."""
    if psl is None:
        from pidb_rdf_spark.operators.psl_snapshot import SNAPSHOT_RULES

        psl = SNAPSHOT_RULES
    plain, wild, exc = _parse_psl(psl)

    u = F.trim(host_or_url)
    host = F.when(
        u.rlike(_SCHEME_RE),
        F.regexp_extract(F.regexp_replace(u, _SCHEME_RE, ""), r"^([^/?#]*)", 1),
    ).otherwise(u)
    # strip userinfo (rare but legal authority part), then port and
    # a trailing dot
    host = F.regexp_replace(host, r"^[^@]*@", "")
    host = F.lower(F.regexp_replace(host, r"(:\d+|\.)$", ""))

    host_sql = _column_sql(host)
    if host_sql is not None:
        return F.expr(_psl_cascade_sql(host_sql, plain, wild, exc))
    return _psl_cascade_columns(host, plain, wild, exc)


def _column_sql(col: Column) -> str | None:
    """SQL text of a Column, or None when it cannot be trusted: the
    rendering must survive a parse -> re-render round trip unchanged
    (a misrendered identifier would otherwise silently change
    semantics — the never-silently-mis-execute doctrine)."""
    try:
        txt = col._jc.toString()
        if F.expr(txt)._jc.toString() != txt:
            return None
        return txt
    except Exception:
        return None


def _sql_str(v: str) -> str:
    return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _in_list(vals) -> str:
    return "(" + ",".join(_sql_str(v) for v in sorted(vals)) + ")"


def _psl_cascade_sql(host_sql: str, plain, wild, exc) -> str:
    """The public-suffix decision as one SQL expression string over
    ``host_sql``. Two nested single-element ``transform`` lambdas
    bind the host (``__h``) and its label array (``__ls``) so each is
    computed once; the label-count cascade builds inside-out exactly
    like the Column fallback (default rule innermost, ascending
    suffix length, exceptions wrapped last)."""
    pub = "1"
    max_suffix = max(max(plain, default=0), max(wild, default=0) + 1)

    def last(k: int) -> str:
        return f"array_join(slice(__ls, -{k}, {k}), '.')"

    for s in range(1, max_suffix + 1):
        if s in plain:
            pub = (
                f"CASE WHEN size(__ls) >= {s} AND {last(s)} IN "
                f"{_in_list(plain[s])} THEN {s} ELSE {pub} END"
            )
        if s - 1 in wild:  # *.parent: (s-1)-label parent -> s-label suffix
            pub = (
                f"CASE WHEN size(__ls) >= {s} AND {last(s - 1)} IN "
                f"{_in_list(wild[s - 1])} THEN {s} ELSE {pub} END"
            )
    for k in sorted(exc):
        pub = (
            f"CASE WHEN size(__ls) >= {k} AND {last(k)} IN "
            f"{_in_list(exc[k])} THEN {k - 1} ELSE {pub} END"
        )
    body = (
        f"transform(array({pub}), __p -> "
        "CASE WHEN size(__ls) > __p "
        "THEN array_join(slice(__ls, -(__p + 1), __p + 1), '.') "
        "ELSE __h END)[0]"
    )
    return (
        f"transform(array({host_sql}), __h -> "
        f"transform(array(split(__h, '\\\\.')), __ls -> {body})[0])[0]"
    )


def _psl_cascade_columns(host: Column, plain, wild, exc) -> Column:
    """Column-by-Column fallback of :func:`_psl_cascade_sql` (used
    when the input's SQL rendering does not round-trip). Identical
    semantics; O(rules) py4j literal creation, so ~6 s of driver time
    with the full list."""
    labels = F.split(host, r"\.")
    n = F.size(labels)

    def last(k: int) -> Column:
        return F.array_join(F.slice(labels, -k, k), ".")

    pub = F.lit(1)
    max_suffix = max(max(plain, default=0), max(wild, default=0) + 1)
    for s in range(1, max_suffix + 1):
        if s in plain:
            pub = F.when(
                (n >= s) & last(s).isin(*sorted(plain[s])), F.lit(s)
            ).otherwise(pub)
        if s - 1 in wild:
            pub = F.when(
                (n >= s) & last(s - 1).isin(*sorted(wild[s - 1])), F.lit(s)
            ).otherwise(pub)
    for k in sorted(exc):
        pub = F.when(
            (n >= k) & last(k).isin(*sorted(exc[k])), F.lit(k - 1)
        ).otherwise(pub)

    reg = F.array_join(
        F.slice(labels, (pub + 1) * -1, pub + 1), "."
    )
    return F.when(n > pub, reg).otherwise(host)


def url_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url_norm",
) -> DataFrame:
    """(url_norm, keep_id, n_dups) — one row per canonical URL, the
    smallest id kept (the :func:`exact_dedup` convention). Rows with
    NULL canonical URL (malformed inputs) are excluded. One hash
    aggregate on the URL; at 100 TB group on ``md5(url_norm)`` to
    shrink shuffle rows, exactly as ``exact_dedup`` documents."""
    return (
        df.filter(F.col(url_col).isNotNull())
        .groupBy(F.col(url_col))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").cast("long").alias("n_dups"),
        )
    )


def cap_per_domain(
    df: DataFrame,
    domain_col: str,
    cap: int,
    id_col: str = "doc_id",
    salt: str = "domaincap",
    hot_threshold: int | None = None,
) -> DataFrame:
    """Keep at most ``cap`` rows per domain, chosen deterministically:
    the ``cap`` smallest ``md5(salt:domain:id)`` draws win (the repo's
    standing replayable-sample contract — a different ``salt`` draws a
    different subset, the same salt replays bit-for-bit on any
    partitioning). The quota step of crawl curation: no host gets to
    dominate the mixture however many pages it serves.

    TWO-PASS hot-domain tier (the straggler fix): a monster domain
    would otherwise sort ALL its rows in one window task — at crawl
    scale the expected case, not a corner. Domains with more than
    ``hot_threshold`` rows (default ``max(64 * cap, 4096)``; one
    map-side-combinable count agg finds them, broadcast back) are
    pre-filtered to draws below ``(4 * cap + 64) / n`` of the draw
    space BEFORE the exact window. Output-identical to the one-pass
    form by construction: every survivor's draw is strictly below
    every non-survivor's, so the ``cap`` smallest survivors ARE the
    ``cap`` smallest overall whenever at least ``cap`` rows survive —
    and the expected survivor count of ``4 * cap + 64`` puts the
    under-select probability below 1e-12 (Chernoff), with an explicit
    driver-side guard that RAISES rather than silently mis-sampling
    on that event (rerun with another ``salt``). Cold domains take
    the plain exact window. Plan shape: two shuffles keyed on the
    domain (count agg + window) instead of one unbounded-skew window;
    the hot window's input is capped at ~``4 * cap + 64`` rows per
    domain."""
    if cap < 1:
        raise ValueError("cap must be >= 1")
    from pyspark.sql import Window

    from pidb_rdf_spark.operators.hashing import md5_prefix_long

    for reserved in ("__n", "__rn"):
        if reserved in df.columns:
            raise ValueError(f"df already has reserved column: {reserved!r}")
    if hot_threshold is None:
        hot_threshold = max(64 * cap, 4096)

    draw = md5_prefix_long(
        F.concat_ws(
            ":",
            F.lit(salt),
            F.col(domain_col).cast("string"),
            F.col(id_col).cast("string"),
        ),
        52,
    )
    w = Window.partitionBy(domain_col).orderBy(
        draw.asc(), F.col(id_col).asc()
    )

    def exact_cap(part: DataFrame) -> DataFrame:
        return (
            part.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= cap)
            .drop("__rn")
        )

    hot = (
        df.groupBy(domain_col)
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") > hot_threshold)
    )
    if hot.isEmpty():
        # no hot domains: the single exact window, unchanged
        return exact_cap(df)
    tagged = df.join(F.broadcast(hot), on=domain_col, how="left")
    cold = tagged.filter(F.col("__n").isNull()).drop("__n")
    # 52-bit draws are exact in a double, so the threshold compare is
    # deterministic; survivors' draws < T < non-survivors' draws
    thresh = (
        F.lit(float(4 * cap + 64)) / F.col("__n") * F.lit(float(1 << 52))
    )
    # NO checkpoint here: the threshold filter must stay visible in
    # the returned plan (pinned by tests — it is the proof the hot
    # window never sorts a raw domain). The guard below re-scans the
    # hot side once; both passes are cheap map work next to the
    # monster-domain sort this tier exists to avoid.
    survivors = tagged.filter(F.col("__n").isNotNull()).filter(
        draw.cast("double") < thresh
    )
    _raise_if_underselected(hot, survivors, domain_col, cap)
    return exact_cap(cold).unionByName(exact_cap(survivors.drop("__n")))


def _raise_if_underselected(
    hot: DataFrame, survivors: DataFrame, domain_col: str, cap: int
) -> None:
    """RAISE if any hot domain's draw pre-filter kept fewer than
    ``cap`` rows. Anchored on the HOT list, not the survivor groups:
    a hot domain whose pre-filter kept ZERO rows has no survivor group
    at all, and grouping survivors alone would let it escape the raise
    and vanish from the output (ADVICE r11) — left-join and coalesce
    the missing count to 0 so the zero-survivor tail raises too."""
    short = (
        hot.select(domain_col)
        .join(
            survivors.groupBy(domain_col).agg(F.count("*").alias("__m")),
            on=domain_col,
            how="left",
        )
        .filter(F.coalesce(F.col("__m"), F.lit(0)) < cap)
    )
    if not short.isEmpty():
        raise RuntimeError(
            "cap_per_domain: a hot domain's draw pre-filter kept fewer "
            f"than cap={cap} rows (p < 1e-12 per domain under uniform "
            "md5 draws) — rerun with a different salt, or raise "
            "hot_threshold to route the domain through the exact window"
        )
