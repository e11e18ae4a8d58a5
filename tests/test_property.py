"""Property-based tests (hypothesis): transitive closure vs a pure-
Python oracle on random graphs, and RDF import→export→parse
round-trips on random triple sets (SURVEY.md §5.4-5.5).

Example counts are small — every example runs Spark jobs — but the
generators cover the structural edge cases (cycles, self-loops,
diamonds, unicode-ish literals, datatype round-trips)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_closure(pairs):
    """Naive reachability oracle (handles cycles)."""
    from collections import defaultdict

    adj = defaultdict(set)
    for c, p in pairs:
        adj[c].add(p)
    out = set()
    for start in {c for c, _ in pairs}:
        seen, stack = set(), [start]
        while stack:
            n = stack.pop()
            for p in adj[n]:
                if p not in seen:
                    seen.add(p)
                    stack.append(p)
        out |= {(start, p) for p in seen}
    return out


edges_strategy = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=1,
    max_size=25,
)


@SLOW
@given(pairs=edges_strategy)
def test_closure_matches_python_oracle(spark, pairs):
    from pidb_rdf_spark.inference import transitive_closure

    df = spark.createDataFrame(
        [(str(c), str(p)) for c, p in pairs], ["child", "parent"]
    )
    got = {
        (r["child"], r["parent"]) for r in transitive_closure(df).collect()
    }
    expected = {(str(c), str(p)) for c, p in _py_closure(pairs)}
    assert got == expected


literal_strategy = st.one_of(
    st.text(
        alphabet=st.characters(
            whitelist_categories=("L", "N"), max_codepoint=0x2FF
        ),
        min_size=0,
        max_size=12,
    ),
    st.integers(-(2**31), 2**31),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.booleans(),
)

XSD = "http://www.w3.org/2001/XMLSchema#"


def _to_triple(i, subj_n, pred_n, value):
    subj = f"http://ex.org/s{subj_n}"
    pred = f"http://ex.org/p{pred_n}"
    if isinstance(value, bool):
        return (subj, pred, str(value).lower(), True, XSD + "boolean", None)
    if isinstance(value, int):
        return (subj, pred, str(value), True, XSD + "long", None)
    if isinstance(value, float):
        return (subj, pred, repr(value), True, XSD + "double", None)
    return (subj, pred, value, True, None, None)


@SLOW
@given(
    data=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 3), literal_strategy),
        min_size=1,
        max_size=8,
        unique_by=lambda t: (t[0], t[1]),  # one value per (subj, pred)
    )
)
def test_rdf_literal_roundtrip(spark, data):
    """import → export → re-parse: literal triples survive with their
    value and 3-family datatype (reference import/export pair S7/S12;
    shorten/expand inverse F3/F4)."""
    from pidb_rdf_spark.sources.importer import import_triples
    from pidb_rdf_spark.sources.rdf_reader import (
        TRIPLES_SCHEMA,
        parse_ntriples_lines,
    )
    from pidb_rdf_spark.sources.rdf_writer import (
        graph_to_triples,
        triples_to_ntriples_lines,
    )

    triples = spark.createDataFrame(
        [_to_triple(i, s, p, v) for i, (s, p, v) in enumerate(data)],
        TRIPLES_SCHEMA,
    )
    g = import_triples(spark, triples)
    lines = triples_to_ntriples_lines(graph_to_triples(g))
    reparsed = parse_ntriples_lines(lines.withColumnRenamed("line", "value"))

    def norm(rows):
        out = set()
        for r in rows:
            val = r["object"]
            dt = r["datatype"]
            if dt == XSD + "long":
                val = str(int(val))
            elif dt == XSD + "double":
                val = repr(float(val))
            elif dt == XSD + "boolean":
                val = val.lower()
            out.add((r["subject"], r["predicate"], val, dt))
        return out

    orig = norm(triples.collect())
    back = norm(reparsed.filter("is_literal").collect())
    assert back == orig


@SLOW
@given(
    vectors=st.lists(
        st.lists(
            st.floats(
                min_value=-1e6, max_value=1e6,
                allow_nan=False, allow_infinity=False, width=32,
            ),
            min_size=4, max_size=4,
        ),
        min_size=1, max_size=8,
    )
)
def test_quantize_roundtrip_bound_property(spark, vectors):
    """∀ float vectors: |dequantize(quantize(x)) - x| ≤ scale/2 + eps
    per component, and quantized ints stay in [-127, 127]."""
    from pidb_rdf_spark.operators import (
        dequantize_embeddings,
        quantize_embeddings,
    )

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vectors)],
        "vec_id long, embedding array<double>",
    )
    q = quantize_embeddings(df)
    back = {r["vec_id"]: r["embedding"] for r in dequantize_embeddings(q).collect()}
    scales = {r["vec_id"]: r["scale"] for r in q.collect()}
    for i, v in enumerate(vectors):
        tol = scales[i] / 2 + 1e-9 * max(1.0, scales[i])
        assert all(abs(a - b) <= tol for a, b in zip(v, back[i]))
    for r in q.collect():
        assert all(-127 <= x <= 127 for x in r["qvec"])


def _py_components(pairs):
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    return {
        n: min(members) for members in comp.values() for n in members
    }


@SLOW
@given(pairs=edges_strategy)
def test_star_components_match_union_find(spark, pairs):
    """Pointer-doubling (large-star/small-star) components equal the
    python union-find oracle AND the min-label implementation."""
    from pidb_rdf_spark.analytics import (
        connected_components,
        connected_components_star,
    )

    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )
    expected = {
        (n, c) for n, c in _py_components(pairs).items() if True
    }
    # drop self-loop-only nodes the same way _sym does
    real = {(a, b) for a, b in pairs if a != b}
    nodes_in = {x for e in real for x in e}
    expected = {(n, c) for n, c in expected if n in nodes_in}
    got_star = {
        (r["node"], r["component"])
        for r in connected_components_star(df).collect()
    }
    assert got_star == expected
    got_minlabel = {
        (r["node"], r["component"])
        for r in connected_components(df).collect()
    }
    assert got_star == got_minlabel


def _py_ktruss(pairs, k):
    edges = {tuple(sorted(e)) for e in pairs if e[0] != e[1]}
    while True:
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        kept = {
            (a, b)
            for a, b in edges
            if len(adj[a] & adj[b]) >= k - 2
        }
        if kept == edges:
            return edges
        edges = kept


@SLOW
@given(pairs=edges_strategy, k=st.integers(3, 5))
def test_ktruss_matches_python_oracle(spark, pairs, k):
    from pidb_rdf_spark.analytics import ktruss

    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )
    got = {(r["a"], r["b"]) for r in ktruss(df, k).collect()}
    assert got == _py_ktruss(pairs, k)


@SLOW
@given(
    ids=st.lists(st.integers(0, 1_000_000), min_size=1, max_size=40,
                 unique=True),
    n_shards=st.integers(1, 7),
)
def test_deterministic_shuffle_matches_python(spark, ids, n_shards):
    import hashlib

    from pidb_rdf_spark.operators.mixing import deterministic_shuffle

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: (r["shard"], r["seq"])
        for r in deterministic_shuffle(df, n_shards).collect()
    }
    def h(i):
        return int(hashlib.md5(f"shuffle:{i}".encode()).hexdigest()[:13], 16)

    by_shard = {}
    for i in ids:
        by_shard.setdefault(h(i) % n_shards, []).append(i)
    want = {}
    for s, members in by_shard.items():
        for seq, i in enumerate(sorted(members, key=lambda x: (h(x), x))):
            want[i] = (s, seq)
    assert got == want


def _py_funnel(rows, steps, within_s):
    import datetime as dt

    by_user = {}
    for u, ts, e in rows:
        by_user.setdefault(u, []).append((ts, e))
    counts = [0] * len(steps)
    for u, evs in by_user.items():
        evs.sort()
        t1 = min((t for t, e in evs if e == steps[0]), default=None)
        if t1 is None:
            continue
        counts[0] += 1
        deadline = t1 + dt.timedelta(seconds=within_s)
        tprev = t1
        for i, s in enumerate(steps[1:], start=1):
            ti = min(
                (t for t, e in evs if e == s and tprev <= t <= deadline),
                default=None,
            )
            if ti is None:
                break
            counts[i] += 1
            tprev = ti
    return counts


@SLOW
@given(
    data=st.lists(
        st.tuples(
            st.integers(1, 6),                      # user
            st.integers(0, 7200),                   # offset seconds
            st.sampled_from(["a", "b", "c", "x"]),  # event type
        ),
        min_size=1,
        max_size=60,
    )
)
def test_funnel_matches_python_oracle(spark, data):
    import datetime as dt

    from pidb_rdf_spark.streaming.events import funnel

    base = dt.datetime(2024, 1, 1)
    rows = [(u, base + dt.timedelta(seconds=off), e) for u, off, e in data]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    got = {
        r["step_idx"]: r["n_converted"]
        for r in funnel(df, ["a", "b", "c"], within="1 hour").collect()
    }
    want = _py_funnel(rows, ["a", "b", "c"], 3600)
    assert [got[i] for i in range(3)] == want


# --- URL canonicalization properties -------------------------------------

_url_strategy = st.builds(
    lambda scheme, www, host, port, path, params, frag: (
        scheme
        + "://"
        + ("WWW." if www else "")
        + host
        + (f":{port}" if port else "")
        + "/"
        + "/".join(path)
        + ("/" if path else "")
        + ("?" + "&".join(params) if params else "")
        + (f"#{frag}" if frag else "")
    ),
    scheme=st.sampled_from(["http", "HTTP", "https", "HTTPS", "ftp"]),
    www=st.booleans(),
    host=st.sampled_from(
        ["Example.COM", "a.b.example.org", "localhost", "X--Y.net"]
    ),
    port=st.sampled_from([None, 80, 443, 8080]),
    path=st.lists(
        st.one_of(
            st.text(alphabet="abcXYZ019._-~", min_size=1, max_size=6),
            # percent-escape shapes (r11): unreserved decodes,
            # reserved keeps its escape with upper hex, dangling and
            # short escapes pass through — idempotence must hold
            # through all of them
            st.sampled_from(
                ["%7E", "%7e", "%41", "%2F", "%2f", "%25", "a%4",
                 "100%", "%3a%3A", "x%20y"]
            ),
        ),
        max_size=3,
    ),
    params=st.lists(
        st.sampled_from(
            ["a=1", "Z=2", "utm_source=x", "UTM_campaign=Y",
             "fbclid=f", "q=hello", "empty=", "e=%7e", "f=%3c"]
        ),
        max_size=4,
        unique=True,
    ),
    frag=st.sampled_from([None, "sec", "x/y?z"]),
)


@SLOW
@given(urls=st.lists(_url_strategy, min_size=1, max_size=20))
def test_url_normalize_idempotent_and_clean(spark, urls):
    """Canonicalization is IDEMPOTENT (normalize∘normalize ==
    normalize — the property that makes canonical URLs safe as join/
    dedup keys built at different pipeline stages) and the output
    never retains a fragment, a tracking parameter, a default port,
    or uppercase scheme/authority."""
    from pyspark.sql import functions as F

    from pidb_rdf_spark.operators import url_normalize

    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    once = url_normalize(df)
    twice = url_normalize(
        once.select("doc_id", F.col("url_norm").alias("url"))
    )
    a = {r.doc_id: r.url_norm for r in once.collect()}
    b = {r.doc_id: r.url_norm for r in twice.collect()}
    assert a == b
    for v in a.values():
        assert v is not None
        assert "#" not in v
        assert "utm_" not in v.lower().split("?")[-1] or "?" not in v
        assert "fbclid" not in v
        # default ports are scheme-specific: :80 is only default for
        # http (https://host:80 is a DIFFERENT origin and must stay)
        assert not (v.startswith("http://") and ":80/" in v)
        assert not (v.startswith("https://") and ":443/" in v)
        scheme, rest = v.split("://", 1)
        assert scheme == scheme.lower()
        auth = rest.split("/", 1)[0]
        assert auth == auth.lower()


@SLOW
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_categories=("Cs",)
            ),
            max_size=40,
        ),
        min_size=1,
        max_size=15,
    )
)
def test_normalize_text_idempotent_matches_python(spark, texts):
    """normalize_text is IDEMPOTENT (safe as a dedup key built at
    different pipeline stages) and matches a pure-Python twin of the
    pipeline (NFC -> control strip -> whitespace collapse) on
    arbitrary unicode."""
    import re as _re
    import unicodedata

    from pyspark.sql import functions as F

    from pidb_rdf_spark.operators import normalize_text

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    once = normalize_text(df, form="NFC")
    a = {r.id: r.text_norm for r in once.collect()}
    twice = normalize_text(
        once.select("id", F.col("text_norm").alias("text")), form="NFC"
    )
    b = {r.id: r.text_norm for r in twice.collect()}
    assert a == b

    ctrl = _re.compile("[\x00-\x08\x0B\x0C\x0E-\x1F\x7F-\x9F]")
    for i, t in enumerate(texts):
        want = unicodedata.normalize("NFC", t)
        want = ctrl.sub("", want)
        want = _re.sub(r"\s+", " ", want).strip()
        assert a[i] == want, (i, repr(t), repr(a[i]), repr(want))


@SLOW
@given(
    docs=st.lists(
        st.tuples(st.integers(0, 1_000_000), st.integers(0, 40)),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    ),
    seq_len=st.integers(1, 17),
    n_shards=st.integers(1, 5),
    sep=st.integers(0, 3),
)
def test_pack_manifest_matches_python(spark, docs, seq_len, n_shards, sep):
    """pack_manifest vs a pure-Python replay of the full layout:
    md5-shuffle order, sep-token gaps, cuts — over random counts
    (including zero-token docs), seq_lens, shard counts and
    separator widths."""
    import hashlib

    from pidb_rdf_spark.operators import pack_manifest

    df = spark.createDataFrame(docs, "doc_id long, n_tokens long")
    got = sorted(
        tuple(r)
        for r in pack_manifest(
            df,
            seq_len=seq_len,
            n_shards=n_shards,
            tokens_col="n_tokens",
            sep_tokens=sep,
        ).collect()
    )

    def h(i):
        return int(hashlib.md5(f"shuffle:{i}".encode()).hexdigest()[:13], 16)

    order = sorted(
        (d for d in docs if d[1] > 0),
        key=lambda d: (h(d[0]) % n_shards, h(d[0]), d[0]),
    )
    want, off = [], 0
    for doc, n in order:
        start, end = off, off + n
        c = start // seq_len
        while c * seq_len < end:
            s = max(start, c * seq_len)
            e = min(end, (c + 1) * seq_len)
            want.append((c, doc, s - start, s - c * seq_len, e - s, n))
            c += 1
        off = end + sep
    assert got == sorted(want)
