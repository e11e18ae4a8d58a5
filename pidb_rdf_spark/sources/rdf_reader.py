"""RDF sources: parse RDF serializations into the canonical
``triples`` DataFrame (SURVEY.md §2.1 S7-S9).

The triples row shape mirrors the reference's streamed statement
(``semantics/result/StreamedStatement.java:3-20``): subject,
predicate, object, is_literal, datatype, lang.

Two parse paths:

- **N-Triples** (the scale path): line-oriented, so it parallelizes
  perfectly — ``spark.read.text`` + JVM-side regex extraction. No
  Python in the loop; a 100 TB N-Triples dump parses at full cluster
  width with predicate/projection pushdown downstream.
- **Turtle subset** (ontology-sized files): Turtle is stateful
  (@prefix declarations, ';'/',' continuation), so a partition-
  parallel parse is incorrect in general. Files are parsed per-file
  inside ``mapPartitions`` over (path, content) pairs from
  ``spark.read.wholeTextFiles`` — one task per file; scale by file
  count, which is how multi-TB Turtle corpora ship anyway.

The reference reads {RDF/XML, JSON-LD, TriG} through RDF4J Rio
(``pidb-rdf-import/pom.xml``); those parsers are not in this image —
``read_rdf(fmt=...)`` raises NotImplementedError for them (gated, not
silently wrong).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRIPLES_SCHEMA = T.StructType(
    [
        T.StructField("subject", T.StringType(), False),
        T.StructField("predicate", T.StringType(), False),
        T.StructField("object", T.StringType(), False),
        T.StructField("is_literal", T.BooleanType(), False),
        T.StructField("datatype", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# one N-Triples statement: subject (IRI | bnode), predicate (IRI),
# object (IRI | bnode | literal with optional @lang / ^^<dt>)
_NT_LINE = (
    r"^\s*(<[^>]*>|_:\S+)\s+"  # 1 subject
    r"<([^>]*)>\s+"  # 2 predicate
    r"(.*?)\s*\.\s*$"  # 3 object term
)
_NT_LITERAL = r'^"((?:[^"\\]|\\.)*)"(?:@([A-Za-z][A-Za-z0-9-]*)|\^\^<([^>]*)>)?$'


def _unescape(col):
    """N-Triples string unescape: \\" \\\\ \\n \\t \\r.

    ``\\\\`` must be consumed FIRST (via a sentinel) so the backslash
    of an escaped backslash can't pair with a following ``n``/``t``/
    ``r`` — otherwise the valid literal ``C:\\\\new`` (meaning
    ``C:\\new``) would decode as ``C:\\`` + newline + ``ew``."""
    sentinel = "\x00"
    out = F.regexp_replace(col, r"\\\\", sentinel)
    out = F.regexp_replace(out, r'\\"', '"')
    out = F.regexp_replace(out, r"\\n", "\n")
    out = F.regexp_replace(out, r"\\t", "\t")
    out = F.regexp_replace(out, r"\\r", "\r")
    out = F.regexp_replace(out, sentinel, r"\\")
    return out


_PY_ESCAPE_RE = re.compile(r"\\(u[0-9A-Fa-f]{4}|U[0-9A-Fa-f]{8}|.)")
_PY_ESCAPE_MAP = {
    "n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


def unescape_string(s: str) -> str:
    """Driver/executor-side Turtle/SPARQL string unescape.

    Translates only the defined escape sequences (``\\\\ \\" \\' \\n
    \\t \\r \\b \\f \\uXXXX \\UXXXXXXXX``) — unlike
    ``encode().decode('unicode_escape')``, which reinterprets UTF-8
    bytes as Latin-1 and mangles non-ASCII text like ``"Müller"``."""

    def _sub(m: re.Match) -> str:
        esc = m.group(1)
        if esc[0] in "uU":
            return chr(int(esc[1:], 16))
        return _PY_ESCAPE_MAP.get(esc, esc)

    return _PY_ESCAPE_RE.sub(_sub, s)


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """N-Triples file(s) -> triples DataFrame, fully JVM-side."""
    lines = spark.read.text(path)
    return parse_ntriples_lines(lines)


def parse_ntriples_lines(lines: DataFrame) -> DataFrame:
    """Parse a DataFrame of N-Triples lines (column ``value``)."""
    stmt = lines.filter(
        ~F.col("value").rlike(r"^\s*(#.*)?$")  # drop comments/blank
    ).select(
        F.regexp_extract("value", _NT_LINE, 1).alias("s_raw"),
        F.regexp_extract("value", _NT_LINE, 2).alias("predicate"),
        F.regexp_extract("value", _NT_LINE, 3).alias("o_raw"),
    ).filter(F.col("predicate") != "")

    s = F.when(
        F.col("s_raw").startswith("<"),
        F.expr("substring(s_raw, 2, length(s_raw) - 2)"),
    ).otherwise(F.col("s_raw"))

    is_literal = F.col("o_raw").startswith('"')
    lex = F.regexp_extract("o_raw", _NT_LITERAL, 1)
    lang = F.regexp_extract("o_raw", _NT_LITERAL, 2)
    dtype = F.regexp_extract("o_raw", _NT_LITERAL, 3)
    obj_iri = F.when(
        F.col("o_raw").startswith("<"),
        F.expr("substring(o_raw, 2, length(o_raw) - 2)"),
    ).otherwise(F.col("o_raw"))  # bnode

    return stmt.select(
        s.alias("subject"),
        F.col("predicate"),
        F.when(is_literal, _unescape(lex)).otherwise(obj_iri).alias("object"),
        is_literal.alias("is_literal"),
        F.when(is_literal & (dtype != ""), dtype).alias("datatype"),
        F.when(is_literal & (lang != ""), lang).alias("lang"),
    )


# ---------------------------------------------------------------------------
# Turtle subset parser (per-file, python) — prefixes, a, ; , lists of
# objects, IRIs, prefixed names, literals with @lang/^^dt, bnodes.
# ---------------------------------------------------------------------------

_TTL_TOKEN = re.compile(
    r"""
      (?P<comment>\#[^\n]*)
    | (?P<prefix_decl>@prefix|@base|PREFIX|BASE)
    | (?P<iriref><[^>]*>)
    | (?P<literal>"(?:[^"\\]|\\.)*"(?:@[A-Za-z][A-Za-z0-9-]*|\^\^(?:<[^>]*>|[A-Za-z_][\w.-]*:[\w.-]+))?)
    | (?P<bnode>_:[\w.-]+)
    | (?P<pname>[A-Za-z_][\w.-]*?:[\w.-]*|:[\w.-]*)
    | (?P<kw_a>\ba\b)
    | (?P<num>[+-]?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
    | (?P<bool>\btrue\b|\bfalse\b)
    | (?P<punct>[;,.\[\]()])
    | (?P<ws>\s+)
    """,
    re.VERBOSE,
)

_XSD = "http://www.w3.org/2001/XMLSchema#"
_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def parse_turtle_text(text: str) -> list[tuple]:
    """Parse one Turtle document -> list of triples-row tuples.
    Runs inside an executor task (one file per task)."""
    prefixes: dict[str, str] = {}
    rows: list[tuple] = []
    toks: list[tuple[str, str]] = []
    for m in _TTL_TOKEN.finditer(text):
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        toks.append((kind, m.group()))
    i = 0

    def resolve(kind: str, tok: str):
        """-> (value, is_literal, datatype, lang)"""
        if kind == "iriref":
            return tok[1:-1], False, None, None
        if kind == "bnode":
            return tok, False, None, None
        if kind == "pname":
            pfx, _, local = tok.partition(":")
            return prefixes.get(pfx, pfx + ":") + local, False, None, None
        if kind == "kw_a":
            return _RDF_TYPE, False, None, None
        if kind == "num":
            dt = _XSD + ("integer" if re.fullmatch(r"[+-]?\d+", tok) else "decimal")
            return tok, True, dt, None
        if kind == "bool":
            return tok, True, _XSD + "boolean", None
        if kind == "literal":
            m2 = re.fullmatch(
                r'"((?:[^"\\]|\\.)*)"(?:@([A-Za-z][A-Za-z0-9-]*)|\^\^(<[^>]*>|[\w.-]*:[\w.-]+))?',
                tok,
            )
            lex = unescape_string(m2.group(1))
            lang = m2.group(2)
            dt_tok = m2.group(3)
            dt = None
            if dt_tok:
                if dt_tok.startswith("<"):
                    dt = dt_tok[1:-1]
                else:
                    pfx, _, local = dt_tok.partition(":")
                    dt = prefixes.get(pfx, pfx + ":") + local
            return lex, True, dt, lang
        raise ValueError(f"unexpected token {tok!r} as term")

    while i < len(toks):
        kind, tok = toks[i]
        if kind == "prefix_decl":
            if tok.lower().endswith("prefix"):
                pname = toks[i + 1][1]
                iri = toks[i + 2][1][1:-1]
                prefixes[pname.rstrip(":")] = iri
                i += 3
                if i < len(toks) and toks[i][1] == ".":
                    i += 1
            else:  # @base — rare; skip its IRI
                i += 2
                if i < len(toks) and toks[i][1] == ".":
                    i += 1
            continue
        subj, _, _, _ = resolve(kind, tok)
        i += 1
        while True:  # predicate-object list
            pk, pt = toks[i]
            pred, _, _, _ = resolve(pk, pt)
            i += 1
            while True:  # object list
                ok, ot = toks[i]
                obj, is_lit, dt, lang = resolve(ok, ot)
                rows.append((subj, pred, obj, is_lit, dt, lang))
                i += 1
                if i < len(toks) and toks[i][1] == ",":
                    i += 1
                    continue
                break
            if i < len(toks) and toks[i][1] == ";":
                i += 1
                # trailing ; before .
                if i < len(toks) and toks[i][1] == ".":
                    break
                continue
            break
        if i < len(toks) and toks[i][1] == ".":
            i += 1
    return rows


def read_turtle(spark: SparkSession, path: str) -> DataFrame:
    """Turtle file(s) -> triples DataFrame: one parse task per file
    (Turtle's @prefix state makes line-splitting incorrect)."""
    files = spark.sparkContext.wholeTextFiles(path)
    rows = files.flatMap(lambda kv: parse_turtle_text(kv[1]))
    return rows.toDF(TRIPLES_SCHEMA)


def parse_rdf_snippet(spark: SparkSession, text: str, fmt: str = "Turtle") -> DataFrame:
    """Inline RDF fragment -> triples (reference ``previewRDFSnippet``,
    ``semantics/RDFImport.java:157-186``)."""
    fmt_l = fmt.lower().replace("-", "")
    if fmt_l in ("turtle", "ttl"):
        return spark.createDataFrame(parse_turtle_text(text), TRIPLES_SCHEMA)
    if fmt_l in ("ntriples", "nt"):
        lines = spark.createDataFrame([(ln,) for ln in text.splitlines()], ["value"])
        return parse_ntriples_lines(lines)
    raise NotImplementedError(f"RDF format {fmt!r} needs an external parser")


_RDFLIB_FORMATS = {
    "rdfxml": "xml",
    "xml": "xml",
    "jsonld": "json-ld",
    "trig": "trig",
}


def _parse_with_rdflib(doc: str, rdflib_fmt: str) -> list[tuple]:
    """One document -> triples rows via rdflib (executor-side; import
    inside the task so the driver never needs the library). TriG
    named-graph context is dropped — the reference's LPG mapping has
    no quad concept either (``StreamedStatement.java:3-20`` is s/p/o)."""
    import rdflib  # gated: only reached when the format needs it
    from rdflib import Literal as RLiteral

    g = rdflib.ConjunctiveGraph() if rdflib_fmt == "trig" else rdflib.Graph()
    g.parse(data=doc, format=rdflib_fmt)
    rows = []
    for s, p, o in g:
        if isinstance(o, RLiteral):
            dt = str(o.datatype) if o.datatype else None
            rows.append((str(s), str(p), str(o), True, dt, o.language))
        else:
            rows.append((str(s), str(p), str(o), False, None, None))
    return rows


def read_rdf(spark: SparkSession, path: str, fmt: str = "N-Triples") -> DataFrame:
    """Dispatch by format name (reference supports {RDF/XML, JSON-LD,
    Turtle, N-Triples, TriG}, ``RDFImport.java:45-46``). N-Triples is
    line-parallel, Turtle file-parallel with a native lexer; the
    remaining three parse file-parallel through rdflib inside
    ``mapPartitions``-style tasks when the library is installed, and
    raise a clear gate error here (rdflib is not in this container)."""
    fmt_l = fmt.lower().replace("-", "").replace("/", "")
    if fmt_l in ("ntriples", "nt"):
        return read_ntriples(spark, path)
    if fmt_l in ("turtle", "ttl"):
        return read_turtle(spark, path)
    if fmt_l in _RDFLIB_FORMATS:
        try:
            import rdflib  # noqa: F401  (driver-side availability check)
        except ImportError as e:
            raise NotImplementedError(
                f"RDF format {fmt!r} parses via rdflib, which is not "
                "installed in this environment (pip install rdflib)"
            ) from e
        rdflib_fmt = _RDFLIB_FORMATS[fmt_l]
        files = spark.sparkContext.wholeTextFiles(path)
        rows = files.flatMap(lambda kv: _parse_with_rdflib(kv[1], rdflib_fmt))
        return rows.toDF(TRIPLES_SCHEMA)
    raise NotImplementedError(f"unknown RDF format {fmt!r}")
