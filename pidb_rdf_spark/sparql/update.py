"""SPARQL Update front-end: ``INSERT/DELETE DATA`` and the
pattern-based ``DELETE/INSERT ... WHERE`` forms.

The reference mutates through TinkerPop/Cypher procedures, not SPARQL
Update; this module closes that loop for RDF-side users so the graph
can be written the same way it is queried.

- ``INSERT DATA`` → ``merge_triples`` (node upsert + prop deep-merge
  + edge dedup-on-insert, M10/M11)
- ``DELETE DATA`` → ``remove_triples`` (edge anti-join, label strip,
  value-conditional prop removal)
- ``DELETE {T} INSERT {T2} WHERE {P}`` (either template optional,
  plus the ``DELETE WHERE {P}`` shorthand where the pattern is its
  own template) → each template is rewritten into a ``CONSTRUCT``
  query over the SAME ``WHERE`` text and compiled by the ordinary
  query compiler (``compiler._compile_construct``), so the full
  pattern language — paths, FILTER, OPTIONAL, UNION — works in the
  WHERE for free; the constructed triple sets then route through the
  same two importer primitives. Per SPARQL 1.1 Update §3.1.3, both
  templates are instantiated against the PRE-update state (the graph
  frames are immutable, so the lazily-built INSERT construct keeps
  reading the original tables even after the delete is applied).

Scale: everything lands in batch set-operations (unions, anti-joins,
map rewrites) — no per-statement loop; a million-triple INSERT DATA
costs the same plan as the importer's bulk path, and a pattern
update's WHERE enjoys every compiler optimization (selectivity-
ordered joins, pushdown) because it IS a query plan.
"""

from __future__ import annotations

import re

from pidb_rdf_spark.graph import PropertyGraph

_PREFIX_RE = re.compile(
    r"PREFIX\s+([A-Za-z][\w.-]*)?\s*:\s*<([^>]*)>", re.IGNORECASE
)


def _block_end(text: str, start: int) -> int:
    """Index of the ``}`` closing the block opened just before
    ``start`` — brace-counting that skips quoted literals (a literal
    may contain braces)."""
    depth = 1
    i = start
    n = len(text)
    while i < n:
        c = text[i]
        if c in "\"'":
            quote = c
            i += 1
            while i < n:
                if text[i] == "\\":
                    i += 2
                    continue
                if text[i] == quote:
                    break
                i += 1
        elif c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise SyntaxError("unbalanced braces in SPARQL Update data block")


_KW_RE = re.compile(r"\b(INSERT|DELETE|WHERE)\b", re.IGNORECASE)
_DATA_RE = re.compile(r"\s*DATA\s*\{", re.IGNORECASE)
_BRACE_RE = re.compile(r"\s*\{")


def _kw_at(text: str, pos: int):
    """The INSERT/DELETE/WHERE keyword starting at the next non-space
    char, or None."""
    while pos < len(text) and text[pos].isspace():
        pos += 1
    return _KW_RE.match(text, pos)


def _take_block(text: str, pos: int) -> tuple[str, int]:
    """(block_body, index_after_closing_brace) for the ``{...}`` block
    whose ``{`` is the next non-space char at ``pos``."""
    m = _BRACE_RE.match(text, pos)
    if not m:
        raise SyntaxError(f"expected '{{' at: {text[pos:pos + 40]!r}")
    end = _block_end(text, m.end())
    return text[m.end():end], end + 1


def parse_update(update: str) -> list[tuple]:
    """Sequence of operations, in source order:

    - ``("INSERT", turtle)`` / ``("DELETE", turtle)`` — ground DATA
      blocks, with the query's PREFIX declarations re-emitted as
      ``@prefix`` lines so the Turtle parser resolves prefixed names
      identically;
    - ``("MODIFY", delete_tmpl|None, insert_tmpl|None, where_text,
      prefix_header)`` — pattern forms, templates and WHERE kept as
      raw text for the CONSTRUCT rewrite (the query compiler's parser
      owns their grammar)."""
    prefixes = [
        f"@prefix {m.group(1) or ''}: <{m.group(2)}> ."
        for m in _PREFIX_RE.finditer(update)
    ]
    prefix_header = "\n".join(
        f"PREFIX {m.group(1) or ''}: <{m.group(2)}>"
        for m in _PREFIX_RE.finditer(update)
    )
    ops = []
    i = 0
    while True:
        kw = _KW_RE.search(update, i)
        if kw is None:
            break
        word = kw.group(1).upper()
        if word == "WHERE":  # only reachable standalone via bad input
            raise SyntaxError("WHERE without a preceding INSERT/DELETE")
        dm = _DATA_RE.match(update, kw.end())
        if dm:  # ground form: INSERT DATA { ... } / DELETE DATA { ... }
            end = _block_end(update, dm.end())
            block = update[dm.end():end]
            ops.append((word, "\n".join(prefixes + [block])))
            i = end + 1
            continue
        # pattern form
        delete_tmpl = insert_tmpl = None
        if word == "DELETE":
            nxt = _kw_at(update, kw.end())
            if nxt and nxt.group(1).upper() == "WHERE":
                # DELETE WHERE { P }: the pattern is its own template
                where, i = _take_block(update, nxt.end())
                ops.append(("MODIFY", where, None, where, prefix_header))
                continue
            delete_tmpl, i = _take_block(update, kw.end())
            ins = _kw_at(update, i)
            if ins and ins.group(1).upper() == "INSERT":
                insert_tmpl, i = _take_block(update, ins.end())
        else:  # INSERT { T } WHERE { P }
            insert_tmpl, i = _take_block(update, kw.end())
        wh = _kw_at(update, i)
        if not wh or wh.group(1).upper() != "WHERE":
            raise SyntaxError(
                "pattern-based INSERT/DELETE requires a WHERE clause"
            )
        where, i = _take_block(update, wh.end())
        ops.append(("MODIFY", delete_tmpl, insert_tmpl, where, prefix_header))
    if not ops:
        raise SyntaxError("no SPARQL Update operation found")
    return ops


def _construct_triples(graph: PropertyGraph, tmpl: str, where: str,
                       prefix_header: str):
    """Instantiate a template against the WHERE bindings by compiling
    ``CONSTRUCT { tmpl } WHERE { where }`` with the ordinary query
    compiler, widened to the importer's TRIPLES_SCHEMA (construct
    emits no datatype/lang — plain literals)."""
    from pyspark.sql import functions as F

    from pidb_rdf_spark.sparql.compiler import sparql

    q = f"{prefix_header}\nCONSTRUCT {{ {tmpl} }} WHERE {{ {where} }}"
    return sparql(graph, q).select(
        "subject", "predicate", "object", "is_literal",
        F.lit(None).cast("string").alias("datatype"),
        F.lit(None).cast("string").alias("lang"),
    )


def sparql_update(graph: PropertyGraph, update: str) -> PropertyGraph:
    """Apply a SPARQL Update string (``INSERT DATA`` / ``DELETE DATA``
    / ``DELETE {} INSERT {} WHERE {}`` operations, ``;``-chained, run
    in source order) and return the updated PropertyGraph
    (immutable-tables semantics, like every mutation operator)."""
    from pidb_rdf_spark.sources.importer import merge_triples, remove_triples
    from pidb_rdf_spark.sources.rdf_reader import parse_rdf_snippet

    g = graph
    for op in parse_update(update):
        if op[0] == "MODIFY":
            _, delete_tmpl, insert_tmpl, where, prefix_header = op
            # both templates bind against the PRE-update state
            # (SPARQL 1.1 Update §3.1.3); g's frames are immutable so
            # the two lazily-built constructs both read them as-is
            del_triples = (
                _construct_triples(g, delete_tmpl, where, prefix_header)
                if delete_tmpl is not None else None
            )
            ins_triples = (
                _construct_triples(g, insert_tmpl, where, prefix_header)
                if insert_tmpl is not None else None
            )
            if del_triples is not None:
                g = remove_triples(g, del_triples)
            if ins_triples is not None:
                g = merge_triples(g, ins_triples)
            continue
        kind, turtle = op
        triples = parse_rdf_snippet(graph.spark, turtle, "Turtle")
        if kind == "INSERT":
            g = merge_triples(g, triples)
        else:
            g = remove_triples(g, triples)
    return g
