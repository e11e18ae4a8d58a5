"""SPARQL Update front-end: ``INSERT DATA`` / ``DELETE DATA``.

The reference mutates through TinkerPop/Cypher procedures, not SPARQL
Update; this module closes that loop for RDF-side users so the graph
can be written the same way it is queried. Ground-triple forms only —
each operation's data block is parsed by the repo's own Turtle parser
and routed to the set-oriented importer primitives:

- ``INSERT DATA`` → ``merge_triples`` (node upsert + prop deep-merge
  + edge dedup-on-insert, M10/M11)
- ``DELETE DATA`` → ``remove_triples`` (edge anti-join, label strip,
  value-conditional prop removal)

Pattern-based ``INSERT/DELETE ... WHERE`` is deliberately out of
scope for now: its WHERE half is the ordinary query compiler, and the
reference offers no equivalent surface either.

Scale: everything lands in batch set-operations (unions, anti-joins,
map rewrites) — no per-statement loop; a million-triple INSERT DATA
costs the same plan as the importer's bulk path.
"""

from __future__ import annotations

import re

from pidb_rdf_spark.graph import PropertyGraph

_PREFIX_RE = re.compile(
    r"PREFIX\s+([A-Za-z][\w.-]*)?\s*:\s*<([^>]*)>", re.IGNORECASE
)
_OP_RE = re.compile(r"\b(INSERT|DELETE)\s+DATA\s*\{", re.IGNORECASE)


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


def parse_update(update: str) -> list[tuple[str, str]]:
    """[(op, turtle_text)] for each INSERT/DELETE DATA block, with the
    query's PREFIX declarations re-emitted as ``@prefix`` lines so the
    Turtle parser resolves prefixed names identically."""
    prefixes = [
        f"@prefix {m.group(1) or ''}: <{m.group(2)}> ."
        for m in _PREFIX_RE.finditer(update)
    ]
    ops = []
    for m in _OP_RE.finditer(update):
        end = _block_end(update, m.end())
        block = update[m.end():end]
        ops.append((m.group(1).upper(), "\n".join(prefixes + [block])))
    if not ops:
        raise SyntaxError(
            "no INSERT DATA / DELETE DATA operation found (pattern-based "
            "INSERT/DELETE ... WHERE is not supported)"
        )
    return ops


def sparql_update(graph: PropertyGraph, update: str) -> PropertyGraph:
    """Apply a SPARQL Update string (one or more ``INSERT DATA`` /
    ``DELETE DATA`` operations, ``;``-chained) and return the updated
    PropertyGraph (immutable-tables semantics, like every mutation
    operator)."""
    from pidb_rdf_spark.sources.importer import merge_triples, remove_triples
    from pidb_rdf_spark.sources.rdf_reader import parse_rdf_snippet

    g = graph
    for op, turtle in parse_update(update):
        triples = parse_rdf_snippet(graph.spark, turtle, "Turtle")
        if op == "INSERT":
            g = merge_triples(g, triples)
        else:
            g = remove_triples(g, triples)
    return g
