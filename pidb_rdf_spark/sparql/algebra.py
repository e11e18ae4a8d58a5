"""SPARQL algebra — the compiler's IR.

Plays the role of Jena's Op tree in the reference
(``SparqlToGremlinCompiler.java:91`` compiles Jena Algebra; the
visitor at :235-317 walks Op nodes). Ours is a small dataclass tree
covering the reference's query surface (SURVEY.md §2.3-2.8) plus the
standard aggregates the reference lacks (SUM/AVG/MIN, HAVING).
"""

from __future__ import annotations

from dataclasses import dataclass, field


# ---- terms -------------------------------------------------------------


@dataclass(frozen=True)
class Var:
    name: str


@dataclass(frozen=True)
class IRI:
    value: str  # full IRI, or prefixed form kept as "prefix:local"


@dataclass(frozen=True)
class Literal:
    value: object  # python str / int / float / bool
    lang: str | None = None
    datatype: str | None = None


Term = Var | IRI | Literal


# ---- property paths (SPARQL 1.1 §9) ------------------------------------
# The reference exposes transitive traversal only through its Cypher
# variable-length-path inference procs (MicroReasoners.java:20-22);
# property paths are the standard SPARQL surface for the same compute.


@dataclass(frozen=True)
class PathInverse:
    """``^p`` — traverse p from object to subject."""

    path: object


@dataclass(frozen=True)
class PathSeq:
    """``p1/p2/…`` — concatenation through anonymous midpoints."""

    parts: tuple


@dataclass(frozen=True)
class PathAlt:
    """``p1|p2|…`` — union of the alternatives (bag semantics)."""

    alternatives: tuple


@dataclass(frozen=True)
class PathMod:
    """``p+`` / ``p*`` / ``p?`` — arbitrary-length (set semantics per
    W3C: distinct node pairs) / optionally-zero-length paths."""

    path: object
    mod: str  # '+', '*', '?'


@dataclass(frozen=True)
class PathNeg:
    """``!iri`` / ``!(iri1|^iri2|...)`` — negated property set. Matches
    the union of: forward edges whose predicate is none of ``iris``,
    and (when ``inv_iris`` is non-empty) INVERSE edges whose predicate
    is none of ``inv_iris`` (SPARQL 1.1 §9.1 NPS with inverse
    members). A set with only inverse members matches only inverse
    edges; only forward members, only forward edges."""

    iris: tuple  # tuple[IRI, ...] — forward exclusions
    inv_iris: tuple = ()  # tuple[IRI, ...] — inverse exclusions


Path = PathInverse | PathSeq | PathAlt | PathMod | PathNeg


# ---- expressions (FILTER / SELECT expressions) -------------------------


@dataclass(frozen=True)
class Comparison:
    op: str  # = != < <= > >=
    lhs: "Expr"
    rhs: "Expr"


@dataclass(frozen=True)
class BoolOp:
    op: str  # && ||
    operands: tuple


@dataclass(frozen=True)
class Not:
    operand: "Expr"


@dataclass(frozen=True)
class Arith:
    op: str  # + - * /
    lhs: "Expr"
    rhs: "Expr"


@dataclass(frozen=True)
class FuncCall:
    name: str  # REGEX, BOUND, STR, LANG, DATATYPE, ...
    args: tuple


@dataclass(frozen=True)
class ExistsExpr:
    group: "GroupGraphPattern"
    negated: bool = False


Expr = Comparison | BoolOp | Not | Arith | FuncCall | ExistsExpr | Var | IRI | Literal


# ---- patterns ----------------------------------------------------------


@dataclass(frozen=True)
class TriplePattern:
    s: Term
    p: object  # IRI | Var | Path (var predicates via p-element route)
    o: Term


@dataclass
class Filter:
    expr: Expr


@dataclass
class OptionalPattern:
    group: "GroupGraphPattern"


@dataclass
class UnionPattern:
    branches: list  # list[GroupGraphPattern]


@dataclass
class BindPattern:
    """BIND(expr AS ?var) — standard SPARQL, absent from the
    reference's compiled surface; compiles to ``withColumn``."""

    expr: "Expr"
    var: str


@dataclass
class ValuesPattern:
    """VALUES inline data — compiles to a literal DataFrame joined
    into the bindings."""

    variables: list  # list[str]
    rows: list  # list[tuple]; None entries = UNDEF


@dataclass
class MinusPattern:
    """MINUS — anti-join on shared vars; no shared vars ⇒ no-op
    (the W3C semantics where MINUS differs from NOT EXISTS)."""

    group: "GroupGraphPattern"


@dataclass
class SubSelect:
    """``{ SELECT … WHERE {…} … }`` nested inside a group (SPARQL 1.1
    subqueries) — compiled independently, then natural-joined into the
    enclosing bindings on its projected variables."""

    query: object  # Query


@dataclass
class GroupGraphPattern:
    elements: list = field(default_factory=list)
    # TriplePattern | Filter | OptionalPattern | UnionPattern |
    # GroupGraphPattern | BindPattern | ValuesPattern | MinusPattern |
    # SubSelect


# ---- query -------------------------------------------------------------


@dataclass(frozen=True)
class AggExpr:
    func: str  # COUNT SUM AVG MIN MAX GROUP_CONCAT SAMPLE
    arg: Expr | None  # None => COUNT(*)
    distinct: bool = False
    sep: str = " "  # GROUP_CONCAT separator (W3C default single space)


@dataclass(frozen=True)
class SelectItem:
    expr: Expr | AggExpr
    alias: str  # output column name (var name without '?')


@dataclass
class Query:
    select: list  # list[SelectItem]; empty => SELECT *
    where: GroupGraphPattern
    distinct: bool = False
    group_by: list = field(default_factory=list)  # list[str] var names
    having: Expr | None = None
    order_by: list = field(default_factory=list)  # list[(Expr, bool asc)]
    limit: int | None = None
    offset: int | None = None
    prefixes: dict = field(default_factory=dict)
    # query form (SPARQL 1.1 §16): select | ask | construct | describe
    form: str = "select"
    template: list = field(default_factory=list)  # CONSTRUCT triples
    describe_terms: list = field(default_factory=list)  # IRI | Var
