"""Recursive-descent parser for the SPARQL subset this engine executes.

Coverage = the reference's compiled surface (SURVEY.md §2.3-2.8:
BGP, FILTER with comparisons/&&/||/EXISTS/NOT EXISTS, OPTIONAL,
UNION, DISTINCT, GROUP BY, COUNT/COUNT DISTINCT/MAX, ORDER BY,
LIMIT/OFFSET — reference ``SparqlToGremlinCompiler.java`` +
``WhereTraversalBuilder.java``) extended with the standard pieces the
reference omits: SUM/AVG/MIN, HAVING, expression projections,
arithmetic, REGEX/BOUND/STR builtins, predicate-object lists
(``;`` ``,``), the ``a`` keyword, and SPARQL 1.1 property paths
(``^`` ``/`` ``|`` ``+`` ``*`` ``?`` ``!``).

The fixed ``e:``/``v:``/``p:`` prefix convention is pre-declared, as
in the reference (``sparql/Prefixes.java:58-60`` prepends the same
header to every query).
"""

from __future__ import annotations

import re

from pidb_rdf_spark.sparql import algebra as A
from pidb_rdf_spark.sources.rdf_reader import unescape_string

# e: edge label, v: node property value, p: property element —
# reference routing at sparql/Prefixes.java:30-56.
BUILTIN_PREFIXES = {
    "e": "edge://",
    "v": "value://",
    "p": "prop://",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
}

TOKEN_RE = re.compile(
    r"""
    (?P<WS>\s+|\#[^\n]*)
  | (?P<IRIREF><[^<>"{}|^`\\\s]*>)
  | (?P<VAR>[?$][A-Za-z_][A-Za-z0-9_]*)
  | (?P<STRING>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<NUMBER>[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
  | (?P<PNAME>[A-Za-z_][A-Za-z0-9_\-]*:[A-Za-z_][A-Za-z0-9_\-.]*|[A-Za-z_][A-Za-z0-9_\-]*:)
  | (?P<NAME>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<OP>\^\^|&&|\|\||!=|<=|>=|[{}()\[\],;.*=<>!+\-/@|^?])
    """,
    re.VERBOSE,
)

KEYWORDS = {
    "PREFIX", "BASE", "SELECT", "DISTINCT", "REDUCED", "WHERE", "FILTER",
    "OPTIONAL", "UNION", "EXISTS", "NOT", "GROUP", "ORDER", "BY", "ASC",
    "DESC", "LIMIT", "OFFSET", "AS", "HAVING", "COUNT", "SUM", "AVG",
    "MIN", "MAX", "TRUE", "FALSE", "A", "IN", "BIND", "VALUES", "MINUS",
    "UNDEF", "ASK", "CONSTRUCT", "DESCRIBE",
}

AGG_FUNCS = {"COUNT", "SUM", "AVG", "MIN", "MAX"}
NAME_AGG_FUNCS = {"GROUP_CONCAT", "SAMPLE"}  # lex as NAME (not keywords)
BUILTIN_FUNCS = {
    "REGEX", "BOUND", "STR", "LANG", "DATATYPE", "ABS", "ROUND", "CONTAINS",
    "STRSTARTS", "STRENDS", "UCASE", "LCASE", "STRLEN", "COALESCE", "IF",
    "CONCAT", "SUBSTR", "STRBEFORE", "STRAFTER", "REPLACE", "CEIL", "FLOOR",
    "YEAR", "MONTH", "DAY", "HOURS", "MINUTES", "SECONDS",
    "MD5", "SHA1", "SHA256", "SHA384", "SHA512",
    "SAMETERM", "ENCODE_FOR_URI", "ISNUMERIC",
    "ISIRI", "ISURI", "ISBLANK", "ISLITERAL", "IRI", "URI", "BNODE",
    "STRLANG", "STRDT", "TIMEZONE", "TZ", "UUID", "STRUUID", "RAND", "NOW",
}


class Token:
    __slots__ = ("kind", "text")

    def __init__(self, kind: str, text: str):
        self.kind = kind
        self.text = text

    def __repr__(self):
        return f"{self.kind}({self.text})"


def tokenize(text: str) -> list[Token]:
    tokens, pos = [], 0
    while pos < len(text):
        m = TOKEN_RE.match(text, pos)
        if not m:
            raise SyntaxError(f"SPARQL lex error at {text[pos:pos + 30]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "WS":
            continue
        tok = m.group()
        if kind == "NAME" and tok.upper() in KEYWORDS:
            tokens.append(Token("KW", tok.upper()))
        else:
            tokens.append(Token(kind, tok))
    tokens.append(Token("EOF", ""))
    return tokens


class Parser:
    def __init__(self, text: str):
        self.toks = tokenize(text)
        self.i = 0
        self.prefixes = dict(BUILTIN_PREFIXES)

    # -- plumbing --------------------------------------------------------

    def peek(self, k: int = 0) -> Token:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> Token:
        t = self.toks[self.i]
        self.i += 1
        return t

    def accept(self, kind: str, text: str | None = None) -> Token | None:
        t = self.peek()
        if t.kind == kind and (text is None or t.text == text):
            return self.next()
        return None

    def expect(self, kind: str, text: str | None = None) -> Token:
        t = self.accept(kind, text)
        if t is None:
            raise SyntaxError(f"expected {text or kind}, got {self.peek()!r}")
        return t

    # -- terms -----------------------------------------------------------

    def resolve_pname(self, pname: str) -> str:
        prefix, _, local = pname.partition(":")
        ns = self.prefixes.get(prefix)
        if ns is None:
            raise SyntaxError(f"unknown prefix {prefix!r}")
        return ns + local

    def parse_term(self) -> A.Var | A.IRI | A.Literal:
        t = self.peek()
        if t.kind == "VAR":
            self.next()
            return A.Var(t.text[1:])
        if t.kind == "IRIREF":
            self.next()
            return A.IRI(t.text[1:-1])
        if t.kind == "PNAME":
            self.next()
            return A.IRI(self.resolve_pname(t.text))
        if t.kind == "STRING":
            self.next()
            raw = t.text[1:-1]
            value = unescape_string(raw)
            lang = dtype = None
            if self.accept("OP", "@"):
                lang = self.expect("NAME").text
            elif self.accept("OP", "^^"):
                d = self.next()
                dtype = d.text[1:-1] if d.kind == "IRIREF" else self.resolve_pname(d.text)
            return A.Literal(value, lang=lang, datatype=dtype)
        if t.kind == "NUMBER":
            self.next()
            txt = t.text
            if "." in txt or "e" in txt or "E" in txt:
                return A.Literal(float(txt))
            return A.Literal(int(txt))
        if t.kind == "KW" and t.text in ("TRUE", "FALSE"):
            self.next()
            return A.Literal(t.text == "TRUE")
        if t.kind == "KW" and t.text == "A":
            self.next()
            return A.IRI(BUILTIN_PREFIXES["rdf"] + "type")
        raise SyntaxError(f"unexpected token {t!r} in term position")

    # -- query -----------------------------------------------------------

    def parse_query(self) -> A.Query:
        while self.accept("KW", "PREFIX"):
            pn = self.expect("PNAME").text
            iri = self.expect("IRIREF").text[1:-1]
            self.prefixes[pn.rstrip(":")] = iri
        t = self.peek()
        if t.kind == "KW" and t.text == "ASK":
            q = self.parse_ask()
        elif t.kind == "KW" and t.text == "CONSTRUCT":
            q = self.parse_construct()
        elif t.kind == "KW" and t.text == "DESCRIBE":
            q = self.parse_describe()
        else:
            q = self.parse_select_core()
        self.expect("EOF")
        return q

    def parse_ask(self) -> A.Query:
        self.expect("KW", "ASK")
        self.accept("KW", "WHERE")
        where = self.parse_group()
        return A.Query(select=[], where=where, form="ask",
                       prefixes=dict(self.prefixes))

    def parse_construct(self) -> A.Query:
        self.expect("KW", "CONSTRUCT")
        if self.accept("KW", "WHERE"):
            # CONSTRUCT WHERE { triples } shorthand (SPARQL 1.1 §10.2.2):
            # the pattern doubles as the template; triples-only by spec
            where = self.parse_group()
            template = [
                e for e in where.elements if isinstance(e, A.TriplePattern)
            ]
            if len(template) != len(where.elements):
                raise SyntaxError(
                    "CONSTRUCT WHERE admits only triple patterns — "
                    "use the explicit template form for anything else"
                )
        else:
            tmpl_group = self.parse_group()
            template = [
                e for e in tmpl_group.elements if isinstance(e, A.TriplePattern)
            ]
            if len(template) != len(tmpl_group.elements):
                raise SyntaxError("CONSTRUCT template must contain only triples")
            self.accept("KW", "WHERE")
            where = self.parse_group()
        limit = offset = None
        order_by: list[tuple] = []
        while True:
            if self.accept("KW", "LIMIT"):
                limit = int(self.expect("NUMBER").text)
            elif self.accept("KW", "OFFSET"):
                offset = int(self.expect("NUMBER").text)
            elif self.accept("KW", "ORDER"):
                self.expect("KW", "BY")
                while self.peek().kind == "VAR":
                    order_by.append((A.Var(self.next().text[1:]), True))
            else:
                break
        return A.Query(select=[], where=where, form="construct",
                       template=template, limit=limit, offset=offset,
                       order_by=order_by, prefixes=dict(self.prefixes))

    def parse_describe(self) -> A.Query:
        self.expect("KW", "DESCRIBE")
        terms: list = []
        while True:
            t = self.peek()
            if t.kind == "VAR":
                terms.append(A.Var(self.next().text[1:]))
            elif t.kind == "IRIREF":
                terms.append(A.IRI(self.next().text[1:-1]))
            elif t.kind == "PNAME":
                terms.append(A.IRI(self.resolve_pname(self.next().text)))
            else:
                break
        if not terms:
            raise SyntaxError("DESCRIBE needs at least one IRI or variable")
        where = A.GroupGraphPattern()
        if self.accept("KW", "WHERE") or (
            self.peek().kind == "OP" and self.peek().text == "{"
        ):
            where = self.parse_group()
        return A.Query(select=[], where=where, form="describe",
                       describe_terms=terms, prefixes=dict(self.prefixes))

    def parse_select_core(self) -> A.Query:
        """``SELECT … WHERE {…}`` + solution modifiers — shared between
        the top-level query and SPARQL 1.1 subselects."""
        self.expect("KW", "SELECT")
        distinct = bool(self.accept("KW", "DISTINCT"))
        self.accept("KW", "REDUCED")
        select: list[A.SelectItem] = []
        if self.accept("OP", "*"):
            pass
        else:
            while True:
                t = self.peek()
                if t.kind == "VAR":
                    self.next()
                    select.append(A.SelectItem(A.Var(t.text[1:]), t.text[1:]))
                elif t.kind == "OP" and t.text == "(":
                    self.next()
                    expr = self.parse_select_expr()
                    self.expect("KW", "AS")
                    alias = self.expect("VAR").text[1:]
                    self.expect("OP", ")")
                    select.append(A.SelectItem(expr, alias))
                elif t.kind == "KW" and t.text in AGG_FUNCS:
                    # bare aggregate without AS: auto-name (reference
                    # allows e.g. COUNT(?x) in projection)
                    expr = self.parse_select_expr()
                    alias = f"{expr.func.lower()}" if isinstance(expr, A.AggExpr) else "expr"
                    select.append(A.SelectItem(expr, alias))
                else:
                    break
        self.accept("KW", "WHERE")
        where = self.parse_group()

        group_by: list[str] = []
        having = None
        order_by: list[tuple] = []
        limit = offset = None
        while True:
            if self.accept("KW", "GROUP"):
                self.expect("KW", "BY")
                while self.peek().kind == "VAR":
                    group_by.append(self.next().text[1:])
            elif self.accept("KW", "HAVING"):
                self.expect("OP", "(")
                having = self.parse_expr()
                self.expect("OP", ")")
            elif self.accept("KW", "ORDER"):
                self.expect("KW", "BY")
                while True:
                    t = self.peek()
                    if t.kind == "KW" and t.text in ("ASC", "DESC"):
                        self.next()
                        asc = t.text == "ASC"
                        self.expect("OP", "(")
                        order_by.append((self.parse_expr(), asc))
                        self.expect("OP", ")")
                    elif t.kind == "VAR":
                        self.next()
                        order_by.append((A.Var(t.text[1:]), True))
                    elif t.kind == "OP" and t.text == "(":
                        # grammar OrderCondition ::= ... | Constraint;
                        # a BrackettedExpression orders ascending
                        self.next()
                        order_by.append((self.parse_expr(), True))
                        self.expect("OP", ")")
                    else:
                        break
            elif self.accept("KW", "LIMIT"):
                limit = int(self.expect("NUMBER").text)
            elif self.accept("KW", "OFFSET"):
                offset = int(self.expect("NUMBER").text)
            else:
                break
        return A.Query(
            select=select, where=where, distinct=distinct, group_by=group_by,
            having=having, order_by=order_by, limit=limit, offset=offset,
            prefixes=dict(self.prefixes),
        )

    def parse_select_expr(self):
        # aggregates are ordinary unary expressions (parse_unary), so a
        # projection like SUM(?x) / COUNT(?y) parses as one expression
        return self.parse_expr()

    # -- group graph pattern --------------------------------------------

    def parse_group(self) -> A.GroupGraphPattern:
        self.expect("OP", "{")
        group = A.GroupGraphPattern()
        while not self.accept("OP", "}"):
            t = self.peek()
            if t.kind == "KW" and t.text == "FILTER":
                self.next()
                group.elements.append(A.Filter(self.parse_filter_constraint()))
            elif t.kind == "KW" and t.text == "OPTIONAL":
                self.next()
                group.elements.append(A.OptionalPattern(self.parse_group()))
            elif t.kind == "KW" and t.text == "MINUS":
                self.next()
                group.elements.append(A.MinusPattern(self.parse_group()))
            elif t.kind == "KW" and t.text == "BIND":
                self.next()
                self.expect("OP", "(")
                expr = self.parse_expr()
                self.expect("KW", "AS")
                var = self.expect("VAR").text[1:]
                self.expect("OP", ")")
                group.elements.append(A.BindPattern(expr, var))
            elif t.kind == "KW" and t.text == "VALUES":
                self.next()
                group.elements.append(self.parse_values())
            elif (
                t.kind == "OP" and t.text == "{"
                and self.peek(1).kind == "KW" and self.peek(1).text == "SELECT"
            ):
                self.next()
                group.elements.append(A.SubSelect(self.parse_select_core()))
                self.expect("OP", "}")
            elif t.kind == "OP" and t.text == "{":
                first = self.parse_group()
                branches = [first]
                while self.accept("KW", "UNION"):
                    branches.append(self.parse_group())
                if len(branches) > 1:
                    group.elements.append(A.UnionPattern(branches))
                else:
                    group.elements.append(first)
            else:
                self.parse_triples_block(group)
        return group

    def parse_values(self) -> "A.ValuesPattern":
        """``VALUES ?v { a b }`` (single var, bare values) or
        ``VALUES (?v1 ?v2) { (a b) (UNDEF c) }`` (row form)."""

        def one_value():
            if self.accept("KW", "UNDEF"):
                return None
            term = self.parse_term()
            return term.value if isinstance(term, (A.Literal, A.IRI)) else term

        if self.peek().kind == "VAR":
            var = self.next().text[1:]
            self.expect("OP", "{")
            rows = []
            while not self.accept("OP", "}"):
                rows.append((one_value(),))
            return A.ValuesPattern([var], rows)
        self.expect("OP", "(")
        variables = []
        while self.peek().kind == "VAR":
            variables.append(self.next().text[1:])
        self.expect("OP", ")")
        self.expect("OP", "{")
        rows = []
        while not self.accept("OP", "}"):
            self.expect("OP", "(")
            row = []
            while not self.accept("OP", ")"):
                row.append(one_value())
            if len(row) != len(variables):
                raise SyntaxError("VALUES row arity mismatch")
            rows.append(tuple(row))
        return A.ValuesPattern(variables, rows)

    def parse_filter_constraint(self):
        t = self.peek()
        if t.kind == "KW" and t.text == "EXISTS":
            self.next()
            return A.ExistsExpr(self.parse_group(), negated=False)
        if t.kind == "KW" and t.text == "NOT":
            self.next()
            self.expect("KW", "EXISTS")
            return A.ExistsExpr(self.parse_group(), negated=True)
        self.expect("OP", "(")
        expr = self.parse_expr()
        self.expect("OP", ")")
        return expr

    def parse_triples_block(self, group: A.GroupGraphPattern) -> None:
        subj = self.parse_term_in_pattern(group)
        # ONLY a bare blank-node property list `[ p o ] .` is a
        # complete triples block by itself (its triples are already in
        # `group`); a plain subject with no predicate — `{ ?s }` — is
        # a syntax error, not an empty block (ADVICE r11: the
        # unconditional early return silently dropped the constraint)
        t = self.peek()
        if t.kind == "OP" and t.text in (".", "}"):
            if not self._last_term_was_bnode_list:
                raise SyntaxError(
                    f"expected a predicate after subject, got {t!r}"
                )
            self.accept("OP", ".")
            return
        self._parse_prop_list(group, subj)
        self.accept("OP", ".")

    def _parse_prop_list(self, group: A.GroupGraphPattern, subj) -> None:
        """``pred obj (, obj)* (; pred obj ...)*`` — the shared body of
        a triples block and a bracketed blank-node property list."""
        while True:
            pred = self.parse_predicate()
            while True:
                obj = self.parse_term_in_pattern(group)
                group.elements.append(A.TriplePattern(subj, pred, obj))
                if not self.accept("OP", ","):
                    break
            if not self.accept("OP", ";"):
                break
            # allow trailing ';' before '.' / '}' / ']'
            if self.peek().kind == "OP" and self.peek().text in (".", "}", "]"):
                break

    def parse_term_in_pattern(self, group: A.GroupGraphPattern):
        """A term in subject/object position — additionally accepts a
        blank-node property list ``[ p o ; ... ]`` (also the empty
        ``[]``): a FRESH anonymous variable stands in for the blank
        node (W3C blank nodes in patterns are existential variables),
        its inner triples appended to the group. The ``__bn`` prefix
        keeps it out of SELECT * projections."""
        t = self.peek()
        if t.kind == "OP" and t.text == "[":
            self.next()
            self._bn_counter = getattr(self, "_bn_counter", 0) + 1
            var = A.Var(f"__bn{self._bn_counter}")
            if not (self.peek().kind == "OP" and self.peek().text == "]"):
                self._parse_prop_list(group, var)
            self.expect("OP", "]")
            self._last_term_was_bnode_list = True
            return var
        self._last_term_was_bnode_list = False
        return self.parse_term()

    # -- property paths (SPARQL 1.1 §9 grammar, predicate position) ------
    #
    # Path        := PathSeq ('|' PathSeq)*
    # PathSeq     := PathEltOrInv ('/' PathEltOrInv)*
    # PathEltOrInv:= '^' PathElt | PathElt
    # PathElt     := PathPrimary ('+' | '*' | '?')?
    # PathPrimary := '(' Path ')' | '!' NegSet | iri | 'a'

    def parse_predicate(self):
        if self.peek().kind == "VAR":
            return A.Var(self.next().text[1:])
        return self.parse_path()

    def parse_path(self):
        parts = [self.parse_path_seq()]
        while self.accept("OP", "|"):
            parts.append(self.parse_path_seq())
        return parts[0] if len(parts) == 1 else A.PathAlt(tuple(parts))

    def parse_path_seq(self):
        parts = [self.parse_path_elt_or_inverse()]
        while self.accept("OP", "/"):
            parts.append(self.parse_path_elt_or_inverse())
        return parts[0] if len(parts) == 1 else A.PathSeq(tuple(parts))

    def parse_path_elt_or_inverse(self):
        if self.accept("OP", "^"):
            return A.PathInverse(self.parse_path_elt())
        return self.parse_path_elt()

    def parse_path_elt(self):
        prim = self.parse_path_primary()
        t = self.peek()
        if t.kind == "OP" and t.text in ("+", "*", "?"):
            self.next()
            return A.PathMod(prim, t.text)
        return prim

    def parse_path_primary(self):
        t = self.peek()
        if t.kind == "OP" and t.text == "(":
            self.next()
            p = self.parse_path()
            self.expect("OP", ")")
            return p
        if t.kind == "OP" and t.text == "!":
            self.next()
            fwd: list = []
            inv: list = []

            def one_member():
                if self.accept("OP", "^"):
                    inv.append(self.parse_path_iri())
                else:
                    fwd.append(self.parse_path_iri())

            if self.accept("OP", "("):
                one_member()
                while self.accept("OP", "|"):
                    one_member()
                self.expect("OP", ")")
            else:
                one_member()
            return A.PathNeg(tuple(fwd), tuple(inv))
        return self.parse_path_iri()

    def parse_path_iri(self) -> A.IRI:
        t = self.peek()
        if t.kind == "IRIREF":
            self.next()
            return A.IRI(t.text[1:-1])
        if t.kind == "PNAME":
            self.next()
            return A.IRI(self.resolve_pname(t.text))
        if t.kind == "KW" and t.text == "A":
            self.next()
            return A.IRI(BUILTIN_PREFIXES["rdf"] + "type")
        raise SyntaxError(f"expected IRI in property path, got {t!r}")

    # -- expressions -----------------------------------------------------

    def parse_expr(self):
        return self.parse_or()

    def parse_or(self):
        operands = [self.parse_and()]
        while self.accept("OP", "||"):
            operands.append(self.parse_and())
        return operands[0] if len(operands) == 1 else A.BoolOp("||", tuple(operands))

    def parse_and(self):
        operands = [self.parse_not()]
        while self.accept("OP", "&&"):
            operands.append(self.parse_not())
        return operands[0] if len(operands) == 1 else A.BoolOp("&&", tuple(operands))

    def parse_not(self):
        if self.accept("OP", "!"):
            return A.Not(self.parse_not())
        return self.parse_relational()

    def parse_relational(self):
        lhs = self.parse_additive()
        t = self.peek()
        if t.kind == "OP" and t.text in ("=", "!=", "<", "<=", ">", ">="):
            self.next()
            rhs = self.parse_additive()
            return A.Comparison(t.text, lhs, rhs)
        if t.kind == "KW" and t.text == "IN":
            self.next()
            self.expect("OP", "(")
            items = [self.parse_additive()]
            while self.accept("OP", ","):
                items.append(self.parse_additive())
            self.expect("OP", ")")
            return A.FuncCall("IN", (lhs, *items))
        return lhs

    def parse_additive(self):
        lhs = self.parse_multiplicative()
        while True:
            t = self.peek()
            if t.kind == "OP" and t.text in ("+", "-"):
                self.next()
                lhs = A.Arith(t.text, lhs, self.parse_multiplicative())
            else:
                return lhs

    def parse_multiplicative(self):
        lhs = self.parse_unary()
        while True:
            t = self.peek()
            if t.kind == "OP" and t.text in ("*", "/"):
                self.next()
                lhs = A.Arith(t.text, lhs, self.parse_unary())
            else:
                return lhs

    def parse_unary(self):
        t = self.peek()
        if t.kind == "OP" and t.text == "(":
            self.next()
            e = self.parse_expr()
            self.expect("OP", ")")
            return e
        if t.kind == "KW" and t.text == "NOT":
            self.next()
            self.expect("KW", "EXISTS")
            return A.ExistsExpr(self.parse_group(), negated=True)
        if t.kind == "KW" and t.text == "EXISTS":
            self.next()
            return A.ExistsExpr(self.parse_group(), negated=False)
        if t.kind == "KW" and t.text in AGG_FUNCS:
            self.next()
            self.expect("OP", "(")
            distinct = bool(self.accept("KW", "DISTINCT"))
            if t.text == "COUNT" and self.accept("OP", "*"):
                arg = None
            else:
                arg = self.parse_expr()
            self.expect("OP", ")")
            return A.AggExpr(t.text, arg, distinct)
        if t.kind == "NAME" and t.text.upper() in NAME_AGG_FUNCS:
            name = self.next().text.upper()
            self.expect("OP", "(")
            distinct = bool(self.accept("KW", "DISTINCT"))
            arg = self.parse_expr()
            sep = " "
            if self.accept("OP", ";"):
                kw = self.expect("NAME")
                if kw.text.upper() != "SEPARATOR":
                    raise SyntaxError(f"expected SEPARATOR, got {kw.text!r}")
                self.expect("OP", "=")
                s = self.expect("STRING")
                sep = unescape_string(s.text[1:-1])
            self.expect("OP", ")")
            return A.AggExpr(name, arg, distinct, sep=sep)
        if t.kind == "NAME" and t.text.upper() in BUILTIN_FUNCS:
            name = self.next().text.upper()
            self.expect("OP", "(")
            args = []
            if not self.accept("OP", ")"):
                args.append(self.parse_expr())
                while self.accept("OP", ","):
                    args.append(self.parse_expr())
                self.expect("OP", ")")
            return A.FuncCall(name, tuple(args))
        return self.parse_term()


def parse_sparql(text: str) -> A.Query:
    return Parser(text).parse_query()
