"""Lucene ``query_string`` grammar over token-array / keyword columns.

ES's ``query_string`` query exposes the full Lucene syntax — boolean
operators, grouping, per-field terms, quoted phrases, per-clause boosts
(reference surface: the `/search` endpoint family,
`/root/reference/src/api.py:197-221`, whose ES 8.12 backend ships the
grammar even though the reference client only calls ``multi_match``).
This module implements it Spark-first:

- **plan-time parse**: the query string is a constant, so a Python
  recursive-descent parser runs ONCE on the driver and emits a pure SQL
  expression tree — zero per-row Python, the executed plan is a single
  scan-local predicate + score projection inside whole-stage codegen.
- **dual-backend compile**: the same AST renders to Spark SQL and to
  DuckDB SQL (the only divergences: ``size``/``len``,
  ``filter``/``list_filter``, ``transform``/``list_transform``, and the
  lambda index base — Spark 0-based, DuckDB 1-based), so every parsed
  query carries its own oracle. The catalog entry's DuckDB oracle is
  GENERATED from the same parse, making grammar bugs structurally
  unable to hide from the parity gate.

Grammar (Lucene precedence NOT > AND > OR; adjacency = default OR)::

    query   := orExpr
    orExpr  := andExpr ((OR | '||' | <adjacent>) andExpr)*
    andExpr := notExpr ((AND | '&&') notExpr)*
    notExpr := (NOT | '!') notExpr | clause
    clause  := '(' query ')' ['^' boost]
             | [field ':'] '"' words... '"' ['^' boost]
             | [field ':'] word ['^' boost]

Scoring follows Lucene's sum-of-matching-subscores discipline with the
engine's naive-tf family (the q332 ``simple_query_string`` discipline):
a term on a tokenized field contributes ``tf * boost``, a phrase
``occurrences * boost``, a keyword-field term a constant ``boost``;
OR sums only the matching children, AND sums all (all matched), NOT
filters and contributes 0, a group boost multiplies the subtree score.
All components are integer counts times literal boosts, so the double
score is exact on both backends.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

__all__ = [
    "KeywordField",
    "TokenField",
    "compile_query_string",
    "parse_query_string",
]


# --------------------------------------------------------------------------
# Field catalog: how a query field name maps onto the frame's columns.
# --------------------------------------------------------------------------
@dataclass(frozen=True)
class TokenField:
    """An analyzed text field exposed as an ``array<string>`` column
    (same column name on both backends — e.g. ``toks``)."""

    expr: str


@dataclass(frozen=True)
class KeywordField:
    """An exact-match scalar string column (ES ``keyword``)."""

    expr: str


# --------------------------------------------------------------------------
# AST
# --------------------------------------------------------------------------
@dataclass(frozen=True)
class Term:
    word: str
    field: str | None = None
    boost: float = 1.0


@dataclass(frozen=True)
class Phrase:
    words: tuple[str, ...]
    field: str | None = None
    boost: float = 1.0


@dataclass(frozen=True)
class Not:
    child: object


@dataclass(frozen=True)
class And:
    children: tuple = dc_field(default_factory=tuple)


@dataclass(frozen=True)
class Or:
    children: tuple = dc_field(default_factory=tuple)


@dataclass(frozen=True)
class Boost:
    child: object
    boost: float


# --------------------------------------------------------------------------
# Tokenizer + recursive-descent parser
# --------------------------------------------------------------------------
_TOK_RE = re.compile(
    r"""\s*(?:
        (?P<lpar>\() |
        (?P<rpar>\)) |
        (?P<boost>\^(?P<bval>\d+(?:\.\d+)?)) |
        (?P<phrase>(?:(?P<pfield>[A-Za-z_]\w*):)?"(?P<pwords>[^"]*)") |
        (?P<op>AND\b|OR\b|NOT\b|&&|\|\||!) |
        (?P<word>(?:(?P<tfield>[A-Za-z_]\w*):)?(?P<tword>[A-Za-z0-9][\w.-]*))
    )""",
    re.X,
)


def _lex(q: str) -> list[tuple[str, object]]:
    toks: list[tuple[str, object]] = []
    pos = 0
    while pos < len(q):
        m = _TOK_RE.match(q, pos)
        if m is None:
            if q[pos:].strip() == "":
                break
            raise ValueError(f"query_string: cannot lex at ...{q[pos:pos + 20]!r}")
        pos = m.end()
        if m.group("lpar"):
            toks.append(("(", None))
        elif m.group("rpar"):
            toks.append((")", None))
        elif m.group("boost"):
            toks.append(("^", float(m.group("bval"))))
        elif m.group("phrase"):
            words = tuple(w for w in m.group("pwords").lower().split() if w)
            if not words:
                raise ValueError("query_string: empty phrase")
            toks.append(("phrase", (m.group("pfield"), words)))
        elif m.group("op"):
            op = {"&&": "AND", "||": "OR", "!": "NOT"}.get(m.group("op"), m.group("op"))
            toks.append((op, None))
        else:
            toks.append(("term", (m.group("tfield"), m.group("tword").lower())))
    return toks


class _Parser:
    def __init__(self, toks: list[tuple[str, object]]):
        self.toks = toks
        self.i = 0

    def _peek(self) -> str | None:
        return self.toks[self.i][0] if self.i < len(self.toks) else None

    def _take(self) -> tuple[str, object]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def parse(self):
        node = self._or()
        if self.i != len(self.toks):
            raise ValueError(f"query_string: trailing tokens at {self.toks[self.i:]}")
        return node

    def _or(self):
        children = [self._and()]
        # explicit OR, or implicit adjacency (Lucene default_operator=OR)
        while True:
            nxt = self._peek()
            if nxt == "OR":
                self._take()
                children.append(self._and())
            elif nxt in ("(", "phrase", "term", "NOT"):
                children.append(self._and())
            else:
                break
        return children[0] if len(children) == 1 else Or(tuple(children))

    def _and(self):
        children = [self._not()]
        while self._peek() == "AND":
            self._take()
            children.append(self._not())
        return children[0] if len(children) == 1 else And(tuple(children))

    def _not(self):
        if self._peek() == "NOT":
            self._take()
            return Not(self._not())
        return self._clause()

    def _maybe_boost(self, node):
        if self._peek() == "^":
            _, b = self._take()
            if isinstance(node, (Term, Phrase)):
                return type(node)(
                    **{**node.__dict__, "boost": node.boost * float(b)}
                )
            return Boost(node, float(b))
        return node

    def _clause(self):
        kind = self._peek()
        if kind == "(":
            self._take()
            node = self._or()
            if self._peek() != ")":
                raise ValueError("query_string: unbalanced parentheses")
            self._take()
            return self._maybe_boost(node)
        if kind == "phrase":
            _, (fld, words) = self._take()
            node = Term(words[0], fld) if len(words) == 1 else Phrase(words, fld)
            return self._maybe_boost(node)
        if kind == "term":
            _, (fld, word) = self._take()
            return self._maybe_boost(Term(word, fld))
        raise ValueError(f"query_string: expected clause, got {kind}")


def parse_query_string(q: str):
    """Parse a Lucene query string into the AST (plan-time, driver-side)."""
    toks = _lex(q)
    if not toks:
        raise ValueError("query_string: empty query")
    return _Parser(toks).parse()


# --------------------------------------------------------------------------
# Dual-backend compiler: AST -> (match SQL, score SQL)
# --------------------------------------------------------------------------
_SAFE_WORD = re.compile(r"^[\w.-]+$")


def _q(word: str) -> str:
    if not _SAFE_WORD.match(word):
        raise ValueError(f"query_string: unsafe term {word!r}")
    return f"'{word}'"


def _fnum(b: float) -> str:
    # Spark SQL parses a bare `2.0` literal as DECIMAL(2,1) while DuckDB
    # reads DOUBLE; an all-keyword score tree would come out decimal on
    # the Spark side. Explicit cast keeps both backends in doubles.
    return f"CAST({float(b)!r} AS DOUBLE)"


def _tf_expr(arr: str, word: str, backend: str) -> str:
    fn = "filter" if backend == "spark" else "list_filter"
    size = "size" if backend == "spark" else "len"
    return f"CAST({size}({fn}({arr}, x -> x = {_q(word)})) AS BIGINT)"


def _phrase_expr(arr: str, words: tuple[str, ...], backend: str) -> str:
    """Count of positions where the k tokens appear adjacently.

    Spark lambda index is 0-based (neighbor j via 1-based
    ``element_at(arr, i + 1 + j)``); DuckDB's is 1-based (neighbor j via
    ``arr[i + j]``) — the q332 idiom, generalized to k words.
    """
    k = len(words)
    if backend == "spark":
        conds = [f"x = {_q(words[0])}", f"i + {k - 1} < size({arr})"]
        conds += [
            f"element_at({arr}, i + {1 + j}) = {_q(words[j])}" for j in range(1, k)
        ]
        return (
            f"CAST(size(filter(transform({arr}, (x, i) -> "
            f"CASE WHEN {' AND '.join(conds)} THEN 1 END), "
            f"h -> h IS NOT NULL)) AS BIGINT)"
        )
    conds = [f"x = {_q(words[0])}", f"i + {k - 1} <= len({arr})"]
    conds += [f"{arr}[i + {j}] = {_q(words[j])}" for j in range(1, k)]
    return (
        f"CAST(len(list_filter(list_transform({arr}, (x, i) -> "
        f"CASE WHEN {' AND '.join(conds)} THEN 1 END), "
        f"h -> h IS NOT NULL)) AS BIGINT)"
    )


def _compile(node, fields, default_field: str, backend: str) -> tuple[str, str]:
    """Return ``(match_sql, score_sql)`` for the node."""
    if isinstance(node, (Term, Phrase)):
        fname = node.field or default_field
        spec = fields.get(fname)
        if spec is None:
            raise ValueError(f"query_string: unknown field {fname!r}")
        if isinstance(spec, KeywordField):
            if isinstance(node, Phrase):
                raise ValueError(
                    f"query_string: phrase on keyword field {fname!r}"
                )
            m = f"(coalesce({spec.expr} = {_q(node.word)}, false))"
            s = f"(CASE WHEN {m} THEN {_fnum(node.boost)} ELSE CAST(0.0 AS DOUBLE) END)"
            return m, s
        if isinstance(node, Term):
            cnt = _tf_expr(spec.expr, node.word, backend)
        else:
            cnt = _phrase_expr(spec.expr, node.words, backend)
        m = f"(coalesce({cnt} > 0, false))"
        s = f"(coalesce(CAST({cnt} AS DOUBLE), 0.0) * {_fnum(node.boost)})"
        return m, s
    if isinstance(node, Not):
        cm, _ = _compile(node.child, fields, default_field, backend)
        return f"(NOT {cm})", "CAST(0.0 AS DOUBLE)"
    if isinstance(node, And):
        parts = [_compile(c, fields, default_field, backend) for c in node.children]
        m = "(" + " AND ".join(p[0] for p in parts) + ")"
        s = "(" + " + ".join(p[1] for p in parts) + ")"
        return m, s
    if isinstance(node, Or):
        parts = [_compile(c, fields, default_field, backend) for c in node.children]
        m = "(" + " OR ".join(p[0] for p in parts) + ")"
        s = (
            "("
            + " + ".join(
                f"(CASE WHEN {pm} THEN {ps} ELSE CAST(0.0 AS DOUBLE) END)" for pm, ps in parts
            )
            + ")"
        )
        return m, s
    if isinstance(node, Boost):
        cm, cs = _compile(node.child, fields, default_field, backend)
        return cm, f"({cs} * {_fnum(node.boost)})"
    raise TypeError(f"query_string: unknown node {node!r}")


def compile_query_string(
    q: str,
    fields: dict[str, TokenField | KeywordField],
    default_field: str,
    backend: str,
) -> tuple[str, str]:
    """Parse + compile ``q`` for ``backend`` ('spark' | 'duck').

    Returns ``(match_sql, score_sql)`` referencing the column
    expressions declared in ``fields``; apply with ``F.expr`` on a
    frame exposing those columns (Spark), or splice into a ``WITH``
    body (DuckDB).
    """
    if backend not in ("spark", "duck"):
        raise ValueError(f"query_string: unknown backend {backend!r}")
    return _compile(parse_query_string(q), fields, default_field, backend)
