"""Query filter AST — the engine's analogue of miru's ``MiruFilter``.

The reference AST is ``MiruFilter{operation: and|or|pButNotQ, fieldFilters,
subFilters}`` (``miru-api/.../query/filter/MiruFilter.java:9-33``); its
evaluator rejects every other declared operation
(``MiruAggregateUtil.java:1236-1237``), so we implement exactly and / or /
pButNotQ plus term, prefix and time-range leaves.

Evaluation happens per partition as boolean-mask algebra over decoded posting
lists (see ``miru_ray.query.engine.PartitionReader.eval_filter``) — the
NumPy replacement for the reference's Roaring ``MiruBitmaps`` kernel
(``miru-plugin/.../bitmap/MiruBitmaps.java:87-131``).
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Node:
    """Base class for filter AST nodes (picklable, shipped to reader actors)."""


@dataclass(frozen=True)
class Term(Node):
    field: str          # "text" for tokenized terms, else a keyword field
    value: str

    def term_key(self) -> str:
        return self.value if self.field == "text" else f"{self.field}:{self.value}"


@dataclass(frozen=True)
class Prefix(Node):
    """Prefix/wildcard expansion ``pre*`` with an expansion cap (reference:
    ``maxWildcardExpansion``, ``MiruAggregateUtil.java:1154-1167``)."""
    field: str
    prefix: str
    max_expansion: int = 1000

    def term_key_prefix(self) -> str:
        return self.prefix if self.field == "text" else f"{self.field}:{self.prefix}"


@dataclass(frozen=True)
class Wildcard(Node):
    """Infix/leading wildcard ``pa*t?n`` (Lucene ``WildcardQuery``):
    ``*`` = any run of characters, ``?`` = exactly one, anywhere in the
    term.  Expanded against the sorted term dictionary — the literal
    prefix before the first wildcard bounds the scan (empty for a
    leading wildcard: full-dict scan, the documented Lucene cost) —
    under the same ``maxWildcardExpansion`` cap as :class:`Prefix`.
    A plain trailing ``*`` parses to the cheaper Prefix node instead."""
    field: str
    pattern: str
    max_expansion: int = 1000

    def expansion_key(self) -> str:
        return (self.pattern if self.field == "text"
                else f"{self.field}:{self.pattern}")


@dataclass(frozen=True)
class Regexp(Node):
    """Anchored regular-expression term query ``/pat/`` (Lucene
    ``RegexpQuery``): the whole term must match ``pattern``.  Both the
    engine (Arrow) and the oracle (DuckDB) compile RE2, so semantics are
    identical by construction.  Expanded like :class:`Wildcard` — any
    literal prefix of the pattern bounds the term-dict scan — under the
    same cap."""
    field: str
    pattern: str
    max_expansion: int = 1000

    def expansion_key(self) -> str:
        key = f"/{self.pattern}/"
        return key if self.field == "text" else f"{self.field}:{key}"


@dataclass(frozen=True)
class NumericRange(Node):
    """Inclusive numeric range ``field:[lo TO hi]`` over an int64 field
    indexed with the order-preserving lex encoding
    (:mod:`miru_ray.lexnum`).  Evaluates as a contiguous term-dictionary
    range scan — the reference's numeric-prefix range filter
    (``MiruTermComposer.prefixLowerInclusive/prefixUpperExclusive:176-240``
    over ``UtilLexMarshaller`` sign-flipped big-endian terms).

    Like :class:`Authz`, a range is a GATE: its expanded terms never join
    the scoring set (Lucene numeric ranges are constant-score).
    """
    field: str
    lo: int
    hi: int
    max_expansion: int = 100_000

    def range_keys(self) -> tuple[str, str]:
        from ..lexnum import lex_encode
        return (f"{self.field}:{lex_encode(self.lo)}",
                f"{self.field}:{lex_encode(self.hi)}")

    def expansion_key(self) -> str:
        return f"{self.field}:[{self.lo} TO {self.hi}]"


@dataclass(frozen=True)
class TimeRange(Node):
    """Inclusive [t0, t1] in epoch microseconds (reference: the time-range
    mask, ``MiruBitmapsRoaring.buildTimeRangeMask``, ``MiruTimeIndex``)."""
    t0_us: int
    t1_us: int


@dataclass(frozen=True)
class Phrase(Node):
    """Phrase over tokenized text.  ``slop=0`` (default): the terms must
    appear ADJACENT in token order.  ``slop=N`` (``"a b"~N``, the sloppy
    phrase of ``LuceneBackedQueryParser``): ORDERED proximity — the terms
    must appear in order within a window of at most ``slop`` extra
    positions (span − (k−1) ≤ slop; reordering is not licensed, a
    documented divergence from Lucene's transposition-at-cost-2).

    Evaluated as AND of the term postings (candidate mask) followed by
    position verification — from the positional index when the field
    stores positions, else against the stored text.  Scores like an AND
    of its terms."""
    field: str
    terms: tuple
    slop: int = 0

    def token_string(self) -> str:
        return " ".join(self.terms)

    def term_keys(self) -> tuple:
        """Postings keys — field-qualified exactly like Term.term_key
        (a non-text-field phrase must not read the text field's
        postings)."""
        return tuple(t if self.field == "text" else f"{self.field}:{t}"
                     for t in self.terms)


@dataclass(frozen=True)
class Fuzzy(Node):
    """Fuzzy term match ``term~`` / ``term~N`` (Lucene syntax via the
    reference's ``LuceneBackedQueryParser.java:48-53``; Lucene's default
    fuzziness is 2 edits).  Expands per partition to every vocabulary
    term within ``max_edits`` Levenshtein distance (vectorized DP over
    the term dict, length-prefiltered), capped at ``max_expansion``
    like :class:`Prefix`; expansions join the scoring set with
    multiplicity 1."""
    field: str
    value: str
    max_edits: int = 2
    max_expansion: int = 50

    def term_key(self) -> str:
        return self.value if self.field == "text" \
            else f"{self.field}:{self.value}"

    def expansion_key(self) -> str:
        return f"~{self.max_edits}:{self.term_key()}"


@dataclass(frozen=True)
class Boost(Node):
    """Score boost ``term^N`` (Lucene syntax).  Evaluates exactly as its
    child; scoring multiplies the child term's contribution by ``boost``
    (the scorer is term-at-a-time, so boosts attach to Term children —
    the parser only emits Boost around single terms)."""
    child: Node
    boost: float


@dataclass(frozen=True)
class Filter(Node):
    """Non-scoring gate: evaluates exactly as its child but contributes
    NOTHING to scoring.  The reference's ``constraintsFilter`` is
    bitmap-ANDed into the answer while only the parsed query's terms are
    collected for TF_IDF (``FullTextCustomQuestion.java`` ANDs the filter
    bitmap; the term collector walks the query only) — filters gate,
    they never rank.  ``collect_scoring_terms`` and the boost collectors
    deliberately do not descend into this node; the expansion collectors
    (prefix/fuzzy/wildcard/regexp/range) do, because expansion is an
    EVALUATION concern."""
    child: Node


@dataclass(frozen=True)
class Authz(Node):
    """Authorization expression: the doc is visible iff its ACL list shares
    at least one entry with the principal's ``values`` (reference:
    ``MiruAuthzExpression`` — a list of authz strings whose per-entry
    bitmaps are OR'd into a composite mask, ``MiruAuthzIndex`` /
    ``MiruAuthzUtils.getCompositeAuthz``; ANDed into every answer at
    ``FullTextCustomQuestion.java:106``).

    Evaluates as OR over the ``field:value`` postings of a
    ``list_keyword_fields`` column.  NEVER contributes scoring terms —
    authz gates visibility, it does not rank.
    """
    values: tuple
    field: str = "acl"


@dataclass(frozen=True)
class And(Node):
    children: tuple = field(default_factory=tuple)


@dataclass(frozen=True)
class Or(Node):
    children: tuple = field(default_factory=tuple)


@dataclass(frozen=True)
class MinShould(Node):
    """m-of-k boolean: matches docs satisfying at least ``m`` of the
    child clauses (Lucene ``BooleanQuery.setMinimumNumberShouldMatch`` /
    ES ``minimum_should_match``).  ``m=1`` degenerates to :class:`Or`,
    ``m=len(children)`` to :class:`And`; evaluated as a vectorized
    per-doc match-count threshold over the children's bitmaps.  Children
    traverse exactly like Or's for term collection and boosts."""
    children: tuple
    m: int

    def __post_init__(self):
        # m <= 0 would make `acc >= m` a silent match-all; Lucene's
        # setMinimumNumberShouldMatch rejects nothing but a should-only
        # query still needs one matching clause — require m >= 1
        if self.m < 1:
            raise ValueError(f"MinShould.m must be >= 1, got {self.m}")


@dataclass(frozen=True)
class Not(Node):
    """pButNotQ: ``positive AND NOT (q1 OR q2 ...)``
    (``MiruFilterOperation.java:11-22``)."""
    positive: Node
    negatives: tuple = field(default_factory=tuple)


@dataclass(frozen=True)
class MatchNone(Node):
    """Matches no documents.  Produced when a pButNotQ's positive (first)
    operand dissolves to NO_FILTER: the reference's ``filterInOut`` keeps
    the empty first bitmap and ``andNotTx`` of an empty bitmap is empty
    (``MiruAggregateUtil.filter``), so the whole filter must match
    nothing — never promote a negative child into positive position."""


def and_terms(terms: list[str], fld: str = "text") -> Node:
    return And(tuple(Term(fld, t) for t in terms))


def or_terms(terms: list[str], fld: str = "text") -> Node:
    return Or(tuple(Term(fld, t) for t in terms))


def collect_scoring_terms(node: Node, counts: dict[str, int] | None = None,
                          polarity: int = 1) -> dict[str, int]:
    """Query-term multiplicity with ± polarity for negated branches.

    Mirrors the reference's ``termCollector`` which increments per expanded
    query term and decrements inside negated pButNotQ branches
    (``MiruAggregateUtil.collectTerm:1204-1220``); terms with non-positive
    final counts score zero.
    """
    if counts is None:
        counts = {}
    if isinstance(node, Term):
        k = node.term_key()
        counts[k] = counts.get(k, 0) + polarity
    elif isinstance(node, Phrase):
        for t in node.term_keys():  # scores like an AND of its terms
            counts[t] = counts.get(t, 0) + polarity
    elif isinstance(node, Boost):
        collect_scoring_terms(node.child, counts, polarity)
    elif isinstance(node, (And, Or, MinShould)):
        for c in node.children:
            collect_scoring_terms(c, counts, polarity)
    elif isinstance(node, Not):
        collect_scoring_terms(node.positive, counts, polarity)
        for c in node.negatives:
            collect_scoring_terms(c, counts, -polarity)
    # Filter is NOT descended into — its terms gate, they never score.
    # Prefix/Fuzzy terms are expanded per partition at eval time; their
    # expansions are collected there (engine.Searcher._prepare).
    return counts


def _walk_collect(node: Node, out: list, want: type) -> list:
    """Collect every ``want``-typed node, recursing through the boolean
    combinators and :class:`Boost` wrappers."""
    if isinstance(node, want):
        out.append(node)
    elif isinstance(node, (Boost, Filter)):
        _walk_collect(node.child, out, want)
    elif isinstance(node, (And, Or, MinShould)):
        for c in node.children:
            _walk_collect(c, out, want)
    elif isinstance(node, Not):
        _walk_collect(node.positive, out, want)
        for c in node.negatives:
            _walk_collect(c, out, want)
    return out


def collect_prefixes(node: Node, out: list[Prefix] | None = None) -> list[Prefix]:
    return _walk_collect(node, [] if out is None else out, Prefix)


def collect_fuzzies(node: Node) -> "list[Fuzzy]":
    return _walk_collect(node, [], Fuzzy)


def collect_wildcards(node: Node) -> "list[Wildcard]":
    return _walk_collect(node, [], Wildcard)


def collect_regexps(node: Node) -> "list[Regexp]":
    return _walk_collect(node, [], Regexp)


def collect_scoring_expansions(node: Node,
                               out: list | None = None,
                               polarity: int = 1) -> list:
    """(expansion node, ± polarity) for every Prefix/Fuzzy/Wildcard/
    Regexp in SCORING position — the expansion analogue of
    :func:`collect_scoring_terms`: Filter subtrees are NOT descended
    (their terms gate, they never score) and Not negatives flip
    polarity, so a purely-negated or gate-only expansion contributes
    nothing to scoring.  The plain ``collect_*`` walkers above DO
    descend Filter — evaluation still needs those expansion lists."""
    if out is None:
        out = []
    if isinstance(node, (Prefix, Fuzzy, Wildcard, Regexp)):
        out.append((node, polarity))
    elif isinstance(node, Boost):
        collect_scoring_expansions(node.child, out, polarity)
    elif isinstance(node, (And, Or, MinShould)):
        for c in node.children:
            collect_scoring_expansions(c, out, polarity)
    elif isinstance(node, Not):
        collect_scoring_expansions(node.positive, out, polarity)
        for c in node.negatives:
            collect_scoring_expansions(c, out, -polarity)
    # Filter: stop — gate-only
    return out


def collect_boosts(node: Node, out: dict[str, float] | None = None,
                   mult: float = 1.0) -> dict[str, float]:
    """term_key → boost multiplier for every scoring term UNDER a Boost:
    ``Boost(Term)``, every term of a boosted Phrase, and every term
    inside a boosted group (nested/repeated boosts multiply, like
    Lucene).  Fuzzy/Prefix children are collected separately by
    :func:`collect_expansion_boosts` (the engine maps those onto the
    expanded terms).  Limitation (term-at-a-time scorer): a term that
    appears both boosted and unboosted gets the product, not per-clause
    scores."""
    if out is None:
        out = {}
    if isinstance(node, Boost):
        collect_boosts(node.child, out, mult * node.boost)
    elif mult != 1.0 and isinstance(node, Term):
        k = node.term_key()
        out[k] = out.get(k, 1.0) * mult
    elif mult != 1.0 and isinstance(node, Phrase):
        for k in node.term_keys():
            out[k] = out.get(k, 1.0) * mult
    elif isinstance(node, (And, Or, MinShould)):
        for c in node.children:
            collect_boosts(c, out, mult)
    elif isinstance(node, Not):
        collect_boosts(node.positive, out, mult)
        for c in node.negatives:
            collect_boosts(c, out, mult)
    return out


def collect_expansion_boosts(node: Node,
                             out: dict[str, float] | None = None,
                             mult: float = 1.0) -> dict[str, float]:
    """expansion key → multiplier for boosted Fuzzy/Prefix nodes, keyed
    exactly like the engine's expansions dict — ``(expansion_key /
    term_key_prefix, max_expansion)`` composites — so the Searcher can
    spread the boost over the expanded terms after expansion."""
    if out is None:
        out = {}
    if isinstance(node, Boost):
        collect_expansion_boosts(node.child, out, mult * node.boost)
    elif mult != 1.0 and isinstance(node, (Fuzzy, Wildcard, Regexp)):
        k = (node.expansion_key(), node.max_expansion)
        out[k] = out.get(k, 1.0) * mult
    elif mult != 1.0 and isinstance(node, Prefix):
        k = (node.term_key_prefix(), node.max_expansion)
        out[k] = out.get(k, 1.0) * mult
    elif isinstance(node, (And, Or, MinShould)):
        for c in node.children:
            collect_expansion_boosts(c, out, mult)
    elif isinstance(node, Not):
        collect_expansion_boosts(node.positive, out, mult)
        for c in node.negatives:
            collect_expansion_boosts(c, out, mult)
    return out


def collect_ranges(node: Node,
                   out: "list[NumericRange] | None" = None) -> "list[NumericRange]":
    return _walk_collect(node, [] if out is None else out, NumericRange)
