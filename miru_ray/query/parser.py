"""Lucene-ish query string → Filter AST.

Mirrors the reference's ``LuceneBackedQueryParser`` mapping
(``miru-plugin/.../query/LuceneBackedQueryParser.java:76-144``): default
operator AND; ``MUST`` → and, ``SHOULD`` → or, ``MUST_NOT`` → pButNotQ,
``PrefixQuery`` (``term*``) → wildcard expansion.  Grammar::

    query   := clause+                      (default AND)
    clause  := ["-"|"NOT "] atom | atom "OR" atom ...
    atom    := [field ":"] term ["*"] | "(" query ")"

Atoms may also carry Lucene suffix modifiers (``term~N`` fuzzy,
``term^N`` boost, ``"a b"~N`` sloppy phrase) and infix/leading
wildcards (``pa*t?n`` → :class:`Wildcard`; a single trailing ``*``
stays the cheaper :class:`Prefix`) and anchored regexps (``/pat/`` /
``field:/pat/`` → :class:`Regexp`, not analyzed).

Quoted multi-term strings parse to :class:`Phrase` — exact token-adjacency
match, evaluated as AND candidates + verification against stored text (the
engine keeps its segment format positions-free; the reference defers
phrase semantics to Lucene's parser).
"""

from __future__ import annotations

import re
from dataclasses import replace

from ..tokenize import py_tokenize
from .filter import (And, Boost, Fuzzy, Node, Not, NumericRange, Or, Phrase,
                     Prefix, Regexp, Term, Wildcard)

# bracket ranges (`field:[10 TO 20]`) tokenize as ONE atom — the inner
# space must not split them.  Quoted phrases may carry a '-' or 'field:'
# prefix; plain tokens EXCLUDE parens/quotes so ')' glued to a word still
# closes its group instead of being swallowed by the word token.
_TOKEN_SPLIT = re.compile(
    r'-?(?:[\w.]+:)?"[^"]*"(?:~\d+)?(?:\^\d+(?:\.\d+)?)?'
    # /regex/ may hold ()| — but only when delimited (end/space/paren),
    # so a path-like keyword value 'tool:/usr/bin' is NOT hijacked
    r'|-?(?:[\w.]+:)?/[^/\s]+/(?:\^\d+(?:\.\d+)?)?(?=$|[\s()])'
    r'|\(|\)|\S+:\[[^\]]*\]|[^\s()"]+')

_RANGE = re.compile(r'^(-?\d+)\s+TO\s+(-?\d+)$', re.IGNORECASE)
_BARE_BOOST = re.compile(r'^\^(\d+(?:\.\d+)?)$')
_BOOST = re.compile(r'^(.*\S)\^(\d+(?:\.\d+)?)$')
_FUZZY = re.compile(r'^(.*\S)~(\d+)?$')
_SLOP = re.compile(r'^(.*")~(\d+)$')   # sloppy phrase '"a b"~N'


def parse_query(q: str, default_field: str = "text",
                stopwords: frozenset | None = None) -> Node:
    """Parse a query string.  ``stopwords`` must be the INDEX's stopword
    set when the index was built with ``remove_stopwords`` — the reference
    runs the same analyzer chain on queries, so a stopword in an AND/phrase
    is dropped rather than matching nothing (its postings don't exist)."""
    tokens = _TOKEN_SPLIT.findall(q)
    pos = 0

    def peek():
        return tokens[pos] if pos < len(tokens) else None

    def parse_group() -> Node:
        nonlocal pos
        positives: list[Node] = []
        negatives: list[Node] = []
        pending_or = False
        negate_next = False
        while pos < len(tokens):
            t = tokens[pos]
            if t == ")":
                break
            pos += 1
            if t == "(":
                node = parse_group()
                if peek() == ")":
                    pos += 1
                if isinstance(node, And) and not node.children:
                    # the whole group dissolved (stopwords/malformed):
                    # drop it like a dissolved atom — And(()) would be
                    # the implicit match-ALL
                    node = None
                # '(a b)^2': the boost binds to the group JUST closed —
                # before OR-merging or negation placement, so neither
                # 'x OR (a b)^2' nor 'a NOT (b c)^2' leaks it elsewhere
                nxt = peek()
                if nxt is not None and _BARE_BOOST.match(nxt):
                    pos += 1
                    if node is not None:
                        node = Boost(node,
                                     float(_BARE_BOOST.match(nxt).group(1)))
            elif _BARE_BOOST.match(t):
                continue  # stray '^N' with no preceding group: drop it
            elif t == "OR":  # Lucene operators are CASE-SENSITIVE —
                #                 lowercase 'or' is a search term
                pending_or = True
                continue
            elif t == "AND":
                continue
            elif t == "NOT":
                negate_next = True
                continue
            elif t == "-" and peek() == "(":
                # '-(a b)': '(' can never join a word token, so the '-'
                # arrives alone — without this branch it would dissolve
                # in _atom and the group would attach as a POSITIVE
                # clause, returning exactly the docs the user excluded
                negate_next = True
                continue
            elif t.startswith("-") and len(t) > 1:
                negate_next = True
                node = _atom(t[1:], default_field, stopwords)
            else:
                node = _atom(t, default_field, stopwords)
            if node is None:
                negate_next = False
                pending_or = False
                continue
            if negate_next:
                negatives.append(node)
                negate_next = False
                # a dangling OR must not skip over a negated clause and
                # re-attach to the NEXT positive ('x OR -y z': z is its
                # own AND clause, not an alternative to x)
                pending_or = False
            elif pending_or and positives:
                prev = positives.pop()
                if isinstance(prev, Or):
                    positives.append(Or(prev.children + (node,)))
                else:
                    positives.append(Or((prev, node)))
                pending_or = False
            else:
                positives.append(node)
        if not positives and negatives:
            # pure-negative query ("-spark"): Lucene / the reference's
            # LuceneBackedQueryParser yield NO results for MUST_NOT-only
            # queries.  An empty Or() evaluates to match-none, so the whole
            # expression matches nothing (ADVICE r01: the implicit And(())
            # match-all made "-spark" return every non-matching doc).
            return Not(Or(()), tuple(negatives))
        pos_node: Node = (positives[0] if len(positives) == 1
                          else And(tuple(positives)))
        if negatives:
            return Not(pos_node, tuple(negatives))
        return pos_node

    parts: list[Node] = []
    while True:
        node = parse_group()
        if not (isinstance(node, And) and not node.children):
            parts.append(node)
        if pos < len(tokens):  # unmatched top-level ')': skip it and
            pos += 1          # resume — dropping the REST of the query
            continue          # would silently widen the match set
        break
    node = (And(()) if not parts
            else parts[0] if len(parts) == 1 else And(tuple(parts)))
    if isinstance(node, And) and not node.children:
        # every clause dissolved (empty query / all-stopword phrase):
        # match nothing, like Lucene — never the implicit match-all And(())
        return Or(())
    return node


def _atom(tok: str, default_field: str,
          stopwords: frozenset | None = None) -> Node | None:
    # Lucene suffix modifiers, outermost first: `term~2^3` is a boosted
    # fuzzy (LuceneBackedQueryParser.java:48-53 inherits full syntax)
    boost = None
    m = _BOOST.match(tok)
    # strip a trailing ^N from any atom INCLUDING quoted phrases
    # ('"big data"^2') and sloppy phrases ('"big data"~2^3'), but never
    # from inside the quotes ('"a^2"')
    if m and ('"' not in tok
              or re.search(r'"(~\d+)?$', m.group(1)) is not None):
        tok, boost = m.group(1), float(m.group(2))
    m = _SLOP.match(tok)
    if m:  # '"a b"~N' / 'f:"a b"~N': ordered proximity within slop
        inner = _atom_base(m.group(1), default_field, stopwords)
        if isinstance(inner, Phrase):
            inner = replace(inner, slop=int(m.group(2)))
        if inner is None or boost is None:
            return inner
        return Boost(inner, boost)
    if not tok.startswith('"') and ":\"" not in tok:
        m = _FUZZY.match(tok)
        if m and not tok.startswith("[") and "]" not in tok:
            body = m.group(1)
            edits = int(m.group(2)) if m.group(2) else 2  # Lucene default
            if edits > 2:
                # Lucene: "maximum supported edit distance is 2" — a
                # silent fall-through would turn '3' into a search term
                raise ValueError(
                    f"fuzzy edit distance {edits} not supported (max 2): "
                    f"{tok!r}")
            field = default_field
            if ":" in body:
                field, body = body.split(":", 1)
            toks = py_tokenize(body) if field == default_field else [body]
            if not toks:
                return None
            node: Node = (Term(field, toks[-1]) if edits == 0  # '~0' exact
                          else Fuzzy(field, toks[-1], max_edits=edits))
            # 'foo-bar~': foo required, last token fuzzy.  The required
            # LEADING terms get analyzer parity (stopwords dropped, not
            # turned into no-postings Terms that match nothing); the
            # fuzzy body itself is never dropped
            lead = [t for t in toks[:-1]
                    if not stopwords or t not in stopwords]
            if lead:
                node = And(tuple(Term(field, t) for t in lead) + (node,))
            return Boost(node, boost) if boost is not None else node
    inner = _atom_base(tok, default_field, stopwords)
    if inner is None or boost is None:
        return inner
    return Boost(inner, boost)


def _atom_base(tok: str, default_field: str,
               stopwords: frozenset | None = None) -> Node | None:
    field = default_field
    if not tok.startswith('"') and ":" in tok:
        maybe_field, rest = tok.split(":", 1)
        if rest.startswith('"') and rest.endswith('"') and len(rest) >= 2:
            field, tok = maybe_field, rest  # field-qualified phrase
    if tok.startswith('"') and tok.endswith('"'):
        # quoting means ANALYZED match on any field ('title:"foo bar"' →
        # Phrase verified against the stored column) — verbatim keyword
        # equality is the UNQUOTED form ('status:Open'); mixing the two
        # would need per-field analyzer knowledge the parser doesn't have
        terms = py_tokenize(tok[1:-1], stopwords)
        if not terms:
            return None
        if len(terms) == 1:
            return Term(field, terms[0])
        # exact phrase: AND candidates + token-adjacency verification
        from .filter import Phrase
        return Phrase(field, tuple(terms))
    if tok.startswith("/") and tok.endswith("/") and len(tok) > 2:
        # /pat/ before the field split: a ':' inside the pattern must
        # not be mistaken for a field qualifier
        return Regexp(field, tok[1:-1])
    if ":" in tok:
        field, tok = tok.split(":", 1)
    if tok.startswith("/") and tok.endswith("/") and len(tok) > 2:
        # field:/pat/ — Lucene RegexpQuery; the pattern is NOT analyzed
        # (write lowercase literals to match the lowercased index)
        return Regexp(field, tok[1:-1])
    if tok.startswith("[") and tok.endswith("]") and field != default_field:
        # numeric range `field:[lo TO hi]` (inclusive, Lucene syntax) —
        # constant-score gate over the lex-encoded term range
        m = _RANGE.match(tok[1:-1].strip())
        if m:
            return NumericRange(field, int(m.group(1)), int(m.group(2)))
        return None  # malformed range: dissolve the clause
    if (("?" in tok or "*" in tok)
            and not (tok.endswith("*") and "?" not in tok
                     and "*" not in tok[:-1])):
        # infix/leading wildcard (Lucene WildcardQuery) — a SINGLE
        # trailing '*' stays on the cheaper Prefix path below.  Wildcard
        # terms bypass the analyzer (Lucene does not analyze them);
        # TEXT patterns lowercase to match the lowercased tokens, but
        # keyword-field values are indexed VERBATIM so their patterns
        # must keep case (Term/Prefix preserve it too).
        pat = tok.lower() if field == default_field else tok
        if not pat.strip("*?"):
            return None  # all-wildcard ('*', '??') dissolves, never a
            #              silently-truncated match-all scan
        return Wildcard(field, pat)
    if tok.endswith("*"):
        body = tok[:-1]
        if field == default_field:
            toks = py_tokenize(body)  # prefix body: no stopword drop (it's a prefix)
            if not toks:
                return None
            pre = Prefix(field, toks[-1])
            # 'foo-bar*': foo is a required term, the LAST token is the
            # prefix — never dropped.  Leading terms get analyzer parity
            # (a stopword lead would otherwise become a Term with no
            # postings and the AND would match nothing)
            lead = [t for t in toks[:-1]
                    if not stopwords or t not in stopwords]
            if lead:
                return And(tuple(Term(field, t) for t in lead) + (pre,))
            return pre
        # 'field:*' with an empty body = EXISTS query (Lucene field
        # wildcard): every doc holding any value for the keyword field —
        # the empty prefix expands the field's whole 'field:' term slice
        return Prefix(field, body)
    if field == default_field:
        terms = py_tokenize(tok, stopwords)
        if not terms:
            return None
        if len(terms) == 1:
            return Term(field, terms[0])
        return And(tuple(Term(field, t) for t in terms))
    return Term(field, tok)
