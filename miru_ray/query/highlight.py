"""Best-fragment highlighting of result documents.

Reference: the fulltext plugin highlights content fields against the parsed
query (``LuceneBackedQueryParser.highlight``,
``miru-plugin/.../query/LuceneBackedQueryParser.java:56-74`` — Lucene
``Highlighter`` + ``QueryScorer``, best fragment, ``<b>...</b>`` tags).

Re-implementation: slide a fixed-width window over the tokenized text, pick
the window containing the most query-term hits (earliest on ties), wrap the
hits.  Deterministic; applied as a post-processing map over gathered rows.
"""

from __future__ import annotations

import re

from ..tokenize import TOKEN_PATTERN

_TOKEN_RE = re.compile(TOKEN_PATTERN)


def best_fragment(text: str, terms: set[str], width: int = 20,
                  pre: str = "<b>", post: str = "</b>") -> str:
    """Best ``width``-token window with query hits wrapped. Empty string if
    no term matches (the reference returns no fragment then)."""
    matches = [(m.start(), m.end(), m.group().lower() in terms)
               for m in _TOKEN_RE.finditer(text.lower())]
    if not matches:
        return ""
    hits = [i for i, m in enumerate(matches) if m[2]]
    if not hits:
        return ""
    # best window = max hits in any [i, i+width) token span, earliest wins
    best_start, best_count = 0, -1
    j = 0
    for i in range(len(matches)):
        while j < len(matches) and j < i + width:
            j += 1
        count = sum(1 for h in hits if i <= h < i + width)
        if count > best_count:
            best_start, best_count = i, count
    lo = matches[best_start][0]
    hi_idx = min(best_start + width, len(matches)) - 1
    hi = matches[hi_idx][1]
    frag = text[lo:hi]
    # wrap hits inside the fragment (offsets relative to lo)
    out = []
    cursor = 0
    for s, e, is_hit in matches:
        if s < lo or e > hi or not is_hit:
            continue
        out.append(frag[cursor:s - lo])
        out.append(pre + frag[s - lo:e - lo] + post)
        cursor = e - lo
    out.append(frag[cursor:])
    return "".join(out)


def highlight_rows(texts, terms: list[str], width: int = 20) -> list[str]:
    tset = {t.lower() for t in terms}
    return [best_fragment(t or "", tset, width) for t in texts]
