"""Best-fragment highlighting of result documents.

Reference: the fulltext plugin highlights content fields against the parsed
query (``LuceneBackedQueryParser.highlight``,
``miru-plugin/.../query/LuceneBackedQueryParser.java:56-74`` — Lucene
``Highlighter`` + ``QueryScorer``, best fragment, ``<b>...</b>`` tags).

Re-implementation with EXACTLY SQL-reproducible semantics: the fragment is
the best ``width``-token window of the LOWERED token stream (max query-term
hits, earliest window on ties), hits wrapped, tokens joined with single
spaces.  Working on tokens instead of raw character spans is a documented
simplification that lets a DuckDB oracle rebuild the fragment byte-for-byte
(list_slice + list_transform + array_to_string).
"""

from __future__ import annotations

import numpy as np

from ..tokenize import py_tokenize


def best_fragment(text: str, terms: set[str], width: int = 20,
                  pre: str = "<b>", post: str = "</b>") -> str:
    """Best ``width``-token window with query hits wrapped. Empty string if
    no term matches (the reference returns no fragment then)."""
    toks = py_tokenize(text)
    if not toks:
        return ""
    hits = np.array([t in terms for t in toks], bool)
    if not hits.any():
        return ""
    # c[i] = hits in [i, i+width): suffix-window sums via cumsum; earliest
    # argmax wins (the reference's first-best-fragment rule)
    cs = np.r_[0, np.cumsum(hits)]
    n = len(toks)
    c = cs[np.minimum(np.arange(n) + width, n)] - cs[:n]
    best = int(np.argmax(c))
    frag = toks[best:best + width]
    return " ".join(pre + t + post if t in terms else t for t in frag)


def highlight_rows(texts, terms: list[str], width: int = 20) -> list[str]:
    tset = {t.lower() for t in terms}
    return [best_fragment(t or "", tset, width) for t in texts]
