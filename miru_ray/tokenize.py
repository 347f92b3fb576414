"""Deterministic, vectorized tokenizer (Arrow kernels, no Python row loops).

Token rule: lowercase the text, then every maximal run of ``[a-z0-9]`` is a
token.  Chosen because it is expressible *identically* in three places:

- engine side:    ``pc.utf8_lower`` + ``pc.split_pattern_regex`` (this module)
- DuckDB oracle:  ``regexp_extract_all(lower(text), '[a-z0-9]+')``
- pytest oracle:  ``re.findall('[a-z0-9]+', text.lower())``

which is what the conformance gate needs (FIXTURES.md §F4 invariant 1).

Reference semantics: the reference tokenizes with a Lucene analyzer chain
Standard → lowercase → (optional English stopwords)
(``miru-plugin/.../query/TermTokenizer.java:34-55``,
``miru-stream-plugins/.../fulltext/MiruBodyAnalyzer.java:23-33``).  We keep
the lowercase + optional-stopword semantics and replace the UAX#29 Standard
tokenizer with the regex rule above so the engine, the SQL oracle and the
Python oracle agree byte-for-byte.  Stopword removal is OFF by default and
available via ``stopwords=EN_STOPWORDS``.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_PATTERN = "[a-z0-9]+"
_SPLIT_PATTERN = "[^a-z0-9]+"
_PY_TOKEN_RE = re.compile(TOKEN_PATTERN)

# The reference's English stopword set lives in
# miru-plugin/.../query/EnStopwords.java; we use the classic Lucene 33-word
# English set (public knowledge), exposed as an option.
EN_STOPWORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)


def py_tokenize(text: str, stopwords: frozenset[str] | None = None) -> list[str]:
    """Single-string tokenizer — BYTE-IDENTICAL to :func:`explode_tokens`
    by construction: it delegates to the same Arrow kernels.  (A pure
    ``str.lower()`` re-implementation diverges on full-vs-simple Unicode
    case mapping — e.g. U+0130 'İ' lowers to 'i' + combining dot in
    Python, splitting the token — which would break phrase verification
    and highlighting against the Arrow-built index.)"""
    terms, _rows, _dl = explode_tokens(pa.array([text], type=pa.string()),
                                       stopwords)
    return terms.to_pylist()


def explode_tokens(
    text: pa.Array | pa.ChunkedArray,
    stopwords: frozenset[str] | None = None,
) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Tokenize a string column. Fully vectorized (Arrow + NumPy).

    Returns ``(terms, row_idx, doc_len)`` where

    - ``terms``   — flat ``pa.string()`` array of all tokens, in row order
    - ``row_idx`` — int64 ndarray, same length: index of the source row
    - ``doc_len`` — int64 ndarray of length ``len(text)``: tokens per row
    """
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n = len(text)
    if n == 0:
        return pa.array([], type=pa.string()), np.empty(0, np.int64), np.empty(0, np.int64)

    lowered = pc.utf8_lower(text)
    lists = pc.split_pattern_regex(lowered, _SPLIT_PATTERN)
    # list sizes (null rows → 0 tokens)
    sizes = pc.fill_null(pc.list_value_length(lists), 0).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(lists)  # drops null parents
    row_idx = np.repeat(np.arange(n, dtype=np.int64), sizes)

    # split_pattern_regex emits "" tokens at boundaries — drop them (and stopwords)
    keep_mask = pc.not_equal(flat, "")
    if stopwords:
        stop_arr = pa.array(sorted(stopwords), type=pa.string())
        keep_mask = pc.and_(keep_mask, pc.invert(pc.is_in(flat, value_set=stop_arr)))
    keep = pc.fill_null(keep_mask, False).to_numpy(zero_copy_only=False).astype(bool)

    terms = flat.filter(pa.array(keep))
    row_idx = row_idx[keep]
    doc_len = np.bincount(row_idx, minlength=n).astype(np.int64)
    return terms, row_idx, doc_len


def token_counts(text: pa.Array | pa.ChunkedArray,
                 stopwords: frozenset[str] | None = None) -> np.ndarray:
    """Per-row token count (doc length). Same rule as :func:`explode_tokens`."""
    _, _, doc_len = explode_tokens(text, stopwords)
    return doc_len


def sql_tokenize_expr(col: str = "text") -> str:
    """DuckDB expression producing the identical token list for a column."""
    return f"regexp_extract_all(lower({col}), '{TOKEN_PATTERN}')"
