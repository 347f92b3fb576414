import duckdb
import numpy as np
import pyarrow as pa

from miru_ray.tokenize import (EN_STOPWORDS, explode_tokens, py_tokenize,
                               sql_tokenize_expr, token_counts)

TEXTS = ["Hello, World 42!", "", None, "a  b--c", "héllo Wörld café",
         "The the THE and", "日本語 テスト abc", "x" * 500, "1 2 3"]


def _engine_tokens(texts, stopwords=None):
    terms, rows, _ = explode_tokens(pa.array(texts, type=pa.string()), stopwords)
    out = [[] for _ in texts]
    for t, r in zip(terms.to_pylist(), rows):
        out[r].append(t)
    return out


def test_matches_python_oracle():
    got = _engine_tokens(TEXTS)
    for i, t in enumerate(TEXTS):
        assert got[i] == py_tokenize(t or "")


def test_matches_duckdb():
    got = _engine_tokens(TEXTS)
    res = duckdb.sql(
        f"select {sql_tokenize_expr('t')} from (select unnest(?) as t)",
        params=[[x or "" for x in TEXTS]]).fetchall()
    for i, (lst,) in enumerate(res):
        assert lst == got[i]


def test_stopwords():
    got = _engine_tokens(["The cat and a dog"], EN_STOPWORDS)
    assert got[0] == ["cat", "dog"]
    assert py_tokenize("The cat and a dog", EN_STOPWORDS) == ["cat", "dog"]


def test_doc_len():
    dl = token_counts(pa.array(TEXTS, type=pa.string()))
    exp = np.array([len(py_tokenize(t or "")) for t in TEXTS])
    assert (dl == exp).all()


def test_empty_input():
    terms, rows, dl = explode_tokens(pa.array([], type=pa.string()))
    assert len(terms) == 0 and len(rows) == 0 and len(dl) == 0
