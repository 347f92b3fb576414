"""Text-analysis operators over the ``documents`` table.

Training-data quality stack, each a vectorized ``map_batches`` stage:

- token counting       — same tokenizer as the index (miru_ray.tokenize)
- quality scoring      — length / punctuation / stopword-ratio features
- language ID          — character-frequency n-gram heuristic (stub-grade
                         but deterministic and real plumbing; the synthetic
                         corpus shares one vocabulary across langs, so
                         accuracy against the ``lang`` column is reported,
                         not asserted)
- fingerprinting       — winnowing over a rolling (Rabin-style) token hash
                         (Schleimer et al., SIGMOD 2003 public algorithm)
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Mean, Sum

from ..tokenize import EN_STOPWORDS, explode_tokens, py_tokenize


def _documents(sf_dir: str, columns=None) -> "ray.data.Dataset":
    return ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=columns)


# ------------------------- token counting ----------------------------------


def token_count_by_source(sf_dir: str) -> pa.Table:
    """Per-source total/avg token counts (pre-aggregated per batch)."""
    ds = _documents(sf_dir, ["source", "text"])

    def partial(b: pa.Table) -> pa.Table:
        _, _, dl = explode_tokens(b["text"])
        t = pa.table({"source": b["source"], "n_tokens": pa.array(dl)})
        g = t.group_by("source").aggregate(
            [("n_tokens", "sum"), ("n_tokens", "count")])
        return g.rename_columns(["source", "tok", "docs"])

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=8192)
    out = partials.groupby("source").aggregate(
        Sum("tok", alias_name="total_tokens"),
        Sum("docs", alias_name="n_docs")).to_pandas()
    out["avg_tokens"] = (out["total_tokens"] / out["n_docs"]).round(6)
    out = out.sort_values("source").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


# ------------------------- quality scoring ---------------------------------


def quality_by_lang(sf_dir: str) -> pa.Table:
    """Per-lang quality aggregates: avg tokens, avg token length, stopword
    ratio — the length/punct/stopword heuristics of a data-quality pass."""
    ds = _documents(sf_dir, ["lang", "text"])

    def features(b: pa.Table) -> pa.Table:
        terms, rows, dl = explode_tokens(b["text"])
        tl = pc.utf8_length(terms).to_numpy(zero_copy_only=False)
        n = b.num_rows
        sum_tok_len = np.zeros(n, np.int64)
        np.add.at(sum_tok_len, rows, tl)
        stop_arr = pa.array(sorted(EN_STOPWORDS), type=pa.string())
        is_stop = pc.is_in(terms, value_set=stop_arr).to_numpy(zero_copy_only=False)
        n_stop = np.zeros(n, np.int64)
        np.add.at(n_stop, rows, is_stop.astype(np.int64))
        return pa.table({
            "lang": b["lang"],
            "n_tokens": pa.array(dl),
            "sum_tok_len": pa.array(sum_tok_len),
            "n_stop": pa.array(n_stop),
        })

    feats = ds.map_batches(features, batch_format="pyarrow", batch_size=8192)
    out = feats.groupby("lang").aggregate(
        Sum("n_tokens", alias_name="total_tokens"),
        Sum("sum_tok_len", alias_name="total_tok_len"),
        Sum("n_stop", alias_name="total_stop"),
        Count(alias_name="n_docs")).to_pandas()
    out["avg_tokens"] = (out["total_tokens"] / out["n_docs"]).round(6)
    out["avg_token_len"] = (out["total_tok_len"] / out["total_tokens"]).round(6)
    out["stopword_ratio"] = (out["total_stop"] / out["total_tokens"]).round(6)
    out = out[["lang", "n_docs", "total_tokens", "avg_tokens",
               "avg_token_len", "stopword_ratio"]]
    out = out.sort_values("lang").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


# ------------------------- language ID -------------------------------------

_LANG_PROFILES = {
    # coarse character-trigram prior per language (deterministic heuristic)
    "en": ["the", "ing", "and", "ion", "ati"],
    "de": ["der", "sch", "ein", "ich", "und"],
    "fr": ["les", "ent", "que", "des", "ion"],
    "es": ["que", "los", "ión", "ent", "ado"],
    "zh": [],  # CJK detected by codepoint range
}


def langid(sf_dir: str) -> pa.Table:
    """Heuristic language ID vs the ``lang`` column: per-lang accuracy.

    Trigram-vote heuristic + CJK codepoint check.  The synthetic corpus
    draws every lang from one English-ish vocabulary, so this measures the
    plumbing (batch shape, vote logic), not linguistic accuracy.
    """
    ds = _documents(sf_dir, ["doc_id", "lang", "text"])

    class LangId:
        def __init__(self):  # profiles compiled once per actor
            self.profiles = {k: set(v) for k, v in _LANG_PROFILES.items()}

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            preds = []
            for t in b["text"]:
                if any("一" <= c <= "鿿" for c in t[:200]):
                    preds.append("zh")
                    continue
                low = t.lower()
                tri = {low[i:i + 3] for i in range(min(len(low), 500) - 2)}
                votes = {k: len(tri & p) for k, p in self.profiles.items() if p}
                preds.append(max(sorted(votes), key=lambda k: votes[k]))
            b = b.copy()
            b["pred"] = preds
            return b

    preds = ds.map_batches(LangId, batch_format="pandas", batch_size=4096,
                           concurrency=(1, 4)).to_pandas()
    preds["correct"] = (preds["pred"] == preds["lang"]).astype(np.int64)
    g = preds.groupby("lang", as_index=False).agg(
        n_docs=("pred", "size"), n_correct=("correct", "sum"))
    g["n_docs"] = g["n_docs"].astype(np.int64)
    g["accuracy"] = (g["n_correct"] / g["n_docs"]).round(6)
    g = g.drop(columns=["n_correct"]).sort_values("lang").reset_index(drop=True)
    return pa.Table.from_pandas(g, preserve_index=False)


# ------------------------- fingerprinting ----------------------------------

_FP_WINDOW = 4


def _winnow(tokens: list[str], w: int = _FP_WINDOW) -> list[int]:
    """Winnowing fingerprints: min hash in each sliding window of token
    3-gram hashes (rightmost-min rule), deduplicated, sorted."""
    grams = [" ".join(tokens[i:i + 3]) for i in range(max(0, len(tokens) - 2))]
    if not grams:
        return []
    hs = [int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "big")
          for g in grams]
    if len(hs) <= w:
        return sorted({min(hs)})
    picks = set()
    for i in range(len(hs) - w + 1):
        win = hs[i:i + w]
        m = min(win)
        picks.add(m)
    return sorted(picks)


def fingerprints(sf_dir: str) -> pa.Table:
    """Per-doc winnowing fingerprint count + 16-hex digest of the sorted
    fingerprint set (stable document identity for near-dup grouping)."""
    ds = _documents(sf_dir, ["doc_id", "text"])

    def fp(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        counts, digs = [], []
        for t in b["text"].to_pandas():
            fps = _winnow(py_tokenize(t))
            counts.append(len(fps))
            h = hashlib.blake2b(
                b"".join(v.to_bytes(8, "big") for v in fps),
                digest_size=8).hexdigest()
            digs.append(h)
        return pa.table({"doc_id": pa.array(ids),
                         "n_fingerprints": pa.array(counts, pa.int64()),
                         "digest": pa.array(digs, pa.string())})

    out = ds.map_batches(fp, batch_format="pyarrow", batch_size=4096)
    pdf = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(pdf, preserve_index=False)


# --------------------------- SQL oracles -----------------------------------

_STOPLIST = ", ".join(f"'{w}'" for w in sorted(EN_STOPWORDS))

SQL = {
    "text_token_count_by_source": """
WITH d AS (
  SELECT source, len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n
  FROM documents)
SELECT source, sum(n)::BIGINT AS total_tokens, count(*)::BIGINT AS n_docs,
       round(sum(n) * 1.0 / count(*), 6) AS avg_tokens
FROM d GROUP BY source ORDER BY source
""".strip(),
    "text_quality_by_lang": f"""
WITH toks AS (
  SELECT lang, doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents),
per_doc AS (
  SELECT lang, doc_id, count(*) AS n_tokens,
         sum(len(term)) AS sum_tok_len,
         sum(CASE WHEN term IN ({_STOPLIST}) THEN 1 ELSE 0 END) AS n_stop
  FROM toks GROUP BY 1, 2)
SELECT lang, count(*)::BIGINT AS n_docs,
       sum(n_tokens)::BIGINT AS total_tokens,
       round(sum(n_tokens) * 1.0 / count(*), 6) AS avg_tokens,
       round(sum(sum_tok_len) * 1.0 / sum(n_tokens), 6) AS avg_token_len,
       round(sum(n_stop) * 1.0 / sum(n_tokens), 6) AS stopword_ratio
FROM per_doc GROUP BY lang ORDER BY lang
""".strip(),
}
