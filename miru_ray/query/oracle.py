"""Single-process oracle: brute-force scoring over the raw transcripts table.

Implements the cited reference formulas exactly (the Java reference cannot
execute in this sandbox — BASELINE.md "Rank identity"):

- ref-tfidf: ``score(d) = Σ_t qcount(t)/cf(t) · tf(t,d)``
  (``FullText.java:118-127, 187-199``)
- bm25: Okapi BM25 with the same k1/b/idf as the engine
- tie-break: score desc → doc_id desc (``FullText.java:294-303``)
- doc ids: ordinal of the stable (conv_id, turn_idx) sort (FIXTURES.md F1)

Deliberately simple and loop-based — this is the ground truth the
distributed engine must match, not an engine.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

from ..tokenize import explode_tokens


class OracleIndex:
    def __init__(self, transcripts: pa.Table, stopwords=None,
                 keyword_fields=("role", "tool")):
        df = transcripts.to_pandas()
        df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
        self.df = df
        self.n_docs = len(df)
        # one batched tokenize over the whole column (identical semantics
        # to per-string py_tokenize, which delegates to the same kernels)
        terms, rows, _dl = explode_tokens(
            pa.array(df["text"].tolist(), type=pa.string()), stopwords)
        flat = terms.to_pylist()
        self.tokens = [[] for _ in range(self.n_docs)]
        for r, t in zip(rows.tolist(), flat):
            self.tokens[r].append(t)
        self.doc_len = np.array([len(t) for t in self.tokens], np.int64)
        self.avgdl = float(self.doc_len.sum()) / max(1, self.n_docs)
        self.tf: list[Counter] = [Counter(t) for t in self.tokens]
        self.df_c: Counter = Counter()
        self.cf_c: Counter = Counter()
        for c in self.tf:
            self.df_c.update(c.keys())
            for k, v in c.items():
                self.cf_c[k] += v
        self.postings: dict[str, list[int]] = {}
        for d, c in enumerate(self.tf):
            for t in c:
                self.postings.setdefault(t, []).append(d)
        for f in keyword_fields:
            vals = df[f].fillna("")
            for d, v in enumerate(vals):
                if v == "":
                    continue
                key = f"{f}:{v}"
                self.postings.setdefault(key, []).append(d)
                self.df_c[key] += 1
                self.cf_c[key] += 1
                self.tf[d][key] = 1
        self.ts = df["ts"].astype("int64").to_numpy()

    # -------- matching --------
    def docs_with_all(self, terms: list[str]) -> np.ndarray:
        sets = [set(self.postings.get(t, ())) for t in terms]
        if not sets:
            return np.arange(self.n_docs)
        inter = set.intersection(*sets)
        return np.array(sorted(inter), np.int64)

    def docs_with_any(self, terms: list[str]) -> np.ndarray:
        u: set[int] = set()
        for t in terms:
            u.update(self.postings.get(t, ()))
        return np.array(sorted(u), np.int64)

    # -------- scoring --------
    def score(self, docs: np.ndarray, term_counts: dict[str, int],
              strategy: str, k1: float = 1.2, b: float = 0.75) -> np.ndarray:
        scores = np.zeros(len(docs), np.float64)
        for term in sorted(term_counts):
            qc = term_counts[term]
            if qc <= 0:
                continue
            dfv = self.df_c.get(term, 0)
            cfv = self.cf_c.get(term, 0)
            for i, d in enumerate(docs):
                tf = self.tf[d].get(term, 0)
                if tf == 0:
                    continue
                if strategy == "bm25":
                    idf = np.log(1.0 + (self.n_docs - dfv + 0.5) / (dfv + 0.5))
                    dl = float(self.doc_len[d])
                    scores[i] += idf * tf * (k1 + 1.0) / (
                        tf + k1 * (1.0 - b + b * dl / self.avgdl))
                elif strategy == "ref-tfidf":
                    if cfv > 0:
                        scores[i] += qc / cfv * tf
        return scores

    def topk(self, terms: list[str], k: int = 10, strategy: str = "bm25",
             mode: str = "and") -> tuple[np.ndarray, np.ndarray]:
        docs = self.docs_with_all(terms) if mode == "and" else self.docs_with_any(terms)
        term_counts = Counter(terms)
        scores = self.score(docs, dict(term_counts), strategy)
        order = np.lexsort((docs, scores))[::-1][:k]
        return docs[order], scores[order]

    def topk_time(self, terms: list[str], k: int = 10,
                  mode: str = "and") -> np.ndarray:
        docs = self.docs_with_all(terms) if mode == "and" else self.docs_with_any(terms)
        ts = self.ts[docs]
        order = np.lexsort((docs, ts))[::-1][:k]
        return docs[order]
