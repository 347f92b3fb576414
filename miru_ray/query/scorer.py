"""Scoring kernels: BM25 and the reference's linear tf×qf/cf scorer + WAND.

Two strategies (SURVEY.md §2.12):

- ``ref-tfidf`` — rank-identical reimplementation of the reference's ONLY
  relevance scorer (``FullText.collectTfIdf``, ``FullText.java:99-220``):
  ``score(d) = Σ_t queryCount(t)/collectionFrequency(t) · tf(t, d)`` where
  cf is the docId=−1 global cardinality (``LabFieldIndex.java:474-476``) and
  terms with cf = 0 are dropped (``FullText.java:118-127``).
- ``bm25`` — standard Okapi BM25 with Lucene-style non-negative idf,
  k1 = 1.2, b = 0.75 defaults (the reference has no k1/b anywhere).

Determinism rule for rank identity across arbitrary partitioning: global
stats (N, avgdl, df, cf) are computed BEFORE scoring, accumulation is float64
in ascending term-key order, tie-break is (score desc, doc_id desc)
(``FullText.java:294-303``).

``wand_topk`` implements block-max WAND pruning over the per-block
(last_doc, max_tf) metadata stored in segments; it returns exactly the same
top-k as exhaustive scoring (asserted in tests).  The vectorized
term-at-a-time path is the default at tested partition sizes — postings per
(term, partition) are bounded by partition capacity, so whole-array NumPy
accumulation beats a per-doc pivot loop; WAND becomes the win when a single
partition holds many millions of docs.
"""

from __future__ import annotations

import heapq

import numpy as np


def bm25_idf(df: np.ndarray | float, n_docs: int) -> np.ndarray | float:
    return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_tf_weight(tf: np.ndarray, dl: np.ndarray, avgdl: float,
                   k1: float, b: float) -> np.ndarray:
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def bm25_tf_weight_pre(tf: np.ndarray, dl_norm: np.ndarray, k1: float
                       ) -> np.ndarray:
    """``bm25_tf_weight`` with the query-independent doc-length factor
    ``dl_norm = 1 - b + b*dl/avgdl`` precomputed once per partition
    (bit-identical: ``k1 * dl_norm`` reproduces the original inner
    expression exactly, elementwise ops commute with the gather)."""
    return tf * (k1 + 1.0) / (tf + k1 * dl_norm)


def term_weight_arrays(strategy: str, qcount: int, df: int, cf: int,
                       n_docs: int, avgdl: float, k1: float, b: float,
                       tf: np.ndarray, dl: np.ndarray) -> np.ndarray:
    """Per-posting contribution of one term (float64)."""
    if strategy == "bm25":
        return bm25_idf(float(df), n_docs) * bm25_tf_weight(
            tf.astype(np.float64), dl.astype(np.float64), avgdl, k1, b)
    if strategy == "ref-tfidf":
        if cf <= 0:
            return np.zeros(len(tf), np.float64)
        return (float(qcount) / float(cf)) * tf.astype(np.float64)
    raise ValueError(f"unknown strategy {strategy!r}")


def term_upper_bound(strategy: str, qcount: int, df: int, cf: int,
                     n_docs: int, avgdl: float, k1: float, b: float,
                     max_tf: float) -> float:
    """Upper bound of one term's contribution (dl→0 bound for BM25)."""
    if strategy == "bm25":
        return float(bm25_idf(float(df), n_docs)) * max_tf * (k1 + 1.0) / (
            max_tf + k1 * (1.0 - b))
    if cf <= 0:
        return 0.0
    return float(qcount) / float(cf) * max_tf


def topk_by_score(doc_ids: np.ndarray, scores: np.ndarray, k: int
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Top-k with tie-break score desc → doc_id desc (FullText.java:294-303)."""
    if len(doc_ids) == 0:
        return doc_ids[:0], scores[:0]
    if len(doc_ids) > k * 8:  # cheap pre-cut, exact sort on the survivors
        cut = np.partition(scores, len(scores) - k)[len(scores) - k]
        keep = scores >= cut
        doc_ids, scores = doc_ids[keep], scores[keep]
    order = np.lexsort((doc_ids, scores))[::-1][:k]
    return doc_ids[order], scores[order]


def wand_topk(postings: list[tuple[np.ndarray, np.ndarray]],
              ubs: list[float],
              weight_fns: list,
              blocks: list[tuple[np.ndarray, np.ndarray]],
              block_ub_fns: list,
              k: int) -> tuple[np.ndarray, np.ndarray]:
    """Block-max WAND over decoded postings (OR semantics, top-k).

    ``postings[i] = (sorted doc_ids, tfs)``; ``ubs[i]`` term-level upper
    bound; ``weight_fns[i](tf_slice, doc_slice)`` exact contribution;
    ``blocks[i] = (block_last_doc, block_max_tf)``; ``block_ub_fns[i](bmtf)``
    block-level upper bound.  Returns the same (doc, score) top-k as
    exhaustive evaluation, with tie-break score desc → doc_id desc.
    """
    nt = len(postings)
    pos = [0] * nt
    heap: list[tuple[float, int]] = []  # (score, doc_id) min-heap of size k
    threshold = -1.0

    def exact_score(doc: int) -> float:
        s = 0.0
        for i in range(nt):
            docs, tfs = postings[i]
            j = pos[i]
            if j < len(docs) and docs[j] == doc:
                s += float(weight_fns[i](tfs[j:j + 1], docs[j:j + 1])[0])
        return s

    while True:
        live = [(postings[i][0][pos[i]], i) for i in range(nt)
                if pos[i] < len(postings[i][0])]
        if not live:
            break
        live.sort()
        acc = 0.0
        pivot_doc = None
        pivot_rank = -1
        for r, (d, i) in enumerate(live):
            acc += ubs[i]
            if acc >= threshold:
                pivot_doc = int(d)
                pivot_rank = r
                break
        if pivot_doc is None:
            break  # no document can beat the threshold
        first_doc = int(live[0][0])
        if first_doc == pivot_doc:
            # block-max check: refine the bound with block maxima at pivot.
            # Must include EVERY list currently positioned at the pivot doc
            # (not just ranks ≤ pivot_rank) — they all contribute to the
            # exact score.
            block_acc = 0.0
            for d, i in live:
                if d != pivot_doc:
                    break
                blast, bmax = blocks[i]
                bi = int(np.searchsorted(blast, pivot_doc))
                if bi < len(blast):
                    block_acc += float(block_ub_fns[i](float(bmax[bi])))
            if block_acc >= threshold:
                s = exact_score(pivot_doc)
                if len(heap) < k:
                    heapq.heappush(heap, (s, pivot_doc))
                elif (s, pivot_doc) > heap[0]:
                    heapq.heapreplace(heap, (s, pivot_doc))
                if len(heap) == k:
                    threshold = heap[0][0]
            for _d, i in live:
                docs = postings[i][0]
                if pos[i] < len(docs) and docs[pos[i]] == pivot_doc:
                    pos[i] += 1
        else:
            # advance the leading lists past pivot_doc - 1
            for d, i in live[:pivot_rank]:
                docs = postings[i][0]
                pos[i] += int(np.searchsorted(docs[pos[i]:], pivot_doc))
    if not heap:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    items = sorted(heap, key=lambda t: (t[0], t[1]), reverse=True)
    return (np.array([d for _s, d in items], np.int64),
            np.array([s for s, _d in items], np.float64))
