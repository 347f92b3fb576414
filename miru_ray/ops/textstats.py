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
from ..util import (md5_64, md5_64_bulk, read_parquet_clean,
                    sorted_lookup)


def _documents(sf_dir: str, columns=None) -> "ray.data.Dataset":
    return read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
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
        # name-based: pyarrow's key-vs-aggregate column order varies
        return pa.table({"source": g["source"], "tok": g["n_tokens_sum"],
                         "docs": g["n_tokens_count"]})

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=8192)
    out = partials.groupby("source").aggregate(
        Sum("tok", alias_name="total_tokens"),
        Sum("docs", alias_name="n_docs")).to_pandas()
    out["avg_tokens"] = (out["total_tokens"] / out["n_docs"]).round(6)
    out = out.sort_values("source").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


BPE_CHUNK = 4  # chars per subword chunk in the BPE-ish estimator


def bpe_token_estimate(sf_dir: str) -> pa.Table:
    """Per-source BPE-ish token estimate: each word costs ⌈len/4⌉ subword
    chunks, each punctuation mark costs 1 — the classic "~4 chars per
    token" estimator a training-data pipeline uses when the real
    tokenizer is too expensive to run at 100 TB.  Exactly reproducible in
    SQL (len arithmetic over the same token lists)."""
    ds = _documents(sf_dir, ["source", "text"])

    def partial(b: pa.Table) -> pa.Table:
        text = pc.fill_null(b["text"], "")  # NULL text = zero cost, not NaN
        terms, rows, _dl = explode_tokens(text)
        tl = pc.utf8_length(terms).to_numpy(zero_copy_only=False)
        chunks = -(-tl // BPE_CHUNK)  # ceil division
        n = b.num_rows
        word_cost = np.zeros(n, np.int64)
        np.add.at(word_cost, rows, chunks)
        # punctuation marks: non-alnum, non-space chars of the lowered text
        low = pc.utf8_lower(text)
        stripped = pc.replace_substring_regex(low, r"[a-z0-9\s]+", "")
        punct = pc.utf8_length(stripped).to_numpy(zero_copy_only=False)
        t = pa.table({"source": b["source"],
                      "est": pa.array((word_cost + punct).astype(np.int64))})
        g = t.group_by("source").aggregate([("est", "sum"),
                                            ("est", "count")])
        # name-based selection: the key-vs-aggregate column ORDER has
        # varied across pyarrow versions (see token_count_by_source)
        return pa.table({"source": g["source"], "est": g["est_sum"],
                         "docs": g["est_count"]})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=8192)
    out = partials.groupby("source").aggregate(
        Sum("est", alias_name="est_tokens"),
        Sum("docs", alias_name="n_docs")).to_pandas()
    out["est_tokens"] = out["est_tokens"].astype(np.int64)
    out["n_docs"] = out["n_docs"].astype(np.int64)
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
        out = pa.table({
            "lang": b["lang"],
            "n_tokens": pa.array(dl),
            "sum_tok_len": pa.array(sum_tok_len),
            "n_stop": pa.array(n_stop),
        })
        # zero-token docs have no rows in the SQL oracle's unnested
        # per_doc derivation — exclude them here too (n_docs parity)
        return out.filter(pa.array(dl > 0))

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


TOPQ_K = 3


def top_quality_per_lang(sf_dir: str, k: int = TOPQ_K) -> pa.Table:
    """Grouped top-k: the ``k`` most stopword-natural docs per language
    (the window-function ``row_number() OVER (PARTITION BY …)`` shape).

    Score is the integer-floored stopword ratio ``(n_stop·10⁶)//n_tokens``
    — exact in any engine, so ordering and tie-breaks (score desc, doc_id
    asc) are reduce-order-free.  Scale shape: each batch emits only its
    LOCAL per-lang top-k partial (languages are bounded, so partials are
    O(langs·k) per batch), the driver merges partials and re-ranks —
    never a global sort, never the corpus on the driver.  Zero-token docs
    have no defined ratio and drop out (mirrors the SQL's tokens-join).
    """
    ds = _documents(sf_dir, ["lang", "doc_id", "text"])

    def local_topk(b: pa.Table) -> pa.Table:
        terms, rows, dl = explode_tokens(b["text"])
        n = b.num_rows
        stop_arr = pa.array(sorted(EN_STOPWORDS), type=pa.string())
        is_stop = pc.is_in(terms, value_set=stop_arr) \
            .to_numpy(zero_copy_only=False)
        n_stop = np.zeros(n, np.int64)
        np.add.at(n_stop, rows, is_stop.astype(np.int64))
        df = pd.DataFrame({
            "lang": b["lang"].to_pandas(),
            "doc_id": b["doc_id"].to_numpy().astype(np.int64),
            "n_tokens": dl.astype(np.int64), "n_stop": n_stop})
        df = df[df["n_tokens"] > 0]
        df["score_e6"] = (df["n_stop"] * 1_000_000) // df["n_tokens"]
        df = df.sort_values(["lang", "score_e6", "doc_id"],
                            ascending=[True, False, True])
        return pa.Table.from_pandas(
            df.groupby("lang", sort=False).head(k)
            .drop(columns=["n_stop"]), preserve_index=False)

    parts = ds.map_batches(local_topk, batch_format="pyarrow",
                           batch_size=8192).to_pandas()
    if parts.empty:  # all-empty partials lose their column names
        return pa.table({"lang": pa.array([], pa.string()),
                         "rnk": pa.array([], pa.int64()),
                         "doc_id": pa.array([], pa.int64()),
                         "n_tokens": pa.array([], pa.int64()),
                         "score_e6": pa.array([], pa.int64())})
    parts = parts.sort_values(["lang", "score_e6", "doc_id"],
                              ascending=[True, False, True])
    top = parts.groupby("lang", sort=False).head(k).reset_index(drop=True)
    top["rnk"] = top.groupby("lang").cumcount() + 1
    top = top[["lang", "rnk", "doc_id", "n_tokens", "score_e6"]]
    for c in ("rnk", "doc_id", "n_tokens", "score_e6"):
        top[c] = top[c].astype(np.int64)
    return pa.Table.from_pandas(top, preserve_index=False)


# ------------------------- language ID -------------------------------------

_LANG_PROFILES = {
    # coarse character-trigram prior per language (deterministic heuristic)
    "en": ["the", "ing", "and", "ion", "ati"],
    "de": ["der", "sch", "ein", "ich", "und"],
    "fr": ["les", "ent", "que", "des", "ion"],
    "es": ["que", "los", "ión", "ent", "ado"],
    "zh": [],  # CJK detected by codepoint range
}


RARITY_TOPK = 20


def rarity_topk(sf_dir: str, k: int = RARITY_TOPK) -> pa.Table:
    """Corpus-statistics quality filter (the CCNet-style shape, log-free):
    scores each doc by the MEAN GLOBAL FREQUENCY of its tokens — documents
    full of corpus-rare tokens (boilerplate noise, garbled text, wrong
    language) score lowest and surface for review/filtering.

    ``rarity_score = (Σ_tok cf(tok) · 10⁶) // n_tokens`` — exact integer
    on both engines (DuckDB HUGEINT / Python int), ties broken by doc_id.

    Two passes, both streaming: [1] global token cf via per-batch
    partials + vocabulary-bounded driver merge, broadcast once (the
    decontaminate blocklist shape); [2] per-batch doc scores via
    searchsorted cf substitution, local top-k partials, k-bounded driver
    merge.  Nothing driver-side scales with the corpus."""
    ds = _documents(sf_dir, ["doc_id", "text"])

    def cf_partial(b: pa.Table) -> pa.Table:
        terms, _rows, _dl = explode_tokens(b["text"])
        if len(terms) == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "cf": pa.array([], pa.int64())})
        g = pa.table({"term": terms}).group_by("term").aggregate(
            [([], "count_all")])
        return pa.table({"term": g["term"],
                         "cf": pc.cast(g["count_all"], pa.int64())})

    cfp = ds.map_batches(cf_partial, batch_format="pyarrow",
                         batch_size=8192).to_pandas()
    if cfp.empty:  # token-free corpus: typed empty, not a KeyError
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_tokens": pa.array([], pa.int64()),
                         "rarity_score": pa.array([], pa.int64())})
    cfp = cfp.groupby("term", as_index=False)["cf"].sum()
    vocab = np.asarray(cfp["term"].to_numpy(), dtype=object)
    order = np.argsort(vocab)
    cf_ref = ray.put((vocab[order],
                      cfp["cf"].to_numpy().astype(np.int64)[order]))

    def score_partial(b: pa.Table) -> pa.Table:
        vt, vc = ray.get(cf_ref)
        terms, rows, _dl = explode_tokens(b["text"])
        ids = b["doc_id"].to_numpy().astype(np.int64)
        if len(rows) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "rarity_score": pa.array([], pa.int64())})
        tnp = np.asarray(terms.to_pandas(), dtype=object)
        hit, pos = sorted_lookup(vt, tnp)
        cf = vc[pos]  # every token IS in the vocabulary (hit always true)
        n = np.bincount(rows, minlength=len(ids)).astype(np.int64)
        sum_cf = np.zeros(len(ids), np.int64)
        np.add.at(sum_cf, rows, cf)
        keep = n > 0  # zero-token docs have no score
        # exact integer score in PYTHON ints (int64·10⁶ can exceed 2⁶³
        # at corpus scale); batch-bounded loop, then local top-k only
        score = np.array([(int(sc) * 1_000_000) // int(nn)
                          for sc, nn in zip(sum_cf[keep], n[keep])],
                         dtype=object)
        ids_k, n_k = ids[keep], n[keep]
        # EXACT local top-k: sorting the python-int scores through
        # float64 would tie distinct scores past 2^53 and keep the
        # wrong doc — sort the (score, doc_id) pairs in python
        loc = sorted(range(len(ids_k)),
                     key=lambda i: (score[i], int(ids_k[i])))[:k]
        svals = [int(score[i]) for i in loc]
        if svals and svals[-1] >= 2 ** 63:
            raise ValueError(
                "rarity_score exceeds int64 — corpus mean-cf×1e6 is "
                "past 2^63; rescale the score (divide the 1e6 factor)")
        return pa.table({
            "doc_id": pa.array([int(ids_k[i]) for i in loc], pa.int64()),
            "n_tokens": pa.array([int(n_k[i]) for i in loc], pa.int64()),
            "rarity_score": pa.array(svals, pa.int64())})

    parts = (ds.map_batches(score_partial, batch_format="pyarrow",
                            batch_size=8192)
             .to_pandas())  # ≤ k rows per batch
    if parts.empty:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_tokens": pa.array([], pa.int64()),
                         "rarity_score": pa.array([], pa.int64())})
    parts = parts.sort_values(["rarity_score", "doc_id"]).head(k)
    parts = parts.reset_index(drop=True)
    for c in parts.columns:
        parts[c] = parts[c].astype(np.int64)
    return pa.Table.from_pandas(parts, preserve_index=False)


def predict_lang(text: "pa.Array | pa.ChunkedArray") -> np.ndarray:
    """Per-doc vectorized language prediction — the ONE definition of the
    trigram-vote + CJK-override heuristic, shared by :func:`langid` and
    the composed curation pipeline so the two can never diverge.  One
    ``pc.match_substring`` pass per profile trigram (25 vectorized scans
    beats a Python row loop by ~an order of magnitude); ties break to the
    alphabetically-first language (argmax rule), mirrored in SQL by the
    CASE-branch order of :func:`_langid_sql`."""
    langs = sorted(k for k, v in _LANG_PROFILES.items() if v)
    text = pc.fill_null(text, "")  # NULL text votes for nothing
    #  (match_substring(null) yields object-dtype Nones that crash +=)
    head = pc.utf8_lower(pc.utf8_slice_codeunits(text, 0, 500))
    votes = np.zeros((len(text), len(langs)), np.int64)
    for li, lang in enumerate(langs):
        for tri in _LANG_PROFILES[lang]:
            votes[:, li] += pc.match_substring(head, tri).to_numpy(
                zero_copy_only=False)
    pred = np.array(langs, dtype=object)[votes.argmax(axis=1)]
    cjk = pc.match_substring_regex(
        pc.utf8_slice_codeunits(text, 0, 200),
        "[一-鿿]").to_numpy(zero_copy_only=False)
    pred[cjk] = "zh"
    return pred


def langid(sf_dir: str) -> pa.Table:
    """Heuristic language ID vs the ``lang`` column: per-lang accuracy.

    Per-doc prediction via :func:`predict_lang`, then per-batch count
    partials merged by one tiny groupby.  Deterministic and
    SQL-expressible (contains + CASE + the alphabetical argmax
    tie-break), so it carries an exact DuckDB oracle.  The synthetic
    corpus draws every lang from one English-ish vocabulary, so accuracy
    measures the plumbing, not linguistics.
    """
    ds = _documents(sf_dir, ["doc_id", "lang", "text"])

    def langid_partial(b: pa.Table) -> pa.Table:
        pred = predict_lang(b["text"])
        t = pa.table({"lang": b["lang"],
                      "correct": pa.array(
                          (pred == np.asarray(b["lang"].to_pandas(),
                                              dtype=object)).astype(np.int64))})
        g = t.group_by("lang").aggregate([("correct", "sum"),
                                          ("correct", "count")])
        # name-based: pyarrow key-vs-aggregate column order varies
        return pa.table({"lang": g["lang"], "n_correct": g["correct_sum"],
                         "n_docs": g["correct_count"]})

    g = (ds.map_batches(langid_partial, batch_format="pyarrow",
                        batch_size=4096)
         .to_pandas().groupby("lang", as_index=False).sum())
    g["n_docs"] = g["n_docs"].astype(np.int64)
    g["accuracy"] = (g["n_correct"] / g["n_docs"]).round(6)
    g = g[["lang", "n_docs", "accuracy"]].sort_values(
        "lang").reset_index(drop=True)
    return pa.Table.from_pandas(g, preserve_index=False)


# ------------------------- fingerprinting ----------------------------------

_FP_WINDOW = 4


BPE_MERGES = 4


def bpe_merges(sf_dir: str, n_merges: int = BPE_MERGES) -> pa.Table:
    """BPE tokenizer TRAINING (the merges table, not the estimator):
    learn ``n_merges`` byte-pair merges over the corpus vocabulary —
    per round, the adjacent-unit pair with the highest frequency-weighted
    count wins (ties: left asc, right asc) and is merged everywhere.

    Scale shape: the corpus-sized step is ONE distributed word-count
    pass (per-batch partials → vocabulary-bounded driver merge — the
    standard BPE formulation trains on the word-frequency table, so
    everything after is vocab-bounded).  Merge application is defined as
    non-overlapping left-to-right STRING replace over space-separated
    unit strings (``' l r '`` → ``' lr '``, scanning resumes after each
    replacement) — Python ``str.replace`` and DuckDB ``replace`` share
    these exact semantics, which is what makes the unrolled SQL oracle
    bit-exact.  (This can differ from canonical BPE wherever the winning
    pair occurs back-to-back — e.g. 'abab' under merge (a,b) gives
    'ab a b' here vs 'ab ab' canonically, because the first replacement
    consumes the shared separator space — so validate against THIS
    contract, not a reference tokenizer.)

    Output: (merge_rank, left, right, n_pairs)."""
    ds = _documents(sf_dir, ["text"])

    def wc_partial(b: pa.Table) -> pa.Table:
        terms, _rows, _dl = explode_tokens(b["text"])
        w = np.asarray(terms.to_pandas(), dtype=object)
        u, c = np.unique(w, return_counts=True)
        return pa.table({"word": pa.array(u, pa.string()),
                         "f": pa.array(c.astype(np.int64))})

    wdf = (ds.map_batches(wc_partial, batch_format="pyarrow",
                          batch_size=8192).to_pandas())
    if wdf.empty:
        return pa.table({"merge_rank": pa.array([], pa.int64()),
                         "lhs": pa.array([], pa.string()),
                         "rhs": pa.array([], pa.string()),
                         "n_pairs": pa.array([], pa.int64())})
    wdf = wdf.groupby("word", as_index=False)["f"].sum()
    freq = wdf["f"].to_numpy().astype(np.int64)
    # unit strings: characters joined by spaces (vocabulary-bounded)
    units = pd.Series([" ".join(w) for w in wdf["word"]])
    out = []
    for rank in range(1, n_merges + 1):
        # frequency-weighted adjacent-pair counts, vectorized: explode
        # the unit lists and pair consecutive rows sharing a word index
        ex = units.str.split(" ").explode()
        uv = ex.to_numpy()
        widx = ex.index.to_numpy()
        same = widx[1:] == widx[:-1]
        if not same.any():
            break
        pdfr = pd.DataFrame({"l": uv[:-1][same], "r": uv[1:][same],
                             "f": freq[widx[:-1][same]]})
        agg = (pdfr.groupby(["l", "r"], as_index=False)["f"].sum()
               .sort_values(["f", "l", "r"],
                            ascending=[False, True, True]))
        best = agg.iloc[0]
        l, r, n = str(best["l"]), str(best["r"]), int(best["f"])
        out.append((rank, l, r, n))
        units = (" " + units + " ").str.replace(
            f" {l} {r} ", f" {l}{r} ", regex=False).str.strip()
    return pa.table({
        "merge_rank": pa.array([o[0] for o in out], pa.int64()),
        "lhs": pa.array([o[1] for o in out], pa.string()),
        "rhs": pa.array([o[2] for o in out], pa.string()),
        "n_pairs": pa.array([o[3] for o in out], pa.int64())})


def _bpe_merges_sql(n: int = BPE_MERGES) -> str:
    rounds, sel = [], []
    prev = "u0"
    for i in range(1, n + 1):
        rounds.append(f"""
p{i} AS (
  SELECT pr.l AS l, pr.r AS r, sum(f) AS n FROM (
    SELECT f, unnest(list_transform(
        generate_series(1, len(string_split(s, ' ')) - 1),
        i -> struct_pack(l := string_split(s, ' ')[i],
                         r := string_split(s, ' ')[i + 1]))) AS pr
    FROM {prev}) GROUP BY pr.l, pr.r),
b{i} AS (SELECT l, r, n FROM p{i} ORDER BY n DESC, l ASC, r ASC LIMIT 1),
u{i} AS (
  SELECT word, f,
         trim(replace(' ' || s || ' ',
                      (SELECT ' ' || l || ' ' || r || ' ' FROM b{i}),
                      (SELECT ' ' || l || r || ' ' FROM b{i}))) AS s
  FROM {prev})""".strip())
        sel.append(f"SELECT {i}::BIGINT AS merge_rank, l AS lhs, "
                   f"r AS rhs, n::BIGINT AS n_pairs FROM b{i}")
        prev = f"u{i}"
    chain = ",\n".join(rounds)
    union = "\nUNION ALL\n".join(sel)
    return f"""
WITH w AS (
  SELECT term AS word, count(*)::BIGINT AS f FROM (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
    FROM documents) GROUP BY 1),
u0 AS (SELECT word, f,
              array_to_string(regexp_extract_all(word, '.'), ' ') AS s
       FROM w),
{chain}
SELECT * FROM ({union}) ORDER BY merge_rank
""".strip()


def _winnow(tokens: list[str], w: int = _FP_WINDOW) -> list[int]:
    """Single-doc reference implementation (tests): winnowing fingerprints =
    distinct min-hashes over sliding windows of token 3-gram hashes
    (Schleimer et al., SIGMOD 2003).  Gram hash = md5_64 so a DuckDB oracle
    reproduces values exactly."""
    grams = [" ".join(tokens[i:i + 3])
             for i in range(max(0, len(tokens) - 2))]
    if not grams:
        return []
    hs = md5_64(np.array(grams, dtype=object))
    if len(hs) <= w:
        return [int(hs.min())]
    import numpy.lib.stride_tricks as st
    wins = st.sliding_window_view(hs, w).min(axis=1)
    return sorted(set(wins.tolist()))


def _fp_batch(b: pa.Table) -> pa.Table:
    """Vectorized winnowing over a batch: tokens via explode_tokens, grams
    by shifted elementwise joins, gram hashes via md5 bulk (distinct grams
    hashed once), window minima via one global sliding_window_view with
    per-doc validity masks, distinct+XOR per doc via sort + reduceat —
    no per-row Python loop."""
    import numpy.lib.stride_tricks as st
    ids = b["doc_id"].to_numpy()
    n = b.num_rows
    terms, rows, _dl = explode_tokens(b["text"])
    t_np = np.asarray(terms.to_pandas(), dtype=object)
    n_fp = np.zeros(n, np.int64)
    fp_xor = np.zeros(n, np.uint64)
    if len(t_np) >= 3:
        same = rows[:-2] == rows[2:]
        grams = (t_np[:-2][same] + " " + t_np[1:-1][same] + " "
                 + t_np[2:][same])
        gdoc = rows[:-2][same]
        if len(grams):
            hs = md5_64_bulk(grams)
            gcnt = np.bincount(gdoc, minlength=n).astype(np.int64)
            gstart = np.zeros(n, np.int64)
            np.cumsum(gcnt[:-1], out=gstart[1:])
            # window minima: global sliding windows, valid iff fully inside
            # one doc with > _FP_WINDOW grams; docs with 1.._FP_WINDOW grams
            # contribute their full-range min (reduceat)
            parts_docs, parts_vals = [], []
            big = gcnt > _FP_WINDOW
            if big.any() and len(hs) >= _FP_WINDOW:
                wins = st.sliding_window_view(hs, _FP_WINDOW).min(axis=1)
                wdoc = gdoc[: len(wins)]
                wpos = np.arange(len(wins))
                ok = (wdoc == gdoc[np.minimum(wpos + _FP_WINDOW - 1,
                                              len(gdoc) - 1)]) \
                    & big[wdoc]
                parts_docs.append(wdoc[ok])
                parts_vals.append(wins[ok])
            small = (gcnt > 0) & ~big
            if small.any():
                nz = np.flatnonzero(gcnt > 0)
                full_min = np.minimum.reduceat(hs, gstart[nz])
                sm = small[nz]
                parts_docs.append(nz[sm])
                parts_vals.append(full_min[sm])
            if parts_docs:
                wd = np.concatenate(parts_docs)
                wv = np.concatenate(parts_vals)
                order = np.lexsort((wv, wd))
                wd, wv = wd[order], wv[order]
                keep = np.ones(len(wd), bool)
                keep[1:] = (wd[1:] != wd[:-1]) | (wv[1:] != wv[:-1])
                wd, wv = wd[keep], wv[keep]
                starts_u = np.flatnonzero(
                    np.r_[True, wd[1:] != wd[:-1]]) if len(wd) else []
                if len(wd):
                    xors = np.bitwise_xor.reduceat(wv, starts_u)
                    cnts = np.diff(np.r_[starts_u, len(wd)])
                    n_fp[wd[starts_u]] = cnts
                    fp_xor[wd[starts_u]] = xors
    # low 32 bits of the XOR: full uint64 leaves the SQL side as a lossy
    # float64 via pandas NULL-handling; 32 bits are exact in BIGINT
    return pa.table({"doc_id": pa.array(ids),
                     "n_fingerprints": pa.array(n_fp),
                     "fp_xor": pa.array((fp_xor
                                         & np.uint64(0xFFFFFFFF)).astype(np.int64))})


def fingerprints(sf_dir: str) -> pa.Table:
    """Per-doc winnowing fingerprint count + XOR of the distinct
    fingerprint set (stable document identity for near-dup grouping;
    XOR instead of a digest so the DuckDB oracle can reproduce it
    UDF-free via md5_number_lower + bit_xor)."""
    ds = _documents(sf_dir, ["doc_id", "text"])
    out = ds.map_batches(_fp_batch, batch_format="pyarrow", batch_size=4096)
    pdf = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(pdf, preserve_index=False)


# ----------------------- benchmark decontamination -------------------------

#: docs with doc_id % MOD == 0 form the deterministic stand-in for an eval
#: benchmark (no external data allowed); everything else is "training"
DECON_BENCH_MOD = 29
_DECON_N = 3  # word-shingle width, shared with the dedup family's oracles


def decontaminate(sf_dir: str) -> pa.Table:
    """Benchmark decontamination: training docs that share any word
    {n}-gram with the benchmark set, with their overlap counts — the
    flag-and-drop input of a curation pass (public precedent: the n-gram
    overlap decontamination of GPT-3 appendix C and the Llama reports).

    Scale shape: the benchmark side is SMALL (an eval suite), so its
    distinct shingle hashes are gathered in one filtered streaming pass
    and broadcast once (``ray.put``); the training side is one
    shuffle-free ``map_batches`` pass — membership is a ``searchsorted``
    against the sorted broadcast, never a join.  Output is bounded by the
    contaminated set."""
    from .dedup import _make_shingle_rows
    shingle_rows = _make_shingle_rows(_DECON_N)
    docs = _documents(sf_dir, ["doc_id", "text"])

    def bench_hashes(b: pa.Table) -> pa.Table:
        doc = b["doc_id"].to_numpy()
        sub = b.filter(pa.array(doc % DECON_BENCH_MOD == 0))
        if sub.num_rows == 0:
            return pa.table({"h": pa.array([], pa.uint64())})
        rows = shingle_rows(sub)
        h = md5_64_bulk(np.asarray(rows["shingle"].to_pandas(), dtype=object))
        return pa.table({"h": pa.array(np.unique(h))})

    bh = docs.map_batches(bench_hashes, batch_format="pyarrow",
                          batch_size=4096).to_pandas()  # benchmark-bounded
    # an all-empty benchmark stream loses its column names via to_pandas
    bench = (np.array([], np.uint64) if bh.empty
             else np.unique(bh["h"].to_numpy().astype(np.uint64)))
    bench_ref = ray.put(bench)

    def overlap(b: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        doc = b["doc_id"].to_numpy()
        sub = b.filter(pa.array(doc % DECON_BENCH_MOD != 0))
        if sub.num_rows == 0 or not len(bench):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_overlap": pa.array([], pa.int64())})
        rows = shingle_rows(sub)  # per-doc DISTINCT shingles
        h = md5_64_bulk(np.asarray(rows["shingle"].to_pandas(), dtype=object))
        hit, _pos = sorted_lookup(bench, h)
        d = rows["doc_id"].to_numpy()[hit]
        ids, cnt = np.unique(d, return_counts=True)
        return pa.table({"doc_id": pa.array(ids.astype(np.int64)),
                         "n_overlap": pa.array(cnt.astype(np.int64))})

    out = docs.map_batches(overlap, batch_format="pyarrow",
                           batch_size=4096).to_pandas()
    if out.empty:  # no contamination: typed empty, not a KeyError
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_overlap": pa.array([], pa.int64())})
    out = out.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


# ----------------------- repetition quality signals ------------------------


def repetition_stats(sf_dir: str) -> pa.Table:
    """Per-doc repetition signals (the Gopher/C4-style quality rules:
    most-common-word fraction and duplicated-n-gram fraction, Rae et al.
    2021 §A1.1 — public literature): token count, distinct tokens, the
    top token's count and the top 2-gram's count, all exact ints (the
    fractions are derivable ratios; ints keep the oracle hash exact).

    Purely batch-local (per-doc stats never cross batches): one
    vectorized ``map_batches``, no shuffle at all."""
    ds = _documents(sf_dir, ["doc_id", "text"])

    def partial(b: pa.Table) -> pa.Table:
        doc = b["doc_id"].to_numpy().astype(np.int64)
        n = b.num_rows
        terms, rows, dl = explode_tokens(b["text"])
        enc = pc.dictionary_encode(terms.combine_chunks()
                                   if isinstance(terms, pa.ChunkedArray)
                                   else terms)
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        V = np.int64(len(enc.dictionary)) + 1
        n_distinct = np.zeros(n, np.int64)
        max_tok = np.zeros(n, np.int64)
        if len(code):
            key = rows * V + code
            uk, cnt = np.unique(key, return_counts=True)
            krow = uk // V
            np.add.at(n_distinct, krow, 1)
            np.maximum.at(max_tok, krow, cnt)
        max_bg = np.zeros(n, np.int64)
        same = rows[1:] == rows[:-1]
        if same.any():
            l, r, br = code[:-1][same], code[1:][same], rows[1:][same]
            # two-stage key: first factorize the bigram (l, r) — l*V+r
            # needs V^2 < 2^63, i.e. V < 3e9, unreachable for one batch —
            # then pair the compact bigram id with the row, which needs
            # only rows × distinct-bigrams < 2^63.  The naive triple
            # product rows*V^2 overflows silently at V ≈ 3.4e7, a value a
            # batch of long documents CAN reach.
            if int(V) * int(V) >= 2 ** 63:
                raise OverflowError("repetition_stats: batch vocabulary "
                                    "too large for int64 bigram keys — "
                                    "reduce batch_size")
            _, bg_id = np.unique(l * V + r, return_inverse=True)
            W = np.int64(bg_id.max()) + 1
            assert int(n) * int(W) < 2 ** 63  # rows × bigram ids
            ub, cb = np.unique(br * W + bg_id, return_counts=True)
            np.maximum.at(max_bg, ub // W, cb)
        return pa.table({"doc_id": pa.array(doc),
                         "n_tokens": pa.array(dl),
                         "n_distinct": pa.array(n_distinct),
                         "max_token_count": pa.array(max_tok),
                         "max_2gram_count": pa.array(max_bg)})

    out = (ds.map_batches(partial, batch_format="pyarrow", batch_size=8192)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    return pa.Table.from_pandas(out, preserve_index=False)


_REPETITION_SQL = """
WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
  FROM documents),
u AS (SELECT doc_id, unnest(t) AS term FROM tok),
tc AS (SELECT doc_id, term, count(*) AS c FROM u GROUP BY 1, 2),
per AS (SELECT doc_id, sum(c) AS n_tokens, count(*) AS n_distinct,
               max(c) AS max_tok FROM tc GROUP BY 1),
bg AS (SELECT tok.doc_id, t[i] || ' ' || t[i + 1] AS g
       FROM tok, unnest(range(1, len(t))) AS r(i)),
bc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
bper AS (SELECT doc_id, max(c) AS max_bg FROM bc GROUP BY 1)
SELECT d.doc_id,
       coalesce(per.n_tokens, 0)::BIGINT AS n_tokens,
       coalesce(per.n_distinct, 0)::BIGINT AS n_distinct,
       coalesce(per.max_tok, 0)::BIGINT AS max_token_count,
       coalesce(bper.max_bg, 0)::BIGINT AS max_2gram_count
FROM documents d
LEFT JOIN per ON d.doc_id = per.doc_id
LEFT JOIN bper ON d.doc_id = bper.doc_id
ORDER BY d.doc_id
""".strip()


# --------------------------- PII / pattern scrub ---------------------------

#: (name, RE2 pattern) — both pyarrow.compute and DuckDB regexp_* are RE2,
#: so match counts and global replacement are EXACTLY mirrored in SQL (no
#: backrefs / lookaround, which RE2 lacks, may appear here)
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
)
#: replacement token — must itself match none of the patterns above
PII_REDACTION = "[PII]"
#: a content pattern that DOES fire on ordinary prose, so the oracle
#: comparison exercises nonzero counts even on a PII-free corpus
_VOWEL_PAIR = "[aeiou]{2}"


def pii_scan(sf_dir: str) -> pa.Table:
    """Per-source PII scan + scrub verification (training-data content
    filter): counts of each PII pattern, docs flagged (any PII hit),
    double-vowel occurrences (nonzero control), and the residual PII
    count AFTER globally scrubbing every pattern in order — proving the
    redaction transform, not just the scan.  All-int output; one
    vectorized RE2 pass per pattern inside ``map_batches`` and a tiny
    per-source groupby."""
    ds = _documents(sf_dir, ["source", "text"])

    def partial(b: pa.Table) -> pa.Table:
        # NULL text has zero PII (count_substring_regex(null) would be a
        # NaN that .astype(int64) turns into INT64_MIN in the sums)
        txt = pc.fill_null(b["text"], "")
        cols = {"source": b["source"]}
        flagged = np.zeros(b.num_rows, bool)
        for name, pat in PII_PATTERNS:
            c = pc.count_substring_regex(txt, pattern=pat).to_numpy(
                zero_copy_only=False).astype(np.int64)
            cols[f"n_{name}"] = pa.array(c)
            flagged |= c > 0
        scrub = txt
        for _, pat in PII_PATTERNS:
            scrub = pc.replace_substring_regex(scrub, pattern=pat,
                                               replacement=PII_REDACTION)
        resid = np.zeros(b.num_rows, np.int64)
        for _, pat in PII_PATTERNS:
            resid += pc.count_substring_regex(scrub, pattern=pat).to_numpy(
                zero_copy_only=False).astype(np.int64)
        cols["n_vowel_pairs"] = pa.array(
            pc.count_substring_regex(txt, pattern=_VOWEL_PAIR).to_numpy(
                zero_copy_only=False).astype(np.int64))
        cols["n_docs_flagged"] = pa.array(flagged.astype(np.int64))
        cols["n_residual_after_scrub"] = pa.array(resid)
        cols["n_docs"] = pa.array(np.ones(b.num_rows, np.int64))
        aggs = [(c, "sum") for c in cols if c != "source"]
        g = pa.table(cols).group_by("source").aggregate(aggs)
        # name-based: pyarrow key-vs-aggregate column order varies
        return pa.table({"source": g["source"],
                         **{c: g[f"{c}_sum"] for c in cols
                            if c != "source"}})

    names = ([f"n_{n}" for n, _ in PII_PATTERNS]
             + ["n_vowel_pairs", "n_docs_flagged",
                "n_residual_after_scrub", "n_docs"])
    out = (ds.map_batches(partial, batch_format="pyarrow", batch_size=8192)
           .groupby("source")
           .aggregate(*[Sum(c, alias_name=c) for c in names])
           .to_pandas())
    out = out.sort_values("source").reset_index(drop=True)
    for c in names:
        out[c] = out[c].astype(np.int64)
    return pa.Table.from_pandas(out[["source"] + names],
                                preserve_index=False)


def _pii_scan_sql() -> str:
    pats = dict(PII_PATTERNS)
    scrubbed = "text"
    for _, pat in PII_PATTERNS:
        # replacement strings are LITERAL in both engines (RE2 specials
        # are only \1..\9 and \\), so no escaping of '['
        scrubbed = (f"regexp_replace({scrubbed}, '{pat}', "
                    f"'{PII_REDACTION}', 'g')")
    count = lambda expr, pat: f"length(regexp_extract_all({expr}, '{pat}'))"
    resid = " + ".join(count("s.scrubbed", p) for p in pats.values())
    flag = " OR ".join(f"regexp_matches(text, '{p}')" for p in pats.values())
    cols = ",\n       ".join(
        f"sum({count('text', p)})::BIGINT AS n_{n}" for n, p in PII_PATTERNS)
    return f"""
WITH s AS (SELECT source, text, {scrubbed} AS scrubbed FROM documents)
SELECT source,
       {cols},
       sum({count('text', _VOWEL_PAIR)})::BIGINT AS n_vowel_pairs,
       sum(CASE WHEN {flag} THEN 1 ELSE 0 END)::BIGINT AS n_docs_flagged,
       sum({resid})::BIGINT AS n_residual_after_scrub,
       count(*)::BIGINT AS n_docs
FROM s GROUP BY source ORDER BY source
""".strip()


# --------------------------- SQL oracles -----------------------------------

_STOPLIST = ", ".join(f"'{w}'" for w in sorted(EN_STOPWORDS))

SQL = {
    "text_bpe_token_estimate": """
WITH d AS (
  SELECT source,
         COALESCE(list_sum(list_transform(
                      regexp_extract_all(lower(text), '[a-z0-9]+'),
                      x -> (len(x) + 3) // 4)), 0)
         + len(regexp_replace(lower(text), '[a-z0-9\\s]+', '', 'g')) AS est
  FROM documents)
SELECT source, COALESCE(sum(est), 0)::BIGINT AS est_tokens,
       count(*)::BIGINT AS n_docs
FROM d GROUP BY source ORDER BY source
""".strip(),
    "text_rarity_topk": f"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents),
cf AS (SELECT term, count(*) AS cf FROM toks GROUP BY term),
per_doc AS (
  SELECT t.doc_id, count(*) AS n_tokens, sum(c.cf) AS sum_cf
  FROM toks t JOIN cf c USING (term) GROUP BY t.doc_id)
SELECT doc_id, n_tokens::BIGINT AS n_tokens,
       (sum_cf * 1000000 // n_tokens)::BIGINT AS rarity_score
FROM per_doc ORDER BY rarity_score ASC, doc_id ASC LIMIT {RARITY_TOPK}
""".strip(),
    "text_token_count_by_source": """
WITH d AS (
  SELECT source, len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n
  FROM documents)
SELECT source, sum(n)::BIGINT AS total_tokens, count(*)::BIGINT AS n_docs,
       round_even(sum(n) * 1.0 / count(*), 6) AS avg_tokens
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
       round_even(sum(n_tokens) * 1.0 / count(*), 6) AS avg_tokens,
       round_even(sum(sum_tok_len) * 1.0 / sum(n_tokens), 6) AS avg_token_len,
       round_even(sum(n_stop) * 1.0 / sum(n_tokens), 6) AS stopword_ratio
FROM per_doc GROUP BY lang ORDER BY lang
""".strip(),
    "text_top_quality_per_lang": f"""
WITH toks AS (
  SELECT lang, doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents),
per_doc AS (
  SELECT lang, doc_id, count(*) AS n_tokens,
         sum(CASE WHEN term IN ({_STOPLIST}) THEN 1 ELSE 0 END) AS n_stop
  FROM toks GROUP BY 1, 2),
r AS (
  SELECT lang, doc_id, n_tokens,
         (n_stop * 1000000) // n_tokens AS score_e6,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY (n_stop * 1000000) // n_tokens DESC, doc_id) AS rnk
  FROM per_doc)
SELECT lang, rnk::BIGINT AS rnk, doc_id,
       n_tokens::BIGINT AS n_tokens, score_e6::BIGINT AS score_e6
FROM r WHERE rnk <= {TOPQ_K} ORDER BY lang, rnk
""".strip(),
    # winnowing fingerprints reproduced UDF-free: md5_number_lower == the
    # engine's md5_64 gram hash; window minima via least() over list
    # positions; distinct + XOR via unnest + bit_xor
    "text_fingerprints": f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
  FROM documents),
grams AS (
  SELECT doc_id,
         CASE WHEN len(t) < 3 THEN []::VARCHAR[]
              ELSE list_transform(generate_series(1, len(t)-2),
                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
         END AS g
  FROM toks),
hs AS (
  SELECT doc_id, list_transform(g, x -> md5_number_lower(x)) AS h
  FROM grams),
wins AS (
  SELECT doc_id,
         CASE WHEN len(h) = 0 THEN []::UBIGINT[]
              WHEN len(h) <= {_FP_WINDOW} THEN [list_aggregate(h, 'min')]
              ELSE list_transform(generate_series(1, len(h)-{_FP_WINDOW - 1}),
                     i -> least({", ".join(f"h[i+{j}]" if j else "h[i]"
                                           for j in range(_FP_WINDOW))}))
         END AS w
  FROM hs),
fp AS (
  SELECT doc_id, count(*)::BIGINT AS n_fingerprints, bit_xor(wv) AS fp_xor
  FROM (SELECT doc_id, unnest(list_distinct(w)) AS wv FROM wins)
  GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(fp.n_fingerprints, 0)::BIGINT AS n_fingerprints,
       CAST(COALESCE(fp.fp_xor, 0::UBIGINT) & 4294967295 AS BIGINT) AS fp_xor
FROM documents d LEFT JOIN fp USING (doc_id)
ORDER BY d.doc_id
""".strip(),
}


def _langid_pred_fragments() -> tuple[str, str, list[str]]:
    """The SQL fragments of :func:`predict_lang` — per-lang vote columns
    (over a ``head`` expression) and the argmax CASE branches — shared by
    :func:`_langid_sql` and the composed curation oracle so the SQL
    reproduction of the heuristic exists exactly once."""
    langs = sorted(k for k, v in _LANG_PROFILES.items() if v)
    votes = ",\n         ".join(
        "(" + " + ".join(
            f"CASE WHEN contains(head, '{t}') THEN 1 ELSE 0 END"
            for t in _LANG_PROFILES[lang]) + f") AS v_{lang}"
        for lang in langs)
    branches = "\n    ".join(
        "WHEN " + " AND ".join(f"v_{lang} >= v_{o}"
                               for o in langs if o != lang)
        + f" THEN '{lang}'"
        for lang in langs[:-1])
    return votes, branches, langs


def _langid_sql() -> str:
    """Exact SQL reproduction of :func:`langid` — the trigram vote, the
    first-index argmax tie-break (CASE order = alphabetical lang order),
    and the CJK codepoint override are all deterministic."""
    votes, branches, langs = _langid_pred_fragments()
    return f"""
WITH feat AS (
  SELECT lang,
         lower(substr(text, 1, 500)) AS head,
         regexp_matches(substr(text, 1, 200), '[一-鿿]') AS cjk
  FROM documents),
votes AS (
  SELECT lang, cjk,
         {votes}
  FROM feat),
pred AS (
  SELECT lang,
         CASE WHEN cjk THEN 'zh'
    {branches}
    ELSE '{langs[-1]}' END AS p
  FROM votes)
SELECT lang, count(*)::BIGINT AS n_docs,
       round_even(sum(CASE WHEN p = lang THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
         AS accuracy
FROM pred GROUP BY lang ORDER BY lang
""".strip()


# engine-identical shingles (same tokenizer regex + short-doc rule as the
# dedup family); benchmark = doc_id % 29 == 0, training = the rest; a
# training doc's overlap count = |distinct shingles ∩ benchmark shingles|.
# The join is over md5_number_lower(gram) — the SAME 64-bit hash the
# engine compares — so parity holds bit-for-bit even under hash collision
SQL["text_decontaminate"] = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
  FROM documents
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(t) = 0 THEN []::VARCHAR[]
              WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
              ELSE list_distinct(list_transform(generate_series(1, len(t)-2),
                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
         END AS s
  FROM toks
),
bench AS (SELECT DISTINCT md5_number_lower(unnest(s)) AS g FROM sh
          WHERE doc_id % {DECON_BENCH_MOD} = 0),
tr AS (SELECT doc_id, md5_number_lower(unnest(s)) AS g FROM sh
       WHERE doc_id % {DECON_BENCH_MOD} <> 0)
SELECT tr.doc_id, count(*)::BIGINT AS n_overlap
FROM tr JOIN bench ON tr.g = bench.g
GROUP BY tr.doc_id
ORDER BY tr.doc_id
""".strip()

SQL["text_langid"] = _langid_sql()
SQL["text_bpe_merges"] = _bpe_merges_sql()

SQL["text_pii_scan"] = _pii_scan_sql()
SQL["text_repetition_stats"] = _REPETITION_SQL
