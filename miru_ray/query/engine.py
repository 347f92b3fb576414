"""Query engine: partition-reader actor pool + driver top-k merge.

Architecture (SURVEY.md §3.3 re-architecture): the reference solves a query
by scatter-gather over per-tenant partitions hosted on reader nodes
(``MiruService.askAndMerge``, ``MiruService.java:101-194``; per-partition
``Question.askLocal`` under a query handle).  Here each partition is a
contiguous doc_id range whose segments + doclen/ts arrays are owned by a
``PartitionReader``; readers are Ray actors created once and queried many
times (state loaded in ``__init__`` — the actor-pool rule), and the driver
merges per-partition top-k heaps with the reference's tie-break.

Rank identity across partitioning: scoring uses GLOBAL stats gathered in a
first fan-out round (df/cf summed over partitions; N/avgdl from the
manifest), so scores do not depend on the partition count — verified by the
partition-invariance test (FIXTURES.md §F4 inv. 5).

Query strategies (``FullTextQuery.Strategy``, ``FullTextQuery.java:15-17``):
``bm25`` / ``ref-tfidf`` score-and-rank; ``time`` returns newest-first
matches (ts desc, doc_id desc — our doc ids are conversation-ordered, not
time-ordered, so TIME sorts on the ts column with doc_id tiebreak; see
SURVEY.md §7.3).
"""

from __future__ import annotations

import os
import re
import time
from collections import defaultdict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

import ray

from ..codec import BLOCK_SIZE
from ..config import IndexConfig
from ..tokenize import EN_STOPWORDS, py_tokenize
from ..util import atomic_write_json, read_json, term_shard
from ..index.build import doclen_rel_path
from ..index.segments import (SegmentReader, bloom_may_contain,
                              read_segment_bloom)
from . import scorer as S
from .composer import PART_SEP
from .filter import (And, Authz, Boost, Filter, Fuzzy, MatchNone, MinShould,
                     Node, Not,
                     NumericRange, Or, Phrase, Prefix, Regexp, Term,
                     TimeRange, Wildcard, and_terms, collect_boosts,
                     collect_expansion_boosts, collect_fuzzies,
                     collect_prefixes, collect_ranges, collect_regexps,
                     collect_scoring_expansions, collect_scoring_terms,
                     collect_wildcards)
from .parser import parse_query


_MISS = object()  # cache-miss sentinel (None is a legitimate cached value)


def _ordered_near(pos_lists: list, slop: int) -> bool:
    """True iff an in-order chain p1 < p2 < … < pk exists with
    span − (k−1) ≤ slop (the sloppy-phrase window; no reordering).
    Greedy earliest-next per start is exact: picking the smallest legal
    next position minimizes the chain's end for that start, hence its
    span."""
    k = len(pos_lists)
    for p1 in pos_lists[0]:
        prev, ok = int(p1), True
        for pl in pos_lists[1:]:
            j = int(np.searchsorted(pl, prev + 1))
            if j == len(pl):
                ok = False
                break
            prev = int(pl[j])
        if ok and prev - int(p1) - (k - 1) <= slop:
            return True
    return False


_REGEX_META = set(".^$*+?()[]{}|\\")


def _regex_literal_prefix(pat: str) -> str:
    """Longest literal prefix of a regex usable as a term-dict scan
    bound: plain characters up to the first metacharacter, stopping
    short of a character a following quantifier could repeat away.
    An alternation ANYWHERE voids the bound — a top-level `a|b` match
    need not start with the left arm's literals, and telling top-level
    from grouped apart is not worth the parse."""
    if "|" in pat:
        return ""
    out = []
    for i, ch in enumerate(pat):
        if ch in _REGEX_META:
            break
        if i + 1 < len(pat) and pat[i + 1] in "*+?{":
            break
        out.append(ch)
    return "".join(out)


def _lev_leq_mask(cands: np.ndarray, query: str, max_d: int) -> np.ndarray:
    """Boolean mask of candidate strings within ``max_d`` Levenshtein
    distance of ``query`` (identical terms INCLUDED — Lucene's fuzzy
    matches the exact term too).  Length-prefilters to |len−m| ≤ max_d,
    then runs the classic DP vectorized ACROSS candidates: the loops are
    over query length × max candidate width (≈ word-length²) with every
    cell operation an O(n_candidates) NumPy vector op."""
    # CODE POINTS, not bytes: the conformance oracle is DuckDB's
    # character-based levenshtein(), and byte-DP over UTF-8 over-counts
    # non-ASCII edits ('café' vs 'cafe' is 1 char edit, 2 byte edits)
    q = np.frombuffer(str(query).encode("utf-32-le"), np.uint32)
    m = len(q)
    # vectorized length prefilter BEFORE any per-string Python work
    lens = pc.utf8_length(pa.array(cands, pa.string())).to_numpy(
        zero_copy_only=False).astype(np.int64)
    pre = np.abs(lens - m) <= max_d
    sel = np.flatnonzero(pre)
    if not len(sel):
        return np.zeros(len(cands), bool)
    W = int(lens[sel].max())
    n = len(sel)
    M = np.zeros((n, W), np.uint32)
    for i, j in enumerate(sel):          # survivor-bounded fill
        b = str(cands[j]).encode("utf-32-le")
        M[i, :len(b) // 4] = np.frombuffer(b, np.uint32)
    prev = np.tile(np.arange(W + 1, dtype=np.int32), (n, 1))
    for i in range(1, m + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        sub = (M != q[i - 1]).astype(np.int32)
        for j in range(1, W + 1):
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + sub[:, j - 1])
        prev = cur
    d = prev[np.arange(n), lens[sel]]
    out = np.zeros(len(cands), bool)
    out[sel[d <= max_d]] = True
    return out


class PartitionReader:
    """Holds the open state for a set of partitions (one actor = many
    partitions).  State loaded once: doclen + ts arrays per partition,
    segment term dictionaries on demand (cached) — the analogue of the
    reference's hosted partition with open LAB handles
    (``miru-service/.../partition/MiruLocalHostedPartition.java``)."""

    def __init__(self, index_dir: str, pids: list[int],
                 preload_segments: bool = False):
        self.index_dir = index_dir
        if os.path.exists(os.path.join(index_dir, "pending_repair.json")):
            # a mid-repair docstore can hold duplicated partition rows;
            # refuse to serve rather than double-count (replay first:
            # miru_ray.index.repair.recover_pending_repair)
            raise RuntimeError(
                f"index {index_dir} has an interrupted REPAIR pending; "
                "run recover_pending_repair() before opening readers")
        manifest = read_json(os.path.join(index_dir, "manifest.json"))
        self.cfg = IndexConfig.from_dict(manifest["config"])
        self.n_docs = manifest["n_docs"]
        # 1.0 fallback for a token-less corpus (keyword/numeric-only
        # fields): dl/avgdl would otherwise turn every BM25 score NaN
        self.avgdl = manifest["avgdl"] if manifest["avgdl"] > 0 else 1.0
        parts = {p["pid"]: p for p in manifest["partitions"]}
        self.parts = {pid: parts[pid] for pid in pids}
        self._seg_cache: dict[tuple[int, int], SegmentReader | None] = {}
        self._bloom_cache: dict[tuple[int, int], tuple | None] = {}
        # decoded-postings LRU: hot query terms repeat, decode once
        # (reference: plugin term-feature cache, MiruPluginCacheProvider)
        self._post_cache: "dict[tuple[int, str], tuple | None]" = {}
        self._post_cache_cap = 4096
        # tombstones: removal mask subtracted from every filter result
        # (reference: MiruRemovalIndex / buildIndexMask,
        # MiruBitmaps.java:133-139)
        self._tombstones: dict[int, np.ndarray] = {}
        tpath = os.path.join(index_dir, "tombstones.json")
        if os.path.exists(tpath):
            self.load_tombstones(read_json(tpath))
        self.doclen: dict[int, np.ndarray] = {}
        self.ts: dict[int, np.ndarray] = {}
        self._dl_norm: dict[int, np.ndarray] = {}
        self._ts_range: dict[int, tuple] = {}
        for pid in pids:
            self._load_partition(pid)
        self._preload = preload_segments
        if preload_segments:  # warm term dictionaries at init (actor-pool
            for pid in pids:  # rule: do one-time work once, not per query)
                for shard in range(self.cfg.num_shards):
                    self._segment(pid, shard)

    def _load_partition(self, pid: int) -> None:
        """(Re)load one partition's docstore-derived arrays: ts, doc
        lengths, BM25 length norm, ts zone map."""
        base, count = self.parts[pid]["base"], self.parts[pid]["count"]
        t = self._docstore_read(pid, columns=["doc_id", "ts"])
        tsa = np.zeros(count, np.int64)
        idx = t["doc_id"].to_numpy() - base
        # bound by the MANIFEST's partition extent: an in-flight (or
        # crashed) append may have published newer docstore rows into
        # the boundary partition before its manifest commit — the
        # committed index must keep answering from its own doc range
        ok = (idx >= 0) & (idx < count)
        tsa[idx[ok]] = t["ts"].cast(pa.int64()).to_numpy()[ok]
        self.ts[pid] = tsa
        # doc lengths: sum of the per-(pid, shard) doclen sidecars the
        # encode stage emitted (docs with zero text tokens stay 0)
        dl = np.zeros(count, np.int64)
        for shard in range(self.cfg.num_shards):
            p = os.path.join(self.index_dir, doclen_rel_path(pid, shard))
            if os.path.exists(p):
                import pyarrow.parquet as pq
                part = pq.read_table(p)
                didx = part["doc_id"].to_numpy() - base
                dok = (didx >= 0) & (didx < count)
                dl[didx[dok]] += part["dl"].to_numpy()[dok]
        self.doclen[pid] = dl
        # query-independent BM25 doc-length factor (saves three
        # elementwise ops per posting per query; bit-identical to
        # computing it inline — see bm25_tf_weight_pre)
        self._dl_norm[pid] = (1.0 - self.cfg.b
                              + self.cfg.b * dl.astype(np.float64)
                              / self.avgdl)
        # zone maps: per-partition ts min/max for time-range pruning
        # (reference: time index + partition pruning, MiruTimeIndex /
        # SURVEY.md §2.3 time-range mask mapping)
        if len(tsa):
            self._ts_range[pid] = (int(tsa.min()), int(tsa.max()))

    def reload_partitions(self, pids: list[int] | None = None) -> int:
        """Refresh manifest-derived state after an in-place index
        mutation (REPAIR): drop the touched partitions' segment / bloom
        / postings caches, reload their docstore arrays, re-derive the
        global BM25 norms (avgdl may have shifted), and re-read the
        removal set (a repair UNHIDES its docs, MiruIndexer.java:105).
        The live-reader analogue of the reference re-opening a repaired
        partition's LAB handles."""
        manifest = read_json(os.path.join(self.index_dir, "manifest.json"))
        self.n_docs = manifest["n_docs"]
        self.avgdl = manifest["avgdl"] if manifest["avgdl"] > 0 else 1.0
        parts = {p["pid"]: p for p in manifest["partitions"]}
        touched = [p for p in (pids if pids is not None
                               else list(self.parts)) if p in self.parts]
        for pid in touched:
            self.parts[pid] = parts[pid]
            for shard in range(self.cfg.num_shards):
                self._seg_cache.pop((pid, shard), None)
                self._bloom_cache.pop((pid, shard), None)
            for k in [k for k in self._post_cache if k[0] == pid]:
                del self._post_cache[k]
            self._load_partition(pid)
        # avgdl is global: every partition's norm shifts, not just the
        # touched ones
        self._dl_norm = {
            pid: 1.0 - self.cfg.b + self.cfg.b * dl.astype(np.float64)
            / self.avgdl
            for pid, dl in self.doclen.items()}
        tpath = os.path.join(self.index_dir, "tombstones.json")
        self.load_tombstones(read_json(tpath)
                             if os.path.exists(tpath) else [])
        if getattr(self, "_preload", False):
            for pid in touched:
                for shard in range(self.cfg.num_shards):
                    self._segment(pid, shard)
        return len(touched)

    def call_packed(self, method: str, packed: tuple):
        """Dispatch trampoline for the packed fan-out: the driver
        ``ray.put``s ``(args, kwargs)`` ONCE per query and ships the
        ObjectRef to every reader; Ray resolves it actor-side from the
        object store.  Without this, cloudpickle re-serializes the query
        AST by value per submission (the package is registered
        pickle-by-value for driver-cwd independence), costing ~0.4 ms ×
        n_readers × fan-out rounds per query.  On a real cluster this is
        also one object-store copy per node instead of per call."""
        if getattr(self, "_debug_delay_s", 0):
            time.sleep(self._debug_delay_s)
        args, kwargs = packed
        return getattr(self, method)(*args, **kwargs)

    def set_debug_delay(self, seconds: float) -> None:
        """Fault-injection hook (tests only): make every packed call on
        this reader sleep — the 'slow replica' the hedged fan-out must
        race past (reference: MiruLowestLatencySolver racing a stalled
        solver)."""
        self._debug_delay_s = float(seconds)

    def topk_time_packed(self, shared: tuple, pids: list[int]):
        """``topk_time`` with the wave-invariant args (ast, k, expansions,
        after) shipped once as an ObjectRef; only the per-reader pid list
        is serialized per call."""
        ast, k, expansions, after = shared
        return self.topk_time(ast, k, expansions, pids, after)

    def _may_match(self, node: Node, pid: int) -> bool:
        """Conservative partition pruning: False only if NO doc in the
        partition can satisfy the filter (time zone-map check)."""
        if isinstance(node, TimeRange):
            lo, hi = self._ts_range.get(pid, (node.t0_us, node.t1_us))
            return node.t0_us <= hi and node.t1_us >= lo
        if isinstance(node, And):
            return all(self._may_match(c, pid) for c in node.children)
        if isinstance(node, Or):
            return (any(self._may_match(c, pid) for c in node.children)
                    if node.children else False)
        if isinstance(node, MinShould):
            return sum(self._may_match(c, pid)
                       for c in node.children) >= node.m
        if isinstance(node, Not):
            return self._may_match(node.positive, pid)
        if isinstance(node, (Boost, Filter)):
            return self._may_match(node.child, pid)
        if isinstance(node, MatchNone):
            return False
        return True

    def load_tombstones(self, doc_ids: list[int]) -> int:
        """(Re)load removed doc ids; returns count applied to this reader."""
        dpp = self.cfg.docs_per_partition
        tomb: dict[int, list[int]] = {}
        n = 0
        for d in doc_ids:
            pid = int(d) // dpp
            if pid in self.parts:
                tomb.setdefault(pid, []).append(int(d))
                n += 1
        self._tombstones = {p: np.array(sorted(v), np.int64)
                            for p, v in tomb.items()}
        return n

    def _docstore_read(self, pid: int, **to_table_kwargs) -> pa.Table:
        """Read this partition's docstore rows (open + read as ONE
        retried unit).  A concurrent REPAIR swaps the partition via two
        dir renames (repair._finish_repair): the dir can be absent for
        a moment, and file paths discovered by ``pads.dataset`` can
        vanish before ``to_table`` — both surface as FileNotFoundError,
        so the retry must cover the whole open+read, not just the
        open."""
        path = os.path.join(self.index_dir, "docstore", f"partition={pid}")
        for attempt in range(5):
            try:
                return pads.dataset(path, format="parquet").to_table(
                    **to_table_kwargs)
            except FileNotFoundError:
                if attempt == 4:
                    raise
                time.sleep(0.05 * (attempt + 1))

    def _segment(self, pid: int, shard: int) -> SegmentReader | None:
        key = (pid, shard)
        if key not in self._seg_cache:
            path = os.path.join(self.index_dir,
                                f"segments/p{pid:05d}_s{shard:03d}.parquet")
            self._seg_cache[key] = SegmentReader(path) if os.path.exists(path) else None
        return self._seg_cache[key]

    def _bloom(self, pid: int, shard: int):
        """Footer-only bloom over the segment's terms (None = no bloom).
        Lets a term lookup skip LOADING cold segments that cannot contain
        the term (reference: per-segment bloom index, MiruIndexBloom)."""
        key = (pid, shard)
        if key not in self._bloom_cache:
            path = os.path.join(self.index_dir,
                                f"segments/p{pid:05d}_s{shard:03d}.parquet")
            self._bloom_cache[key] = (read_segment_bloom(path)
                                      if os.path.exists(path) else None)
        return self._bloom_cache[key]

    def _lookup(self, pid: int, term: str):
        shard = int(term_shard(np.array([term], object), self.cfg.num_shards)[0])
        if (pid, shard) not in self._seg_cache:
            bloom = self._bloom(pid, shard)
            if bloom is not None:
                if not bloom_may_contain(bloom[0], bloom[1], term):
                    return None, None  # definite miss — keep segment cold
        seg = self._segment(pid, shard)
        if seg is None:
            return None, None
        row = seg.lookup(term)
        return (seg, row) if row is not None else (None, None)

    # ---------------- phase 1: stats / expansion -------------------------

    def term_stats(self, terms: list[str]) -> dict[str, tuple[int, int]]:
        """Local (df, cf) per term, summed over this reader's partitions."""
        out = {}
        for t in terms:
            df = cf = 0
            for pid in self.parts:
                seg, row = self._lookup(pid, t)
                if row is not None:
                    d, c = seg.stats(row)
                    df += d
                    cf += c
            if df:
                out[t] = (df, cf)
        return out

    def doc_term_info(self, doc_id: int, terms: list[str]) -> dict | None:
        """Per-doc scoring inputs for :meth:`Searcher.explain`: the doc's
        length, liveness, and the tf of each requested term IN THIS doc
        (0 = absent).  None if the doc is outside this reader's
        partitions."""
        doc_id = int(doc_id)
        pid = doc_id // self.cfg.docs_per_partition
        if pid not in self.parts:
            return None
        base = self.parts[pid]["base"]
        i = doc_id - base
        if i < 0 or i >= self.parts[pid]["count"]:
            return None
        t = self._tombstones.get(pid)
        alive = not (t is not None and len(t) and bool(np.isin(doc_id, t)))
        cache: dict = {}
        tfs = {}
        for term in terms:
            p = self._postings(pid, term, cache)
            tf = 0
            if p is not None:
                docs, tfa = p
                j = int(np.searchsorted(docs, doc_id))
                if j < len(docs) and docs[j] == doc_id:
                    tf = int(tfa[j])
            tfs[term] = tf
        return {"pid": pid, "dl": int(self.doclen[pid][i]),
                "alive": alive, "tfs": tfs}

    def expand_prefix(self, prefix_key: str, cap: int) -> list[str]:
        """Local prefix expansion via term-dict range scan (terms sorted;
        reference: ``MiruAggregateUtil.java:1154-1167``).

        A TEXT-field prefix (no ':' in the key) must expand only to text
        tokens: the shared term dict also holds `field:value` keyword,
        numeric-lex and `2g:` bigram pseudo-terms whose field name can
        start with the prefix (`t*` would otherwise swallow `tool:...`
        and `turn_idx:...` postings)."""
        found: set[str] = set()
        drop_colon = ":" not in prefix_key
        for pid in self.parts:
            for shard in range(self.cfg.num_shards):
                seg = self._segment(pid, shard)
                if seg is None:
                    continue
                lo, hi = seg.prefix_range(prefix_key)
                if not drop_colon:
                    found.update(seg.terms[lo:min(hi, lo + cap)])
                    continue
                got = 0  # early exit at cap SURVIVORS — never O(range)
                for t in seg.terms[lo:hi]:
                    if ":" in t:
                        continue
                    found.add(t)
                    got += 1
                    if got >= cap:
                        break
        return sorted(found)[:cap]

    def expand_range(self, lo_key: str, hi_key: str, cap: int) -> list[str]:
        """Numeric-range expansion: contiguous [lo_key, hi_key] INCLUSIVE
        slice of the sorted term dict (reference:
        ``MiruTermComposer.prefixLowerInclusive/prefixUpperExclusive``
        feeding a key-range stream over the sorted term index).

        Returns up to ``cap + 1`` terms: unlike a wildcard (where the
        reference's ``maxWildcardExpansion`` silently truncates), a range
        that overflows its cap must FAIL the query, not silently narrow
        it — the +1 sentinel lets the merging Searcher detect overflow
        even when each segment individually stays under the cap."""
        found: set[str] = set()
        for pid in self.parts:
            for shard in range(self.cfg.num_shards):
                seg = self._segment(pid, shard)
                if seg is None:
                    continue
                lo = int(np.searchsorted(seg.terms, lo_key, side="left"))
                hi = int(np.searchsorted(seg.terms, hi_key, side="right"))
                found.update(seg.terms[lo:min(hi, lo + cap + 1)])
        return sorted(found)[:cap + 1]

    def _expand_matching(self, fld: str, lit: str, regex: str,
                         cap: int) -> list[str]:
        """Shared expansion core for wildcard/regexp: scan each segment's
        term dict bounded by the literal prefix ``lit`` (and the field
        slice when ``fld`` is a keyword field), then keep survivors whose
        VALUE fully matches ``regex`` via one vectorized RE2 kernel —
        no per-term Python loop anywhere, including the field-prefix
        strip (``utf8_slice_codeunits``)."""
        text = fld == "text"
        found: set[str] = set()
        for pid in self.parts:
            for shard in range(self.cfg.num_shards):
                seg = self._segment(pid, shard)
                if seg is None:
                    continue
                lo, hi = seg.prefix_range(lit if text else f"{fld}:{lit}")
                cands = np.asarray(seg.terms[lo:hi], object)
                if not len(cands):
                    continue
                arr = pa.array(cands, pa.string())
                if text:
                    # text tokens never contain ':'; keyword/numeric
                    # pseudo-terms always do — drop them (cf. expand_prefix)
                    nc = pc.invert(pc.match_substring(arr, ":")).to_numpy(
                        zero_copy_only=False).astype(bool)
                    cands = cands[nc]
                    vals = pa.array(cands, pa.string())
                else:
                    vals = pc.utf8_slice_codeunits(arr, start=len(fld) + 1)
                if not len(cands):
                    continue
                keep = pc.match_substring_regex(vals, regex).to_numpy(
                    zero_copy_only=False).astype(bool)
                found.update(cands[keep])
        return sorted(found)[:cap]

    def expand_wildcard(self, fld: str, pat: str, cap: int) -> list[str]:
        """Local wildcard expansion (Lucene ``WildcardQuery`` semantics;
        same ``maxWildcardExpansion`` truncation contract as
        :meth:`expand_prefix`).  The literal prefix before the first
        wildcard bounds the term-dict scan; a leading wildcard scans the
        field's full term slice — the documented Lucene cost — still
        cap-bounded in output and vectorized in evaluation.  Field and
        pattern arrive as SEPARATE args (never re-split from a joined
        key: patterns may legally contain ':')."""
        first = min((j for j in (pat.find("*"), pat.find("?")) if j >= 0),
                    default=len(pat))
        rx = "^(?:" + "".join(
            ".*" if ch == "*" else "." if ch == "?" else re.escape(ch)
            for ch in pat) + ")$"
        return self._expand_matching(fld, pat[:first], rx, cap)

    def expand_regexp(self, fld: str, pat: str, cap: int) -> list[str]:
        """Local regexp expansion (Lucene ``RegexpQuery``: anchored
        full-term match).  Any literal prefix of the pattern bounds the
        term-dict scan (cf. :meth:`expand_wildcard`); the match kernel
        is RE2 — the same engine the DuckDB oracle compiles, so both
        sides accept the same language."""
        return self._expand_matching(fld, _regex_literal_prefix(pat),
                                     f"^(?:{pat})$", cap)

    def expand_fuzzy(self, term_key: str, max_edits: int,
                     cap: int) -> list[str]:
        """Local fuzzy expansion: vocabulary terms within ``max_edits``
        Levenshtein distance of ``term_key`` (Lucene ``term~N``; the
        reference inherits the syntax via ``LuceneBackedQueryParser``).

        Candidates are the partition term dicts, narrowed FIRST: a
        field-scoped key scans only that field's contiguous ``field:``
        slice; a text key skips keyword/numeric terms (they contain
        ':', text tokens never do) — then length-prefiltered to
        |len − m| ≤ max_edits before one vectorized DP over the
        survivors (no per-term Python loop)."""
        fld, _, val = term_key.rpartition(":")
        found: set[str] = set()
        for pid in self.parts:
            for shard in range(self.cfg.num_shards):
                seg = self._segment(pid, shard)
                if seg is None:
                    continue
                if fld:
                    lo, hi = seg.prefix_range(fld + ":")
                    cands = np.asarray(seg.terms[lo:hi], object)
                    vals = np.asarray(pc.utf8_slice_codeunits(
                        pa.array(cands, pa.string()),
                        start=len(fld) + 1).to_pandas(), dtype=object) \
                        if len(cands) else cands
                else:
                    cands = np.asarray(seg.terms, object)
                    # text tokens never contain ':'; keyword/numeric
                    # terms always do — drop them before the DP
                    # (vectorized — no per-term Python loop)
                    nc = pc.invert(pc.match_substring(
                        pa.array(cands, pa.string()), ":")).to_numpy(
                        zero_copy_only=False).astype(bool)
                    cands = cands[nc]
                    vals = cands
                if not len(cands):
                    continue
                keep = _lev_leq_mask(vals, val, max_edits)
                found.update(cands[keep])
        return sorted(found)[:cap]

    # ---------------- phase 2: evaluation + scoring ----------------------

    def _postings(self, pid: int, term: str, cache: dict,
                  resolved: tuple | None = None):
        """``resolved`` = an already-computed (seg, row) from a caller
        that just did the lookup itself (the WAND path needs seg/row for
        block metadata too) — avoids the double term-dict probe."""
        key = (pid, term)
        if key in cache:
            return cache[key]
        if key in self._post_cache:
            cache[key] = self._post_cache[key]
            return cache[key]
        seg, row = resolved if resolved is not None \
            else self._lookup(pid, term)
        val = None if row is None else seg.postings(row)
        if val is not None and len(val[0]):
            # clip to the COMMITTED partition extent: an in-flight (or
            # crashed) append atomically replaces the boundary
            # partition's segment files before the manifest commit, so
            # a reader on the old manifest can decode doc ids past its
            # base+count — the same guard __init__ applies to the
            # ts/doclen loads.  Docs are sorted, phantoms are a suffix;
            # positions decode stays consistent (prefix of the stream).
            limit = self.parts[pid]["base"] + self.parts[pid]["count"]
            if int(val[0][-1]) >= limit:
                n = int(np.searchsorted(val[0], limit))
                val = (val[0][:n], val[1][:n]) if n else None
        cache[key] = val
        if len(self._post_cache) >= self._post_cache_cap:
            self._post_cache.clear()  # simple epoch eviction
        self._post_cache[key] = val
        return val

    def _positions(self, pid: int, term: str, cache: dict,
                   resolved: tuple | None = None):
        """(docs, tfs, flat_positions) for one bare token, or None when the
        term is absent / the index stores no positions.  Split points of
        the flat position stream are ``cumsum(tfs)``.  ``resolved`` = an
        already-computed (seg, row), same contract as :meth:`_postings`."""
        key = (pid, term, "pos")
        if key in cache:
            return cache[key]
        if key in self._post_cache:  # hot phrase terms: decode once per
            cache[key] = self._post_cache[key]  # reader, not per query
            return cache[key]
        seg, row = resolved if resolved is not None \
            else self._lookup(pid, term)
        val = None
        if row is not None and seg.has_positions:
            p = self._postings(pid, term, cache, resolved=(seg, row))
            if p is not None:
                val = (p[0], p[1], seg.positions(row, p[1]))
        cache[key] = val
        if len(self._post_cache) >= self._post_cache_cap:
            self._post_cache.clear()  # same epoch eviction as postings
        self._post_cache[key] = val
        return val

    def _positions_sel(self, pid: int, term: str, cache: dict,
                       tfs: np.ndarray, at: np.ndarray):
        """Flat positions for ONLY the postings in ``at`` (sorted posting
        indices; split points = cumsum(tfs[at])), or None when the term
        is absent / unpositional.  Serves from the cached full decode
        when one exists; for a SPARSE candidate set it block-seeks
        (``SegmentReader.positions_at``) instead of decoding a hot
        term's whole per-partition stream — the bound that matters when
        one partition holds millions of docs."""
        def _gather(flat: np.ndarray) -> np.ndarray:
            src = np.zeros(len(tfs) + 1, np.int64)
            np.cumsum(tfs, out=src[1:])
            run_len = tfs[at]
            out = np.zeros(len(at) + 1, np.int64)
            np.cumsum(run_len, out=out[1:])
            take = (np.repeat(src[at] - out[:-1], run_len)
                    + np.arange(out[-1], dtype=np.int64))
            return flat[take]

        key = (pid, term, "pos")
        cached = cache.get(key, self._post_cache.get(key, _MISS))
        if cached is None:
            return None
        if cached is not _MISS:
            return _gather(cached[2])
        seg, row = self._lookup(pid, term)
        if row is None or not seg.has_positions:
            cache[key] = None
            return None
        if len(at) * BLOCK_SIZE < len(tfs) // 2:
            return seg.positions_at(row, tfs, at)
        # dense: decode + cache the full stream once, reusing (seg, row)
        pv = self._positions(pid, term, cache, resolved=(seg, row))
        return None if pv is None else _gather(pv[2])

    def _alive_mask(self, pid: int, mask: np.ndarray) -> np.ndarray:
        """AND the removal mask into a filter result (buildIndexMask
        semantics, ``MiruBitmaps.java:133-139``)."""
        t = self._tombstones.get(pid)
        if t is not None and len(t):
            mask = mask.copy()
            mask[t - self.parts[pid]["base"]] = False
        return mask

    def _eval(self, node: Node, pid: int, cache: dict,
              expansions: dict[str, list[str]]) -> np.ndarray:
        base = self.parts[pid]["base"]
        count = self.parts[pid]["count"]
        if isinstance(node, Term):
            mask = np.zeros(count, bool)
            p = self._postings(pid, node.term_key(), cache)
            if p is not None:
                mask[p[0] - base] = True
            return mask
        if isinstance(node, (Prefix, Fuzzy, Wildcard, Regexp,
                             NumericRange)):
            # OR of the expanded postings.  The expansions dict is keyed
            # (key, max_expansion) — two nodes sharing a pattern but
            # differing caps must not read each other's lists (for
            # NumericRange the range itself is the key; a gate, never
            # scored)
            key = (node.term_key_prefix() if isinstance(node, Prefix)
                   else node.expansion_key())
            mask = np.zeros(count, bool)
            for t in expansions.get((key, node.max_expansion), []):
                p = self._postings(pid, t, cache)
                if p is not None:
                    mask[p[0] - base] = True
            return mask
        if isinstance(node, (Boost, Filter)):
            # Boost affects scoring, not matching; Filter gates without
            # scoring — both evaluate exactly as their child
            return self._eval(node.child, pid, cache, expansions)
        if isinstance(node, TimeRange):
            ts = self.ts[pid]
            return (ts >= node.t0_us) & (ts <= node.t1_us)
        if isinstance(node, Phrase):
            # candidates: AND of the phrase terms' postings; verify
            # token-adjacency against the stored text of candidates only.
            # Fields indexed with phrase bigrams AND the `2g:` pair
            # postings instead — exact for a 2-token phrase (no docstore
            # gather at all), a strictly tighter candidate set beyond.
            use_pos = node.field in getattr(self.cfg, "positional_fields",
                                            ())
            slop = getattr(node, "slop", 0)
            use_bigrams = (
                not use_pos and slop == 0
                and node.field in getattr(self.cfg, "phrase_bigram_fields",
                                          ())
                and len(node.terms) >= 2)
            keys = ([f"2g:{a} {b}" for a, b in zip(node.terms,
                                                   node.terms[1:])]
                    if use_bigrams else node.term_keys())
            mask = np.ones(count, bool)
            for t in keys:
                tm = np.zeros(count, bool)
                p = self._postings(pid, t, cache)
                if p is not None:
                    tm[p[0] - base] = True
                mask &= tm
                if not mask.any():
                    return mask
            if use_bigrams and len(node.terms) == 2:
                return mask  # a single bigram IS exact adjacency
            cand = np.flatnonzero(mask) + base
            if use_pos and slop > 0:
                # sloppy phrase from positions alone: per candidate doc,
                # greedy in-order chain (earliest next position per term
                # minimizes the chain's end, so greedy-per-start is exact
                # for span − (k−1) ≤ slop).  The python loop is bounded
                # by the AND-of-all-terms candidate count; positions are
                # fetched candidate-only (block-seek when sparse).
                per = []
                for t in node.terms:
                    p = self._postings(pid, t, cache)
                    if p is None:
                        return np.zeros(count, bool)
                    docs, tfs = p
                    at = np.searchsorted(docs, cand)
                    at = at[(at < len(docs)) & (docs[np.minimum(
                        at, len(docs) - 1)] == cand)]
                    flat = self._positions_sel(pid, t, cache, tfs, at)
                    if flat is None:
                        return np.zeros(count, bool)
                    run_len = tfs[at]
                    out = np.zeros(len(at) + 1, np.int64)
                    np.cumsum(run_len, out=out[1:])
                    per.append((docs[at], flat, out))
                mask = np.zeros(count, bool)
                for d in cand:
                    pls = []
                    for docs_c, flat, out in per:
                        j = int(np.searchsorted(docs_c, d))
                        if j >= len(docs_c) or docs_c[j] != d:
                            pls = None
                            break
                        pls.append(flat[out[j]:out[j + 1]])
                    if pls is not None and _ordered_near(pls, slop):
                        mask[d - base] = True
                return mask
            if use_pos:
                # exact adjacency for ANY phrase length from the position
                # streams alone: term i at position p starts a match at
                # p - i, so intersecting (doc, p - i) keys across terms
                # leaves exactly the docs with a full adjacent run — no
                # docstore gather (the index-only phrase path the
                # reference gets from Lucene positions).  Positions are
                # fetched for CANDIDATE postings only — block-seek when
                # the candidate set is sparse relative to the term's df.
                M = np.int64(1) << 32
                ok = None
                for i, t in enumerate(node.terms):
                    p = self._postings(pid, t, cache)
                    if p is None:
                        ok = np.empty(0, np.int64)
                        break
                    docs, tfs = p
                    at = np.searchsorted(docs, cand)
                    at = at[(at < len(docs)) & (docs[np.minimum(
                        at, len(docs) - 1)] == cand)]
                    flat = self._positions_sel(pid, t, cache, tfs, at)
                    if flat is None:
                        ok = np.empty(0, np.int64)
                        break
                    run_len = tfs[at]
                    d = np.repeat(docs[at] - base, run_len)
                    keep = flat >= i
                    kk = d[keep] * M + (flat[keep] - np.int64(i))
                    ok = kk if ok is None else np.intersect1d(
                        ok, kk, assume_unique=True)
                    if not len(ok):
                        break
                mask = np.zeros(count, bool)
                if ok is not None and len(ok):
                    mask[np.unique(ok // M)] = True
                return mask
            t = self._docstore_read(
                pid, columns=["doc_id", node.field],
                filter=pads.field("doc_id").isin(cand.tolist()))
            # adjacency over the SAME token stream the index saw (stopwords
            # stripped when the index strips them — analyzer parity)
            stop = EN_STOPWORDS if self.cfg.remove_stopwords else None
            if slop > 0:
                ok_ids = []
                for d, txt in zip(t["doc_id"].to_pylist(),
                                  t[node.field].to_pylist()):
                    toks = np.array(py_tokenize(txt or "", stop),
                                    dtype=object)
                    pls = [np.flatnonzero(toks == tm) for tm in node.terms]
                    if all(len(p) for p in pls) and _ordered_near(pls, slop):
                        ok_ids.append(int(d))
            else:
                needle = " " + node.token_string() + " "
                ok_ids = [int(d) for d, txt in zip(t["doc_id"].to_pylist(),
                                                   t[node.field].to_pylist())
                          if needle in
                          " " + " ".join(py_tokenize(txt or "", stop)) + " "]
            mask = np.zeros(count, bool)
            mask[np.asarray(ok_ids, np.int64) - base] = True
            return mask
        if isinstance(node, Authz):
            # composite ACL mask: OR of the principal's entry postings
            # (MiruAuthzIndex / MiruAuthzUtils.getCompositeAuthz)
            mask = np.zeros(count, bool)
            for v in node.values:
                p = self._postings(pid, f"{node.field}:{v}", cache)
                if p is not None:
                    mask[p[0] - base] = True
            return mask
        if isinstance(node, And):
            mask = np.ones(count, bool)
            for c in node.children:
                mask &= self._eval(c, pid, cache, expansions)
                if not mask.any():  # early-exit empty AND
                    return mask     # (MiruAggregateUtil.java:1175-1177)
            return mask
        if isinstance(node, Or):
            mask = np.zeros(count, bool)
            for c in node.children:
                mask |= self._eval(c, pid, cache, expansions)
            return mask
        if isinstance(node, MinShould):
            if not node.children or node.m > len(node.children):
                return np.zeros(count, bool)
            acc = np.zeros(count, np.int32)
            for c in node.children:
                acc += self._eval(c, pid, cache, expansions)
            return acc >= node.m
        if isinstance(node, Not):
            mask = self._eval(node.positive, pid, cache, expansions)
            for c in node.negatives:
                mask &= ~self._eval(c, pid, cache, expansions)
            return mask
        if isinstance(node, MatchNone):
            return np.zeros(count, bool)
        raise TypeError(f"unknown node {node!r}")

    def search(self, ast: Node, k: int, strategy: str,
               term_counts: dict[str, int],
               global_stats: dict[str, tuple[int, int]],
               expansions: dict[str, list[str]] | None = None,
               use_wand: bool = False,
               after: tuple[float, int] | None = None,
               boosts: dict[str, float] | None = None) -> dict:
        """Per-partition top-k → merged local top-k for this reader.

        ``after=(score, doc_id)``: pagination — only docs strictly below
        that (score desc, doc_id desc) rank position are returned
        (reference: the lowestScore continuation report,
        ``FullTextReport.java:10-24``, ``FullText.java:134-135, 203-218``).
        """
        expansions = expansions or {}
        out_docs, out_scores = [], []
        for pid in self.parts:
            if not self._may_match(ast, pid):
                continue  # zone-map pruned
            cache: dict = {}
            if (use_wand and after is None
                    and strategy in ("bm25", "ref-tfidf") and _is_pure_or(ast)
                    and self._tombstones.get(pid) is None):
                # WAND scores straight from postings — no candidate mask is
                # materialized (that full-partition boolean union is exactly
                # the work WAND exists to skip).  A partition with
                # tombstones falls back to mask scoring: the removal mask
                # must gate every answer (buildIndexMask semantics; ADVICE
                # r01: WAND returned removed docs).
                d, s = self._wand_partition(pid, k, strategy, term_counts,
                                            global_stats, cache, boosts)
            else:
                mask = self._alive_mask(
                    pid, self._eval(ast, pid, cache, expansions))
                if not mask.any():
                    continue
                d, s = self._score_partition(pid, mask, k, strategy,
                                             term_counts, global_stats, cache,
                                             after, boosts)
            if not len(d):
                continue
            out_docs.append(d)
            out_scores.append(s)
        if not out_docs:
            return {"doc_ids": np.empty(0, np.int64),
                    "scores": np.empty(0, np.float64),
                    "ts": np.empty(0, np.int64)}
        docs = np.concatenate(out_docs)
        scores = np.concatenate(out_scores)
        docs, scores = S.topk_by_score(docs, scores, k)
        return {"doc_ids": docs, "scores": scores, "ts": self._ts_of(docs)}

    def _score_partition(self, pid, mask, k, strategy, term_counts,
                         global_stats, cache, after=None, boosts=None):
        """Vectorized term-at-a-time scoring in fixed (sorted) term order."""
        base = self.parts[pid]["base"]
        count = self.parts[pid]["count"]
        dl = self.doclen[pid]
        dn = self._dl_norm[pid]
        cfg = self.cfg
        acc = np.zeros(count, np.float64)
        for term in sorted(global_stats):
            qc = term_counts.get(term, 0)
            if qc <= 0:
                continue
            p = self._postings(pid, term, cache)
            if p is None:
                continue
            docs, tfs = p
            idx = docs - base
            df, cf = global_stats[term]
            if strategy == "bm25":
                w = S.bm25_idf(float(df), self.n_docs) * S.bm25_tf_weight_pre(
                    tfs.astype(np.float64), dn[idx], cfg.k1)
            else:
                w = S.term_weight_arrays(strategy, qc, df, cf, self.n_docs,
                                         self.avgdl, cfg.k1, cfg.b, tfs,
                                         dl[idx])
            if boosts:
                w = w * boosts.get(term, 1.0)
            acc[idx] += w
        sel = np.flatnonzero(mask)
        docs, scores = sel + base, acc[sel]
        if after is not None:
            a_score, a_doc = after
            keep = (scores < a_score) | ((scores == a_score) & (docs < a_doc))
            docs, scores = docs[keep], scores[keep]
        return S.topk_by_score(docs, scores, k)

    def _wand_partition(self, pid, k, strategy, term_counts, global_stats,
                        cache, boosts=None):
        base = self.parts[pid]["base"]
        dl = self.doclen[pid]
        cfg = self.cfg
        postings, ubs, wfns, blocks, bubs = [], [], [], [], []
        for term in sorted(global_stats):
            qc = term_counts.get(term, 0)
            if qc <= 0:
                continue
            seg, row = self._lookup(pid, term)
            if row is None:
                continue
            docs, tfs = self._postings(pid, term, cache, resolved=(seg, row))
            df, cf = global_stats[term]
            bst = boosts.get(term, 1.0) if boosts else 1.0
            postings.append((docs, tfs))
            blocks.append(seg.block_meta(row))
            max_tf = float(tfs.max())
            ubs.append(bst * S.term_upper_bound(
                strategy, qc, df, cf, self.n_docs,
                self.avgdl, cfg.k1, cfg.b, max_tf))

            def wf(tf_s, doc_s, _df=df, _cf=cf, _qc=qc, _b=bst):
                return _b * S.term_weight_arrays(
                    strategy, _qc, _df, _cf,
                    self.n_docs, self.avgdl, cfg.k1,
                    cfg.b, tf_s, dl[doc_s - base])

            def bub(bmtf, _df=df, _cf=cf, _qc=qc, _b=bst):
                return _b * S.term_upper_bound(
                    strategy, _qc, _df, _cf,
                    self.n_docs, self.avgdl, cfg.k1,
                    cfg.b, bmtf)

            wfns.append(wf)
            bubs.append(bub)
        return S.wand_topk(postings, ubs, wfns, blocks, bubs, k)

    def _ts_of(self, docs: np.ndarray) -> np.ndarray:
        out = np.empty(len(docs), np.int64)
        dpp = self.cfg.docs_per_partition
        for i, d in enumerate(docs):
            pid = int(d) // dpp
            out[i] = self.ts[pid][int(d) - self.parts[pid]["base"]]
        return out

    def match(self, ast: Node, expansions: dict | None = None,
              return_docs: bool = False) -> dict:
        """Filter-only evaluation: count (+ optionally doc ids) per reader
        (reference: ``bitmaps.cardinality(answer)``, ``FullText.java:89``)."""
        expansions = expansions or {}
        total = 0
        docs = []
        for pid in self.parts:
            if not self._may_match(ast, pid):
                continue  # zone-map pruned
            base = self.parts[pid]["base"]
            mask = self._alive_mask(pid, self._eval(ast, pid, {}, expansions))
            total += int(mask.sum())
            if return_docs:
                docs.append(np.flatnonzero(mask) + base)
        return {"count": total,
                "doc_ids": np.concatenate(docs) if docs else np.empty(0, np.int64)}

    def waveform(self, ast: Node, expansions: dict, lo: int, hi: int,
                 n: int) -> np.ndarray:
        """Per-segment match counts over ``[lo, hi)`` split into ``n``
        equal time segments — the Analytics answerer's per-partition
        partial (reference: ``miru-analytics-plugins/.../Analytics.java``
        walks the filter bitmap per time segment)."""
        return self.waveform_multi([ast], expansions, lo, hi, n)[0]

    def waveform_multi(self, asts: list[Node], expansions: dict, lo: int,
                       hi: int, n: int) -> np.ndarray:
        """``(len(asts), n)`` per-segment match counts over ``[lo, hi)``
        split into ``n`` equal time segments, one row per filter — the
        batched Analytics/Trending per-partition partial (reference:
        ``Analytics.java`` walks one filter bitmap per time segment per
        named filter; ``TrendingQuestion.java:138-199`` asks it for one
        filter per distinct term).  Postings algebra + the in-memory ts
        arrays only.  Batching matters at trending cardinalities: the
        postings cache is shared across the batch (a term appearing in
        many filters decodes once per partition) and the per-partition
        segment index is computed once, so T filters cost one partition
        sweep, not T."""
        out = np.zeros((len(asts), n), np.int64)
        width = int(hi) - int(lo)
        for pid in self.parts:
            zone = self._ts_range.get(pid)
            if zone is None:
                continue  # empty partition (post-removal) — no docs
            zlo, zhi = zone
            if zhi < lo or zlo >= hi:
                continue  # zone outside the waveform window
            live = [i for i, a in enumerate(asts)
                    if self._may_match(a, pid)]  # zone-map pruned per ast
            if not live:
                continue
            ts = self.ts[pid]
            in_r = (ts >= lo) & (ts < hi)
            if not in_r.any():
                continue
            seg = np.zeros(len(ts), np.int64)
            seg[in_r] = (ts[in_r] - lo) * n // width
            cache: dict = {}  # postings decode shared across the batch
            for i in live:
                mask = self._alive_mask(
                    pid, self._eval(asts[i], pid, cache, expansions))
                m = mask & in_r
                if m.any():
                    out[i] += np.bincount(seg[m], minlength=n)
        return out

    def term_match_counts(self, ast: Node, term_keys: list[str],
                          expansions: dict) -> dict[str, int]:
        """Per-term match counts under a gate: for each posting-list key
        in ``term_keys``, the number of alive docs in
        ``postings[key] ∧ ast`` — the reco plugin's gather/stream
        primitive (``MiruAggregateUtil.gather/stream`` walking per-term
        bitmaps against an answer bitmap,
        ``CollaborativeFiltering.java:92-151``).  The gate evaluates
        ONCE per partition and the postings cache is shared across the
        key batch."""
        out: dict[str, int] = {k: 0 for k in term_keys}
        for pid in self.parts:
            if not self._may_match(ast, pid):
                continue
            base = self.parts[pid]["base"]
            amask = self._alive_mask(pid, self._eval(ast, pid, {},
                                                     expansions))
            if not amask.any():
                continue
            cache: dict = {}
            for k in term_keys:
                p = self._postings(pid, k, cache)
                if p is not None:
                    out[k] += int(amask[p[0] - base].sum())
        return out

    def term_match_stats(self, ast: Node, term_keys: list[str],
                         expansions: dict
                         ) -> dict[str, tuple[int, int, int]]:
        """:meth:`term_match_counts` + the latest matching doc:
        ``key → (count, max_ts_us, doc_at_max)`` — the strut candidate
        gather needs the first two (``HotOrNot.timestamp``/``count``,
        ``Strut.java:180-182``) and ``gatherTermsForFields`` the third
        (the newest doc's id, ties broken by larger doc id like the TIME
        strategy), all from ONE fan-out.  ``(-1, -1)`` for keys with no
        match."""
        out: dict[str, tuple[int, int, int]] = {k: (0, -1, -1)
                                                for k in term_keys}
        for pid in self.parts:
            if not self._may_match(ast, pid):
                continue
            base = self.parts[pid]["base"]
            amask = self._alive_mask(pid, self._eval(ast, pid, {},
                                                     expansions))
            if not amask.any():
                continue
            ts = self.ts[pid]
            cache: dict = {}
            for k in term_keys:
                p = self._postings(pid, k, cache)
                if p is None:
                    continue
                hit = amask[p[0] - base]
                n = int(hit.sum())
                if not n:
                    continue
                c0, t0, d0 = out[k]
                docs = p[0][hit]
                tvals = ts[docs - base]
                mx = int(tvals.max())
                dx = int(docs[tvals == mx].max())
                if (mx, dx) > (t0, d0):
                    t0, d0 = mx, dx
                out[k] = (c0 + n, t0, d0)
        return out

    def term_pair_rows(self, ast: Node, row_keys: list[str],
                       col_keys: list[str],
                       expansions: dict) -> dict[str, set]:
        """Per-row-term distinct col-terms under a gate: for each row key
        (a contributor's postings), the set of col keys whose postings
        intersect ``postings[row] ∧ ast`` — reco's hop-3 gather
        (``CollaborativeFiltering.java:178-207``: each contributor's
        ok-activity bitmap gathered for distinct field-3 terms).  A
        (row, col) pair already proven non-empty is skipped in later
        partitions."""
        out: dict[str, set] = {r: set() for r in row_keys}
        for pid in self.parts:
            if not self._may_match(ast, pid):
                continue
            base = self.parts[pid]["base"]
            count = self.parts[pid]["count"]
            amask = self._alive_mask(pid, self._eval(ast, pid, {},
                                                     expansions))
            if not amask.any():
                continue
            cache: dict = {}
            for r in row_keys:
                missing = [c for c in col_keys if c not in out[r]]
                if not missing:
                    continue
                p = self._postings(pid, r, cache)
                if p is None:
                    continue
                rmask = np.zeros(count, bool)
                rmask[p[0] - base] = True
                rmask &= amask
                if not rmask.any():
                    continue
                for c in missing:
                    pc_ = self._postings(pid, c, cache)
                    if pc_ is not None and rmask[pc_[0] - base].any():
                        out[r].add(c)
        return out

    def term_pair_counts(self, ast: Node, row_keys: list[str],
                         col_keys: list[str],
                         expansions: dict) -> np.ndarray:
        """``(len(row_keys), len(col_keys))`` int64 matrix of alive doc
        counts ``|postings[row] ∧ postings[col] ∧ ast|`` — the
        combo-feature counter: a multi-field CatwalkFeature's value is
        the cross product of its fields' per-doc values
        (``CatwalkQuestion.java:193-215`` walks each doc's combos via
        the activity index); with single-valued fields every doc carries
        exactly one combo, so combo counts are pairwise postings
        intersections — no docstore walk."""
        out = np.zeros((len(row_keys), len(col_keys)), np.int64)
        for pid in self.parts:
            if not self._may_match(ast, pid):
                continue
            base = self.parts[pid]["base"]
            count = self.parts[pid]["count"]
            amask = self._alive_mask(pid, self._eval(ast, pid, {},
                                                     expansions))
            if not amask.any():
                continue
            cache: dict = {}
            col_p = [self._postings(pid, c, cache) for c in col_keys]
            for i, r in enumerate(row_keys):
                p = self._postings(pid, r, cache)
                if p is None:
                    continue
                rmask = np.zeros(count, bool)
                rmask[p[0] - base] = True
                rmask &= amask
                if not rmask.any():
                    continue
                for j, pc_ in enumerate(col_p):
                    if pc_ is not None:
                        out[i, j] += int(rmask[pc_[0] - base].sum())
        return out

    def zone_maps(self) -> dict[int, tuple[int, int]]:
        """Per-partition (min_ts, max_ts) — the driver's newest-first visit
        order and early-exit bound come from these."""
        return dict(self._ts_range)

    def topk_time(self, ast: Node, k: int,
                  expansions: dict | None = None,
                  pids: list[int] | None = None,
                  after: tuple | None = None) -> dict:
        """TIME strategy: newest-first matches (ts desc, doc_id desc).
        ``pids`` limits evaluation to a subset of this reader's partitions
        (the driver's newest-first wave).  ``after=(ts_us, doc_id)``:
        pagination cursor — only matches strictly below that rank
        position qualify (applied BEFORE the local top-k, or a page-2
        request would see only page-1 rows re-selected)."""
        expansions = expansions or {}
        all_docs, all_ts = [], []
        visit = self.parts if pids is None else \
            [p for p in pids if p in self.parts]
        for pid in visit:
            if not self._may_match(ast, pid):
                continue  # zone-map pruned
            base = self.parts[pid]["base"]
            mask = self._alive_mask(pid, self._eval(ast, pid, {}, expansions))
            sel = np.flatnonzero(mask)
            if not len(sel):
                continue
            ts = self.ts[pid][sel]
            if after is not None:
                a_ts, a_doc = int(after[0]), int(after[1])
                keep = (ts < a_ts) | ((ts == a_ts) & (sel + base < a_doc))
                sel, ts = sel[keep], ts[keep]
                if not len(sel):
                    continue
            if len(sel) > k:
                order = np.lexsort((sel, ts))[::-1][:k]
                sel, ts = sel[order], ts[order]
            all_docs.append(sel + base)
            all_ts.append(ts)
        if not all_docs:
            return {"doc_ids": np.empty(0, np.int64), "ts": np.empty(0, np.int64)}
        docs = np.concatenate(all_docs)
        ts = np.concatenate(all_ts)
        order = np.lexsort((docs, ts))[::-1][:k]
        return {"doc_ids": docs[order], "ts": ts[order]}

    def gather(self, doc_ids: list[int], columns: list[str]) -> pa.Table:
        """Read stored fields for result docs (reference: gatherValues,
        ``FullText.java:253-280``)."""
        dpp = self.cfg.docs_per_partition
        by_pid = defaultdict(list)
        for d in doc_ids:
            by_pid[int(d) // dpp].append(int(d))
        tables = []
        for pid, ids in by_pid.items():
            t = self._docstore_read(
                pid, columns=list(dict.fromkeys(["doc_id"] + columns)),
                filter=pads.field("doc_id").isin(ids))
            tables.append(t)
        return pa.concat_tables(tables) if tables else pa.table({})


def _is_pure_or(node: Node) -> bool:
    if isinstance(node, Term):
        return True
    return isinstance(node, Or) and all(isinstance(c, Term) for c in node.children)


class Searcher:
    """Driver-side planner/merger over a pool of PartitionReader actors."""

    def __init__(self, index_dir: str, num_readers: int | None = None,
                 use_actors: bool = True, num_cpus: float = 0,
                 preload_segments: bool = False, replicas: int = 1,
                 hedge_delay_s: float = 0.1):
        # num_cpus=0 by default: reader actors are query-latency-oriented and
        # idle between queries; reserving whole CPUs for them starves
        # co-running Dataset build stages of schedulable slots (a 4-CPU test
        # cluster deadlocks).  Benchmarks that want dedicated cores pass
        # num_cpus explicitly.
        self.index_dir = index_dir
        self.manifest = read_json(os.path.join(index_dir, "manifest.json"))
        self.cfg = IndexConfig.from_dict(self.manifest["config"])
        pids = [p["pid"] for p in self.manifest["partitions"]]
        n = min(num_readers or max(1, len(pids)), max(1, len(pids)))
        assignment = [pids[i::n] for i in range(n)]
        self.use_actors = use_actors
        # driver-side caches: global (df, cf) per term and prefix expansions
        # are partition-independent, so repeated queries skip the stats
        # fan-out round entirely (the reference's plugin term-feature cache,
        # MiruPluginCacheProvider, plays the same role)
        self._stats_cache: dict[str, tuple[int, int]] = {}
        self._expansion_cache: dict[tuple[str, int], list[str]] = {}
        #: per-stream unread state (MiruUnreadTrackingIndex analogue) —
        #: see mark_read/mark_unread/set_stream_unread below
        self._stream_unread: dict[str, dict] = {}
        self._assignment = assignment
        self._num_cpus = num_cpus
        self._preload = preload_segments
        #: LAST-RESORT watchdog: seconds before a reader that returns
        #: nothing is declared HUNG and respawned from the manifest (the
        #: reference races replicas against slow solvers,
        #: ``MiruLowestLatencySolver.java:94-120`` — here retries replace
        #: racing: Ray restarts the actor's state from the index files).
        #: A DEAD reader needs no timeout — its pending calls raise
        #: RayActorError immediately.  The default is deliberately far
        #: above any legitimate query latency: wall clock is the only
        #: in-band signal that can distinguish hung from slow (actor
        #: tasks queue serially, so a ping would queue behind the stuck
        #: call), and killing a merely-slow reader discards its warm
        #: caches and triples the work.  Set to None to wait forever.
        self.fanout_timeout_s: float | None = 600.0
        #: partitions actually evaluated by the last TIME query (the
        #: early-exit observability hook; tests assert it shrinks)
        self.last_time_partitions_evaluated = 0
        #: replica racing (reference: MiruSolver / MiruLowestLatencySolver
        #: — start 1 solver, add another every ~100 ms, take the first
        #: answer, ``MiruServiceConfig.java:41-51``).  ``replicas`` > 1
        #: hosts every partition in that many independent actor pools; a
        #: fan-out call unanswered after ``hedge_delay_s`` is issued to
        #: the next replica and the first completion wins (losers are
        #: best-effort cancelled).  ``fanout_timeout_s`` stays the
        #: fail-hard deadline (the reference's 30 s solver abandon).
        self.hedge_delay_s = hedge_delay_s
        #: hedge launches since construction (observability; tests assert
        #: a slow replica fires it and a healthy pool does not)
        self.hedges_fired = 0
        replicas = max(1, int(replicas)) if use_actors else 1
        if use_actors:
            self._pools = [[self._spawn(i) for i in range(n)]
                           for _r in range(replicas)]
            self.readers = self._pools[0]
        else:
            self.readers = [PartitionReader(index_dir, a, preload_segments)
                            for a in assignment]
            self._pools = [self.readers]

    def _spawn(self, i: int):
        cls = ray.remote(num_cpus=self._num_cpus)(PartitionReader)
        return cls.remote(self.index_dir, self._assignment[i], self._preload)

    # -------------- fan-out helper --------------
    def _fanout(self, method: str, *args, readers: list[int] | None = None,
                all_replicas: bool = False, **kwargs) -> list:
        """Call ``method`` on every reader (or the ``readers`` subset) in
        parallel.  A dead or hung actor is respawned from the manifest and
        its call retried once — a failed replica must not stall the query
        (reference role: replica racing / lowest-latency solver).

        ``all_replicas=True`` — for STATE-MUTATING methods (tombstone
        loads): the call goes to every replica pool and waits for all of
        them; racing would leave the losing replicas stale."""
        idxs = list(readers) if readers is not None \
            else list(range(len(self.readers)))
        if not self.use_actors:
            return [getattr(self.readers[i], method)(*args, **kwargs)
                    for i in idxs]
        if all_replicas and len(self._pools) > 1:
            packed = ray.put((args, kwargs))
            refs = [(p, i, self._pools[p][i].call_packed.remote(
                         method, packed))
                    for p in range(len(self._pools)) for i in idxs]
            res = {}
            for p, i, ref in refs:
                try:
                    res[(p, i)] = ray.get(ref,
                                          timeout=self.fanout_timeout_s)
                except (ray.exceptions.RayActorError,
                        ray.exceptions.GetTimeoutError):
                    # a dead replica must not make mutations fail forever
                    # while hedged reads keep succeeding: respawn it (the
                    # fresh actor reads tombstones.json — already written
                    # by remove_docs — in __init__) and retry once
                    try:
                        ray.kill(self._pools[p][i])
                    except Exception:
                        pass
                    self._pools[p][i] = self._spawn(i)
                    res[(p, i)] = ray.get(
                        self._pools[p][i].call_packed.remote(method,
                                                             packed),
                        timeout=self.fanout_timeout_s)
            return [res[(0, i)] for i in idxs]  # pool-0 view (identical)
        if args or kwargs:
            # serialize the (possibly AST-bearing) args once, fan out refs
            packed = ray.put((args, kwargs))
            return self._recoverable_get(
                idxs,
                lambda i, pool=0: self._pools[pool][i].call_packed.remote(
                    method, packed))
        return self._recoverable_get(
            idxs,
            lambda i, pool=0: getattr(self._pools[pool][i], method).remote())

    def _recoverable_get(self, idxs: list[int], make_ref) -> list:
        """ray.get over per-reader refs; a dead/hung reader is killed,
        respawned, and its call re-issued once (``make_ref`` re-reads
        ``self._pools``, so the retry binds the fresh actor).  With
        ``replicas`` > 1, delegates to the hedged race instead."""
        if len(self._pools) > 1:
            return self._hedged_get(idxs, make_ref)
        refs = [make_ref(i) for i in idxs]
        try:
            return ray.get(refs, timeout=self.fanout_timeout_s)
        except (ray.exceptions.RayActorError, ray.exceptions.GetTimeoutError):
            pass
        out = []
        for pos, ref in zip(idxs, refs):
            try:
                out.append(ray.get(ref, timeout=self.fanout_timeout_s))
            except (ray.exceptions.RayActorError,
                    ray.exceptions.GetTimeoutError):
                try:  # a hung (not dead) actor must be torn down first
                    ray.kill(self.readers[pos])
                except Exception:
                    pass
                self.readers[pos] = self._spawn(pos)
                out.append(ray.get(make_ref(pos),
                                   timeout=self.fanout_timeout_s))
        return out

    def _hedged_get(self, idxs: list[int], make_ref) -> list:
        """Replica racing (MiruLowestLatencySolver semantics): issue each
        reader call on pool 0; any call unanswered after ``hedge_delay_s``
        is ALSO issued to the next replica pool, one more per tick, until
        the pools are exhausted.  First completion per reader wins and the
        losers are best-effort cancelled; a reader whose every replica
        errored is respawned once, then the error propagates.
        ``fanout_timeout_s`` remains the fail-hard deadline."""
        nrep = len(self._pools)
        t0 = time.monotonic()
        inflight = {make_ref(i, 0): (i, 0) for i in idxs}
        launched = {i: 1 for i in idxs}
        #: per-reader hedge deadline — steady completions from OTHER
        #: readers must not starve a straggler's hedge (every straggler
        #: hedges hedge_delay_s after ITS OWN launch, not after a fully
        #: idle wait window)
        next_due = {i: t0 + self.hedge_delay_s for i in idxs}
        results: dict[int, object] = {}
        respawned: set[int] = set()

        def _hedge(i: int) -> None:
            p = launched[i]
            inflight[make_ref(i, p)] = (i, p)
            launched[i] += 1
            next_due[i] = time.monotonic() + self.hedge_delay_s
            self.hedges_fired += 1

        while len(results) < len(idxs):
            now = time.monotonic()
            budget = (None if self.fanout_timeout_s is None
                      else self.fanout_timeout_s - (now - t0))
            if budget is not None and budget <= 0:
                raise ray.exceptions.GetTimeoutError(
                    f"hedged fan-out exceeded {self.fanout_timeout_s}s")
            for i in idxs:  # fire every hedge past its own deadline
                if (i not in results and launched[i] < nrep
                        and now >= next_due[i]):
                    _hedge(i)
            due = [next_due[i] - now for i in idxs
                   if i not in results and launched[i] < nrep]
            wait_t = min(due) if due else budget
            if budget is not None and wait_t is not None:
                wait_t = min(wait_t, budget)
            done, _ = ray.wait(list(inflight), num_returns=1,
                               timeout=(max(wait_t, 0.0)
                                        if wait_t is not None else None))
            if not done:
                continue  # loop head fires any now-due hedges
            ref = done[0]
            i, pool = inflight.pop(ref)
            if i in results:
                continue
            try:
                results[i] = ray.get(ref)
            except ray.exceptions.RayActorError:
                # actor DEATH only — an application-level error (a
                # deterministic raise from the query itself) propagates
                # immediately instead of re-executing on every replica
                if any(j == i for (j, _p) in inflight.values()):
                    continue  # a sibling replica is still racing
                if launched[i] < nrep:  # fail fast to the next replica
                    _hedge(i)
                    continue
                if i in respawned:
                    raise
                respawned.add(i)
                try:
                    ray.kill(self._pools[pool][i])
                except Exception:
                    pass
                self._pools[pool][i] = self._spawn(i)
                inflight[make_ref(i, pool)] = (i, pool)
                continue
            for r, (j, _p) in list(inflight.items()):
                if j == i:  # cancel the losing replicas
                    inflight.pop(r)
                    try:
                        ray.cancel(r)
                    except Exception:
                        pass
        return [results[i] for i in idxs]

    def _prepare(self, ast: Node, need_stats: bool = True):
        """Phase 1: global prefix expansion + global term stats (cached).

        ``need_stats=False`` (filter-only queries: count, match, TIME)
        skips the term-stats fan-out round entirely — global df/cf matter
        only to scoring."""
        expansions: dict[str, list[str]] = {}
        for p in collect_prefixes(ast):
            key = p.term_key_prefix()
            ck = (key, p.max_expansion)
            if ck not in self._expansion_cache:
                found: set[str] = set()
                # empty-prefix = EXISTS query (field:*), and a prefix
                # ending at a composite part boundary = parts-prefix scan
                # (MiruTermComposer.prefixLowerInclusive:176-206): both
                # are complete-or-fail — truncation would silently DROP
                # matching docs, contradicting the query's completeness
                # semantics — so overflow is a loud failure, exactly
                # like NumericRange's cap below
                exists = p.prefix == "" or p.prefix.endswith(PART_SEP)
                ask = p.max_expansion + 1 if exists else p.max_expansion
                for res in self._fanout("expand_prefix", key, ask):
                    found.update(res)
                if exists and len(found) > p.max_expansion:
                    kind = ("exists query" if p.prefix == ""
                            else "composite parts-prefix query")
                    raise ValueError(
                        f"{kind} on {p.field}:{p.prefix!r} expands past "
                        f"max_expansion={p.max_expansion} distinct terms; "
                        f"raise Prefix.max_expansion (truncating a "
                        f"complete-scan query would silently drop "
                        f"matching docs)")
                self._expansion_cache[ck] = sorted(found)[:p.max_expansion]
            expansions[ck] = self._expansion_cache[ck]
        for fz in collect_fuzzies(ast):
            key = fz.expansion_key()
            ck = (key, fz.max_expansion)
            if ck not in self._expansion_cache:
                found: set[str] = set()
                for res in self._fanout("expand_fuzzy", fz.term_key(),
                                        fz.max_edits, fz.max_expansion):
                    found.update(res)
                self._expansion_cache[ck] = sorted(found)[:fz.max_expansion]
            expansions[ck] = self._expansion_cache[ck]
        # wildcard/regexp share one loop shape: field + pattern ship as
        # SEPARATE fan-out args (an expansion key is an opaque cache
        # handle, never re-parsed — patterns may contain ':')
        for method, nodes in (("expand_wildcard", collect_wildcards(ast)),
                              ("expand_regexp", collect_regexps(ast))):
            for nd in nodes:
                key = nd.expansion_key()
                ck = (key, nd.max_expansion)
                if ck not in self._expansion_cache:
                    found = set()
                    for res in self._fanout(method, nd.field, nd.pattern,
                                            nd.max_expansion):
                        found.update(res)
                    self._expansion_cache[ck] = \
                        sorted(found)[:nd.max_expansion]
                expansions[ck] = self._expansion_cache[ck]
        range_keys: set[tuple] = set()
        for r in collect_ranges(ast):
            key = r.expansion_key()
            ck = (key, r.max_expansion)
            range_keys.add(ck)
            if ck not in self._expansion_cache:
                lo_key, hi_key = r.range_keys()
                found = set()
                for res in self._fanout("expand_range", lo_key, hi_key,
                                        r.max_expansion):
                    found.update(res)
                if len(found) > r.max_expansion:
                    # a truncated range is a silently WRONG filter (docs in
                    # range would be dropped) — fail loudly instead
                    raise ValueError(
                        f"numeric range {key} expands to more than "
                        f"max_expansion={r.max_expansion} distinct terms; "
                        f"raise NumericRange.max_expansion or narrow the "
                        f"range")
                self._expansion_cache[ck] = sorted(found)
            expansions[ck] = self._expansion_cache[ck]
        term_counts = collect_scoring_terms(ast)
        # expanded terms join the scoring set ONLY for expansion nodes in
        # scoring position (± polarity like collect_scoring_terms):
        # Filter-gated expansions evaluate but never score, and numeric
        # ranges are always gates (filter.py)
        scoring_pol: dict[str, int] = {}
        for nd, pol in collect_scoring_expansions(ast):
            ek = ((nd.term_key_prefix() if isinstance(nd, Prefix)
                   else nd.expansion_key()), nd.max_expansion)
            scoring_pol[ek] = scoring_pol.get(ek, 0) + pol
        for key, terms in expansions.items():
            if key in range_keys:
                continue
            pol = scoring_pol.get(key, 0)
            if pol == 0:
                continue  # gate-only (or fully-negated) expansion
            for t in terms:
                term_counts[t] = term_counts.get(t, 0) + pol
        if not need_stats:
            return expansions, term_counts, {}
        # c > 0: purely-negated terms (count −1) never score, so their
        # global stats are never read — don't pay a fan-out round for them
        need = sorted(t for t, c in term_counts.items() if c > 0)
        missing = [t for t in need if t not in self._stats_cache]
        if missing:
            fresh: dict[str, tuple[int, int]] = {}
            for res in self._fanout("term_stats", missing):
                for t, (df, cf) in res.items():
                    d0, c0 = fresh.get(t, (0, 0))
                    fresh[t] = (d0 + df, c0 + cf)
            for t in missing:  # cache absent terms too (df = cf = 0)
                self._stats_cache[t] = fresh.get(t, (0, 0))
        stats = {t: self._stats_cache[t] for t in need
                 if self._stats_cache[t][0] > 0}
        return expansions, term_counts, stats

    def _boosts_for(self, ast: Node,
                    expansions: dict[str, list[str]]) -> dict | None:
        """Resolve term-level boosts, spreading boosted Fuzzy/Prefix
        multipliers over their expanded terms."""
        boosts = collect_boosts(ast)
        for key, m in collect_expansion_boosts(ast).items():
            for t in expansions.get(key, []):
                boosts[t] = boosts.get(t, 1.0) * m
        return boosts or None

    def topk(self, query: "str | Node | list[str]", k: int = 10,
             strategy: str = "bm25", use_wand: bool = False,
             after: tuple[float, int] | None = None) -> pa.Table:
        """Top-k search. ``query``: query string (Lucene-ish), list of terms
        (AND semantics, like the reference's test queries), or a Filter AST.
        Returns (doc_id, score) ordered score desc, doc_id desc.

        ``after=(score, doc_id)``: continuation — the next page strictly
        below that rank position (reference pagination report semantics,
        ``FullTextReport.java:10-24``)."""
        ast = self._to_ast(query)
        if strategy == "time":
            # TIME continuation: after = (ts_us, doc_id) — topk returns
            # ts-as-score for this strategy, so the caller's cursor is
            # already in that shape
            t_after = (int(after[0]), int(after[1])) if after else None
            return self.topk_time(ast, k, after=t_after)
        expansions, term_counts, stats = self._prepare(ast)
        boosts = self._boosts_for(ast, expansions)
        parts = self._fanout("search", ast, k, strategy, term_counts, stats,
                             expansions, use_wand, after, boosts)
        docs = np.concatenate([p["doc_ids"] for p in parts])
        scores = np.concatenate([p["scores"] for p in parts])
        docs, scores = S.topk_by_score(docs, scores, k)
        return pa.table({"doc_id": pa.array(docs),
                         "score": pa.array(np.round(scores, 6))})

    def explain(self, query, doc_id: int, strategy: str = "bm25") -> dict:
        """Score explanation for ONE document — the per-term inputs and
        contributions behind its :meth:`topk` score (the reference ships a
        ``MiruSolution`` + solution log with every answer,
        ``miru-api/.../solution/MiruSolution.java``; Lucene's
        ``explain()`` is the public analogue of the per-term breakdown).

        Returns ``{"doc_id", "dl", "strategy", "alive", "total",
        "terms": pa.Table}`` where the table has one row per scoring term
        (ascending term order — the engine's deterministic accumulation
        order) with (term, qcount, df, cf, tf, boost, contribution), and
        ``total`` reproduces the doc's exhaustive-scoring result to the
        same float64 accumulation, rounded to 6 decimals like topk.
        Terms absent from the doc appear with tf = 0 and contribution 0.
        A tombstoned doc reports ``alive=False`` (its would-be score is
        still explained — removal gates answers, not arithmetic)."""
        ast = self._to_ast(query)
        expansions, term_counts, stats = self._prepare(ast)
        boosts = self._boosts_for(ast, expansions) or {}
        doc_id = int(doc_id)
        reader_i = self._pid_to_reader().get(
            doc_id // self.cfg.docs_per_partition)
        if reader_i is None:
            raise KeyError(f"doc {doc_id} is outside the index")
        terms = sorted(t for t, c in term_counts.items()
                       if c > 0 and t in stats)
        info = self._fanout("doc_term_info", doc_id, terms,
                            readers=[reader_i])[0]
        if info is None:
            raise KeyError(f"doc {doc_id} is outside the index")
        n_docs = self.manifest["n_docs"]
        avgdl = self.manifest["avgdl"] if self.manifest["avgdl"] > 0 else 1.0
        dl = info["dl"]
        rows, total = [], 0.0
        for t in terms:  # ascending — the deterministic accumulation order
            qc = term_counts[t]
            df, cf = stats[t]
            tf = info["tfs"][t]
            w = 0.0
            if tf > 0:
                w = float(S.term_weight_arrays(
                    strategy, qc, df, cf, n_docs, avgdl,
                    self.cfg.k1, self.cfg.b,
                    np.array([tf], np.float64),
                    np.array([dl], np.float64))[0])
            contrib = w * boosts.get(t, 1.0)
            total += contrib
            rows.append((t, qc, df, cf, tf, boosts.get(t, 1.0), contrib))
        table = pa.table({
            "term": pa.array([r[0] for r in rows], pa.string()),
            "qcount": pa.array([r[1] for r in rows], pa.int64()),
            "df": pa.array([r[2] for r in rows], pa.int64()),
            "cf": pa.array([r[3] for r in rows], pa.int64()),
            "tf": pa.array([r[4] for r in rows], pa.int64()),
            "boost": pa.array([r[5] for r in rows], pa.float64()),
            "contribution": pa.array([round(r[6], 6) for r in rows],
                                     pa.float64())})
        return {"doc_id": doc_id, "dl": dl, "strategy": strategy,
                "alive": bool(info["alive"]), "total": round(total, 6),
                "terms": table}

    def topk_paged(self, query, page_size: int = 10, max_pages: int = 100,
                   strategy: str = "bm25") -> pa.Table:
        """Iterate pagination to exhaustion: page i+1 resumes strictly below
        page i's lowest (score, doc_id).  Raw (unrounded) scores thread the
        continuation so page boundaries are exact.  ``strategy="time"``
        pages through :meth:`topk_time` with a (ts, doc_id) cursor and
        returns (doc_id, ts) like that method."""
        ast = self._to_ast(query)
        if strategy == "time":
            pages_t = []
            t_after = None
            for _ in range(max_pages):
                page = self.topk_time(ast, page_size, after=t_after)
                if not page.num_rows:
                    break
                pages_t.append(page)
                if page.num_rows < page_size:
                    break
                t_after = (
                    int(page["ts"].cast(pa.int64()).to_pylist()[-1]),
                    int(page["doc_id"].to_pylist()[-1]))
            if not pages_t:
                return pa.table({
                    "doc_id": pa.array([], pa.int64()),
                    "ts": pa.array([], pa.timestamp("us"))})
            return pa.concat_tables(pages_t)
        expansions, term_counts, stats = self._prepare(ast)
        boosts = self._boosts_for(ast, expansions)
        pages = []
        after = None
        for _ in range(max_pages):
            parts = self._fanout("search", ast, page_size, strategy,
                                 term_counts, stats, expansions, False,
                                 after, boosts)
            docs = np.concatenate([p["doc_ids"] for p in parts])
            scores = np.concatenate([p["scores"] for p in parts])
            docs, scores = S.topk_by_score(docs, scores, page_size)
            if not len(docs):
                break
            pages.append((docs, scores))
            if len(docs) < page_size:
                # a short page proves exhaustion (every reader returned
                # all its qualifying docs) — skip the empty-page round
                break
            after = (float(scores[-1]), int(docs[-1]))
        if not pages:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        return pa.table({
            "doc_id": pa.array(np.concatenate([d for d, _ in pages])),
            "score": pa.array(np.round(np.concatenate([s for _, s in pages]), 6)),
        })

    def _zone_maps(self) -> dict[int, tuple[int, int]]:
        if not hasattr(self, "_zone_cache"):
            zm: dict[int, tuple[int, int]] = {}
            for res in self._fanout("zone_maps"):
                zm.update(res)
            self._zone_cache = zm
        return self._zone_cache

    def topk_time(self, query, k: int = 10,
                  after: tuple | None = None) -> pa.Table:
        """TIME strategy with newest-first early termination: partitions
        are visited in descending max-ts order, one reader-wide wave at a
        time, and the walk STOPS once k results are in hand whose k-th ts
        strictly beats the best possible ts of every unvisited partition
        (the reference evaluates newest partitions first and stops when
        the answer is satisfied: ``FullTextAnswerEvaluator.java:19-40``,
        loop ``MiruService.askAndMerge:147-179``).  Ties on the bound
        continue — doc_id tie-break could still be won by an older
        partition.

        ``after=(ts_us, doc_id)``: pagination cursor — only matches
        strictly below that rank position qualify.  The early-exit bound
        stays valid (the k-th KEPT ts beating an unvisited zone's max ts
        still beats every qualifying doc there)."""
        ast = self._to_ast(query)
        expansions, _tc, _st = self._prepare(ast, need_stats=False)
        zm = self._zone_maps()
        order = sorted(zm, key=lambda p: zm[p][1], reverse=True)
        pid_reader = self._pid_to_reader()
        n_wave = max(1, len(self.readers))
        shared = ray.put((ast, k, expansions, after)) \
            if self.use_actors else None
        docs = np.empty(0, np.int64)
        ts = np.empty(0, np.int64)
        evaluated = 0
        pos = 0
        while pos < len(order):
            wave = order[pos:pos + n_wave]
            pos += len(wave)
            evaluated += len(wave)
            by_reader: dict[int, list[int]] = defaultdict(list)
            for p in wave:
                by_reader[pid_reader[p]].append(p)
            ridx = sorted(by_reader)
            if self.use_actors:
                parts = self._recoverable_get(
                    ridx,
                    lambda i, pool=0: self._pools[pool][i]
                    .topk_time_packed.remote(shared, by_reader[i]))
            else:
                parts = [self.readers[i].topk_time(ast, k, expansions,
                                                   by_reader[i], after)
                         for i in ridx]
            docs = np.concatenate([docs] + [p["doc_ids"] for p in parts])
            ts = np.concatenate([ts] + [p["ts"] for p in parts])
            sel = np.lexsort((docs, ts))[::-1][:k]
            docs, ts = docs[sel], ts[sel]
            if len(docs) == k and pos < len(order):
                next_bound = zm[order[pos]][1]
                if int(ts[-1]) > next_bound:
                    break  # no unvisited partition can alter the top-k
        self.last_time_partitions_evaluated = evaluated
        return pa.table({"doc_id": pa.array(docs),
                         "ts": pa.array(ts).cast(pa.timestamp("us"))})

    def _pid_to_reader(self) -> dict[int, int]:
        if not hasattr(self, "_pid_reader_cache"):
            self._pid_reader_cache = {
                pid: i for i, pids in enumerate(self._assignment)
                for pid in pids}
        return self._pid_reader_cache


    def count(self, query) -> int:
        ast = self._to_ast(query)
        expansions, _tc, _st = self._prepare(ast, need_stats=False)
        return sum(p["count"] for p in self._fanout("match", ast, expansions))

    def facet_counts(self, field: str, gate, *, prefix: str = "",
                     cap: int = 1000) -> dict[str, int]:
        """Facet primitive: distinct ``field`` values (term-dictionary
        enumeration, optionally under a value ``prefix``) + per-value
        matching-doc counts under ``gate``, in ONE batched fan-out per
        filter batch (:meth:`PartitionReader.term_match_counts`) instead
        of one cluster round-trip per value.  Enumeration past ``cap``
        is a LOUD failure — a silently dropped lexicographic tail would
        misreport the facet (same rule as NumericRange's bound)."""
        keys: set[str] = set()
        for res in self._fanout("expand_prefix", f"{field}:{prefix}",
                                cap + 1):
            keys.update(res)
        if len(keys) > cap:
            raise ValueError(
                f"facet over {field!r} exceeds {cap} distinct values; "
                "facet on an enum-cardinality field or raise the cap")
        ast = self._to_ast(gate)
        expansions, _tc, _st = self._prepare(ast, need_stats=False)
        ordered = sorted(keys)
        out: dict[str, int] = {k.split(":", 1)[1]: 0 for k in ordered}
        for part in self._fanout("term_match_counts", ast, ordered,
                                 expansions):
            for k, c in part.items():
                out[k.split(":", 1)[1]] += int(c)
        return out

    def waveform(self, query, lo: int, hi: int, n: int) -> np.ndarray:
        """Time-bucket histogram of matching docs: ``[lo, hi)`` µs split
        into ``n`` equal segments, summed across readers — the
        AnalyticsQuery per-filter waveform (reference:
        ``miru-analytics-plugins/.../AnalyticsQuery.java:14-28``).  Each
        reader returns one int64[n] partial from postings + ts arrays
        (no docstore access), so the fan-in is O(readers × n)."""
        return self.waveforms([query], lo, hi, n)[0]

    def waveforms(self, queries: list, lo: int, hi: int,
                  n: int) -> np.ndarray:
        """Batched :meth:`waveform`: ``(len(queries), n)`` histograms in
        ONE reader fan-out — the Analytics answerer's many named filters
        and Trending's per-distinct-term filters ship as one packed batch
        instead of one fan-out round per filter
        (``TrendingQuestion.java:138-199`` batches exactly this way via
        ``Analytics.analyze`` over term-keyed filters)."""
        if n < 1:  # AnalyticsQueryScoreSet.java:29
            raise ValueError("Segments must be at least 1")
        if n > 100_000:
            # each reader materializes a (filters × n) int64 partial;
            # an unbounded client-supplied n is a memory DoS, not a
            # resolution anyone renders — fail loudly
            raise ValueError("divideTimeRangeIntoNSegments capped at "
                             f"100000 (got {n})")
        if hi <= lo:  # the score set requires an explicit, non-empty range
            raise ValueError("waveform needs lo < hi (an explicit time "
                             "range; ScoreSet rejects ALL_TIME)")
        if (int(hi) - int(lo)) > (2 ** 63 - 1) // n:
            # the reader's segment math is (ts - lo) * n // width in
            # int64; a client window wide enough to overflow it must
            # fail loudly, not wrap into negative bincount indexes
            raise ValueError(f"time range width {int(hi) - int(lo)} µs × "
                             f"{n} segments overflows the segment "
                             "arithmetic; narrow the window or lower n")
        asts = [self._to_ast(q) for q in queries]
        expansions: dict = {}
        for ast in asts:  # per-key fan-outs dedupe via _expansion_cache
            exp, _tc, _st = self._prepare(ast, need_stats=False)
            expansions.update(exp)
        parts = self._fanout("waveform_multi", asts, expansions,
                             int(lo), int(hi), int(n))
        if not parts:
            return np.zeros((len(asts), n), np.int64)
        return np.sum(np.stack(parts), axis=0).astype(np.int64)

    def count_at_least(self, query, n: int) -> bool:
        """Early-exit threshold count — does the query match at least ``n``
        docs?  The ``MiruAnswerEvaluator.isDone`` analogue
        (``miru-plugin/.../solution/MiruAnswerEvaluator.java``: a solver
        stops fanning out once the accumulated answer satisfies the
        evaluator): per-reader counts are consumed AS THEY ARRIVE
        (``ray.wait``) and the remaining calls are abandoned the moment the
        partial sum reaches ``n`` — an existence check (n=1) over a
        many-partition index stops after the first non-empty answer
        instead of paying the full fan-out.  Unanswered calls are
        best-effort cancelled; any reader failure falls back to the exact
        :meth:`count` (correctness never rides the fast path).
        ``last_count_readers_answered`` records how many readers were
        actually consumed (observability, like the TIME early-exit
        counter)."""
        n = int(n)
        self.last_count_readers_answered = 0
        if n <= 0:
            return True
        ast = self._to_ast(query)
        expansions, _tc, _st = self._prepare(ast, need_stats=False)
        total = 0
        if not self.use_actors:
            for i, r in enumerate(self.readers):
                total += r.match(ast, expansions)["count"]
                self.last_count_readers_answered = i + 1
                if total >= n:
                    return True
            return False
        packed = ray.put(((ast, expansions), {}))
        pending = [self._pools[0][i].call_packed.remote("match", packed)
                   for i in range(len(self.readers))]
        try:
            while pending:
                done, pending = ray.wait(pending, num_returns=1,
                                         timeout=self.fanout_timeout_s)
                if not done:  # hung reader: exact path handles respawn
                    raise ray.exceptions.GetTimeoutError("count_at_least")
                total += ray.get(done[0])["count"]
                self.last_count_readers_answered += 1
                if total >= n:
                    for ref in pending:  # abandon the rest (isDone)
                        try:
                            ray.cancel(ref)
                        except Exception:
                            pass
                    return True
            return False
        except (ray.exceptions.RayActorError,
                ray.exceptions.GetTimeoutError):
            return self.count(query) >= n

    def match_docs(self, query) -> np.ndarray:
        ast = self._to_ast(query)
        expansions, _tc, _st = self._prepare(ast, need_stats=False)
        parts = self._fanout("match", ast, expansions, True)
        return np.sort(np.concatenate([p["doc_ids"] for p in parts]))

    # ---------------- per-stream unread tracking ----------------
    # The reference keeps a per-(tenant, streamId) unread bitmap
    # (MiruUnreadTrackingIndex) populated by the JIT backfillerizer's
    # READ/UNREAD marker state machine
    # (MiruJustInTimeBackfillerizer.java:40-346).  Here the markers
    # reduce to an effective ts watermark — the SAME reduction the
    # events pipeline proves in ops/analytics.unread_backfill: a doc is
    # unread iff ts > (last_read if last_read > last_unread else −∞) —
    # or, for doc-level receipts, an explicit sorted doc-id set
    # (bounded by the stream's inbox size; watermark mode is the scale
    # path).  In-memory per Searcher: durable unread is the WAL /
    # delivery side's job (index/delivery.py), not the query planner's.

    def _stream_markers(self, stream_id: str) -> dict:
        """The stream's marker-state dict, replacing any doc-level
        receipt set (a marker supersedes ``set_stream_unread`` state —
        and vice versa — so the two modes never mix)."""
        st = self._stream_unread.setdefault(
            str(stream_id), {"last_read": None, "last_unread": None})
        if "ids" in st:  # receipts -> watermark transition
            st.clear()
            st.update({"last_read": None, "last_unread": None})
        return st

    def mark_read(self, stream_id: str, up_to_ts_us: int) -> None:
        """READ marker: clears every doc with ts <= up_to_ts_us."""
        st = self._stream_markers(stream_id)
        st["last_read"] = max(st["last_read"] or -(2 ** 62),
                              int(up_to_ts_us))

    def mark_unread(self, stream_id: str, up_to_ts_us: int) -> None:
        """UNREAD marker: re-marks every doc with ts <= up_to_ts_us
        (ties vs a READ at the same ts: UNREAD wins — re-marking is the
        destructive direction, same rule as unread_backfill)."""
        st = self._stream_markers(stream_id)
        st["last_unread"] = max(st["last_unread"] or -(2 ** 62),
                                int(up_to_ts_us))

    def set_stream_unread(self, stream_id: str, doc_ids) -> None:
        """Doc-level unread receipts: the stream's unread set IS this
        doc-id list (replaces any marker state)."""
        self._stream_unread[str(stream_id)] = {
            "ids": np.sort(np.asarray(doc_ids, np.int64))}

    def stream_unread_flags(self, stream_id: str, doc_ids: np.ndarray,
                            ts_us: np.ndarray) -> np.ndarray:
        """Per-doc unread flags for a stream.  An UNKNOWN stream is all
        unread (the reference backfills a missing unread bitmap from the
        full stream — nothing read yet)."""
        st = self._stream_unread.get(str(stream_id))
        if st is None:
            return np.ones(len(doc_ids), bool)
        if "ids" in st:
            from ..util import sorted_lookup
            hit, _ = sorted_lookup(st["ids"],
                                   np.asarray(doc_ids, np.int64))
            return hit
        lr = st.get("last_read")
        lu = st.get("last_unread")
        wm = lr if (lr is not None and (lu is None or lr > lu)) \
            else -(2 ** 62)
        return np.asarray(ts_us, np.int64) > np.int64(wm)

    def gather(self, doc_ids, columns=("conv_id", "turn_idx", "text")) -> pa.Table:
        dpp = self.cfg.docs_per_partition
        by_reader = defaultdict(list)
        pid_to_reader = self._pid_to_reader()
        for d in np.asarray(doc_ids):
            by_reader[pid_to_reader[int(d) // dpp]].append(int(d))
        if self.use_actors:
            # through the recoverable/hedged machinery: a dead pool-0
            # actor that hedged READS tolerate must not crash gather
            order = sorted(by_reader)
            parts = self._recoverable_get(
                order,
                lambda i, pool=0: self._pools[pool][i].gather.remote(
                    by_reader[i], list(columns)))
        else:
            parts = [self.readers[i].gather(ids, list(columns))
                     for i, ids in by_reader.items()]
        parts = [p for p in parts if p.num_rows]
        return pa.concat_tables(parts) if parts else pa.table({})

    def remove_docs(self, doc_ids) -> int:
        """Tombstone documents (REMOVE semantics: the reference's removal
        index excludes them from every answer, ``MiruRemovalIndex``).
        Persists to tombstones.json and pushes to live readers."""
        tpath = os.path.join(self.index_dir, "tombstones.json")
        existing = set(read_json(tpath)) if os.path.exists(tpath) else set()
        existing.update(int(d) for d in doc_ids)
        doc_list = sorted(existing)
        atomic_write_json(tpath, doc_list)
        counts = self._fanout("load_tombstones", doc_list,
                              all_replicas=True)
        # bump the mutation epoch so derived-model caches keyed on it
        # (e.g. the strut model memo) stop serving pre-removal counts
        self.mutation_epoch = getattr(self, "mutation_epoch", 0) + 1
        return sum(counts)

    def refresh_partitions(self, pids: list[int] | None = None) -> int:
        """Push an in-place index mutation (REPAIR / upsert,
        ``miru_ray.index.repair``) to every live reader replica: reload
        the manifest, drop the driver-side stats/expansion caches (df/cf
        changed), bump the mutation epoch, and fan the partition reload
        out to ALL replica pools (racing would leave losers stale —
        same rule as tombstone loads).  Returns the total partitions
        reloaded across readers."""
        self.manifest = read_json(
            os.path.join(self.index_dir, "manifest.json"))
        self._stats_cache.clear()
        self._expansion_cache.clear()
        self.mutation_epoch = getattr(self, "mutation_epoch", 0) + 1
        counts = self._fanout("reload_partitions", pids,
                              all_replicas=True)
        return sum(counts)

    def _to_ast(self, query) -> Node:
        if isinstance(query, Node):
            return query
        # analyzer parity: the query side drops the same stopwords the
        # index dropped (otherwise an AND containing a stopword matches
        # nothing — its postings were never written)
        stop = EN_STOPWORDS if self.cfg.remove_stopwords else None
        if isinstance(query, (list, tuple)):
            terms = [t for t in query if not stop or t not in stop]
            # all-stopword queries match NOTHING (Lucene semantics; the
            # parser path returns Or(()) for the same effective query —
            # And(()) would be match-ALL)
            return and_terms(terms) if terms else Or(())
        return parse_query(query, stopwords=stop)

    def close(self):
        if self.use_actors:
            for pool in self._pools:
                for r in pool:
                    ray.kill(r)
        self.readers = []
        self._pools = [self.readers]
