"""Post-commit index enrichment — the FullText gatherer analogue.

Reference: ``FullTextGatherer`` lazily derives extra terms from STORED
fields after a partition commits, resuming from a progress watermark kept
in the sip index (``miru-stream-plugins/.../fulltext/FullTextGatherer.java:
85-105``, watermark get/setCustom at :205,242; external term feed
``FullTextTermProvider.java:14-30``).

Here :func:`gather_terms` runs a user gatherer over every doc-store
partition and merges the produced postings into that partition's segment
cells (decode → concat → re-encode → atomic replace — the same compaction
primitive the append path uses).  The per-partition watermark lives in the
manifest under ``gather.<name>.done_pids`` and is advanced as each
partition commits, so a crashed run resumes where it stopped and re-running
a completed gather is a no-op.

Contract: gathered terms MUST be namespaced ``field:value`` (contain a
``:``) — the tokenizer can never emit ``:``, so enriched terms are
disjoint from text terms and collection stats (total_len/avgdl) stay
untouched.  Queries reach them through the normal Filter AST
(``Term(field, value)``).
"""

from __future__ import annotations

import os
from collections.abc import Callable

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from ..config import IndexConfig
from ..util import atomic_write_json, read_json, term_shard
from .segments import (empty_pos_column, encode_segment_table,
                       segment_rel_path,
                       segment_to_rows, write_segment)


def gather_terms(index_dir: str,
                 gatherer: Callable[[pa.Table], pa.Table],
                 name: str,
                 columns: list[str] | None = None,
                 _crash_after_pids: int | None = None) -> dict:
    """Enrich every partition with ``gatherer``'s terms; returns the
    updated manifest.

    ``gatherer(batch)`` receives doc-store rows (``doc_id`` + ``columns``)
    and returns a (term, doc_id, tf) table whose terms are all namespaced
    (``field:value``).  ``_crash_after_pids`` is a test hook simulating a
    crash mid-gather.
    """
    manifest_path = os.path.join(index_dir, "manifest.json")
    manifest = read_json(manifest_path)
    cfg = IndexConfig.from_dict(manifest["config"])
    nsh = cfg.num_shards
    positional = bool(getattr(cfg, "positional_fields", ()))
    _empty_pos = empty_pos_column  # captured for the remote closure
    state = manifest.get("gather", {}).get(name, {"done_pids": []})
    done = set(state["done_pids"])
    cols = ["doc_id"] + list(columns or cfg.text_fields)

    # ship the gatherer BY VALUE: user gatherers typically live in modules
    # the Ray workers cannot import (scripts, tests) — the reference's term
    # providers are likewise externally supplied (FullTextTermProvider)
    import inspect

    import cloudpickle
    mod = inspect.getmodule(gatherer)
    registered = False
    try:
        if mod is not None and not mod.__name__.startswith("miru_ray"):
            cloudpickle.register_pickle_by_value(mod)
            registered = True
        gatherer_payload = cloudpickle.dumps(gatherer)
    finally:
        if registered:
            cloudpickle.unregister_pickle_by_value(mod)

    @ray.remote(num_cpus=1)
    def enrich_partition(pid: int) -> list[tuple[int, int, int, int, int]]:
        # runtime imports limited to installed packages — workers may not
        # have the repo on sys.path; miru_ray names arrive via the closure
        import cloudpickle as _cp
        import pyarrow.compute as _pc
        fn = _cp.loads(gatherer_payload)
        pdir = os.path.join(index_dir, "docstore", f"partition={pid}")
        t = pq.ParquetDataset(pdir).read(columns=cols)
        new = fn(t)
        if new.num_rows:
            terms = np.asarray(new["term"].to_pandas(), dtype=object)
            if not all(":" in s for s in terms):
                raise ValueError(
                    f"gather {name!r}: terms must be namespaced field:value")
            shard_of = term_shard(terms, nsh)
        else:
            shard_of = np.empty(0, np.int64)
        out = []
        for shard in range(nsh):
            add = new.filter(pa.array(shard_of == shard)) if new.num_rows \
                else new
            path = os.path.join(index_dir, segment_rel_path(pid, shard))
            if add.num_rows == 0:
                continue  # nothing to merge — the existing segment (and
                #           its manifest entry) are already correct; a
                #           decode/re-encode/rewrite would be pure waste
            rows = add.select(["term", "doc_id", "tf"])
            if positional:
                # a positional index's segments carry a pos column — pad
                # empty runs (gathered keyword terms have no positions)
                # so the concat aligns AND a delta-only cell still writes
                # pos_bytes (a mixed-schema dir would fail compaction);
                # same treatment as upgrade.py's merge_cell
                rows = rows.append_column("pos",
                                          _empty_pos(rows.num_rows))
            if os.path.exists(path):
                rows = pa.concat_tables([segment_to_rows(path), rows])
            seg = encode_segment_table(rows)
            write_segment(seg, path)  # atomic replace
            kw = _pc.match_substring(seg["term"], ":")
            cf_text = int(_pc.sum(_pc.if_else(kw, 0, seg["cf"])).as_py() or 0)
            # postings count from the ENCODED segment (Σ df): idempotent
            # under re-enrichment (input rows may carry dedup-able repeats)
            n_post = int(_pc.sum(seg["df"]).as_py() or 0)
            out.append((pid, shard, seg.num_rows, n_post, cf_text))
        return out

    pending = [p["pid"] for p in manifest["partitions"] if p["pid"] not in done]
    n_done_this_run = 0
    for pid, fut in [(pid, enrich_partition.remote(pid)) for pid in pending]:
        cells = ray.get(fut)
        seg_by_key = {(s["pid"], s["shard"]): s for s in manifest["segments"]}
        for p_, s_, nt, np_, ct in cells:
            seg_by_key[(p_, s_)] = {
                "pid": p_, "shard": s_, "path": segment_rel_path(p_, s_),
                "n_terms": int(nt), "n_postings": int(np_),
                "cf_text": int(ct)}
        manifest["segments"] = sorted(seg_by_key.values(),
                                      key=lambda r: (r["pid"], r["shard"]))
        done.add(pid)
        manifest.setdefault("gather", {})[name] = {
            "done_pids": sorted(done)}
        atomic_write_json(manifest_path, manifest)  # per-pid watermark
        n_done_this_run += 1
        if _crash_after_pids is not None \
                and n_done_this_run >= _crash_after_pids:
            raise RuntimeError("simulated crash mid-gather")
    return manifest
