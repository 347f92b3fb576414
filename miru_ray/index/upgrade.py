"""Additive schema evolution: add fields to a live index WITHOUT a wipe.

Reference: ``MiruSchema.checkAdditive``
(``miru-api/.../activity/schema/MiruSchema.java:303-314``) allows a new
schema version when every existing field keeps its definition and new
fields only extend it; obsolete-schema partitions then re-index through
the "upgrading" partition state (``MiruPartitionState.java:15``).

Here the additive delta is cheap and exact: new keyword / list-keyword /
numeric fields contribute ``field:value`` terms with tf = 1 and ZERO
doc-length effect (doclen sums only tokenized terms), so the upgrade

1. derives ONLY the new fields' posting rows from the docstore (which
   stores every input column) via the same ``make_postings_fn`` the full
   build uses, restricted to the added fields,
2. spills them partitioned by gkey (the build's external-shuffle layout),
3. per touched (partition, shard) cell: decodes the existing segment back
   to (term, doc_id, tf) rows (``segment_rows_table`` — the compaction
   decode path), concatenates the delta rows, and re-encodes — the same
   deterministic sort+encode as a fresh build, so the result is
   BYTE-IDENTICAL to building from scratch with the new config (tested).

Text-field additions change doclen/avgdl/BM25 for every doc and are NOT
additive here — they raise, directing to a full rebuild (the reference
draws the same line: analyzer-affecting changes are not ``checkAdditive``).

Crash safety: segments rewrite one cell at a time (atomic replace); the
manifest flips to the new config only at the end.  A re-run after a crash
re-merges cells whose segments already carry the delta — the encoder's
exact-duplicate (term, doc) drop makes that idempotent (kw/numeric delta
rows always have tf = 1, identical to what the crashed run wrote).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq

import ray

from ..config import IndexConfig
from ..util import atomic_write_json, read_json, read_parquet_clean
from .build import (MANIFEST_VERSION, _build_tag, _spill_postings,
                    cell_stats, doclen_rel_path, make_postings_fn,
                    write_doclen_partial)
from .segments import (empty_pos_column, encode_segment_table,
                       segment_rel_path, segment_to_rows, write_segment)


def check_additive(old: IndexConfig, new: IndexConfig) -> dict:
    """Added fields per kind when ``new`` is an additive extension of
    ``old``; raises ``ValueError`` otherwise (MiruSchema.checkAdditive
    semantics: nothing existing may change or vanish)."""
    problems = []
    if tuple(old.text_fields) != tuple(new.text_fields):
        problems.append("text_fields differ (changes doclen/avgdl — "
                        "full rebuild required)")
    if tuple(getattr(old, "phrase_bigram_fields", ())) != tuple(
            getattr(new, "phrase_bigram_fields", ())):
        problems.append("phrase_bigram_fields differ (bigram postings "
                        "derive from text — full rebuild required)")
    if tuple(getattr(old, "positional_fields", ())) != tuple(
            getattr(new, "positional_fields", ())):
        problems.append("positional_fields differ (position streams "
                        "derive from text — full rebuild required; an "
                        "exec-knob flip would leave phrase queries "
                        "reading positions that were never stored)")
    for knob in ("docs_per_partition", "num_shards", "remove_stopwords"):
        if getattr(old, knob) != getattr(new, knob):
            problems.append(f"{knob} differs")
    added = {}
    for kind in ("keyword_fields", "list_keyword_fields", "numeric_fields"):
        o, n = list(getattr(old, kind)), list(getattr(new, kind))
        missing = [f for f in o if f not in n]
        if missing:
            problems.append(f"{kind} removed: {missing}")
        added[kind] = tuple(f for f in n if f not in o)
    # power-bits pairs are additive like any keyword field (their terms
    # derive from a stored int column, tf=1, zero doclen effect); a
    # removed or re-sourced pair is not
    o_pb = [tuple(p) for p in getattr(old, "power_bits_fields", ())]
    n_pb = [tuple(p) for p in getattr(new, "power_bits_fields", ())]
    missing_pb = [p for p in o_pb if p not in n_pb]
    if missing_pb:
        problems.append(f"power_bits_fields removed: {missing_pb}")
    added["power_bits_fields"] = tuple(p for p in n_pb if p not in o_pb)
    # generic guard: any OTHER content-config difference (ts_field,
    # id_fields, a future content knob) is NOT additive — diffing
    # content_dict() instead of a hand-kept whitelist means a new config
    # field can't silently slip through as "exec-knob-only"
    checked = {"text_fields", "phrase_bigram_fields", "positional_fields",
               "docs_per_partition", "num_shards", "remove_stopwords",
               "keyword_fields", "list_keyword_fields", "numeric_fields",
               "power_bits_fields"}
    oc, nc2 = old.content_dict(), new.content_dict()
    for key in sorted(set(oc) | set(nc2)):
        if key not in checked and oc.get(key) != nc2.get(key):
            problems.append(f"{key} differs (content field — a change "
                            "requires a rebuild)")
    if problems:
        raise ValueError("config change is not additive: "
                         + "; ".join(problems))
    return added


def upgrade_index(index_dir: str, new_cfg: IndexConfig) -> dict:
    """Additively upgrade the index at ``index_dir`` to ``new_cfg``;
    returns the new manifest.  No-op when the content config is already
    current."""
    manifest_path = os.path.join(index_dir, "manifest.json")
    m = read_json(manifest_path)
    if m.get("version") != MANIFEST_VERSION:
        raise ValueError(
            f"index format version {m.get('version')} != "
            f"{MANIFEST_VERSION}: an additive upgrade would re-encode "
            "only touched cells into the new format and leave a MIXED "
            "index — rebuild (or compact) to the current format first")
    added = check_additive(IndexConfig.from_dict(m["config"]), new_cfg)
    added_pb = added.pop("power_bits_fields")
    new_fields = [f for kind in added.values() for f in kind]
    fp = m["fingerprint"]
    new_tag = _build_tag(fp, new_cfg)
    if not new_fields and not added_pb:
        m["config"] = new_cfg.to_dict()  # exec-knob-only change
        atomic_write_json(manifest_path, m)
        return m

    # [1] delta postings from the docstore (it stores every input column;
    # power-bits terms derive from their SOURCE column there)
    delta_cfg = IndexConfig(
        text_fields=(),
        keyword_fields=added["keyword_fields"],
        list_keyword_fields=added["list_keyword_fields"],
        numeric_fields=added["numeric_fields"],
        power_bits_fields=added_pb,
        docs_per_partition=new_cfg.docs_per_partition,
        num_shards=new_cfg.num_shards,
        remove_stopwords=new_cfg.remove_stopwords)
    docstore_dir = os.path.join(index_dir, "docstore")
    read_cols = list(dict.fromkeys(
        ["doc_id", *new_fields] + [src for _f, src in added_pb]))
    docs = read_parquet_clean(docstore_dir, columns=read_cols,
                              file_extensions=["parquet"])
    postings = docs.map_batches(make_postings_fn(delta_cfg),
                                batch_format="pyarrow", batch_size=8192)
    spill_dir = os.path.join(index_dir, "postings_spill_upgrade")
    _spill_postings(postings, spill_dir, {**new_tag, "stage": "upgrade"},
                    new_cfg.io_compression)

    # [2] merge-encode each TOUCHED cell (others keep their files + stats)
    nsh = new_cfg.num_shards
    # "pre-existing cell" is decided from the COMMITTED manifest, not the
    # filesystem: a crash between a new cell's segment write and its
    # doclen-sidecar write must not make the re-run think the cell was
    # always there and skip the sidecar forever
    old_cells = frozenset((s0["pid"], s0["shard"]) for s0 in m["segments"])

    positional = bool(getattr(new_cfg, "positional_fields", ()))

    @ray.remote(num_cpus=1)
    def merge_cell(gdir: str, pid: int, shard: int) -> dict:
        import pyarrow as pa
        delta = pq.ParquetDataset(gdir).read().select(
            ["term", "doc_id", "tf"])
        seg_path = os.path.join(index_dir, segment_rel_path(pid, shard))
        had_old = (pid, shard) in old_cells
        if positional:
            # positional index: upgrade deltas are keyword terms (no
            # positions) — pad empty runs so the concat aligns AND so a
            # brand-new cell still gets a pos_bytes column (a mixed
            # segment schema would silently strip positions at the next
            # compaction's whole-dir read)
            delta = delta.append_column(
                "pos", empty_pos_column(delta.num_rows))
        # a manifest-listed cell whose file is missing is CORRUPTION —
        # let the decode raise rather than silently dropping postings
        rows = (pa.concat_tables([segment_to_rows(seg_path), delta])
                if had_old else delta)
        seg, dl = encode_segment_table(rows, with_doclen=True)
        write_segment(seg, seg_path)
        # a brand-new cell needs its (possibly empty) doclen sidecar so
        # the dir is file-for-file identical to a fresh build; existing
        # sidecars are untouched (text rows unchanged)
        if not had_old:
            # NOTE: the miru_ray helpers referenced here (write_segment,
            # encode_segment_table, cell_stats, ...) are pickled BY
            # REFERENCE — workers must be able to import miru_ray, the
            # same requirement every map_batches stage in this package
            # already has.  (Only the siphon plugin path ships foreign
            # code by value.)
            write_doclen_partial(dl, index_dir, pid, shard)
        return cell_stats(seg, pid, shard)

    futs = []
    for d in sorted(os.listdir(spill_dir)):
        if not d.startswith("gkey="):
            continue
        gkey = int(d.split("=", 1)[1])
        futs.append(merge_cell.remote(os.path.join(spill_dir, d),
                                      gkey // nsh, gkey % nsh))
    updated = {(r["pid"], r["shard"]): r for r in ray.get(futs)}

    # [3] commit: new config + refreshed per-cell stats, atomic
    seg_rows = {(s["pid"], s["shard"]): s for s in m["segments"]}
    for key, r in updated.items():
        seg_rows[key] = {"pid": r["pid"], "shard": r["shard"],
                         "path": segment_rel_path(r["pid"], r["shard"]),
                         "n_terms": int(r["n_terms"]),
                         "n_postings": int(r["n_postings"]),
                         "cf_text": int(r["cf_text"])}
    m["segments"] = [seg_rows[k] for k in sorted(seg_rows)]
    m["config"] = new_cfg.to_dict()
    m["version"] = MANIFEST_VERSION
    atomic_write_json(manifest_path, m)
    # stage checkpoints now describe the NEW tag (a later build_index with
    # new_cfg must see them current, not wipe-and-rebuild)
    atomic_write_json(os.path.join(index_dir, "segments", "_META.json"),
                      new_tag)
    if os.path.exists(os.path.join(docstore_dir, "_SUCCESS")):
        atomic_write_json(os.path.join(docstore_dir, "_SUCCESS"), new_tag)
    import shutil
    shutil.rmtree(spill_dir, ignore_errors=True)
    return m
