"""Deterministic synthetic fixtures (FIXTURES.md) — seeded, no external data.

Two transcript sources, both with the authoritative input shape from
BASELINE.json ``input_hint``::

    conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
    ts:timestamp[us]

1. :func:`generate_transcripts` — the primary synthetic table (F1): Zipf
   vocabulary, Zipf turn counts, punctuation/mixed-case noise, seeded RNG.
   Scales xs / s / m (seed=42).  Used by pytest and bench.
2. :func:`derive_transcripts` — a transcripts view derived *deterministically*
   from the driver's ``documents`` table with an exactly-equivalent SQL
   mapping (:data:`DERIVE_SQL`), so DuckDB oracle queries can reproduce the
   engine's inputs bit-for-bit (the driver correctness gate only sees the
   pre-registered testdata views).
"""

from __future__ import annotations

import os
import string

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SEED = 42
SCALES = {"xs": 100, "s": 2_000, "m": 50_000, "l": 200_000,
          "xl": 600_000}  # conversations per scale

ROLES = ["user", "assistant", "system", "tool"]
_MULTILANG = [
    "héllo wörld café naïve",
    "日本語 テスト 検索",
    "добрый день мир",
    "mañana búsqueda año",
]


def _make_vocab(rng: np.random.Generator, size: int = 20_000) -> np.ndarray:
    letters = np.array(list(string.ascii_lowercase))
    lens = rng.integers(3, 10, size=size)
    words = ["".join(letters[rng.integers(0, 26, size=n)]) for n in lens]
    # ensure a stable hot head so queries have known hot terms
    head = ["alpha", "beta", "gamma", "delta", "query", "search", "index",
            "token", "merge", "shard", "actor", "batch", "stream", "score",
            "rank", "bm25"]
    words[: len(head)] = head
    return np.array(words, dtype=object)


def generate_transcripts(scale: str = "xs", seed: int = SEED) -> pa.Table:
    """Build the F1 transcripts table for a scale (xs/s/m). Deterministic."""
    n_convs = SCALES[scale]
    rng = np.random.default_rng(seed)
    vocab = _make_vocab(rng)
    V = len(vocab)
    zipf_p = 1.0 / np.arange(1, V + 1) ** 1.07
    zipf_p /= zipf_p.sum()

    # turns per conversation: Zipf-skewed 1..64
    turns_per_conv = np.minimum(64, np.maximum(1, rng.zipf(1.4, size=n_convs) * 3)).astype(np.int64)
    total = int(turns_per_conv.sum())
    conv_ord = np.repeat(np.arange(n_convs), turns_per_conv)
    turn_idx = (np.arange(total) - np.repeat(np.cumsum(turns_per_conv) - turns_per_conv, turns_per_conv)).astype(np.int32)
    conv_id = np.array([f"conv-{i:08d}" for i in range(n_convs)], dtype=object)[conv_ord]

    # roles: deterministic cycle with seeded noise
    role = np.array(ROLES, dtype=object)[np.where(rng.random(total) < 0.1,
                                                  rng.integers(2, 4, size=total),
                                                  turn_idx % 2)]
    tool_vocab = np.array([f"tool_{i:02d}" for i in range(20)], dtype=object)
    tool = np.where(rng.random(total) < 0.25, tool_vocab[rng.integers(0, 20, size=total)], "")

    # text: 5..400 tokens per turn, Zipf lengths, Zipf vocabulary
    tlen = np.minimum(400, 5 + (rng.zipf(1.6, size=total) * 4)).astype(np.int64)
    flat = rng.choice(V, size=int(tlen.sum()), p=zipf_p)
    words = vocab[flat].copy()
    # mixed-case + punctuation noise (tokenizer must normalize it away)
    capm = rng.random(len(words)) < 0.08
    words[capm] = pd.Series(words[capm]).str.capitalize().to_numpy(dtype=object)
    punct = rng.random(len(words))
    words[punct < 0.03] = words[punct < 0.03] + ","
    words[(punct >= 0.03) & (punct < 0.05)] = words[(punct >= 0.03) & (punct < 0.05)] + "."
    seg = np.repeat(np.arange(total), tlen)
    text = pd.Series(words).groupby(seg).agg(" ".join).to_numpy(dtype=object)
    # a few multilingual samples for tokenizer determinism
    ml = rng.random(total) < 0.005
    text[ml] = text[ml] + " " + np.array(_MULTILANG, dtype=object)[rng.integers(0, len(_MULTILANG), size=int(ml.sum()))]

    # ts: per-conv monotonic, interleaved globally (all turn k before turn k+1)
    order = np.lexsort((conv_ord, turn_idx))
    seq = np.empty(total, np.int64)
    seq[order] = np.arange(total)
    base = np.int64(1_704_067_200_000_000)  # 2024-01-01 UTC in µs
    ts = base + seq * np.int64(1_000_000) + rng.integers(0, 1000, size=total)

    return pa.table({
        "conv_id": pa.array(conv_id, type=pa.string()),
        "turn_idx": pa.array(turn_idx, type=pa.int32()),
        "role": pa.array(role, type=pa.string()),
        "text": pa.array(text, type=pa.string()),
        "tool": pa.array(tool, type=pa.string()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
    })


def transcripts_path(scale: str = "xs", seed: int = SEED,
                     root: str = "/tmp/miru_ray_fixtures") -> str:
    """Generate-once cache: parquet directory for a fixture scale.

    Written as MANY part files (≈64k rows each): Ray's parquet reader
    parallelizes across files/fragments, so a single big file serializes
    the whole downstream pipeline behind one read task.  Many part files is
    also the realistic shape of a 100 TB input.
    """
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, f"transcripts_{scale}_{seed}_v3")
    if not os.path.exists(os.path.join(path, "_DONE")):
        # pid-suffixed staging dir: concurrent first builds (pytest + bench,
        # parallel workers) must not interleave writes into one tmp dir
        tmp = path + f".tmp.{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        table = generate_transcripts(scale, seed)
        per_file = 64 * 1024
        nfiles = max(1, (table.num_rows + per_file - 1) // per_file)
        for i in range(nfiles):
            pq.write_table(table.slice(i * per_file, per_file),
                           os.path.join(tmp, f"part-{i:04d}.parquet"),
                           row_group_size=32 * 1024)
        with open(os.path.join(tmp, "_DONE"), "w") as f:
            f.write("ok")
        if os.path.exists(path):
            import shutil
            shutil.rmtree(path)
        os.replace(tmp, path)
    return path


# ---------------------------------------------------------------------------
# transcripts derived from the driver's `documents` table (SQL-reproducible)
# ---------------------------------------------------------------------------

N_CONVS_DERIVED = 97
_TS_BASE_US = 1_704_067_200_000_000  # TIMESTAMP '2024-01-01 00:00:00' in µs

#: SQL snippet producing EXACTLY the same rows as :func:`derive_transcripts`.
#: Usable as  `WITH transcripts AS (<DERIVE_SQL>) SELECT ...`.
DERIVE_SQL = f"""
SELECT
  'conv-' || lpad(CAST(doc_id % {N_CONVS_DERIVED} AS VARCHAR), 6, '0') AS conv_id,
  CAST(doc_id // {N_CONVS_DERIVED} AS INTEGER) AS turn_idx,
  CASE CAST(doc_id % 4 AS INTEGER) WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
       WHEN 2 THEN 'system' ELSE 'tool' END AS role,
  text,
  CASE WHEN doc_id % 3 = 0 THEN 'tool_' || CAST(doc_id % 7 AS VARCHAR) ELSE '' END AS tool,
  TIMESTAMP '2024-01-01 00:00:00' + to_microseconds(doc_id * 1000000) AS ts,
  ['grp' || CAST(doc_id % 7 AS VARCHAR),
   'team' || CAST(doc_id % 11 AS VARCHAR)] AS acl
FROM documents
""".strip()


def derive_transcripts_batch(batch: pa.Table) -> pa.Table:
    """Arrow-vectorized equivalent of :data:`DERIVE_SQL` for one batch.

    Deterministic pure function of ``doc_id`` — safe inside ``map_batches``.
    """
    doc_id = batch["doc_id"]
    if isinstance(doc_id, pa.ChunkedArray):
        doc_id = doc_id.combine_chunks()

    def mod(arr, k):  # pyarrow has no modulo kernel; integer divide truncates
        return pc.subtract(arr, pc.multiply(pc.divide(arr, k), k))

    conv_n = pc.cast(mod(doc_id, N_CONVS_DERIVED), pa.string())
    conv_id = pc.binary_join_element_wise(
        "conv-", pc.utf8_lpad(conv_n, 6, "0"), "")
    turn_idx = pc.cast(pc.divide(doc_id, N_CONVS_DERIVED), pa.int32())
    role_idx = pc.cast(mod(doc_id, 4), pa.int64())
    role = pc.take(pa.array(["user", "assistant", "system", "tool"]), role_idx)
    tool = pc.if_else(
        pc.equal(mod(doc_id, 3), 0),
        pc.binary_join_element_wise("tool_", pc.cast(mod(doc_id, 7), pa.string()), ""),
        "")
    ts = pc.cast(pc.add(_TS_BASE_US, pc.multiply(pc.cast(doc_id, pa.int64()), 1_000_000)),
                 pa.timestamp("us"))
    # acl: a 2-entry ACL list per doc ([grp<d%7>, team<d%11>]) — the
    # multi-valued authz column (MiruActivity.authz analogue)
    grp = np.asarray(pc.binary_join_element_wise(
        "grp", pc.cast(mod(doc_id, 7), pa.string()), "").to_pandas(),
        dtype=object)
    team = np.asarray(pc.binary_join_element_wise(
        "team", pc.cast(mod(doc_id, 11), pa.string()), "").to_pandas(),
        dtype=object)
    n = len(grp)
    flat = np.empty(2 * n, dtype=object)
    flat[0::2], flat[1::2] = grp, team
    acl = pa.ListArray.from_arrays(
        pa.array(np.arange(0, 2 * n + 1, 2), pa.int32()),
        pa.array(flat, pa.string()))
    return pa.table({
        "conv_id": conv_id, "turn_idx": turn_idx, "role": role,
        "text": batch["text"], "tool": tool, "ts": ts, "acl": acl,
    })


def derive_transcripts(documents: pa.Table) -> pa.Table:
    """Whole-table variant of :func:`derive_transcripts_batch` (tests/oracle)."""
    return derive_transcripts_batch(documents)


# ---------------------------------------------------------------------------
# documents with planted duplicates (for the dedup operator family) —
# deterministic and SQL-reproducible, since the raw documents table has no
# duplicate texts at all.
#   - docs with doc_id % 5 == 3 get an EXACT copy at doc_id + N
#   - docs with doc_id % 5 == 1 get a NEAR copy (first token → 'xdup') at
#     doc_id + 2N
# where N = count(documents).  Plant sets are disjoint by construction.
# ---------------------------------------------------------------------------

#: the source-carrying derivation — injected copies inherit the
#: duplicated row's source; engine equivalent:
#: ``pipelines.curate._documents_src`` (via :func:`expand_docs_dup`)
DOCS_DUP_SRC_SQL = """
SELECT doc_id, text, source FROM documents
UNION ALL
SELECT doc_id + (SELECT count(*) FROM documents) AS doc_id, text, source
FROM documents WHERE doc_id % 5 = 3
UNION ALL
SELECT doc_id + 2 * (SELECT count(*) FROM documents) AS doc_id,
       regexp_replace(text, '^[a-z0-9]+', 'xdup') AS text, source
FROM documents WHERE doc_id % 5 = 1
""".strip()

#: the (doc_id, text) form — kept a STANDALONE template (not a projection
#: of DOCS_DUP_SRC_SQL) because dedup-family oracles must run on views
#: that carry only (doc_id, text); both SQL strings are pinned to the one
#: Arrow implementation below by tests, so they cannot drift apart
DOCS_DUP_SQL = """
SELECT doc_id, text FROM documents
UNION ALL
SELECT doc_id + (SELECT count(*) FROM documents) AS doc_id, text
FROM documents WHERE doc_id % 5 = 3
UNION ALL
SELECT doc_id + 2 * (SELECT count(*) FROM documents) AS doc_id,
       regexp_replace(text, '^[a-z0-9]+', 'xdup') AS text
FROM documents WHERE doc_id % 5 = 1
""".strip()


def expand_docs_dup(b: pa.Table, n: int, with_source: bool = False
                    ) -> pa.Table:
    """THE Arrow implementation of the dup-planting rule (one place;
    DOCS_DUP_SRC_SQL is its SQL twin) — batch-composable because the rule
    is row-local given the base-table row count ``n``.  Negative doc_ids
    raise: numpy's Python-style modulo and DuckDB's C-style modulo pick
    DIFFERENT plant sets below zero, so the engines would silently
    diverge."""
    import re
    doc_id = b["doc_id"].to_numpy()
    if len(doc_id) and doc_id.min() < 0:
        raise ValueError("docs_dup derivation: negative doc_id (engine "
                         "and SQL modulo semantics diverge below zero)")
    text = np.asarray(b["text"].to_pandas(), dtype=object)
    m_exact = doc_id % 5 == 3
    m_near = doc_id % 5 == 1
    near_text = np.array([re.sub("^[a-z0-9]+", "xdup", t, count=1)
                          for t in text[m_near]], dtype=object)
    cols = {
        "doc_id": pa.array(np.concatenate([
            doc_id, doc_id[m_exact] + n,
            doc_id[m_near] + 2 * n]).astype(np.int64)),
        "text": pa.array(np.concatenate([text, text[m_exact], near_text]),
                         type=pa.string()),
    }
    if with_source:
        src = np.asarray(b["source"].to_pandas(), dtype=object)
        cols["source"] = pa.array(np.concatenate(
            [src, src[m_exact], src[m_near]]), type=pa.string())
    return pa.table(cols)


def derive_docs_dup(documents: pa.Table) -> pa.Table:
    """Arrow equivalent of :data:`DOCS_DUP_SQL` (exact same rows) — the
    whole-table form of :func:`expand_docs_dup`."""
    return expand_docs_dup(documents, documents.num_rows)
