"""Small shared helpers: stable hashing, atomic writes, input fingerprints."""

from __future__ import annotations

import hashlib
import json
import os
from typing import Iterable

import numpy as np
import pandas as pd


def term_shard(terms, num_shards: int) -> np.ndarray:
    """Stable vectorized shard assignment for term strings.

    Uses ``pandas.util.hash_array`` (SipHash with a fixed key) — deterministic
    across processes for a given pandas version, which is all placement needs;
    the query side locates a term's shard with the same function.
    """
    arr = np.asarray(terms, dtype=object)
    return (pd.util.hash_array(arr) % np.uint64(num_shards)).astype(np.int64)


class _Md5Con:
    """Per-process DuckDB connection for vectorized md5 (threads=1: each Ray
    worker owns one CPU slot, so DuckDB must not spawn its own pool).  The
    package is registered pickle-by-value, so this holder pickles as a fresh
    empty instance — the live connection never crosses process boundaries."""

    def __init__(self):
        self.con = None

    def get(self):
        if self.con is None:
            import duckdb
            self.con = duckdb.connect()
            self.con.execute("SET threads=1")
        return self.con

    def __reduce__(self):
        return (_Md5Con, ())


_MD5_CON = _Md5Con()


def md5_64(strings) -> np.ndarray:
    """uint64 hash per string == DuckDB ``md5_number_lower`` (little-endian
    last 8 bytes of md5) — lets SQL oracles reproduce hash-derived values
    (simhash signatures, winnowing fingerprints) bit-for-bit.

    Delegates to DuckDB's vectorized ``md5_number_lower`` (2-6x faster than
    a Python ``hashlib`` loop, verified bit-identical); falls back to hashlib
    if DuckDB is unavailable in the worker."""
    arr = np.asarray(strings, dtype=object)
    try:
        import pyarrow as pa
        _md5_in = pa.table({"s": pa.array(arr, type=pa.string())})
        out = _MD5_CON.get().execute(
            "SELECT md5_number_lower(s) AS h FROM _md5_in"
        ).fetch_arrow_table()["h"]
        if out.null_count:
            raise ValueError("md5_64: null string in input")
        return out.combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.uint64)
    except ImportError:  # pragma: no cover - duckdb is baked into the image
        return np.fromiter(
            (int.from_bytes(hashlib.md5(s.encode()).digest()[8:], "little")
             for s in arr), dtype=np.uint64, count=len(arr))


def md5_128(strings) -> tuple[np.ndarray, np.ndarray]:
    """(lower, upper) uint64 halves of md5 per string — the EXACT-dedup
    group key.  A single 64-bit hash expects hundreds of birthday
    collisions at 10^11 docs (n²/2^65), each silently merging two
    distinct texts; the 128-bit pair pushes that to n²/2^129.  Both
    halves are DuckDB-reproducible (``md5_number_lower/upper``)."""
    arr = np.asarray(strings, dtype=object)
    try:
        import pyarrow as pa
        _md5_in = pa.table({"s": pa.array(arr, type=pa.string())})
        out = _MD5_CON.get().execute(
            "SELECT md5_number_lower(s) AS lo, md5_number_upper(s) AS hi "
            "FROM _md5_in").fetch_arrow_table()
        if out["lo"].null_count:
            raise ValueError("md5_128: null string in input")
        return (out["lo"].combine_chunks().to_numpy(
                    zero_copy_only=False).astype(np.uint64),
                out["hi"].combine_chunks().to_numpy(
                    zero_copy_only=False).astype(np.uint64))
    except ImportError:  # pragma: no cover - duckdb is baked in
        lo = np.fromiter(
            (int.from_bytes(hashlib.md5(x.encode()).digest()[8:], "little")
             for x in arr), dtype=np.uint64, count=len(arr))
        hi = np.fromiter(
            (int.from_bytes(hashlib.md5(x.encode()).digest()[:8], "little")
             for x in arr), dtype=np.uint64, count=len(arr))
        return lo, hi


def md5_64_bulk(strings: np.ndarray) -> np.ndarray:
    """md5_64 with each DISTINCT string hashed once (token/shingle streams
    repeat heavily — factorize first, then one digest per unique)."""
    codes, uniques = pd.factorize(np.asarray(strings, dtype=object),
                                  sort=False)
    return md5_64(uniques)[codes]


# per-worker-process cache of ray.put broadcast objects: stateless map
# tasks scale instantly (no actor-pool ramp-up) while each worker still
# deserializes a given broadcast exactly once.  Cleared on a new ref so
# stale broadcasts never accumulate across jobs — a worker serves one
# broadcast-consuming stage at a time (concurrent stages share one ref,
# see build_index's shared_ref).
_BROADCAST_CACHE: dict = {}


def broadcast_get(ref):
    """Fetch a ``ray.put`` broadcast object through the per-worker cache.

    Bounded at a few entries with FIFO eviction: stages that read TWO
    broadcasts per batch (e.g. pagerank's rank + label refs) must not
    thrash a single-slot cache back into one ``ray.get`` per batch, and
    iterative loops that mint a fresh ref per round must not grow the
    cache unboundedly."""
    import ray
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    if key not in _BROADCAST_CACHE:
        while len(_BROADCAST_CACHE) >= 4:
            _BROADCAST_CACHE.pop(next(iter(_BROADCAST_CACHE)))
        _BROADCAST_CACHE[key] = ray.get(ref)
    return _BROADCAST_CACHE[key]


def read_parquet_clean(path, columns=None, **kw):
    """``ray.data.read_parquet`` with a metadata-STRIPPED schema override.

    The testdata parquet carries pandas field metadata that defeats
    ``pa.Schema.__hash__`` on this pyarrow version, so Ray's schema-dedup
    fast path logs "Failed to hash the schemas" from every read task and
    every downstream stage that inherits the schema.  Passing an explicit
    stripped (and column-pruned) schema fixes it at the source: blocks are
    born hashable, and the column prune still happens at the parquet scan.
    Footer read is metadata-only (one small IO on the driver)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data
    if "schema" not in kw and "include_paths" not in kw:
        probe = path if isinstance(path, str) else path[0]
        if os.path.isdir(probe):
            files = list_parquet_files(probe)
            probe = files[0] if files else None
        if probe is not None:
            full = pq.read_schema(probe).remove_metadata()
            if columns is not None:
                if all(c in full.names for c in columns):
                    kw["schema"] = pa.schema(
                        [full.field(c) for c in columns])
                # else: a requested column lives outside the file schema
                # (hive partition dir) — skip the override, let Ray infer
            elif "=" not in os.path.relpath(probe, path if isinstance(
                    path, str) and os.path.isdir(path) else "/"):
                kw["schema"] = full
    return ray.data.read_parquet(path, columns=columns, **kw)


def atomic_write_bytes(path: str, data: bytes) -> None:
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def atomic_write_json(path: str, obj) -> None:
    atomic_write_bytes(path, json.dumps(obj, indent=1, sort_keys=True).encode())


def read_json(path: str):
    with open(path) as f:
        return json.load(f)


def input_fingerprint(paths: Iterable[str]) -> str:
    """Hash of (path, size, mtime_ns) for every input file — the resume key.

    Reference precedent: the rebuild/sip cursors persisted per batch
    (``MiruLocalHostedPartition.java:958-961``) make re-ingest idempotent; for
    a batch engine the input fingerprint plays that role.
    """
    h = hashlib.sha256()
    for p in sorted(paths):
        st = os.stat(p)
        h.update(f"{p}|{st.st_size}|{st.st_mtime_ns}\n".encode())
    return h.hexdigest()


def list_parquet_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    out = []
    for root, _dirs, files in os.walk(path):
        out.extend(os.path.join(root, f) for f in files if f.endswith(".parquet"))
    return sorted(out)

def rowgroup_block_plan(path: str, target_rows: int = 65536) -> list[list[int]]:
    """Pack a parquet file's row groups into ~``target_rows`` blocks
    (metadata only).  Each returned row-group index list is read inside
    its own task, never on the driver."""
    import pyarrow.parquet as pq
    md = pq.read_metadata(path)
    blocks: list[list[int]] = []
    cur: list[int] = []
    cur_rows = 0
    for g in range(md.num_row_groups):
        cur.append(g)
        cur_rows += md.row_group(g).num_rows
        if cur_rows >= target_rows:
            blocks.append(cur)
            cur, cur_rows = [], 0
    if cur:
        blocks.append(cur)
    return blocks

def sorted_lookup(sorted_keys, values):
    """Guarded sorted-array probe: (hit mask, clamped positions) for
    ``values`` against ``sorted_keys``.  The ONE definition of the
    searchsorted-membership idiom (empty-key-safe)."""
    import numpy as np
    if not len(sorted_keys):
        return np.zeros(len(values), bool), np.zeros(len(values), np.int64)
    pos = np.minimum(np.searchsorted(sorted_keys, values),
                     len(sorted_keys) - 1)
    return sorted_keys[pos] == values, pos
