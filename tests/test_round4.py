"""Round-4 tests: collaborative-filtering contributor cap, distributed
graph edge derivation, and the other VERDICT r03 asks."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def cf_dir(tmp_path):
    """Tiny orders/lineitem corpus where contributor weights differ:
    cust 1 (me) ordered parts {100, 101}; cust 2 shares both (weight 2,
    other parts {200}); cust 3 shares one (weight 1, other parts
    {400, 500})."""
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([1, 2, 3], pa.int64())}),
        os.path.join(d, "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2, 2, 3, 3, 3], pa.int64()),
        "l_partkey": pa.array([100, 101, 100, 101, 200, 100, 400, 500],
                              pa.int64())}),
        os.path.join(d, "lineitem.parquet"))
    return d


def test_collaborative_filtering_uncapped(cf_dir):
    from miru_ray.pipelines.relational import collaborative_filtering
    got = collaborative_filtering(cf_dir, custkey=1, k=10).to_pandas()
    # scores: part 200 ← cust2 weight 2; parts 400/500 ← cust3 weight 1
    assert list(got["p_partkey"]) == [200, 400, 500]
    assert list(got["score"]) == [2, 1, 1]


def test_collaborative_filtering_contributor_cap(cf_dir):
    """VERDICT r03 #1: with max_contributors=1 only the top contributor
    by (weight desc, custkey asc) — cust 2 — feeds hop 3, so cust 3's
    parts disappear and the hop-3 driver merges are explicitly 1-bounded."""
    from miru_ray.pipelines.relational import collaborative_filtering
    got = collaborative_filtering(
        cf_dir, custkey=1, k=10, max_contributors=1).to_pandas()
    assert list(got["p_partkey"]) == [200]
    assert list(got["score"]) == [2]


def test_graph_edges_distributed_branch_parity():
    """VERDICT r03 #2: with broadcast_bytes=0 the edge derivation routes
    through the hash-shuffle Dataset.join (no orders broadcast, no
    full-table read anywhere); results must be identical to the
    broadcast branch."""
    from miru_ray.ops.graph import components_top, pagerank_top
    sf = "/root/testdata/sf0.001"
    pr_b = pagerank_top(sf).to_pandas()
    pr_d = pagerank_top(sf, broadcast_bytes=0).to_pandas()
    assert pr_b.equals(pr_d)
    cc_b = components_top(sf).to_pandas()
    cc_d = components_top(sf, broadcast_bytes=0).to_pandas()
    assert cc_b.equals(cc_d)


def test_tenant_registry_routing(tmp_path):
    """VERDICT r03 #5: tenant → index catalog with per-tenant routing.
    Two tenants built from disjoint slices answer independently; their
    counts sum to the whole corpus's count; unknown tenants raise."""
    from miru_ray.config import IndexConfig
    from miru_ray.index.build import build_index
    from miru_ray.index.tenants import TenantRegistry
    from miru_ray.query.engine import Searcher

    docs = pa.table({
        "conv_id": pa.array([f"c{i % 4}" for i in range(40)]),
        "turn_idx": pa.array([i // 4 for i in range(40)], pa.int32()),
        "role": pa.array(["user"] * 40),
        "text": pa.array([("alpha beta" if i % 2 else "alpha gamma")
                          for i in range(40)]),
        "ts": pa.array(np.arange(40) * 1000, pa.int64()),
    })
    cfg = IndexConfig(docs_per_partition=10, num_shards=1,
                      keyword_fields=("role",))
    reg = TenantRegistry(str(tmp_path / "registry"))
    full_dir = str(tmp_path / "full")
    os.makedirs(full_dir)
    pq.write_table(docs, os.path.join(full_dir, "docs.parquet"))
    for tenant, parity in (("even", 0), ("odd", 1)):
        d = str(tmp_path / tenant)
        os.makedirs(d)
        sel = docs.filter(pa.array([i % 2 == parity for i in range(40)]))
        pq.write_table(sel, os.path.join(d, "docs.parquet"))
        idir = str(tmp_path / f"{tenant}_idx")
        build_index(d, idir, cfg)
        reg.register(tenant, idir, cfg)
    assert reg.tenants() == ["even", "odd"]
    counts = reg.count_all("alpha")
    assert counts == {"even": 20, "odd": 20}
    # disjoint content routes correctly: beta only in odd, gamma in even
    assert reg.count_all("beta") == {"even": 0, "odd": 20}
    assert reg.count_all("gamma") == {"even": 20, "odd": 0}
    # catalog survives a fresh registry instance (tenants.json)
    reg2 = TenantRegistry(str(tmp_path / "registry"))
    assert reg2.tenants() == ["even", "odd"]
    assert reg2.index_dir("even") == reg.index_dir("even")
    with pytest.raises(KeyError):
        reg2.entry("nope")
    # whole == sum of tenants
    full_idx = str(tmp_path / "full_idx")
    build_index(full_dir, full_idx, cfg)
    s = Searcher(full_idx, num_readers=1)
    assert s.count("alpha") == sum(counts.values())
    s.close()
    reg.close()
    reg2.close()


def test_unread_backfill_marker_state_machine(tmp_path):
    """VERDICT r03 #7: READ ('click') clears messages ≤ its time, UNREAD
    ('error') re-marks messages ≤ its time, latest marker wins, UNREAD
    wins ties.  Users: 1 = read-then-new-msg (1 unread), 2 = read then
    re-marked (all 2 unread), 3 = never read (all unread), 4 = read after
    everything (0 unread → absent), 5 = tie click/error at same ts
    (unread wins → 1 unread)."""
    from miru_ray.ops.analytics import unread_backfill
    rows = [
        # (user, type, ts_us)
        (1, "view", 10), (1, "click", 20), (1, "view", 30),
        (2, "view", 10), (2, "click", 20), (2, "view", 25), (2, "error", 30),
        (3, "view", 10), (3, "view", 20),
        (4, "view", 10), (4, "view", 20), (4, "click", 30),
        (5, "view", 10), (5, "click", 20), (5, "error", 20),
    ]
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows]),
        "ts": pa.array([r[2] for r in rows],
                       pa.timestamp("us"))}),
        os.path.join(d, "events.parquet"))
    got = unread_backfill(d).to_pandas()
    assert dict(zip(got["user_id"], got["n_unread"])) == {
        1: 1, 2: 2, 3: 2, 5: 1}


def _dir_bytes(root, sub):
    out = {}
    base = os.path.join(root, sub)
    if not os.path.isdir(base):
        return out
    for r, _d, files in os.walk(base):
        for f in sorted(files):
            p = os.path.join(r, f)
            with open(p, "rb") as fh:
                out[os.path.relpath(p, base)] = fh.read()
    return out


def test_additive_schema_upgrade_matches_fresh_build(tmp_path):
    """VERDICT r03 #4: adding keyword/numeric fields upgrades in place —
    only the new fields' postings are derived and merged — and the result
    is byte-identical (segments + doclen) to a fresh build with the new
    config; a later build_index with the new config is a no-op."""
    from miru_ray.config import IndexConfig
    from miru_ray.index.build import build_index
    from miru_ray.index.upgrade import check_additive, upgrade_index
    from miru_ray.query.engine import Searcher

    docs = pa.table({
        "conv_id": pa.array([f"c{i % 3}" for i in range(30)]),
        "turn_idx": pa.array([i // 3 for i in range(30)], pa.int32()),
        "role": pa.array(["user", "assistant"][i % 2] for i in range(30)),
        "tool": pa.array([f"tool_{i % 4}" if i % 5 else ""
                          for i in range(30)]),
        "text": pa.array([f"alpha beta tok{i % 7}" for i in range(30)]),
        "ts": pa.array(np.arange(30) * 1000, pa.int64()),
    })
    src = str(tmp_path / "src")
    os.makedirs(src)
    pq.write_table(docs, os.path.join(src, "docs.parquet"))
    old_cfg = IndexConfig(docs_per_partition=8, num_shards=2,
                          keyword_fields=("role",))
    new_cfg = IndexConfig(docs_per_partition=8, num_shards=2,
                          keyword_fields=("role", "tool"),
                          numeric_fields=("turn_idx",))

    up_dir = str(tmp_path / "upgraded")
    build_index(src, up_dir, old_cfg)
    upgrade_index(up_dir, new_cfg)

    fresh_dir = str(tmp_path / "fresh")
    build_index(src, fresh_dir, new_cfg)

    assert _dir_bytes(up_dir, "segments") == _dir_bytes(fresh_dir,
                                                        "segments")
    assert _dir_bytes(up_dir, "doclen") == _dir_bytes(fresh_dir, "doclen")
    from miru_ray.util import read_json
    mu, mf = (read_json(os.path.join(d, "manifest.json"))
              for d in (up_dir, fresh_dir))
    for k in ("config", "n_docs", "total_len", "avgdl", "segments",
              "partitions", "fingerprint", "version"):
        assert mu[k] == mf[k], k
    # build_index with the new config is now a no-op (stage tags current)
    m2 = build_index(src, up_dir, new_cfg)
    assert m2["segments"] == mu["segments"]
    assert _dir_bytes(up_dir, "segments") == _dir_bytes(fresh_dir,
                                                        "segments")
    # the new fields answer queries on the upgraded index
    s = Searcher(up_dir, num_readers=1)
    assert s.count("tool:tool_1") > 0
    assert s.count("turn_idx:[0 TO 3]") > 0
    s.close()
    # non-additive changes refuse loudly
    with pytest.raises(ValueError):
        check_additive(new_cfg, IndexConfig(docs_per_partition=8,
                                            num_shards=2))  # removes fields
    with pytest.raises(ValueError):
        check_additive(old_cfg, IndexConfig(docs_per_partition=9,
                                            num_shards=2,
                                            keyword_fields=("role",)))


def test_conv_offsets_distributed_branch(tmp_path, monkeypatch):
    """VERDICT r03 #8: with the driver gate forced to 0, stage 1 routes
    through the distributed groupby + sort + streaming prefix-sum and the
    FULL index (manifest, segments, doclen, offsets content) is identical
    to the driver branch's."""
    import miru_ray.index.build as B
    from miru_ray.config import IndexConfig
    from miru_ray.util import read_json

    # two input files whose conversations interleave (forces a real merge)
    rows = []
    for i in range(60):
        rows.append((f"c{i % 5}", i // 5, f"alpha tok{i % 7}", i * 1000))
    t = pa.table({"conv_id": pa.array([r[0] for r in rows]),
                  "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                  "role": pa.array(["user"] * 60),
                  "text": pa.array([r[2] for r in rows]),
                  "ts": pa.array([r[3] for r in rows], pa.int64())})
    src = str(tmp_path / "src")
    os.makedirs(src)
    pq.write_table(t.slice(0, 31), os.path.join(src, "a.parquet"))
    pq.write_table(t.slice(31), os.path.join(src, "b.parquet"))
    cfg = IndexConfig(docs_per_partition=16, num_shards=2,
                      keyword_fields=("role",))

    d_drv = str(tmp_path / "drv")
    B.build_index(src, d_drv, cfg)

    monkeypatch.setattr(B, "_OFFSETS_DRIVER_ROWS", 0)
    d_dist = str(tmp_path / "dist")
    B.build_index(src, d_dist, cfg)

    off_a = pq.read_table(os.path.join(d_drv, "conv_offsets.parquet"))
    off_b = pq.read_table(os.path.join(d_dist, "conv_offsets.parquet"))
    assert off_a.to_pydict() == off_b.to_pydict()
    assert _dir_bytes(d_drv, "segments") == _dir_bytes(d_dist, "segments")
    assert _dir_bytes(d_drv, "doclen") == _dir_bytes(d_dist, "doclen")
    ma, mb = (read_json(os.path.join(d, "manifest.json"))
              for d in (d_drv, d_dist))
    for k in ("config", "n_docs", "n_convs", "total_len", "avgdl",
              "segments", "partitions", "fingerprint", "version"):
        assert ma[k] == mb[k], k
    # contiguity violations fail loudly on the distributed branch too
    bad = str(tmp_path / "bad")
    os.makedirs(bad)
    pq.write_table(pa.table({
        "conv_id": pa.array(["x", "x"]),
        "turn_idx": pa.array([0, 2], pa.int32()),
        "role": pa.array(["user"] * 2),
        "text": pa.array(["a", "b"]),
        "ts": pa.array([0, 1], pa.int64())}),
        os.path.join(bad, "x.parquet"))
    with pytest.raises(Exception, match="not contiguous"):
        B.build_conv_offsets(
            [os.path.join(bad, "x.parquet")],
            str(tmp_path / "off.parquet"), driver_rows=0)


def test_phrase_bigram_postings(tmp_path):
    """Positions-free phrase acceleration: an index built with
    phrase_bigram_fields answers phrase queries identically to the
    unigram+verify path, and a 2-token phrase never touches the
    docstore (the bigram IS exact adjacency)."""
    from miru_ray.config import IndexConfig
    from miru_ray.index.build import build_index
    from miru_ray.query.engine import PartitionReader, Searcher
    from miru_ray.query.filter import Phrase

    texts = ["alpha beta gamma", "beta alpha beta", "gamma beta alpha",
             "alpha gamma beta alpha beta", "beta gamma", "alpha",
             "beta alpha gamma beta", "alpha beta alpha beta gamma"]
    docs = pa.table({
        "conv_id": pa.array([f"c{i}" for i in range(len(texts))]),
        "turn_idx": pa.array([0] * len(texts), pa.int32()),
        "role": pa.array(["user"] * len(texts)),
        "text": pa.array(texts),
        "ts": pa.array(np.arange(len(texts)) * 1000, pa.int64())})
    src = str(tmp_path / "src")
    os.makedirs(src)
    pq.write_table(docs, os.path.join(src, "d.parquet"))

    base_cfg = IndexConfig(docs_per_partition=4, num_shards=2,
                           keyword_fields=("role",))
    bg_cfg = IndexConfig(docs_per_partition=4, num_shards=2,
                         keyword_fields=("role",),
                         phrase_bigram_fields=("text",))
    plain_dir, bg_dir = str(tmp_path / "plain"), str(tmp_path / "bg")
    build_index(src, plain_dir, base_cfg)
    build_index(src, bg_dir, bg_cfg)

    s_plain = Searcher(plain_dir, num_readers=1)
    s_bg = Searcher(bg_dir, num_readers=1)
    for q in ('"alpha beta"', '"beta alpha"', '"alpha beta gamma"',
              '"gamma alpha"', '"alpha beta alpha"'):
        assert s_bg.count(q) == s_plain.count(q), q
        assert (np.array_equal(s_bg.match_docs(q),
                               s_plain.match_docs(q))), q
    # ranking unchanged: phrases score as AND of their unigram terms
    assert s_bg.topk('"alpha beta"', 5).to_pydict() \
        == s_plain.topk('"alpha beta"', 5).to_pydict()
    s_plain.close()
    s_bg.close()

    # 2-token phrase must not gather from the docstore on the bigram index
    r = PartitionReader(bg_dir, [0, 1])
    r._docstore_read = lambda pid, **kw: (_ for _ in ()).throw(
        AssertionError("docstore touched for a 2-token bigram phrase"))
    got = r.search(Phrase("text", ("alpha", "beta")), 10, "bm25",
                   {"alpha": 1, "beta": 1}, {"alpha": (5, 8),
                                             "beta": (6, 9)})
    assert len(got["doc_ids"]) > 0
    # ...while a 3-token phrase still verifies (and therefore raises here)
    with pytest.raises(AssertionError, match="docstore touched"):
        r.search(Phrase("text", ("alpha", "beta", "gamma")), 10, "bm25",
                 {"alpha": 1, "beta": 1, "gamma": 1},
                 {"alpha": (5, 8), "beta": (6, 9), "gamma": (4, 4)})


def test_docid_assignment_join_branch(tmp_path, monkeypatch):
    """Stage-2 fallback: with the offsets-broadcast gate forced to 0 the
    doc-id assignment routes through the hash-shuffle join on conv_id;
    segments/doclen/manifest are identical and the docstore holds the
    same (doc_id-sorted) content.  A conv_id absent from the offsets
    table still raises."""
    import pyarrow.dataset as pads

    import miru_ray.index.build as B
    from miru_ray.config import IndexConfig
    from miru_ray.util import read_json

    rows = [(f"c{i % 7}", i // 7, f"alpha beta tok{i % 5}", i) for i in
            range(70)]
    t = pa.table({"conv_id": pa.array([r[0] for r in rows]),
                  "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                  "role": pa.array(["user"] * 70),
                  "text": pa.array([r[2] for r in rows]),
                  "ts": pa.array([r[3] for r in rows], pa.int64())})
    src = str(tmp_path / "src")
    os.makedirs(src)
    pq.write_table(t, os.path.join(src, "a.parquet"))
    cfg = IndexConfig(docs_per_partition=16, num_shards=2,
                      keyword_fields=("role",))

    d_bcast = str(tmp_path / "bcast")
    B.build_index(src, d_bcast, cfg)

    monkeypatch.setattr(B, "_OFFSETS_BROADCAST_BYTES", 0)
    d_join = str(tmp_path / "join")
    B.build_index(src, d_join, cfg)

    assert _dir_bytes(d_bcast, "segments") == _dir_bytes(d_join,
                                                         "segments")
    assert _dir_bytes(d_bcast, "doclen") == _dir_bytes(d_join, "doclen")
    ma, mb = (read_json(os.path.join(d, "manifest.json"))
              for d in (d_bcast, d_join))
    for k in ("config", "n_docs", "n_convs", "total_len", "avgdl",
              "segments", "partitions", "fingerprint"):
        assert ma[k] == mb[k], k
    da, db = (pads.dataset(os.path.join(d, "docstore"),
                           partitioning="hive").to_table()
              .sort_by("doc_id")
              for d in (d_bcast, d_join))
    assert da.select(sorted(da.column_names)).equals(
        db.select(sorted(db.column_names)))
    # a conv_id missing from the offsets table raises on the join branch
    off = str(tmp_path / "off.parquet")
    pq.write_table(pa.table({
        "conv_id": pa.array(["c0"]), "offset": pa.array([0], pa.int64()),
        "cnt": pa.array([10], pa.int64())}), off)
    bad = B._assign_ids_join(
        B._read_input([os.path.join(src, "a.parquet")]), off, cfg)
    with pytest.raises(Exception, match="missing from offsets"):
        bad.materialize()


def test_collaborative_filtering_cap_tiebreak(cf_dir):
    """Equal weights break ties by custkey asc: capping at 2 keeps cust 2
    (weight 2) and cust 3 (weight 1) — same as uncapped here — while a
    cap of 1 proved the bound above.  Add a 4th equal-weight contributor
    to exercise the tie."""
    from miru_ray.pipelines.relational import collaborative_filtering
    # append cust 4 sharing one part (weight 1, same as cust 3)
    li = pq.read_table(os.path.join(cf_dir, "lineitem.parquet"))
    extra = pa.table({"l_orderkey": pa.array([4, 4], pa.int64()),
                      "l_partkey": pa.array([101, 600], pa.int64())})
    pq.write_table(pa.concat_tables([li, extra]),
                   os.path.join(cf_dir, "lineitem.parquet"))
    od = pq.read_table(os.path.join(cf_dir, "orders.parquet"))
    extra_o = pa.table({"o_orderkey": pa.array([4], pa.int64()),
                        "o_custkey": pa.array([4], pa.int64())})
    pq.write_table(pa.concat_tables([od, extra_o]),
                   os.path.join(cf_dir, "orders.parquet"))
    got = collaborative_filtering(
        cf_dir, custkey=1, k=10, max_contributors=2).to_pandas()
    # kept: cust2 (w=2) + cust3 (w=1, lower custkey than cust4)
    assert list(got["p_partkey"]) == [200, 400, 500]
    assert list(got["score"]) == [2, 1, 1]


def test_semdedup_counts_planted_duplicates(tmp_path):
    """SemDeDup: two planted exact-duplicate groups land in the same
    cluster and drop all-but-the-lowest-vec_id member; orthogonal
    vectors survive."""
    from miru_ray.ops.cluster import semdedup_counts
    d = str(tmp_path / "sf")
    os.makedirs(d)
    # 4-dim, k=2: group A = e0-ish vectors (3 copies), group B = e1-ish
    # (2 copies), plus one lone e2 vector that joins a cluster but has
    # no near neighbor
    vecs = [[1.0, 0.0, 0.0, 0.0],   # 0  A
            [0.0, 1.0, 0.0, 0.0],   # 1  B
            [1.0, 0.01, 0.0, 0.0],  # 2  A dup of 0
            [0.0, 1.0, 0.01, 0.0],  # 3  B dup of 1
            [0.99, 0.0, 0.01, 0.0],  # 4  A dup of 0
            [0.0, 0.0, 1.0, 0.0]]   # 5  lone
    pq.write_table(pa.table({
        "vec_id": pa.array(range(6), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32(), 4))}),
        os.path.join(d, "embeddings.parquet"))
    out = semdedup_counts(d, k=2, iters=2, tau=0.9).to_pandas()
    assert int(out["n_vecs"].sum()) == 6
    # group A drops 2 (vecs 2, 4), group B drops 1 (vec 3), lone drops 0
    assert int(out["n_dropped"].sum()) == 3


def test_cluster_sample_balanced_and_deterministic(tmp_path):
    """Cluster-balanced sampling: each cluster contributes at most n_per
    members, chosen by the stable (md5(vec_id), vec_id) order; repeated
    runs return the identical sample."""
    from miru_ray.ops.cluster import cluster_sample
    d = str(tmp_path / "sf")
    os.makedirs(d)
    # two well-separated clusters of 20 vectors each
    vecs = ([[1.0, float(i) / 100, 0.0, 0.0] for i in range(20)]
            + [[0.0, 0.0, 1.0, float(i) / 100] for i in range(20)])
    pq.write_table(pa.table({
        "vec_id": pa.array(range(40), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32(), 4))}),
        os.path.join(d, "embeddings.parquet"))
    out = cluster_sample(d, k=2, iters=2, n_per=5).to_pandas()
    per = out.groupby("cluster").size()
    assert (per == 5).all() and len(per) == 2
    out2 = cluster_sample(d, k=2, iters=2, n_per=5).to_pandas()
    assert out.equals(out2)
    # n_per larger than the cluster returns the whole cluster
    full = cluster_sample(d, k=2, iters=2, n_per=100).to_pandas()
    assert len(full) == 40


def test_tenant_registry_unregister_and_refresh(tmp_path):
    """Round-4 registry ops: unregister (catalog + searcher teardown,
    destroy refused while another tenant shares the dir), and merge-on-
    write so two registrar INSTANCES don't clobber each other."""
    from miru_ray.config import IndexConfig
    from miru_ray.index.build import build_index
    from miru_ray.index.tenants import TenantRegistry

    docs = pa.table({
        "conv_id": pa.array(["c0"] * 6),
        "turn_idx": pa.array(range(6), pa.int32()),
        "role": pa.array(["user"] * 6),
        "text": pa.array(["alpha"] * 6),
        "ts": pa.array(np.arange(6) * 1000, pa.int64()),
    })
    d = str(tmp_path / "in")
    os.makedirs(d)
    pq.write_table(docs, os.path.join(d, "docs.parquet"))
    cfg = IndexConfig(docs_per_partition=10, num_shards=1,
                      keyword_fields=("role",))
    idir = str(tmp_path / "idx")
    build_index(d, idir, cfg)

    root = str(tmp_path / "registry")
    a, b = TenantRegistry(root), TenantRegistry(root)
    a.register("t1", idir, cfg)
    b.register("t2", idir, cfg)   # merge-on-write must KEEP t1
    a.refresh()
    assert a.tenants() == ["t1", "t2"]
    # destroy refused while t2 still points at the same dir — and the
    # refusal leaves t1 REGISTERED (validate-before-mutate)
    with pytest.raises(ValueError, match="still used"):
        a.unregister("t1", destroy=True)
    a.refresh()
    assert "t1" in a.tenants() and os.path.exists(idir)
    a.unregister("t2")
    a.unregister("t1", destroy=True)  # now sole owner: dir removed
    assert not os.path.exists(idir)
    assert a.tenants() == []
    with pytest.raises(KeyError):
        a.unregister("t1")
    a.close()
    b.close()


def test_tenant_cross_process_repoint_closes_stale_searcher(tmp_path):
    """Third-review finding: registry instance A must stop serving from a
    Searcher opened on the OLD directory after instance B (another
    'process') re-points the tenant and A refreshes."""
    from miru_ray.config import IndexConfig
    from miru_ray.index.build import build_index
    from miru_ray.index.tenants import TenantRegistry

    def make(dirname, text):
        docs = pa.table({
            "conv_id": pa.array(["c0"] * 4),
            "turn_idx": pa.array(range(4), pa.int32()),
            "role": pa.array(["user"] * 4),
            "text": pa.array([text] * 4),
            "ts": pa.array(np.arange(4) * 1000, pa.int64()),
        })
        d = str(tmp_path / dirname)
        os.makedirs(d)
        pq.write_table(docs, os.path.join(d, "docs.parquet"))
        idir = str(tmp_path / (dirname + "_idx"))
        build_index(d, idir, IndexConfig(docs_per_partition=10,
                                         num_shards=1, keyword_fields=()))
        return idir

    old_idx = make("old", "alpha")
    new_idx = make("new", "beta")
    cfg = IndexConfig(docs_per_partition=10, num_shards=1,
                      keyword_fields=())
    root = str(tmp_path / "registry")
    a, b = TenantRegistry(root), TenantRegistry(root)
    a.register("t", old_idx, cfg)
    assert a.searcher("t").count("alpha") == 4  # caches over old_idx
    b.register("t", new_idx, cfg)               # cross-process re-point
    a.refresh()
    # A must now answer from the NEW directory, not the stale cache
    assert a.searcher("t").count("alpha") == 0
    assert a.searcher("t").count("beta") == 4
    a.close()
    b.close()


def test_additive_upgrade_power_bits(tmp_path):
    """power_bits_fields joins the additive-upgrade surface: adding a
    bits field re-encodes only its postings (derived from the docstore's
    stored source column) and matches a fresh build byte-for-byte;
    removing or re-sourcing one refuses loudly."""
    from miru_ray.config import IndexConfig
    from miru_ray.index.build import build_index
    from miru_ray.index.upgrade import check_additive, upgrade_index
    from miru_ray.query.engine import Searcher

    docs = pa.table({
        "conv_id": pa.array([f"c{i % 3}" for i in range(30)]),
        "turn_idx": pa.array([i // 3 for i in range(30)], pa.int32()),
        "role": pa.array(["user", "assistant"][i % 2] for i in range(30)),
        "text": pa.array([f"alpha tok{i % 7}" for i in range(30)]),
        "ts": pa.array(np.arange(30) * 1000, pa.int64()),
    })
    src = str(tmp_path / "src")
    os.makedirs(src)
    pq.write_table(docs, os.path.join(src, "docs.parquet"))
    old_cfg = IndexConfig(docs_per_partition=8, num_shards=2,
                          keyword_fields=("role",))
    new_cfg = IndexConfig(docs_per_partition=8, num_shards=2,
                          keyword_fields=("role",),
                          power_bits_fields=(("bits", "turn_idx"),))

    up_dir = str(tmp_path / "upgraded")
    build_index(src, up_dir, old_cfg)
    upgrade_index(up_dir, new_cfg)
    fresh_dir = str(tmp_path / "fresh")
    build_index(src, fresh_dir, new_cfg)
    assert _dir_bytes(up_dir, "segments") == _dir_bytes(fresh_dir,
                                                        "segments")
    from miru_ray.util import read_json
    mu, mf = (read_json(os.path.join(d, "manifest.json"))
              for d in (up_dir, fresh_dir))
    assert mu["config"] == mf["config"]
    assert mu["segments"] == mf["segments"]
    s = Searcher(up_dir, num_readers=1)
    # turn_idx 0..9: bit 3 set for 8,9 → 3 convs × 2 turns = 6 docs
    assert s.count("bits:3") == 6
    assert s.count("bits:+") == 30
    s.close()
    with pytest.raises(ValueError, match="power_bits_fields removed"):
        check_additive(new_cfg, old_cfg)
    with pytest.raises(ValueError, match="power_bits_fields removed"):
        check_additive(new_cfg, IndexConfig(
            docs_per_partition=8, num_shards=2, keyword_fields=("role",),
            power_bits_fields=(("bits", "ts"),)))  # re-sourced
