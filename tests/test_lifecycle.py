"""Full operational lifecycle, chained end-to-end (the "switch from the
reference" story): cold build → incremental append → additive schema
upgrade → tombstone removal → compaction → replication → JSON request —
every step's answers checked against a pandas recompute of the same
corpus state.  Each stage is unit-tested elsewhere; this test asserts
the HANDOFFS (an upgraded index appends, a compacted index serves, a
replica answers identically)."""
import os

import pyarrow as pa
import pyarrow.parquet as pq

from miru_ray.config import IndexConfig
from miru_ray.index.build import build_index
from miru_ray.index.compact import compact_index
from miru_ray.index.sync import sync_index, verify_sync
from miru_ray.index.upgrade import upgrade_index
from miru_ray.query.engine import Searcher
from miru_ray.query.request import execute_request


def _slab(conv_ids, text_of):
    rows = []
    for c in conv_ids:
        for t in range(10):
            rows.append((f"c{c:03d}", t,
                         ["user", "assistant"][t % 2],
                         text_of(c, t),
                         f"tool_{(c + t) % 3}" if t % 2 else "",
                         (c * 1000 + t) * 1_000_000))
    return pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows]),
        "text": pa.array([r[3] for r in rows]),
        "tool": pa.array([r[4] for r in rows]),
        "ts": pa.array([r[5] for r in rows], pa.timestamp("us")),
    })


def test_full_operational_lifecycle(ray_session, tmp_path):
    text = lambda c, t: (f"alpha turn {t} of conv {c}"  # noqa: E731
                         + (" beta" if c % 2 else ""))
    slab_a = _slab(range(0, 3), text)
    slab_b = _slab(range(3, 6), text)
    src = tmp_path / "src"
    os.makedirs(src)
    pq.write_table(slab_a, str(src / "a.parquet"))
    path_b = str(src / "b.parquet")

    cfg = IndexConfig(docs_per_partition=16, num_shards=2,
                      keyword_fields=("role", "tool"))
    idir = str(tmp_path / "idx")

    # [1] cold build over slab A
    build_index([str(src / "a.parquet")], idir, cfg)
    s = Searcher(idir, num_readers=2)
    assert s.count("alpha") == len(slab_a)
    assert s.count("beta") == 10  # conv c001 only
    s.close()

    # [2] incremental append: superset input adds slab B's convs
    pq.write_table(slab_b, path_b)
    build_index([str(src / "a.parquet"), path_b], idir, cfg)
    s = Searcher(idir, num_readers=2)
    n_all = len(slab_a) + len(slab_b)
    assert s.count("alpha") == n_all
    assert s.count("beta") == 30  # c001, c003, c005
    s.close()

    # [3] additive upgrade: numeric turn_idx joins the schema in place
    cfg2 = IndexConfig(docs_per_partition=16, num_shards=2,
                       keyword_fields=("role", "tool"),
                       numeric_fields=("turn_idx",))
    upgrade_index(idir, cfg2)
    s = Searcher(idir, num_readers=2)
    assert s.count("turn_idx:[0 TO 4]") == 6 * 5  # turns 0..4 per conv
    # ...and the upgraded index still APPENDS (tag refreshed): rebuild
    # with the same inputs is a no-op
    m_before = build_index([str(src / "a.parquet"), path_b], idir, cfg2)
    assert m_before["n_docs"] == n_all

    # [4] tombstone one conversation's docs
    dead = s.match_docs("beta AND turn_idx:[9 TO 9]")  # one doc per
    assert len(dead) == 3  # beta conv tails: c001, c003, c005
    s.remove_docs([int(d) for d in dead])
    assert s.count("beta") == 27
    s.close()

    # [5] compact: physically expunge tombstones into a fresh layout
    cdir = str(tmp_path / "compacted")
    cm = compact_index(idir, cdir, docs_per_partition=32)
    assert cm["n_docs"] == n_all - 3
    sc = Searcher(cdir, num_readers=2)
    assert sc.count("beta") == 27
    assert sc.count("alpha") == n_all - 3
    sc.close()

    # [6] replicate the compacted index; the replica answers identically
    rdir = str(tmp_path / "replica")
    sync_index(cdir, rdir)
    assert verify_sync(rdir)["ok"]
    sr = Searcher(rdir, num_readers=2)
    assert sr.count("beta") == 27

    # [7] JSON request surface over the replica, rank-parity vs direct
    resp = execute_request(sr, {
        "name": "lifecycle", "tenantId": "demo",
        "query": {"query": "alpha beta", "defaultField": "text",
                  "strategy": "BM25", "desiredNumberOfResults": 5}})
    direct = sr.topk("alpha beta", 5, "bm25")
    assert [r["docId"] for r in resp["answer"]["results"]] == \
        direct["doc_id"].to_pylist()
    assert resp["answer"]["results"]

    # [8] versioned REPAIR of an existing turn, live readers refreshed
    from miru_ray.index.repair import repair_index
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    docstore = pads.dataset(os.path.join(rdir, "docstore"),
                            format="parquet").to_table()
    row = docstore.filter(pc.equal(docstore["doc_id"],
                                   docstore["doc_id"][0]))
    row = row.drop_columns(
        [c for c in ("doc_id", "version") if c in row.schema.names])
    ti = row.schema.get_field_index("text")
    row = row.set_column(ti, "text",
                         pa.array(["zzlifecyclemark gamma"], pa.string()))
    row = row.append_column("version", pa.array([2], pa.int64()))
    repair_index(rdir, row)
    assert sr.refresh_partitions() >= 1
    assert sr.count("zzlifecyclemark") == 1
    assert sr.count("alpha") == n_all - 4  # the repaired doc lost 'alpha'
    sr.close()

    # [9] tenant-level sync: the repaired replica bootstraps a second
    # cluster through the sender/receiver protocol (repair entry rides)
    from miru_ray.index.sync import SyncReceiver, SyncSender
    from miru_ray.index.tenants import TenantRegistry
    reg = TenantRegistry(str(tmp_path / "reg"))
    reg.register("life", rdir, IndexConfig.from_dict(cm["config"]))
    recv = SyncReceiver(str(tmp_path / "dst"))
    sender = SyncSender(reg, recv, batch_rows=20)
    out = sender.sync_tenant("life")
    assert out["mode"] == "initial"
    s2 = recv.registry.searcher("life", num_readers=1)
    assert s2.count("zzlifecyclemark") == 1
    assert s2.count("beta") == 27

    # [10] a post-sync REPAIR at the source replays forward and the
    # two clusters converge
    row2 = row.set_column(row.schema.get_field_index("text"), "text",
                          pa.array(["zzlifecyclemark delta"], pa.string()))
    row2 = row2.set_column(row2.schema.get_field_index("version"),
                           "version", pa.array([3], pa.int64()))
    repair_index(rdir, row2)
    reg.refresh()
    out = sender.sync_tenant("life")
    assert out["repairs_sent"] >= 1 and out["rows"] == 0
    s3 = recv.registry.searcher("life", num_readers=1)
    assert s3.count("delta") == 1 and s3.count("gamma") == 0
    reg.close()
    recv.registry.close()
