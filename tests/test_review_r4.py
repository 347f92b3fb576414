"""Regression tests for the round-4 self-review findings: boosted
pagination, boosted fuzzy/phrase/group scoring, prefix colon leakage,
character-based fuzzy distance, NULL-value metrics counts, tenant
registry cache invalidation."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def boost_index(ray_session, tmp_path_factory):
    from miru_ray.config import IndexConfig
    from miru_ray.index.build import build_index
    tmp = tmp_path_factory.mktemp("boost_idx")
    texts = ["spark merge", "spark spark", "merge merge", "spark",
             "merge", "spark merge spark", "café news", "cafe news",
             "turnip soup", "tool time"]
    docs = pa.table({
        "conv_id": pa.array([f"c{i}" for i in range(len(texts))]),
        "turn_idx": pa.array([0] * len(texts), pa.int32()),
        "role": pa.array(["user"] * len(texts)),
        "tool": pa.array(["hammer"] * len(texts)),
        "text": pa.array(texts),
        "ts": pa.array(np.arange(len(texts)) * 1000, pa.int64())})
    src = str(tmp / "src")
    os.makedirs(src)
    pq.write_table(docs, os.path.join(src, "d.parquet"))
    idir = str(tmp / "idx")
    build_index(src, idir, IndexConfig(
        docs_per_partition=4, num_shards=2,
        keyword_fields=("role", "tool"), numeric_fields=("turn_idx",)))
    return idir


def test_topk_paged_applies_boosts(boost_index):
    """Review r4: topk_paged dropped the boosts dict, so paginated
    boosted queries were ranked unboosted."""
    from miru_ray.query.engine import Searcher
    s = Searcher(boost_index, num_readers=1)
    full = s.topk("spark^3 OR merge", 10).to_pandas()
    paged = s.topk_paged("spark^3 OR merge", page_size=3).to_pandas()
    assert list(paged["doc_id"])[:len(full)] == list(full["doc_id"])
    assert np.allclose(paged["score"][:len(full)], full["score"])
    # and the boost actually changes the order vs unboosted
    unboosted = s.topk("spark OR merge", 10).to_pandas()
    assert list(full["doc_id"]) != list(unboosted["doc_id"])
    s.close()


def test_boosted_fuzzy_and_phrase_score(boost_index):
    """Review r4: Boost(Fuzzy) and Boost(Phrase) parsed but never
    reached the scorer."""
    from miru_ray.query.engine import Searcher
    s = Searcher(boost_index, num_readers=1)
    base = s.topk("sparc~1 OR merge", 10).to_pandas()
    boosted = s.topk("sparc~1^4 OR merge", 10).to_pandas()
    # same matches, different scores — the fuzzy expansion got the boost
    assert set(base["doc_id"]) == set(boosted["doc_id"])
    assert not np.allclose(
        base.sort_values("doc_id")["score"].to_numpy(),
        boosted.sort_values("doc_id")["score"].to_numpy())
    bp = s.topk('"spark merge"^2 OR merge', 10).to_pandas()
    pp = s.topk('"spark merge" OR merge', 10).to_pandas()
    assert not np.allclose(bp.sort_values("doc_id")["score"].to_numpy(),
                           pp.sort_values("doc_id")["score"].to_numpy())
    # group boost
    gb = s.topk("(spark merge)^2", 10).to_pandas()
    gp = s.topk("spark merge", 10).to_pandas()
    assert np.allclose(gb.sort_values("doc_id")["score"],
                       2 * gp.sort_values("doc_id")["score"])
    s.close()


def test_text_prefix_skips_field_terms(boost_index):
    """Review r4: a text prefix query must not expand into keyword /
    numeric / bigram pseudo-terms sharing the dict ('t*' would swallow
    tool:... and turn_idx:... postings)."""
    from miru_ray.query.engine import Searcher
    s = Searcher(boost_index, num_readers=1)
    # 't*' matches only the text tokens 'turnip'/'time'/'tool'(text)
    docs = s.match_docs("t*")
    expect = {8, 9}  # 'turnip soup', 'tool time'
    assert set(int(d) for d in docs) == expect
    # keyword prefixes still expand within their field
    assert s.count("tool:ham*") == 10
    s.close()


def test_fuzzy_distance_is_character_based(boost_index):
    """Review r4: 'café' vs 'cafe' is ONE character edit (DuckDB
    levenshtein semantics), not two byte edits."""
    from miru_ray.query.engine import Searcher
    s = Searcher(boost_index, num_readers=1)
    assert s.count("cafe~1") == 2   # both 'café news' and 'cafe news'
    assert s.count("café~1") == 2
    s.close()


def test_metrics_counts_null_values(tmp_path):
    """Review r4: n_events must be count(*) — NULL values stay in the
    event count and the avg denominator."""
    from miru_ray.ops.analytics import metrics
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pq.write_table(pa.table({
        "ts": pa.array([0, 1000, 2000], pa.timestamp("us")),
        "value": pa.array([2.0, None, 4.0], pa.float64())}),
        os.path.join(d, "events.parquet"))
    out = metrics(d).to_pandas()
    assert int(out["n_events"].iloc[0]) == 3
    assert out["sum_value"].iloc[0] == 6.0
    assert out["avg_value"].iloc[0] == 2.0


def test_tenant_register_invalidates_searcher_cache(tmp_path):
    """Review r4: re-pointing a tenant at a rebuilt index must not keep
    serving from the cached Searcher on the old directory."""
    from miru_ray.config import IndexConfig
    from miru_ray.index.build import build_index
    from miru_ray.index.tenants import TenantRegistry

    def corpus(texts, name):
        d = str(tmp_path / name)
        os.makedirs(d)
        pq.write_table(pa.table({
            "conv_id": pa.array([f"c{i}" for i in range(len(texts))]),
            "turn_idx": pa.array([0] * len(texts), pa.int32()),
            "role": pa.array(["user"] * len(texts)),
            "text": pa.array(texts),
            "ts": pa.array(np.arange(len(texts)), pa.int64())}),
            os.path.join(d, "d.parquet"))
        return d

    cfg = IndexConfig(docs_per_partition=4, num_shards=1,
                      keyword_fields=())
    reg = TenantRegistry(str(tmp_path / "reg"))
    a = str(tmp_path / "idx_a")
    build_index(corpus(["alpha"] * 3, "src_a"), a, cfg)
    reg.register("t", a, cfg)
    assert reg.count_all("alpha") == {"t": 3}
    b = str(tmp_path / "idx_b")
    build_index(corpus(["alpha alpha"] * 5, "src_b"), b, cfg)
    reg.register("t", b, cfg)           # re-point: cache must invalidate
    assert reg.count_all("alpha") == {"t": 5}
    reg.close()


def test_bucket_batch_null_ts_and_all_null_bucket(tmp_path):
    """Second-review r4: NULL ts yields a null bucket (no crash); a
    bucket whose values are all NULL keeps NULL sum/avg like the SQL
    oracle, while its n_events still counts the rows."""
    from miru_ray.ops.analytics import metrics
    d = str(tmp_path / "sf")
    os.makedirs(d)
    base = 1_704_067_200_000_000  # 2024-01-01, the bucketing epoch
    pq.write_table(pa.table({
        # bucket 0: real values + a NULL ts row; bucket 1: all-NULL values
        "ts": pa.array([base, base + 1, None, base + 3_600_000_001,
                        base + 3_600_000_002], pa.timestamp("us")),
        "value": pa.array([2.0, 4.0, 9.0, None, None], pa.float64())}),
        os.path.join(d, "events.parquet"))
    out = metrics(d).to_pandas().set_index("bucket")
    assert out.loc[0, "n_events"] == 2 and out.loc[0, "sum_value"] == 6.0
    assert out.loc[1, "n_events"] == 2
    assert pd.isna(out.loc[1, "sum_value"]) and pd.isna(out.loc[1,
                                                                "avg_value"])


def test_group_boost_binds_to_group_only():
    """Second-review r4: '(a b)^2' must not leak the boost onto an
    OR-merged sibling or a NOT'd group's positive clause."""
    from miru_ray.query.filter import collect_boosts
    from miru_ray.query.parser import parse_query
    assert collect_boosts(parse_query("x OR (a b)^2")) == {"a": 2.0,
                                                           "b": 2.0}
    q = parse_query("a NOT (b c)^2")
    assert "a" not in collect_boosts(q)


def test_contiguity_guard_catches_nulls_and_dup_gap(tmp_path):
    """Third-review r4: the old max+1==cnt check admitted NULL turn_idx
    (count skips nulls → INT64_MIN doc ids) and duplicate+gap patterns
    like [0,2,2]; the moments check rejects both."""
    from miru_ray.index.build import build_conv_offsets

    def corpus(turns, name):
        d = str(tmp_path / name)
        os.makedirs(d)
        pq.write_table(pa.table({
            "conv_id": pa.array(["c"] * len(turns)),
            "turn_idx": pa.array(turns, pa.int32()),
            "text": pa.array(["x"] * len(turns))}),
            os.path.join(d, "a.parquet"))
        return os.path.join(d, "a.parquet")

    with pytest.raises(Exception, match="NULL"):
        build_conv_offsets([corpus([0, 1, None], "nulls")],
                           str(tmp_path / "o1.parquet"))
    with pytest.raises(Exception, match="not contiguous"):
        build_conv_offsets([corpus([0, 2, 2], "dupgap")],
                           str(tmp_path / "o2.parquet"))
    with pytest.raises(Exception, match="not contiguous"):
        # moments catch the (count, min, max, sum)-equal non-permutation
        build_conv_offsets([corpus([0, 1, 1, 4, 4], "sumsq")],
                           str(tmp_path / "o3.parquet"))
    # the valid permutation still passes
    m = build_conv_offsets([corpus([2, 0, 1], "ok")],
                           str(tmp_path / "o4.parquet"))
    assert m == {"n_docs": 3, "n_convs": 1}


def test_overwrite_regenerates_offsets(tmp_path):
    """Third-review r4: overwrite=True must rebuild the conv-offsets
    checkpoint too, not silently reuse a stale file."""
    from miru_ray.config import IndexConfig
    from miru_ray.index.build import build_index
    src = str(tmp_path / "src")
    os.makedirs(src)
    pq.write_table(pa.table({
        "conv_id": pa.array(["c0", "c0", "c1"]),
        "turn_idx": pa.array([0, 1, 0], pa.int32()),
        "role": pa.array(["user"] * 3),
        "text": pa.array(["alpha"] * 3),
        "ts": pa.array([0, 1, 2], pa.int64())}),
        os.path.join(src, "a.parquet"))
    cfg = IndexConfig(docs_per_partition=2, num_shards=1,
                      keyword_fields=("role",))
    idir = str(tmp_path / "idx")
    build_index(src, idir, cfg)
    off = os.path.join(idir, "conv_offsets.parquet")
    # corrupt the offsets file; a plain rebuild would reuse it (the meta
    # fingerprint still matches) — overwrite must regenerate it
    pq.write_table(pa.table({
        "conv_id": pa.array(["zz"]), "offset": pa.array([99], pa.int64()),
        "cnt": pa.array([1], pa.int64())}), off)
    build_index(src, idir, cfg, overwrite=True)
    got = pq.read_table(off)
    assert got["conv_id"].to_pylist() == ["c0", "c1"]
    assert got["offset"].to_pylist() == [0, 2]


def test_read_parquet_clean_shapes(tmp_path, ray_session):
    """read_parquet_clean: metadata-stripped column-pruned schema for
    flat files; falls back to Ray inference when a requested column
    lives outside the file schema (hive partition dirs)."""
    import ray.data

    from miru_ray.util import read_parquet_clean
    p = str(tmp_path / "t.parquet")
    df = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"],
                       "part": [0, 0, 1]})
    df.to_parquet(p)  # pandas metadata attached (defeats schema hashing)
    ds = read_parquet_clean(p, columns=["a"])
    t = ds.take_batch(10, batch_format="pyarrow")
    assert t.column_names == ["a"] and t.schema.metadata is None
    # hive layout: the partition column is NOT in the file schema
    hd = str(tmp_path / "hive")
    ray.data.from_pandas(df).write_parquet(hd, partition_cols=["part"])
    ds2 = read_parquet_clean(hd, columns=["a", "part"])
    t2 = ds2.take_batch(10, batch_format="pyarrow")
    assert set(t2.column_names) == {"a", "part"}
    assert t2.num_rows == 3
