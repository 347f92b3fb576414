"""Per-segment term blooms: zero false negatives, cold-segment skips."""

import numpy as np

from miru_ray.index.segments import (SegmentReader, bloom_may_contain,
                                     build_term_bloom, read_segment_bloom)
from miru_ray.query.engine import PartitionReader


def test_bloom_no_false_negatives_and_low_fp():
    rng = np.random.default_rng(3)
    terms = np.array([f"term{i:06d}" for i in range(5000)], dtype=object)
    m, packed_bytes = build_term_bloom(terms)
    packed = np.frombuffer(packed_bytes, np.uint8)
    assert all(bloom_may_contain(m, packed, t) for t in terms)
    absent = [f"absent{i:06d}" for i in range(2000)]
    fp = sum(bloom_may_contain(m, packed, t) for t in absent) / len(absent)
    assert fp < 0.05  # ~2% design point


def test_segment_bloom_roundtrip_and_lookup_skip(xs_index):
    import glob
    import os
    seg_path = sorted(glob.glob(os.path.join(xs_index,
                                             "segments/*.parquet")))[0]
    bloom = read_segment_bloom(seg_path)
    assert bloom is not None
    m, packed = bloom
    seg = SegmentReader(seg_path)
    # every indexed term passes its own segment's bloom
    for t in seg.terms[:200]:
        assert bloom_may_contain(m, packed, t)

    # a cold PartitionReader answers a definite-miss lookup WITHOUT loading
    # any segment table
    r = PartitionReader(xs_index, [0])
    assert r._lookup(0, "zzzz_not_a_term_zzzz") == (None, None)
    assert not r._seg_cache  # stayed cold
    # and a real term still resolves
    some = seg.terms[0]
    s2, row = r._lookup(0, some)
    if s2 is not None:  # term may hash to another shard of pid 0
        assert s2.terms[row] == some
