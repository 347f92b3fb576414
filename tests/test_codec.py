import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from miru_ray.codec import (BLOCK_SIZE, bulk_encode_postings, decode_doc_ids,
                            decode_tfs, encode_postings, varint_decode,
                            varint_encode)


@given(st.lists(st.integers(0, 2**63 - 1), min_size=0, max_size=500))
@settings(max_examples=50, deadline=None)
def test_varint_roundtrip(vals):
    a = np.array(vals, np.uint64)
    assert (varint_decode(varint_encode(a), len(a)) == a).all()


def test_varint_known():
    assert varint_encode(np.array([0], np.uint64)) == b"\x00"
    assert varint_encode(np.array([127], np.uint64)) == b"\x7f"
    assert varint_encode(np.array([128], np.uint64)) == b"\x80\x01"
    assert varint_encode(np.array([300], np.uint64)) == b"\xac\x02"


@given(st.sets(st.integers(0, 10**7), min_size=1, max_size=1000))
@settings(max_examples=30, deadline=None)
def test_postings_roundtrip(doc_set):
    docs = np.array(sorted(doc_set), np.int64)
    rng = np.random.default_rng(len(docs))
    tfs = rng.integers(1, 100, len(docs)).astype(np.int64)
    ep = encode_postings(docs, tfs)
    assert (decode_doc_ids(ep.doc_bytes, ep.df) == docs).all()
    assert (decode_tfs(ep.tf_bytes, ep.df) == tfs).all()
    assert ep.df == len(docs) and ep.cf == int(tfs.sum())
    # block-max invariants (FIXTURES.md §F4 inv. 3)
    nblocks = (len(docs) + BLOCK_SIZE - 1) // BLOCK_SIZE
    assert len(ep.block_last_doc) == nblocks
    for i in range(nblocks):
        sl = slice(i * BLOCK_SIZE, (i + 1) * BLOCK_SIZE)
        assert ep.block_last_doc[i] == docs[sl][-1]
        assert ep.block_max_tf[i] == tfs[sl].max()


def test_bulk_matches_single():
    rng = np.random.default_rng(0)
    flat_docs, flat_tfs, starts, singles = [], [], [], []
    off = 0
    for _ in range(50):
        docs = np.unique(rng.integers(0, 100_000, rng.integers(1, 400)))
        tfs = rng.integers(1, 30, len(docs)).astype(np.int64)
        singles.append(encode_postings(docs.astype(np.int64), tfs))
        starts.append(off)
        off += len(docs)
        flat_docs.append(docs)
        flat_tfs.append(tfs)
    enc = bulk_encode_postings(np.concatenate(flat_docs),
                               np.concatenate(flat_tfs),
                               np.array(starts, np.int64))
    for i, ep in enumerate(singles):
        assert enc["doc_bytes"][i] == ep.doc_bytes
        assert enc["tf_bytes"][i] == ep.tf_bytes
        assert enc["df"][i] == ep.df and enc["cf"][i] == ep.cf
        lo, hi = enc["block_offsets"][i], enc["block_offsets"][i + 1]
        assert (enc["block_last_doc"][lo:hi] == ep.block_last_doc).all()
        assert (enc["block_max_tf"][lo:hi] == ep.block_max_tf).all()


def test_empty_group_rejected():
    with pytest.raises(ValueError):
        bulk_encode_postings(np.array([1]), np.array([1]),
                             np.array([0, 1], np.int64))
