"""Posting-block codec round-trips (PostingsWriterReaderRoundTripTest /
VByteTest analogues), incl. hypothesis property tests."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from diagon_spark.index import codec


def test_pack_unpack_bits():
    vals = np.array([0, 1, 5, 127, 128, 1023], dtype=np.int64)
    for bits in [10, 16, 32]:
        buf = codec.pack_bits(vals, bits)
        got = codec.unpack_bits(buf, bits, len(vals))
        assert got.tolist() == vals.tolist()


def test_pack_zero_bits():
    assert codec.pack_bits(np.zeros(5, np.int64), 0) == b""
    assert codec.unpack_bits(b"", 0, 5).tolist() == [0] * 5


def test_varint_roundtrip_basic():
    vals = np.array([0, 1, 127, 128, 300, 2**20, 2**40, 2**63 - 1], dtype=np.uint64)
    got = codec.varint_decode(codec.varint_encode(vals))
    assert got.tolist() == vals.tolist()


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
def test_varint_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    got = codec.varint_decode(codec.varint_encode(arr))
    assert got.tolist() == arr.tolist()


@settings(max_examples=100, deadline=None)
@given(st.data())
def test_postings_roundtrip_property(data):
    n = data.draw(st.integers(min_value=1, max_value=700))
    gaps = data.draw(st.lists(st.integers(min_value=1, max_value=10_000),
                              min_size=n, max_size=n))
    start = data.draw(st.integers(min_value=0, max_value=2**40))
    docs = start + np.cumsum(np.array(gaps, dtype=np.int64))
    tfs = np.array(data.draw(st.lists(st.integers(1, 500), min_size=n, max_size=n)),
                   dtype=np.int64)
    norms = np.array(data.draw(st.lists(st.integers(0, 127), min_size=n, max_size=n)),
                     dtype=np.uint8)
    enc = codec.encode_term_postings(docs, tfs, norms)
    d, t, nn = codec.decode_all(enc)
    assert d.tolist() == docs.tolist()
    assert t.tolist() == tfs.tolist()
    assert nn.tolist() == norms.tolist()
    # impact metadata
    nb = (n + codec.BLOCK - 1) // codec.BLOCK
    assert len(enc["block_first"]) == nb
    for bi in range(nb):
        lo, hi = bi * codec.BLOCK, min((bi + 1) * codec.BLOCK, n)
        assert enc["block_first"][bi] == docs[lo]
        assert enc["block_last"][bi] == docs[hi - 1]
        assert enc["block_max_tf"][bi] == tfs[lo:hi].max()
        bn = norms[lo:hi].astype(np.int64)
        assert enc["block_max_norm"][bi] == np.where(bn == 0, 127, bn).max()


def test_postings_roundtrip_with_positions():
    rng = np.random.RandomState(7)
    n = 300
    docs = np.cumsum(rng.randint(1, 50, n)).astype(np.int64)
    tfs = rng.randint(1, 6, n).astype(np.int64)
    positions = [np.sort(rng.choice(5000, size=tf, replace=False)).astype(np.int64)
                 for tf in tfs]
    norms = rng.randint(1, 128, n).astype(np.uint8)
    enc = codec.encode_term_postings(docs, tfs, norms, positions)
    d, t, nn, pos = codec.decode_all(enc, want_positions=True)
    assert d.tolist() == docs.tolist()
    assert t.tolist() == tfs.tolist()
    for got, want in zip(pos, positions):
        assert got.tolist() == want.tolist()


def test_block_selective_decode():
    n = 500
    docs = np.arange(0, n * 3, 3, dtype=np.int64)
    tfs = np.ones(n, dtype=np.int64)
    norms = np.full(n, 64, dtype=np.uint8)
    enc = codec.encode_term_postings(docs, tfs, norms)
    d, t, nn = codec.decode_block(enc, 2)
    lo, hi = 2 * codec.BLOCK, 3 * codec.BLOCK
    assert d.tolist() == docs[lo:hi].tolist()
