"""encode_segment_batch must be BYTE-IDENTICAL to per-term
encode_term_postings across randomized segments (the batched fast path
cannot change the on-disk format)."""

import numpy as np
import pytest

from diagon_spark.index.codec import (encode_segment_batch,
                                      encode_term_postings)


def _random_segment(rng, n_terms, max_docs_per_term, max_tf):
    g_docs, tfs, g_norms, t_starts, t_ends = [], [], [], [], []
    pos_deltas, td_starts = [], []
    gpos = 0
    vpos = 0
    for _ in range(n_terms):
        n = rng.randint(1, max_docs_per_term + 1)
        docs = np.sort(rng.choice(np.arange(0, max_docs_per_term * 40),
                                  size=n, replace=False)).astype(np.int64)
        t = rng.randint(1, max_tf + 1, size=n).astype(np.int64)
        nm = rng.randint(0, 128, size=n).astype(np.int64)
        t_starts.append(gpos)
        gpos += n
        t_ends.append(gpos)
        g_docs.append(docs)
        tfs.append(t)
        g_norms.append(nm)
        for tf_i in t:
            td_starts.append(vpos)
            # absolute first position, then gaps
            p = np.sort(rng.choice(np.arange(0, 4000), size=tf_i,
                                   replace=False)).astype(np.int64)
            d = np.diff(p, prepend=0)
            d[0] = p[0]
            pos_deltas.append(d)
            vpos += tf_i
    return (np.concatenate(g_docs), np.concatenate(tfs),
            np.concatenate(g_norms),
            np.asarray(t_starts, dtype=np.int64),
            np.asarray(t_ends, dtype=np.int64),
            np.concatenate(pos_deltas),
            np.asarray(td_starts, dtype=np.int64))


@pytest.mark.parametrize("seed,chunk_docs", [(1, 16384), (2, 200),
                                             (3, 128), (4, 130), (5, 64)])
def test_batch_equals_per_term(seed, chunk_docs):
    rng = np.random.RandomState(seed)
    g_docs, tfs, g_norms, t_starts, t_ends, pos_all, td_starts = \
        _random_segment(rng, n_terms=40, max_docs_per_term=300, max_tf=5)
    recs = encode_segment_batch(g_docs, tfs, g_norms, t_starts, t_ends,
                                chunk_docs, pos_all, td_starts)
    tf_vcum = np.concatenate(([0], np.cumsum(tfs)))
    by_key = {(r["term_i"], r["chunk"]): r for r in recs}
    for ti, (ts, te) in enumerate(zip(t_starts, t_ends)):
        t_docs = g_docs[ts:te]
        t_tfs = tfs[ts:te]
        t_norms = g_norms[ts:te]
        for ci, lo in enumerate(range(0, te - ts, chunk_docs)):
            hi = min(lo + chunk_docs, te - ts)
            v_lo = tf_vcum[ts + lo]
            v_hi = tf_vcum[ts + hi]
            ref = encode_term_postings(t_docs[lo:hi], t_tfs[lo:hi],
                                       t_norms[lo:hi].astype(np.uint8),
                                       pos_deltas=pos_all[v_lo:v_hi])
            got = by_key[(ti, ci)]
            assert int(got["df"]) == int(ref["df"])
            assert bytes(got["doc_blocks"]) == bytes(ref["doc_blocks"])
            assert bytes(got["tf_blocks"]) == bytes(ref["tf_blocks"])
            assert bytes(got["norm_bytes"]) == bytes(ref["norm_bytes"])
            assert bytes(got["pos_blocks"]) == bytes(ref["pos_blocks"])
            for k in ("block_first", "block_last", "block_max_tf",
                      "block_max_norm", "block_doc_off", "block_tf_off",
                      "block_pos_off"):
                np.testing.assert_array_equal(
                    np.asarray(got[k]), np.asarray(ref[k]), err_msg=k)


def test_batch_no_positions():
    rng = np.random.RandomState(7)
    g_docs, tfs, g_norms, t_starts, t_ends, _pos, _td = \
        _random_segment(rng, n_terms=10, max_docs_per_term=200, max_tf=3)
    recs = encode_segment_batch(g_docs, tfs, g_norms, t_starts, t_ends,
                                128, None, None)
    tf_vcum = np.concatenate(([0], np.cumsum(tfs)))
    for r in recs:
        ts = t_starts[r["term_i"]]
        lo = ts + r["chunk"] * 128
        hi = min(lo + 128, t_ends[r["term_i"]])
        ref = encode_term_postings(g_docs[lo:hi], tfs[lo:hi],
                                   g_norms[lo:hi].astype(np.uint8))
        assert bytes(r["doc_blocks"]) == bytes(ref["doc_blocks"])
        assert r["pos_blocks"] is None


@pytest.mark.parametrize("slice_groups", [7, 64, 10**9])
def test_sliced_batch_equals_unsliced(slice_groups):
    """The cache-sized term-range slicer must be byte-identical to the
    one-pass batch (slices cut only at term boundaries)."""
    rng = np.random.RandomState(1234)
    args = _random_segment(rng, n_terms=37, max_docs_per_term=300,
                           max_tf=5)
    g_docs, tfs, g_norms, t_starts, t_ends, pos_deltas_all, td_starts = args
    ref = encode_segment_batch(g_docs, tfs, g_norms, t_starts, t_ends,
                               128, pos_deltas_all, td_starts,
                               slice_groups=10**9)
    got = encode_segment_batch(g_docs, tfs, g_norms, t_starts, t_ends,
                               128, pos_deltas_all, td_starts,
                               slice_groups=slice_groups)
    assert len(ref) == len(got)
    for a, b in zip(ref, got):
        assert set(a) == set(b)
        for k in a:
            av, bv = a[k], b[k]
            if isinstance(av, np.ndarray):
                assert np.array_equal(av, bv), k
            else:
                assert av == bv, k
