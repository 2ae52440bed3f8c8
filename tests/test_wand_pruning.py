"""Block-max WAND pruning: (a) result is exactly the brute-force top-k;
(b) non-competitive blocks are never decoded (the whole point —
WANDScorer.cpp:308-321 moveToNextBlock skipping)."""

import numpy as np

from diagon_spark.index import codec
from diagon_spark.search import wand
from diagon_spark.search.bm25 import avg_field_length, idf
from diagon_spark.index.norms import encode_norm


def _make_term(rng, n_docs, df, max_tf, doc_space):
    docs = np.sort(rng.choice(doc_space, size=df, replace=False)).astype(np.int64)
    tfs = rng.randint(1, max_tf + 1, df).astype(np.int64)
    lens = rng.randint(20, 400, df)
    norms = encode_norm(lens)
    enc = codec.encode_term_postings(docs, tfs, norms)
    row = {k: (v.tolist() if isinstance(v, np.ndarray) else v)
           for k, v in enc.items()}
    row["chunk"] = 0
    return docs, tfs, norms, row


def test_wand_exact_and_prunes():
    rng = np.random.RandomState(7)
    n_docs = 20_000
    doc_space = np.arange(n_docs)
    max_doc, sttf = n_docs, n_docs * 50

    postings, params, truth = {}, {}, {}
    # one rare high-idf term + several mid terms: sparse disjunction
    spec = {"rare": (40, 3), "mid1": (800, 3), "mid2": (1200, 2),
            "mid3": (2000, 2)}
    for t, (df, mtf) in spec.items():
        docs, tfs, norms, row = _make_term(rng, n_docs, df, mtf, doc_space)
        postings[t] = wand._SegmentPostings([row])
        p = wand.TermScorerParams(
            np.float32(idf(df, max_doc)),
            float(avg_field_length(sttf, max_doc)),
            idf64=float(np.log(1.0 + (max_doc - df + 0.5) / (df + 0.5))),
            avg64=sttf / max_doc)
        params[t] = p
        truth[t] = (docs, p.score(tfs, norms, False))

    # brute force expected top-k
    acc = {}
    for t in spec:
        for d, s in zip(*truth[t]):
            acc[int(d)] = np.float32(acc.get(int(d), np.float32(0))) + s
    want = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    # spy on block decodes
    decoded = []
    orig = wand._SegmentPostings.decode_block

    def spy(self, b, want_positions=False):
        decoded.append(b)
        return orig(self, b, want_positions)

    wand._SegmentPostings.decode_block = spy
    try:
        docs, scores = wand.wand_disjunction(postings, params,
                                             list(spec), k=10)
    finally:
        wand._SegmentPostings.decode_block = orig

    got = list(zip(docs.tolist(), scores.tolist()))
    assert [d for d, _ in got] == [d for d, _ in want]
    for (d1, s1), (d2, s2) in zip(got, want):
        assert abs(s1 - float(s2)) < 1e-6

    total_blocks = sum(len(postings[t].block_index) for t in spec)
    assert len(set(decoded)) < total_blocks, \
        f"no pruning: decoded {len(set(decoded))}/{total_blocks} blocks"


def test_dense_or_uses_bulk_path_and_is_exact():
    rng = np.random.RandomState(3)
    n_docs = 5000
    doc_space = np.arange(n_docs)
    max_doc, sttf = n_docs, n_docs * 50
    postings, params, acc = {}, {}, {}
    for t, df in [("a", 4000), ("b", 3500)]:
        docs, tfs, norms, row = _make_term(rng, n_docs, df, 4, doc_space)
        postings[t] = wand._SegmentPostings([row])
        p = wand.TermScorerParams(np.float32(idf(df, max_doc)),
                                  float(avg_field_length(sttf, max_doc)))
        params[t] = p
        for d, s in zip(docs, p.score(tfs, norms, False)):
            acc[int(d)] = np.float32(acc.get(int(d), np.float32(0))) + s
    want = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    docs, scores = wand.wand_disjunction(postings, params, ["a", "b"], k=20)
    assert docs.tolist() == [d for d, _ in want]


def test_maxscore_essential_split_exact():
    """MAXSCORE path (essential/non-essential by global term upper bound,
    MaxScoreBulkScorer.cpp:28-90): with one rare high-idf term and heavy
    low-idf terms, only the rare term's postings need full decoding; the
    result must still be the exact brute-force top-k."""
    rng = np.random.RandomState(11)
    n_docs = 50_000
    doc_space = np.arange(n_docs)
    max_doc, sttf = n_docs, n_docs * 50
    postings, params, acc = {}, {}, {}
    spec = {"rare": 30, "heavy1": 20_000, "heavy2": 25_000}
    for t, df in spec.items():
        docs, tfs, norms, row = _make_term(rng, n_docs, df, 3, doc_space)
        postings[t] = wand._SegmentPostings([row])
        p = wand.TermScorerParams(
            np.float32(idf(df, max_doc)),
            float(avg_field_length(sttf, max_doc)))
        params[t] = p
        for d, s in zip(docs, p.score(tfs, norms, False)):
            acc[int(d)] = np.float32(acc.get(int(d), np.float32(0))) + s
    want = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    decoded = []
    orig = wand._SegmentPostings.decode_block

    def spy(self, b, want_positions=False):
        decoded.append((id(self), b))
        return orig(self, b, want_positions)

    wand._SegmentPostings.decode_block = spy
    try:
        stats = {}
        docs, scores = wand.wand_disjunction(postings, params, list(spec),
                                             k=10, stats_out=stats)
    finally:
        wand._SegmentPostings.decode_block = orig

    assert docs.tolist() == [d for d, _ in want]
    for s1, (_, s2) in zip(scores.tolist(), want):
        assert abs(s1 - float(s2)) < 1e-6
    # the heavy terms' postings must NOT be fully decoded
    total_blocks = sum(len(postings[t].block_index) for t in spec)
    assert len(set(decoded)) < 0.5 * total_blocks, \
        f"maxscore skipped nothing: {len(set(decoded))}/{total_blocks}"
    assert stats["exact"] is False  # GTE relation: count is a lower bound
    # pruning observability counters agree with the decode spy
    assert stats["blocks_total"] == total_blocks
    assert stats["blocks_decoded"] == len(set(decoded))
    assert stats["blocks_decoded"] < stats["blocks_total"]


def test_maxscore_with_banned_docs_exact():
    """θ must be computed over LIVE docs: banning the probe term's top
    docs must not prune true top-k survivors."""
    rng = np.random.RandomState(13)
    n_docs = 50_000
    doc_space = np.arange(n_docs)
    max_doc, sttf = n_docs, n_docs * 50
    postings, params, acc = {}, {}, {}
    for t, df in {"rare": 40, "heavy1": 20_000, "heavy2": 25_000}.items():
        docs, tfs, norms, row = _make_term(rng, n_docs, df, 3, doc_space)
        postings[t] = wand._SegmentPostings([row])
        p = wand.TermScorerParams(
            np.float32(idf(df, max_doc)),
            float(avg_field_length(sttf, max_doc)))
        params[t] = p
        for d, s in zip(docs, p.score(tfs, norms, False)):
            acc[int(d)] = np.float32(acc.get(int(d), np.float32(0))) + s
    # ban the 5 best overall docs
    best = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
    banned = np.asarray(sorted(d for d, _ in best[:5]), dtype=np.int64)
    want = [(d, s) for d, s in best if d not in set(banned.tolist())][:10]
    docs, scores = wand.wand_disjunction(
        postings, params, ["rare", "heavy1", "heavy2"], k=10, banned=banned)
    assert docs.tolist() == [d for d, _ in want]
