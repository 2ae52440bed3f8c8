"""Histogram aggregations — diagon_compute_histogram /
diagon_search_with_date_histogram parity (c_api/diagon_c_api.cpp:1257,
1471): fixed-interval bucketing over numeric doc values, unfiltered and
query-filtered (match set, no scoring)."""

import collections

import pytest

from diagon_spark import Searcher, build_index
from diagon_spark.analysis.tokenizer import tokenize
from diagon_spark.corpus import generate_pandas
from diagon_spark.search.query import Boolean, MatchAll, Range, Term


@pytest.fixture(scope="module")
def hctx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("histidx"))
    pdf = generate_pandas(0, 120)
    cat = build_index(spark, spark.createDataFrame(pdf), out,
                      num_segments=3, num_buckets=4, positions=False)
    s = Searcher(spark, cat)
    docs = {int(r.doc_id): (str(r.content), int(r.doc_len))
            for r in spark.read.parquet(cat.docs_path)
            .select("doc_id", "content", "doc_len").collect()}
    return s, docs


def test_histogram_matches_python_oracle(hctx):
    s, docs = hctx
    interval, nb = 10.0, 50
    exp = collections.Counter()
    for _, (_, n) in docs.items():
        b = int((n - 0) / interval)
        if 0 <= b < nb:
            exp[b] += 1
    got = {int(r.bucket): int(r["count"])
           for r in s.histogram("doc_len", 0, interval, nb).collect()}
    assert got == dict(exp)
    in_range = sum(1 for _, (_, n) in docs.items() if n < interval * nb)
    assert sum(got.values()) == in_range


def test_histogram_out_of_range_dropped(hctx):
    s, docs = hctx
    # num_buckets=2 with interval 5: only doc_len in [0, 10) counted
    got = {int(r.bucket): int(r["count"])
           for r in s.histogram("doc_len", 0, 5.0, 2).collect()}
    exp_n = sum(1 for _, (_, n) in docs.items() if n < 10)
    assert sum(got.values()) == exp_n


def test_date_histogram_query_filtered(hctx):
    s, docs = hctx
    term, interval, lo, hi = "int", 10.0, 0.0, 1000.0
    exp = collections.Counter()
    for _, (content, n) in docs.items():
        if term in tokenize(content) and lo <= n < hi:
            key = float(int((n - lo) / interval) * interval + lo)
            exp[key] += 1
    got = {float(r.bucket_key): int(r["count"])
           for r in s.date_histogram(Term(term), "doc_len",
                                     interval, lo, hi).collect()}
    assert got == dict(exp)
    # keys come back ascending
    keys = [float(r.bucket_key) for r in
            s.date_histogram(Term(term), "doc_len", interval,
                             lo, hi).collect()]
    assert keys == sorted(keys)


def test_date_histogram_boolean_and_matchall(hctx):
    s, docs = hctx
    q = Boolean(must=[Term("int")], must_not=[Term("return")])
    got = s.date_histogram(q, "doc_len", 20.0, 0.0, 1000.0).collect()
    exp_n = sum(1 for _, (c, n) in docs.items()
                if "int" in tokenize(c) and "return" not in tokenize(c))
    assert sum(int(r["count"]) for r in got) == exp_n
    # MatchAll covers every doc
    all_rows = s.date_histogram(MatchAll(), "doc_len",
                                50.0, 0.0, 10_000.0).collect()
    assert sum(int(r["count"]) for r in all_rows) == len(docs)


def test_matching_docs_agrees_with_count(hctx):
    s, _ = hctx
    for q in (Term("int"), Boolean(must=[Term("int")],
                                   must_not=[Term("return")]),
              Range("doc_len", 10, 50)):
        assert s.matching_docs(q).count() == s.count(q), q


def test_local_searcher_histograms_match_spark(hctx):
    """Serving-tier parity: LocalSearcher histogram/date_histogram/
    matching_doc_ids/fetch agree with the Spark path on the same index."""
    s, docs = hctx
    from diagon_spark.search.local_reader import LocalSearcher
    ls = LocalSearcher(s.cat)

    spark_h = [(int(r.bucket), int(r["count"]))
               for r in s.histogram("doc_len", 0, 10.0, 50).collect()]
    assert ls.histogram("doc_len", 0, 10.0, 50) == spark_h

    q = Boolean(must=[Term("int")], must_not=[Term("return")])
    spark_dh = [(float(r.bucket_key), int(r["count"]))
                for r in s.date_histogram(q, "doc_len", 10.0, 0.0,
                                          1000.0).collect()]
    assert ls.date_histogram(q, "doc_len", 10.0, 0.0, 1000.0) == spark_dh

    ids_local = ls.matching_doc_ids(q)
    ids_spark = sorted(int(r.doc_id)
                       for r in s.matching_docs(q).collect())
    assert list(ids_local) == ids_spark

    got = ls.fetch([int(x) for x in ids_local[:3]],
                   columns=["doc_id", "doc_len"])
    assert [g["doc_id"] for g in got] == [int(x) for x in ids_local[:3]]
    assert all(g["doc_len"] == docs[g["doc_id"]][1] for g in got)


def test_local_histogram_pushes_range_predicate(hctx):
    """VERDICT r03 ask #2: the serving-tier histogram scans must push the
    [min, max) range predicate into the pyarrow parquet scan (row-group
    stats pruning) instead of loading the whole doc-values column."""
    s, _ = hctx
    from diagon_spark.search.local_reader import LocalSearcher
    ls = LocalSearcher(s.cat)

    # a NARROW histogram window: the scan must return only in-range rows
    narrow = ls.histogram("doc_len", 20.0, 5.0, 2)  # [20, 30)
    flt = str(ls._last_pushed_filter)
    assert "doc_len" in flt and ">=" in flt and "<" in flt
    n_rows = ls._pushed_values_scan("doc_len", 20.0, 30.0,
                                    ["doc_len"]).num_rows
    assert n_rows == sum(c for _, c in narrow)
    assert n_rows < ls.max_doc  # strictly fewer rows than the table

    ls._last_pushed_filter = None
    q = Term("int")
    ls.date_histogram(q, "doc_len", 10.0, 20.0, 40.0)
    flt = str(ls._last_pushed_filter)
    assert "doc_len" in flt and ">=" in flt and "<" in flt

    # results still agree with the Spark path on the narrow window
    spark_h = [(int(r.bucket), int(r["count"]))
               for r in s.histogram("doc_len", 20.0, 5.0, 2).collect()]
    assert narrow == spark_h
    spark_dh = [(float(r.bucket_key), int(r["count"]))
                for r in s.date_histogram(q, "doc_len", 10.0, 20.0,
                                          40.0).collect()]
    assert ls.date_histogram(q, "doc_len", 10.0, 20.0, 40.0) == spark_dh


def test_local_histogram_float_boundary_matches_spark(spark, tmp_path):
    """ADVICE r4: the pushed [min, min+interval*nb) pre-filter dropped
    values that numerically exceed the product yet still floor into
    bucket nb-1 (floor((v-min)/interval) and min+interval*nb round
    differently). The widened pushdown must keep such values and bucket
    them identically to the Spark path. Uses the advisory's exact
    instance."""
    import math

    import pandas as pd

    # parameters found by numeric search: an INTEGER doc_len v_edge that
    # is numerically >= min + interval*nb (so the old pushed pre-filter
    # dropped it) yet floors into bucket nb-1 (so the Spark path, which
    # filters on the computed bucket, counts it)
    mn, interval, nb = 1.8990086818143226, 2.9109271148761033, 55
    v_edge = 162
    assert v_edge >= mn + interval * nb
    assert math.floor((v_edge - mn) / interval) == nb - 1

    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["tok " * 5, "tok " * v_edge, "tok " * 40],  # doc_len
    })
    out = str(tmp_path / "fbidx")
    cat = build_index(spark, spark.createDataFrame(pdf), out,
                      num_segments=1, num_buckets=2, id_col="doc_id",
                      content_col="text", positions=False)
    s = Searcher(spark, cat)
    from diagon_spark.search.local_reader import LocalSearcher
    ls = LocalSearcher(cat)

    spark_h = [(int(r.bucket), int(r["count"]))
               for r in s.histogram("doc_len", mn, interval, nb).collect()]
    assert ls.histogram("doc_len", mn, interval, nb) == spark_h
    # and the edge value IS counted (bucket nb-1) on both paths
    assert (nb - 1, 1) in spark_h
