"""Codec SPI registry (Codec::forName analogue) + query-side profiler
(SearchProfiler analogue) — the two §2.7 extension-point rows that were
partial in round 1."""

import json
from pathlib import Path

import pytest

from diagon_spark import Searcher, build_index
from diagon_spark.corpus import generate_pandas
from diagon_spark.index.builder import IndexCatalog
from diagon_spark.index.codec import CODEC_NAME, codec_for_name
from diagon_spark.search.query import Boolean, Term


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("codecidx"))
    cat = build_index(spark, spark.createDataFrame(generate_pandas(0, 80)),
                      out, num_segments=2, num_buckets=4, positions=False)
    return out, cat


def test_commit_records_codec(idx):
    out, _ = idx
    commits = IndexCatalog.list_commits(out)
    meta = json.loads(commits[-1].read_text())
    assert meta["codec"] == CODEC_NAME


def test_unknown_codec_rejected(idx):
    out, _ = idx
    commits = IndexCatalog.list_commits(out)
    meta = json.loads(commits[-1].read_text())
    meta["codec"] = "futuristic-v9"
    bad = Path(out, "_commits", "commit_99.json")
    bad.write_text(json.dumps(meta))
    try:
        with pytest.raises(ValueError, match="unknown postings codec"):
            IndexCatalog.load(out)
    finally:
        bad.unlink()
    with pytest.raises(ValueError):
        codec_for_name("nope")


def test_profile_search(spark, idx):
    _, cat = idx
    s = Searcher(spark, cat)
    q = Boolean(must=[Term("int")], should=[Term("return")])
    p = s.profile(q, k=10)
    assert p["kind"] == "bool"
    assert sorted(t for _, t in
                  [tuple(x) for x in p["leaves"]]) == ["int", "return"]
    assert p["positions_read"] is False
    assert 1 <= len(p["buckets_scanned"]) <= 2 <= p["num_buckets"]
    assert p["total_relation"] == "eq"
    assert p["total_hits"] == s.count(q)
    assert p["hits_returned"] == 10
    assert p["exec_ms"] > 0 and p["plan_ms"] >= 0
    assert sum(p["per_segment_matches"].values()) == p["total_hits"]
    # block-skip counters ride through the profiler (bench observability)
    assert p["blocks_total"] >= p["blocks_decoded"] >= 0
    assert p["blocks_skipped"] == p["blocks_total"] - p["blocks_decoded"]
    assert p["blocks_decoded"] > 0  # a scoring query decodes something


def test_profile_counts_blocks_of_zero_hit_segments(spark, idx):
    """A segment whose candidates are all eliminated (must_not wipes
    them) must STILL report its block counters and a seg_total of 0 —
    previously the counters rode only on hit rows, so fully-pruned
    segments vanished from blocks_total and skip_pct overstated work."""
    _, cat = idx
    s = Searcher(spark, cat)
    # every doc matching 'int' also tokenizes 'int' — must_not on the
    # same term eliminates every candidate in every segment
    q = Boolean(must=[Term("int")], must_not=[Term("int")])
    p = s.profile(q, k=10)
    assert p["total_hits"] == 0
    assert p["hits_returned"] == 0
    assert p["segments_matched"] == 0
    assert p["blocks_total"] > 0  # the term's blocks were still visited
    # search_with_total agrees: zero hits, exact zero total
    hits, total, rel = s.search_with_total(q, k=10)
    assert hits == [] and total == 0 and rel == "eq"


def test_block_counters_dedupe_repeated_terms(spark, idx):
    """A term repeated across occur lists has ONE postings list — its
    blocks must be counted once, not once per occurrence."""
    _, cat = idx
    s = Searcher(spark, cat)
    base = s.profile(Boolean(must=[Term("int")], should=[Term("never_x")]),
                     k=10)["blocks_total"]
    dup = s.profile(Boolean(must=[Term("int")], must_not=[Term("int")]),
                    k=10)["blocks_total"]
    assert dup == base  # same single postings list either way
