"""Regression tests for round-2 advisor findings (ADVICE.md r02, items
3-5): codec/format-version rejection of pre-change commits, rollback over
legacy (doc_id-only) tombstone tables. Items 1-2 (rewrite flattening /
filter-MatchAll) are covered by tests/test_rewrite_semantics.py and the
un-rewritten-oracle fuzz suite; item 5 (MAXSCORE upward rounding) by
tests/test_wand_pruning.py exactness assertions."""

import json
from pathlib import Path

import pytest

from diagon_spark import Searcher, build_index
from diagon_spark.corpus import generate_pandas
from diagon_spark.index.builder import IndexCatalog, rollback
from diagon_spark.search.query import MatchAll, Term


def _write_commit(root: str, gen: int, meta: dict) -> None:
    cdir = Path(root, "_commits")
    cdir.mkdir(parents=True, exist_ok=True)
    (cdir / f"commit_{gen}.json").write_text(json.dumps(meta))


_BASE_META = {"num_buckets": 4, "num_segments": 1, "has_positions": False,
              "key_cols": [], "fields": ["content"]}


def test_load_rejects_pre_spi_commit_without_codec_key(tmp_path):
    root = str(tmp_path / "idx")
    _write_commit(root, 0, dict(_BASE_META))  # no "codec" key: round-1 era
    with pytest.raises(ValueError, match="legacy codec.*Rebuild"):
        IndexCatalog.load(root)


def test_load_rejects_legacy_format_name(tmp_path):
    root = str(tmp_path / "idx")
    _write_commit(root, 0, {**_BASE_META, "codec": "bitpack128-varint-1"})
    with pytest.raises(ValueError, match="legacy codec.*Rebuild"):
        IndexCatalog.load(root)


def test_load_rejects_unknown_codec(tmp_path):
    root = str(tmp_path / "idx")
    _write_commit(root, 0, {**_BASE_META, "codec": "zstd-fancy-9"})
    with pytest.raises(ValueError, match="unknown postings codec"):
        IndexCatalog.load(root)


def test_current_commit_loads(spark, tmp_path):
    out = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(generate_pandas(0, 30)), out,
                num_segments=1, num_buckets=4, positions=False)
    cat = IndexCatalog.load(out)
    assert cat.num_segments == 1


def test_rollback_with_legacy_tombstone_table(spark, tmp_path):
    """Pre-r2 tombstone tables carry only doc_id; rollback must upgrade
    them via the docs table instead of raising on the missing
    segment_id column (ADVICE r02 item 4)."""
    out = str(tmp_path / "idx")
    df0 = spark.createDataFrame(generate_pandas(0, 40))
    cat = build_index(spark, df0, out, num_segments=2, num_buckets=4,
                      positions=False)  # commit gen 0
    df1 = spark.createDataFrame(generate_pandas(40, 70))
    build_index(spark, df1, out, num_segments=1, num_buckets=4,
                positions=False, append=True, segment_base=2)  # gen 1

    # legacy-style tombstones: one surviving doc + one appended doc
    docs = spark.read.parquet(f"{out}/docs")
    keep_victim = int(docs.filter("segment_id < 2")
                      .select("doc_id").first().doc_id)
    drop_victim = int(docs.filter("segment_id >= 2")
                      .select("doc_id").first().doc_id)
    spark.createDataFrame([(keep_victim,), (drop_victim,)], "doc_id long") \
        .write.mode("overwrite").parquet(f"{out}/deleted")

    rolled = rollback(spark, out, generation=0)
    assert rolled.num_segments == 2
    # tombstone of the dropped epoch's doc is pruned; the survivor keeps
    # its (upgraded, segment_id-carrying) tombstone row
    del_rows = spark.read.parquet(f"{out}/deleted").collect()
    assert {int(r.doc_id) for r in del_rows} == {keep_victim}
    assert all(hasattr(r, "segment_id") for r in del_rows)
    s = Searcher(spark, rolled)
    assert s.count(MatchAll()) == 39  # 40 docs - 1 live tombstone
    hit_ids = {int(r.doc_id) for r in s.search(MatchAll(), k=100).collect()}
    assert keep_victim not in hit_ids and drop_victim not in hit_ids
