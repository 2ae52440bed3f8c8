"""Single-writer write.lock enforcement (index/lock.py) — the
IndexWriter lock analogue (index/IndexWriter.cpp open path): a second
live writer fails fast with LockObtainFailedError and never touches the
first writer's commit chain; a crashed writer's stale lock is broken
automatically; composed mutators re-enter their own lock."""

import json
import os
import subprocess
import time
from pathlib import Path

import pytest

from diagon_spark import build_index, IndexCatalog, Searcher
from diagon_spark.corpus import corpus_df
from diagon_spark.index.lock import (LOCK_NAME, LockObtainFailedError,
                                     write_lock)
from diagon_spark.search.query import Term


def _foreign_lock(root: str, pid: int) -> Path:
    p = Path(root, LOCK_NAME)
    p.write_text(json.dumps({"pid": pid, "host": __import__("socket")
                             .gethostname(), "ts": time.time()}))
    return p


@pytest.fixture()
def built(spark, tmp_path):
    df = corpus_df(spark, 120, partitions=2)
    root = str(tmp_path / "idx")
    cat = build_index(spark, df, root, num_segments=2, num_buckets=4,
                      positions=False)
    return cat, df, root


def test_second_writer_fails_fast_and_first_commit_survives(
        spark, built, tmp_path):
    cat, df, root = built
    gen_before = cat.generation
    # a LIVE foreign process holds the lock (subprocess sleeping)
    holder = subprocess.Popen(["sleep", "60"])
    try:
        _foreign_lock(root, holder.pid)
        with pytest.raises(LockObtainFailedError):
            build_index(spark, df, root, num_segments=1, num_buckets=4,
                        positions=False, append=True, segment_base=2)
        from diagon_spark.index.deletes import delete_documents
        with pytest.raises(LockObtainFailedError):
            delete_documents(spark, cat, df.limit(1)
                             .select("repo", "path", "commit"))
        from diagon_spark.index.merge import commit_merge
        with pytest.raises(LockObtainFailedError):
            commit_merge(spark, cat, num_segments=1)
    finally:
        holder.kill()
        holder.wait()
        Path(root, LOCK_NAME).unlink(missing_ok=True)
    # first writer's commit chain untouched; the index still serves
    reloaded = IndexCatalog.load(root)
    assert reloaded.generation == gen_before
    assert len(Searcher(spark, reloaded).search(Term("int"), k=5)
               .collect()) > 0


def test_stale_lock_broken_automatically(spark, built):
    cat, df, root = built
    # a DEAD pid's lock (process exited) must not block the next writer
    dead = subprocess.Popen(["true"])
    dead.wait()
    _foreign_lock(root, dead.pid)
    cat2 = build_index(spark, df.limit(10), root, num_segments=1,
                       num_buckets=4, positions=False, append=True,
                       segment_base=2)
    assert cat2.num_segments == 3
    assert not Path(root, LOCK_NAME).exists()  # released after the build


def test_reentrant_same_process(tmp_path):
    root = str(tmp_path / "idx2")
    with write_lock(root):
        with write_lock(root):  # update_documents-style nesting
            assert Path(root, LOCK_NAME).exists()
        assert Path(root, LOCK_NAME).exists()  # inner exit keeps the hold
    assert not Path(root, LOCK_NAME).exists()


def test_lock_released_on_writer_error(spark, tmp_path):
    root = str(tmp_path / "idx3")
    df = corpus_df(spark, 10, partitions=1)
    with pytest.raises(Exception):
        # nonexistent content column -> build fails inside the lock
        build_index(spark, df, root, num_segments=1, num_buckets=2,
                    content_col="no_such_col", positions=False)
    assert not Path(root, LOCK_NAME).exists()
    # and the root is writable again
    cat = build_index(spark, df, root, num_segments=1, num_buckets=2,
                      positions=False)
    assert cat.generation is not None


def test_own_pid_leftover_is_stale(tmp_path):
    # same-process leftover file with zero in-process holds (e.g. a
    # hard-killed previous context) counts as stale and is re-acquired
    root = str(tmp_path / "idx4")
    os.makedirs(root, exist_ok=True)
    _foreign_lock(root, os.getpid())
    with write_lock(root):
        assert Path(root, LOCK_NAME).exists()
    assert not Path(root, LOCK_NAME).exists()
