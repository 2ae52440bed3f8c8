"""spark-submit --py-files deployment e2e (north_rule contract).

The north rule requires the pipeline to "run via spark-submit --py-files
on multi-executor clusters". This test exercises that exact deployment
path in-container: package `diagon_spark` into a zip, launch a REAL
`spark-submit --py-files diagon_spark.zip build_index_submit.py`
subprocess whose working tree does NOT contain the package directory (so
both the driver import and every executor-side UDF import must resolve
from the shipped zip — the cluster code path, not a local-checkout
accident), then open the produced index from this process and verify
search results plus the per-row content-sha256 invariant.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import subprocess
import zipfile
from pathlib import Path

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = shutil.which("spark-submit")

N_DOCS = 400


def _package_zip(dest: Path) -> Path:
    """Zip the diagon_spark package exactly as the cluster usage in
    scripts/build_index_submit.py documents (`zip -r diagon_spark.zip
    diagon_spark`)."""
    zpath = dest / "diagon_spark.zip"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted((REPO / "diagon_spark").rglob("*.py")):
            z.write(p, p.relative_to(REPO))
    return zpath


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files_build_and_query(tmp_path):
    from diagon_spark.corpus import generate_pandas

    # -- corpus parquet written WITHOUT Spark (input_hint schema) --------
    corpus_dir = tmp_path / "corpus"
    corpus_dir.mkdir()
    pdf = generate_pandas(0, N_DOCS)
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   corpus_dir / "part-0.parquet")

    # -- stage the job OUTSIDE the repo checkout -------------------------
    # The submit script inserts its grandparent dir on sys.path; staged
    # under tmp_path that directory holds only the zip, so any successful
    # `import diagon_spark` proves --py-files shipping worked.
    stage = tmp_path / "stage" / "scripts"
    stage.mkdir(parents=True)
    shutil.copy(REPO / "scripts" / "build_index_submit.py",
                stage / "build_index_submit.py")
    zpath = _package_zip(tmp_path / "stage")

    idx_dir = tmp_path / "idx"
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [SPARK_SUBMIT,
         "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", str(zpath),
         str(stage / "build_index_submit.py"),
         "--input", str(corpus_dir), "--output", str(idx_dir),
         "--segments", "4", "--buckets", "4"],
        cwd=tmp_path / "stage", env=env,
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-4000:]
    report = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1])
    assert report["indexed_docs"] == N_DOCS

    # -- verify the artifact from THIS process (serving path, no Spark) --
    from diagon_spark.index.builder import IndexCatalog
    from diagon_spark.search.local_reader import LocalSearcher
    from diagon_spark.search.query import Boolean, Term

    ls = LocalSearcher(IndexCatalog.load(str(idx_dir)))
    hits = ls.search(Term("int"), k=10)
    assert len(hits) == 10 and all(s > 0 for _d, s in hits)
    assert len(ls.search(Boolean(must=(Term("int"), Term("return"))),
                         k=5)) > 0

    # per-row invariant (north_rule): content_sha256 == sha256(content)
    docs_tbl = pq.read_table(
        Path(idx_dir) / "docs",
        columns=["path", "content_sha256"]).to_pandas()
    assert len(docs_tbl) == N_DOCS
    src = dict(zip(pdf["path"], pdf["content"]))
    sample = docs_tbl.sample(n=25, random_state=7)
    for _i, row in sample.iterrows():
        assert (hashlib.sha256(src[row["path"]].encode()).hexdigest()
                == row["content_sha256"])
