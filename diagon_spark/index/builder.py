"""Index builder — Spark-first restatement of the reference write path.

Reference lifecycle (SURVEY.md §3.2, index/DocumentsWriterPerThread.cpp:522-701):
tokenize → in-memory FreqProx postings → flush a segment (sorted terms,
block-encoded postings + norms + stored) → atomic commit. Here:

* one **segment = one shuffle partition group**; DWPT assignment =
  `pmod(hash(key), num_segments)`;
* FreqProx accumulation = `posexplode` + one shuffle into
  `(segment_id, field)` groups; term sort deferred to the encode UDF
  (numpy lexsort) exactly like the reference defers sorting to flush
  (index/FreqProxTermsWriter.h:32);
* posting-block encode (delta+bitpack+varint) in an Arrow-batched
  applyInPandas — see index/codec.py;
* **multi-field documents** (document/Field.h:24, index/FieldInfo.h:127-230):
  every postings/term_dict row carries a `field` column; norms, doc
  lengths and collection stats are per-field; one (segment, field) pair =
  one encode task, so fields add parallelism, not serialization;
* heavy-hitter terms are **chunked/salted**: a term's postings within a
  segment split into rows of <= CHUNK_DOCS docs, so no single parquet row
  or query-side group explodes on terms like "int"/"return" that occur in
  >50% of docs;
* atomic publish = staged write + manifest commit file (the parquet/
  Iceberg-snapshot analogue of segments_N, index/IndexWriter.cpp:208-247);
* recommended session config for builds: spark.python.worker.reuse=false —
  the encode tasks run seconds each and long-lived python workers degrade
  ~60% over sequential heavy tasks (allocator growth); worker spawn cost
  is noise at this task granularity;
* **segment-granular resume**: a `lineage` table records per segment-batch
  (fingerprint, status, n_docs, n_postings, wall_ms); on resume, completed
  segments are skipped (north_rule checkpoint requirement);
* **incremental stats maintenance**: `append=True` aggregates term_dict /
  stats over the NEW segments only and merge-adds into the existing
  tables (both are additive sums) — a streaming micro-batch never rescans
  old postings (the reference's per-segment FieldStats that are summed at
  read time, index/SegmentInfos analogue).

Index tables written under `out_dir`:
  docs/       per-doc: segment_id, doc_id, key cols…, content_sha256,
              per-field doc_len__f / norm__f (+ doc_len/norm aliases of
              the default field)  (stored-fields/.nvd analogue)
  postings/   partitioned by bucket: (field, term) chunks w/ binary blocks
  term_dict/  (field, term) → global df, cttf (the .tim/.tip analogue)
  stats/      per-field collection stats (maxDoc, sumTotalTermFreq, …)
  lineage/    per-segment build lineage + metrics
  _commits/   manifest JSONs; highest N = current commit point

Parquet bloom filters are enabled on the `term` column of postings/
term_dict (writer option) so term point-lookups skip row groups that
dictionary/min-max stats can't exclude — the granule-skip analogue of the
reference's bloom index (SURVEY §2.3).
"""

from __future__ import annotations

import json
import time
import zlib
from dataclasses import dataclass, field as dc_field
from pathlib import Path

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window
from pyspark.sql.types import (ArrayType, BinaryType, IntegerType, LongType,
                               StringType, StructField, StructType)

from diagon_spark.analysis.tokenizer import tokenize_series
from diagon_spark.index.norms import encode_norm

CHUNK_DOCS = 16384  # max docs per postings row (salting of heavy hitters)
# encode-group routing: above this many groups the literal salt map would
# bloat the plan — fall back to repartitionByRange (see _partition_salts)
_SALT_ROUTE_MAX_GROUPS = 4096
DOC_ID_SEGMENT_SHIFT = 40  # doc_id = segment_id << 40 | local_id


def _lineage_arrow_schema(n_fields: int):
    import pyarrow as pa
    return pa.schema(
        [pa.field("segment_id", pa.int32()),
         pa.field("n_docs", pa.int64()),
         pa.field("input_fingerprint", pa.int64()),
         pa.field("n_postings", pa.int64())]
        + [pa.field(f"sum_len__{i}", pa.int64()) for i in range(n_fields)]
        + [pa.field("status", pa.string()),
           pa.field("wall_ms", pa.int32()),
           pa.field("batch", pa.int32()),
           pa.field("ts", pa.timestamp("us", tz="UTC"))])


def _append_tiny_parquet(spark, path: str, rows: list[dict],
                         schema) -> None:
    """Append a driver-known handful of metadata rows to a parquet dir
    WITHOUT a Spark job: one pyarrow part file, written to a tmp name
    and atomically renamed in (the same publish discipline as
    _swap_write). Types are pinned by `schema` so files from different
    waves/rounds always merge. A `ts` column, when present in the
    schema but absent from the rows, is stamped with the current time."""
    import uuid
    from datetime import datetime, timezone

    import pyarrow as pa
    import pyarrow.parquet as pq

    if not rows:
        return
    if "ts" in schema.names and "ts" not in rows[0]:
        now = datetime.now(timezone.utc)
        rows = [{**r, "ts": now} for r in rows]
    table = pa.Table.from_pylist(rows, schema=schema)
    d = Path(path)
    d.mkdir(parents=True, exist_ok=True)
    name = f"part-driver-{uuid.uuid4().hex}.parquet"
    tmp = d / f".{name}.tmp"
    pq.write_table(table, tmp)
    tmp.rename(d / name)
    spark.catalog.refreshByPath(path)


def _swap_tiny_parquet(spark, path: str, rows: list[dict], schema) -> None:
    """Overwrite-swap a driver-known tiny metadata table (the pyarrow
    analogue of _swap_write): stage one part file under `<path>.swap`,
    atomically swap directories, refresh the session's file listing."""
    import shutil
    import uuid
    from datetime import datetime, timezone

    import pyarrow as pa
    import pyarrow.parquet as pq

    if "ts" in schema.names and rows and "ts" not in rows[0]:
        now = datetime.now(timezone.utc)
        rows = [{**r, "ts": now} for r in rows]
    table = pa.Table.from_pylist(rows, schema=schema)
    tmp = Path(path + ".swap")
    if tmp.exists():
        shutil.rmtree(tmp)
    tmp.mkdir(parents=True)
    pq.write_table(table, tmp / f"part-driver-{uuid.uuid4().hex}.parquet")
    if Path(path).exists():
        shutil.rmtree(path)
    tmp.rename(path)
    spark.catalog.refreshByPath(path)


def _murmur3_hash_int(x: int, seed: int = 42) -> int:
    """Spark's Murmur3_x86_32.hashInt — what `F.hash(int_col)` computes
    (seed 42). Driver-side copy used to pre-solve hash-routing salts
    (see _partition_salts); equality with the JVM implementation is
    asserted in tests/test_salt_routing.py."""
    m = 0xFFFFFFFF
    k1 = (x * 0xCC9E2D51) & m
    k1 = ((k1 << 15) | (k1 >> 17)) & m
    k1 = (k1 * 0x1B873593) & m
    h1 = (seed ^ k1) & m
    h1 = ((h1 << 13) | (h1 >> 19)) & m
    h1 = (h1 * 5 + 0xE6546B64) & m
    h1 ^= 4  # fmix, len = 4 bytes
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & m
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & m
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def _partition_salts(n: int) -> list[int]:
    """salts[p] = smallest non-negative int whose Spark hash lands in
    partition p of n — pmod(hash(salts[p]), n) == p. Routing rows by a
    per-group salt through an ordinary hash repartition then places each
    group ALONE in its own partition: the balance guarantee of
    repartitionByRange without its sampling pass (which re-executes the
    whole child plan once per build wave). Expected cost n·ln(n) hash
    probes, driver-side."""
    salts: list[int | None] = [None] * n
    found = 0
    x = 0
    while found < n:
        p = _murmur3_hash_int(x) % n  # python % is already non-negative
        if salts[p] is None:
            salts[p] = x
            found += 1
        x += 1
    return salts  # type: ignore[return-value]


def term_bucket(term: str, num_buckets: int, field: str) -> int:
    """Python-side bucket — postings/term_dict partition key. Hashes
    (field, term) so one term indexed under many fields spreads across
    buckets."""
    key = field.encode("utf-8") + b"\x00" + term.encode("utf-8")
    return zlib.crc32(key) % num_buckets


def _bq(name: str) -> str:
    """Backtick-quote a column name (dotted flattened-JSON names)."""
    return "`" + name.strip("`") + "`"


def _field_name(col: str) -> str:
    return col.strip("`")


def doc_len_col(field: str) -> str:
    return f"doc_len__{field}"


def norm_col(field: str) -> str:
    return f"norm__{field}"


POSTINGS_SCHEMA = StructType([
    StructField("field", StringType()),
    StructField("term", StringType()),
    StructField("bucket", IntegerType()),
    StructField("segment_id", IntegerType()),
    StructField("chunk", IntegerType()),
    StructField("df", IntegerType()),
    StructField("ttf", LongType()),
    StructField("doc_blocks", BinaryType()),
    StructField("tf_blocks", BinaryType()),
    StructField("norm_bytes", BinaryType()),
    StructField("block_first", ArrayType(LongType())),
    StructField("block_last", ArrayType(LongType())),
    StructField("block_max_tf", ArrayType(IntegerType())),
    StructField("block_max_norm", ArrayType(IntegerType())),
    StructField("block_doc_off", ArrayType(IntegerType())),
    StructField("block_tf_off", ArrayType(IntegerType())),
    StructField("pos_blocks", BinaryType()),
    StructField("block_pos_off", ArrayType(IntegerType())),
])

# parquet bloom filters on the term point-lookup column (granule skip
# beyond min-max/dictionary stats — SURVEY §2.3 bloom row). Bloom size is
# ~1.3 B per expected distinct value per row group; 4096 keeps the
# fixed overhead ~5 KB/row-group (noise at scale, honest at sandbox
# scale). On a 100 TB corpus set expected.ndv to the per-bucket
# vocabulary estimate (e.g. 10^5-10^6) via the bloom_ndv build knob.
DEFAULT_BLOOM_NDV = 4096
_BLOOM_OPTS = {"parquet.bloom.filter.enabled#term": "true",
               "parquet.bloom.filter.expected.ndv#term":
                   str(DEFAULT_BLOOM_NDV)}


def bloom_opts(ndv: int = DEFAULT_BLOOM_NDV) -> dict:
    return {"parquet.bloom.filter.enabled#term": "true",
            "parquet.bloom.filter.expected.ndv#term": str(int(ndv))}


@dataclass
class IndexCatalog:
    """Handle to a committed index (the DirectoryReader analogue)."""

    root: str
    num_buckets: int
    num_segments: int
    has_positions: bool
    key_cols: list[str]
    fields: list[str] = dc_field(default_factory=lambda: ["content"])
    # commit generation this handle was opened at (IndexCommit analogue);
    # None for a not-yet-committed builder handle. commit() advances it.
    generation: int | None = None
    # parsed metadata of the commit this handle was opened at (load) or
    # last published (commit) — one source of truth for readers
    commit_meta: dict | None = None

    @property
    def default_field(self) -> str:
        return self.fields[0]

    @property
    def docs_path(self) -> str:
        return f"{self.root}/docs"

    @property
    def postings_path(self) -> str:
        return f"{self.root}/postings"

    @property
    def term_dict_path(self) -> str:
        return f"{self.root}/term_dict"

    @property
    def stats_path(self) -> str:
        return f"{self.root}/stats"

    @property
    def lineage_path(self) -> str:
        return f"{self.root}/lineage"

    @staticmethod
    def _gen_of(p: Path) -> int:
        return int(p.stem.split("_")[-1])

    @staticmethod
    def list_commits(root: str) -> list:
        """Commit files sorted by generation (numeric — commit_10 follows
        commit_9, not commit_1)."""
        return sorted(Path(root, "_commits").glob("commit_*.json"),
                      key=IndexCatalog._gen_of)

    @staticmethod
    def load(root: str, generation: int | None = None) -> "IndexCatalog":
        """Open the index at its latest commit point, or at an older
        `generation` — the IndexCommit/open-at-commit-point analogue
        (index/IndexWriter.h:251 rollback, DirectoryReader open-at-commit)."""
        commits = IndexCatalog.list_commits(root)
        if not commits:
            raise FileNotFoundError(f"no commit point under {root}/_commits")
        if generation is not None:
            by_gen = {IndexCatalog._gen_of(p): p for p in commits}
            if generation not in by_gen:
                raise FileNotFoundError(
                    f"no commit generation {generation} under {root}")
            meta = json.loads(by_gen[generation].read_text())
            opened_gen = generation
        else:
            meta = json.loads(commits[-1].read_text())
            opened_gen = IndexCatalog._gen_of(commits[-1])
        from diagon_spark.index.codec import codec_for_name
        # commits without a codec key predate the SPI (round-1 format) —
        # they must be REJECTED with a migration message, not defaulted to
        # the current name and mis-read
        codec_for_name(meta.get("codec", "<pre-SPI commit, no codec key>"))
        return IndexCatalog(
            root=root,
            fields=list(meta.get("fields") or ["content"]),
            generation=opened_gen,
            commit_meta=meta,
            **{k: meta[k] for k in ("num_buckets", "num_segments",
                                    "has_positions", "key_cols")})

    def commit(self, extra: dict | None = None) -> None:
        cdir = Path(self.root, "_commits")
        cdir.mkdir(parents=True, exist_ok=True)
        existing = IndexCatalog.list_commits(self.root)
        gen = (IndexCatalog._gen_of(existing[-1]) + 1) if existing else 0
        from diagon_spark.analysis.tokenizer import HAVE_ICU
        from diagon_spark.index.codec import CODEC_NAME
        # which non-ASCII tokenizer BUILT this index (the ASCII fast path
        # is identical either way, but non-ASCII rows under ICU UAX#29
        # differ from the regex fallback, so serving should match this
        # flag — check_index compares). Maintenance commits (deletes,
        # merge, rollback) never re-tokenize, so they INHERIT the flag of
        # the commit they extend rather than re-stamping the current
        # environment; only a first build (or an explicit extra override,
        # e.g. a custom analyzer) sets it.
        prev_tok = None
        if existing:
            prev_tok = json.loads(existing[-1].read_text()).get("tokenizer")
        meta = {
            "num_buckets": self.num_buckets,
            "num_segments": self.num_segments,
            "has_positions": self.has_positions,
            "key_cols": self.key_cols,
            "fields": self.fields,
            "codec": CODEC_NAME,  # Codec SPI: readers validate via registry
            "tokenizer": prev_tok or ("icu" if HAVE_ICU
                                      else "ascii+regex"),
            "ts": time.time(),
            **(extra or {}),
        }
        tmp = cdir / f".commit_{gen}.json.tmp"
        tmp.write_text(json.dumps(meta))
        tmp.rename(cdir / f"commit_{gen}.json")  # atomic publish (segments_N)
        self.generation = gen


def _swap_write(df: DataFrame, path: str, partition_by: str | None = None,
                options: dict | None = None) -> None:
    """Overwrite a table that the plan may be reading from: stage to
    `<path>.swap`, then atomically swap directories. (On object stores /
    Iceberg this is a snapshot commit instead of a rename.)"""
    import shutil
    tmp = path + ".swap"
    if Path(tmp).exists():
        shutil.rmtree(tmp)
    w = df.write.mode("overwrite")
    for k, v in (options or {}).items():
        w = w.option(k, v)
    if partition_by:
        w = w.partitionBy(partition_by)
    w.parquet(tmp)
    if Path(path).exists():
        shutil.rmtree(path)
    Path(tmp).rename(path)
    # drop any session-cached file listing for the swapped path — a later
    # spark.read of the same path must re-list, not chase deleted parts
    df.sparkSession.catalog.refreshByPath(path)


def _encode_segment_fn(num_buckets: int, has_positions: bool, analyzer=None):
    """applyInPandas over ONE (segment, field) group of compact
    (doc_id, __content) rows — the DWPT flush analogue. Tokenization,
    norms, the token-level explode, (term, doc) aggregation, term sort,
    and block encode ALL happen in numpy inside the UDF. The only shuffle
    in the postings build carries ONE string per (doc, field) and NOTHING
    computed runs on its map side: fusing even the tokenizer UDF into the
    shuffle-write stage measured negatively-scaling (python-worker +
    shuffle-writer contention), and shuffling token arrays moved tens of
    millions of small objects through UnsafeRow/Arrow/pandas boundaries."""

    # default path tokenizes to BYTES (no python str churn; only the
    # per-segment vocabulary is decoded); custom analyzers use str lists.
    # Analyzers marked emits_positions return (token, position) pairs
    # (same-position synonym semantics, SynonymFilter.cpp) — positions
    # come from the analyzer instead of enumeration.
    from diagon_spark.analysis.tokenizer import tokenize_series_bytes
    tok_fn = analyzer or tokenize_series_bytes
    bytes_tokens = analyzer is None
    positioned = bool(getattr(analyzer, "emits_positions", False))

    def encode(key, pdf: pd.DataFrame) -> pd.DataFrame:
        import os as _os
        import time as _time

        from diagon_spark._runtime import thp_disabled, worker_init
        worker_init()
        _prof_path = _os.environ.get("DIAGON_ENCODE_PROF")
        _ph: dict = {"enter": _time.time(), "n_docs": len(pdf),
                     "thp_off": thp_disabled()}
        segment_id = int(key[0])
        fld = str(key[1])
        # sub-batch chunk namespace: sub order == doc-range order, so
        # chunk values stay docID-ordered across sub-batches
        chunk_base = (int(key[2]) << 20) if len(key) > 2 else 0
        if len(pdf) == 0:
            return pd.DataFrame(columns=[f.name for f in POSTINGS_SCHEMA.fields])
        if bytes_tokens:
            # default fast path: the WHOLE group tokenizes into flat numpy
            # arrays — zero per-token Python objects. Large groups were
            # superlinear purely from allocator/GC pressure over tens of
            # millions of bytes objects (measured 3-4x s/doc at 150k-doc
            # groups under 8-way concurrency, scripts/encode_profile.py);
            # this path holds s/doc flat across group sizes.
            from diagon_spark.analysis.tokenizer import \
                tokenize_factorize_sliced
            row_doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            row_order = np.argsort(row_doc_ids, kind="stable")
            doc_idx, poss, term_ids, sorted_vocab, all_ascii = \
                tokenize_factorize_sliced(pdf["__content"].iloc[row_order])
            _ph["tokfact"] = _time.time()
            total = len(term_ids)
            if total == 0:
                return pd.DataFrame(
                    columns=[f.name for f in POSTINGS_SCHEMA.fields])
            docs_per_row = row_doc_ids[row_order]
            lens = np.bincount(doc_idx, minlength=len(pdf))
            norms_per_row = encode_norm(lens).astype(np.int64)
            if (len(pdf) < (1 << 20) and int(poss.max()) < (1 << 16)
                    and len(sorted_vocab) < (1 << 28)):
                # the (term, doc, pos) sort as ONE in-place u64 sort of
                # packed keys — term(28b) | row(20b) | pos(16b), keys
                # unique since a doc has one token per position. Replaces
                # the 3-key lexsort + FOUR 250MB random-read permute
                # gathers (the two phases left DRAM-latency-bound after
                # slicing — phase probe in scripts/encode_profile.py)
                # with sequential shift/mask passes and two gathers into
                # the per-ROW tables (cache-resident). Row order is doc_id
                # order (rows pre-sorted), so row-ascending == doc-
                # ascending and the packed order IS (term, doc, pos).
                packed = ((term_ids.astype(np.uint64) << np.uint64(36))
                          | (doc_idx.astype(np.uint64) << np.uint64(16))
                          | poss.astype(np.uint64))
                del term_ids, doc_idx, poss
                packed.sort()
                term_ids = (packed >> np.uint64(36)).astype(np.int32)
                doc_local = ((packed >> np.uint64(16))
                             & np.uint64(0xFFFFF)).astype(np.int64)
                poss = (packed & np.uint64(0xFFFF)).astype(np.int64)
                del packed
                docs = docs_per_row[doc_local]
                norms = norms_per_row[doc_local]
                del doc_local
            else:
                # guard fallback (≥1M-row group, ≥64k-token doc, or ≥256M
                # vocab): classic lexsort + permute
                docs = docs_per_row[doc_idx]
                norms = norms_per_row[doc_idx]
                order = np.lexsort((poss, docs, term_ids))
                term_ids, docs, norms, poss = (
                    term_ids[order], docs[order], norms[order],
                    poss[order])
        else:
            tok_lists = tok_fn(pdf["__content"]).tolist()
            lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64,
                               count=len(tok_lists))
            total = int(lens.sum())
            if total == 0:
                return pd.DataFrame(
                    columns=[f.name for f in POSTINGS_SCHEMA.fields])
            from itertools import chain
            if positioned:
                flat_tokens = np.fromiter(
                    (tp[0] for tp in chain.from_iterable(tok_lists)),
                    dtype=object, count=total)
            else:
                flat_tokens = np.fromiter(chain.from_iterable(tok_lists),
                                          dtype=object, count=total)
            # hash-factorize token strings once (O(n)); all heavy sorting
            # and grouping then runs on int ids — string comparisons only
            # over the (small) per-segment vocabulary
            codes, uniques = pd.factorize(flat_tokens, sort=False)
            vocab_order = np.argsort(uniques)
            rank = np.empty(len(vocab_order), dtype=np.int64)
            rank[vocab_order] = np.arange(len(vocab_order))
            term_ids = rank[codes]
            sorted_vocab = uniques[vocab_order]

            docs = np.repeat(pdf["doc_id"].to_numpy(dtype=np.int64), lens)
            norms = np.repeat(encode_norm(lens).astype(np.int64), lens)
            if positioned:
                # analyzer-supplied positions (same-position synonyms
                # share one)
                poss = np.fromiter(
                    (tp[1] for tp in chain.from_iterable(tok_lists)),
                    dtype=np.int64, count=total)
            else:
                # position of each token within its doc: arange minus the
                # doc's start offset
                starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
                poss = (np.arange(total, dtype=np.int64)
                        - np.repeat(starts, lens))

            # sort by (term, doc, pos) — the deferred term sort of
            # FreqProx flush
            order = np.lexsort((poss, docs, term_ids))
            term_ids, docs, norms, poss = (term_ids[order], docs[order],
                                           norms[order], poss[order])

        _ph["sort"] = _time.time()
        # group boundaries at (term, doc) change → tf per (term, doc)
        new_td = np.empty(len(term_ids), dtype=bool)
        new_td[0] = True
        new_td[1:] = (term_ids[1:] != term_ids[:-1]) | (docs[1:] != docs[:-1])
        td_starts = np.flatnonzero(new_td)
        td_ends = np.append(td_starts[1:], len(term_ids))
        tfs = (td_ends - td_starts).astype(np.int64)
        g_term_ids = term_ids[td_starts]
        g_docs = docs[td_starts]
        g_norms = norms[td_starts]

        # term boundaries over the (term, doc) groups
        new_t = np.empty(len(g_term_ids), dtype=bool)
        new_t[0] = True
        new_t[1:] = g_term_ids[1:] != g_term_ids[:-1]
        t_starts = np.flatnonzero(new_t)
        t_ends = np.append(t_starts[1:], len(g_term_ids))

        if has_positions:
            # flat delta stream over the WHOLE group in one vectorized
            # pass: first position of each (term, doc) absolute, the rest
            # gaps — sliced per term chunk below, varint-encoded in one
            # call per chunk (the per-doc python loop was 77% of encode CPU)
            pos_deltas_all = np.empty_like(poss)
            pos_deltas_all[0] = poss[0]
            pos_deltas_all[1:] = poss[1:] - poss[:-1]
            pos_deltas_all[td_starts] = poss[td_starts]

        _ph["bounds"] = _time.time()
        # batched encode: every term's blocks/tails/positions in ~3
        # vectorized codec passes total (see codec.encode_segment_batch)
        from diagon_spark.index.codec import encode_segment_batch
        recs = encode_segment_batch(
            g_docs, tfs, g_norms, t_starts, t_ends, CHUNK_DOCS,
            pos_deltas_all if has_positions else None,
            td_starts if has_positions else None)
        _ph["codec"] = _time.time()
        term_strs = [v.decode("utf-8") if bytes_tokens else str(v)
                     for v in sorted_vocab]
        term_buckets = [term_bucket(t, num_buckets, fld) for t in term_strs]
        # term index of each group start -> per-chunk term string
        g_tid_at_start = g_term_ids[t_starts]
        out_rows = []
        for rec in recs:
            tid = int(g_tid_at_start[rec["term_i"]])
            out_rows.append({
                "field": fld,
                "term": term_strs[tid],
                "bucket": term_buckets[tid],
                "segment_id": segment_id,
                "chunk": chunk_base + int(rec["chunk"]),
                "df": int(rec["df"]),
                "ttf": int(rec["ttf"]),
                "doc_blocks": rec["doc_blocks"],
                "tf_blocks": rec["tf_blocks"],
                "norm_bytes": rec["norm_bytes"],
                "block_first": rec["block_first"].tolist(),
                "block_last": rec["block_last"].tolist(),
                "block_max_tf": rec["block_max_tf"].tolist(),
                "block_max_norm": rec["block_max_norm"].tolist(),
                "block_doc_off": rec["block_doc_off"].tolist(),
                "block_tf_off": rec["block_tf_off"].tolist(),
                "pos_blocks": rec["pos_blocks"],
                "block_pos_off": (rec["block_pos_off"].tolist()
                                  if has_positions else None),
            })
        out_df = pd.DataFrame(out_rows,
                              columns=[f.name for f in POSTINGS_SCHEMA.fields])
        if _prof_path:
            # build-path observability (env-gated, off by default): per-
            # group wall timestamps of each encode phase, appended from
            # the worker — lets scripts/encode_profile.py attribute
            # in-Spark time to tokfact/sort/bounds/codec/rows vs the
            # Spark machinery between group calls
            import json as _json
            _ph["exit"] = _time.time()
            try:
                with open(_prof_path, "a") as f:
                    f.write(_json.dumps({
                        "pid": _os.getpid(), "segment": segment_id,
                        "field": fld, **{k: round(v, 3) if k != "n_docs"
                                         else v for k, v in _ph.items()},
                    }) + "\n")
            except OSError:
                pass
        return out_df

    return encode


def _tokenize_udf(analyzer=None):
    from pyspark.sql.functions import pandas_udf

    fn = analyzer or tokenize_series

    @pandas_udf(ArrayType(StringType()))
    def tok(texts: pd.Series) -> pd.Series:
        return fn(texts)

    return tok


def prepare_docs(df: DataFrame, key_cols: list[str] | None, id_col: str | None,
                 field_cols: list[str], num_segments: int, analyzer=None,
                 segment_base: int = 0) -> DataFrame:
    """Assign deterministic doc ids + segments, per-field doc_len/norm,
    content sha256.

    Deterministic doc_id (north_rule): with key_cols, docs are ordered by
    sha256(key) inside their hash-assigned segment and numbered — identical
    regardless of input partitioning (SegmentMerger docBase remap analogue,
    index/SegmentMerger.cpp:45-63). With id_col, the given unique id is
    used as-is and the segment derives from it.
    """
    default_col = field_cols[0]
    if id_col is not None:
        base = df.withColumn("doc_id", F.col(id_col).cast("long"))
        base = base.withColumn(
            "segment_id",
            (F.pmod(F.col("doc_id"), F.lit(num_segments))
             + F.lit(segment_base)).cast("int"))
    else:
        key = F.concat_ws("\x00", *[F.col(c) for c in key_cols])
        base = df.withColumn("_key_sha", F.sha2(key, 256))
        base = base.withColumn(
            "segment_id",
            (F.pmod(F.xxhash64(F.col("_key_sha")), F.lit(num_segments))
             + F.lit(segment_base)).cast("int"))
        w = Window.partitionBy("segment_id").orderBy("_key_sha")
        base = base.withColumn(
            "doc_id",
            (F.col("segment_id").cast("long") * F.lit(1 << DOC_ID_SEGMENT_SHIFT)
             + F.row_number().over(w) - 1))
        base = base.drop("_key_sha")

    if analyzer is None:
        # fast path: count tokens without materializing token lists
        from diagon_spark.analysis.tokenizer import count_tokens_series

        @F.pandas_udf(IntegerType())
        def doc_len_udf(texts: pd.Series) -> pd.Series:
            return pd.Series(count_tokens_series(texts).astype(np.int32))
    else:
        @F.pandas_udf(IntegerType())
        def doc_len_udf(texts: pd.Series) -> pd.Series:  # noqa: F811
            return pd.Series(analyzer(texts).map(len).astype(np.int32))

    def norm_expr(dl):
        # JVM restatement of norms.encode_norm, bit-identical for the
        # int domain: n <= 0 -> 127, else trunc(127.0/sqrt(double(n)))
        # (floor == trunc for positives; IEEE double sqrt/divide match
        # numpy's). Removes one ArrowEvalPython node per field from the
        # doc-prep stage — with the build session's worker.reuse=false,
        # that is one python-worker spawn per task per field (guide §4.1:
        # built-ins over UDFs when an exact expression exists).
        return (F.when(dl <= 0, F.lit(127))
                .otherwise(F.floor(F.lit(127.0) / F.sqrt(dl.cast("double")))
                           .cast("int"))).cast("int")

    for col in field_cols:
        fname = _field_name(col)
        base = base.withColumn(doc_len_col(fname), doc_len_udf(F.col(col)))
        base = base.withColumn(norm_col(fname),
                               norm_expr(F.col(_bq(doc_len_col(fname)))))
    # back-compat aliases for the default field
    base = base.withColumn("doc_len",
                           F.col(_bq(doc_len_col(_field_name(default_col)))))
    base = base.withColumn("norm",
                           F.col(_bq(norm_col(_field_name(default_col)))))
    # per-row invariant (north_rule): single-field content_sha256 ==
    # sha256(content) of the source row; multi-field hashes the NUL-joined
    # field values
    if len(field_cols) == 1:
        base = base.withColumn("content_sha256",
                               F.sha2(F.col(field_cols[0]), 256))
    else:
        base = base.withColumn(
            "content_sha256",
            F.sha2(F.concat_ws("\x00", *[F.coalesce(F.col(c).cast("string"),
                                                    F.lit(""))
                                         for c in field_cols]), 256))
    return base


def build_index(spark: SparkSession, df: DataFrame, out_dir: str,
                **kwargs) -> IndexCatalog:
    """Single-writer entry point: acquires `<out_dir>/write.lock` for the
    duration of the build (IndexWriter lock semantics — a second
    concurrent writer on the same root fails fast instead of corrupting
    the commit chain; see index/lock.py). All build options are forwarded
    to `_build_index_impl`, whose docstring documents them."""
    from diagon_spark.index.lock import write_lock
    with write_lock(out_dir):
        return _build_index_impl(spark, df, out_dir, **kwargs)


def _build_index_impl(spark: SparkSession, df: DataFrame, out_dir: str, *,
                      num_segments: int = 8, num_buckets: int = 16,
                      key_cols: list[str] | None = None,
                      id_col: str | None = None,
                      content_col: str = "content",
                      fields: list[str] | None = None,
                      positions: bool = True,
                      segment_batches: int = 1, max_batches: int | None = None,
                      resume: bool = False, analyzer=None,
                      persist_tokens: bool = False, append: bool = False,
                      segment_base: int = 0,
                      store_content: bool = True,
                      commit_extra: dict | None = None,
                      bloom_ndv: int = DEFAULT_BLOOM_NDV,
                      encode_group_docs: int = 20_000) -> IndexCatalog:
    """Build (or resume) the full index. Returns a committed IndexCatalog.

    `fields` lists the document columns to index, each as its own field
    with per-field postings/norms/stats (document/Field.h:24 multi-field
    semantics); default is the single `content_col`. The FIRST entry is
    the index's default field for unqualified queries.

    segment_batches > 1 splits the postings build into independent waves of
    segments, each atomically appended + recorded in lineage — the
    checkpoint/resume granularity. `max_batches` stops early (used by the
    kill-mid-build test). `resume=True` skips segments already completed
    per the lineage table.

    `append=True` + `segment_base` adds NEW segments to an existing index
    (incremental / near-real-time ingest: each micro-batch is an epoch of
    fresh segments, the buffer→flush→reopen cycle of the reference's NRT
    path — index/DirectoryReader.cpp reopen semantics). term_dict and
    stats are maintained incrementally: only the new segments are
    aggregated and merge-added (additive sums) — no rescan of old
    postings.
    """
    from diagon_spark._ship import ensure_shipped
    ensure_shipped(spark)
    # env-gated phase walls on stderr (DIAGON_BUILD_PHASES=1) — the
    # builder-side analogue of DIAGON_ENCODE_PROF, for attributing build
    # wall time to docs-write / encode waves / dict+stats refresh
    import os as _os
    import sys as _sys
    _phase_t = [time.time()]

    def _phase(name: str) -> None:
        if _os.environ.get("DIAGON_BUILD_PHASES"):
            now = time.time()
            print(f"BUILD-PHASE {name} {now - _phase_t[0]:.3f}",
                  file=_sys.stderr, flush=True)
            _phase_t[0] = now

    # Scale-adaptive input parallelism (guide §2.5 input skew): a one-
    # file source otherwise runs the whole doc-prep stage (sha256 +
    # per-field token-count UDFs + docs write) in ONE task; no-op when
    # the source already arrives in enough splits. 4 MB/partition: the
    # doc-prep UDF costs ~0.1 s of CPU per input MB, and under the
    # build session's worker.reuse=false every extra task pays a fresh
    # fork + pandas import — small inputs must NOT fan out to
    # core-count tasks (measured 2 s -> 5.6 s at 5k docs doing so).
    from diagon_spark.parallel import ensure_min_parallelism
    df = ensure_min_parallelism(df, bytes_per_partition=4 << 20)
    _phase("input_ready")
    if key_cols is None and id_col is None:
        key_cols = ["repo", "path", "commit"]
    field_cols = list(fields) if fields else [content_col]
    field_names = [_field_name(c) for c in field_cols]
    cat = IndexCatalog(root=out_dir, num_buckets=num_buckets,
                       num_segments=segment_base + num_segments,
                       has_positions=positions, key_cols=key_cols or [],
                       fields=field_names)
    root = Path(out_dir)
    root.mkdir(parents=True, exist_ok=True)

    if not append and not resume:
        # Fresh build into an existing out_dir: the postings write below is
        # mode('append') (needed for segment waves within one run), so stale
        # postings/lineage/tombstones from a previous index at this path
        # must be cleared or they double df/cttf and return phantom hits.
        import shutil
        for sub in ("postings", "lineage", "deleted"):
            p = root / sub
            if p.exists():
                shutil.rmtree(p)

    # Tokenization feeds both the docs table and the postings build.
    # Deterministic recompute (persist_tokens=False, default) measured
    # FASTER than caching: JVM columnar caching of array<string> token
    # columns costs more in memory/GC than re-running the vectorized
    # tokenizer. persist_tokens=True flips to caching for expensive
    # custom analyzers.
    docs = prepare_docs(df, key_cols, id_col, field_cols, num_segments,
                        analyzer, segment_base)
    if persist_tokens:
        docs = docs.persist()
    # store_content=True keeps the original field columns in the docs
    # table — the stored-fields (.fdt) analogue
    # (codecs/StoredFieldsWriter.h:19-63); it also lets the postings stage
    # read docs parquet instead of re-running the sha/window doc-id chain.
    keep = (key_cols or []) + ([id_col] if id_col else []) \
        + (field_cols if store_content else [])
    per_field_cols = [c for fn_ in field_names
                      for c in (doc_len_col(fn_), norm_col(fn_))]
    docs_cols = list(dict.fromkeys(
        ["segment_id", "doc_id", *keep, "content_sha256",
         *per_field_cols, "doc_len", "norm"]))

    done: set[int] = set()
    if resume:
        lin = Path(cat.lineage_path)
        if lin.exists():
            ldf = spark.read.parquet(str(lin))
            done = {r.segment_id for r in
                    ldf.filter(F.col("status") == "done").select("segment_id").collect()}

    all_segments = list(range(segment_base, segment_base + num_segments))
    batches: list[list[int]] = [
        [s for s in all_segments[i::segment_batches]]
        for i in range(segment_batches)
    ]
    docs_written = resume and Path(cat.docs_path, "_SUCCESS").exists()

    if not docs_written:
        docs.select(*[F.col(_bq(c)) for c in docs_cols]).write \
            .mode("append" if append else "overwrite").parquet(cat.docs_path)
    _phase("docs_write")

    docs_idx = spark.read.parquet(cat.docs_path)  # re-read: stable doc ids
    new_docs_idx = (docs_idx.filter(F.col("segment_id") >= segment_base)
                    if append else docs_idx)

    tok_docs = None  # lazily recompute tokens only if some batch runs
    n_run = 0
    # per-wave doc/len sums accumulated from the lineage agg — feeds the
    # stats refresh without a second docs scan (valid only when THIS run
    # processed every new segment, i.e. not resuming into partial state)
    stats_acc = {"n": 0, "sttf": {fn_: 0 for fn_ in field_names}}
    for bi, seg_ids in enumerate(batches):
        todo = [s for s in seg_ids if s not in done]
        if not todo:
            continue
        if max_batches is not None and n_run >= max_batches:
            break
        n_run += 1
        t0 = time.time()
        if tok_docs is None:
            # one row per (doc, field): the shuffle carries the field's
            # content string under a fixed safe alias (applyInPandas
            # resolves plain names internally, which breaks for dotted
            # flattened-JSON names like `body.text`)
            # id_col path: (segment_id, doc_id) from the in-memory plan
            # is a cheap cast+pmod, so keep reading the (repartitioned,
            # parallel) SOURCE — the just-written docs parquet is a few
            # small files that openCostInBytes packs into 1-3 scan
            # splits, serializing the encode exchange's map side and the
            # range-sampling pass. key_cols builds still read the docs
            # parquet: re-deriving ids there re-runs the sha/window
            # chain (a shuffle + sort).
            src = docs if (id_col is not None or not store_content) \
                else docs_idx
            fstructs = [F.struct(F.lit(fn_).alias("field"),
                                 F.col(c).cast("string").alias("__content"))
                        for fn_, c in zip(field_names, field_cols)]
            tok_docs = (src.select("segment_id", "doc_id",
                                   F.explode(F.array(*fstructs)).alias("fc"))
                        .select("segment_id", "doc_id",
                                F.col("fc.field").alias("field"),
                                F.col("fc.__content").alias("__content")))
        part = tok_docs.filter(F.col("segment_id").isin(todo))
        # ENCODE GROUP SIZE is decoupled from segment size: each
        # (segment, field) splits into doc-id-RANGE sub-batches of
        # ~encode_group_docs docs (`sub` column below; the postings
        # format already supports many chunks per term — sub-batch b
        # emits chunks at base b<<20, and sub order == doc order, so
        # rows sorted by chunk stay docID-ordered exactly as
        # _SegmentPostings requires). Measured: the encode kernel's
        # s/doc is flat at 15-20k-doc groups and inflates 3-10x at 156k
        # under concurrent workers (cache + fresh-page-fault working
        # set, scripts/encode_profile.py) — sub-batching makes a
        # big-segment layout build like a small-segment one while
        # keeping the segment COUNT a pure layout choice. The doc-id
        # range split uses per-segment (min, max) collected from the
        # narrow docs scan: dense ids (this engine's own assignment)
        # give even sub-batches; sparse user ids degrade to skewed ones,
        # never to more than n_subs groups.
        # ONE per-segment aggregation job per wave: the encode-group
        # bounds (lo/hi/n) AND the lineage facts (fingerprint, postings
        # count, per-field doc_len sums) come out of the same docs scan;
        # lineage rows are then assembled driver-side after the encode
        # (they need wall_ms) — the separate post-encode docs scan the
        # old lineage aggregation paid is gone.
        total_len = None
        per_field_sums = []
        for i_, fn_ in enumerate(field_names):
            c = F.col(_bq(doc_len_col(fn_)))
            total_len = c if total_len is None else total_len + c
            per_field_sums.append(F.sum(c).alias(f"sum_len__{i_}"))
        seg_rows = (docs_idx.filter(F.col("segment_id").isin(todo))
                    .groupBy("segment_id")
                    .agg(F.min("doc_id").alias("lo"),
                         F.max("doc_id").alias("hi"),
                         F.count("*").alias("n"),
                         F.sum(F.crc32(F.col("content_sha256")))
                         .alias("input_fingerprint"),
                         F.sum(total_len).alias("n_postings"),
                         *per_field_sums).collect())
        _phase(f"seg_rows_b{bi}")
        if not seg_rows:
            continue  # no docs in these segments: nothing to encode
        seg_lo = {int(r.segment_id): int(r.lo) for r in seg_rows}
        seg_span = {}
        seg_nsubs = {}
        n_groups = 0
        for r in seg_rows:
            # cap: sub<<20 must fit the int32 chunk column (sub <= 2047)
            n_subs = max(1, min(2000, int(r.n) // max(encode_group_docs, 1)))
            seg_nsubs[int(r.segment_id)] = n_subs
            seg_span[int(r.segment_id)] = max(
                1, -(-(int(r.hi) - int(r.lo) + 1) // n_subs))
            n_groups += n_subs * len(field_names)
        lo_map = F.create_map(*[F.lit(x) for kv in seg_lo.items()
                                for x in kv])
        span_map = F.create_map(*[F.lit(x) for kv in seg_span.items()
                                  for x in kv])
        part = part.withColumn(
            "sub",
            F.floor((F.col("doc_id") - lo_map[F.col("segment_id")])
                    / span_map[F.col("segment_id")]).cast("int"))
        # Explicit partition count = one task per encode group: AQE's
        # byte-based coalescing would otherwise merge these CPU-heavy
        # groups, and with n_partitions ~= n_keys plain hash-partitioning
        # on the GROUP COLUMNS collides ~1/e of the keys (measured: an
        # 8-segment build ran on 5 effective workers with double-group
        # straggler tasks). Routing: every (segment, field, sub) group is
        # known driver-side, so each is tagged with a pre-solved SALT
        # whose Spark hash lands in its own partition (_partition_salts)
        # and routed through an ordinary hash repartition — the balance
        # guarantee of repartitionByRange WITHOUT its range-sampling
        # job, which re-executed the whole child plan (scan + explode of
        # every content string) once per build wave. HashPartitioning on
        # the salt satisfies the applyInPandas clustering (salt is part
        # of the grouping key set) so no second shuffle is inserted;
        # the salt is appended LAST so key[0..2] keep their meaning in
        # the encode fn. Builds with pathologically many groups fall
        # back to range partitioning (literal-map plan-size guard).
        enc_fn = _encode_segment_fn(num_buckets, positions, analyzer)
        group_keys = [(s, fi, b) for s in sorted(seg_nsubs)
                      for fi in range(len(field_names))
                      for b in range(seg_nsubs[s])]
        if 0 < len(group_keys) <= _SALT_ROUTE_MAX_GROUPS:
            salts = _partition_salts(len(group_keys))
            nf = len(field_names)
            if nf > 1:
                fidx = F.create_map(*[F.lit(x) for i, fn_ in
                                      enumerate(field_names)
                                      for x in (fn_, i)])[F.col("field")]
            else:
                fidx = F.lit(0)
            # dense group ordinal gi = seg_offset + fidx*n_subs + sub,
            # then element_at into the salt array — O(1) per row plus
            # two segment-count map probes, instead of a per-row linear
            # scan of a groups-count literal map (up to 4096 entries)
            off = {}
            acc = 0
            for s in sorted(seg_nsubs):
                off[s] = acc
                acc += nf * seg_nsubs[s]
            off_map = F.create_map(*[F.lit(x) for kv in off.items()
                                     for x in kv])
            nsubs_map = F.create_map(*[F.lit(x) for kv in
                                       seg_nsubs.items() for x in kv])
            gi = (off_map[F.col("segment_id")]
                  + fidx * nsubs_map[F.col("segment_id")]
                  + F.col("sub"))
            salt_arr = F.array(*[F.lit(int(s)).cast("int")
                                 for s in salts])
            routed = part.withColumn(
                "pk", F.element_at(salt_arr, gi.cast("int") + 1))
            postings = (routed.repartition(len(group_keys), F.col("pk"))
                        .groupBy("segment_id", "field", "sub", "pk")
                        .applyInPandas(enc_fn, schema=POSTINGS_SCHEMA))
        else:
            postings = (part.repartitionByRange(max(n_groups, 1),
                                                F.col("segment_id"),
                                                F.col("field"),
                                                F.col("sub"))
                        .groupBy("segment_id", "field", "sub").applyInPandas(
                            enc_fn, schema=POSTINGS_SCHEMA))
        # compact by bucket before writing: without this every segment
        # task writes one file into every bucket dir (segments × buckets
        # small files); the shuffle moves already-encoded compact bytes
        w = (postings.repartition(num_buckets, F.col("bucket"))
             .write.mode("append"))
        for k_, v_ in bloom_opts(bloom_ndv).items():
            w = w.option(k_, v_)
        w.partitionBy("bucket").parquet(cat.postings_path)
        wall_ms = int((time.time() - t0) * 1000)
        _phase(f"postings_b{bi}")

        # lineage rows (fingerprint = sum of crc32 of doc keys per
        # segment): assembled DRIVER-SIDE from the pre-encode seg_rows
        # collect (same schema as before — segment_id, n_docs,
        # input_fingerprint, n_postings, sum_len__i, status, wall_ms,
        # batch, ts) and appended as one tiny parquet part file written
        # directly with pyarrow — a segments-count metadata row set
        # needs no Spark job (the old post-encode lineage aggregation
        # was a full docs scan + write job per wave).
        _append_tiny_parquet(
            spark, cat.lineage_path,
            [{"segment_id": int(r.segment_id), "n_docs": int(r.n),
              "input_fingerprint": int(r.input_fingerprint or 0),
              "n_postings": int(r.n_postings or 0),
              **{f"sum_len__{i_}": int(r[f"sum_len__{i_}"] or 0)
                 for i_ in range(len(field_names))},
              "status": "done", "wall_ms": wall_ms, "batch": bi}
             for r in seg_rows],
            _lineage_arrow_schema(len(field_names)))
        for r in seg_rows:
            stats_acc["n"] += int(r.n)
            for i_, fn_ in enumerate(field_names):
                stats_acc["sttf"][fn_] += int(r[f"sum_len__{i_}"] or 0)
        _phase(f"lineage_b{bi}")

    covered_all = (not resume and max_batches is None and not done)
    _refresh_term_dict_and_stats(
        spark, cat, field_names, docs_idx=docs_idx,
        new_docs_idx=new_docs_idx, append=append, segment_base=segment_base,
        stats_acc=stats_acc if covered_all else None)
    _phase("dict_stats_refresh")

    if persist_tokens:
        docs.unpersist()
    # a custom analyzer bypasses the standard tokenizer entirely — stamp
    # the manifest so check_index skips the icu/regex comparison instead
    # of degrading a perfectly consistent analyzer-built index
    tok_extra = ({"tokenizer": "custom-analyzer"} if analyzer is not None
                 else {})
    cat.commit({"batches_run": n_run, **tok_extra, **(commit_extra or {})})
    return cat


def rollback(spark: SparkSession, root: str, generation: int
             ) -> IndexCatalog:
    """Single-writer wrapper around `_rollback_impl` (write.lock held for
    the duration — rollback rewrites postings/docs tables in place)."""
    from diagon_spark.index.lock import write_lock
    with write_lock(root):
        return _rollback_impl(spark, root, generation)


def _rollback_impl(spark: SparkSession, root: str, generation: int
                   ) -> IndexCatalog:
    """Roll the index back to an older commit point — the
    IndexWriter::rollback / open-at-IndexCommit analogue
    (index/IndexWriter.h:251). Segments appended after that commit are
    physically dropped (segment ids are monotone across append epochs, so
    the cut is `segment_id < old.num_segments`), tombstones referencing
    dropped docs are pruned, term_dict/stats are recomputed, and a NEW
    commit generation publishes the rolled-back state atomically."""
    import shutil
    old = IndexCatalog.load(root, generation)
    cut = old.num_segments
    for sub, part_by in (("docs", None), ("postings", "bucket"),
                         ("deleted", None), ("lineage", None)):
        p = Path(root, sub)
        if not p.exists():
            continue
        df = spark.read.parquet(str(p))
        if sub == "deleted" and "segment_id" not in df.columns:
            # pre-r2 tombstone tables carry only doc_id — upgrade via the
            # (already rolled back, docs is first in the loop) docs table;
            # tombstones of dropped docs vanish with the inner join
            docs_now = (spark.read.parquet(str(Path(root, "docs")))
                        .select("doc_id", "segment_id"))
            _swap_write(df.select("doc_id").distinct()
                        .join(docs_now, "doc_id", "inner")
                        .select(F.col("doc_id").cast("long"),
                                F.col("segment_id").cast("int")), str(p))
            continue
        if df.filter(F.col("segment_id") >= cut).limit(1).count() == 0:
            continue
        _swap_write(df.filter(F.col("segment_id") < cut), str(p),
                    partition_by=part_by,
                    options=_BLOOM_OPTS if sub == "postings" else None)
    docs_idx = spark.read.parquet(old.docs_path)
    _refresh_term_dict_and_stats(spark, old, old.fields, docs_idx=docs_idx,
                                 new_docs_idx=docs_idx, append=False,
                                 segment_base=0)
    old.commit({"rolled_back_to": generation})
    return old


def _swap_write_buckets(df: DataFrame, path: str, buckets: list[int],
                        options: dict | None = None) -> None:
    """Overwrite ONLY the given bucket=N partition dirs of a
    bucket-partitioned table: stage the (bucket-partitioned) df to
    `<path>.swap`, then atomically swap the touched bucket dirs. The
    append-path term_dict maintenance — untouched buckets are never read
    or rewritten. (Object-store form: Iceberg dynamic partition
    overwrite.)"""
    import shutil
    tmp = path + ".swap"
    if Path(tmp).exists():
        shutil.rmtree(tmp)
    w = df.write.mode("overwrite")
    for k, v in (options or {}).items():
        w = w.option(k, v)
    w.partitionBy("bucket").parquet(tmp)
    for b in buckets:
        src = Path(tmp, f"bucket={b}")
        dst = Path(path, f"bucket={b}")
        if dst.exists():
            shutil.rmtree(dst)
        if src.exists():
            src.rename(dst)
    shutil.rmtree(tmp, ignore_errors=True)
    # same hazard as _swap_write: session-cached listings of the table
    # must not chase the removed bucket part files
    df.sparkSession.catalog.refreshByPath(path)


def _refresh_term_dict_and_stats(spark: SparkSession, cat: IndexCatalog,
                                 field_names: list[str], *,
                                 docs_idx: DataFrame,
                                 new_docs_idx: DataFrame,
                                 append: bool, segment_base: int,
                                 stats_acc: dict | None = None) -> None:
    """Term dictionary + per-field collection stats.

    term_dict is hive-partitioned by `bucket`. Fresh build: one global
    shuffle agg over all postings (the k-way SegmentMerger heap is
    Spark's sort-merge shuffle). Append: aggregate ONLY the new segments
    (parquet pushdown on segment_id skips old row groups), merge-add into
    ONLY the bucket partitions those terms hash to, and swap just those
    bucket dirs — maintenance cost is O(touched vocabulary), not
    O(global vocabulary), per micro-batch (the per-segment SegmentInfos
    stats model, summed at write time instead of read time). df/cttf/
    sttf/sum_doc_freq are additive, so incremental maintenance is exact.
    """
    pdf = spark.read.parquet(cat.postings_path)
    if append:
        pdf = pdf.filter(F.col("segment_id") >= segment_base)
    new_td = (pdf.groupBy("field", "term", "bucket")
              .agg(F.sum("df").alias("df"), F.sum("ttf").alias("cttf")))
    td_exists = Path(cat.term_dict_path).exists()
    obs = None
    sdf_delta: dict[str, int] = {}
    if append and td_exists:
        new_td = new_td.persist()
        # one tiny collect (<= fields × buckets rows): which bucket
        # partitions this epoch touches + per-field df deltas for the
        # additive sum_doc_freq update (no global term_dict scan)
        agg_rows = (new_td.groupBy("field", "bucket")
                    .agg(F.sum("df").alias("sdf")).collect())
        touched = sorted({int(r.bucket) for r in agg_rows})
        for r in agg_rows:
            sdf_delta[r.field] = sdf_delta.get(r.field, 0) + int(r.sdf)
        old_sub = (spark.read.parquet(cat.term_dict_path)
                   .filter(F.col("bucket").isin(touched)))  # partition prune
        merged = (old_sub.unionByName(new_td)
                  .groupBy("field", "term", "bucket")
                  .agg(F.sum("df").alias("df"), F.sum("cttf").alias("cttf")))
        _swap_write_buckets(merged, cat.term_dict_path, touched,
                            options=_BLOOM_OPTS)
        new_td.unpersist()
    else:
        # per-field sum_doc_freq rides the term_dict WRITE as observed
        # metrics (Observation) — the separate read-back/aggregate job
        # the old path ran after the write is gone
        from pyspark.sql import Observation
        obs = Observation("sum_doc_freq")
        observed = new_td.observe(obs, *[
            F.sum(F.when(F.col("field") == fn_, F.col("df")))
            .alias(f"sdf_{i}") for i, fn_ in enumerate(field_names)])
        _swap_write(observed, cat.term_dict_path, partition_by="bucket",
                    options=_BLOOM_OPTS)

    # per-field stats: (field, max_doc, doc_count, sum_total_term_freq,
    # sum_doc_freq). max_doc/doc_count are global doc counts (the
    # reference pins docCount := maxDoc, TermQuery.cpp:220-223). Sums
    # come from the lineage aggregation accumulated during the build
    # (no extra docs scan) when the caller covered every new segment;
    # resume/merge/scrub paths fall back to a docs scan.
    if stats_acc is not None:
        n_new = int(stats_acc["n"])
        sttf_new = {fn_: int(stats_acc["sttf"][fn_]) for fn_ in field_names}
    else:
        aggs = [F.count("*").alias("__n")] + [
            F.sum(F.col(_bq(doc_len_col(fn_)))).alias(f"__s_{i}")
            for i, fn_ in enumerate(field_names)]
        row = new_docs_idx.agg(*aggs).collect()[0]
        n_new = int(row["__n"])
        sttf_new = {fn_: int(row[f"__s_{i}"] or 0)
                    for i, fn_ in enumerate(field_names)}
    old_stats: dict[str, dict] = {}
    if append and Path(cat.stats_path).exists():
        for r in spark.read.parquet(cat.stats_path).collect():
            old_stats[r.field] = r.asDict()

    if append and td_exists:
        # additive: merged df sums = old sums + this epoch's df sums —
        # no O(vocabulary) term_dict rescan per micro-batch
        sum_doc_freq = {f: int(p.get("sum_doc_freq", 0)) + sdf_delta.get(f, 0)
                        for f, p in old_stats.items()}
        for f, d in sdf_delta.items():
            sum_doc_freq.setdefault(f, d)
    else:
        got = obs.get  # blocks until the write action finished (it has)
        sum_doc_freq = {fn_: int(got[f"sdf_{i}"] or 0)
                        for i, fn_ in enumerate(field_names)}
    rows = []
    for fn_ in field_names:
        prev = old_stats.get(fn_, {})
        rows.append((
            fn_,
            int(prev.get("max_doc", 0)) + n_new,
            int(prev.get("doc_count", 0)) + n_new,
            int(prev.get("sum_total_term_freq", 0)) + sttf_new[fn_],
            sum_doc_freq.get(fn_, 0),
        ))
    # carry forward stats of fields not in this append wave
    for fn_, prev in old_stats.items():
        if fn_ not in field_names:
            rows.append((fn_, int(prev["max_doc"]) + n_new,
                         int(prev["doc_count"]) + n_new,
                         int(prev["sum_total_term_freq"]),
                         sum_doc_freq.get(fn_, 0)))
    # the stats table is a per-field handful of driver-known numbers:
    # write it directly with pyarrow (atomic dir swap) — no Spark job at
    # all (the earlier JVM-literal-union form still paid plan analysis
    # plus a write job; createDataFrame(list) was worse still — one
    # python worker spawn per partition under worker.reuse=false)
    import pyarrow as pa
    stats_schema = pa.schema([
        pa.field("field", pa.string()),
        pa.field("max_doc", pa.int64()),
        pa.field("doc_count", pa.int64()),
        pa.field("sum_total_term_freq", pa.int64()),
        pa.field("sum_doc_freq", pa.int64())])
    _swap_tiny_parquet(
        spark, cat.stats_path,
        [{"field": fn_, "max_doc": int(md), "doc_count": int(dc),
          "sum_total_term_freq": int(sttf), "sum_doc_freq": int(sdf_)}
         for fn_, md, dc, sttf, sdf_ in rows], stats_schema)
