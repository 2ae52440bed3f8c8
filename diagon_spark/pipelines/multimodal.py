"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are `binary` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas UDFs over mapInPandas. The decode step itself is STUBBED here
(no image/audio libraries in this container — clearly marked below);
the Spark-side plumbing (schema, batch shape, partitioning, UDF
signatures) is real and tested.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

BLOB_META_SCHEMA = ("doc_id long, n_bytes long, header_byte int, "
                    "blob_md5 string")

# Real image decode when Pillow is installed (the cluster-image case).
# Gated import, same pattern as the PyICU tokenizer hook
# (analysis/tokenizer.py:42-47): the sandbox has no imaging libs, so the
# deterministic fake path below carries the in-container tests, and
# decode_image(fake=False) lights up wherever PIL exists.
try:  # pragma: no cover - exercised only where Pillow is installed
    from PIL import Image as _PILImage
    HAVE_PIL = True
except ImportError:
    _PILImage = None
    HAVE_PIL = False


def to_blob(df: DataFrame, id_col: str = "doc_id",
            payload_col: str = "text") -> DataFrame:
    """Treat a payload column as an opaque binary blob column. The
    input is repartitioned when under-parallel (parallel.py) so the
    downstream mapInPandas decode/extract kernels don't run in one
    task over a one-file source; no-op for already-parallel inputs."""
    from diagon_spark.parallel import ensure_min_parallelism
    return ensure_min_parallelism(
        df.select(F.col(id_col).cast("long").alias("doc_id"),
                  F.col(payload_col).cast("binary").alias("blob")),
        "doc_id")


def blob_metadata(blobs: DataFrame) -> DataFrame:
    """Typed metadata per blob via mapInPandas (Arrow batches of binary).

    The batch shape (pd.Series of bytes objects) is exactly what a real
    image decode (PIL/libvips) would consume.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in batches:
            blobs_np = pdf["blob"]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": blobs_np.map(len).astype(np.int64),
                "header_byte": blobs_np.map(
                    lambda b: int(b[0]) if len(b) else -1).astype(np.int32),
                "blob_md5": blobs_np.map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()),
            })

    return blobs.mapInPandas(extract, schema=BLOB_META_SCHEMA)


def decode_image(blobs: DataFrame, fake: bool = True) -> DataFrame:
    """Decode image blobs -> (doc_id, width, height, n_channels).

    fake=True (default in this container): a deterministic fake decode
    derives dimensions from the payload hash — keeping the full Spark
    plumbing (schema, Arrow batching, partition behavior) real and
    testable without imaging libraries.

    fake=False: REAL decode through Pillow when installed (gated import
    above; covered by the optional-dependency lane,
    tests/test_optional_deps.py); raises with a clear message when no
    imaging library exists — the exact swap point for PIL/turbojpeg on a
    real cluster.
    """
    if not fake:
        if not HAVE_PIL:
            raise NotImplementedError(
                "real image decode requires Pillow (or swap in libvips/"
                "turbojpeg here) — not installed in this environment; "
                "use fake=True for plumbing tests")

        def dec_real(batches: Iterator[pd.DataFrame]
                     ) -> Iterator[pd.DataFrame]:
            import io
            for pdf in batches:
                w, h, c = [], [], []
                for b in pdf["blob"]:
                    img = _PILImage.open(io.BytesIO(bytes(b)))
                    w.append(img.width)
                    h.append(img.height)
                    c.append(len(img.getbands()))
                yield pd.DataFrame({
                    "doc_id": pdf["doc_id"],
                    "width": np.asarray(w, np.int64),
                    "height": np.asarray(h, np.int64),
                    "n_channels": np.asarray(c, np.int32),
                })

        return blobs.mapInPandas(
            dec_real,
            schema="doc_id long, width long, height long, n_channels int")

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["blob"].map(len).astype(np.int64)
            h = pdf["blob"].map(lambda b: int.from_bytes(
                bytes(b[:4]).ljust(4, b"\0"), "little"))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "width": (16 + (h % 1024)).astype(np.int64),
                "height": (16 + ((h // 1024) % 1024)).astype(np.int64),
                "n_channels": np.where(n % 2 == 0, 3, 1).astype(np.int32),
            })

    return blobs.mapInPandas(
        dec, schema="doc_id long, width long, height long, n_channels int")


def frame_sample(blobs: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video blobs: emits (doc_id, frame_no)
    rows for every_n-th fake frame; a real impl swaps the frame iterator
    for pyav/ffmpeg. Output explodes rows — the partition-count choice
    (repartition upstream by doc_id) is the part that matters at scale."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_frames = (pdf["blob"].map(len) % 100 + 1).astype(np.int64)
            rows = {"doc_id": [], "frame_no": []}
            for did, nf in zip(pdf["doc_id"], n_frames):
                for f in range(0, int(nf), every_n):
                    rows["doc_id"].append(did)
                    rows["frame_no"].append(f)
            yield pd.DataFrame(rows, dtype=np.int64)

    return blobs.mapInPandas(sample, schema="doc_id long, frame_no long")
