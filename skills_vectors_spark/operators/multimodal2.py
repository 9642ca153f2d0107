"""Round-4 multimodal extension: image resize (decode -> fixed-size
nearest-neighbor downsample), completing the decode / feature-extract
/ resize / frame-sample quartet alongside operators/multimodal.py.

Same contract as the rest of the mm family (no reference equivalent —
the reference embeds text only, BASELINE.json north star): since r6
the decode is the REAL P6 PPM parser (`decode_ppm`) over genuine
planted image bytes, the resize is REAL numpy index sampling over the
decoded array, and everything around it — schema, Arrow batch shape,
metadata-pruned scan, per-partition decode — is the production
plumbing. Swapping PPM for PIL changes one import.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from skills_vectors_spark.operators.multimodal import decode_ppm, ppm_media_table
from skills_vectors_spark.registry import register

OUT_H, OUT_W = 16, 16  # fixed training-input resolution


def _nn_resize(img: np.ndarray, out_h: int = OUT_H, out_w: int = OUT_W) -> np.ndarray:
    """Nearest-neighbor resample to (out_h, out_w, 3) — the standard
    cheap pre-training resize; every output pixel is an exact copy of
    one source pixel (the property the unit test pins)."""
    ih = (np.arange(out_h) * img.shape[0] // out_h).astype(np.int64)
    iw = (np.arange(out_w) * img.shape[1] // out_w).astype(np.int64)
    return img[ih][:, iw]


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("src_h", T.IntegerType()),
        T.StructField("src_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
        T.StructField("mean_gray", T.DoubleType()),
    ]
)


def image_resize_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode -> resize, emitting the RAW resized pixel buffers
    (out_h*out_w*3 bytes, row-major) a training pipeline consumes.
    The registered ``mm_image_resize`` reduces this to oracle-checkable
    dims + a plausibility gate; the byte payloads stay available as
    API, and — like every mm op — never leave the executor."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = decode_ppm(bytes(payload))
                out = _nn_resize(img)
                rows.append(
                    (
                        int(mid),
                        img.shape[0],
                        img.shape[1],
                        OUT_H,
                        OUT_W,
                        out.tobytes(),
                        float(out.mean()),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _RESIZE_SCHEMA.fields])

    return ppm_media_table(spark, sf_dir).mapInPandas(run, _RESIZE_SCHEMA)


N_BLOB_FILES = 24  # bounded fixture (test-SF only; prod scans real dirs)


@register(
    "scan_binaryfile",
    f"""
    SELECT 'blob_' || doc_id || '.bin' AS file_name,
           CAST(strlen(text) AS BIGINT) AS length,
           md5(text) AS content_md5
    FROM documents WHERE doc_id < {N_BLOB_FILES} AND text IS NOT NULL
    """,
)
def scan_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `binaryFile` data source — Spark's real blob-ingestion path
    for the multimodal family (one row per file: path, length, raw
    content; partition-parallel, pathGlobFilter/recursiveFileLookup
    pruning). The mm_* operators synthesize payloads from the
    documents table; a production corpus arrives exactly through this
    scan, so the source contract is exercised end-to-end: write a
    bounded blob fixture, scan it back, and oracle-check name, byte
    length, and content md5 against the originating rows.

    The fixture writer is driver-side and HARD-CAPPED at
    {N_BLOB_FILES} files (same policy as scan_npy's seeding cap) — it
    stands in for the external blob store, not for engine work; the
    scan itself is the engine path and is executor-parallel over
    files at any scale.
    """
    import pathlib

    from skills_vectors_spark import sources
    from skills_vectors_spark.scratch import scratch

    blob_dir = pathlib.Path(scratch(sf_dir, "blob_fixture"))
    blob_dir.mkdir(parents=True, exist_ok=True)
    docs = (
        sources.load(spark, sf_dir, "documents")
        # NULL text has no bytes to write — no blob, same predicate
        # as the oracle
        .filter((F.col("doc_id") < N_BLOB_FILES) & F.col("text").isNotNull())
        .select("doc_id", "text")
        .collect()  # bounded: <= N_BLOB_FILES rows by the filter above
    )
    # the scan set must be EXACTLY the written set: a stale *.bin left
    # by an earlier run (e.g. after lowering N_BLOB_FILES) would match
    # the glob and break the oracle's row-count/md5 parity
    expected = {f"blob_{r.doc_id}.bin" for r in docs}
    for leftover in blob_dir.glob("*.bin"):
        if leftover.name not in expected:
            leftover.unlink()
    for r in docs:
        (blob_dir / f"blob_{r.doc_id}.bin").write_bytes(r.text.encode("utf-8"))
    scan = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(str(blob_dir))
    )
    return scan.select(
        F.element_at(F.split("path", "/"), -1).alias("file_name"),
        F.col("length"),
        F.md5("content").alias("content_md5"),
    )


@register(
    "mm_image_resize",
    # mean_gray in closed form: the resized pixel (Y, X, c) copies
    # source pixel (Y*h//16, X*w//16), whose planted value is
    # base_c + y + x — so the resized total is 256*sum(base_c) +
    # 48*S(h) + 48*S(w) with S(d) = sum_i (i*d)//16, all integer
    # arithmetic until one final division both engines round alike
    f"""
    WITH img AS (
      SELECT doc_id AS media_id,
             8 + ('0x' || substr(md5(text), 1, 2))::INT % 8 AS src_h,
             8 + ('0x' || substr(md5(text), 3, 2))::INT % 8 AS src_w,
             ('0x' || substr(md5(text), 5, 2))::INT % 128
               + ('0x' || substr(md5(text), 7, 2))::INT % 128
               + ('0x' || substr(md5(text), 9, 2))::INT % 128 AS base_sum
      FROM documents WHERE doc_id % 3 = 0 AND text IS NOT NULL
    )
    SELECT media_id, src_h, src_w, {OUT_H} AS out_h, {OUT_W} AS out_w,
           round((256 * base_sum
                  + 48 * list_sum(list_transform(range(0, {OUT_H}), i -> (i * src_h) // {OUT_H}))
                  + 48 * list_sum(list_transform(range(0, {OUT_W}), i -> (i * src_w) // {OUT_W})))
                 / 768.0, 6) AS mean_gray,
           TRUE AS resize_valid
    FROM img
    """,
)
def mm_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode -> fixed OUT_HxOUT_W (16x16) nearest-neighbor resize over
    image payloads (the training-input normalization step). Since r6
    the decode is REAL (decode_ppm over planted P6 bytes), so
    mean_gray is a genuine pixel statistic of the resized raster and
    the oracle predicts it EXACTLY in closed form from the planted
    gradient — a decoder or resizer that picks wrong source indices
    breaks the hash match. resize_valid keeps the buffer-length gate
    (out_h*out_w*3 bytes); value-level checks (every output pixel is a
    copy of the source pixel at the computed index) live in
    tests/test_scale3.py.

    Scale shape: the image subset prunes BEFORE any payload is
    materialized; decode+resize stream per partition inside one Arrow
    pass; only dims and small stats shuffle — resized buffers stay
    executor-side unless the caller asks for image_resize_full.
    """
    full = image_resize_full(spark, sf_dir)
    return full.select(
        "media_id",
        "src_h",
        "src_w",
        "out_h",
        "out_w",
        F.round("mean_gray", 6).alias("mean_gray"),
        (F.length("resized") == F.lit(OUT_H * OUT_W * 3)).alias("resize_valid"),
    )
