"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The reference's wire model is exactly this — Kafka key/value as
``Array[Byte]`` (``kafka/KafkaProducerApp.scala:25-26``) with decode as a
separate operator — so "image/audio/video as binary column" is the same
pattern at analytics scale. The container has no image/audio libraries,
so the *decode* step is stubbed (deterministic fake, clearly marked, with
an import-gated real path), while everything Spark-side is real and
tested: BinaryType columns, Arrow-batched ``mapInPandas`` with explicit
output schema, per-batch (not per-row) processing, frame-sampling
fan-out.

The testdata has no binary table, so payloads are materialized from
``documents.text`` via utf-8 encode — pure ASCII (verified), so byte
arithmetic has an exact SQL oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

from ..engine.catalog import Catalog
from .registry import register

FRAME_BYTES = 64  # "frame sampling" stride over the payload


def with_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the opaque binary column + typed metadata struct — the
    multimodal ingestion schema (payload + mime + n_bytes)."""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(F.encode(F.col(text_col), "utf-8")).alias("n_bytes"),
        ).alias("meta"),
    )


# --- decode stub -----------------------------------------------------------

def _decode_payload_fake(buf: bytes) -> tuple[int, int, str]:
    """Deterministic FAKE decode (the real decoder needs PIL/ffmpeg, not
    present in this container): derives pseudo width/height/mode from
    byte statistics. Replace the body with PIL.Image.open when available;
    the Spark-side plumbing (schema, batching) is identical."""
    n = len(buf)
    checksum = sum(buf) % 9973
    return (n % 640 + 1, checksum % 480 + 1, "L" if checksum % 2 else "RGB")


def decode_payload(buf: bytes) -> tuple[int, int, str]:
    try:
        import PIL  # noqa: F401  — real path, absent in this container
    except ImportError:
        return _decode_payload_fake(buf)
    raise NotImplementedError("real image decode path: wire PIL.Image.open here")


_FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", IntegerType()),
    StructField("byte_sum_mod", IntegerType()),
])


@register(
    "multimodal_features",
    oracle="""
SELECT doc_id,
       length(text) AS n_bytes,
       CAST(list_aggregate(list_transform(range(1, length(text) + 1),
                                          i -> ord(substring(text, i, 1))), 'sum')
            % 997 AS INTEGER) AS byte_sum_mod
FROM documents
""",
    description="binary payload feature extraction via Arrow-batched mapInPandas",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extract over binary payloads: the full multimodal hot path
    (binary column → Arrow batch → numpy-ish per-batch compute)."""
    src = with_payload(Catalog(spark, sf_dir).documents)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": pd.array(payloads.map(
                    lambda b: len(b) if b is not None else None), dtype="Int32"),
                "byte_sum_mod": pd.array(payloads.map(
                    lambda b: sum(b) % 997 if b is not None else None), dtype="Int32"),
            })

    return src.mapInPandas(extract, _FEATURE_SCHEMA)


@register(
    "multimodal_frames",
    oracle=f"""
SELECT doc_id, CAST(t.i - 1 AS INTEGER) AS frame_idx,
       md5(substring(text, (t.i - 1) * {FRAME_BYTES} + 1, {FRAME_BYTES})) AS frame_md5
FROM documents,
     unnest(range(1, CAST(ceil(length(text) / {FRAME_BYTES}.0) AS BIGINT) + 1)) AS t(i)
""",
    description=f"frame sampling: {FRAME_BYTES}-byte strides over the payload, one row per frame",
    tags=("multimodal",),
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    return frame_rows(Catalog(spark, sf_dir).documents)


def frame_rows(d: DataFrame) -> DataFrame:
    """One (doc_id, frame_idx, frame_md5) row per FRAME_BYTES stride."""
    n_frames = F.ceil(F.length("text") / F.lit(float(FRAME_BYTES))).cast("bigint")
    # Empty payload guard: sequence(1, 0) yields a DESCENDING [1, 0] in
    # Spark, which would fabricate two frames where the oracle's
    # range(1, 1) correctly yields none.
    frames = F.when(n_frames >= 1, F.transform(
        F.sequence(F.lit(1), n_frames),
        lambda i: F.md5(F.col("text").substr((i - 1) * FRAME_BYTES + 1, F.lit(FRAME_BYTES))),
    )).otherwise(F.array().cast("array<string>"))
    return (
        d.select("doc_id", F.posexplode(frames).alias("frame_idx", "frame_md5"))
        .select("doc_id", F.col("frame_idx").cast("int").alias("frame_idx"), "frame_md5")
    )


_DECODE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("mode", StringType()),
])


@register(
    "multimodal_decode_stub",
    oracle="""
WITH b AS (
  SELECT doc_id, text,
         length(text) AS n,
         COALESCE(list_aggregate(list_transform(range(1, length(text) + 1),
                                                i -> ord(substring(text, i, 1))),
                                 'sum'), 0) % 9973 AS checksum
  FROM documents
)
SELECT doc_id,
       CASE WHEN text IS NULL THEN NULL
            ELSE CAST(n % 640 + 1 AS INTEGER) END AS width,
       CASE WHEN text IS NULL THEN NULL
            ELSE CAST(checksum % 480 + 1 AS INTEGER) END AS height,
       CASE WHEN text IS NULL THEN NULL
            WHEN checksum % 2 = 1 THEN 'L' ELSE 'RGB' END AS mode
FROM b
""",
    description="stubbed media decode over binary payloads (mapInPandas, "
                "deterministic fake with an exact byte-arithmetic oracle)",
    tags=("multimodal", "stub"),
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode step of the media pipeline, stub-backed but hash-proved.

    The real decoder (PIL) is absent from this container, so
    :func:`decode_payload` falls back to :func:`_decode_payload_fake` —
    a deterministic function of the payload BYTES. Payloads here are
    ASCII (module docstring), so DuckDB replays the same byte arithmetic
    and the driver hash-checks the full plumbing end to end: binary
    column → Arrow batch → per-payload decode → typed struct out. When
    PIL lands, the fake (and this oracle) swap out behind the same seam.
    """
    src = with_payload(Catalog(spark, sf_dir).documents)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["payload"].map(
                lambda b: decode_payload(b) if b is not None else (None, None, None))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "width": pd.array(decoded.map(lambda t: t[0]), dtype="Int32"),
                "height": pd.array(decoded.map(lambda t: t[1]), dtype="Int32"),
                "mode": decoded.map(lambda t: t[2]),
            })

    return src.mapInPandas(decode, _DECODE_SCHEMA)


THUMB_BYTES = 64  # target "thumbnail" size for the stub resize


@register(
    "multimodal_resize",
    oracle=f"""
SELECT doc_id,
       CAST(greatest(ceil(length(text) / {THUMB_BYTES}.0), 1) AS INTEGER) AS stride,
       CAST(ceil(length(text) / greatest(ceil(length(text) / {THUMB_BYTES}.0), 1))
            AS INTEGER) AS thumb_bytes,
       CAST(COALESCE(list_aggregate(list_transform(
              range(0, CAST(ceil(length(text) / greatest(ceil(length(text) / {THUMB_BYTES}.0), 1)) AS BIGINT)),
              i -> ord(substring(text,
                                 CAST(1 + i * greatest(ceil(length(text) / {THUMB_BYTES}.0), 1) AS BIGINT),
                                 1))), 'sum'), 0) % 997 AS INTEGER) AS thumb_sum_mod
FROM documents
""",
    description=f"stub resize: stride-downsample payload to ≤{THUMB_BYTES} bytes (real path = PIL resize)",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize step of the media pipeline, stubbed deterministically: the
    payload is stride-downsampled to at most THUMB_BYTES samples (the
    1-D analog of nearest-neighbor image downscaling; swap the sampling
    line for ``PIL.Image.resize`` when a decoder is present). The
    Spark-side shape is the real one: binary in, Arrow batch per task,
    small typed summary out. Byte sampling has an exact SQL oracle
    because payloads are ASCII (module docstring)."""
    src = with_payload(Catalog(spark, sf_dir).documents)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            out = {"doc_id": pdf["doc_id"], "stride": [], "thumb_bytes": [],
                   "thumb_sum_mod": []}
            for buf in payloads:
                if buf is None:  # NULL payload → NULL summary (oracle NULL-propagates)
                    out["stride"].append(None)
                    out["thumb_bytes"].append(None)
                    out["thumb_sum_mod"].append(None)
                    continue
                n = len(buf)
                k = max(-(-n // THUMB_BYTES), 1)  # ceil(n / THUMB), ≥ 1
                thumb = buf[::k]
                out["stride"].append(k)
                out["thumb_bytes"].append(len(thumb))
                out["thumb_sum_mod"].append(sum(thumb) % 997)
            yield pd.DataFrame({
                "doc_id": out["doc_id"],
                "stride": pd.array(out["stride"], dtype="Int32"),
                "thumb_bytes": pd.array(out["thumb_bytes"], dtype="Int32"),
                "thumb_sum_mod": pd.array(out["thumb_sum_mod"], dtype="Int32"),
            })

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("stride", IntegerType()),
        StructField("thumb_bytes", IntegerType()),
        StructField("thumb_sum_mod", IntegerType()),
    ])
    return src.mapInPandas(resize, schema)
