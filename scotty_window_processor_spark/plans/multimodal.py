"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages (one Python worker per input partition, batch-shaped
pandas in/out — never per-row Python). The decode libraries are not in
this container, so the codec step is STUBBED behind a deterministic fake
(`_fake_decode`) with the real Spark-side contract — schema, partition
preservation, batch iteration — fully implemented and tested; swapping in
PIL/ffmpeg is a one-function change.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic stand-in binary column (utf-8 bytes of the text) +
    media metadata — lets the full pipeline run end-to-end without real
    media files. The media-type assignment uses the portable md5-60 hash
    so the whole stage is reproducible in the DuckDB oracle."""
    from .portable_hash import md5_60

    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8")).withColumn(
        "media_type",
        F.element_at(
            F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
            (F.pmod(md5_60(F.col("doc_id").cast("string")), F.lit(3)) + 1).cast("int"),
        ),
    )


def _fake_decode(payload: bytes, media_type: str):
    """STUB: deterministic fake decoder. Replace with PIL / soundfile /
    pyav here; everything upstream/downstream is production-shaped."""
    n = len(payload)
    if media_type == "image/png":
        return (64 + n % 640, 64 + (n * 7) % 480, None, "png-stub")
    if media_type == "audio/wav":
        return (None, None, None, "pcm-stub")
    return (320, 240, 1 + n % 120, "h264-stub")


def decode_metadata(df: DataFrame, codec=None) -> DataFrame:
    """Arrow-batched decode stage: binary payload → typed metadata rows.

    mapInPandas preserves partitioning (no shuffle); batch size follows
    spark.sql.execution.arrow.maxRecordsPerBatch.

    ``codec`` is the ONE-FUNCTION swap seam: any
    ``(payload: bytes, media_type: str) -> (width, height, n_frames,
    codec_name)`` callable (e.g. a PIL/pyav-backed decoder) slots in with
    zero plan changes — the closure ships to the Python workers with the
    stage. Defaults to the deterministic ``_fake_decode`` stub (no media
    libraries in this environment). The swap contract is pinned by
    tests/test_multimodal_seam.py."""
    decode = codec if codec is not None else _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [
                decode(p, m) for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            out = pd.DataFrame(
                meta, columns=["width", "height", "n_frames", "codec"]
            )
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out.insert(1, "byte_len", pdf["payload"].map(len).values)
            yield out

    return df.select("doc_id", "payload", "media_type").mapInPandas(run, DECODED_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plan for video rows: explodes sampled frame indices
    (metadata only — decode is stubbed). Shows the fan-out shape: one
    output row per sampled frame, partition-local."""
    video = df.where(F.col("n_frames").isNotNull())
    return video.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))).alias("frame_idx"),
    )
