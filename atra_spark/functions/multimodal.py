"""Multimodal payload columns: images/audio/video as opaque binary +
typed metadata, with the Spark-side plumbing (schema, batching,
partition discipline) real and tested, and the codec step stubbed
(the image/audio libraries are not in this container).

Pattern for 100 TB: payloads are a ``binary`` column in the same
row as their metadata; decode/feature steps are ``mapInPandas``
stages sized by bytes (``spark.sql.execution.arrow.maxRecordsPerBatch``
+ ``maxPartitionBytes``), never collected, never shuffled except by
explicit content-hash bucketing.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_s", DoubleType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("sniffed_mime", StringType(), True),
        StructField("payload_hash", StringType(), False),
        StructField("decoded", StringType(), False),  # ok | stubbed | empty
    ]
)

_MAGIC = (
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav"),
    (b"ID3", "audio/mpeg"),
    (b"\x00\x00\x00", "video/mp4"),
)


def sniff_media_mime(payload: bytes | None) -> str | None:
    if not payload:
        return None
    for magic, mime in _MAGIC:
        if payload.startswith(magic):
            return mime
    return "application/octet-stream"


def decode_media(payload: bytes, mime: str):  # pragma: no cover - stub
    """Codec step. The sandbox has no image/audio codecs installed; a
    production deployment swaps this for PIL/torchaudio/ffmpeg. The
    surrounding Spark plumbing (batching, schema, hashing) is real."""
    raise NotImplementedError(
        "media decoding requires codec libraries not present in this environment"
    )


def extract_media_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature pass over media rows: size, magic-byte mime,
    content hash; the decode step is attempted and recorded as
    'stubbed' when the codec layer raises NotImplementedError."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                payload = pdf["payload"].iat[i]
                payload = bytes(payload) if payload is not None else None
                mime = sniff_media_mime(payload)
                status = "empty"
                if payload:
                    try:
                        decode_media(payload, mime or "")
                        status = "ok"
                    except NotImplementedError:
                        status = "stubbed"
                rows.append(
                    (
                        int(pdf["media_id"].iat[i]),
                        pdf["kind"].iat[i],
                        len(payload) if payload else 0,
                        mime,
                        hashlib.md5(payload or b"").hexdigest(),
                        status,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "n_bytes", "sniffed_mime",
                    "payload_hash", "decoded",
                ],
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def media_exact_dedup(df: DataFrame) -> DataFrame:
    """Exact media dedup on payload hash (JVM md5, no Python)."""
    return (
        df.select(F.md5(F.col("payload")).alias("payload_hash"), "media_id")
        .groupBy("payload_hash")
        .agg(F.min("media_id").alias("keeper"), F.count("*").alias("n_dups"))
    )


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/benches (magic-byte
    prefixes + pseudo-random payload bytes)."""
    import random

    rng = random.Random(seed)
    kinds = [("image", b"\x89PNG\r\n"), ("image", b"\xff\xd8\xff\xe0"),
             ("audio", b"ID3\x04"), ("video", b"\x00\x00\x00\x18ftyp")]
    rows = []
    for i in range(n):
        kind, magic = kinds[i % len(kinds)]
        payload = magic + bytes(rng.getrandbits(8) for _ in range(128 + (i % 5) * 64))
        if i % 7 == 3:  # deterministic duplicates for dedup tests
            payload = magic + b"\x01" * 128
        rows.append((i, kind, None, payload, None, None, None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def shard_pack(
    df: DataFrame,
    size_col: str,
    shard_bytes: int = 1 << 30,
    order_col: str = "doc_id",
) -> DataFrame:
    """Webdataset-style shard packing: assign every item to a
    size-bounded shard by GLOBAL byte position in a deterministic
    order, emitting (order_col, shard_id, offset_in_shard, size) — the
    index a training loader reads to stream shard files without
    unpacking them. Items keep ``order_col`` order inside and across
    shards; an item whose bytes straddle a boundary belongs to the
    shard its FIRST byte lands in (shards are approximately
    ``shard_bytes``, never re-split an item).

    This is a global prefix sum, and the naive Spark spelling —
    ``Window.orderBy(order_col)`` with no partition key — collapses
    the whole table into ONE task. Uses the shared two-phase
    distributed prefix sum (``functions/prefix.py``), whose result is
    a pure function of the global order, so a single-window SQL
    oracle reproduces it exactly.
    """
    from .prefix import distributed_prefix_sum

    packed = distributed_prefix_sum(df, order_col, size_col, out_col="_cum")
    # integer DIV, not floor(double /): past 2^53 cumulative bytes a
    # double-precision quotient can land one shard off while the exact
    # long modulo still reflects the true offset — an internally
    # inconsistent index entry
    b = int(shard_bytes)
    return (
        packed.withColumn(
            "_start", (F.col("_cum") - F.col(size_col)).cast("long")
        )
        .select(
            F.col(order_col),
            F.expr(f"_start DIV {b}").alias("shard_id"),
            (F.col("_start") % F.lit(b)).alias("offset_in_shard"),
            F.col(size_col).cast("long").alias("size"),
        )
    )
