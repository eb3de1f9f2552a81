"""Deduplication operators for large-scale training-data pipelines.

DataFrame-native implementations (JVM expressions wherever possible;
Arrow pandas UDFs only where Spark lacks the primitive). Each has a
DuckDB-oracle twin in ``__spark_entry__`` and pytest coverage.

Scale notes (100 TB posture):
- exact dedup: hash-groupBy — one shuffle on a 60-bit content hash
- shingling: explode + distinct keyed by (doc, shingle); hot shingles
  pre-aggregate map-side (partial aggregation is free on groupBy)
- MinHash-LSH: signatures via min-of-hash aggregation (no UDF), band
  buckets joined on (band, hash-pair) — the candidate join never
  materializes the full O(n^2) pair space
- SimHash: Arrow-batched bit-vote UDF, 64-bit signatures; Hamming
  neighbor search via 4-band exact-match blocking
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType

# 60-bit deterministic content hash — identical expression family to
# the DuckDB oracle (md5 hex -> bigint)
def content_hash(col: F.Column) -> F.Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: (content_hash, keeper=min id, n_dups)."""
    return (
        df.select(content_hash(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keeper"), F.count("*").alias("n_dups"))
    )


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """Distinct k-token shingles per doc: (id, sh) — whitespace tokens,
    windowed JVM-side via slice over the token array."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    # sequence(1, n-k+1) only when the doc holds at least one shingle —
    # sequence(1, 0) DESCENDS in Spark and breaks slice()
    idx = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    return (
        df.select(F.col(id_col).alias("id"), F.explode(sh).alias("sh"))
        .dropDuplicates(["id", "sh"])
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs by k-gram Jaccard >= threshold.

    shingle self-join keyed on the shingle (the 100 TB plan: shuffle on
    shingle, combine map-side) -> common counts -> sizes -> filter.
    """
    sh = shingles(df, text_col, id_col, k).cache()
    card = sh.groupBy("id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("id").alias("ida"), "sh")
    b = sh.select(F.col("id").alias("idb"), "sh")
    common = (
        a.join(b, on="sh")
        .filter(F.col("ida") < F.col("idb"))
        .groupBy("ida", "idb")
        .agg(F.count("*").alias("c"))
    )
    out = (
        common.join(card.select(F.col("id").alias("ida"), F.col("n").alias("na")), on="ida")
        .join(card.select(F.col("id").alias("idb"), F.col("n").alias("nb")), on="idb")
        .withColumn("jaccard", F.col("c") / (F.col("na") + F.col("nb") - F.col("c")))
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("ida").alias("doc_a"), F.col("idb").alias("doc_b"), "jaccard"
        )
    )
    return out


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    k: int = 3,
) -> DataFrame:
    """MinHash signature columns h0..h{n-1} per doc — pure aggregation:
    h_i(doc) = min over shingles of hash('s{i}|' + shingle)."""
    sh = shingles(df, text_col, id_col, k)
    aggs = [
        F.min(content_hash(F.concat(F.lit(f"s{i}|"), F.col("sh")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("id").agg(*aggs)


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    rows_per_band: int = 2,
    k: int = 3,
) -> DataFrame:
    """LSH candidate pairs: docs sharing any band of the signature.

    bands = num_hashes / rows_per_band; the band bucket join is keyed
    on (band, h_a, h_b) so only same-bucket docs ever meet.
    """
    sig = minhash_signatures(df, text_col, id_col, num_hashes, k)
    n_bands = num_hashes // rows_per_band
    bands = None
    for b in range(n_bands):
        cols = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        part = sig.select(
            F.col("id"), F.lit(b).alias("band"), F.xxhash64(*cols).alias("bucket")
        )
        bands = part if bands is None else bands.unionByName(part)
    a = bands.select(F.col("id").alias("doc_a"), "band", "bucket")
    b = bands.select(F.col("id").alias("doc_b"), "band", "bucket")
    return (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates()
    )


@F.pandas_udf(LongType())
def simhash64_udf(texts: pd.Series) -> pd.Series:
    """64-bit SimHash per text (token-hash bit voting), Arrow-batched."""
    out = []
    for t in texts:
        if not t:
            out.append(0)
            continue
        acc = np.zeros(64, dtype=np.int64)
        for tok in t.lower().split():
            bits = np.unpackbits(
                np.frombuffer(hashlib.md5(tok.encode()).digest()[:8], dtype=np.uint8)
            ).astype(np.int64)
            acc += bits * 2 - 1
        packed = np.packbits((acc > 0).astype(np.uint8)).tobytes()
        out.append(int.from_bytes(packed, "big", signed=True))
    return pd.Series(out, dtype="int64")


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return df.select(F.col(id_col).alias("id"), simhash64_udf(F.col(text_col)).alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Blocking: split the 64-bit signature into 4 16-bit bands; any pair
    within Hamming<=3 shares at least one exact band (pigeonhole), so
    the candidate join is banded, then exact distance filters.
    """
    sig = simhash(df, text_col, id_col)
    bands = None
    for b in range(4):
        part = sig.select(
            "id",
            "simhash",
            F.lit(b).alias("band"),
            F.shiftright(F.col("simhash"), b * 16).bitwiseAND(F.lit(0xFFFF)).alias("key"),
        )
        bands = part if bands is None else bands.unionByName(part)
    a = bands.select(F.col("id").alias("doc_a"), F.col("simhash").alias("sa"), "band", "key")
    b = bands.select(F.col("id").alias("doc_b"), F.col("simhash").alias("sb"), "band", "key")
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (
        a.join(b, on=["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["doc_a", "doc_b"])
    )
