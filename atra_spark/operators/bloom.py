"""Partitioned bloom filter for seen-set pre-pruning.

North rule: "bloom-filter broadcast pruning before the seen-set
anti-join". The reference gets this for free from RocksDB bloom blocks
(``key_may_exist_cf``, atra/src/recrawl_management/mod.rs:62); the
rebuild makes it explicit and *partitioned*:

- the seen set is host-hash bucketed; each bucket gets its own bloom
  sized for its own cardinality, so one mega-host cannot blow up a
  single global filter
- build is fully distributed: ``xxhash64(url)`` runs JVM-side, bucket
  bitmaps are OR-reduced per bucket via ``applyInPandas`` (one small
  row per bucket comes back to the driver — B rows of m/8 bytes, NOT
  the URL set)
- probe is a vectorized pandas UDF over (bucket, hash64); rows the
  bloom rejects are **definitely new** and skip the anti-join shuffle
  entirely; only "maybe seen" rows join

Sizing honesty: an optimal bloom at 1% fp costs m = -n*ln(0.01)/ln(2)^2
~= 9.6 bits per key. At 10^10 URLs that is ~12 GB of bitmaps TOTAL
(~3 MB per bucket at B=4096) — NOT broadcastable as a whole, which is
why the crawl engine does not use this module's broadcast probe: it
uses the persistent bucket-partitioned ``SeenIndex``
(operators/seen_index.py), which routes each bucket's bitmap only to
that bucket's partitions and shares this module's bit geometry. The
functions here remain the right tool when the filter is genuinely
small (per-job dedup of a bounded set, <~10^8 keys -> <~120 MB), and
the same bitmaps double as Iceberg parquet bloom columns in
production.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    StructField,
    StructType,
)

_K_HASHES = 7  # optimal for ~1% fp


def _bloom_params(n: int, fp: float = 0.01) -> int:
    """bits m for n entries at target fp (k fixed at 7)."""
    if n <= 0:
        n = 1
    m = int(-n * math.log(fp) / (math.log(2) ** 2))
    # round up to a power of two >= 1024 for cheap modulo
    return max(1024, 1 << (m - 1).bit_length())


def _positions(h: np.ndarray, m: int) -> list[np.ndarray]:
    """k index arrays from a single 64-bit hash (Kirsch-Mitzenmacher:
    pos_i = h1 + i*h2 mod m)."""
    hu = h.astype(np.uint64)
    h1 = hu & np.uint64(0xFFFFFFFF)
    h2 = (hu >> np.uint64(32)) | np.uint64(1)
    return [((h1 + np.uint64(i) * h2) % np.uint64(m)).astype(np.int64) for i in range(_K_HASHES)]


def build_bloom(
    df: DataFrame,
    key: str = "url",
    num_buckets: int = 32,
    fp: float = 0.01,
    m: int | None = None,
) -> dict[int, bytes]:
    """Distributed build: bucket -> bloom bitmap bytes.

    ``m`` (bits per bucket bitmap) MUST stay constant across every
    bloom that will be OR-merged: positions are ``hash mod m``, so
    bitmaps of different m are incompatible (merging them produces
    false negatives, which silently break the anti-join contract —
    callers that maintain incremental blooms pass an explicit m).
    When m is None it is sized from the input count (standalone use).
    """
    if m is None:
        n_total = df.count()
        m = _bloom_params(max(1, (n_total * 4) // num_buckets), fp)

    hashed = df.select(
        F.pmod(F.xxhash64(F.col(key)), F.lit(num_buckets)).cast("int").alias("bucket"),
        F.xxhash64(F.col(key)).alias("h64"),
    )

    out_schema = StructType(
        [StructField("bucket", IntegerType()), StructField("bloom", BinaryType())]
    )

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m // 8, dtype=np.uint8)
        h = pdf["h64"].to_numpy()
        for pos in _positions(h, m):
            np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        return pd.DataFrame({"bucket": [int(pdf["bucket"].iloc[0])], "bloom": [bits.tobytes()]})

    rows = hashed.groupBy("bucket").applyInPandas(_build, out_schema).collect()
    return {r["bucket"]: r["bloom"] for r in rows}


def bloom_maybe_contains(
    spark: SparkSession,
    df: DataFrame,
    blooms: dict[int, bytes],
    key: str = "url",
    num_buckets: int = 32,
    out_col: str = "maybe_seen",
) -> DataFrame:
    """Add a boolean column: could ``key`` be in the seen set?

    False => definitely new (bloom guarantee); True => check with the
    real anti-join.
    """
    bc = spark.sparkContext.broadcast(blooms)

    @F.pandas_udf(BooleanType())
    def _probe(bucket: pd.Series, h64: pd.Series) -> pd.Series:
        bmap = bc.value
        out = np.zeros(len(bucket), dtype=bool)
        b_arr = bucket.to_numpy()
        h_arr = h64.to_numpy()
        for b in np.unique(b_arr):
            blob = bmap.get(int(b))
            if blob is None:
                continue  # empty bucket -> definitely new
            bits = np.frombuffer(blob, dtype=np.uint8)
            m = len(bits) * 8
            sel = b_arr == b
            h = h_arr[sel]
            hit = np.ones(h.shape, dtype=bool)
            for pos in _positions(h, m):
                hit &= (bits[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
            out[sel] = hit
        return pd.Series(out)

    return df.withColumn(
        out_col,
        _probe(
            F.pmod(F.xxhash64(F.col(key)), F.lit(num_buckets)).cast("int"),
            F.xxhash64(F.col(key)),
        ),
    )


def prune_new_candidates(
    spark: SparkSession,
    candidates: DataFrame,
    seen: DataFrame,
    blooms: dict[int, bytes],
    key: str = "url",
    num_buckets: int = 32,
) -> DataFrame:
    """candidates minus seen, bloom-pruned before the anti-join shuffle.

    definitely-new rows (bloom miss) bypass the join; maybe-seen rows
    (bloom hit, incl. ~1% false positives) are confirmed by a left-anti
    join on the bucketed seen table.
    """
    tagged = bloom_maybe_contains(
        spark, candidates, blooms, key=key, num_buckets=num_buckets
    )
    # ONE anti-join, no union split: definitely-new rows get a probe
    # key that can never match a seen URL, so bloom misses pass
    # straight through while maybe-seen rows are confirmed against the
    # bucketed seen table. (The previous two-branch union recomputed
    # the whole candidate subtree — explode, agg, probe — once per
    # branch.) The non-match key is "\x00new\x00" + url — UNIQUE per
    # row, not NULL: null join keys all hash to one shuffle partition,
    # which at crawl scale funnels every genuinely-new URL of the round
    # (the overwhelming majority) onto a single reducer; per-row fake
    # keys keep the anti-join shuffle uniform. Seen URLs are canonical
    # http(s) strings, so a \x00 prefix cannot collide.
    probe_key = F.when(F.col("maybe_seen"), F.col(key)).otherwise(
        F.concat(F.lit("\x00new\x00"), F.col(key))
    )
    return (
        tagged.withColumn("_probe_key", probe_key)
        .join(
            seen.select(F.col(key).alias("_probe_key")),
            on="_probe_key",
            how="left_anti",
        )
        .drop("_probe_key", "maybe_seen")
    )
