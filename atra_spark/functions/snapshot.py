"""Crawl snapshot diff: classify every document across two corpus
snapshots as added / removed / changed / unchanged — the incremental
corpus-update primitive that decides what a recrawl actually has to
reprocess (the table-level analog of the WARC revisit record,
plans/export.py, and the recrawl refill's seen-state comparison,
reference: atra/src/crawl/* recrawl path).

100 TB plan: both snapshots project down to (key, digest) BEFORE the
join — the 60-bit content digest is computed map-side, so only two
narrow two-column relations ever shuffle, never the payloads. The diff
itself is ONE full-outer hash join on the key; with both snapshots
stored bucketed by the key (the natural layout for per-crawl corpus
tables) the exchange disappears entirely. Status is a whole-stage
CASE over the null pattern + digest equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import content_hash


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(key, status, old_digest, new_digest)`` for the union of keys:
    ``added`` (only in new), ``removed`` (only in old), ``changed``
    (both, digests differ), ``unchanged`` (both, digests equal).
    Digests are the repo-wide 60-bit content hash, null on the absent
    side."""
    o = old.select(
        F.col(key_col).alias("key"),
        content_hash(F.col(text_col)).alias("old_digest"),
    )
    n = new.select(
        F.col(key_col).alias("key"),
        content_hash(F.col(text_col)).alias("new_digest"),
    )
    status = (
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("removed"))
        .when(F.col("old_digest") != F.col("new_digest"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return o.join(n, on="key", how="full_outer").select(
        F.col("key").alias(key_col), status.alias("status"),
        "old_digest", "new_digest",
    )
