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


def change_rate_priority(
    history: DataFrame,
    now_round: int,
    url_col: str = "url",
    round_col: str = "round",
    digest_col: str = "digest",
) -> DataFrame:
    """Adaptive recrawl scheduling from observed change history (Cho &
    Garcia-Molina, "Effective Page Refresh Policies for Web Crawlers":
    crawl pages in proportion to how often they actually change — the
    estimator upgrade of the reference's fixed recrawl cooldown).

    Input: one row per (url, round, digest) observation. Per URL:
    ``n_changes`` = observations whose digest differs from the
    previous one (lag window), ``change_rate`` = smoothed
    ``(n_changes + 0.5) / (n_obs - 1 + 1)`` over the observed
    intervals (URLs seen once get the 0.5 prior), and
    ``priority = (now_round - last_round) * change_rate`` — expected
    staleness, the recrawl ordering key.

    Returns (url, n_obs, n_changes, change_rate, priority).

    100 TB plan: ONE shuffle on the url (the lag window and the
    groupBy share it — same-key partial aggregation); everything else
    is column math. History tables are (url, round, digest) triples,
    never payloads.
    """
    from pyspark.sql import Window

    obs = history.select(
        F.col(url_col).alias("url"),
        F.col(round_col).alias("rnd"),
        F.col(digest_col).alias("dig"),
    ).withColumn("prev_dig", F.lag("dig").over(Window.partitionBy("url").orderBy("rnd")))
    agg = obs.groupBy("url").agg(
        F.count("*").alias("n_obs"),
        F.sum(
            F.when(
                F.col("prev_dig").isNotNull()
                & (F.col("dig") != F.col("prev_dig")),
                1,
            ).otherwise(0)
        ).alias("n_changes"),
        F.max("rnd").alias("last_round"),
    )
    rate = (F.col("n_changes") + F.lit(0.5)) / (F.col("n_obs") - 1 + F.lit(1.0))
    rnd6 = lambda c: F.floor(c * 1000000 + 0.5 + 1e-6).cast("double") / 1000000  # noqa: E731
    return agg.select(
        "url",
        F.col("n_obs").cast("long").alias("n_obs"),
        F.col("n_changes").cast("long").alias("n_changes"),
        rnd6(rate).alias("change_rate"),
        rnd6((F.lit(now_round) - F.col("last_round")) * rate).alias("priority"),
    )


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
