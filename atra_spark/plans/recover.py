"""Recovery + recrawl plans.

- ``rebuild_frontier_from_seen``: the RECOVER mode
  (atra/src/app/atra.rs:179-199): iterate the link-state store and
  re-enqueue every URL whose state is not ProcessedAndStored, keeping
  its stored is_seed flag and depth. In the rebuild this is a single
  filter over the bucketed seen snapshot — no scan loop.
- ``recrawl_candidates``: the after-drain recrawl refill
  (atra/src/app/atra.rs:392-414; scan impl link_state/db.rs:99-137):
  recrawlable, sufficiently old, processed URLs go back to the
  frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schemas import DEPTH_COLS, KIND_PROCESSED_AND_STORED
from ..sources.store import CheckpointStore


def rebuild_frontier_from_seen(seen: DataFrame, round_no: int) -> DataFrame:
    """RECOVER: every non-ProcessedAndStored URL re-enters the frontier
    with its stored seed flag + depth (app/atra.rs:179-199)."""
    return seen.filter(F.col("kind") != KIND_PROCESSED_AND_STORED).select(
        "url",
        "host",
        "is_seed",
        F.lit(0).alias("age"),
        F.lit(False).alias("host_was_in_use"),
        *DEPTH_COLS,
        F.lit(round_no).alias("enqueue_round"),
    )


def recover(spark: SparkSession, store: CheckpointStore) -> int:
    """Rebuild the frontier snapshot from the latest seen snapshot;
    returns the number of re-enqueued URLs. The normal round loop then
    resumes from this snapshot."""
    seen = store.read_snapshot(spark, "seen")
    if seen is None:
        raise ValueError("no seen snapshot to recover from")
    rnd = (store.latest_round("seen") or 0)
    frontier = rebuild_frontier_from_seen(seen, rnd)
    store.write_snapshot("frontier", frontier, rnd, bucket_by="host")
    return store.count_rows("frontier", rnd) or 0


def recrawl_candidates(
    seen: DataFrame, now_ts, interval_s: int, round_no: int, require_flag: bool = True
) -> DataFrame:
    """Recrawl refill: processed URLs whose last state change is older
    than the interval (app/atra.rs:392-414). ``require_flag`` keeps the
    reference's per-URL RecrawlYesNo gate; pass False when the crawl
    config recrawls every processed URL on the interval."""
    age_ok = F.col("ts") < (F.lit(now_ts) - F.expr(f"INTERVAL {int(interval_s)} SECONDS"))
    flag_ok = F.col("recrawl") if require_flag else F.lit(True)
    return (
        seen.filter(
            (F.col("kind") == KIND_PROCESSED_AND_STORED)
            & flag_ok
            & age_ok
        )
        .select(
            "url",
            "host",
            "is_seed",
            F.lit(0).alias("age"),
            F.lit(False).alias("host_was_in_use"),
            *DEPTH_COLS,
            F.lit(round_no).alias("enqueue_round"),
        )
    )
