"""Isolated micro-benchmark for the expand->dedup frontier stage.

Usage: taskset -c 0-N python scripts/expand_probe.py CORES VARIANT [STORE]

Reads the committed results snapshot of a kept mega-round store
(bench.py --crawl-only with ATRA_MEGA_STORE_DIR) and times JUST the
link-expansion + candidate-aggregation chain, materialized via a noop
sink, at the given core count. Used to localize the non-scaling wall
time the round-level phase probe attributes to fw:expand+dedup.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    cores = int(sys.argv[1])
    variant = sys.argv[2] if len(sys.argv) > 2 else "base"
    store = sys.argv[3] if len(sys.argv) > 3 else "/dev/shm/atra_probe_store"

    from atra_spark.plans.crawl import expand_links
    from atra_spark.operators.seen import aggregate_candidates
    from atra_spark.session import get_spark

    spark = get_spark(f"expand-probe-{cores}", cores=cores, shuffle_partitions=32)
    res_path = f"{store}/results/r00000"
    res = spark.read.parquet(res_path)
    # warm page cache + codegen once
    res.select("url").write.format("noop").mode("overwrite").save()

    for rep in range(3):
        t0 = time.monotonic()
        if variant == "base":
            _, expanded = expand_links(res, 0)
            cand = aggregate_candidates(expanded)
        elif variant == "explode_only":
            cand = (
                res.filter(F.col("fetched"))
                .select(F.explode("links").alias("l"))
                .select(F.col("l.url").alias("url"))
            )
        elif variant == "explode_agg":
            cand = (
                res.filter(F.col("fetched"))
                .select(F.explode("links").alias("l"))
                .select(F.col("l.url").alias("url"))
                .groupBy("url")
                .count()
            )
        elif variant == "prehost":
            # same plan but src full-host computed pre-explode
            from atra_spark.functions.jvm_url import host_col
            from atra_spark.schemas import DEPTH_COLS

            links = (
                res.filter(F.col("fetched"))
                .select(
                    host_col(F.col("url")).alias("_src_h"),
                    *[F.col(c).alias(f"p_{c}") for c in DEPTH_COLS],
                    F.explode("links").alias("l"),
                )
                .filter(F.col("l.kind") != "data")
                .filter(F.col("l.host").isNotNull())
            )
            same_host = host_col(F.col("l.url")) == F.col("_src_h")
            expanded = links.select(
                F.col("l.url").alias("url"),
                F.when(same_host, F.col("p_depth_on_website") + 1)
                .otherwise(F.lit(0))
                .cast("long")
                .alias("depth_on_website"),
                F.when(same_host, F.col("p_distance_to_seed"))
                .otherwise(F.col("p_distance_to_seed") + 1)
                .cast("long")
                .alias("distance_to_seed"),
                (F.col("p_total_distance_to_seed") + 1)
                .cast("long")
                .alias("total_distance_to_seed"),
            )
            cand = aggregate_candidates(expanded)
        else:
            raise SystemExit(f"unknown variant {variant}")
        cand.write.format("noop").mode("overwrite").save()
        print(
            f"cores={cores} variant={variant} rep={rep} "
            f"sec={time.monotonic() - t0:.2f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
