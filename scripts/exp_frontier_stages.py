"""Stage-by-stage scaling diagnosis of the frontier expand->dedup chain.

Usage: python scripts/exp_frontier_stages.py <store_dir> <cores>
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    store = sys.argv[1]
    cores = int(sys.argv[2])

    from atra_spark.session import get_spark
    from atra_spark.operators.seen import aggregate_candidates
    from atra_spark.plans.crawl import expand_links

    spark = get_spark(f"exp-stages-{cores}", cores=cores, shuffle_partitions=32)
    results_path = os.path.join(store, "results", "r00000")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(name, fn, warm=True):
        if warm:
            fn()  # compile + fork workers once
        t0 = time.monotonic()
        fn()
        print(json.dumps({"cores": cores, "stage": name,
                          "sec": round(time.monotonic() - t0, 2)}), flush=True)

    res = spark.read.parquet(results_path)

    # 1. scan+explode only: parquet decode of the links column + explode
    def scan_explode():
        noop(
            res.filter(F.col("fetched"))
            .select(F.explode("links").alias("l"))
            .filter(F.col("l.kind") != "data")
            .select(F.col("l.url").alias("url"))
        )

    # 2. full expand (adds depth math + host_col regex x2)
    def full_expand():
        _, expanded = expand_links(res, 0)
        noop(expanded)

    # 3. expand + dedup agg (adds the exchange + final agg)
    def expand_dedup():
        _, expanded = expand_links(res, 0)
        noop(aggregate_candidates(expanded))

    timed("scan_explode", scan_explode)
    timed("full_expand", full_expand)
    timed("expand_dedup", expand_dedup)
    spark.stop()


if __name__ == "__main__":
    main()
