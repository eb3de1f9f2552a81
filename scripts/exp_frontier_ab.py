"""Standalone A/B of the frontier expand->dedup chain at two core
counts against a pre-materialized results snapshot (built by
``ATRA_MEGA_STORE_DIR=... python bench.py --crawl-only 16 --pages N``).

Usage: python scripts/exp_frontier_ab.py <store_dir> <cores> [reps]
Prints one JSON line per rep with sub-stage wall times.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    store = sys.argv[1]
    cores = int(sys.argv[2])
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from atra_spark.session import get_spark
    from atra_spark.operators.seen import aggregate_candidates
    from atra_spark.plans.crawl import expand_links

    spark = get_spark(f"exp-frontier-{cores}", cores=cores, shuffle_partitions=32)
    results_path = os.path.join(store, "results", "r00000")
    # warm: fork workers + compile the plan once, untimed
    res = spark.read.parquet(results_path)
    _, expanded = expand_links(res, 0)
    aggregate_candidates(expanded.limit(50000)).write.format("noop").mode("overwrite").save()

    for _ in range(reps):
        t0 = time.monotonic()
        res = spark.read.parquet(results_path)
        _, expanded = expand_links(res, 0)
        cand = aggregate_candidates(expanded)
        cand.write.format("noop").mode("overwrite").save()
        t1 = time.monotonic()
        print(json.dumps({"cores": cores, "expand_dedup_sec": round(t1 - t0, 2)}),
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
