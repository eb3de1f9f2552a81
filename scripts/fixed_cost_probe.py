"""Decompose the fixed per-round driver/orchestration cost.

Runs a tiny (2k-page) mega round twice and times individual driver-side
operations that are candidates for the ~18 s core-count-independent
round floor seen by the phase probe. Usage:
    taskset -c 0-15 python scripts/fixed_cost_probe.py 16
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def t(label: str, fn):
    t0 = time.monotonic()
    out = fn()
    print(f"  {label}: {time.monotonic() - t0:.2f}s", flush=True)
    return out


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    from atra_spark.session import get_spark

    spark = get_spark(f"fixed-probe-{cores}", cores=cores, shuffle_partitions=32)
    t("trivial job (range sum)", lambda: spark.range(1000).selectExpr("sum(id)").collect())
    t("trivial job again", lambda: spark.range(1000).selectExpr("sum(id)").collect())

    # tiny parquet write+read round trip (job + commit protocol cost)
    import tempfile

    d = tempfile.mkdtemp(dir="/dev/shm")
    df = spark.range(2000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 96).cast("string"),
                 F.lit(".example.com/p"), F.col("id").cast("string")).alias("url")
    )
    t("tiny write (32 shuffle parts)",
      lambda: df.repartition(32).write.mode("overwrite").parquet(f"{d}/w1"))
    t("tiny write again",
      lambda: df.repartition(32).write.mode("overwrite").parquet(f"{d}/w2"))

    # attach_origin broadcast-build cost (5 PSL joins)
    from atra_spark.functions.jvm_url import attach_origin

    small = spark.read.parquet(f"{d}/w1")
    t("attach_origin first", lambda: attach_origin(small, spark, "url", "host").count())
    t("attach_origin second", lambda: attach_origin(small, spark, "url", "host").count())

    # mapInPandas worker spin-up (imports atra_spark in workers)
    from atra_spark.functions.extract import extract_pages_batch
    from atra_spark.schemas import extracted_schema_with_passthrough

    pages = small.select(
        "url",
        F.current_timestamp().alias("warc_ts"),
        F.encode(F.lit("<html><body><a href='/x'>x</a></body></html>"), "utf-8").alias("html"),
    )
    schema = extracted_schema_with_passthrough(
        [f for f in pages.schema.fields if f.name == "warc_ts"]
    )
    t("mapInPandas extract first (worker import)",
      lambda: pages.mapInPandas(lambda it: extract_pages_batch(it), schema).count())
    t("mapInPandas extract second (warm workers)",
      lambda: pages.mapInPandas(lambda it: extract_pages_batch(it), schema).count())

    # full tiny round x2 via the bench helper (fresh store each time)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    t("mega_round 2k #1", lambda: bench.mega_round_bench(spark, 2000, keep_store=False))
    t("mega_round 2k #2", lambda: bench.mega_round_bench(spark, 2000, keep_store=False))
    t("mega_round 2k #3", lambda: bench.mega_round_bench(spark, 2000, keep_store=False))
    spark.stop()


if __name__ == "__main__":
    main()
