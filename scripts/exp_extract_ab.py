"""A/B the results_write phase's join scaffolding vs the pure
extraction pass, at a given core count.

Usage: python scripts/exp_extract_ab.py <cores> [n_pages]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1])
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 480000

    from atra_spark.session import get_spark
    from atra_spark.functions.extract import extract_pages_batch
    from atra_spark.schemas import extracted_schema_with_passthrough
    from bench import _bench_fixtures

    spark = get_spark(f"exp-extract-{cores}", cores=cores, shuffle_partitions=32)
    paths = _bench_fixtures(n_pages)
    pages = spark.read.parquet(paths["pages"])
    page_fields = {f.name: f for f in pages.schema.fields}
    passthrough = [page_fields[c] for c in ("warc_ts", "status", "headers")
                   if c in page_fields]
    schema = extracted_schema_with_passthrough(passthrough)

    def _extract(it):
        return extract_pages_batch(it, respect_nofollow=True, aggressive=False)

    meta_cols = pages.select(
        "url", F.lit(False).alias("is_seed"),
        F.lit(0).cast("long").alias("depth_on_website"),
        F.lit(0).cast("long").alias("distance_to_seed"),
        F.lit(0).cast("long").alias("total_distance_to_seed"),
    )

    def run(tag, df):
        t0 = time.monotonic()
        df.write.mode("overwrite").parquet(f"/dev/shm/exp_extract_{cores}_{tag}")
        print(json.dumps({"cores": cores, "variant": tag,
                          "sec": round(time.monotonic() - t0, 2)}), flush=True)

    # tiny warm pass: fork workers, compile
    warm = pages.limit(2000).select("url", "warc_ts", "html").mapInPandas(_extract, schema)
    warm.write.mode("overwrite").parquet(f"/dev/shm/exp_extract_{cores}_warm")

    # A: pure extraction, no joins
    a = pages.select("url", "warc_ts", "html").mapInPandas(_extract, schema)
    run("pure", a)

    # B: engine shape — fetch broadcast join + post-extract meta join + miss anti-join
    adm_urls = F.broadcast(meta_cols.select("url"))
    hit = pages.join(adm_urls, on="url").select("url", "warc_ts", "html")
    ext = hit.mapInPandas(_extract, schema)
    res = ext.join(F.broadcast(meta_cols), on="url")
    run("joined", res)

    # C: misses anti-join alone (the third broadcast build)
    t0 = time.monotonic()
    n = meta_cols.join(pages.select("url"), on="url", how="left_anti").count()
    print(json.dumps({"cores": cores, "variant": "miss_antijoin",
                      "sec": round(time.monotonic() - t0, 2), "n": n}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
