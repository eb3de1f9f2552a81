"""The crawl round loop — atra's async poll/fetch/extract/store cycle
(atra/src/crawl/mod.rs:62-150, crawler.rs:156-626) re-expressed as an
iterative batch dataflow: one Spark job pipeline per round, one
checkpoint-store transaction per round (SURVEY.md §3.1 "Spark
lifecycle equivalent").

Scale posture per round (10^10-frontier discipline, SURVEY.md §7):
- nothing is ever collected to the driver except per-round counters
  and per-bucket bloom bitmaps
- frontier/seen stay host-hash bucketed across rounds (store writes
  repartition by ``pmod(xxhash64(host), P)``)
- the seen-set anti-join is bloom-pre-pruned; bitmaps are maintained
  incrementally (OR of each round's new URLs — no rebuild scans)
- candidate aggregation is salted two-phase (hot hosts / hot URLs)
- admission is a JVM window function; the applyInPandas scheduler is
  the stateful variant (equivalence pytest-verified)
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import CrawlConfig
from ..functions.extract import extract_pages_batch
from ..functions.url_udfs import canonicalize_udf, origin_udf
from ..schemas import (
    ADMISSION_SCHEMA,
    DEPTH_COLS,
    EDGES_SCHEMA,
    EXTRACTED_SCHEMA,
    FRONTIER_SCHEMA,
    KIND_DISCOVERED,
    KIND_INTERNAL_ERROR,
    KIND_PROCESSED_AND_STORED,
    METRICS_SCHEMA,
    SEEN_SCHEMA,
)
from ..sources.store import CheckpointStore
from ..operators import bloom as bloom_ops
from ..operators.frontier import (
    filter_age,
    filter_blacklist,
    filter_budget,
    filter_robots,
    filter_state,
    parse_robots,
)
from ..operators.politeness import admit_window
from ..operators.seen import aggregate_candidates, merge_seen


@dataclass
class RoundStats:
    round: int
    polled: int
    admitted: int
    deferred: int
    fetched_ok: int
    fetch_errors: int
    links_extracted: int
    new_urls: int
    wall_ms: int


@dataclass
class CrawlReport:
    rounds: list[RoundStats] = field(default_factory=list)

    @property
    def fetched_total(self) -> int:
        return sum(r.fetched_ok + r.fetch_errors for r in self.rounds)


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        store: CheckpointStore,
        config: CrawlConfig,
        pages_path: str,
        robots_path: str | None = None,
        num_buckets: int = 32,
    ) -> None:
        self.spark = spark
        self.store = store
        self.config = config
        self.num_buckets = num_buckets
        self.pages = spark.read.parquet(pages_path).select("url", "warc_ts", "html")
        if robots_path:
            robots_df = spark.read.parquet(robots_path)
            self.robots_parsed = parse_robots(robots_df).cache()
            self.robots_parsed.count()  # materialize once (robots LRU analog)
        else:
            self.robots_parsed = None
        self._blooms: dict[int, bytes] = {}

    # ------------------------------------------------------------------
    def seed(self, seeds: list[str]) -> None:
        """Initialize frontier + seen + seed edges (seed/input/seed_data.rs:53-67)."""
        spark = self.spark
        seeds_df = (
            spark.createDataFrame([(s,) for s in seeds], "url string")
            # canonicalize rejects non-http(s)/unparseable seeds, matching
            # the reference's UrlWithDepth parse at enqueue
            # (seed/input/seed_data.rs:53-67)
            .withColumn("url", canonicalize_udf(F.col("url")))
            .filter(F.col("url").isNotNull())
            .dropDuplicates(["url"])
            .withColumn("host", origin_udf(F.col("url")))
            .filter(F.col("host").isNotNull())
        )
        frontier = seeds_df.select(
            "url",
            "host",
            F.lit(True).alias("is_seed"),
            F.lit(0).alias("age"),
            F.lit(False).alias("host_was_in_use"),
            *[F.lit(0).cast("long").alias(c) for c in DEPTH_COLS],
            F.lit(0).alias("enqueue_round"),
        )
        seen = seeds_df.select(
            "url",
            "host",
            F.lit(KIND_DISCOVERED).alias("kind"),
            F.lit(254).alias("last_significant_kind"),
            F.lit(False).alias("recrawl"),
            F.lit(True).alias("is_seed"),
            F.current_timestamp().alias("ts"),
            *[F.lit(0).cast("long").alias(c) for c in DEPTH_COLS],
        )
        edges = seeds_df.select(
            F.col("host").alias("src"),
            F.col("url").alias("dst"),
            F.lit("seed").alias("kind"),
            F.lit(0).alias("round"),
        )
        self.store.write_snapshot("frontier", frontier, 0, bucket_by="host")
        self.store.write_snapshot("seen", seen, 0, bucket_by="host")
        self.store.write_snapshot("edges", edges, 0)
        self._blooms = bloom_ops.build_bloom(
            seen.select("url"), num_buckets=self.num_buckets
        )

    # ------------------------------------------------------------------
    def _or_blooms(self, extra: dict[int, bytes]) -> None:
        for b, blob in extra.items():
            cur = self._blooms.get(b)
            if cur is None or len(cur) != len(blob):
                if cur is None:
                    self._blooms[b] = blob
                    continue
                # size mismatch: grow to the larger by rebuilding is
                # avoided — OR into the larger via tiling of positions
                # cannot be done safely; fall back to keeping both ORed
                # at max size (bitmap sizes are stable per run in practice)
                big, small = (cur, blob) if len(cur) > len(blob) else (blob, cur)
                rep = np.frombuffer(big, dtype=np.uint8).copy()
                s = np.frombuffer(small, dtype=np.uint8)
                rep[: len(s)] |= s
                self._blooms[b] = rep.tobytes()
            else:
                self._blooms[b] = (
                    np.frombuffer(cur, dtype=np.uint8) | np.frombuffer(blob, dtype=np.uint8)
                ).tobytes()

    # ------------------------------------------------------------------
    def run_round(self, rnd: int) -> RoundStats:
        spark, cfg = self.spark, self.config
        t0 = time.monotonic()
        frontier = self.store.read_snapshot(spark, "frontier")
        seen = self.store.read_snapshot(spark, "seen")
        assert frontier is not None and seen is not None, "seed() first"
        seen = seen.cache()

        # ---- admission pipeline (cheap-first, crawler.rs:653-704) ----
        eligible = filter_age(frontier, cfg.max_queue_age)
        eligible = filter_state(eligible, seen)
        eligible = filter_blacklist(eligible, cfg.blacklist)
        eligible = filter_budget(eligible, cfg)
        if cfg.respect_robots_txt and self.robots_parsed is not None:
            eligible = filter_robots(eligible, self.robots_parsed)

        sched = admit_window(
            eligible,
            self.robots_parsed,
            default_delay_ms=cfg.delay_ms,
            round_budget_ms=cfg.round_budget_ms,
        ).cache()

        admitted = sched.filter(F.col("admitted"))
        deferred = sched.filter(~F.col("admitted")).select(
            "url",
            "host",
            "is_seed",
            (F.col("age") + 1).alias("age"),
            F.lit(True).alias("host_was_in_use"),
            *DEPTH_COLS,
            "enqueue_round",
        )

        n_admitted = admitted.count()
        n_deferred = deferred.count()
        n_polled = frontier.count()

        if n_admitted == 0:
            # nothing admissible: drop any deferred leftovers to avoid
            # spinning (they can never be admitted again this config)
            wall = int((time.monotonic() - t0) * 1000)
            self.store.write_snapshot(
                "frontier", spark.createDataFrame([], FRONTIER_SCHEMA), rnd + 1, bucket_by="host"
            )
            return RoundStats(rnd, n_polled, 0, n_deferred, 0, 0, 0, 0, wall)

        # ---- admission log (ordering parity, SURVEY.md §7) ----
        admission_log = admitted.select(
            F.lit(rnd).alias("round"),
            "host",
            F.col("admission_index").cast("int"),
            "url",
        )

        # ---- simulated fetch: join the pages table (left join; miss =
        # fetch error analog -> InternalError, crawler.rs:608-622) ----
        fetched = admitted.join(self.pages, on="url", how="left").cache()
        hits = fetched.filter(F.col("html").isNotNull())
        misses = fetched.filter(F.col("html").isNull())

        # ---- extraction (decode -> text -> links -> lang) ----
        respect_nofollow = cfg.respect_nofollow
        aggressive = cfg.use_aggressive_extractors

        def _extract(it):
            return extract_pages_batch(
                it, respect_nofollow=respect_nofollow, aggressive=aggressive
            )

        extracted = (
            hits.select("url", "html")
            .mapInPandas(_extract, EXTRACTED_SCHEMA)
            .cache()
        )

        # ---- results rows ----
        res_meta = hits.select("url", "host", "warc_ts")
        results = (
            extracted.join(res_meta, on="url", how="inner")
            .select(
                "url",
                "host",
                F.lit(rnd).alias("fetched_round"),
                F.col("warc_ts").alias("fetched_at"),
                F.lit(200).alias("status"),
                F.create_map().cast("map<string,string>").alias("headers"),
                F.lit(None).cast("string").alias("redirect"),
                "format",
                "encoding",
                "had_decode_errors",
                "lang",
                "lang_confidence",
                "text",
                F.size("links").alias("n_links"),
            )
        )
        miss_results = misses.select(
            "url",
            "host",
            F.lit(rnd).alias("fetched_round"),
            F.lit(None).cast("timestamp").alias("fetched_at"),
            F.lit(404).alias("status"),
            F.create_map().cast("map<string,string>").alias("headers"),
            F.lit(None).cast("string").alias("redirect"),
            F.lit(None).cast("string").alias("format"),
            F.lit(None).cast("string").alias("encoding"),
            F.lit(None).cast("boolean").alias("had_decode_errors"),
            F.lit(None).cast("string").alias("lang"),
            F.lit(None).cast("double").alias("lang_confidence"),
            F.lit(None).cast("string").alias("text"),
            F.lit(0).alias("n_links"),
        )

        # ---- link expansion ----
        parent = admitted.select(
            F.col("url").alias("src"),
            F.col("host").alias("src_host"),
            *[F.col(c).alias(f"p_{c}") for c in DEPTH_COLS],
        )
        links = (
            extracted.select(F.col("url").alias("src"), F.explode("links").alias("l"))
            .filter(F.col("l.kind") != "data")
            .select("src", F.col("l.url").alias("url"))
            .join(parent, on="src", how="inner")
            .withColumn("host", origin_udf(F.col("url")))
            .filter(F.col("host").isNotNull())
        )
        links = links.cache()
        n_links = links.count()

        edges = links.select(
            "src", F.col("url").alias("dst"), F.lit("link").alias("kind"), F.lit(rnd).alias("round")
        )

        # depth advance (url_with_depth.rs:69-110) as column expressions
        same_host = F.col("host") == F.col("src_host")
        expanded = links.select(
            "url",
            "host",
            F.when(same_host, F.col("p_depth_on_website") + 1)
            .otherwise(F.lit(0))
            .cast("long")
            .alias("depth_on_website"),
            F.when(same_host, F.col("p_distance_to_seed"))
            .otherwise(F.col("p_distance_to_seed") + 1)
            .cast("long")
            .alias("distance_to_seed"),
            (F.col("p_total_distance_to_seed") + 1).cast("long").alias("total_distance_to_seed"),
        )

        # salted two-phase dedup to unique candidates w/ lowest depth
        candidates = aggregate_candidates(expanded)

        # ---- bloom-pruned anti-join vs seen (the core operator) ----
        new_urls = bloom_ops.prune_new_candidates(
            spark, candidates, seen, self._blooms, num_buckets=self.num_buckets
        ).cache()
        n_new = new_urls.count()

        # ---- state transitions for this round (batch MERGE) ----
        ok_updates = hits.select(
            "url",
            "host",
            F.lit(KIND_PROCESSED_AND_STORED).alias("kind"),
            F.lit(254).alias("last_significant_kind"),
            F.lit(False).alias("recrawl"),
            "is_seed",
            F.current_timestamp().alias("ts"),
            *DEPTH_COLS,
        )
        err_updates = misses.select(
            "url",
            "host",
            F.lit(KIND_INTERNAL_ERROR).alias("kind"),
            F.lit(254).alias("last_significant_kind"),
            F.lit(False).alias("recrawl"),
            "is_seed",
            F.current_timestamp().alias("ts"),
            *DEPTH_COLS,
        )
        new_seen = new_urls.select(
            "url",
            "host",
            F.lit(KIND_DISCOVERED).alias("kind"),
            F.lit(254).alias("last_significant_kind"),
            F.lit(False).alias("recrawl"),
            F.lit(False).alias("is_seed"),
            F.current_timestamp().alias("ts"),
            *DEPTH_COLS,
        )
        updates = ok_updates.unionByName(err_updates).unionByName(new_seen)
        seen_next = merge_seen(seen, updates)

        # ---- next frontier = deferred + newly discovered ----
        new_frontier = new_urls.select(
            "url",
            "host",
            F.lit(False).alias("is_seed"),
            F.lit(0).alias("age"),
            F.lit(False).alias("host_was_in_use"),
            *DEPTH_COLS,
            F.lit(rnd + 1).alias("enqueue_round"),
        )
        frontier_next = deferred.unionByName(new_frontier)

        n_ok = hits.count()
        n_err = misses.count()

        # ---- per-bucket metrics (per-partition lineage, north rule) ----
        bucket = F.pmod(F.xxhash64(F.col("host")), F.lit(self.num_buckets)).cast("int")
        wall = int((time.monotonic() - t0) * 1000)
        metrics = (
            fetched.withColumn("bucket", bucket)
            .groupBy("bucket")
            .agg(
                F.count("*").alias("admitted"),
                F.sum(F.when(F.col("html").isNotNull(), 1).otherwise(0)).alias("fetched_ok"),
                F.sum(F.when(F.col("html").isNull(), 1).otherwise(0)).alias("fetch_errors"),
            )
            .select(
                F.lit(rnd).alias("round"),
                "bucket",
                F.lit(n_polled).cast("long").alias("polled"),
                F.col("admitted").cast("long"),
                F.lit(n_deferred).cast("long").alias("deferred"),
                F.col("fetched_ok").cast("long"),
                F.col("fetch_errors").cast("long"),
                F.lit(n_links).cast("long").alias("links_extracted"),
                F.lit(n_new).cast("long").alias("new_urls"),
                F.lit(wall).cast("long").alias("wall_ms"),
            )
        )

        # ---- commit the round (one transaction on Iceberg) ----
        st = self.store
        st.write_snapshot("results", results.unionByName(miss_results), rnd)
        st.write_snapshot("edges", edges, rnd + 1)  # seed edges occupy r0
        st.write_snapshot("order", admission_log, rnd)
        st.write_snapshot("metrics", metrics, rnd)
        st.write_snapshot("seen", seen_next, rnd + 1, bucket_by="host")
        st.write_snapshot("frontier", frontier_next, rnd + 1, bucket_by="host")

        # incremental bloom maintenance: OR in this round's new URLs
        if n_new:
            self._or_blooms(
                bloom_ops.build_bloom(new_urls.select("url"), num_buckets=self.num_buckets)
            )

        for df in (sched, fetched, extracted, links, new_urls, seen):
            df.unpersist()

        return RoundStats(
            rnd, n_polled, n_admitted, n_deferred, n_ok, n_err, n_links, n_new, wall
        )

    # ------------------------------------------------------------------
    def run(self, seeds: list[str] | None = None, max_rounds: int | None = None) -> CrawlReport:
        """Full crawl: seed (unless resuming) then loop rounds until the
        frontier drains or max_rounds (worker-barrier analog,
        atra/src/app/atra.rs:340-386)."""
        if seeds is not None:
            self.seed(seeds)
            start = 0
        else:  # resume from checkpoint (RECOVER analog, app/atra.rs:179-199)
            start = self.store.latest_round("frontier") or 0
            if not self._blooms:
                seen = self.store.read_snapshot(self.spark, "seen")
                if seen is not None:
                    self._blooms = bloom_ops.build_bloom(
                        seen.select("url"), num_buckets=self.num_buckets
                    )
        report = CrawlReport()
        limit = max_rounds if max_rounds is not None else self.config.max_rounds
        for rnd in range(start, start + limit):
            frontier = self.store.read_snapshot(self.spark, "frontier")
            if frontier is None or frontier.limit(1).count() == 0:
                break
            report.rounds.append(self.run_round(rnd))
        return report
