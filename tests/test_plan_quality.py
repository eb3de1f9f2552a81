"""Physical-plan regression tests — the 100 TB posture, enforced.

These assert properties of the .explain output, not results: the
fetch join must broadcast and prune columns, scan filters must push
to parquet, the admission pipeline must stay JVM-side with exactly
one host exchange, and the candidate aggregation must keep its
two-phase (salted) shape.
"""

import contextlib
import io
import re

import pytest
from pyspark.sql import functions as F


def _plan(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def pages(spark, fixture_paths):
    return spark.read.parquet(fixture_paths["pages"])


class TestFetchJoinPlan:
    def test_broadcast_and_pruned_scan(self, spark, pages):
        admitted = spark.range(10).select(
            F.concat(F.lit("https://host0000.example/p"), F.col("id")).alias("url")
        )
        df = pages.select("url", "warc_ts", "html").join(
            F.broadcast(admitted), on="url", how="inner"
        )
        plan = _plan(df)
        assert "BroadcastHashJoin" in plan, "page payloads must never shuffle"
        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        assert m and set(c.split(":")[0] for c in m.group(1).split(",")) == {
            "url", "warc_ts", "html"
        }, "pages scan must be column-pruned"


class TestScanPushdown:
    def test_url_prefix_filter_pushed(self, spark, pages):
        plan = _plan(pages.filter(F.col("url").startswith("https://mega")).select("url"))
        m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
        assert m and "StringStartsWith" in m.group(1)


class TestAdmissionPlan:
    def test_jvm_only_single_exchange(self, spark):
        from atra_spark.config import CrawlConfig
        from atra_spark.operators.frontier import filter_budget
        from atra_spark.operators.politeness import admit_window

        fr = spark.createDataFrame(
            [("https://h/x", "h", False, 0, False, 1, 0, 1, 0)],
            "url string, host string, is_seed boolean, age int, host_was_in_use boolean, "
            "depth_on_website long, distance_to_seed long, total_distance_to_seed long, enqueue_round int",
        )
        df = admit_window(filter_budget(fr, CrawlConfig()), None)
        simple = _plan(df, "simple")
        assert simple.count("Exchange") == 1, "one host-hash shuffle, no more"
        plan = _plan(df)
        assert "Window" in plan
        # no Python evaluation nodes (ArrowEval/BatchEval) in the hot path
        assert "EvalPython" not in plan
        # budget bounds constant-folded into a plain Filter
        assert re.search(r"depth_on_website#\d+L < 3", plan)


class TestCandidateAggPlan:
    def test_default_single_exchange_with_mapside_combine(self, spark):
        from atra_spark.operators.seen import aggregate_candidates

        df = spark.createDataFrame(
            [("https://h/x", "h", 1, 1, 1)],
            "url string, host string, depth_on_website long, distance_to_seed long, total_distance_to_seed long",
        )
        plan = _plan(aggregate_candidates(df), "simple")
        # algebraic min: partial HashAggregate (map-side hot-key
        # combine) + final — exactly ONE exchange, no salt layer
        assert plan.count("HashAggregate") == 2
        assert plan.count("Exchange") == 1

    def test_salted_two_phase_available(self, spark):
        from atra_spark.operators.seen import aggregate_candidates

        df = spark.createDataFrame(
            [("https://h/x", "h", 1, 1, 1)],
            "url string, host string, depth_on_website long, distance_to_seed long, total_distance_to_seed long",
        )
        plan = _plan(aggregate_candidates(df, num_salts=8), "simple")
        # explicit salt layer (for holistic aggs): two aggregation
        # levels, each with its own partial/final pair
        assert plan.count("HashAggregate") >= 4


class TestBloomPrunePlan:
    def test_anti_join_only_on_maybe_side(self, spark):
        from atra_spark.operators import bloom as bloom_ops

        seen = spark.range(100).select(F.concat(F.lit("u"), F.col("id")).alias("url"))
        cands = spark.range(50, 150).select(F.concat(F.lit("u"), F.col("id")).alias("url"))
        blooms = bloom_ops.build_bloom(seen, num_buckets=4)
        pruned = bloom_ops.prune_new_candidates(spark, cands, seen, blooms, num_buckets=4)
        plan = _plan(pruned, "simple")
        assert "LeftAnti" in plan
        # the bloom probe gates the anti-join input (ArrowEval on the
        # candidate side before the join)
        assert "EvalPython" in plan or "ArrowEval" in plan
