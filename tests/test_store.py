"""Checkpoint store: snapshots, time travel, append-log union."""

import pytest

from atra_spark.sources.store import CheckpointStore


def test_snapshot_roundtrip_and_time_travel(spark, tmp_path):
    store = CheckpointStore(str(tmp_path), num_buckets=4)
    df0 = spark.createDataFrame([("a", 1)], "k string, v int")
    df1 = spark.createDataFrame([("b", 2)], "k string, v int")
    store.write_snapshot("t", df0, 0)
    store.write_snapshot("t", df1, 1)
    assert store.latest_round("t") == 1
    assert store.read_snapshot(spark, "t").collect()[0]["k"] == "b"
    assert store.read_snapshot(spark, "t", 0).collect()[0]["k"] == "a"  # time travel
    assert store.read_snapshot(spark, "t", 7) is None


def test_union_reads_all_snapshots(spark, tmp_path):
    store = CheckpointStore(str(tmp_path), num_buckets=4)
    for i in range(3):
        store.write_snapshot("log", spark.createDataFrame([(i,)], "v int"), i)
    assert sorted(r["v"] for r in store.read_union(spark, "log").collect()) == [0, 1, 2]


def test_missing_table(spark, tmp_path):
    store = CheckpointStore(str(tmp_path))
    assert store.read_snapshot(spark, "nope") is None
    assert store.latest_round("nope") is None


def test_overwrite_same_round_is_idempotent(spark, tmp_path):
    store = CheckpointStore(str(tmp_path), num_buckets=4)
    store.write_snapshot("t", spark.createDataFrame([(1,)], "v int"), 0)
    store.write_snapshot("t", spark.createDataFrame([(2,)], "v int"), 0)
    rows = store.read_snapshot(spark, "t").collect()
    assert [r["v"] for r in rows] == [2]
    assert store.latest_round("t") == 0


def test_bucketed_write(spark, tmp_path):
    store = CheckpointStore(str(tmp_path), num_buckets=4)
    df = spark.range(100).selectExpr("concat('h', id % 10) as host", "id as v")
    store.write_snapshot("b", df, 0, bucket_by="host")
    assert store.read_snapshot(spark, "b").count() == 100


class TestViewDump:
    """VIEW/DUMP tooling over the store (app/view.rs, app/dump.rs)."""

    @pytest.fixture(scope="class")
    def filled(self, spark, tmp_path_factory):
        from atra_spark.plans.view import dump_table, table_summary, view_table

        store = CheckpointStore(str(tmp_path_factory.mktemp("vd")), num_buckets=4)
        rows = [
            ("https://a.example/1", "a.example", 200),
            ("https://a.example/2", "a.example", 404),
            ("https://b.example/1", "b.example", 200),
        ]
        df = spark.createDataFrame(rows, "url string, host string, status int")
        store.write_snapshot("results", df, 0)
        store.write_snapshot("results", df.filter("status = 200"), 1)
        return store

    def test_view_filters(self, spark, filled):
        from atra_spark.plans.view import view_table

        assert view_table(spark, filled, "results").count() == 5  # union of rounds
        assert view_table(spark, filled, "results", round_no=1).count() == 2
        got = view_table(spark, filled, "results", host="a.example").count()
        assert got == 3
        assert view_table(spark, filled, "results", url_like="%/1").count() == 4
        with pytest.raises(ValueError):
            view_table(spark, filled, "nope")

    def test_summary_lineage(self, filled):
        from atra_spark.plans.view import table_summary

        s = table_summary(filled)
        by_round = {(e["table"], e["round"]): e["rows"] for e in s}
        assert by_round[("results", 0)] == 3 and by_round[("results", 1)] == 2

    def test_dump_jsonl_and_csv(self, spark, filled, tmp_path):
        import json
        import os

        from atra_spark.plans.view import dump_table

        n = dump_table(spark, filled, "results", str(tmp_path / "r.jsonl"), "jsonl", round_no=0)
        assert n == 3
        lines = []
        for f in os.listdir(tmp_path / "r.jsonl"):
            if f.startswith("part-"):
                lines += open(tmp_path / "r.jsonl" / f).read().splitlines()
        assert len(lines) == 3 and json.loads(lines[0])["url"].startswith("https://")
        n2 = dump_table(spark, filled, "results", str(tmp_path / "r.csv"), "csv", round_no=1)
        assert n2 == 2
