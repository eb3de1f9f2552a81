"""Checkpoint store: snapshots, time travel, append-log union."""

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
