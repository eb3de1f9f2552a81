"""VIEW / DUMP utilities over the checkpoint store (atra/src/app/
view.rs, app/dump.rs — the read-path tooling of §2.2).

The reference ships a CLI that inspects the RocksDB stores and dumps
tables/payloads; here the store is parquet snapshots, so viewing is a
DataFrame and dumping is a write — these helpers add the ergonomics:
time-travel selection, url/host filtering, table summaries (per-round
lineage), and jsonl/csv/parquet dumps.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.store import CheckpointStore

from ..sources.store import UNION_LOG_TABLES as _UNION_TABLES


def view_table(
    spark: SparkSession,
    store: CheckpointStore,
    table: str,
    round_no: int | None = None,
    url_like: str | None = None,
    host: str | None = None,
    limit: int | None = None,
) -> DataFrame:
    """A filtered view of one store table (view.rs list/show commands).

    Snapshot tables read the latest (or ``round_no``) snapshot;
    append-log tables read the union of all rounds. ``url_like`` is a
    SQL LIKE pattern; ``host`` an exact politeness-origin match."""
    if table in _UNION_TABLES and round_no is None:
        df = store.read_union(spark, table)
    else:
        df = store.read_snapshot(spark, table, round_no)
    if df is None:
        raise ValueError(f"table {table!r} has no snapshots")
    if url_like is not None and "url" in df.columns:
        df = df.filter(F.col("url").like(url_like))
    if host is not None and "host" in df.columns:
        df = df.filter(F.col("host") == host)
    if limit is not None:
        df = df.limit(limit)
    return df


def table_summary(store: CheckpointStore) -> list[dict]:
    """Per-table, per-round lineage summary (rows + path) from parquet
    footers — driver-side, no Spark job (view.rs 'stats')."""
    out = []
    for table in sorted(os.listdir(store.root)):
        manifest = store._load_manifest(table)
        for snap in manifest["snapshots"]:
            out.append(
                {
                    "table": table,
                    "round": snap["round"],
                    "rows": store.count_rows(table, snap["round"]),
                    "bucket_by": snap.get("bucket_by"),
                    "path": snap["path"],
                }
            )
    return out


def dump_table(
    spark: SparkSession,
    store: CheckpointStore,
    table: str,
    out_path: str,
    fmt: str = "jsonl",
    round_no: int | None = None,
    **view_kwargs,
) -> int:
    """Dump one table to jsonl / csv / parquet (app/dump.rs). Returns
    the row count. Binary columns are hex-encoded for text formats."""
    df = view_table(spark, store, table, round_no=round_no, **view_kwargs)
    if fmt in ("jsonl", "csv"):
        for name, dtype in df.dtypes:
            if dtype == "binary":
                df = df.withColumn(name, F.hex(F.col(name)))
            elif dtype.startswith("map<") or dtype.startswith("array<") or dtype.startswith("struct<"):
                if fmt == "csv":
                    df = df.withColumn(name, F.to_json(F.col(name)))
    n = df.count()
    if fmt == "jsonl":
        df.write.mode("overwrite").json(out_path)
    elif fmt == "csv":
        df.write.mode("overwrite").option("header", True).csv(out_path)
    elif fmt == "parquet":
        df.write.mode("overwrite").parquet(out_path)
    else:
        raise ValueError(f"unknown dump format {fmt!r}")
    return n
