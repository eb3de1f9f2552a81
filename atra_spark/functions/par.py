"""Scan-parallelism guard for map-only operators.

A map-only (zero-shuffle) plan inherits the SCAN's split count. At
corpus scale a table is thousands of splits and this helper is a
no-op; a small single-file input (one split under
``spark.sql.files.maxPartitionBytes``) would otherwise run the whole
per-row fold on one core. One round-robin exchange of the narrow
input relation is strictly less data movement than the explode +
groupBy spellings these operators replaced, which shuffled every
exploded shingle/gram/bigram.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

_OPEN_COST_DEFAULT = 4 * 1024 * 1024  # spark.sql.files.openCostInBytes default


def _size_bytes(v: str | None, default: int) -> int:
    """Parse a Spark byte-size conf value ("8m", "134217728", "1g")."""
    if not v:
        return default
    s = v.strip().lower()
    mult = 1
    for suf, m in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("b", 1)):
        if s.endswith(suf):
            s, mult = s[: -len(suf)], m
            break
    try:
        return int(float(s)) * mult
    except ValueError:
        return default


def _estimated_scan_partitions(df: DataFrame) -> int | None:
    """Estimate the scan's split count from its input files — Spark's
    own FilePartition packing formula, ceil((sizes + per-file open
    cost) / maxPartitionBytes) — WITHOUT materializing the physical
    plan: ``df.rdd.getNumPartitions()`` costs a full optimize +
    physical-planning pass of the subtree (~75 ms measured per call,
    round 6), paid once per operator invocation on top of the real
    query's own planning. Local-filesystem file scans only; anything
    else (non-file plans, remote filesystems) returns None and the
    caller falls back to the exact RDD count."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    conf = df.sparkSession.conf
    max_pb = _size_bytes(conf.get("spark.sql.files.maxPartitionBytes", None), 128 << 20)
    open_cost = _size_bytes(
        conf.get("spark.sql.files.openCostInBytes", None), _OPEN_COST_DEFAULT
    )
    total = 0
    for f in files:
        if f.startswith("file:"):
            path = f[len("file://"):] if f.startswith("file://") else f[len("file:"):]
        elif f.startswith("/"):
            path = f
        else:
            return None  # remote filesystem: no cheap size probe
        try:
            total += os.path.getsize(path) + open_cost
        except OSError:
            return None
    return max(1, -(-total // max_pb))


def fan_out(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's shuffle parallelism,
    only when the input has fewer partitions than that target."""
    try:
        target = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        # non-numeric platform values (e.g. "auto"): fall back to the
        # cluster's default parallelism (ADVICE r5)
        target = df.sparkSession.sparkContext.defaultParallelism
    current = _estimated_scan_partitions(df)
    if current is None:
        current = df.rdd.getNumPartitions()
    if current < target:
        return df.repartition(target)
    return df
