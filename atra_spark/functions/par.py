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

from pyspark.sql import DataFrame


def fan_out(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's shuffle parallelism,
    only when the input has fewer partitions than that target."""
    target = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
