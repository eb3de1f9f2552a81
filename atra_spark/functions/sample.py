"""Deterministic corpus sampling for training-data pipelines.

Two samplers a 100 TB data pipeline actually runs:

- ``hash_sample``: stateless fraction sampling — keep a row iff the
  60-bit content hash of its key falls below ``fraction * 2^60``.
  ZERO shuffle (a pure filter pushed into the scan), reproducible
  across runs/engines (the hash is the engine-wide md5 prefix, so a
  SQL twin selects the identical rows), and composable: the same key
  always lands on the same side, so independently sampled tables stay
  join-consistent (the property random() sampling lacks).

- ``stratified_sample``: exactly-n-per-stratum quota sampling (e.g.
  20 documents per language), ordered by the same deterministic hash
  so the quota picks a stable pseudo-random subset. One shuffle on the
  stratum key. At 100 TB with mega-strata, pre-thin each stratum with
  ``hash_sample`` at a fraction comfortably above the quota before the
  window, so the per-stratum sort touches a bounded candidate set
  instead of the full stratum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import content_hash

_HASH_SPACE = 1 << 60


def hash_sample(df: DataFrame, fraction: float, key_col: str) -> DataFrame:
    """Deterministic fraction sample: rows whose 60-bit key hash <
    ``fraction * 2^60``. Pure filter — no shuffle, no state."""
    threshold = int(float(fraction) * _HASH_SPACE)
    return df.filter(content_hash(F.col(key_col).cast("string")) < F.lit(threshold))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    key_col: str,
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, picked by ascending
    (hash(key), key) — a stable pseudo-random quota per group."""
    h = content_hash(F.col(key_col).cast("string"))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= int(n_per_stratum))
        .drop("_rank")
    )


def temperature_mixing_weights(
    df: DataFrame, group_col: str = "source", tau: float = 2.0
) -> DataFrame:
    """Temperature-based data-mixing weights (the multilingual-sampling
    recipe: raise each group's natural share p to 1/tau and
    renormalize, so tau > 1 upweights rare sources and tau = 1 keeps
    the natural mix). Returns per group: document count, natural share,
    temperature-adjusted sampling share, and the upsample factor a
    loader applies.

    ONE corpus shuffle (the groupBy) whose group-level result is
    collected — group cardinality is sources/languages, i.e.
    driver-sized by definition of a mixing recipe; the per-group
    arithmetic then runs in plain Python, so the corpus is scanned
    exactly once. Shares are rounded half-up at 1e-6 with a 1e-7
    epsilon (tens of ulps at every representable magnitude of the
    scaled value) so the SQL twin's libm pow cannot drift the driver's
    value hash."""
    rows = df.groupBy(group_col).agg(F.count("*").alias("n_docs")).collect()
    total = float(sum(r["n_docs"] for r in rows)) or 1.0
    import math

    w = {r[group_col]: math.pow(r["n_docs"] / total, 1.0 / tau) for r in rows}
    z = sum(w.values()) or 1.0
    rnd = lambda v: math.floor(v * 1e6 + 0.5 + 1e-7) / 1e6
    out = [
        (
            r[group_col],
            r["n_docs"],
            rnd(r["n_docs"] / total),
            rnd(w[r[group_col]] / z),
            rnd((w[r[group_col]] / z) / (r["n_docs"] / total)),
        )
        for r in rows
    ]
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    schema = StructType(
        [
            StructField(group_col, df.schema[group_col].dataType, True),
            StructField("n_docs", LongType(), False),
            StructField("natural_share", DoubleType(), False),
            StructField("mix_share", DoubleType(), False),
            StructField("upsample_factor", DoubleType(), False),
        ]
    )
    return df.sparkSession.createDataFrame(out, schema)


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str = "doc_id",
    group_col: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — the
    Efraimidis–Spirakis A-Res scheme (Inf. Process. Lett. 97(5), 2006):
    each row draws u in (0,1) and competes with key ln(u)/w; the k
    LARGEST keys win, which is distribution-identical to sequential
    weighted draws without replacement. The draw is not random():
    u = (hash60(key) + 0.5) / 2^60, so the sample is reproducible
    across runs, engines (SQL twin draws the identical u), and — unlike
    rand(seed), whose stream is partition-indexed — across
    REPARTITIONINGS of the same table.

    This is the "sample a 2 T-token training mix from a 100 TB pool,
    upweighting by quality score" primitive. Scale shape: the key is
    map-only column math; global top-k compiles to
    TakeOrderedAndProject (per-partition bounded heap, driver merges
    k per partition — never a global sort, pinned by
    tests/test_sample.py); the per-group variant is one shuffle on
    ``group_col`` with the same bounded-heap window. Rows with
    weight <= 0 or NULL can never be drawn and are filtered out before
    the heap.

    Returns (key, group?, weight, ares_key) rows, ares_key rounded
    half-up at 6 dp for cross-engine value parity; selection order uses
    the UNROUNDED key with the row key as tiebreak.
    """
    u = (content_hash(F.col(key_col).cast("string")) + F.lit(0.5)) / F.lit(
        float(_HASH_SPACE)
    )
    w = F.col(weight_col).cast("double")
    key = F.log(u) / w
    eps_round = F.floor(key * 1e6 + F.lit(0.5) + F.lit(1e-7)) / 1e6
    scored = (
        df.filter(w.isNotNull() & (w > 0))
        .select(
            F.col(key_col),
            *([F.col(group_col)] if group_col else []),
            w.alias("weight"),
            key.alias("_k"),
            eps_round.alias("ares_key"),
        )
    )
    if group_col is None:
        picked = scored.orderBy(F.col("_k").desc(), F.col(key_col).asc()).limit(int(k))
    else:
        win = Window.partitionBy(group_col).orderBy(
            F.col("_k").desc(), F.col(key_col).asc()
        )
        picked = (
            scored.withColumn("_rn", F.row_number().over(win))
            .filter(F.col("_rn") <= int(k))
            .drop("_rn")
        )
    return picked.drop("_k")
