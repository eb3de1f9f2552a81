"""Gap-based sessionization over the event stream.

The reference's crawl loop tracks per-origin activity windows (domain
last-access bookkeeping, ``atra/src/queue`` polling + the politeness
guard's last-fetch state); sessionization is the analytics twin of
that state: group a (user, timestamped-event) stream into sessions
separated by more than ``gap`` of inactivity.

Spark-first design: this is exactly what the built-in
``session_window`` aggregation exists for — a merging window keyed on
(user, window) where a session's end extends to last_event + gap and
an event merges iff its ts <= current session end (INCLUSIVE bound —
an event at exactly last_ts + gap still merges; pinned by test).
No lag/cumsum window chain, no Python; Catalyst plans it as ONE
shuffle keyed on the user id with map-side partial merge of session
fragments (the UpdatingSessionsExec pattern), and the same code runs
unchanged under Structured Streaming with a watermark (the engine's
streaming ingest, ``streaming/ingest.py``, feeds the identical
schema).

100 TB posture: one exchange on user_id; session fragments pre-merge
map-side so hot users cost bounded shuffle bytes; aggregates are
algebraic (count/sum/min/max). Skewed single-user floods are the AQE
skew-join/agg case and split cleanly because fragments merge
associatively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# microsecond-precision formatter — TIMESTAMP_NTZ-safe in both engines
# (unix_millis & friends reject NTZ; strings compare exactly)
TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-session rollup: (user_id, session_start, session_end_ts,
    n_events, sum_value) where sessions split after ``gap`` of
    inactivity. session_start/end_ts are the first/last EVENT
    timestamps (formatted to microseconds), not the padded window end,
    so the result is gap-parameter-independent and oracle-comparable.
    """
    return (
        events.groupBy(
            F.col(user_col).alias("user_id"),
            F.session_window(F.col(ts_col), gap).alias("sw"),
        )
        .agg(
            F.date_format(F.min(ts_col), TS_FMT).alias("session_start"),
            F.date_format(F.max(ts_col), TS_FMT).alias("session_end_ts"),
            F.count("*").alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
        .drop("sw")
    )


def sessionize_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming twin of :func:`sessionize` — the IDENTICAL aggregation
    after a watermark. In append mode each session is emitted exactly
    once, when the watermark passes its (end + gap) bound so no later
    event can still merge into it; session fragments live in the state
    store between micro-batches (pinned by the cross-batch merge test).
    Late events inside the watermark re-open their session; events
    older than the watermark are dropped — the same late/dup posture as
    the ingest stream (streaming/ingest.py).
    """
    return sessionize(
        events.withWatermark(ts_col, watermark), gap, user_col, ts_col, value_col
    )


def window_rollup(
    events: DataFrame,
    duration: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window rollup: (window_start, key, n_events,
    sum_value) per fixed ``duration`` bucket — the fleet-metrics
    aggregation the reference logs per crawl round (counters per
    interval), generalized to any event stream.

    Uses the built-in ``window()`` tumbling bucketing (pure column
    math — each event maps to exactly one bucket, NO session state),
    so it plans as one map-side-combined HashAggregate + one exchange
    keyed on (bucket, key). Runs unchanged under Structured Streaming
    with a watermark, same as :func:`sessionize_stream`.
    """
    return (
        events.groupBy(
            F.window(F.col(ts_col), duration).alias("w"),
            F.col(key_col).alias("key"),
        )
        .agg(F.count("*").alias("n_events"), F.sum(value_col).alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), TS_FMT).alias("window_start"),
            "key",
            "n_events",
            "sum_value",
        )
    )


def value_percentiles(
    events: DataFrame,
    percentiles: tuple[float, ...] = (0.5, 0.95, 0.99),
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """EXACT linear-interpolation percentiles of ``value_col`` per key
    (p50/p95/p99 by default) — the latency/size-distribution summary a
    crawl operator reads per host class. Uses the built-in exact
    ``percentile`` aggregate (same interpolation as SQL-standard
    PERCENTILE_CONT), not approx_percentile, so an oracle can match it
    bit-for-bit.

    Scale note: exact percentiles are holistic — the agg buffers all
    values per (key) group. That is the right trade for LOW-cardinality
    keys (event types, status classes, host tiers: each group's values
    fit an executor). For high-cardinality keys switch to
    approx_percentile (t-digest, algebraic, map-side combined) and
    accept the documented error bound; both are one exchange.
    """
    pcts = list(percentiles)
    # round, not int(): float representation makes int(0.29*100) == 28
    cols = [
        F.expr(f"percentile({value_col}, {p})").alias(f"p{round(p * 100)}")
        for p in pcts
    ]
    return events.groupBy(F.col(key_col).alias("key")).agg(*cols)


def recrawl_priority(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Freshness-driven recrawl priority per key (host analog) — the
    adaptive companion to the engine's fixed recrawl cooldown
    (plans/recover.py, SURVEY §2.8 recrawl re-trigger): estimate each
    key's change cadence from its observed event history and score how
    many cadence intervals it has gone unseen.

        avg_gap   = (last_seen - first_seen) / (n_events - 1)
        staleness = (corpus_max_ts - last_seen) / avg_gap

    A key that updates hourly and is 5 hours stale scores 5; a daily
    key 5 hours stale scores ~0.2 — crawl the first. Keys with < 2
    events or a zero observed span carry no cadence estimate and are
    excluded (the caller's cold-start policy owns them).

    Timestamps are reduced to SECOND resolution before arithmetic,
    built from tz-FREE field extraction (unix_date of the date part +
    hour/minute/second): TIMESTAMP_NTZ cannot cast to epoch in Spark,
    and a date_format->unix_timestamp round-trip would re-interpret
    the wall clock in the SESSION timezone — a DST-transition span
    would skew gaps by ±3600 s and diverge from the oracle's tz-free
    epoch(). Field arithmetic is wall-clock-as-UTC in every session.
    All algebraic aggregates: ONE map-side-combined shuffle on the
    key; the corpus max derives from the per-key aggregate (#keys
    rows), never a second scan of the event stream. Output
    cardinality = #keys.

    Returns (key, n_events, avg_gap_s, staleness) rounded to 6dp.
    """
    t = F.col(ts_col)
    ts_s = (
        F.unix_date(t.cast("date")) * 86400
        + F.hour(t) * 3600
        + F.minute(t) * 60
        + F.second(t)
    ).cast("long")
    grouped = (
        events.select(F.col(key_col).alias("key"), ts_s.alias("s"))
        .groupBy("key")
        .agg(
            F.count("*").alias("n_events"),
            F.min("s").alias("first_s"),
            F.max("s").alias("last_s"),
        )
        # two consumers (per_key + corpus max) and Spark has no
        # auto-CSE across them: materialize the #keys-row aggregate
        # once so the event scan never runs twice
        .localCheckpoint()
    )
    per_key = grouped.filter(
        (F.col("n_events") >= 2) & (F.col("last_s") > F.col("first_s"))
    )
    corpus_max = grouped.agg(F.max("last_s").alias("max_s"))
    gap = (F.col("last_s") - F.col("first_s")) / (F.col("n_events") - 1)
    rnd6 = lambda c: F.floor(c * 1000000 + 0.5 + 1e-6).cast("double") / 1000000  # noqa: E731
    return (
        per_key.crossJoin(F.broadcast(corpus_max))
        .select(
            "key",
            "n_events",
            rnd6(gap).alias("avg_gap_s"),
            rnd6((F.col("max_s") - F.col("last_s")) / gap).alias("staleness"),
        )
    )
