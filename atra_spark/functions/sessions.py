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
