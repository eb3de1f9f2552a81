"""Stateful streaming politeness: the batch round loop's per-host
crawl-delay admission (operators/politeness.py) re-expressed as a
custom stateful streaming operator with ``applyInPandasWithState``.

Semantics (deterministic, event-time based): per host, fetches are
admitted only if at least ``crawl_delay_ms`` of event time has passed
since the last ADMITTED fetch of that host — the per-origin exclusive
guard + delay interval of the reference (url guard + crawl-delay,
atra/src/url/guard/entry.rs + crawl behavior in crawler.rs:653-704),
carried as per-group state that survives micro-batches and restarts
(checkpointed by Structured Streaming).

Scale posture: state is one long per host, partitioned by the group
key — the same host-keyed layout as every other politeness structure
in the engine; a mega-host costs one state row, not one per URL.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

THROTTLE_OUT_SCHEMA = (
    "url string, host string, warc_ts timestamp, admitted boolean"
)
THROTTLE_STATE_SCHEMA = "last_admit_ms long"


def throttle_hosts(pages: DataFrame, crawl_delay_ms: int = 1000) -> DataFrame:
    """Per-host event-time rate limit over a streaming pages feed.

    Input must carry (url, host, warc_ts). Output adds ``admitted``;
    rejected rows are emitted (not dropped) so a downstream requeue can
    age them, mirroring the batch scheduler's deferred branch.
    """

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        last: int | None = state.get[0] if state.exists else None
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(["warc_ts", "url"]).reset_index(drop=True)
            admitted = []
            for ts in zip(pdf["warc_ts"], pdf["url"]):
                ts_ms = int(ts[0].value // 1_000_000)
                ok = last is None or ts_ms >= last + crawl_delay_ms
                if ok:
                    last = ts_ms
                admitted.append(ok)
            out = pdf[["url", "host", "warc_ts"]].copy()
            out["admitted"] = admitted
            yield out
        if last is not None:
            state.update((last,))

    return pages.groupBy("host").applyInPandasWithState(
        fn,
        THROTTLE_OUT_SCHEMA,
        THROTTLE_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
