"""Measure the seen-table commit AND read economics on a growing crawl.

VERDICT r2 "What's wrong" #2 asked for proof that the merge-on-read
redesign decoupled per-round seen-commit cost from |seen|: this
script runs a multi-round crawl on the bench corpus and times, per
round, (a) the DELTA commit the engine performs (O(|updates|)) and
(b) what the round-2 engine would have paid — composing the full seen
state and rewriting it as a base snapshot (O(|seen|)).

VERDICT r3 "What's wrong" #1 asked for the READ side too: the engine
now serves the dequeue state check from the bucketed SeenIndex
(point-lookup economics), never reading the composed seen table in
the round loop. Per round this script also times (c) the engine's
index-served state check on the current frontier and (d) the r3
counterfactual — filter_state against the composed seen TABLE — so
the output shows (d) growing with |seen| while (c) tracks |frontier|.

It prints one JSON line per round plus a summary correlation.

Run: python scripts/seen_delta_econ.py [n_pages] (default 50000)
Env: ATRA_ECON_CORES (default 16).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from atra_spark.config import CrawlConfig  # noqa: E402
from atra_spark.plans.crawl import CrawlEngine  # noqa: E402
from atra_spark.session import get_spark  # noqa: E402
from atra_spark.sources.store import CheckpointStore  # noqa: E402
from atra_spark.urlkit import NORMAL, UNBOUNDED_DISTANCE, Budget  # noqa: E402
import bench  # noqa: E402


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    cores = int(os.environ.get("ATRA_ECON_CORES", "16"))
    spark = get_spark("seen-econ", cores=cores, shuffle_partitions=32)
    paths = bench._bench_fixtures(n_pages)
    seeds = [
        r[0]
        for r in duckdb.sql(
            f"SELECT min(url) FROM read_parquet('{paths['pages']}') "
            "GROUP BY regexp_extract(url, '://([^/]+)', 1) ORDER BY 1"
        ).fetchall()
    ]
    config = CrawlConfig(
        default_budget=Budget(
            kind=NORMAL, depth_on_website=0, distance_to_seed=UNBOUNDED_DISTANCE
        ),
        delay_ms=1,
        round_budget_ms=60_000,
        max_rounds=10,
        seen_compact_every=0,  # keep the raw delta chain visible
        audit_tables=False,
    )
    store_root = tempfile.mkdtemp(
        prefix="atra_econ", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    scratch = tempfile.mkdtemp(
        prefix="atra_econ_rw", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    store = CheckpointStore(store_root, num_buckets=32)

    timings: dict[int, dict] = {}
    orig_delta = store.write_delta

    def timed_delta(table, df, round_no, **kw):
        if table != "seen":
            return orig_delta(table, df, round_no, **kw)
        t0 = time.monotonic()
        p = orig_delta(table, df, round_no, **kw)
        timings.setdefault(round_no, {})["delta_sec"] = round(time.monotonic() - t0, 2)
        return p

    store.write_delta = timed_delta
    eng = CrawlEngine(spark, store, config, paths["pages"], paths["robots"], num_buckets=32)
    eng.seed(seeds)
    rows = []
    try:
        rnd = 0
        while rnd < config.max_rounds:
            stats = eng.run_round(rnd)
            if stats.polled == 0:
                break
            committed = rnd + 1
            # the r2 counterfactual: compose the full state and rewrite
            # it as a base snapshot (what every round used to pay)
            rw_store = CheckpointStore(os.path.join(scratch, f"r{committed}"), num_buckets=32)
            composed = store.read_snapshot(spark, "seen", committed)
            seen_total = composed.count()
            t0 = time.monotonic()
            rw_store.write_snapshot("seen", composed, committed, bucket_by="host")
            full_rewrite_sec = round(time.monotonic() - t0, 2)
            delta_rows = 0
            snaps = store._load_manifest("seen")["snapshots"]
            for s in snaps:
                if s["round"] == committed and s.get("kind") == "delta":
                    import pyarrow.dataset as pads

                    delta_rows = pads.dataset(s["path"], format="parquet").count_rows()
            # READ-side economics: the engine's index-served state
            # check vs the r3 counterfactual (composed-table join),
            # both on the NEXT round's frontier
            from atra_spark.operators.frontier import filter_state, filter_state_indexed

            frontier_df = store.read_snapshot(spark, "frontier", committed)
            frontier_rows = frontier_df.count()
            t0 = time.monotonic()
            filter_state_indexed(frontier_df, eng.seen_index).count()
            index_read_sec = round(time.monotonic() - t0, 2)
            t0 = time.monotonic()
            filter_state(frontier_df, store.read_snapshot(spark, "seen", committed)).count()
            table_read_sec = round(time.monotonic() - t0, 2)
            row = {
                "round": committed,
                "seen_total": seen_total,
                "frontier_rows": frontier_rows,
                "delta_rows": delta_rows,
                "delta_write_sec": timings.get(committed, {}).get("delta_sec"),
                "full_rewrite_sec": full_rewrite_sec,
                "state_read_index_sec": index_read_sec,
                "state_read_table_sec": table_read_sec,
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
            rnd += 1
    finally:
        spark.stop()
        shutil.rmtree(store_root, ignore_errors=True)
        shutil.rmtree(scratch, ignore_errors=True)
    if len(rows) >= 3:
        first, last = rows[0], rows[-1]
        growth = last["seen_total"] / max(first["seen_total"], 1)
        delta_growth = (last["delta_write_sec"] or 0) / max(first["delta_write_sec"] or 1e-9, 1e-9)
        rewrite_growth = last["full_rewrite_sec"] / max(first["full_rewrite_sec"], 1e-9)
        idx_read_growth = last["state_read_index_sec"] / max(
            first["state_read_index_sec"], 1e-9
        )
        tbl_read_growth = last["state_read_table_sec"] / max(
            first["state_read_table_sec"], 1e-9
        )
        frontier_growth = last["frontier_rows"] / max(first["frontier_rows"], 1)
        print(
            json.dumps(
                {
                    "summary": {
                        "seen_growth_x": round(growth, 2),
                        "frontier_growth_x": round(frontier_growth, 2),
                        "delta_write_growth_x": round(delta_growth, 2),
                        "full_rewrite_growth_x": round(rewrite_growth, 2),
                        "state_read_index_growth_x": round(idx_read_growth, 2),
                        "state_read_table_growth_x": round(tbl_read_growth, 2),
                        "rounds": len(rows),
                    }
                }
            )
        )


if __name__ == "__main__":
    main()
