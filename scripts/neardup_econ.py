"""Measure the NearDupIndex probe economics on a growing history.

The index's claim (operators/neardup_index.py): probing a batch
against the admitted corpus costs O(batch) — point lookups into the
touched buckets with warm chain-prefix caches — never O(corpus). This
script grows the admitted history by a fixed batch per round and, per
round, times

  (a) probe_sec      — the index probe of a FIXED-size probe batch
                       against the current history (should stay ~flat
                       while history grows Nx), and
  (b) full_join_sec  — the counterfactual a non-indexed engine pays:
                       recompute the full history band relation from
                       the corpus and band-join the probe batch
                       against it (O(corpus) per batch, should grow
                       with history).

Both paths produce the identical flagged set (asserted each round).
The corpus is synthesized deterministically in-process — no external
data: every document's tokens derive from its integer id; a fixed
fraction are near-identical variants of earlier documents so probes
do real verification work.

Prints one JSON line per round plus a summary with the growth ratios
(probe_growth = probe_sec[last]/probe_sec[first] vs
history_growth = |history|[last]/|history|[first]).

Run: python scripts/neardup_econ.py [batch_docs] [rounds] [probe_docs]
     (defaults 25000 6 10000)
Env: ATRA_ECON_CORES (default 16).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from atra_spark.operators.neardup_index import NearDupIndex  # noqa: E402
from atra_spark.session import get_spark  # noqa: E402


def _corpus(spark, start: int, n: int):
    """Deterministic docs over ids [start, start+n): ids with
    id % 200 == 0 are near-identical variants of one of 50 shared
    templates (real near-dup clusters across batches, bounded size);
    the rest are unique — tokens are xxhash64-mixed so distinct ids
    essentially never share a shingle (a linear id->token formula
    makes ids congruent mod the modulus EXACT duplicates)."""
    base = spark.range(start, start + n).select(F.col("id").alias("doc_id"))
    words = F.concat_ws(
        " ",
        *[
            F.concat(
                F.lit(f"w{j}x"),
                F.pmod(F.xxhash64(F.col("doc_id"), F.lit(j)), F.lit(10**9)).cast(
                    "string"
                ),
            )
            for j in range(24)
        ],
    )
    template = F.concat(
        F.lit(
            "the quick brown fox jumps over the lazy dog while the band "
            "plays on and the crowd watches quietly from the old stone wall "
            "as the evening light fades slowly behind the distant hills "
        ),
        F.lit("verse "),
        (F.col("doc_id") % 50).cast("string"),
    )
    return base.select(
        "doc_id",
        F.when(F.col("doc_id") % 200 == 0, template).otherwise(words).alias("text"),
    )


def main() -> None:
    batch_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    probe_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000
    cores = int(os.environ.get("ATRA_ECON_CORES", "16"))
    spark = get_spark("neardup-econ", cores=cores, shuffle_partitions=32)

    root = tempfile.mkdtemp(prefix="neardup_econ")
    idx = NearDupIndex(os.path.join(root, "ndx"), num_buckets=32)

    # fixed probe batch, far outside every history id range
    probe = _corpus(spark, 10_000_000, probe_docs).localCheckpoint()

    lines = []
    history_parts = []
    for r in range(rounds):
        batch = _corpus(spark, r * batch_docs, batch_docs)
        idx.admit(batch, r)
        idx.commit()
        history_parts.append(batch)
        history_docs = (r + 1) * batch_docs

        # warm the chain caches the way a steady-state engine is warm
        # (one untimed probe), then time the served probe
        idx.probe(probe).count()
        t0 = time.monotonic()
        flagged_idx = idx.probe(probe)
        n_idx = flagged_idx.count()
        probe_sec = time.monotonic() - t0

        # counterfactual: band-join the probe against the FULL history
        # band relation recomputed from the corpus (what a non-indexed
        # engine re-pays every batch)
        hist = history_parts[0]
        for p in history_parts[1:]:
            hist = hist.unionByName(p)
        t0 = time.monotonic()
        hb = idx._band_rows(hist, "text", "doc_id")
        pb = idx._band_rows(probe, "text", "doc_id")
        hs = [f"h{i}" for i in range(idx.num_hashes)]
        n_eq = sum(
            F.when(F.col(f"p_{h}") == F.col(f"s_{h}"), 1).otherwise(0) for h in hs
        )
        joined = (
            pb.select(
                F.col("id").alias("pid"), "bkey",
                *[F.col(h).alias(f"p_{h}") for h in hs],
            )
            .join(
                hb.select(
                    F.col("id").alias("sid"), "bkey",
                    *[F.col(h).alias(f"s_{h}") for h in hs],
                ),
                on="bkey",
            )
            .select("pid", "sid", n_eq.alias("n_eq"))
            .filter(F.col("n_eq") >= 6)
            .select("pid")
            .distinct()
        )
        n_full = joined.count()
        full_join_sec = time.monotonic() - t0

        assert n_idx == n_full, (n_idx, n_full)
        line = {
            "round": r + 1,
            "history_docs": history_docs,
            "probe_docs": probe_docs,
            "flagged": n_idx,
            "probe_sec": round(probe_sec, 3),
            "full_join_sec": round(full_join_sec, 3),
        }
        lines.append(line)
        print(json.dumps(line), flush=True)

    summary = {
        "summary": True,
        "history_growth": round(
            lines[-1]["history_docs"] / lines[0]["history_docs"], 2
        ),
        "probe_growth": round(lines[-1]["probe_sec"] / lines[0]["probe_sec"], 2),
        "full_join_growth": round(
            lines[-1]["full_join_sec"] / lines[0]["full_join_sec"], 2
        ),
    }
    print(json.dumps(summary), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
