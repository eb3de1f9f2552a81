"""SeenIndex: the persistent bucket-partitioned seen-set membership
index (bloom probe + exact URL confirm, operators/seen_index.py).

Contract under test (the RocksDB point-lookup analog,
atra/src/recrawl_management/mod.rs:62 + link_state/db.rs):
- prune_new(candidates) == candidates LEFT ANTI JOIN seen (exact, no
  bloom false positives leak through: every bloom hit is confirmed
  against the bucket's URL delta chain)
- incremental: each round appends ONE delta per touched bucket; the
  bloom bitmap is rewritten only for touched buckets; nothing is ever
  rebuilt from scratch in the normal path
- persistent: a fresh SeenIndex over the same directory serves the
  same answers (resume contract)
- plan shape: the probe plan contains NO BroadcastExchange and no
  join against the seen table — one exchange on the bucket column
  feeding a single mapInPandas
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from atra_spark.operators.seen_index import SeenIndex


def _urls_df(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def _cands_df(spark, urls):
    return spark.createDataFrame(
        [(u, f"h{i % 3}.example", i % 4, i % 5, i) for i, u in enumerate(urls)],
        "url string, host string, depth_on_website long, "
        "distance_to_seed long, total_distance_to_seed long",
    )


SEEN = [f"https://s{i}.example/p{j}" for i in range(7) for j in range(40)]
NEW = [f"https://n{i}.example/q{j}" for i in range(5) for j in range(30)]


class TestSeenIndexCorrectness:
    def test_prune_matches_exact_antijoin(self, spark, tmp_path):
        idx = SeenIndex(str(tmp_path / "si"), num_buckets=8, bloom_bits=1 << 14)
        idx.add_urls(_urls_df(spark, SEEN), 0)
        idx.commit()
        cands = _cands_df(spark, SEEN[::3] + NEW)  # mix seen + new
        got = sorted(r["url"] for r in idx.prune_new(cands).collect())
        assert got == sorted(NEW)
        # full candidate row survives untouched
        row = idx.prune_new(cands).filter(F.col("url") == NEW[0]).collect()[0]
        assert row["host"].endswith(".example") and row["total_distance_to_seed"] >= 0

    def test_no_false_positive_leaks_with_tiny_bloom(self, spark, tmp_path):
        """A deliberately undersized bloom (64 bits/bucket for 280
        URLs) makes almost every probe a 'maybe' — the exact confirm
        must still yield a perfect anti-join."""
        idx = SeenIndex(str(tmp_path / "si"), num_buckets=4, bloom_bits=64)
        idx.add_urls(_urls_df(spark, SEEN), 0)
        idx.commit()
        got = sorted(r["url"] for r in idx.prune_new(_cands_df(spark, SEEN + NEW)).collect())
        assert got == sorted(NEW)

    def test_incremental_rounds_and_persistence(self, spark, tmp_path):
        root = str(tmp_path / "si")
        idx = SeenIndex(root, num_buckets=8, bloom_bits=1 << 14)
        idx.add_urls(_urls_df(spark, SEEN[:100]), 0)
        idx.commit()
        idx.add_urls(_urls_df(spark, SEEN[100:]), 1)
        idx.commit()
        # fresh instance over the same dir (resume)
        idx2 = SeenIndex(root, num_buckets=8, bloom_bits=1 << 14)
        assert idx2.committed_round == 1
        got = sorted(r["url"] for r in idx2.prune_new(_cands_df(spark, SEEN + NEW)).collect())
        assert got == sorted(NEW)

    def test_uncommitted_round_is_invisible(self, spark, tmp_path):
        """A crashed round (files written, manifest not committed) must
        not drop candidates: probes serve the last committed manifest."""
        idx = SeenIndex(str(tmp_path / "si"), num_buckets=4, bloom_bits=1 << 12)
        idx.add_urls(_urls_df(spark, SEEN[:50]), 0)
        idx.commit()
        idx.add_urls(_urls_df(spark, SEEN[50:100]), 1)  # NOT committed
        got = {r["url"] for r in idx.prune_new(_cands_df(spark, SEEN[:100])).collect()}
        assert got == set(SEEN[50:100])

    def test_geometry_mismatch_raises(self, tmp_path, spark):
        root = str(tmp_path / "si")
        idx = SeenIndex(root, num_buckets=4, bloom_bits=1 << 12)
        idx.add_urls(_urls_df(spark, SEEN[:10]), 0)
        idx.commit()
        with pytest.raises(ValueError, match="geometry"):
            SeenIndex(root, num_buckets=4, bloom_bits=1 << 13)


class TestSeenIndexIncrementality:
    def test_delta_files_per_round_not_per_corpus(self, spark, tmp_path):
        """The write cost of round N is proportional to round N's new
        URLs, not |seen| (VERDICT r2 'What's wrong' #2): each round
        adds at most one delta file per touched bucket and rewrites
        only touched buckets' bitmaps."""
        root = str(tmp_path / "si")
        idx = SeenIndex(root, num_buckets=4, bloom_bits=1 << 14)
        idx.add_urls(_urls_df(spark, SEEN), 0)
        idx.commit()

        def _snapshot():
            out = {}
            for d in os.listdir(root):
                if d.startswith("bucket="):
                    p = os.path.join(root, d)
                    out[d] = sorted(os.listdir(p))
            return out

        before = _snapshot()
        # a round that touches exactly one URL -> exactly one bucket
        idx.add_urls(_urls_df(spark, ["https://lonely.example/x"]), 1)
        idx.commit()
        after = _snapshot()
        changed = [b for b in after if after[b] != before.get(b, [])]
        assert len(changed) == 1  # one bucket touched
        new_files = set(after[changed[0]]) - set(before[changed[0]])
        assert {f.split(".")[-1] for f in new_files} == {"bin", "parquet"}
        # untouched buckets: byte-identical file lists (no rewrite)
        for b in after:
            if b != changed[0]:
                assert after[b] == before[b]

    def test_compaction_merges_chain_and_keeps_answers(self, spark, tmp_path):
        root = str(tmp_path / "si")
        idx = SeenIndex(root, num_buckets=4, bloom_bits=1 << 14)
        for rnd in range(4):
            idx.add_urls(_urls_df(spark, SEEN[rnd * 70 : (rnd + 1) * 70]), rnd)
            idx.commit()
        idx.compact()
        for b, ent in idx._manifest["buckets"].items():
            assert len(ent["deltas"]) == 1  # chain merged
        got = sorted(r["url"] for r in idx.prune_new(_cands_df(spark, SEEN + NEW)).collect())
        assert got == sorted(NEW)


class TestSeenIndexPlanShape:
    def test_no_broadcast_no_seen_side_join(self, spark, tmp_path):
        """VERDICT r2 item 4 'done' criterion: the probe plan must not
        broadcast bitmaps (no BroadcastExchange at all) and must not
        join/shuffle a seen relation — one exchange on the bucket
        column into one mapInPandas."""
        idx = SeenIndex(str(tmp_path / "si"), num_buckets=8, bloom_bits=1 << 14)
        idx.add_urls(_urls_df(spark, SEEN), 0)
        idx.commit()
        plan = idx.prune_new(_cands_df(spark, NEW))._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" not in plan
        assert "Join" not in plan
        assert plan.count("Exchange") == 1
        assert "MapInPandas" in plan

    def test_driver_holds_no_bitmaps(self, spark, tmp_path):
        """Driver residency is file NAMES only, never bitmap bytes."""
        idx = SeenIndex(str(tmp_path / "si"), num_buckets=8, bloom_bits=1 << 14)
        idx.add_urls(_urls_df(spark, SEEN), 0)
        idx.commit()
        import json

        # the whole manifest (the only driver-side state) is tiny
        blob = json.dumps(idx._manifest)
        assert len(blob) < 8192
        assert "bloom_r" in blob and ".parquet" in blob


class TestFormatMigration:
    def test_old_format_dir_auto_resets_for_rebuild(self, spark, tmp_path):
        """An index directory written by an older engine version (format
        != current) must not crash resume: the constructor drops the
        stale cache so committed_round is None and the engine's resume
        path rebuilds from the committed seen table."""
        import json
        import os

        root = str(tmp_path / "si")
        idx = SeenIndex(root, num_buckets=4, bloom_bits=1 << 12)
        idx.add_urls(_urls_df(spark, SEEN[:20]), 0)
        idx.commit()
        # simulate the older on-disk format
        with open(os.path.join(root, "manifest.json")) as f:
            m = json.load(f)
        m["format"] = 1
        with open(os.path.join(root, "manifest.json"), "w") as f:
            json.dump(m, f)
        idx2 = SeenIndex(root, num_buckets=4, bloom_bits=1 << 12)
        assert idx2.committed_round is None  # engine will rebuild()
        idx2.rebuild(_urls_df(spark, SEEN[:20]), 0)
        got = sorted(r["url"] for r in idx2.prune_new(_cands_df(spark, SEEN[:40])).collect())
        assert got == sorted(SEEN[20:40])
