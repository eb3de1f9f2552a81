"""End-to-end training-corpus materialization — the composition a
user of the engine actually runs: dedup, quality gates, and benchmark
decontamination chained into one declarative plan, so Catalyst sees
the whole pipeline at once (filters reorder, scans prune, nothing
materializes between stages).

100 TB plan: every stage keeps its own documented scale shape — the
exact-dedup keeper check is one map-side-combined aggregation joined
back on the 60-bit hash, quality gates are pure column math fused
into the scan, and the decontamination gate is a broadcast
anti-semi-join against the (small) benchmark fingerprint hit list —
so the full pipeline costs two shuffles of narrow relations plus one
broadcast, never a corpus-wide wide-row shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import content_hash
from .textstats import decontamination_overlap


def materialize_corpus(
    df: DataFrame,
    eval_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 30,
    space_ratio_bounds: tuple[float, float] = (0.1, 0.3),
    decontam_min_shared: int = 2,
) -> DataFrame:
    """The training-corpus filter chain:

    1. EXACT DEDUP — keep a document iff it is the minimum-id holder
       of its content hash (whole-corpus duplicate collapse).
    2. QUALITY GATES — token count >= ``min_tokens`` and space ratio
       inside ``space_ratio_bounds`` (the cheap Gopher-style sanity
       cuts; callers chain more gates the same way).
    3. DECONTAMINATION — drop documents sharing >=
       ``decontam_min_shared`` winnowing fingerprints with ``eval_df``
       (skipped when ``eval_df`` is None).

    Returns the surviving rows of ``df`` (all original columns).
    """
    t = F.col(text_col)
    h = content_hash(t)

    # 1. dedup: min-id keeper per content hash
    keepers = (
        df.select(h.alias("_ch"), F.col(id_col))
        .groupBy("_ch")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    out = df.join(keepers, on=id_col, how="left_semi")

    # 2. quality gates (pure column predicates — fused into the scan)
    n_tok = F.size(F.split(F.trim(t), r"\s+"))
    no_space = F.length(F.regexp_replace(t, " ", ""))
    space_ratio = (F.length(t) - no_space) / F.greatest(F.length(t), F.lit(1))
    lo, hi = space_ratio_bounds
    out = out.filter(
        (n_tok >= int(min_tokens))
        & (space_ratio >= F.lit(float(lo)))
        & (space_ratio <= F.lit(float(hi)))
    )

    # 3. decontamination: anti-join the flagged id list (small by
    # construction — contaminated docs are rare)
    if eval_df is not None:
        flagged = decontamination_overlap(
            out, eval_df, text_col=text_col, id_col=id_col,
            min_shared=decontam_min_shared,
        ).select(F.col("id").alias(id_col))
        out = out.join(F.broadcast(flagged), on=id_col, how="left_anti")
    return out


def compose_corpus_fp(base, deltas):
    """Merge-on-read combiner for the persistent corpus-fingerprint
    table (fp, doc_id, first_round): membership fold — one row per fp,
    attributed to the minimum doc_id / minimum round that contributed
    it. Independent min aggregates are associative, so composing
    base+deltas in any grouping yields the same relation (same
    algebraic-fold posture as the seen-table combiner,
    operators/seen.py)."""
    dfs = ([base] if base is not None else []) + [d for _, d in deltas]
    u = dfs[0]
    for d in dfs[1:]:
        u = u.unionByName(d)
    return u.groupBy("fp").agg(
        F.min("doc_id").alias("doc_id"), F.min("first_round").alias("first_round")
    )


def incremental_ingest(
    spark,
    store,
    batch: DataFrame,
    round_no: int,
    eval_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    fp_table: str = "corpus_fp",
    compact_every: int = 8,
    **materialize_kwargs,
) -> DataFrame:
    """Ingest one NEW batch into a persistently-deduped corpus — the
    shape a 100 TB training set is actually built in (a crawl delivers
    batches over months; dedup must hold ACROSS batches without
    rescanning the corpus):

    1. run the in-batch :func:`materialize_corpus` chain (exact dedup
       within the batch, quality gates, optional decontamination);
    2. drop survivors whose content hash already exists in the
       store's fingerprint table — membership read is the composed
       merge-on-read view, ONE anti-join keyed on the 60-bit hash;
    3. commit the new fingerprints as an O(|batch|) DELTA
       (store.write_delta — never rewrites the corpus-wide table),
       compacting every ``compact_every`` batches like the engine's
       seen table.

    Returns the surviving batch rows (original columns). The
    fingerprint relation is (fp, doc_id, first_round) so provenance
    survives compaction.

    Scale posture: per-batch cost is O(|batch|) writes + one
    |batch|-vs-|corpus-fp| anti-join on a narrow (3-column) relation,
    the exact economics the crawl frontier uses
    (operators/frontier.py); at extreme corpus sizes the same
    bucket-partitioned SeenIndex upgrade applies (probe only the
    batch's hash buckets, operators/seen_index.py — the engine already
    ships that machinery).
    """
    store.register_combiner(fp_table, compose_corpus_fp)
    survivors = materialize_corpus(
        batch, eval_df=eval_df, text_col=text_col, id_col=id_col,
        **materialize_kwargs,
    ).withColumn("_fp", content_hash(F.col(text_col)))
    existing = store.read_snapshot(spark, fp_table)
    if existing is not None:
        survivors = survivors.join(
            existing.select(F.col("fp").alias("_fp")), on="_fp", how="left_anti"
        )
    # the delta write and the returned plan both consume `survivors`;
    # localCheckpoint materializes it once (un-forced plans recompute
    # per consumer — measured, see BENCH/BASELINE.md cache notes)
    survivors = survivors.localCheckpoint()
    fps = survivors.select(
        F.col("_fp").alias("fp"),
        F.col(id_col).alias("doc_id"),
        F.lit(int(round_no)).alias("first_round"),
    )
    store.write_delta(fp_table, fps, round_no)
    snaps = store._load_manifest(fp_table)["snapshots"]
    # count only deltas NEWER than the last base: stale delta entries
    # below a base are already folded into it and stay in the manifest
    # for time travel — counting them would trigger a full-table
    # compaction on EVERY batch after the first one (O(|corpus|)/batch)
    bases = [s["round"] for s in snaps if s.get("kind") != "delta"]
    last_base = max(bases) if bases else -(1 << 62)
    n_deltas = sum(
        1 for s in snaps if s.get("kind") == "delta" and s["round"] > last_base
    )
    if n_deltas >= int(compact_every):
        store.compact_table(spark, fp_table)
    return survivors.drop("_fp")
