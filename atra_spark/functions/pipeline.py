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
