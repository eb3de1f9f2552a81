"""Web-text corpus admission filters: Gopher document-quality rules,
C4 line-level filtering, cross-document paragraph dedup, and a
hashed-linear quality scorer.

These are the document-admission stages every large web-text training
pipeline runs right after extraction (C4 — Raffel et al. 2020 §2.2;
Gopher — Rae et al. 2021 appendix A; Dolma's paragraph dedup). The
reference stops at extraction + per-page handling (SURVEY.md §2.7), so
like the dedup/scrub families these are "beyond the reference"
first-class ops. All four are designed for the 100 TB posture:

- ``gopher_quality`` and ``c4_line_filter`` are pure JVM column
  expressions (split / filter / aggregate over higher-order array
  lambdas inside whole-stage codegen) — zero Python, ZERO SHUFFLE:
  they pipeline into whatever scan feeds them, and the keep-flag
  predicate pushes into the next stage's filter.
- ``paragraph_dedup`` is the newline analog of dedup.chunk_dedup:
  winner election is one map-side-combined HashAggregate shuffle on
  the 60-bit paragraph hash (packed bigint pos key, same rationale as
  chunk_dedup's), the keep-join reuses that exchange under AQE, and
  reassembly is one groupBy(doc). Hot boilerplate paragraphs skew
  onto their hash key but min() is algebraic, so map-side partial
  aggregation absorbs them before the wire.
- ``hashed_linear_score`` demonstrates the classifier-scoring
  plumbing (CCNet / DCLM quality models): the hashing trick means NO
  vocabulary table is broadcast — the weight is derived from the
  token hash itself, so scoring is map-only. A real trained model
  swaps the hash-derived weight for a broadcast ``token -> weight``
  map join; the plan shape is identical.

Rule constants follow the published papers; thresholds are
parameters so a pipeline can tighten them per source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import content_hash

# Gopher appendix A's "must contain at least two of" stop words.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

# C4 drops any line mentioning javascript and any page with these.
C4_PAGE_BLOCK_PHRASES = ("lorem ipsum",)
C4_LINE_TERMINALS = (".", "!", "?", '"')


def _half_up(col: F.Column, dp: int) -> F.Column:
    """HALF_UP rounding identical to the DuckDB oracle's ``_rnd``
    (shared floor(x*scale + 0.5 + 1e-6) formula — Spark's round()
    and DuckDB's round() disagree at exact .5 ties)."""
    scale = 10 ** dp
    return F.floor(col * scale + F.lit(0.5 + 1e-6)).cast("double") / scale


def _words(text_col: str) -> F.Column:
    """Non-empty lowercase whitespace tokens (the corpus-wide token
    convention: split(lower(trim(text)), '\\s+') minus empties)."""
    return F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: t != F.lit(""),
    )


def _nonblank_lines(text_col: str) -> F.Column:
    return F.filter(
        F.split(F.col(text_col), "\n"), lambda l: F.trim(l) != F.lit("")
    )


def _char_count(text_col: str, ch: str) -> F.Column:
    # char-count via length difference; translate() is codegen'd and
    # avoids regex-metachar escaping for arbitrary symbols
    return F.length(F.col(text_col)) - F.length(F.translate(F.col(text_col), ch, ""))


def gopher_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.1,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021, appendix A) as one
    shuffle-free columnar pass. Emits the per-document signals and the
    combined ``keep`` verdict:

    - word count in [min_words, max_words]
    - mean word length in [min_mean_word_len, max_mean_word_len]
    - '#'/'…' symbol-to-word ratio <= max_symbol_ratio
    - fraction of non-blank lines starting with a bullet
      ('-', '*', '•') <= max_bullet_line_frac
    - fraction of non-blank lines ending in an ellipsis
      ('...', '…') <= max_ellipsis_line_frac
    - fraction of words containing an alphabetic char
      >= min_alpha_word_frac
    - at least min_stop_hits distinct GOPHER_STOPWORDS present

    Returns (doc_id, n_words, mean_word_len, frac_alpha_words,
    symbol_ratio, frac_bullet_lines, frac_ellipsis_lines,
    n_stop_hits, keep). Fractions are 4-dp HALF_UP so the verdict is
    hash-stable against the SQL twin.

    100 TB posture: every signal is a higher-order array expression in
    whole-stage codegen over the scan — no exchange, no Python, and a
    downstream ``.filter("keep")`` pushes straight onto the scan's
    output. Scale cost is O(total tokens) CPU, the floor for any
    tokenizing filter.
    """
    words = _words(text_col)
    lines = _nonblank_lines(text_col)
    stops = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])

    d = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_t"),
        words.alias("_w"),
        lines.alias("_l"),
    ).select(
        "doc_id",
        F.size("_w").alias("n_words"),
        F.aggregate("_w", F.lit(0).cast("long"), lambda a, w: a + F.length(w)).alias("_wlen"),
        F.size(F.filter("_w", lambda w: w.rlike("[a-z]"))).alias("_nalpha"),
        (_char_count("_t", "#") + _char_count("_t", "…")).alias("_nsym"),
        F.size("_l").alias("_nlines"),
        F.size(
            F.filter("_l", lambda l: F.substring(F.ltrim(l), 1, 1).isin("-", "*", "•"))
        ).alias("_nbullet"),
        F.size(
            F.filter(
                "_l",
                lambda l: F.rtrim(l).endswith("...") | F.rtrim(l).endswith("…"),
            )
        ).alias("_nellip"),
        F.size(F.filter(stops, lambda s: F.array_contains("_w", s))).alias("n_stop_hits"),
    )

    nz = F.when(F.col("n_words") > 0, F.col("n_words").cast("double"))
    lz = F.when(F.col("_nlines") > 0, F.col("_nlines").cast("double"))
    d = d.select(
        "doc_id",
        "n_words",
        _half_up(F.coalesce(F.col("_wlen") / nz, F.lit(0.0)), 4).alias("mean_word_len"),
        _half_up(F.coalesce(F.col("_nalpha") / nz, F.lit(0.0)), 4).alias("frac_alpha_words"),
        _half_up(F.coalesce(F.col("_nsym") / nz, F.lit(0.0)), 4).alias("symbol_ratio"),
        _half_up(F.coalesce(F.col("_nbullet") / lz, F.lit(0.0)), 4).alias("frac_bullet_lines"),
        _half_up(F.coalesce(F.col("_nellip") / lz, F.lit(0.0)), 4).alias("frac_ellipsis_lines"),
        "n_stop_hits",
    )
    keep = (
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (F.col("symbol_ratio") <= max_symbol_ratio)
        & (F.col("frac_bullet_lines") <= max_bullet_line_frac)
        & (F.col("frac_ellipsis_lines") <= max_ellipsis_line_frac)
        & (F.col("frac_alpha_words") >= min_alpha_word_frac)
        & (F.col("n_stop_hits") >= min_stop_hits)
    )
    return d.withColumn("keep", keep)


def c4_line_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_words_per_line: int = 5,
    min_kept_lines: int = 3,
) -> DataFrame:
    """C4's line-level cleaning (Raffel et al. 2020 §2.2) as one
    shuffle-free columnar pass. A line survives iff it

    - ends in a terminal punctuation mark ('.', '!', '?', '"'),
    - has at least ``min_words_per_line`` words,
    - does not mention 'javascript' (case-insensitive), and
    - does not contain '{' (leaked code/templating);

    the document survives iff at least ``min_kept_lines`` lines
    survive and the page never says 'lorem ipsum'. Kept lines are
    re-joined (trimmed, '\\n'-separated) into ``clean_text``.

    Returns (doc_id, n_lines, n_kept, doc_keep, clean_text).

    100 TB posture: nested higher-order lambdas (per-line word count
    inside the line filter) stay inside whole-stage codegen — zero
    exchange, zero Python; the op pipelines between extraction and
    tokenization exactly like gopher_quality.
    """
    kept = F.filter(
        F.transform(_nonblank_lines(text_col), lambda l: F.trim(l)),
        lambda l: F.substring(l, -1, 1).isin(*C4_LINE_TERMINALS)
        & (
            F.size(F.filter(F.split(l, r"\s+"), lambda t: t != F.lit("")))
            >= min_words_per_line
        )
        & ~F.lower(l).contains("javascript")
        & ~l.contains("{"),
    )
    block = F.lit(False)
    for phrase in C4_PAGE_BLOCK_PHRASES:
        block = block | F.lower(F.col(text_col)).contains(phrase)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(_nonblank_lines(text_col)).alias("n_lines"),
        kept.alias("_k"),
        block.alias("_blocked"),
    ).select(
        "doc_id",
        "n_lines",
        F.size("_k").alias("n_kept"),
        ((F.size("_k") >= min_kept_lines) & ~F.col("_blocked")).alias("doc_keep"),
        F.concat_ws("\n", "_k").alias("clean_text"),
    )


def paragraph_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Cross-document exact paragraph dedup (Dolma-style; C4 does the
    same at 3-sentence granularity): keep only the globally-FIRST
    occurrence of every distinct non-blank line/paragraph (first =
    lowest (doc_id, line_idx)) and reassemble the surviving text.
    Newline analog of ``dedup.chunk_dedup`` — paragraphs are the unit
    web boilerplate actually repeats at.

    Same scale shape as chunk_dedup: winner election is ONE map-side-
    combined HashAggregate shuffle on the 60-bit paragraph hash with a
    packed (doc_id << 20 | line_idx) position key (struct-min would
    demote to SortAggregate); the keep-join shares the hash key so AQE
    reuses the exchange; reassembly is one groupBy(doc) with an
    order-restoring sort_array(collect_list(struct)). Bound: docs up
    to 2^20 lines.

    Returns (doc_id, n_lines, n_kept, dedup_text).
    """
    lines = (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("line_idx", "line"),
        )
        .withColumn("line", F.trim("line"))
        .where(F.col("line") != "")
        .withColumn("fp", content_hash(F.col("line")))
        .withColumn("pos_key", F.shiftleft(F.col("id"), 20) + F.col("line_idx"))
    )
    winners = lines.groupBy("fp").agg(F.min("pos_key").alias("w"))
    flagged = (
        lines.join(winners, on="fp")
        .withColumn("kept", F.col("pos_key") == F.col("w"))
        .drop("w", "pos_key")
    )
    return (
        flagged.groupBy("id")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("kept").cast("int")).alias("n_kept"),
            F.concat_ws(
                "\n",
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.when(F.col("kept"), F.struct(F.col("line_idx"), F.col("line")))
                        )
                    ),
                    lambda s: s["line"],
                ),
            ).alias("dedup_text"),
        )
        .select(F.col("id").alias("doc_id"), "n_lines", "n_kept", "dedup_text")
    )


def hashed_linear_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n_weights: int = 2001,
) -> DataFrame:
    """Hashed bag-of-words linear quality scorer — the plan shape of a
    CCNet/DCLM-style quality classifier, runnable without a trained
    model: each token's weight is derived from its 60-bit content hash
    (hash % n_weights, centered and scaled to [-1, 1]), the document
    score is the mean token weight, and ``keep`` is score > 0.

    The point is the PLUMBING: via the hashing trick the scorer is
    map-only — no vocabulary broadcast, no shuffle, pure whole-stage
    codegen over the scan. Deploying a real trained linear model
    changes exactly one thing (hash-derived weight -> broadcast
    ``token -> weight`` lookup); the distributed shape is identical,
    which is what makes this the scale-path baseline for classifier
    scoring at 100 TB.

    Returns (doc_id, n_words, score, keep) with score 4-dp HALF_UP.
    """
    half = (n_weights - 1) // 2
    words = _words(text_col)
    d = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(words).alias("n_words"),
        F.aggregate(
            words,
            F.lit(0.0),
            lambda a, w: a + (content_hash(w) % n_weights - half) / F.lit(float(half)),
        ).alias("_s"),
    )
    nz = F.when(F.col("n_words") > 0, F.col("n_words").cast("double"))
    d = d.select(
        "doc_id",
        "n_words",
        _half_up(F.coalesce(F.col("_s") / nz, F.lit(0.0)), 4).alias("score"),
    )
    return d.withColumn("keep", F.col("score") > 0)
