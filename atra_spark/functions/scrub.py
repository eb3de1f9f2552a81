"""Corpus scrubbing operators: PII redaction, per-site boilerplate-line
removal, and Unicode text normalization.

These are the cleanup stages a web-text training pipeline runs between
extraction and tokenization (C4/CCNet/Gopher lineage; the reference
stops at extraction — SURVEY.md §2.7 — so these are "beyond the
reference" first-class ops like the dedup family). All three are
designed for the 100 TB posture:

- ``pii_scrub`` is pure JVM column expressions (regexp_extract_all /
  chained regexp_replace inside whole-stage codegen) — zero Python,
  zero shuffle: it pipelines into whatever scan feeds it.
- ``site_boilerplate_removal`` pays two hash-partitioned shuffles
  (per-(site, line) presence distinct + the per-doc reassembly);
  the boilerplate relation it joins against is the tiny filtered
  (site, fp) set, never the corpus.
- ``normalize_text`` is one Arrow-batched pandas UDF (NFC has no JVM
  builtin); everything around it stays columnar.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from .dedup import content_hash

# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------
# (name, pattern, replacement) — applied in order. Patterns are kept in
# the common subset of Java regex (Spark) and RE2 (DuckDB oracle): no
# backreferences, no lookaround, ASCII \b word boundaries, explicit
# char classes. Counts are computed per pattern on the ORIGINAL text;
# redaction chains the replaces in list order (documented: a token
# matching two families counts in both but is redacted by the first).
PII_RULES: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ipv4",
        r"\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}"
        r"(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\b",
        "<IP>",
    ),
    (
        "phone",
        r"\+[0-9]{1,3} [0-9]{3} [0-9]{4,8}\b",
        "<PHONE>",
    ),
    (
        "iban",
        r"\b[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}\b",
        "<IBAN>",
    ),
)


def pii_scrub(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Detect + redact PII spans (emails, IPv4, international phone
    numbers, IBANs) — the C4-style scrub pass before a corpus ships.

    Entirely JVM: per-family counts via ``regexp_extract_all`` on the
    original text, redaction via chained ``regexp_replace`` (global in
    both Spark and the DuckDB oracle). No shuffle, no Python, fuses
    into the upstream scan under whole-stage codegen — at 100 TB this
    op costs exactly one pass over the text bytes it was already
    reading.

    Returns (doc_id, n_email, n_ipv4, n_phone, n_iban, n_pii,
    redacted_text).
    """
    text = F.col(text_col)
    counts = [
        F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0))).alias(f"n_{name}")
        for name, pat, _ in PII_RULES
    ]
    red = text
    for _, pat, repl in PII_RULES:
        red = F.regexp_replace(red, pat, repl)
    out = df.select(F.col(id_col).alias("doc_id"), *counts, red.alias("redacted_text"))
    total = None
    for name, _, _ in PII_RULES:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.select(
        "doc_id",
        *[f"n_{name}" for name, _, _ in PII_RULES],
        total.alias("n_pii"),
        "redacted_text",
    )


# ---------------------------------------------------------------------------
# Per-site boilerplate line removal
# ---------------------------------------------------------------------------
def site_boilerplate_removal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    site_col: str = "source",
    min_ratio: float = 0.5,
    min_docs: int = 2,
) -> DataFrame:
    """Remove per-site template lines (nav headers, cookie banners,
    copyright footers): a line is boilerplate for site ``s`` when it
    appears in at least ``max(min_docs, ceil(min_ratio * |docs(s)|))``
    of that site's documents. This is the per-SITE frequency filter
    (CCNet's cross-shard line dedup refined by site locality) —
    distinct from ``dedup.chunk_dedup``, which keeps the globally-first
    occurrence of every chunk regardless of origin: boilerplate removal
    deletes ALL occurrences, including the first, but only where the
    within-site document ratio proves the line is template, not
    content.

    Plan shape (pinned by tests): lines explode JVM-side
    (posexplode(split)); doc-presence is one distinct on
    (site, fp, doc) — hash-partitioned, map-side combined; the
    boilerplate election joins that against the per-site doc count (a
    broadcast-sized relation: one row per site); the removal join keys
    lines on (site, fp) against the SMALL elected set; reassembly is
    one groupBy(doc) with order-restoring sort_array(collect_list).
    Nothing is ever keyed on raw line text — the 60-bit line fp stands
    in, so shuffles carry fixed-width keys. Hot lines (the template
    itself) concentrate on their fp, but both aggregates over them are
    algebraic counts, absorbed map-side.

    Returns (doc_id, n_lines, n_boiler, clean_text) — blank lines are
    not counted and are dropped from clean_text.
    """
    lines = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(site_col).alias("site"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("line_idx", "line"),
        )
        .filter(F.trim(F.col("line")) != "")
        .withColumn("fp", content_hash(F.col("line")))
    )
    site_docs = df.groupBy(F.col(site_col).alias("site")).agg(
        F.countDistinct(id_col).alias("n_docs")
    )
    boiler = (
        lines.select("site", "fp", "id")
        .distinct()
        .groupBy("site", "fp")
        .agg(F.count("*").alias("n_with"))
        .join(F.broadcast(site_docs), on="site")
        .filter(
            F.col("n_with")
            >= F.greatest(
                F.lit(int(min_docs)),
                F.ceil(F.lit(float(min_ratio)) * F.col("n_docs")).cast("int"),
            )
        )
        .select("site", "fp")
    )
    flagged = lines.join(
        boiler.withColumn("is_boiler", F.lit(True)), on=["site", "fp"], how="left"
    ).withColumn("is_boiler", F.coalesce(F.col("is_boiler"), F.lit(False)))
    return (
        flagged.groupBy("id")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("is_boiler").cast("int")).alias("n_boiler"),
            F.concat_ws(
                "\n",
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.when(
                                ~F.col("is_boiler"),
                                F.struct(F.col("line_idx"), F.col("line")),
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
            ).alias("clean_text"),
        )
        .select(F.col("id").alias("doc_id"), "n_lines", "n_boiler", "clean_text")
    )


# ---------------------------------------------------------------------------
# Unicode normalization
# ---------------------------------------------------------------------------
# step order is part of the contract (the DuckDB oracle replays it):
# NFC -> zero-width strip -> control strip -> [ \t]+ collapse -> strip
# leading/trailing SPACES (only — newlines are content, matching SQL
# trim()).
_ZERO_WIDTH = re.compile("[​‌‍﻿]")
_CONTROL = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")  # keeps \t \n \r
_WS_RUN = re.compile(r"[ \t]+")


def _normalize_one(s: str | None) -> str | None:
    if s is None:
        return None
    s = unicodedata.normalize("NFC", s)
    s = _ZERO_WIDTH.sub("", s)
    s = _CONTROL.sub("", s)
    s = _WS_RUN.sub(" ", s)
    return s.strip(" ")


@F.pandas_udf(StringType())
def _normalize_udf(s: pd.Series) -> pd.Series:
    return s.map(_normalize_one)


def normalize_text(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Canonical Unicode cleanup before tokenization: NFC composition
    (é as one code point, not e + U+0301 — tokenizers and exact-dedup
    hashes otherwise split on the encoding, not the content),
    zero-width character removal (ZWSP/ZWNJ/ZWJ/BOM), C0/DEL control
    stripping (tab/newline survive as whitespace), horizontal-
    whitespace-run collapse, and space-only edge trim.

    NFC has no JVM builtin, so the normalization itself is ONE
    Arrow-batched pandas UDF (vectorized transfer; the per-string
    Python cost is the icu-less floor) — everything else in the
    returned projection (lengths, change flag) is JVM column math on
    either side of it. At 100 TB this is the one pandas stage the
    scrub family pays, and it is embarrassingly parallel: no shuffle,
    no state, batch-local.

    Returns (doc_id, norm_text, n_chars_before, n_chars_after,
    changed).
    """
    text = F.col(text_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        _normalize_udf(text).alias("norm_text"),
        F.length(text).alias("n_chars_before"),
        text.alias("_orig"),
    ).select(
        "doc_id",
        "norm_text",
        "n_chars_before",
        F.length("norm_text").alias("n_chars_after"),
        (F.col("norm_text") != F.col("_orig")).alias("changed"),
    )
