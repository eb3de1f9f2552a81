"""Anchor-text extraction + per-target aggregation over the pages table.

Anchor text is the classic web-corpus signal the page itself cannot
provide: what OTHER pages call a URL (search ranking, link-graph
features, anchor-text training corpora — the Common-Crawl WAT
consumers' main derived dataset). The reference extracts links but
discards the anchor DOM text (extraction/html.rs keeps only the href
and rel); this operator recovers it as a first-class relation.

Scale posture: extraction is ONE mapInPandas pass over the pages scan
(the html payload never shuffles — only the small (src, dst, anchor)
rows leave the task), and the per-target rollup is one
hash-partitioned groupBy(dst) whose aggregates are all algebraic
(count / countDistinct via partial aggregation, min for the
deterministic sample) — a mega-linked URL (every page links the
homepage) concentrates on its dst key but is absorbed map-side.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from .extract import _host_cached, decode_bytes, extract_anchor_pairs, sniff_format

ANCHOR_SCHEMA = StructType(
    [
        StructField("src", StringType(), False),
        StructField("dst", StringType(), False),
        StructField("anchor", StringType(), False),
    ]
)


def anchor_pairs_batch(
    batches: Iterable[pd.DataFrame], respect_nofollow: bool = True
) -> Iterator[pd.DataFrame]:
    """mapInPandas body: (url, html) batches -> (src, dst, anchor) rows
    for every surviving <a href> under extract_html's admission rules
    (shared code path: functions/extract.extract_anchor_pairs)."""
    for pdf in batches:
        srcs: list[str] = []
        dsts: list[str] = []
        anchors: list[str] = []
        for i in range(len(pdf)):
            url = pdf["url"].iat[i]
            raw = pdf["html"].iat[i]
            raw = bytes(raw) if raw is not None else None
            if sniff_format(None, raw[:1024] if raw else None, url) != "HTML":
                continue  # anchors are an HTML-only concept
            page_host = _host_cached(url) if url else None
            tld = page_host.rsplit(".", 1)[-1] if page_host else None
            text, _enc, _err = decode_bytes(raw, tld=tld)
            if text is None:
                continue
            for dst, anchor in extract_anchor_pairs(
                text, url, respect_nofollow=respect_nofollow
            ):
                srcs.append(url)
                dsts.append(dst)
                anchors.append(anchor)
        if srcs:
            yield pd.DataFrame({"src": srcs, "dst": dsts, "anchor": anchors})


def anchor_pairs(pages: DataFrame, respect_nofollow: bool = True) -> DataFrame:
    """(src, dst, anchor) for every admitted <a href> in ``pages``
    (columns url, html). Column-prunes the scan to exactly those two
    columns; the html payload stays inside the extraction task."""
    return pages.select("url", "html").mapInPandas(
        lambda it: anchor_pairs_batch(it, respect_nofollow=respect_nofollow),
        ANCHOR_SCHEMA,
    )


def anchor_summary(pairs: DataFrame) -> DataFrame:
    """Per-target anchor rollup: (dst, n_anchors, n_sources,
    sample_anchor) — inbound anchor count, distinct linking pages, and
    the lexicographically-first anchor text as the deterministic
    sample. All algebraic aggregates: one shuffle on dst."""
    return pairs.groupBy("dst").agg(
        F.count("*").alias("n_anchors"),
        F.countDistinct("src").alias("n_sources"),
        F.min("anchor").alias("sample_anchor"),
    )
