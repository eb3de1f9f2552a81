"""Sitemap source (atra/src/crawl/crawler/sitemaps.rs:35-88).

The reference reads the robots.txt-declared sitemap URLs per host
(``Sitemap:`` lines), fetches them, and pushes ``<urlset>`` entries
into the BFS queue; ``<sitemapindex>`` documents point at further
sitemaps. Rebuild: sitemaps are rows of the pages table — discovered
both by convention (``https://{host}/sitemap.xml``) and from the
robots table — parsed in one Arrow-batched pass into frontier
candidates (canonicalized, host-tagged), with one level of
sitemap-index recursion (a second joined parse pass, not a loop).
"""

from __future__ import annotations

import re
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BooleanType, StringType, StructField, StructType

from ..urlkit import canonicalize, origin

_LOC_RE = re.compile(rb"<loc>\s*([^<\s]+)\s*</loc>")
_SITEMAP_LINE_RE = re.compile(rb"^\s*sitemap\s*:\s*(\S+)", re.IGNORECASE | re.MULTILINE)

_SITEMAP_OUT = StructType(
    [
        StructField("url", StringType(), False),
        StructField("host", StringType(), False),
        StructField("sitemap_url", StringType(), False),
        # True when this row is a nested-sitemap reference from a
        # <sitemapindex>, to be fetched and parsed, not crawled
        StructField("is_sitemap_ref", BooleanType(), False),
    ]
)


def parse_sitemap(xml: bytes) -> tuple[list[str], list[str]]:
    """(page_urls, nested_sitemap_urls) — lenient regex parse, like the
    reference's forgiving sitemap handling. A <sitemapindex> document
    yields only nested refs; a <urlset> only page URLs."""
    if not xml:
        return [], []
    locs = [m.group(1).decode("utf-8", errors="replace") for m in _LOC_RE.finditer(xml)]
    if b"<sitemapindex" in xml[:4096]:
        return [], locs
    return locs, []


def robots_declared_sitemaps(robots: DataFrame) -> DataFrame:
    """``Sitemap:`` lines of each host's robots.txt -> (host,
    sitemap_url) (sitemaps.rs:35-50: robots.sitemaps())."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                raw = pdf["robots_txt"].iat[i]
                if raw is None:
                    continue
                for m in _SITEMAP_LINE_RE.finditer(bytes(raw)):
                    sm = canonicalize(m.group(1).decode("utf-8", errors="replace"))
                    if sm:
                        rows.append((pdf["host"].iat[i], sm))
            yield pd.DataFrame(rows, columns=["host", "sitemap_url"])

    return robots.select("host", "robots_txt").mapInPandas(
        run, "host string, sitemap_url string"
    ).dropDuplicates(["sitemap_url"])


def _parse_pass(maps: DataFrame) -> DataFrame:
    """(url, html) sitemap rows -> candidate/ref rows."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                sm_url = pdf["url"].iat[i]
                raw = pdf["html"].iat[i]
                urls, refs = parse_sitemap(bytes(raw) if raw is not None else b"")
                for loc, is_ref in [(u, False) for u in urls] + [(r, True) for r in refs]:
                    cu = canonicalize(loc, base=sm_url)
                    if cu is None:
                        continue
                    h = origin(cu)
                    if h:
                        rows.append((cu, h, sm_url, is_ref))
            yield pd.DataFrame(rows, columns=["url", "host", "sitemap_url", "is_sitemap_ref"])

    return maps.mapInPandas(run, _SITEMAP_OUT)


def sitemap_candidates(pages: DataFrame, robots: DataFrame | None = None) -> DataFrame:
    """Frontier candidates (url, host, sitemap_url) from every sitemap
    of the pages table: convention rows (``*/sitemap.xml``) plus
    robots-declared sitemaps, with one level of <sitemapindex>
    recursion resolved by joining the refs back to the pages table."""
    maps = pages.filter(F.col("url").endswith("/sitemap.xml")).select("url", "html")
    if robots is not None:
        declared = robots_declared_sitemaps(robots).select(
            F.col("sitemap_url").alias("url")
        )
        maps = maps.unionByName(
            pages.join(declared, on="url", how="left_semi").select("url", "html")
        ).dropDuplicates(["url"])
    first = _parse_pass(maps).cache()
    refs = first.filter(F.col("is_sitemap_ref")).select(F.col("url").alias("ref_url"))
    nested = _parse_pass(
        pages.join(
            refs.withColumnRenamed("ref_url", "url").dropDuplicates(["url"]),
            on="url",
            how="left_semi",
        ).select("url", "html")
    )
    out = (
        first.filter(~F.col("is_sitemap_ref"))
        .unionByName(nested.filter(~F.col("is_sitemap_ref")))
        .select("url", "host", "sitemap_url")
        .dropDuplicates(["url"])
    )
    return out
