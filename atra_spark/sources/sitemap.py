"""Sitemap source (atra/src/crawl/crawler/sitemaps.rs:35-88).

The reference fetches robots-declared sitemap URLs per host and pushes
``<urlset>`` entries into the BFS queue. Rebuild: sitemaps are rows of
the pages table at ``https://{host}/sitemap.xml``; one Arrow-batched
parse pass turns them into frontier candidates (canonicalized,
host-tagged), union-ed into the seed set.
"""

from __future__ import annotations

import re
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..urlkit import canonicalize, origin

_LOC_RE = re.compile(rb"<loc>\s*([^<\s]+)\s*</loc>")

_SITEMAP_OUT = StructType(
    [
        StructField("url", StringType(), False),
        StructField("host", StringType(), False),
        StructField("sitemap_url", StringType(), False),
    ]
)


def parse_sitemap(xml: bytes) -> list[str]:
    """<urlset> -> loc URLs (lenient regex parse, like the reference's
    forgiving sitemap handling)."""
    if not xml:
        return []
    return [m.group(1).decode("utf-8", errors="replace") for m in _LOC_RE.finditer(xml)]


def sitemap_candidates(pages: DataFrame) -> DataFrame:
    """All sitemap rows of the pages table -> candidate URLs
    (url, host, sitemap_url), canonicalized and deduplicated."""
    maps = pages.filter(F.col("url").endswith("/sitemap.xml")).select("url", "html")

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                sm_url = pdf["url"].iat[i]
                raw = pdf["html"].iat[i]
                for loc in parse_sitemap(bytes(raw) if raw is not None else b""):
                    cu = canonicalize(loc, base=sm_url)
                    if cu is None:
                        continue
                    h = origin(cu)
                    if h:
                        rows.append((cu, h, sm_url))
            yield pd.DataFrame(rows, columns=["url", "host", "sitemap_url"])

    return maps.mapInPandas(run, _SITEMAP_OUT).dropDuplicates(["url"])
