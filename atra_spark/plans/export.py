"""Export sinks: WARC archive and RDF-Turtle web graph.

The reference persists payloads into rotated WARC files
(atra/src/warc_ext/write.rs:49-305, atra/src/stores/warc.rs:119-140)
and streams the link graph to a Turtle file (atra/src/web_graph.rs:
36-96,137-260). In the rebuild these are *sinks over the results/edges
tables*, not the storage backbone: one distributed pass, one file per
partition (the partition is the rotation unit).
"""

from __future__ import annotations

import os
import uuid
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import IntegerType, LongType, StringType, StructField, StructType

WARC_VERSION = "WARC/1.1"

_EXPORT_REPORT = StructType(
    [
        StructField("path", StringType(), False),
        StructField("records", IntegerType(), False),
        StructField("bytes", LongType(), False),
    ]
)


def _warc_record(url: str, ts, payload: bytes, content_type: str) -> bytes:
    """One WARC response record. Record-id is UUIDv5 of the URL in URN
    form (warc_ext/write.rs:80-86); digest labels follow the reference's
    labeled-digest scheme (toolkit/digest.rs) with sha1 in place of the
    xxh128 crate."""
    import hashlib

    rid = uuid.uuid5(uuid.NAMESPACE_URL, url).urn
    date = (ts.strftime("%Y-%m-%dT%H:%M:%SZ") if ts is not None else "1970-01-01T00:00:00Z")
    digest = "sha1:" + hashlib.sha1(payload).hexdigest()
    header = (
        f"{WARC_VERSION}\r\n"
        f"WARC-Type: response\r\n"
        f"WARC-Record-ID: <{rid}>\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Payload-Digest: {digest}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n"
    ).encode()
    return header + payload + b"\r\n\r\n"


def export_warc(results: DataFrame, pages: DataFrame, out_dir: str) -> DataFrame:
    """Write one ``.warc`` file per partition under ``out_dir``.

    ``results`` supplies metadata (url, fetched_at, status); payload
    bytes come from the pages table (the results table stores text, not
    raw bytes, in this deployment). Returns a report DataFrame
    (path, records, bytes) — the per-partition lineage of the export.
    """
    os.makedirs(out_dir, exist_ok=True)
    rows = (
        results.filter(F.col("status") == 200)
        .select("url", "fetched_at")
        .join(pages.select("url", "html"), on="url", how="inner")
    )

    def write_partition(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import socket
        import threading

        part = f"{socket.gethostname()}-{threading.get_ident()}-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        path = os.path.join(out_dir, f"atra-{part}.warc")
        n = 0
        size = 0
        f = None
        for pdf in batches:
            if len(pdf) and f is None:
                f = open(path, "wb")
            for i in range(len(pdf)):
                rec = _warc_record(
                    pdf["url"].iat[i],
                    pdf["fetched_at"].iat[i],
                    bytes(pdf["html"].iat[i]),
                    "text/html",
                )
                f.write(rec)
                n += 1
                size += len(rec)
        if f is not None:
            f.close()
            yield pd.DataFrame([(path, n, size)], columns=["path", "records", "bytes"])

    return rows.mapInPandas(write_partition, _EXPORT_REPORT)


# ---------------------------------------------------------------------------
# RDF Turtle web-graph export (web_graph.rs predicates)
# ---------------------------------------------------------------------------
_TTL_PREFIX = "@prefix atra: <https://atra.example/ns#> .\n"


def edges_to_turtle(edges: DataFrame) -> DataFrame:
    """edges table -> one Turtle triple line per edge, pure column
    formatting (a ``spark.write.text`` away from a .ttl file):
    seed rows -> atra:has_seed, link rows -> atra:links_to."""
    pred = F.when(F.col("kind") == "seed", F.lit("atra:has_seed")).otherwise(
        F.lit("atra:links_to")
    )
    return edges.select(
        F.format_string("<%s> %s <%s> .", F.col("src"), pred, F.col("dst")).alias("line")
    )


def export_turtle(edges: DataFrame, out_path: str) -> int:
    """Write the web graph as a single .ttl (driver concatenates the
    per-partition text files; at scale keep the directory form)."""
    tmp = out_path + ".d"
    edges_to_turtle(edges).write.mode("overwrite").text(tmp)
    n = 0
    with open(out_path, "w") as out:
        out.write(_TTL_PREFIX)
        for name in sorted(os.listdir(tmp)):
            if not name.startswith("part-"):
                continue
            with open(os.path.join(tmp, name)) as f:
                for line in f:
                    out.write(line)
                    n += 1
    return n
