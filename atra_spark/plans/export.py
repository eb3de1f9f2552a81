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


MAX_SEGMENT_BYTES = 1 << 30  # 1 GB record segmentation (write.rs:219-230)
ROTATE_BYTES = 1 << 30       # size-based file rotation (forward_if_filesize)


def _labeled_digest(data: bytes) -> str:
    """Labeled digest, byte-format-identical to the reference
    (toolkit/digest.rs:22-38): ``XXH128:`` + padded BASE32 of the
    big-endian xxh3-128 — served by the system libxxhash via ctypes
    (functions/digest.py ladder; sha1 stand-in only if no xxhash
    implementation exists on the host)."""
    from ..functions.digest import labeled_xxh128_digest

    return labeled_xxh128_digest(data)


def _http_header_block(status: int, headers: dict | None, n_bytes: int, content_type: str) -> bytes:
    """Packed HTTP response header block (the reference stores the raw
    response head before the payload; result.rs:32-90 meta.headers)."""
    reason = {200: "OK", 404: "Not Found"}.get(status, "")
    lines = [f"HTTP/1.1 {status} {reason}".rstrip()]
    hdrs = dict(headers or {})
    hdrs.setdefault("Content-Type", content_type)
    hdrs.setdefault("Content-Length", str(n_bytes))
    lines += [f"{k}: {v}" for k, v in hdrs.items()]
    return ("\r\n".join(lines) + "\r\n\r\n").encode()


def _warc_headers(fields: list[tuple[str, str]]) -> bytes:
    return (
        f"{WARC_VERSION}\r\n"
        + "".join(f"{k}: {v}\r\n" for k, v in fields)
        + "\r\n"
    ).encode()


def _utc_warc_date(ts, session_tz: str = "UTC") -> str:
    """WARC-Date: a real UTC instant, not local wall time with a fake
    ``Z``. Spark->Arrow hands mapInPandas tz-NAIVE timestamps rendered
    in the session timezone, so the writer must be told that zone to
    recover the instant; tz-aware inputs (direct warc_records calls)
    convert from their own zone."""
    if ts is None:
        return "1970-01-01T00:00:00Z"
    t = pd.Timestamp(ts)
    t = t.tz_localize(session_tz) if t.tzinfo is None else t
    return t.tz_convert("UTC").strftime("%Y-%m-%dT%H:%M:%SZ")


def warc_records(
    url: str,
    ts,
    payload: bytes,
    content_type: str = "text/html",
    status: int = 200,
    headers: dict | None = None,
    max_segment: int = MAX_SEGMENT_BYTES,
    session_tz: str = "UTC",
) -> Iterator[bytes]:
    """WARC records for one response — 1:1 with warc_ext/write.rs:200-305:

    body = packed HTTP header block + payload; if the body exceeds
    ``max_segment`` it is split into segments: the first is the
    ``response`` record carrying the whole-body payload digest, the
    rest are ``continuation`` records with fresh record-ids,
    WARC-Segment-Number (1-based), WARC-Segment-Origin-ID, and the
    last adds WARC-Segment-Total-Length. Every record carries a
    per-chunk block digest."""
    rid = uuid.uuid5(uuid.NAMESPACE_URL, url).urn
    date = _utc_warc_date(ts, session_tz)
    body = _http_header_block(status, headers, len(payload), content_type) + payload
    payload_digest = _labeled_digest(body)
    common = [
        ("WARC-Date", date),
        ("WARC-Target-URI", url),
        ("Content-Type", "application/http;msgtype=response"),
    ]
    if len(body) <= max_segment:
        # single-segment: block == whole body, so the block digest IS
        # the payload digest — one xxh128 pass, not two over the same
        # bytes (round 6; the archive loop hashes every exported byte)
        fields = (
            [("WARC-Type", "response"), ("WARC-Record-ID", f"<{rid}>")]
            + common
            + [
                ("WARC-Payload-Digest", payload_digest),
                ("WARC-Block-Digest", payload_digest),
                ("Content-Length", str(len(body))),
            ]
        )
        yield _warc_headers(fields) + body + b"\r\n\r\n"
        return
    chunks = [body[i : i + max_segment] for i in range(0, len(body), max_segment)]
    for idx, chunk in enumerate(chunks):
        if idx == 0:
            head = [("WARC-Type", "response"), ("WARC-Record-ID", f"<{rid}>")]
            extra = [("WARC-Payload-Digest", payload_digest)]
        else:
            head = [
                ("WARC-Type", "continuation"),
                ("WARC-Record-ID", f"<{uuid.uuid4().urn}>"),
            ]
            extra = []
        fields = (
            head
            + common
            + extra
            + [
                ("WARC-Block-Digest", _labeled_digest(chunk)),
                ("WARC-Segment-Number", str(idx + 1)),
                ("WARC-Segment-Origin-ID", f"<{rid}>"),
            ]
            + ([("WARC-Segment-Total-Length", str(len(body)))] if idx == len(chunks) - 1 else [])
            + [("Content-Length", str(len(chunk)))]
        )
        yield _warc_headers(fields) + chunk + b"\r\n\r\n"


REVISIT_PROFILE = "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest"


def warc_revisit_record(
    url: str,
    ts,
    payload_digest: str,
    refers_to_url: str,
    refers_to_date,
    n_payload: int,
    content_type: str = "text/html",
    status: int = 200,
    headers: dict | None = None,
    session_tz: str = "UTC",
    occurrence: int = 2,
) -> bytes:
    """A WARC 1.1 ``revisit`` record (identical-payload-digest
    profile): the block is the HTTP header block ONLY — the payload is
    not re-stored — with WARC-Refers-To-Target-URI/-Date naming the
    record that holds the bytes and WARC-Payload-Digest equal to the
    original's, so digest-based readers treat both alike. Record id is
    uuid5 over ``url#date#occurrence`` — the bare url (the response-
    record rule, write.rs:80-86) would collide with the canonical, and
    url#date alone would collide when the same (url, fetched_at) row
    appears more than once in a dedup group; ``occurrence`` is the
    row's rank within its digest group, so every record id is unique
    AND deterministic."""
    date = _utc_warc_date(ts, session_tz)
    rid = uuid.uuid5(uuid.NAMESPACE_URL, f"{url}#{date}#{int(occurrence)}").urn
    ref_date = _utc_warc_date(refers_to_date, session_tz)
    block = _http_header_block(status, headers, n_payload, content_type)
    fields = [
        ("WARC-Type", "revisit"),
        ("WARC-Record-ID", f"<{rid}>"),
        ("WARC-Date", date),
        ("WARC-Target-URI", url),
        ("Content-Type", "application/http;msgtype=response"),
        ("WARC-Profile", REVISIT_PROFILE),
        ("WARC-Refers-To-Target-URI", refers_to_url),
        ("WARC-Refers-To-Date", ref_date),
        ("WARC-Payload-Digest", payload_digest),
        ("WARC-Block-Digest", _labeled_digest(block)),
        ("WARC-Truncated", "length"),
        ("Content-Length", str(len(block))),
    ]
    return _warc_headers(fields) + block + b"\r\n\r\n"


def iter_warc_records(data: bytes):
    """Content-length-driven WARC reader — the ``WarcCursor`` analog
    (warc/src/reader.rs:380-470): parse the version line + header
    fields up to the blank CRLF line, read EXACTLY Content-Length body
    bytes, then expect the CRLF CRLF record tail (writer.rs BODY_TAIL).
    Because the body is consumed by length, byte sequences inside it
    that look like a record start ("WARC/1.1\\r\\n") are data, not a
    new record — the property the reference's reader test pins with
    its embedded-"WARC/1.1" body (writer.rs:219-221, reader.rs:509).

    Yields (headers: dict[str, str], body: bytes) per record; raises
    ValueError on grammar violations (the NotAHeader analog)."""
    for _off, _length, headers, body in iter_warc_spans(data):
        yield headers, body


def iter_warc_spans(data: bytes):
    """Span-tracked variant of :func:`iter_warc_records` — the single
    implementation of the record grammar. Yields
    ``(offset, length, headers, body)`` where ``offset`` is the byte
    position of the record's version line and ``length`` the full
    record span including the CRLF CRLF tail — exactly the numbers a
    CDX index needs for random access (``data[offset:offset+length]``
    re-parses as one record; the reference's skip-pointer economics,
    atra/src/stores/warc.rs:119-140)."""
    pos = 0
    version = WARC_VERSION.encode() + b"\r\n"
    while pos < len(data):
        start = pos
        if not data.startswith(version, pos):
            raise ValueError(
                f"not a header at byte {pos}: {data[pos:pos + 16]!r}"
            )
        pos += len(version)
        headers: dict[str, str] = {}
        while True:
            end = data.index(b"\r\n", pos)
            line = data[pos:end]
            pos = end + 2
            if not line:
                break  # blank line terminates warc-fields
            k, _, v = line.decode("utf-8").partition(":")
            headers[k.strip()] = v.strip()
        n = int(headers["Content-Length"])
        body = data[pos : pos + n]
        if len(body) != n:
            raise ValueError("truncated body")
        pos += n
        if data[pos : pos + 4] != b"\r\n\r\n":
            raise ValueError(f"missing record tail at byte {pos}")
        pos += 4
        yield start, pos - start, headers, body


class _RotatingWarcWriter:
    """Size-rotated .warc file family for one Spark partition
    (worker_warc_writer.forward_if_filesize analog)."""

    def __init__(self, out_dir: str, part: str, rotate_bytes: int) -> None:
        self.out_dir, self.part, self.rotate = out_dir, part, rotate_bytes
        self.idx = 0
        self.f = None
        self.paths: list[str] = []
        self.sizes: list[int] = []
        self.counts: list[int] = []

    def _open(self) -> None:
        path = os.path.join(self.out_dir, f"atra-{self.part}-{self.idx:04d}.warc")
        self.f = open(path, "wb")
        self.paths.append(path)
        self.sizes.append(0)
        self.counts.append(0)

    def write_record(self, rec: bytes) -> None:
        if self.f is None:
            self._open()
        self.f.write(rec)
        self.sizes[-1] += len(rec)
        self.counts[-1] += 1
        if self.sizes[-1] >= self.rotate:  # rotate AFTER the record completes
            self.f.close()
            self.f = None
            self.idx += 1

    def close(self):
        if self.f is not None:
            self.f.close()
            self.f = None


def export_warc(
    results: DataFrame,
    pages: DataFrame,
    out_dir: str,
    rotate_bytes: int = ROTATE_BYTES,
    max_segment_bytes: int = MAX_SEGMENT_BYTES,
    dedup_payloads: bool = False,
) -> DataFrame:
    """Write size-rotated ``.warc`` files per partition under
    ``out_dir``; payloads over ``max_segment_bytes`` become
    continuation-record chains. ``results`` supplies metadata (url,
    fetched_at, status, headers); payload bytes come from the pages
    table. Returns a report DataFrame (path, records, bytes) — the
    per-file lineage of the export.

    ``dedup_payloads=True`` enables digest-based payload dedup (the
    Common-Crawl archive convention): within the export, rows sharing
    a PAYLOAD digest (entity bytes only, so per-fetch header noise like
    Date/Set-Cookie never defeats the dedup) store the bytes ONCE —
    the first by (fetched_at, url) writes the full ``response`` record,
    every other occurrence writes a ``revisit`` record
    (identical-payload-digest profile) quoting the CANONICAL record's
    stored WARC-Payload-Digest, as the profile requires. Cost: one
    extra Arrow-batched digest pass and ONE shuffle keyed on the digest
    (the window that elects the canonical row); revisit rows drop their
    payload bytes at the window, so the written archive — and every
    downstream byte — shrinks by the duplicate mass. At cluster scale
    pre-bucketing results by digest makes the window exchange-free, the
    seen-index alignment pattern."""
    os.makedirs(out_dir, exist_ok=True)
    session_tz = results.sparkSession.conf.get(
        "spark.sql.session.timeZone", "UTC"
    ) or "UTC"
    res = results.filter(F.col("status") == 200)
    if "headers" not in res.columns:
        res = res.withColumn("headers", F.create_map().cast("map<string,string>"))
    rows = res.select("url", "fetched_at", "status", "headers").join(
        pages.select("url", "html"), on="url", how="inner"
    )

    if dedup_payloads:
        from pyspark.sql import Window

        in_cols = "url string, fetched_at timestamp, status int, " \
                  "headers map<string,string>, html binary"

        def add_digest(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                dedup_keys, body_digs = [], []
                for i in range(len(pdf)):
                    hdrs = pdf["headers"].iat[i]
                    if hdrs is not None and not isinstance(hdrs, dict):
                        hdrs = dict(hdrs)
                    payload = bytes(pdf["html"].iat[i])
                    # group on payload bytes alone; the stored record
                    # digest still covers the packed body (the
                    # reference's digest surface, toolkit/digest.rs)
                    dedup_keys.append(_labeled_digest(payload))
                    body = (
                        _http_header_block(
                            int(pdf["status"].iat[i]), hdrs, len(payload), "text/html"
                        )
                        + payload
                    )
                    body_digs.append(_labeled_digest(body))
                yield pdf.assign(dedup_key=dedup_keys, payload_digest=body_digs)

        rows = rows.mapInPandas(
            add_digest, in_cols + ", dedup_key string, payload_digest string"
        )
        w = Window.partitionBy("dedup_key").orderBy("fetched_at", "url")
        rows = (
            rows.withColumn("n_payload", F.octet_length("html"))
            .withColumn("rn", F.row_number().over(w))
            .withColumn("refers_to_url", F.first("url").over(w))
            .withColumn("refers_to_date", F.first("fetched_at").over(w))
            # revisit records quote the canonical's stored digest
            .withColumn("payload_digest", F.first("payload_digest").over(w))
            .withColumn(
                "html",
                F.when(F.col("rn") > 1, F.lit(None).cast("binary")).otherwise(
                    F.col("html")
                ),
            )
            .drop("dedup_key")
        )

    def write_partition(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import socket
        import threading

        part = f"{socket.gethostname()}-{threading.get_ident()}-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        w = _RotatingWarcWriter(out_dir, part, rotate_bytes)
        for pdf in batches:
            for i in range(len(pdf)):
                hdrs = pdf["headers"].iat[i] if "headers" in pdf.columns else None
                if hdrs is not None and not isinstance(hdrs, dict):
                    hdrs = dict(hdrs)
                status = int(pdf["status"].iat[i]) if "status" in pdf.columns else 200
                if "rn" in pdf.columns and int(pdf["rn"].iat[i]) > 1:
                    w.write_record(
                        warc_revisit_record(
                            pdf["url"].iat[i],
                            pdf["fetched_at"].iat[i],
                            pdf["payload_digest"].iat[i],
                            pdf["refers_to_url"].iat[i],
                            pdf["refers_to_date"].iat[i],
                            int(pdf["n_payload"].iat[i]),
                            "text/html",
                            status,
                            hdrs,
                            session_tz,
                            occurrence=int(pdf["rn"].iat[i]),
                        )
                    )
                    continue
                for rec in warc_records(
                    pdf["url"].iat[i],
                    pdf["fetched_at"].iat[i],
                    bytes(pdf["html"].iat[i]),
                    "text/html",
                    status,
                    hdrs,
                    max_segment_bytes,
                    session_tz,
                ):
                    w.write_record(rec)
        w.close()
        if w.paths:
            yield pd.DataFrame(
                list(zip(w.paths, w.counts, w.sizes)),
                columns=["path", "records", "bytes"],
            )

    return rows.mapInPandas(write_partition, _EXPORT_REPORT)


# ---------------------------------------------------------------------------
# WET / WAT derivative exports — the Common-Crawl product family over
# the same rotated-WARC container: WET carries the EXTRACTED TEXT as
# `conversion` records (what text-corpus pipelines actually consume),
# WAT carries per-page metadata as `metadata` records with a JSON
# envelope. Both reuse the record grammar and the per-partition
# rotating writer, so `sources/warc.scan_warc_records` reads them back
# with zero format fork.
# ---------------------------------------------------------------------------
def _derivative_record(
    warc_type: str,
    suffix: str,
    url: str,
    ts,
    payload: bytes,
    content_type: str,
    session_tz: str,
) -> bytes:
    date = _utc_warc_date(ts, session_tz)
    rid = uuid.uuid5(uuid.NAMESPACE_URL, f"{url}#{suffix}").urn
    orig = uuid.uuid5(uuid.NAMESPACE_URL, url).urn  # the response record
    dig = _labeled_digest(payload)  # block == payload: one hash pass
    fields = [
        ("WARC-Type", warc_type),
        ("WARC-Record-ID", f"<{rid}>"),
        ("WARC-Date", date),
        ("WARC-Target-URI", url),
        ("WARC-Refers-To", f"<{orig}>"),
        ("Content-Type", content_type),
        ("WARC-Payload-Digest", dig),
        ("WARC-Block-Digest", dig),
        ("Content-Length", str(len(payload))),
    ]
    return _warc_headers(fields) + payload + b"\r\n\r\n"


def _export_derivative(
    rows: DataFrame,
    out_dir: str,
    rotate_bytes: int,
    make_payload,
    warc_type: str,
    suffix: str,
    content_type: str,
) -> DataFrame:
    os.makedirs(out_dir, exist_ok=True)
    session_tz = rows.sparkSession.conf.get(
        "spark.sql.session.timeZone", "UTC"
    ) or "UTC"

    def write_partition(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import socket
        import threading

        part = f"{socket.gethostname()}-{threading.get_ident()}-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        w = _RotatingWarcWriter(out_dir, part, rotate_bytes)
        for pdf in batches:
            for i in range(len(pdf)):
                w.write_record(
                    _derivative_record(
                        warc_type,
                        suffix,
                        pdf["url"].iat[i],
                        pdf["fetched_at"].iat[i],
                        make_payload(pdf, i, session_tz),
                        content_type,
                        session_tz,
                    )
                )
        w.close()
        if w.paths:
            yield pd.DataFrame(
                list(zip(w.paths, w.counts, w.sizes)),
                columns=["path", "records", "bytes"],
            )

    return rows.mapInPandas(write_partition, _EXPORT_REPORT)


def export_wet(
    results: DataFrame,
    out_dir: str,
    rotate_bytes: int = ROTATE_BYTES,
) -> DataFrame:
    """WET export: one ``conversion`` record per result row carrying
    the utf-8 EXTRACTED TEXT as a text/plain payload, WARC-Refers-To
    the page's response record (uuid5 of the url, the write.rs:80-86
    id rule). ``results`` needs (url, fetched_at, text). Same
    size-rotated one-file-per-partition layout as export_warc; returns
    the same (path, records, bytes) report."""
    rows = results.select("url", "fetched_at", "text").filter(
        F.col("text").isNotNull()
    )

    def payload(pdf: pd.DataFrame, i: int, session_tz: str) -> bytes:
        return str(pdf["text"].iat[i]).encode("utf-8")

    return _export_derivative(
        rows, out_dir, rotate_bytes, payload, "conversion", "wet", "text/plain"
    )


def export_wat(
    results: DataFrame,
    out_dir: str,
    rotate_bytes: int = ROTATE_BYTES,
) -> DataFrame:
    """WAT export: one ``metadata`` record per result row with a JSON
    envelope (url, fetch time, status, language, text length, link
    count — the fields the engine's results table carries). Missing
    optional columns are simply absent from the envelope, so any
    results-shaped table exports."""
    import json

    opt = [c for c in ("status", "lang", "n_links", "text") if c in results.columns]
    rows = results.select("url", "fetched_at", *opt)

    def payload(pdf: pd.DataFrame, i: int, session_tz: str) -> bytes:
        env: dict = {"url": pdf["url"].iat[i]}
        ts = pdf["fetched_at"].iat[i]
        env["fetched_at"] = _utc_warc_date(ts, session_tz) if ts is not None else None
        if "status" in pdf.columns:
            env["status"] = int(pdf["status"].iat[i])
        if "lang" in pdf.columns:
            env["lang"] = pdf["lang"].iat[i]
        if "n_links" in pdf.columns:
            env["n_links"] = int(pdf["n_links"].iat[i])
        if "text" in pdf.columns and pdf["text"].iat[i] is not None:
            env["text_len"] = len(pdf["text"].iat[i])
        return json.dumps(env, sort_keys=True).encode("utf-8")

    return _export_derivative(
        rows, out_dir, rotate_bytes, payload, "metadata", "wat", "application/json"
    )


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
