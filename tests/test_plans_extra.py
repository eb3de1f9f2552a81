"""Export sinks, recovery/recrawl plans, sitemap source, streaming
ingest — the remaining SURVEY.md §2.1/§2.2/§2.8 operators."""

import datetime
import os
import uuid

import pytest
from pyspark.sql import functions as F

from atra_spark.plans.export import edges_to_turtle, export_turtle, export_warc
from atra_spark.plans.recover import (
    rebuild_frontier_from_seen,
    recover,
    recrawl_candidates,
)
from atra_spark.schemas import (
    KIND_DISCOVERED,
    KIND_INTERNAL_ERROR,
    KIND_PROCESSED_AND_STORED,
    KIND_UNSET,
    SEEN_SCHEMA,
)
from atra_spark.sources.sitemap import parse_sitemap, sitemap_candidates

TS = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)


def _seen(spark, rows):
    data = [
        (u, h, k, KIND_UNSET, rc, s, TS, 0, 0, 0) for (u, h, k, rc, s) in rows
    ]
    return spark.createDataFrame(data, SEEN_SCHEMA)


class TestWarcExport:
    def test_roundtrip(self, spark, tmp_path):
        pages = spark.createDataFrame(
            [
                ("https://h.example/a", TS, b"<html>aaa</html>"),
                ("https://h.example/b", TS, b"<html>bbb</html>"),
            ],
            "url string, fetched_at timestamp, html binary",
        )
        results = pages.select(
            "url", "fetched_at", F.lit(200).alias("status")
        )
        out = str(tmp_path / "warc")
        report = export_warc(results, pages.select("url", "html"), out).collect()
        assert sum(r["records"] for r in report) == 2
        blob = b"".join(
            open(os.path.join(out, f), "rb").read() for f in sorted(os.listdir(out))
        )
        assert blob.count(b"WARC/1.1\r\n") == 2
        assert b"WARC-Target-URI: https://h.example/a" in blob
        rid = uuid.uuid5(uuid.NAMESPACE_URL, "https://h.example/a").urn
        assert f"<{rid}>".encode() in blob  # UUIDv5 record id (write.rs:80-86)
        assert b"<html>aaa</html>" in blob

    def test_segmentation_continuation_records(self, spark, tmp_path):
        """A payload over max_segment becomes a response record plus
        continuation records with segment numbers, origin id, and a
        total length on the last (warc_ext/write.rs:219-291)."""
        big = b"<html>" + b"x" * 5000 + b"</html>"
        pages = spark.createDataFrame(
            [("https://h.example/big", TS, big)],
            "url string, fetched_at timestamp, html binary",
        )
        results = pages.select("url", "fetched_at", F.lit(200).alias("status"))
        out = str(tmp_path / "warcseg")
        report = export_warc(
            results, pages.select("url", "html"), out, max_segment_bytes=2048
        ).collect()
        blob = b"".join(
            open(os.path.join(out, f), "rb").read() for f in sorted(os.listdir(out))
        )
        n_seg = blob.count(b"WARC-Segment-Number:")
        assert n_seg >= 3  # ~5 KB body / 2 KB segments
        assert blob.count(b"WARC-Type: response") == 1
        assert blob.count(b"WARC-Type: continuation") == n_seg - 1
        assert blob.count(b"WARC-Segment-Total-Length:") == 1
        rid = uuid.uuid5(uuid.NAMESPACE_URL, "https://h.example/big").urn
        assert blob.count(f"WARC-Segment-Origin-ID: <{rid}>".encode()) == n_seg
        # reassembled body carries the HTTP header block then payload
        assert b"HTTP/1.1 200 OK" in blob
        assert sum(r["records"] for r in report) == n_seg

    def test_size_rotation(self, spark, tmp_path):
        """Files rotate once they pass rotate_bytes: many records from
        one partition land in multiple .warc files."""
        rows = [
            (f"https://h.example/p{i}", TS, b"<html>" + bytes(str(i), "ascii") * 300 + b"</html>")
            for i in range(20)
        ]
        pages = spark.createDataFrame(
            rows, "url string, fetched_at timestamp, html binary"
        ).coalesce(1)
        results = pages.select("url", "fetched_at", F.lit(200).alias("status"))
        out = str(tmp_path / "warcrot")
        report = export_warc(
            results, pages.select("url", "html"), out, rotate_bytes=4096
        ).collect()
        assert len(report) > 1  # multiple files from one partition
        assert sum(r["records"] for r in report) == 20
        for r in report:
            assert os.path.exists(r["path"])

    def test_http_header_block_packing(self, spark, tmp_path):
        pages = spark.createDataFrame(
            [("https://h.example/a", TS, b"<html>hdr</html>")],
            "url string, fetched_at timestamp, html binary",
        )
        results = pages.select(
            "url",
            "fetched_at",
            F.lit(200).alias("status"),
            F.create_map(F.lit("X-Custom"), F.lit("v1")).alias("headers"),
        )
        out = str(tmp_path / "warchdr")
        export_warc(results, pages.select("url", "html"), out).collect()
        blob = b"".join(
            open(os.path.join(out, f), "rb").read() for f in sorted(os.listdir(out))
        )
        assert b"Content-Type: application/http;msgtype=response" in blob
        assert b"HTTP/1.1 200 OK\r\n" in blob
        assert b"X-Custom: v1\r\n" in blob
        assert b"WARC-Block-Digest: " in blob

    def test_skips_errors(self, spark, tmp_path):
        pages = spark.createDataFrame(
            [("https://h.example/a", TS, b"x")],
            "url string, fetched_at timestamp, html binary",
        )
        results = spark.createDataFrame(
            [("https://h.example/a", TS, 404)],
            "url string, fetched_at timestamp, status int",
        )
        report = export_warc(results, pages.select("url", "html"), str(tmp_path / "w")).collect()
        assert sum(r["records"] for r in report) == 0


class TestTurtleExport:
    def test_predicates_and_file(self, spark, tmp_path):
        edges = spark.createDataFrame(
            [
                ("h.example", "https://h.example/a", "seed", 0),
                ("https://h.example/a", "https://h.example/b", "link", 1),
            ],
            "src string, dst string, kind string, round int",
        )
        lines = {r["line"] for r in edges_to_turtle(edges).collect()}
        assert "<h.example> atra:has_seed <https://h.example/a> ." in lines
        assert "<https://h.example/a> atra:links_to <https://h.example/b> ." in lines
        out = str(tmp_path / "graph.ttl")
        n = export_turtle(edges, out)
        assert n == 2
        content = open(out).read()
        assert content.startswith("@prefix atra:")


class TestRecover:
    def test_rebuild_filters_processed(self, spark):
        seen = _seen(
            spark,
            [
                ("https://h/a", "h", KIND_PROCESSED_AND_STORED, False, True),
                ("https://h/b", "h", KIND_DISCOVERED, False, False),
                ("https://h/c", "h", KIND_INTERNAL_ERROR, False, False),
            ],
        )
        rows = {r["url"]: r for r in rebuild_frontier_from_seen(seen, 5).collect()}
        assert set(rows) == {"https://h/b", "https://h/c"}
        assert rows["https://h/b"]["enqueue_round"] == 5

    def test_recover_via_store(self, spark, tmp_path):
        from atra_spark.sources.store import CheckpointStore

        store = CheckpointStore(str(tmp_path), num_buckets=4)
        seen = _seen(
            spark,
            [
                ("https://h/a", "h", KIND_PROCESSED_AND_STORED, False, True),
                ("https://h/b", "h", KIND_DISCOVERED, False, False),
            ],
        )
        store.write_snapshot("seen", seen, 3, bucket_by="host")
        n = recover(spark, store)
        assert n == 1
        fr = store.read_snapshot(spark, "frontier")
        assert [r["url"] for r in fr.collect()] == ["https://h/b"]

    def test_recrawl_candidates(self, spark):
        seen = _seen(
            spark,
            [
                ("https://h/a", "h", KIND_PROCESSED_AND_STORED, True, False),   # old + recrawl
                ("https://h/b", "h", KIND_PROCESSED_AND_STORED, False, False),  # no recrawl
                ("https://h/c", "h", KIND_DISCOVERED, True, False),             # wrong state
            ],
        )
        now = datetime.datetime(2024, 1, 2, tzinfo=datetime.timezone.utc)
        rows = [r["url"] for r in recrawl_candidates(seen, now, 3600, 9).collect()]
        assert rows == ["https://h/a"]


SITEMAP_XML = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://h.example/p1.html</loc></url>
  <url><loc>https://h.example/p2.html#frag</loc></url>
  <url><loc>/relative.html</loc></url>
  <url><loc>ftp://bad.example/x</loc></url>
</urlset>"""


class TestSitemap:
    def test_parse(self):
        locs, refs = parse_sitemap(SITEMAP_XML)
        assert len(locs) == 4 and locs[0] == "https://h.example/p1.html"
        assert refs == []

    def test_parse_index(self):
        xml = (
            b'<?xml version="1.0"?><sitemapindex>'
            b"<sitemap><loc>https://h.example/sm1.xml</loc></sitemap>"
            b"<sitemap><loc>https://h.example/sm2.xml</loc></sitemap>"
            b"</sitemapindex>"
        )
        locs, refs = parse_sitemap(xml)
        assert locs == []
        assert refs == ["https://h.example/sm1.xml", "https://h.example/sm2.xml"]

    def test_robots_declared_and_index_recursion(self, spark):
        """Sitemap: lines in robots.txt are followed (sitemaps.rs:35-50)
        and a <sitemapindex> recurses one level into nested sitemaps."""
        from atra_spark.sources.sitemap import robots_declared_sitemaps

        index_xml = (
            b"<sitemapindex><sitemap><loc>https://h.example/nested.xml</loc>"
            b"</sitemap></sitemapindex>"
        )
        nested_xml = b"<urlset><url><loc>https://h.example/deep.html</loc></url></urlset>"
        pages = spark.createDataFrame(
            [
                ("https://h.example/custom-map.xml", TS, index_xml, None, None),
                ("https://h.example/nested.xml", TS, nested_xml, None, None),
            ],
            "url string, warc_ts timestamp, html binary, text string, lang string",
        )
        robots = spark.createDataFrame(
            [
                (
                    "h.example",
                    b"User-agent: *\nSitemap: https://h.example/custom-map.xml\n",
                    200,
                    TS,
                )
            ],
            "host string, robots_txt binary, status int, retrieved_at timestamp",
        )
        declared = {r["sitemap_url"] for r in robots_declared_sitemaps(robots).collect()}
        assert declared == {"https://h.example/custom-map.xml"}
        rows = {r["url"] for r in sitemap_candidates(pages, robots).collect()}
        assert "https://h.example/deep.html" in rows  # via index recursion
        assert "https://h.example/nested.xml" not in rows  # refs are not candidates

    def test_candidates(self, spark):
        pages = spark.createDataFrame(
            [
                ("https://h.example/sitemap.xml", TS, SITEMAP_XML, None, None),
                ("https://h.example/p1.html", TS, b"<html></html>", None, None),
            ],
            "url string, warc_ts timestamp, html binary, text string, lang string",
        )
        rows = {r["url"]: r for r in sitemap_candidates(pages).collect()}
        assert "https://h.example/p1.html" in rows
        assert "https://h.example/p2.html" in rows  # fragment stripped
        assert "https://h.example/relative.html" in rows  # base-resolved
        assert not any(u.startswith("ftp") for u in rows)
        assert rows["https://h.example/p1.html"]["host"] == "h.example"


class TestStreamingIngest:
    def test_available_now_drains_and_matches_batch(self, spark, tmp_path, fixture_set):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from atra_spark.streaming.ingest import run_ingest

        landing = tmp_path / "landing"
        landing.mkdir()
        sample = fixture_set.pages[:50]
        tbl = pa.table(
            {
                "url": [p[0] for p in sample],
                "warc_ts": pa.array([p[1] for p in sample], pa.timestamp("us", "UTC")),
                "html": [p[2] for p in sample],
                "text": pa.array([None] * len(sample), pa.string()),
                "lang": pa.array([None] * len(sample), pa.string()),
            }
        )
        pq.write_table(tbl, str(landing / "batch0.parquet"))

        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        run_ingest(spark, str(landing), out, ckpt, available_now=True)
        got = {r["url"]: r for r in spark.read.parquet(out).collect()}
        assert len(got) == 50
        golden = {p[0]: (p[3], p[4]) for p in sample}
        for url, row in got.items():
            assert row["text"] == golden[url][0]  # byte-identical via stream too
            assert row["lang"] == golden[url][1]

        # exactly-once: draining again with the same checkpoint adds nothing
        run_ingest(spark, str(landing), out, ckpt, available_now=True)
        assert spark.read.parquet(out).count() == 50


class TestStreamingPoliteness:
    """applyInPandasWithState per-host crawl-delay throttle: state must
    persist ACROSS micro-batches (maxFilesPerTrigger=1 forces one batch
    per landing file)."""

    def _run(self, spark, tmp_path, waves, delay_ms):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from atra_spark.streaming.politeness import throttle_hosts

        landing = tmp_path / "landing"
        landing.mkdir()
        for i, wave in enumerate(waves):
            tbl = pa.table(
                {
                    "url": [w[0] for w in wave],
                    "host": [w[1] for w in wave],
                    "warc_ts": pa.array([w[2] for w in wave], pa.timestamp("us", "UTC")),
                }
            )
            pq.write_table(tbl, str(landing / f"wave{i}.parquet"))
        schema = "url string, host string, warc_ts timestamp"
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(landing))
        )
        out = str(tmp_path / "out")
        q = (
            throttle_hosts(stream, crawl_delay_ms=delay_ms)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {r["url"]: r["admitted"] for r in spark.read.parquet(out).collect()}

    def test_delay_enforced_within_and_across_batches(self, spark, tmp_path):
        from datetime import datetime, timezone

        t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)

        def ts(ms):
            return datetime.fromtimestamp(t0.timestamp() + ms / 1000, tz=timezone.utc)

        # wave 0: h1 at 0ms (admit), 500ms (reject: < 1000ms), 1200ms (admit)
        # wave 1 (NEXT micro-batch): h1 at 1900ms must be rejected —
        # only state carried from wave 0 (last admit at 1200) can know that;
        # 2300ms admits. h2 is independent state.
        waves = [
            [
                ("u0", "h1", ts(0)),
                ("u1", "h1", ts(500)),
                ("u2", "h1", ts(1200)),
                ("v0", "h2", ts(100)),
            ],
            [
                ("u3", "h1", ts(1900)),
                ("u4", "h1", ts(2300)),
                ("v1", "h2", ts(800)),
                ("v2", "h2", ts(1150)),
            ],
        ]
        got = self._run(spark, tmp_path, waves, delay_ms=1000)
        assert got == {
            "u0": True, "u1": False, "u2": True,
            "u3": False, "u4": True,
            "v0": True, "v1": False, "v2": True,
        }

    def test_rejected_rows_are_emitted_not_dropped(self, spark, tmp_path):
        from datetime import datetime, timezone

        t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
        waves = [[("a", "h", t0), ("b", "h", t0)]]
        got = self._run(spark, tmp_path, waves, delay_ms=60000)
        assert len(got) == 2 and sum(got.values()) == 1


class TestXxh128Digest:
    """WARC digests must be byte-format-identical to the reference's
    labeled_xxh128_digest (toolkit/digest.rs:22-38): 'XXH128:' +
    padded RFC4648 BASE32 of xxh3_128 big-endian bytes."""

    def test_canonical_empty_vector(self):
        from atra_spark.functions.digest import (
            digest_impl_name,
            labeled_xxh128_digest,
            xxh3_128,
        )

        assert digest_impl_name() in ("xxhash", "ctypes")  # real xxh3 on this host
        # canonical XXH3-128 sanity value for empty input (upstream xxHash)
        assert xxh3_128(b"") == 0x99AA06D3014798D86001C324468D497F
        import base64

        expect = "XXH128:" + base64.b32encode(
            (0x99AA06D3014798D86001C324468D497F).to_bytes(16, "big")
        ).decode()
        assert labeled_xxh128_digest(b"") == expect
        assert expect.endswith("======")  # data_encoding::BASE32 pads

    def test_digest_stability_and_distinctness(self):
        from atra_spark.functions.digest import labeled_xxh128_digest

        a = labeled_xxh128_digest(b"hello world")
        assert a == labeled_xxh128_digest(b"hello world")
        assert a != labeled_xxh128_digest(b"hello worle")
        assert a.startswith("XXH128:") and len(a) == 7 + 32

    def test_warc_records_carry_xxh128(self, spark):
        from atra_spark.plans.export import _labeled_digest

        assert _labeled_digest(b"payload").startswith("XXH128:")


class TestWarcReferenceFixtures:
    """Assertions transcribed from the reference warc crate's own
    in-source tests (VERDICT r3 #8) — the behaviors its writer state
    machine + cursor guarantee, pinned against OUR writer/reader:

    - record grammar ``header CRLF block CRLF CRLF`` with version
      "WARC/1.1" (warc/src/writer.rs:24-30 doc grammar + BODY_TAIL,
      header.rs:35 WARC_VERSION)
    - header serialization: every field line CRLF-terminated, fields
      closed by one blank CRLF line (header.rs write_to:381-402)
    - the two-record fixture of writer.rs test::build_test_warc
      (:218-230): bodies A1 (36 bytes) and A2 (64 bytes), where A2
      embeds "\\n\\r\\n\\rWARC/1.1\\r\\n" — reader.rs test::can_read
      (:509-551) requires a content-length-driven reader to recover
      BOTH bodies byte-identically and reach EOS without mistaking
      the embedded version string for a record start
    """

    # writer.rs:218-221, byte-exact
    A1 = b"Hallo Welt,\n\n das hier ist ein test!"
    A2 = b"Ich bin auch eine testfile \n\r\n\rWARC/1.1\r\n Aber das macht nichts!"

    def _build_test_warc(self) -> bytes:
        from atra_spark.plans.export import warc_records

        recs = []
        for url, body in (
            ("https://amazon.example/", self.A1),
            ("https://ebay.example/", self.A2),
        ):
            recs.extend(warc_records(url, TS, body))
        return b"".join(recs)

    def test_reference_body_lengths(self):
        # the reference pins A1/A2 as fixed-size arrays [u8; 36]/[u8; 64]
        assert len(self.A1) == 36 and len(self.A2) == 64

    def test_can_read_two_records_with_embedded_version_string(self):
        """reader.rs test::can_read: both entries come back complete,
        in order, and the cursor reaches EOS."""
        from atra_spark.plans.export import iter_warc_records

        blob = self._build_test_warc()
        got = list(iter_warc_records(blob))  # raises = NotAHeader analog
        assert len(got) == 2, "embedded WARC/1.1 must not split record 2"
        # bodies are http-header-block + payload; payload recovered
        # byte-identically after the blank line
        for (headers, body), want in zip(got, (self.A1, self.A2)):
            assert body.endswith(want)
            assert int(headers["Content-Length"]) == len(body)
            assert headers["WARC-Type"] == "response"

    def test_record_grammar(self):
        """writer.rs:24-30: warc-record = header CRLF block CRLF CRLF;
        version = "WARC/1.1" CRLF; warc-fields = *named-field CRLF."""
        from atra_spark.plans.export import warc_records

        (rec,) = list(warc_records("https://google.example/", TS, b"x" * 123))
        assert rec.startswith(b"WARC/1.1\r\n")
        head, sep, rest = rec.partition(b"\r\n\r\n")
        assert sep, "header must terminate with a blank CRLF line"
        for line in head.split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            assert k and v.strip(), f"malformed named-field {line!r}"
        assert rec.endswith(b"\r\n\r\n"), "BODY_TAIL after every block"
        # content_length field drives the body span exactly
        # (create_test_header passes the body length, parser.rs:243)
        import re as _re

        m = _re.search(rb"Content-Length: (\d+)", head)
        body = rest[: int(m.group(1))]
        assert body.endswith(b"x" * 123)
        assert rest[int(m.group(1)):] == b"\r\n\r\n"

    def test_header_field_inventory_matches_reference(self):
        """parser.rs test::create_test_header (:220-267) populates the
        reference's response-record field set; our response records
        must carry the same WARC-standard core fields."""
        from atra_spark.plans.export import iter_warc_records

        blob = self._build_test_warc()
        headers, _ = next(iter_warc_records(blob))
        for field in (
            "WARC-Type",
            "WARC-Record-ID",
            "WARC-Date",
            "WARC-Target-URI",
            "Content-Type",
            "WARC-Block-Digest",
            "WARC-Payload-Digest",
            "Content-Length",
        ):
            assert field in headers, f"missing {field}"
        # record id grammar: <urn:uuid:...> (uuid::Urn, parser.rs:226)
        assert headers["WARC-Record-ID"].startswith("<urn:uuid:")
        assert headers["WARC-Record-ID"].endswith(">")

    def test_not_a_header_raises(self):
        """reader.rs WarcCursorReadError::NotAHeader: garbage where a
        header must start is an error, not a silent skip."""
        from atra_spark.plans.export import iter_warc_records

        blob = self._build_test_warc()
        with pytest.raises(ValueError, match="not a header"):
            list(iter_warc_records(b"lol\r\n\r\n" + blob))
        # truncated tail is an error too (state machine can't close)
        with pytest.raises(ValueError):
            list(iter_warc_records(blob[:-2]))

    def test_segmented_roundtrip_reassembles(self, spark):
        """Segmentation invariant (warc_ext/write.rs segmentation +
        reader cursor): continuation chain re-concatenates to the
        exact original body."""
        from atra_spark.plans.export import iter_warc_records, warc_records

        payload = bytes(range(256)) * 40  # 10240 bytes, binary
        recs = list(
            warc_records("https://seg.example/", TS, payload, max_segment=4096)
        )
        assert len(recs) > 1
        got = list(iter_warc_records(b"".join(recs)))
        assert got[0][0]["WARC-Type"] == "response"
        assert all(h["WARC-Type"] == "continuation" for h, _ in got[1:])
        reassembled = b"".join(b for _, b in got)
        assert reassembled.endswith(payload)
        assert got[-1][0]["WARC-Segment-Total-Length"] == str(len(reassembled))


class TestStreamingSessions:
    """sessionize_stream: the batch session_window aggregation run
    under Structured Streaming — session fragments must MERGE across
    micro-batches via the state store, and append mode must emit each
    session exactly once after the watermark passes it."""

    def test_sessions_merge_across_microbatches(self, spark, tmp_path):
        from datetime import datetime, timezone

        import pyarrow as pa
        import pyarrow.parquet as pq

        from atra_spark.functions.sessions import sessionize_stream

        t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)

        def ts(minutes):
            return datetime.fromtimestamp(t0.timestamp() + minutes * 60, tz=timezone.utc)

        # wave0: user 1 events at 0 and 10 min; wave1 (NEXT micro-batch):
        # user 1 at 20 min — merges into the SAME session only if fragment
        # state survives the batch boundary — and at 120 min (new session).
        # waves 2-3: far-future flush events advance the watermark so the
        # earlier sessions finalize and emit in append mode.
        waves = [
            [(1, ts(0), 1, 1.0), (2, ts(10), 1, 2.0)],
            [(3, ts(20), 1, 4.0), (4, ts(120), 1, 8.0)],
            [(90, ts(3000), 99, 0.0)],
            [(91, ts(6000), 99, 0.0)],
        ]
        landing = tmp_path / "landing"
        landing.mkdir()
        for i, wave in enumerate(waves):
            pq.write_table(
                pa.table(
                    {
                        "event_id": pa.array([w[0] for w in wave], pa.int64()),
                        "ts": pa.array([w[1] for w in wave], pa.timestamp("us", "UTC")),
                        "user_id": pa.array([w[2] for w in wave], pa.int64()),
                        "value": pa.array([w[3] for w in wave], pa.float64()),
                    }
                ),
                str(landing / f"wave{i}.parquet"),
            )
        stream = (
            spark.readStream.schema("event_id long, ts timestamp, user_id long, value double")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(landing))
        )
        out = str(tmp_path / "out")
        q = (
            sessionize_stream(stream, gap="30 minutes", watermark="1 minute")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = sorted(
            (r for r in spark.read.parquet(out).collect() if r["user_id"] == 1),
            key=lambda r: r["session_start"],
        )
        assert len(rows) == 2, f"expected 2 finalized sessions, got {rows}"
        first, second = rows
        # the 0/10/20-min events ended up in ONE session spanning batches
        assert first["n_events"] == 3 and first["sum_value"] == 7.0
        assert first["session_start"].startswith("2024-01-01 00:00:00")
        assert first["session_end_ts"].startswith("2024-01-01 00:20:00")
        assert second["n_events"] == 1 and second["sum_value"] == 8.0


class TestStreamingWindowRollup:
    """window_rollup under Structured Streaming: tumbling buckets emit
    once the watermark passes; counts accumulate across micro-batches
    into the same bucket."""

    def test_buckets_accumulate_across_microbatches(self, spark, tmp_path):
        from datetime import datetime, timezone

        import pyarrow as pa
        import pyarrow.parquet as pq

        from atra_spark.functions.sessions import window_rollup

        t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)

        def ts(minutes):
            return datetime.fromtimestamp(t0.timestamp() + minutes * 60, tz=timezone.utc)

        waves = [
            [(1, ts(5), "a", 1.0)],
            [(2, ts(40), "a", 2.0)],   # SAME 1-hour bucket, next batch
            [(3, ts(70), "a", 4.0)],   # next bucket
            [(90, ts(3000), "z", 0.0)],  # watermark flush
            [(91, ts(6000), "z", 0.0)],
        ]
        landing = tmp_path / "landing"
        landing.mkdir()
        for i, wave in enumerate(waves):
            path = str(landing / f"wave{i}.parquet")
            pq.write_table(
                pa.table(
                    {
                        "event_id": pa.array([w[0] for w in wave], pa.int64()),
                        "ts": pa.array([w[1] for w in wave], pa.timestamp("us", "UTC")),
                        "event_type": pa.array([w[2] for w in wave], pa.string()),
                        "value": pa.array([w[3] for w in wave], pa.float64()),
                    }
                ),
                path,
            )
            # FileStreamSource orders files by modification time; fast
            # back-to-back writes can collide on coarse mtimes under
            # load, making maxFilesPerTrigger=1 process the watermark-
            # flush waves out of order (observed flake). Stamp strictly
            # increasing mtimes so the wave order is deterministic.
            import os as _os

            _os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
        stream = (
            spark.readStream.schema("event_id long, ts timestamp, event_type string, value double")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(landing))
        )
        out = str(tmp_path / "out")
        q = (
            window_rollup(stream.withWatermark("ts", "1 minute"), duration="1 hour")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = {
            (r["window_start"][:13], r["key"]): (r["n_events"], r["sum_value"])
            for r in spark.read.parquet(out).collect()
            if r["key"] == "a"
        }
        # events from batches 0 and 1 accumulated into ONE hour bucket
        assert rows[("2024-01-01 00", "a")] == (2, 3.0)
        assert rows[("2024-01-01 01", "a")] == (1, 4.0)


class TestStreamingArchiveSink:
    """foreachBatch WARC+CDX sink: micro-batches land as batch-keyed
    archive directories + index partitions; replays converge instead
    of duplicating; the batch reader gets the same bytes back."""

    def _landing(self, tmp_path, fixture_set, name, pages):
        import pyarrow as pa
        import pyarrow.parquet as pq

        landing = tmp_path / "landing"
        landing.mkdir(exist_ok=True)
        tbl = pa.table(
            {
                "url": [p[0] for p in pages],
                "warc_ts": pa.array([p[1] for p in pages], pa.timestamp("us", "UTC")),
                "html": [p[2] for p in pages],
                "text": pa.array([None] * len(pages), pa.string()),
                "lang": pa.array([None] * len(pages), pa.string()),
            }
        )
        pq.write_table(tbl, str(landing / name))
        return str(landing)

    def test_archive_grows_per_batch_and_replays_converge(
        self, spark, tmp_path, fixture_set
    ):
        import glob

        from atra_spark.sources.warc import read_warc_pages
        from atra_spark.streaming.ingest import run_archive_sink

        first = fixture_set.pages[:30]
        landing = self._landing(tmp_path, fixture_set, "b0.parquet", first)
        archive = str(tmp_path / "archive")
        cdx = str(tmp_path / "cdx")
        ckpt = str(tmp_path / "ckpt")
        run_archive_sink(spark, landing, archive, cdx, ckpt)

        warcs = glob.glob(f"{archive}/batch=*/*.warc")
        assert warcs
        got = {
            r["url"]: bytes(r["html"])
            for r in read_warc_pages(
                spark, sorted(glob.glob(f"{archive}/batch=*"))[0]
            ).collect()
        }
        assert got == {p[0]: p[2] for p in first}
        assert spark.read.parquet(cdx).count() == 30

        # drain again with no new data: nothing changes
        run_archive_sink(spark, landing, archive, cdx, ckpt)
        assert spark.read.parquet(cdx).count() == 30

        # a second landing file becomes a SECOND batch directory
        self._landing(tmp_path, fixture_set, "b1.parquet", fixture_set.pages[30:50])
        run_archive_sink(spark, landing, archive, cdx, ckpt)
        assert len(glob.glob(f"{archive}/batch=*")) == 2
        idx = spark.read.parquet(cdx)
        assert idx.count() == 50
        assert idx.select("url").distinct().count() == 50
