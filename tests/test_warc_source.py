"""WARC archive read path: distributed scan, continuation reassembly,
CDX index build, and SURT keys (sources/warc.py, jvm_url.surt_col).

The roundtrip property pinned here is the one a reprocessing user
relies on: export_warc -> read_warc_pages returns payloads
byte-identical to the pages table that was exported, and
build_cdx offsets give O(1) random access into the archive
(atra/src/stores/warc.rs:119-140's skip-pointer economics served from
an index)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from atra_spark.functions.jvm_url import surt_col
from atra_spark.plans.export import export_warc, iter_warc_spans
from atra_spark.sources.warc import (
    build_cdx,
    list_warc_files,
    read_warc_pages,
    scan_warc_records,
    write_cdxj,
)
from atra_spark.urlkit import surt_key

import datetime

TS = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)


def _export(spark, tmp_path, rows, **kw):
    pages = spark.createDataFrame(
        rows, "url string, fetched_at timestamp, html binary"
    )
    results = pages.select("url", "fetched_at", F.lit(200).alias("status"))
    out = str(tmp_path / "warc")
    export_warc(results, pages.select("url", "html"), out, **kw).collect()
    return pages, out


class TestWarcScan:
    def test_offsets_give_random_access(self, spark, tmp_path):
        rows = [
            (f"https://h{i % 3}.example/p{i}", TS, f"<html>{i:04d}</html>".encode())
            for i in range(12)
        ]
        _, out = _export(spark, tmp_path, rows)
        rec = scan_warc_records(spark, out).collect()
        assert len(rec) == 12
        blobs = {p: open(p, "rb").read() for p in list_warc_files(out)}
        for r in rec:
            span = blobs[r["warc_file"]][r["offset"] : r["offset"] + r["length"]]
            parsed = list(iter_warc_spans(span))
            assert len(parsed) == 1  # the span is exactly one record
            _, _, hdrs, body = parsed[0]
            assert hdrs["WARC-Record-ID"] == r["record_id"]
            assert hdrs["WARC-Target-URI"] == r["url"]
            assert body == bytes(r["body"])
        assert {r["http_status"] for r in rec} == {200}
        assert {r["mime"] for r in rec} == {"text/html"}

    def test_scan_without_payload_drops_body_only(self, spark, tmp_path):
        rows = [("https://h.example/a", TS, b"<html>aaa</html>")]
        _, out = _export(spark, tmp_path, rows)
        r = scan_warc_records(spark, out, with_payload=False).collect()[0]
        assert r["body"] is None
        assert r["http_status"] == 200 and r["length"] > 0


class TestWarcPagesRoundtrip:
    def test_payloads_byte_identical(self, spark, tmp_path):
        rows = [
            (f"https://h.example/p{i}", TS, f"<html><p>doc {i}</p></html>".encode())
            for i in range(8)
        ]
        pages, out = _export(spark, tmp_path, rows)
        back = read_warc_pages(spark, out)
        got = {r["url"]: r for r in back.collect()}
        assert set(got) == {u for (u, _, _) in rows}
        for u, _, html in rows:
            r = got[u]
            assert bytes(r["html"]) == html  # the byte-identical invariant
            assert r["http_status"] == 200
            assert r["mime"] == "text/html"
            assert r["n_segments"] == 1
        # stored payload digest matches a recompute over the full body
        from atra_spark.functions.digest import labeled_xxh128_digest
        from atra_spark.plans.export import _http_header_block

        u, _, html = rows[0]
        body = _http_header_block(200, None, len(html), "text/html") + html
        assert got[u]["payload_digest"] == labeled_xxh128_digest(body)

    def test_segmented_chain_reassembles(self, spark, tmp_path):
        big = b"<html>" + b"x" * 5000 + b"</html>"
        rows = [
            ("https://h.example/big", TS, big),
            ("https://h.example/small", TS, b"<html>s</html>"),
        ]
        _, out = _export(spark, tmp_path, rows, max_segment_bytes=2048)
        got = {r["url"]: r for r in read_warc_pages(spark, out).collect()}
        assert bytes(got["https://h.example/big"]["html"]) == big
        assert got["https://h.example/big"]["n_segments"] >= 3
        assert got["https://h.example/small"]["n_segments"] == 1
        assert bytes(got["https://h.example/small"]["html"]) == b"<html>s</html>"


class TestCdx:
    def test_index_lookup_and_sorted_shards(self, spark, tmp_path):
        rows = [
            (f"https://www.h{i % 4}.example/p{i}?b=2&a={i}", TS, f"<html>{i}</html>".encode())
            for i in range(16)
        ]
        _, out = _export(spark, tmp_path, rows)
        cdx = build_cdx(spark, out)
        idx = {r["url"]: r for r in cdx.collect()}
        assert len(idx) == 16
        # every index row random-accesses its record
        for u, r in idx.items():
            data = open(r["filename"], "rb").read()
            _, _, hdrs, _ = next(
                iter(iter_warc_spans(data[r["offset"] : r["offset"] + r["length"]]))
            )
            assert hdrs["WARC-Target-URI"] == u
            assert hdrs["WARC-Payload-Digest"] == r["digest"]
        # surt key: www stripped, host reversed, query sorted
        r0 = idx["https://www.h0.example/p0?b=2&a=0"]
        assert r0["surt"] == "example,h0)/p0?a=0&b=2"
        assert r0["ts14"] == "20240101000000"

        shard_dir = str(tmp_path / "cdxj")
        report = sorted(
            write_cdxj(cdx, shard_dir, shards=3).collect(),
            key=lambda r: r["first_key"],
        )
        # each shard file is sorted; shard ranges do not overlap
        prev_last = None
        total = 0
        for rep in report:
            lines = open(rep["path"], encoding="utf-8").read().splitlines()
            keys = [" ".join(ln.split(" ", 2)[:2]) for ln in lines]
            assert keys == sorted(keys)
            assert rep["first_key"] == keys[0] and rep["last_key"] == keys[-1]
            if prev_last is not None:
                assert prev_last <= rep["first_key"]
            prev_last = rep["last_key"]
            total += len(lines)
            meta = json.loads(lines[0].split(" ", 2)[2])
            assert set(meta) == {
                "url", "mime", "status", "digest", "length", "offset", "filename",
            }
        assert total == 16

    def test_segmented_chain_indexes_head_only(self, spark, tmp_path):
        big = b"<html>" + b"y" * 5000 + b"</html>"
        _, out = _export(
            spark, tmp_path, [("https://h.example/big", TS, big)],
            max_segment_bytes=2048,
        )
        rows = build_cdx(spark, out).collect()
        assert len(rows) == 1  # one line per page, not per segment
        data = open(rows[0]["filename"], "rb").read()
        _, _, hdrs, _ = next(
            iter(iter_warc_spans(
                data[rows[0]["offset"] : rows[0]["offset"] + rows[0]["length"]]
            ))
        )
        assert hdrs["WARC-Type"] == "response"
        assert hdrs.get("WARC-Segment-Number") == "1"


SURT_VECTORS = [
    ("https://www.Example.com/p/1?b=2&a=1", "com,example)/p/1?a=1&b=2"),
    ("http://example.com", "com,example)/"),
    ("https://sub.www2.example.co.uk/A/B#frag", "uk,co,example,www2,sub)/a/b"),
    ("https://www3.example.org:8443/x?z&y=", "org,example:8443)/x?y=&z"),
    ("http://example.com:80/q", "com,example)/q"),
    ("https://example.com:443/q?", "com,example)/q"),
    ("https://www.example.com/%7Euser/Page.HTML", "com,example)/%7euser/page.html"),
]


class TestSurt:
    @pytest.mark.parametrize("url,expected", SURT_VECTORS)
    def test_python_vectors(self, url, expected):
        assert surt_key(url) == expected

    def test_jvm_equals_python(self, spark):
        urls = [u for u, _ in SURT_VECTORS] + [
            "https://h0.example/p?x=1&x=0",  # duplicate param names sort
            "https://example.com/a?single",
        ]
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        got = {
            r["url"]: r["s"]
            for r in df.select("url", surt_col(F.col("url")).alias("s")).collect()
        }
        for u in urls:
            assert got[u] == surt_key(u), u

    def test_non_authority_is_null(self, spark):
        df = spark.createDataFrame([("mailto:x@example.com",)], "url string")
        assert df.select(surt_col(F.col("url")).alias("s")).collect()[0]["s"] is None
        assert surt_key("mailto:x@example.com") is None


class TestRevisitDedup:
    """Digest-based payload dedup: export_warc(dedup_payloads=True)
    stores each distinct payload once (first by fetched_at, url) and
    writes WARC 1.1 revisit records (identical-payload-digest profile)
    for the rest; the reader resolves them back to full pages."""

    # payloads comfortably larger than a revisit record's header
    # overhead (~450 B) so the dedup'd archive is measurably smaller
    ROWS = [
        (
            f"https://h.example/p{i:02d}",
            TS,
            (f"<html>group {i % 4} " + "x" * 2000 + "</html>").encode(),
        )
        for i in range(12)
    ]

    def _export(self, spark, tmp_path, dedup):
        pages = spark.createDataFrame(
            self.ROWS, "url string, fetched_at timestamp, html binary"
        )
        results = pages.select("url", "fetched_at", F.lit(200).alias("status"))
        out = str(tmp_path / ("dedup" if dedup else "plain"))
        rep = export_warc(
            results, pages.select("url", "html"), out, dedup_payloads=dedup
        ).collect()
        return out, sum(r["bytes"] for r in rep)

    def test_archive_shrinks_and_record_mix(self, spark, tmp_path):
        plain_out, plain_bytes = self._export(spark, tmp_path, dedup=False)
        dedup_out, dedup_bytes = self._export(spark, tmp_path, dedup=True)
        assert dedup_bytes < plain_bytes  # duplicate mass not re-stored
        blob = b"".join(
            open(p, "rb").read() for p in list_warc_files(dedup_out)
        )
        assert blob.count(b"WARC-Type: response") == 4
        assert blob.count(b"WARC-Type: revisit") == 8
        assert blob.count(b"WARC-Profile: ") == 8
        assert blob.count(b"WARC-Truncated: length") == 8

    def test_reader_resolves_revisits(self, spark, tmp_path):
        out, _ = self._export(spark, tmp_path, dedup=True)
        got = {r["url"]: r for r in read_warc_pages(spark, out).collect()}
        assert len(got) == 12
        for u, _, html in self.ROWS:
            assert bytes(got[u]["html"]) == html, u
        # canonical per group = lowest url (equal timestamps)
        for g in range(4):
            urls = sorted(u for u, _, h in self.ROWS if f"group {g}".encode() in h)
            assert got[urls[0]]["is_revisit"] is False
            for u in urls[1:]:
                assert got[u]["is_revisit"] is True
                # revisit digest equals the canonical's
                assert got[u]["payload_digest"] == got[urls[0]]["payload_digest"]
        responses_only = read_warc_pages(spark, out, resolve_revisits=False)
        assert responses_only.count() == 4

    def test_cdx_marks_revisits(self, spark, tmp_path):
        out, _ = self._export(spark, tmp_path, dedup=True)
        rows = build_cdx(spark, out).collect()
        assert len(rows) == 12
        mimes = [r["mime"] for r in rows]
        assert mimes.count("warc/revisit") == 8
        assert mimes.count("text/html") == 4
        by_digest = {}
        for r in rows:
            by_digest.setdefault(r["digest"], []).append(r["mime"])
        for ms in by_digest.values():  # each digest group has ONE stored copy
            assert ms.count("text/html") == 1


class TestSessionTimezoneImmunity:
    """The archive loop must be correct in ANY session timezone:
    WARC-Date is a true UTC instant (writer converts the session-local
    naive wall time Arrow hands mapInPandas), ts14 derives textually
    from that string, and revisit resolution joins on the digest —
    none of it round-trips through session-tz rendering."""

    def test_roundtrip_cdx_and_revisits_under_non_utc_tz(self, spark, tmp_path):
        prev = spark.conf.get("spark.sql.session.timeZone")
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        try:
            rows = [
                (
                    f"https://h.example/p{i}",
                    TS,
                    (f"<html>grp {i % 2} " + "y" * 800 + "</html>").encode(),
                )
                for i in range(6)
            ]
            pages = spark.createDataFrame(
                rows, "url string, fetched_at timestamp, html binary"
            )
            results = pages.select(
                "url", "fetched_at", F.lit(200).alias("status")
            )
            out = str(tmp_path / "tz")
            export_warc(
                results, pages.select("url", "html"), out, dedup_payloads=True
            ).collect()
            blob = b"".join(
                open(p, "rb").read() for p in list_warc_files(out)
            )
            # the written instant is UTC, not NY wall time with a fake Z
            assert b"WARC-Date: 2024-01-01T00:00:00Z" in blob
            assert b"2023-12-31" not in blob
            got = {r["url"]: r for r in read_warc_pages(spark, out).collect()}
            assert len(got) == 6
            for u, _, html in rows:
                assert bytes(got[u]["html"]) == html, u  # revisits resolve
            assert sum(1 for r in got.values() if r["is_revisit"]) == 4
            cdx = build_cdx(spark, out).collect()
            assert {r["ts14"] for r in cdx} == {"20240101000000"}
        finally:
            spark.conf.set("spark.sql.session.timeZone", prev)


class TestWetWat:
    """WET (conversion/text) and WAT (metadata/JSON) derivative
    exports over the same rotated-WARC container — read back with the
    same scanner, zero format fork."""

    def _results(self, spark):
        return spark.createDataFrame(
            [
                (f"https://h.example/p{i}", TS, 200, f"extracted text {i}",
                 "eng", i)
                for i in range(6)
            ],
            "url string, fetched_at timestamp, status int, text string, "
            "lang string, n_links int",
        )

    def test_wet_conversion_records_roundtrip(self, spark, tmp_path):
        import uuid as _uuid

        from atra_spark.plans.export import export_wet

        out = str(tmp_path / "wet")
        rep = export_wet(self._results(spark), out).collect()
        assert sum(r["records"] for r in rep) == 6
        rec = {r["url"]: r for r in scan_warc_records(spark, out).collect()}
        assert len(rec) == 6
        for i in range(6):
            r = rec[f"https://h.example/p{i}"]
            assert r["warc_type"] == "conversion"
            assert bytes(r["body"]).decode() == f"extracted text {i}"
            # refers to the page's response record (uuid5 of the url)
            blob = open(r["warc_file"], "rb").read()
            span = blob[r["offset"] : r["offset"] + r["length"]]
            _, _, hdrs, _ = next(iter(iter_warc_spans(span)))
            orig = _uuid.uuid5(_uuid.NAMESPACE_URL, r["url"]).urn
            assert hdrs["WARC-Refers-To"] == f"<{orig}>"
            assert hdrs["Content-Type"] == "text/plain"

    def test_wat_metadata_envelopes(self, spark, tmp_path):
        from atra_spark.plans.export import export_wat

        out = str(tmp_path / "wat")
        export_wat(self._results(spark), out).collect()
        rec = {r["url"]: r for r in scan_warc_records(spark, out).collect()}
        assert len(rec) == 6
        for i in range(6):
            r = rec[f"https://h.example/p{i}"]
            assert r["warc_type"] == "metadata"
            env = json.loads(bytes(r["body"]).decode())
            assert env["url"] == f"https://h.example/p{i}"
            assert env["status"] == 200
            assert env["lang"] == "eng"
            assert env["n_links"] == i
            assert env["text_len"] == len(f"extracted text {i}")
            assert env["fetched_at"] == "2024-01-01T00:00:00Z"

    def test_wat_optional_columns_absent(self, spark, tmp_path):
        from atra_spark.plans.export import export_wat

        out = str(tmp_path / "watmin")
        df = spark.createDataFrame(
            [("https://h.example/a", TS)], "url string, fetched_at timestamp"
        )
        export_wat(df, out).collect()
        r = scan_warc_records(spark, out).collect()[0]
        env = json.loads(bytes(r["body"]).decode())
        assert set(env) == {"url", "fetched_at"}
