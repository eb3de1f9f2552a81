"""Office-container / PDF / EXIF extraction tests — the formats the
reference dispatches via extractor_method.rs:733-787 (OOXML/ODF →
link_scraper zip-of-XML scrapers, IMAGE → exif scraper, PDF → pdf
scraper). Fixtures are constructed with stdlib zipfile/zlib/struct —
real containers, not mocks."""

import io
import struct
import zipfile
import zlib

import pandas as pd

from atra_spark.functions.extract import (
    extract_image,
    extract_odf,
    extract_ooxml,
    extract_pages_batch,
    extract_pdf,
    extract_zip,
    sniff_format,
)


def make_docx(text="Hello report about things", ext_target="https://ext.example.com/ref"):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr(
            "word/document.xml",
            f"<w:document><w:body><w:p><w:r><w:t>{text}</w:t></w:r></w:p>"
            '<w:p><w:hyperlink r:id="rId1"><w:r><w:t>a link</w:t></w:r>'
            "</w:hyperlink></w:p></w:body></w:document>",
        )
        z.writestr(
            "word/_rels/document.xml.rels",
            "<Relationships>"
            f'<Relationship Id="rId1" Target="{ext_target}" TargetMode="External"/>'
            '<Relationship Id="rId2" Target="styles.xml"/>'
            "</Relationships>",
        )
    return buf.getvalue()


def make_odt():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        # the `mimetype` entry is first and STORED per the ODF spec —
        # that is exactly what makes the container sniffable from the
        # first bytes
        z.writestr(zipfile.ZipInfo("mimetype"), "application/vnd.oasis.opendocument.text")
        z.writestr(
            "content.xml",
            "<office:document-content><office:body>"
            "<text:p>Ein Absatz mit Text</text:p>"
            '<text:p><text:a xlink:href="https://other.example.org/page">ref</text:a></text:p>'
            "</office:body></office:document-content>",
        )
    return buf.getvalue()


def make_pdf():
    content = b"BT (Hello) Tj (World see http://txt.example.net/x) Tj ET"
    comp = zlib.compress(content)
    return (
        b"%PDF-1.4\n1 0 obj\n<< /Type /Annot /A << /S /URI "
        b"/URI (https://link.example.com/a) >> >>\nendobj\n"
        b"2 0 obj\n<< /Filter /FlateDecode /Length "
        + str(len(comp)).encode()
        + b" >>\nstream\n"
        + comp
        + b"\nendstream\nendobj\n%%EOF"
    )


def make_exif_jpeg(desc=b"see https://img.example.com/src\x00"):
    ifd_off = 8
    val_off = ifd_off + 2 + 12 + 4
    tiff = (
        b"II*\x00"
        + struct.pack("<I", ifd_off)
        + struct.pack("<H", 1)
        + struct.pack("<HHII", 0x010E, 2, len(desc), val_off)  # ImageDescription
        + struct.pack("<I", 0)
        + desc
    )
    app1 = b"Exif\x00\x00" + tiff
    return b"\xff\xd8\xff\xe1" + struct.pack(">H", len(app1) + 2) + app1 + b"\xff\xd9"


class TestSniff:
    def test_ooxml_container_beats_generic_zip(self):
        assert sniff_format(None, make_docx()[:1024], "http://a.com/f.bin") == "OOXML"

    def test_odf_mimetype_entry(self):
        assert sniff_format(None, make_odt()[:1024], "http://a.com/f.bin") == "ODF"

    def test_plain_zip_stays_zip(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("readme.txt", "hi")
        assert sniff_format(None, buf.getvalue()[:1024], None) == "ZIP"

    def test_content_types(self):
        ooxml_ct = "application/vnd.openxmlformats-officedocument.wordprocessingml.document"
        assert sniff_format(ooxml_ct, None, None) == "OOXML"
        assert sniff_format("application/vnd.oasis.opendocument.text", None, None) == "ODF"

    def test_extensions(self):
        assert sniff_format(None, None, "http://a.com/deck.pptx") == "OOXML"
        assert sniff_format(None, None, "http://a.com/sheet.ods") == "ODF"
        assert sniff_format(None, None, "http://a.com/p.jpeg") == "IMAGE"

    def test_tiff_magic(self):
        assert sniff_format(None, b"II*\x00rest", None) == "IMAGE"
        assert sniff_format(None, b"MM\x00*rest", None) == "IMAGE"


class TestOoxml:
    def test_text_and_external_rels_link(self):
        t, ls = extract_ooxml(make_docx(), "http://a.com/f.docx")
        assert "Hello report about things" in t
        assert "a link" in t
        urls = {u for u, _, _ in ls}
        assert urls == {"https://ext.example.com/ref"}  # internal rels target dropped
        assert ls[0][1] == "outgoing"

    def test_paragraphs_become_newlines(self):
        t, _ = extract_ooxml(make_docx(), "http://a.com/f.docx")
        assert t.splitlines()[0] == "Hello report about things"

    def test_onseed_external_target(self):
        t, ls = extract_ooxml(
            make_docx(ext_target="http://a.com/other"), "http://a.com/f.docx"
        )
        assert ls[0][1] == "onseed"

    def test_corrupt_zip_degrades_to_binary_scan(self):
        t, ls = extract_ooxml(b"PK\x03\x04 not a zip http://x.com/y", "http://a.com/f")
        assert ls and ls[0][0] == "http://x.com/y"


class TestOdf:
    def test_text_and_xlink(self):
        t, ls = extract_odf(make_odt(), "http://a.com/f.odt")
        assert "Ein Absatz mit Text" in t
        assert ("https://other.example.org/page", "outgoing", "office") in ls


class TestPdf:
    def test_flate_stream_text_and_uri_annotation(self):
        t, ls = extract_pdf(make_pdf(), "http://a.com/doc.pdf")
        assert t == "Hello World see http://txt.example.net/x"
        urls = {u for u, _, _ in ls}
        assert urls == {"https://link.example.com/a", "http://txt.example.net/x"}

    def test_tj_array_strings(self):
        content = b"BT [(Frag) -250 (mented)] TJ ET"
        comp = zlib.compress(content)
        pdf = b"%PDF-1.4\nstream\n" + comp + b"\nendstream\n%%EOF"
        t, _ = extract_pdf(pdf, "http://a.com/d.pdf")
        assert "Frag" in t and "mented" in t

    def test_escaped_pdf_string(self):
        pdf = rb"%PDF-1.4 /URI (https://e.com/a\(b\)c) %%EOF"
        _, ls = extract_pdf(pdf, "http://a.com/d.pdf")
        assert ls[0][0] == "https://e.com/a(b)c"

    def test_garbage_never_raises(self):
        t, ls = extract_pdf(b"%PDF-1.4\nstream\n\xff\xfe garbage\nendstream", "http://a.com/d.pdf")
        assert t == "" and ls == []


class TestExif:
    def test_imagedescription_url(self):
        ls = extract_image(make_exif_jpeg(), "http://a.com/pic.jpg")
        assert ("https://img.example.com/src", "outgoing", "exif") in ls
        # the raw-scan fallback must not re-add a NUL-polluted variant
        assert all("%00" not in u for u, _, _ in ls)

    def test_bare_tiff_payload(self):
        jpeg = make_exif_jpeg()
        tiff = jpeg[jpeg.index(b"II*\x00") :]
        ls = extract_image(tiff, "http://a.com/pic.tif")
        assert ("https://img.example.com/src", "outgoing", "exif") in ls

    def test_non_exif_image_falls_back_to_raw_scan(self):
        raw = b"\x89PNG\r\n\x1a\n...http://p.example.com/q..."
        ls = extract_image(raw, "http://a.com/pic.png")
        assert ("http://p.example.com/q", "outgoing", "text") in ls

    def test_truncated_exif_never_raises(self):
        assert extract_image(make_exif_jpeg()[:20], "http://a.com/p.jpg") == []


class TestZipRecursionIntoOffice:
    def test_docx_inside_zip(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("report.docx", make_docx())
        t, ls = extract_zip(buf.getvalue(), "http://a.com/bundle.zip")
        assert "Hello report about things" in t
        assert ("https://ext.example.com/ref", "outgoing", "office") in ls


class TestBatchDispatch:
    def test_formats_and_encoding(self):
        pdf_rows = pd.DataFrame(
            {
                "url": [
                    "http://a.com/f.docx",
                    "http://a.com/doc.pdf",
                    "http://a.com/pic.jpg",
                    "http://a.com/t.odt",
                ],
                "html": [make_docx(), make_pdf(), make_exif_jpeg(), make_odt()],
            }
        )
        out = pd.concat(list(extract_pages_batch(iter([pdf_rows]))))
        by_url = out.set_index("url")
        assert by_url.loc["http://a.com/f.docx", "format"] == "OOXML"
        assert by_url.loc["http://a.com/doc.pdf", "format"] == "PDF"
        assert by_url.loc["http://a.com/pic.jpg", "format"] == "IMAGE"
        assert by_url.loc["http://a.com/t.odt", "format"] == "ODF"
        assert (by_url["encoding"] == "binary").all()
        assert by_url.loc["http://a.com/pic.jpg", "text"] is None
        assert "Hello World" in by_url.loc["http://a.com/doc.pdf", "text"]
        links = by_url.loc["http://a.com/f.docx", "links"]
        assert any(l["url"] == "https://ext.example.com/ref" for l in links)
        # PSL origin is attached to office links like any other link
        assert all(l["host"] for l in links)
