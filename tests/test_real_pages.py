"""Real-page extraction regression: the reference repo's own sample
pages (the inputs of atra's extraction tests,
extraction/extractor/mod.rs:173-214) run through the full batch
extractor must reproduce the committed goldens byte-for-byte.

Unlike the synthetic-corpus tests (whose golden links come from the
same construction rules), these inputs are real-world HTML — malformed
markup, 500 KB pages, JVM class files, nested ZIPs — so html.parser /
urllib regressions surface here.
"""

import hashlib
import json
import os

import pytest

SAMPLES = "/root/reference/atra/testdata/samples"
GOLDENS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens", "real_pages")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SAMPLES), reason="reference samples not available"
)


def _golden_files():
    return sorted(os.listdir(GOLDENS)) if os.path.isdir(GOLDENS) else []


@pytest.mark.parametrize("golden_name", _golden_files())
def test_real_page_golden(golden_name):
    from tests.goldens.gen_real_pages import extract_one

    with open(os.path.join(GOLDENS, golden_name)) as f:
        golden = json.load(f)
    raw = open(os.path.join(SAMPLES, golden["file"]), "rb").read()
    got = extract_one(golden["file"], raw)
    assert got["format"] == golden["format"]
    assert got["encoding"] == golden["encoding"]
    assert got["text_len"] == golden["text_len"]
    assert got["text_md5"] == golden["text_md5"], "extracted text drifted"
    assert [tuple(l) for l in got["links"]] == [tuple(l) for l in golden["links"]]


class TestRealPageSanity:
    """Shape assertions independent of the pinned goldens."""

    def _run(self, name):
        from tests.goldens.gen_real_pages import extract_one

        raw = open(os.path.join(SAMPLES, name), "rb").read()
        return extract_one(name, raw)

    def test_amazon_link_density(self):
        g = self._run("Amazon.html")
        assert g["format"] == "HTML" and len(g["links"]) > 100
        assert all(u.startswith(("http://", "https://", "data:")) for u, _k, _m in g["links"])

    def test_mdn_text_and_links(self):
        g = self._run(
            "HTML attribute reference - HTML_ HyperText Markup Language _ MDN.html"
        )
        assert len(g["links"]) > 200 and g["text_len"] > 50_000

    def test_zip_recursion_finds_class_file_urls(self):
        g = self._run("Test2.zip")
        assert g["format"] == "ZIP"
        urls = {u for u, _k, _m in g["links"]}
        assert any("google.de" in u for u in urls)

    def test_class_file_binary_scan(self):
        g = self._run("Main.class")
        assert g["format"] == "Unknown" and g["text_len"] == 0
        assert any("google.de" in u for u, _k, _m in g["links"])

    def test_fragment_only_pages_have_no_links(self):
        for name in ("sample_1.html", "sample_2.html"):
            assert self._run(name)["links"] == []
