"""The extraction pipeline: decode -> format sniff -> DOM text ->
link extraction -> language ID, as one Arrow-batched stage.

Re-implements, from spec (SURVEY.md §2.7), the reference pipeline of
atra/src/crawl/crawler.rs:440-461:

- encoding ladder        atra/src/decoding/mod.rs:83-261
  (BOM -> html <meta charset> -> UTF-8 strict -> windows-1252 lossy)
- format sniffing        atra/src/format/information.rs:50-72,
                         atra/src/format/supported.rs:94-132
- DOM text               atra/src/toolkit/language_detection.rs:131-137
  (concatenation of text nodes of the document in document order —
  the byte-identical per-url invariant of BASELINE.json)
- HTML link extraction   atra/src/extraction/html.rs:38-166
  (selectors a/area/link[href] (+media/form/js when aggressive),
  <base href>, rel=nofollow, meta robots nofollow, data: links)
- JS href scan           atra/src/extraction/js.rs:14-60
- plaintext linkify      atra/src/extraction/extractor_method.rs:371-404
- link packing           atra/src/extraction/links.rs:115-151
  (OnSeed vs Outgoing by host, Data for data: URLs, self-link filter)

Everything is plain-Python per document inside ``mapInPandas`` Arrow
batches — no row-at-a-time Spark UDFs.
"""

from __future__ import annotations

import codecs
import html as _html_mod
import re
from html.parser import HTMLParser
from typing import Iterable, Iterator

import numpy as _np
import pandas as pd

from functools import lru_cache

from ..urlkit import canonicalize, host_of, origin
from .langdata import detect_lang

# Per-executor canonicalization caches: hrefs repeat heavily within a
# host's pages, and absolute http(s) URLs canonicalize independently of
# the base (urljoin with an absolute reference returns the reference).
_canon_abs = lru_cache(maxsize=1 << 16)(canonicalize)
_host_cached = lru_cache(maxsize=1 << 16)(host_of)
# PSL origin per link target (full public-suffix list, urlkit.origin);
# cached per executor — unique hosts per batch are few
_origin_cached = lru_cache(maxsize=1 << 16)(origin)


def _canon(raw: str, base: str) -> str | None:
    if raw.startswith("http://") or raw.startswith("https://"):
        return _canon_abs(raw)
    return canonicalize(raw, base=base)

# --------------------------------------------------------------------------
# decode ladder
# --------------------------------------------------------------------------
_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?([A-Za-z0-9_\-]+)""", re.IGNORECASE
)
_BOMS = (
    (codecs.BOM_UTF8, "utf-8"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
)


# --------------------------------------------------------------------------
# chardetng-style frequency guesser (decoding/mod.rs:203-261): candidate
# encodings scored by script plausibility of the decoded text, with a
# TLD hint boost (enc.guess_assess(Some(domain.suffix()), ...)).
# --------------------------------------------------------------------------
_GUESS_CANDIDATES = (
    ("windows-1252", "latin"),
    ("iso-8859-2", "latin"),
    ("windows-1254", "latin"),
    ("windows-1251", "cyrillic"),
    ("koi8-r", "cyrillic"),
    ("iso-8859-7", "greek"),
    ("shift_jis", "jp"),
    ("euc-jp", "jp"),
    ("gbk", "zh"),
    ("big5", "zh"),
    ("euc-kr", "ko"),
)

_TLD_ENC_HINTS = {
    "ru": {"windows-1251", "koi8-r"}, "ua": {"windows-1251", "koi8-r"},
    "by": {"windows-1251"}, "bg": {"windows-1251"}, "rs": {"windows-1251"},
    "kz": {"windows-1251"}, "jp": {"shift_jis", "euc-jp"}, "cn": {"gbk"},
    "tw": {"big5"}, "hk": {"big5"}, "kr": {"euc-kr"}, "gr": {"iso-8859-7"},
    "tr": {"windows-1254"},
}


def _script_score_py(text: str, expect: str) -> int:
    """Pure-Python reference scorer (kept as the equivalence oracle for
    the vectorized `_script_score` below, and as its fallback for
    codepoints outside the property tables).

    Plausibility of decoded text for the encoding's native script.
    C1 controls / replacement chars are near-proof of a wrong decode;
    lowercase-dominant letters beat uppercase (a cp1251 page decoded as
    koi8-r flips case, the classic confusion pair)."""
    score = 0
    for ch in text[:2048]:
        o = ord(ch)
        if 0x80 <= o <= 0x9F or ch == "�":
            score -= 8
            continue
        if o < 0x80:
            continue
        if expect == "latin":
            score += 1 if 0xC0 <= o <= 0x17F else -2
        elif expect == "cyrillic":
            score += (3 if ch.islower() else 1) if 0x400 <= o <= 0x4FF else -3
        elif expect == "greek":
            score += (3 if ch.islower() else 1) if 0x370 <= o <= 0x3FF else -3
        elif expect == "jp":
            if 0x3040 <= o <= 0x30FF:
                score += 3  # kana: the Japanese fingerprint
            elif 0x4E00 <= o <= 0x9FFF or 0x3000 <= o <= 0x303F or 0xFF00 <= o <= 0xFFEF:
                score += 1
            else:
                score -= 3
        elif expect == "zh":
            if 0x4E00 <= o <= 0x9FFF:
                score += 2
            elif 0x3000 <= o <= 0x303F or 0xFF00 <= o <= 0xFFEF:
                score += 1
            else:
                score -= 3
        elif expect == "ko":
            score += 3 if (0xAC00 <= o <= 0xD7AF or 0x1100 <= o <= 0x11FF) else -3
    if expect == "latin":
        letters = [c for c in text[:2048] if c.isalpha()]
        if letters:
            frac = sum(1 for c in letters if ord(c) > 0x7F) / len(letters)
            if frac > 0.4:  # real western text is mostly ASCII letters
                score -= int((frac - 0.4) * 200)
    return score


# Unicode-property lookup tables for the vectorized scorer. Only the
# latin/cyrillic/greek branches consult char properties, and those
# branches only ever see text decoded from SINGLE-BYTE candidate codecs
# (cp1252/iso-8859-2/cp1254/cp1251/koi8-r/iso-8859-7), whose codepoint
# images all sit below U+2600 (koi8-r's box-drawing chars at U+25xx are
# the ceiling). Inputs outside the table (only reachable via direct
# calls, never from guess_encoding) fall back to the reference scorer.
_SCRIPT_TBL_SIZE = 0x2600
_ISLOWER_TBL = _np.fromiter(
    (chr(c).islower() for c in range(_SCRIPT_TBL_SIZE)), dtype=bool,
    count=_SCRIPT_TBL_SIZE,
)
_ISALPHA_TBL = _np.fromiter(
    (chr(c).isalpha() for c in range(_SCRIPT_TBL_SIZE)), dtype=bool,
    count=_SCRIPT_TBL_SIZE,
)


def _script_score(text: str, expect: str) -> int:
    """Vectorized `_script_score_py` (bit-identical results; the
    equivalence is pinned by tests/test_extract.py). The scalar loop —
    one ord() + branch per char x 11 candidate decodes — was ~25% of
    the whole extraction kernel on the bench corpus; this spelling is
    a handful of numpy range masks over the codepoint array."""
    s = text[:2048]
    try:
        codes = _np.frombuffer(s.encode("utf-32-le"), dtype=_np.uint32)
    except UnicodeEncodeError:  # lone surrogates: scalar path handles
        return _script_score_py(text, expect)
    if codes.size == 0:
        return 0
    needs_tbl = expect in ("latin", "cyrillic", "greek")
    if needs_tbl and int(codes.max()) >= _SCRIPT_TBL_SIZE:
        return _script_score_py(text, expect)
    c1 = ((codes >= 0x80) & (codes <= 0x9F)) | (codes == 0xFFFD)
    score = -8 * int(c1.sum())
    hi = (codes >= 0x80) & ~c1
    if expect == "latin":
        rng = (codes >= 0xC0) & (codes <= 0x17F)
        score += int((hi & rng).sum()) - 2 * int((hi & ~rng).sum())
    elif expect in ("cyrillic", "greek"):
        lo_b, hi_b = (0x400, 0x4FF) if expect == "cyrillic" else (0x370, 0x3FF)
        rng = (codes >= lo_b) & (codes <= hi_b)
        low = _ISLOWER_TBL[codes]
        in_rng = hi & rng
        score += (
            3 * int((in_rng & low).sum())
            + int((in_rng & ~low).sum())
            - 3 * int((hi & ~rng).sum())
        )
    elif expect == "jp":
        kana = (codes >= 0x3040) & (codes <= 0x30FF)
        other = (
            ((codes >= 0x4E00) & (codes <= 0x9FFF))
            | ((codes >= 0x3000) & (codes <= 0x303F))
            | ((codes >= 0xFF00) & (codes <= 0xFFEF))
        )
        score += (
            3 * int((hi & kana).sum())
            + int((hi & ~kana & other).sum())
            - 3 * int((hi & ~kana & ~other).sum())
        )
    elif expect == "zh":
        cjk = (codes >= 0x4E00) & (codes <= 0x9FFF)
        other = ((codes >= 0x3000) & (codes <= 0x303F)) | (
            (codes >= 0xFF00) & (codes <= 0xFFEF)
        )
        score += (
            2 * int((hi & cjk).sum())
            + int((hi & ~cjk & other).sum())
            - 3 * int((hi & ~cjk & ~other).sum())
        )
    elif expect == "ko":
        rng = ((codes >= 0xAC00) & (codes <= 0xD7AF)) | (
            (codes >= 0x1100) & (codes <= 0x11FF)
        )
        score += 3 * int((hi & rng).sum()) - 3 * int((hi & ~rng).sum())
    if expect == "latin":
        alpha = _ISALPHA_TBL[codes]
        n_letters = int(alpha.sum())
        if n_letters:
            frac = int((alpha & (codes > 0x7F)).sum()) / n_letters
            if frac > 0.4:  # real western text is mostly ASCII letters
                score -= int((frac - 0.4) * 200)
    return score


def guess_encoding(raw: bytes, tld: str | None = None) -> tuple[str, str] | None:
    """(text, encoding) of the best-scoring candidate, or None when no
    candidate decodes with a positive plausibility score."""
    hints = _TLD_ENC_HINTS.get((tld or "").lower(), set())
    best: tuple[int, str, str] | None = None
    for enc, expect in _GUESS_CANDIDATES:
        try:
            text = raw.decode(enc)
        except (UnicodeDecodeError, LookupError):
            continue
        s = _script_score(text, expect)
        if enc in hints:
            s += max(10, abs(s) // 5)
        if best is None or s > best[0]:
            best = (s, text, enc)
    if best is not None and best[0] > 0:
        return best[1], best[2]
    return None


def decode_bytes(raw: bytes | None, tld: str | None = None) -> tuple[str | None, str, bool]:
    """(text, encoding_name, had_errors) per the decode ladder
    (decoding/mod.rs:83-261): BOM -> meta charset -> UTF-8 strict ->
    frequency guess (TLD-hinted) -> windows-1252 lossy."""
    if raw is None:
        return None, "none", False
    for bom, enc in _BOMS:
        if raw.startswith(bom):
            try:
                return raw[len(bom):].decode(enc), enc, False
            except UnicodeDecodeError:
                return raw[len(bom):].decode(enc, errors="replace"), enc, True
    m = _META_CHARSET_RE.search(raw[:1024])
    if m:
        enc = m.group(1).decode("ascii", errors="replace").lower()
        try:
            codecs.lookup(enc)
            try:
                return raw.decode(enc), enc, False
            except UnicodeDecodeError:
                return raw.decode(enc, errors="replace"), enc, True
        except LookupError:
            pass
    try:
        return raw.decode("utf-8"), "utf-8", False
    except UnicodeDecodeError:
        pass
    guessed = guess_encoding(raw, tld)
    if guessed is not None:
        return guessed[0], guessed[1], False
    return raw.decode("windows-1252", errors="replace"), "windows-1252", True


# --------------------------------------------------------------------------
# format sniffing (simplified ladder: mime -> magic -> extension -> html
# heuristic; the graft input is HTML by construction but the operator is
# kept, SURVEY.md §2.7)
# --------------------------------------------------------------------------
_HTML_HINT_RE = re.compile(rb"^\s*(?:<!DOCTYPE\s+html|<html)", re.IGNORECASE)


def sniff_format(content_type: str | None, prefix: bytes | None, url: str | None) -> str:
    ct = (content_type or "").lower().split(";")[0].strip()
    if ct:
        if "html" in ct:
            return "HTML"
        if ct == "application/json":
            return "JSON"
        if ct in ("text/xml", "application/xml"):
            return "XML"
        if ct == "application/pdf":
            return "PDF"
        if ct.startswith("image/"):
            return "IMAGE"
        if ct == "text/plain":
            return "PlainText"
        if ct.startswith("application/vnd.openxmlformats"):
            return "OOXML"
        if ct.startswith("application/vnd.oasis.opendocument"):
            return "ODF"
    p = prefix or b""
    if p.startswith(b"%PDF-"):
        return "PDF"
    if p.startswith(b"\x89PNG") or p.startswith(b"\xff\xd8\xff") or p.startswith(b"GIF8"):
        return "IMAGE"
    if p.startswith(b"II*\x00") or p.startswith(b"MM\x00*"):
        return "IMAGE"
    if p.startswith(b"PK\x03\x04"):
        # OOXML/ODF are zip containers; the first local-file header name
        # is visible in the prefix ([Content_Types].xml / the ODF
        # `mimetype` entry, stored uncompressed by spec) — the same
        # container discrimination file_format_detection.rs gets from
        # the file_format crate
        if b"[Content_Types].xml" in p or b"word/" in p[:128] or b"xl/" in p[:128]:
            return "OOXML"
        if b"mimetypeapplication/vnd.oasis.opendocument" in p:
            return "ODF"
        return "ZIP"
    if p.startswith(b"{\\rtf"):
        return "RTF"
    if p.startswith(b"\xca\xfe\xba\xbe"):  # JVM class file
        return "Unknown"
    if _HTML_HINT_RE.match(p):
        return "HTML"
    lowered = (url or "").lower().split("?")[0]
    for ext, fmt in (
        (".html", "HTML"), (".htm", "HTML"), (".json", "JSON"), (".xml", "XML"),
        (".svg", "XML"), (".rtf", "RTF"), (".pdf", "PDF"), (".txt", "PlainText"),
        (".js", "JavaScript"), (".zip", "ZIP"),
        (".docx", "OOXML"), (".xlsx", "OOXML"), (".pptx", "OOXML"),
        (".odt", "ODF"), (".ods", "ODF"), (".odp", "ODF"),
        (".png", "IMAGE"), (".jpg", "IMAGE"), (".jpeg", "IMAGE"),
        (".gif", "IMAGE"), (".tif", "IMAGE"), (".tiff", "IMAGE"),
        (".webp", "IMAGE"),
    ):
        if lowered.endswith(ext):
            return fmt
    stripped = p.lstrip()
    if stripped.startswith(b"{") or stripped.startswith(b"["):
        return "JSON"
    if stripped.startswith(b"<?xml") or stripped.startswith(b"<svg"):
        return "XML"
    if stripped.startswith(b"<"):
        return "HTML"
    return "Decodeable"


# --------------------------------------------------------------------------
# HTML parsing: one pass collects text nodes, links, base href, meta
# robots — mirroring the single parsed-DOM reuse in the reference.
# --------------------------------------------------------------------------
_HREF_TAGS = {"a", "area", "link"}
_SRC_TAGS = {"audio", "embed", "iframe", "img", "input", "source", "track", "video", "script"}
_VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}
_JS_HREF_RE = re.compile(r"""href\s*[=:]?\s*["']([^"'\s]+)["']""")
_ONCLICK_RE = re.compile(r"""location\.href\s*=\s*["']([^"']+)["']""")
_LINKIFY_RE = re.compile(r"""https?://[^\s<>"')\]\x00-\x1f\x7f]+""")


# fast-path recognizers for the _PageParser overrides below. A start
# tag this STRICT pattern accepts is well-formed by construction
# (clean name, properly quoted/unquoted attrs, closing '>'), so the
# stdlib tolerant parser is guaranteed to (a) find the same end
# position and (b) emit no text for it — which makes skipping the
# stdlib per-attribute parse provably output-identical. Anything the
# strict pattern rejects falls back to the stdlib path verbatim.
_STRICT_START = re.compile(
    r"<([a-zA-Z][a-zA-Z0-9:._-]*)"
    r"(?:\s+[a-zA-Z_:][a-zA-Z0-9_:.-]*"
    r"(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|[^\s\"'`=<>]+))?"
    r")*\s*(/?)>"
)
# one attribute inside a _STRICT_START match; tiles the attr region
# exactly (same language as the outer pattern's attr group)
_STRICT_ATTR = re.compile(
    r"\s+([a-zA-Z_:][a-zA-Z0-9_:.-]*)"
    r"(?:(\s*=\s*)(\"[^\"]*\"|'[^']*'|[^\s\"'`=<>]+))?"
)
_STRICT_END = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
_AMP_WS = re.compile(r"[\s;]")  # stdlib goahead's trailing-& probe


class _PageParser(HTMLParser):
    """Single-pass HTML5 parser: text nodes in document order + raw links.

    Text spec (the byte-identity invariant): the concatenation of all
    character-data nodes in document order, entities decoded, comments
    and tags excluded, script/style character data INCLUDED (html5ever
    represents script bodies as text nodes and scraper's ``.text()``
    yields them — language_detection.rs:131-137).

    Performance: ``html.parser`` spends most of its time regex-parsing
    the attributes of tags whose attributes nobody reads (~60-70 % of
    extract_html CPU measured on the bench corpus). The
    ``parse_starttag``/``parse_endtag``/``updatepos`` overrides below
    short-circuit that work for strictly well-formed tags outside the
    interesting set ({base, meta} + href tags; CDATA elements keep
    their mode switch), delegating every non-trivial case to the
    stdlib implementation unchanged. Output equivalence vs the pure
    stdlib parser is pinned by tests/test_extract.py (golden pages +
    randomized malformed-HTML fuzz).
    """

    _FAST_EXEMPT = {"base", "meta"} | _HREF_TAGS

    def __init__(self, aggressive: bool, capture_anchors: bool = False) -> None:
        super().__init__(convert_charrefs=True)
        self.aggressive = aggressive
        # aggressive mode reads src/action/onclick off ARBITRARY tags,
        # so every start tag is "interesting" and the fast skip is off;
        # anchor capture needs </a> end tags delivered, so it also
        # disables the start-tag fast skip (anchors are the offline
        # analytics path, never the crawl hot path)
        self._fast = not (aggressive or capture_anchors)
        self.capture_anchors = capture_anchors
        self.text_parts: list[str] = []
        # (raw_url, method, anchor_nofollow) — the nofollow flag is
        # recorded here and enforced in extract_html only when
        # respect_nofollow is on (extraction/html.rs:109-116 is gated by
        # the crawl config in the reference, not unconditional)
        self.raw_links: list[tuple[str, str, bool]] = []
        # raw_links index -> anchor DOM text (capture_anchors only)
        self.anchor_text: dict[int, str] = {}
        self._open_a: int | None = None
        self._a_start = 0
        self.base_href: str | None = None
        self.meta_nofollow = False
        self._suppress_links = False  # set once meta nofollow seen

    def _finalize_anchor(self) -> None:
        if self._open_a is not None:
            self.anchor_text[self._open_a] = "".join(self.text_parts[self._a_start :])
            self._open_a = None

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        a = dict(attrs)
        if tag == "base" and self.base_href is None and a.get("href"):
            self.base_href = a["href"]
        elif tag == "meta":
            if (a.get("name") or "").lower() == "robots" and "nofollow" in (
                (a.get("content") or "").lower()
            ):
                self.meta_nofollow = True
        elif tag in _HREF_TAGS:
            href = a.get("href")
            if href:
                rel = (a.get("rel") or "").lower()
                nofollow = "nofollow" in rel.split()
                self.raw_links.append((href, "html_a", nofollow))
                if self.capture_anchors and tag == "a":
                    # browsers implicitly close an open <a> at the next
                    # <a> — finalize before opening the new one
                    self._finalize_anchor()
                    self._open_a = len(self.raw_links) - 1
                    self._a_start = len(self.text_parts)
        elif self.aggressive:
            if tag in _SRC_TAGS and a.get("src"):
                self.raw_links.append((a["src"], "html_media", False))
            elif tag == "form" and a.get("action"):
                self.raw_links.append((a["action"], "html_form", False))
            if a.get("onclick"):
                for m in _ONCLICK_RE.finditer(a["onclick"]):
                    self.raw_links.append((m.group(1), "js", False))

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        self.handle_starttag(tag, attrs)
        if self.capture_anchors and tag == "a":
            self._finalize_anchor()  # <a .../> has no content

    def handle_endtag(self, tag: str) -> None:
        if self.capture_anchors and tag == "a":
            self._finalize_anchor()

    def close(self) -> None:
        super().close()
        self._finalize_anchor()  # unclosed trailing <a>

    def handle_data(self, data: str) -> None:
        self.text_parts.append(data)

    # -- stdlib fast paths (see class docstring) ------------------------
    def updatepos(self, i: int, j: int) -> int:
        # line/column bookkeeping feeds getpos() only, which nothing
        # here calls — skipping it is pure overhead removal
        return j

    def goahead(self, end: int) -> None:
        # flattened transcription of the stdlib loop for the only
        # configuration this parser runs (convert_charrefs=True): the
        # '&'-dispatch branches are unreachable (text segmentation
        # happens on '<' alone, and in CDATA mode ``interesting`` only
        # matches the closing tag), position bookkeeping is dropped,
        # and unescape is skipped for segments without '&'. Construct
        # parsing still delegates to parse_* (with their own fast
        # paths), so behavior for every tag/comment/declaration is the
        # stdlib's own.
        if not (self._fast and self.convert_charrefs):
            return super().goahead(end)
        rawdata = self.rawdata
        i, n = 0, len(rawdata)
        handle_data = self.handle_data
        unescape = _html_mod.unescape
        while i < n:
            if self.cdata_elem is None:
                j = rawdata.find("<", i)
                if j < 0:
                    # a charref could be cut in half at the buffer end
                    amppos = rawdata.rfind("&", max(i, n - 34))
                    if amppos >= 0 and not _AMP_WS.search(rawdata, amppos):
                        break  # wait till we get all the text
                    j = n
                if i < j:
                    seg = rawdata[i:j]
                    handle_data(unescape(seg) if "&" in seg else seg)
            else:
                m = self.interesting.search(rawdata, i)
                if m is None:
                    break
                j = m.start()
                if i < j:
                    handle_data(rawdata[i:j])
            i = j
            if i == n:
                break
            nxt = rawdata[i + 1] if i + 1 < n else ""
            if ("a" <= nxt <= "z") or ("A" <= nxt <= "Z"):
                k = self.parse_starttag(i)
            elif nxt == "/":
                k = self.parse_endtag(i)
            elif nxt == "!":
                if rawdata.startswith("<!--", i):
                    k = self.parse_comment(i)
                else:
                    k = self.parse_html_declaration(i)
            elif nxt == "?":
                k = self.parse_pi(i)
            elif i + 1 < n:
                handle_data("<")
                k = i + 1
            else:
                break
            if k < 0:
                if not end:
                    break
                k = rawdata.find(">", i + 1)
                if k < 0:
                    k = rawdata.find("<", i + 1)
                    if k < 0:
                        k = i + 1
                else:
                    k += 1
                if self.cdata_elem is None:
                    seg = rawdata[i:k]
                    handle_data(unescape(seg) if "&" in seg else seg)
                else:
                    handle_data(rawdata[i:k])
            i = k
        if end and i < n and not self.cdata_elem:
            seg = rawdata[i:n]
            handle_data(unescape(seg) if "&" in seg else seg)
            i = n
        self.rawdata = rawdata[i:]

    def parse_starttag(self, i: int) -> int:
        if self._fast:
            m = _STRICT_START.match(self.rawdata, i)
            if m is not None:
                tag = m.group(1).lower()
                self.lasttag = tag
                startend = bool(m.group(2))
                if tag not in self._FAST_EXEMPT:
                    if not startend and tag in self.CDATA_CONTENT_ELEMENTS:
                        self.set_cdata_mode(tag)
                    return m.end()
                # interesting tag: parse its attrs with the strict
                # tiling pattern (same language the outer match
                # accepted, so the region is consumed exactly),
                # replicating stdlib normalization: lowercase names,
                # quote stripping, entity-decoded non-empty values
                _unescape = _html_mod.unescape
                attrs = []
                k = i + 1 + len(m.group(1))
                while True:
                    am = _STRICT_ATTR.match(self.rawdata, k)
                    if am is None:
                        break
                    name, eq, val = am.group(1, 2, 3)
                    if not eq:
                        val = None
                    elif val[:1] in "\"'" and val[:1] == val[-1:]:
                        val = val[1:-1]
                    if val:
                        val = _unescape(val)
                    attrs.append((name.lower(), val))
                    k = am.end()
                if startend:
                    self.handle_startendtag(tag, attrs)
                else:
                    self.handle_starttag(tag, attrs)
                    if tag in self.CDATA_CONTENT_ELEMENTS:
                        self.set_cdata_mode(tag)
                return m.end()
        return super().parse_starttag(i)

    def parse_endtag(self, i: int) -> int:
        # inside CDATA (script/style) the stdlib path owns the mode
        # switch; outside it a strictly well-formed end tag triggers
        # only the no-op handle_endtag, so its end offset is the only
        # thing that matters
        if self.cdata_elem is None:
            m = _STRICT_END.match(self.rawdata, i)
            if m is not None:
                if self.capture_anchors:
                    self.handle_endtag(m.group(1).lower())
                return m.end()
        return super().parse_endtag(i)


def extract_html(
    html_text: str,
    page_url: str,
    respect_nofollow: bool = True,
    aggressive: bool = False,
) -> tuple[str, list[tuple[str, str, str]]]:
    """(dom_text, [(canonical_url, kind, method)]) for one HTML page."""
    p = _PageParser(aggressive=aggressive)
    try:
        p.feed(html_text)
        p.close()
    except Exception:
        pass
    text = "".join(p.text_parts)
    if respect_nofollow and p.meta_nofollow:
        return text, []  # page-level nofollow: no links (html.rs:73-78)
    base = p.base_href or page_url
    # first-level docs resolve against <base> (extractor_method.rs:89-103)
    if p.base_href is not None:
        base = canonicalize(p.base_href, base=page_url) or page_url
    page_host = _host_cached(page_url)
    links: list[tuple[str, str, str]] = []
    seen: set[str] = set()
    for raw, method, nofollow in p.raw_links:
        if nofollow and respect_nofollow:
            continue  # rel=nofollow anchor (extraction/html.rs:109-116)
        raw = raw.strip()
        if not raw:
            continue
        if raw.startswith("data:"):  # Data link (links.rs:115-140)
            if raw not in seen:
                seen.add(raw)
                links.append((raw, "data", method))
            continue
        cu = _canon(raw, base)
        if cu is None or cu == page_url:  # self-link filter (links.rs:68-75)
            continue
        if cu in seen:
            continue  # per-page dedup (extraction/html.rs:80)
        seen.add(cu)
        kind = "onseed" if _host_cached(cu) == page_host else "outgoing"
        links.append((cu, kind, method))
    return text, links


def extract_anchor_pairs(
    html_text: str, page_url: str, respect_nofollow: bool = True
) -> list[tuple[str, str]]:
    """[(canonical_dst, anchor_dom_text)] for the page's <a href> links,
    under exactly extract_html's admission rules (nofollow anchor/meta
    skip, <base> resolution, self-link filter, first-occurrence dedup
    on the canonical URL); data: and non-anchor href tags (area/link)
    are excluded — they carry no anchor text. The anchor text is the
    verbatim DOM text between <a> and </a> (entities decoded), the
    same character-data contract as the page text invariant.
    """
    p = _PageParser(aggressive=False, capture_anchors=True)
    try:
        p.feed(html_text)
        p.close()
    except Exception:
        pass
    if respect_nofollow and p.meta_nofollow:
        return []
    base = p.base_href or page_url
    if p.base_href is not None:
        base = canonicalize(p.base_href, base=page_url) or page_url
    out: list[tuple[str, str]] = []
    seen: set[str] = set()
    for i, (raw, method, nofollow) in enumerate(p.raw_links):
        if nofollow and respect_nofollow:
            continue
        raw = raw.strip()
        if not raw or raw.startswith("data:"):
            # data: participates in extract_html's dedup ring only as
            # itself, never as a canonical URL — no anchor row, but it
            # must not shadow a later real link either (extract_html
            # keys data: dedup on the raw string, disjoint from
            # canonical URLs)
            continue
        if i not in p.anchor_text:
            continue  # area/link hrefs: no anchor content
        cu = _canon(raw, base)
        if cu is None or cu == page_url or cu in seen:
            continue
        seen.add(cu)
        out.append((cu, p.anchor_text[i]))
    return out


def extract_js(js_text: str, page_url: str) -> list[tuple[str, str, str]]:
    """String literals following an href identifier (extraction/js.rs:14-60)."""
    out = []
    seen: set[str] = set()
    for m in _JS_HREF_RE.finditer(js_text):
        cu = canonicalize(m.group(1), base=page_url)
        if cu and cu != page_url and cu not in seen:
            seen.add(cu)
            out.append((cu, "onseed" if host_of(cu) == host_of(page_url) else "outgoing", "js"))
    return out


def extract_plaintext(text: str, page_url: str) -> list[tuple[str, str, str]]:
    """linkify-style absolute-URL scan (extractor_method.rs:371-404)."""
    out = []
    seen: set[str] = set()
    page_host = host_of(page_url)
    for m in _LINKIFY_RE.finditer(text):
        cu = canonicalize(m.group(0).rstrip(".,;:"))
        if cu and cu != page_url and cu not in seen:
            seen.add(cu)
            out.append((cu, "onseed" if host_of(cu) == page_host else "outgoing", "text"))
    return out


# --------------------------------------------------------------------------
# XML/SVG, RTF, binary-heuristic, ZIP extraction
# (extraction/extractor_method.rs:699-787, extraction/raw.rs,
# extraction/deflate.rs — re-expressed with stdlib only)
# --------------------------------------------------------------------------
_XML_TAG_RE = re.compile(r"<[^>]*>")
_XML_HREF_RE = re.compile(
    r"""(?:href|xlink:href|src)\s*=\s*["']([^"'<>\s]+)["']""", re.IGNORECASE
)
_RTF_CTRL_RE = re.compile(r"\\[a-zA-Z]+-?\d* ?|[{}]|\\'[0-9a-fA-F]{2}")
# scheme-less candidates too (raw.rs uses linkify with
# url_must_have_scheme(false)); canonicalized with an http:// prefix
_WWW_RE = re.compile(r"""\bwww\.[^\s<>"')\]\x00-\x1f\x7f]+""")


def extract_xml(xml_text: str, page_url: str) -> tuple[str, list[tuple[str, str, str]]]:
    """XML/SVG: character data with tags stripped + href/xlink:href/src
    attributes resolved against the page URL (extractor_method.rs:699-726).
    Lenient regex pass — malformed markup must not raise."""
    page_host = host_of(page_url)
    links: list[tuple[str, str, str]] = []
    seen: set[str] = set()
    for m in _XML_HREF_RE.finditer(xml_text):
        raw = m.group(1).strip()
        if raw.startswith("data:"):
            if raw not in seen:
                seen.add(raw)
                links.append((raw, "data", "xml"))
            continue
        cu = _canon(raw, page_url)
        if cu is None or cu == page_url or cu in seen:
            continue
        seen.add(cu)
        links.append((cu, "onseed" if _host_cached(cu) == page_host else "outgoing", "xml"))
    import html as _html

    text = _html.unescape(_XML_TAG_RE.sub("", xml_text))
    return text, links


def extract_rtf(rtf_text: str, page_url: str) -> tuple[str, list[tuple[str, str, str]]]:
    """RTF: strip control words/groups, then linkify the residual text
    (extractor_method.rs:741-757's rtf reader analog)."""
    text = _RTF_CTRL_RE.sub(" ", rtf_text)
    text = re.sub(r"[ \t]+", " ", text).strip()
    return text, extract_plaintext(text, page_url)


def extract_binary(raw: bytes, page_url: str) -> list[tuple[str, str, str]]:
    """Binary heuristic scan (extraction/raw.rs): robust lossy UTF-8
    decode of the payload, URL-shaped substrings linkified — absolute
    http(s) plus scheme-less www. hosts."""
    text = raw.decode("utf-8", errors="ignore")
    out = extract_plaintext(text, page_url)
    seen = {u for u, _, _ in out}
    page_host = host_of(page_url)
    for m in _WWW_RE.finditer(text):
        cu = canonicalize("http://" + m.group(0).rstrip(".,;:"))
        if cu and cu != page_url and cu not in seen:
            seen.add(cu)
            out.append((cu, "onseed" if host_of(cu) == page_host else "outgoing", "binary"))
    return out


_ZIP_MAX_ENTRIES = 256
_ZIP_MAX_ENTRY_BYTES = 8 << 20
_ZIP_MAX_NESTING = 2


def extract_zip(
    raw: bytes,
    page_url: str,
    respect_nofollow: bool = True,
    aggressive: bool = False,
    nesting: int = 0,
) -> tuple[str, list[tuple[str, str, str]]]:
    """ZIP recursion (extraction/deflate.rs:33-120): open the archive,
    sniff+extract every entry with the normal dispatch, aggregate text
    (entry order, newline-joined) and first-occurrence links. Nested
    archives recurse up to _ZIP_MAX_NESTING; per-entry and entry-count
    caps guard against zip bombs (the drop is bounded, not silent —
    text notes skipped entries)."""
    import io
    import zipfile

    texts: list[str] = []
    links: list[tuple[str, str, str]] = []
    seen: set[str] = set()
    try:
        zf = zipfile.ZipFile(io.BytesIO(raw))
    except Exception:
        return "", extract_binary(raw, page_url)
    names = zf.namelist()[:_ZIP_MAX_ENTRIES]
    if len(zf.namelist()) > _ZIP_MAX_ENTRIES:
        texts.append(f"[zip: {len(zf.namelist()) - _ZIP_MAX_ENTRIES} entries skipped]")
    for name in names:
        try:
            info = zf.getinfo(name)
            if info.is_dir():
                continue
            if info.file_size > _ZIP_MAX_ENTRY_BYTES:
                texts.append(f"[zip entry {name}: skipped, too large]")
                continue
            data = zf.read(name)
        except Exception:
            continue
        fmt = sniff_format(None, data[:1024], name)
        if fmt == "ZIP" and nesting < _ZIP_MAX_NESTING:
            t, ls = extract_zip(
                data, page_url, respect_nofollow, aggressive, nesting + 1
            )
        elif fmt == "OOXML":
            t, ls = extract_ooxml(data, page_url)
        elif fmt == "ODF":
            t, ls = extract_odf(data, page_url)
        elif fmt == "PDF":
            t, ls = extract_pdf(data, page_url)
        elif fmt == "IMAGE":
            t, ls = "", extract_image(data, page_url)
        else:
            t, _enc, _err = decode_bytes(data) if fmt != "ZIP" else (None, "none", False)
            if t is None or fmt == "Unknown":
                t = ""
                ls = extract_binary(data, page_url)
            elif fmt == "HTML":
                t, ls = extract_html(t, page_url, respect_nofollow, aggressive)
            elif fmt == "JavaScript":
                ls = extract_js(t, page_url)
            elif fmt == "XML":
                t, ls = extract_xml(t, page_url)
            elif fmt == "RTF":
                t, ls = extract_rtf(t, page_url)
            elif fmt in ("PlainText", "Decodeable", "JSON"):
                ls = extract_plaintext(t, page_url)
            else:
                ls = extract_binary(data, page_url)
        if t:
            texts.append(t)
        for link in ls:
            if link[0] not in seen:
                seen.add(link[0])
                links.append(link)
    return "\n".join(texts), links


# --------------------------------------------------------------------------
# Office containers: OOXML / ODF are zip archives of XML parts
# (extractor_method.rs:733-755 dispatches them to link_scraper's
# ooxml/odf format scrapers, which unzip and scrape each XML part).
# Links: explicit external Relationship targets (.rels), plus
# href/xlink:href attributes in the XML parts. Text: the document body
# parts, tag-stripped with paragraph boundaries preserved (superset of
# the reference, which scrapes links only — supports_decoding() is
# false for OOXML/ODF, supported.rs:62-68 — declared deviation).
# --------------------------------------------------------------------------
_RELS_TAG_RE = re.compile(r"<Relationship\b[^>]*>", re.IGNORECASE)
_RELS_TARGET_RE = re.compile(r"""Target\s*=\s*["']([^"']+)["']""", re.IGNORECASE)
_RELS_EXTERNAL_RE = re.compile(r"""TargetMode\s*=\s*["']External["']""", re.IGNORECASE)
_OOXML_TEXT_PART_RE = re.compile(
    r"^(?:word/document[^/]*\.xml|xl/sharedStrings\.xml|ppt/slides/slide\d+\.xml)$"
)
_ODF_TEXT_PARTS = {"content.xml"}
_XML_PARA_RE = re.compile(r"</(?:w:p|text:p|text:h|a:p)>")


def _office_extract(
    raw: bytes,
    page_url: str,
    text_part_pred,
) -> tuple[str, list[tuple[str, str, str]]]:
    import io
    import zipfile

    page_host = host_of(page_url)
    texts: list[str] = []
    links: list[tuple[str, str, str]] = []
    seen: set[str] = set()

    def _add(raw_url: str, method: str) -> None:
        if raw_url.startswith("data:"):
            if raw_url not in seen:
                seen.add(raw_url)
                links.append((raw_url, "data", method))
            return
        cu = _canon(raw_url, page_url)
        if cu is None or cu == page_url or cu in seen:
            return
        seen.add(cu)
        links.append((cu, "onseed" if _host_cached(cu) == page_host else "outgoing", method))

    try:
        zf = zipfile.ZipFile(io.BytesIO(raw))
    except Exception:
        return "", extract_binary(raw, page_url)
    for name in zf.namelist()[:_ZIP_MAX_ENTRIES]:
        if not (name.endswith(".xml") or name.endswith(".rels")):
            continue
        try:
            info = zf.getinfo(name)
            if info.is_dir() or info.file_size > _ZIP_MAX_ENTRY_BYTES:
                continue
            part = zf.read(name).decode("utf-8", errors="replace")
        except Exception:
            continue
        if name.endswith(".rels"):
            # explicit hyperlink relationships; only External targets
            # are URLs (internal ones are archive-relative part paths)
            for tag in _RELS_TAG_RE.findall(part):
                if not _RELS_EXTERNAL_RE.search(tag):
                    continue
                m = _RELS_TARGET_RE.search(tag)
                if m:
                    _add(_html_mod.unescape(m.group(1)), "office")
            continue
        for m in _XML_HREF_RE.finditer(part):
            u = _html_mod.unescape(m.group(1).strip())
            # skip relationship-id indirections and fragments
            if u and not u.startswith("#"):
                _add(u, "office")
        if text_part_pred(name):
            body = _XML_PARA_RE.sub("\n", part)
            texts.append(_html_mod.unescape(_XML_TAG_RE.sub("", body)).strip())
    return "\n".join(t for t in texts if t), links


def extract_ooxml(raw: bytes, page_url: str) -> tuple[str, list[tuple[str, str, str]]]:
    """OOXML (docx/xlsx/pptx): external .rels targets + XML-part hrefs;
    text from the document body parts (extractor_method.rs:733-743)."""
    return _office_extract(raw, page_url, lambda n: _OOXML_TEXT_PART_RE.match(n) is not None)


def extract_odf(raw: bytes, page_url: str) -> tuple[str, list[tuple[str, str, str]]]:
    """ODF (odt/ods/odp): xlink:href links from the XML parts; text from
    content.xml (extractor_method.rs:745-755)."""
    return _office_extract(raw, page_url, lambda n: n in _ODF_TEXT_PARTS)


# --------------------------------------------------------------------------
# EXIF link scraping for IMAGE payloads (extractor_method.rs:757-766 →
# link_scraper::formats::image: read the EXIF directory, scrape URLs
# out of its string fields). Pure-struct TIFF/IFD walk — no codec
# library, none needed: EXIF is metadata, not pixels.
# --------------------------------------------------------------------------
_EXIF_MAX_ENTRIES = 64


def _exif_strings(raw: bytes) -> list[str]:
    """ASCII/UserComment fields from IFD0 + the Exif sub-IFD of a JPEG
    (APP1 Exif segment) or bare TIFF payload. Lenient: any structural
    surprise returns what was collected so far."""
    import struct

    tiff: bytes | None = None
    if raw[:4] in (b"II*\x00", b"MM\x00*"):
        tiff = raw
    elif raw[:3] == b"\xff\xd8\xff":
        # walk JPEG segments to APP1/Exif
        i = 2
        while i + 4 <= len(raw) and raw[i] == 0xFF:
            marker, seglen = raw[i + 1], int.from_bytes(raw[i + 2 : i + 4], "big")
            if marker == 0xE1 and raw[i + 4 : i + 10] == b"Exif\x00\x00":
                tiff = raw[i + 10 : i + 2 + seglen]
                break
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
            else:
                i += 2 + seglen
    if not tiff or len(tiff) < 8:
        return []
    bo = "<" if tiff[:2] == b"II" else ">"
    out: list[str] = []

    def _read_ifd(off: int, depth: int) -> None:
        if depth > 2 or off + 2 > len(tiff):
            return
        try:
            (n,) = struct.unpack_from(bo + "H", tiff, off)
        except struct.error:
            return
        for k in range(min(n, _EXIF_MAX_ENTRIES)):
            base = off + 2 + 12 * k
            if base + 12 > len(tiff):
                return
            tag, typ, cnt = struct.unpack_from(bo + "HHI", tiff, base)
            val_off = base + 8 if typ == 2 and cnt <= 4 else None
            if val_off is None:
                (ptr,) = struct.unpack_from(bo + "I", tiff, base + 8)
                val_off = ptr
            if tag == 0x8769:  # Exif sub-IFD pointer
                _read_ifd(val_off, depth + 1)
                continue
            if typ == 2:  # ASCII
                s = tiff[val_off : val_off + cnt].split(b"\x00")[0]
                try:
                    out.append(s.decode("utf-8", errors="replace"))
                except Exception:
                    pass
            elif tag == 0x9286 and typ == 7:  # UserComment: 8-byte charset prefix
                body = tiff[val_off + 8 : val_off + cnt]
                out.append(body.decode("utf-8", errors="replace"))

    _read_ifd(int.from_bytes(tiff[4:8], "little" if bo == "<" else "big"), 0)
    return out


def extract_image(raw: bytes, page_url: str) -> list[tuple[str, str, str]]:
    """IMAGE: URLs from EXIF string fields (the reference's exif
    extractor), falling back to the raw binary scan — both run under
    aggressive dispatch in the reference (extractor_method.rs:150-158,
    raw fallback is a separately registered method)."""
    out: list[tuple[str, str, str]] = []
    seen: set[str] = set()
    for s in _exif_strings(raw):
        for u, k, m in extract_plaintext(s, page_url):
            if u not in seen:
                seen.add(u)
                out.append((u, k, "exif"))
    for link in extract_binary(raw, page_url):
        if link[0] not in seen:
            seen.add(link[0])
            out.append(link)
    return out


# --------------------------------------------------------------------------
# PDF: /URI link-annotation strings + text from FlateDecode content
# streams (extractor_method.rs:779-787 → link_scraper::formats::pdf).
# stdlib zlib inflates the streams; Tj/TJ show-text operators carry the
# page text. Lenient + capped: malformed PDFs degrade to the raw scan.
# --------------------------------------------------------------------------
_PDF_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
_PDF_URI_RE = re.compile(rb"/URI\s*\(((?:\\.|[^\\()])*)\)")
_PDF_TJ_RE = re.compile(rb"\(((?:\\.|[^\\()])*)\)\s*(?:Tj|')")
_PDF_TJARR_RE = re.compile(rb"\[((?:\\.|[^\]])*?)\]\s*TJ")
_PDF_STR_RE = re.compile(rb"\(((?:\\.|[^\\()])*)\)")
_PDF_ESC = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
            b"(": b"(", b")": b")", b"\\": b"\\"}
_PDF_MAX_STREAMS = 256


def _pdf_unescape(b: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(b):
        c = b[i : i + 1]
        if c == b"\\" and i + 1 < len(b):
            nxt = b[i + 1 : i + 2]
            if nxt in _PDF_ESC:
                out += _PDF_ESC[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal \ooo (1-3 digits)
                j = i + 1
                while j < min(i + 4, len(b)) and b[j : j + 1].isdigit():
                    j += 1
                out.append(int(b[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            i += 1
            continue
        out += c
        i += 1
    return out.decode("utf-8", errors="replace")


def extract_pdf(raw: bytes, page_url: str) -> tuple[str, list[tuple[str, str, str]]]:
    import zlib

    page_host = host_of(page_url)
    bodies = [raw]
    for m in _PDF_STREAM_RE.finditer(raw):
        if len(bodies) > _PDF_MAX_STREAMS:
            break
        try:
            bodies.append(zlib.decompress(m.group(1)))
        except Exception:
            continue
    texts: list[str] = []
    links: list[tuple[str, str, str]] = []
    seen: set[str] = set()
    for body in bodies:
        for m in _PDF_URI_RE.finditer(body):
            u = _pdf_unescape(m.group(1))
            cu = _canon(u, page_url)
            if cu and cu != page_url and cu not in seen:
                seen.add(cu)
                links.append(
                    (cu, "onseed" if _host_cached(cu) == page_host else "outgoing", "pdf")
                )
        parts = [_pdf_unescape(m.group(1)) for m in _PDF_TJ_RE.finditer(body)]
        for arr in _PDF_TJARR_RE.finditer(body):
            parts.extend(_pdf_unescape(s.group(1)) for s in _PDF_STR_RE.finditer(arr.group(1)))
        if parts:
            texts.append(" ".join(parts))
    text = "\n".join(texts)
    for u, k, m in extract_plaintext(text, page_url):
        if u not in seen:
            seen.add(u)
            links.append((u, k, "pdf"))
    return text, links


# --------------------------------------------------------------------------
# the batched stage: mapInPandas over (url, html[, content_type])
# --------------------------------------------------------------------------
def extract_pages_batch(
    batches: Iterable[pd.DataFrame],
    respect_nofollow: bool = True,
    aggressive: bool = False,
    gdbr_model=None,
) -> Iterator[pd.DataFrame]:
    """mapInPandas body: pages batch -> EXTRACTED_SCHEMA batch.

    Extractor dispatch (extraction/extractor/mod.rs:37-158): format
    decides which extractor runs; HTML -> DOM pass, JavaScript -> token
    scan, PlainText/Decodeable -> linkify, else no links.

    ``gdbr_model`` (a functions.gdbr.GdbrModel) enables consent-banner
    removal on HTML text, like the reference's optional gdbr registry
    (off by default — byte-parity mode). Text-only cleaning: banner
    LINKS are not suppressed (documented deviation from remove_gdbr,
    which detaches the node before extraction).
    """
    for pdf in batches:
        rows = []
        has_ct = "content_type" in pdf.columns
        # metadata columns pass through untouched: pages-table response
        # metadata (real status/headers when the input carries them,
        # crawl/crawler/result.rs:32-90 meta fidelity) and the admitted
        # row's crawl state (host/is_seed/depth triple), which rides
        # the fetch join through extraction so the round plan never
        # rebuilds the admitted set as a second broadcast hash relation
        passthrough = [
            c
            for c in (
                "warc_ts", "status", "headers",
                "host", "is_seed",
                "depth_on_website", "distance_to_seed", "total_distance_to_seed",
            )
            if c in pdf.columns
        ]
        for i in range(len(pdf)):
            url = pdf["url"].iat[i]
            raw = pdf["html"].iat[i]
            raw = bytes(raw) if raw is not None else None
            ct = pdf["content_type"].iat[i] if has_ct else None
            extras = tuple(pdf[c].iat[i] for c in passthrough)
            fmt = sniff_format(ct, raw[:1024] if raw else None, url)
            if fmt in ("ZIP", "OOXML", "ODF", "PDF", "IMAGE"):
                # raw-bytes formats: no decode ladder (supports_decoding
                # is false for these in supported.rs:62-68; PDF streams
                # carry their own encoding)
                enc, had_err = "binary", False
                if fmt == "ZIP":
                    dom_text, links = extract_zip(
                        raw or b"", url,
                        respect_nofollow=respect_nofollow, aggressive=aggressive,
                    )
                elif fmt == "OOXML":
                    dom_text, links = extract_ooxml(raw or b"", url)
                elif fmt == "ODF":
                    dom_text, links = extract_odf(raw or b"", url)
                elif fmt == "PDF":
                    dom_text, links = extract_pdf(raw or b"", url)
                    dom_text = dom_text or None
                else:  # IMAGE: metadata links only, pixels are not text
                    dom_text, links = None, extract_image(raw or b"", url)
                lang, conf = detect_lang(dom_text)
                row = (
                    url, enc, had_err, dom_text, lang, conf, fmt,
                    [
                        {
                            "url": u,
                            "kind": k,
                            "method": m,
                            "host": None if k == "data" else _origin_cached(u),
                        }
                        for (u, k, m) in links
                    ],
                )
                rows.append((url,) + extras + row[1:])
                continue
            page_host = _host_cached(url) if url else None
            tld = page_host.rsplit(".", 1)[-1] if page_host else None
            text, enc, had_err = decode_bytes(raw, tld=tld)
            if text is None:
                row = (url, enc, had_err, None, None, None, fmt, [])
                rows.append((url,) + extras + row[1:])
                continue
            if fmt == "HTML":
                dom_text, links = extract_html(
                    text, url, respect_nofollow=respect_nofollow, aggressive=aggressive
                )
                if gdbr_model is not None:
                    from .gdbr import remove_consent_banner

                    cleaned, removed, _score = remove_consent_banner(text, gdbr_model)
                    if removed:
                        dom_text = cleaned
            elif fmt == "JavaScript":
                dom_text, links = text, extract_js(text, url)
            elif fmt == "XML":
                dom_text, links = extract_xml(text, url)
            elif fmt == "RTF":
                dom_text, links = extract_rtf(text, url)
            elif fmt in ("PlainText", "Decodeable", "StructuredPlainText"):
                dom_text, links = text, extract_plaintext(text, url)
            elif fmt == "Unknown":
                # binary payload: no text (the lossy decode is mojibake,
                # not document text), links from the raw UTF-8 windowed
                # scan (extraction/raw.rs fallback extractor)
                dom_text, links = None, extract_binary(raw or b"", url)
            else:
                dom_text, links = text, []
            lang, conf = detect_lang(dom_text)
            row = (
                url,
                enc,
                had_err,
                dom_text,
                lang,
                conf,
                fmt,
                [
                        {
                            "url": u,
                            "kind": k,
                            "method": m,
                            "host": None if k == "data" else _origin_cached(u),
                        }
                        for (u, k, m) in links
                    ],
            )
            rows.append((url,) + extras + row[1:])
        cols = (
            ["url"]
            + passthrough
            + [
                "encoding", "had_decode_errors", "text",
                "lang", "lang_confidence", "format", "links",
            ]
        )
        yield pd.DataFrame(rows, columns=cols)
