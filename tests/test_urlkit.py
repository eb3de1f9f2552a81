"""URL kernel unit tests — ports the test intent of
atra/src/url/url_with_depth.rs:303-388 (depth rules) and
atra/src/config/crawl.rs:482-539 (budget rules)."""

from atra_spark.urlkit import (
    ABSOLUTE,
    NORMAL,
    SEED_ONLY,
    SINGLE_PAGE,
    Budget,
    Depth,
    advance_depth,
    canonicalize,
    clean_url,
    host_of,
    origin,
)


class TestWhatwgNormalization:
    """Pinned expectations derived from the Rust ``url`` crate's
    documented WHATWG behavior (the reference's AtraUri parse path) —
    exactly the cases urllib handles differently out of the box."""

    def test_dot_segments_removed_in_absolute_urls(self):
        assert canonicalize("https://h.example/a/./b/../c") == "https://h.example/a/c"
        assert canonicalize("https://h.example/a/b/..") == "https://h.example/a/"
        assert canonicalize("https://h.example/./") == "https://h.example/"

    def test_dotdot_above_root_clamps(self):
        assert canonicalize("https://h.example/../../x") == "https://h.example/x"
        assert canonicalize("https://h.example/a/../../../b") == "https://h.example/b"

    def test_path_percent_encoding(self):
        assert canonicalize("https://h.example/a b") == "https://h.example/a%20b"
        assert (
            canonicalize('https://h.example/a"b<c>d`e{f}g')
            == "https://h.example/a%22b%3Cc%3Ed%60e%7Bf%7Dg"
        )
        # non-ASCII path chars are UTF-8 percent-encoded
        assert canonicalize("https://h.example/caf\xe9") == "https://h.example/caf%C3%A9"

    def test_existing_percent_triplets_preserved(self):
        assert canonicalize("https://h.example/a%2Fb?x=%3D") == "https://h.example/a%2Fb?x=%3D"

    def test_backslash_is_path_separator(self):
        # special schemes treat \ as / (WHATWG)
        assert canonicalize("https://h.example/a\\b") == "https://h.example/a/b"

    def test_query_percent_encoding(self):
        assert canonicalize("https://h.example/?q=a b") == "https://h.example/?q=a%20b"
        assert canonicalize("https://h.example/?q='v'") == "https://h.example/?q=%27v%27"

    def test_idn_host_punycoded(self):
        assert canonicalize("https://b\xfccher.example/x") == "https://xn--bcher-kva.example/x"
        assert canonicalize("https://例え.jp/") == "https://xn--r8jz45g.jp/"


class TestCanonicalize:
    def test_fragment_always_stripped(self):
        assert canonicalize("https://a.example/p#frag") == "https://a.example/p"
        assert canonicalize("https://a.example/#x") == "https://a.example/"

    def test_scheme_host_lowercased(self):
        assert canonicalize("HTTPS://WwW.Example.COM/Path") == "https://www.example.com/Path"

    def test_default_ports_dropped(self):
        assert canonicalize("http://a.example:80/x") == "http://a.example/x"
        assert canonicalize("https://a.example:443/x") == "https://a.example/x"
        assert canonicalize("https://a.example:8443/x") == "https://a.example:8443/x"

    def test_empty_path_becomes_slash(self):
        assert canonicalize("https://a.example") == "https://a.example/"

    def test_relative_resolution(self):
        base = "https://a.example/dir/page.html"
        assert canonicalize("other.html", base=base) == "https://a.example/dir/other.html"
        assert canonicalize("/abs.html", base=base) == "https://a.example/abs.html"
        assert canonicalize("//b.example/x", base=base) == "https://b.example/x"

    def test_fragment_only_resolves_to_base(self):
        base = "https://a.example/p.html"
        assert canonicalize("#frag", base=base) == "https://a.example/p.html"

    def test_rejects_non_http(self):
        assert canonicalize("ftp://a.example/x") is None
        assert canonicalize("mailto:x@y.z") is None
        assert canonicalize("not a url") is None
        assert canonicalize("") is None
        assert canonicalize(None) is None

    def test_query_preserved(self):
        assert canonicalize("https://a.example/p?q=1&r=2") == "https://a.example/p?q=1&r=2"

    def test_clean_url_strips_query_and_password(self):
        assert clean_url("https://u:pw@a.example/p?q=1#f") == "https://u@a.example/p"
        assert clean_url("https://a.example/p?q=1") == "https://a.example/p"


class TestOrigin:
    def test_registrable_domain(self):
        assert origin("https://www.sub.example.com/x") == "example.com"
        assert origin("https://a.co.uk/x") == "a.co.uk"
        assert origin("https://www.a.co.uk/x") == "a.co.uk"

    def test_fixture_hosts_pass_through(self):
        assert origin("https://host0001.example/p") == "host0001.example"
        assert origin("https://mega.example/p") == "mega.example"

    def test_ip_passthrough(self):
        assert origin("https://192.168.0.1/x") == "192.168.0.1"

    def test_single_label(self):
        assert origin("https://localhost/x") == "localhost"

    def test_host_of(self):
        assert host_of("https://A.Example/x") == "a.example"


class TestDepth:
    """depth update rules (url_with_depth.rs:69-110)."""

    def test_same_host(self):
        d = advance_depth(Depth(2, 1, 5), same_host=True)
        assert d == Depth(3, 1, 6)

    def test_host_change(self):
        d = advance_depth(Depth(2, 1, 5), same_host=False)
        assert d == Depth(0, 2, 6)

    def test_merge_to_lowest(self):
        a, b = Depth(3, 1, 7), Depth(2, 4, 6)
        assert a.merge_to_lowest(b) == Depth(2, 1, 6)


class TestBudget:
    """budget rules (config/crawl.rs:445-470); 0 = unlimited."""

    def test_seed_only(self):
        b = Budget(kind=SEED_ONLY, depth_on_website=2)
        assert b.is_in_budget(Depth(1, 0, 3))
        assert not b.is_in_budget(Depth(2, 0, 3))  # depth bound hit
        assert not b.is_in_budget(Depth(0, 1, 3))  # off-seed host

    def test_normal(self):
        b = Budget(kind=NORMAL, depth_on_website=3, distance_to_seed=1)
        assert b.is_in_budget(Depth(2, 1, 9))
        assert not b.is_in_budget(Depth(3, 1, 9))
        assert not b.is_in_budget(Depth(0, 2, 9))

    def test_absolute(self):
        b = Budget(kind=ABSOLUTE, total_distance=4)
        assert b.is_in_budget(Depth(9, 9, 3))
        assert not b.is_in_budget(Depth(0, 0, 4))

    def test_single_page(self):
        b = Budget(kind=SINGLE_PAGE)
        assert b.is_in_budget(Depth(0, 0, 0))
        assert not b.is_in_budget(Depth(0, 0, 1))

    def test_zero_means_unlimited(self):
        assert Budget(kind=NORMAL).is_in_budget(Depth(99, 0, 99))
        assert Budget(kind=ABSOLUTE).is_in_budget(Depth(99, 99, 99))

    def test_normal_distance_zero_is_seed_distance_only(self):
        """Normal ALWAYS enforces distance_to_seed <= bound — 0 means
        the seed's own host only, NOT unlimited (config/crawl.rs:455-462
        has no 0-unlimited arm for the distance bound)."""
        b = Budget(kind=NORMAL, depth_on_website=0, distance_to_seed=0)
        assert b.is_in_budget(Depth(5, 0, 5))
        assert not b.is_in_budget(Depth(0, 1, 1))

    def test_single_page_requires_all_zero(self):
        b = Budget(kind=SINGLE_PAGE)
        assert not b.is_in_budget(Depth(1, 0, 0))
        assert not b.is_in_budget(Depth(0, 1, 0))


class TestFastPathEquivalence:
    """The regex fast path in canonicalize admits only inputs the full
    WHATWG parser maps to themselves — pinned here by running BOTH
    paths over adversarial and randomized URLs."""

    def _slow(self, monkeypatch):
        from atra_spark import urlkit

        monkeypatch.setattr(urlkit, "_fast_canonical", lambda u: None)
        return urlkit.canonicalize

    CASES = [
        "https://host0001.example/p3.html",
        "http://a.com",
        "http://a.com/",
        "http://a.com?x=1",
        "http://a.com/p?",
        "http://a.com/p?a=1&b=2",
        "http://a.com/a/b/c.html",
        "http://a.com/a//b",
        "http://a.com/a/./b",
        "http://a.com/a/../b",
        "http://a.com/..",
        "http://a.com/.",
        "HTTP://A.com/p",
        "http://a.com:80/p",
        "http://a.com:8080/p",
        "http://user:pw@a.com/p",
        "http://a.com/p q",
        "http://a.com/p%20q",
        "http://a.com/p#frag",
        "http://a.com./p",
        "http://a.com/p'q",
        "http://a.com/p?x='y'",
        "http://a.com/p?x=a/..",
        "http://xn--nxasmq6b.example/p",
        "http://a_b.com/p",
        "http://a.com/~u/p.html",
        "http://a.com/p\\q",
        "ftp://a.com/p",
        "http:///p",
    ]

    def test_explicit_corpus(self, monkeypatch):
        from atra_spark.urlkit import canonicalize

        # fast-path results captured BEFORE the fast path is disabled
        got = {u: canonicalize(u) for u in self.CASES}
        slow = self._slow(monkeypatch)
        for u in self.CASES:
            assert got[u] == slow(u), u

    def test_fast_path_actually_triggers(self):
        from atra_spark.urlkit import _fast_canonical

        assert _fast_canonical("https://host0001.example/p3.html") is not None
        assert _fast_canonical("http://a.com/p?a=1&b=2") is not None
        assert _fast_canonical("http://a.com/a/../b") is None  # dot segment
        assert _fast_canonical("http://a.com/p%20q") is None  # pct triplet

    def test_relative_resolution(self, monkeypatch):
        from atra_spark.urlkit import canonicalize

        bases = [
            "https://host0001.example/dir/page.html",
            "http://a.com:8080/dir/",
            "http://user@a.com/x",
            "https://b.example",
        ]
        refs = ["/p3.html", "/a/b?x=1", "/", "//other.com/p", "p3.html",
                "../up.html", "?q=2", "/p%20q", "/p#f"]
        got = {(b, r): canonicalize(r, base=b) for b in bases for r in refs}
        slow = self._slow(monkeypatch)
        for b in bases:
            for r in refs:
                assert got[(b, r)] == slow(r, base=b), (b, r)

    def test_randomized(self, monkeypatch):
        import random

        from atra_spark.urlkit import canonicalize

        rng = random.Random(7)
        alphabet = "abcZ09._-~%20/?&='\\:@#! "
        urls = []
        for _ in range(3000):
            scheme = rng.choice(["http", "https", "HTTP"])
            host = rng.choice(["a.com", "A.com", "a.com.", "a-b.c09.example", "a..b"])
            tail = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 18)))
            urls.append(f"{scheme}://{host}/{tail}")
        got = {u: canonicalize(u) for u in urls}
        slow = self._slow(monkeypatch)
        for u in urls:
            assert got[u] == slow(u), u


class TestUrlTemplates:
    def test_trap_template_collapses(self, spark):
        from atra_spark.functions.jvm_url import url_templates

        urls = (
            [(f"https://trap.example/cal/2024/{m:02d}/{d:02d}?sid={m*d}",) for m in range(1, 4) for d in range(1, 6)]
            + [("https://ok.example/about",), ("https://ok.example/contact",)]
        )
        df = spark.createDataFrame(urls, "url string")
        got = {
            (r["host"], r["template"]): (r["n_urls"], r["n_distinct_urls"])
            for r in url_templates(df, min_urls=1).collect()
        }
        # the 15 calendar URLs collapse to ONE template
        assert got[("trap.example", "/cal/{n}/{n}/{n}")] == (15, 15)
        assert got[("ok.example", "/about")] == (1, 1)
        # query strings never leak into templates
        assert all("sid" not in t for _, t in got)

    def test_min_urls_filter_and_dup_urls(self, spark):
        from atra_spark.functions.jvm_url import url_templates

        df = spark.createDataFrame(
            [("https://a.example/p1",), ("https://a.example/p1",), ("https://a.example/q",)],
            "url string",
        )
        got = {r["template"]: r for r in url_templates(df, min_urls=2).collect()}
        assert list(got) == ["/p{n}"]
        assert got["/p{n}"]["n_urls"] == 2 and got["/p{n}"]["n_distinct_urls"] == 1
