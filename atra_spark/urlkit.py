"""Pure-Python URL kernel: canonicalize, origin, depth, budget.

Re-implements (from spec, not code) the reference URL semantics:

- fragment always stripped at construction  (atra/src/url/url_with_depth.rs:44-47,113-117)
- clean_url strips query + password         (atra/src/url/cleaner.rs:51-79)
- origin = PSL registrable domain, fallback host, lowercase
                                            (atra/src/url/origin.rs:23-49)
- depth update rules                        (atra/src/url/url_with_depth.rs:69-110)
- budget settings                           (atra/src/config/crawl.rs:366-470)

Everything here is scalar Python used *inside* Arrow-batched pandas
UDFs (atra_spark.functions.url_udfs) — never as row-at-a-time Spark
UDFs.
"""

from __future__ import annotations

from dataclasses import dataclass
from urllib.parse import urljoin, urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": 443 - 363, "https": 443, "ftp": 21, "ws": 80, "wss": 443}
_DEFAULT_PORTS["http"] = 80

# Minimal embedded public-suffix subset. The fixture universe uses
# ``*.example``; the extra entries keep the origin function honest for
# real-world shaped URLs in tests. At production scale this would be
# the full PSL snapshot broadcast to executors.
_MULTI_LABEL_SUFFIXES = {
    "co.uk",
    "ac.uk",
    "gov.uk",
    "com.au",
    "co.jp",
    "com.br",
    "co.in",
}


def canonicalize(url: str, base: str | None = None) -> str | None:
    """Canonical absolute URL or None if unparseable/unsupported.

    Rules (the engine-wide spec; fixtures generate golden URLs with the
    same function family so parity is exact):
      1. resolve relative references against ``base`` (RFC 3986)
      2. strip the fragment ALWAYS
      3. lowercase scheme and host
      4. drop default ports (http:80, https:443)
      5. empty path -> "/"
      6. only http/https survive ("data:" handled by callers as Data links)
    """
    if url is None:
        return None
    u = url.strip()
    if not u:
        return None
    try:
        if base:
            u = urljoin(base, u)
        parts = urlsplit(u)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    host = (parts.hostname or "").lower()
    if not host:
        return None
    userinfo = ""
    if parts.username:
        userinfo = parts.username
        if parts.password:
            userinfo += f":{parts.password}"
        userinfo += "@"
    try:
        port = parts.port
    except ValueError:
        return None
    netloc = host
    if port is not None and port != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    netloc = userinfo + netloc
    path = parts.path or "/"
    return urlunsplit((scheme, netloc, path, parts.query, ""))


def clean_url(url: str) -> str | None:
    """Canonicalize then strip query and password (cleaner.rs:51-79)."""
    c = canonicalize(url)
    if c is None:
        return None
    parts = urlsplit(c)
    netloc = parts.netloc
    if "@" in netloc:
        userinfo, hostport = netloc.rsplit("@", 1)
        netloc = userinfo.split(":", 1)[0] + "@" + hostport
    return urlunsplit((parts.scheme, netloc, parts.path or "/", "", ""))


def host_of(url: str) -> str | None:
    """Lowercased hostname of a canonical URL (no PSL collapse)."""
    try:
        h = urlsplit(url).hostname
    except ValueError:
        return None
    return h.lower() if h else None


def origin(url: str) -> str | None:
    """Politeness key: registrable domain, fallback full host, lowercase.

    Mirrors atra/src/url/origin.rs:23-49 (psl crate -> registrable
    domain; IPs and single labels pass through).
    """
    h = host_of(url)
    if not h:
        return None
    if h.replace(".", "").isdigit() or ":" in h:  # IPv4 / IPv6
        return h
    labels = h.split(".")
    if len(labels) <= 2:
        return h
    two = ".".join(labels[-2:])
    if two in _MULTI_LABEL_SUFFIXES:
        return ".".join(labels[-3:])
    return two


@dataclass(frozen=True)
class Depth:
    """Depth triple (atra/src/url/depth.rs:27-34)."""

    depth_on_website: int = 0
    distance_to_seed: int = 0
    total_distance_to_seed: int = 0

    def merge_to_lowest(self, other: "Depth") -> "Depth":
        """Per-component min (depth.rs:59-65)."""
        return Depth(
            min(self.depth_on_website, other.depth_on_website),
            min(self.distance_to_seed, other.distance_to_seed),
            min(self.total_distance_to_seed, other.total_distance_to_seed),
        )


def advance_depth(parent: Depth, same_host: bool) -> Depth:
    """Depth update on link expansion (url_with_depth.rs:69-110).

    same host  -> depth_on_website+1, distance_to_seed unchanged
    host change-> depth_on_website=0, distance_to_seed+1
    always     -> total_distance_to_seed+1
    """
    if same_host:
        return Depth(
            parent.depth_on_website + 1,
            parent.distance_to_seed,
            parent.total_distance_to_seed + 1,
        )
    return Depth(0, parent.distance_to_seed + 1, parent.total_distance_to_seed + 1)


# --------------------------------------------------------------------------
# Budgets (config/crawl.rs:366-405 enum; is_in_budget :445-470).
# A depth_on_website / total_distance bound of 0 means "unlimited" in
# the reference, but the Normal arm's distance_to_seed is ALWAYS
# enforced (`url_depth.distance_to_seed.le(depth_distance)`,
# config/crawl.rs:455-462) — 0 means "seed distance only", not
# unlimited. Callers wanting unbounded seed distance pass a large
# bound (UNBOUNDED_DISTANCE).
# --------------------------------------------------------------------------
UNBOUNDED_DISTANCE = 1 << 30

@dataclass(frozen=True)
class Budget:
    kind: str  # seed_only | normal | absolute | single_page
    depth_on_website: int = 0
    distance_to_seed: int = 0
    total_distance: int = 0

    def is_in_budget(self, d: Depth) -> bool:
        if self.kind == "single_page":
            # reference: url.depth.is_zero() — all three components
            return (
                d.depth_on_website == 0
                and d.distance_to_seed == 0
                and d.total_distance_to_seed == 0
            )
        if self.kind == "absolute":
            return self.total_distance == 0 or d.total_distance_to_seed < self.total_distance
        on_site_ok = self.depth_on_website == 0 or d.depth_on_website < self.depth_on_website
        if self.kind == "seed_only":
            return d.distance_to_seed == 0 and on_site_ok
        if self.kind == "normal":
            return on_site_ok and d.distance_to_seed <= self.distance_to_seed
        raise ValueError(f"unknown budget kind {self.kind!r}")


SEED_ONLY = "seed_only"
NORMAL = "normal"
ABSOLUTE = "absolute"
SINGLE_PAGE = "single_page"
