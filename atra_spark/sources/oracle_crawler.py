"""Serial reference implementation of the crawl round semantics.

A deliberately simple, dict-based, single-threaded crawler that
consumes the fixture's **golden link graph** (by-construction truth,
not the engine's extractor) and produces golden outputs:

- ``seen``  — final URL-seen set with link-state kinds
  (atra/src/link_state/kind.rs:41-57 codes)
- ``order`` — deterministic crawl ordering (round, host,
  admission_index, url) per SURVEY.md §7
- ``edges`` — web graph (atra/src/web_graph.rs:36-96 semantics)

The Spark engine (atra_spark.plans.crawl) must reproduce all three
from the raw HTML alone. The admission pipeline mirrors the
reference's checker order (atra/src/crawl/crawler.rs:653-704):
age -> state -> blacklist -> budget -> robots -> per-host politeness
top-k.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..config import CrawlConfig
from ..schemas import (
    KIND_DISCOVERED,
    KIND_INTERNAL_ERROR,
    KIND_PROCESSED_AND_STORED,
)
from ..urlkit import Depth, advance_depth, host_of, origin


def robots_disallowed(robots_txt: bytes | None, status: int, path: str) -> bool:
    """Minimal robots semantics matching the fixture corpus: 4xx/5xx or
    absent -> everything allowed (atra/src/robots/manager_impl.rs:120-125);
    otherwise honor ``Disallow:`` prefixes for User-agent: *."""
    if robots_txt is None or status >= 400:
        return False
    for line in robots_txt.decode("utf-8", errors="replace").splitlines():
        line = line.strip()
        if line.lower().startswith("disallow:"):
            prefix = line.split(":", 1)[1].strip()
            if prefix and path.startswith(prefix):
                return True
    return False


def robots_crawl_delay_ms(robots_txt: bytes | None, status: int) -> int | None:
    if robots_txt is None or status >= 400:
        return None
    for line in robots_txt.decode("utf-8", errors="replace").splitlines():
        line = line.strip()
        if line.lower().startswith("crawl-delay:"):
            try:
                return int(float(line.split(":", 1)[1].strip()) * 1000)
            except ValueError:
                return None
    return None


@dataclass
class OracleResult:
    # url -> (kind, is_seed, depth)
    seen: dict[str, tuple[int, bool, Depth]] = field(default_factory=dict)
    # (round, host, admission_index, url)
    order: list[tuple[int, str, int, str]] = field(default_factory=list)
    # (src, dst, kind, round)
    edges: list[tuple[str, str, str, int]] = field(default_factory=list)
    rounds_run: int = 0


def crawl_oracle(
    golden_links: dict[str, list[tuple[str, str, str]]],
    page_urls: set[str],
    robots: dict[str, tuple[bytes | None, int]],
    seeds: list[str],
    config: CrawlConfig,
    max_rounds: int | None = None,
) -> OracleResult:
    import time

    res = OracleResult()
    blacklist = [re.compile(p) for p in config.blacklist]
    max_rounds = max_rounds if max_rounds is not None else config.max_rounds
    interval = config.recrawl_interval_s

    # frontier rows: url -> (is_seed, age, enqueue_round, depth)
    frontier: dict[str, tuple[bool, int, int, Depth]] = {}
    seen_ts: dict[str, float] = {}  # last state-change wall time
    host_last_access: dict[str, float] = {}  # recrawl_management analog
    refilled = False
    for s in seeds:
        if s in res.seen:
            continue  # duplicate seed: second enqueue is a no-op
        d = Depth(0, 0, 0)
        frontier[s] = (True, 0, 0, d)
        res.seen[s] = (KIND_DISCOVERED, True, d)
        seen_ts[s] = time.time()
        res.edges.append((origin(s) or "", s, "seed", 0))

    rnd = -1
    while rnd + 1 < max_rounds:
        if not frontier:
            # after-drain recrawl refill, once (app/atra.rs:392-414)
            if interval is not None and not refilled:
                refilled = True
                now = time.time()
                for u, (k, s, d) in res.seen.items():
                    if k == KIND_PROCESSED_AND_STORED and (
                        now - seen_ts.get(u, 0.0) > interval
                    ):
                        frontier[u] = (s, 0, rnd + 1, d)
            if not frontier:
                break
        rnd += 1
        res.rounds_run = rnd + 1

        # ---- admission filters (checker order, crawler.rs:653-704) ----
        eligible: list[tuple[str, bool, int, int, Depth]] = []
        for url, (is_seed, age, enq, depth) in list(frontier.items()):
            if config.max_queue_age and age > config.max_queue_age:
                del frontier[url]  # stale (polling.rs:101-105)
                continue
            kind = res.seen[url][0]
            allowed_kinds = (
                (KIND_DISCOVERED, KIND_PROCESSED_AND_STORED)
                if interval is not None
                else (KIND_DISCOVERED,)
            )
            if kind not in allowed_kinds:
                del frontier[url]  # state-based drop (polling.rs:180-204)
                continue
            host = origin(url) or ""
            if interval is not None and kind == KIND_PROCESSED_AND_STORED:
                # recrawl cooldown (crawler.rs:264-300): recent host
                # access -> re-enqueue with age 0, skip this round
                la = host_last_access.get(host)
                if la is not None and (time.time() - la) <= interval:
                    frontier[url] = (is_seed, 0, enq, depth)
                    continue
            if any(b.search(url) for b in blacklist):
                del frontier[url]
                continue
            if not config.budget_for(host).is_in_budget(depth):
                del frontier[url]
                continue
            if config.respect_robots_txt:
                rtxt, status = robots.get(host, (None, 404))
                path = url.split(host, 1)[1] if host in url else "/"
                if robots_disallowed(rtxt, status, path):
                    del frontier[url]
                    continue
            eligible.append((url, is_seed, age, enq, depth))

        if not eligible:
            break

        # ---- per-host politeness top-k (intervals.rs:25-95 analog) ----
        by_host: dict[str, list[tuple[str, bool, int, int, Depth]]] = {}
        for row in eligible:
            by_host.setdefault(origin(row[0]) or "", []).append(row)

        admitted: list[tuple[str, str, int, Depth, bool]] = []  # url, host, idx, depth, is_seed
        for host in sorted(by_host):
            rtxt, status = robots.get(host, (None, 404))
            delay = robots_crawl_delay_ms(rtxt, status) or config.delay_ms
            k = max(1, config.round_budget_ms // delay)
            rows = sorted(
                by_host[host],
                key=lambda r: (not r[1], r[3], r[0]),  # is_seed desc, enqueue asc, url asc
            )
            for idx, (url, is_seed, age, enq, depth) in enumerate(rows):
                if idx < k:
                    admitted.append((url, host, idx, depth, is_seed))
                    res.order.append((rnd, host, idx, url))
                    del frontier[url]
                else:  # deferred: age+1, host_was_in_use (element.rs:48-51)
                    frontier[url] = (is_seed, age + 1, enq, depth)

        # ---- fetch (join pages) + link expansion ----
        candidates: dict[str, Depth] = {}
        cand_meta: dict[str, bool] = {}
        for url, host, idx, depth, is_seed in admitted:
            host_last_access[host] = time.time()
            seen_ts[url] = time.time()
            if url not in page_urls:  # fetch error analog
                res.seen[url] = (KIND_INTERNAL_ERROR, is_seed, depth)
                continue
            res.seen[url] = (KIND_PROCESSED_AND_STORED, is_seed, depth)
            for dst, kind, method in golden_links.get(url, []):
                if kind == "data":
                    continue
                res.edges.append((url, dst, "link", rnd))
                # full-host equality, not the origin/politeness key
                # (atra_uri.rs compare_hosts :200-225)
                same_host = host_of(dst) == host_of(url)
                nd = advance_depth(depth, same_host)
                if dst in candidates:  # within-round depth merge (depth.rs:59-65)
                    candidates[dst] = candidates[dst].merge_to_lowest(nd)
                else:
                    candidates[dst] = nd
                cand_meta[dst] = False

        # ---- seen-set anti-join + enqueue (contexts/local/context.rs:235-259)
        for dst, nd in candidates.items():
            if dst in res.seen:
                continue
            res.seen[dst] = (KIND_DISCOVERED, False, nd)
            seen_ts[dst] = time.time()
            frontier[dst] = (False, 0, rnd + 1, nd)

    return res
