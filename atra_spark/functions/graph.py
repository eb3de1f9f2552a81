"""Web-graph analytics over the crawl's edge table.

The reference exports a web graph (link_state/db.rs edge appends +
export, SURVEY.md §2.2 web-graph sink); this module adds the analysis
pass a production crawl runs ON that graph — PageRank — as an
iterative DataFrame job, the same shape as ``dedup.connected_components``
(loop of join+agg with a localCheckpoint to keep lineage flat).

100 TB plan: each PageRank iteration is ONE shuffle keyed on the
destination node (the contribution aggregation); the rank and
out-degree relations are narrow (node, double). The edge relation is
re-read per iteration — at scale, pre-partition/bucket the edges by
``src`` once so the per-iteration contribution join is co-located and
only the (tiny) rank vector moves. Dangling mass (nodes with no
out-edges) is redistributed uniformly each iteration, matching the
textbook formulation, so ranks sum to ~1 throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 5,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration power-method PageRank.

    ``edges``: (src, dst) pairs; duplicates are collapsed (an edge
    either exists or not — the reference's web graph is a set of
    labeled edges). Returns (node, pr) for every node appearing as
    src or dst after ``iterations`` rounds of
    ``pr = (1-d)/N + d*(sum_in(pr/out_deg) + dangling/N)``.

    Deterministic given the edge set, so a fixed-iteration SQL twin
    (unrolled CTEs) reproduces it bit-for-bit up to summation order.
    """
    # cached: every iteration joins the edge relation, and without the
    # cache each of the `iterations` actions replays the upstream scan
    # + the distinct exchange from scratch (measured round 6: the edge
    # re-derivation was most of the per-iteration wall on the bench
    # graph). nodes/out_deg are equally re-read per iteration.
    # Pre-partitioned by ``src`` (the module docstring's 100 TB plan,
    # now actually done): distinct() leaves the cache partitioned by
    # (src, dst), so every contribution join re-exchanged the FULL
    # edge relation per iteration. One up-front src repartition makes
    # the cached partitioning THE join partitioning — per iteration
    # only the narrow (node, pr) rank relation moves, and out_deg's
    # groupBy(src) collapses into the same layout (guide §2.4). The
    # oracle's 1e-6-guarded 6-decimal rounding absorbs the partial-sum
    # reorder, same as any partition-count change would.
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .repartition("src")
        .cache()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    nodes = nodes.cache()
    n = nodes.count()  # also materializes e's cache (nodes derive from e)
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg")).cache()
    # no explicit count: the first iteration's job fills the cache —
    # an eager count here was one whole extra Spark job (round 6)

    d = float(damping)
    pr = nodes.select("node", F.lit(1.0 / n).alias("pr"))
    n_iter = int(iterations)
    for _it in range(n_iter):
        ranked = pr.join(out_deg, pr["node"] == out_deg["src"], "left").select(
            pr["node"].alias("node"), "pr", "deg"
        )
        # dangling mass (rank held by nodes with no outgoing edge) as a
        # broadcast 1-row aggregate — no driver round-trip per iteration
        dang = ranked.filter(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dang")
        )
        contrib = (
            e.join(ranked.filter(F.col("deg").isNotNull()), e["src"] == ranked["node"])
            .select(F.col("dst").alias("node"), (F.col("pr") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        pr = (
            nodes.join(contrib, on="node", how="left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit((1.0 - d) / n)
                    + F.lit(d)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("dang") / F.lit(float(n))
                    )
                ).alias("pr"),
            )
            # lazy checkpoints truncate lineage at once but defer
            # materialization, so the whole iteration chain runs as ONE
            # Spark job instead of one driver-synchronized checkpoint
            # job per iteration (round 6; values are bit-identical, the
            # per-iteration plan is unchanged). The LAST checkpoint is
            # eager: it drives that single job, after which the cached
            # e/nodes/out_deg relations can be dropped safely.
            .localCheckpoint(eager=_it == n_iter - 1)
        )
    e.unpersist()
    nodes.unpersist()
    out_deg.unpersist()
    return pr


def hits(
    edges: DataFrame,
    iterations: int = 5,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg) — fixed iterations with
    L1 normalization after each update, the web-graph's second
    classic centrality next to :func:`pagerank`.

    Per iteration: ``auth(v) = Σ_{(u,v)} hub(u)`` then L1-normalize,
    ``hub(u) = Σ_{(u,v)} auth(v)`` then L1-normalize. Nodes without
    the relevant edges score 0. Returns (node, hub, auth).

    Same scale shape as pagerank: each half-update is ONE shuffle of a
    narrow (node, double) relation keyed on the join side; the
    normalizing mass rides along as a broadcast 1-row aggregate (no
    driver round-trip). L1 (not L2) normalization keeps the SQL twin
    free of sqrt-of-sum ulp drift.
    """
    # e cached: both half-updates of every iteration join it (same
    # round-6 rationale as pagerank — uncached, each action replays
    # the scan + distinct exchange). HITS joins the edges on BOTH
    # endpoints (src for the auth update, dst for the hub update), so
    # keep one cached copy per layout — the classic space-for-shuffle
    # trade: 2x the (narrow, 2-column) edge storage buys zero
    # edge-relation movement in every half-update; only the (node,
    # score) relation shuffles per iteration.
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .repartition("src")
        .cache()
    )
    e_dst = e.repartition("dst").cache()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    n = nodes.count()
    hub = nodes.select("node", F.lit(1.0 / n).alias("score"))
    auth = None
    n_iter = int(iterations)
    for _it in range(n_iter):
        raw_a = (
            e.join(hub, e["src"] == hub["node"])
            .select(F.col("dst").alias("node"), F.col("score").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("raw"))
        )
        mass_a = raw_a.agg(F.coalesce(F.sum("raw"), F.lit(1.0)).alias("m"))
        auth = (
            nodes.join(raw_a, on="node", how="left")
            .crossJoin(F.broadcast(mass_a))
            .select(
                "node", (F.coalesce(F.col("raw"), F.lit(0.0)) / F.col("m")).alias("score")
            )
            .localCheckpoint(eager=False)  # lazy: one action runs all
        )
        raw_h = (
            e_dst.join(auth, e_dst["dst"] == auth["node"])
            .select(F.col("src").alias("node"), F.col("score").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("raw"))
        )
        mass_h = raw_h.agg(F.coalesce(F.sum("raw"), F.lit(1.0)).alias("m"))
        hub = (
            nodes.join(raw_h, on="node", how="left")
            .crossJoin(F.broadcast(mass_h))
            .select(
                "node", (F.coalesce(F.col("raw"), F.lit(0.0)) / F.col("m")).alias("score")
            )
            # lazy except the last (see pagerank): the final hub
            # checkpoint runs one job covering every auth/hub step
            .localCheckpoint(eager=_it == n_iter - 1)
        )
    out = (
        hub.select("node", F.col("score").alias("hub"))
        .join(auth.select("node", F.col("score").alias("auth")), on="node")
    )
    e.unpersist()
    e_dst.unpersist()
    nodes.unpersist()
    return out


def host_graph(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    keep_self_loops: bool = False,
) -> DataFrame:
    """Collapse the URL-level edge table into a weighted host->host
    graph: (src_host, dst_host, weight = #url-edges). This is the
    domain-level view a production crawl publishes (Common Crawl's
    host-level webgraph/ranks) and the natural input for host PageRank
    — rank hosts, not pages, to steer frontier budgets
    (config/crawl.rs budget-per-host is the consumer).

    Pure JVM: host extraction is the same expression family as the
    engine's politeness key (functions/jvm_url.py host_col), collapse
    is ONE map-side-combined groupBy keyed on the host pair. At 100 TB
    the URL edge table is the biggest relation in the system; this
    aggregation reduces it by orders of magnitude BEFORE any analytics
    join, and hot host-pairs (intra-site nav boilerplate) pre-combine
    map-side because count is algebraic.

    Self-loops (intra-host links) are dropped by default — they
    dominate raw web graphs and carry no ranking signal (PageRank with
    self-loops just leaks rank back to the emitter).
    """
    from .jvm_url import host_col

    g = edges.select(
        host_col(F.col(src)).alias("src_host"),
        host_col(F.col(dst)).alias("dst_host"),
    ).filter(F.col("src_host").isNotNull() & F.col("dst_host").isNotNull())
    if not keep_self_loops:
        g = g.filter(F.col("src_host") != F.col("dst_host"))
    return g.groupBy("src_host", "dst_host").agg(F.count("*").alias("weight"))


def host_pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 5,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Host-level PageRank: collapse to the host graph, then run the
    standard power iteration on the (much smaller) host relation.
    Ranks are over the UNWEIGHTED host graph (an edge exists or not —
    same posture as pagerank's URL-level distinct; the collapse's
    weight column serves other analytics, e.g. nav-boilerplate
    detection). Returns (node, pr) where node is a hostname. The
    collapse makes
    the iterative phase cheap at any corpus size: #hosts is ~3 orders
    of magnitude below #URLs, so the per-iteration shuffles move a
    relation that fits comfortably in cluster memory."""
    hg = host_graph(edges, src=src, dst=dst)
    return pagerank(hg, damping=damping, iterations=iterations,
                    src="src_host", dst="dst_host")


def weighted_pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 5,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
) -> DataFrame:
    """PageRank with edge weights: a node distributes its rank over
    out-edges PROPORTIONALLY to weight (rank flow = pr * w / out_wsum)
    instead of uniformly. On the collapsed host graph the weight is
    the URL-edge multiplicity, so heavily-interlinked hosts pass more
    rank — the standard weighted formulation used for domain ranking.

    Same execution shape as :func:`pagerank`: per iteration ONE
    shuffle keyed on dst for the contribution sum; (node, pr) and
    (src, out_wsum) are narrow cached relations; dangling mass
    redistributed uniformly. Duplicate (src, dst) rows are combined by
    summing their weights first, so callers can feed raw edge logs.
    """
    # e cached (round 6): on the host graph, `edges` is itself the
    # host-collapse aggregation — uncached, every power iteration
    # re-runs the full URL-edge rollup, not just this groupBy.
    # Pre-partitioned by src so the per-iteration contribution join
    # moves only the rank relation (see pagerank above).
    e = (
        edges.select(
            F.col(src).alias("src"), F.col(dst).alias("dst"),
            F.col(weight).cast("double").alias("w"),
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
        .repartition("src")
        .cache()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    n = nodes.count()
    out_w = e.groupBy("src").agg(F.sum("w").alias("wsum")).cache()
    # cache fills on first iteration's job (see pagerank)

    d = float(damping)
    pr = nodes.select("node", F.lit(1.0 / n).alias("pr"))
    n_iter = int(iterations)
    for _it in range(n_iter):
        ranked = pr.join(out_w, pr["node"] == out_w["src"], "left").select(
            pr["node"].alias("node"), "pr", "wsum"
        )
        # dangling mass as a broadcast 1-row aggregate — no driver
        # round-trip per iteration (same pattern as pagerank above)
        dang = ranked.filter(F.col("wsum").isNull()).agg(
            F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dang")
        )
        # reuse ranked (pr ⋈ out_w) for the contribution join — the
        # same relation the dangling aggregate consumes (pagerank
        # above does the same; a fresh pr ⋈ out_w here would evaluate
        # that join twice per iteration)
        contrib = (
            e.join(
                ranked.filter(F.col("wsum").isNotNull()),
                e["src"] == ranked["node"],
            )
            .select(
                F.col("dst").alias("node"),
                (F.col("pr") * F.col("w") / F.col("wsum")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        pr = (
            nodes.join(contrib, on="node", how="left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit((1.0 - d) / n)
                    + F.lit(d)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("dang") / F.lit(float(n))
                    )
                ).alias("pr"),
            )
            # lazy except the last (see pagerank): one job runs the
            # whole chain, then the caches can drop
            .localCheckpoint(eager=_it == n_iter - 1)
        )
    e.unpersist()
    nodes.unpersist()
    out_w.unpersist()
    return pr
