"""Deduplication operators for large-scale training-data pipelines.

DataFrame-native implementations (JVM expressions wherever possible;
Arrow pandas UDFs only where Spark lacks the primitive). Each has a
DuckDB-oracle twin in ``__spark_entry__`` and pytest coverage.

Scale notes (100 TB posture):
- exact dedup: hash-groupBy — one shuffle on a 60-bit content hash
- shingling: explode + distinct keyed by (doc, shingle); hot shingles
  pre-aggregate map-side (partial aggregation is free on groupBy)
- MinHash-LSH: signatures via min-of-hash aggregation (no UDF), band
  buckets joined on (band, hash-pair) — the candidate join never
  materializes the full O(n^2) pair space
- SimHash: fully JVM-side (explode tokens -> 60-bit md5 hash ->
  per-bit vote aggregation) — no Python anywhere in the path, and the
  identical expression family runs in the DuckDB oracle; Hamming
  neighbor search blocks on max_hamming+1 bands (pigeonhole guarantee)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# 60-bit deterministic content hash — identical expression family to
# the DuckDB oracle (md5 hex -> bigint)
def content_hash(col: F.Column) -> F.Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: (content_hash, keeper=min id, n_dups)."""
    return (
        df.select(content_hash(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keeper"), F.count("*").alias("n_dups"))
    )


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """Distinct k-token shingles per doc: (id, sh) — whitespace tokens,
    windowed JVM-side via slice over the token array.

    The token array is materialized as a column FIRST (round 6): with
    the split inlined into the transform lambda, interpreted
    higher-order evaluation re-ran split(text) for every shingle —
    O(tokens^2) per document — and the single-split scan partition ran
    it all serially before the first exchange. fan_out guards the
    explode stage's parallelism the same way the zero-shuffle folds
    are guarded."""
    from .par import fan_out

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = fan_out(df).select(F.col(id_col).alias("id"), toks.alias("_toks"))
    n = F.size("_toks")
    # sequence(1, n-k+1) only when the doc holds at least one shingle —
    # sequence(1, 0) DESCENDS in Spark and breaks slice()
    idx = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice("_toks", i, k)))
    return (
        base.select("id", F.explode(sh).alias("sh"))
        .dropDuplicates(["id", "sh"])
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by k-gram Jaccard >= threshold.

    shingle self-join keyed on the shingle (the 100 TB plan: shuffle on
    shingle, combine map-side) -> common counts -> sizes -> filter.

    ``max_shingle_df`` is the hot-shingle cap, the scale guard: a
    stop-phrase shingle shared by 10^6 docs would contribute 10^12 join
    rows (quadratic in its document frequency). Shingles whose document
    frequency exceeds the cap are dropped from the shingle universe
    CONSISTENTLY (both from the self-join and from the per-doc
    cardinalities), and the drop count is logged — no silent caps.
    Pairs are exact for any corpus where no shingle exceeds the cap.
    """
    sh = shingles(df, text_col, id_col, k)
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("sh")
            .agg(F.count("*").alias("docfreq"))
            .filter(F.col("docfreq") > max_shingle_df)
            .cache()
        )
        n_hot = hot.count()
        if n_hot:
            import logging

            logging.getLogger(__name__).warning(
                "ngram_jaccard_pairs: dropping %d hot shingles with document "
                "frequency > %d before the self-join (quadratic-blowup guard)",
                n_hot,
                max_shingle_df,
            )
            sh = sh.join(F.broadcast(hot.select("sh")), on="sh", how="left_anti")
    sh = sh.cache()
    card = sh.groupBy("id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("id").alias("ida"), "sh")
    b = sh.select(F.col("id").alias("idb"), "sh")
    common = (
        a.join(b, on="sh")
        .filter(F.col("ida") < F.col("idb"))
        .groupBy("ida", "idb")
        .agg(F.count("*").alias("c"))
    )
    out = (
        common.join(card.select(F.col("id").alias("ida"), F.col("n").alias("na")), on="ida")
        .join(card.select(F.col("id").alias("idb"), F.col("n").alias("nb")), on="idb")
        .withColumn("jaccard", F.col("c") / (F.col("na") + F.col("nb") - F.col("c")))
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("ida").alias("doc_a"), F.col("idb").alias("doc_b"), "jaccard"
        )
    )
    return out


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """DIRECTED near-containment pairs: containment(A in B) =
    |shingles(A) ∩ shingles(B)| / |shingles(A)| >= threshold — the
    asymmetric relation Jaccard misses: a short page quoted inside a
    long superset page scores near-zero Jaccard but containment ~1.
    The dedup decision it feeds: drop the CONTAINED copy, keep the
    container (Lee et al. 2022 discuss exactly this asymmetry).

    Same plan shape and hot-shingle cap semantics as
    ``ngram_jaccard_pairs`` (shuffle on shingle, map-side combine,
    consistent cap on both the join and the denominators); the join
    keeps both directions (A-in-B and B-in-A are different facts).

    Returns (contained, container, containment).
    """
    sh = shingles(df, text_col, id_col, k)
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("sh")
            .agg(F.count("*").alias("docfreq"))
            .filter(F.col("docfreq") > max_shingle_df)
            .cache()
        )
        n_hot = hot.count()
        if n_hot:
            import logging

            logging.getLogger(__name__).warning(
                "ngram_containment_pairs: dropping %d hot shingles with "
                "document frequency > %d before the self-join",
                n_hot,
                max_shingle_df,
            )
            sh = sh.join(F.broadcast(hot.select("sh")), on="sh", how="left_anti")
    sh = sh.cache()
    card = sh.groupBy("id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("id").alias("contained"), "sh")
    b = sh.select(F.col("id").alias("container"), "sh")
    common = (
        a.join(b, on="sh")
        .filter(F.col("contained") != F.col("container"))
        .groupBy("contained", "container")
        .agg(F.count("*").alias("c"))
    )
    return (
        common.join(
            card.select(F.col("id").alias("contained"), F.col("n").alias("na")),
            on="contained",
        )
        .withColumn("containment", F.col("c") / F.col("na"))
        .filter(F.col("containment") >= threshold)
        .select("contained", "container", "containment")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    k: int = 3,
) -> DataFrame:
    """MinHash signature columns h0..h{n-1} per doc:
    h_i(doc) = min over shingles of hash('s{i}|' + shingle).

    ZERO-shuffle spelling (round 5): min over a multiset ignores
    duplicates, so the per-doc signature is a row-local
    ``array_min(transform(shingles, hash))`` — the document's shingle
    array never explodes and never shuffles (the round-4 plan paid a
    dropDuplicates exchange plus a groupBy exchange on every shingle
    string). Docs with fewer than k tokens produce no shingles and are
    dropped, exactly as the exploded groupBy dropped them."""
    from .par import fan_out

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # Two round-6 plan fixes, measured 3.1 -> 0.6 s on the bench corpus:
    # - the no-shingles filter is spelled on the TOKEN COUNT, not on
    #   size(_sh): size(sh) = n-k+1 when n >= k else 0, so the two
    #   predicates are identical — but a size(_sh) > 0 filter gets
    #   predicate-pushed below fan_out's exchange onto the (often
    #   single-split) scan, where it evaluated the ENTIRE shingle-array
    #   construction serially per row just to test emptiness;
    # - the token array is materialized as a column before the window
    #   transform — with split inlined in the lambda, interpreted HOF
    #   evaluation re-ran split(text) per shingle, O(tokens^2)/doc.
    staged0 = (
        fan_out(df)
        .filter(F.size(toks) >= k)
        .select(F.col(id_col).alias("id"), toks.alias("_toks"))
    )
    n = F.size("_toks")
    sh = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.concat_ws(" ", F.slice("_toks", i, k)),
    )
    staged = staged0.select("id", sh.alias("_sh"))
    cols = [
        F.array_min(
            F.transform(
                "_sh", lambda s: content_hash(F.concat(F.lit(f"s{i}|"), s))
            )
        ).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return staged.select("id", *cols)


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    rows_per_band: int = 2,
    k: int = 3,
) -> DataFrame:
    """LSH candidate pairs: docs sharing any band of the signature.

    bands = num_hashes / rows_per_band; the band bucket join is keyed
    on (band, h_a, h_b) so only same-bucket docs ever meet.

    The band fan-out is ONE Generate over a literal band-struct array
    over a pinned sig relation — not a union of per-band projections,
    which would re-evaluate the zero-shuffle signature expressions
    once per band per join side.
    """
    sig = minhash_signatures(df, text_col, id_col, num_hashes, k)
    n_bands = num_hashes // rows_per_band
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
                ).alias("bucket"),
            )
            for b in range(n_bands)
        ]
    )
    bands = (
        sig.localCheckpoint(eager=False)
        .select("id", F.explode(band_structs).alias("_b"))
        .select("id", F.col("_b.band").alias("band"), F.col("_b.bucket").alias("bucket"))
    )
    a = bands.select(F.col("id").alias("doc_a"), "band", "bucket")
    b = bands.select(F.col("id").alias("doc_b"), "band", "bucket")
    return (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates()
    )


def minhash_calibration(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    rows_per_band: int = 2,
    k: int = 3,
) -> DataFrame:
    """Sketch-calibration surface: for every LSH candidate pair, the
    MinHash ESTIMATE of Jaccard (matching signature components / k)
    next to the TRUE shingle Jaccard — the table an operator reads to
    pick num_hashes/bands/threshold for a corpus (is the sketch biased
    here? how wide is the estimate spread at the dedup threshold?).

    Cost shape: candidates come from the banded join (never O(n^2));
    the true Jaccard is computed ONLY for candidate pairs — the
    shingle relation is semi-joined down to candidate docs before the
    intersection count, so the expensive exact computation touches the
    (tiny) candidate neighborhood, not the corpus.

    Returns (doc_a, doc_b, est_j, true_j) HALF_UP-rounded to 4dp.
    """
    n = int(num_hashes)
    cand = minhash_lsh_candidates(df, text_col, id_col, n, rows_per_band, k)
    sig = minhash_signatures(df, text_col, id_col, n, k)
    sa = sig.select(F.col("id").alias("doc_a"), *[F.col(f"h{i}").alias(f"a{i}") for i in range(n)])
    sb = sig.select(F.col("id").alias("doc_b"), *[F.col(f"h{i}").alias(f"b{i}") for i in range(n)])
    est = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("int") for i in range(n)
    ) / float(n)

    sh = shingles(df, text_col, id_col, k)
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    sh_a = sh.join(cand.select(F.col("doc_a").alias("id")).distinct(), on="id").select(
        F.col("id").alias("doc_a"), "sh"
    )
    sh_b = sh.join(cand.select(F.col("doc_b").alias("id")).distinct(), on="id").select(
        F.col("id").alias("doc_b"), "sh"
    )
    inter = (
        cand.join(sh_a, on="doc_a")
        .join(sh_b, on=["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("i"))
    )
    rnd4 = lambda c: F.floor(c * 10000 + 0.5 + 1e-6).cast("double") / 10000  # noqa: E731
    return (
        cand.join(sa, on="doc_a")
        .join(sb, on="doc_b")
        .join(inter, on=["doc_a", "doc_b"], how="left")
        .join(sizes.select(F.col("id").alias("doc_a"), F.col("n_sh").alias("na")), on="doc_a")
        .join(sizes.select(F.col("id").alias("doc_b"), F.col("n_sh").alias("nb")), on="doc_b")
        .select(
            "doc_a",
            "doc_b",
            rnd4(est).alias("est_j"),
            rnd4(
                F.coalesce(F.col("i"), F.lit(0))
                / (F.col("na") + F.col("nb") - F.coalesce(F.col("i"), F.lit(0)))
            ).alias("true_j"),
        )
    )


SIMHASH_BITS = 60  # md5-prefix token hash is 60 bits; so is the signature


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """60-bit SimHash per document — fully JVM-side, no Python worker.

    ZERO-shuffle spelling (round 5): the signature is a pure per-row
    statistic, so each document hashes its own whitespace tokens
    (occurrences, not distinct — classic frequency-weighted SimHash)
    into a 60-bit md5 hash array and takes per-bit majorities with
    row-local bit-count filters; bit b is set iff set-votes exceed
    unset-votes (2*count_set > n; ties clear the bit, exactly the
    explode+groupBy ``vote > 0`` rule it replaces). The identical
    expression family runs in the DuckDB oracle
    (``__spark_entry__.sql_simhash``). Docs with no tokens get 0.
    """
    from .par import fan_out

    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda x: x != ""
    )
    staged = fan_out(df).select(
        F.col(id_col).alias("id"),
        F.transform(toks, content_hash).alias("_h"),
    )
    n = F.size("_h")
    sig_expr = F.lit(0).cast("long")
    for b in range(SIMHASH_BITS):
        count_set = F.size(
            F.filter(
                "_h", lambda h: F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1
            )
        )
        sig_expr = sig_expr + F.when(
            count_set * 2 > n, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return staged.select("id", sig_expr.alias("simhash"))


def band_slices(bits: int, n_bands: int) -> list[tuple[int, int]]:
    """Contiguous (offset, width) bit slices covering ``bits`` bits."""
    n_bands = max(1, min(bits, n_bands))
    base, rem = divmod(bits, n_bands)
    out, off = [], 0
    for i in range(n_bands):
        w = base + (1 if i < rem else 0)
        out.append((off, w))
        off += w
    return out


def simhash_near_pairs_from_sigs(sig: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-pair search over a (id, simhash) frame.

    Blocking uses ``max_hamming + 1`` contiguous bit bands: a pair
    within Hamming distance h <= max_hamming differs in at most
    max_hamming bands, so by pigeonhole at least one of the
    max_hamming+1 bands matches exactly — 100% recall by construction
    (the round-1 fixed-4-band version silently dropped pairs at
    Hamming 4..max_hamming).

    The band fan-out is ONE Generate over a literal band-struct array
    — not a union of per-band projections, which would re-evaluate the
    upstream signature expression once per band per join side (8× for
    the now map-only zero-shuffle simhash). The sig relation is also
    pinned (localCheckpoint — narrow (id, long) rows) so the two join
    sides share one computation of the signatures."""
    n_bands = max_hamming + 1
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), off)
                .bitwiseAND(F.lit((1 << w) - 1))
                .alias("key"),
            )
            for b, (off, w) in enumerate(band_slices(SIMHASH_BITS, n_bands))
        ]
    )
    bands = (
        sig.localCheckpoint(eager=False)
        .select("id", "simhash", F.explode(band_structs).alias("_b"))
        .select("id", "simhash", F.col("_b.band").alias("band"), F.col("_b.key").alias("key"))
    )
    a = bands.select(F.col("id").alias("doc_a"), F.col("simhash").alias("sa"), "band", "key")
    b = bands.select(F.col("id").alias("doc_b"), F.col("simhash").alias("sb"), "band", "key")
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (
        a.join(b, on=["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["doc_a", "doc_b"])
    )


def simhash_near_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming."""
    return simhash_near_pairs_from_sigs(simhash(df, text_col, id_col), max_hamming)


def chunk_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 10,
) -> DataFrame:
    """Sub-document (paragraph-level) dedup, CCNet-style: split each
    document into consecutive ``chunk_tokens``-token chunks, keep only
    the globally-FIRST occurrence of every distinct chunk (first =
    lowest (doc_id, chunk_idx)), and reassemble the surviving text.
    This removes boilerplate passages repeated across pages — the
    within-corpus analog of the reference's per-page passage handling
    (SURVEY.md §2; cf. duplicate_passage_pairs in textstats, which
    DETECTS cross-doc passages, while this operator REMOVES them).

    Everything is JVM expressions: chunking is slice() over the token
    array (no Python), the winner election is ONE shuffle keyed on the
    60-bit chunk hash — min over a PACKED bigint (doc_id << 20 |
    chunk_idx) rather than min-of-struct, because a struct agg buffer
    is var-length and demotes the whole aggregate to SortAggregate;
    the packed key keeps it a map-side-combined HashAggregate (bound:
    chunk_idx < 2^20, i.e. docs up to ~10M tokens at the default chunk
    size — enforced nowhere because a 10M-token "document" is already
    a corpus bug). The keep-join is on the same hash key so AQE reuses
    the exchange. Reassembly is a groupBy(doc) with an order-restoring
    sort_array(collect_list(struct(idx, chunk))) — the only holistic
    agg, keyed on the doc id, one shuffle.

    100 TB posture: cost is O(total chunks) through two hash-partitioned
    exchanges; nothing is broadcast, no driver residency, no O(n^2)
    pair space. Hot boilerplate chunks concentrate on their hash key
    but the winner aggregate is algebraic (min), so map-side partial
    aggregation absorbs the skew before the shuffle.

    Returns (doc_id, n_chunks, n_kept, dedup_text).
    """
    from .par import fan_out

    c = int(chunk_tokens)
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n_chunks = F.ceil(F.size(toks) / F.lit(float(c))).cast("int")
    idx = F.when(
        F.size(toks) > 0, F.sequence(F.lit(0), n_chunks - 1)
    ).otherwise(F.array().cast("array<int>"))
    # fan_out: the chunk explode + hash otherwise run on the scan's
    # split count — one core for a small single-file corpus (round 6)
    chunks = (
        fan_out(df).select(F.col(id_col).alias("id"), toks.alias("toks"), F.explode(idx).alias("chunk_idx"))
        .select(
            "id",
            "chunk_idx",
            F.concat_ws(" ", F.slice("toks", F.col("chunk_idx") * c + 1, c)).alias("chunk"),
        )
        .withColumn("fp", content_hash(F.col("chunk")))
        .withColumn("pos_key", F.shiftleft(F.col("id"), 20) + F.col("chunk_idx"))
    )
    winners = chunks.groupBy("fp").agg(F.min("pos_key").alias("w"))
    kept_flag = (
        chunks.join(winners, on="fp")
        .withColumn("kept", F.col("pos_key") == F.col("w"))
        .drop("w", "pos_key")
    )
    return (
        kept_flag.groupBy("id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.col("kept").cast("int")).alias("n_kept"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.when(F.col("kept"), F.struct(F.col("chunk_idx"), F.col("chunk")))
                        )
                    ),
                    lambda s: s["chunk"],
                ),
            ).alias("dedup_text"),
        )
        .select(F.col("id").alias("doc_id"), "n_chunks", "n_kept", "dedup_text")
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iters: int = 25,
) -> DataFrame:
    """Dedup clusters: connected components over a near-dup pair graph
    (the step a training-data pipeline runs after MinHash-LSH/SimHash
    candidate generation, so one canonical doc survives per cluster).

    Iterative min-label propagation — the standard distributed CC
    pattern: each round every node takes the min label among itself and
    its neighbors; converges in O(graph diameter) rounds. Scale
    posture: joins are keyed on node ids over the PAIR set (candidates
    only, orders of magnitude smaller than the corpus); lineage is
    truncated per round with localCheckpoint so plans stay flat; the
    driver sees only a per-round convergence COUNT, never row data.
    The per-round driver loop is inherent to iterative fixpoints
    (GraphFrames' own CC does the same).

    Returns (doc_id, cluster_id) for every node that appears in a pair;
    cluster_id = min doc_id of the component.
    """
    edges = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    sym = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    # hash-partition the (pinned) edge relation on the join key ONCE:
    # localCheckpoint preserves the physical partitioning, and the
    # per-iteration labels relation comes out of a groupBy("node") —
    # also hash-partitioned — so every iteration's propagation join
    # needs ZERO new exchange on either side (round 6; before, both
    # sides re-exchanged every iteration)
    sym = sym.repartition(F.col("a")).localCheckpoint(eager=False)
    labels = (
        sym.select(F.col("a").alias("node")).distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(max_iters):
        msgs = sym.join(labels, sym["a"] == labels["node"]).select(
            F.col("b").alias("node"), F.col("label")
        )
        # lazy checkpoint: the convergence count below materializes it
        # inside its own job, so each iteration is ONE Spark job, not
        # two (eager-checkpoint job + count job)
        new_labels = (
            labels.unionByName(msgs).groupBy("node").agg(F.min("label").alias("label"))
        ).localCheckpoint(eager=False)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="node")
            .filter(F.col("n.label") < F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def dedup_keep_best(
    df: DataFrame,
    quality_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    rows_per_band: int = 2,
    k: int = 3,
) -> DataFrame:
    """Fuzzy dedup that keeps the HIGHEST-QUALITY member of each
    near-dup cluster (ties: lowest id) instead of keep-first — what a
    curation pipeline actually wants when it has a quality score
    (Gopher/classifier/LM — any column): the canonical copy should be
    the best one, not the first-crawled one.

    Composition: MinHash-LSH candidate pairs -> connected components
    (cluster_id = min member id) -> per-cluster argmax(quality).
    Documents in no cluster survive unchanged (their cluster is
    themselves). Returns survivors only: (id, cluster_id, quality).

    100 TB plan: the CC iteration touches only the candidate PAIR
    graph (orders of magnitude smaller than the corpus); the corpus
    joins the cluster labels once on id and the winner election is one
    window over narrow (id, cluster, quality) rows — payloads never
    shuffle.
    """
    from pyspark.sql import Window

    pairs = minhash_lsh_candidates(
        df, text_col=text_col, id_col=id_col,
        num_hashes=num_hashes, rows_per_band=rows_per_band, k=k,
    )
    clusters = connected_components(pairs).withColumnRenamed("doc_id", id_col)
    labeled = (
        df.select(F.col(id_col), F.col(quality_col))
        .join(clusters, on=id_col, how="left")
        .withColumn("cluster_id", F.coalesce(F.col("cluster_id"), F.col(id_col)))
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    return (
        labeled.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "cluster_id", quality_col)
    )


def source_dup_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    num_hashes: int = 8,
    rows_per_band: int = 2,
    k: int = 3,
) -> DataFrame:
    """Per-source near-duplication rate: what fraction of each
    source's documents sit in a near-dup cluster — the curation
    signal that downweights mirror- and boilerplate-heavy sources
    before mixing (a source whose pages mostly duplicate each other
    contributes far fewer effective tokens than its raw count says).

    Returns (source, n_docs, n_dup_docs, dup_ratio).

    100 TB plan: membership needs only the LSH pair ENDPOINTS (no CC
    iteration — every endpoint is by definition in a cluster), one
    narrow membership join, one map-side-combined source rollup.
    """
    pairs = minhash_lsh_candidates(
        df, text_col=text_col, id_col=id_col,
        num_hashes=num_hashes, rows_per_band=rows_per_band, k=k,
    )
    members = (
        pairs.select(F.col("doc_a").alias(id_col))
        .unionByName(pairs.select(F.col("doc_b").alias(id_col)))
        .distinct()
        .withColumn("is_dup", F.lit(True))
    )
    labeled = df.select(F.col(id_col), F.col(source_col).alias("source")).join(
        members, on=id_col, how="left"
    )
    rnd6 = lambda c: F.floor(c * 1000000 + 0.5 + 1e-6).cast("double") / 1000000  # noqa: E731
    return labeled.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.coalesce(F.col("is_dup"), F.lit(False)).cast("int"))
        .cast("long")
        .alias("n_dup_docs"),
    ).select(
        "source", "n_docs", "n_dup_docs",
        rnd6(F.col("n_dup_docs") / F.col("n_docs")).alias("dup_ratio"),
    )


def cluster_safe_split(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    test_permille: int = 100,
    val_permille: int = 100,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    k: int = 3,
) -> DataFrame:
    """Leakage-safe train/val/test split: the split is assigned per
    NEAR-DUP CLUSTER, not per document, so a test document's
    near-duplicates can never land in train (the classic eval-leakage
    failure a per-row random split commits).

    Composition: MinHash-LSH pairs -> connected components ->
    cluster_id = min member id (a doc in no cluster is its own
    cluster) -> split by the cluster's deterministic 60-bit content
    hash mod 1000: ``< test_permille`` -> test, next ``val_permille``
    -> val, rest train. Hash-derived, so the split is stable across
    runs, engines, and partitionings — no RNG state to checkpoint.

    Returns (id, cluster_id, split).

    100 TB plan: identical economics to ``dedup_keep_best`` — CC over
    the pair graph only, one narrow label join, then pure column math.
    """
    clusters = connected_components(
        minhash_lsh_candidates(
            df, text_col=text_col, id_col=id_col,
            num_hashes=num_hashes, rows_per_band=rows_per_band, k=k,
        )
    ).withColumnRenamed("doc_id", id_col)
    labeled = (
        df.select(id_col)
        .join(clusters, on=id_col, how="left")
        .withColumn("cluster_id", F.coalesce(F.col("cluster_id"), F.col(id_col)))
    )
    m = F.pmod(
        content_hash(F.concat(F.lit("split|"), F.col("cluster_id").cast("string"))),
        F.lit(1000),
    )
    split = (
        F.when(m < test_permille, F.lit("test"))
        .when(m < test_permille + val_permille, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return labeled.select(id_col, "cluster_id", split.alias("split"))


def exact_substring_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 50,
) -> DataFrame:
    """Exact duplicated-substring removal (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better" —
    ExactSubstr, at whitespace-token granularity): any ``window``-token
    span whose content occurs at >= 2 positions corpus-wide is removed
    from every position EXCEPT the globally-first one (first = lowest
    (doc_id, token_pos)); overlapping duplicated windows compose, so
    maximal duplicated regions are excised, exactly like the paper's
    suffix-array spans. The keep-first convention matches chunk_dedup /
    paragraph_dedup. Default window=50 tokens is the paper's.

    The paper builds one giant suffix array; the distributed shape here
    is hash-relational instead: per-position window hashes (the 60-bit
    engine hash over the materialized gram — transient, codegen-local),
    ONE map-side-combined HashAggregate on the gram hash for the
    (count, first-position) election, a semi-join back for non-winner
    occurrences, expansion to covered token indices, and an anti-join
    against the token table before per-doc ordered reassembly. Text
    tokens shuffle exactly once (the reassembly groupBy); everything
    between the scan and reassembly moves only (id, idx, hash)
    triples. Hot boilerplate grams skew onto their hash key, but both
    aggregates are algebraic (min/count), so map-side partials absorb
    them. Bound: docs up to 2^20 tokens (packed position key).

    Returns (doc_id, n_tokens, n_removed, dedup_text) — every input
    doc appears. NOTE (ADVICE r5): ``dedup_text`` is reassembled from
    the LOWERCASED, whitespace-collapsed token stream the gram hashes
    are computed over, so casing and original whitespace are folded
    for every document — including empty/short docs, which keep all
    their (lowercased) tokens but not their original byte form. Use
    the (doc_id, token-index) removal decisions against the original
    text when a casing-preserving corpus rewrite is required.
    """
    from .par import fan_out

    w = int(window)
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != F.lit("")
    )
    # fan_out: tokens and gram hashes otherwise build on the scan's
    # split count before their first exchange (round 6)
    base = fan_out(df).select(F.col(id_col).alias("id"), toks.alias("toks"))

    tokens = base.select(
        "id", F.posexplode("toks").alias("idx", "tok")
    )  # idx 0-based

    gram_idx = F.when(
        F.size("toks") >= w, F.sequence(F.lit(0), F.size("toks") - w)
    ).otherwise(F.array().cast("array<int>"))
    grams = base.select(
        "id", F.explode(gram_idx).alias("pos"), F.col("toks")
    ).select(
        "id",
        "pos",
        content_hash(F.concat_ws(" ", F.slice("toks", F.col("pos") + 1, w))).alias("g"),
        (F.shiftleft(F.col("id"), 20) + F.col("pos")).alias("pos_key"),
    )
    elect = grams.groupBy("g").agg(
        F.min("pos_key").alias("first_key"), F.count("*").alias("cnt")
    )
    losers = (
        grams.join(elect, on="g")
        .where((F.col("cnt") > 1) & (F.col("pos_key") != F.col("first_key")))
        .select("id", "pos")
    )
    removal = losers.select(
        "id", F.explode(F.sequence(F.col("pos"), F.col("pos") + (w - 1))).alias("idx")
    ).distinct()

    flagged = tokens.join(removal.withColumn("rm", F.lit(True)), ["id", "idx"], "left")
    out = flagged.groupBy("id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.coalesce(F.col("rm"), F.lit(False)).cast("int")).alias("n_removed"),
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(F.col("rm").isNull(), F.struct(F.col("idx"), F.col("tok")))
                    )
                ),
                lambda s: s["tok"],
            ),
        ).alias("dedup_text"),
    )
    return (
        base.select("id")
        .join(out, on="id", how="left")
        .select(
            F.col("id").alias("doc_id"),
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(F.col("n_removed"), F.lit(0)).cast("long").alias("n_removed"),
            F.coalesce(F.col("dedup_text"), F.lit("")).alias("dedup_text"),
        )
    )
