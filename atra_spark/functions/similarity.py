"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k vs a query vector — JVM
  ``zip_with``/``aggregate`` dot product, no Python in the scan.
- ``lsh_bucketed_topk``: the scale path — random-hyperplane LSH
  bucketing (deterministic seed), candidates drawn only from the
  query's bucket (+ optional multiprobe neighbors), exact re-rank of
  the candidates. At 100 TB the bucket column is a partition key, so
  a query touches one partition instead of the corpus.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query])
    cos = _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * _norm(q))
    return (
        df.select(F.col(id_col).alias("id"), cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("id"))
        .limit(k)
    )


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Per-vector int8 scalar quantization — the standard 4x
    storage/IO saver for ANN at corpus scale (float32 -> uint8 codes
    plus two doubles): ``offset = min(v)``, ``scale = (max-min)/255``,
    ``code_i = floor((x_i - offset)/scale + 0.5)`` (constant vectors
    get scale 0 and all-zero codes). Pure JVM column math; the codes
    column is what a 100 TB vector store persists and shuffles —
    reconstruction happens on the fly at scoring time.

    Returns (id, codes array<int>, offset, scale)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    lo = F.array_min(v)
    hi = F.array_max(v)
    scale = (hi - lo) / F.lit(255.0)
    codes = F.when(
        scale > 0,
        F.transform(v, lambda x: F.floor((x - lo) / scale + 0.5).cast("int")),
    ).otherwise(F.transform(v, lambda x: F.lit(0)))
    return df.select(
        F.col(id_col).alias("id"),
        codes.alias("codes"),
        lo.alias("offset"),
        scale.alias("scale"),
    )


def quantized_cosine_topk(
    qdf: DataFrame, query: list[float], k: int = 10
) -> DataFrame:
    """Asymmetric quantized search: exact float query vs the int8
    corpus codes of ``quantize_embeddings`` — each candidate is
    reconstructed on the fly (``offset + code*scale``) inside the
    same JVM fold as the dot product; no second pass, no Python.
    Deterministic (cosine desc, id asc) top-k."""
    q = F.array(*[F.lit(float(x)) for x in query])
    recon = F.transform(
        F.col("codes"),
        lambda c: F.col("offset") + c.cast("double") * F.col("scale"),
    )
    cos = _dot(recon, q) / (_norm(recon) * _norm(q))
    return (
        qdf.select(F.col("id"), cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("id"))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def add_lsh_bucket(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane signature as an integer bucket column.

    bit_i = sign(v . h_i); expressed as JVM column math over literal
    plane arrays (no UDF): bucket = sum(2^i * (dot_i > 0)).
    """
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bucket = bucket + F.when(_dot(F.col(vec_col), p) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return df.withColumn("lsh_bucket", bucket.cast("int"))


def embedding_near_dup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.25,
    n_planes: int | None = None,
    seed: int = 42,
    max_bucket: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS: all (id_a < id_b) pairs
    whose vectors land in the same random-hyperplane LSH bucket AND
    whose exact cosine >= ``threshold`` — the semantic-dedup pass a
    training-data pipeline runs over an embedding column (complementing
    the lexical minhash/simhash families, which miss paraphrases).

    100 TB plan: the bucket is the blocking key — one shuffle of the
    narrow (id, vec, bucket) relation on ``lsh_bucket``, candidate
    generation is a co-partitioned self-join WITHIN buckets (never
    all-pairs), exact cosine re-rank stays JVM-side (zip_with /
    aggregate, no Python). Bucket population is bounded two ways:
    ``n_planes`` splits the corpus into 2^n_planes buckets (raise it
    with corpus size), and buckets still larger than ``max_bucket`` are
    dropped with a logged warning — the same quadratic-blowup guard as
    the shingle/fingerprint joins (a bucket that big means a degenerate
    direction cluster, i.e. boilerplate embeddings). Single-band LSH is
    recall-approximate by design: a near-dup pair split across buckets
    is missed; run with several ``seed`` values and union the pairs to
    add bands (each band is an independent, identically-shaped pass).

    ``n_planes=None`` (default) auto-sizes to the corpus: one cheap
    count picks ``max(8, ceil(log2(n / max_bucket)) + 1)`` so the mean
    bucket population sits at ~max_bucket/2 and default recall does not
    collapse at scale (at 8 fixed planes a 100k-vector corpus would
    overflow — and thus DROP — essentially every bucket). Pass an
    explicit ``n_planes`` to skip the count (and to keep a pinned
    bucketing across runs, e.g. the test oracle's seeded literals).
    """
    if n_planes is None:
        import math

        n = df.count()
        n_planes = max(8, math.ceil(math.log2(max(n, 1) / max_bucket)) + 1)
    bucketed = add_lsh_bucket(df, dim, n_planes, seed, vec_col).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), "lsh_bucket"
    )
    # bucket ids are bounded by 2^n_planes, so the hot-bucket set is
    # always driver-collectable (same literal-set pattern as
    # duplicate_passage_pairs — no cache to leak, no extra join)
    sizes = bucketed.groupBy("lsh_bucket").agg(F.count("*").alias("n"))
    hot = [r["lsh_bucket"] for r in sizes.filter(F.col("n") > max_bucket).collect()]
    if hot:
        import logging

        logging.getLogger(__name__).warning(
            "embedding_near_dup_pairs: dropping %d degenerate LSH buckets "
            "with population > %d (quadratic-blowup guard)",
            len(hot),
            max_bucket,
        )
        bucketed = bucketed.filter(~F.col("lsh_bucket").isin(hot))
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    cos = _dot(F.col("a.v"), F.col("b.v")) / (_norm(F.col("a.v")) * _norm(F.col("b.v")))
    return (
        a.join(
            b,
            (F.col("a.lsh_bucket") == F.col("b.lsh_bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= F.lit(float(threshold)))
    )


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cid_col: str = "cid",
    cvec_col: str = "cvec",
) -> DataFrame:
    """IVF cell assignment: each vector joins the (tiny, broadcast)
    centroid table, scores s = dot(v, c)/|c| (the |v| factor is
    constant per vector, so the argmax is the cosine argmax), and takes
    the best cell with a first-max tie rule (max score, then min cid) —
    expressed as plain aggregations so a SQL oracle replicates it
    bit-for-bit. Returns ``df`` plus an int ``cell`` column.

    Scale shape: the scored relation carries only (id, cid, s) — N×K
    narrow rows — and the winning cell joins back to the full rows on
    the id key, so embeddings are never duplicated K ways."""
    scored = (
        df.select(id_col, vec_col)
        .crossJoin(F.broadcast(centroids.select(cid_col, cvec_col)))
        .select(
            F.col(id_col),
            F.col(cid_col),
            (_dot(F.col(vec_col), F.col(cvec_col)) / _norm(F.col(cvec_col))).alias("s"),
        )
    )
    best = scored.groupBy(id_col).agg(F.max("s").alias("_ms"))
    cells = (
        scored.join(best, on=id_col)
        .filter(F.col("s") == F.col("_ms"))
        .groupBy(id_col)
        .agg(F.min(cid_col).alias("cell"))
    )
    return df.join(cells, on=id_col)


def ivf_topk(
    df: DataFrame,
    query: list[float],
    centroids: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cid_col: str = "cid",
    cvec_col: str = "cvec",
) -> DataFrame:
    """IVF approximate top-k: score the query against the centroid
    table, probe the ``n_probe`` best cells, exact-rank only their
    members. The second ANN family next to ``lsh_bucketed_topk`` — at
    scale the cell is the partition key and a query touches n_probe
    partitions instead of the corpus. No driver-side collection: the
    probe set stays a (broadcast) DataFrame semi-join."""
    q = F.array(*[F.lit(float(x)) for x in query])
    qcells = (
        centroids.select(
            F.col(cid_col).alias("cell"),
            (_dot(q, F.col(cvec_col)) / _norm(F.col(cvec_col))).alias("s"),
        )
        .orderBy(F.col("s").desc(), F.col("cell"))
        .limit(n_probe)
        .select("cell")
    )
    assigned = ivf_assign(df, centroids, vec_col, id_col, cid_col, cvec_col)
    cands = assigned.join(F.broadcast(qcells), on="cell", how="left_semi")
    return cosine_topk(cands, query, k, vec_col, id_col)


def lsh_bucketed_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    multiprobe: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: probe the query's LSH bucket (and, with
    ``multiprobe``=m, every bucket within Hamming distance m of it),
    then exact-rank the candidates."""
    planes = _hyperplanes(len(query), n_planes, seed)
    qv = np.asarray(query, dtype=float)
    qbits = int(sum((1 << i) for i, p in enumerate(planes) if float(qv @ p) > 0))
    probes = {qbits}
    if multiprobe >= 1:
        for i in range(n_planes):
            probes.add(qbits ^ (1 << i))
    if multiprobe >= 2:
        for i in range(n_planes):
            for j in range(i + 1, n_planes):
                probes.add(qbits ^ (1 << i) ^ (1 << j))
    bucketed = add_lsh_bucket(df, len(query), n_planes, seed, vec_col)
    cands = bucketed.filter(F.col("lsh_bucket").isin(*sorted(probes)))
    return cosine_topk(cands, query, k, vec_col, id_col)


# --------------------------------------------------------------------------
# k-means corpus clustering (Lloyd's iterations)
# --------------------------------------------------------------------------
def _round_col(col: F.Column, dp: int) -> F.Column:
    scale = 10 ** dp
    return F.floor(col * scale + 0.5 + 1e-6).cast("double") / scale


def kmeans_assign(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_dp: int = 6,
) -> DataFrame:
    """Distributed Lloyd's k-means over an embedding column — the
    corpus-clustering pass a data-mixing pipeline runs to stratify
    documents by semantic neighborhood (cluster-balanced sampling,
    per-cluster quality review). Returns the FINAL assignment
    ``(vec_id, cluster, dist)`` after ``n_iter`` iterations; ``dist``
    is the squared L2 distance to the winning centroid, HALF_UP-rounded
    to ``round_dp``.

    Deterministic by construction: centroids initialize from the k
    lowest-id vectors, and the argmin compares distances AFTER rounding
    (tie-break: lowest centroid id). The rounding is not cosmetic —
    double summation order varies across partitionings (AQE can
    re-split the reduce), so raw-bit argmin would make the assignment
    of near-equidistant points flip between runs; rounding + id
    tie-break pins it (same epsilon policy as the oracle SQL's _rnd).

    100 TB plan per iteration: the k×dim centroid table is broadcast
    (k is small by definition), the distance/argmin is JVM
    zip_with/aggregate + one window partitioned by vec_id (no shuffle
    beyond the window's hash on vec_id), and the centroid update
    shuffles only the narrow (cid, pos, val) relation with map-side
    partial averages — never per-cluster vector lists. Driver holds
    nothing; the loop materializes k×dim numbers per iteration.
    """
    vecs = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).persist()  # scanned 2*n_iter+1 times (assign + update per
    # iteration + the final assign); without the cache every scan
    # replays the full upstream lineage. Blocks free with the session
    # (or unpersist the returned plan's source when done).
    cent = (
        vecs.orderBy("vec_id")
        .limit(k)  # TakeOrderedAndProject — no global sort materialized
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cvec"))
    )

    def assign(c: DataFrame) -> DataFrame:
        d = F.aggregate(
            F.zip_with("v", "cvec", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        scored = vecs.crossJoin(F.broadcast(c)).select(
            "vec_id", "cid", _round_col(d, round_dp).alias("dist")
        )
        # argmin as an ALGEBRAIC min over struct(dist, cid) — struct
        # ordering is lexicographic, so min == the row_number-over-
        # (dist, cid) winner the round-5 window picked, but with
        # map-side partial aggregation and no sort (round 6; identical
        # assignment by construction, scored has no nulls)
        best = scored.groupBy("vec_id").agg(F.min(F.struct("dist", "cid")).alias("_w"))
        return best.select(
            "vec_id", F.col("_w.cid").alias("cid"), F.col("_w.dist").alias("dist")
        )

    for _ in range(n_iter):
        assigned = assign(cent).select("vec_id", "cid")
        cent = (
            assigned.join(vecs, "vec_id")
            .select("cid", F.posexplode("v").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.avg("val").alias("val"))  # map-side partial avg
            .groupBy("cid")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "val"))
                ).alias("s")
            )
            .select(
                "cid", F.transform("s", lambda x: x["val"]).alias("cvec")
            )
        )
        # flat lineage: k×dim doubles — safe and cheap to pin locally
        cent = cent.localCheckpoint(eager=False)

    return assign(cent).select(
        "vec_id", F.col("cid").alias("cluster"), "dist"
    )


# --------------------------------------------------------------------------
# SemDeDup: semantic dedup inside k-means clusters
# --------------------------------------------------------------------------
def semdedup(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 3,
    threshold: float = 0.35,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_dp: int = 6,
) -> DataFrame:
    """Semantic deduplication (Abbas et al. 2023, SemDeDup): cluster
    the embedding corpus with k-means, then prune near-duplicates by
    pairwise cosine similarity WITHIN each cluster — the clustering is
    the blocking key that keeps the quadratic comparison local, which
    is the paper's whole scaling argument. Returns
    ``(vec_id, cluster, keep)``; ``keep = false`` iff a lower-id
    member of the same cluster has rounded cosine >= ``threshold``
    (deterministic greedy keep-first election — the repo-wide dedup
    convention, replacing the paper's centroid-proximity tie-break so
    the result is a pure function of ids and the rounded similarity).

    100 TB plan: assignments come from ``kmeans_assign`` (broadcast
    centroids, narrow updates); vectors shuffle ONCE on the cluster
    key for the self-join; the pairwise stage is O(sum c_i^2) — bound
    it by scaling k with the corpus (the paper runs k ~ n/1000, so
    clusters stay ~1000 vectors regardless of n). Cosines are
    HALF_UP-rounded to ``round_dp`` before the threshold compare, so
    the discrete keep/prune decision is immune to double
    summation-order noise and reproduces exactly in a SQL twin.
    """
    assign = kmeans_assign(df, k, n_iter, vec_col, id_col, round_dp)
    sq = F.aggregate(
        F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )
    vecs = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("nrm", F.sqrt(sq))
    m = assign.join(vecs, "vec_id").select("vec_id", "cluster", "v", "nrm")
    left = m.select(
        F.col("vec_id").alias("i"), "cluster",
        F.col("v").alias("vi"), F.col("nrm").alias("ni"),
    )
    right = m.select(
        F.col("vec_id").alias("j"), "cluster",
        F.col("v").alias("vj"), F.col("nrm").alias("nj"),
    )
    dot = F.aggregate(
        F.zip_with("vi", "vj", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = _round_col(dot / (F.col("ni") * F.col("nj")), round_dp)
    pruned = (
        left.join(right, on="cluster")
        .filter(F.col("i") < F.col("j"))
        .filter(cos >= F.lit(threshold))
        .select(F.col("j").alias("vec_id"))
        .distinct()
        .withColumn("_pruned", F.lit(True))
    )
    return (
        assign.join(pruned, on="vec_id", how="left")
        .select(
            "vec_id", "cluster",
            F.col("_pruned").isNull().alias("keep"),
        )
    )
