"""Driver contract for the atra_spark engine.

``entry(spark)``   — flagship: synthesize a Common-Crawl-style pages
                     table FROM /root/testdata/sf0.001/documents.parquet
                     and run the full crawl engine on it (admission ->
                     politeness -> fetch-join -> extraction -> bloom-
                     pruned dedup), returning the results table.
``queries()``      — one entry per implemented operator (SURVEY.md §2
                     crawl-dataflow analogs + training-data ops).
``oracle_sql()``   — DuckDB-dialect equivalents for everything
                     SQL-expressible; shared SQL bodies are generated
                     from one template per operator so Spark and DuckDB
                     run textually-identical logic.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _register(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).createOrReplaceTempView(t)


# ==========================================================================
# dialect helpers: the same operator SQL, emitted for spark / duckdb
# ==========================================================================
def _hex_hash(expr: str, dialect: str) -> str:
    """Deterministic 60-bit hash from md5 — identical in both engines."""
    if dialect == "spark":
        return f"CAST(conv(substr(md5({expr}), 1, 15), 16, 10) AS BIGINT)"
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def _split_ws(expr: str, dialect: str) -> str:
    if dialect == "spark":
        return f"split(trim({expr}), '\\\\s+')"
    return f"regexp_split_to_array(trim({expr}), '\\s+')"


def _rnd(expr: str, dp: int) -> str:
    """Deterministic HALF_UP rounding, identical in both engines.

    Spark's ``round`` converts the double exactly (2.675 -> 2.67) while
    DuckDB rounds 2.675 -> 2.68; a shared floor(+0.5+eps) formula makes
    both engines run the same IEEE ops. The 1e-6 epsilon absorbs
    sub-ulp summation-order differences at tie boundaries.
    """
    scale = 10 ** dp
    return f"CAST(floor(({expr}) * {scale} + 0.5 + 1e-6) AS DOUBLE) / {scale}"


def _array_len(expr: str, dialect: str) -> str:
    return f"size({expr})" if dialect == "spark" else f"len({expr})"


# --------------------------------------------------------------------------
# operator SQL templates (one body, two dialects)
# --------------------------------------------------------------------------
def sql_frontier_antijoin(dialect: str) -> str:
    """Seen-set dedup analog (left-anti join; contexts/local/context.rs:235-259):
    candidate rows that have no match in the "seen" side survive."""
    return """
SELECT o.o_orderkey AS orderkey, o.o_custkey AS custkey
FROM orders o
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 30
)
"""


def sql_politeness_topk(dialect: str) -> str:
    """Per-host politeness admission analog: top-3 per user by event time
    (SURVEY.md §2.6 'politeness budget window function')."""
    return """
SELECT user_id, event_id, CAST(rn - 1 AS INT) AS admission_index
FROM (
  SELECT user_id, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
) t
WHERE rn <= 3
"""


def sql_seen_merge_latest(dialect: str) -> str:
    """Link-state merge analog: latest state per key wins
    (link_state/state/raw.rs:249-306)."""
    return """
SELECT user_id, event_type AS last_kind, CAST(n AS BIGINT) AS n_events
FROM (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events
) t
WHERE rn = 1
"""


def sql_queue_age_filter(dialect: str) -> str:
    """Queue-age / state drop filter analog (polling.rs:101-105,180-204)."""
    return """
SELECT event_id, user_id, event_type, value
FROM events
WHERE value <= 5.0 AND event_type <> 'error'
"""


def sql_blacklist_filter(dialect: str) -> str:
    """Blacklist RegexSet filter analog (blacklist/manager_impl.rs:43-120)."""
    if dialect == "spark":
        return """
SELECT doc_id, source FROM documents
WHERE NOT (text RLIKE 'spark|shuffle') """
    return """
SELECT doc_id, source FROM documents
WHERE NOT regexp_matches(text, 'spark|shuffle')"""


def sql_state_counters(dialect: str) -> str:
    """Counting scan analog (link_state/db.rs:184-241)."""
    return """
SELECT event_type AS kind, CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY event_type
"""


def sql_budget_predicate(dialect: str) -> str:
    """Budget column predicate analog (config/crawl.rs:445-470): pure
    multi-bound arithmetic filter + per-group counters."""
    return f"""
SELECT l_returnflag AS returnflag, CAST(count(*) AS BIGINT) AS n,
       {_rnd('sum(l_quantity)', 2)} AS sum_qty
FROM lineitem
WHERE l_quantity < 25 AND l_discount <= 0.05 AND l_tax <= 0.04
GROUP BY l_returnflag
"""


def sql_q1_pricing(dialect: str) -> str:
    """TPC-H Q1 pricing summary (relational agg workhorse)."""
    return f"""
SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
       {_rnd('sum(l_quantity)', 2)} AS sum_qty,
       {_rnd('sum(l_extendedprice)', 2)} AS sum_base_price,
       {_rnd('sum(l_extendedprice * (1 - l_discount))', 2)} AS sum_disc_price,
       {_rnd('avg(l_quantity)', 4)} AS avg_qty,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def sql_q3_join_topk(dialect: str) -> str:
    """3-way join + top-k (shipping-priority shape)."""
    return f"""
SELECT o.o_orderkey AS orderkey,
       {_rnd('sum(l.l_extendedprice * (1 - l.l_discount))', 2)} AS revenue,
       o.o_orderpriority AS orderpriority
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
GROUP BY o.o_orderkey, o.o_orderpriority
ORDER BY revenue DESC, orderkey
LIMIT 10
"""


def sql_dedup_exact(dialect: str) -> str:
    """Exact dedup: content-hash groups, keeper = min doc_id."""
    h = _hex_hash("text", dialect)
    return f"""
SELECT {h} AS content_hash,
       CAST(min(doc_id) AS BIGINT) AS keeper,
       CAST(count(*) AS BIGINT) AS n_dups
FROM documents
GROUP BY 1
"""


def sql_token_count(dialect: str) -> str:
    """Token counting (whitespace tokenizer)."""
    toks = _split_ws("text", dialect)
    return f"""
SELECT doc_id, CAST({_array_len(toks, dialect)} AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
"""


def sql_text_quality(dialect: str) -> str:
    """Quality scoring: token count, mean token length, space ratio."""
    toks = _split_ws("text", dialect)
    n = _array_len(toks, dialect)
    return f"""
SELECT doc_id,
       CAST({n} AS BIGINT) AS n_tokens,
       {_rnd(f"length(replace(text, ' ', '')) * 1.0 / {n}", 4)} AS mean_tok_len,
       {_rnd("(length(text) - length(replace(text, ' ', ''))) * 1.0 / length(text)", 4)} AS space_ratio
FROM documents
WHERE length(text) > 0
"""


def sql_doc_fingerprint(dialect: str) -> str:
    """Document fingerprint: md5 over whitespace-normalized text."""
    norm = "regexp_replace(lower(text), '\\\\s+', ' ')" if dialect == "spark" else \
           "regexp_replace(lower(text), '\\s+', ' ', 'g')"
    return f"""
SELECT doc_id, md5({norm}) AS fingerprint
FROM documents
"""


def sql_lang_markers(dialect: str) -> str:
    """Language-ID marker counting (stopword-frequency heuristic) —
    the SQL-expressible core of functions/langdata.py."""
    def cnt(word: str) -> str:
        pad = f"' ' || lower(text) || ' '"
        rep = f"replace({pad}, ' {word} ', '  ')"
        return f"CAST((length({pad}) - length({rep})) / {len(word)} AS BIGINT)"
    return f"""
SELECT doc_id,
       {cnt('the')} AS n_the,
       {cnt('and')} AS n_and,
       {cnt('der')} AS n_der,
       {cnt('und')} AS n_und
FROM documents
"""


def _shingles_cte(dialect: str) -> str:
    """(doc_id, sh) distinct 3-token shingles — dialect-specific explode."""
    if dialect == "spark":
        return """
toks AS (
  SELECT doc_id, pos, tok
  FROM documents
  LATERAL VIEW posexplode(split(trim(text), '\\\\s+')) t AS pos, tok
),
numbered AS (
  SELECT doc_id, pos, tok,
         lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t1,
         lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
  FROM toks
),
shingles AS (
  SELECT DISTINCT doc_id, tok || ' ' || t1 || ' ' || t2 AS sh
  FROM numbered WHERE t2 IS NOT NULL
)"""
    return """
toks AS (
  SELECT doc_id, CAST(generate_subscripts(arr, 1) AS INT) AS pos, unnest(arr) AS tok
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS arr FROM documents) d
),
numbered AS (
  SELECT doc_id, pos, tok,
         lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t1,
         lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
  FROM toks
),
shingles AS (
  SELECT DISTINCT doc_id, tok || ' ' || t1 || ' ' || t2 AS sh
  FROM numbered WHERE t2 IS NOT NULL
)"""


def sql_ngram_jaccard(dialect: str) -> str:
    """Near-dup detection: 3-gram shingle Jaccard >= 0.5 pairs.

    Two-sided shingle self-join with per-doc shingle cardinalities —
    the same shuffle-on-shingle plan a 100 TB dedup job uses (shingle
    is the join key; hot shingles pre-aggregate map-side).
    """
    return f"""
WITH {_shingles_cte(dialect)},
card AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
  FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT common.da AS doc_a, common.db AS doc_b,
       {_rnd('c * 1.0 / (ca.n + cb.n - c)', 4)} AS jaccard
FROM common
JOIN card ca ON ca.doc_id = common.da
JOIN card cb ON cb.doc_id = common.db
WHERE c * 1.0 / (ca.n + cb.n - c) >= 0.5
"""


def sql_minhash_band_pairs(dialect: str) -> str:
    """MinHash-LSH candidate pairs: k=8 hash mins, 4 bands of 2 rows;
    pairs sharing any band bucket (shingle->minhash->band->bucket-join)."""
    min_parts = []
    for i in range(8):
        salted = "'s" + str(i) + "|' || sh"
        min_parts.append(f"min({_hex_hash(salted, dialect)}) AS h{i}")
    mins = ",\n         ".join(min_parts)
    band_rows = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {b} AS band, h{2*b} AS x, h{2*b+1} AS y FROM sig"
        for b in range(4)
    )
    return f"""
WITH {_shingles_cte(dialect)},
sig AS (
  SELECT doc_id,
         {mins}
  FROM shingles GROUP BY doc_id
),
bands AS (
{band_rows}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.x = b.x AND a.y = b.y AND a.doc_id < b.doc_id
"""


def sql_cosine_topk(dialect: str) -> str:
    """Brute-force cosine top-k vs query vec_id=0 (ANN baseline).

    Explicit unnest-join dot product in BOTH dialects (double
    accumulation) so the arithmetic matches bit-for-bit after 4dp
    rounding.
    """
    if dialect == "spark":
        expl = """
comps AS (
  SELECT vec_id, posexplode(embedding) AS (pos, v) FROM embeddings
)"""
    else:
        expl = """
comps AS (
  SELECT vec_id, CAST(generate_subscripts(embedding, 1) AS INT) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
)"""
    return f"""
WITH {expl},
q AS (SELECT pos, CAST(v AS DOUBLE) AS v FROM comps WHERE vec_id = 0),
dots AS (
  SELECT c.vec_id,
         sum(CAST(c.v AS DOUBLE) * q.v) AS dot,
         sum(CAST(c.v AS DOUBLE) * CAST(c.v AS DOUBLE)) AS nc
  FROM comps c JOIN q ON c.pos = q.pos
  WHERE c.vec_id <> 0
  GROUP BY c.vec_id
),
qn AS (SELECT sum(v * v) AS nq FROM q)
SELECT vec_id, {_rnd('dot / sqrt(nc * (SELECT nq FROM qn))', 4)} AS cosine
FROM dots
ORDER BY dot / sqrt(nc * (SELECT nq FROM qn)) DESC, vec_id
LIMIT 10
"""


# SQL-expressible operators: name -> template fn


def sql_token_count_nostop(dialect: str) -> str:
    """Tokenizer + stopword filter (text_processing/src/tokenizer.rs:26-95
    analog): token count after removing a stopword list."""
    stop = ["the", "and", "of", "der", "und", "le", "les", "el", "los", "il", "di"]
    toks = _split_ws("lower(text)", dialect)
    if dialect == "spark":
        arr = "array(" + ", ".join(f"'{w}'" for w in stop) + ")"
        kept = f"filter({toks}, x -> NOT array_contains({arr}, x))"
        n = f"size({kept})"
    else:
        arr = "[" + ", ".join(f"'{w}'" for w in stop) + "]"
        kept = f"list_filter({toks}, x -> NOT list_contains({arr}, x))"
        n = f"len({kept})"
    return f"""
SELECT doc_id, CAST({n} AS BIGINT) AS n_tokens_nostop
FROM documents
"""

_SQL_OPS: dict[str, Callable[[str], str]] = {
    "frontier_antijoin_dedup": sql_frontier_antijoin,
    "politeness_topk_admission": sql_politeness_topk,
    "seen_merge_latest_state": sql_seen_merge_latest,
    "queue_age_filter": sql_queue_age_filter,
    "blacklist_regex_filter": sql_blacklist_filter,
    "state_counters": sql_state_counters,
    "budget_predicate": sql_budget_predicate,
    "q1_pricing_summary": sql_q1_pricing,
    "q3_join_topk": sql_q3_join_topk,
    "dedup_exact_hash": sql_dedup_exact,
    "token_count": sql_token_count,
    "text_quality": sql_text_quality,
    "doc_fingerprint": sql_doc_fingerprint,
    "lang_id_markers": sql_lang_markers,
    "dedup_ngram_jaccard": sql_ngram_jaccard,
    "minhash_band_pairs": sql_minhash_band_pairs,
    "embedding_cosine_topk": sql_cosine_topk,
    "token_count_nostop": sql_token_count_nostop,
}


def _make_sql_query(name: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _register(spark, sf_dir)
        return spark.sql(_SQL_OPS[name]("spark"))

    run.__name__ = name
    return run


# ==========================================================================
# non-SQL operators (rows-only driver check)
# ==========================================================================
def q_simhash64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document via an Arrow-batched pandas UDF
    (token-hash bit voting) — near-dup fingerprinting at scale."""
    import hashlib

    import numpy as np
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def simhash(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if not t:
                out.append(0)
                continue
            acc = np.zeros(64, dtype=np.int64)
            for tok in t.lower().split():
                bits = np.unpackbits(
                    np.frombuffer(hashlib.md5(tok.encode()).digest()[:8], dtype=np.uint8)
                ).astype(np.int64)
                acc += bits * 2 - 1
            packed = np.packbits((acc > 0).astype(np.uint8)).tobytes()
            out.append(int.from_bytes(packed, "big", signed=True))
        return pd.Series(out, dtype="int64")

    _register(spark, sf_dir)
    return spark.table("documents").select("doc_id", simhash(F.col("text")).alias("simhash"))




def q_simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate pairs over documents (banded Hamming
    blocking; atra_spark.functions.dedup.simhash_near_pairs)."""
    from atra_spark.functions.dedup import simhash_near_pairs

    _register(spark, sf_dir)
    return simhash_near_pairs(spark.table("documents"), max_hamming=12)


def q_minhash_lsh_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame-API MinHash-LSH candidates (xxhash64 band buckets —
    the scale path; the SQL twin minhash_band_pairs is oracle-checked)."""
    from atra_spark.functions.dedup import minhash_lsh_candidates

    _register(spark, sf_dir)
    return minhash_lsh_candidates(spark.table("documents"))


def q_embedding_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 via random-hyperplane LSH bucketing + exact re-rank
    (atra_spark.functions.similarity.lsh_bucketed_topk)."""
    from atra_spark.functions.similarity import lsh_bucketed_topk

    _register(spark, sf_dir)
    emb = spark.table("embeddings")
    q = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return lsh_bucketed_topk(
        emb.filter(F.col("vec_id") != 0), [float(x) for x in q], k=10, multiprobe=2
    )


def q_rolling_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style rolling-hash document fingerprints."""
    from atra_spark.functions.textstats import rolling_fingerprints

    _register(spark, sf_dir)
    return rolling_fingerprints(spark.table("documents"))


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: binary payload feature pass over the
    deterministic synthetic media table (decode step stubbed — no
    codecs in this environment; schema/batching/hashing real)."""
    from atra_spark.functions.multimodal import extract_media_features, synth_media

    return extract_media_features(synth_media(spark, n=128))


def q_sitemap_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap source: <urlset> rows -> canonicalized frontier candidates."""
    from atra_spark.sources.fixtures import generate_fixtures
    from atra_spark.sources.sitemap import sitemap_candidates
    import pyspark.sql.functions as SF

    fx = generate_fixtures(n_pages=60, n_hosts=4)
    locs = "".join(
        f"<url><loc>{u}</loc></url>" for u, *_ in fx.pages[:40]
    )
    xml = f'<?xml version="1.0"?><urlset>{locs}</urlset>'.encode()
    pages = spark.createDataFrame(
        [("https://host0000.example/sitemap.xml", None, xml, None, None)],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    return sitemap_candidates(pages)


def q_crawl_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full crawl round on the built-in deterministic fixture corpus
    (pages synthesized at seed=42): admission -> politeness window ->
    fetch-join -> Arrow extraction -> bloom-pruned dedup. Returns the
    round's results table (non-SQL: exercises the crawl dataflow)."""
    from atra_spark.plans.crawl import CrawlEngine
    from atra_spark.sources.fixtures import ensure_fixtures, generate_fixtures
    from atra_spark.sources.store import CheckpointStore

    fix_dir = os.path.join(tempfile.gettempdir(), "atra_entry_fixtures")
    paths = ensure_fixtures(fix_dir, n_pages=600, n_hosts=12)
    with open(paths["seeds"]) as f:
        seeds = [line.strip() for line in f if line.strip()]
    from atra_spark.config import CrawlConfig

    with open(paths["config"]) as f:
        config = CrawlConfig.from_json(f.read())
    store = CheckpointStore(tempfile.mkdtemp(prefix="atra_entry_store"), num_buckets=8)
    eng = CrawlEngine(spark, store, config, paths["pages"], paths["robots"], num_buckets=8)
    eng.run(seeds=seeds, max_rounds=2)
    res = store.read_union(spark, "results")
    return res.select("url", "host", "fetched_round", "status", "lang", "n_links")


# ==========================================================================
# driver contract
# ==========================================================================
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build a Common-Crawl-style pages table from the sf0.001
    documents parquet and run the full crawl engine over it."""
    from atra_spark.config import CrawlConfig
    from atra_spark.plans.crawl import CrawlEngine
    from atra_spark.sources.store import CheckpointStore
    from atra_spark.urlkit import NORMAL, UNBOUNDED_DISTANCE, Budget

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()

    # one page per document; each page links to two other documents
    # (successor and a 7-stride hop) so the crawl walks the corpus from a
    # few seeds; target URLs resolved by self-join so every link is live
    urls = docs.select(
        F.col("doc_id").alias("t_id"),
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example/doc"),
            F.col("doc_id"), F.lit(".html"),
        ).alias("t_url"),
    )
    base = docs.select(
        "doc_id", "text", "source",
        ((F.col("doc_id") + 1) % n_docs).alias("nxt"),
        ((F.col("doc_id") * 7 + 3) % n_docs).alias("hop"),
    )
    j = (
        base.join(F.broadcast(urls).withColumnRenamed("t_url", "u_self"), base["doc_id"] == F.col("t_id"))
        .drop("t_id")
        .join(F.broadcast(urls).withColumnRenamed("t_url", "u_next"), F.col("nxt") == F.col("t_id"))
        .drop("t_id")
        .join(F.broadcast(urls).withColumnRenamed("t_url", "u_hop"), F.col("hop") == F.col("t_id"))
        .drop("t_id")
    )
    pages = j.select(
        F.col("u_self").alias("url"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        F.encode(
            F.concat(
                F.lit("<!DOCTYPE html><html><head><title>doc</title></head><body><p>"),
                F.col("text"),
                F.lit('</p><a href="'), F.col("u_next"),
                F.lit('">next</a><a href="'), F.col("u_hop"),
                F.lit('">hop</a></body></html>'),
            ),
            "UTF-8",
        ).alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )
    tmp = tempfile.mkdtemp(prefix="atra_flagship")
    pages_path = os.path.join(tmp, "pages.parquet")
    pages.write.mode("overwrite").parquet(pages_path)

    seeds = [
        r["url"]
        for r in pages.orderBy("url").limit(8).collect()
    ]
    config = CrawlConfig(
        default_budget=Budget(
            kind=NORMAL, depth_on_website=0, distance_to_seed=UNBOUNDED_DISTANCE
        ),
        delay_ms=100,
        round_budget_ms=10_000,
        max_rounds=3,
    )
    store = CheckpointStore(os.path.join(tmp, "store"), num_buckets=8)
    eng = CrawlEngine(spark, store, config, pages_path, robots_path=None, num_buckets=8)
    eng.run(seeds=seeds, max_rounds=3)
    res = store.read_union(spark, "results")
    return res.select("url", "host", "fetched_round", "status", "encoding", "lang", "n_links")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        name: _make_sql_query(name) for name in _SQL_OPS
    }
    out["simhash64"] = q_simhash64
    out["simhash_near_pairs"] = q_simhash_near_pairs
    out["minhash_lsh_df"] = q_minhash_lsh_df
    out["embedding_lsh_topk"] = q_embedding_lsh_topk
    out["rolling_fingerprints"] = q_rolling_fingerprints
    out["media_features"] = q_media_features
    out["sitemap_candidates"] = q_sitemap_candidates
    out["crawl_round"] = q_crawl_round
    return out


def oracle_sql() -> dict[str, str]:
    return {name: fn("duckdb") for name, fn in _SQL_OPS.items()}
