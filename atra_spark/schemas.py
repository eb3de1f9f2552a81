"""Explicit StructTypes for every engine table.

The reference keeps fixed serde structs in RocksDB column families and a
FIFO queue file (SURVEY.md §1.3); the rebuild declares one explicit
schema per table — no inference anywhere. Parity citations:

- frontier element      -> atra/src/queue/url/element.rs:23-33
- depth triple          -> atra/src/url/depth.rs:27-34
- link state (seen set) -> atra/src/link_state/state/raw.rs:30-54
- link-state kinds      -> atra/src/link_state/kind.rs:41-57
- crawl result          -> atra/src/crawl/crawler/result.rs:32-90
- web graph entry       -> atra/src/web_graph.rs:36-96
- robots cache entry    -> atra/src/robots/manager_impl.rs:33-155
- host last-access      -> atra/src/recrawl_management/mod.rs:27-70
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --------------------------------------------------------------------------
# Link-state kind codes — identical values to the reference for parity
# (atra/src/link_state/kind.rs:41-57).
# --------------------------------------------------------------------------
KIND_DISCOVERED = 0
KIND_RESERVED = 1
KIND_CRAWLED = 2
KIND_PROCESSED_AND_STORED = 3
KIND_INTERNAL_ERROR = 32
KIND_UNSET = 254

# Columns of the depth triple (atra/src/url/depth.rs:27-34).
DEPTH_COLS = ["depth_on_website", "distance_to_seed", "total_distance_to_seed"]


def _depth_fields() -> list[StructField]:
    return [StructField(c, LongType(), False) for c in DEPTH_COLS]


# --------------------------------------------------------------------------
# pages — the crawl universe (input; BASELINE.json input_hint).
# In this sandbox a frontier URL is "fetched" by joining against this
# table; absent URLs behave as fetch errors (-> KIND_INTERNAL_ERROR).
# --------------------------------------------------------------------------
PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),  # golden extracted text
        StructField("lang", StringType(), True),  # golden language code
    ]
)

# --------------------------------------------------------------------------
# frontier — the priority queue, one snapshot per crawl round
# (queue/url/element.rs:23-33 + depth triple). ``priority`` is derived,
# not stored, by the reference; we materialize the ordering inputs.
# --------------------------------------------------------------------------
FRONTIER_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("host", StringType(), False),
        StructField("is_seed", BooleanType(), False),
        StructField("age", IntegerType(), False),
        StructField("host_was_in_use", BooleanType(), False),
        *_depth_fields(),
        StructField("enqueue_round", IntegerType(), False),
    ]
)

# --------------------------------------------------------------------------
# seen — the URL-seen set / link-state machine
# (link_state/state/raw.rs:30-54, unpacked from its 44-byte layout).
# Partition discipline at scale: bucket(P, xxhash64(host)).
# --------------------------------------------------------------------------
SEEN_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("host", StringType(), False),
        StructField("kind", IntegerType(), False),
        StructField("last_significant_kind", IntegerType(), False),
        StructField("recrawl", BooleanType(), False),
        StructField("is_seed", BooleanType(), False),
        StructField("ts", TimestampType(), False),
        *_depth_fields(),
    ]
)

# --------------------------------------------------------------------------
# results — fetched + processed pages (crawl/crawler/result.rs:32-90).
# --------------------------------------------------------------------------
RESULTS_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("host", StringType(), False),
        # the admission's own crawl state: carrying is_seed + the
        # depth triple on the row lets the link expansion and the
        # state-transition branch read them from the committed
        # snapshot instead of re-joining a (driver-serial) broadcast
        # of the admitted set
        StructField("is_seed", BooleanType(), False),
        StructField("depth_on_website", LongType(), False),
        StructField("distance_to_seed", LongType(), False),
        StructField("total_distance_to_seed", LongType(), False),
        StructField("fetched_round", IntegerType(), False),
        StructField("fetched_at", TimestampType(), True),
        StructField("status", IntegerType(), False),  # 200 on hit, 404 on miss
        StructField("headers", MapType(StringType(), StringType()), True),
        StructField("redirect", StringType(), True),
        StructField("format", StringType(), True),
        StructField("encoding", StringType(), True),
        StructField("had_decode_errors", BooleanType(), True),
        StructField("lang", StringType(), True),
        StructField("lang_confidence", DoubleType(), True),
        StructField("text", StringType(), True),
        StructField("n_links", IntegerType(), False),
        # fetched=false marks the fetch-error analog rows (miss -> 404)
        StructField("fetched", BooleanType(), False),
        # extracted outlinks — CrawlResult carries its links in the
        # reference too (result.rs:32-90); materializing them here makes
        # the results write the ONE extraction pass per round (the
        # frontier path re-reads this column, columnar-pruned)
        # (array<LINK_STRUCT>, declared below)
    ]
)

# Extracted link struct produced by the extraction UDF
# (extraction/links.rs:23-41: OnSeed | Outgoing | Data + method hint).
LINK_STRUCT = StructType(
    [
        StructField("url", StringType(), False),
        StructField("kind", StringType(), False),  # onseed | outgoing | data
        StructField("method", StringType(), False),  # html_a | html_media | js | text
        # PSL origin (politeness key) of the link target — computed
        # inside the extraction batch where the full public-suffix list
        # is already resident (origin.rs:23-49); null for data: links.
        # Carrying it in the struct keeps the link-expansion hot path
        # free of any per-link Python stage.
        StructField("host", StringType(), True),
    ]
)

EXTRACTED_WITH_TS_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),  # passthrough
        StructField("encoding", StringType(), False),
        StructField("had_decode_errors", BooleanType(), False),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("lang_confidence", DoubleType(), True),
        StructField("format", StringType(), False),
        StructField("links", ArrayType(LINK_STRUCT), False),
    ]
)


def extracted_schema_with_passthrough(passthrough) -> StructType:
    """EXTRACTED schema with the pages table's metadata columns
    (warc_ts / status / headers) spliced in after url — the extraction
    batch passes them through untouched (result.rs:32-90 meta fidelity
    when the input carries real response metadata)."""
    base = [f for f in EXTRACTED_WITH_TS_SCHEMA.fields if f.name != "warc_ts"]
    return StructType([base[0]] + list(passthrough) + base[1:])

EXTRACTED_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("encoding", StringType(), False),
        StructField("had_decode_errors", BooleanType(), False),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("lang_confidence", DoubleType(), True),
        StructField("format", StringType(), False),
        StructField("links", ArrayType(LINK_STRUCT), False),
    ]
)

# --------------------------------------------------------------------------
# edges — the web graph (web_graph.rs:36-96): Seed and Link entries.
# --------------------------------------------------------------------------
EDGES_SCHEMA = StructType(
    [
        StructField("src", StringType(), False),
        StructField("dst", StringType(), False),
        StructField("kind", StringType(), False),  # seed | link
        StructField("round", IntegerType(), False),
    ]
)

# --------------------------------------------------------------------------
# robots — per-origin robots.txt cache (robots/manager_impl.rs:33-155).
# --------------------------------------------------------------------------
ROBOTS_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("robots_txt", BinaryType(), True),
        StructField("status", IntegerType(), False),
        StructField("retrieved_at", TimestampType(), True),
    ]
)

# --------------------------------------------------------------------------
# host_state — origin -> last access (recrawl_management/mod.rs:27-70).
# --------------------------------------------------------------------------
HOST_STATE_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("last_access", TimestampType(), True),
        StructField("crawl_delay_ms", LongType(), False),
    ]
)

# --------------------------------------------------------------------------
# metrics — per-round, per-partition lineage + fetch/parse counters
# (north rule: "resumable with per-partition lineage and fetch/parse
# metrics"). One row per (round, host-bucket).
# --------------------------------------------------------------------------
METRICS_SCHEMA = StructType(
    [
        StructField("round", IntegerType(), False),
        StructField("bucket", IntegerType(), False),
        StructField("polled", LongType(), False),
        StructField("admitted", LongType(), False),
        StructField("deferred", LongType(), False),
        StructField("fetched_ok", LongType(), False),
        StructField("fetch_errors", LongType(), False),
        StructField("links_extracted", LongType(), False),
        StructField("new_urls", LongType(), False),
        StructField("wall_ms", LongType(), False),
    ]
)

# Admission log used for crawl-ordering parity (SURVEY.md §7:
# deterministic order = (round, host, admission_index)).
ADMISSION_SCHEMA = StructType(
    [
        StructField("round", IntegerType(), False),
        StructField("host", StringType(), False),
        StructField("admission_index", IntegerType(), False),
        StructField("url", StringType(), False),
    ]
)
