"""Structured Streaming ingestion: a continuously-arriving pages feed
(e.g. WARC drops landing in object storage) flows through the SAME
extraction pipeline as the batch round loop and appends to the results
table exactly-once (checkpointed file sink).

The reference is a continuous async loop rather than micro-batch
(SURVEY.md §2.8); the round loop covers the frontier semantics, and
this module covers the "pages keep arriving" half: readStream over the
landing directory -> mapInPandas extraction -> parquet append with a
streaming checkpoint. Late/duplicate pages are handled by watermarked
dropDuplicates on (url) within the watermark horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.extract import extract_pages_batch
from ..schemas import EXTRACTED_WITH_TS_SCHEMA, PAGES_SCHEMA


def stream_pages(
    spark: SparkSession,
    landing_dir: str,
    watermark: str = "10 minutes",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream over a parquet landing directory of pages rows,
    watermarked on capture time and deduplicated per URL within the
    watermark (late/duplicate handling, polling.rs:180-204 analog)."""
    reader = spark.readStream.schema(PAGES_SCHEMA).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    pages = reader.load(landing_dir)
    return (
        pages.withWatermark("warc_ts", watermark)
        .dropDuplicates(["url", "warc_ts"])
    )


def extract_stream(pages_stream: DataFrame) -> DataFrame:
    """The same Arrow extraction stage as the batch round loop, applied
    to the stream (mapInPandas is streaming-capable)."""

    def _extract(it):
        return extract_pages_batch(it)

    return pages_stream.select("url", "warc_ts", "html").mapInPandas(
        _extract, EXTRACTED_WITH_TS_SCHEMA
    )


def run_ingest(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> None:
    """Launch the ingest query; with ``available_now`` it drains the
    current landing set and stops (test/backfill mode), otherwise it
    runs continuously."""
    extracted = extract_stream(stream_pages(spark, landing_dir)).select(
        "url",
        "warc_ts",
        "encoding",
        "text",
        "lang",
        "lang_confidence",
        "format",
        F.size("links").alias("n_links"),
    )
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:  # pragma: no cover - continuous mode needs an external stop
        writer.trigger(processingTime="10 seconds").start()


def run_dedup_ingest(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    index_root: str,
    threshold: float = 0.7,
    num_buckets: int = 32,
    available_now: bool = True,
) -> None:
    """Continuous corpus construction with FUZZY dedup: each arriving
    micro-batch of documents (parquet rows ``doc_id long, text
    string`` landing in ``landing_dir``) is near-dup-checked against
    EVERY previously admitted document via the persistent
    NearDupIndex (operators/neardup_index.py) at O(batch) cost, plus
    keep-first within the batch itself; survivors land under
    ``out_dir/clean/batch=<id>`` and flagged rows (with their dup_of
    lineage) under ``out_dir/dups/batch=<id>``, and the survivors are
    admitted to the index so LATER batches dedup against them.

    This is the fuzzy third leg of the ingest family: ``run_ingest``
    dedups exactly on (url, ts) inside the watermark, the archive sink
    dedups payload digests (revisit records), and this sink dedups
    near-identical CONTENT across the whole corpus history — the
    "dedup the new crawl against all prior crawls without re-scanning
    them" economics.

    Exactly-once across restarts without a transactional sink, same
    recipe as the archive sink: both outputs are batch-id-keyed
    directories (cleared before a replayed batch rewrites them) and
    index admission is idempotent (an atomically-rewritten delta file
    joins the manifest chain once), with the index manifest committed
    only AFTER the batch's parquet is down — a crash between them
    replays into identical state.

    Known gap (ADVICE r5, declared): documents with fewer than k
    tokens carry no MinHash signature, so sub-k-token documents are
    admitted every batch and never flagged — even exact duplicates of
    each other. A deployment that cares about short-doc dedup should
    compose an exact content-hash check (content_hash + a SeenIndex-
    style digest store) for the sub-k leg in the same foreachBatch;
    the fuzzy index is by construction blind below the shingle
    window."""
    import os
    import shutil

    from ..operators.neardup_index import NearDupIndex

    idx = NearDupIndex(index_root, num_buckets=num_buckets)

    reader = spark.readStream.schema("doc_id long, text string").format("parquet")
    docs = reader.load(landing_dir)

    def _dedup(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch = batch_df.localCheckpoint()  # probed, flagged, written: pin once
        vs_history = idx.probe(batch, threshold=threshold)
        in_batch = idx.probe_within(batch, threshold=threshold)
        flagged = vs_history.unionByName(in_batch)
        # a doc flagged both ways reports its strongest match
        from pyspark.sql import Window

        w = Window.partitionBy("doc_id").orderBy(
            F.col("est_jaccard").desc(), F.col("dup_of").asc()
        )
        flagged = (
            flagged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        survivors = batch.join(flagged.select("doc_id"), on="doc_id", how="left_anti")
        for sub, part in ((survivors, "clean"), (flagged, "dups")):
            out = os.path.join(out_dir, part, f"batch={batch_id}")
            if os.path.exists(out):
                shutil.rmtree(out)  # replayed batch rewrites, never appends
            sub.write.mode("overwrite").parquet(out)
        idx.admit(survivors, batch_id)
        idx.commit()  # AFTER the parquet is down: crash replays converge

    writer = (
        docs.writeStream.foreachBatch(_dedup)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:  # pragma: no cover - continuous mode needs an external stop
        writer.trigger(processingTime="10 seconds").start()


def run_archive_sink(
    spark: SparkSession,
    landing_dir: str,
    archive_dir: str,
    cdx_dir: str,
    checkpoint_dir: str,
    dedup_payloads: bool = True,
    available_now: bool = True,
) -> None:
    """Continuous archiving: each micro-batch of arriving pages is
    exported as rotated WARC files (digest-dedup'd by default — the
    revisit-record path, plans/export.py) and indexed: its CDX rows
    land as a per-batch parquet partition under ``cdx_dir``.

    Exactly-once across restarts WITHOUT a transactional sink: both
    outputs are keyed by the micro-batch id — the WARC files go under
    ``archive_dir/batch=<id>`` (cleared before a replayed batch
    rewrites it) and the CDX partition is written with overwrite — so
    replaying a failed batch converges to the same bytes instead of
    appending duplicates. The checkpoint ties batch ids to input files.

    This is the streaming half of the archive loop: batch jobs read
    the same archive back with sources/warc.read_warc_pages and query
    the same index, no format fork."""
    import os
    import shutil

    from ..plans.export import export_warc
    from ..sources.warc import build_cdx

    pages = stream_pages(spark, landing_dir)

    def _archive(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return  # watermark/state flush batches carry no pages
        out = os.path.join(archive_dir, f"batch={batch_id}")
        if os.path.exists(out):
            shutil.rmtree(out)  # replayed batch rewrites, never appends
        results = batch_df.select(
            "url",
            F.col("warc_ts").alias("fetched_at"),
            F.lit(200).alias("status"),
        )
        export_warc(
            results,
            batch_df.select("url", "html"),
            out,
            dedup_payloads=dedup_payloads,
        ).collect()
        build_cdx(batch_df.sparkSession, out).write.mode("overwrite").parquet(
            os.path.join(cdx_dir, f"batch={batch_id}")
        )

    writer = (
        pages.writeStream.foreachBatch(_archive)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:  # pragma: no cover - continuous mode needs an external stop
        writer.trigger(processingTime="10 seconds").start()
