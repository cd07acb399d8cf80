"""Structured Streaming restatement of the ingest DAG.

The reference is a micro-batch system in disguise (SURVEY.md §2.9): a writer
rotates ``current`` -> ``*.saved`` every 5 minutes (the completeness
watermark, LogWriterClient.scala:26-27) and `update` ingests whatever saved
files exist, deduplicating idempotently (BigStorage.scala:316-333). The
streaming mapping:

- file source watching the pages directory == the ``*.saved`` watch (T2);
- ``withWatermark(warc_ts) + dropDuplicatesWithinWatermark`` == the
  hash-dedup with the reference's timestamp-range probe gate
  (BigStorage.scala:30) bounding state instead of every-segment probes (T3);
- checkpointed ``writeStream`` to a partitioned file sink == segment append
  with crash recovery; Spark's file-sink commit log IS the lineage table (T4);
- windowed aggregates run as a streaming query over event time (north_star
  windowed aggs) in update/append mode.

The batch DAG (plans/pipeline.py) stays the primary path per north_rule;
this module exists because the reference's semantics are genuinely
streaming-shaped and the engine should expose both.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log_server_spark.functions.parse import PARSED_SCHEMA, parse_pages
from log_server_spark.operators.enrich import enrich
from log_server_spark.operators.route import with_sink

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def streaming_records(
    spark: SparkSession,
    pages_dir: str,
    lang_lookup: DataFrame,
    domain_lookup: DataFrame,
    watermark: str = "1 day",
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """pages stream -> parsed/deduped/enriched/routed record stream."""
    pages = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_dir)
    )
    parsed = (
        parse_pages(pages)
        .withColumn("day", F.to_date("warc_ts"))
        .withWatermark("warc_ts", watermark)  # set ONCE; both branches and
        # any downstream stateful op (dedup, windowed agg) inherit it
    )
    # ONE stateful dedup for both record classes, keyed by a class-prefixed
    # composite string (prefixes keep the key spaces disjoint):
    # - ok rows:   o | table | record_id | record_hash  (J1/A5 identity)
    # - error rows: e | url | warc_ts | seq | status | md5(text) — the
    #   idempotent error sink, streaming flavor (parity with run_batch's
    #   per-batch full-row distinct): byte-identical error rows from
    #   exact-duplicate malformed pages collapse within the watermark,
    #   while two DIFFERENT malformed versions of one url both survive.
    # A single operator halves the streaming plan: the branch-and-union
    # formulation this replaced re-read and re-PARSED the source once per
    # branch (streams cannot persist the parsed frame) and ran two state
    # stores — measured 2x the micro-batch cost on the catch-up bench.
    # concat_ws silently DROPS null fields (shifting the key), so every
    # nullable field is coalesced to a sentinel. State stays bounded: the
    # watermark expires old keys; md5(text) keeps error keys small.
    sep = "\x1f"
    dk = F.when(
        F.col("status") == "ok",
        F.concat_ws(
            sep,
            F.lit("o"),
            F.coalesce(F.col("table"), F.lit("\x00")),
            F.coalesce(F.col("record_id").cast("string"), F.lit("\x00")),
            F.col("record_hash").cast("string"),
        ),
    ).otherwise(
        F.concat_ws(
            sep,
            F.lit("e"),
            F.col("url"),
            F.col("warc_ts").cast("string"),
            F.col("seq").cast("string"),
            F.col("status"),
            F.coalesce(F.md5(F.encode(F.col("text"), "UTF-8")), F.lit("\x00")),
        )
    )
    deduped = (
        parsed.withColumn("__dk", dk)
        .dropDuplicatesWithinWatermark(["__dk"])
        .drop("__dk")
    )
    return with_sink(enrich(deduped, lang_lookup, domain_lookup))


def streaming_saved_records(
    spark: SparkSession,
    saved_dir: str,
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """Continuous `.saved` / `.saved.gz` ingestion — the wire-format
    migration path gets the same continuous mode pages have (T2).

    The reference's writer rotates ``current`` -> ``*.saved`` every 5 min
    (LogWriterClient.scala:26-27); each rotated file is immutable from then
    on — exactly the append-only-directory contract a streaming file source
    needs. The binaryFile source tracks seen files in the checkpoint, and
    each new file decodes through the same ``_decode_batches`` generator the
    batch reader uses (one task per file, the reference's per-file reader
    thread as a stream micro-batch)."""
    from log_server_spark.sources.saved_format import (
        SAVED_GLOB,
        decode_saved_files,
        saved_records_projection,
    )

    files = (
        spark.readStream.format("binaryFile")
        # the binaryFile source's schema is fixed; streaming sources demand
        # it spelled out rather than inferred
        .schema("path string, modificationTime timestamp, length long, content binary")
        .option("pathGlobFilter", SAVED_GLOB)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(saved_dir)
    )
    # decode + projection are the BATCH reader's own wiring (shared helper;
    # only the readStream line differs between the two ingest paths)
    return saved_records_projection(decode_saved_files(files))


def start_saved_ingest(
    spark: SparkSession,
    saved_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
    watermark: str = "1 day",
):
    """Exactly-once streaming ingest of wire-format files into a partitioned
    record sink, deduplicating on the reference key within the watermark
    (T3/T4 for the `.saved` migration path). ``available_now=True`` drains
    the current directory contents and stops — equivalent to one
    ``update --format saved`` batch run."""
    records = (
        streaming_saved_records(spark, saved_dir)
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["table", "record_id", "record_hash"])
        .withColumn("day", F.to_date("warc_ts"))
    )
    # one file per day per trigger, not one per (shuffle partition x day)
    # — same keyed-repartition move as start_ingest's sink (measured 7x)
    records = records.repartition(F.col("day"))
    writer = (
        records.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("day")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_ingest(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    lang_lookup: DataFrame,
    domain_lookup: DataFrame,
    available_now: bool = False,
    watermark: str = "1 day",
    max_files_per_trigger: int = 8,
):
    """Start the exactly-once streaming ingest into a partitioned file sink.

    ``available_now=True`` drains the current directory contents and stops —
    the streaming equivalent of one batch `update` run (useful for tests and
    for catch-up runs); otherwise the query runs continuously.

    Two operating modes, tuned by (watermark, max_files_per_trigger):

    - **Tailing** a live log (event time ≈ arrival order): the defaults —
      small triggers for latency, a tight watermark to bound dedup state.
    - **Catch-up / backfill** over HISTORICAL data: the watermark MUST span
      the corpus's event-time range and the trigger should be large. A
      tight watermark over out-of-order history is the classic silent-drop
      footgun: after the first micro-batch the watermark jumps to
      (max seen − watermark) and every stateful operator DROPS older rows
      as late — measured on a 30-day random-order corpus with the 1-day
      default: 71k of 260k records survived. With watermark ≥ span the
      same run is row-identical to batch (260,065 == batch). Small
      triggers also pay per-trigger costs (state-store commits, task
      spawn, sink manifest) that one big trigger pays once: 8-file
      triggers measured 139.6 s vs 18.2 s for one 64-file trigger on the
      same input after the keyed sink repartition.
    """
    routed = streaming_records(
        spark, pages_dir, lang_lookup, domain_lookup, watermark,
        max_files_per_trigger=max_files_per_trigger,
    )
    # align the write partitioning with the sink layout: without this every
    # one of the N shuffle partitions sprays a file into every (sink, day)
    # dir it touches — N x |dirs| tiny files and the dominant cost of the
    # whole query (measured on the 240k-page catch-up: 60.2 s with the
    # sprayed write vs 9.1 s to a noop sink; keyed repartition collapses
    # the write to one file per (sink, day) per trigger, same move the
    # batch writer's salted repartition makes at pipeline.py run_batch)
    routed = routed.repartition(F.col("sink"), F.col("day"))
    writer = (
        routed.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("sink", "day")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_windowed_stats(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    lang_lookup: DataFrame,
    domain_lookup: DataFrame,
    window: str = "1 day",
    watermark: str = "1 day",
    available_now: bool = False,
):
    """Streaming per-sink tumbling-window counts (append mode: a window row
    emits once its watermark passes — late data within the watermark is
    incorporated, later data is dropped, mirroring T3)."""
    routed = streaming_records(spark, pages_dir, lang_lookup, domain_lookup, watermark)
    agg = (
        routed.groupBy(F.window("warc_ts", window).alias("w"), "sink")
        .agg(
            F.count("*").alias("n_rows"),
            F.approx_count_distinct("url").alias("n_urls_approx"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "sink",
            "n_rows",
            "n_urls_approx",
        )
    )
    # closed windows per trigger are a handful of rows; without the
    # single-partition coalesce every trigger writes one near-empty file
    # per shuffle partition (32/trigger), compounding forever
    writer = (
        agg.repartition(1, F.lit(0)).writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_record_sessions(
    spark: SparkSession,
    records_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
    available_now: bool = False,
):
    """Stage-2 stream: per-domain ingest sessions over the records SINK.

    Chained exactly-once: the file SOURCE on ``records_dir`` reads the
    ingest sink's ``_spark_metadata`` commit log, so it only ever sees files
    the upstream checkpointed query committed — a crash between the two
    stages replays nothing and loses nothing. This is the production shape
    for composing stateful stages (decoupled queries over a committed sink)
    rather than chaining two stateful operators inside one query.

    Each ok record becomes a session event: key = xxhash64(domain) (the
    sessionizer's long key), event time = capture ts (warc_ts), value =
    payload bytes. Closed sessions -> parquet, exactly once (the stateful
    sessionizer emits on gap-close or event-time timeout).
    """
    from log_server_spark.streaming.sessionize import streaming_sessions

    schema = spark.read.parquet(records_dir).schema
    records = spark.readStream.schema(schema).parquet(records_dir)
    events = records.filter(F.col("status") == "ok").select(
        F.xxhash64("domain").alias("user_id"),
        F.col("url").alias("event_id"),
        F.col("warc_ts").alias("ts"),
        F.col("n_bytes").cast("double").alias("value"),
    )
    # NO repartition here, deliberately: applyInPandasWithState emits
    # columnar Arrow batches and the streaming planner does not insert a
    # columnar->row transition before an Exchange — any repartition of its
    # output dies with ColumnarBatchRow->UnsafeRow ClassCastException
    # (reproduced on 4.1). Closed sessions per trigger are few, so the
    # per-shuffle-partition small files are bounded by the trigger rate;
    # compact downstream if they matter.
    writer = (
        streaming_sessions(events, watermark=watermark)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
