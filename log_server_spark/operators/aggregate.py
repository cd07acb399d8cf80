"""Aggregation stage — per-sink stats, windowed aggregates, `info` report.

Mirrors the reference's running per-segment aggregates (SURVEY.md A1-A4:
RecordStorage.scala:93-100 min/max ts + count + bytes; HeaderStorage
distinct-key count :175; LogServerDb.info :58-80; ingest added/duplicate
counters MemoryWiseLogWrapper.scala:97-111) as declarative groupBys —
map-side partial aggregation makes these one shuffle of tiny partial states
regardless of input size. Distinct-url is computed exactly (correctness gate)
AND as an HLL sketch (`approx_count_distinct`) — at 10^12 rows the sketch is
the per-window dashboard number, the exact count stays cheap because it
rides the same shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sink_stats(routed: DataFrame) -> DataFrame:
    """Per-sink aggregate stats — the analogue of per-segment `info` (A3)."""
    return routed.groupBy("sink").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("url").alias("n_urls"),
        F.approx_count_distinct("url").alias("n_urls_approx"),
        F.countDistinct("table", "record_id", "record_hash").alias("n_keys"),
        F.min("ts_millis").alias("min_ts"),
        F.max("ts_millis").alias("max_ts"),
        F.sum("n_bytes").alias("total_bytes"),
    )


def windowed_stats(routed: DataFrame, window: str = "1 day") -> DataFrame:
    """Tumbling event-time windows per sink over warc_ts (north_star)."""
    return (
        routed.groupBy(F.window("warc_ts", window).alias("w"), "sink")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("url").alias("n_urls"),
            F.approx_count_distinct("url").alias("n_urls_approx"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "sink",
            "n_rows",
            "n_urls",
            "n_urls_approx",
        )
    )


def info(records: DataFrame) -> DataFrame:
    """`info`-command analogue over the stored records table (A3, §3.3):
    one row per (sink, day) "segment" sorted by name."""
    return (
        records.groupBy("sink", "day")
        .agg(
            F.count("*").alias("records"),
            F.countDistinct("table", "record_id", "record_hash").alias("hashes"),
            F.min("ts_millis").alias("min_ts"),
            F.max("ts_millis").alias("max_ts"),
        )
        .orderBy("sink", "day")
    )
