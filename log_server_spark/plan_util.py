"""Driver-side plan helpers shared by queries and operators."""

from __future__ import annotations

import os
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame

_DEFAULT_MPB = 128 << 20


def _max_partition_bytes(spark) -> int:
    raw = spark.conf.get("spark.sql.files.maxPartitionBytes", str(_DEFAULT_MPB))
    s = raw.strip().lower()
    if s.endswith("b"):
        s = s[:-1]
    try:
        return int(s)
    except ValueError:  # "128m"-style values: fall back to the default
        return _DEFAULT_MPB


def scan_bytes_estimate(df: DataFrame) -> int | None:
    """Total size of the files backing a plan, or None if it has non-file
    sources. Driver metadata only (the scan's FileIndex listing) — NO RDD
    conversion, no Spark job, and unlike ``df.rdd.getNumPartitions()`` it
    does not bypass AQE on the frame."""
    try:
        uris = df.inputFiles()
    except Exception:
        return None
    if not uris:
        return None
    total = 0
    for uri in uris:
        p = unquote(urlparse(uri).path) if "://" in uri or uri.startswith("file:") else uri
        try:
            total += os.path.getsize(p)
        except OSError:
            return None
    return total


def spread_small_input(df: DataFrame) -> DataFrame:
    """Small-input / heavy-compute guard: a corpus that fits one parquet
    split would run downstream interpreted/Python-heavy work on ONE core.
    Repartition up to the session parallelism only when the file-size
    estimate says the scan yields fewer splits than cores; at real scale the
    scan already has >= cores partitions and this is a no-op (no shuffle,
    no plan probe). Non-file sources (in-memory test frames) conservatively
    spread."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    est = scan_bytes_estimate(df)
    if est is not None and est // _max_partition_bytes(spark) >= target:
        return df
    return df.repartition(target)
