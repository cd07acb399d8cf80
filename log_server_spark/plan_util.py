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


def _scan_files_bytes(df: DataFrame) -> tuple[int, int] | None:
    """(total bytes, file count) of the files backing a plan, or None for
    non-file sources. Driver metadata only (the scan's FileIndex listing) —
    NO RDD conversion, no Spark job, and unlike
    ``df.rdd.getNumPartitions()`` it does not bypass AQE on the frame."""
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
    return total, len(uris)


def scan_bytes_estimate(df: DataFrame) -> int | None:
    """Total size of the files backing a plan, or None for non-file sources."""
    r = _scan_files_bytes(df)
    return None if r is None else r[0]


def _open_cost_bytes(spark) -> int:
    raw = spark.conf.get("spark.sql.files.openCostInBytes", str(4 << 20))
    s = raw.strip().lower()
    if s.endswith("b"):
        s = s[:-1]
    try:
        return int(s)
    except ValueError:
        return 4 << 20


def spread_small_input(df: DataFrame) -> DataFrame:
    """Small-input / heavy-compute guard: a corpus that fits one parquet
    split would run downstream interpreted/Python-heavy work on ONE core.
    Repartition up to the session parallelism only when the file-size
    estimate says the scan yields fewer splits than cores; at real scale the
    scan already has >= cores partitions and this is a no-op (no shuffle,
    no plan probe). The split estimate mirrors Spark's file packing:
    ceil((total + n_files * openCost) / maxPartitionBytes) — per-file open
    cost is what keeps many-small-file scans from collapsing into one
    split. Non-file sources (in-memory test frames) conservatively spread.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    r = _scan_files_bytes(df)
    if r is not None:
        total, n_files = r
        mpb = _max_partition_bytes(spark)
        est_splits = (total + n_files * _open_cost_bytes(spark) + mpb - 1) // mpb
        if est_splits >= target:
            return df
    return df.repartition(target)
