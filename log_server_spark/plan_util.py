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


def _scan_files_bytes(df: DataFrame) -> tuple[int | None, int | None]:
    """(total bytes | None, file count | None) of the files backing a plan.
    (None, None) for non-file sources; (None, count) when the files exist
    but their sizes aren't locally stat-able (s3a://, hdfs:// — every
    non-local URI from ``df.inputFiles()``). Driver metadata only (the
    scan's FileIndex listing) — NO RDD conversion, no Spark job, and unlike
    ``df.rdd.getNumPartitions()`` it does not bypass AQE on the frame."""
    try:
        uris = df.inputFiles()
    except Exception:
        return None, None
    if not uris:
        return None, None
    total = 0
    for uri in uris:
        p = unquote(urlparse(uri).path) if "://" in uri or uri.startswith("file:") else uri
        try:
            total += os.path.getsize(p)
        except OSError:
            # sizes unavailable (object-store URI, moved file): the caller
            # still learns the file COUNT — a lower bound on scan splits
            return None, len(uris)
    return total, len(uris)


def scan_bytes_estimate(df: DataFrame) -> int | None:
    """Total size of the files backing a plan, or None for non-file sources."""
    return _scan_files_bytes(df)[0]


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

    Only spreads when the estimate AFFIRMATIVELY says the input is small:
    when sizes are unavailable (object-store URIs — the 100 TB case), file
    count is a lower bound on splits, so >= target files means no-op; an
    unconditional repartition there would be a full shuffle of a large
    input plus a partition-count collapse.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    total, n_files = _scan_files_bytes(df)
    if total is not None:
        mpb = _max_partition_bytes(spark)
        est_splits = (total + n_files * _open_cost_bytes(spark) + mpb - 1) // mpb
        if est_splits >= target:
            return df
    elif n_files is not None and n_files >= target:
        return df
    return df.repartition(target)
