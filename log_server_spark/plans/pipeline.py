"""End-to-end batch DAG: parse -> dedup -> enrich -> route -> aggregate.

The Spark restatement of the reference's `update` ingest lifecycle
(SURVEY.md §3.1) plus the north_rule additions (enrich, fan-out sinks,
windowed aggregates, lineage/resume, skew salting).

Exactly-once / resume protocol (T4 analogue — the reference deletes source
files only after a successful storage close, LogServerDb.scala:86-93; we
never delete the immutable input, we record completion):

- input files are processed in sorted path order (O4 determinism,
  NewLogReader.scala:44-48) in batches of ``batch_files``;
- each batch writes under ``records/batch=bNNNNN/sink=…/day=…``; the batch id
  is a pure function of position in the sorted file list, so a rerun targets
  the same directory;
- the lineage table is appended ONLY after the batch's records write
  succeeds. On resume, batches present in lineage are skipped; a batch
  directory without a lineage row is a torn write (the reference's
  truncated-tail recovery, RecordStorage.scala:161-177) and is dropped and
  reprocessed. With Iceberg this whole protocol collapses into one atomic
  snapshot commit per batch — the directory dance is the parquet-local stand-in.

Scale properties:
- one scan per batch; the fan-out is a single ``partitionBy(sink, day)``
  write, not N filtered re-scans;
- cross-batch dedup reads a 3-column projection of the sink (column-pruned
  scan) and anti-joins with AQE skew handling on;
- a salt column spreads the hot-domain sink across ``salt`` reducers before
  the write (north_rule skew requirement).
"""

from __future__ import annotations

import glob
import os
import shutil
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from log_server_spark.catalog import Warehouse
from log_server_spark.functions.parse import parse_pages
from log_server_spark.operators.dedup import DEDUP_KEY, anti_join_committed, split_duplicates
from log_server_spark.operators.enrich import enrich
from log_server_spark.operators.route import with_sink

RECORDS = "records"
LINEAGE = "lineage"
METRICS_INGEST = "metrics_ingest"
METRICS_SINK = "metrics_sink_stats"
METRICS_WINDOWED = "metrics_windowed"

LINEAGE_SCHEMA = "batch string, unit string, status string, n_pages long, committed_at double"


@dataclass
class BatchResult:
    batch: str
    files: list[str]
    added: int
    duplicates: int
    errors: int


def _list_units(pages_dir: str) -> list[str]:
    units = sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))
    if not units:
        raise FileNotFoundError(f"no parquet files under {pages_dir}")
    return units


def _committed_batches(wh: Warehouse) -> set[str]:
    if not wh.exists(LINEAGE):
        return set()
    return {
        r["batch"]
        for r in wh.read(LINEAGE).filter(F.col("status") == "committed").select("batch").distinct().collect()
    }


def _committed_keys(wh: Warehouse, ts_range: tuple | None = None) -> DataFrame | None:
    """Committed dedup-key projection, pruned to the batch's record-ts range.

    The reference probes a segment only if its [minTs, maxTs] contains the
    candidate record's timestamp (BigStorage.scala:30) — valid because the
    content hash folds the record ts, so a key match implies (up to the same
    int32-collision tolerance the reference accepts) an equal ts. At 10^12
    committed keys this range predicate reaches the parquet/Iceberg scan as
    row-group/file skipping, so each batch anti-joins only the overlapping
    slice of key history instead of all of it.
    """
    if not wh.exists(RECORDS):
        return None
    keys = wh.read(RECORDS).filter(F.col("status") == "ok")
    if ts_range is not None:
        keys = keys.filter(
            (F.col("ts_millis") >= F.lit(int(ts_range[0])))
            & (F.col("ts_millis") <= F.lit(int(ts_range[1])))
        )
    return keys.select(*DEDUP_KEY)


def run_batch(
    spark: SparkSession,
    wh: Warehouse,
    batch_id: str,
    files: list[str],
    lang_lookup: DataFrame,
    domain_lookup: DataFrame,
    salt: int = 8,
    partition_cols: tuple[str, ...] = ("sink",),
) -> BatchResult:
    # torn-write recovery FIRST: a batch dir without a lineage row is a
    # partial write from a crashed run. It must be dropped before any
    # DataFrame lists the records table, or the lazy scan will reference
    # deleted files (and the anti-join would treat uncommitted rows as
    # committed, dropping the whole reprocessed batch).
    batch_dir = os.path.join(wh.path(RECORDS), f"batch={batch_id}")
    if os.path.isdir(batch_dir):
        shutil.rmtree(batch_dir)

    # split sizing: the parse stage is python-bound, so the scan must yield
    # >= ~3 tasks per core or cores sit idle (the 128 MB default + 4 MB
    # open-cost packs small files into a handful of splits). Runtime SQL
    # confs, so this tunes per batch without session restart; on a real
    # cluster with ~1 GB input files the default would already be fine.
    total_bytes = sum(os.path.getsize(f) for f in files)
    target_tasks = spark.sparkContext.defaultParallelism * 3
    split = max(1 << 20, min(128 << 20, total_bytes // max(1, target_tasks)))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))
    spark.conf.set("spark.sql.files.openCostInBytes", str(256 << 10))

    pages = spark.read.parquet(*files)
    parsed = parse_pages(pages).withColumn("day", F.to_date("warc_ts"))
    parsed.persist(getattr(StorageLevel, os.environ.get("LSS_PERSIST_LEVEL", "MEMORY_AND_DISK")))

    ok = parsed.filter(F.col("status") == "ok")
    errors = parsed.filter(F.col("status") != "ok")

    kept, _ = split_duplicates(ok)
    # batch ts range (one tiny agg on the persisted parse output) gates the
    # committed-keys scan, mirroring the reference's per-segment ts probe
    ts_row = ok.agg(F.min("ts_millis").alias("lo"), F.max("ts_millis").alias("hi")).collect()[0]
    ts_range = (ts_row["lo"], ts_row["hi"]) if ts_row["lo"] is not None else None
    kept = anti_join_committed(kept, _committed_keys(wh, ts_range))

    routed = with_sink(
        enrich(kept.unionByName(errors), lang_lookup, domain_lookup)
    ).withColumn("batch", F.lit(batch_id))

    # defuse hot-sink skew: spread each output partition across `salt`
    # reducers. Keeping reducer keys aligned with the output partition
    # columns bounds the file count at |dirs| * salt (a hash-partitioned
    # shuffle that ignores the output layout would make every reducer write
    # every directory — thousands of tiny files).
    out = routed.repartition(
        *[F.col(c) for c in partition_cols], F.pmod(F.hash("url"), F.lit(salt))
    )

    out.write.mode("append").partitionBy("batch", *partition_cols).parquet(wh.path(RECORDS))

    # ingest counters (A4) — one column-pruned read-back of the written batch
    written = wh.read(RECORDS).filter(F.col("batch") == batch_id)
    status_counts = {
        r["status"]: r["n"]
        for r in written.groupBy("status").agg(F.count("*").alias("n")).collect()
    }
    counts = {
        "added": status_counts.get("ok", 0),
        "errors": sum(n for s, n in status_counts.items() if s != "ok"),
    }
    # duplicates = parseable records minus survivors (covers in-batch AND
    # cross-batch dups — the reference counts both, MemoryWiseLogWrapper:97-111)
    n_dups = ok.count() - counts.get("added", 0)
    n_pages = pages.count()
    parsed.unpersist()

    wh.write_small(
        [(batch_id, n_pages, counts.get("added", 0), n_dups, counts.get("errors", 0), time.time())],
        "batch string, n_pages long, added long, duplicates long, errors long, committed_at double",
        METRICS_INGEST,
    )
    wh.write_small(
        [(batch_id, u, "committed", n_pages, time.time()) for u in files],
        LINEAGE_SCHEMA,
        LINEAGE,
    )
    return BatchResult(batch_id, files, counts.get("added", 0), n_dups, counts.get("errors", 0))


def refresh_aggregates(spark: SparkSession, wh: Warehouse) -> None:
    """Recompute per-sink + windowed aggregate tables from the sink (A1-A3).

    One GROUPING SETS aggregation (single scan + shuffle) feeds both tables;
    results are tiny and written driver-side.
    """
    from log_server_spark.operators.aggregate import combined_stats

    _status, sink_rows, windowed_rows = combined_stats(wh.read(RECORDS))
    for name in (METRICS_SINK, METRICS_WINDOWED):
        wh.drop(name)
    wh.write_small(
        [
            (r["sink"], r["n_rows"], r["n_urls"], r["n_urls_approx"], r["n_keys"],
             r["min_ts"], r["max_ts"], r["total_bytes"])
            for r in sink_rows
        ],
        "sink string, n_rows long, n_urls long, n_urls_approx long, n_keys long, "
        "min_ts long, max_ts long, total_bytes long",
        METRICS_SINK,
    )
    wh.write_small(
        [
            (r["window_start"], r["sink"], r["n_rows"], r["n_urls"], r["n_urls_approx"])
            for r in windowed_rows
        ],
        "window_start timestamp, sink string, n_rows long, n_urls long, n_urls_approx long",
        METRICS_WINDOWED,
    )


def run_pipeline(
    spark: SparkSession,
    pages_dir: str,
    warehouse_root: str,
    batch_files: int = 4,
    salt: int = 8,
    resume: bool = True,
    aggregates: bool = True,
    partition_cols: tuple[str, ...] = ("sink",),
    max_batches: int | None = None,
) -> list[BatchResult]:
    """``partition_cols`` is the sink-table layout. Default ``("sink",)``;
    add ``"day"`` for date-pruned layouts when per-partition volume is large
    enough that dir_count * salt files stay near the target file size (the
    right call at the 100 TB design point, wasteful below ~10 GB/day)."""
    wh = Warehouse(warehouse_root, spark)
    base = os.path.dirname(pages_dir.rstrip("/"))
    lang_lookup = spark.read.parquet(os.path.join(base, "lang_lookup.parquet"))
    domain_lookup = spark.read.parquet(os.path.join(base, "domain_lookup.parquet"))

    units = _list_units(pages_dir)
    batches = [
        (f"b{bi:05d}", units[i : i + batch_files])
        for bi, i in enumerate(range(0, len(units), batch_files))
    ]
    done = _committed_batches(wh) if resume else set()

    results: list[BatchResult] = []
    for batch_id, files in batches:
        if batch_id in done:
            continue
        if max_batches is not None and len(results) >= max_batches:
            break
        results.append(
            run_batch(
                spark, wh, batch_id, files, lang_lookup, domain_lookup,
                salt=salt, partition_cols=partition_cols,
            )
        )
    if aggregates and (results or wh.exists(RECORDS)):
        refresh_aggregates(spark, wh)
    return results


if __name__ == "__main__":
    import argparse

    from log_server_spark.session import get_spark

    ap = argparse.ArgumentParser(description="parse→enrich→route→aggregate DAG")
    ap.add_argument("--pages-dir", help="dir of pages parquet parts")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--generate", type=int, default=0, help="generate N synthetic pages first")
    ap.add_argument("--data-dir", default="/tmp/lss_data")
    ap.add_argument("--batch-files", type=int, default=4)
    ap.add_argument("--salt", type=int, default=8)
    ap.add_argument("--master", default=None)
    a = ap.parse_args()

    pages_dir = a.pages_dir
    if a.generate:
        from log_server_spark.datagen import write_dataset

        write_dataset(a.data_dir, n=a.generate)
        pages_dir = os.path.join(a.data_dir, "pages")

    sp = get_spark(master=a.master, app_name="lss-pipeline")
    res = run_pipeline(sp, pages_dir, a.warehouse, batch_files=a.batch_files, salt=a.salt)
    for r in res:
        print(f"{r.batch}: added={r.added} duplicates={r.duplicates} errors={r.errors}")
    sp.stop()
