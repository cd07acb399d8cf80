"""Command-line surface mirroring the reference CLI (SURVEY.md §3).

Reference commands (src/com/github/winmain/logserver/Cmd.scala:10-43) and
their equivalents here:

| reference | here | notes |
|---|---|---|
| ``update <db> <paths...>`` | ``update --warehouse W --pages-dir P`` | batched ingest with dedup + lineage resume |
| ``get <db> <table> <id>`` | ``get --warehouse W --table T --id I`` | point lookup, ts-ordered, JSON output |
| ``info <db>`` | ``info --warehouse W`` | per-(sink, day) segment stats |
| ``archive <db>`` | ``archive --warehouse W`` | compact each sink partition's files (the gzip-segments analogue: fewer, larger, compressed files flipped to a read-optimized layout) |
| ``convert-month/-year`` | the parse stage itself | legacy-format parse runs inside ``update`` (S3) |

Run via ``python -m log_server_spark.cli <cmd> ...`` or spark-submit (see
packaging notes in README).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _session(master):
    """getOrCreate, remembering whether the CLI owns the session (it must
    not stop a session an embedding process created)."""
    from pyspark.sql import SparkSession

    from log_server_spark.session import get_spark

    existing = SparkSession.getActiveSession()
    if existing is not None:
        return existing, False
    return get_spark(master=master, app_name="lss-cli"), True


def cmd_update(args) -> int:
    from log_server_spark.plans.pipeline import run_pipeline

    spark, owned = _session(args.master)
    results = run_pipeline(
        spark, args.pages_dir, args.warehouse,
        batch_files=args.batch_files, salt=args.salt,
        source_format=getattr(args, "format", "pages"),
    )
    for r in results:
        print(f"{r.batch}: added={r.added} duplicates={r.duplicates} errors={r.errors}")
    if not results:
        print("nothing to do (all batches committed)")
    if owned:
        spark.stop()
    return 0


def cmd_get(args) -> int:
    """Point lookup; repeat --warehouse for the reference's multi-year
    fan-out (GetCommand.scala:29-36: years.map(get).reduce(++) — a bag
    union across databases, results globally ts-sorted)."""
    from functools import reduce

    from log_server_spark.operators.lookup import get_records, to_json_records

    spark, owned = _session(args.master)
    parts = [
        get_records(spark.read.parquet(os.path.join(w, "records")), args.table, args.id)
        for w in args.warehouse
    ]
    unioned = reduce(lambda a, b: a.unionByName(b), parts).orderBy("ts_millis")
    for row in to_json_records(unioned).collect():
        print(row["json"])
    if owned:
        spark.stop()
    return 0


def cmd_info(args) -> int:
    from log_server_spark.operators.aggregate import info

    spark, owned = _session(args.master)
    records = spark.read.parquet(os.path.join(args.warehouse, "records"))
    total = 0
    for row in info(records).collect():
        total += row["records"]
        print(
            f"{row['sink']}/{row['day']}: records={row['records']} "
            f"hashes={row['hashes']} minTs={row['min_ts']} maxTs={row['max_ts']}"
        )
    print(f"total: {total}")
    if owned:
        spark.stop()
    return 0


def cmd_archive(args) -> int:
    """Compact the records table: rewrite each (batch, sink) partition's
    small files into ~target-size files. The parquet-local stand-in for
    Iceberg ``rewrite_data_files`` / the reference's gzip-and-mark-readonly
    (BigStorage.scala:338-350)."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from log_server_spark.catalog import Warehouse

    spark, owned = _session(args.master)
    wh = Warehouse(args.warehouse, spark)  # also recovers a crashed prior swap
    if getattr(args, "unmark", None) is not None:
        ids = args.unmark or sorted(wh.archived_batches())
        left = wh.mark_archived(ids, unmark=True)
        print(json.dumps({"unmarked": sorted(ids), "still_archived": sorted(left)}))
        if owned:
            spark.stop()
        return 0
    records_dir = os.path.join(args.warehouse, "records")
    old_dir = records_dir + ".old"
    tmp_dir = records_dir + ".compact"
    # archive is where compression strength belongs (the reference keeps
    # live segments uncompressed and gzips at archive time,
    # BigStorage.scala:338-350): the ingest write uses zstd level 1 for
    # wall speed, the compaction rewrite pays for density once
    spark.sparkContext._jsc.hadoopConfiguration().set(
        "parquet.compression.codec.zstd.level",
        os.environ.get("LSS_ARCHIVE_ZSTD_LEVEL", "6"),
    )
    with wh.lock():
        # sweep TORN batches FIRST: a crashed run's lineage-less batch dir
        # must never be compacted into batch=archived or marked read-only —
        # its orphaned keys would anti-join the reprocessed records away
        # while the torn records themselves get deleted (data loss)
        from log_server_spark.plans.pipeline import sweep_torn_batches

        swept = sweep_torn_batches(wh)
        shutil.rmtree(tmp_dir, ignore_errors=True)
        df = spark.read.parquet(records_dir)
        n_before = len(glob.glob(os.path.join(records_dir, "**", "*.parquet"), recursive=True))
        rows_before = df.count()
        (
            df.repartition(F.col("batch"), F.col("sink"))
            .write.mode("overwrite")
            .partitionBy("batch", "sink", *(["day"] if "day" in df.columns and args.by_day else []))
            .parquet(tmp_dir)
        )
        rows_after = spark.read.parquet(tmp_dir).count()
        if rows_after != rows_before:
            shutil.rmtree(tmp_dir)
            print(f"ABORT: row count mismatch {rows_before} -> {rows_after}", file=sys.stderr)
            if owned:
                spark.stop()
            return 1
        # atomic-enough swap: records is never absent without records.old
        # present, so a crash at any point is recoverable (Warehouse.__init__
        # restores or discards records.old)
        os.rename(records_dir, old_dir)
        os.rename(tmp_dir, records_dir)
        shutil.rmtree(old_dir)
        # compacted layout is history: flip every batch read-only so a later
        # update with remapped ids fails loudly instead of rewriting it
        # (the reference's archive gzips segments AND marks them readOnly)
        archived: list[str] = []
        keys_stats = book_stats = None
        if not getattr(args, "no_mark", False):
            archived = sorted(
                os.path.basename(d).split("=", 1)[1]
                for d in glob.glob(os.path.join(records_dir, "batch=*"))
            )
            wh.mark_archived(archived)
            # archive EVERYTHING, index files included (BigStorage.scala:
            # 338-350): merge the now-read-only batches' keys partitions to
            # one file per (day, bucket) and their bookkeeping to one file
            # per table. Skipped under --no-mark: merging erases per-batch
            # attribution, which is only sound for read-only batches.
            from log_server_spark.plans.pipeline import compact_bookkeeping, compact_keys

            keys_stats = compact_keys(wh)
            book_stats = compact_bookkeeping(wh, set(archived))
    n_after = len(glob.glob(os.path.join(records_dir, "**", "*.parquet"), recursive=True))
    print(
        json.dumps(
            {
                "files_before": n_before,
                "files_after": n_after,
                "rows": rows_after,
                "archived": archived,
                "swept_torn": swept,
                "keys": keys_stats,
                "bookkeeping": book_stats,
            }
        )
    )
    if owned:
        spark.stop()
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="log-server-spark", description=__doc__)
    ap.add_argument("--master", default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("update", help="ingest pages: parse, dedup, enrich, route, aggregate")
    p.add_argument("--warehouse", required=True)
    p.add_argument("--pages-dir", required=True)
    p.add_argument("--batch-files", type=int, default=4)
    p.add_argument("--salt", type=int, default=8)
    p.add_argument(
        "--format", choices=["pages", "saved"], default="pages",
        help="input units: parquet pages tables, or reference-wire .saved files",
    )
    p.set_defaults(fn=cmd_update)

    p = sub.add_parser("get", help="point lookup: all records for (table, id)")
    p.add_argument(
        "--warehouse", required=True, action="append",
        help="repeat for multi-warehouse (multi-year) bag-union fan-out",
    )
    p.add_argument("--table", required=True)
    p.add_argument("--id", required=True)
    p.set_defaults(fn=cmd_get)

    p = sub.add_parser("info", help="per-(sink, day) segment statistics")
    p.add_argument("--warehouse", required=True)
    p.set_defaults(fn=cmd_info)

    p = sub.add_parser("archive", help="compact sink files (gzip-segments analogue)")
    p.add_argument("--warehouse", required=True)
    p.add_argument("--by-day", action="store_true")
    p.add_argument(
        "--no-mark", action="store_true",
        help="skip marking compacted batches read-only",
    )
    p.add_argument(
        "--unmark", nargs="*", metavar="BATCH",
        help="make batches writable again (no ids = all) and exit",
    )
    p.set_defaults(fn=cmd_archive)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
