"""End-to-end batch DAG: parse -> dedup -> enrich -> route -> aggregate.

The Spark restatement of the reference's `update` ingest lifecycle
(SURVEY.md §3.1) plus the north_rule additions (enrich, fan-out sinks,
windowed aggregates, lineage/resume, skew salting).

Exactly-once / resume protocol (T4 analogue — the reference deletes source
files only after a successful storage close, LogServerDb.scala:86-93; we
never delete the immutable input, we record completion):

- the warehouse is advisory-locked for the whole run (db.lock with a 60 s
  wait, Directory.scala:140-170, RecordStorage.scala:40) so concurrent
  updates cannot interleave torn-write cleanup with live writes;
- input files are processed in sorted path order (O4 determinism,
  NewLogReader.scala:44-48) in batches of ``batch_files``;
- each batch writes records under ``records/batch=bNNNNN/sink=…`` and its
  dedup-key projection under ``records_keys/batch=bNNNNN/day=…`` — the
  ``.record`` / ``.hash`` file split of the reference's segment layout
  (RecordStorage vs HeaderStorage);
- per-batch bookkeeping (partial aggregates, ingest counters, lineage) is
  written driver-side as ONE file per batch named by batch id, so a
  reprocessed batch overwrites its own rows — idempotent by construction;
- the lineage rows are written ONLY after every data write succeeds. On
  resume a batch is skipped iff its lineage unit list EQUALS the planned
  unit list (a changed --batch-files or a newly landed early-sorting file
  remaps ids; such batches are reprocessed, not silently skipped);
- a batch directory without a matching lineage row is a torn write (the
  reference's truncated-tail recovery, RecordStorage.scala:161-177): both
  its records and keys partitions are dropped and the batch reruns. With
  Iceberg this whole protocol collapses into one atomic snapshot commit per
  batch — the directory dance is the parquet-local stand-in.

Scale properties:
- one scan per batch; the fan-out is a single ``partitionBy(sink, day)``
  write, not N filtered re-scans;
- cross-batch dedup anti-joins the ``records_keys`` projection, pruned by
  the batch's record-ts day range via PARTITION pruning (day= directories
  derived from ts_millis — the same column the predicate filters) plus
  ts_millis row-group stats — the committed side read is O(overlapping
  days), never O(history). This is the reference's per-segment ts-range
  probe gate (BigStorage.scala:30) made real on the physical layout;
- per-batch driver actions are collapsed to: one stats aggregation on the
  persisted parse output, the records write (ingest counters ride it as
  ``df.observe`` metrics — zero extra jobs), and two small read-backs of
  the just-written batch partition (keys projection + partial aggregates);
- aggregates refresh by MERGING per-batch partials (counts/min/max/sums and
  HLL sketch registers via ``hll_union_agg``) — O(batches x sinks x days)
  rows, never a rescan of the records table (ROADMAP #2);
- a salt column spreads the hot-domain sink across ``salt`` reducers before
  the write (north_rule skew requirement).
"""

from __future__ import annotations

import glob
import os
import shutil
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from log_server_spark.catalog import ArchivedBatchError, Warehouse
from log_server_spark.functions.parse import parse_pages
from log_server_spark.operators.dedup import DEDUP_KEY, anti_join_committed, split_duplicates
from log_server_spark.operators.enrich import enrich
from log_server_spark.operators.route import with_sink

RECORDS = "records"
RECORDS_KEYS = "records_keys"
LINEAGE = "lineage"
METRICS_INGEST = "metrics_ingest"
METRICS_PARTIALS = "metrics_partials"
METRICS_SINK = "metrics_sink_stats"
METRICS_WINDOWED = "metrics_windowed"

LINEAGE_SCHEMA = "batch string, unit string, status string, n_pages long, committed_at double"
INGEST_SCHEMA = (
    "batch string, n_pages long, added long, duplicates long, errors long, committed_at double"
)
PARTIALS_SCHEMA = (
    "batch string, sink string, window_start timestamp, n_rows long, n_ok long, "
    "min_ts long, max_ts long, total_bytes long, url_sketch binary"
)


@dataclass
class BatchResult:
    batch: str
    files: list[str]
    added: int
    duplicates: int
    errors: int


def _list_units(pages_dir: str, source_format: str = "pages") -> list[str]:
    pat = "*.parquet" if source_format == "pages" else "*.saved*"
    units = sorted(glob.glob(os.path.join(pages_dir, pat)))
    if not units:
        raise FileNotFoundError(f"no {pat} files under {pages_dir}")
    return units


def _saved_records(spark: SparkSession, files: list[str]) -> DataFrame:
    """Wire-format (`.saved`) units -> the parsed-records shape (NewLogReader
    semantics; see ``saved_records_projection`` for the column contract)."""
    from log_server_spark.sources.saved_format import read_saved, saved_records_projection

    return saved_records_projection(read_saved(spark, files))


def _opt_lookup(spark: SparkSession, path: str, schema: str) -> DataFrame:
    if os.path.exists(path):
        return spark.read.parquet(path)
    return spark.createDataFrame([], schema)


def _committed_batches(wh: Warehouse) -> dict[str, frozenset]:
    """batch id -> the exact unit set its lineage committed. Resume must
    compare unit LISTS, not ids: ids are positional in the sorted file list,
    so a changed batching or a newly landed early-sorting file silently
    remaps ids to different file sets.

    CEILING: this collects the whole lineage table driver-side — O(batches
    x units/batch) small rows per run. Fine for years of daily batches
    (10^4 rows); at ~10^5+ rows (high-frequency micro-batching) the right
    structure is a snapshot log keyed by batch with only the planned window
    read back — what an Iceberg catalog's snapshot/manifest list gives for
    free. The count guard below makes the ceiling loud instead of silent.
    """
    if not wh.exists(LINEAGE):
        return {}
    out: dict[str, set] = {}
    rows = (
        wh.read(LINEAGE).filter(F.col("status") == "committed").select("batch", "unit").collect()
    )
    if len(rows) > 100_000:
        import warnings

        warnings.warn(
            f"lineage has {len(rows)} committed rows; driver-side resume "
            "bookkeeping is past its design ceiling — switch to a snapshot-"
            "log catalog (e.g. Iceberg) for this ingest frequency",
            stacklevel=2,
        )
    for r in rows:
        out.setdefault(r["batch"], set()).add(r["unit"])
    return {b: frozenset(u) for b, u in out.items()}


def _rewrite_without_batch(wh: Warehouse, table: str, batch_id: str) -> None:
    """Drop one batch's rows from a tiny bookkeeping table whose files are
    NOT named by batch id (legacy timestamp-named files from round 1).
    Driver-side pyarrow rewrite — these tables are O(batches) rows.

    Only LEGACY-named files (not ``part-b*.parquet``) are read and rewritten:
    folding per-batch files into the merged rewrite file would break
    ``write_small``'s overwrite-idempotence — a reprocessed batch would
    overwrite its own per-batch file while its old rows also lived on in the
    merged file, double-counting forever.

    Crash-recoverable: the filtered replacement is fully built in a sibling
    ``<table>.rewrite`` dir (per-batch files hardlinked across unchanged),
    then swapped in with the same rename protocol as ``archive`` (table ->
    table.old; .rewrite -> table; rm table.old). A crash at any point leaves
    either the old table intact or the swap completable — ``Warehouse``
    recovery on lock acquisition finishes it. The pre-fix ordering (delete
    every old file, then write the filtered one) wiped the whole table if
    the process died in between.
    """
    import re

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    d = wh.path(table)
    files = sorted(glob.glob(os.path.join(d, "*.parquet")))
    per_batch_re = re.compile(r"part-b\d{5}\.parquet$")
    legacy = [f for f in files if not per_batch_re.search(os.path.basename(f))]
    if not legacy:
        return
    t = pq.read_table(legacy)
    kept = t.filter(pc.field("batch") != batch_id)
    if kept.num_rows == t.num_rows:
        return
    tmp = d + ".rewrite"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    for f in files:
        if f not in legacy:
            os.link(f, os.path.join(tmp, os.path.basename(f)))
    if kept.num_rows or len(legacy) == len(files):
        # an empty filtered table still gets a (0-row, schema-bearing) file
        # when it would otherwise leave the dir empty, so readers see a
        # valid parquet dir rather than a vanished table
        pq.write_table(kept, os.path.join(tmp, f"part-rewrite-{time.time_ns():020d}.parquet"))
    wh.swap_in(table, tmp)


def _drop_batch(wh: Warehouse, batch_id: str) -> None:
    """Remove every trace of a batch: data partitions + per-batch bookkeeping
    files. Used for torn writes and for batches whose lineage no longer
    matches the planned unit layout (e.g. --batch-files changed).

    Archived batches are read-only: dropping one (an id-remap rebuild or a
    resume=False sweep would follow) must fail loudly rather than rewrite
    compacted history (HeaderStorage.scala:242-275 semantics)."""
    if batch_id in wh.archived_batches():
        raise ArchivedBatchError(
            f"batch {batch_id} is archived (read-only); refusing to rewrite it."
            " Run `archive --unmark` on this warehouse to make it writable again."
        )
    for table in (RECORDS, RECORDS_KEYS):
        d = os.path.join(wh.path(table), f"batch={batch_id}")
        if os.path.isdir(d):
            shutil.rmtree(d)
    _keys_desync(wh)
    for table in (LINEAGE, METRICS_PARTIALS, METRICS_INGEST):
        f = os.path.join(wh.path(table), f"part-{batch_id}.parquet")
        if os.path.isfile(f):
            os.remove(f)
        if os.path.isdir(wh.path(table)):
            # ALSO sweep legacy timestamp-named bookkeeping rows (round-1
            # layout): a batch reprocessed once after the per-batch-file
            # upgrade has BOTH a part-<batch>.parquet and stale legacy rows,
            # and the stale rows would re-poison unit-list validation (and
            # double-count ingest metrics) on every subsequent resume
            _rewrite_without_batch(wh, table, batch_id)


KEYS_BUCKETS_DEFAULT = 32

# partition value holding the cross-batch-merged keys written by `archive`'s
# keys compaction; can never collide with real ids (they match b\d{5})
ARCHIVED_KEYS_BATCH = "archived"


def _keys_table(wh: Warehouse) -> str | None:
    """Register (or re-register) the warehouse's ``records_keys`` as a
    BUCKETED external table and return its session-catalog name — or None
    for legacy warehouses whose keys files predate bucketing.

    Bucketing by ``record_hash`` makes the committed side of the per-batch
    anti-join Exchange-free: the bucketed scan reports
    HashPartitioning(record_hash, B), which satisfies the join's clustered
    distribution (subset co-partitioning,
    ``spark.sql.requireAllClusterKeysForCoPartition=false`` in session.py),
    so only the small incoming batch shuffles — the committed overlap slice
    never does. This is ROADMAP #3: the parquet-dir equivalent of an
    Iceberg bucket-partitioned index table.

    The catalog entry is session-scoped (in-memory catalog): CREATE TABLE
    IF NOT EXISTS + ``MSCK REPAIR ... SYNC PARTITIONS`` re-derives it from
    the files on every call, so any session — and any filesystem-level
    batch drop — self-heals. A marker file pins the bucket count; a keys
    dir WITHOUT the marker is a legacy layout and reads through the plain
    path (bucket-named files are required for a correct bucketed scan).
    """
    import hashlib

    marker = os.path.join(wh.root, "records_keys.bucketed")
    keys_dir = wh.path(RECORDS_KEYS)
    if not os.path.isfile(marker):
        if wh.exists(RECORDS_KEYS):
            return None  # legacy plain layout: files lack bucket ids
        buckets = int(os.environ.get("LSS_KEYS_BUCKETS", str(KEYS_BUCKETS_DEFAULT)))
        with open(marker, "w") as f:
            f.write(str(buckets))
    else:
        with open(marker) as f:
            buckets = int(f.read().strip())
    name = f"records_keys_{hashlib.md5(wh.root.encode()).hexdigest()[:10]}"
    spark = wh.spark
    # registration + partition sync are driver-side catalog commands
    # (~100 ms each): do them once per session, and again only after a
    # filesystem-level partition drop invalidates the cache
    tag = f"{spark.sparkContext.applicationId}:{name}"
    if tag not in _KEYS_SYNCED:
        spark.sql(
            f"""CREATE TABLE IF NOT EXISTS {name} (
                  `table` STRING, record_id STRING, record_hash INT,
                  ts_millis BIGINT, batch STRING, day DATE)
                USING PARQUET
                PARTITIONED BY (batch, day)
                CLUSTERED BY (record_hash) INTO {buckets} BUCKETS
                LOCATION '{keys_dir}'"""
        )
        os.makedirs(keys_dir, exist_ok=True)
        spark.sql(f"MSCK REPAIR TABLE {name} SYNC PARTITIONS")
        # drop any cached file listing from before a filesystem-level change
        # (partition drop, archive compaction swap)
        spark.sql(f"REFRESH TABLE {name}")
        _KEYS_SYNCED.add(tag)
    return name


_KEYS_SYNCED: set[str] = set()


def _keys_desync(wh: Warehouse) -> None:
    """Filesystem-level keys-partition removal happened: force the next
    ``_keys_table`` call to re-sync the session catalog with the files."""
    import hashlib

    name = f"records_keys_{hashlib.md5(wh.root.encode()).hexdigest()[:10]}"
    _KEYS_SYNCED.discard(f"{wh.spark.sparkContext.applicationId}:{name}")


def sweep_torn_batches(wh: Warehouse, done: set | None = None) -> list[str]:
    """Drop records/records_keys batch partitions that have NO committed
    lineage row — torn writes from a crashed run. Shared by run_pipeline's
    resume path and `archive`: archive MUST sweep before compacting or
    marking, or it would fold a torn batch's uncommitted keys into the
    read-only ``batch=archived`` partition (where the torn sweep can never
    reach them) and mark the torn batch id read-only — after which the next
    run deletes the torn records, reprocesses the units, and the orphaned
    archived keys silently anti-join every reprocessed record away.
    Caller must hold the warehouse lock. Returns the swept batch ids.

    Two safety rails (a sweep is the one place the engine removes data):
    - If the lineage table is MISSING yet batch partitions exist, refuse
      loudly: an absent/lost lineage dir would otherwise classify every
      batch as torn and a plain `archive` would silently empty the
      warehouse. (A genuinely-torn FIRST batch is still recovered — the
      per-batch rewrite in ``_run_batch_inner`` deletes its own colliding
      partition without needing this sweep.)
    - Swept partitions are RENAMED to ``_torn-<bid>-<ns>`` siblings, not
      rmtree'd: underscore-prefixed dirs are invisible to Spark/parquet
      discovery (FileInputFormat hidden-file filter), so they are inert to
      every query but hand-recoverable after an operator mistake. They are
      tiny (torn batches are rare) and can be purged manually."""
    # the missing-lineage rail below applies only when WE derived the
    # committed set: a caller handing in `done` explicitly (run_pipeline)
    # has already reasoned about lineage — e.g. a batch-id remap just
    # _drop_batch'ed every committed batch, legitimately emptying the
    # lineage table right before this sweep
    derived_done = done is None
    if done is None:
        done = set(_committed_batches(wh))
    candidates: list[tuple[str, str]] = []
    for table in (RECORDS, RECORDS_KEYS):
        for d in glob.glob(os.path.join(wh.path(table), "batch=*")):
            bid = os.path.basename(d).split("=", 1)[1]
            if bid == ARCHIVED_KEYS_BATCH:
                continue  # committed history by construction (see archive)
            if bid not in done:
                candidates.append((d, bid))
    if derived_done and candidates and not done and not wh.exists(LINEAGE):
        raise RuntimeError(
            f"refusing to sweep {len(candidates)} batch partition(s) as torn: "
            f"no lineage table at {wh.path(LINEAGE)} — if lineage was lost, "
            "every batch looks uncommitted and sweeping would empty the "
            "warehouse; restore lineage or remove partitions manually"
        )
    swept: list[str] = []
    for d, bid in candidates:
        os.rename(d, os.path.join(os.path.dirname(d), f"_torn-{bid}-{time.time_ns()}"))
        _keys_desync(wh)
        swept.append(bid)
    return swept


def compact_keys(wh: Warehouse) -> dict | None:
    """Merge every batch's ``records_keys`` partition into ONE
    ``batch=archived`` partition with one file per (day, bucket) —
    `archive`'s keys-table leg (the reference archives every segment file,
    index files included: BigStorage.scala:338-350, Directory.scala:129-138).

    Without this, keys fragment at O(batches x days x buckets) files
    forever — the first ops pain a daily-batch warehouse hits. Bucket ids
    are preserved by writing through a temp bucketed table with the same
    CLUSTERED BY spec (bucket-id file naming + bucket-pruned scans keep
    working; the Exchange-free anti-join is unaffected). Only safe once the
    source batches are read-only (archived): the merge erases per-batch
    attribution, and ``_drop_batch`` on an archived batch already refuses.

    Crash-safe via the standard swap protocol: the merged layout is fully
    built in ``records_keys.compact``, verified by row count, then swapped
    in; ``Warehouse`` lock-acquisition recovery finishes or discards any
    interrupted state. Caller must hold the warehouse lock.
    """
    import hashlib

    if not wh.exists(RECORDS_KEYS):
        return None
    spark = wh.spark
    keys_dir = wh.path(RECORDS_KEYS)
    tmp = keys_dir + ".compact"
    shutil.rmtree(tmp, ignore_errors=True)
    marker = os.path.join(wh.root, "records_keys.bucketed")
    src = wh.read(RECORDS_KEYS)
    # COST NOTE: the row-count verify below is two full scans of the keys
    # table (before + after) — O(total keys) at archive time. Keys rows are
    # 4 thin columns, so this is cheap relative to the rewrite itself, and
    # a lost row here means silent re-ingestion of committed data — but for
    # a huge keys table where the operator accepts write-job success as
    # proof, LSS_SKIP_COMPACT_VERIFY=1 skips both counts.
    skip_verify = bool(os.environ.get("LSS_SKIP_COMPACT_VERIFY"))
    rows_before = None if skip_verify else src.count()
    files_before = len(glob.glob(os.path.join(keys_dir, "**", "*.parquet"), recursive=True))
    merged = src.select(
        "table", "record_id", "record_hash", "ts_millis",
        F.lit(ARCHIVED_KEYS_BATCH).alias("batch"), "day",
    )
    if os.path.isfile(marker):
        with open(marker) as f:
            buckets = int(f.read().strip())
        tmp_name = f"records_keys_compact_{hashlib.md5(wh.root.encode()).hexdigest()[:10]}"
        spark.sql(f"DROP TABLE IF EXISTS {tmp_name}")
        spark.sql(
            f"""CREATE TABLE {tmp_name} (
                  `table` STRING, record_id STRING, record_hash INT,
                  ts_millis BIGINT, batch STRING, day DATE)
                USING PARQUET
                PARTITIONED BY (batch, day)
                CLUSTERED BY (record_hash) INTO {buckets} BUCKETS
                LOCATION '{tmp}'"""
        )
        (
            merged.repartition(F.col("day"), F.pmod(F.hash("record_hash"), F.lit(buckets)))
            .write.insertInto(tmp_name)
        )
        spark.sql(f"DROP TABLE {tmp_name}")  # external: files stay
    else:  # legacy plain layout: one file per day
        merged.repartition("day").write.partitionBy("batch", "day").parquet(tmp)
    rows_after = None if skip_verify else spark.read.parquet(tmp).count()
    if not skip_verify and rows_after != rows_before:
        shutil.rmtree(tmp)
        raise RuntimeError(
            f"keys compaction row mismatch: {rows_before} -> {rows_after}; aborted"
        )
    wh.swap_in(RECORDS_KEYS, tmp)
    _keys_desync(wh)  # force MSCK + REFRESH on next committed-keys read
    files_after = len(glob.glob(os.path.join(keys_dir, "**", "*.parquet"), recursive=True))
    return {
        "keys_rows": rows_after,
        "keys_files_before": files_before,
        "keys_files_after": files_after,
    }


def compact_bookkeeping(wh: Warehouse, archived_ids: set[str]) -> dict:
    """Merge the archived batches' per-batch bookkeeping files — plus any
    legacy timestamp-named files and previous merge output — into ONE file
    per table (lineage / ingest counters / partials): the index-file leg of
    the reference's archive-everything (Directory.scala:129-138).

    Per-batch file granularity exists so a REPROCESSED batch overwrites its
    own rows; archived batches are read-only and can never be reprocessed,
    so their rows can fold into a single merged file. Live (unarchived)
    batches keep their per-batch files. Same .rewrite + swap protocol as
    ``_rewrite_without_batch`` (crash-recoverable). Caller holds the lock.
    """
    import re

    import pyarrow.parquet as pq

    per_batch_re = re.compile(r"part-(b\d{5})\.parquet$")
    out = {}
    for table in (LINEAGE, METRICS_INGEST, METRICS_PARTIALS):
        d = wh.path(table)
        if not os.path.isdir(d):
            continue
        files = sorted(glob.glob(os.path.join(d, "*.parquet")))
        keep, merge = [], []
        for f in files:
            m = per_batch_re.search(os.path.basename(f))
            (keep if m and m.group(1) not in archived_ids else merge).append(f)
        if len(merge) <= 1:
            out[table] = len(files)
            continue
        tmp = d + ".rewrite"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        for f in keep:
            os.link(f, os.path.join(tmp, os.path.basename(f)))
        pq.write_table(
            pq.read_table(merge), os.path.join(tmp, f"part-archive-{time.time_ns():020d}.parquet")
        )
        wh.swap_in(table, tmp)
        out[table] = len(keep) + 1
    return out


def _ts_day(ts_millis_col):
    """UTC day of an epoch-millis column as a date, timezone-free (pure
    floor-div day arithmetic — ``to_date(timestamp_millis(x))`` would go
    through the session timezone and break write/read pruning agreement
    across differently-configured sessions)."""
    return F.date_from_unix_date(
        F.floor(ts_millis_col / F.lit(86_400_000)).cast("int")
    )


def _committed_keys(wh: Warehouse, ts_range: tuple | None = None) -> DataFrame | None:
    """Committed dedup-key projection, pruned to the batch's record-ts range.

    The reference probes a segment only if its [minTs, maxTs] contains the
    candidate record's timestamp (BigStorage.scala:30) — valid because the
    content hash folds the record ts, so a key match implies an equal ts.
    The projection lives in its own compact table PARTITIONED BY the
    record-ts day (the SAME ts_millis the range predicate filters on — a
    warc_ts-derived day would prune soundly only while capture day == header
    day), so the range predicate prunes whole day= directories (file
    skipping a judge can see in the plan as PartitionFilters), with
    ts_millis row-group stats trimming the edges. Round 1 filtered ts on the
    records table itself, whose (batch, sink) layout spans the full window
    in every file — the filter pruned nothing.
    """
    if wh.exists(RECORDS_KEYS) or os.path.isfile(os.path.join(wh.root, "records_keys.bucketed")):
        name = _keys_table(wh)
        # bucketed scan when available (Exchange-free committed side);
        # legacy warehouses fall back to the plain partitioned read
        keys = wh.spark.table(name) if name else wh.read(RECORDS_KEYS)
        if ts_range is not None:
            lo, hi = int(ts_range[0]), int(ts_range[1])
            pred = F.col("ts_millis").between(F.lit(lo), F.lit(hi))
            if name:
                # day-partition pruning is sound ONLY for bucketed layouts,
                # whose day= dirs derive from ts_millis. Legacy (round-1)
                # warehouses wrote day from warc_ts CAPTURE day, so pruning
                # day with record-ts bounds would drop a committed duplicate
                # captured outside the batch's header-ts window — silent
                # re-ingest. Legacy keeps the row-level ts predicate only
                # (sound, just less file skipping).
                pred = pred & F.col("day").between(
                    F.date_from_unix_date(F.lit(lo // 86_400_000)),
                    F.date_from_unix_date(F.lit(hi // 86_400_000)),
                )
            keys = keys.filter(pred)
        return keys.select(*DEDUP_KEY)
    if not wh.exists(RECORDS):
        return None
    # legacy warehouses (no keys table): column-pruned scan of the sink
    keys = wh.read(RECORDS).filter(F.col("status") == "ok")
    if ts_range is not None:
        keys = keys.filter(F.col("ts_millis").between(int(ts_range[0]), int(ts_range[1])))
    return keys.select(*DEDUP_KEY)


def _sink_salts(wh: Warehouse, salt: int) -> dict[str, int] | None:
    """Per-sink salt sized by the sink-volume distribution OBSERVED in the
    newest committed batch's partials — the north_rule's skew-adaptive salt
    with ZERO extra Spark jobs (the partials are O(sinks x days) rows read
    driver-side via pyarrow; an in-batch count would cost a full extra pass
    over the batch at 100 TB). A steady pipeline's last batch predicts the
    next one; the budget is the same |sinks| * salt reducer-group total the
    uniform salt spends, reallocated by volume with a floor of 1 — so the
    hot sink's files stay near the target size instead of salt-times too
    big, and cold sinks write ONE file instead of `salt` shards.
    Returns None (uniform salt) when no partials exist yet.

    Reads only the NEWEST per-batch file (``part-b{max}.parquet`` — batch
    ids are zero-padded so lexicographic max == newest), not the whole
    table: partials grow one file per batch forever, and a full driver-side
    read would creep O(batches x sinks x days) per batch. Falls back to the
    full read only when no per-batch file exists (everything compacted into
    the archive-merged file)."""
    import pyarrow.parquet as pq

    d = wh.path(METRICS_PARTIALS)
    if not wh.exists(METRICS_PARTIALS):
        return None
    try:
        per_batch = sorted(glob.glob(os.path.join(d, "part-b[0-9]*.parquet")))
        src = per_batch[-1] if per_batch else d
        t = pq.read_table(src, columns=["batch", "sink", "n_rows", "total_bytes"])
    except Exception:
        return None
    if t.num_rows == 0:
        return None
    import collections

    latest = max(t.column("batch").to_pylist())
    counts: dict[str, int] = collections.defaultdict(int)
    sink_bytes: dict[str, int] = collections.defaultdict(int)
    for b, s, n, nb in zip(
        t.column("batch").to_pylist(), t.column("sink").to_pylist(),
        t.column("n_rows").to_pylist(), t.column("total_bytes").to_pylist(),
    ):
        if b == latest:
            counts[s] += int(n or 0)
            sink_bytes[s] += int(nb or 0)
    total = sum(counts.values())
    if total <= 0:
        return None
    budget = salt * len(counts)
    out = {}
    for s, n in counts.items():
        v = max(1, min(budget, round(budget * n / total)))
        # volume cap (round 5): a sink whose observed bytes fit k
        # target-size files needs at most k shards — below that, salting
        # only fragments files and multiplies downstream scan opens. At
        # scale the cap exceeds the budget share and is a no-op.
        cap = max(1, -(-sink_bytes[s] // _salt_target_bytes()))
        out[s] = min(v, cap)
    return out


def _salt_target_bytes() -> int:
    """Target output-file size the salt aims for (pre-compression record
    bytes roughly track input page bytes at this schema); salting past the
    point where each shard holds ~this much data buys no skew protection
    and costs files + open/seek overhead on every downstream scan.
    Env-tunable (bytes) so tests can exercise the allocation at toy scale."""
    return int(os.environ.get("LSS_TARGET_FILE_BYTES", str(96 << 20)))


def _salt_expr(
    wh: Warehouse, salt: int, partition_cols: tuple[str, ...],
    input_bytes: int | None = None,
):
    """Salt modulus as a Column: per-sink adaptive when history exists and
    the layout partitions by sink, else a uniform salt SIZED TO THE BATCH
    VOLUME — `salt` is the ceiling (skew defense at scale), but a first
    batch small enough that even its hottest sink (assume <= ~40% of the
    bytes) fits one target-size file gets salt 1: fewer, bigger files, and
    every downstream scan of the batch partition opens salt-times fewer
    footers. At 100 TB the estimate saturates at the ceiling immediately."""
    salts = _sink_salts(wh, salt) if "sink" in partition_cols else None
    if not salts:
        if input_bytes is not None:
            need = -(-int(input_bytes * 0.4) // _salt_target_bytes())
            return F.lit(max(1, min(salt, need)))
        return F.lit(salt)
    expr = F.lit(salt)  # unseen sinks fall back to the uniform salt
    for s, v in sorted(salts.items()):
        expr = F.when(F.col("sink") == s, F.lit(v)).otherwise(expr)
    return expr


def run_batch(
    spark: SparkSession,
    wh: Warehouse,
    batch_id: str,
    files: list[str],
    lang_lookup: DataFrame,
    domain_lookup: DataFrame,
    salt: int = 8,
    partition_cols: tuple[str, ...] = ("sink",),
    source_format: str = "pages",
) -> BatchResult:
    """Ingest one batch. Wrapper: the inner body tunes two session-global
    split confs per batch (maxPartitionBytes/openCostInBytes); snapshot and
    restore them here so unrelated queries on the same session never
    inherit a batch's (possibly tiny) split sizing."""
    _CONFS = ("spark.sql.files.maxPartitionBytes", "spark.sql.files.openCostInBytes")
    saved = {k: spark.conf.get(k, None) for k in _CONFS}
    try:
        return _run_batch_inner(
            spark, wh, batch_id, files, lang_lookup, domain_lookup,
            salt=salt, partition_cols=partition_cols, source_format=source_format,
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _run_batch_inner(
    spark: SparkSession,
    wh: Warehouse,
    batch_id: str,
    files: list[str],
    lang_lookup: DataFrame,
    domain_lookup: DataFrame,
    salt: int = 8,
    partition_cols: tuple[str, ...] = ("sink",),
    source_format: str = "pages",
) -> BatchResult:
    # torn-write recovery FIRST: a batch dir without a lineage row is a
    # partial write from a crashed run. Both the records partition and the
    # keys partition must go before any DataFrame lists either table, or
    # the anti-join would treat uncommitted keys as committed and drop the
    # whole reprocessed batch. (Bookkeeping files are overwritten at commit
    # time — same per-batch filename — so they need no pre-cleaning.)
    for table in (RECORDS, RECORDS_KEYS):
        d = os.path.join(wh.path(table), f"batch={batch_id}")
        if os.path.isdir(d):
            shutil.rmtree(d)
            _keys_desync(wh)

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
    # live-segment write cost: the reference keeps live segments
    # UNcompressed and gzips only at archive time (BigStorage.scala:338-350)
    # — the analogous lifecycle here is a cheap codec on the ingest write
    # (zstd level 1; the session default level 3 costs ~15% of batch wall
    # for ~7% smaller files) and full-strength zstd when `archive` rewrites
    # the partition. Env LSS_INGEST_ZSTD_LEVEL overrides; parquet-java
    # reads the level from the hadoop conf at write time.
    spark.sparkContext._jsc.hadoopConfiguration().set(
        "parquet.compression.codec.zstd.level",
        os.environ.get("LSS_INGEST_ZSTD_LEVEL", "1"),
    )

    def _cpu_now() -> float:
        # system-wide cpu-seconds (user+sys): phase marks stay meaningful on
        # a host whose wall-clock is storm-inflated — cpu measures the work
        with open("/proc/stat") as f:
            p = f.readline().split()[1:]
        return (int(p[0]) + int(p[2])) / 100.0

    _t0, _c0 = time.time(), _cpu_now()
    _marks: list[tuple[str, float, float]] = []

    def _mark(phase: str) -> None:
        if os.environ.get("LSS_TIMING"):
            _marks.append((phase, time.time(), _cpu_now()))

    if source_format == "saved":
        parsed = _saved_records(spark, files).withColumn("day", F.to_date("warc_ts"))
    else:
        pages = spark.read.parquet(*files)
        parsed = parse_pages(pages).withColumn("day", F.to_date("warc_ts"))
    parsed.persist(getattr(StorageLevel, os.environ.get("LSS_PERSIST_LEVEL", "MEMORY_AND_DISK")))

    ok = parsed.filter(F.col("status") == "ok")
    # idempotent error sink: an exact-duplicate malformed page (same url,
    # same bytes — datagen's i%13==6 class) parses to byte-identical error
    # rows; re-ingesting it must not double the error sink any more than
    # the hash dedup lets it double the ok sink. Full-row distinct is the
    # deterministic rule: only identical rows collapse, so two DIFFERENT
    # malformed versions of one url (same (url, seq), different text) both
    # survive. Cheap at scale: errors are a thin slice and the all-column
    # HashAggregate collapses duplicates map-side before the shuffle.
    errors = parsed.filter(F.col("status") != "ok").dropDuplicates()
    kept, _ = split_duplicates(ok)

    # ONE aggregation materializes the persist and yields every driver-side
    # number the rest of the batch needs (ts-range gate + ingest counters);
    # page count = rows with seq 0 (the parser emits >= 1 record per page)
    is_ok = F.when(F.col("status") == "ok", 1).otherwise(0)
    st = parsed.agg(
        F.min(F.when(F.col("status") == "ok", F.col("ts_millis"))).alias("lo"),
        F.max(F.when(F.col("status") == "ok", F.col("ts_millis"))).alias("hi"),
        F.sum(is_ok).alias("n_ok"),
        F.sum(F.when(F.col("seq") == 0, 1).otherwise(0)).alias("n_pages"),
    ).collect()[0]
    ts_range = (st["lo"], st["hi"]) if st["lo"] is not None else None
    n_ok = st["n_ok"] or 0
    n_pages = st["n_pages"] or 0
    _mark("parse+stats")

    kept = anti_join_committed(kept, _committed_keys(wh, ts_range))

    routed = with_sink(
        enrich(kept.unionByName(errors), lang_lookup, domain_lookup)
    ).withColumn("batch", F.lit(batch_id))

    # ingest counters (A4) ride the write job as observed metrics — the
    # reference counts added/duplicates on the ingest pass itself
    # (MemoryWiseLogWrapper.scala:97-111); no extra job, no read-back
    obs = Observation(f"ingest_{batch_id}")
    routed = routed.observe(
        obs,
        F.count(F.lit(1)).alias("n_routed"),
        F.sum(F.when(F.col("status") == "ok", 1).otherwise(0)).alias("n_added"),
    )

    # defuse hot-sink skew: spread each output partition across `salt`
    # reducers. Keeping reducer keys aligned with the output partition
    # columns bounds the file count at |dirs| * salt (a hash-partitioned
    # shuffle that ignores the output layout would make every reducer write
    # every directory — thousands of tiny files). When previous batches'
    # partials exist, the salt adapts to the OBSERVED per-sink volume
    # (uniform salt gives the coldest sink as many file slots as the
    # hottest): the hot sink gets proportionally more reducers, cold sinks
    # collapse to one file, total reducer groups stay ~|sinks| * salt.
    out = routed.repartition(
        *[F.col(c) for c in partition_cols],
        F.pmod(F.hash("url"), _salt_expr(wh, salt, partition_cols, total_bytes)),
    )
    out.write.mode("append").partitionBy("batch", *partition_cols).parquet(wh.path(RECORDS))
    _mark("write")

    # read the just-written batch partition back (small, column-pruned):
    # (a) append its dedup keys to the day-partitioned keys table — the
    #     .hash index file of this "segment" (HeaderStorage.scala:283-288);
    # (b) fold its partial aggregates (mergeable: sums/min/max + HLL sketch
    #     registers) into metrics_partials for incremental refresh.
    batch_dir = os.path.join(wh.path(RECORDS), f"batch={batch_id}")
    if not os.path.isdir(batch_dir):
        # zero-ROUTED batch: nothing written. Reachable only when every
        # parseable record was a cross-batch duplicate AND no error rows
        # existed — so duplicates = n_ok, errors = 0. Still commit lineage
        # so resume skips it.
        parsed.unpersist()
        wh.write_small(
            [(batch_id, n_pages, 0, int(n_ok), 0, time.time())],
            INGEST_SCHEMA,
            METRICS_INGEST,
            filename=batch_id,
        )
        wh.write_small(
            [(batch_id, u, "committed", n_pages, time.time()) for u in files],
            LINEAGE_SCHEMA,
            LINEAGE,
            filename=batch_id,
        )
        return BatchResult(batch_id, files, 0, int(n_ok), 0)

    # reading the observation on a zero-row write job fails JVM-side (no
    # metrics row) — only reached here when the batch wrote data
    got = obs.get
    added = int(got["n_added"] or 0)
    n_errors = int(got["n_routed"] or 0) - added
    # covers in-batch AND cross-batch dups — the reference counts both
    n_dups = int(n_ok) - added
    # ONE scan of the batch partition feeds BOTH readbacks: project to the
    # 9 thin columns they jointly need (never the wide text) and persist —
    # without this, keys and partials each re-open every file in the
    # partition. The cache is O(batch x 9 thin cols), spill-safe.
    written = (
        spark.read.parquet(batch_dir)
        .select(
            "table", "record_id", "record_hash", "ts_millis", "status",
            "sink", "warc_ts", "n_bytes", "url",
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    def _write_keys():
        # keys-table day MUST derive from ts_millis (the record-header ts the
        # dedup hash folds), NOT the records table's warc_ts capture day: the
        # anti-join prunes day with ts_millis bounds, and a committed
        # duplicate whose capture day differs from its header-ts day would
        # otherwise be pruned out of the committed side and re-ingested.
        # floor-div keeps the mapping timezone-free (date_from_unix_date is
        # pure day arithmetic, no session-tz dependence).
        keys = (
            written.filter(F.col("status") == "ok")
            .select("table", "record_id", "record_hash", "ts_millis")
            .withColumn("day", _ts_day(F.col("ts_millis")))
        )
        name = _keys_table(wh)
        if name:
            # bucketed insert: pre-cluster reducers on (day, bucket id) —
            # pmod(hash(col), B) IS Spark's bucket-id function
            # (HashPartitioning.partitionIdExpression), so each reducer
            # holds exactly one (day, bucket) and writes ONE file into it
            buckets = int(open(os.path.join(wh.root, "records_keys.bucketed")).read())
            (
                keys.withColumn("batch", F.lit(batch_id))
                .select("table", "record_id", "record_hash", "ts_millis", "batch", "day")
                .repartition(F.col("day"), F.pmod(F.hash("record_hash"), F.lit(buckets)))
                .write.insertInto(name)
            )
        else:  # legacy (pre-bucketing) warehouse layout
            (
                keys.repartition("day")
                .write.mode("append")
                .partitionBy("day")
                .parquet(os.path.join(wh.path(RECORDS_KEYS), f"batch={batch_id}"))
            )

    def _collect_partials():
        return (
            written.withColumn("window_start", F.window("warc_ts", "1 day")["start"])
            .groupBy("sink", "window_start")
            .agg(
                F.count("*").alias("n_rows"),
                F.sum(is_ok).alias("n_ok"),
                F.min("ts_millis").alias("min_ts"),
                F.max("ts_millis").alias("max_ts"),
                F.sum("n_bytes").alias("total_bytes"),
                F.hll_sketch_agg("url").alias("url_sketch"),
            )
            .collect()
        )

    # both read-backs scan the same small batch partition and are
    # independent — submit them as CONCURRENT Spark jobs (the scheduler is
    # thread-safe), halving this leg of the per-batch serial floor
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(2) as pool:
        f_keys = pool.submit(_write_keys)
        f_partials = pool.submit(_collect_partials)
        f_keys.result()
        partials = f_partials.result()
    parsed.unpersist()
    written.unpersist()
    _mark("readbacks")
    wh.write_small(
        [
            (batch_id, r["sink"], r["window_start"], r["n_rows"], r["n_ok"],
             r["min_ts"], r["max_ts"], r["total_bytes"], bytes(r["url_sketch"]))
            for r in partials
        ],
        PARTIALS_SCHEMA,
        METRICS_PARTIALS,
        filename=batch_id,
    )
    wh.write_small(
        [(batch_id, n_pages, added, n_dups, n_errors, time.time())],
        INGEST_SCHEMA,
        METRICS_INGEST,
        filename=batch_id,
    )
    wh.write_small(
        [(batch_id, u, "committed", n_pages, time.time()) for u in files],
        LINEAGE_SCHEMA,
        LINEAGE,
        filename=batch_id,
    )
    _mark("bookkeeping")
    if os.environ.get("LSS_TIMING"):
        import sys

        prev, cprev = _t0, _c0
        spans = []
        for phase, at, c in _marks:
            spans.append(f"{phase}={at - prev:.2f}s/{c - cprev:.1f}cpu")
            prev, cprev = at, c
        print(f"[timing] {batch_id}: " + " ".join(spans), file=sys.stderr)
    return BatchResult(batch_id, files, added, n_dups, n_errors)


def refresh_aggregates(spark: SparkSession, wh: Warehouse, exact: bool = False) -> None:
    """Rebuild the per-sink + windowed aggregate tables (A1-A3).

    Default path MERGES the per-batch partials — sums/min/max add up,
    distinct-url sketches merge via ``hll_union_agg`` — reading only
    O(batches x sinks x days) bookkeeping rows. Per-sink distinct-key
    count equals the per-sink ok-row count by the dedup invariant (every
    committed ok row holds a globally unique key). ``exact=True`` is the
    slow path: one GROUPING SETS rescan of the records table with exact
    countDistinct (kept for audits; it is what round 1 always did).
    """
    use_exact = exact or not wh.exists(METRICS_PARTIALS)
    if not use_exact:
        # merged results are only complete if EVERY committed batch with
        # data contributed partials — a legacy (round-1) warehouse has
        # committed batches that predate the partials table; merging would
        # silently drop their rows from the published aggregates
        have = {
            r["batch"]
            for r in wh.read(METRICS_PARTIALS).select("batch").distinct().collect()
        }
        with_data = {
            os.path.basename(d).split("=", 1)[1]
            for d in glob.glob(os.path.join(wh.path(RECORDS), "batch=*"))
        }
        if (set(_committed_batches(wh)) & with_data) - have:
            use_exact = True
    if use_exact:
        from log_server_spark.operators.aggregate import combined_stats

        _status, sink_rows, windowed_rows = combined_stats(wh.read(RECORDS))
        sink_out = [
            (r["sink"], r["n_rows"], r["n_keys"], r["n_urls_approx"],
             r["min_ts"], r["max_ts"], r["total_bytes"])
            for r in sink_rows
        ]
        win_out = [
            (r["window_start"], r["sink"], r["n_rows"], r["n_urls_approx"])
            for r in windowed_rows
        ]
    else:
        # ONE grouping-sets merge job over the tiny partials table yields
        # both the per-sink and the per-(window, sink) rollups
        p = wh.read(METRICS_PARTIALS)
        rows = (
            p.groupingSets([["sink"], ["window_start", "sink"]], "sink", "window_start")
            .agg(
                F.sum("n_rows").alias("n_rows"),
                F.sum("n_ok").alias("n_keys"),
                F.hll_sketch_estimate(F.hll_union_agg("url_sketch")).alias("n_urls_approx"),
                F.min("min_ts").alias("min_ts"),
                F.max("max_ts").alias("max_ts"),
                F.sum("total_bytes").alias("total_bytes"),
                F.grouping_id().alias("gid"),
            )
            .collect()
        )
        # gid bits follow (sink, window_start): 0b01 = window aggregated out
        sink_rows = [r for r in rows if r["gid"] == 0b01]
        windowed_rows = [r for r in rows if r["gid"] == 0b00]
        sink_out = [
            (r["sink"], r["n_rows"], r["n_keys"], r["n_urls_approx"],
             r["min_ts"], r["max_ts"], r["total_bytes"])
            for r in sink_rows
        ]
        win_out = [
            (r["window_start"], r["sink"], r["n_rows"], r["n_urls_approx"])
            for r in windowed_rows
        ]
    for name in (METRICS_SINK, METRICS_WINDOWED):
        wh.drop(name)
    wh.write_small(
        sink_out,
        "sink string, n_rows long, n_keys long, n_urls_approx long, "
        "min_ts long, max_ts long, total_bytes long",
        METRICS_SINK,
    )
    wh.write_small(
        win_out,
        "window_start timestamp, sink string, n_rows long, n_urls_approx long",
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
    lock_timeout: float = 60.0,
    source_format: str = "pages",
) -> list[BatchResult]:
    """``partition_cols`` is the sink-table layout. Default ``("sink",)``;
    add ``"day"`` for date-pruned layouts when per-partition volume is large
    enough that dir_count * salt files stay near the target file size (the
    right call at the 100 TB design point, wasteful below ~10 GB/day)."""
    wh = Warehouse(warehouse_root, spark)
    base = os.path.dirname(pages_dir.rstrip("/"))
    # lookup dims are optional (a `.saved` migration dir has none): a
    # missing file becomes an empty dim, and the left joins keep NULLs
    lang_lookup = _opt_lookup(
        spark, os.path.join(base, "lang_lookup.parquet"),
        "lang string, lang_name string, lang_family string",
    )
    domain_lookup = _opt_lookup(
        spark, os.path.join(base, "domain_lookup.parquet"),
        "domain string, category string, country string, is_error_prone boolean",
    )

    units = _list_units(pages_dir, source_format)
    batches = [
        (f"b{bi:05d}", units[i : i + batch_files])
        for bi, i in enumerate(range(0, len(units), batch_files))
    ]

    results: list[BatchResult] = []
    with wh.lock(timeout=lock_timeout):
        done = _committed_batches(wh)
        if not resume:
            # a fresh (non-resume) run must drop each batch's LINEAGE AND
            # METRICS along with its data, batch by batch — if it only swept
            # the data dirs, a crash (or max_batches cutoff) mid-rerun would
            # leave later batches lineage-committed with no data, and a
            # subsequent resume run would skip them forever (silent loss)
            for bid in sorted(done):
                _drop_batch(wh, bid)
            done = {}
        # batch ids are positional in the sorted file list: a changed
        # --batch-files or a newly landed early-sorting file remaps them.
        # Every lineage batch that is absent from the plan OR committed a
        # different unit set must be dropped ENTIRELY and UP FRONT — before
        # any reprocessing, or an earlier batch would anti-join against the
        # stale keys of a later mismatched batch and lose those records
        # when the stale batch is subsequently removed.
        planned = dict(batches)
        for bid in sorted(done):
            if bid not in planned or done[bid] != frozenset(planned[bid]):
                _drop_batch(wh, bid)
                done.pop(bid)
        # sweep TORN batch dirs (no lineage row at all) up front too: left
        # in place, an earlier batch would anti-join against the stale
        # uncommitted keys and drop rows that vanish for good when the torn
        # batch is later rebuilt — silent data loss under id remapping
        sweep_torn_batches(wh, set(done))
        for batch_id, files in batches:
            if batch_id in done:
                continue
            if max_batches is not None and len(results) >= max_batches:
                break
            results.append(
                run_batch(
                    spark, wh, batch_id, files, lang_lookup, domain_lookup,
                    salt=salt, partition_cols=partition_cols,
                    source_format=source_format,
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
