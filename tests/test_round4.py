"""Round-4 regressions: VERDICT r3 items #3/#6/#7 and the ADVICE r3 fixes
(legacy keys-day prune soundness, saved-format truncation errors, sliced-
array _ascii_mask, per-user native cache)."""

import glob
import os
import struct
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from log_server_spark.catalog import Warehouse
from log_server_spark.datagen import gen_domain_lookup, gen_lang_lookup
from log_server_spark.plans.pipeline import RECORDS, RECORDS_KEYS, run_pipeline


# ---------------------------------------------------------------------------
# VERDICT #3: no unconditional broadcast on the LSH verify candidate side
# ---------------------------------------------------------------------------


def test_lsh_verify_no_forced_broadcast(spark, tmp_path):
    from log_server_spark.operators.dedup_text import minhash_lsh_pairs

    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog " + ("x" * (i % 3)))
         for i in range(20)],
        "id long, text string",
    )
    pairs = minhash_lsh_pairs(docs, "id", "text")
    analyzed = pairs._jdf.queryExecution().analyzed().toString()
    # a broadcast() hint survives analysis as ResolvedHint — its absence
    # means AQE is free to pick every join strategy by observed size (the
    # round-4 verify consumes `candidates` once via a pair-doc explode, so
    # there is no candidate-id side to hint at all)
    assert "ResolvedHint" not in analyzed
    assert "UnresolvedHint" not in analyzed


# ---------------------------------------------------------------------------
# VERDICT #7: query construction must not force RDD conversions
# ---------------------------------------------------------------------------


def test_spread_small_input_file_gated(spark, tmp_path):
    from log_server_spark.plan_util import scan_bytes_estimate, spread_small_input

    p = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table({"id": pa.array(range(100), pa.int64()),
                  "text": pa.array(["hello world"] * 100)}),
        p,
    )
    df = spark.read.parquet(p)
    est = scan_bytes_estimate(df)
    assert est is not None and 0 < est < (1 << 20)
    target = spark.sparkContext.defaultParallelism
    spread = spread_small_input(df)
    assert spread.rdd.getNumPartitions() == target  # test-side probe only
    # in-memory frames (no backing files) conservatively spread too
    mem = spark.createDataFrame([(1, "a")], "id long, text string")
    assert scan_bytes_estimate(mem) is None
    assert spread_small_input(mem).rdd.getNumPartitions() == target


def test_no_rdd_probe_in_query_construction():
    """The plan-construction RDD probe (df.rdd.getNumPartitions) must stay
    out of query-building code — it forces an RDD conversion per build and
    bypasses AQE (VERDICT r3 what's-wrong #3)."""
    import inspect

    import log_server_spark.operators.dedup_text as dt
    import log_server_spark.queries_graft as qg

    for mod in (dt, qg):
        src = inspect.getsource(mod)
        assert ".rdd" not in src, f"{mod.__name__} still probes df.rdd"


# ---------------------------------------------------------------------------
# ADVICE: legacy (pre-bucketing) warehouses must not day-prune with
# record-ts bounds over capture-day partitions
# ---------------------------------------------------------------------------


def _write_pages_unit(path, rows):
    pq.write_table(
        pa.table({
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us", tz="UTC")),
            "html": pa.array([r[2].encode() for r in rows], pa.binary()),
            "text": pa.array([r[2] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
        }),
        path,
    )


@pytest.mark.slow
def test_legacy_warehouse_skips_unsound_day_prune(spark, tmp_path_factory):
    """Simulate a round-1 warehouse whose records_keys day= partitions were
    written from the CAPTURE day: the committed duplicate must still be
    caught even though its (wrong) day partition lies outside the new
    batch's record-ts window."""
    base = str(tmp_path_factory.mktemp("r4_legacy"))
    pages = os.path.join(base, "pages")
    os.makedirs(pages)
    html = "---- 2024-03-01 10:00:00 level:INFO table:users id:7 op:create\nhello body"
    _write_pages_unit(
        os.path.join(pages, "part-00000.parquet"),
        [("https://a.example.com/p/1", datetime(2024, 5, 15, tzinfo=timezone.utc), html)],
    )
    _write_pages_unit(
        os.path.join(pages, "part-00001.parquet"),
        [
            ("https://a.example.com/p/1b", datetime(2024, 6, 20, tzinfo=timezone.utc), html),
            (
                "https://a.example.com/p/2",
                datetime(2024, 6, 20, tzinfo=timezone.utc),
                "---- 2024-03-02 11:00:00 level:INFO table:users id:8 op:create\nother body",
            ),
        ],
    )
    pq.write_table(gen_lang_lookup(), os.path.join(base, "lang_lookup.parquet"))
    pq.write_table(gen_domain_lookup(), os.path.join(base, "domain_lookup.parquet"))

    wh_dir = str(tmp_path_factory.mktemp("r4_legacy_wh"))
    r1 = run_pipeline(spark, pages, wh_dir, batch_files=1, max_batches=1)
    assert r1[0].added == 1
    wh = Warehouse(wh_dir, spark)

    # doctor the warehouse into the round-1 legacy layout: no bucketing
    # marker, keys day= partition named by the CAPTURE day (2024-05-15),
    # not the record-header day (2024-03-01)
    os.remove(os.path.join(wh_dir, "records_keys.bucketed"))
    from log_server_spark.plans.pipeline import _keys_desync

    _keys_desync(wh)
    spark.sql("DROP TABLE IF EXISTS " + _legacy_keys_name(wh_dir))
    batch_dirs = glob.glob(os.path.join(wh.path(RECORDS_KEYS), "batch=*"))
    assert len(batch_dirs) == 1
    day_dirs = glob.glob(os.path.join(batch_dirs[0], "day=*"))
    assert len(day_dirs) == 1 and day_dirs[0].endswith("day=2024-03-01")
    os.rename(day_dirs[0], os.path.join(batch_dirs[0], "day=2024-05-15"))

    r2 = run_pipeline(spark, pages, wh_dir, batch_files=1)
    assert len(r2) == 1
    assert r2[0].added == 1, "only the genuinely new record"
    assert r2[0].duplicates == 1, "legacy dup caught despite capture-day partitions"
    ok = wh.read(RECORDS).filter(F.col("status") == "ok")
    assert ok.count() == 2


def _legacy_keys_name(root: str) -> str:
    import hashlib

    return f"records_keys_{hashlib.md5(root.encode()).hexdigest()[:10]}"


# ---------------------------------------------------------------------------
# VERDICT #4: archive compacts the keys table + bookkeeping files
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_archive_compacts_keys_and_bookkeeping(spark, tmp_path_factory, monkeypatch):
    from log_server_spark.cli import main as cli_main
    from log_server_spark.datagen import write_dataset
    from log_server_spark.operators.dedup import DEDUP_KEY, anti_join_committed
    from log_server_spark.plans.pipeline import (
        LINEAGE,
        METRICS_INGEST,
        METRICS_PARTIALS,
        _committed_batches,
        _committed_keys,
    )

    monkeypatch.setenv("LSS_KEYS_BUCKETS", "4")
    data = str(tmp_path_factory.mktemp("r4_arc_data"))
    write_dataset(data, seed=13, n=400, num_files=4)
    pages = os.path.join(data, "pages")
    wh_dir = str(tmp_path_factory.mktemp("r4_arc_wh"))
    run_pipeline(spark, pages, wh_dir, batch_files=1)
    wh = Warehouse(wh_dir, spark)

    keys_cols = ["table", "record_id", "record_hash", "ts_millis", "day"]
    before_keys = {tuple(r) for r in wh.read(RECORDS_KEYS).select(*keys_cols).collect()}
    before_records = {
        tuple(r) for r in wh.read(RECORDS).select("url", "seq", "table", "record_id").collect()
    }
    before_lineage = _committed_batches(wh)
    expected_files = (
        wh.read(RECORDS_KEYS)
        .select("day", F.pmod(F.hash("record_hash"), F.lit(4)).alias("b"))
        .distinct()
        .count()
    )
    n_days = wh.read(RECORDS_KEYS).select("day").distinct().count()

    rc = cli_main(["archive", "--warehouse", wh_dir])
    assert rc == 0

    # keys: single batch=archived partition, one file per (day, bucket)
    batch_dirs = glob.glob(os.path.join(wh.path(RECORDS_KEYS), "batch=*"))
    assert [os.path.basename(d) for d in batch_dirs] == ["batch=archived"]
    files = glob.glob(os.path.join(wh.path(RECORDS_KEYS), "**", "*.parquet"), recursive=True)
    # exactly ONE file per populated (day, bucket) — i.e. days x buckets
    # once every bucket has data; empty (day, bucket) pairs write nothing
    assert len(files) == expected_files
    assert n_days < len(files) <= n_days * 4
    # keys rows byte-identical
    after_keys = {tuple(r) for r in wh.read(RECORDS_KEYS).select(*keys_cols).collect()}
    assert after_keys == before_keys
    # bookkeeping: one merged file per table, same lineage content
    for table in (LINEAGE, METRICS_INGEST, METRICS_PARTIALS):
        fs = glob.glob(os.path.join(wh.path(table), "*.parquet"))
        assert len(fs) == 1, (table, fs)
    assert _committed_batches(wh) == before_lineage

    # the anti-join stays Exchange-free on the compacted committed side
    lo, hi = (
        wh.read(RECORDS_KEYS).agg(F.min("ts_millis"), F.max("ts_millis")).collect()[0]
    )
    committed = _committed_keys(wh, (lo, hi))
    batch = wh.read(RECORDS).filter(F.col("status") == "ok").select(*DEDUP_KEY)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            anti_join_committed(batch, committed)
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    assert "Bucketed: true" in plan
    assert plan.count("Exchange") == 1, plan

    # cross-batch dedup against ARCHIVED keys still works: a late-landing
    # unit that clones unit 0 must dedup 100% against the merged partition
    import shutil as _sh

    _sh.copyfile(
        os.path.join(pages, sorted(os.listdir(pages))[0]),
        os.path.join(pages, "part-99999.parquet"),
    )
    res = run_pipeline(spark, pages, wh_dir, batch_files=1)
    assert len(res) == 1
    assert res[0].added == 0, "every parseable record is an archived duplicate"
    assert res[0].duplicates > 0
    # records table content for the original batches unchanged
    after_records = {
        tuple(r)
        for r in wh.read(RECORDS)
        .filter(F.col("batch") != res[0].batch)
        .select("url", "seq", "table", "record_id")
        .collect()
    }
    assert after_records == before_records


# ---------------------------------------------------------------------------
# ADVICE: saved-format truncation must raise the guard-style ValueError
# ---------------------------------------------------------------------------


def test_decode_saved_truncation_is_valueerror():
    from log_server_spark.sources.saved_format import decode_saved_bytes, encode_saved

    data = encode_saved([("users", 7, 1_700_000_000_000, "hello")])
    # cut mid-record at several byte positions: every truncation inside the
    # record body must surface as the wrapped ValueError, never a raw
    # IndexError / struct.error
    for cut in range(5, len(data) - 1):
        with pytest.raises(ValueError, match="Truncated record|Empty log|Empty tableName"):
            decode_saved_bytes("t.saved", data[:cut])
    # version-only file decodes to zero records (not an error)
    assert decode_saved_bytes("t.saved", struct.pack(">i", 2)) == []


@pytest.mark.slow
def test_archive_sweeps_torn_batches_before_compacting(spark, tmp_path_factory):
    """A torn (lineage-less) batch must be swept by `archive`, not folded
    into batch=archived or marked read-only — otherwise its orphaned keys
    would anti-join the reprocessed records away after the torn records are
    deleted (self-review finding, round 4)."""
    import shutil as _sh

    from log_server_spark.cli import main as cli_main
    from log_server_spark.datagen import write_dataset

    data = str(tmp_path_factory.mktemp("r4_torn_data"))
    write_dataset(data, seed=31, n=200, num_files=2)
    pages = os.path.join(data, "pages")
    wh_dir = str(tmp_path_factory.mktemp("r4_torn_wh"))
    run_pipeline(spark, pages, wh_dir, batch_files=1)
    wh = Warehouse(wh_dir, spark)
    committed_keys = wh.read(RECORDS_KEYS).count()
    want_records = {
        tuple(r) for r in wh.read(RECORDS).select("url", "seq", "table", "record_id").collect()
    }

    # fabricate a torn batch: data + keys dirs, NO lineage row
    for table in (RECORDS, RECORDS_KEYS):
        src = os.path.join(wh.path(table), "batch=b00001")
        _sh.copytree(src, os.path.join(wh.path(table), "batch=b00099"))

    rc = cli_main(["archive", "--warehouse", wh_dir])
    assert rc == 0
    # torn batch swept, not archived, not folded into the merged keys
    assert "b00099" not in wh.archived_batches()
    assert not os.path.isdir(os.path.join(wh.path(RECORDS), "batch=b00099"))
    assert not os.path.isdir(os.path.join(wh.path(RECORDS_KEYS), "batch=b00099"))
    assert wh.read(RECORDS_KEYS).count() == committed_keys
    # and the warehouse contents are exactly the committed rows
    got = {
        tuple(r) for r in wh.read(RECORDS).select("url", "seq", "table", "record_id").collect()
    }
    assert got == want_records
    # a subsequent resume run has nothing to redo and loses nothing
    assert run_pipeline(spark, pages, wh_dir, batch_files=1) == []
    assert wh.read(RECORDS).count() == len(want_records)


# ---------------------------------------------------------------------------
# north_rule skew salt: adaptive per-sink reducer counts from partials
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_adaptive_salt_reallocates_files_by_sink_volume(spark, tmp_path_factory, monkeypatch):
    """Batch 2+ sizes its salt from batch 1's observed per-sink volumes:
    cold sinks collapse to one file, the hot sink gets more than the
    uniform salt, total rows and dedup results unchanged.

    Round 5 added a volume cap (per-sink salt <= bytes/target-file-size);
    shrink the target so the cap stays above the budget allocation and the
    REALLOCATION logic is what this test exercises — test_round5 covers
    the cap itself."""
    from log_server_spark.datagen import write_dataset
    from log_server_spark.plans.pipeline import _sink_salts

    monkeypatch.setenv("LSS_TARGET_FILE_BYTES", "64")

    data = str(tmp_path_factory.mktemp("r4_salt_data"))
    write_dataset(data, seed=21, n=600, num_files=2)
    pages = os.path.join(data, "pages")
    wh_dir = str(tmp_path_factory.mktemp("r4_salt_wh"))
    # batch 1: no history -> uniform salt
    run_pipeline(spark, pages, wh_dir, batch_files=1, max_batches=1, salt=4)
    wh = Warehouse(wh_dir, spark)
    salts = _sink_salts(wh, 4)
    assert salts, "partials from batch 1 drive batch 2's salt"
    total_budget = 4 * len(salts)
    assert sum(salts.values()) <= total_budget + len(salts)
    assert min(salts.values()) >= 1
    # volumes are skewed, so at least one sink must exceed the uniform salt
    # and at least one must collapse below it
    assert max(salts.values()) > 4 and min(salts.values()) < 4

    run_pipeline(spark, pages, wh_dir, batch_files=1, salt=4)
    # per-sink file counts of batch 2 respect the adaptive allocation
    import collections

    files_by_sink = collections.Counter()
    for f in glob.glob(os.path.join(wh.path(RECORDS), "batch=b00001", "sink=*", "*.parquet")):
        files_by_sink[os.path.basename(os.path.dirname(f)).split("=", 1)[1]] += 1
    for s, n_files in files_by_sink.items():
        assert n_files <= salts.get(s, 4), (s, n_files, salts.get(s))
    # row content is unaffected by the physical salt
    n = spark.read.parquet(os.path.join(wh.path(RECORDS), "batch=b00001")).count()
    assert n > 0


# ---------------------------------------------------------------------------
# VERDICT #8: streaming `.saved` source == batch `--format saved`
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_streaming_saved_source_matches_batch(spark, tmp_path):
    """Incrementally landed `.saved`/`.saved.gz` files drained by the
    streaming source (checkpointed across two availableNow runs, dedup state
    retained) must produce exactly the records the batch
    ``update --format saved`` path ingests — T2/T3 for the wire-format
    migration path (LogWriterClient.scala:26-27 rotation contract)."""
    from log_server_spark.sources.saved_format import write_saved
    from log_server_spark.streaming.stream_pipeline import start_saved_ingest

    ts0 = 1_700_000_000_000
    saved_dir = tmp_path / "in"
    os.makedirs(saved_dir)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    recs_a = [("users", i, ts0 + i * 1_000, f"row a{i}") for i in range(50)]
    write_saved(str(saved_dir / "unit-00000.saved"), recs_a)
    q = start_saved_ingest(spark, str(saved_dir), out, ckpt, available_now=True)
    q.awaitTermination(180)

    # second rotation lands later: gz branch + one exact cross-file duplicate
    recs_b = [("orders", f"u{i}", ts0 + i * 777, f"row b{i}") for i in range(30)]
    recs_b.append(recs_a[0])
    write_saved(str(saved_dir / "unit-00001.saved.gz"), recs_b)
    q = start_saved_ingest(spark, str(saved_dir), out, ckpt, available_now=True)
    q.awaitTermination(180)

    cols = ["url", "table", "record_id", "ts_millis", "text", "record_hash"]
    stream_rows = {tuple(r) for r in spark.read.parquet(out).select(*cols).collect()}

    wh_dir = str(tmp_path / "wh")
    run_pipeline(spark, str(saved_dir), wh_dir, batch_files=1, source_format="saved")
    batch_rows = {
        tuple(r)
        for r in Warehouse(wh_dir, spark)
        .read(RECORDS)
        .filter(F.col("status") == "ok")
        .select(*cols)
        .collect()
    }
    assert len(stream_rows) == 50 + 30  # duplicate dropped by streaming dedup
    assert stream_rows == batch_rows


# ---------------------------------------------------------------------------
# near-dup clustering: pairs -> connected components -> keepers
# ---------------------------------------------------------------------------


def test_components_from_pairs_chain_and_singletons(spark):
    """Pointer-jumping label propagation must collapse a chain whose
    diameter (19) far exceeds the round count (6 rounds -> 2^6): the jump
    step is what makes that possible. Singletons keep themselves."""
    from log_server_spark.operators.dedup_text import components_from_pairs

    ids = spark.createDataFrame([(i,) for i in range(30)], "id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(19)]  # chain 0..19
        + [(25, 27), (27, 29)],  # small triangle-ish component
        "id_a long, id_b long",
    )
    got = {r["node"]: r["lbl"] for r in components_from_pairs(ids, pairs).collect()}
    assert all(got[i] == 0 for i in range(20))
    assert got[25] == got[27] == got[29] == 25
    for i in (20, 21, 22, 23, 24, 26, 28):
        assert got[i] == i


@pytest.mark.slow
def test_components_from_pairs_random_graphs_vs_union_find(spark):
    """Randomized oracle: min-label components must equal a driver-side
    union-find on arbitrary sparse graphs (multiple seeds, isolated nodes,
    self-contained chains/cycles/cliques arise naturally)."""
    import random

    from log_server_spark.operators.dedup_text import components_from_pairs

    rng = random.Random(20260819)
    for _trial in range(3):
        n = rng.randint(10, 50)
        m = rng.randint(0, n)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        edges = [(a, b) for a, b in edges if a != b]
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {i: find(i) for i in range(n)}
        # canonicalize to min-of-component
        comp_min: dict[int, int] = {}
        for i in range(n):
            r = find(i)
            comp_min[r] = min(comp_min.get(r, i), i)
        want = {i: comp_min[find(i)] for i in range(n)}

        ids = spark.createDataFrame([(i,) for i in range(n)], "id long")
        pdf = spark.createDataFrame(edges or [(0, 0)], "id_a long, id_b long")
        if not edges:
            pdf = pdf.filter("id_a <> id_a")  # empty edge set
        got = {r["node"]: r["lbl"] for r in components_from_pairs(ids, pdf).collect()}
        assert got == want, (n, sorted(edges))


# ---------------------------------------------------------------------------
# Streaming parity widening: .saved -> records sink -> session stage chain
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_streaming_saved_chain_to_sessions(spark, tmp_path):
    """The wire-format stream composes with the stage-2 sessionizer through
    a committed file sink: `.saved` files -> start_saved_ingest (records
    sink with _spark_metadata commit log) -> start_record_sessions, all
    availableNow, exactly-once across the chain."""
    from log_server_spark.sources.saved_format import write_saved
    from log_server_spark.streaming.stream_pipeline import (
        start_record_sessions,
        start_saved_ingest,
    )

    ts0 = 1_700_000_000_000
    saved_dir = tmp_path / "in"
    os.makedirs(saved_dir)
    records_dir = str(tmp_path / "records")
    # two "domains" (tables don't matter to the sessionizer: key is
    # xxhash64(domain), and the saved projection sets domain="") — all
    # records share one key here; gaps in capture ts split sessions
    recs = [("users", i, ts0 + i * 60_000, f"r{i}") for i in range(5)]
    recs += [("users", 100 + i, ts0 + 3_600_000 * 3 + i * 60_000, f"s{i}") for i in range(4)]
    write_saved(str(saved_dir / "unit-00000.saved"), recs)
    q = start_saved_ingest(spark, str(saved_dir), records_dir, str(tmp_path / "ck1"), available_now=True)
    q.awaitTermination(180)

    out_dir = str(tmp_path / "sessions")
    q = start_record_sessions(
        spark, records_dir, out_dir, str(tmp_path / "ck2"),
        watermark="30 minutes", available_now=True,
    )
    q.awaitTermination(180)
    sessions = spark.read.parquet(out_dir).collect()
    # the first burst (5 events, 1-min gaps) closed in-batch when the
    # 3-hour-later burst opened a new session past the 30-min gap
    assert len(sessions) >= 1
    s = min(sessions, key=lambda r: r["session_start"])
    assert s["n_events"] == 5
    assert s["session_end"] - s["session_start"] == 4 * 60_000


# ---------------------------------------------------------------------------
# ADVICE: _ascii_mask over sliced arrays
# ---------------------------------------------------------------------------


def test_ascii_mask_sliced_array():
    from log_server_spark.functions.parse_vec import _ascii_mask

    arr = pa.array(["café".encode("utf-8"), b"plain", b"ascii"], pa.binary())
    sliced = arr.slice(1)  # high bytes now live BEFORE offs[0] in the buffer
    mask = _ascii_mask(sliced)
    assert mask.tolist() == [True, True]
    # and a slice that drops a trailing non-ASCII row (bytes past offs[-1])
    arr2 = pa.array([b"head", "façade".encode("utf-8")], pa.binary())
    assert _ascii_mask(arr2.slice(0, 1)).tolist() == [True]
    # unsliced behavior unchanged
    assert _ascii_mask(arr).tolist() == [False, True, True]


# ---------------------------------------------------------------------------
# ADVICE: per-user native kernel cache
# ---------------------------------------------------------------------------


def test_native_cache_is_per_user_and_owned(tmp_path, monkeypatch):
    import log_server_spark.functions._native as native

    monkeypatch.setenv("LSS_NATIVE_DIR", str(tmp_path / "cache"))
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", False)
    fn = native.native_murmur3_rows()
    if fn is None:
        pytest.skip("no C compiler available")
    d = tmp_path / "cache"
    assert (d.stat().st_mode & 0o777) == 0o700
    assert d.stat().st_uid == os.getuid()
    # known-vector sanity through the freshly built kernel
    from log_server_spark.functions.hashing import murmur3_32

    buf = np.frombuffer(b"hello", dtype=np.uint8)
    offs = np.array([0], dtype=np.int64)
    lens = np.array([5], dtype=np.int64)
    out = np.zeros(1, dtype=np.int32)
    fn(buf.ctypes.data, offs.ctypes.data, lens.ctypes.data, 1, 0, out.ctypes.data)
    assert int(out[0]) == murmur3_32(b"hello", 0)
