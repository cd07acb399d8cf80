"""End-to-end DAG tests: dedup semantics, routing, resume/idempotence.

Mirrors the reference's integration golden test structure
(LogServerSpecInt.scala:19-106) and recovery matrix (BigStorageTest).
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from log_server_spark.catalog import Warehouse
from log_server_spark.datagen import gen_pages, write_dataset
from log_server_spark.parse_ref import OK, parse_page
from log_server_spark.plans.pipeline import (
    LINEAGE,
    METRICS_INGEST,
    RECORDS,
    run_pipeline,
)

N = 1500
SEED = 42


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("lss_data")
    write_dataset(str(d), seed=SEED, n=N, num_files=6)
    return str(d)


@pytest.fixture(scope="module")
def warehouse(spark, dataset, tmp_path_factory):
    whdir = str(tmp_path_factory.mktemp("lss_wh"))
    results = run_pipeline(spark, os.path.join(dataset, "pages"), whdir, batch_files=2)
    return Warehouse(whdir, spark), results


def _expected_records(rows_per_batch=500):
    """Driver-side reference computation: global first-wins dedup for ok
    rows; per-batch full-row distinct for error rows (the idempotent error
    sink, round 5 — an exact-duplicate malformed page re-ingested in the
    same batch writes ONE error row; across batches both copies land).
    ``rows_per_batch`` mirrors the module fixture: num_files=6 over N=1500
    pages -> 250 rows/file, batch_files=2 -> 500 consecutive rows/batch."""
    tbl = gen_pages(seed=SEED, n=N)
    seen = set()
    ok_kept, dups, errors = [], 0, 0
    err_seen: set = set()
    rows = list(zip(tbl["url"].to_pylist(), tbl["warc_ts"].to_pylist(), tbl["html"].to_pylist()))
    # pipeline order: files sorted, rows in file order == generation order
    for i, (url, wts, html) in enumerate(rows):
        if i % rows_per_batch == 0:
            err_seen = set()
        for r in parse_page(html):
            if r.status != OK:
                # every parse-output column is a function of (url, wts,
                # html, seq) — this tuple IS the full-row identity
                k = (url, wts, html, r.seq)
                if k not in err_seen:
                    err_seen.add(k)
                    errors += 1
                continue
            key = (r.table, r.record_id or "", r.text.encode("utf-8"), r.ts_millis)
            if key in seen:
                dups += 1
            else:
                seen.add(key)
                ok_kept.append((url, r.seq, r.table, r.record_id or "", r.ts_millis))
    return ok_kept, dups, errors


@pytest.mark.slow
def test_dedup_and_error_counts_match_reference(spark, warehouse):
    wh, results = warehouse
    ok_kept, dups, errors = _expected_records()
    records = wh.read(RECORDS)
    assert records.filter(F.col("status") == "ok").count() == len(ok_kept)
    assert records.filter(F.col("status") != "ok").count() == errors
    assert sum(r.duplicates for r in results) == dups
    assert sum(r.added for r in results) == len(ok_kept)


def test_first_wins_keeps_earliest_and_versions_kept(spark, warehouse):
    wh, _ = warehouse
    ok_kept, _, _ = _expected_records()
    got = {
        (r["table"], r["record_id"], r["ts_millis"], r["seq"]): r["url"]
        for r in wh.read(RECORDS).filter(F.col("status") == "ok").collect()
    }
    # every reference-kept record present, with the first-seen url winning
    want = {}
    for url, seq, table, rid, ts in ok_kept:
        want.setdefault((table, rid, ts, seq), url)
    for k, url in want.items():
        assert k in got
    # same-key different-content versions are all kept: keys with >1 ts
    from collections import Counter

    per_key = Counter((t, r) for t, r, _, _ in want)
    assert any(v > 1 for v in per_key.values()), "fixture should contain same-key versions"


def test_routing_total_and_error_sink(spark, warehouse):
    wh, _ = warehouse
    records = wh.read(RECORDS)
    n_total = records.count()
    sinks = {r["sink"]: r["n"] for r in records.groupBy("sink").agg(F.count("*").alias("n")).collect()}
    assert sum(sinks.values()) == n_total  # exactly one sink per row
    _, _, errors = _expected_records()
    assert sinks.get("error", 0) == errors
    assert records.filter((F.col("status") != "ok") & (F.col("sink") != "error")).count() == 0
    assert any(s.startswith("lang_") for s in sinks)
    assert any(s.startswith("cat_") for s in sinks)


def test_enrichment_broadcast_nulls_for_missing_domains(spark, warehouse):
    wh, _ = warehouse
    records = wh.read(RECORDS)
    # every 10th domain is absent from domain_lookup -> NULL category rows exist
    assert records.filter(F.col("category").isNull()).count() > 0
    known = records.filter(F.col("category").isNotNull())
    assert known.count() > 0


def test_resume_noop_when_committed(spark, warehouse, dataset):
    wh, _ = warehouse
    before = wh.read(RECORDS).count()
    results = run_pipeline(spark, os.path.join(dataset, "pages"), wh.root, batch_files=2)
    assert results == []
    assert wh.read(RECORDS).count() == before


@pytest.mark.slow
def test_torn_batch_reprocessed_idempotently(spark, warehouse, dataset):
    """Crash-after-write-before-lineage: batch dir exists, no lineage row.
    Rerun must converge to the identical final state (T4 analogue)."""
    wh, _ = warehouse
    records_before = sorted(
        (r["table"], r["record_id"], r["ts_millis"] or -1, r["seq"], r["url"], r["sink"])
        for r in wh.read(RECORDS).collect()
    )
    # simulate torn state: drop last batch's lineage rows, keep its data dir
    lineage = wh.read(LINEAGE)
    last = lineage.agg(F.max("batch").alias("b")).collect()[0]["b"]
    keep = lineage.filter(F.col("batch") != last).collect()
    wh.drop(LINEAGE)
    if keep:
        wh.write(spark.createDataFrame(keep, lineage.schema), LINEAGE, mode="overwrite")
    results = run_pipeline(spark, os.path.join(dataset, "pages"), wh.root, batch_files=2)
    assert len(results) == 1 and results[0].batch == last
    records_after = sorted(
        (r["table"], r["record_id"], r["ts_millis"] or -1, r["seq"], r["url"], r["sink"])
        for r in wh.read(RECORDS).collect()
    )
    assert records_after == records_before


def test_point_lookup_get(spark, warehouse):
    from log_server_spark.operators.lookup import get_records, get_records_json

    wh, _ = warehouse
    records = wh.read(RECORDS)
    sample = records.filter((F.col("status") == "ok") & (F.col("record_id") != "")).limit(1).collect()[0]
    out = get_records(records, sample["table"], sample["record_id"]).collect()
    assert len(out) >= 1
    ts = [r["ts_millis"] for r in out]
    assert ts == sorted(ts)  # O1 ordering
    js = get_records_json(records, sample["table"], int(sample["record_id"])).collect()
    assert all('"tableName"' in r["json"] for r in js)


def test_sink_stats_and_windowed(spark, warehouse):
    from log_server_spark.plans.pipeline import METRICS_SINK, METRICS_WINDOWED

    wh, _ = warehouse
    stats = {r["sink"]: r for r in wh.read(METRICS_SINK).collect()}
    records = wh.read(RECORDS)
    want = {r["sink"]: r["n"] for r in records.groupBy("sink").agg(F.count("*").alias("n")).collect()}
    for sink, n in want.items():
        assert stats[sink]["n_rows"] == n
    windowed = wh.read(METRICS_WINDOWED)
    assert windowed.agg(F.sum("n_rows")).collect()[0][0] == records.count()


def test_ingest_metrics_sum(spark, warehouse):
    wh, results = warehouse
    m = wh.read(METRICS_INGEST)
    rows = {r["batch"]: r for r in m.collect()}
    for res in results:
        assert rows[res.batch]["added"] == res.added
        assert rows[res.batch]["duplicates"] == res.duplicates
        assert rows[res.batch]["errors"] == res.errors


@pytest.mark.slow
def test_salting_does_not_change_results(spark, dataset, tmp_path_factory):
    """Skew knob (SURVEY §5): hot-domain input must produce identical final
    state with and without salting; salting only spreads reducer load."""
    import glob

    pages = os.path.join(dataset, "pages")
    whs = {}
    for salt in (1, 16):
        whdir = str(tmp_path_factory.mktemp(f"salt{salt}"))
        run_pipeline(spark, pages, whdir, batch_files=6, salt=salt, aggregates=False)
        whs[salt] = whdir
    key = lambda r: (r["table"], r["record_id"], r["ts_millis"] or -1, r["seq"], r["url"], r["sink"])
    a = sorted(key(r) for r in spark.read.parquet(os.path.join(whs[1], RECORDS)).collect())
    b = sorted(key(r) for r in spark.read.parquet(os.path.join(whs[16], RECORDS)).collect())
    assert a == b
    # at test scale AQE coalesces the tiny shuffle partitions, so file-count
    # spreading is not observable here; the semantic equality above is the
    # invariant (load-balance evidence lives in the bench at 240k+ pages)
    def nfiles(wh):
        return len(glob.glob(os.path.join(wh, RECORDS, "**", "*.parquet"), recursive=True))
    assert nfiles(whs[16]) >= nfiles(whs[1])
