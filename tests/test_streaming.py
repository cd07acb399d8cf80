"""Streaming-ingest parity: availableNow drain must equal the batch DAG."""

import os

import pytest
from pyspark.sql import functions as F

from log_server_spark.datagen import write_dataset
from log_server_spark.streaming.stream_pipeline import start_ingest, start_windowed_stats

N = 800


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_data"))
    write_dataset(d, seed=7, n=N, num_files=4)
    return d


def _lookups(spark, data):
    return (
        spark.read.parquet(os.path.join(data, "lang_lookup.parquet")),
        spark.read.parquet(os.path.join(data, "domain_lookup.parquet")),
    )


@pytest.mark.slow
def test_streaming_matches_batch_routing(spark, data, tmp_path):
    ll, dl = _lookups(spark, data)
    out = str(tmp_path / "out")
    q = start_ingest(
        spark, os.path.join(data, "pages"), out, str(tmp_path / "ckpt"),
        ll, dl, available_now=True,
    )
    q.awaitTermination(300)

    got = {
        (r["sink"], r["n"])
        for r in spark.read.parquet(out).groupBy("sink").agg(F.count("*").alias("n")).collect()
    }

    # batch reference on the same input
    from log_server_spark.plans.pipeline import RECORDS, run_pipeline

    wh = str(tmp_path / "wh")
    run_pipeline(spark, os.path.join(data, "pages"), wh, batch_files=4, aggregates=False)
    want = {
        (r["sink"], r["n"])
        for r in spark.read.parquet(os.path.join(wh, RECORDS))
        .groupBy("sink")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


@pytest.mark.slow
def test_streaming_restart_is_exactly_once(spark, data, tmp_path):
    """Restarting from the same checkpoint must not duplicate rows."""
    ll, dl = _lookups(spark, data)
    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    for _ in range(2):  # second start finds nothing new
        q = start_ingest(
            spark, os.path.join(data, "pages"), out, ckpt, ll, dl, available_now=True
        )
        q.awaitTermination(300)
    n = spark.read.parquet(out).count()
    from log_server_spark.plans.pipeline import RECORDS, run_pipeline

    wh = str(tmp_path / "wh2")
    run_pipeline(spark, os.path.join(data, "pages"), wh, batch_files=4, aggregates=False)
    assert n == spark.read.parquet(os.path.join(wh, RECORDS)).count()


def test_streaming_windowed_stats_runs(spark, data, tmp_path):
    ll, dl = _lookups(spark, data)
    out = str(tmp_path / "wstats")
    q = start_windowed_stats(
        spark, os.path.join(data, "pages"), out, str(tmp_path / "wckpt"),
        ll, dl, available_now=True,
    )
    q.awaitTermination(300)
    # append mode only emits closed windows; with a 1-day watermark over a
    # 30-day fixture most windows close — at least some rows must exist
    df = spark.read.parquet(out)
    assert df.count() > 0
    assert set(df.columns) == {"window_start", "sink", "n_rows", "n_urls_approx"}


@pytest.mark.slow
def test_chained_record_sessions_exactly_once(spark, data, tmp_path):
    """Stage-1 ingest sink -> stage-2 per-domain session stream, chained via
    the sink's _spark_metadata commit log. Across a two-wave restart: no
    closed session is emitted twice, and every closed session equals the
    batch gap-sessionization of the final records."""
    from pyspark.sql import Window

    from log_server_spark.streaming.sessionize import GAP_MS
    from log_server_spark.streaming.stream_pipeline import start_record_sessions

    ll, dl = _lookups(spark, data)
    pages_src = os.path.join(data, "pages")
    pages = str(tmp_path / "pages")
    os.makedirs(pages)
    units = sorted(os.listdir(pages_src))
    records = str(tmp_path / "records")
    sessions = str(tmp_path / "sessions")
    ck1, ck2 = str(tmp_path / "ck1"), str(tmp_path / "ck2")

    import shutil

    def _drain():
        q = start_ingest(spark, pages, records, ck1, ll, dl, available_now=True)
        q.awaitTermination(300)
        q2 = start_record_sessions(spark, records, sessions, ck2, available_now=True)
        q2.awaitTermination(300)

    # wave 1: half the units; wave 2: the rest (restart both stages)
    for u in units[:2]:
        shutil.copy(os.path.join(pages_src, u), os.path.join(pages, u))
    _drain()
    for u in units[2:]:
        shutil.copy(os.path.join(pages_src, u), os.path.join(pages, u))
    _drain()

    got = spark.read.parquet(sessions).collect()
    keys = [(r["user_id"], r["session_start"]) for r in got]
    assert len(keys) == len(set(keys)), "a closed session was emitted twice"
    assert len(got) > 0

    # batch oracle: gap sessions over the final committed records
    recs = (
        spark.read.parquet(records)
        .filter(F.col("status") == "ok")
        .select(
            F.xxhash64("domain").alias("user_id"),
            F.unix_millis("warc_ts").alias("ts_ms"),
            F.col("n_bytes").cast("double").alias("value"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts_ms")
    batch = (
        recs.withColumn("prev", F.lag("ts_ms").over(w))
        .withColumn(
            "new_sess",
            F.when(F.col("prev").isNull() | (F.col("ts_ms") - F.col("prev") > GAP_MS), 1).otherwise(0),
        )
        .withColumn("sess", F.sum("new_sess").over(w))
        .groupBy("user_id", "sess")
        .agg(
            F.min("ts_ms").alias("session_start"),
            F.max("ts_ms").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )
    want = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"], float(r["sum_value"]))
        for r in batch.collect()
    }
    for r in got:  # every CLOSED session must match the batch recompute
        k = (r["user_id"], r["session_start"])
        assert k in want, f"streamed session {k} unknown to batch oracle"
        assert want[k] == (r["session_end"], r["n_events"], float(r["sum_value"])), k
