"""Round-5 regressions: VERDICT r4 "What's wrong" #1/#2/#4 (idempotent
error sink, session-conf restoration, newest-partials-only salt read),
Next #4 (reliable checkpoint for components), and the ADVICE r4 fixes
(spread_small_input object-store fallback, recoverable torn sweep,
LSH threshold contract)."""

import glob
import os
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from log_server_spark.catalog import Warehouse
from log_server_spark.plans.pipeline import RECORDS, RECORDS_KEYS, run_pipeline


_TS = datetime(2024, 3, 5, 12, 0, 0, tzinfo=timezone.utc)


def _pages(rows) -> pa.Table:
    """rows: (url, html_str)."""
    return pa.table(
        {
            "url": pa.array([u for u, _ in rows], pa.string()),
            "warc_ts": pa.array([_TS] * len(rows), pa.timestamp("us", tz="UTC")),
            "html": pa.array([h.encode() for _, h in rows], pa.binary()),
            "text": pa.array([h for _, h in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
        }
    )


def _write_pages(base: str, tbl: pa.Table) -> str:
    pages = os.path.join(base, "pages")
    os.makedirs(pages, exist_ok=True)
    pq.write_table(tbl, os.path.join(pages, "part-00000.parquet"))
    return pages


# ---------------------------------------------------------------------------
# VERDICT #1: idempotent error sink — exact-duplicate malformed pages
# write ONE error row; distinct malformed versions of a url both survive
# ---------------------------------------------------------------------------


def test_duplicate_malformed_pages_write_one_error_row(spark, tmp_path):
    ok = "---- 2024-03-05 12:00:00 level:INFO table:users id:7 op:sync\nbody here"
    bad = "---- 2024-03-05 12:00:00 level:WARN table:users header-only-no-newline"
    bad_v2 = "---- 2024-03-05 12:01:00 level:WARN table:users another-version-no-newline"
    tbl = _pages(
        [
            ("https://a.example.com/ok", ok),
            ("https://a.example.com/bad", bad),
            ("https://a.example.com/bad", bad),  # exact duplicate page
            ("https://a.example.com/bad2", bad_v2),
        ]
    )
    pages = _write_pages(str(tmp_path), tbl)
    run_pipeline(spark, pages, str(tmp_path / "wh"), batch_files=1)
    wh = Warehouse(str(tmp_path / "wh"), spark)
    recs = wh.read(RECORDS)
    errs = recs.filter(F.col("status") != "ok").select("url", "seq", "status").collect()
    # the exact-duplicate malformed page collapsed to one row; the distinct
    # malformed version kept its own row
    assert sorted((r["url"], r["seq"]) for r in errs) == [
        ("https://a.example.com/bad", 0),
        ("https://a.example.com/bad2", 0),
    ]
    assert recs.filter(F.col("status") == "ok").count() == 1


def test_distinct_malformed_versions_same_url_both_kept(spark, tmp_path):
    bad1 = "---- 2024-03-05 12:00:00 level:WARN table:users version-one"
    bad2 = "---- 2024-03-05 12:05:00 level:WARN table:users version-two"
    tbl = _pages([("https://b.example.com/x", bad1), ("https://b.example.com/x", bad2)])
    pages = _write_pages(str(tmp_path), tbl)
    run_pipeline(spark, pages, str(tmp_path / "wh"), batch_files=1)
    wh = Warehouse(str(tmp_path / "wh"), spark)
    errs = wh.read(RECORDS).filter(F.col("status") != "ok")
    # same (url, seq) but different bytes: full-row distinct keeps both
    assert errs.count() == 2


# ---------------------------------------------------------------------------
# VERDICT #2: run_batch must not leak its per-batch split-sizing confs
# ---------------------------------------------------------------------------


def test_run_pipeline_restores_session_split_confs(spark, tmp_path):
    from log_server_spark.datagen import write_dataset

    keys = ("spark.sql.files.maxPartitionBytes", "spark.sql.files.openCostInBytes")
    before = {k: spark.conf.get(k, None) for k in keys}
    data = str(tmp_path / "data")
    write_dataset(data, seed=5, n=60, num_files=1)
    run_pipeline(spark, os.path.join(data, "pages"), str(tmp_path / "wh"), batch_files=1)
    after = {k: spark.conf.get(k, None) for k in keys}
    assert after == before


# ---------------------------------------------------------------------------
# ADVICE #2: torn sweep is recoverable (rename, not rmtree) and refuses
# to run when the lineage table is missing but batch partitions exist
# ---------------------------------------------------------------------------


def _tiny_warehouse(spark, tmp_path):
    ok = "---- 2024-03-05 12:00:00 level:INFO table:users id:7 op:sync\nbody"
    pages = _write_pages(str(tmp_path), _pages([("https://c.example.com/1", ok)]))
    whdir = str(tmp_path / "wh")
    run_pipeline(spark, pages, whdir, batch_files=1)
    return Warehouse(whdir, spark)


def test_sweep_renames_torn_batch_to_hidden_dir(spark, tmp_path):
    import shutil

    from log_server_spark.plans.pipeline import sweep_torn_batches

    wh = _tiny_warehouse(spark, tmp_path)
    committed = wh.read(RECORDS).count()
    src = os.path.join(wh.path(RECORDS), "batch=b00000")
    shutil.copytree(src, os.path.join(wh.path(RECORDS), "batch=b00099"))
    with wh.lock():
        assert sweep_torn_batches(wh) == ["b00099"]
    # renamed to an underscore-prefixed sibling: invisible to scans,
    # hand-recoverable after an operator mistake
    torn = glob.glob(os.path.join(wh.path(RECORDS), "_torn-b00099-*"))
    assert len(torn) == 1
    assert not os.path.isdir(os.path.join(wh.path(RECORDS), "batch=b00099"))
    assert wh.read(RECORDS).count() == committed


def test_sweep_refuses_when_lineage_missing(spark, tmp_path):
    import shutil

    from log_server_spark.plans.pipeline import LINEAGE, sweep_torn_batches

    wh = _tiny_warehouse(spark, tmp_path)
    shutil.rmtree(wh.path(LINEAGE))
    with wh.lock():
        with pytest.raises(RuntimeError, match="refusing to sweep"):
            sweep_torn_batches(wh)
    # data untouched by the refused sweep
    assert os.path.isdir(os.path.join(wh.path(RECORDS), "batch=b00000"))


# ---------------------------------------------------------------------------
# VERDICT #4: _sink_salts reads ONLY the newest per-batch partials file
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_sink_salts_reads_only_newest_partials_file(spark, tmp_path):
    from log_server_spark.datagen import write_dataset
    from log_server_spark.plans.pipeline import METRICS_PARTIALS, _sink_salts

    data = str(tmp_path / "data")
    write_dataset(data, seed=9, n=120, num_files=2)
    whdir = str(tmp_path / "wh")
    run_pipeline(spark, os.path.join(data, "pages"), whdir, batch_files=1)
    wh = Warehouse(whdir, spark)
    salts = _sink_salts(wh, 8)
    assert salts and all(v >= 1 for v in salts.values())
    # corrupt every OLDER per-batch file: a full-table driver read would
    # now fail (-> None); the newest-file-only read must not notice
    files = sorted(glob.glob(os.path.join(wh.path(METRICS_PARTIALS), "part-b*.parquet")))
    assert len(files) >= 2
    for f in files[:-1]:
        with open(f, "wb") as fh:
            fh.write(b"not parquet")
    assert _sink_salts(wh, 8) == salts


# ---------------------------------------------------------------------------
# VERDICT Next #4: reliable checkpoint mode produces identical labels
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_components_reliable_checkpoint_same_labels(spark, tmp_path):
    from log_server_spark.operators.dedup_text import components_from_pairs

    ids = spark.range(0, 40).select(F.col("id"))
    # chain 0-1-2-...-9 plus a clique {20,21,22}; rest singletons
    chain = [(i, i + 1) for i in range(9)]
    clique = [(20, 21), (21, 22), (20, 22)]
    pairs = spark.createDataFrame(chain + clique, "id_a long, id_b long")
    local = {
        r["node"]: r["lbl"] for r in components_from_pairs(ids, pairs).collect()
    }
    reliable = {
        r["node"]: r["lbl"]
        for r in components_from_pairs(
            ids, pairs, checkpoint_dir=str(tmp_path / "ckpt")
        ).collect()
    }
    assert reliable == local
    assert local[9] == 0 and local[22] == 20 and local[30] == 30
    # the reliable mode actually wrote checkpoint data to the shared path
    assert glob.glob(str(tmp_path / "ckpt" / "*"))


# ---------------------------------------------------------------------------
# ADVICE #1: spread_small_input must not shuffle when file sizes are
# unavailable (object-store URIs) but the file count already covers cores
# ---------------------------------------------------------------------------


def test_spread_small_input_unsized_files_use_count_lower_bound(spark, tmp_path, monkeypatch):
    import log_server_spark.plan_util as pu

    target = spark.sparkContext.defaultParallelism
    d = str(tmp_path / "many")
    os.makedirs(d)
    for i in range(target + 2):
        pq.write_table(pa.table({"id": pa.array([i], pa.int64())}), os.path.join(d, f"f{i}.parquet"))
    df = spark.read.parquet(d)

    def _no_stat(_p):
        raise OSError("stat unavailable (simulated object store)")

    monkeypatch.setattr(pu.os.path, "getsize", _no_stat)
    # count >= cores: affirmatively NOT small -> no repartition shuffle
    assert pu.spread_small_input(df) is df
    # a single unsized file could still be one giant split: stays spread
    one = spark.read.parquet(os.path.join(d, "f0.parquet"))
    assert pu.spread_small_input(one) is not one


# ---------------------------------------------------------------------------
# ADVICE #4: LSH threshold contract — zero/negative thresholds would
# silently drop zero-overlap candidates, so they are rejected loudly
# ---------------------------------------------------------------------------


def test_lsh_threshold_zero_raises(spark):
    from log_server_spark.operators.dedup_text import minhash_lsh_pairs

    docs = spark.createDataFrame([(1, "aaa bbb ccc")], "id long, text string")
    with pytest.raises(ValueError, match="threshold"):
        minhash_lsh_pairs(docs, "id", "text", threshold=0.0)


# ---------------------------------------------------------------------------
# Round 5: salt sized to batch volume (files-per-batch stays proportional to
# data, full `salt` fan-out only when the bytes justify it)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_salt_volume_cap_collapses_small_batches(spark, tmp_path):
    from log_server_spark.datagen import write_dataset
    from log_server_spark.plans.pipeline import RECORDS as REC, _sink_salts

    data = str(tmp_path / "data")
    write_dataset(data, seed=3, n=400, num_files=2)
    whdir = str(tmp_path / "wh")
    # default 96 MB target; a ~100 KB batch needs salt 1 everywhere
    run_pipeline(spark, os.path.join(data, "pages"), whdir, batch_files=1, salt=8)
    wh = Warehouse(whdir, spark)
    for batch in ("b00000", "b00001"):
        for sink_dir in glob.glob(os.path.join(wh.path(REC), f"batch={batch}", "sink=*")):
            n_files = len(glob.glob(os.path.join(sink_dir, "*.parquet")))
            assert n_files == 1, (batch, sink_dir, n_files)
    # adaptive path: observed per-sink bytes cap every allocation at 1
    salts = _sink_salts(wh, 8)
    assert salts and max(salts.values()) == 1


# ---------------------------------------------------------------------------
# Round 5: segment-level dedup + deterministic hash sampling
# ---------------------------------------------------------------------------


def test_dedup_segments_keeps_first_occurrence_and_reassembles(spark):
    from log_server_spark.operators.dedup_text import dedup_segments

    rows = [
        (1, ["alpha beta", "gamma delta", "alpha beta"]),  # self-dup inside doc
        (2, ["gamma delta", "unique two"]),                # first seg lost to doc 1
        (3, ["alpha beta"]),                               # everything lost
    ]
    df = spark.createDataFrame(rows, "doc_id long, segs array<string>")
    got = {r["doc_id"]: (r["text_dedup"], r["n_segs_kept"])
           for r in dedup_segments(df, "doc_id", "segs", join_sep="\n").collect()}
    assert got[1] == ("alpha beta\ngamma delta", 2)  # pos-0 copy wins, in-doc dup dropped
    assert got[2] == ("unique two", 1)
    assert 3 not in got  # fully deduplicated docs vanish


def test_hash_sample_deterministic_and_salted(spark):
    from log_server_spark.operators.sample import hash_sample, hash_stratified_sample

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"] for r in hash_sample(df, "doc_id", 0.3, salt="s1").collect()}
    b = {r["doc_id"] for r in hash_sample(df, "doc_id", 0.3, salt="s1").collect()}
    c = {r["doc_id"] for r in hash_sample(df, "doc_id", 0.3, salt="s2").collect()}
    assert a == b                       # reproducible
    assert a != c                       # salt rotates the draw
    assert 0.25 < len(a) / 2000 < 0.35  # ~fraction
    assert hash_sample(df, "doc_id", 1.0).count() == 2000
    assert hash_sample(df, "doc_id", 0.0).count() == 0
    # nested fraction property: the 10% sample is a SUBSET of the 30% one
    # (same draw, lower threshold) — lets a mix dial quotas without churn
    small = {r["doc_id"] for r in hash_sample(df, "doc_id", 0.1, salt="s1").collect()}
    assert small <= a

    from pyspark.sql import functions as F

    strat = df.withColumn("g", (F.col("doc_id") % 2 == 0).cast("string"))
    out = hash_stratified_sample(strat, "g", {"true": 1.0}, "doc_id", default=0.0)
    assert out.count() == 1000 and out.filter("g = 'false'").count() == 0


def test_new_queries_match_duckdb_oracle(spark):
    """Value-level parity harness for the two round-5 queries (the driver
    runs the same comparison at sf0.01)."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.001/documents.parquet'"
    )
    for name in ("dedup_segments", "sample_stratified", "repetition_score", "vocab_top_tokens", "decontaminate"):
        sdf = qs[name](spark, "/root/testdata/sf0.001").toPandas()
        ddf = con.sql(oracles[name]).df()
        assert len(sdf) == len(ddf), (name, len(sdf), len(ddf))
        cols = sorted(sdf.columns)
        assert cols == sorted(ddf.columns), name
        s = sdf[cols].sort_values(cols).reset_index(drop=True)
        d = ddf[cols].sort_values(cols).reset_index(drop=True)
        for col in cols:
            assert s[col].astype(str).tolist() == d[col].astype(str).tolist(), (name, col)


def test_repetition_features_on_crafted_docs(spark):
    from log_server_spark.functions.text import repetition_features

    rows = [
        (1, "a a a a"),          # one word repeated: dup_word 0.75, top 1.0
        (2, "a b c d"),          # all distinct: dup_word 0, top 0.25
        (3, "x y x y x y"),      # alternating: ngrams 'x y x','y x y' repeat
        (4, ""),                 # empty: n_words 0, ratios NULL
        (5, "p q"),              # < 3 words: dup_ngram_frac NULL
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    feats = repetition_features("text", ngram_n=3)
    got = {
        r["doc_id"]: r
        for r in df.select("doc_id", *[v.alias(k) for k, v in feats.items()]).collect()
    }
    assert got[1]["n_words"] == 4 and got[1]["dup_word_frac"] == 0.75
    assert got[1]["top_word_frac"] == 1.0
    assert got[2]["dup_word_frac"] == 0.0 and got[2]["top_word_frac"] == 0.25
    # doc 3: 4 ngrams, 2 distinct -> 0.5; top word 'x' (or 'y') 3/6 = 0.5
    assert got[3]["dup_ngram_frac"] == 0.5 and got[3]["top_word_frac"] == 0.5
    assert got[4]["n_words"] == 0 and got[4]["dup_word_frac"] is None
    assert got[4]["top_word_frac"] is None
    assert got[5]["dup_ngram_frac"] is None


def test_contamination_flags_semantics_and_broadcast_plan(spark):
    from log_server_spark.operators.dedup_text import contamination_flags

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a completely different sentence with no overlap at all here"),
            (3, "we note the quick brown fox jumps too"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "THE QUICK BROWN FOX JUMPS")], "doc_id long, text string"
    )
    out = contamination_flags(docs, bench, "doc_id", "text", ngram_n=5)
    got = {r["doc_id"]: (r["n_hits"], r["contaminated"]) for r in out.collect()}
    assert got[1] == (1, True)   # shares 'the quick brown fox jumps' (case-folded)
    assert got[2] == (0, False)
    assert got[3] == (1, True)
    # the 100 TB shape: the eval side must be broadcast, never shuffled
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_hash_quota_per_group_caps_and_rotates(spark):
    from log_server_spark.operators.sample import hash_quota_per_group

    df = spark.createDataFrame(
        [(i, "g" + str(i % 3)) for i in range(90)], "id long, g string"
    )
    out = hash_quota_per_group(df, "g", 10, key_col="id", salt="s1")
    pdf = out.toPandas()
    # exact cap per group; groups smaller than n keep everything
    assert pdf.groupby("g").size().tolist() == [10, 10, 10]
    small = hash_quota_per_group(
        spark.createDataFrame([(1, "g")], "id long, g string"), "g", 10, "id"
    )
    assert small.count() == 1
    # deterministic: same winners on re-run and after a repartition
    again = hash_quota_per_group(df.repartition(7), "g", 10, "id", salt="s1").toPandas()
    assert set(map(tuple, pdf.values)) == set(map(tuple, again.values))
    # salt rotation redraws the winner set
    other = hash_quota_per_group(df, "g", 10, "id", salt="s2").toPandas()
    assert set(map(tuple, pdf.values)) != set(map(tuple, other.values))


def test_substring_duplicate_pairs_semantics(spark):
    from log_server_spark.operators.dedup_text import substring_duplicate_pairs

    run = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 t12"  # 12 tokens
    short = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10 s11"    # 11 — below the window
    boiler = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 b11 b12"
    docs = spark.createDataFrame(
        [
            (1, "intro " + run + " outro"),
            (2, "other lead " + run),          # shares the 12-token run with 1
            (3, short + " x " + short),        # repeats an 11-run: no pair
            (4, run + " " + run),              # in-doc repeat: distinct once
            (5, boiler), (6, boiler), (7, boiler), (8, boiler),  # 4-way boilerplate
        ],
        "doc_id long, text string",
    )
    out = substring_duplicate_pairs(docs, "doc_id", "text", window_n=12)
    got = {(r["id_a"], r["id_b"]): r["shared_windows"] for r in out.collect()}
    # 1-2 share exactly the one 12-token window; 4 shares it with both
    assert got[(1, 2)] == 1 and got[(1, 4)] == 1 and got[(2, 4)] == 1
    assert 3 not in {i for p in got for i in p}
    # boilerplate quartet pairs quadratically (6 pairs)...
    assert {(5, 6), (5, 7), (5, 8), (6, 7), (6, 8), (7, 8)} <= set(got)
    # ...and max_df=3 drops the df=4 boilerplate window while the df=3
    # shared run (docs 1, 2, 4) survives
    capped = substring_duplicate_pairs(docs, "doc_id", "text", 12, max_df=3)
    cgot = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert not ({(5, 6), (5, 7), (5, 8), (6, 7), (6, 8), (7, 8)} & cgot)
    assert {(1, 2), (1, 4), (2, 4)} <= cgot


def test_dedup_substring_matches_duckdb_oracle(spark):
    import duckdb

    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.001/documents.parquet'"
    )
    sdf = qs["dedup_substring"](spark, "/root/testdata/sf0.001").toPandas()
    ddf = con.sql(oracles["dedup_substring"]).df()
    assert len(sdf) == len(ddf)
    cols = sorted(sdf.columns)
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    d = ddf[cols].sort_values(cols).reset_index(drop=True)
    for col in cols:
        assert s[col].astype("int64").tolist() == d[col].astype("int64").tolist(), col


@pytest.mark.slow
def test_dedup_incremental_equals_full_pairs_filtered(spark):
    """Property behind the oracle: incremental mode == full LSH pairs
    filtered to pairs touching the delta."""
    import duckdb

    import __spark_entry__ as e
    from log_server_spark.operators.dedup_text import minhash_lsh_pairs
    from log_server_spark.queries_ml import _t

    sf = "/root/testdata/sf0.001"
    docs = _t(spark, sf, "documents")
    full = minhash_lsh_pairs(
        docs, "doc_id", "text",
        num_hashes=16, bands=8, shingle_n=3, threshold=0.5, base="md5",
    ).toPandas()
    delta = docs.where(F.col("doc_id") % 5 == 0).select("doc_id")
    inc = minhash_lsh_pairs(
        docs, "doc_id", "text",
        num_hashes=16, bands=8, shingle_n=3, threshold=0.5, base="md5",
        delta_ids=delta,
    ).toPandas()
    want = full[(full.id_a % 5 == 0) | (full.id_b % 5 == 0)]
    assert set(map(tuple, want[["id_a", "id_b"]].values)) == set(
        map(tuple, inc[["id_a", "id_b"]].values)
    )
    assert len(inc) == len(want) and len(inc) < len(full)

    # and the registered query matches its DuckDB oracle
    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    sdf = qs["dedup_incremental"](spark, sf).toPandas()
    ddf = con.sql(oracles["dedup_incremental"]).df()
    assert len(sdf) == len(ddf)
    cols = sorted(sdf.columns)
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    d = ddf[cols].sort_values(cols).reset_index(drop=True)
    for col in cols:
        assert s[col].astype(str).tolist() == d[col].astype(str).tolist(), col


def test_pack_sequences_concat_and_cut(spark):
    from log_server_spark.operators.pack import pack_sequences

    # single shard so the packing math is fully visible
    df = spark.createDataFrame(
        [(i, 600) for i in range(1, 8)] + [(99, 0)], "id long, tok long"
    )
    out = pack_sequences(df, "id", "tok", budget=1000, n_shards=1, salt="x")
    rows = {r["id"]: (r["shard"], r["seq"], r["begin_off"]) for r in out.collect()}
    assert all(v[0] == 0 for v in rows.values())
    # cumulative starts: the seven 600-token docs start at 0,600,...,3600
    # regardless of the hash order; the 0-token doc shares the start of
    # whichever doc follows it (or 4200 if it hashed last)
    starts = sorted(v[1] * 1000 + v[2] for k, v in rows.items() if k != 99)
    assert starts == [0, 600, 1200, 1800, 2400, 3000, 3600]
    assert rows[99][1] * 1000 + rows[99][2] in set(range(0, 4201, 600))
    # deterministic across partitionings; salt rotation reshuffles the order
    again = pack_sequences(df.repartition(5), "id", "tok", 1000, 1, salt="x")
    assert {tuple(r) for r in again.collect()} == {
        (k,) + v for k, v in rows.items()
    }
    other = pack_sequences(df, "id", "tok", 1000, 1, salt="y").collect()
    assert {(r["id"], r["seq"], r["begin_off"]) for r in other} != {
        (k, v[1], v[2]) for k, v in rows.items()
    }
    # sequences never span shards: every (shard, seq=0) exists independently
    sharded = pack_sequences(df, "id", "tok", 1000, 4, salt="x")
    pdf = sharded.toPandas()
    assert set(pdf.shard.unique()) <= {0, 1, 2, 3}
    for _, g in pdf.groupby("shard"):
        assert (g.sort_values(["seq", "begin_off"]).iloc[0][["seq", "begin_off"]] == 0).all()


def test_mixture_sample_weights_and_clip(spark):
    from log_server_spark.operators.sample import mixture_sample

    # 300 bulk rows, 8 rare rows: weight rare 50x so its target (~29 rows)
    # exceeds its size -> clips to keep-all; bulk absorbs its own fraction
    rows = [(i, "bulk") for i in range(300)] + [(1000 + i, "rare") for i in range(8)]
    df = spark.createDataFrame(rows, "id long, src string")
    out = mixture_sample(df, "src", "id", {"rare": 50.0}, 0.1, salt="m1")
    pdf = out.toPandas()
    by = pdf.groupby("src").size().to_dict()
    assert by.get("rare") == 8  # clipped at min(1, ...): keeps everything
    # bulk keeps ~ 0.1*308*(1/51)/300 ... tiny fraction -> just require < rare share
    assert by.get("bulk", 0) < 300 * 0.1
    # deterministic across partitionings
    again = mixture_sample(df.repartition(7), "src", "id", {"rare": 50.0}, 0.1, salt="m1")
    assert {tuple(r) for r in again.collect()} == {tuple(r) for r in out.collect()}
    # the per-source frame joins by BROADCAST (no corpus shuffle)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_perplexity_buckets_semantics(spark):
    import __spark_entry__ as e

    pdf = e.queries()["perplexity_buckets"](spark, "/root/testdata/sf0.001").toPandas()
    for lang, g in pdf.groupby("lang"):
        sizes = g.groupby("bucket").size()
        # terciles: sizes within 1 of each other
        assert sizes.max() - sizes.min() <= 1, (lang, dict(sizes))
        # head = lowest-perplexity third
        med = g.groupby("bucket").ppl_r.median()
        assert med["head"] <= med["middle"] <= med["tail"], (lang, dict(med))


@pytest.mark.slow
def test_lsh_pairs_from_stored_signatures(spark, tmp_path):
    """The stored-signatures lifecycle: signatures written to parquet by
    minhash_signature_frame, read back, and fed to
    minhash_lsh_pairs_from_signatures must reproduce minhash_lsh_pairs
    exactly — full and incremental."""
    from log_server_spark.operators.dedup_text import (
        minhash_lsh_pairs,
        minhash_lsh_pairs_from_signatures,
        minhash_signature_frame,
    )
    from log_server_spark.queries_ml import _t

    sf = "/root/testdata/sf0.001"
    docs = _t(spark, sf, "documents")
    direct = minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=16, bands=8, threshold=0.5, base="md5"
    ).toPandas()

    p = str(tmp_path / "sigs")
    minhash_signature_frame(docs, "doc_id", "text", 16, 3, "md5").write.parquet(p)
    sig = spark.read.parquet(p)
    stored = minhash_lsh_pairs_from_signatures(sig, bands=8, threshold=0.5).toPandas()
    assert set(map(tuple, direct.values.tolist())) == set(
        map(tuple, stored.values.tolist())
    )

    delta = docs.where(F.col("doc_id") % 5 == 0).select("doc_id")
    inc_direct = minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=16, bands=8, threshold=0.5,
        base="md5", delta_ids=delta,
    ).toPandas()
    inc_stored = minhash_lsh_pairs_from_signatures(
        sig, bands=8, threshold=0.5, delta_ids=delta
    ).toPandas()
    assert set(map(tuple, inc_direct.values.tolist())) == set(
        map(tuple, inc_stored.values.tolist())
    )
    # contract errors
    with pytest.raises(ValueError):
        minhash_lsh_pairs_from_signatures(sig, bands=7)
    with pytest.raises(ValueError):
        minhash_lsh_pairs_from_signatures(sig, bands=8, threshold=0.0)


def test_mixture_sample_null_source_group_reachable(spark):
    from log_server_spark.operators.sample import mixture_sample

    rows = [(i, "a") for i in range(40)] + [(100 + i, None) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, src string")
    out = mixture_sample(df, "src", "id", {"a": 1.0}, 1.0, salt="n1").toPandas()
    # fraction=1.0: every row keepable, INCLUDING the NULL-source group —
    # a plain equi-join would silently drop all 40 NULL rows
    assert len(out) == 80
