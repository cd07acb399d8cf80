"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01; compare row count, column
names, and order-insensitive values."""

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(4)
        # unify ints across engines (duckdb may give int32/uint, spark int64)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()

# slowest parity params (measured --durations, round 6): deselect with
# -m "not slow" for the fast inner loop; the full suite stays the gate
SLOW_PARITY = {
    "pipeline_e2e",
    "dedup_simhash",
    "embedding_ann_lsh",
    "dedup_keep_best",
    "dedup_clusters",
    "dedup_minhash_lsh_md5",
    "dedup_ngram_jaccard",
    "dedup_substring",
    "dedup_incremental",
}


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=pytest.mark.slow) if n in SLOW_PARITY else n
        for n in sorted(ORACLES)
    ],
)
def test_query_matches_oracle(spark, con, name):
    sdf = _normalize(QUERIES[name](spark, SF_DIR).toPandas())
    ddf = _normalize(con.sql(ORACLES[name]).df())
    assert list(sdf.columns) == list(ddf.columns), f"{name} columns differ"
    assert len(sdf) == len(ddf), f"{name} row count {len(sdf)} vs {len(ddf)}"
    pd.testing.assert_frame_equal(sdf, ddf, check_dtype=False, atol=1e-4, rtol=0)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
