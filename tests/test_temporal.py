"""Unit tests for operators/temporal.py (as-of join, range join) — the
temporal joins the reference lacks (SURVEY §2.3), built join-free /
nested-loop-free for the 10^12-row design point."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from log_server_spark.operators.temporal import asof_join, range_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01 10:00:00"), 100.0),
            (2, "A", _ts("2024-01-01 10:05:00"), 101.0),
            (3, "B", _ts("2024-01-01 10:01:00"), 50.0),
            (4, "B", _ts("2024-01-01 09:00:00"), 49.0),  # before any quote
            (5, "C", _ts("2024-01-01 12:00:00"), 7.0),  # key with no quotes
        ],
        "trade_id long, sym string, ts timestamp, px double",
    )
    quotes = spark.createDataFrame(
        [
            (10, "A", _ts("2024-01-01 09:59:00"), 99.5),
            (11, "A", _ts("2024-01-01 10:05:00"), 100.5),  # exact-ts match
            (12, "B", _ts("2024-01-01 10:00:00"), 49.9),
            (13, "B", _ts("2024-01-01 10:00:00"), 49.8),  # tie on ts
        ],
        "quote_id long, sym string, ts timestamp, bid double",
    )
    return trades, quotes


def test_asof_backward_basic(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="ts", right_ts="ts",
        payload=["quote_id", "bid"], tiebreak="quote_id",
    )
    rows = {r["trade_id"]: r for r in out.collect()}
    assert len(rows) == 5  # left-outer: every trade survives
    assert rows[1]["quote_id"] == 10 and rows[1]["bid"] == 99.5
    # exact-timestamp right row matches (allow_exact_matches semantics)
    assert rows[2]["quote_id"] == 11
    # tie on right ts -> greatest tiebreak wins
    assert rows[3]["quote_id"] == 13
    # no prior quote / no quotes at all -> NULL payload
    assert rows[4]["quote_id"] is None and rows[4]["bid"] is None
    assert rows[5]["quote_id"] is None


def test_asof_tolerance(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="ts", right_ts="ts",
        payload=["quote_id"], tiebreak="quote_id",
        tolerance_us=30_000_000,  # 30 s
    )
    rows = {r["trade_id"]: r["quote_id"] for r in out.collect()}
    assert rows[1] is None  # 60 s stale > 30 s tolerance
    assert rows[2] == 11  # exact match, 0 s
    assert rows[3] is None  # 60 s stale
    assert rows[4] is None and rows[5] is None  # never matched


def test_asof_null_payload_stays_atomic(spark):
    """A right row with NULL payload must still win (not resurrect an older
    row's value) — the struct carry keeps (ts, payload) atomic."""
    left = spark.createDataFrame(
        [(1, "k", _ts("2024-01-01 10:10:00"))], "id long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("k", _ts("2024-01-01 10:00:00"), 5.0), ("k", _ts("2024-01-01 10:05:00"), None)],
        "k string, ts timestamp, v double",
    )
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts", payload=["v"])
    assert out.collect()[0]["v"] is None


def test_asof_plan_is_one_shuffle_no_join(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="ts", right_ts="ts",
        payload=["quote_id"], tiebreak="quote_id",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange") == 1


@pytest.fixture(scope="module")
def points_intervals(spark):
    pts = spark.createDataFrame(
        [("u", 100, 1.0), ("u", 200, 2.0), ("u", 300, 3.0), ("v", 150, 9.0)],
        "k string, t long, v double",
    )
    ivs = spark.createDataFrame(
        [(1, "u", 100, 200), (2, "u", 250, 1000), (3, "v", 0, 149), (4, "w", 0, 999)],
        "iv long, k string, lo long, hi long",
    )
    return pts, ivs


def test_range_join_bounds(spark, points_intervals):
    pts, ivs = points_intervals
    def pairs(bounds):
        out = range_join(
            pts, ivs, on=["k"], point_us="t", start_us="lo", end_us="hi",
            bucket_us=1000, bounds=bounds,
        )
        return sorted((r["iv"], r["t"]) for r in out.collect())

    assert pairs("[]") == [(1, 100), (1, 200), (2, 300)]
    assert pairs("[)") == [(1, 100), (2, 300)]
    assert pairs("(]") == [(1, 200), (2, 300)]
    assert pairs("()") == [(2, 300)]


def test_range_join_interval_spanning_many_buckets(spark, points_intervals):
    """Correctness must not depend on bucket width: a tiny bucket makes
    every interval explode to many chunks; a point still pairs exactly once
    per matching interval (its own single bucket)."""
    pts, ivs = points_intervals
    out = range_join(
        pts, ivs, on=["k"], point_us="t", start_us="lo", end_us="hi",
        bucket_us=7, bounds="[]",
    )
    assert sorted((r["iv"], r["t"]) for r in out.collect()) == [
        (1, 100), (1, 200), (2, 300)
    ]


def test_range_join_no_nested_loop(spark, points_intervals):
    pts, ivs = points_intervals
    out = range_join(
        pts, ivs, on=["k"], point_us="t", start_us="lo", end_us="hi",
        bucket_us=1000,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_rejects_bad_bounds(spark, points_intervals):
    pts, ivs = points_intervals
    with pytest.raises(ValueError):
        range_join(
            pts, ivs, on=["k"], point_us="t", start_us="lo", end_us="hi",
            bucket_us=1000, bounds="><",
        )


# ---------------------------------------------------------------------------
# Randomized parity: asof_join vs pandas.merge_asof, range_join vs brute force
# ---------------------------------------------------------------------------

import numpy as np
import pandas as pd


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_asof_matches_pandas_merge_asof(spark, seed):
    rng = np.random.default_rng(seed)
    keys = np.array(["a", "b", "c", "d"])
    nl, nr = 300, 200
    left = pd.DataFrame(
        {
            "lid": np.arange(nl),
            "k": rng.choice(keys, nl),
            "ts": pd.to_datetime(rng.integers(0, 10_000_000, nl), unit="us"),
        }
    )
    # unique right timestamps PER KEY: pandas merge_asof tie-breaks duplicate
    # timestamps by row order, which is not a semantic either engine owns
    right_rows = []
    for k in keys:
        ts = rng.choice(10_000_000, size=nr // len(keys), replace=False)
        for t in ts:
            right_rows.append((k, t))
    right = pd.DataFrame(right_rows, columns=["k", "t_us"])
    right["ts"] = pd.to_datetime(right["t_us"], unit="us")
    right["rid"] = np.arange(len(right)) + 1000
    right = right.drop(columns=["t_us"])

    sl = spark.createDataFrame(left)
    sr = spark.createDataFrame(right)
    for tol in (None, 500_000):
        got = (
            asof_join(
                sl, sr, on=["k"], left_ts="ts", right_ts="ts",
                payload=["rid"], tiebreak="rid",
                tolerance_us=tol,
            )
            .select("lid", "rid")
            .toPandas()
            .sort_values("lid")
            .reset_index(drop=True)
        )
        exp = pd.merge_asof(
            left.sort_values("ts", kind="stable"),
            right.sort_values("ts", kind="stable"),
            on="ts", by="k", direction="backward", allow_exact_matches=True,
            tolerance=None if tol is None else pd.Timedelta(microseconds=tol),
        )[["lid", "rid"]].sort_values("lid").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.astype({"rid": "float64"}), exp.astype({"rid": "float64"})
        )


@pytest.mark.parametrize("seed", [0, 1])
def test_range_join_matches_brute_force(spark, seed):
    rng = np.random.default_rng(seed + 100)
    keys = np.array(["x", "y", "z"])
    pts = pd.DataFrame(
        {
            "pid": np.arange(250),
            "k": rng.choice(keys, 250),
            "t": rng.integers(0, 100_000, 250),
        }
    )
    ivs = pd.DataFrame(
        {
            "iv": np.arange(60),
            "k": rng.choice(keys, 60),
            "lo": rng.integers(0, 90_000, 60),
        }
    )
    ivs["hi"] = ivs["lo"] + rng.integers(0, 20_000, 60)
    got = (
        range_join(
            spark.createDataFrame(pts), spark.createDataFrame(ivs),
            on=["k"], point_us="t", start_us="lo", end_us="hi",
            bucket_us=20_000, bounds="[]",
        )
        .select("pid", "iv")
        .toPandas()
    )
    got_set = set(map(tuple, got.values))
    m = pts.merge(ivs, on="k")
    exp = m[(m.t >= m.lo) & (m.t <= m.hi)][["pid", "iv"]]
    assert got_set == set(map(tuple, exp.values))
    assert len(got) == len(exp)  # no duplicate pairs from the bucket explode


# ---------------------------------------------------------------------------
# SCD2 intervals + interval-based as-of enrichment (batch == asof_join,
# and the streaming-legal formulation)
# ---------------------------------------------------------------------------

def test_scd2_intervals_halfopen_cover(spark):
    from log_server_spark.operators.temporal import OPEN_END_US, scd2_intervals

    changes = spark.createDataFrame(
        [
            ("k", _ts("2024-01-01 10:00:00"), 1),
            ("k", _ts("2024-01-01 11:00:00"), 2),
            ("q", _ts("2024-01-01 09:00:00"), 3),
        ],
        "k string, ts timestamp, ver long",
    )
    rows = {
        r["ver"]: r
        for r in scd2_intervals(changes, ["k"], "ts", ["ver"]).collect()
    }
    assert rows[1]["valid_to_us"] == rows[2]["valid_from_us"]  # half-open chain
    assert rows[2]["valid_to_us"] == OPEN_END_US  # current version open
    assert rows[3]["valid_to_us"] == OPEN_END_US


def test_asof_enrich_intervals_equals_asof_join(spark):
    import numpy as np
    import pandas as pd
    from log_server_spark.operators.temporal import (
        asof_enrich_intervals,
        scd2_intervals,
    )

    rng = np.random.default_rng(7)
    keys = np.array(["a", "b", "c"])
    ev = pd.DataFrame(
        {
            "eid": np.arange(200),
            "k": rng.choice(keys, 200),
            "ts": pd.to_datetime(rng.integers(0, 1_000_000, 200), unit="us"),
        }
    )
    ch_rows = []
    for k in keys:
        for t in rng.choice(1_000_000, size=30, replace=False):
            ch_rows.append((k, t))
    ch = pd.DataFrame(ch_rows, columns=["k", "t_us"])
    ch["ts"] = pd.to_datetime(ch["t_us"], unit="us")
    ch["ver"] = np.arange(len(ch)) + 500
    ch = ch.drop(columns=["t_us"])

    sev, sch = spark.createDataFrame(ev), spark.createDataFrame(ch)
    via_asof = (
        asof_join(sev, sch, on=["k"], left_ts="ts", right_ts="ts",
                  payload=["ver"], tiebreak="ver")
        .select("eid", "ver").toPandas().sort_values("eid").reset_index(drop=True)
    )
    iv = scd2_intervals(sch, ["k"], "ts", ["ver"], tiebreak="ver")
    via_iv = (
        asof_enrich_intervals(sev, iv, on=["k"], event_ts="ts", how="left")
        .select("eid", "ver").toPandas().sort_values("eid").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        via_asof.astype({"ver": "float64"}), via_iv.astype({"ver": "float64"})
    )


def test_asof_enrich_intervals_streaming_equals_batch(spark, tmp_path):
    """The interval formulation is stream-static-join legal: an availableNow
    stream of events enriched against the static interval frame must equal
    the batch result row-for-row."""
    from log_server_spark.operators.temporal import (
        asof_enrich_intervals,
        scd2_intervals,
    )

    changes = spark.createDataFrame(
        [
            ("k", _ts("2024-01-01 10:00:00"), 1),
            ("k", _ts("2024-01-01 11:00:00"), 2),
        ],
        "k string, ts timestamp, ver long",
    )
    events = spark.createDataFrame(
        [
            (1, "k", _ts("2024-01-01 09:30:00")),  # before any version
            (2, "k", _ts("2024-01-01 10:30:00")),  # version 1
            (3, "k", _ts("2024-01-01 11:00:00")),  # exact boundary -> version 2
            (4, "k", _ts("2024-01-01 12:00:00")),  # open tail -> version 2
        ],
        "eid long, k string, ts timestamp",
    )
    src = str(tmp_path / "ev")
    events.write.parquet(src)
    iv = scd2_intervals(changes, ["k"], "ts", ["ver"])

    batch = {
        r["eid"]: r["ver"]
        for r in asof_enrich_intervals(
            spark.read.parquet(src), iv, on=["k"], event_ts="ts"
        ).collect()
    }
    stream_ev = spark.readStream.schema(events.schema).parquet(src)
    q = (
        asof_enrich_intervals(stream_ev, iv, on=["k"], event_ts="ts")
        .writeStream.format("memory")
        .queryName("asof_enrich_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["eid"]: r["ver"]
        for r in spark.sql("SELECT eid, ver FROM asof_enrich_stream").collect()
    }
    assert got == batch == {1: None, 2: 1, 3: 2, 4: 2}


def test_asof_enrich_intervals_plan_is_hash_join(spark):
    """The equi keys must reach a hash/SMJ join with the interval range as
    a residual — never a nested loop (the fate of a pure non-equi join)."""
    from log_server_spark.operators.temporal import (
        asof_enrich_intervals,
        scd2_intervals,
    )

    changes = spark.createDataFrame(
        [("k", _ts("2024-01-01 10:00:00"), 1)], "k string, ts timestamp, ver long"
    )
    events = spark.createDataFrame(
        [(1, "k", _ts("2024-01-01 10:30:00"))], "eid long, k string, ts timestamp"
    )
    iv = scd2_intervals(changes, ["k"], "ts", ["ver"])
    plan = (
        asof_enrich_intervals(events, iv, on=["k"], event_ts="ts")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_forward_basic(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="ts", right_ts="ts",
        payload=["quote_id"], tiebreak="quote_id", direction="forward",
    )
    rows = {r["trade_id"]: r["quote_id"] for r in out.collect()}
    # trade 1 @10:00 -> next A quote is 11 @10:05; trade 2 @10:05 exact -> 11
    assert rows[1] == 11 and rows[2] == 11
    # trade 4 @09:00 -> next B quote @10:00, tie -> greatest tiebreak (13)
    assert rows[4] == 13
    # trade 3 @10:01 has no later B quote; C has none at all
    assert rows[3] is None and rows[5] is None


def test_asof_forward_rejects_bad_direction(spark, trades_quotes):
    trades, quotes = trades_quotes
    with pytest.raises(ValueError):
        asof_join(trades, quotes, on=["sym"], left_ts="ts", right_ts="ts",
                  payload=["quote_id"], direction="sideways")


@pytest.mark.parametrize("seed", [3, 4])
def test_asof_forward_matches_pandas(spark, seed):
    rng = np.random.default_rng(seed)
    keys = np.array(["a", "b", "c"])
    left = pd.DataFrame(
        {
            "lid": np.arange(250),
            "k": rng.choice(keys, 250),
            "ts": pd.to_datetime(rng.integers(0, 5_000_000, 250), unit="us"),
        }
    )
    rows = []
    for k in keys:
        for t in rng.choice(5_000_000, size=60, replace=False):
            rows.append((k, t))
    right = pd.DataFrame(rows, columns=["k", "t_us"])
    right["ts"] = pd.to_datetime(right["t_us"], unit="us")
    right["rid"] = np.arange(len(right)) + 9000
    right = right.drop(columns=["t_us"])
    sl, sr = spark.createDataFrame(left), spark.createDataFrame(right)
    for tol in (None, 200_000):
        got = (
            asof_join(sl, sr, on=["k"], left_ts="ts", right_ts="ts",
                      payload=["rid"], tiebreak="rid",
                      tolerance_us=tol, direction="forward")
            .select("lid", "rid").toPandas()
            .sort_values("lid").reset_index(drop=True)
        )
        exp = pd.merge_asof(
            left.sort_values("ts", kind="stable"),
            right.sort_values("ts", kind="stable"),
            on="ts", by="k", direction="forward", allow_exact_matches=True,
            tolerance=None if tol is None else pd.Timedelta(microseconds=tol),
        )[["lid", "rid"]].sort_values("lid").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.astype({"rid": "float64"}), exp.astype({"rid": "float64"})
        )


def test_range_join_drops_reversed_intervals(spark, points_intervals):
    """A reversed interval (hi < lo) matches nothing — and must not reach
    the explode, where F.sequence would generate a DESCENDING bucket list
    proportional to its span."""
    pts, _ = points_intervals
    ivs = spark.createDataFrame(
        [(1, "u", 200, 100), (2, "u", 100, 200)], "iv long, k string, lo long, hi long"
    )
    out = range_join(
        pts, ivs, on=["k"], point_us="t", start_us="lo", end_us="hi",
        bucket_us=10, bounds="[]",
    )
    assert sorted((r["iv"], r["t"]) for r in out.collect()) == [(2, 100), (2, 200)]


def test_asof_nearest_basic(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="ts", right_ts="ts",
        payload=["quote_id"], tiebreak="quote_id", direction="nearest",
    )
    rows = {r["trade_id"]: r["quote_id"] for r in out.collect()}
    # trade 1 @10:00: quote 10 is 60 s back, quote 11 is 300 s ahead -> 10
    assert rows[1] == 10
    # trade 4 @09:00: only future B quotes -> forward match (tie -> 13)
    assert rows[4] == 13
    # trade 3 @10:01: backward 60 s, no forward -> 13 (greatest tiebreak)
    assert rows[3] == 13
    assert rows[5] is None  # no quotes at all


@pytest.mark.parametrize("seed", [5, 6])
def test_asof_nearest_matches_pandas(spark, seed):
    rng = np.random.default_rng(seed)
    keys = np.array(["a", "b"])
    left = pd.DataFrame(
        {
            "lid": np.arange(200),
            "k": rng.choice(keys, 200),
            "ts": pd.to_datetime(rng.integers(0, 2_000_000, 200), unit="us"),
        }
    )
    rows = []
    for k in keys:
        for t in rng.choice(2_000_000, size=50, replace=False):
            rows.append((k, t))
    right = pd.DataFrame(rows, columns=["k", "t_us"])
    right["ts"] = pd.to_datetime(right["t_us"], unit="us")
    right["rid"] = np.arange(len(right)) + 7000
    right = right.drop(columns=["t_us"])
    sl, sr = spark.createDataFrame(left), spark.createDataFrame(right)
    for tol in (None, 100_000):
        got = (
            asof_join(sl, sr, on=["k"], left_ts="ts", right_ts="ts",
                      payload=["rid"], tiebreak="rid",
                      tolerance_us=tol, direction="nearest")
            .select("lid", "rid").toPandas()
            .sort_values("lid").reset_index(drop=True)
        )
        exp = pd.merge_asof(
            left.sort_values("ts", kind="stable"),
            right.sort_values("ts", kind="stable"),
            on="ts", by="k", direction="nearest", allow_exact_matches=True,
            tolerance=None if tol is None else pd.Timedelta(microseconds=tol),
        )[["lid", "rid"]].sort_values("lid").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.astype({"rid": "float64"}), exp.astype({"rid": "float64"})
        )


def test_asof_nearest_single_exchange(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="ts", right_ts="ts",
        payload=["quote_id"], direction="nearest",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and plan.count("Exchange") == 1


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_exact_match_exclusion_matches_pandas(spark, direction):
    """allow_exact_matches=False parity in every direction, on a corpus
    engineered so many left timestamps EQUAL a right timestamp."""
    rng = np.random.default_rng(11)
    base = rng.choice(500_000, size=80, replace=False)
    right = pd.DataFrame({"k": "g", "t_us": base})
    right["ts"] = pd.to_datetime(right["t_us"], unit="us")
    right["rid"] = np.arange(len(right)) + 100
    right = right.drop(columns=["t_us"])
    # half the left rows sit exactly ON a right timestamp
    lt = np.concatenate([rng.choice(base, 60), rng.integers(0, 500_000, 60)])
    left = pd.DataFrame({"lid": np.arange(len(lt)), "k": "g",
                         "ts": pd.to_datetime(lt, unit="us")})
    sl, sr = spark.createDataFrame(left), spark.createDataFrame(right)
    got = (
        asof_join(sl, sr, on=["k"], left_ts="ts", right_ts="ts",
                  payload=["rid"], tiebreak="rid",
                  direction=direction, allow_exact_matches=False)
        .select("lid", "rid").toPandas()
        .sort_values("lid").reset_index(drop=True)
    )
    exp = pd.merge_asof(
        left.sort_values("ts", kind="stable"),
        right.sort_values("ts", kind="stable"),
        on="ts", by="k", direction=direction, allow_exact_matches=False,
    )[["lid", "rid"]].sort_values("lid").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"rid": "float64"}), exp.astype({"rid": "float64"})
    )
