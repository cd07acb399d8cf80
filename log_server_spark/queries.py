"""Operator-inventory queries over the driver testdata tables.

Each entry implements one operator class from SURVEY.md §2 (or a
training-data-pipeline operator) as an idiomatic Spark DataFrame plan, with
a matching ANSI-SQL oracle executable by DuckDB on the same parquet files.
Column names/aliases are kept identical on both sides (the driver's compare
hashes values under sorted column names).

Conventions:
- doubles that result from arithmetic are rounded to 4 decimals on BOTH
  sides (summation-order noise is far below 1e-4 at these scales);
- timestamps are emitted as epoch millis bigints (`unix_millis` vs
  `epoch_ms`) to avoid engine-specific timestamp hashing;
- queries take ``(spark, sf_dir)`` and read parquet directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Routing / aggregation flagship (SURVEY §2.2 F3/F4 + §2.4 A1-A3)
# ---------------------------------------------------------------------------

_SINK_EXPR = (
    "CASE WHEN text IS NULL OR length(text) < 50 THEN 'error' "
    "WHEN lang IN ('en','de','fr') THEN 'lang_' || lang "
    "ELSE 'cat_' || source END"
)


def q_flagship_route_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Route documents to per-lang / per-source / error sinks, then per-sink
    aggregate stats — the reference `update`+`info` semantics (A3/F4)."""
    docs = _t(spark, sf_dir, "documents")
    sink = (
        F.when(F.col("text").isNull() | (F.length("text") < 50), F.lit("error"))
        .when(F.col("lang").isin("en", "de", "fr"), F.concat(F.lit("lang_"), F.col("lang")))
        .otherwise(F.concat(F.lit("cat_"), F.col("source")))
    )
    return (
        docs.withColumn("sink", sink)
        .groupBy("sink")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.sum(F.length("text")).cast("long").alias("total_len"),
        )
    )


SQL_FLAGSHIP = f"""
SELECT {_SINK_EXPR} AS sink,
       count(*) AS n_rows,
       count(DISTINCT doc_id) AS n_docs,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars,
       CAST(sum(length(text)) AS BIGINT) AS total_len
FROM documents GROUP BY 1
"""


def q_route_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    sink = (
        F.when(F.col("text").isNull() | (F.length("text") < 50), F.lit("error"))
        .when(F.col("lang").isin("en", "de", "fr"), F.concat(F.lit("lang_"), F.col("lang")))
        .otherwise(F.concat(F.lit("cat_"), F.col("source")))
    )
    return docs.withColumn("sink", sink).groupBy("sink").agg(F.count("*").alias("n_rows"))


SQL_ROUTE_COUNTS = f"SELECT {_SINK_EXPR} AS sink, count(*) AS n_rows FROM documents GROUP BY 1"


# ---------------------------------------------------------------------------
# Point lookup (F1/F7/O1 — GetCommand semantics)
# ---------------------------------------------------------------------------

def q_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("user_id") == 42)
        .select(
            "event_id",
            F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
            "event_type",
            F.round("value", 4).alias("value_r"),
        )
    )


SQL_POINT_LOOKUP = """
SELECT event_id, epoch_ms(ts) AS ts_ms, event_type, round(value, 4) AS value_r
FROM events WHERE user_id = 42
"""


# ---------------------------------------------------------------------------
# Dedup as aggregation — first-writer-wins (A5/J1)
# ---------------------------------------------------------------------------

def q_dedup_first_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-wins per (lang, source): the reference keeps the first record
    per dedup key and counts later ones as duplicates (BigStorage:316-333)."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy("doc_id")
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(Window.partitionBy("lang", "source")))
        .filter(F.col("_rn") == 1)
        .select(
            "lang",
            "source",
            F.col("doc_id").alias("first_doc"),
            (F.col("_n") - 1).alias("dup_count"),
        )
    )


SQL_DEDUP_FIRST_WINS = """
SELECT lang, source, min(doc_id) AS first_doc, count(*) - 1 AS dup_count
FROM documents GROUP BY lang, source
"""


# ---------------------------------------------------------------------------
# info-style aggregates (A1-A4)
# ---------------------------------------------------------------------------

def q_info_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        F.min(F.unix_millis(F.col("ts").cast("timestamp"))).alias("min_ts"),
        F.max(F.unix_millis(F.col("ts").cast("timestamp"))).alias("max_ts"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


SQL_INFO_STATS = """
SELECT event_type, count(*) AS n_rows, count(DISTINCT user_id) AS n_users,
       min(epoch_ms(ts)) AS min_ts, max(epoch_ms(ts)) AS max_ts,
       round(sum(value), 4) AS sum_value
FROM events GROUP BY event_type
"""


def q_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day event-time windows per type (north_star windowed aggs)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_millis(F.col("w.start").cast("timestamp")).alias("window_start"),
            "event_type",
            "n_rows",
            "n_users",
            "sum_value",
        )
    )


SQL_WINDOWED_AGG = """
SELECT epoch_ms(date_trunc('day', ts)) AS window_start, event_type,
       count(*) AS n_rows, count(DISTINCT user_id) AS n_users,
       round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Broadcast enrichment join (J3)
# ---------------------------------------------------------------------------

def q_enrich_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
        )
    )


SQL_ENRICH_BROADCAST = """
SELECT r_name AS region_name, count(*) AS n_customers,
       round(avg(c_acctbal), 4) AS avg_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# ---------------------------------------------------------------------------
# Normalization + id coercion (F6/F7)
# ---------------------------------------------------------------------------

def q_normalize_coerce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 ('ros.' prefix strip) + F7 (RecordId.parse int coercion) on a
    synthesized tagged column — '007'-style ids canonicalize to '7'."""
    docs = _t(spark, sf_dir, "documents")
    tagged = F.concat(F.lit("ros."), F.col("source"))
    padded = F.concat(F.lit("00"), F.col("doc_id").cast("string"))
    as_int = padded.try_cast("int")
    return docs.select(
        "doc_id",
        F.regexp_replace(tagged, r"^ros\.", "").alias("table_norm"),
        F.when(as_int.isNotNull(), as_int.cast("string")).otherwise(padded).alias("canon_id"),
    )


SQL_NORMALIZE_COERCE = """
SELECT doc_id,
       regexp_replace('ros.' || source, '^ros\\.', '') AS table_norm,
       CASE WHEN TRY_CAST('00' || CAST(doc_id AS VARCHAR) AS INTEGER) IS NOT NULL
            THEN CAST(TRY_CAST('00' || CAST(doc_id AS VARCHAR) AS INTEGER) AS VARCHAR)
            ELSE '00' || CAST(doc_id AS VARCHAR) END AS canon_id
FROM documents
"""


# ---------------------------------------------------------------------------
# Set ops (U1) + sort/limit (O1)
# ---------------------------------------------------------------------------

def q_multi_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F")
    b = o.filter(F.col("o_orderstatus") != "F")
    return (
        a.unionByName(b)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 4).alias("sum_price"))
    )


SQL_MULTI_UNION = """
SELECT o_orderpriority, count(*) AS n_orders, round(sum(o_totalprice), 4) AS sum_price
FROM (SELECT * FROM orders WHERE o_orderstatus = 'F'
      UNION ALL
      SELECT * FROM orders WHERE o_orderstatus <> 'F')
GROUP BY o_orderpriority
"""


def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 4).alias("totalprice_r"))
    )


SQL_TOPK_ORDERS = """
SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS totalprice_r
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


# ---------------------------------------------------------------------------
# Shuffle-heavy aggregation showcase (TPC-H Q1 shape)
# ---------------------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Window functions (§2.5 — absent in the reference; engine capability)
# ---------------------------------------------------------------------------

def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization of the events stream (30-min inactivity):
    lag -> new-session flag -> running sum = session id -> per-session agg."""
    ev = _t(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ms = 30 * 60 * 1000
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.unix_millis(F.col("ts").cast("timestamp"))
            - F.unix_millis(F.lag(F.col("ts").cast("timestamp")).over(w_user))
            > gap_ms,
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "session_seq",
        F.sum("new_session").over(w_user.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return flagged.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min(F.unix_millis(F.col("ts").cast("timestamp"))).alias("session_start"),
        F.max(F.unix_millis(F.col("ts").cast("timestamp"))).alias("session_end"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


SQL_SESSIONIZE = """
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
              THEN 1 ELSE 0 END AS new_session
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq, count(*) AS n_events,
       min(epoch_ms(ts)) AS session_start, max(epoch_ms(ts)) AS session_end,
       round(sum(value), 4) AS sum_value
FROM sess GROUP BY user_id, session_seq
"""


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: top-3 longest documents per language."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    return (
        docs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("lang", "doc_id", "n_chars", F.col("rnk").cast("long").alias("rnk"))
    )


SQL_TOPK_PER_GROUP = """
SELECT lang, doc_id, n_chars,
       row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC) AS rnk
FROM documents QUALIFY rnk <= 3
"""


# ---------------------------------------------------------------------------
# Temporal joins (engine adds — absent in the reference, see SURVEY §2.3)
# ---------------------------------------------------------------------------

def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each click event gains the latest prior-or-equal
    view event (id + value) of the same user — funnel attribution. One
    window shuffle, no non-equi join (operators/temporal.py)."""
    from .operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.col("event_id").alias("ref_id"),
        F.col("value").alias("ref_value"),
    )
    res = asof_join(
        clicks, views, on=["user_id"], left_ts="ts", right_ts="ts",
        payload=["ref_id", "ref_value"], tiebreak="ref_id",
    )
    return res.select(
        "event_id",
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        F.round("value", 4).alias("value"),
        F.coalesce("ref_id", F.lit(-1)).alias("ref_id"),
        F.round(F.coalesce("ref_value", F.lit(0.0)), 4).alias("ref_value"),
    )


SQL_ASOF_JOIN = """
WITH clicks AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'
),
views AS (
  SELECT user_id, ts, event_id AS ref_id, value AS ref_value
  FROM events WHERE event_type = 'view'
),
j AS (
  SELECT c.event_id, c.user_id, epoch_ms(c.ts) AS ts_ms, round(c.value, 4) AS value,
         v.ref_id, v.ref_value,
         row_number() OVER (PARTITION BY c.event_id
                            ORDER BY v.ts DESC, v.ref_id DESC) AS rn
  FROM clicks c LEFT JOIN views v
    ON v.user_id = c.user_id AND v.ts <= c.ts
)
SELECT event_id, user_id, ts_ms, value,
       coalesce(ref_id, -1) AS ref_id,
       round(coalesce(ref_value, 0.0), 4) AS ref_value
FROM j WHERE rn = 1
"""


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: for each error event, count + sum the same user's
    events in the following 24 h (error-burst attribution). Bucket-chunked
    equi-join — never a nested loop (operators/temporal.py)."""
    from .operators.temporal import range_join

    day_us = 86_400_000_000
    ev = _t(spark, sf_dir, "events").withColumn(
        "__us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    wins = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("win_id"),
        "user_id",
        F.col("__us").alias("start_us"),
        (F.col("__us") + F.lit(day_us)).alias("end_us"),
    )
    pts = ev.select("user_id", F.col("__us").alias("p_us"), "value")
    pairs = range_join(
        pts, wins, on=["user_id"], point_us="p_us",
        start_us="start_us", end_us="end_us", bucket_us=day_us, bounds="(]",
    )
    hits = pairs.groupBy("win_id").agg(
        F.count("*").alias("n_hits"), F.sum("value").alias("sv")
    )
    return (
        wins.join(hits, "win_id", "left")
        .select(
            "win_id",
            "user_id",
            (F.col("start_us") / 1000).cast("long").alias("start_ms"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.round(F.coalesce("sv", F.lit(0.0)), 4).alias("sum_value"),
        )
    )


SQL_RANGE_JOIN = """
WITH e AS (
  SELECT event_id AS win_id, user_id, ts FROM events WHERE event_type = 'error'
),
hits AS (
  SELECT e.win_id, count(*) AS n_hits, sum(p.value) AS sv
  FROM e JOIN events p
    ON p.user_id = e.user_id
   AND epoch_us(p.ts) > epoch_us(e.ts)
   AND epoch_us(p.ts) <= epoch_us(e.ts) + 86400000000
  GROUP BY e.win_id
)
SELECT e.win_id, e.user_id, epoch_us(e.ts) // 1000 AS start_ms,
       coalesce(h.n_hits, 0) AS n_hits,
       round(coalesce(h.sv, 0.0), 4) AS sum_value
FROM e LEFT JOIN hits h USING (win_id)
"""


def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension builder: each user's purchase events become validity
    intervals [valid_from_us, valid_to_us) — the precomputed frame the
    streaming-legal as-of enrichment joins against (operators/temporal.py;
    stream==batch pytest-gated in test_temporal)."""
    from .operators.temporal import scd2_intervals

    ev = _t(spark, sf_dir, "events")
    changes = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("ver_id"), "value"
    )
    iv = scd2_intervals(changes, ["user_id"], "ts", ["ver_id", "value"], tiebreak="ver_id")
    return iv.select(
        "user_id", "ver_id",
        F.round("value", 4).alias("value"),
        "valid_from_us", "valid_to_us",
    )


SQL_SCD2_INTERVALS = """
SELECT user_id, event_id AS ver_id, round(value, 4) AS value,
       epoch_us(ts) AS valid_from_us,
       coalesce(lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id),
                9223372036854775807) AS valid_to_us
FROM events WHERE event_type = 'purchase'
"""


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document-length distribution: exact interpolated
    percentiles (p50/p90/p99). The 10^12-row path is the same plan with
    ``approx_percentile`` — a single-pass mergeable KLL/GK sketch instead of
    the exact aggregate's full per-group value collection; the exact form is
    the queries() entry because DuckDB replays it bit-for-bit
    (``quantile_cont``), and per-group value counts here are bounded."""
    docs = _t(spark, sf_dir, "documents")
    pct = F.percentile("n_chars", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(pct[0], 4).alias("p50"),
        F.round(pct[1], 4).alias("p90"),
        F.round(pct[2], 4).alias("p99"),
    )


SQL_PERCENTILES = """
SELECT lang, count(*) AS n_docs,
       round(quantile_cont(n_chars, 0.5), 4) AS p50,
       round(quantile_cont(n_chars, 0.9), 4) AS p90,
       round(quantile_cont(n_chars, 0.99), 4) AS p99
FROM documents GROUP BY lang
"""


REGISTRY: dict[str, tuple] = {
    "sessionize": (q_sessionize, SQL_SESSIONIZE),
    "topk_per_group": (q_topk_per_group, SQL_TOPK_PER_GROUP),
    "asof_join": (q_asof_join, SQL_ASOF_JOIN),
    "range_join": (q_range_join, SQL_RANGE_JOIN),
    "percentiles": (q_percentiles, SQL_PERCENTILES),
    "scd2_intervals": (q_scd2_intervals, SQL_SCD2_INTERVALS),
    "flagship_route_aggregate": (q_flagship_route_aggregate, SQL_FLAGSHIP),
    "route_counts": (q_route_counts, SQL_ROUTE_COUNTS),
    "point_lookup": (q_point_lookup, SQL_POINT_LOOKUP),
    "dedup_first_wins": (q_dedup_first_wins, SQL_DEDUP_FIRST_WINS),
    "info_stats": (q_info_stats, SQL_INFO_STATS),
    "windowed_agg": (q_windowed_agg, SQL_WINDOWED_AGG),
    "enrich_broadcast": (q_enrich_broadcast, SQL_ENRICH_BROADCAST),
    "normalize_coerce": (q_normalize_coerce, SQL_NORMALIZE_COERCE),
    "multi_union": (q_multi_union, SQL_MULTI_UNION),
    "topk_orders": (q_topk_orders, SQL_TOPK_ORDERS),
    "pricing_summary": (q_pricing_summary, SQL_PRICING_SUMMARY),
}
