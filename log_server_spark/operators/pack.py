"""Sequence packing: assign docs to fixed-token-budget training sequences.

The concat-and-cut recipe most LLM training pipelines use: order the corpus
deterministically, concatenate the token stream, cut every ``budget`` tokens;
a doc belongs to the sequence where it STARTS (consumers carry the overflow
into the next sequence or truncate — the assignment, not the byte moving, is
the distributed problem). Stated that way the whole operator is a window
expression — no stateful scan, no UDF, engine-portable — because the greedy
"open a new bin when the doc would overflow" variant needs a running reset
(inherently sequential), while "cut at fixed offsets of the running total"
is a plain prefix sum.

Scale shape: one hash shuffle on the shard key + one per-shard window sort.
Sharding is what makes the sort tractable at 10^12 docs: the order is only
ever needed WITHIN a shard (sequences never span shards), so ``n_shards``
dials partition volume to executor sort/spill budgets, and the md5-derived
shard/order keys make the layout a pure function of (id, salt) — stable
across runs, engines, and partitionings, salt-rotatable per epoch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    n_shards: int,
    salt: str = "",
) -> DataFrame:
    """Assign each row to (shard, seq, begin_off): the training sequence
    (per-shard index) where its token run starts, and the offset within
    that sequence. Deterministic mixing: shard and in-shard order both
    derive from md5(id || '|' || salt); rotating the salt reshuffles the
    epoch without data movement anywhere else.
    """
    if budget <= 0 or n_shards <= 0:
        raise ValueError("budget and n_shards must be positive")
    key = F.col(id_col).cast("string")
    h = F.md5(F.concat(key, F.lit("|" + salt)))
    okey = F.substring(h, 1, 8)
    shard = F.pmod(
        F.conv(F.substring(h, 9, 8), 16, 10).cast("long"), F.lit(n_shards)
    ).cast("int")
    d = df.select(
        F.col(id_col),
        F.col(tokens_col).cast("long").alias("__tok"),
        okey.alias("__ok"),
        shard.alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("__ok").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("__tok").over(w), F.lit(0))
    # 64-bit integer division (`div`), not floor(double /): a shard's
    # running token total can exceed 2^53, where double division rounds
    # and floor could disagree with the exact pmod offset
    return d.withColumn("__cum", cum).select(
        id_col,
        "shard",
        F.expr(f"__cum div {int(budget)}").cast("long").alias("seq"),
        F.pmod(F.col("__cum"), F.lit(budget)).cast("long").alias("begin_off"),
    )
