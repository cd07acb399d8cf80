"""Deterministic, shuffle-free sampling for training-data mixes.

``spark.sample``/``sampleBy`` draw from a seeded RNG whose stream depends
on partitioning — re-running after a repartition (or on another engine)
yields a different sample. A pretraining mix wants the OPPOSITE: the same
row set every run, on any engine, derivable from the row itself. The
standard trick is hash-bucket sampling: map a stable row key through a
cryptographic hash to a uniform [0, 1) draw and keep the row iff its draw
falls under its stratum's quota. Membership is a pure per-row predicate —
no shuffle, no state, trivially pushed into a scan — and changing the salt
rotates the whole sample reproducibly.

The draw is compared IN HEX-STRING SPACE: the first 8 hex chars of
md5(key || "|" || salt) against the 8-char hex rendering of
floor(fraction * 2^32). Fixed-width lowercase hex compares identically as
a string and as a number, and md5 + substring + string compare exist in
every engine (the DuckDB oracle replays the predicate bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _fraction_hex(fraction: float) -> str:
    """8-char lowercase-hex threshold: draw < threshold <=> keep."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return format(min(int(fraction * (1 << 32)), (1 << 32) - 1), "08x")


def hash_draw(key_col, salt: str = "") -> Column:
    """The uniform draw as its 8-hex-char string (exposed for tests)."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.substring(
        F.md5(F.concat(key.cast("string"), F.lit("|" + salt))), 1, 8
    )


def hash_sample(df: DataFrame, key_col: str, fraction: float, salt: str = "") -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows, keyed by ``key_col``."""
    if fraction >= 1.0:
        return df
    return df.where(hash_draw(key_col, salt) < F.lit(_fraction_hex(fraction)))


def hash_stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    salt: str = "",
    default: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the "30% en, 10% ru, drop the
    rest" mix quota, as one scan-pushable predicate. Strata absent from
    ``fractions`` fall back to ``default`` (0.0 = drop)."""
    draw = hash_draw(key_col, salt)
    cond = draw < F.lit(_fraction_hex(default))
    for stratum, frac in sorted(fractions.items()):
        keep = F.lit(True) if frac >= 1.0 else (draw < F.lit(_fraction_hex(frac)))
        cond = F.when(F.col(strata_col) == stratum, keep).otherwise(cond)
    return df.where(cond)


def hash_quota_per_group(
    df: DataFrame, group_col: str, n: int, key_col: str, salt: str = ""
) -> DataFrame:
    """Keep AT MOST ``n`` rows per group, chosen deterministically by hash
    order — the "cap every domain at N pages" anti-over-representation rule
    (fractional quotas can't bound a group whose size is unknown upfront).
    The winner set is a pure function of (group, key, salt): stable across
    runs, engines, and partitionings, and rotating the salt redraws it.

    Scale shape: unlike the fractional samplers above this is NOT
    predicate-pushable — an exact per-group cap needs a rank, so it costs
    one shuffle on ``group_col`` (row_number over hash order; hot groups
    sort-spill rather than OOM since row_number needs no full-group
    buffering). When an approximate cap suffices at extreme skew, compose
    ``hash_sample`` with a per-group fraction ~ n/size(group) instead and
    keep the zero-shuffle scan.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        hash_draw(key_col, salt).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )
