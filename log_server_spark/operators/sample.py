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


def mixture_sample(
    df: DataFrame,
    source_col: str,
    key_col: str,
    weights: dict[str, float],
    fraction: float,
    salt: str = "",
    default_weight: float = 1.0,
) -> DataFrame:
    """Resample toward a target source MIXTURE: keep ~``fraction`` of the
    corpus with the kept set's composition following ``weights`` (relative
    shares per source; absent sources get ``default_weight``) — the
    "upweight curated sources, downweight the crawl tail" mixing step that
    a plain per-stratum fraction can't express when the target is stated
    as weights and the source sizes are only known from the data.

    Per-source keep fraction: f_s = min(1, fraction * N * (w_s / W) / n_s)
    with N = corpus rows, n_s = source rows, W = sum of weights over the
    sources PRESENT. The min-clip is single-pass (no waterfilling
    iteration): a source too small for its target keeps everything and the
    realized total lands slightly under ``fraction`` — the standard
    practical approximation, and deterministic.

    Scale shape: fully in-plan — the per-source frame is one model-sized
    aggregate joined back by BROADCAST; membership stays the md5-threshold
    predicate of ``hash_sample`` (pure function of (key, salt): stable
    across runs/engines/partitionings, salt-rotatable), so the corpus pass
    is a scan + broadcast probe, no shuffle of the data, no collect.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    w = F.lit(float(default_weight))
    for s, wt in sorted(weights.items()):
        w = F.when(F.col(source_col) == s, F.lit(float(wt))).otherwise(w)
    cw = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n")).withColumn("__w", w)
    tots = cw.agg(F.sum("__n").alias("__N"), F.sum("__w").alias("__W"))
    # tots derives from cw, so the cross join is a self-join: alias both
    # sides to keep column resolution unambiguous
    per = cw.alias("c").crossJoin(F.broadcast(tots).alias("t")).select(
        F.col("c." + source_col).alias(source_col),
        F.least(
            F.lit(1.0),
            F.lit(fraction)
            * F.col("t.__N").cast("double")
            * F.col("c.__w")
            / F.col("t.__W")
            / F.col("c.__n").cast("double"),
        ).alias("__f"),
    )
    draw = F.conv(hash_draw(key_col, salt), 16, 10).cast("double")
    # NULL-safe equi-join: groupBy puts NULL sources in their own group
    # (counted in __N/__W), so the probe must reach them too — a plain
    # equi-join would silently drop NULL-source rows while their counts
    # still deflate every other source's fraction
    p = F.broadcast(per.withColumnRenamed(source_col, "__src"))
    return (
        df.join(p, F.col(source_col).eqNullSafe(F.col("__src")))
        .where(draw < F.col("__f") * F.lit(4294967296.0))
        .drop("__f", "__src")
    )
