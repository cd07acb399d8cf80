"""Temporal joins the reference engine lacks (SURVEY §2.3 note: "no
sort-merge/theta/range/as-of/interval joins exist in the reference") but a
log/telemetry engine at 10^12-row scale needs constantly: attach the most
recent dimension/state change to each event (as-of), and match events to
time intervals (range/interval join).

Both are implemented WITHOUT non-equi joins. Spark plans a naive
``l.ts BETWEEN r.lo AND r.hi`` predicate as BroadcastNestedLoopJoin (or a
cartesian product when neither side broadcasts) — O(|L| * |R|) and
job-fatal at scale. Instead:

- :func:`asof_join` is the union-marker window trick: tag both sides,
  union, ONE shuffle on the join key, and a running ``last(_, ignorenulls)``
  carries each right row forward to the left rows that follow it in time.
  Cost is a single sort-shuffle over |L| + |R| rows — the same shape as the
  sessionize window and strictly cheaper than any join-based formulation.
- :func:`range_join` chunks time into fixed-width buckets: each interval
  explodes to the buckets it covers, each point maps to exactly one bucket,
  and a plain equi-join on (keys…, bucket) + a residual range filter yields
  the pairs. With bucket width >= max interval length every interval covers
  at most 2 buckets, so the explode is O(2|R|) and the join is hash/SMJ on
  a co-partitionable key — AQE-skew-splittable, broadcastable when the
  interval side is small, never a nested loop. A point joins an interval
  through exactly one bucket (its own), so no post-join dedup is needed.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_L, _R = "__asof_is_left", "__asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    tiebreak: str | None = None,
    tolerance_us: int | None = None,
    direction: str = "backward",
    allow_exact_matches: bool = True,
) -> DataFrame:
    """As-of join: every ``left`` row gains the ``payload`` columns of the
    LATEST ``right`` row with the same ``on`` keys and
    ``right_ts <= left_ts`` (``direction="backward"``, the default) or the
    EARLIEST right row with ``right_ts >= left_ts`` (``"forward"``) —
    exact-timestamp matches included by default;
    ``allow_exact_matches=False`` restricts to strictly-before/after, both
    matching the ``pandas.merge_asof`` flag. Left rows with no match keep
    NULL payload (left-outer semantics).

    ``payload`` columns must exist on ``right`` and not on ``left``.
    ``tiebreak`` (a right-side column, e.g. an event id) makes the winner
    deterministic when several right rows share one timestamp: the row with
    the greatest tiebreak value wins. ``tolerance_us`` drops matches more
    than that many microseconds away.

    Scale shape: one shuffle, partitioned by ``on`` — no join operator at
    all. Timestamps compare at full microsecond precision. ``forward`` is
    ``backward`` on a negated time axis — same single-window plan, and the
    tolerance subtraction lands the right way around for free.
    ``"nearest"`` carries BOTH directions over the same exchange (two
    window specs sharing one partitioning = one shuffle, two sorts) and
    picks the closer match, backward on an exact-distance tie (the
    ``pandas.merge_asof`` rule).
    """
    if direction == "nearest":
        return _asof_nearest(
            left, right, on, left_ts, right_ts, payload, tiebreak, tolerance_us,
            allow_exact_matches,
        )
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    sign = 1 if direction == "backward" else -1
    lt = left.withColumn(
        _R, F.lit(sign) * F.unix_micros(F.col(left_ts).cast("timestamp"))
    ).withColumn(_L, F.lit(1))
    rt = right.select(
        *on,
        (F.lit(sign) * F.unix_micros(F.col(right_ts).cast("timestamp"))).alias(_R),
        *payload,
        *( [F.col(tiebreak).alias("__asof_tie")] if tiebreak else [] ),
    ).withColumn(_L, F.lit(0))
    both = lt.unionByName(rt, allowMissingColumns=True)
    # allow_exact_matches: right rows order BEFORE left rows at equal ts so
    # the running carry has seen them (exact matches visible); flipping the
    # marker order scans left rows FIRST at equal ts, hiding same-instant
    # right rows — pandas' allow_exact_matches=False. Among right ties the
    # greatest tiebreak sorts last, so last() picks it.
    order = [F.col(_R).asc(), F.col(_L).asc() if allow_exact_matches else F.col(_L).desc()]
    if tiebreak:
        order.append(F.col("__asof_tie").asc_nulls_first())
    w = Window.partitionBy(*on).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    # ONE struct carries (matched right ts, payload…) atomically: separate
    # last() calls per column could pair a newer row's ts with an older
    # row's value whenever a right payload column is NULL
    match = F.last(
        F.when(
            F.col(_L) == 0,
            F.struct(F.col(_R).alias("__rts"), *[F.col(c).alias(c) for c in payload]),
        ),
        ignorenulls=True,
    ).over(w)
    out = both.select("*", match.alias("__asof_m")).filter(F.col(_L) == 1)
    m = F.col("__asof_m")
    if tolerance_us is not None:
        m = F.when(
            F.col(_R) - F.col("__asof_m.__rts") > F.lit(tolerance_us), F.lit(None)
        ).otherwise(m)
    return out.select(
        *left.columns, *[m.getField(c).alias(c) for c in payload]
    )


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    tiebreak: str | None,
    tolerance_us: int | None,
    allow_exact_matches: bool = True,
) -> DataFrame:
    """Nearest-match as-of: both directional carries over ONE exchange
    (same partitionBy, two orderings), then pick the closer; backward wins
    an exact-distance tie."""
    lt = left.withColumn(
        _R, F.unix_micros(F.col(left_ts).cast("timestamp"))
    ).withColumn(_L, F.lit(1))
    rt = right.select(
        *on,
        F.unix_micros(F.col(right_ts).cast("timestamp")).alias(_R),
        *payload,
        *( [F.col(tiebreak).alias("__asof_tie")] if tiebreak else [] ),
    ).withColumn(_L, F.lit(0))
    both = lt.unionByName(rt, allowMissingColumns=True)
    tie = [F.col("__asof_tie").asc_nulls_first()] if tiebreak else []
    mk = F.col(_L).asc() if allow_exact_matches else F.col(_L).desc()
    w_b = Window.partitionBy(*on).orderBy(
        F.col(_R).asc(), mk, *tie
    ).rowsBetween(Window.unboundedPreceding, 0)
    w_f = Window.partitionBy(*on).orderBy(
        F.col(_R).desc(), mk, *tie
    ).rowsBetween(Window.unboundedPreceding, 0)
    ms = F.when(
        F.col(_L) == 0,
        F.struct(F.col(_R).alias("__rts"), *[F.col(c).alias(c) for c in payload]),
    )
    out = both.select(
        "*",
        F.last(ms, ignorenulls=True).over(w_b).alias("__mb"),
        F.last(ms, ignorenulls=True).over(w_f).alias("__mf"),
    ).filter(F.col(_L) == 1)
    mb, mf = F.col("__mb"), F.col("__mf")
    d_b = F.col(_R) - mb.getField("__rts")
    d_f = mf.getField("__rts") - F.col(_R)
    if tolerance_us is not None:
        mb = F.when(d_b > F.lit(tolerance_us), F.lit(None)).otherwise(mb)
        mf = F.when(d_f > F.lit(tolerance_us), F.lit(None)).otherwise(mf)
    pick = (
        F.when(mb.isNull(), mf)
        .when(mf.isNull(), mb)
        .when(d_b <= d_f, mb)
        .otherwise(mf)
    )
    return out.select(
        *left.columns, *[pick.getField(c).alias(c) for c in payload]
    )


OPEN_END_US = (1 << 63) - 1  # valid_to for the current (still-open) version


def scd2_intervals(
    changes: DataFrame,
    on: list[str],
    ts_col: str,
    payload: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Turn a change log into SCD2 validity intervals: each (keys…, payload)
    version becomes a row with ``valid_from_us`` (its change timestamp) and
    ``valid_to_us`` (the NEXT version's timestamp, or :data:`OPEN_END_US`
    for the current version) — half-open ``[from, to)``, so every instant
    maps to exactly one version. One window (lead) over one shuffle on the
    key. Several changes sharing one (key, ts) yield zero-length intervals
    for all but the ``tiebreak``-greatest, which inherits the real span —
    the same winner :func:`asof_join` picks.
    """
    order = [F.col(ts_col).asc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(*on).orderBy(*order)
    frm = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return changes.select(
        *on,
        *payload,
        frm.alias("valid_from_us"),
        F.coalesce(F.lead(frm).over(w), F.lit(OPEN_END_US)).alias("valid_to_us"),
    )


def asof_enrich_intervals(
    events: DataFrame,
    intervals: DataFrame,
    on: list[str],
    event_ts: str,
    how: str = "left",
) -> DataFrame:
    """Enrich events with the version valid at each event's timestamp:
    equi-join on the keys plus the ``[valid_from_us, valid_to_us)`` range
    residual. Equivalent to backward :func:`asof_join` against the change
    log, but expressed as a plain join against a PRECOMPUTED interval frame
    — which makes it legal in Structured Streaming (stream-static join;
    the window-carry formulation is not) and lets a dimension-sized
    interval side broadcast. Batch == stream is pytest-gated.
    """
    ev_us = F.unix_micros(F.col(event_ts).cast("timestamp"))
    e = events.withColumn("__ev_us", ev_us)
    cond = (ev_us >= F.col("valid_from_us")) & (ev_us < F.col("valid_to_us"))
    keys = [e[k] == intervals[k] for k in on]
    out = e.join(intervals, functools.reduce(lambda a, b: a & b, keys) & cond, how)
    return out.select(
        *[e[c] for c in events.columns],
        *[intervals[c] for c in intervals.columns if c not in set(on) | {"valid_from_us", "valid_to_us"}],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_us: str,
    start_us: str,
    end_us: str,
    bucket_us: int,
    bounds: str = "(]",
) -> DataFrame:
    """Inner join of ``points`` to every ``intervals`` row with matching
    ``on`` keys whose [start_us, end_us] range contains the point (bound
    inclusivity per ``bounds``: one of ``"[]" "[)" "(]" "()"``). All three
    time columns are epoch-microsecond bigints supplied by the caller.

    ``bucket_us`` should be >= the longest interval so each interval
    explodes to <= 2 buckets; correctness does not depend on it (an interval
    spanning k buckets explodes to k rows), only the explode factor does.
    """
    if bounds not in ("[]", "[)", "(]", "()"):
        raise ValueError(f"bounds must be one of [] [) (] (), got {bounds!r}")
    # integer DIV on both sides: float division could bucket a boundary
    # timestamp differently on the point and interval sides
    b = int(bucket_us)
    # drop negative-length intervals BEFORE the explode: they can never
    # match (lo > hi fails both bound filters), but F.sequence(a, b) with
    # a > b silently generates a DESCENDING sequence — a reversed interval
    # of span k would explode to k garbage bucket rows instead of zero
    intervals = intervals.where(F.col(end_us) >= F.col(start_us))
    iv = intervals.withColumn(
        "__rj_b",
        F.explode(
            F.sequence(
                F.expr(f"CAST({start_us} AS BIGINT) DIV {b}"),
                F.expr(f"CAST({end_us} AS BIGINT) DIV {b}"),
            )
        ),
    )
    pt = points.withColumn("__rj_b", F.expr(f"CAST({point_us} AS BIGINT) DIV {b}"))
    lo = F.col(point_us) >= F.col(start_us) if bounds[0] == "[" else F.col(
        point_us
    ) > F.col(start_us)
    hi = F.col(point_us) <= F.col(end_us) if bounds[1] == "]" else F.col(
        point_us
    ) < F.col(end_us)
    return pt.join(iv, on + ["__rj_b"]).filter(lo & hi).drop("__rj_b")
