"""Web-corpus operators: URL canonicalization, registrable-domain
extraction, and link-graph PageRank.

These are the crawl-side primitives of a Common-Crawl-style training-data
pipeline (the north-star input keys pages by ``url``):

- URL canonicalization is the key-normalization step ahead of exact URL
  dedup — two fetches of the same resource differ in scheme/host case,
  ``www.`` prefix, default port, tracking parameters, trailing slashes and
  fragments, and must collapse to one key before the first-wins dedup
  (the same role ``parse_ref.normalize_table`` plays for table names in the
  reference pipeline, reference/log-server-db OldLogReader.scala's header
  normalization — here applied to the page key instead of the record key).
- The registrable domain is the natural partition/skew unit of a crawl:
  hot domains are exactly the write-side skew the pipeline's salted sinks
  defuse (plans/pipeline.py volume-sized salt), and the grouping key for
  per-site quality decisions.
- PageRank over the host/document link graph is the classic corpus-quality
  weight (crawl frontier ordering, quality-weighted sampling).

Everything here is JVM codegen (regexp/string expressions) — no Python in
the hot path. PageRank is the textbook join + groupBy iteration: one
shuffle per iteration keyed on ``dst``, rank state O(|nodes|), no
collect/broadcast of the graph. Regex note: every pattern is RE2-safe (no
lookahead/backreference in the PATTERN) so the same normalization is
expressible verbatim in engines whose regex is RE2 (the DuckDB oracles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Minimal public-suffix sample: two-level suffixes where the registrable
# domain is the last THREE labels. A production deployment swaps in the
# full public-suffix list as a broadcast join; the heuristic keeps this
# module dependency-free and oracle-expressible.
TWO_LEVEL_SUFFIXES = ("co.uk", "com.au", "co.jp")

# Tracking query parameters stripped during canonicalization.
TRACKING_PARAM_RE = r"(?:utm_[^=&]*|fbclid|gclid)"


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_url(col) -> Column:
    """Canonicalize a URL string; pure codegen, order-sensitive steps.

    1. strip the fragment (``#...``)
    2. lowercase the scheme://authority head (path/query case preserved)
    3. strip default ports (``http...:80``, ``https...:443``)
    4. strip a leading ``www.`` host label — only when at least two labels
       remain (``www.com`` IS the registrable domain of a real site; a
       bare-host strip would destroy it)
    5. drop tracking params (``utm_*``, ``fbclid``, ``gclid``), keeping
       the remaining query string intact
    6. strip trailing slashes on the PATH (also just before ``?``) and a
       dangling lone ``?`` — anchored so slashes inside query-string
       VALUES (``?next=/home/``) are never touched: two URLs differing
       inside a query value are different resources
    """
    u = _c(col)
    # 1. fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # 2. lowercase scheme + authority: everything before the first /?# past
    # the // — path and query keep their case.
    head = F.regexp_extract(u, r"^[^/?#]*//[^/?#]*", 0)
    u = F.concat(F.lower(head), u.substr(F.length(head) + 1, F.length(u)))
    # 3. default ports (RE2-safe: capture the tail instead of a lookahead;
    # an unmatched optional group substitutes as empty in both dialects)
    u = F.regexp_replace(u, r"^(http://[^/?#:]*):80([/?#].*)?$", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/?#:]*):443([/?#].*)?$", r"$1$2")
    # 4. www. — the captured tail requires a further dot, so a two-label
    # host (www.com) keeps its www (RE2-safe: capture, not lookahead)
    u = F.regexp_replace(u, r"^(https?://)www\.([^/?#.]*\.)", r"$1$2")
    # 5. tracking params: interior `&p=v` first, then a leading `?p=v&`,
    # then a query that is nothing but tracking params
    u = F.regexp_replace(u, r"&" + TRACKING_PARAM_RE + r"=[^&]*", "")
    u = F.regexp_replace(u, r"\?" + TRACKING_PARAM_RE + r"=[^&]*&", "?")
    u = F.regexp_replace(u, r"\?" + TRACKING_PARAM_RE + r"=[^&]*$", "")
    # 6. trailing slashes and a dangling '?' — both anchored through a
    # lazy [^?]*? prefix so only PATH slashes (before the first '?') are
    # stripped, never slashes inside a query value
    u = F.regexp_replace(u, r"^([^?]*?)/+\?", r"$1?")
    u = F.regexp_replace(u, r"^([^?]*?)/+$", r"$1")
    u = F.regexp_replace(u, r"\?$", "")
    return u


def host_of(col) -> Column:
    """Hostname of a (normalized) URL — authority minus port/userinfo."""
    return F.regexp_extract(_c(col), r"^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)", 1)


def registrable_domain(col) -> Column:
    """Registrable domain of a (normalized) URL: last two host labels, or
    last three when the host ends in a known two-level public suffix; a
    single-label host (``localhost``, an intranet name) is its own domain
    — the previous silent '' would have pooled all such pages into one
    empty-string group in the skew profile."""
    host = host_of(col)
    two_level = "|".join(s.replace(".", r"\.") for s in TWO_LEVEL_SUFFIXES)
    return (
        F.when(
            host.rlike(r"\.(" + two_level + r")$"),
            F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+)$", 1),
        )
        .when(host.rlike(r"\."), F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1))
        .otherwise(host)
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    n_nodes: int | None = None,
) -> DataFrame:
    """PageRank over ``edges(src, dst)`` for the node set ``nodes(node)``.

    Textbook power iteration as join + groupBy: per iteration one shuffle
    keyed on ``dst`` (the contribution aggregate) and a left join back onto
    the node set (so sinks with no in-links receive the teleport term).
    Contributions divide by the src's out-degree. Mass-conservation
    caveats, both the standard simple-power-iteration convention and
    exactly what the unrolled SQL oracle computes: a DANGLING node (no
    out-edges) drops its rank mass each iteration rather than
    redistributing it, and edges whose ``dst`` is not in ``nodes`` leak
    theirs — so ranks sum to < 1 on graphs with dangling nodes and
    ``pr * N`` has mean <= 1.0, not exactly 1.

    Scale shape: rank state is O(|nodes|), the per-iteration cost is one
    shuffle of O(|edges|) contributions — no collect, no broadcast of the
    graph. ``nodes.count()`` is the one driver-side scalar (pass
    ``n_nodes`` to skip it when the caller already knows the count). For
    iters beyond ~10 the caller should checkpoint the rank frame (see
    dedup_text.components_from_pairs for the same pattern); at the 3-5
    iterations typical for corpus weighting the plan stays shallow enough
    that lineage growth is a non-issue.
    """
    n = n_nodes if n_nodes is not None else nodes.count()
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    # Round 6, tried and REVERTED: persisting this frame (it is referenced
    # by every iteration's subplan, and no ReusedExchange fires across the
    # repeated subtrees) measured 7x WORSE cpu (3.6 -> 28 cpu-s, wall 1.4
    # -> 2.2 s at sf0.1 local[32]): caching replaces the codegen
    # parquet-scan + broadcast-join pipeline with an in-memory-columnar
    # round-trip and de-broadcasts the joins via the cached relation's
    # statistics. The repeated subtree is the cheaper evaluation; at
    # cluster scale a caller iterating >> 3 rounds can persist the frame
    # themselves (the operator takes a DataFrame — persist composes from
    # outside).
    edges_w = edges.join(deg, "src").select("src", "dst", "outdeg")
    ranks = nodes.select("node", F.lit(1.0 / n).alias("pr"))
    for _ in range(iters):
        contrib = (
            edges_w.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("pr") / F.col("outdeg")).alias("c"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping) * F.coalesce("c", F.lit(0.0))
            ).alias("pr"),
        )
    return ranks


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    fp_col: str,
) -> DataFrame:
    """Crawl-to-crawl delta report: (key, status) with status in
    added / removed / changed / unchanged — the recrawl companion to
    incremental dedup: it decides WHICH pages even enter the ingest DAG
    (added + changed), so the per-snapshot cost is the delta's, not the
    corpus's.

    Scale shape: both sides reduce to (key, fingerprint) BEFORE the join —
    16-byte md5 rows, never the page bytes — then ONE full-outer
    sort-merge join on the key. With both snapshots stored bucketed by the
    key (the records_keys discipline) the exchange disappears entirely;
    otherwise it is one shuffle of two fingerprint tables. Output is
    corpus-sized; downstream consumers filter to added/changed, which is
    delta-sized.
    """
    # presence is keyed on an explicit marker, NOT on fingerprint nullness:
    # a NULL fingerprint (e.g. NULL text) must read as "present" or the
    # row would be misclassified added/removed
    o = old.select(
        F.col(key_col).alias("k"),
        F.col(fp_col).alias("fp_old"),
        F.lit(True).alias("in_old"),
    )
    n = new.select(
        F.col(key_col).alias("k"),
        F.col(fp_col).alias("fp_new"),
        F.lit(True).alias("in_new"),
    )
    return (
        o.join(n, "k", "full_outer")
        .select(
            F.col("k").alias(key_col),
            F.when(F.col("in_old").isNull(), F.lit("added"))
            .when(F.col("in_new").isNull(), F.lit("removed"))
            .when(F.col("fp_old").eqNullSafe(F.col("fp_new")), F.lit("unchanged"))
            .otherwise(F.lit("changed"))
            .alias("status"),
        )
    )
