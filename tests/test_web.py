"""Web-corpus operators: URL canonicalization edge cases, registrable
domain, PageRank invariants, and the canonical-vs-raw dedup property.

The value-level oracle for all five queries_web entries runs in
test_queries_oracle (they are REGISTRY rows); this file pins the edge
semantics the oracle's synthetic URLs don't isolate one by one.
"""

import pytest
from pyspark.sql import functions as F

from log_server_spark.operators.web import (
    normalize_url,
    pagerank,
    registrable_domain,
)
from log_server_spark.queries_web import synth_urls


CASES = [
    # fragment stripped
    ("https://a.com/x#frag", "https://a.com/x"),
    # scheme+host lowercased, path case preserved
    ("HTTPS://A.COM/Path/X", "https://a.com/Path/X"),
    # default ports stripped, non-default kept
    ("http://a.com:80/x", "http://a.com/x"),
    ("https://a.com:443/x", "https://a.com/x"),
    ("https://a.com:8080/x", "https://a.com:8080/x"),
    ("http://a.com:443/x", "http://a.com:443/x"),  # 443 is not http's default
    # www stripped
    ("https://www.a.com/x", "https://a.com/x"),
    # tracking params dropped, real params kept, separators repaired
    ("https://a.com/x?utm_source=s", "https://a.com/x"),
    ("https://a.com/x?utm_source=s&id=3", "https://a.com/x?id=3"),
    ("https://a.com/x?id=3&utm_source=s", "https://a.com/x?id=3"),
    ("https://a.com/x?id=3&fbclid=f&q=2", "https://a.com/x?id=3&q=2"),
    ("https://a.com/x?utm_a=1&utm_b=2", "https://a.com/x"),
    # trailing slash canonicalized (also ahead of a query)
    ("https://a.com/x/", "https://a.com/x"),
    ("https://a.com/x/?id=1", "https://a.com/x?id=1"),
    ("https://a.com/", "https://a.com"),
    # everything at once
    (
        "HTTP://WWW.A.COM:80/Path/?utm_campaign=c&id=9#sec",
        "http://a.com/Path?id=9",
    ),
]


def test_normalize_url_edge_cases(spark):
    df = spark.createDataFrame([(raw,) for raw, _ in CASES], ["url"])
    got = [r[0] for r in df.select(normalize_url("url")).collect()]
    want = [norm for _, norm in CASES]
    assert got == want


DOMAIN_CASES = [
    ("https://a.b.site.com/x", "site.com"),
    ("https://site.co.uk/x", "site.co.uk"),
    ("https://news.site.co.uk/x", "site.co.uk"),
    ("https://site.io:8080/x", "site.io"),
    ("https://user@site.org/x", "site.org"),
]


def test_registrable_domain(spark):
    df = spark.createDataFrame([(u,) for u, _ in DOMAIN_CASES], ["url"])
    got = [r[0] for r in df.select(registrable_domain("url")).collect()]
    assert got == [d for _, d in DOMAIN_CASES]


def test_url_dedup_catches_variant_fetches(spark):
    """Distinct raw urls collapse under canonicalization: the synthetic
    corpus has 500 docs over 450 resources (pid = doc_id % 450), and the
    variant knobs (case/www/ports/tracking/slash/fragment) are keyed on
    doc_id — so raw-string dedup keeps MORE rows than canonical dedup."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    pages = synth_urls(docs)
    n_raw = pages.select("url").distinct().count()
    n_norm = pages.select(normalize_url(F.col("url")).alias("u")).distinct().count()
    assert n_norm == 450
    assert n_raw > n_norm  # raw dedup misses the variant duplicates


def test_pagerank_conserves_mass_on_closed_graph(spark):
    """On a graph where every dst exists (a ring), total rank mass is
    exactly 1 (teleport + damped contributions, no leakage)."""
    n = 20
    nodes = spark.range(n).select(F.col("id").alias("node"))
    edges = spark.range(n).select(
        F.col("id").alias("src"), ((F.col("id") + 1) % n).alias("dst")
    )
    ranks = pagerank(nodes, edges, iters=4)
    total = ranks.agg(F.sum("pr")).collect()[0][0]
    assert total == pytest.approx(1.0, abs=1e-9)
    # ring symmetry: every node has identical rank
    vals = [r.pr for r in ranks.collect()]
    assert max(vals) - min(vals) < 1e-12


def test_pagerank_favors_in_link_hubs(spark):
    """A star (everyone links to node 0) ranks node 0 far above the rest."""
    n = 10
    nodes = spark.range(n).select(F.col("id").alias("node"))
    edges = (
        spark.range(n)
        .filter(F.col("id") != 0)
        .select(F.col("id").alias("src"), F.lit(0).alias("dst"))
    )
    ranks = {r.node: r.pr for r in pagerank(nodes, edges, iters=3).collect()}
    assert ranks[0] > 5 * ranks[1]
    leaf_vals = [ranks[i] for i in range(1, n)]
    assert max(leaf_vals) == pytest.approx(min(leaf_vals), rel=1e-12)


def test_snapshot_diff_all_four_statuses(spark):
    from log_server_spark.operators.web import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "url long, fp string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B2"), (4, "d")], "url long, fp string"
    )
    out = {r["url"]: r["status"] for r in snapshot_diff(old, new, "url", "fp").collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_snapshot_diff_null_fingerprints_key_on_presence(spark):
    from log_server_spark.operators.web import snapshot_diff

    old = spark.createDataFrame(
        [(1, None), (2, None), (3, "c")], "url long, fp string"
    )
    new = spark.createDataFrame(
        [(1, "x"), (2, None), (4, None)], "url long, fp string"
    )
    out = {r["url"]: r["status"] for r in snapshot_diff(old, new, "url", "fp").collect()}
    # NULL fingerprints never read as absence; NULL==NULL is unchanged
    assert out == {1: "changed", 2: "unchanged", 3: "removed", 4: "added"}


def test_normalize_url_query_value_slashes_preserved(spark):
    from log_server_spark.operators.web import normalize_url, registrable_domain

    rows = [
        # trailing slash inside a query VALUE is content, not path junk
        ("https://a.com/x?next=/home/", "https://a.com/x?next=/home/"),
        # interior '/?' inside a query value must not be rewritten
        ("https://a.com/r?u=https://b.com/?x=1", "https://a.com/r?u=https://b.com/?x=1"),
        # path slashes before the query ARE stripped
        ("https://a.com/x/?y=1", "https://a.com/x?y=1"),
        ("https://a.com/x///", "https://a.com/x"),
        # www strip keeps two-label hosts intact (www.com is a real domain)
        ("https://www.com/x", "https://www.com/x"),
        ("https://www.example.com/x", "https://example.com/x"),
    ]
    df = spark.createDataFrame(rows, "url string, want string")
    out = df.select("url", "want", normalize_url("url").alias("got")).collect()
    for r in out:
        assert r["got"] == r["want"], (r["url"], r["got"], r["want"])
    # single-label hosts are their own registrable domain, never ''
    doms = spark.createDataFrame(
        [("http://localhost/x",), ("https://www.com/a",)], "u string"
    ).select(registrable_domain("u").alias("d")).collect()
    assert [r["d"] for r in doms] == ["localhost", "www.com"]


def test_kmeans_iters_zero_raises(spark):
    import pytest as _pytest

    from log_server_spark.operators.similarity import kmeans_assign

    df = spark.createDataFrame([(1, [0.0, 1.0])], "vec_id long, embedding array<double>")
    with _pytest.raises(ValueError, match="iters"):
        kmeans_assign(df, k=1, iters=0)
