"""Web-corpus queries: URL canonicalization/dedup, domain skew profile,
link-graph PageRank, and a fixed-weight quality classifier.

Same contract as queries_ml.py: Spark impl + DuckDB oracle with identical
column names, every value-checked. The URL family synthesizes messy URLs
deterministically FROM the driver's ``documents`` table with Spark
expressions (the oracle rebuilds the identical strings in SQL), split into
two knob sets:

- CORE components keyed on ``pid = doc_id % 450`` — scheme, host, path,
  real query params, non-default port. Distinct docs sharing a pid are the
  SAME resource.
- VARIANT components keyed on ``doc_id`` — host/scheme case, ``www.``,
  default ports, tracking params, trailing slash, fragment. These differ
  between fetches of the same resource, so RAW-string dedup misses the
  duplicates; canonicalization (operators/web.py:normalize_url) collapses
  them — exactly the property ``url_dedup`` demonstrates.

Host ids are skewed zipf-ishly (K = floor(sqrt(pid)) puts ~9% of
the corpus on the hottest domain) so ``domain_stats`` exercises the
heavy-hitter detection that feeds the pipeline's salt sizing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from log_server_spark.functions.text import quality_features
from log_server_spark.operators.web import (
    normalize_url,
    pagerank,
    registrable_domain,
)
from log_server_spark.plan_util import spread_small_input


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# URL synthesis (Spark expressions; the oracle rebuilds the same strings)
# ---------------------------------------------------------------------------

_TLDS = ["com", "org", "co.uk", "io"]


def synth_urls(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, n_chars, url) with the core/variant knob split
    documented in the module docstring."""
    did = F.col("doc_id")
    pid = did % 450
    # pid < 450, so no modulus needed — keep the formula textually
    # identical to the SQL twin (floor(sqrt(pid)))
    k = F.floor(F.sqrt(pid.cast("double"))).cast("long")
    tld = (
        F.when(k % 4 == 0, _TLDS[0])
        .when(k % 4 == 1, _TLDS[1])
        .when(k % 4 == 2, _TLDS[2])
        .otherwise(_TLDS[3])
    )
    scheme = F.when(pid % 2 == 0, "https").otherwise("http")
    host_core = F.concat(F.lit("site"), k.cast("string"), F.lit("."), tld)
    host_www = F.when(did % 5 == 0, F.concat(F.lit("WWW."), host_core)).otherwise(host_core)
    host_cased = F.when(did % 7 == 3, F.upper(host_www)).otherwise(host_www)
    scheme_cased = F.when(did % 13 == 4, F.upper(scheme)).otherwise(scheme)
    port = (
        F.when(pid % 13 == 5, ":8080")
        .when((did % 7 == 1) & (pid % 2 == 1), ":80")
        .when((did % 7 == 2) & (pid % 2 == 0), ":443")
        .otherwise("")
    )
    path = F.concat(
        F.lit("/s/p"), pid.cast("string"), F.when(did % 3 == 0, "/").otherwise("")
    )
    q_real = F.when(
        pid % 3 == 0, F.concat(F.lit("?id="), (pid % 9).cast("string"))
    ).otherwise("")
    tracking = (
        F.when(did % 4 == 0, "utm_source=feed&utm_campaign=x")
        .when(did % 4 == 1, "fbclid=zz1")
        .otherwise("")
    )
    query = F.concat(
        q_real,
        F.when(tracking == "", "").otherwise(
            F.concat(F.when(q_real == "", "?").otherwise("&"), tracking)
        ),
    )
    frag = F.when(did % 6 == 0, "#sec-2").otherwise("")
    url = F.concat(scheme_cased, F.lit("://"), host_cased, port, path, query, frag)
    return docs.select("doc_id", "n_chars", url.alias("url"))


# The identical synthesis in DuckDB SQL, as a CTE body over `documents`.
_SQL_SYNTH = r"""
  SELECT doc_id, n_chars,
    (CASE WHEN doc_id % 13 = 4 THEN upper(scheme) ELSE scheme END)
    || '://'
    || (CASE WHEN doc_id % 7 = 3 THEN upper(host_www) ELSE host_www END)
    || (CASE WHEN pid % 13 = 5 THEN ':8080'
             WHEN doc_id % 7 = 1 AND pid % 2 = 1 THEN ':80'
             WHEN doc_id % 7 = 2 AND pid % 2 = 0 THEN ':443'
             ELSE '' END)
    || '/s/p' || pid || (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END)
    || q_real
    || (CASE WHEN tracking = '' THEN ''
             ELSE (CASE WHEN q_real = '' THEN '?' ELSE '&' END) || tracking END)
    || (CASE WHEN doc_id % 6 = 0 THEN '#sec-2' ELSE '' END) AS url
  FROM (
    SELECT doc_id, n_chars, pid, scheme, q_real, tracking,
      CASE WHEN doc_id % 5 = 0 THEN 'WWW.' || host_core ELSE host_core END AS host_www
    FROM (
      SELECT doc_id, n_chars, pid,
        CASE WHEN pid % 2 = 0 THEN 'https' ELSE 'http' END AS scheme,
        'site' || k || '.' ||
          (CASE WHEN k % 4 = 0 THEN 'com' WHEN k % 4 = 1 THEN 'org'
                WHEN k % 4 = 2 THEN 'co.uk' ELSE 'io' END) AS host_core,
        CASE WHEN pid % 3 = 0 THEN '?id=' || (pid % 9) ELSE '' END AS q_real,
        CASE WHEN doc_id % 4 = 0 THEN 'utm_source=feed&utm_campaign=x'
             WHEN doc_id % 4 = 1 THEN 'fbclid=zz1' ELSE '' END AS tracking
      FROM (SELECT doc_id, n_chars, doc_id % 450 AS pid,
                   CAST(floor(sqrt(CAST(doc_id % 450 AS DOUBLE))) AS BIGINT) AS k
            FROM documents)
    )
  )
"""

# The identical normalization in DuckDB SQL over a column `url`
# (RE2 dialect; 'g' = global, matching Spark's replace-all semantics).
_SQL_NORM = r"""
    regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(regexp_replace(
        lower(regexp_extract(u1, '^[^/?#]*//[^/?#]*'))
          || substr(u1, length(regexp_extract(u1, '^[^/?#]*//[^/?#]*')) + 1),
        '^(http://[^/?#:]*):80([/?#].*)?$', '\1\2', 'g'),
        '^(https://[^/?#:]*):443([/?#].*)?$', '\1\2', 'g'),
        '^(https?://)www\.([^/?#.]*\.)', '\1\2', 'g'),
        '&(?:utm_[^=&]*|fbclid|gclid)=[^&]*', '', 'g'),
        '\?(?:utm_[^=&]*|fbclid|gclid)=[^&]*&', '?', 'g'),
        '\?(?:utm_[^=&]*|fbclid|gclid)=[^&]*$', '', 'g'),
        '^([^?]*?)/+\?', '\1?', 'g'),
        '^([^?]*?)/+$', '\1', 'g'),
        '\?$', '', 'g')
"""

_SQL_NORMALIZED = rf"""
  SELECT doc_id, n_chars, url, {_SQL_NORM} AS url_norm
  FROM (SELECT doc_id, n_chars, url,
               regexp_replace(url, '#.*$', '', 'g') AS u1
        FROM synth)
"""

# Registrable domain over a normalized-url column `url_norm`.
_SQL_DOMAIN = r"""
    CASE WHEN regexp_matches(host, '\.(co\.uk|com\.au|co\.jp)$')
         THEN regexp_extract(host, '([^.]+\.[^.]+\.[^.]+)$', 1)
         WHEN regexp_matches(host, '\.')
         THEN regexp_extract(host, '([^.]+\.[^.]+)$', 1)
         ELSE host END
"""

_SQL_WITH_DOMAIN = rf"""
  SELECT doc_id, n_chars, url, url_norm, {_SQL_DOMAIN} AS domain
  FROM (SELECT *, regexp_extract(url_norm,
            '^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)', 1) AS host
        FROM normalized)
"""

_SQL_URL_BASE = rf"""
WITH synth AS ({_SQL_SYNTH}),
normalized AS ({_SQL_NORMALIZED}),
with_domain AS ({_SQL_WITH_DOMAIN})
"""


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_url_normalize(spark, sf_dir):
    pages = synth_urls(_t(spark, sf_dir, "documents"))
    norm = normalize_url(F.col("url"))
    return pages.select(
        "doc_id",
        "url",
        norm.alias("url_norm"),
        registrable_domain(norm).alias("domain"),
    )


SQL_URL_NORMALIZE = _SQL_URL_BASE + """
SELECT doc_id, url, url_norm, domain FROM with_domain
"""


def q_url_dedup(spark, sf_dir):
    """First-wins exact dedup on the CANONICAL url (min doc_id kept) —
    catches variant-fetch duplicates raw-string dedup misses."""
    pages = synth_urls(_t(spark, sf_dir, "documents"))
    return (
        pages.select("doc_id", normalize_url(F.col("url")).alias("url_norm"))
        .groupBy("url_norm")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "url_norm")
    )


SQL_URL_DEDUP = _SQL_URL_BASE + """
SELECT min(doc_id) AS doc_id, url_norm FROM normalized GROUP BY url_norm
"""


def q_domain_stats(spark, sf_dir):
    """Per-registrable-domain skew profile: doc count, corpus share, mean
    doc size, heavy-hitter flag (share >= 4%) — the statistic that sizes
    the pipeline's write salt. Global-window share is fine here: the frame
    is already reduced to domain cardinality (tiny)."""
    pages = synth_urls(_t(spark, sf_dir, "documents"))
    norm = normalize_url(F.col("url"))
    per_domain = (
        pages.select(registrable_domain(norm).alias("domain"), "n_chars")
        .groupBy("domain")
        .agg(F.count("*").alias("n_docs"), F.round(F.avg("n_chars"), 4).alias("avg_chars"))
    )
    share = F.round(F.col("n_docs") / F.sum("n_docs").over(Window.partitionBy()), 4)
    return per_domain.select(
        "domain",
        "n_docs",
        "avg_chars",
        share.alias("share"),
        (share >= 0.04).alias("heavy"),
    )


SQL_DOMAIN_STATS = _SQL_URL_BASE + """
SELECT domain, n_docs, avg_chars, share, share >= 0.04 AS heavy
FROM (
  SELECT domain, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars,
         round(count(*) / sum(count(*)) OVER ()::DOUBLE, 4) AS share
  FROM with_domain GROUP BY domain
)
"""


def q_pagerank(spark, sf_dir):
    """3-iteration PageRank (d=0.85) over a deterministic synthetic link
    graph: doc i links to (17*i + 31*k + 7) mod N for k in 0..2 (every
    node has out-degree 3, so no dangling-mass loss here — see the
    operator docstring for that caveat). Emitted rank is pr * N —
    scale-independent rounding, mean 1.0 on this dangling-free graph."""
    docs = _t(spark, sf_dir, "documents")
    n = docs.count()
    nodes = docs.select(F.col("doc_id").alias("node"))
    did = F.col("doc_id")
    edges = docs.select(
        did.alias("src"),
        F.explode(
            F.array(*[(did * 17 + F.lit(31 * k + 7)) % n for k in (0, 1, 2)])
        ).alias("dst"),
    )
    ranks = pagerank(nodes, edges, iters=3, damping=0.85, n_nodes=n)
    return ranks.select(
        F.col("node").alias("doc_id"),
        F.round(F.col("pr") * n, 4).alias("pr_norm"),
    )


SQL_PAGERANK = r"""
WITH nn AS (SELECT count(*) AS n FROM documents),
edges AS (
  SELECT d.doc_id AS src, (d.doc_id * 17 + 31 * g.k + 7) % (SELECT n FROM nn) AS dst
  FROM documents d, (SELECT unnest([0, 1, 2]) AS k) g
),
deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
r0 AS (SELECT doc_id AS node, 1.0 / (SELECT n FROM nn) AS pr FROM documents),
c1 AS (SELECT e.dst AS node, sum(r.pr / dg.outdeg) AS c
       FROM edges e JOIN deg dg USING (src) JOIN r0 r ON r.node = e.src GROUP BY e.dst),
r1 AS (SELECT d.doc_id AS node, 0.15 / (SELECT n FROM nn) + 0.85 * coalesce(c1.c, 0) AS pr
       FROM documents d LEFT JOIN c1 ON c1.node = d.doc_id),
c2 AS (SELECT e.dst AS node, sum(r.pr / dg.outdeg) AS c
       FROM edges e JOIN deg dg USING (src) JOIN r1 r ON r.node = e.src GROUP BY e.dst),
r2 AS (SELECT d.doc_id AS node, 0.15 / (SELECT n FROM nn) + 0.85 * coalesce(c2.c, 0) AS pr
       FROM documents d LEFT JOIN c2 ON c2.node = d.doc_id),
c3 AS (SELECT e.dst AS node, sum(r.pr / dg.outdeg) AS c
       FROM edges e JOIN deg dg USING (src) JOIN r2 r ON r.node = e.src GROUP BY e.dst),
r3 AS (SELECT d.doc_id AS node, 0.15 / (SELECT n FROM nn) + 0.85 * coalesce(c3.c, 0) AS pr
       FROM documents d LEFT JOIN c3 ON c3.node = d.doc_id)
SELECT node AS doc_id, round(pr * (SELECT n FROM nn), 4) AS pr_norm FROM r3
"""


def q_dedup_keep_best(spark, sf_dir):
    """Near-dup clustering composed with model-based scoring: per duplicate
    cluster keep the HIGHEST-q_score member (ties -> lowest doc_id), not
    the arbitrary min-id keeper — the curation rule real pipelines use
    (keep the best copy, drop the rest). Demonstrates that the clustering
    primitive (components_from_pairs) composes with any scoring function.
    Plan shape: the components labels join the scored docs on doc_id, then
    ONE window ranked within cluster_id — output-sensitive, sized by the
    corpus, never by pairs."""
    import os

    from log_server_spark.operators.dedup_text import (
        components_from_pairs,
        minhash_lsh_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text",
        num_hashes=16, bands=8, shingle_n=3, threshold=0.5, base="md5",
    )
    comp = components_from_pairs(
        docs.select("doc_id"), pairs, id_col="doc_id", src_col="id_a", dst_col="id_b",
        checkpoint_dir=os.environ.get("LSS_CHECKPOINT_DIR") or None,
    ).select(F.col("node").alias("doc_id"), F.col("lbl").alias("cluster_id"))
    scored = q_quality_classifier(spark, sf_dir).select("doc_id", "q_score")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("q_score").desc(), F.col("doc_id").asc()
    )
    return (
        comp.join(scored, "doc_id")
        .withColumn("keep", F.row_number().over(w) == 1)
        .select("doc_id", "cluster_id", "q_score", "keep")
    )


def _dedup_keep_best_sql() -> str:
    # the pairs/edges/walk closure comes from queries_ml._closure_ctes —
    # the single shared definition, so this oracle and dedup_clusters
    # can never drift apart
    from log_server_spark.queries_ml import _closure_ctes

    return (
        "WITH RECURSIVE "
        + _closure_ctes()
        + f""",
clus AS (SELECT doc_id, min(lbl) AS cluster_id FROM walk GROUP BY doc_id),
{_SQL_QC_CTES}
SELECT c.doc_id, c.cluster_id, s.q_score,
       (row_number() OVER (PARTITION BY c.cluster_id
                           ORDER BY s.q_score DESC, c.doc_id) = 1) AS keep
FROM clus c JOIN scored s ON s.doc_id = c.doc_id
"""
    )


def q_quality_classifier(spark, sf_dir):
    """Model-based quality filter: a fixed-weight linear classifier (the
    shape of a fasttext/DCLM-style quality model scored at inference time)
    over the engineered quality features, sigmoid score, keep at 0.5.
    Features are the pre-rounded quality_features columns so the arithmetic
    is bit-reproducible across engines; all codegen, no UDF. Map-only with
    interpreted stopword-filter lambdas -> spread the single-split local
    scan (no-op at scale; measured 0.30 -> 0.13 wall steady-state)."""
    docs = spread_small_input(_t(spark, sf_dir, "documents"))
    f = quality_features("text")
    z = (
        F.lit(-2.0)
        + F.lit(3.0) * F.coalesce(f["stopword_ratio"], F.lit(0.0))
        + F.lit(0.5) * F.coalesce(f["space_ratio"], F.lit(0.0))
        - F.lit(4.0) * F.coalesce(f["digit_ratio"], F.lit(0.0))
        - F.lit(2.0) * F.coalesce(f["punct_ratio"], F.lit(0.0))
        + F.lit(0.2) * F.log(F.lit(1.0) + f["n_tokens"])
        - F.lit(0.1) * F.abs(F.coalesce(f["mean_word_len"], F.lit(0.0)) - F.lit(5.0))
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 4)
    return docs.select(
        "doc_id", score.alias("q_score"), (score >= 0.5).alias("keep")
    )


# stopword IN-list derived from the same STOPWORDS_EN that
# quality_features uses on the Spark side (via queries_ml._SW) — a
# hardcoded copy here silently diverged if the list ever changed
def _sw_sql() -> str:
    from log_server_spark.queries_ml import _SW

    return _SW


_SQL_QC_CTES = rf"""feats AS (
  SELECT doc_id,
    CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
    round((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) / nullif(length(text), 0)::DOUBLE, 4) AS punct_ratio,
    round((length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) / nullif(length(text), 0)::DOUBLE, 4) AS digit_ratio,
    round((length(text) - length(regexp_replace(text, '\s', '', 'g'))) / nullif(length(text), 0)::DOUBLE, 4) AS space_ratio,
    round(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                          x -> x IN ({_sw_sql()})))
          / nullif(CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\s+')) END, 0)::DOUBLE, 4) AS stopword_ratio,
    round(length(regexp_replace(text, '\s', '', 'g'))
          / nullif(CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\s+')) END, 0)::DOUBLE, 4) AS mean_word_len
  FROM documents
),
scored AS (
  SELECT doc_id,
    round(1.0 / (1.0 + exp(-(
      -2.0 + 3.0 * coalesce(stopword_ratio, 0.0)
           + 0.5 * coalesce(space_ratio, 0.0)
           - 4.0 * coalesce(digit_ratio, 0.0)
           - 2.0 * coalesce(punct_ratio, 0.0)
           + 0.2 * ln(1.0 + n_tokens)
           - 0.1 * abs(coalesce(mean_word_len, 0.0) - 5.0)
    ))), 4) AS q_score
  FROM feats
)"""

SQL_QUALITY_CLASSIFIER = (
    "WITH " + _SQL_QC_CTES
    + "\nSELECT doc_id, q_score, q_score >= 0.5 AS keep FROM scored\n"
)

SQL_DEDUP_KEEP_BEST = _dedup_keep_best_sql()


def q_snapshot_diff(spark, sf_dir):
    """Crawl-to-crawl delta report (operators/web.py:snapshot_diff): the
    doc_id %% 11 == 0 slice plays pages new to this crawl, %% 13 == 0
    pages that vanished, %% 7 == 0 pages whose content changed ('rev2'
    suffix) — every url labeled added / removed / changed / unchanged by
    fingerprint compare, the gate that keeps recrawl ingest delta-sized."""
    from log_server_spark.operators.web import snapshot_diff

    docs = _t(spark, sf_dir, "documents")
    fp_old = F.md5(F.encode(F.col("text"), "UTF-8"))
    old = docs.where(F.col("doc_id") % 11 != 0).select("doc_id", fp_old.alias("fp"))
    newt = (
        F.when(F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" rev2")))
        .otherwise(F.col("text"))
    )
    new = docs.where(F.col("doc_id") % 13 != 0).select(
        "doc_id", F.md5(F.encode(newt, "UTF-8")).alias("fp")
    )
    return snapshot_diff(old, new, "doc_id", "fp").orderBy("doc_id")


SQL_SNAPSHOT_DIFF = r"""
WITH o AS (
  SELECT doc_id, md5(text) AS fp_old FROM documents WHERE doc_id % 11 <> 0
), n AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 7 = 0 THEN text || ' rev2' ELSE text END) AS fp_new
  FROM documents WHERE doc_id % 13 <> 0
)
SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN fp_old = fp_new THEN 'unchanged'
            ELSE 'changed' END AS status
FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
ORDER BY doc_id
"""


REGISTRY_WEB: dict[str, tuple] = {
    "url_normalize": (q_url_normalize, SQL_URL_NORMALIZE),
    "url_dedup": (q_url_dedup, SQL_URL_DEDUP),
    "domain_stats": (q_domain_stats, SQL_DOMAIN_STATS),
    "pagerank": (q_pagerank, SQL_PAGERANK),
    "quality_classifier": (q_quality_classifier, SQL_QUALITY_CLASSIFIER),
    "dedup_keep_best": (q_dedup_keep_best, SQL_DEDUP_KEEP_BEST),
    "snapshot_diff": (q_snapshot_diff, SQL_SNAPSHOT_DIFF),
}
