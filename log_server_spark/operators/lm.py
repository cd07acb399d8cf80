"""Corpus n-gram language-model scoring — the CCNet-style quality filter
(Wenzek et al. 2020: docs are ranked by LM perplexity and the corpus is
split into quality buckets). The production recipe scores against a
pretrained KenLM; that binary dependency isn't in this container, so the
operator trains the model ON the corpus itself (a self-scored bigram MLE) —
the model-building and scoring plans are exactly the shapes a pretrained
model would use, and self-scoring is itself a standard repetitiveness /
outlier signal (low perplexity = template boilerplate, high = noise).

Scale shape (corpus = 10^12 docs):
- bigram counts: one explode (positions per doc) -> one keyed shuffle with
  map-side combine. Hot bigrams (stopword pairs) collapse in the combiner.
- unigram context totals derive FROM the bigram-count frame (model-sized,
  not corpus-sized) — the corpus is never re-scanned.
- scoring joins doc-bigrams to the model on (w1, w2): plain equi-join,
  co-partitioned with the count shuffle's key, probe-side skew handled by
  AQE; with ``min_count`` pruning the model usually fits a broadcast.
- per-doc average: one shuffle keyed by doc id.

``min_count`` prunes rare bigrams from the model (CCNet prunes its vocab
the same way); pruned bigrams are excluded from a doc's average — scores
are over modeled n-grams only. Docs with < 2 tokens (no bigrams) or no
modeled bigrams are absent from the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _doc_bigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda x: F.length(x) > 0,
    )
    n = F.size(F.col("__toks"))
    pairs = F.zip_with(
        F.slice(F.col("__toks"), 1, n - 1),
        F.slice(F.col("__toks"), 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return (
        docs.select(F.col(id_col).alias("id"), toks.alias("__toks"))
        .where(n >= 2)
        .select("id", F.explode(pairs).alias("bg"))
        .select("id", "bg.w1", "bg.w2")
    )


def bigram_perplexity(
    docs: DataFrame, id_col: str, text_col: str, min_count: int = 1
) -> DataFrame:
    """Per-doc (id, n_bigrams, avg_logp, ppl): average natural-log MLE
    bigram probability ln(C(w1,w2)/C(w1)) over the doc's token-position
    bigrams, and perplexity exp(-avg_logp)."""
    bi = _doc_bigrams(docs, id_col, text_col)
    cnt = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    if min_count > 1:
        cnt = cnt.filter(F.col("c12") >= min_count)
    # context totals from the model frame, not the corpus; with min_count
    # pruning this is the PRUNED mass (probabilities renormalize over kept
    # bigrams — the oracle-checked min_count=1 case is exact MLE)
    c1 = cnt.groupBy("w1").agg(F.sum("c12").alias("c1"))
    model = cnt.join(c1, "w1").select(
        "w1", "w2",
        F.log(F.col("c12").cast("double") / F.col("c1").cast("double")).alias("logp"),
    )
    scored = (
        bi.join(model, ["w1", "w2"])
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.avg("logp").alias("lp"))
    )
    return scored.select(
        F.col("id").alias(id_col),
        "n_bigrams",
        F.round("lp", 4).alias("avg_logp"),
        F.round(F.exp(-F.col("lp")), 4).alias("ppl"),
    )
