"""Unit tests for operators/lm.py (CCNet-style bigram perplexity)."""

import math

from log_server_spark.operators.lm import bigram_perplexity


def test_bigram_perplexity_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b a c"), (3, "x"), (4, "   ")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in bigram_perplexity(docs, "doc_id", "text").collect()}
    # corpus bigrams: (a,b) x2, (b,a) x1, (a,c) x1 -> C(a)=3, C(b)=1
    assert set(rows) == {1, 2}  # <2 tokens -> no bigrams -> absent
    assert rows[1]["n_bigrams"] == 1
    assert rows[1]["avg_logp"] == round(math.log(2 / 3), 4)
    assert rows[1]["ppl"] == round(math.exp(-math.log(2 / 3)), 4)  # 1.5
    assert rows[2]["n_bigrams"] == 3
    lp2 = (math.log(2 / 3) + math.log(1 / 1) + math.log(1 / 3)) / 3
    assert rows[2]["avg_logp"] == round(lp2, 4)
    assert rows[2]["ppl"] == round(math.exp(-lp2), 4)


def test_bigram_perplexity_min_count_prunes_and_renormalizes(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b a c")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in bigram_perplexity(docs, "doc_id", "text", min_count=2).collect()
    }
    # only (a,b) survives pruning; context mass renormalizes to the kept
    # model: C(a)=2 -> ln(2/2)=0 -> ppl 1.0; unmodeled bigrams are excluded
    assert rows[1]["n_bigrams"] == 1 and rows[1]["ppl"] == 1.0
    assert rows[2]["n_bigrams"] == 1 and rows[2]["ppl"] == 1.0


def test_bigram_perplexity_tokens_match_vocab_convention(spark):
    # tokenization identical to vocab_top_tokens: lower + trim + \s+ split
    docs = spark.createDataFrame(
        [(1, "  Hello   WORLD  hello world  ")], "doc_id long, text string"
    )
    r = bigram_perplexity(docs, "doc_id", "text").collect()[0]
    # bigrams: (hello,world) x2, (world,hello) x1 -> C(hello)=2, C(world)=1
    lp = (math.log(2 / 2) + math.log(1 / 1) + math.log(2 / 2)) / 3
    assert r["n_bigrams"] == 3
    assert r["avg_logp"] == round(lp, 4) == 0.0
