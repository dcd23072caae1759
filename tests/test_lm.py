"""lm: CCNet-shaped n-gram LM perplexity scoring/filtering.

Pins the exactness contract (glibc ln == DuckDB ln, the micro-nat
quantization) and the operator semantics (OOV mass, empty docs,
fluency ordering, interpolated-bigram fallback chain).
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from textalyzer_spark.operators.lm import (
    LL_SCALE,
    lm_perplexity,
    lm_perplexity_bigram,
    score_perplexity,
    train_unigram_lm,
)


def test_glibc_ln_parity():
    """THE pin behind operators/lm.py: DuckDB ``ln`` must stay
    bit-identical to glibc ``math.log`` on the probability domain
    (ratios of int64 counts). If this ever breaks, every lm oracle
    needs a new transcendental strategy."""
    import numpy as np

    rng = np.random.default_rng(7)
    num = rng.integers(1, 10**9, 50_000)
    den = rng.integers(1, 10**9, 50_000)
    x = (np.minimum(num, den) / np.maximum(num, den)).astype(np.float64)
    con = duckdb.connect()
    import pandas as pd

    con.register("t", pd.DataFrame({"x": x}))
    d = con.execute("SELECT ln(x) FROM t").fetchnumpy()["ln(x)"]
    m = np.array([math.log(v) for v in x])
    assert int((d != m).sum()) == 0


def _corpus(spark):
    # 0: all common words; 1: mixed; 2: rare words; 3: empty; 4: one token
    rows = [
        (0, "the the the cat cat the the cat the cat"),
        (1, "the cat sat on a very plush mat today quietly"),
        (2, "zyx wvu tsr qpo nml kji hgf edc ba z"),
        (3, "   "),
        (4, "the"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_unigram_exact_values_and_oov(spark):
    df = _corpus(spark)
    # train on docs 0-1 only; doc 2 is then pure OOV
    model, total, v, oov_ll = train_unigram_lm(
        df.filter(F.col("doc_id") <= 1)
    )
    counts = {r["token"]: r["cnt"] for r in model.collect()}
    assert counts["the"] == 7 and counts["cat"] == 5 and total == 20
    denom = float(total + v)
    assert oov_ll == math.floor(math.log(1.0 / denom) * LL_SCALE)

    out = {
        r["doc_id"]: r
        for r in score_perplexity(df, model, oov_ll, max_avg_nll=3.0).collect()
    }
    # doc 2: ten OOV tokens -> sum is exactly 10 * oov_ll
    assert out[2]["n_tokens"] == 10
    assert out[2]["sum_ll_micro"] == 10 * oov_ll
    # doc 0 recompute by hand
    exp0 = 6 * math.floor(math.log(8 / denom) * LL_SCALE) + 4 * math.floor(
        math.log(6 / denom) * LL_SCALE
    )
    assert out[0]["sum_ll_micro"] == exp0
    assert out[0]["avg_nll"] == (-exp0) / (float(LL_SCALE) * 10.0)
    # fluency ordering: common-word doc < mixed < pure-OOV
    assert out[0]["avg_nll"] < out[1]["avg_nll"] < out[2]["avg_nll"]
    # empty doc: zero tokens, NULL nll, keep False
    assert out[3]["n_tokens"] == 0 and out[3]["avg_nll"] is None
    assert out[3]["keep"] is False
    # keep decision respects the threshold
    assert out[0]["keep"] is True and out[2]["keep"] is False


def test_lm_perplexity_self_trained_keeps_typical_docs(spark):
    df = _corpus(spark)
    out = {r["doc_id"]: r for r in lm_perplexity(df, max_avg_nll=3.2).collect()}
    assert len(out) == 5
    # self-trained: the common-word doc is the most "fluent"
    nlls = {i: out[i]["avg_nll"] for i in (0, 1, 2)}
    assert nlls[0] == min(nlls.values())


def test_bigram_fallback_chain_and_counts(spark):
    df = _corpus(spark)
    out = {
        r["doc_id"]: r
        for r in lm_perplexity_bigram(
            df, train_filter=F.col("doc_id") <= 1, lam=0.75, max_avg_nll=4.0
        ).collect()
    }
    # n_bigrams = n_tokens - 1 for tokenful docs; 0 for empty/singleton
    assert out[0]["n_bigrams"] == 9 and out[2]["n_bigrams"] == 9
    assert out[3]["n_bigrams"] == 0 and out[4]["n_bigrams"] == 0
    assert out[3]["keep"] is False and out[4]["keep"] is False
    # hand-recompute one fully-unseen bigram ll: ctx/nxt/bigram all OOV
    model, total, v, _ = train_unigram_lm(df.filter(F.col("doc_id") <= 1))
    denom = float(total + v)
    p2 = 1 / v  # (0+1)/(0+V)
    p1 = 1 / denom
    ll_oov = math.floor(math.log(0.75 * p2 + 0.25 * p1) * LL_SCALE)
    assert out[2]["sum_ll_micro"] == 9 * ll_oov
    # seen bigram scores strictly better than unseen
    assert out[0]["avg_nll"] < out[2]["avg_nll"]


def test_score_shuffle_shape(spark):
    """Scale pin: scoring is explode -> broadcast join -> ONE hash
    aggregate — the plan must contain a BroadcastHashJoin and no
    SortMergeJoin, and exactly one Exchange (the final groupBy)."""
    df = _corpus(spark)
    model, _t, _v, oov = train_unigram_lm(df)
    plan = score_perplexity(df, model, oov)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


@pytest.mark.parametrize("which", ["uni", "bi"])
def test_lm_oracle_mirror_on_planted_corpus(spark, which):
    """Engine vs DuckDB value-exact on a corpus with a real OOV split
    (the sf fixtures share one vocab across langs, so the gate query
    never exercises OOV — this mirror does)."""
    from textalyzer_spark import oracles

    rows = [
        (0, "the the the cat cat the the cat the cat", "en"),
        (1, "the cat sat on a very plush mat today quietly", "en"),
        (2, "zyx wvu tsr qpo nml kji hgf edc ba z", "xx"),
        (3, "   ", "en"),
        (4, "the", "xx"),
        (5, "cat the zyx cat the", "xx"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    if which == "uni":
        edf = lm_perplexity(df, train_filter=F.col("lang") == "en", max_avg_nll=3.0)
        sql = oracles.lm_perplexity_sql("lang = 'en'", 3.0)
    else:
        edf = lm_perplexity_bigram(
            df, train_filter=F.col("lang") == "en", lam=0.75, max_avg_nll=3.0
        )
        sql = oracles.lm_perplexity_bigram_sql("lang = 'en'", 0.75, 3.0)
    con = duckdb.connect()
    con.register("documents", edf.sparkSession.createDataFrame(rows, "doc_id bigint, text string, lang string").toPandas())
    got = sorted(tuple(r) for r in edf.collect())
    want = sorted(tuple(r) for r in con.sql(sql).fetchall())
    assert got == want


def test_stateless_matches_batch(spark):
    """The streaming-path scorer must reproduce the batch scorer
    bit-for-bit (same int sums, same doubles) — Python re WS_SPLIT ==
    Java split on the pinned class."""
    from textalyzer_spark.operators.lm import model_as_map, score_perplexity_stateless

    df = _corpus(spark)
    model, _t, _v, oov = train_unigram_lm(df.filter(F.col("doc_id") <= 1))
    batch = sorted(tuple(r) for r in score_perplexity(df, model, oov).collect())
    stateless = sorted(
        tuple(r)
        for r in score_perplexity_stateless(df, model_as_map(model), oov).collect()
    )
    assert batch == stateless


def test_streaming_lm_score(spark, tmp_path):
    """Append-mode streaming twin: frozen model, checkpoint-restart
    processes only new files, output matches batch on the union."""
    from textalyzer_spark.operators.lm import model_as_map
    from textalyzer_spark.streaming.jobs import (
        run_to_completion_foreach,
        streaming_lm_score,
    )

    inp = str(tmp_path / "in")
    ck = str(tmp_path / "ck")
    b1 = [("d1", "the cat sat on the mat"), ("d2", "zyx wvu")]
    b2 = [("d3", "the the the"), ("d4", "")]
    spark.createDataFrame(b1, "doc_id string, text string").write.mode(
        "append"
    ).parquet(inp)
    train = spark.createDataFrame(
        [(1, "the cat sat on a mat the cat")], "doc_id bigint, text string"
    )
    model, _t, _v, oov = train_unigram_lm(train)
    mm = model_as_map(model)

    got = run_to_completion_foreach(streaming_lm_score(spark, inp, mm, oov), ck, "append")
    assert {r["doc_id"] for r in got} == {"d1", "d2"}
    spark.createDataFrame(b2, "doc_id string, text string").write.mode(
        "append"
    ).parquet(inp)
    got += run_to_completion_foreach(streaming_lm_score(spark, inp, mm, oov), ck, "append")
    assert {r["doc_id"] for r in got} == {"d1", "d2", "d3", "d4"}

    batch = {
        r["doc_id"]: tuple(r)
        for r in score_perplexity(
            spark.createDataFrame(b1 + b2, "doc_id string, text string"),
            model,
            oov,
        ).collect()
    }
    for r in got:
        assert tuple(r) == batch[r["doc_id"]]
