"""Readability (FIXTURES.md F-14) and quality/lang-id/fingerprint ops."""

from __future__ import annotations

import pytest

from textalyzer_spark.functions.syllables import count_syllables
from textalyzer_spark.operators.quality import fingerprint, lang_id, quality_score, token_stats
from textalyzer_spark.operators.readability import readability


def test_syllable_heuristic():
    assert count_syllables("cat") == 1
    assert count_syllables("table") == 2      # ends 'le': keep the group
    assert count_syllables("make") == 1       # silent e dropped
    assert count_syllables("readability") == 5  # ea|a|i|i|y
    assert count_syllables("e") == 1           # floor at 1
    assert count_syllables("rhythm") == 1      # y counts as vowel


def _fk_golden(n_words, n_sents, n_syll):
    fre = 206.835 - 1.015 * (n_words / n_sents) - 84.6 * (n_syll / n_words)
    fk = 0.39 * (n_words / n_sents) + 11.8 * (n_syll / n_words) - 15.59
    return round(fre, 4), round(fk, 4)


def test_readability_f14(spark):
    # "The cat sat on the mat. It was happy." — 9 words, 2 sentences,
    # syllables: the=1 cat=1 sat=1 on=1 the=1 mat=1 it=1 was=1 happy=2 → 10
    text = "The cat sat on the mat. It was happy."
    df = spark.createDataFrame([("d1", text)], "doc_id string, text string")
    row = readability(df).collect()[0]
    assert row["n_words"] == 9
    assert row["n_sentences"] == 2
    assert row["n_syllables"] == 10
    assert row["n_distinct_words"] == 8  # 'the' twice
    fre, fk = _fk_golden(9, 2, 10)
    assert row["flesch_reading_ease"] == pytest.approx(fre, abs=1e-4)
    assert row["fk_grade"] == pytest.approx(fk, abs=1e-4)
    assert row["type_token_ratio"] == pytest.approx(round(8 / 9, 4), abs=1e-4)


def test_readability_no_punctuation_floors_sentences(spark):
    df = spark.createDataFrame([("d1", "hello world again")], "doc_id string, text string")
    row = readability(df).collect()[0]
    assert row["n_sentences"] == 1
    assert row["n_words"] == 3


def test_token_stats_and_quality(spark):
    df = spark.createDataFrame(
        [("d1", "the quick brown fox jumps over the lazy dog " * 3)],
        "doc_id string, text string",
    )
    st = token_stats(df).collect()[0]
    assert st["n_tokens"] == 27
    assert st["n_distinct_tokens"] == 8
    assert st["stopword_ratio"] == pytest.approx(round(6 / 27, 4))  # 'the' x2 x3 reps
    q = quality_score(df).collect()[0]
    assert 0.0 <= q["quality_score"] <= 1.0
    assert q["n_tokens"] == 27


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            ("en_doc", "the cat and the dog of it"),
            ("de_doc", "der hund und die katze ist nicht da"),
            ("es_doc", "el perro y la casa es que un gato"),
            ("empty", "xyzzy plugh"),
        ],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r["pred_lang"] for r in lang_id(df).collect()}
    assert got["en_doc"] == "en"
    assert got["de_doc"] == "de"
    assert got["es_doc"] == "es"
    assert got["empty"] == "unk"


def test_fingerprint_whitespace_invariant(spark):
    df = spark.createDataFrame(
        [("a", "Hello   World"), ("b", "hello world"), ("c", "different")],
        "doc_id string, text string",
    )
    fps = {r["doc_id"]: r["fingerprint"] for r in fingerprint(df).collect()}
    assert fps["a"] == fps["b"]
    assert fps["a"] != fps["c"]


def test_repetition_stats_hand_computed(spark):
    from textalyzer_spark.operators.quality import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "a b a b a\nx\nx"),
            (2, ""),          # no tokens, no lines
            (3, "solo"),      # one token: no bigrams, one line
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    r1 = out[1]
    # tokens cross newlines: [a b a b a x x] — bigrams ab ba ab ba ax
    # xx -> (6-4)/6; trigrams aba bab aba bax axx -> (5-4)/5; top
    # bigram ('a b', count 2) covers 4 of 7 token positions
    assert r1["n_tokens"] == 7
    assert r1["dup_bigram_frac"] == 2 / 6
    assert r1["dup_trigram_frac"] == 1 / 5
    assert r1["top_bigram_frac"] == 2 * 2 / 7
    assert r1["dup_line_frac"] == 1 / 3  # "a b a b a", "x", "x"
    r2 = out[2]
    assert r2["n_tokens"] == 0
    assert all(
        r2[c] is None
        for c in ("dup_bigram_frac", "dup_trigram_frac",
                  "top_bigram_frac", "dup_line_frac")
    )
    r3 = out[3]
    assert r3["n_tokens"] == 1 and r3["dup_bigram_frac"] is None
    assert r3["dup_line_frac"] == 0.0


def test_stratified_sample_deterministic_and_rated(spark):
    from pyspark.sql import functions as F

    from textalyzer_spark.operators.sampling import (
        hash_sample,
        stratified_sample,
    )

    df = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    a = stratified_sample(df, "lang", {"en": 0.8, "de": 0.2}).collect()
    b = stratified_sample(df, "lang", {"en": 0.8, "de": 0.2}).collect()
    # pure function of (salt, doc_id): identical keep set on re-run
    assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)
    kept = {"en": 0, "de": 0}
    for r in a:
        kept[r["lang"]] += 1
        assert r["u"] < (0.8 if r["lang"] == "en" else 0.2)
    # 2000 docs per stratum: binomial 5-sigma bounds
    assert abs(kept["en"] - 1600) < 5 * (2000 * 0.8 * 0.2) ** 0.5
    assert abs(kept["de"] - 400) < 5 * (2000 * 0.2 * 0.8) ** 0.5
    # default rate drops unmatched strata entirely at 0.0
    c = stratified_sample(df, "lang", {"en": 0.5}).collect()
    assert all(r["lang"] == "en" for r in c)
    # the salt re-draws the variates: different keep set, same size law
    d = {r["doc_id"] for r in hash_sample(df, 0.5, salt="s1").collect()}
    e = {r["doc_id"] for r in hash_sample(df, 0.5, salt="s2").collect()}
    assert d != e
    assert abs(len(d) - 2000) < 5 * (4000 * 0.25) ** 0.5


def test_corpus_mixture(spark):
    from pyspark.sql import functions as F

    from textalyzer_spark.operators.sampling import corpus_mixture

    df = spark.createDataFrame(
        [(1, "en", "one two three"), (2, "en", "four five"),
         (3, "de", "eins zwei drei vier fuenf")],
        "doc_id bigint, lang string, text string",
    )
    out = {r["bucket"]: r for r in corpus_mixture(df, "lang").collect()}
    assert out["en"]["n_docs"] == 2 and out["en"]["n_tokens"] == 5
    assert out["de"]["n_docs"] == 1 and out["de"]["n_tokens"] == 5
    assert out["en"]["frac_docs"] == 2 / 3
    assert out["en"]["frac_tokens"] == 0.5
    assert abs(sum(r["frac_docs"] for r in out.values()) - 1.0) < 1e-12


def test_bigram_novelty_planted(spark):
    from textalyzer_spark.operators.quality import bigram_novelty

    df = spark.createDataFrame(
        [
            (1, "a b c"),       # bigrams: 'a b' (shared), 'b c' (shared)
            (2, "a b c d"),     # 'a b', 'b c' shared; 'c d' unique
            (3, "x"),           # no bigrams
            (4, "q r q r"),     # 'q r','r q','q r' all unique to doc 4
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in bigram_novelty(df, common_df=2).collect()}
    assert out[1]["n_bigrams"] == 2
    assert out[1]["novel_frac"] == 0.0
    assert out[1]["common_frac"] == 1.0       # both bigrams in 2 docs
    assert out[2]["n_bigrams"] == 3
    assert out[2]["novel_frac"] == 1 / 3      # only 'c d'
    assert out[3]["n_bigrams"] == 0 and out[3]["novel_frac"] is None
    # doc-frequency (distinct docs), not occurrence count: doc 4's
    # thrice-occurring bigrams still have df == 1 -> fully novel
    assert out[4]["novel_frac"] == 1.0 and out[4]["common_frac"] == 0.0


def test_solve_mixture_rates_pure():
    from textalyzer_spark.operators.sampling import solve_mixture_rates

    avail = {"en": 8000.0, "de": 1000.0, "zh": 1000.0}
    # 50/50 en/de: de is scarcest (1000/0.5 = 2000 = T*), so de keeps
    # everything and en downsamples to match
    r = solve_mixture_rates(avail, {"en": 0.5, "de": 0.5})
    assert r == {"en": 1000.0 / 8000.0, "de": 1.0}
    # untargeted buckets are absent (stratified_sample default 0.0)
    assert "zh" not in r
    # budget caps total mass below the availability bound
    r = solve_mixture_rates(avail, {"en": 0.5, "de": 0.5}, budget=1000)
    assert r == {"en": 500.0 / 8000.0, "de": 0.5}
    # target normalizes over positive shares
    r1 = solve_mixture_rates(avail, {"en": 2.0, "de": 2.0})
    assert r1 == solve_mixture_rates(avail, {"en": 0.5, "de": 0.5})
    # a targeted bucket with zero mass -> infeasible -> all-zero rates
    r = solve_mixture_rates(avail, {"en": 0.5, "fr": 0.5})
    assert r == {"en": 0.0, "fr": 0.0}
    import pytest

    with pytest.raises(ValueError):
        solve_mixture_rates(avail, {"en": 0.0})


def test_mixture_solver_composes_with_sampler(spark):
    """corpus_mixture -> solve_rates_from_mixture_report ->
    stratified_sample hits the target mixture within binomial
    tolerance on a planted corpus — the three operators compose with
    no hand-tuned rates."""
    from pyspark.sql import functions as F

    from textalyzer_spark.operators.sampling import (
        corpus_mixture,
        solve_rates_from_mixture_report,
        stratified_sample,
    )

    # planted: 6000 en / 3000 de / 1000 zh docs, one token each (the
    # doc-mass mixture == token mixture, keeps the math visible)
    df = spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 <= 5, "en")
        .when(F.col("id") % 10 <= 8, "de")
        .otherwise("zh")
        .alias("lang"),
        F.lit("tok").alias("text"),
    )
    mix = corpus_mixture(df, "lang")
    target = {"en": 0.4, "de": 0.4, "zh": 0.2}
    rates = solve_rates_from_mixture_report(mix, target)
    # zh is scarcest relative to its 0.2 share: T* = 1000/0.2 = 5000
    assert rates["zh"] == 1.0
    assert abs(rates["en"] - 5000 * 0.4 / 6000) < 1e-12
    assert abs(rates["de"] - 5000 * 0.4 / 3000) < 1e-12
    kept = stratified_sample(df, "lang", rates).groupBy("lang").count()
    got = {r["lang"]: r["count"] for r in kept.collect()}
    total = sum(got.values())
    # realized mixture within 5-sigma binomial noise of the target
    for lang, share in target.items():
        exp = {"en": 2000, "de": 2000, "zh": 1000}[lang]
        n_avail = {"en": 6000, "de": 3000, "zh": 1000}[lang]
        p = rates[lang]
        sd = max(1.0, (n_avail * p * (1 - p)) ** 0.5)
        assert abs(got[lang] - exp) <= 5 * sd
        assert abs(got[lang] / total - share) < 0.05


def test_cap_per_stratum_equals_naive_window(spark):
    # the nested bucketed-rank form must equal the naive
    # row_number() <= cap per stratum, for every bucket count
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from textalyzer_spark.operators.sampling import cap_per_stratum, sample_u

    rows = [(i, f"s{i % 7}") for i in range(900)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    naive_w = Window.partitionBy("source").orderBy("u", "doc_id")
    naive = {
        (r["doc_id"], r["source"])
        for r in df.select("doc_id", "source", sample_u("doc_id", "t"))
        .withColumn("rk", F.row_number().over(naive_w))
        .filter(F.col("rk") <= 13)
        .collect()
    }
    for nb in (1, 4, 64, 1024):
        got = {
            (r["doc_id"], r["source"])
            for r in cap_per_stratum(
                df, cap=13, salt="t", num_buckets=nb
            ).collect()
        }
        assert got == naive, f"num_buckets={nb}"


def test_cap_per_stratum_cap_semantics(spark):
    from textalyzer_spark.operators.sampling import cap_per_stratum

    # big stratum capped, small stratum kept whole
    rows = [(i, "big") for i in range(500)] + [
        (1000 + i, "small") for i in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    got = cap_per_stratum(df, cap=20, salt="c").collect()
    by_s = {}
    for r in got:
        by_s.setdefault(r["source"], set()).add(r["doc_id"])
    assert len(by_s["big"]) == 20
    assert by_s["small"] == {1000, 1001, 1002, 1003}
    with pytest.raises(ValueError):
        cap_per_stratum(df, cap=0)


def test_cap_per_stratum_plan_prunes_before_window(spark):
    # scale pins: the live-bucket join is no longer HINT-forced to
    # broadcast (ADVICE r6 — millions of strata would exceed the
    # broadcast limit); AQE must still PICK broadcast at runtime when
    # the table is small, and every window in the plan is partitioned
    # (no stratum-collapsing SinglePartition sort anywhere). AQE
    # decisions are runtime-only: collect() first, then read the
    # final adaptive plan.
    from textalyzer_spark.operators.sampling import cap_per_stratum

    rows = [(i, f"s{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    out = cap_per_stratum(df, cap=5, num_buckets=16)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "BroadcastHashJoin" in plan
    assert "SinglePartition" not in plan
