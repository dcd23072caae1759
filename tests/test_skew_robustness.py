"""Skew robustness: pathologically long documents through the span
pipeline and line ops (north_star: "explicit AQE skew handling for
pathologically long documents" — the analog fixture is 1984.txt at
587 KB vs 199-byte neighbors, SURVEY.md §4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from textalyzer_spark.corpus import nested_from_flat
from textalyzer_spark.operators.frequency import word_frequency
from textalyzer_spark.operators.spans import process_spans_arrow


def _skewed_corpus(spark):
    # one ~1.1 MB monster among tiny docs (5000:1 skew)
    monster = ("lorem ipsum dolor sit amet " * 8000).strip()
    rows = [("monster", monster)] + [
        (f"tiny{i}", f"small doc {i} words") for i in range(200)
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_long_doc_through_span_pipeline(spark):
    nested = nested_from_flat(_skewed_corpus(spark)).repartition(8)
    out = {r["doc_id"]: r for r in process_spans_arrow(nested).collect()}
    assert out["monster"]["n_tokens"] == 5 * 8000
    assert len(out) == 201
    # spans of the monster survive passthrough intact
    monster_spans = out["monster"]["spans"]
    recon = "".join(s["text"] for s in monster_spans if s["kind"] == "text")
    assert recon.split() == ("lorem ipsum dolor sit amet " * 8000).split()


def test_long_doc_word_frequency(spark):
    freq = word_frequency(_skewed_corpus(spark)).collect()
    top = freq[0]
    assert top["count"] == 8000  # each monster word
    assert {r["word"] for r in freq[:5]} == {"lorem", "ipsum", "dolor", "sit", "amet"}


def test_salted_bucketing_spreads_skew(spark):
    # the lineage/salting key must spread distinct doc_ids uniformly
    df = _skewed_corpus(spark).select(
        F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(16)).alias("b")
    )
    counts = [r["count"] for r in df.groupBy("b").count().collect()]
    assert len(counts) == 16
    assert max(counts) <= 3 * (201 / 16)  # no pathological bucket


def test_duplicate_blocks_skew_cap_bounds_planted_hot_line(spark):
    """A planted ultra-common line ("}" x 10^4) must not fan the seed
    self-join out quadratically: with the default cap the job stays
    bounded, and blocks glued only by the hot line split there
    (documented deviation) while normal blocks are untouched."""
    import time

    from textalyzer_spark.operators.duplication import duplicate_blocks

    # 2500 docs of 4 lines, every doc containing the hot line "}"
    # (10^4 occurrences -> ~5*10^7 seed pairs uncapped), plus one real
    # 3-line duplicate block planted in two docs
    rows = [
        (f"d{i}", "alpha %d\n}\nbeta %d\n}" % (i, i)) for i in range(2500)
    ] + [
        ("dupA", "first shared line\nsecond shared line\nthird shared line"),
        ("dupB", "first shared line\nsecond shared line\nthird shared line"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string").repartition(8)
    t0 = time.perf_counter()
    out = duplicate_blocks(df, min_lines=3).collect()  # default cap ON
    elapsed = time.perf_counter() - t0
    assert elapsed < 120, f"capped run took {elapsed:.0f}s — cap not effective"
    contents = {r["content"] for r in out}
    assert "first shared line\nsecond shared line\nthird shared line" in contents
    # nothing built from the hot line alone
    assert all("}" not in c for c in contents)


def test_ngram_jaccard_doc_freq_cap(spark):
    """The default shingle doc-frequency cap suppresses boilerplate-only
    pairs but keeps genuinely similar pairs; sizes are computed before
    the drop so jaccard never increases."""
    from textalyzer_spark.operators.dedup import ngram_jaccard_pairs

    boiler = "this page is licensed under creative commons attribution"
    rows = [(f"b{i}", f"{boiler} item number {i}") for i in range(40)] + [
        ("x1", "unique sentence about distributed query planning at scale"),
        ("x2", "unique sentence about distributed query planning at scale"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    capped = ngram_jaccard_pairs(df, k=3, threshold=0.3, max_doc_freq=10).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in capped}
    assert ("x1", "x2") in pairs
    # boilerplate-boilerplate pairs must be suppressed by the cap
    assert not any(a.startswith("b") and b.startswith("b") for a, b in pairs)
    # uncapped still finds them (exact-parity opt-in)
    uncapped = ngram_jaccard_pairs(df, k=3, threshold=0.3, max_doc_freq=None).collect()
    assert any(
        r["doc_a"].startswith("b") and r["doc_b"].startswith("b") for r in uncapped
    )
