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
