"""End-to-end training-data pipeline composition: the operators are
gate-verified individually; this test proves they COMPOSE into the
workflow a 100 TB run actually executes —

  crawl 1: exact dedup -> near-dup cluster resolution (quality keep)
           -> PII redaction -> quality gate -> stratified sample
           -> catalog snapshot
  crawl 2: incremental exact + near dedup vs the persisted catalog
           -> only genuinely new content survives -> catalog advances
"""

from __future__ import annotations

from pyspark.sql import functions as F

from textalyzer_spark.operators import incremental as inc
from textalyzer_spark.operators.near_dedup import near_dedup
from textalyzer_spark.operators.pii import redact_pii
from textalyzer_spark.operators.quality import quality_score


def _crawl1(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while seven "
        "wizards brew strong potions under a pale winter moon"
    )
    rows = [
        (1, base + " first variant"),
        (2, base + " first variant"),          # exact dup of 1
        (3, base + " second variant with a couple more words"),  # near dup
        (10, "completely different article about glaciers in patagonia "
             "and the slow carving of deep fjords over millennia"),
        (11, "reach me at ops@example.net about the glacier survey data"),
        (20, "spam spam spam spam spam spam spam spam spam"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_full_pipeline_two_crawls(spark, tmp_path):
    docs = _crawl1(spark)

    # 1) exact dedup: drop byte-identical copies (keep min id)
    surv = inc.incremental_exact_dedup(
        docs, spark.createDataFrame([], "fingerprint string")
    )
    docs = docs.join(surv.select("doc_id"), "doc_id")
    ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert 2 not in ids and 1 in ids

    # 2) near-dup cluster resolution, quality keep
    nd = near_dedup(docs, method="jaccard", keep="quality", k=3,
                    threshold=0.4)
    keep_ids = {r["doc_id"] for r in nd.collect() if r["keep"]}
    docs = docs.join(
        nd.filter("keep").select("doc_id"), "doc_id"
    )
    # exactly one of the {1,3} near-dup cluster survives
    assert len({1, 3} & keep_ids) == 1
    assert {10, 11, 20} <= keep_ids

    # 3) PII redaction
    clean = redact_pii(docs).withColumnRenamed("clean_text", "text")
    t11 = clean.filter("doc_id = 11").select("text").first()["text"]
    assert "<EMAIL>" in t11 and "example.net" not in t11

    # 4) quality gate: the spam doc has degenerate lexical diversity
    q = quality_score(clean.select("doc_id", "text"))
    gated = clean.join(
        q.filter(F.col("quality_score") >= 0.5).select("doc_id"), "doc_id"
    )
    gated_ids = {r["doc_id"] for r in gated.select("doc_id").collect()}
    assert 20 not in gated_ids and 10 in gated_ids

    # 5) catalog snapshot of everything INGESTED this crawl (dedup
    #    keys must cover dropped docs' content too — the original
    #    corpus fingerprints, not just survivors)
    base_dir = str(tmp_path / "catalog")
    n = inc.write_catalog_snapshot(inc.exact_catalog(_crawl1(spark)), base_dir)
    assert n == 1

    # 6) crawl 2: one repeat of crawl-1 content, one new doc
    crawl2 = spark.createDataFrame(
        [
            (100, "completely different article about glaciers in patagonia "
                  "and the slow carving of deep fjords over millennia"),
            (101, "a genuinely new report on tidal energy in scotland"),
        ],
        "doc_id bigint, text string",
    )
    cat = inc.read_catalog(spark, base_dir)
    surv2 = inc.incremental_exact_dedup(crawl2, cat)
    kept2 = {r["doc_id"] for r in surv2.collect()}
    assert kept2 == {101}  # the repeat is dropped against the catalog
    n2 = inc.write_catalog_snapshot(
        inc.updated_exact_catalog(cat, surv2), base_dir
    )
    assert n2 == 2
    assert inc.read_catalog(spark, base_dir).count() == cat.count() + 1


def test_clean_corpus_library_call(spark):
    """api.clean_corpus — the whole pipeline as one call: drops the
    spam doc (quality), the exact dup, one of the near-dup pair, the
    benchmark-contaminated doc, and redacts the PII doc's email."""
    from textalyzer_spark.api import clean_corpus

    docs = _crawl1(spark)
    bench = spark.createDataFrame(
        [(900, "completely different article about glaciers in patagonia "
               "and the slow carving of deep fjords over millennia")],
        "doc_id bigint, text string",
    )
    out = clean_corpus(
        docs, quality_min=0.5, near_dup_method="jaccard", k=3,
        threshold=0.4, decontaminate_against=bench,
        contamination_k=5,
    )
    rows = {r["doc_id"]: r["text"] for r in out.collect()}
    # 2 exact-dups 1 (dropped); {1,3} near-dup cluster keeps min id 1;
    # 10 is verbatim in the benchmark (dropped); 20 fails quality;
    # 11 survives WITH its email redacted
    assert set(rows) == {1, 11}
    assert "<EMAIL>" in rows[11] and "example.net" not in rows[11]


def test_pipeline_capped_sample_respects_source_cap(spark):
    """The capped pipeline gate: downstream of the cap stage no source
    can exceed PIPELINE_SOURCE_CAP, and the final sample is a subset
    of the uncapped pipeline's kept set (same upstream stages, same
    mixture variate)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    capped = m.q_pipeline_capped_sample(spark, sf)
    rows = capped.collect()
    per_source: dict[str, int] = {}
    for r in rows:
        per_source[r["source"]] = per_source.get(r["source"], 0) + 1
    assert rows and max(per_source.values()) <= m.PIPELINE_SOURCE_CAP
    uncapped = {
        r["doc_id"] for r in m.q_pipeline_clean_sample(spark, sf).collect()
    }
    assert {r["doc_id"] for r in rows} <= uncapped
