"""PII detection / redaction."""

from __future__ import annotations

from textalyzer_spark.operators.pii import (
    pii_stats,
    redact_pii,
    synthesize_pii,
)


def test_redact_pii_planted(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@sub.example.org or call +1 (555) 010-2233"),
            (2, "server at 192.168.0.17 responded"),
            (3, "nothing sensitive here at all"),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    r1 = out[1]
    assert r1["n_email"] == 1 and r1["n_phone"] == 1
    assert "<EMAIL>" in r1["clean_text"] and "<PHONE>" in r1["clean_text"]
    assert "jane" not in r1["clean_text"] and "555" not in r1["clean_text"]
    r2 = out[2]
    assert r2["n_ip"] == 1 and "<IP>" in r2["clean_text"]
    assert "192.168" not in r2["clean_text"]
    r3 = out[3]
    assert (r3["n_email"], r3["n_ip"], r3["n_phone"]) == (0, 0, 0)
    assert r3["clean_text"] == "nothing sensitive here at all"


def test_synthesize_pii_roundtrip(spark):
    """Every synthesized doc carries exactly one planted email and
    one planted IP; the raw-text phone count is 2 BY DESIGN (the
    phone pattern also matches the IP's digit run — masked in order,
    so the final text has each mask exactly once plus one phone)."""
    df = spark.createDataFrame(
        [(7, "base text"), (123, "other words")], "doc_id bigint, text string"
    )
    out = {r["doc_id"]: r for r in pii_stats(synthesize_pii(df)).collect()}
    for r in out.values():
        assert r["n_email"] == 1
        assert r["n_ip"] == 1
        assert r["n_phone"] == 2
    clean = {
        r["doc_id"]: r["clean_text"]
        for r in redact_pii(synthesize_pii(df)).collect()
    }
    assert clean[7].count("<EMAIL>") == 1
    assert clean[7].count("<IP>") == 1
    assert clean[7].count("<PHONE>") == 1
    assert "@example.com" not in clean[7] and "10.0." not in clean[7]
