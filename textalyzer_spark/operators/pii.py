"""PII detection / redaction — the compliance scrub step of a
training-data pipeline (public recipe shape: C4's bad-words pass,
BigScience/ROOTS PII filtering): count and mask emails, IPv4
addresses, and phone-shaped digit runs.

Everything is pure Catalyst regex codegen (regexp_extract_all /
regexp_replace) — no UDF, no shuffle; the patterns are pinned to the
syntax subset where Java regex and RE2 agree (no lookaround, ASCII
\\d only, explicit ``[ \\t]`` instead of ``\\s`` whose class differs
between the engines), so the DuckDB twin is value-exact.

Redaction ORDER is pinned (emails, then IPs, then phones) because a
replacement changes what later patterns can match — the oracle
replays the same order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: pinned pattern set, in application order (name, regex, mask)
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()., \t-]{6,}[0-9]", "<PHONE>"),
)


def pii_counts(text: Column | str) -> list[Column]:
    """One ``n_<name>`` int column per pattern (occurrence counts on
    the RAW text — counted before any masking)."""
    c = F.col(text) if isinstance(text, str) else text
    return [
        F.size(F.regexp_extract_all(c, F.lit(rx), F.lit(0)))
        .cast("int")
        .alias(f"n_{name}")
        for name, rx, _ in PII_PATTERNS
    ]


def redacted_text(text: Column | str) -> Column:
    """The text with every pattern masked, in the pinned order."""
    c = F.col(text) if isinstance(text, str) else text
    for _, rx, mask in PII_PATTERNS:
        c = F.regexp_replace(c, rx, mask)
    return c


def redact_pii(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(doc_id, n_email, n_ip, n_phone, clean_text)`` — counts on
    the raw text plus the masked text. Stateless scan projection."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        *pii_counts(text_col),
        redacted_text(text_col).alias("clean_text"),
    )


def pii_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Audit view: ``(doc_id, n_email, n_ip, n_phone, clean_md5)`` —
    the md5 of the redacted text stands in for the text itself so the
    gate compares full redaction output without shipping documents."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        *pii_counts(text_col),
        F.md5(redacted_text(text_col)).alias("clean_md5"),
    )


def synthesize_pii(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic PII-bearing corpus for roundtrip gates (the
    synthesize_pages/synthesize_pdfs pattern): each document gains a
    contact footer derived from its doc_id — one email, one IPv4, one
    phone — so the redaction gate has guaranteed nonzero signal and
    the oracle can reconstruct the exact same footer in SQL."""
    d = F.col(id_col).cast("bigint")
    footer = F.concat(
        F.lit(" contact user"),
        d.cast("string"),
        F.lit("@example.com from 10.0."),
        F.pmod(d, F.lit(256)).cast("string"),
        F.lit("."),
        F.pmod(d, F.lit(100)).cast("string"),
        F.lit(" tel +1 (555) 123-4"),
        F.lpad(F.pmod(d, F.lit(100)).cast("string"), 3, "0"),
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.concat(F.col(text_col), footer).alias("text"),
    )
