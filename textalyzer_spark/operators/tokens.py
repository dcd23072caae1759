"""Token-counting and rolling-hash fingerprinting operators
(training-data pipeline brief: "token counting (whitespace + a
BPE-ish regex)", "document fingerprinting (rolling hash)").

Both are pure Catalyst column pipelines (no UDF, no shuffle until the
final aggregation, if any).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# BPE-style pre-tokenizer pattern (GPT-2-ish), restricted to a subset
# RE2 can also run so the DuckDB oracle stays value-exact: a token is
# an optional leading space + a letter run, digit run, or punctuation
# run; bare space runs count as tokens too (the BPE property that
# whitespace attaches to the following word).
BPE_PATTERN = r" ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+| +"


def token_counts(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """``(doc_id, n_ws_tokens, n_bpe_tokens, chars_per_bpe_token)`` —
    whitespace-split count vs BPE-ish-regex count, the standard pair
    of corpus-size estimators for training-data budgeting."""
    lower = F.lower(F.col(text_col))
    ws = F.size(F.filter(F.split(lower, r"\s+"), lambda t: t != ""))
    bpe = F.size(F.regexp_extract_all(lower, F.lit(BPE_PATTERN), F.lit(0)))
    return df.select(
        F.col(id_col).alias("doc_id"),
        ws.cast("int").alias("n_ws_tokens"),
        bpe.cast("int").alias("n_bpe_tokens"),
        F.when(
            bpe > 0, F.round(F.length(text_col) / bpe.cast("double"), 4)
        ).alias("chars_per_bpe_token"),
    )


def winnow_fingerprints(
    df: DataFrame,
    k: int = 8,
    window: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD '03):
    hash every character k-gram, take the minimum of each sliding
    window of ``window`` hashes, emit the distinct minima —
    ``(doc_id, fingerprint bigint)``, one row per selected hash.

    Guarantees: any shared substring of length >= k + window - 1
    yields at least one shared fingerprint, so near-duplicate
    detection reduces to an equi-join on ``fingerprint``. All
    higher-order functions on the JVM; O(n * window) per document.
    """
    lower = F.lower(F.col(text_col))
    n_grams = F.length(lower) - F.lit(k - 1)
    empty_longs = F.array().cast("array<bigint>")
    # NB: sequence(1, 0) produces a DESCENDING [1, 0] in Spark, so the
    # too-short cases must be guarded explicitly
    grams = F.when(n_grams < 1, empty_longs).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))),
            lambda i: F.xxhash64(F.substring(lower, F.lit(0) + i, k)),
        )
    )
    n_windows = F.size("grams") - F.lit(window - 1)
    selected = df.select(
        F.col(id_col).alias("doc_id"), grams.alias("grams")
    ).select(
        "doc_id",
        F.array_distinct(
            F.when(n_windows < 1, empty_longs).otherwise(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(n_windows, F.lit(1))),
                    lambda j: F.array_min(F.slice("grams", j, window)),
                )
            )
        ).alias("fps"),
    )
    return selected.select(
        "doc_id", F.explode("fps").alias("fingerprint")
    )


def winnow_near_dup_pairs(
    df: DataFrame,
    k: int = 8,
    window: int = 4,
    min_shared: int = 3,
    min_overlap: float | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-duplicate pairs by shared winnowing fingerprints:
    ``(doc_a, doc_b, n_shared, overlap)`` — one self-equi-join on the
    fingerprint key (same shape as the shingle seed join).

    ``overlap`` is the overlap coefficient n_shared/min(|A|,|B|);
    pass ``min_overlap`` to filter on it — raw shared counts are
    meaningless on low-entropy corpora where common k-grams saturate
    every pair."""
    fp = winnow_fingerprints(df, k, window, id_col, text_col).distinct()
    sizes = fp.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp"))
    a, b = fp.alias("a"), fp.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.fingerprint") == F.col("b.fingerprint"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_fp").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_fp").alias("n_b"))
    out = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            F.round(
                F.col("n_shared") / F.least("n_a", "n_b").cast("double"), 4
            ).alias("overlap"),
        )
    )
    if min_overlap is not None:
        out = out.filter(F.col("overlap") >= min_overlap)
    return out
