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
    from textalyzer_spark.functions.alphabet import NON_WS_CLASS

    lower = F.lower(F.col(text_col))
    # counts, not arrays: the number of non-empty WS_SPLIT pieces IS
    # the number of maximal non-whitespace runs, and regexp_count
    # stays in whole-stage codegen where the array-HOF filter
    # evaluated interpreted and re-ran per reference (round 8);
    # values are identical by construction
    ws = F.regexp_count(lower, F.lit(f"{NON_WS_CLASS}+"))
    bpe = F.regexp_count(lower, F.lit(BPE_PATTERN))
    return df.select(
        F.col(id_col).alias("doc_id"),
        ws.cast("int").alias("n_ws_tokens"),
        bpe.cast("int").alias("n_bpe_tokens"),
        F.when(
            bpe > 0, F.round(F.length(text_col) / bpe.cast("double"), 4)
        ).alias("chars_per_bpe_token"),
    )


_ROLL_B = 1000003          # polynomial rolling-hash base
_ROLL_M = (1 << 61) - 1    # Mersenne modulus


def rolling_kgram_hashes(text: str, k: int) -> list[int]:
    """O(n) polynomial rolling hash of every character k-gram (plain
    Python; runs inside Arrow batches), over Unicode CODEPOINTS:
    identical to the previous utf-8-byte form on ASCII, but a k-gram
    is now k CHARACTERS on every script (a byte hash split multi-byte
    chars mid-sequence) and the DuckDB twin's per-character ascii(c)
    matches exactly beyond ASCII (pytest: accented near-dup corpus)."""
    from textalyzer_spark.functions.alphabet import jvm_lower

    data = [ord(c) for c in jvm_lower(text)]
    n = len(data)
    if n < k:
        return []
    h = 0
    for b in data[:k]:
        h = (h * _ROLL_B + b) % _ROLL_M
    out = [h]
    lead = pow(_ROLL_B, k - 1, _ROLL_M)
    for i in range(k, n):
        h = ((h - data[i - k] * lead) * _ROLL_B + data[i]) % _ROLL_M
        out.append(h)
    return out


def _kgram_hashes_batch(texts: list[str], k: int):
    """The SAME polynomial k-gram hash values as
    :func:`rolling_kgram_hashes`, computed BATCH-FLAT: because k is a
    small constant, H(i) = Σ_j d[i+j]·B^(k-1-j) is a fixed-kernel
    correlation, not a recurrence — k strided multiply-adds over the
    whole batch's concatenated codepoints replace every per-character
    Python step (and ``utf-32-le`` decoding replaces the per-char
    ``ord`` loop). Windows crossing document boundaries are sliced
    away afterward. Identical hash values, so the DuckDB twin and all
    downstream consumers are untouched.

    Modular arithmetic stays in SIGNED int64 (numpy's uint64 shifts
    and compares fall off the SIMD path — measured 20-50x slower per
    op) via Mersenne folding (M = 2^61-1): each term is
    (pow_j < 2^61) × (codepoint < 2^21) split 40/21 bits so every
    partial product stays < 2^62, and the accumulator folds every 3
    terms to stay < 2^63.

    Returns ``[hashes ndarray | None]`` aligned with ``texts``.
    """
    import numpy as np

    M = _ROLL_M
    MASK21 = (1 << 21) - 1
    # no upper bound on k: each folded term is < 2^61 + 2 and the
    # j%3==2 cadence folds the accumulator back below 2^61 before a
    # fourth term can join, so acc stays < 3*(2^61+2) < 2^63 for ANY k
    # (the round-4 `assert k <= 8` was stricter than the math requires
    # — character k-grams with k in the 10-25 winnowing range work)

    from textalyzer_spark.functions.alphabet import jvm_lower

    codes = [
        np.frombuffer(
            jvm_lower(t or "").encode("utf-32-le"), dtype=np.uint32
        ).astype(np.int64)
        for t in texts
    ]
    lens = [len(c) for c in codes]
    total = sum(lens)
    if total < k:
        return [None] * len(texts)
    flat = np.concatenate(codes) if len(codes) > 1 else codes[0]
    n_out = total - k + 1
    acc = np.zeros(n_out, dtype=np.int64)
    for j in range(k):
        pj = pow(_ROLL_B, k - 1 - j, _ROLL_M)
        d = flat[j : j + n_out]
        # (pj * d) mod-folded: lo < 2^61, y < 2^42, hi < 2^61+2^21
        y = (pj >> 40) * d
        s = (pj & ((1 << 40) - 1)) * d + (y >> 21) + ((y & MASK21) << 40)
        acc += (s & M) + (s >> 61)               # term < 2^61 + 2
        if j % 3 == 2:                           # keep acc < 2^63
            acc = (acc & M) + (acc >> 61)
    acc = (acc & M) + (acc >> 61)
    acc = (acc & M) + (acc >> 61)
    acc -= (acc >= M) * M

    out = []
    off = 0
    for ln in lens:
        n = ln - k + 1
        out.append(acc[off : off + n] if n >= 1 else None)
        off += ln
    return out


def winnow_fingerprints(
    df: DataFrame,
    k: int = 8,
    window: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD '03):
    a true O(n) polynomial ROLLING hash over every character k-gram,
    then the minimum of each sliding window of ``window`` hashes,
    distinct minima emitted — ``(doc_id, fingerprint bigint)``.

    Guarantees: any shared substring of length >= k + window - 1
    yields at least one shared fingerprint, so near-duplicate
    detection reduces to an equi-join on ``fingerprint``.

    Implementation: Arrow-batched mapInPandas with numpy sliding
    windows. A Catalyst higher-order-function formulation was tried
    first and abandoned: HOF lambdas evaluate interpreted (outside
    whole-stage codegen) and per-window slice allocations made it
    ~100x slower than this batch pass on realistic doc lengths.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids: list = []
            fps: list = []
            texts = list(pdf[text_col])
            ids = list(pdf[id_col])
            for r, arr in enumerate(_kgram_hashes_batch(texts, k)):
                if arr is None or len(arr) < window:
                    continue
                minima = np.unique(
                    np.lib.stride_tricks.sliding_window_view(arr, window).min(
                        axis=1
                    )
                )
                doc_ids.extend([ids[r]] * len(minima))
                fps.extend(minima.astype(np.int64).tolist())
            yield pd.DataFrame({"doc_id": doc_ids, "fingerprint": fps})

    # output id type follows the input id type (string fixtures AND the
    # driver's int64 ids) — a hardcoded string schema silently casts
    id_type = dict(df.dtypes).get(id_col, "string")
    return df.mapInPandas(run, f"doc_id {id_type}, fingerprint bigint")


def winnow_near_dup_pairs(
    df: DataFrame,
    k: int = 8,
    window: int = 4,
    min_shared: int = 3,
    min_overlap: float | None = None,
    max_doc_freq: int | None = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-duplicate pairs by shared winnowing fingerprints:
    ``(doc_a, doc_b, n_shared, overlap)`` — one self-equi-join on the
    fingerprint key (same shape as the shingle seed join).

    ``overlap`` is the overlap coefficient n_shared/min(|A|,|B|);
    pass ``min_overlap`` to filter on it — raw shared counts are
    meaningless on low-entropy corpora where common k-grams saturate
    every pair.

    ``max_doc_freq`` drops fingerprints appearing in more than that
    many documents BEFORE the self-join. This is the skew/scale
    guard: a stopword-ish k-gram shared by f documents contributes
    f^2/2 join rows while carrying no dedup signal (the standard
    winnowing practice; without it the sf0.1 corpus's self-join ran
    minutes instead of seconds). Sizes are computed before the drop,
    so ``overlap`` stays a true fraction of each document."""
    # NO .distinct() here: the fingerprint kernel emits np.unique
    # minima per document, so (doc_id, fingerprint) rows are already
    # globally distinct — a distinct pass would re-shuffle the whole
    # fingerprint table for nothing (round-8 A/B; pinned by
    # tests/test_tokens.py::test_winnow_fingerprints_distinct)
    fp = winnow_fingerprints(df, k, window, id_col, text_col)
    # the fingerprint branch fans out to FIVE consumers (sizes, the
    # doc-freq cap, both self-join sides); without materialization
    # each consumer re-runs the O(n)-python rolling-hash stage —
    # measured 2x the whole query's useful work at sf0.1. On a real
    # cluster this is "write derived fingerprints once, join from
    # storage" — the same pattern duplicate_blocks uses.
    fp = fp.localCheckpoint()
    sizes = fp.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp"))
    if max_doc_freq is not None:
        freq = (
            fp.groupBy("fingerprint")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_doc_freq)
            .select("fingerprint")
        )
        fp = fp.join(freq, "fingerprint")
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
