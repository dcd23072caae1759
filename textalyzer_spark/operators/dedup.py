"""Deduplication operators for training-data pipelines:
exact, n-gram Jaccard, MinHash+LSH, SimHash.

North_star: "n-gram shingling with rolling-hash duplicate detection".
The shingle→hash→band→bucket-join pattern follows the public
MinHash/LSH literature (Broder 1997; Leskovec et al., MMDS ch.3).

Scale notes: every stage is a hash shuffle on a derived key (shingle,
band hash, simhash chunk). Partial aggregation and AQE skew splitting
apply automatically; the signature computation itself is a per-row
Catalyst expression over the token array (no Python, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from textalyzer_spark.operators.shingles import doc_shingles

# Mersenne prime 2^31-1: with a,b,x all < p, a*x + b < 2^62 so the
# modular hash stays exact in signed 64-bit (Spark 4 ANSI mode throws
# on overflow; a 2^61 prime would overflow the multiply).
_P = (1 << 31) - 1


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by md5 of the raw text:
    ``(fingerprint, keep_id, n_docs)`` — ``keep_id`` is the minimal
    doc_id (the canonical survivor). One hash-aggregate shuffle."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("fingerprint"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def _distinct_shingles(df: DataFrame, k: int, id_col: str, text_col: str) -> DataFrame:
    return doc_shingles(df, k, id_col, text_col).distinct()


def ngram_jaccard_pairs(
    df: DataFrame,
    k: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs:
    ``(doc_a, doc_b, jaccard)`` for pairs with similarity >= threshold,
    jaccard rounded to 4 decimals, doc_a < doc_b.

    Shuffles: distinct shingles (1), self-join on shingle (2),
    pair aggregation (3). The self-join fans out quadratically on
    ultra-common shingles — at scale drop the top-percentile shingles
    first (stopword shingles carry no dedup signal), or use
    :func:`minhash_lsh_pairs` which replaces the full self-join with
    banded buckets.
    """
    sh = _distinct_shingles(df, k, id_col, text_col)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _hash_params(num_hashes: int, seed: int) -> tuple[list[int], list[int]]:
    """Deterministic (a, b) for h_i(x) = (a_i*x + b_i) mod p."""
    import random

    rng = random.Random(seed)
    return (
        [rng.randrange(1, _P) for _ in range(num_hashes)],
        [rng.randrange(0, _P) for _ in range(num_hashes)],
    )


def minhash_signatures(
    df: DataFrame,
    k: int = 3,
    num_hashes: int = 64,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, signature array<bigint>)`` — MinHash over k-shingles.

    The whole signature is one Catalyst expression per row:
    shingle set → xxhash64 → num_hashes affine permutations → min.
    No shuffle, no Python; scales linearly with corpus size.
    """
    from textalyzer_spark.functions.tokenize import tokens_col
    from textalyzer_spark.operators.shingles import shingles_from_tokens

    av, bv = _hash_params(num_hashes, seed)
    sh = F.array_distinct(shingles_from_tokens(tokens_col(text_col), k))
    # materialize the reduced base hashes as a real column FIRST: an
    # expression referenced inside a per-hash lambda would be
    # re-evaluated num_hashes times per row (tokenize+shingle 64x —
    # measured 40x slower before this split)
    based = df.select(
        F.col(id_col).alias("doc_id"),
        # base hash reduced into [0, p): pmod handles xxhash64 negatives
        F.transform(sh, lambda s: F.pmod(F.xxhash64(s), F.lit(_P))).alias("base"),
    )
    def _perm(a: int, b: int):
        return lambda x: F.pmod(F.lit(a) * x + F.lit(b), F.lit(_P))

    sig = F.array(
        *[
            F.array_min(F.transform(F.col("base"), _perm(a, b)))
            for a, b in zip(av, bv)
        ]
    )
    return based.select(
        "doc_id",
        F.when(F.size("base") > 0, sig).alias("signature"),
    ).filter(F.col("signature").isNotNull())


def minhash_lsh_pairs(
    df: DataFrame,
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash + banded LSH near-duplicate pairs, exact-verified:
    ``(doc_a, doc_b, jaccard)``.

    Candidate generation: signatures are cut into ``bands`` bands of
    ``num_hashes/bands`` rows; docs colliding in any band's bucket
    become candidates (bucket join — no all-pairs self-join).
    Candidates are then verified with exact shingle Jaccard, so
    precision is exact and only recall depends on the S-curve
    1-(1-t^r)^b. With 64 hashes / 16 bands (r=4), t=0.5 → ~0.93 recall.
    """
    rows = num_hashes // bands
    sigs = minhash_signatures(df, k, num_hashes, seed, id_col, text_col)
    buckets = sigs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bnd: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(F.col("signature"), bnd * rows + 1, rows),
                            lambda x: x.cast("string"),
                        ),
                    )
                ),
            )
        ).alias("band", "bucket"),
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # exact verification of candidates only
    sh = _distinct_shingles(df, k, id_col, text_col)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sha = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    shb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cands.join(sha, "doc_a")
        .join(shb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash over tokens: ``(doc_id, simhash bigint)``.

    Per bit j: sign of sum over tokens of (+1 if bit j of xxhash64
    set else -1). Pure Catalyst bit arithmetic; no shuffle.
    """
    from textalyzer_spark.functions.tokenize import tokens_col

    toks = tokens_col(text_col)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def tok_bits(h):
        # +1/-1 per bit of the token hash; bit masks are unrolled with
        # Python-int shift amounts (shiftleft requires a literal count)
        return F.array(
            *[
                F.when(
                    h.bitwiseAND(F.shiftleft(F.lit(1).cast("bigint"), j)) != 0, 1
                ).otherwise(-1)
                for j in range(64)
            ]
        )

    zero = F.array_repeat(F.lit(0), 64)
    # materialize the per-bit sums as a column: referencing the
    # aggregate expression from each of the 64 OR terms would
    # re-evaluate the whole token scan 64 times per row
    summed = df.select(
        F.col(id_col).alias("doc_id"),
        F.aggregate(
            hashes, zero, lambda acc, h: F.zip_with(acc, tok_bits(h), lambda a, b: a + b)
        ).alias("sums"),
    )
    sim = F.lit(0).cast("bigint")
    for j in range(64):
        sim = sim.bitwiseOR(
            F.when(
                F.element_at(F.col("sums"), j + 1) > 0,
                F.shiftleft(F.lit(1).cast("bigint"), j),
            ).otherwise(F.lit(0).cast("bigint"))
        )
    return summed.select("doc_id", sim.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash near-duplicate pairs with Hamming distance <=
    ``max_hamming``: ``(doc_a, doc_b, hamming)``.

    Pigeonhole banding: split 64 bits into ``max_hamming+1`` chunks —
    any pair within distance d collides on at least one exact chunk.
    Bucket-join on (chunk_index, chunk_value), verify exact distance.
    """
    chunks = max_hamming + 1
    width = 64 // chunks
    sh = simhash(df, id_col, text_col)
    keyed = sh.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND(
                        F.lit((1 << width) - 1).cast("bigint")
                    )
                    for i in range(chunks)
                ]
            )
        ).alias("chunk_idx", "chunk_val"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        pairs.select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
