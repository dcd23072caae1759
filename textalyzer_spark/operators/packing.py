"""Sequence packing — the final stage of an LLM training-data
pipeline: documents are tokenized, laid end-to-end in a deterministic
order (doc_id), and cut into fixed-length training sequences
("concat-and-chunk", the GPT-2/3 data layout). Each document's
global token offset determines which training chunks it lands in.
(No reference analog; training-data extension family, SURVEY.md
§2.12.)

The global running sum is the scale hazard: the naive
``sum() OVER (ORDER BY doc_id)`` funnels the whole corpus through ONE
partition. This implementation is a two-level distributed scan:

1. order-preserving range buckets over doc_id — boundaries are
   EQUI-DEPTH (sampled quantiles of doc_id via a column-pruned
   ``percentile_approx`` scan, the ``repartitionByRange`` boundary
   discipline), NOT equi-width value ranges: clustered or sparse id
   spaces (snapshot-prefixed int64 ranges at 10^12 docs) would
   collapse equi-width buckets onto one window task, while quantile
   boundaries keep every bucket ~n/num_buckets rows regardless of the
   id distribution;
2. intra-bucket running sums — a window PARTITIONED BY bucket, so
   every bucket sorts and scans in parallel;
3. bucket prefix offsets from the O(num_buckets) per-bucket totals
   (a window over that tiny table only), broadcast-joined back.

The OUTPUT is invariant to bucket placement (intra-bucket prefix +
bucket offset telescopes to the exact global prefix for any
order-preserving contiguous bucketing), so the approximate quantiles
never touch correctness — they only balance the plan. All arithmetic
is int64 (integral ``percentile_approx`` returns exact int64 data
values as boundaries — no double round-trip). At 1000 executors,
raise ``num_buckets`` with the cluster; the only driver-size object
remains the num_buckets-row offset table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _equi_depth_bounds(
    df: DataFrame, id_col: str, num_buckets: int
) -> list[int] | None:
    """Internal equi-depth bucket boundaries for ``id_col``: the
    deduplicated ``i/num_buckets`` quantiles (exclusive of 0 and 1)
    from one column-pruned ``percentile_approx`` scan. ``None`` for an
    empty corpus. Boundaries are exact int64 DATA VALUES (integral
    percentile_approx never goes through doubles), so bucketing is
    precise even for 2^63-scale ids."""
    probs = [i / num_buckets for i in range(1, num_buckets)]
    aggs = [F.min(id_col).alias("mn")]
    if probs:
        aggs.append(
            F.percentile_approx(
                F.col(id_col).cast("long"), probs, 10_000
            ).alias("bs")
        )
    row = df.agg(*aggs).first()
    if row["mn"] is None:
        return None
    return sorted({int(x) for x in row["bs"]}) if probs else []


def _depth_bucket_col(id_expr: Column, bounds: list[int]) -> Column:
    """Order-preserving bucket index: the number of boundaries
    strictly below ``id_expr``. A flat sum of codegen-friendly
    indicator terms (no HOF — stays inside whole-stage codegen); cost
    is O(num_buckets) long compares per row, negligible next to the
    tokenize split."""
    b: Column = F.lit(0)
    for x in bounds:
        b = b + F.when(id_expr > F.lit(x), 1).otherwise(0)
    return b.cast("long")


def pack_sequences(
    df: DataFrame,
    seq_len: int = 2048,
    num_buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign every document its half-open global token span and the
    training chunks it occupies under concat-and-chunk packing.

    Output: ``(doc_id, n_tokens int, start_offset bigint,
    first_chunk bigint, last_chunk bigint, n_chunks int)`` — chunk
    columns NULL (n_chunks 0) for token-less documents, which occupy
    no space but keep their row. Token counts are non-empty
    whitespace splits under the pinned cross-engine class
    ``alphabet.WS_SPLIT``.
    """
    from textalyzer_spark.functions.alphabet import NON_WS_CLASS

    # count of non-empty WS_SPLIT pieces == count of maximal non-ws
    # runs; regexp_count stays in codegen where the array-HOF filter
    # ran interpreted (round 8; values identical by construction)
    n = F.regexp_count(F.col(text_col), F.lit(f"{NON_WS_CLASS}+")).cast(
        "long"
    )
    t = df.select(F.col(id_col).alias("doc_id"), n.alias("n"))

    # bucket boundaries: a column-pruned scan (doc_id only) — cheap
    # enough to not warrant checkpointing the token counts
    bounds = _equi_depth_bounds(df, id_col, num_buckets)
    if bounds is None:
        return t.select(
            "doc_id",
            F.col("n").cast("int").alias("n_tokens"),
            F.lit(None).cast("long").alias("start_offset"),
            F.lit(None).cast("long").alias("first_chunk"),
            F.lit(None).cast("long").alias("last_chunk"),
            F.lit(0).alias("n_chunks"),
        )

    t = t.withColumn("b", _depth_bucket_col(F.col("doc_id"), bounds))

    intra_w = Window.partitionBy("b").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    t = t.withColumn("intra_end", F.sum("n").over(intra_w))

    btot = t.groupBy("b").agg(F.sum("n").alias("bn"))
    # O(num_buckets) rows: the only single-partition window in the plan
    boff_w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    boff = btot.select(
        "b", F.coalesce(F.sum("bn").over(boff_w), F.lit(0).cast("long")).alias("boff")
    )

    out = t.join(F.broadcast(boff), "b")
    start = F.col("boff") + F.col("intra_end") - F.col("n")
    first = (start - start % F.lit(seq_len)) / F.lit(seq_len)
    end_tok = start + F.col("n") - 1
    last = (end_tok - end_tok % F.lit(seq_len)) / F.lit(seq_len)
    return out.select(
        "doc_id",
        F.col("n").cast("int").alias("n_tokens"),
        start.alias("start_offset"),
        F.when(F.col("n") > 0, first.cast("long")).alias("first_chunk"),
        F.when(F.col("n") > 0, last.cast("long")).alias("last_chunk"),
        F.when(F.col("n") > 0, (last - first + 1).cast("int"))
        .otherwise(F.lit(0))
        .alias("n_chunks"),
    )


def chunk_manifest(packed: DataFrame, seq_len: int = 2048) -> DataFrame:
    """Chunk-level roll-up of :func:`pack_sequences` output: for each
    training chunk, how many documents contribute and whether it is
    the full ``seq_len`` (the last chunk of the corpus is usually a
    ragged remainder a trainer drops or pads). One explode over the
    per-doc chunk RANGE (each doc touches ``n_chunks`` chunks — total
    work is O(total_chunks + docs), not O(docs * chunks))."""
    spans = packed.where(F.col("n_chunks") > 0).select(
        "doc_id",
        "n_tokens",
        "start_offset",
        F.explode(F.sequence("first_chunk", "last_chunk")).alias("chunk_id"),
    )
    ov_start = F.greatest(F.col("start_offset"), F.col("chunk_id") * F.lit(seq_len))
    ov_end = F.least(
        F.col("start_offset") + F.col("n_tokens"),
        (F.col("chunk_id") + 1) * F.lit(seq_len),
    )
    return (
        spans.withColumn("tok_in_chunk", ov_end - ov_start)
        .groupBy("chunk_id")
        .agg(
            F.count("*").cast("int").alias("n_docs"),
            F.sum("tok_in_chunk").alias("n_tokens"),
        )
    )


def shard_plan(
    df: DataFrame,
    shard_size: int = 1024,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic shuffle-and-shard: assign every document a
    position in a pseudo-random global permutation (ordered by
    ``md5(doc_id)`` — Spark lower-hex md5 == DuckDB md5, so the
    permutation is engine-identical AND uncorrelated with ingest
    order) and cut that order into fixed-size training shards. The
    writer-side complement of :func:`pack_sequences`: a trainer
    streams ``shard_id`` files in ``pos_in_shard`` order and sees an
    id-decorrelated document mix without any global sort at write
    time.

    Scale shape: the global rank reuses the two-level scan — the md5
    hex key's FIRST BYTE is 256 order-preserving range buckets (hex
    strings of equal length sort identically to their numeric value:
    '0'-'9' < 'a'-'f' in ASCII), so intra-bucket ranks run in a
    window PARTITIONED BY bucket and only the 256-row bucket-count
    table sees a single-partition window.

    Output: ``(doc_id, global_pos bigint, shard_id bigint,
    pos_in_shard int)``.
    """
    key = F.md5(F.col(id_col).cast("string"))
    t = df.select(
        F.col(id_col).alias("doc_id"),
        key.alias("k"),
        F.conv(F.substring(key, 1, 2), 16, 10).cast("long").alias("b"),
    )
    intra_w = Window.partitionBy("b").orderBy("k", "doc_id")
    t = t.withColumn("r", F.row_number().over(intra_w).cast("long"))

    btot = t.groupBy("b").agg(F.count("*").alias("bn"))
    # O(256) rows: the only single-partition window in the plan
    boff_w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    boff = btot.select(
        "b", F.coalesce(F.sum("bn").over(boff_w), F.lit(0).cast("long")).alias("boff")
    )
    gp = F.col("boff") + F.col("r") - 1
    return t.join(F.broadcast(boff), "b").select(
        "doc_id",
        gp.alias("global_pos"),
        F.floor(gp / F.lit(shard_size)).cast("long").alias("shard_id"),
        (gp % F.lit(shard_size)).cast("int").alias("pos_in_shard"),
    )


def stratified_shard_plan(
    df: DataFrame,
    n_shards: int,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Mixture-preserving shuffle-and-shard: every shard receives each
    stratum (source, language, ...) in corpus proportion — per
    ``(shard, stratum)`` counts differ by at most 1 from
    ``n_stratum / n_shards``, so a trainer streaming ANY single shard
    sees an unbiased sample of the mixture (plain :func:`shard_plan`
    only decorrelates ids; a source whose ids cluster could still
    concentrate early shards of a PARTIAL read). Round-robin over the
    stratum's deterministic md5 permutation:
    ``shard = stratum_pos % n_shards``.

    Scale shape: the per-stratum rank is the same two-level scan as
    :func:`shard_plan` nested one level down — intra-bucket windows
    partitioned by ``(stratum, first-md5-byte)``, bucket offsets from
    a per-stratum window over the O(n_strata x 256)-row count table
    (partitioned by stratum: bounded rows per partition, parallel
    across strata). No stratum-wide or corpus-wide sort anywhere; a
    mega-stratum spreads over its 256 hash buckets.

    Output: ``(doc_id, stratum, stratum_pos bigint, shard_id
    bigint)``; the writer orders a shard's rows by
    ``(stratum, stratum_pos)`` — deterministic, engine-identical."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    t = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(stratum_col).alias("stratum"),
        key.alias("k"),
        F.conv(F.substring(key, 1, 2), 16, 10).cast("long").alias("b"),
    )
    intra_w = Window.partitionBy("stratum", "b").orderBy("k", "doc_id")
    t = t.withColumn("r", F.row_number().over(intra_w).cast("long"))

    btot = t.groupBy("stratum", "b").agg(F.count("*").alias("bn"))
    boff_w = (
        Window.partitionBy("stratum")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boff = btot.select(
        "stratum",
        "b",
        F.coalesce(F.sum("bn").over(boff_w), F.lit(0).cast("long")).alias(
            "boff"
        ),
    )
    sp = F.col("boff") + F.col("r") - 1
    return t.join(boff, ["stratum", "b"]).select(
        "doc_id",
        "stratum",
        sp.alias("stratum_pos"),
        (sp % F.lit(n_shards)).cast("long").alias("shard_id"),
    )
