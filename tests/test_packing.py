"""packing: concat-and-chunk sequence packing with the two-level
distributed running sum."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from textalyzer_spark.operators.packing import chunk_manifest, pack_sequences


def _corpus(spark):
    rows = [
        (1, "a b c d e"),          # 5 tokens, start 0
        (2, ""),                   # 0 tokens, keeps row
        (3, "f g h"),              # 3 tokens, start 5
        (4, "i j k l m n o p q"),  # 9 tokens, start 8, crosses chunk at 8
        (5, "r s"),                # 2 tokens, start 17
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_offsets_chunks_and_empty_docs(spark):
    out = {
        r["doc_id"]: r
        for r in pack_sequences(_corpus(spark), seq_len=8, num_buckets=4).collect()
    }
    assert len(out) == 5
    assert out[1]["start_offset"] == 0 and out[1]["first_chunk"] == 0
    assert out[1]["last_chunk"] == 0 and out[1]["n_chunks"] == 1
    # empty doc occupies no space but keeps its row
    assert out[2]["n_tokens"] == 0 and out[2]["start_offset"] == 5
    assert out[2]["first_chunk"] is None and out[2]["n_chunks"] == 0
    assert out[3]["start_offset"] == 5 and out[3]["last_chunk"] == 0
    # doc 4 spans tokens [8, 17) -> chunks 1..2
    assert out[4]["start_offset"] == 8
    assert (out[4]["first_chunk"], out[4]["last_chunk"], out[4]["n_chunks"]) == (1, 2, 2)
    assert out[5]["start_offset"] == 17 and out[5]["first_chunk"] == 2


def test_manifest_occupancy(spark):
    packed = pack_sequences(_corpus(spark), seq_len=8, num_buckets=4)
    man = {r["chunk_id"]: r for r in chunk_manifest(packed, seq_len=8).collect()}
    # 19 tokens -> chunks 0,1 full (8), chunk 2 ragged (3)
    assert man[0]["n_tokens"] == 8 and man[1]["n_tokens"] == 8
    assert man[2]["n_tokens"] == 3
    assert sum(r["n_tokens"] for r in man.values()) == 19
    # chunk 1: tail of doc 4 only... no: tokens 8-15 all belong to doc 4
    assert man[1]["n_docs"] == 1
    # chunk 0 = tokens [0,8): doc 1 [0,5) + doc 3 [5,8); doc 4 starts at 8
    assert man[0]["n_docs"] == 2


def test_bucketing_invariance(spark):
    """The two-level scan must be a pure implementation detail: any
    num_buckets (including the degenerate single bucket) yields the
    same integers, also under sparse non-dense doc_ids."""
    rows = [(5, "a b c"), (1_000_000, "d e"), (17, "f"), (40_000, "")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    ref = sorted(
        tuple(r) for r in pack_sequences(df, seq_len=2, num_buckets=1).collect()
    )
    for nb in (3, 7, 64):
        got = sorted(
            tuple(r) for r in pack_sequences(df, seq_len=2, num_buckets=nb).collect()
        )
        assert got == ref
    by_id = {r[0]: r for r in ref}
    # order is doc_id: 5 -> 17 -> 40000 -> 1000000
    assert by_id[5][2] == 0 and by_id[17][2] == 3
    assert by_id[40_000][2] == 4 and by_id[1_000_000][2] == 4


def test_clustered_ids_spread_across_buckets(spark):
    """Skew pin: snapshot-prefixed id CLUSTERS (two dense runs 10^12
    apart) must spread over ~all buckets. Equi-width value bucketing
    collapses this shape onto 2 buckets (one window task at scale);
    the equi-depth quantile boundaries keep every bucket ~n/B."""
    from textalyzer_spark.operators.packing import (
        _depth_bucket_col,
        _equi_depth_bounds,
    )

    ids = list(range(500)) + [10**12 + i for i in range(500)]
    df = spark.createDataFrame(
        [(i, "w w w") for i in ids], "doc_id bigint, text string"
    )
    nb = 16
    bounds = _equi_depth_bounds(df, "doc_id", nb)
    counts = {
        r["b"]: r["cnt"]
        for r in df.select(
            _depth_bucket_col(F.col("doc_id"), bounds).alias("b")
        )
        .groupBy("b")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert len(counts) >= nb - 2  # ~every bucket populated
    assert max(counts.values()) <= 2 * (len(ids) / nb)  # no mega-bucket

    # end-to-end: offsets equal the naive global cumsum reference
    got = {
        r["doc_id"]: (r["start_offset"], r["n_tokens"])
        for r in pack_sequences(df, seq_len=8, num_buckets=nb).collect()
    }
    off = 0
    for i in sorted(ids):
        assert got[i] == (off, 3)
        off += 3


def test_plan_two_level_scan(spark):
    """Scale pin: the corpus-sized window is PARTITIONED BY the range
    bucket (parallel); only the O(num_buckets) offset table may use a
    global window; the offset join is broadcast."""
    df = _corpus(spark)
    plan = (
        pack_sequences(df, seq_len=8, num_buckets=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "windowspecdefinition(b" in plan  # big window keyed by bucket
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_empty_corpus(spark):
    df = spark.createDataFrame([], "doc_id bigint, text string")
    assert pack_sequences(df, seq_len=8).count() == 0


# --------------------------------------------------------------------------
# shard_plan (deterministic shuffle-and-shard)
# --------------------------------------------------------------------------


def test_shard_plan_is_exact_permutation_with_full_shards(spark):
    from textalyzer_spark.operators.packing import shard_plan

    df = spark.createDataFrame(
        [(i, "x") for i in range(1000)], "doc_id bigint, text string"
    )
    out = shard_plan(df, shard_size=64).collect()
    pos = sorted(r["global_pos"] for r in out)
    assert pos == list(range(1000))  # bijection onto 0..n-1
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard_id"], []).append(r["pos_in_shard"])
        assert r["shard_id"] == r["global_pos"] // 64
        assert r["pos_in_shard"] == r["global_pos"] % 64
    full = {s for s, ps in by_shard.items() if len(ps) == 64}
    assert len(full) >= len(by_shard) - 1  # only the tail shard ragged
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps)))


def test_shard_plan_matches_single_window_reference(spark):
    """The two-level bucketed scan equals the naive global sort —
    pinned over a SPARSE id space (bucket boundaries at hex-prefix
    granularity must not disturb the permutation)."""
    import hashlib

    from textalyzer_spark.operators.packing import shard_plan

    ids = [3, 7, 1_000_003, 99, 42_000_000_017, 5]
    df = spark.createDataFrame(
        [(i, "t") for i in ids], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: r["global_pos"]
        for r in shard_plan(df, shard_size=2).collect()
    }
    want = {
        d: p
        for p, d in enumerate(
            sorted(ids, key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d))
        )
    }
    assert got == want


def test_shard_plan_decorrelates_ids(spark):
    """Consecutive doc_ids should not land in consecutive positions:
    the permutation is hash-ordered, not id-ordered."""
    from textalyzer_spark.operators.packing import shard_plan

    df = spark.createDataFrame(
        [(i, "x") for i in range(256)], "doc_id bigint, text string"
    )
    out = {r["doc_id"]: r["global_pos"] for r in shard_plan(df, 32).collect()}
    adjacent = sum(1 for i in range(255) if abs(out[i] - out[i + 1]) == 1)
    assert adjacent < 32  # random expectation ~2; id-ordered would be 255


def test_stratified_shard_plan_mixture_balance(spark):
    """Every shard receives each stratum in proportion: per-(shard,
    stratum) counts within 1 of n_stratum/n_shards; shards partition
    the corpus exactly; output deterministic across runs."""
    from pyspark.sql import functions as F

    from textalyzer_spark.operators.packing import stratified_shard_plan

    rows = [(i, f"src{i % 3}") for i in range(1000)] + [
        (10_000 + i, "mega") for i in range(5000)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    out = stratified_shard_plan(df, n_shards=8, salt="t")
    got = out.collect()
    assert len(got) == 6000 and len({r["doc_id"] for r in got}) == 6000
    per = {}
    for r in got:
        per[(r["shard_id"], r["stratum"])] = per.get(
            (r["shard_id"], r["stratum"]), 0
        ) + 1
    strata = {"src0": 334, "src1": 333, "src2": 333, "mega": 5000}
    for (sh, st), n in per.items():
        lo, hi = strata[st] // 8, -(-strata[st] // 8)
        assert lo <= n <= hi, (sh, st, n)
    # determinism: same plan twice, identical assignment
    again = {
        r["doc_id"]: r["shard_id"]
        for r in stratified_shard_plan(df, n_shards=8, salt="t").collect()
    }
    assert all(again[r["doc_id"]] == r["shard_id"] for r in got)


def test_stratified_shard_plan_no_stratum_wide_sort(spark):
    """Scale pin: every window is partitioned (no SinglePartition
    sort anywhere — the mega-stratum spreads over its 256 hash
    buckets; offsets run per-stratum over the bounded count table)."""
    from textalyzer_spark.operators.packing import stratified_shard_plan

    df = spark.createDataFrame(
        [(i, f"s{i % 2}") for i in range(200)], "doc_id bigint, source string"
    )
    plan = (
        stratified_shard_plan(df, n_shards=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan
