"""HyperLogLog sketch (textalyzer_spark/operators/sketch.py) and
weighted sampling (operators/sampling.weighted_sample).

Cross-engine exactness lives in the oracle gate (hll_distinct_tokens,
weighted_sample); here we pin the algebra the gate can't see:
mergeability (sketch(A ∪ B) == merge(sketch(A), sketch(B)) exactly),
accuracy within the published error bound, the register derivation
vs a pure-python HLL, the linear-counting ln grid parity, and the
A-ES inclusion-probability / no-shuffle plan properties.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from textalyzer_spark.operators.sketch import (
    P_DEFAULT,
    bit_length_case_sql,
    hll_distinct_report,
    hll_estimate,
    hll_merge,
    hll_registers,
)


def _md5_le8(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


def _py_registers(values, p, salt=""):
    m = 1 << p
    regs = {}
    for v in set(values):
        h = _md5_le8(salt + v)
        bucket = h % m
        w = h >> p
        rho = (64 - p) - w.bit_length() + 1
        if rho > regs.get(bucket, 0):
            regs[bucket] = rho
    return regs


def _vals_df(spark, values):
    return spark.createDataFrame([(v,) for v in values], "value string")


def test_registers_match_pure_python(spark):
    vals = [f"tok{i}" for i in range(2000)] + ["dup"] * 50
    p = 8
    got = {
        r["bucket"]: r["rho"]
        for r in hll_registers(_vals_df(spark, vals), p=p).collect()
    }
    assert got == _py_registers(vals, p)


def test_duplicates_do_not_change_sketch(spark):
    # max over a multiset == max over its support: the one-pass,
    # no-distinct property the 10^12-doc shape depends on
    base = [f"x{i}" for i in range(500)]
    a = hll_registers(_vals_df(spark, base), p=8).collect()
    b = hll_registers(_vals_df(spark, base * 7), p=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_merge_equals_union_sketch_exactly(spark):
    a_vals = [f"a{i}" for i in range(800)]
    b_vals = [f"b{i}" for i in range(600)] + a_vals[:100]
    p = 8
    sk_union = hll_registers(_vals_df(spark, a_vals + b_vals), p=p)
    merged = hll_merge(
        hll_registers(_vals_df(spark, a_vals), p=p),
        hll_registers(_vals_df(spark, b_vals), p=p),
    )
    assert sorted(map(tuple, sk_union.collect())) == sorted(
        map(tuple, merged.collect())
    )
    # and therefore identical estimates
    eu = hll_estimate(sk_union, p=p).collect()[0]
    em = hll_estimate(merged, p=p).collect()[0]
    assert tuple(eu) == tuple(em)


def test_estimate_within_error_bound(spark):
    # standard error 1.04/sqrt(m); allow 4 sigma
    n = 30_000
    vals = [f"card{i}" for i in range(n)]
    row = hll_distinct_report(_vals_df(spark, vals), p=P_DEFAULT).collect()[0]
    assert row["n_distinct_exact"] == n
    sigma = 1.04 / math.sqrt(1 << P_DEFAULT)
    assert abs(row["rel_err"]) < 4 * sigma


def test_small_range_linear_counting(spark):
    # tiny cardinality -> raw estimate <= 2.5m -> linear counting
    vals = [f"s{i}" for i in range(40)]
    row = hll_distinct_report(_vals_df(spark, vals), p=P_DEFAULT).collect()[0]
    m = 1 << P_DEFAULT
    assert row["m"] == m
    assert row["v_zero"] > 0
    # glibc kernel both sides -> EXACT equality, not approx
    assert row["hll_estimate"] == m * math.log(m / row["v_zero"])
    # exact at this density: every register distinct w.h.p.
    assert abs(row["rel_err"]) < 0.1


def test_bit_length_case_ladder_full_grid():
    # the CASE ladder shared verbatim with the oracle == int.bit_length
    # on every boundary and near-boundary value
    max_bits = 52
    sql = bit_length_case_sql("v", max_bits)

    def eval_case(v):
        for b in range(max_bits, 0, -1):
            if v >= 1 << (b - 1):
                return b
        return 0

    probes = {0, 1, 2, 3}
    for b in range(2, max_bits + 1):
        probes |= {(1 << b) - 1, 1 << b, (1 << b) + 1}
    for v in probes:
        if v < 1 << max_bits:
            assert eval_case(v) == v.bit_length(), v
    assert "WHEN v >= 1 THEN 1" in sql


def test_linear_counting_glibc_exact_on_jvm_divergent_grid(spark):
    # the ln branch evaluates ln(m / V) for V in [1, m]. JVM F.log
    # differs from glibc math.log in the last ulp on a few % of that
    # grid — find those V in one vectorized job, then prove the
    # ENGINE path (glibc pandas-UDF kernel) is bit-exact there, i.e.
    # a regression back to F.log cannot pass this test.
    m = 1 << P_DEFAULT
    jvm = {
        r["v"]: r["jvm_ln"]
        for r in spark.range(1, m + 1)
        .select(
            F.col("id").alias("v"),
            F.log(F.lit(float(m)) / F.col("id").cast("double")).alias(
                "jvm_ln"
            ),
        )
        .collect()
    }
    divergent = [v for v in jvm if jvm[v] != math.log(m / v)]
    assert divergent, "expected some JVM-vs-glibc last-ulp divergence"
    for v_zero in divergent[:4]:
        # register table with exactly m - v_zero nonzero buckets,
        # rho=1 -> hsum large -> linear-counting branch selected
        regs = spark.createDataFrame(
            [(b, 1) for b in range(m - v_zero)], "bucket int, rho int"
        )
        row = hll_estimate(regs, p=P_DEFAULT).collect()[0]
        assert row["v_zero"] == v_zero
        assert row["hll_estimate"] == m * math.log(m / v_zero), v_zero


def test_invalid_p_rejected(spark):
    df = _vals_df(spark, ["a"])
    with pytest.raises(ValueError):
        hll_registers(df, p=10 + 1)  # not a multiple of 4
    with pytest.raises(ValueError):
        hll_registers(df, p=20)


def test_hll_catalog_snapshot_roundtrip(spark, tmp_path):
    # the production loop: sketch batch A -> persist (snapshot=1,
    # _SUCCESS-committed) -> batch B arrives -> merge(read, sketch(B))
    # -> persist (snapshot=2) -> estimate == the union sketch's.
    # O(m) state per snapshot, never a corpus re-scan.
    from textalyzer_spark.operators.incremental import (
        read_catalog,
        write_catalog_snapshot,
    )

    base = str(tmp_path / "hll_catalog")
    a_vals = [f"a{i}" for i in range(700)]
    b_vals = [f"b{i}" for i in range(400)] + a_vals[:50]
    p = 8

    assert write_catalog_snapshot(hll_registers(_vals_df(spark, a_vals), p=p), base) == 1
    merged = hll_merge(
        read_catalog(spark, base),
        hll_registers(_vals_df(spark, b_vals), p=p),
    )
    assert write_catalog_snapshot(merged, base) == 2
    got = hll_estimate(read_catalog(spark, base), p=p).collect()[0]
    want = hll_estimate(
        hll_registers(_vals_df(spark, a_vals + b_vals), p=p), p=p
    ).collect()[0]
    assert tuple(got) == tuple(want)


def test_registers_plan_partial_agg_jvm_side(spark):
    # the 10^12-doc property: register derivation is pure JVM (md5 +
    # conv + CASE ladder, no Python stage) and the MAX agg is
    # map-side partial, so the shuffle carries <= m rows per map
    # partition regardless of corpus size
    df = _vals_df(spark, [f"v{i}" for i in range(100)])
    plan = (
        hll_registers(df, p=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan
    # two HashAggregates around the exchange = partial + final
    assert plan.count("HashAggregate") >= 2
    assert "md5" in plan


# ----------------------------------------------------------- count-min


def _py_cms(values, depth, width_p, salt=""):
    m = 1 << width_p
    table = {}
    for v in values:
        for r in range(depth):
            b = _md5_le8(f"{salt}cms{r}|{v}") % m
            table[(r, b)] = table.get((r, b), 0) + 1
    return table


def _py_cms_lookup(table, v, depth, width_p, salt=""):
    m = 1 << width_p
    return min(
        table.get((r, _md5_le8(f"{salt}cms{r}|{v}") % m), 0)
        for r in range(depth)
    )


def test_cms_table_matches_pure_python(spark):
    from textalyzer_spark.operators.sketch import cms_table

    vals = [f"tok{i % 700}" for i in range(5000)]
    got = {
        (r["r"], r["bucket"]): r["cnt"]
        for r in cms_table(_vals_df(spark, vals), depth=3, width_p=8).collect()
    }
    assert got == _py_cms(vals, depth=3, width_p=8)


def test_cms_lookup_never_undercounts_and_is_tight(spark):
    from textalyzer_spark.operators.sketch import cms_lookup, cms_table

    vals = [f"tok{i % 300}" for i in range(3000)] + ["hot"] * 500
    df = _vals_df(spark, vals)
    sketch = cms_table(df, depth=4, width_p=12)
    queries = _vals_df(spark, [f"tok{i}" for i in range(300)] + ["hot"])
    got = {
        r["value"]: r["cnt_cms"]
        for r in cms_lookup(sketch, queries, depth=4, width_p=12).collect()
    }
    exact = {f"tok{i}": 10 for i in range(300)} | {"hot": 500}
    n = len(vals)
    for v, cnt in exact.items():
        # CMS guarantee: never under; over by <= e/m * N w.h.p.
        assert got[v] >= cnt
        assert got[v] - cnt <= math.e / (1 << 12) * n * 4
    # absent key estimates 0 in an unsaturated sketch (or tiny if
    # every row collides — not at this fill factor)
    absent = cms_lookup(
        sketch, _vals_df(spark, ["never-seen"]), depth=4, width_p=12
    ).collect()[0]["cnt_cms"]
    assert absent <= 10


def test_cms_merge_equals_union_sketch(spark):
    from textalyzer_spark.operators.sketch import cms_merge, cms_table

    a = [f"a{i % 50}" for i in range(400)]
    b = [f"b{i % 80}" for i in range(300)] + a[:100]
    kw = dict(depth=4, width_p=8)
    merged = {
        (r["r"], r["bucket"]): r["cnt"]
        for r in cms_merge(
            cms_table(_vals_df(spark, a), **kw),
            cms_table(_vals_df(spark, b), **kw),
        ).collect()
    }
    union = {
        (r["r"], r["bucket"]): r["cnt"]
        for r in cms_table(_vals_df(spark, a + b), **kw).collect()
    }
    assert merged == union


def test_cms_catalog_snapshot_roundtrip(spark, tmp_path):
    # same production loop as the HLL catalog: sketch -> persist ->
    # merge(read, sketch(batch)) -> persist; estimates from the read
    # catalog equal the union sketch's. O(depth * width) state.
    from textalyzer_spark.operators.incremental import (
        read_catalog,
        write_catalog_snapshot,
    )
    from textalyzer_spark.operators.sketch import (
        cms_lookup,
        cms_merge,
        cms_table,
    )

    base = str(tmp_path / "cms_catalog")
    kw = dict(depth=4, width_p=8)
    a = [f"a{i % 40}" for i in range(300)]
    b = [f"b{i % 30}" for i in range(200)] + ["a0"] * 25

    assert write_catalog_snapshot(cms_table(_vals_df(spark, a), **kw), base) == 1
    merged = cms_merge(
        read_catalog(spark, base), cms_table(_vals_df(spark, b), **kw)
    )
    assert write_catalog_snapshot(merged, base) == 2
    got = cms_lookup(
        read_catalog(spark, base), _vals_df(spark, ["a0", "b0"]), **kw
    ).collect()
    want = _py_cms(a + b, **kw)
    for row in got:
        assert row["cnt_cms"] == _py_cms_lookup(want, row["value"], **kw)


def test_cms_plan_jvm_partial_agg_and_broadcast_lookup(spark):
    from textalyzer_spark.operators.sketch import cms_lookup, cms_table

    df = _vals_df(spark, [f"v{i}" for i in range(100)])
    sketch = cms_table(df, depth=4, width_p=8)
    plan = sketch._jdf.queryExecution().executedPlan().toString()
    # pure JVM (md5 + conv), map-side partial SUM before the exchange
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2
    assert "md5" in plan
    # lookups broadcast the (always <= depth * width rows) sketch —
    # the query side, which may be the whole corpus, never shuffles
    lplan = (
        cms_lookup(sketch, df, depth=4, width_p=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in lplan


# ---------------------------------------------------------------- A-ES


def _py_weighted_topk(rows, k, salt):
    scored = []
    for doc_id, w in rows:
        u = (_md5_le8(salt + str(doc_id)) + 1) / 2.0**64
        scored.append((math.log(u) / w, doc_id, w))
    scored.sort(key=lambda t: (-t[0], t[1]))
    return [(d, w, pr) for pr, d, w in scored[:k]]


def test_weighted_sample_matches_pure_python(spark):
    from textalyzer_spark.operators.sampling import weighted_sample

    rows = [(i, 1 + (i * 37) % 500) for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id bigint, w bigint")
    got = [
        (r["doc_id"], r["weight"], r["priority"])
        for r in weighted_sample(df, k=50, weight_col="w", salt="t").collect()
    ]
    assert got == _py_weighted_topk(rows, 50, "t")


def test_weighted_sample_inclusion_proportional_to_weight(spark):
    # one heavy doc among light ones: P(include) ~ w_i / sum(w) per
    # slot; across salts the heavy doc must appear far more often
    from textalyzer_spark.operators.sampling import weighted_sample

    rows = [(i, 1000 if i == 0 else 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id bigint, w bigint")
    hits = 0
    for s in range(20):
        ids = {
            r["doc_id"]
            for r in weighted_sample(
                df, k=5, weight_col="w", salt=f"s{s}"
            ).collect()
        }
        hits += 0 in ids
    assert hits >= 18  # heavy doc ~5x total light mass


def test_weighted_sample_rejects_nonpositive_weight(spark):
    from pyspark.errors import PySparkRuntimeError
    from pyspark.sql.utils import AnalysisException

    from textalyzer_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 5), (2, 0)], "doc_id bigint, w bigint"
    )
    with pytest.raises((PySparkRuntimeError, AnalysisException, Exception)):
        weighted_sample(df, k=2, weight_col="w").collect()


def test_weighted_sample_plan_no_shuffle(spark):
    # TakeOrderedAndProject, not a global Sort + Exchange of the corpus
    from textalyzer_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(100)], "doc_id bigint, w bigint"
    )
    plan = (
        weighted_sample(df, k=10, weight_col="w")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_weighted_sample_merge_equals_union_sample(spark, tmp_path):
    # A-ES top-k is a mergeable bounded summary: fold of persisted
    # per-batch top-k tables == the sample of the union corpus,
    # row-for-row including stored double priorities (parquet
    # round-trip is bit-exact)
    from textalyzer_spark.operators.incremental import (
        read_catalog,
        write_catalog_snapshot,
    )
    from textalyzer_spark.operators.sampling import (
        weighted_sample,
        weighted_sample_merge,
    )

    rows = [(i, 1 + (i * 53) % 300) for i in range(2000)]
    a = [r for r in rows if r[0] % 2 == 0]
    b = [r for r in rows if r[0] % 2 == 1]

    def df(rs):
        return spark.createDataFrame(rs, "doc_id bigint, w bigint")

    k = 40
    base = str(tmp_path / "aes_catalog")
    write_catalog_snapshot(
        weighted_sample(df(a), k=k, weight_col="w", salt="m"), base
    )
    merged = weighted_sample_merge(
        read_catalog(spark, base),
        weighted_sample(df(b), k=k, weight_col="w", salt="m"),
        k=k,
    )
    want = weighted_sample(df(rows), k=k, weight_col="w", salt="m").collect()
    assert [tuple(r) for r in merged.collect()] == [tuple(r) for r in want]


# --------------------------------------------------------------- bloom


def _py_bloom_bits(values, k, width_p, salt=""):
    m = 1 << width_p
    return {
        _md5_le8(f"{salt}bf{r}|{v}") % m for v in values for r in range(k)
    }


def test_bloom_bits_match_pure_python_and_merge(spark):
    from textalyzer_spark.operators.sketch import bloom_bits, bloom_merge

    a = [f"a{i}" for i in range(300)]
    b = [f"b{i}" for i in range(200)] + a[:40]
    kw = dict(k_hashes=3, width_p=12)
    got_a = {r["bit"] for r in bloom_bits(_vals_df(spark, a), **kw).collect()}
    assert got_a == _py_bloom_bits(a, 3, 12)
    merged = {
        r["bit"]
        for r in bloom_merge(
            bloom_bits(_vals_df(spark, a), **kw),
            bloom_bits(_vals_df(spark, b), **kw),
        ).collect()
    }
    assert merged == _py_bloom_bits(a + b, 3, 12)


def test_bloom_no_false_negatives_and_bounded_positives(spark):
    from textalyzer_spark.operators.sketch import bloom_bits, bloom_contains

    seen = [f"s{i}" for i in range(400)]
    novel = [f"n{i}" for i in range(400)]
    kw = dict(k_hashes=4, width_p=16)
    bits = bloom_bits(_vals_df(spark, seen), **kw)
    got = {
        r["value"]: r["contained"]
        for r in bloom_contains(
            bits, _vals_df(spark, seen + novel), **kw
        ).collect()
    }
    # membership NEVER misses an inserted value
    assert all(got[v] for v in seen)
    # false positives bounded: (1 - e^(-kn/m))^k ~ 1e-7 here; allow slack
    assert sum(got[v] for v in novel) <= 2


def test_bloom_dedup_subset_of_exact_with_planted_fp(spark, tmp_path):
    # a SATURATED filter (width_p=4 -> 16 bits) forces false
    # positives: output must be the exact survivors MINUS
    # bloom-contained fingerprints, never a kept duplicate
    from textalyzer_spark.operators.incremental import (
        incremental_exact_dedup,
        read_catalog,
        write_catalog_snapshot,
    )
    from textalyzer_spark.operators.sketch import (
        bloom_bits,
        bloom_contains,
        bloom_dedup_new,
    )

    old = spark.createDataFrame(
        [(i, f"old text {i}") for i in range(40)], "doc_id bigint, text string"
    )
    new = spark.createDataFrame(
        [(100 + i, f"new text {i}") for i in range(30)]
        + [(200, "old text 7"), (201, "new text 3")],  # dup-of-old + intra dup
        "doc_id bigint, text string",
    )
    for kw in (dict(k_hashes=4, width_p=16), dict(k_hashes=2, width_p=4)):
        base = str(tmp_path / f"bloom_{kw['width_p']}")
        write_catalog_snapshot(
            bloom_bits(
                old.select(F.md5("text").alias("fingerprint")),
                "fingerprint",
                **kw,
            ),
            base,
        )
        bits = read_catalog(spark, base)
        got = {r["doc_id"] for r in bloom_dedup_new(new, bits, **kw).collect()}
        exact = {
            r["doc_id"]
            for r in incremental_exact_dedup(
                new,
                old.groupBy(F.md5("text").alias("fingerprint")).agg(
                    F.min("doc_id").alias("keep_id")
                ),
            ).collect()
        }
        assert got <= exact  # never keeps what exact drops
        assert 200 not in got  # the seen duplicate can never survive
        dropped = exact - got
        if kw["width_p"] == 16:
            assert not dropped  # unsaturated: equals the exact operator
        else:
            # every extra drop is a genuine bloom false positive
            fp_fps = {
                r["fingerprint"]
                for r in new.filter(F.col("doc_id").isin(list(dropped)))
                .select(F.md5("text").alias("fingerprint"))
                .collect()
            }
            contained = {
                r["fingerprint"]: r["contained"]
                for r in bloom_contains(
                    bits,
                    spark.createDataFrame(
                        [(f,) for f in fp_fps], "fingerprint string"
                    ),
                    "fingerprint",
                    **kw,
                ).collect()
            }
            assert all(contained.values())


def test_bloom_probe_plan_broadcasts_bits(spark):
    from textalyzer_spark.operators.sketch import bloom_bits, bloom_contains

    df = _vals_df(spark, [f"v{i}" for i in range(100)])
    bits = bloom_bits(df, k_hashes=4, width_p=12)
    plan = (
        bloom_contains(bits, df, k_hashes=4, width_p=12)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cms_weighted_histogram_equals_stream_sketch(spark):
    # the one-pass cms_token_report rewrite rests on this identity:
    # sketching a (value, count) histogram with integer weights ==
    # sketching the raw multiset, counter for counter
    from textalyzer_spark.operators.sketch import cms_table

    vals = [f"t{i % 120}" for i in range(2500)] + ["hot"] * 300
    kw = dict(depth=3, width_p=8)
    stream = {
        (r["r"], r["bucket"]): r["cnt"]
        for r in cms_table(_vals_df(spark, vals), **kw).collect()
    }
    hist_df = (
        _vals_df(spark, vals)
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    weighted = {
        (r["r"], r["bucket"]): r["cnt"]
        for r in cms_table(hist_df, weight_col="n", **kw).collect()
    }
    assert weighted == stream


def test_cms_report_reuses_counts_exchange(spark, tmp_path):
    # regression pin for the one-pass rewrite: sketch + exact top-k
    # both consume the counts aggregation, and AQE must REUSE that
    # exchange at runtime (ReusedExchange in the final adaptive plan)
    # instead of re-scanning the corpus per side — reuse is a runtime
    # AQE decision, so the plan is inspected AFTER execution
    from textalyzer_spark.operators.sketch import cms_token_report

    path = str(tmp_path / "vals")
    _vals_df(spark, [f"t{i % 50}" for i in range(1000)]).write.parquet(path)
    df = spark.read.parquet(path)
    rep = cms_token_report(df, "value", k=10, depth=4, width_p=8)
    rep.collect()
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "ReusedExchange" in plan, plan


# ----------------------------------------------------- value histogram


def test_value_histogram_matches_pure_python_and_merges(spark):
    from textalyzer_spark.operators.sketch import (
        histogram_merge,
        value_histogram,
    )

    a = [(i, (i * 17) % 500) for i in range(800)]
    b = [(1000 + i, (i * 29) % 900) for i in range(600)]

    def df(rows):
        return spark.createDataFrame(rows, "doc_id bigint, v bigint")

    def py_hist(rows, w=64):
        h = {}
        for _, v in rows:
            h[v // w] = h.get(v // w, 0) + 1
        return h

    got = {
        r["bucket"]: r["cnt"]
        for r in value_histogram(df(a), "v", bucket_width=64).collect()
    }
    assert got == py_hist(a)
    merged = {
        r["bucket"]: r["cnt"]
        for r in histogram_merge(
            value_histogram(df(a), "v", bucket_width=64),
            value_histogram(df(b), "v", bucket_width=64),
        ).collect()
    }
    assert merged == py_hist(a + b)


def test_histogram_quantiles_bracket_exact_quantiles(spark):
    # the sketch's [value_lo, value_hi] must CONTAIN the exact
    # quantile from the exact distributed operator, for every q and
    # every bucket width — the compositional guarantee a drift
    # monitor relies on
    from textalyzer_spark.operators.order_stats import length_quantiles
    from textalyzer_spark.operators.sketch import (
        histogram_quantiles,
        value_histogram,
    )

    rows = [(i, "s", 7 + (i * 13) % 997) for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, n_chars bigint")
    exact = {
        r["q"]: r["value"]
        for r in length_quantiles(df, num_buckets=16).collect()
    }
    for w in (1, 8, 64, 4096):
        got = histogram_quantiles(
            value_histogram(df, "n_chars", bucket_width=w),
            bucket_width=w,
        ).collect()
        assert [r["q"] for r in got] == [0.0, 0.25, 0.5, 0.75, 1.0]
        for r in got:
            assert r["value_lo"] <= exact[r["q"]] <= r["value_hi"], (w, r)
        if w == 1:  # width-1 buckets ARE the exact quantiles
            for r in got:
                assert r["value_lo"] == exact[r["q"]]


def test_lookup_preserves_query_rows_and_guards_internals(spark):
    """cms_lookup / bloom_contains probe via chained broadcast joins:
    duplicate query rows stay duplicated (no silent groupBy collapse),
    and columns colliding with the probe internals raise (ADVICE r6)."""
    from textalyzer_spark.operators.sketch import (
        bloom_bits,
        bloom_contains,
        cms_lookup,
        cms_table,
    )

    src = spark.createDataFrame(
        [("a",), ("a",), ("b",)], "value string"
    )
    sketch = cms_table(src, "value")
    dup_q = spark.createDataFrame([("a",), ("a",)], "value string")
    got = cms_lookup(sketch, dup_q, "value").collect()
    assert [r["cnt_cms"] for r in got] == [2, 2]  # both rows kept

    bits = bloom_bits(src, "value")
    got_b = bloom_contains(bits, dup_q, "value").collect()
    assert [r["contained"] for r in got_b] == [True, True]
    miss = bloom_contains(
        bits, spark.createDataFrame([("zzz",)], "value string"), "value"
    ).collect()
    assert got_b[0]["contained"] and isinstance(miss[0]["contained"], bool)

    with pytest.raises(ValueError, match="_cms_"):
        cms_lookup(
            sketch,
            dup_q.withColumn("_cms_b0", F.lit(1)),
            "value",
        )
    with pytest.raises(ValueError, match="_bf_"):
        bloom_contains(
            bits,
            dup_q.withColumn("_bf_h1", F.lit(1)),
            "value",
        )


def test_value_histogram_excludes_null_measures(spark):
    """A NULL measure contributes no bucket (and so can't shift the
    cumulative ranks differently per engine — ADVICE r6)."""
    from textalyzer_spark.operators.sketch import (
        histogram_quantiles,
        value_histogram,
    )

    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 200), (4, None)],
        "doc_id bigint, n bigint",
    )
    hist = value_histogram(df, "n", bucket_width=64)
    rows = {r["bucket"]: r["cnt"] for r in hist.collect()}
    assert rows == {0: 1, 3: 1}  # no NULL bucket row
    qs = histogram_quantiles(hist, quantiles=(0.0, 1.0), bucket_width=64)
    assert [r["rank"] for r in qs.collect()] == [1, 2]  # n=2, not 4


def test_weighted_sample_merge_rejects_foreign_schema(spark):
    """Merge inputs must be weighted_sample outputs (id, weight,
    priority) — a foreign table raises instead of silently biasing
    the fold (ADVICE r6)."""
    from textalyzer_spark.operators.sampling import weighted_sample_merge

    good = spark.createDataFrame(
        [(1, 5, -0.5)], "doc_id bigint, weight bigint, priority double"
    )
    bad = spark.createDataFrame([(2, 7)], "doc_id bigint, weight bigint")
    with pytest.raises(ValueError, match="weighted_sample table"):
        weighted_sample_merge(good, bad, k=1)


def test_histogram_drift_tv_distance(spark):
    """TV drift between histogram sketches: hand-computed value,
    identity = 0.0 exactly, disjoint supports = 1.0 exactly, empty
    side -> NULL (no distribution to compare)."""
    from textalyzer_spark.operators.sketch import histogram_drift

    def h(rows):
        return spark.createDataFrame(rows, "bucket bigint, cnt bigint")

    a = h([(0, 1), (1, 3)])
    b = h([(0, 2), (2, 2)])
    row = histogram_drift(a, b).collect()[0]
    # 0.5 * (|1/4-2/4| + |3/4-0| + |0-2/4|) = 0.75, exact in binary
    assert (row["n_a"], row["n_b"], row["n_buckets"]) == (4, 4, 3)
    assert row["tv_distance"] == 0.75
    assert histogram_drift(a, a).collect()[0]["tv_distance"] == 0.0
    assert (
        histogram_drift(h([(0, 5)]), h([(9, 7)])).collect()[0]["tv_distance"]
        == 1.0
    )
    empty = h([])
    erow = histogram_drift(a, empty).collect()[0]
    assert erow["n_b"] == 0 and erow["tv_distance"] is None


def test_histogram_drift_scale_invariance(spark):
    """Replicating one side k-fold leaves the distribution — and the
    drift — unchanged (counts normalize out exactly via the integer
    cross-multiplication)."""
    from textalyzer_spark.operators.sketch import histogram_drift

    def h(rows):
        return spark.createDataFrame(rows, "bucket bigint, cnt bigint")

    a = h([(0, 2), (1, 6), (5, 4)])
    a7 = h([(0, 14), (1, 42), (5, 28)])
    b = h([(0, 3), (2, 9)])
    d1 = histogram_drift(a, b).collect()[0]["tv_distance"]
    d2 = histogram_drift(a7, b).collect()[0]["tv_distance"]
    assert d1 == d2
