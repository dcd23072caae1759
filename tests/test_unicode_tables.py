"""Drift guard for the generated JVM unicode tables
(textalyzer_spark/functions/_unicode_tables.py, written by
tools/gen_unicode_tables.py).

If the runtime JVM's Unicode tables ever change (JDK upgrade), the
committed alphabet/context classes would silently stop matching the
engine's \\p{IsAlphabetic} tokenizer — these tests re-probe the LIVE
JVM at every range boundary (the exact places a table shift shows
up) plus a fixed-stride sweep, and fail loudly instead.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from textalyzer_spark.functions._unicode_tables import (
    ALPHA_RANGES,
    ORACLE_LOWER_DIVERGENT,
    SIGMA_CASED_RANGES,
    SIGMA_IGNORABLE_RANGES,
)


def _probe_cps(ranges) -> list[int]:
    """Every boundary cp (start-1, start, end, end+1) of every stored
    range, plus a stride-97 sweep — any shifted/added/removed range
    flips at least one probed membership."""
    cps = set()
    for a, b in ranges:
        cps.update((a - 1, a, b, b + 1))
    cps.update(range(0, 0x110000, 97))
    return sorted(
        cp for cp in cps if 0 <= cp < 0x110000 and not (0xD800 <= cp <= 0xDFFF)
    )


def _member(ranges, cp: int) -> bool:
    return any(a <= cp <= b for a, b in ranges)


def test_alpha_ranges_match_live_jvm(spark):
    cps = _probe_cps(ALPHA_RANGES)
    rows = spark.createDataFrame(
        [(cp, chr(cp)) for cp in cps], "cp int, ch string"
    ).select(
        "cp", F.col("ch").rlike(r"^\p{IsAlphabetic}$").alias("alpha")
    ).collect()
    mismatches = [
        hex(r["cp"])
        for r in rows
        if bool(r["alpha"]) != _member(ALPHA_RANGES, r["cp"])
    ]
    assert not mismatches, (
        f"JVM IsAlphabetic drifted from the generated table at "
        f"{mismatches[:20]} — rerun tools/gen_unicode_tables.py"
    )


def test_sigma_context_ranges_match_live_jvm(spark):
    cps = sorted(
        set(_probe_cps(SIGMA_CASED_RANGES))
        | set(_probe_cps(SIGMA_IGNORABLE_RANGES))
    )
    rows = spark.createDataFrame(
        [(cp, chr(cp)) for cp in cps], "cp int, ch string"
    ).select(
        "cp",
        F.lower(F.concat(F.col("ch"), F.lit("Σ"))).alias("pre"),
        F.lower(F.concat(F.lit("ΑΣ"), F.col("ch"))).alias("post"),
        F.lower(F.concat(F.lit("ΑΣ"), F.col("ch"), F.lit("Α"))).alias("post2"),
    ).collect()
    bad = []
    for r in rows:
        cased = r["pre"].endswith("ς")
        ign = (
            len(r["post"]) >= 2
            and r["post"][1] == "ς"
            and len(r["post2"]) >= 2
            and r["post2"][1] != "ς"
        )
        if cased != _member(SIGMA_CASED_RANGES, r["cp"]) or ign != _member(
            SIGMA_IGNORABLE_RANGES, r["cp"]
        ):
            bad.append(hex(r["cp"]))
    assert not bad, (
        f"final-sigma context classes drifted at {bad[:20]} — rerun "
        "tools/gen_unicode_tables.py"
    )


def test_lower_divergents_match_duckdb_and_python(spark):
    """The documented exclusion list is exactly the set of alphabetic-
    or-not cps (within the probed sweep) where the three engines'
    1:1 lower() mappings disagree."""
    import duckdb

    cps = _probe_cps(ALPHA_RANGES)
    rows = spark.createDataFrame(
        [(cp, chr(cp)) for cp in cps], "cp int, ch string"
    ).select("cp", F.lower("ch").alias("jl")).collect()
    jl = {r["cp"]: r["jl"] for r in rows}
    con = duckdb.connect()
    con.execute("CREATE TABLE t(cp INT, ch VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", [(cp, chr(cp)) for cp in cps]
    )
    dl = dict(con.execute("SELECT cp, lower(ch) FROM t").fetchall())
    expected = {
        cp for cp in cps if not (dl[cp] == jl[cp] == chr(cp).lower())
    }
    stored = set(ORACLE_LOWER_DIVERGENT)
    assert expected <= stored, (
        f"new lower() divergences not in ORACLE_LOWER_DIVERGENT: "
        f"{[hex(c) for c in sorted(expected - stored)][:20]}"
    )


def test_ascii_fast_path_is_exact():
    """tokenize's ASCII fast path assumes IsAlphabetic ∩ ASCII ==
    [A-Za-z]; pin that against the stored table."""
    ascii_alpha = {
        cp
        for a, b in ALPHA_RANGES
        for cp in range(a, min(b, 0x7F) + 1)
        if cp < 0x80
    }
    expected = set(range(0x41, 0x5B)) | set(range(0x61, 0x7B))
    assert ascii_alpha == expected


def test_python_tokenizer_class_equals_jvm_class(spark):
    """The Arrow-UDF tokenizer splits with the SAME class as the JVM
    path: membership parity on every stored boundary + a token-level
    check that both paths tokenize identical multiscript text alike."""
    from textalyzer_spark.functions.tokenize import tokens_col, tokenize_text

    texts = [
        "Ο ΟΔΥΣΣΕΥΣ ήταν ΜΕΓΑΣ: ήρωας, Ιθάκης!",
        "Привет МИР ёлка 123 end",
        "中文文档 测试 abc ²³¼ def",  # superscripts split in BOTH paths
        "ᾼΣ καὶ ἀρχαῖα ΑΣͅ κείμενα",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    jvm = [r["t"] for r in df.select(tokens_col("text").alias("t")).collect()]
    py = [tokenize_text(t) for t in texts]
    assert jvm == py


def test_lower_overrides_match_live_runtimes(spark):
    """Round-5 exclusion-zeroing guard: alphabet.jvm_lower (the
    Python/Arrow engine path) and alphabet.text_lower_sql (the DuckDB
    oracle path) must both equal the LIVE JVM's lower() on a
    deterministic adversarial corpus covering every divergent cp,
    mixed-script sigma contexts, and the override interactions."""
    import random

    import duckdb
    from pyspark.sql import functions as F

    from textalyzer_spark.functions.alphabet import (
        ORACLE_LOWER_DIVERGENT,
        jvm_lower,
        text_lower_sql,
    )

    rng = random.Random(20260817)
    div = [chr(c) for c in ORACLE_LOWER_DIVERGENT]
    pools = [
        div,
        list("ΑΒΓΣςσΔΕαβγ·ʼ"),
        list("abcXYZ"),
        list("中文日本"),
        list("абвГД"),
        [" ", "'", "."],
    ]
    samples = [
        "".join(
            rng.choice(rng.choice(pools))
            for _ in range(rng.randint(1, 12))
        )
        for _ in range(250)
    ]
    samples += [
        "ΑΣ中",                       # mid-token non-cased follower
        "xİΣ",                        # multi-char override + sigma
        chr(0x10570) + "Σ",           # newer-Unicode cased context
        chr(0x1C89) + "Σ",
        "𐖈中İΣ\U00010d5b本中",        # the probed Python-sigma trap
        "ΑΣ·Σ·",                      # adjacent ignorable-run sigmas
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "i int, s string"
    )
    jvm = {r["i"]: r["l"] for r in df.select(
        "i", F.lower("s").alias("l")).collect()}
    bad_py = [
        (samples[i], jvm[i], jvm_lower(samples[i]))
        for i in range(len(samples))
        if jvm_lower(samples[i]) != jvm[i]
    ]
    assert not bad_py, bad_py[:5]
    con = duckdb.connect()
    sql = "SELECT " + text_lower_sql("?")
    bad_sql = [
        (s, jvm[i], con.execute(sql, [s]).fetchone()[0])
        for i, s in enumerate(samples)
        if con.execute(sql, [s]).fetchone()[0] != jvm[i]
    ]
    assert not bad_sql, bad_sql[:5]
