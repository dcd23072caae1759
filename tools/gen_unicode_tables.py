"""Generate ``textalyzer_spark/functions/_unicode_tables.py`` from the
LIVE JVM — the same "generated from the engine's own truth" technique
as the wcwidth oracle (oracles._width_ranges), applied to the
tokenizer alphabet.

The engine tokenizes with Java's ``\\p{IsAlphabetic}`` (tokens_col)
and lowercases tokens with Spark's ``lower`` (JDK root-locale rules,
including the context-sensitive Greek final sigma). The DuckDB oracle
needs (a) the exact alphabetic class as an RE2 range class and (b)
enough context classes to replay the final-sigma rule per token.
Hand-writing any of these invites drift; this tool probes the JVM
once and writes the tables as a generated module, and
``tests/test_unicode_tables.py`` re-probes the live JVM to prove the
committed tables haven't drifted from the runtime.

Tables written:

* ``ALPHA_RANGES``    — [start, end] codepoint ranges of IsAlphabetic.
* ``SIGMA_CASED_RANGES`` — cps (ANY category) that provide "preceded
  by cased" context for final sigma (probe: lower(X + 'Σ') ends 'ς').
* ``SIGMA_IGNORABLE_RANGES`` — cps the final-sigma context scan skips
  (probe: lower('ΑΣ' + X) keeps 'ς' AND lower('ΑΣ' + X + 'Α')
  reverts to 'σ').
* ``ORACLE_LOWER_DIVERGENT`` — cps where the three engines' 1:1
  lower mappings disagree (JVM vs Python vs DuckDB utf8proc);
  corpora containing them are outside the oracle-verified range.

Run: ``python tools/gen_unicode_tables.py`` (writes the module and
prints a summary). Requires a JVM (pyspark) and duckdb.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "textalyzer_spark",
    "functions",
    "_unicode_tables.py",
)

_SIGMA = "Σ"  # Σ
_ALPHA_UP = "Α"  # Α
_FINAL = "ς"  # ς


def _to_ranges(cps: list[int]) -> list[list[int]]:
    ranges: list[list[int]] = []
    for cp in cps:
        if ranges and cp == ranges[-1][1] + 1:
            ranges[-1][1] = cp
        else:
            ranges.append([cp, cp])
    return ranges


def probe_jvm(spark) -> dict:
    """All four tables from the live JVM + DuckDB, as sorted cp lists
    / {cp: mapping} dicts. Shared by the generator and the drift test."""
    from pyspark.sql import functions as F

    cps = [cp for cp in range(0x110000) if not (0xD800 <= cp <= 0xDFFF)]
    df = spark.createDataFrame(
        [(cp, chr(cp)) for cp in cps], "cp int, ch string"
    )
    base = df.select(
        "cp",
        F.col("ch").rlike(r"^\p{IsAlphabetic}$").alias("alpha"),
        F.lower("ch").alias("jlower"),
    ).collect()
    alpha = sorted(r["cp"] for r in base if r["alpha"])
    jlower = {r["cp"]: r["jlower"] for r in base}

    # sigma-context probes over EVERY cp (the whole-text oracles need
    # the full cased/ignorable classes, not just the alphabetic slice)
    sig = df.select(
        "cp",
        # preceded-by-cased probe: X provides final-sigma context
        F.lower(F.concat(F.col("ch"), F.lit(_SIGMA))).alias("pre"),
        # following-context probes: X skipped / X terminates the scan
        F.lower(F.concat(F.lit(_ALPHA_UP + _SIGMA), F.col("ch"))).alias("post"),
        F.lower(
            F.concat(F.lit(_ALPHA_UP + _SIGMA), F.col("ch"), F.lit(_ALPHA_UP))
        ).alias("post2"),
    ).collect()
    cased = sorted(r["cp"] for r in sig if r["pre"].endswith(_FINAL))
    # case-ignorable in Java's final-sigma scan: skipped forward
    # (post keeps ς) but transparent to a cased char behind it
    # (post2 reverts to σ)
    ignorable = sorted(
        r["cp"]
        for r in sig
        if len(r["post"]) >= 2
        and r["post"][1] == _FINAL
        and len(r["post2"]) >= 2
        and r["post2"][1] != _FINAL
    )

    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE t(cp INT, ch VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", [(c, chr(c)) for c in cps])
    dlower = dict(con.execute("SELECT cp, lower(ch) FROM t").fetchall())
    # any cp where the three 1:1 mappings disagree gets an OVERRIDE to
    # the JVM mapping (the engine ground truth): the oracles
    # pre-substitute cp -> jlower before lower(), and the Python/Arrow
    # paths post-fix their lower() output (alphabet.jvm_lower)
    divergent = sorted(
        cp
        for cp in cps
        if not (dlower[cp] == jlower[cp] == chr(cp).lower())
    )
    overrides = {cp: jlower[cp] for cp in divergent}
    cased_set = set(cased)
    for cp, t in overrides.items():
        # pre-substitution is only sound if the JVM-lowered form (a)
        # survives a DuckDB lower() unchanged, (b) contains no SQL
        # string/regex metacharacters, and (c) preserves the sigma
        # cased-context membership of the original char — probe all
        # three so a future runtime bump fails generation loudly
        dl = con.execute("SELECT lower(?)", [t]).fetchone()[0]
        assert dl == t, f"override target not lower-stable: U+{cp:05X} {t!r}"
        # targets land inside plain SQL string literals (translate/
        # replace, never regex) — only quote/backslash could break out
        assert "'" not in t and "\\" not in t, (cp, t)
        assert chr(cp) not in ("'", "\\")
        if cp in cased_set:
            assert any(ord(c) in cased_set for c in t), (
                f"U+{cp:05X} cased but its lowered form is not: {t!r}"
            )
    return {
        "alpha": alpha,
        "cased": cased,
        "ignorable": ignorable,
        "divergent": divergent,
        "overrides": overrides,
        "jlower": jlower,
    }


def main() -> None:
    from textalyzer_spark.session import get_spark

    spark = get_spark("gen-unicode-tables", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    t = probe_jvm(spark)
    java_ver = spark.sparkContext._jvm.java.lang.System.getProperty(
        "java.version"
    )
    spark_ver = spark.version

    lines = [
        '"""GENERATED by tools/gen_unicode_tables.py — DO NOT EDIT.',
        "",
        f"Probed from: Spark {spark_ver} / JVM {java_ver} / "
        "DuckDB "
        + __import__("duckdb").__version__
        + ".",
        "Drift guard: tests/test_unicode_tables.py re-probes the live",
        'JVM and fails if these tables no longer match the runtime."""',
        "",
        "# [start, end] codepoint ranges of Java \\p{IsAlphabetic}",
        f"ALPHA_RANGES = {_to_ranges(t['alpha'])!r}",
        "",
        "# cps providing 'preceded by cased' final-sigma context",
        f"SIGMA_CASED_RANGES = {_to_ranges(t['cased'])!r}",
        "",
        "# cps the final-sigma context scan skips (case-ignorable)",
        f"SIGMA_IGNORABLE_RANGES = {_to_ranges(t['ignorable'])!r}",
        "",
        "# cps where JVM/Python/DuckDB 1:1 lower() mappings disagree —",
        "# each is normalized to the JVM mapping via ORACLE_LOWER_OVERRIDES",
        "# (oracles pre-substitute before lower(); Python paths post-fix",
        "# via alphabet.jvm_lower), so none remains an oracle exclusion",
        f"ORACLE_LOWER_DIVERGENT = {t['divergent']!r}",
        "",
        "# cp -> the JVM's lower() output (generation asserts each target",
        "# is DuckDB-lower-stable, non-ASCII-only, and cased-preserving)",
        f"ORACLE_LOWER_OVERRIDES = {t['overrides']!r}",
        "",
    ]
    with open(OUT, "w") as f:
        f.write("\n".join(lines))
    print(
        f"wrote {OUT}: {len(t['alpha'])} alpha cps "
        f"({len(_to_ranges(t['alpha']))} ranges), "
        f"{len(t['cased'])} cased, {len(t['ignorable'])} ignorable, "
        f"divergent={[hex(c) for c in t['divergent']]}"
    )


if __name__ == "__main__":
    main()
