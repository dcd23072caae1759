"""Cross-engine checks on a planted EDGE-CASE corpus (empty docs,
bare-newline docs, CRLF terminators, runs of blank lines, trailing
newlines) — the exact inputs where Spark's split_lines semantics and
the DuckDB oracle SQL could silently diverge (ADVICE round 1). The
driver's corpus never exercises these, so this fixture is the guard.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

EDGE_DOCS = [
    (1, "plain single line"),
    (2, ""),                      # empty doc -> zero lines
    (3, "\n"),                    # bare newline -> ONE empty line
    (4, "alpha beta\n"),          # trailing newline -> one line
    (5, "a\r\nbb\r\nccc"),        # CRLF terminators -> \r stripped
    (6, "x\n\n\ny"),              # blank-line runs kept (len 0 lines)
    (7, "word word other\nword"),
    (8, "  indented  \n\ttabbed"),
    (9, "tail\n\n"),             # strip ONE trailing \n -> ["tail", ""]
    (10, "\n\n"),                # -> ["", ""] (Java $-vs-\z regression)
    (11, "cr\r\r\nnext"),        # line "cr\r\r" loses exactly one \r
    (12, "bare tail\r"),         # BARE final \r kept (str::lines; ADVICE r2)
    (13, "keep\r\r\nlast\r"),    # \n-terminated loses ONE \r, final keeps
    (14, "crlf end\r\n"),        # \r\n terminator stripped as a unit
    (15, "é häll ünïcode wörd\nzwei wörter"),  # Latin-accent tokens
]


@pytest.fixture(scope="module")
def edge_sf_dir(spark, tmp_path_factory):
    """A documents.parquet shaped exactly like the driver's table."""
    d = tmp_path_factory.mktemp("edge_sf")
    spark.createDataFrame(EDGE_DOCS, "doc_id bigint, text string").coalesce(
        1
    ).write.parquet(str(d / "documents.parquet"))
    return str(d)


def _compare(spark, edge_sf_dir, name):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{edge_sf_dir}/documents.parquet/*.parquet')"
    )
    def _key(t):  # None-safe total order (NULL ratio columns)
        return tuple((v is None, str(type(v)), v) for v in t)

    sdf = entrymod.queries()[name](spark, edge_sf_dir)
    scols = sorted(sdf.columns)
    srows = sorted(
        (tuple(r[c] for c in scols) for r in sdf.collect()), key=_key
    )
    ddf = con.sql(entrymod.oracle_sql()[name])
    dcols_raw = ddf.columns
    drows = sorted(
        (
            tuple(r[dcols_raw.index(c)] for c in sorted(dcols_raw))
            for r in ddf.fetchall()
        ),
        key=_key,
    )
    assert scols == sorted(dcols_raw)
    assert srows == drows, f"{name}: spark={srows[:5]} duck={drows[:5]}"
    return srows


def test_line_length_edge_semantics(spark, edge_sf_dir):
    # sorted columns -> tuples are (count, length)
    rows = _compare(spark, edge_sf_dir, "line_length")
    by_length = {length: count for count, length in rows}
    # blank lines: two inside doc 6, doc 3 ("\n") = ONE empty line per
    # Rust str::lines, doc 9's trailing pair = one, doc 10 = two
    assert by_length[0] == 6
    # doc 2 (empty) contributes no lines:
    # 1 + 0 + 1 + 1 + 3 + 4 + 2 + 2 + 2 + 2 + 2 + 1 + 2 + 1 + 2
    assert sum(count for count, _ in rows) == 26
    # doc 11: "cr\r\r" strips exactly one trailing \r -> length 3
    assert by_length.get(3, 0) >= 1
    # doc 12: bare final \r is CONTENT -> "bare tail\r" = length 10
    # (str::lines keeps it; the old engine stripped it);
    # doc 13: "keep\r\r" -> "keep\r" (5) and final "last\r" kept (5);
    # doc 14: the \r\n terminator goes as a unit -> "crlf end" = 8
    assert by_length.get(10, 0) >= 1
    assert by_length.get(5, 0) >= 2
    assert by_length.get(8, 0) >= 1


def test_word_frequency_edge(spark, edge_sf_dir):
    # sorted columns -> tuples are (count, word)
    rows = _compare(spark, edge_sf_dir, "word_frequency")
    counts = {w: c for c, w in rows}
    assert counts["word"] == 3
    # accented tokens (doc 15) agree engine-vs-oracle: the oracle's
    # token class is GENERATED from the engine's alphabet
    # (oracles.alpha_token_regex), not hand-written [a-z]+
    assert counts["wörter"] == 1
    assert counts["é"] == 1
    assert counts["ünïcode"] == 1


def test_display_width_edge(spark, edge_sf_dir):
    _compare(spark, edge_sf_dir, "line_display_width")


@pytest.mark.parametrize(
    "name",
    ["shingle_dup", "readability", "token_stats", "quality_score",
     "lang_id", "ngram_jaccard"],
)
def test_tokenizing_oracles_on_accented_corpus(spark, edge_sf_dir, name):
    """Every token-class oracle position now carries the GENERATED
    Latin alphabet (oracle_sql swaps it in), so the accented doc 15
    must agree engine-vs-oracle across the whole tokenizing family."""
    _compare(spark, edge_sf_dir, name)


def test_duplication_resolved_edge(spark, edge_sf_dir):
    # no >=3-line duplicate blocks exist in this corpus; both engines
    # must agree on emptiness (the synthesized-newline pipeline still
    # runs end to end over the weird docs)
    rows = _compare(spark, edge_sf_dir, "duplicate_blocks_resolved")
    assert rows == []


@pytest.fixture(scope="module")
def neardup_sf_dir(spark, tmp_path_factory):
    """A corpus with PLANTED near-duplicates (the driver tables'
    near-dups are accidental) — exercises the generated hash-family
    oracles where their outputs are non-empty by construction."""
    base = (
        "the quick brown fox jumps over the lazy dog while seven "
        "wizards brew strong potions under a pale winter moon near "
        "the old stone bridge"
    )
    rows = []
    for i in range(20):
        rows.append((i, base + f" variant token{i}"))
    # two exact-ish pairs and one shuffled distractor
    rows.append((100, base + " variant tokenzero"))
    rows.append((101, " ".join(reversed(base.split()))))
    for i in range(30):
        rows.append((200 + i, f"unrelated document number {i} " * 4))
    # an accented near-dup pair: the generated token class + utf-8
    # md5 hashing must agree cross-engine beyond ASCII
    acc = (
        "über die brücke läuft der kleine bär während die vögel "
        "früh am morgen über den fluß nach süden ziehen und ähren "
        "im wind schwanken"
    )
    rows.append((300, acc + " schlußwort eins"))
    rows.append((301, acc + " schlußwort zwei"))
    d = tmp_path_factory.mktemp("neardup_sf")
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
        1
    ).write.parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize(
    "name", ["winnow_pairs", "minhash_lsh", "simhash_pairs", "ngram_jaccard",
             "duplicate_lines", "fingerprint"]
)
def test_hash_oracles_on_planted_neardups(spark, neardup_sf_dir, name):
    rows = _compare(spark, neardup_sf_dir, name)
    if name in ("winnow_pairs", "minhash_lsh", "ngram_jaccard", "simhash_pairs"):
        assert len(rows) > 0, f"{name}: planted near-dups not found"


GREEK_SENT = (
    "Ο Οδυσσεύς ήταν μέγας ήρωας της Ιθάκης και ταξίδεψε πολλά "
    "χρόνια στις θάλασσες"
)

MULTISCRIPT_DOCS = [
    # Greek with uppercase final-sigma words: Spark/Python lower to ς,
    # plain DuckDB lower() to σ — the exact context the generated
    # sigma-aware oracle expressions exist for
    (1, "Ο ΟΔΥΣΣΕΥΣ ΗΤΑΝ ΜΕΓΑΣ ΗΡΩΑΣ ΤΗΣ ΙΘΑΚΗΣ"),
    (2, GREEK_SENT),
    (3, GREEK_SENT + " και άλλες λέξεις"),  # planted Greek near-dup of 2
    (4, "ΘΕΣΣΑΛΟΝΙΚΗ, ΠΟΛΙΣ ΤΗΣ ΜΑΚΕΔΟΝΙΑΣ. ΣΣΣ"),
    # polytonic Greek + titlecase sigma contexts
    (5, "ᾼΣ γράμματα καὶ ἀρχαῖα κείμενα τῆς ἑλληνικῆς"),
    # Cyrillic (plain + Ё)
    (6, "Привет мир это документ на русском языке с Ёлкой"),
    (7, "ПРИВЕТ МИР ЭТО ЗАГЛАВНЫЙ ТЕКСТ НА РУССКОМ"),
    # CJK (no case; splits only on non-alphabetic chars)
    (8, "中文文档测试 这是一个 例子 文本分析"),
    (9, "日本語のテキストです 形態素 解析"),
    # mixed scripts + digits/punct separators
    (10, "mixed Ελληνικά and русский and 中文 tokens 123 end"),
    (11, "Οι ΔΡΟΜΟΙΣ και οι ΝΙΚΕΣ: τέλος."),
    # Greek line-duplication corpus (tokenizing + line ops together)
    (12, "πρώτη γραμμή κειμένου\nδεύτερη γραμμή\nπρώτη γραμμή κειμένου"),
]

# every gate query whose semantics touch tokenization or lowering,
# plus the line/byte ops (script-independent but cheap to pin here)
MULTISCRIPT_QUERIES = [
    "word_frequency", "span_word_frequency", "shingle_dup",
    "readability", "lexical_complexity", "token_stats",
    "quality_score", "lang_id",
    "ngram_jaccard", "minhash_lsh", "simhash_pairs", "winnow_pairs",
    "fingerprint", "exact_dedup", "char_frequency", "token_counts",
    # round 5: whole-text lowering (BPE), per-doc repetition signals,
    # lang-bucketed sampling, and the near-dup cluster resolution —
    # all must hold on a Greek+Cyrillic+CJK corpus
    "token_counts_bpe", "repetition_stats", "bigram_novelty", "stratified_sample",
    "near_dup_groups", "near_dup_groups_simhash",
    "incremental_exact_dedup", "incremental_minhash",
    "incremental_simhash", "incremental_near_dup_groups",
    "incremental_simhash_groups",
    "contamination", "pii_redaction", "corpus_mixture",
    # round 6: the end-to-end pipeline composition
    "pipeline_clean_sample",
    # round 6 late: the mergeable-sketch family over multiscript
    # tokens / raw unicode text
    "hll_distinct_tokens", "incremental_hll_tokens",
    "cms_token_counts", "incremental_cms_tokens",
    "incremental_bloom_dedup",
    "duplicate_lines", "line_length", "line_display_width",
    # roundtrip extractions: the synthesize->extract templates must be
    # invertible beyond latin-1 (UTF-8 PDF literals since round 4)
    "pdf_extract_text", "html_main_content",
]


@pytest.fixture(scope="module")
def multiscript_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("multiscript_sf")
    spark.createDataFrame(
        MULTISCRIPT_DOCS, "doc_id bigint, text string"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("name", MULTISCRIPT_QUERIES)
def test_multiscript_gate_mirror(spark, multiscript_sf_dir, name):
    """Round-4 headline: the gate mirror passes on a Greek + Cyrillic
    + CJK corpus for every tokenizing query — the oracle token class
    is the JVM's own table and per-token/whole-text lowering replays
    the final-sigma rule (functions/alphabet.py)."""
    _compare(spark, multiscript_sf_dir, name)


# exactly the codepoints where Java \s ([ \t\n\x0B\f\r]), RE2 \s
# ([\t\n\f\r ]) and Python unicode \s (adds NBSP, \x1c-\x1f, U+2007…)
# DISAGREE — the ADVICE-r5 three-way BPE divergence. Under the pinned
# alphabet.WS_SPLIT class all engines split on \x0B/\f and keep
# NBSP/\x1c/U+2007 inside tokens.
WS_EDGE_DOCS = [
    (1, "plain words only"),
    (2, "vert\x0btab split run"),      # \x0B: Java-yes / RE2-no
    (3, "nbsp\xa0joined pair"),        # NBSP: Python-yes / Java+RE2-no
    (4, "form\ffeed and\x1cfilesep"),  # \f all-yes; \x1c Python-only
    (5, "figure space held"),     # U+2007: Python-yes
    (6, " mix \t tabs\nnew\r\nlines \x0b\xa0 end "),
]

WS_QUERIES = [
    "token_counts", "token_counts_bpe", "fingerprint",
    # the sketch family tokenizes with the same pinned WS_SPLIT class
    "hll_distinct_tokens", "incremental_hll_tokens",
    "cms_token_counts", "incremental_cms_tokens",
]


@pytest.fixture(scope="module")
def ws_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("ws_sf")
    spark.createDataFrame(
        WS_EDGE_DOCS, "doc_id bigint, text string"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("name", WS_QUERIES)
def test_whitespace_class_gate_mirror(spark, ws_sf_dir, name):
    """Every whitespace-splitting gate query agrees cross-engine on
    the divergent-\\s corpus (ADVICE r5: the pinned WS_SPLIT class
    replaces Java/Python/RE2 \\s in engine AND oracle)."""
    _compare(spark, ws_sf_dir, name)


def test_ws_class_splits_as_pinned(spark, ws_sf_dir):
    """The pinned class's semantics, asserted absolutely (not just
    cross-engine-equal): \\x0B and \\f split; NBSP, \\x1c and U+2007
    do not."""
    import __spark_entry__ as em

    rows = {
        r["doc_id"]: r["n_ws_tokens"]
        for r in em.queries()["token_counts"](spark, ws_sf_dir).collect()
    }
    assert rows[2] == 4          # vert | tab | split | run
    assert rows[3] == 2          # nbsp\xa0joined | pair
    assert rows[4] == 3          # form | feed | and\x1cfilesep
    assert rows[5] == 2          # figure space | held
    # the bare \xa0 between pinned separators is itself a token:
    # mix | tabs | new | lines | \xa0 | end
    assert rows[6] == 6


def _fuzz_docs(n_docs: int = 60, seed: int = 20260817):
    """Deterministic randomized corpus over the ENTIRE verified range
    — which since round 5 includes the formerly-excluded territory:
    divergent-lower codepoints (İ, newer-Unicode cased letters) and
    MIXED-script tokens (sigma with non-cased followers), normalized
    to the JVM mapping by alphabet.jvm_lower / the oracle override
    chain."""
    import random

    from textalyzer_spark.functions.alphabet import ORACLE_LOWER_DIVERGENT

    rng = random.Random(seed)
    pools = [
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ",
        "àâäéèêëîïôöùûüçÀÉÈÊÖÜßñÑåÅøØ",
        "αβγδεζηθικλμνξοπρστυφχψωςΣΑΒΓΔΕΖΗΘΙΚΛΜΝΞΟΠΡΤΥΦΧΨῼΆΈΉΊΌΎΏάέήίόύώ",
        "абвгдежзийклмнопрстуфхцчшщъыьэюяАБВГДЕЖЗИЙКЛМНОПРСТУФХЦЧШЩЫЭЮЯЁё",
        "中文字例子测试分析文档数据引擎大规模处理日本語形態素解析",
        # round 5: divergent-lower cps + a mixed-script sigma pool
        "".join(chr(c) for c in ORACLE_LOWER_DIVERGENT),
        "ΣςΑ中文İxy" + chr(0x10570) + chr(0x1C89),
    ]
    seps = [" ", "  ", ", ", ". ", "\n", " 12 ", "—", "·", "'", "; "]
    docs = []
    for d in range(n_docs):
        parts = []
        for _ in range(rng.randint(3, 12)):
            pool = rng.choice(pools)
            parts.append(
                "".join(rng.choice(pool) for _ in range(rng.randint(1, 9)))
            )
            parts.append(rng.choice(seps))
        docs.append((d, "".join(parts)))
    return docs


def test_fuzzed_multiscript_tokenization_parity(spark, tmp_path):
    """Randomized (deterministic-seed) corpus from the verified range:
    the JVM tokenizer, the Python/Arrow tokenizer, and the DuckDB
    oracle must produce the SAME word histogram — covering sigma
    placements, combining ypogegrammeni, titlecase accents, and
    separators no fixed fixture enumerates."""
    from pyspark.sql import functions as F

    from textalyzer_spark.functions.tokenize import tokenize_text, tokens_col

    docs = _fuzz_docs()
    d = tmp_path / "fuzz_sf"
    spark.createDataFrame(docs, "doc_id bigint, text string").coalesce(
        1
    ).write.parquet(str(d / "documents.parquet"))

    # engine JVM path vs oracle via the registered gate query
    rows = _compare(spark, str(d), "word_frequency")
    hist_oracle = {w: c for c, w in rows}

    # python path must agree with the JVM path token-for-token
    from collections import Counter

    py_hist = Counter()
    for _, text in docs:
        py_hist.update(tokenize_text(text))
    assert dict(py_hist) == hist_oracle

    jvm = (
        spark.createDataFrame(docs, "doc_id bigint, text string")
        .select(F.explode(tokens_col("text")).alias("w"))
        .groupBy("w")
        .count()
        .collect()
    )
    assert {r["w"]: r["count"] for r in jvm} == hist_oracle


def test_multiscript_word_frequency_values(spark, multiscript_sf_dir):
    """Spot-check actual token values, not just cross-engine equality:
    final sigma, Cyrillic casefold, and CJK runs all land."""
    rows = _compare(spark, multiscript_sf_dir, "word_frequency")
    counts = {w: c for c, w in rows}
    assert counts["οδυσσευς"] >= 1          # ΟΔΥΣΣΕΥΣ -> final ς
    assert counts["μεγας"] >= 1             # ΜΕΓΑΣ -> μεγας (final ς)
    assert counts["πολις"] >= 1
    assert counts["привет"] >= 2            # upper + lower merge
    assert counts["ёлкой"] >= 1
    assert counts["中文文档测试"] >= 1      # one unsplit CJK run
    assert "οδυσσευσ" not in counts         # the σ misrender must NOT appear


def _mk_line(tag: str, width: int) -> str:
    """One 8-token line (single-space separated): a FIXED POINT of the
    registered pipeline's newline-every-8-tokens synthesis, so the
    planted line structure survives _line_structured_docs verbatim."""
    return " ".join(f"{tag}{i:02d}" + "x" * width for i in range(8))


@pytest.fixture(scope="module")
def claimgate_sf_dir(spark, tmp_path_factory):
    """A corpus where the reference's insert-then-gate resolution
    semantics (duplication.rs:315-317: a REJECTED block's lone claim
    still blocks later blocks once any block is accepted) changes the
    answer — the exact parity gap ADVICE round-2 flagged.

    Pinned processing order (n_nonempty desc, bytes desc, content
    asc): alpha(ABCD, accepted) -> beta(BCD, one free location at
    d3:1-3, REJECTED but claims) -> gamma(KLM, accepted, arming the
    claim) -> delta(CDS at d3:2-4 + d6:1-3) whose d3 location now
    hits beta's armed cells, leaving one valid location => delta is
    suppressed. The old accepted-claims-only semantics emitted it.
    """
    A = _mk_line("aa", 1)
    B = _mk_line("bb", 8)   # longest: beta sorts before gamma
    C = _mk_line("cc", 2)
    D = _mk_line("dd", 2)
    S = _mk_line("ss", 0)   # shortest: delta sorts after gamma
    K, L, M = (_mk_line(t, 3) for t in ("kk", "ll", "mm"))
    assert len(B + C + D) > len(K + L + M) > len(C + D + S)
    docs = [
        (1, "\n".join([A, B, C, D])),
        (2, "\n".join([A, B, C, D])),
        (3, "\n".join([B, C, D, S])),
        (4, "\n".join([K, L, M])),
        (5, "\n".join([K, L, M])),
        (6, "\n".join([C, D, S])),
    ]
    d = tmp_path_factory.mktemp("claimgate_sf")
    spark.createDataFrame(docs, "doc_id bigint, text string").coalesce(
        1
    ).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_resolution_insert_then_gate(spark, claimgate_sf_dir):
    # engine and recursive-CTE oracle agree on the armed-claim corpus
    rows = _compare(spark, claimgate_sf_dir, "duplicate_blocks_resolved")
    contents = {c for c, _, _ in rows}
    A = _mk_line("aa", 1)
    C = _mk_line("cc", 2)
    D = _mk_line("dd", 2)
    S = _mk_line("ss", 0)
    K, L, M = (_mk_line(t, 3) for t in ("kk", "ll", "mm"))
    assert "\n".join([A, _mk_line("bb", 8), C, D]) in contents  # alpha
    assert "\n".join([K, L, M]) in contents                     # gamma
    # delta ("C D S") must be SUPPRESSED: beta's rejected claim on
    # d3:1-3 was armed by gamma's acceptance, voiding delta's d3
    # location (reference semantics); the old set-based resolution
    # would have emitted it
    assert "\n".join([C, D, S]) not in contents
    # beta itself was rejected (one free location)
    assert "\n".join([_mk_line("bb", 8), C, D]) not in contents


def test_unknown_resolution_raises(spark):
    from textalyzer_spark.operators.duplication import duplicate_blocks

    df = spark.createDataFrame(
        [(1, "a\nb\nc")], "doc_id bigint, text string"
    )
    with pytest.raises(ValueError, match="unknown resolution"):
        duplicate_blocks(df, min_lines=3, resolution="bogus")


def test_driver_contract_consistency():
    """Every oracle key has a query; every query is callable; the
    generated SQL strings are non-trivial."""
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) == set(qs), set(oracles) ^ set(qs)
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and len(s) > 100 for s in oracles.values())


# full documents shape (doc_id, text, lang, source, n_chars) for the
# column-dependent round-6 gates: a capped 12-doc source next to
# singleton/small sources, n_chars planted ON bucket boundaries
# (0/63/64/65/128) and far off the grid, a zero-length doc (the
# weighted-sample greatest(n_chars,1) clamp).
FULL_EDGE_DOCS = (
    [(i, f"doc {i} text", "en", "big", [0, 63, 64, 65, 128][i % 5])
     for i in range(12)]
    + [(100, "", "en", "solo", 0)]
    + [(200 + i, f"s {i}", "de", "small", 10_000 + i) for i in range(3)]
)

FULL_EDGE_QUERIES = [
    "source_cap_sample",
    "length_histogram_quantiles",
    "weighted_sample",
    "incremental_weighted_sample",
    "corpus_mixture",
]


@pytest.fixture(scope="module")
def full_edge_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("full_edge_sf")
    spark.createDataFrame(
        FULL_EDGE_DOCS,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("name", FULL_EDGE_QUERIES)
def test_full_shape_gate_mirror(spark, full_edge_sf_dir, name):
    """The column-dependent round-6 gates agree cross-engine on a
    corpus with a capped mega-source, singleton sources, bucket-
    boundary and zero n_chars (the weight clamp path)."""
    _compare(spark, full_edge_sf_dir, name)


def test_source_cap_edge_semantics(spark, full_edge_sf_dir):
    import __spark_entry__ as em

    rows = em.queries()["source_cap_sample"](
        spark, full_edge_sf_dir
    ).collect()
    by_s = {}
    for r in rows:
        by_s.setdefault(r["source"], []).append(r["doc_id"])
    assert len(by_s["big"]) == 10      # capped from 12
    assert len(by_s["solo"]) == 1      # singleton kept whole
    assert len(by_s["small"]) == 3
