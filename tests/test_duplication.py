"""Fixtures F-3..F-6, F-13 from FIXTURES.md (reference:
textalyzer/src/duplication.rs test module :341-583)."""

from __future__ import annotations

import pytest

from textalyzer_spark.operators.duplication import duplicate_blocks, duplicate_lines


def _df(spark, docs: dict[str, str]):
    return spark.createDataFrame(
        [(k, v) for k, v in docs.items()], "doc_id string, text string"
    )


def _locs(row):
    return [(l["doc_id"], l["line"]) for l in row["locations"]]


def test_single_line_duplication_f3(spark):
    df = _df(
        spark,
        {
            "file1": "This is a test.\nThis is only a test.\nThis is a test.\n"
            "# Ignore empty lines\n\n\n# Ignore short lines\nabc\nabc\n",
            "file2": "This is a test.\n",
        },
    )
    out = duplicate_lines(df).collect()
    assert len(out) == 1
    assert out[0]["content"] == "This is a test."
    assert _locs(out[0]) == [("file1", 1), ("file1", 3), ("file2", 1)]


FILE1_F4 = (
    "This is a test.\nThis is a second line.\nThis is a third line.\n"
    "Some other content.\nAnd another line here.\n"
    "This is a test.\nThis is a second line.\nA different third line.\n"
)
FILE2_F4 = (
    "Something unrelated.\nThis is a test.\nThis is a second line.\n"
    "This is a third line.\nFinal line.\n"
)


def test_multi_line_overlap_suppression_f4(spark):
    df = _df(spark, {"file1": FILE1_F4, "file2": FILE2_F4})
    out = duplicate_blocks(df, min_lines=2).collect()
    assert len(out) == 1
    blk = out[0]
    assert blk["content"] == (
        "This is a test.\nThis is a second line.\nThis is a third line."
    )
    assert sorted(_locs(blk)) == [("file1", 1), ("file2", 2)]
    assert blk["n_lines"] == 3 and blk["n_nonempty"] == 3


def test_multi_line_non_overlapping_f5(spark):
    block_a = "Alpha block line one.\nAlpha block line two.\nAlpha block line three."
    block_b = "Beta block line one.\nBeta block line two."
    file1 = f"{block_a}\nfiller one here.\n{block_b}\nmore filler.\n"
    file2 = f"unrelated start line.\n{block_a}\nmid filler text.\n{block_b}\n"
    df = _df(spark, {"file1": file1, "file2": file2})
    out = duplicate_blocks(df, min_lines=2).collect()
    assert len(out) == 2
    by_content = {r["content"]: _locs(r) for r in out}
    assert sorted(by_content[block_a]) == [("file1", 1), ("file2", 2)]
    assert sorted(by_content[block_b]) == [("file1", 5), ("file2", 6)]
    # pinned order: more non-empty lines first
    assert out[0]["content"] == block_a


def test_multi_line_ignores_indentation_f6(spark):
    df = _df(
        spark,
        {
            "file1": '    fn main() {\n        println!("Hello");\n    }\n',
            "file2": 'fn main() {\nprintln!("Hello");\n}\n',
        },
    )
    out = duplicate_blocks(df, min_lines=3).collect()
    assert len(out) == 1
    assert out[0]["content"] == 'fn main() {\nprintln!("Hello");\n}'
    assert len(out[0]["locations"]) == 2


def test_min_lines_filter(spark):
    # the F-4 corpus has a 2-line duplicate; min_lines=4 must drop everything
    df = _df(spark, {"file1": FILE1_F4, "file2": FILE2_F4})
    assert duplicate_blocks(df, min_lines=4).count() == 0


def test_min_lines_1_dispatches_to_single_line(spark):
    df = _df(spark, {"f1": "Duplicate line here.\n", "f2": "Duplicate line here.\n"})
    out = duplicate_blocks(df, min_lines=1).collect()
    assert len(out) == 1
    assert out[0]["content"] == "Duplicate line here."


def test_component_and_global_resolution_agree(spark):
    # two disjoint doc groups + one intra-group overlap each: the
    # per-component scale path must equal the global sequential pass
    blk1 = "group one line a\ngroup one line b\ngroup one line c"
    blk2 = "group two line x\ngroup two line y\ngroup two line z"
    docs = {
        "g1a": f"{blk1}\nfiller here one\n",
        "g1b": f"pre filler.\n{blk1}\n",
        "g2a": f"{blk2}\nother filler.\n",
        "g2b": f"start text.\n{blk2}\n",
        "solo": "nothing shared at all\n",
    }
    df = _df(spark, docs)
    a = duplicate_blocks(df, min_lines=2, resolution="components").collect()
    b = duplicate_blocks(df, min_lines=2, resolution="global").collect()
    norm = lambda rows: sorted(
        (r["content"], tuple(sorted(_locs(r)))) for r in rows
    )
    assert norm(a) == norm(b)
    assert len(a) == 2


@pytest.mark.slow
def test_synthetic_benchmark_f13(spark):
    # 20 docs x 2000 lines, 30 planted 5-line blocks every 50 lines
    # (reference duplication.rs:506-555): all 30 must be found.
    docs = {}
    n_blocks = 30
    for d in range(20):
        lines = []
        for i in range(2000):
            block_idx = i // 50
            if i % 50 < 5 and block_idx < n_blocks:
                lines.append(f"duplicated block {block_idx} line {i % 50} content")
            else:
                lines.append(f"unique doc{d} line{i} content xyz")
        docs[f"doc{d}"] = "\n".join(lines) + "\n"
    out = duplicate_blocks(_df(spark, docs), min_lines=5).collect()
    assert len(out) == n_blocks
    for r in out:
        assert r["n_lines"] == 5
        assert len(r["locations"]) == 20


def test_resolved_oracle_recursive_cte_under_contention(spark):
    """Cross-engine check of the greedy overlap resolution on a corpus
    where resolution actually DROPS locations (overlapping claims):
    the recursive-CTE oracle must replay the engine's pinned claim
    order exactly. The driver-gate corpora happen to be contention-
    free, so this fixture is what proves the recursion itself."""
    import duckdb
    import pandas as pd

    from textalyzer_spark.oracles import duplicate_blocks_resolved_sql

    # doc "a"/"b" share a 5-line block; doc "c" shares a 3-line sub-block
    # overlapping the big block's claim in "a" -> its location in "a"
    # must be dropped, and docs "d"/"e" contend on a shifted window
    block5 = "alpha one\nbeta two\ngamma three\ndelta four\nepsilon five"
    sub3 = "beta two\ngamma three\ndelta four"
    rows = [
        ("a", block5 + "\nfiller a"),
        ("b", "lead b\n" + block5),
        ("c", "x c\n" + sub3 + "\ntail c"),
        ("d", sub3 + "\nmore d\n" + sub3),
        ("e", "pad e\n" + sub3),
    ]
    # the flat->line synthesis in the oracle inserts a newline every 8
    # tokens; these texts have <8 tokens per line already, so feed them
    # pre-joined with spaces such that synthesis recreates the lines:
    # instead, bypass synthesis by making each line exactly 8 tokens
    def pad8(text: str) -> str:
        return " ".join(
            " ".join((line.split() + ["pad"] * 8)[:8]) for line in text.split("\n")
        )

    flat = [(i, pad8(t)) for i, (_, t) in enumerate(rows)]
    pdf = pd.DataFrame(flat, columns=["doc_id", "text"])

    con = duckdb.connect()
    con.register("documents", pdf)
    duck = sorted(
        tuple(r)
        for r in con.sql(duplicate_blocks_resolved_sql(1000, 2)).fetchall()
    )

    from pyspark.sql import functions as F

    from textalyzer_spark.operators.duplication import duplicate_blocks

    sdf = spark.createDataFrame(pdf)
    synth = sdf.select(
        "doc_id",
        F.regexp_replace(F.col("text"), r"((\S+\s+){7}\S+)\s+", "$1\n").alias(
            "text"
        ),
    )
    res = duplicate_blocks(synth, min_lines=2, resolve=True)
    spark_rows = sorted(
        (r["content"], r["doc_id"], r["line"])
        for r in res.select(
            "content", F.explode("locations").alias("l")
        ).select("content", F.col("l.doc_id"), F.col("l.line")).collect()
    )
    assert spark_rows == duck
    # resolution must have dropped at least one overlapping location
    cands = duplicate_blocks(synth, min_lines=2, resolve=False)
    n_cand_locs = cands.select(F.explode("locations")).distinct().count()
    assert len(spark_rows) < n_cand_locs


def _reference_resolution_model(blocks):
    """Straight-line transcription of duplication.rs:298-336 (the
    insert-then-gate HashMap walk), independent of the engine's
    pandas implementation — the hypothesis oracle."""
    result = []
    used = {}  # (doc, line) -> result-length at claim time
    for content, n_lines, locations in blocks:
        valid = []
        for doc, start in locations:
            cells = [(doc, ln) for ln in range(start, start + n_lines)]
            if any(c in used and used[c] < len(result) for c in cells):
                continue
            valid.append((doc, start))
            for c in cells:
                used[c] = len(result)
        if len(valid) >= 2:
            result.append((content, valid))
    return result


def test_resolve_overlaps_matches_reference_model_randomized():
    """_resolve_overlaps vs the reference transcription on randomized
    candidate sets (block spans/locations drawn to collide heavily —
    the armed-claim and same-block-overlap corners appear often)."""
    import random

    import pandas as pd

    from textalyzer_spark.operators.duplication import _resolve_overlaps

    rng = random.Random(1234)
    for trial in range(200):
        n_blocks = rng.randint(1, 12)
        blocks = []
        for i in range(n_blocks):
            span = rng.randint(1, 4)
            n_locs = rng.randint(1, 4)
            locs = {
                (f"d{rng.randint(0, 3)}", rng.randint(1, 8))
                for _ in range(n_locs)
            }
            # distinct content per block; n_nonempty == span here
            content = "\n".join(f"blk{i}line{j}" for j in range(span))
            blocks.append((content, span, sorted(locs)))
        # the engine sorts by (n_nonempty desc, n_bytes desc, content
        # asc); feed the model the SAME order the engine will use
        ordered = sorted(
            blocks, key=lambda b: (-b[1], -len(b[0].encode()), b[0])
        )
        expected = _reference_resolution_model(ordered)

        pdf = pd.DataFrame(
            {
                "content": [b[0] for b in blocks],
                "locations": [
                    [{"doc_id": d, "line": ln} for d, ln in b[2]]
                    for b in blocks
                ],
                "n_lines": [b[1] for b in blocks],
                "n_nonempty": [b[1] for b in blocks],
                "n_bytes": [len(b[0].encode()) for b in blocks],
            }
        )
        got = _resolve_overlaps(pdf)
        got_set = [
            (r["content"], [(l["doc_id"], l["line"]) for l in r["locations"]])
            for _, r in got.iterrows()
        ]
        assert got_set == expected, f"trial {trial}: {got_set} != {expected}"


def test_empty_line_run_extension_cross_engine(spark):
    """The reference extends runs through trimmed-equal EMPTY lines
    (duplication.rs:174-185: ''=='' keeps matching) — a shared block
    with an interior blank line is ONE candidate, and trailing
    empty-empty lines extend the match. Engine vs the synthesize=False
    DuckDB twin on a raw line-structured corpus (the registered
    8-token transform collapses blank lines, so this needs the raw
    path), plus direct shape asserts."""
    import duckdb

    from textalyzer_spark.oracles import duplicate_blocks_resolved_sql

    docs = [
        (1, "alpha beta one\n\ngamma delta two\nepsilon zeta three"),
        (2, "alpha beta one\n\ngamma delta two\nepsilon zeta three"),
        (3, "trail head aa\ntrail body bb\n\n\nafter three"),
        (4, "trail head aa\ntrail body bb\n\n\nother four"),
        (5, "noise line\nmore noise"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = duplicate_blocks(df, min_lines=2)
    by_content = {r["content"]: r for r in out.collect()}
    # interior blank bridged: one 4-line block (3 non-empty)
    bridged = "alpha beta one\n\ngamma delta two\nepsilon zeta three"
    assert bridged in by_content
    assert by_content[bridged]["n_nonempty"] == 3
    # trailing empties extend: block ends with two empty lines
    trail = "trail head aa\ntrail body bb\n\n"
    assert trail in by_content

    # cross-engine: the resolved recursive-CTE twin agrees row-for-row
    import pandas as pd

    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(docs, columns=["doc_id", "text"])
    )
    drows = sorted(
        con.sql(
            duplicate_blocks_resolved_sql(min_lines=2, synthesize=False)
        ).fetchall()
    )
    srows = sorted(
        (r["content"], l["doc_id"], l["line"])
        for r in out.collect()
        for l in r["locations"]
    )
    assert srows == [tuple(r) for r in drows]


def test_suffix_candidates_survive_partial_claims(spark):
    """Reference suffix emission (duplication.rs:141-165, engine flag
    emit_suffixes): X=[A,B,C,D] claims d1/d3, V=[M,N,A] claims d2/d5,
    V2=[R,S,A] claims d6/d7 — the [A,B,C] block then has NO free
    location and dies, but its tail [B,C] is free at d2:4/d6:4 and
    must surface as its own candidate exactly like the reference's
    every-duplicate-start scan. Default (no suffixes) suppresses it;
    both modes match their DuckDB twins row-for-row."""
    import duckdb
    import pandas as pd

    from textalyzer_spark.oracles import duplicate_blocks_resolved_sql

    A, B, C, D = "alpha", "bravo", "charlie", "delta"
    M, N = "mmmlongtoken1", "nnnlongtoken2"
    R, S = "rrrlongtoken3", "ssslongtoken4"
    docs = [
        (1, "\n".join([A, B, C, D])),
        (3, "\n".join([A, B, C, D])),
        (2, "\n".join([M, N, A, B, C])),
        (5, "\n".join([M, N, A, "wfive"])),
        (6, "\n".join([R, S, A, B, C])),
        (7, "\n".join([R, S, A, "wseven"])),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")

    def rows(emit):
        out = duplicate_blocks(df, min_lines=2, emit_suffixes=emit)
        return sorted(
            (r["content"], l["doc_id"], l["line"])
            for r in out.collect()
            for l in r["locations"]
        )

    plain, sfx = rows(False), rows(True)
    tail = f"{B}\n{C}"
    assert all(c != tail for c, _, _ in plain)
    tail_locs = {(d, l) for c, d, l in sfx if c == tail}
    assert tail_locs == {(2, 4), (6, 4)}
    # containing blocks unaffected in both modes
    for want in (f"{A}\n{B}\n{C}\n{D}", f"{M}\n{N}\n{A}", f"{R}\n{S}\n{A}"):
        assert any(c == want for c, _, _ in plain)
        assert any(c == want for c, _, _ in sfx)

    # cross-engine: each mode matches its recursive-CTE twin
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(docs, columns=["doc_id", "text"]))
    for emit, got in ((False, plain), (True, sfx)):
        drows = sorted(
            tuple(r)
            for r in con.sql(
                duplicate_blocks_resolved_sql(
                    min_lines=2, synthesize=False, emit_suffixes=emit
                )
            ).fetchall()
        )
        assert got == drows, f"emit_suffixes={emit}"
