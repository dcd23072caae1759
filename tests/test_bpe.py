"""Learned-BPE training + token counting."""

from __future__ import annotations

from textalyzer_spark.operators.bpe import (
    bpe_apply,
    bpe_token_counts,
    bpe_train_from_histogram,
)


def _brute_train(hist, n_merges):
    """Full-recount reference trainer (what the oracle's recursive CTE
    does): recount every adjacent position each iteration."""
    syms = {w: " " + " ".join(w) + " " for w, _ in hist}
    cnt = dict(hist)
    merges = []
    for _ in range(n_merges):
        stats: dict = {}
        for w, s in syms.items():
            parts = [p for p in s.split(" ") if p]  # literal-space split
            for i in range(len(parts) - 1):
                p = (parts[i], parts[i + 1])
                stats[p] = stats.get(p, 0) + cnt[w]
        live = {p: t for p, t in stats.items() if t > 0}
        if not live:
            break
        best = min(live.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for w in syms:
            syms[w] = syms[w].replace(f" {a} {b} ", f" {a}{b} ")
    return merges


def test_hand_computed_sennrich_example():
    """The classic low/lower/newest/widest corpus: es, est, lo, low."""
    hist = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    assert bpe_train_from_histogram(hist, 4) == [
        ("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"),
    ]
    assert bpe_apply("lowest", bpe_train_from_histogram(hist, 4)) == [
        "low", "est",
    ]


def test_alternating_overlap_pair_rechosen():
    """replace-all leaves an occurrence behind in 'a b a b a', so the
    same pair must be diff-updated and CAN be chosen again — the
    incremental trainer must match the full recount here."""
    hist = [("ababa", 5)]
    got = bpe_train_from_histogram(hist, 3)
    assert got == _brute_train(hist, 3)
    assert got[0] == ("a", "b") and got[1] == ("a", "b")


def test_nbsp_symbol_no_phantom_pairs():
    """A word with embedded NBSP (not split by the pinned WS class)
    must train normally: the old bare .split() dropped the NBSP
    symbol from the pair list, creating a phantom pair that was
    re-chosen every remaining rank (round-6 whitespace fix)."""
    hist = [("nbsp\xa0joined", 2), ("plain", 1), ("words", 1)]
    merges = bpe_train_from_histogram(hist, 60)
    assert merges == _brute_train(hist, 60)
    # no pair may repeat more times than replace-all semantics allow;
    # the phantom showed up as an unbounded identical-tail run
    tail = merges[-5:]
    assert not (len(set(tail)) == 1 and len(merges) == 60)
    # full merge: every trained word collapses to one token
    assert bpe_apply("nbsp\xa0joined", merges) == ["nbsp\xa0joined"]
    assert bpe_apply("plain", merges) == ["plain"]


def test_incremental_equals_brute_recount_randomized():
    import random

    rng = random.Random(42)
    alphabet = "abcdef"
    for trial in range(10):
        hist = [
            (
                "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 9))),
                rng.randint(1, 20),
            )
            for _ in range(rng.randint(3, 40))
        ]
        # histogram keys must be unique words
        seen: dict = {}
        for w, c in hist:
            seen[w] = seen.get(w, 0) + c
        hist = sorted(seen.items())
        n = rng.randint(1, 30)
        assert bpe_train_from_histogram(hist, n) == _brute_train(hist, n), (
            trial, hist, n,
        )


def test_bpe_token_counts_spark(spark):
    merges = [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    df = spark.createDataFrame(
        [
            (1, "lowest newest"),       # low est | n e w est -> 2 + 4
            (2, "  low  "),             # low -> 1
            (3, ""),                    # no words
            (4, "zz est"),              # z z | est -> 2 + 1
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_token_counts(df, merges).collect()
    }
    assert out == {1: (2, 6), 2: (1, 1), 3: (0, 0), 4: (2, 3)}


def test_train_end_to_end_spark(spark):
    from textalyzer_spark.operators.bpe import bpe_train

    rows = [(i, "low lower newest widest " * 3) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    merges = bpe_train(df, n_merges=4)
    # per-word frequencies are uniform (12 each): ranking falls to the
    # pair totals exactly as in the hand example scaled
    assert ("e", "s") in merges[:2]


def test_merge_table_roundtrip_and_frozen_apply(spark, tmp_path):
    """Deployment shape: train once, persist, reload, count a LATER
    batch under the frozen table — identical counts to the in-memory
    table, including non-ASCII merges through the JSON roundtrip."""
    from textalyzer_spark.operators.bpe import (
        bpe_token_counts,
        bpe_train,
        load_merges,
        save_merges,
    )

    corpus = spark.createDataFrame(
        [(1, "lower lowest löwe löwen newest widest"),
         (2, "newest newest lowest löwe")],
        "doc_id bigint, text string",
    )
    merges = bpe_train(corpus, n_merges=40)
    path = str(tmp_path / "merges.json")
    save_merges(merges, path)
    assert load_merges(path) == merges
    batch = spark.createDataFrame(
        [(10, "unseen löwenzahn lowest wide")],
        "doc_id bigint, text string",
    )
    a = bpe_token_counts(batch, merges).collect()
    b = bpe_token_counts(batch, load_merges(path)).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
