"""Syllable counting (north_star readability extension; no reference
code exists — FIXTURES.md F-14 pins this heuristic as the golden).

Heuristic (deliberately SQL-expressible so the DuckDB oracle can
replicate it bit-for-bit):

    groups = number of maximal [aeiouy]+ runs in the lowercased word
    if word ends with 'e' but not 'le' and groups > 1: groups -= 1
    syllables = max(1, groups)

Two implementations: a Catalyst Column expression (used by the
readability operator — fully JVM-side, whole-stage codegen) and a
plain-Python version for tests.
"""

from __future__ import annotations

import re
from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F

_VOWEL_RUN = re.compile(r"[aeiouy]+")


@lru_cache(maxsize=1 << 17)
def count_syllables(word: str) -> int:
    """Plain-Python implementation (tests/goldens and the fused
    mapInPandas pipeline). Memoized: token frequency is Zipfian, so
    per-worker caching removes most regex work in the hot path."""
    w = word.lower()
    groups = len(_VOWEL_RUN.findall(w))
    if w.endswith("e") and not w.endswith("le") and groups > 1:
        groups -= 1
    return max(1, groups)


def syllables_col(word: Column | str) -> Column:
    """JVM-side syllable count for an (already lowercased) word column."""
    w = F.col(word) if isinstance(word, str) else word
    groups = F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), F.lit(0)))
    silent_e = (
        w.endswith("e") & ~w.endswith("le") & (groups > F.lit(1))
    ).cast("int")
    return F.greatest(F.lit(1), groups - silent_e)
