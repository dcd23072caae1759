"""The tokenizer alphabet, generated from the JVM (see
tools/gen_unicode_tables.py) and shared by every consumer:

* the Python/Arrow tokenizer (``functions.tokenize``) compiles
  :func:`py_alpha_regex` — so the pandas-UDF path splits on EXACTLY
  the same class as the JVM ``\\p{IsAlphabetic}`` fast path (the old
  ``[^\\W\\d_]`` approximation admitted ²³¼ and missed Other_Alphabetic
  marks);
* the DuckDB oracles (``oracles`` / ``__spark_entry__``) embed
  :func:`re2_alpha_class` and the final-sigma context classes — so a
  Greek/Cyrillic/CJK corpus has a value-exact cross-engine twin, not
  just a Latin one.

Verified-range contract (what the oracle twin guarantees, documented
rather than silently wrong outside it):

* tokenization (the split) is exact for EVERY codepoint — the class
  is the JVM's own table;
* per-token lowercasing is exact for every alphabetic codepoint
  except ``ORACLE_LOWER_DIVERGENT`` (4 cps whose utf8proc mapping
  lags the JDK: U+0130 İ and three Latin-Extended-D rarities), and
  except tokens where a final ``Σ`` is followed — after case-
  ignorable skips — by an alphabetic char that is neither cased nor
  ignorable (e.g. a Greek-CJK mixed token ``ΑΣ中``): Java treats that
  sigma as final, the oracle's ``$``-anchored rule does not. Real
  single-script text never hits either exclusion.
"""

from __future__ import annotations

import re
from functools import lru_cache

from textalyzer_spark.functions._unicode_tables import (
    ALPHA_RANGES,
    ORACLE_LOWER_DIVERGENT,
    SIGMA_CASED_RANGES,
    SIGMA_IGNORABLE_RANGES,
)

__all__ = [
    "ALPHA_RANGES",
    "ORACLE_LOWER_DIVERGENT",
    "py_alpha_regex",
    "re2_alpha_class",
    "re2_strip_class",
    "re2_sigma_cased_class",
    "re2_sigma_ignorable_class",
    "re2_sigma_ignorable_lower_class",
    "text_lower_sql",
    "tok_lower_sql",
    "toks_lower_sql",
]


def _fmt_re2(cp: int) -> str:
    # only ASCII alphanumerics pass through raw: the full context
    # classes contain ASCII punctuation (apostrophe, colon, ...) that
    # would terminate the surrounding SQL string literal or read as
    # regex metachars — escape everything else as \x{...}
    ch = chr(cp)
    if 0x30 <= cp <= 0x39 or 0x41 <= cp <= 0x5A or 0x61 <= cp <= 0x7A:
        return ch
    return f"\\x{{{cp:04X}}}"


def _fmt_py(cp: int) -> str:
    ch = chr(cp)
    if ch in "[]^-\\":
        return "\\" + ch
    if 0x20 <= cp < 0x7F:
        return ch
    if cp <= 0xFFFF:
        return f"\\u{cp:04X}"
    return f"\\U{cp:08X}"


def _class_body(ranges: list[list[int]], fmt) -> str:
    return "".join(
        fmt(a) + (("-" + fmt(b)) if b > a else "") for a, b in ranges
    )


@lru_cache(maxsize=None)
def py_alpha_regex() -> "re.Pattern[str]":
    """Compiled Python regex matching one JVM-alphabetic run."""
    return re.compile("[" + _class_body(ALPHA_RANGES, _fmt_py) + "]+")


@lru_cache(maxsize=None)
def re2_alpha_class() -> str:
    """RE2 char-class body (no brackets) of the JVM alphabetic set."""
    return _class_body(ALPHA_RANGES, _fmt_re2)


def re2_strip_class() -> str:
    """Negated RE2 class matching runs of NON-alphabetic chars."""
    return "[^" + re2_alpha_class() + "]+"


@lru_cache(maxsize=None)
def re2_sigma_cased_class() -> str:
    return _class_body(SIGMA_CASED_RANGES, _fmt_re2)


@lru_cache(maxsize=None)
def re2_sigma_ignorable_class() -> str:
    return _class_body(SIGMA_IGNORABLE_RANGES, _fmt_re2)


@lru_cache(maxsize=None)
def re2_sigma_ignorable_lower_class() -> str:
    """The ignorable class CLOSED under lowercasing — the trailing
    skip chars in a LOWERED token are the lowered forms of the raw
    ones (Python lower == JVM lower on every alphabetic cp, verified
    by the generator probe)."""
    cps = set()
    for a, b in SIGMA_IGNORABLE_RANGES:
        for cp in range(a, b + 1):
            cps.add(cp)
            low = chr(cp).lower()
            if len(low) == 1:
                cps.add(ord(low))
    ranges: list[list[int]] = []
    for cp in sorted(cps):
        if ranges and cp == ranges[-1][1] + 1:
            ranges[-1][1] = cp
        else:
            ranges.append([cp, cp])
    return _class_body(ranges, _fmt_re2)


def tok_lower_sql(expr: str) -> str:
    """DuckDB expression: lowercase the raw token ``expr`` exactly as
    Spark's ``lower`` does per token. utf8proc's lower() is already
    codepoint-identical to the JDK on every alphabetic cp except the
    documented divergents; the one CONTEXT rule (Greek final sigma:
    a ``Σ`` preceded by a cased char — skipping case-ignorables — and
    followed only by case-ignorables to token end lowers to ``ς``)
    is replayed with the generated context classes."""
    c = re2_sigma_cased_class()
    i = re2_sigma_ignorable_class()
    il = re2_sigma_ignorable_lower_class()
    sigma_ctx = f"[{c}][{i}]*Σ[{i}]*$"
    return (
        f"CASE WHEN regexp_matches({expr}, '{sigma_ctx}') "
        f"THEN regexp_replace(lower({expr}), 'σ([{il}]*)$', 'ς\\1') "
        f"ELSE lower({expr}) END"
    )


def toks_lower_sql(list_expr: str) -> str:
    """DuckDB expression lowering every raw token in a list —
    ``list_transform`` with the :func:`tok_lower_sql` lambda body."""
    return f"list_transform({list_expr}, _t -> {tok_lower_sql('_t')})"


def text_lower_sql(expr: str) -> str:
    """DuckDB expression: lowercase WHOLE TEXT as Spark's / Python's
    ``lower`` does. The final-sigma rule is replayed by a consuming
    pre-substitution on the raw text: every ``Σ`` whose backward scan
    (skip case-ignorables, then a cased char) and forward scan (skip
    case-ignorables, then a NON-cased non-ignorable char or
    end-of-text) both hold becomes ``ς`` before the 1:1 lower().
    The consumed forward-terminator is non-cased, so it can never be
    the next sigma's backward context — global replace is safe.

    Known approximation (documented, not silent): a sigma whose
    backward skip-run crosses the char consumed as a previous match's
    terminator is not re-examined; only adjacent sigma contexts
    sharing case-ignorable runs hit this, never plain text."""
    c = re2_sigma_cased_class()
    i = re2_sigma_ignorable_class()
    pat = f"([{c}])([{i}]*)Σ([{i}]*)([^{c}{i}]|$)"
    return (
        f"lower(regexp_replace({expr}, '{pat}', "
        "'\\1\\2ς\\3\\4', 'g'))"
    )
