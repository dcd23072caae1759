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
* lowercasing is exact for EVERY codepoint (round 5 — the former
  exclusion list is zeroed): the ``ORACLE_LOWER_DIVERGENT`` cps
  (where JVM / Python / DuckDB 1:1 mappings disagree — U+0130 İ plus
  newer-Unicode cased letters one runtime's tables lag on) are
  normalized to the JVM mapping on both sides — the oracle
  pre-substitutes them via ``ORACLE_LOWER_OVERRIDES``
  (:func:`lower_override_sql`, probed lower-stable at generation),
  and the Python/Arrow paths route through :func:`jvm_lower`; the
  final-sigma rule uses the CONSUMING context pattern in per-token
  position too, so mid-token non-cased followers (``ΑΣ中``) lower
  exactly like the JVM.

The one remaining approximation (documented, not silent): a sigma
whose backward case-ignorable skip-run crosses a char consumed as a
previous sigma-match's terminator is not re-examined by the replay
(see :func:`text_lower_sql`); only adjacent sigma contexts sharing
case-ignorable runs hit this, never plain text. :func:`jvm_lower`
shares the replay VERBATIM, so the Python engine path and the SQL
oracle agree with each other even in that corner.
"""

from __future__ import annotations

import re
from functools import lru_cache

from textalyzer_spark.functions._unicode_tables import (
    ALPHA_RANGES,
    ORACLE_LOWER_DIVERGENT,
    ORACLE_LOWER_OVERRIDES,
    SIGMA_CASED_RANGES,
    SIGMA_IGNORABLE_RANGES,
)

#: Cross-engine whitespace class (ADVICE r5): Java ``\s`` is
#: ``[ \t\n\x0B\f\r]``, RE2 ``\s`` is ``[\t\n\f\r ]`` (no \x0B), and
#: Python unicode ``\s`` adds NBSP/\x1c-\x1f/unicode spaces — three
#: different splits for the "same" pattern. Every whitespace-splitting
#: operator with an oracle twin pins THIS explicit ASCII class instead
#: (one token class on the Catalyst, Arrow and DuckDB paths alike);
#: the escapes parse identically in Java regex, RE2 and Python re.
WS_CLASS = r"[ \t\n\r\f\x0b]"
WS_SPLIT = WS_CLASS + "+"
#: its complement, replacing ``\S`` in cross-engine patterns
NON_WS_CLASS = r"[^ \t\n\r\f\x0b]"

__all__ = [
    "ALPHA_RANGES",
    "NON_WS_CLASS",
    "WS_CLASS",
    "WS_SPLIT",
    "ORACLE_LOWER_DIVERGENT",
    "ORACLE_LOWER_OVERRIDES",
    "jvm_lower",
    "lower_override_sql",
    "py_alpha_regex",
    "re2_alpha_class",
    "re2_strip_class",
    "re2_sigma_cased_class",
    "re2_sigma_ignorable_class",
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
def _override_split() -> tuple[dict[int, str], dict[int, str]]:
    ones = {
        cp: t for cp, t in ORACLE_LOWER_OVERRIDES.items() if len(t) == 1
    }
    multi = {
        cp: t for cp, t in ORACLE_LOWER_OVERRIDES.items() if len(t) != 1
    }
    return ones, multi


def lower_override_sql(expr: str) -> str:
    """DuckDB expression normalizing every divergent-lower codepoint
    to the JVM's mapping BEFORE lower(): one codepoint-wise
    ``translate`` for the 1:1 targets plus a ``replace`` per
    multi-char expansion (U+0130 İ -> i + combining dot). Sound
    because generation probes each target to be DuckDB-lower-stable
    and sigma-context-preserving."""
    ones, multi = _override_split()
    if ones:
        keys = sorted(ones)
        frm = "".join(chr(cp) for cp in keys)
        to = "".join(ones[cp] for cp in keys)
        expr = f"translate({expr}, '{frm}', '{to}')"
    for cp in sorted(multi):
        expr = f"replace({expr}, '{chr(cp)}', '{multi[cp]}')"
    return expr


def tok_lower_sql(expr: str) -> str:
    """DuckDB expression: lowercase the raw token ``expr`` exactly as
    Spark's ``lower`` does per token — divergent-cp pre-substitution,
    then the CONSUMING final-sigma context replay (which, unlike the
    former ``$``-anchored rule, also fires mid-token when the
    follower is a non-cased non-ignorable char, e.g. ``ΑΣ中``), then
    ``lower``. Identical machinery to :func:`text_lower_sql` — a
    token is just a short text."""
    return text_lower_sql(expr)


def toks_lower_sql(list_expr: str) -> str:
    """DuckDB expression lowering every raw token in a list —
    ``list_transform`` with the :func:`tok_lower_sql` lambda body."""
    return f"list_transform({list_expr}, _t -> {tok_lower_sql('_t')})"


def text_lower_sql(expr: str) -> str:
    """DuckDB expression: lowercase WHOLE TEXT as Spark's ``lower``
    does. Divergent codepoints are first normalized to their JVM
    mapping (:func:`lower_override_sql` — sound pre-sigma because
    generation asserts the targets preserve cased-context
    membership); then the final-sigma rule is replayed by a consuming
    pre-substitution: every ``Σ`` whose backward scan (skip
    case-ignorables, then a cased char) and forward scan (skip
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
        f"lower(regexp_replace({lower_override_sql(expr)}, '{pat}', "
        "'\\1\\2ς\\3\\4', 'g'))"
    )


@lru_cache(maxsize=None)
def _py_sigma_pattern() -> "re.Pattern[str]":
    """The consuming final-sigma context pattern compiled for Python —
    the SAME generated JVM classes as the SQL replay, used by
    :func:`jvm_lower` to apply JVM-table sigma contexts that an older
    Python Unicode table would miss."""
    c = _class_body(SIGMA_CASED_RANGES, _fmt_py)
    i = _class_body(SIGMA_IGNORABLE_RANGES, _fmt_py)
    return re.compile(f"([{c}])([{i}]*)Σ([{i}]*)([^{c}{i}]|\\Z)")


@lru_cache(maxsize=None)
def _py_lower_fixup() -> dict[int, str]:
    """Post-lower() translate table: the divergent cps whose Python
    mapping is identity but whose JVM mapping lowers (newer-Unicode
    letters Python's tables lag on). Safe post-lower because
    lowering never PRODUCES these (uppercase) cps — one surviving in
    lowered text means the input contained it."""
    return {
        cp: t
        for cp, t in ORACLE_LOWER_OVERRIDES.items()
        if chr(cp).lower() == chr(cp)
    }


def jvm_lower(s: str) -> str:
    """Python ``lower`` corrected to the JVM's mapping on every
    codepoint — the lowering the engine's Arrow/Python paths use so
    both engine paths (and therefore the oracle) agree beyond what
    this interpreter's Unicode tables know:

    * ASCII fast path: ``str.lower`` unchanged (zero cost on the hot
      path — every divergent cp and every sigma is non-ASCII);
    * otherwise: replay JVM-table final-sigma contexts with the
      generated consuming pattern, then force every REMAINING ``Σ``
      to ``σ`` — a Σ the JVM-table replay did not finalize is
      JVM-non-final, and leaving it for ``str.lower`` would let this
      interpreter's OLDER sigma tables disagree (probed: Python
      finalizes before a follower that is cased only in newer
      Unicode). Sigma handling is thus 100% generated-table-driven,
      sharing :func:`text_lower_sql`'s documented adjacent-sigma
      approximation verbatim; then ``str.lower`` for everything
      else, then the divergent-cp fixup translate."""
    if s.isascii():
        return s.lower()
    if "Σ" in s:
        s = _py_sigma_pattern().sub("\\1\\2ς\\3\\4", s).replace("Σ", "σ")
    return s.lower().translate(_py_lower_fixup())
