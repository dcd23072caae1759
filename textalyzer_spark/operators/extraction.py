"""Main-content extraction (north_rule: "HTML boilerplate strip,
PDF/layout parse, DOM heuristics") into the engine's interleaved
span model. HTML: stdlib html.parser + block model below. PDF:
stdlib-only text extraction for unencrypted PDFs with plain or
Flate-compressed content streams (zlib IS stdlib) — other stream
filters and CID/UTF-16 fonts are skipped honestly, the same tier
note as multimodal.py's codec formats.

Heuristics are the public boilerpipe/jusText family, simplified to
the signals that carry most of the weight (Kohlschuetter et al.,
WSDM'10: link density + block context; jusText: per-block link
density and stop-tag scoping):

* blocks inside ``script/style/noscript/template/nav/header/footer/
  aside/form`` scopes are boilerplate by TAG;
* a block whose link density (chars inside <a> / chars) exceeds 0.5
  is boilerplate by DENSITY (menus, ad units, related-links);
* whitespace-only blocks are dropped;
* everything else is main content, in document order.

Parsing is the stdlib ``html.parser`` (no external dependency), run
per Arrow batch via mapInPandas — HTML parsing is irreducibly
per-document string work, exactly the case the engine's
no-per-row-Python rule reserves for batched Python. Media elements
(img/video/audio/embed/source) become ``kind='media'`` spans with
their src as ``media_ref``, so an HTML corpus lands directly in the
``documents(doc_id, spans)`` interleaved table.
"""

from __future__ import annotations

from html.parser import HTMLParser

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DROP_SCOPES = frozenset(
    "head title script style noscript template nav header footer aside "
    "form".split()
)
_BLOCK_TAGS = frozenset(
    "p div h1 h2 h3 h4 h5 h6 li td th article section blockquote pre "
    "tr ul ol table body br".split()
)
_MEDIA_TAGS = frozenset("img video audio embed source".split())
_VOID_SCOPES = frozenset("br img input meta link hr".split())

SPAN_TYPE = (
    "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


class _BlockParser(HTMLParser):
    """Collects (text blocks, media refs) in document order."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, int]] = []  # (text, link_chars, drop_depth>0)
        self.media: list[tuple[int, str]] = []  # (block_index_before, ref)
        self._buf: list[str] = []
        self._link_chars = 0
        self._drop_depth = 0
        self._a_depth = 0

    def _flush(self) -> None:
        text = "".join(self._buf)
        if text.strip():
            self.blocks.append(
                (text.strip(), self._link_chars, self._drop_depth)
            )
        self._buf = []
        self._link_chars = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _MEDIA_TAGS:
            src = dict(attrs).get("src")
            if src:
                self._flush()
                self.media.append((len(self.blocks), src))
            return
        if tag in _DROP_SCOPES:
            self._flush()
            if tag not in _VOID_SCOPES:
                self._drop_depth += 1
            return
        if tag == "a":
            self._a_depth += 1
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in _DROP_SCOPES and tag not in _VOID_SCOPES:
            self._flush()
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if tag == "a":
            self._a_depth = max(0, self._a_depth - 1)
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        self._buf.append(data)
        if self._a_depth > 0:
            self._link_chars += len(data)

    def close(self) -> None:  # noqa: D102 - flush the tail block
        self._flush()
        super().close()


def parse_main_content(
    html: str, max_link_density: float = 0.5
) -> tuple[list[str], list[str]]:
    """(kept main-content blocks, media refs) of one page — plain
    Python; used inside the Arrow batches and directly by tests."""
    p = _BlockParser()
    p.feed(html or "")
    p.close()
    kept = [
        text
        for text, link_chars, dropped in p.blocks
        if not dropped and link_chars / max(len(text), 1) <= max_link_density
    ]
    return kept, [ref for _, ref in p.media]


def extract_main_content(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    max_link_density: float = 0.5,
) -> DataFrame:
    """``(doc_id, main_text, n_blocks, n_media)`` — boilerplate-
    stripped main content per page, blocks joined with newlines."""
    from collections.abc import Iterator

    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts, n_blocks, n_media = [], [], []
            for html in pdf[html_col]:
                kept, media = parse_main_content(html, max_link_density)
                texts.append("\n".join(kept))
                n_blocks.append(len(kept))
                n_media.append(len(media))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "main_text": texts,
                    "n_blocks": n_blocks,
                    "n_media": n_media,
                }
            )

    id_type = dict(df.dtypes).get(id_col, "string")
    return df.mapInPandas(
        run,
        f"doc_id {id_type}, main_text string, n_blocks int, n_media int",
    )


def html_to_spans(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    max_link_density: float = 0.5,
) -> DataFrame:
    """``(doc_id, spans)`` — an HTML corpus rendered into the engine's
    canonical interleaved table: kept text blocks and media elements
    as (kind, text, media_ref, offset) in document order, feeding the
    span pipeline (process_spans_arrow) unchanged."""
    # mapInArrow with an EXPLICIT pyarrow type: a batch whose media
    # spans are all-None in some struct field would otherwise have
    # that child inferred as the Arrow null type, which the JVM side
    # cannot read back as the declared string column
    import pyarrow as pa

    span_pa_type = pa.list_(
        pa.struct(
            [
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
                ("offset", pa.int32()),
            ]
        )
    )

    def run(batches):
        for b in batches:
            htmls = b.column(b.schema.get_field_index(html_col)).to_pylist()
            spans_col = []
            for html in htmls:
                p = _BlockParser()
                p.feed(html or "")
                p.close()
                media_by_pos: dict[int, list[str]] = {}
                for pos, ref in p.media:
                    media_by_pos.setdefault(pos, []).append(ref)
                spans, offset = [], 0

                def emit(kind, text, ref, off):
                    spans.append(
                        {"kind": kind, "text": text, "media_ref": ref,
                         "offset": off}
                    )

                for i, (text, link_chars, dropped) in enumerate(p.blocks):
                    for ref in media_by_pos.pop(i, []):
                        emit("media", None, ref, offset)
                    if (
                        not dropped
                        and link_chars / max(len(text), 1) <= max_link_density
                    ):
                        emit("text", text, None, offset)
                        offset += len(text)
                for refs in media_by_pos.values():
                    for ref in refs:
                        emit("media", None, ref, offset)
                spans_col.append(spans)
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(b.schema.get_field_index(id_col)),
                    pa.array(spans_col, type=span_pa_type),
                ],
                names=["doc_id", "spans"],
            )

    id_type = dict(df.dtypes).get(id_col, "string")
    return df.mapInArrow(run, f"doc_id {id_type}, spans {SPAN_TYPE}")


# --------------------------------------------------------------------------
# PDF text extraction (north_rule: "PDF/layout parse")
# --------------------------------------------------------------------------

_PDF_STREAM_RE = None


def _pdf_streams(data: bytes):
    """Yield decoded content streams: raw for plain streams, inflated
    for /FlateDecode (zlib is stdlib — most simple real PDFs use only
    Flate). Other filters (DCT, LZW, crypt) are skipped: out of scope
    without codec libraries, same honesty tier as multimodal.py."""
    import re
    import zlib

    global _PDF_STREAM_RE
    if _PDF_STREAM_RE is None:
        _PDF_STREAM_RE = re.compile(
            rb"<<(.*?)>>\s*stream\r?\n(.*?)endstream", re.S
        )
    for m in _PDF_STREAM_RE.finditer(data or b""):
        head, body = m.group(1), m.group(2)
        if b"/FlateDecode" in head:
            try:
                yield zlib.decompress(body)
            except zlib.error:
                continue
        elif b"/Filter" not in head:
            yield body


def _pdf_literal(s: bytes) -> str:
    """Decode one PDF literal string body: escapes + octal resolve to
    BYTES first, then the byte string decodes as UTF-8 with a Latin-1
    fallback. UTF-8-first makes the synthesize->extract roundtrip
    exact for every Unicode codepoint (round-3's chr-per-byte decode
    was Latin-1-only — ADVICE round 3); on real single-byte-encoded
    PDFs the fallback keeps the old WinAnsi-ish behavior except for
    accented byte runs that happen to be valid UTF-8 (a documented
    heuristic — byte-string PDFs carry no encoding marker)."""
    out, i, n = bytearray(), 0, len(s)
    while i < n:
        c = s[i]
        if c == 0x5C and i + 1 < n:  # backslash
            nxt = s[i + 1]
            mapped = {0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08,
                      0x66: 0x0C, 0x28: 0x28, 0x29: 0x29, 0x5C: 0x5C}
            if nxt in mapped:
                out.append(mapped[nxt])
                i += 2
                continue
            if 0x30 <= nxt <= 0x37:  # octal escape, up to 3 digits
                j = i + 1
                oct_digits = []
                while j < n and len(oct_digits) < 3 and 0x30 <= s[j] <= 0x37:
                    oct_digits.append(s[j] - 0x30)
                    j += 1
                code = 0
                for d in oct_digits:
                    code = code * 8 + d
                out.append(code & 0xFF)  # spec: one 8-bit byte
                i = j
                continue
            i += 1  # line continuation / unknown escape: drop backslash
            continue
        out.append(c)
        i += 1
    try:
        return out.decode("utf-8")
    except UnicodeDecodeError:
        return out.decode("latin-1")


def _pdf_content_tokens(stream: bytes):
    """ONE linear pass over a content stream, yielding ``('str',
    body)``, ``('[', b'')``, ``(']', b'')``, and ``('op', name)``
    tokens in document order. String literals are consumed FIRST
    (with escape handling and PDF's balanced-paren nesting), so an
    operator name appearing INSIDE a literal — a TJ-array element
    containing ``TJ`` or ``Td`` — can never be tokenized as an
    operator (the round-2 ADVICE scan bug). Hex strings, dicts, and
    comments are skipped (same capability tier as before)."""
    i, n = 0, len(stream)
    while i < n:
        c = stream[i]
        if c == 0x28:  # ( literal string, nesting + escapes
            depth, j = 1, i + 1
            start = j
            while j < n and depth:
                cc = stream[j]
                if cc == 0x5C:
                    j += 2
                    continue
                if cc == 0x28:
                    depth += 1
                elif cc == 0x29:
                    depth -= 1
                j += 1
            yield ("str", stream[start : j - 1])
            i = j
        elif c == 0x3C:  # << dict or <...> hex string: skipped tier
            if i + 1 < n and stream[i + 1] == 0x3C:
                i += 2
            else:
                e = stream.find(b">", i + 1)
                i = n if e == -1 else e + 1
        elif c == 0x5B:
            yield ("[", b"")
            i += 1
        elif c == 0x5D:
            yield ("]", b"")
            i += 1
        elif c == 0x25:  # % comment to end of line
            e = stream.find(b"\n", i)
            i = n if e == -1 else e + 1
        elif c in (0x27, 0x22):  # ' and " text-show operators
            yield ("op", stream[i : i + 1])
            i += 1
        elif 0x41 <= c <= 0x5A or 0x61 <= c <= 0x7A:
            j = i
            while j < n and (
                0x41 <= stream[j] <= 0x5A or 0x61 <= stream[j] <= 0x7A
            ):
                j += 1
            if j < n and stream[j] == 0x2A:  # T* (and f*/B* harmlessly)
                j += 1
            yield ("op", stream[i:j])
            i = j
        else:
            i += 1


def pdf_extract_text_bytes(data: bytes) -> str:
    """Text of one PDF (plain Python; used inside Arrow batches and
    by tests): text-showing operators Tj / ' / " / TJ inside BT..ET
    blocks; Td/TD/T*/'/" vertical moves become newlines, TJ kerning
    numbers are ignored. BT/ET themselves are recognized as TOKENS
    (not regex matches), so an ET inside a string literal cannot
    truncate a text block. Scope: unencrypted PDFs with plain or
    Flate-compressed content streams and byte-string text (UTF-8
    first, Latin-1 fallback — see ``_pdf_literal``) — no CID/UTF-16
    hex-string fonts (the tier note in the module docstring
    applies)."""
    chunks: list[str] = []
    for stream in _pdf_streams(data):
        parts: list[str] = []
        in_text = False
        in_array = False
        last_str: bytes | None = None
        array_buf: list[bytes] = []

        def flush() -> None:
            text = "".join(parts).strip("\n")
            # ASCII whitespace set, matching the driver oracle's trim
            # exactly (str.strip()'s Unicode set also drops \x1c-\x1f/
            # \x85/\xa0-only blocks the oracle keeps — ADVICE round 3)
            if text.strip(" \t\n\x0b\x0c\r"):
                chunks.append(text)
            parts.clear()

        for kind, val in _pdf_content_tokens(stream):
            if kind == "op" and val == b"BT":
                in_text, in_array, last_str, array_buf = True, False, None, []
                continue
            if kind == "op" and val == b"ET":
                if in_text:
                    flush()
                in_text = False
                continue
            if not in_text:
                continue
            if kind == "str":
                if in_array:
                    array_buf.append(val)
                else:
                    last_str = val
            elif kind == "[":
                in_array, array_buf = True, []
            elif kind == "]":
                in_array = False
            elif kind == "op":
                if val == b"Tj":
                    if last_str is not None:
                        parts.append(_pdf_literal(last_str))
                        last_str = None
                elif val in (b"'", b'"'):
                    parts.append("\n")
                    if last_str is not None:
                        parts.append(_pdf_literal(last_str))
                        last_str = None
                elif val == b"TJ":
                    parts.extend(_pdf_literal(s) for s in array_buf)
                    array_buf = []
                elif val in (b"Td", b"TD", b"T*"):
                    parts.append("\n")
        if in_text:  # unterminated BT: keep what was shown
            flush()
    return "\n".join(chunks)


def pdf_extract_text(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """``(doc_id, text, n_bytes)`` — Arrow-batched PDF text extraction
    over a binary column (the media-table shape, multimodal.py)."""
    from collections.abc import Iterator

    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "text": [
                        pdf_extract_text_bytes(p or b"")
                        for p in pdf[payload_col]
                    ],
                    "n_bytes": [len(p or b"") for p in pdf[payload_col]],
                }
            )

    id_type = dict(df.dtypes).get(id_col, "string")
    return df.mapInPandas(
        run, f"doc_id {id_type}, text string, n_bytes bigint"
    )


def synthesize_pdfs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """``(doc_id, payload binary)`` — a deterministic minimal
    Flate-compressed PDF per document: each \\n-separated line of the
    source text becomes an escaped literal string + ``Tj``, lines
    separated by ``T*``. The template is INVERTIBLE for ANY Unicode
    text (UTF-8 literal-string bytes here, UTF-8-first decode in
    ``_pdf_literal`` — round 3 was latin-1-with-replacement, which
    silently degraded >U+00FF corpora) — extraction returns exactly
    the original text modulo the documented edge normalization
    (``.strip("\\n")`` of the block + the ASCII-whitespace-only block
    drop), which is what the driver-gate oracle reconstructs in SQL.
    Escaping here (\\\\, \\(, \\)) and _pdf_literal's unescaping
    cancel."""
    from collections.abc import Iterator

    import pandas as pd

    def one(text: str) -> bytes:
        import zlib

        lines = (text or "").split("\n")
        esc = [
            l.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
            for l in lines
        ]
        ops = "BT " + " T* ".join(f"({e}) Tj" for e in esc) + " ET"
        body = zlib.compress(ops.encode("utf-8"))
        return (
            b"%PDF-1.4\n"
            b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
            b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
            b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
            b"4 0 obj << /Filter /FlateDecode /Length "
            + str(len(body)).encode()
            + b" >>\nstream\n"
            + body
            + b"endstream endobj\n%%EOF\n"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": [one(t) for t in pdf[text_col]],
                }
            )

    id_type = dict(df.dtypes).get(id_col, "string")
    return df.select(id_col, text_col).mapInPandas(
        run, f"doc_id {id_type}, payload binary"
    )


def synthesize_pages(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministically wrap a flat text corpus in a realistic page
    template (nav + header + ad unit + article paragraphs + image +
    footer) — the INVERTIBLE fixture behind the driver-gate roundtrip:
    extraction must return exactly the article paragraphs.
    HTML-escaping here and entity-decoding in the parser cancel out."""
    esc = F.col(text_col)
    for raw, ent in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")):
        esc = F.replace(esc, F.lit(raw), F.lit(ent))
    paragraphs = F.concat(
        F.lit("<p>"),
        F.array_join(
            F.transform(F.split(esc, r"\n"), lambda l: l), "</p><p>"
        ),
        F.lit("</p>"),
    )
    return df.withColumn(
        "html",
        F.concat(
            F.lit(
                "<html><head><title>doc</title>"
                "<script>var x=1;</script></head><body>"
                '<nav><a href="/">Home</a> <a href="/a">About</a></nav>'
                "<header><h1>Example Site</h1></header>"
                '<div><a href="/buy">Buy now!</a> <a href="/x">Win big</a></div>'
                "<article>"
            ),
            paragraphs,
            F.lit('<img src="img_'),
            F.col("doc_id").cast("string"),
            F.lit('.png"/></article><footer><a href="/c">Contact</a>'
                  " <a href=\"/t\">Terms</a></footer></body></html>"),
        ),
    )
