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
    """Decode one PDF literal string body (escapes + octal), WinAnsi/
    ASCII subset."""
    out, i, n = [], 0, len(s)
    while i < n:
        c = s[i]
        if c == 0x5C and i + 1 < n:  # backslash
            nxt = s[i + 1]
            mapped = {0x6E: "\n", 0x72: "\r", 0x74: "\t", 0x62: "\b",
                      0x66: "\f", 0x28: "(", 0x29: ")", 0x5C: "\\"}
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
                out.append(chr(code))
                i = j
                continue
            i += 1  # line continuation / unknown escape: drop backslash
            continue
        out.append(chr(c))
        i += 1
    return "".join(out)


def pdf_extract_text_bytes(data: bytes) -> str:
    """Text of one PDF (plain Python; used inside Arrow batches and
    by tests): text-showing operators Tj / ' / TJ inside BT..ET
    blocks; Td/TD/T*/' vertical moves become newlines, TJ kerning
    numbers are ignored. Scope: unencrypted PDFs with plain or
    Flate-compressed content streams and byte-string (ASCII/WinAnsi)
    text — no CID/UTF-16 fonts (the tier note in the module
    docstring applies)."""
    import re

    chunks: list[str] = []
    string_re = re.compile(rb"\((?:\\.|[^\\()])*\)", re.S)
    for stream in _pdf_streams(data):
        for bt in re.findall(rb"BT(.*?)ET", stream, re.S):
            parts: list[str] = []
            # walk operators in order: strings (kept with their op)
            # and line-move ops (newline markers)
            for m in re.finditer(
                rb"(\((?:\\.|[^\\()])*\))\s*(Tj|')|(TJ)|(T\*|Td|TD)", bt
            ):
                if m.group(1) is not None:
                    if m.group(2) == b"'":
                        parts.append("\n")
                    parts.append(_pdf_literal(m.group(1)[1:-1]))
                elif m.group(3):
                    # TJ: the array of strings just before the operator
                    start = bt.rfind(b"[", 0, m.start(3))
                    if start != -1:
                        for sm in string_re.finditer(bt, start, m.start(3)):
                            parts.append(_pdf_literal(sm.group(0)[1:-1]))
                elif m.group(4):
                    parts.append("\n")
            text = "".join(parts).strip("\n")
            if text.strip():
                chunks.append(text)
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
