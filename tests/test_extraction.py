"""Main-content extraction: boilerplate stripping (tag scopes + link
density), entity handling, media capture, and the interleaved-spans
rendering of an HTML corpus."""

from __future__ import annotations

from textalyzer_spark.operators.extraction import (
    extract_main_content,
    html_to_spans,
    parse_main_content,
    synthesize_pages,
)

MESSY_PAGE = """
<html><head><title>Page title junk</title>
<style>.x{color:red}</style><script>track();</script></head>
<body>
<nav><a href="/">Home</a><a href="/b">Blog</a><a href="/c">Shop</a></nav>
<header><h1>The Example Times</h1></header>
<div id="breadcrumbs"><a href="/">Home</a> &gt; <a href="/news">News</a></div>
<article>
  <h2>Storm batters coastline overnight</h2>
  <p>Residents woke to flooded streets &amp; fallen trees after the
strongest storm in a decade.</p>
  <img src="storm.jpg">
  <p>Officials said <a href="/warn">warnings</a> had been issued two
days earlier, limiting injuries.</p>
</article>
<aside><a href="/x">Related: top 10 storms</a></aside>
<div class="ad"><a href="/buy">BUY NOW</a> <a href="/win">WIN BIG</a></div>
<footer><a href="/contact">Contact</a><a href="/terms">Terms</a></footer>
</body></html>
"""


def test_boilerplate_stripped_content_kept():
    blocks, media = parse_main_content(MESSY_PAGE)
    text = "\n".join(blocks)
    # main content survives, entities decoded
    assert "Storm batters coastline overnight" in text
    assert "flooded streets & fallen trees" in text
    # the low-link-density paragraph CONTAINING a link survives whole
    assert "warnings had been issued" in "\n".join(b.replace("\n", " ") for b in blocks)
    # every boilerplate class is gone
    for junk in (
        "Page title junk", "track()", "color:red", "Home", "Blog",
        "The Example Times", "News", "Related", "BUY NOW", "Contact",
    ):
        assert junk not in text, junk
    assert media == ["storm.jpg"]


def test_extract_main_content_dataframe(spark):
    df = spark.createDataFrame([(1, MESSY_PAGE)], "doc_id bigint, html string")
    row = extract_main_content(df).collect()[0]
    assert row["n_media"] == 1
    assert row["n_blocks"] == 3  # h2 + two paragraphs
    assert "strongest storm" in row["main_text"]


def test_html_to_spans_feeds_span_pipeline(spark):
    """An HTML corpus rendered to interleaved spans runs through the
    north-star span pipeline unchanged, media passthrough intact."""
    from textalyzer_spark.operators.spans import process_spans_arrow

    df = spark.createDataFrame(
        [(1, MESSY_PAGE), (2, "<body><p>tiny page</p></body>")],
        "doc_id bigint, html string",
    )
    nested = html_to_spans(df)
    out = {r["doc_id"]: r for r in process_spans_arrow(nested).collect()}
    assert out[1]["n_media_spans"] == 1
    assert out[1]["n_text_spans"] == 3
    media = [s for s in out[1]["spans"] if s["kind"] == "media"]
    assert media[0]["media_ref"] == "storm.jpg"
    # media span sits between the two paragraphs it separated
    kinds = [s["kind"] for s in out[1]["spans"]]
    assert kinds.index("media") > 0
    assert out[2]["n_text_spans"] == 1 and out[2]["n_media_spans"] == 0
    assert out[1]["n_tokens"] > 20


def test_synthesized_page_roundtrip_with_specials(spark):
    """Escaping in the template and entity decoding in the parser
    must cancel — including on &, <, > in the source text."""
    docs = spark.createDataFrame(
        [(7, "a & b < c > d\nsecond line")], "doc_id bigint, text string"
    )
    row = extract_main_content(synthesize_pages(docs)).collect()[0]
    assert row["main_text"] == "a & b < c > d\nsecond line"
    assert row["n_blocks"] == 2 and row["n_media"] == 1


def _minimal_pdf(content_ops: bytes, flate: bool = True) -> bytes:
    """A minimal single-page PDF wrapping the given content stream."""
    import zlib

    body = zlib.compress(content_ops) if flate else content_ops
    filt = b"/Filter /FlateDecode " if flate else b""
    return (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        b"4 0 obj << " + filt + b"/Length " + str(len(body)).encode()
        + b" >>\nstream\n" + body + b"endstream endobj\n"
        b"%%EOF\n"
    )


PDF_OPS = (
    b"BT /F1 12 Tf 72 720 Td (Hello \\(PDF\\) world) Tj "
    b"0 -14 TD (second line) Tj "
    b"[(ker) -20 (ned)] TJ ET "
    b"BT 72 600 Td (new block) Tj ET"
)


def test_pdf_text_extraction_flate_and_plain():
    from textalyzer_spark.operators.extraction import pdf_extract_text_bytes

    for flate in (True, False):
        text = pdf_extract_text_bytes(_minimal_pdf(PDF_OPS, flate=flate))
        assert "Hello (PDF) world" in text          # escape handling
        assert "second line" in text
        assert "kerned" in text                     # TJ array, kerning dropped
        assert "new block" in text
        # TD produced a line break between the runs
        assert text.index("world") < text.index("\n") < text.index("second")
    # unsupported filter is skipped, not crashed
    bad = _minimal_pdf(PDF_OPS, flate=False).replace(
        b"/Length", b"/Filter /DCTDecode /Length"
    )
    assert pdf_extract_text_bytes(bad) == ""


def test_pdf_extract_text_dataframe(spark):
    from textalyzer_spark.operators.extraction import pdf_extract_text

    rows = [(1, _minimal_pdf(PDF_OPS)), (2, b"not a pdf")]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = {r["doc_id"]: r for r in pdf_extract_text(df).collect()}
    assert "second line" in out[1]["text"]
    assert out[2]["text"] == ""
    assert out[1]["n_bytes"] > 100


def test_pdf_operator_names_inside_strings():
    """Regression (ADVICE round-2): operator names / brackets INSIDE
    string literals must never be tokenized as operators, nested
    balanced parens are one literal, and TJ consumes exactly its own
    array (no rfind into earlier arrays)."""
    from textalyzer_spark.operators.extraction import pdf_extract_text_bytes

    ops = (
        b"BT (A TJ B) Tj ( [(x)] ) Tj "
        b"[(ker) -20 (n \\] ed)] TJ 0 -14 Td (next) Tj ET"
    )
    text = pdf_extract_text_bytes(_minimal_pdf(ops))
    assert text == "A TJ B [(x)] kern ] ed\nnext"
    # an ET inside a literal does not truncate the text block
    ops2 = b"BT (keep ET going) Tj (tail) Tj ET"
    assert pdf_extract_text_bytes(_minimal_pdf(ops2)) == "keep ET goingtail"


def test_synthesize_pdfs_roundtrip(spark):
    from textalyzer_spark.operators.extraction import (
        pdf_extract_text,
        synthesize_pdfs,
    )

    texts = [
        "with (parens) and \\ backslash\nsecond",
        "",
        "  \n\t",
        "tab\there",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    out = {
        r["doc_id"]: r["text"]
        for r in pdf_extract_text(synthesize_pdfs(docs)).collect()
    }
    assert out[0] == texts[0]
    assert out[1] == ""          # empty doc -> empty block dropped
    assert out[2] == ""          # all-whitespace block dropped
    assert out[3] == "tab\there"
