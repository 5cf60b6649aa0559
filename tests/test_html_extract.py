"""Spec tests for the HTML boilerplate stripper (hand-written expectations)."""

from llm_document_parser_spark.html_extract import extract_main_text, sniff_doc_kind


def test_drops_script_style_nav_footer():
    html = (
        "<html><head><title>T</title><style>b{}</style>"
        "<script>var x = 'this script text must not leak into the output';</script></head>"
        "<body><nav><a href='/'>home page navigation link list item</a></nav>"
        "<p>This is the main article content paragraph with plenty of words.</p>"
        "<footer>Copyright footer boilerplate text that is long enough to pass.</footer>"
        "</body></html>"
    )
    out = extract_main_text(html)
    assert out == "This is the main article content paragraph with plenty of words."


def test_link_density_filter():
    html = (
        "<body><div><a href='x'>link text link text link text link text</a> tiny</div>"
        "<p>Real content sentence that easily clears the minimum length bar.</p></body>"
    )
    out = extract_main_text(html)
    assert out == "Real content sentence that easily clears the minimum length bar."


def test_short_blocks_dropped_and_entities_decoded():
    html = "<body><p>short</p><p>Alpha &amp; Beta &quot;quoted&quot; content long enough here.</p></body>"
    assert extract_main_text(html) == 'Alpha & Beta "quoted" content long enough here.'


def test_multiple_blocks_join_with_newline():
    html = (
        "<body><h1>Heading line long enough to be kept here</h1>"
        "<p>First paragraph of content that is definitely long enough.</p>"
        "<p>Second paragraph of content that is also long enough to keep.</p></body>"
    )
    assert extract_main_text(html).split("\n") == [
        "Heading line long enough to be kept here",
        "First paragraph of content that is definitely long enough.",
        "Second paragraph of content that is also long enough to keep.",
    ]


def test_sniff_doc_kind():
    assert sniff_doc_kind(b"%PDF-1.4 junk") == "pdf"
    assert sniff_doc_kind(b"<!DOCTYPE html><html>") == "html"
    assert sniff_doc_kind(b"<HTML ><body>") == "html"
    assert sniff_doc_kind(b"plain words") == "text"
    assert sniff_doc_kind(b"") == "empty"
    assert sniff_doc_kind(None) == "empty"
