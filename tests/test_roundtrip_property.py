"""Property: the HTML wrap → boilerplate-strip round-trip recovers any text
byte-exactly (the invariant the ``html_extract`` SQL oracle relies on)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from action_pdf_accessibility_paddle_docker_ray.functions.html_strip import strip_html
from action_pdf_accessibility_paddle_docker_ray.pipelines.text_ops import (
    wrap_document_html,
)

# printable-ascii lines (the documents table's alphabet), incl. HTML-special
# characters that must survive escaping
_line = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=80
)


@settings(max_examples=80, deadline=None)
@given(st.lists(_line, min_size=1, max_size=12))
def test_wrap_strip_roundtrip(lines):
    text = "\n".join(lines)
    out = strip_html(wrap_document_html(7, text))
    assert out["text"] == text


@settings(max_examples=30, deadline=None)
@given(st.text(max_size=200))
def test_wrap_strip_roundtrip_unicode_no_newline(body):
    body = body.replace("\n", " ").replace("\r", " ")
    out = strip_html(wrap_document_html(0, body))
    assert out["text"] == body
