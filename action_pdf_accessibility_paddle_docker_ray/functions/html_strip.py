"""DOM-tree HTML boilerplate stripping (densitometric main-content extraction).

The HTML arm mandated by ``BASELINE.json:north_star`` (not present in the
reference, which only handles PDFs): parse the ``html:binary`` payload into a
block tree and classify each block as content vs boilerplate using the
publicly documented Boilerpipe / jusText-style heuristics:

- *container rules*: subtrees under ``script/style/noscript/template/iframe/
  svg/form/button/select`` are dropped outright; blocks under
  ``nav/header/footer/aside`` are boilerplate; blocks under ``article`` or
  ``main`` are always content (readability main-container rule).
- *density rules* (for blocks outside any decisive container):
  ``link_density = linked_chars / chars``; a block is boilerplate when it is
  empty, when ``link_density >= 0.5``, or when it is short (<25 chars) with
  any links at all.

Blocks carry labels from the same 23-class vocabulary as the PDF arm
(``doc_title``, ``paragraph_title``, ``text``, ``table``, ``image``,
``figure_title``, ``table_title``, ``algorithm``) so the output span schema is
uniform across arms.

Determinism: stdlib ``html.parser`` only (no lxml in this sandbox), entity
decoding via ``convert_charrefs=True``; block text is the verbatim
concatenation of its text nodes (no whitespace normalization), so extraction
round-trips byte-exactly for synthesized pages.
"""

from __future__ import annotations

from html.parser import HTMLParser

DROP_TAGS = frozenset(
    {"script", "style", "noscript", "template", "iframe", "svg", "form", "button", "select", "option"}
)
BOILER_CONTAINERS = frozenset({"nav", "header", "footer", "aside"})
MAIN_CONTAINERS = frozenset({"article", "main"})
_HEADINGS = {"h1": "doc_title", "h2": "paragraph_title", "h3": "paragraph_title",
             "h4": "paragraph_title", "h5": "paragraph_title", "h6": "paragraph_title"}
_BLOCK_LEAF_LABELS = {
    "p": "text",
    "li": "text",
    "figcaption": "figure_title",
    "caption": "table_title",
    "pre": "algorithm",
    "blockquote": "text",
    **_HEADINGS,
}

LINK_DENSITY_MAX = 0.5
SHORT_BLOCK_CHARS = 25
SHORT_BLOCK_LINK_DENSITY_MAX = 0.2


class _Block:
    __slots__ = ("label", "parts", "link_len", "tag_count", "in_main", "in_boiler")

    def __init__(self, label: str, in_main: bool, in_boiler: bool) -> None:
        self.label = label
        self.parts: list[str] = []
        self.link_len = 0
        self.tag_count = 0
        self.in_main = in_main
        self.in_boiler = in_boiler

    @property
    def text(self) -> str:
        return "".join(self.parts)


class _StripParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[dict] = []
        self._drop_depth = 0
        self._boiler_depth = 0
        self._main_depth = 0
        self._link_depth = 0
        self._block_stack: list[_Block] = []
        self._table_stack: list[_Block] = []

    # -- helpers ---------------------------------------------------------
    def _open_block(self, label: str) -> None:
        self._block_stack.append(
            _Block(label, self._main_depth > 0, self._boiler_depth > 0)
        )

    def _finalize(self, block: _Block) -> None:
        text = block.text
        chars = len(text.strip())
        link_density = (block.link_len / chars) if chars else 0.0
        if block.in_boiler:
            boiler = True
        elif block.in_main:
            boiler = False
        elif chars == 0:
            boiler = True
        elif link_density >= LINK_DENSITY_MAX:
            boiler = True
        elif chars < SHORT_BLOCK_CHARS and link_density > SHORT_BLOCK_LINK_DENSITY_MAX:
            boiler = True
        else:
            boiler = False
        self.blocks.append(
            {
                "label": block.label,
                "text": text,
                "link_density": round(link_density, 6),
                "tag_count": block.tag_count,
                "boiler": boiler,
            }
        )

    def _close_innermost_if(self, labels: tuple[str, ...]) -> None:
        if self._block_stack and self._block_stack[-1].label in labels:
            self._finalize(self._block_stack.pop())

    # -- parser events ---------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in DROP_TAGS:
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag in BOILER_CONTAINERS:
            self._boiler_depth += 1
            return
        if tag in MAIN_CONTAINERS:
            self._main_depth += 1
            return
        if tag == "table":
            block = _Block("table", self._main_depth > 0, self._boiler_depth > 0)
            self._table_stack.append(block)
            return
        if tag in ("td", "th", "tr") and self._table_stack:
            return  # cell text routed to the table block via handle_data
        if tag in _BLOCK_LEAF_LABELS:
            # unclosed <p>/<li> auto-close when a sibling block opens
            self._close_innermost_if(("p", "li"))
            self._open_block(_BLOCK_LEAF_LABELS[tag])
            return
        if tag == "img":
            self.blocks.append(
                {"label": "image", "text": "", "link_density": 0.0,
                 "tag_count": 0, "boiler": self._boiler_depth > 0 and self._main_depth == 0}
            )
            return
        if tag == "a":
            self._link_depth += 1
        if self._block_stack:
            self._block_stack[-1].tag_count += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in DROP_TAGS:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if self._drop_depth:
            return
        if tag in BOILER_CONTAINERS:
            self._boiler_depth = max(0, self._boiler_depth - 1)
            return
        if tag in MAIN_CONTAINERS:
            self._main_depth = max(0, self._main_depth - 1)
            return
        if tag == "table" and self._table_stack:
            block = self._table_stack.pop()
            block.parts = [("\n".join(p for p in "".join(block.parts).split("\x00") if p.strip()))]
            self._finalize(block)
            return
        if tag == "tr" and self._table_stack:
            self._table_stack[-1].parts.append("\x00")
            return
        if tag in ("td", "th") and self._table_stack:
            self._table_stack[-1].parts.append("\t")
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
            return
        if tag in _BLOCK_LEAF_LABELS:
            self._close_innermost_if((_BLOCK_LEAF_LABELS[tag],) + (("text",) if tag in ("p", "li", "blockquote") else ()))

    def handle_data(self, data: str) -> None:
        if self._drop_depth or not data:
            return
        if self._table_stack and not self._block_stack:
            self._table_stack[-1].parts.append(data)
            if self._link_depth:
                self._table_stack[-1].link_len += len(data.strip())
            return
        if self._block_stack:
            block = self._block_stack[-1]
            block.parts.append(data)
            if self._link_depth:
                block.link_len += len(data.strip())

    def close(self) -> None:  # flush unclosed blocks
        super().close()
        while self._block_stack:
            self._finalize(self._block_stack.pop())
        while self._table_stack:
            self._finalize(self._table_stack.pop())


def strip_html(html: str) -> dict:
    """Extract main content from an HTML document.

    Returns ``{"text": str, "spans": [ {label, text, link_density, boiler,
    reading_order}, ... ]}`` where ``text`` is the newline-join of non-boiler
    block texts in document order.
    """
    parser = _StripParser()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        return {"text": "", "spans": [], "status": "parse_error"}
    spans = []
    kept_texts = []
    order = 0
    for block in parser.blocks:
        span = dict(block)
        span["reading_order"] = order
        order += 1
        spans.append(span)
        if not block["boiler"] and block["label"] != "image":
            kept_texts.append(block["text"])
    return {"text": "\n".join(kept_texts), "spans": spans, "status": "ok"}
