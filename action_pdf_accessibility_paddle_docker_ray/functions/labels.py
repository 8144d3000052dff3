"""23-class layout label vocabulary, thresholds and label→element mapping.

Reference semantics:
- class-id → threshold-knob order: /root/reference/src/main.py:429-453
- default thresholds (0.3 for ids 0,7,13,16,20; 0.5 otherwise):
  /root/reference/src/main.py:111-271
- clamp to [0.05, 0.95]: /root/reference/src/main.py:45-57, 429-453
- 17-class model prunes ids 17-22: /root/reference/src/ai.py:46-49
- label → template-element attributes: /root/reference/src/template_json.py:244-380
"""

from __future__ import annotations

# Class-id order exactly as the reference's threshold dictionary
# (/root/reference/src/main.py:429-453).
LAYOUT_CLASS_NAMES: tuple[str, ...] = (
    "paragraph_title",  # 0
    "image",            # 1
    "text",             # 2
    "number",           # 3
    "abstract",         # 4
    "content",          # 5
    "figure_title",     # 6
    "formula",          # 7
    "table",            # 8
    "table_title",      # 9
    "reference",        # 10
    "doc_title",        # 11
    "footnote",         # 12
    "header",           # 13
    "algorithm",        # 14
    "footer",           # 15
    "seal",             # 16
    "chart_title",      # 17
    "chart",            # 18
    "formula_number",   # 19
    "header_image",     # 20
    "footer_image",     # 21
    "aside_text",       # 22
)

LABEL_TO_CLASS_ID: dict[str, int] = {n: i for i, n in enumerate(LAYOUT_CLASS_NAMES)}

# ids with default threshold 0.3 (/root/reference/src/main.py:115,164,206,227,255)
_LOW_DEFAULT_IDS = {0, 7, 13, 16, 20}

SUPPORTED_MODELS = ("PP-DocLayout-L", "RT-DETR-H_layout_17cls")


def clamp(value: float, min_value: float = 0.05, max_value: float = 0.95) -> float:
    """/root/reference/src/main.py:45-57."""
    return max(min_value, min(max_value, value))


def default_thresholds(model: str = "PP-DocLayout-L") -> dict[int, float]:
    """Per-class-id score thresholds with the reference's defaults and 17cls prune."""
    th = {i: (0.3 if i in _LOW_DEFAULT_IDS else 0.5) for i in range(23)}
    th = {k: clamp(v) for k, v in th.items()}
    if model == "RT-DETR-H_layout_17cls":
        for key in range(17, 23):
            th.pop(key, None)
    return th


# label → static element attributes, transcribed from the 23-way match at
# /root/reference/src/template_json.py:244-380.  Dynamic parts (formula id,
# table cells, number header/footer flag) are handled by the caller.
_E = dict
ELEMENT_ATTRS: dict[str, dict[str, str]] = {
    "abstract": _E(flag="no_join|no_split", text_flag="no_new_line", type="pde_text"),
    "algorithm": _E(flag="no_join|no_split", text_flag="no_new_line", type="pde_text"),
    "aside_text": _E(flag="artifact|no_join|no_split", text_flag="no_new_line", type="pde_text"),
    "chart": _E(flag="no_join|no_split", type="pde_image"),
    "chart_title": _E(tag="Caption", flag="no_join|no_split", text_flag="no_new_line", type="pde_text"),
    "content": _E(flag="no_join|no_split", text_flag="no_new_line", type="pde_text"),
    "doc_title": _E(tag="Title", flag="no_join|no_split", text_flag="no_new_line", type="pde_text"),
    "figure_title": _E(tag="Caption", flag="no_join|no_split", text_flag="no_new_line", type="pde_text"),
    "footer": _E(flag="footer|artifact|no_join|no_split", text_flag="no_new_line", type="pde_text"),
    "footer_image": _E(flag="footer|artifact|no_join|no_split", type="pde_image"),
    "footnote": _E(flag="no_join|no_split", text_flag="no_new_line", type="pde_text"),
    "formula": _E(tag="Formula", flag="no_join|no_split", type="pde_image"),
    "formula_number": _E(flag="no_join|no_split", text_flag="no_new_line", type="pde_text"),
    "header": _E(flag="header|artifact|no_join|no_split", text_flag="no_new_line", type="pde_text"),
    "header_image": _E(flag="header|artifact|no_join|no_split", type="pde_image"),
    "image": _E(flag="no_join|no_split", type="pde_image"),
    "paragraph_title": _E(heading="h1", flag="no_join|no_split", text_flag="no_new_line", type="pde_text"),
    "reference": _E(flag="no_join|no_split", text_flag="no_new_line", type="pde_text"),
    "seal": _E(flag="artifact|no_join|no_split", type="pde_image"),
    "table": _E(flag="no_join|no_split", type="pde_table"),
    "table_title": _E(tag="Caption", flag="no_join|no_split", text_flag="no_new_line", type="pde_text"),
    "text": _E(flag="no_join|no_split", text_flag="no_new_line", type="pde_text"),
}

# unknown label fallback (/root/reference/src/template_json.py:377-380)
DEFAULT_ATTRS: dict[str, str] = _E(flag="no_join|no_split", text_flag="no_new_line", type="pde_text")


def element_attrs(label: str) -> dict[str, str]:
    """Static attributes for a (lower-cased) layout label."""
    return ELEMENT_ATTRS.get(label, DEFAULT_ATTRS)


def is_artifact(label: str) -> bool:
    """True when the element's flag marks it an artifact (excluded from text).

    ``number`` gets a dynamic ``{header|footer}|artifact|...`` flag
    (/root/reference/src/template_json.py:328-332) — always an artifact.
    """
    if label == "number":
        return True
    return "artifact" in element_attrs(label)["flag"]
