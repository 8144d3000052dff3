"""Per-page element creation, reading order, text extraction, doc assembly.

The shared core used both by the single-process golden oracle
(``oracle.py``) and the Ray pipeline stages (``stages/``) — what the test
suite proves equivalent is the *orchestration*, these kernels are identical
by construction.

Reference semantics mirrored here:
- per-page flow: layout boxes → table/formula sub-models → overlap
  resolution (/root/reference/src/ai.py:51-157);
- element creation with floor/ceil snapping, string bboxes, comment,
  per-label attributes and key order
  (/root/reference/src/template_json.py:219-382);
- formula-inside-text nesting (/root/reference/src/template_json.py:165-192);
- reading-order sort on *string* bbox values:
  ``key=(float(bbox[3]), 1000.0 - float(bbox[0])), reverse=True``
  (/root/reference/src/template_json.py:194);
- table cell elements with reversed snapping
  (/root/reference/src/template_json.py:384-426);
- page / document template dicts (/root/reference/src/template_json.py:35-98);
- formula-id ↔ element join with pop semantics
  (/root/reference/src/autotag.py:262-295).

Text extraction is ours (the reference delegates it to the proprietary
PDFix SDK): per non-artifact text-bearing element, glyph runs intersecting
the region in (y, x) order; elements joined with "\\n" per page, pages with
"\\f" per document.
"""

from __future__ import annotations

import json

from . import coords as C
from .boxes import find_overlapping_indices, resolve_overlaps
from .fnv import K_PDE_IMAGE, region_unique_id
from .labels import default_thresholds, element_attrs
from .mathml import latex_to_mathml
from .sdoc import BASE_ZOOM, GlyphIndex, stub_detect
from .table_cls import TableCellDetector
from .table_grid import infer_table_grid

ENGINE_VERSION = "0.1.0"

# our span-id extension: PDFix public PdfElementType enum values per element type
_TYPE_CODES = {"pde_text": 1, "pde_image": 5, "pde_cell": 12, "pde_table": 13}


def _convert_box_to_element(
    box: dict, page_number: int, zoom: float, device_height: int, formulas: list
) -> dict:
    """One detection box → one template element (reference key order)."""
    element: dict = {}
    coordinate = box["coordinate"]
    page_rect = C.element_bbox(coordinate, zoom, device_height)
    element["bbox"] = C.bbox_strings(page_rect)
    label = box["label"].lower()
    element["comment"] = f"{label} {round(box['score'] * 100)}%"

    if label == "formula":
        if "custom" in box:
            formula_id = region_unique_id(page_number, K_PDE_IMAGE, coordinate)
            formulas.append((formula_id, box["custom"]))
            element["id"] = str(formula_id)
        element.update(element_attrs(label))
    elif label == "number":
        flag = C.number_region_flag(page_rect[3], device_height)
        element["flag"] = f"{flag}|artifact|no_join|no_split"
        element["text_flag"] = "no_new_line"
        element["type"] = "pde_text"
    elif label == "table":
        if "custom" in box:
            cell_elements = _create_table_cells(box["custom"], zoom, device_height)
            element["element_template"] = {
                "template": {
                    "element_create": [
                        {"elements": cell_elements, "query": {}, "statement": "$if"}
                    ],
                    "table_update": [{"cell_header": "true", "statement": "$if"}],
                },
            }
            element["row_num"] = box["custom"]["rows"]
            element["col_num"] = box["custom"]["columns"]
        element["flag"] = "no_join|no_split"
        element["type"] = "pde_table"
    else:
        element.update(element_attrs(label))
    return element


def _create_table_cells(table_result: dict, zoom: float, device_height: int) -> list:
    """Table cells → pde_cell elements (/root/reference/src/template_json.py:384-426)."""
    cells = []
    for cell in table_result["cells"]:
        pos = f"[{cell['row']}, {cell['column']}]"
        span = f"[{cell['row_span']}, {cell['column_span']}]"
        create_cell = {
            "cell_column": str(cell["column"]),
            "cell_column_span": str(cell["column_span"]),
            "cell_row": str(cell["row"]),
            "cell_row_span": str(cell["row_span"]),
            "comment": f"Cell Pos: {pos} Span: {span}",
            "type": "pde_cell",
        }
        if "bbox" in cell:
            create_cell["bbox"] = C.bbox_strings(C.cell_bbox(cell["bbox"], zoom, device_height))
        cells.append(create_cell)
    return cells


def process_page(
    page: dict,
    page_number: int,
    *,
    model: str = "PP-DocLayout-L",
    thresholds: dict[int, float] | None = None,
    zoom: float = 2.0,
    process_table: bool = True,
    process_formula: bool = True,
) -> dict:
    """Full per-page processing: detect → sub-models → resolve → elements → text.

    Returns ``{"elements", "formulas", "spans", "text", "n_regions"}`` where
    ``elements`` is the reading-order-sorted template element list and
    ``spans`` are flat span rows (page coords) for the output table.
    """
    if thresholds is None:
        thresholds = default_thresholds(model)
    device_height = round(page["height"] * zoom)
    scale = zoom / BASE_ZOOM
    glyphs = GlyphIndex(page.get("glyph_runs", []), scale)  # built once per page

    boxes = stub_detect(page, model, thresholds, zoom)

    # table / formula sub-models (/root/reference/src/ai.py:105-148); tables
    # route through the wired/wireless two-model seam (ai.py:279-333) —
    # stubbed detectors return the corpus truth boxes, so output is
    # unchanged while real cell models have a drop-in boundary
    table_detector = TableCellDetector()
    for box in boxes:
        if box["label"] == "table" and process_table:
            _model, cells = table_detector.detect_cells(box)
            box["custom"] = infer_table_grid(cells, box["coordinate"])
        elif box["label"] == "formula" and process_formula:
            mathml = latex_to_mathml(box.get("latex", ""))
            if mathml != "":
                box["custom"] = mathml

    # overlap resolution (/root/reference/src/ai.py:150-151)
    keep = resolve_overlaps([b["score"] for b in boxes], [b["coordinate"] for b in boxes])
    boxes = [boxes[i] for i in keep]
    coords_kept = [b["coordinate"] for b in boxes]

    # element creation + formula nesting (/root/reference/src/template_json.py:146-196)
    formulas: list[tuple[int, str]] = []
    wrappers: list[dict] = []
    for i, box in enumerate(boxes):
        overlap_idx = find_overlapping_indices(coords_kept, i)
        text_overlaps = [j for j in overlap_idx if boxes[j]["label"] == "text"]
        if box["label"] == "formula" and text_overlaps:
            continue  # will be nested under the overlapping text element
        element = _convert_box_to_element(box, page_number, zoom, device_height, formulas)
        nested: list[dict] = []
        formula_overlaps = [j for j in overlap_idx if boxes[j]["label"] == "formula"]
        if box["label"] == "text" and formula_overlaps:
            formula_elements = []
            for j in formula_overlaps:
                formula_elements.append(
                    _convert_box_to_element(boxes[j], page_number, zoom, device_height, formulas)
                )
                nested.append(boxes[j])
            element["element_template"] = {
                "template": {
                    "element_create": [{"elements": formula_elements, "statement": "$if"}],
                },
            }
        wrappers.append({"element": element, "box": box, "nested": nested})

    wrappers.sort(
        key=lambda w: (float(w["element"]["bbox"][3]), 1000.0 - float(w["element"]["bbox"][0])),
        reverse=True,
    )

    # spans + text (our extraction, replacing PDFix AddTags)
    spans: list[dict] = []
    page_texts: list[str] = []
    order = 0
    for w in wrappers:
        box, element = w["box"], w["element"]
        label = box["label"].lower()
        etype = element["type"]
        artifact = "artifact" in element.get("flag", "")
        text = ""
        if etype in ("pde_text", "pde_table"):
            text = glyphs.region_text(box["coordinate"])
            if not artifact:
                page_texts.append(text)
        spans.append(_span_row(box, element, page_number, order, zoom, device_height, text))
        order += 1
        for nested_box in w["nested"]:
            nested_el = {"type": "pde_image", "flag": "no_join|no_split"}
            spans.append(
                _span_row(nested_box, nested_el, page_number, order, zoom, device_height, "")
            )
            order += 1

    return {
        "elements": [w["element"] for w in wrappers],
        "formulas": formulas,
        "spans": spans,
        "text": "\n".join(page_texts),
        "n_regions": len(wrappers),
    }


def _span_row(
    box: dict, element: dict, page_number: int, order: int, zoom: float,
    device_height: int, text: str,
) -> dict:
    page_rect = C.element_bbox(box["coordinate"], zoom, device_height)
    type_code = _TYPE_CODES.get(element["type"], 0)
    table = box.get("custom") if box["label"] == "table" else None
    return {
        "page_no": page_number,
        "region_id": region_unique_id(page_number, type_code, box["coordinate"]),
        "label": box["label"].lower(),
        "score": float(box["score"]),
        "x0": page_rect[0],
        "y0": page_rect[1],
        "x1": page_rect[2],
        "y1": page_rect[3],
        "reading_order": order,
        "text": text,
        "table_json": json.dumps(table, sort_keys=True) if isinstance(table, dict) else None,
        "mathml": box.get("custom") if box["label"] == "formula" else None,
    }


def page_template(elements: list, page_number: int) -> dict:
    """/root/reference/src/template_json.py:88-98."""
    return {
        "comment": f"Page {page_number}",
        "elements": elements,
        "query": {"$and": [{"$page_num": page_number}]},
        "statement": "$if",
    }


def document_template(
    page_templates: list, model: str, zoom: float, created: str
) -> dict:
    """/root/reference/src/template_json.py:35-73 (deterministic ``created``
    date — we use the row's warc_ts date instead of wall-clock today)."""
    image_info = f"transforms in this docker image of version {ENGINE_VERSION}"
    metadata = {
        "author": f"Generated using PaddleX AI {ENGINE_VERSION}",
        "created": created,
        "modified": created,
        "notes": f"Created using PaddleX layout model: {model}, PDFix SDK and {image_info} with zoom: {zoom}",
        "sdk_version": ENGINE_VERSION,
        "version": "1",
    }
    page_map = [
        {
            "graphic_table_detect": "0",
            "statement": "$if",
            "text_table_detect": "0",
            "label_image_detect": "0",
            "label_word_detect": "0",
        }
    ]
    return {
        "metadata": metadata,
        "template": {"element_create": page_templates, "pagemap": page_map},
    }


def _walk_formula_ids(elements: list) -> list[str]:
    """Formula element ids in tree order (mirrors browse_tags_recursive over
    'Formula', /root/reference/src/utils_sdk.py:61-97 — matches do not
    descend)."""
    out: list[str] = []
    for el in elements:
        if el.get("tag") == "Formula":
            if el.get("id", "") != "":
                out.append(el["id"])
            continue
        tmpl = el.get("element_template", {}).get("template", {})
        for create in tmpl.get("element_create", []):
            out.extend(_walk_formula_ids(create.get("elements", [])))
    return out


def join_formulas(page_templates: list, formulas: list[tuple[int, str]]) -> list[dict]:
    """Match Formula element ids against collected (id, mathml) pairs.

    Pop-on-match semantics as in /root/reference/src/autotag.py:283-295:
    each collected formula is consumed at most once; elements without data
    are skipped.  Returns ``[{"formula_id", "mathml"}, ...]``.
    """
    pool = list(formulas)
    out: list[dict] = []
    for pt in page_templates:
        for element_id in _walk_formula_ids(pt.get("elements", [])):
            idx = next((i for i, d in enumerate(pool) if str(d[0]) == element_id), -1)
            if idx < 0:
                continue
            fid, mathml = pool.pop(idx)
            out.append({"formula_id": fid, "mathml": mathml})
    return out
