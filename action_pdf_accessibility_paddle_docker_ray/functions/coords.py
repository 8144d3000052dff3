"""Device-pixel ↔ PDF-page coordinate conversion with the reference's rounding.

Reference semantics:
- device rect → page rect via ``PdfPageView.RectToPage`` after integer
  snapping: elements use floor(min)/ceil(max)
  (/root/reference/src/template_json.py:233-239), table cells use the
  *reversed* ceil(min)/floor(max) (/root/reference/src/template_json.py:415-422).
- page bbox serialized as four *strings* [left, bottom, right, top]
  (/root/reference/src/template_json.py:239).
- ``number`` header/footer classification compares the page-coord top edge
  against half the *device* height (a reference quirk we reproduce):
  /root/reference/src/template_json.py:440-453.

The affine itself (our deterministic definition of ``RectToPage`` for an
unrotated page rendered at ``zoom``): ``page_x = dev_x / zoom``,
``page_y = (device_height - dev_y) / zoom`` (device y grows down, page y up).
"""

from __future__ import annotations

import math


def dev_rect_to_page(
    left: int, top: int, right: int, bottom: int, zoom: float, device_height: int
) -> tuple[float, float, float, float]:
    """Integer device rect (y-down) → float page rect (left, bottom, right, top), y-up."""
    page_left = left / zoom
    page_right = right / zoom
    page_top = (device_height - top) / zoom
    page_bottom = (device_height - bottom) / zoom
    return page_left, page_bottom, page_right, page_top


def element_bbox(
    coordinate: list | tuple, zoom: float, device_height: int
) -> tuple[float, float, float, float]:
    """Element snapping: floor mins / ceil maxes, then to page coords."""
    left = math.floor(coordinate[0])
    top = math.floor(coordinate[1])
    right = math.ceil(coordinate[2])
    bottom = math.ceil(coordinate[3])
    return dev_rect_to_page(left, top, right, bottom, zoom, device_height)


def cell_bbox(
    coordinate: list | tuple, zoom: float, device_height: int
) -> tuple[float, float, float, float]:
    """Cell snapping: ceil mins / floor maxes (reversed vs elements), then to page."""
    left = math.ceil(coordinate[0])
    top = math.ceil(coordinate[1])
    right = math.floor(coordinate[2])
    bottom = math.floor(coordinate[3])
    return dev_rect_to_page(left, top, right, bottom, zoom, device_height)


def bbox_strings(page_rect: tuple[float, float, float, float]) -> list[str]:
    """Serialize (left, bottom, right, top) as the four-string bbox."""
    return [str(v) for v in page_rect]


def number_region_flag(page_rect_top: float, device_height: int) -> str:
    """'footer' or 'header' for a ``number`` region.

    Faithful to the reference quirk: the page-coordinate top edge is compared
    to ``device_height / 2`` (device px, not page points) —
    /root/reference/src/template_json.py:440-453.
    """
    return "footer" if page_rect_top < device_height / 2 else "header"
