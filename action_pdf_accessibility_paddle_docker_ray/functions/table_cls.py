"""Wired/wireless table classification seam.

The reference runs TWO models per table region: a classifier
(``PP-LCNet_x1_0_table_cls``) whose result picks one of two cell-detection
models (``RT-DETR-L_wired_table_cell_det`` / ``RT-DETR-L_wireless_table_cell_det``),
then the chosen model detects the cells
(/root/reference/src/ai.py:279-333).  Round 1 had no seam for this
decision — cell boxes were taken straight from the corpus — so real models
could not drop in without restructuring.  This module is that seam:

- ``use_wired_model`` reproduces the reference's exact (and slightly
  quirky) decision table: when the top score wins, trust
  ``label_names[0] == "wired_table"``; otherwise trust
  ``label_names[0] == "wireless_table"`` (/root/reference/src/ai.py:320-333).
- ``TableCellDetector`` is the two-model boundary: ``classify`` and
  ``_detect_wired`` / ``_detect_wireless`` are where the PaddleX models
  would load (per actor, in ``__init__``); the sandbox stubs are
  deterministic (classification from the cell-grid shape; detection
  returns the corpus truth boxes) so the surrounding plumbing — decision,
  model naming, per-region flow — is real and byte-identity-tested.
"""

from __future__ import annotations

TABLE_CLS_MODEL = "PP-LCNet_x1_0_table_cls"
WIRED_CELL_MODEL = "RT-DETR-L_wired_table_cell_det"
WIRELESS_CELL_MODEL = "RT-DETR-L_wireless_table_cell_det"


def use_wired_model(result: dict) -> bool:
    """Exact decision table of /root/reference/src/ai.py:320-333."""
    if result["scores"][0] > result["scores"][1]:
        return result["label_names"][0] == "wired_table"
    return result["label_names"][0] == "wireless_table"


def cell_model_name(result: dict) -> str:
    """/root/reference/src/ai.py:294-297: classification → model choice."""
    return WIRED_CELL_MODEL if use_wired_model(result) else WIRELESS_CELL_MODEL


class TableCellDetector:
    """Two-model table-cell boundary (classify → choose → detect).

    ``model_dir`` is where real PaddleX weights would resolve
    (/root/reference/src/ai.py:281-301 loads both models from
    ``models/<name>``); the stub needs none.
    """

    def __init__(self, model_dir: str | None = None) -> None:
        self.model_dir = model_dir
        # real engine: create_model(TABLE_CLS_MODEL, ...) + both cell models

    def classify(self, region: dict) -> dict:
        """STUB classifier: deterministic from the region's cell grid —
        a region with ≥ 4 detected cell boxes behaves like a ruled (wired)
        table.  Returns the PaddleX-shaped result dict the decision table
        consumes."""
        n = len(region.get("cell_boxes") or [])
        wired = n >= 4
        return {
            "label_names": ["wired_table", "wireless_table"],
            "scores": [0.9, 0.1] if wired else [0.1, 0.9],
        }

    def _detect_wired(self, region: dict) -> list:
        """STUB for ``RT-DETR-L_wired_table_cell_det``: corpus truth boxes."""
        return region.get("cell_boxes") or []

    def _detect_wireless(self, region: dict) -> list:
        """STUB for ``RT-DETR-L_wireless_table_cell_det``: corpus truth boxes."""
        return region.get("cell_boxes") or []

    def detect_cells(self, region: dict) -> tuple[str, list]:
        """classify → pick the cell model → run it.

        Returns (chosen model name, cell boxes) — the reference flow of
        ai.py:279-317 with the two model invocations stubbed."""
        model = cell_model_name(self.classify(region))
        cells = (
            self._detect_wired(region)
            if model == WIRED_CELL_MODEL
            else self._detect_wireless(region)
        )
        return model, cells
