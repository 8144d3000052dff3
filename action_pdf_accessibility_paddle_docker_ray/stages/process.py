"""Per-page processing stage — the actor-pool boundary.

The reference recreates every model at each use site (layout per page,
formula per formula, table models per table — /root/reference/src/ai.py:72-79,
169-179, 279-308); here all per-worker state (model config, thresholds —
and, with real PaddleX models, the weights) is built ONCE per actor in
``__init__`` and reused across batches, exactly the actor-pool pattern the
``north_star`` mandates for GPU-pinned batched inference.  The deterministic
stub detector (``functions/sdoc.stub_detect``) stands in for the model; the
class boundary is where real weights would load.

Rows are processed per batch; each row is one page (or one whole HTML doc),
so batch size bounds peak memory regardless of source-document size.
"""

from __future__ import annotations

import json

import pyarrow as pa

from ..functions.html_strip import strip_html
from ..functions.labels import default_thresholds
from ..functions.template import process_page


class PageProcessor:
    """Callable-class stage for ``map_batches(..., concurrency=N)``."""

    def __init__(
        self,
        model: str = "PP-DocLayout-L",
        zoom: float = 2.0,
        thresholds: dict[int, float] | None = None,
        process_table: bool = True,
        process_formula: bool = True,
    ) -> None:
        # once-per-actor setup (the "model load")
        self.model = model
        self.zoom = zoom
        self.thresholds = dict(thresholds) if thresholds else default_thresholds(model)
        self.process_table = process_table
        self.process_formula = process_formula

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {
            "url": [], "created": [], "kind": [], "page_no": [], "n_pages": [],
            "status": [], "text": [], "elements_json": [], "formulas_json": [],
            "spans_json": [], "n_regions": [], "size_bucket": [],
        }
        for row in batch.to_pylist():
            kind = row["kind"]
            status, text, elements, formulas, spans, n_regions = "ok", "", [], [], [], 0
            if kind == "sdoc":
                try:
                    page = json.loads(row["payload"])
                    result = process_page(
                        page, row["page_no"], model=self.model,
                        thresholds=self.thresholds, zoom=self.zoom,
                        process_table=self.process_table,
                        process_formula=self.process_formula,
                    )
                    text = result["text"]
                    elements = result["elements"]
                    formulas = result["formulas"]
                    spans = result["spans"]
                    n_regions = result["n_regions"]
                except Exception as exc:  # noqa: BLE001 - error-status row
                    status = f"page_error:{type(exc).__name__}"
            elif kind == "html":
                result = strip_html(row["payload"])
                text = result["text"]
                spans = result["spans"]
                n_regions = len(result["spans"])
                status = result.get("status", "ok")
            elif kind == "error":
                status = row["payload"]
            # sdoc_empty: empty ok page

            out["url"].append(row["url"])
            out["created"].append(row["created"])
            out["kind"].append("sdoc" if kind == "sdoc_empty" else kind)
            out["page_no"].append(row["page_no"])
            out["n_pages"].append(row["n_pages"])
            out["status"].append(status)
            out["text"].append(text)
            out["elements_json"].append(json.dumps(elements, sort_keys=False))
            out["formulas_json"].append(json.dumps(formulas))
            out["spans_json"].append(json.dumps(spans, sort_keys=True))
            out["n_regions"].append(n_regions)
            out["size_bucket"].append(row["size_bucket"])

        return pa.table(
            {
                "url": pa.array(out["url"], pa.string()),
                "created": pa.array(out["created"], pa.string()),
                "kind": pa.array(out["kind"], pa.string()),
                "page_no": pa.array(out["page_no"], pa.int32()),
                "n_pages": pa.array(out["n_pages"], pa.int32()),
                "status": pa.array(out["status"], pa.string()),
                "text": pa.array(out["text"], pa.string()),
                "elements_json": pa.array(out["elements_json"], pa.string()),
                "formulas_json": pa.array(out["formulas_json"], pa.string()),
                "spans_json": pa.array(out["spans_json"], pa.string()),
                "n_regions": pa.array(out["n_regions"], pa.int32()),
                "size_bucket": pa.array(out["size_bucket"], pa.int32()),
            }
        )
