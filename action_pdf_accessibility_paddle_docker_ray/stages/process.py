"""Per-page / per-doc processing stages — the actor-pool boundary.

Two stage classes:

- ``DocProcessor`` (colocate path, default): consumes raw (url, warc_ts,
  html) rows — each row is a whole document — and emits finished doc rows
  by calling the golden oracle's own per-doc kernel
  (``oracle.extract_row``).  No intermediate serialization, no output
  shuffle; the unit of parallelism is the document (bounded by the largest
  doc's page count — a 400-page %SDOC costs ~0.7 s with the stub
  detector, and a real model pool batches pages internally).
- ``PageProcessor`` (page-parallel sort path): consumes fan-out page rows
  so a single huge document's pages spread across the whole pool; requires
  the per-url sort exchange afterwards to reassemble.

The reference recreates every model at each use site (layout per page,
formula per formula, table models per table — /root/reference/src/ai.py:72-79,
169-179, 279-308); here all per-worker state (model config, thresholds —
and, with real PaddleX models, the weights) is built ONCE per actor in
``__init__`` and reused across batches, exactly the actor-pool pattern the
``north_star`` mandates for GPU-pinned batched inference.  The deterministic
stub detector (``functions/sdoc.stub_detect``) stands in for the model; the
class boundary is where real weights would load.
"""

from __future__ import annotations

import json

import pyarrow as pa

from ..functions.html_strip import strip_html
from ..functions.labels import default_thresholds
from ..functions.template import process_page


class DocProcessor:
    """Whole-doc actor stage: (url, warc_ts, html) rows → finished doc rows."""

    def __init__(
        self,
        model: str = "PP-DocLayout-L",
        zoom: float = 2.0,
        thresholds: dict[int, float] | None = None,
        process_table: bool = True,
        process_formula: bool = True,
        output: str = "json",
    ) -> None:
        from ..functions.labels import default_thresholds

        self.model = model
        self.zoom = zoom
        self.thresholds = dict(thresholds) if thresholds else default_thresholds(model)
        self.process_table = process_table
        self.process_formula = process_formula
        # "json": the public docs contract (spans_json/formulas_json strings,
        # byte-identical to oracle.docs_to_table).  "nested": native Arrow
        # list<struct> spans/formulas for downstream zero-copy explodes.
        self.output = output

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.spans_codec import formulas_to_arrow, spans_to_arrow
        from ..oracle import extract_row
        from .fanout import size_bucket

        nested = self.output == "nested"
        out: dict[str, list] = {
            "url": [], "text": [], "n_pages": [], "n_regions": [], "status": [],
            "template_json": [], "spans": [], "formulas": [],
            "size_bucket": [],
        }
        for url, ts, html in zip(
            batch.column("url").to_pylist(),
            batch.column("warc_ts").to_pylist(),
            batch.column("html").to_pylist(),
        ):
            doc = extract_row(
                {"url": url, "warc_ts": ts, "html": html},
                model=self.model, zoom=self.zoom, thresholds=self.thresholds,
                process_table=self.process_table,
                process_formula=self.process_formula,
            )
            out["url"].append(doc["url"])
            out["text"].append(doc["text"])
            out["n_pages"].append(doc["n_pages"])
            out["n_regions"].append(doc["n_regions"])
            out["status"].append(doc["status"])
            out["template_json"].append(doc["template_json"])
            if nested:
                out["spans"].append(doc["spans"])
                out["formulas"].append(doc["formulas"])
            else:
                out["spans"].append(json.dumps(doc["spans"], sort_keys=True))
                out["formulas"].append(json.dumps(doc["formulas"], sort_keys=True))
            out["size_bucket"].append(size_bucket(len(html)))
        if nested:
            spans_col = spans_to_arrow(out["spans"])
            formulas_col = formulas_to_arrow(out["formulas"])
            span_names = ("spans", "formulas")
        else:
            spans_col = pa.array(out["spans"], pa.string())
            formulas_col = pa.array(out["formulas"], pa.string())
            span_names = ("spans_json", "formulas_json")
        return pa.table(
            {
                "url": pa.array(out["url"], pa.string()),
                "text": pa.array(out["text"], pa.string()),
                "n_pages": pa.array(out["n_pages"], pa.int32()),
                "n_regions": pa.array(out["n_regions"], pa.int32()),
                "status": pa.array(out["status"], pa.string()),
                "template_json": pa.array(out["template_json"], pa.string()),
                span_names[0]: spans_col,
                span_names[1]: formulas_col,
                "size_bucket": pa.array(out["size_bucket"], pa.int32()),
            }
        )


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
        from ..functions.spans_codec import formulas_to_arrow, spans_to_arrow

        out: dict[str, list] = {
            "url": [], "created": [], "kind": [], "page_no": [], "n_pages": [],
            "status": [], "text": [], "elements_json": [], "formulas": [],
            "spans": [], "n_regions": [], "size_bucket": [],
            "warc_ts_us": [], "content_key": [],
        }
        for row in batch.to_pylist():
            kind = row["kind"]
            status, text, elements, formulas, spans, n_regions = "ok", "", [], [], [], 0
            if kind == "sdoc":
                try:
                    page = json.loads(row["payload"])
                    # 1-based page numbering in templates/ids (reference
                    # autotag.py:191); row page_no stays the 0-based sort key
                    result = process_page(
                        page, row["page_no"] + 1, model=self.model,
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
            out["kind"].append(kind)
            out["page_no"].append(row["page_no"])
            out["n_pages"].append(row["n_pages"])
            out["status"].append(status)
            out["text"].append(text)
            # elements stay JSON (recursive template trees are not
            # struct-able); spans/formulas ride as native Arrow list<struct>
            out["elements_json"].append(json.dumps(elements, sort_keys=False))
            out["formulas"].append(formulas)
            out["spans"].append(spans)
            out["n_regions"].append(n_regions)
            out["size_bucket"].append(row["size_bucket"])
            out["warc_ts_us"].append(row["warc_ts_us"])
            out["content_key"].append(row["content_key"])

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
                "formulas": formulas_to_arrow(out["formulas"]),
                "spans": spans_to_arrow(out["spans"]),
                "n_regions": pa.array(out["n_regions"], pa.int32()),
                "size_bucket": pa.array(out["size_bucket"], pa.int32()),
                "warc_ts_us": pa.array(out["warc_ts_us"], pa.int64()),
                "content_key": pa.array(out["content_key"], pa.string()),
            }
        )
