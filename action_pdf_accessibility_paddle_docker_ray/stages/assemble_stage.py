"""Per-url document assembly — the single all-to-all of the extraction job.

The shuffle carries only extracted text / element JSON / span rows (page
payloads and any image-like data were dropped upstream), so the exchange
volume is output-sized, not input-sized.

Implemented as ``sort("url")`` + a BLOCK-level ``map_batches`` rather than
``groupby(url).map_groups``: Ray's own ``map_groups`` is exactly
sort + whole-block batches, but dispatches the UDF once per group with a
per-group block→batch conversion — measured ~13 ms/group of overhead.
Splitting the groups ourselves with numpy boundary detection brings
per-doc cost down to the real assembly work.  The sort gives the same
group-containment guarantee ``map_groups`` relies on.

LATE DEDUP happens here: all crawls of a url land in one group, so the
freshest crawl (max (warc_ts, content_key) — matching
``oracle.dedup_latest``) is selected now; the raw payload never took a
dedup shuffle, stale duplicates just wasted their (rare) page-processing
compute.  Exact duplicate rows collapse via the page_no dedup.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from ..functions.assemble import assemble_document
from ..functions.spans_codec import restore_span

_COLS = (
    "url", "created", "kind", "page_no", "status", "text", "elements_json",
    "formulas", "spans", "n_regions", "size_bucket",
    "warc_ts_us", "content_key",
)


def _cell_items(v) -> list:
    """Nested-column pandas cell → list (arrow list<struct> converts to a
    numpy object array of dicts; nulls convert to None)."""
    if v is None:
        return []
    return list(v)


def make_assemble_block(model: str, zoom: float):
    """Block-level assembly fn (use after ``sort('url')``, batch_size=None)."""

    def assemble_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {c: [] for c in ("url", "text", "n_pages", "n_regions", "status",
                                  "template_json", "spans_json", "formulas_json",
                                  "size_bucket")}
            )
        df = df.sort_values(["url", "page_no"], kind="mergesort")
        col = {c: df[c].to_numpy() for c in _COLS}
        urls = col["url"]
        starts = np.flatnonzero(np.r_[True, urls[1:] != urls[:-1]])
        ends = np.r_[starts[1:], len(urls)]

        out: dict[str, list] = {
            "url": [], "text": [], "n_pages": [], "n_regions": [], "status": [],
            "template_json": [], "spans_json": [], "formulas_json": [],
            "size_bucket": [],
        }
        for s, e in zip(starts, ends):
            # late dedup: winner crawl = max (warc_ts_us, content_key)
            ts = col["warc_ts_us"][s:e]
            ck = col["content_key"][s:e]
            idx = list(range(s, e))
            if len(idx) > 1:
                best = max(zip(ts, ck))
                idx = [i for i in idx if (col["warc_ts_us"][i], col["content_key"][i]) == best]
                seen_pages = set()
                uniq = []
                for i in idx:
                    p = col["page_no"][i]
                    if p not in seen_pages:
                        seen_pages.add(p)
                        uniq.append(i)
                idx = uniq
            pages = [
                {
                    "kind": col["kind"][i],
                    "page_no": int(col["page_no"][i]),
                    "status": col["status"][i],
                    "text": col["text"][i],
                    # elements are recursive template JSON (parsed here);
                    # spans/formulas arrived as native Arrow list<struct> —
                    # restore the per-arm key sets the JSON contract uses
                    "elements": json.loads(col["elements_json"][i]),
                    "formulas": [
                        (f["formula_id"], f["mathml"])
                        for f in _cell_items(col["formulas"][i])
                    ],
                    "spans": [restore_span(s) for s in _cell_items(col["spans"][i])],
                    "n_regions": int(col["n_regions"][i]),
                }
                for i in idx
            ]
            doc = assemble_document(urls[s], col["created"][idx[0]], model, zoom, pages)
            out["url"].append(doc["url"])
            out["text"].append(doc["text"])
            out["n_pages"].append(doc["n_pages"])
            out["n_regions"].append(doc["n_regions"])
            out["status"].append(doc["status"])
            out["template_json"].append(doc["template_json"])
            out["spans_json"].append(json.dumps(doc["spans"], sort_keys=True))
            out["formulas_json"].append(json.dumps(doc["formulas"], sort_keys=True))
            out["size_bucket"].append(int(col["size_bucket"][idx[0]]))
        res = pd.DataFrame(out)
        for c in ("n_pages", "n_regions", "size_bucket"):  # match DocProcessor schema
            res[c] = res[c].astype("int32")
        return res

    return assemble_block
