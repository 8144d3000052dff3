"""Per-url document assembly — the single all-to-all of the extraction job.

``groupby("url").map_groups(...)``: the shuffle carries only extracted
text / element JSON / span rows (page payloads and any image-like data were
dropped upstream), so the exchange volume is output-sized, not input-sized.
Within a group pages are sorted by ``page_no``, making the result identical
at any parallelism (SURVEY.md §4 determinism row).
"""

from __future__ import annotations

import json

import pandas as pd

from ..functions.assemble import assemble_document


def make_assemble_group(model: str, zoom: float):
    """Build the per-group fold with pipeline config captured in the closure."""

    def assemble_group(df: pd.DataFrame) -> pd.DataFrame:
        url = df["url"].iloc[0]
        created = df["created"].iloc[0]
        pages = []
        for row in df.itertuples(index=False):
            pages.append(
                {
                    "kind": row.kind,
                    "page_no": int(row.page_no),
                    "status": row.status,
                    "text": row.text,
                    "elements": json.loads(row.elements_json),
                    "formulas": json.loads(row.formulas_json),
                    "spans": json.loads(row.spans_json),
                    "n_regions": int(row.n_regions),
                }
            )
        doc = assemble_document(url, created, model, zoom, pages)
        return pd.DataFrame(
            {
                "url": [doc["url"]],
                "text": [doc["text"]],
                "n_pages": [doc["n_pages"]],
                "n_regions": [doc["n_regions"]],
                "status": [doc["status"]],
                "template_json": [doc["template_json"]],
                "spans_json": [json.dumps(doc["spans"], sort_keys=True)],
                "formulas_json": [json.dumps(doc["formulas"], sort_keys=True)],
                "size_bucket": [int(df["size_bucket"].iloc[0])],
            }
        )

    return assemble_group
