"""The flagship extraction pipeline (SURVEY.md §3.4).

``read_parquet(pages)`` → dedup-by-recency (optional) → page fan-out
(task) → per-page detect+process (ACTOR POOL) → per-url assembly (the one
groupby shuffle) → output docs ``(url, text, n_pages, n_regions, status,
template_json, spans_json, formulas_json)``.

Scale design notes (100 TB / multi-node):
- columns pruned at the read: only (url, warc_ts, html) leave storage;
- skew: page fan-out makes the heavy-stage unit a page, so 400-page docs
  parallelize instead of straggling (reference: sequential page loop,
  /root/reference/src/autotag.py:123-138);
- the detector is an actor pool (state loaded once per actor, batched
  calls) sized to leave CPUs for the read/fanout/assemble stages;
- the only all-to-alls are the optional input dedup and the per-url
  regroup, both carrying pruned/output-sized rows;
- everything streams: no take_all/to_pandas/materialize on the main path;
  consume with write_parquet / iter_batches or the helpers below.
"""

from __future__ import annotations

from typing import Any

import ray
import ray.data

from .. import ensure_picklable
from ..sources.pages import read_pages
from ..stages.assemble_stage import make_assemble_group
from ..stages.dedup import dedup_latest
from ..stages.fanout import fanout_pages
from ..stages.process import PageProcessor

DOC_COLUMNS = [
    "url", "text", "n_pages", "n_regions", "status",
    "template_json", "spans_json", "formulas_json",
]


def _default_concurrency() -> tuple[int, int]:
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # pragma: no cover - cluster not yet up
        cpus = 8
    # leave headroom for read / fanout / assemble stages
    return (1, max(2, cpus - 2))


def extract_pipeline(
    source: "str | ray.data.Dataset",
    *,
    model: str = "PP-DocLayout-L",
    zoom: float = 2.0,
    thresholds: dict[int, float] | None = None,
    process_table: bool = True,
    process_formula: bool = True,
    dedup: bool = True,
    batch_size: int = 64,
    concurrency: Any = None,
) -> ray.data.Dataset:
    """Build the lazy extraction Dataset from a parquet path or a Dataset."""
    ensure_picklable()
    ds = read_pages(source) if isinstance(source, str) else source
    if dedup:
        ds = dedup_latest(ds)
    ds = ds.map_batches(fanout_pages, batch_format="pyarrow")
    ds = ds.map_batches(
        PageProcessor,
        fn_constructor_kwargs=dict(
            model=model, zoom=zoom, thresholds=thresholds,
            process_table=process_table, process_formula=process_formula,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency if concurrency is not None else _default_concurrency(),
        num_cpus=1,
    )
    ds = ds.groupby("url").map_groups(
        make_assemble_group(model, zoom), batch_format="pandas"
    )
    return ds


def extract_to_parquet(source: str, out_dir: str, **kwargs: Any) -> None:
    """Run the pipeline and write partitioned parquet (resumable layout)."""
    ds = extract_pipeline(source, **kwargs)
    ds.write_parquet(out_dir, partition_cols=["size_bucket"])


def spans_dataset(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Explode doc rows into the flat spans table (fixed schema across arms)."""
    import json

    import pyarrow as pa

    schema = pa.schema(
        [
            ("url", pa.string()),
            ("page_no", pa.int32()),
            ("region_id", pa.int64()),
            ("label", pa.string()),
            ("score", pa.float32()),
            ("x0", pa.float64()),
            ("y0", pa.float64()),
            ("x1", pa.float64()),
            ("y1", pa.float64()),
            ("reading_order", pa.int32()),
            ("text", pa.string()),
            ("link_density", pa.float64()),
            ("boiler", pa.bool_()),
            ("table_json", pa.string()),
            ("mathml", pa.string()),
        ]
    )

    def explode(batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for url, spans_json in zip(
            batch.column("url").to_pylist(), batch.column("spans_json").to_pylist()
        ):
            for span in json.loads(spans_json):
                span.setdefault("url", url)
                span.setdefault("page_no", 0)
                rows.append(span)
        return pa.table(
            {f.name: [r.get(f.name) for r in rows] for f in schema}, schema=schema
        )

    return docs.map_batches(explode, batch_format="pyarrow")
