"""Input readers.

Always prune columns at the read (``read_parquet(columns=...)``) so a
2-column transform never ships 5 columns out of storage; pass pyarrow
dataset filter expressions down for row-group pruning where the caller has
a predicate.
"""

from __future__ import annotations

import os
from typing import Any

import ray.data


def read_pages(
    path: str,
    columns: list[str] | None = None,
    filter_expr: Any = None,
    **kwargs: Any,
) -> ray.data.Dataset:
    """Read the Common-Crawl-style pages table.

    Default column set is what extraction needs (``url, warc_ts, html``) —
    the ``text``/``lang`` columns stay in storage unless requested.
    """
    if columns is None:
        columns = ["url", "warc_ts", "html"]
    if filter_expr is not None:
        kwargs["filter"] = filter_expr
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def read_table(
    sf_dir: str,
    name: str,
    columns: list[str] | None = None,
    filter_expr: Any = None,
    **kwargs: Any,
) -> ray.data.Dataset:
    """Read one of the driver-provided TPC-H-ish tables by name."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if filter_expr is not None:
        kwargs["filter"] = filter_expr
    return ray.data.read_parquet(path, columns=columns, **kwargs)


_EXT_FMT = {
    ".parquet": "parquet", ".pq": "parquet",
    ".jsonl": "jsonl", ".json": "jsonl", ".ndjson": "jsonl",
    ".csv": "csv",
}


def read_any(
    path: str,
    columns: list[str] | None = None,
    fmt: str | None = None,
    **kwargs: Any,
) -> ray.data.Dataset:
    """Format-dispatching reader: parquet / JSONL / CSV by extension (or
    explicit ``fmt``), always column-pruned.

    Pruning pushdown depends on the format: parquet prunes at the
    row-group read; CSV prunes inside the Arrow parser
    (``include_columns`` — unrequested columns never build arrays); JSONL
    has no projection pushdown in the reader, so pruning is a zero-copy
    ``select_columns`` immediately after parse — the extra columns exist
    only inside the read task, never cross the object store.  Web-scale
    corpora should live in parquet; jsonl/csv are the interchange paths."""
    if fmt is None:
        ext = os.path.splitext(path.rstrip("/"))[1].lower()
        fmt = _EXT_FMT.get(ext, "parquet")
    if fmt == "parquet":
        return ray.data.read_parquet(path, columns=columns, **kwargs)
    if fmt == "jsonl":
        ds = ray.data.read_json(path, **kwargs)
        return ds.select_columns(columns) if columns else ds
    if fmt == "csv":
        if columns:
            from pyarrow import csv as pacsv

            kwargs.setdefault(
                "convert_options", pacsv.ConvertOptions(include_columns=columns)
            )
        return ray.data.read_csv(path, **kwargs)
    raise ValueError(f"unknown format {fmt!r} (parquet | jsonl | csv)")


def write_any(ds: ray.data.Dataset, path: str, fmt: str = "parquet", **kwargs: Any) -> None:
    """Format-dispatching sink mirror of ``read_any`` (parquet default —
    the only one of the three with columnar stats + partitioning)."""
    if fmt == "parquet":
        ds.write_parquet(path, **kwargs)
    elif fmt == "jsonl":
        ds.write_json(path, **kwargs)
    elif fmt == "csv":
        ds.write_csv(path, **kwargs)
    else:
        raise ValueError(f"unknown format {fmt!r} (parquet | jsonl | csv)")
