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
