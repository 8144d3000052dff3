"""Input dedup-by-recency: one row per url, keeping the freshest crawl.

Two-level design so the all-to-all shuffle moves as little as possible:
1. a per-batch combiner (stateless ``map_batches``) drops stale duplicates
   that happen to share a batch — zero shuffle;
2. ``groupby("url").map_groups`` resolves the rest — the one unavoidable
   hash exchange, carrying only the already-pruned (url, warc_ts, html)
   columns.

Winner = max ``warc_ts``; ties broken by ``html`` bytes (lexicographic) so
the result is deterministic at any parallelism.
"""

from __future__ import annotations

import pandas as pd
import ray.data


def best_per_url(df: pd.DataFrame) -> pd.DataFrame:
    """Keep the (warc_ts, html)-max row per url; deterministic."""
    if len(df) <= 1:
        return df
    df = df.sort_values(["url", "warc_ts", "html"], kind="mergesort")
    return df.groupby("url", sort=False).tail(1).reset_index(drop=True)


def dedup_latest(ds: ray.data.Dataset) -> ray.data.Dataset:
    ds = ds.map_batches(best_per_url, batch_format="pandas")  # combiner, no shuffle
    return ds.groupby("url").map_groups(best_per_url, batch_format="pandas")
