"""Shared pipeline utilities.

``grouped_block_map`` is the engine's fast replacement for
``groupby(keys).map_groups(fn)``: Ray's map_groups is sort + whole-block
batches with a per-group dispatch that costs ~10ms/group in overhead;
sorting ourselves and splitting groups with pandas ``groupby`` inside one
block-level ``map_batches`` keeps the identical grouping guarantee (the
sort co-locates each key's rows in one block) at ~0.1ms/group.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
import ray.data


def grouped_block_map(
    ds: ray.data.Dataset,
    keys: list[str],
    group_fn: Callable[[pd.DataFrame], pd.DataFrame],
    drop_singletons: bool = False,
) -> ray.data.Dataset:
    """sort(keys) → per-block pandas groupby → ``group_fn`` per group.

    ``drop_singletons``: vectorized pre-drop of all single-row groups
    before the per-group loop — for group functions whose output is empty
    on singleton groups (pair emitters, bucket verifies).  LSH bucket keys
    are mostly singletons, so this removes ~95% of the per-group dispatch
    overhead (measured ~0.1 ms/group)."""

    def block(df: pd.DataFrame) -> pd.DataFrame:
        if drop_singletons and len(df):
            df = df[df.duplicated(keys, keep=False)]
        if len(df) == 0:
            return group_fn(df)
        outs = []
        empty = None
        for _, g in df.groupby(keys, sort=False):
            r = group_fn(g)
            if len(r):
                outs.append(r)
            elif empty is None:
                empty = r
        if outs:
            return pd.concat(outs, ignore_index=True)
        return empty if empty is not None else group_fn(df.iloc[0:0])

    return ds.sort(keys).map_batches(block, batch_format="pandas", batch_size=None)
