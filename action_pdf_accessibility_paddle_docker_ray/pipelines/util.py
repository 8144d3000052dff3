"""Shared pipeline utilities.

``grouped_block_map`` is the engine's fast replacement for
``groupby(keys).map_groups(fn)``: Ray's map_groups is sort + whole-block
batches with a per-group dispatch that costs ~10ms/group in overhead;
sorting ourselves and splitting groups with pandas ``groupby`` inside one
block-level ``map_batches`` keeps the identical grouping guarantee (the
sort co-locates each key's rows in one block) at ~0.1ms/group.

Why the co-location invariant HOLDS in Ray 2.49.2, structurally — not
just empirically (tests/test_round4.py pins it with 120k-row hot keys at
a 64 KiB ``target_max_block_size``):

1. Sort partitioning is a per-boundary binary search over the full key
   tuple with a consistent side (``boundaries[i] <= x < boundaries[i+1]``):
   ``ray/data/_internal/table_block.py:505`` (``_find_partitions_sorted``)
   → ``ray/data/_internal/util.py:786`` (``find_partition_index``).  Rows
   with identical key tuples therefore always map to the SAME partition —
   duplicate sampled boundaries only create empty partitions between them.
2. Each sort-reduce task merges its partition into exactly ONE block —
   ``SortTaskSpec.reduce`` calls ``merge_sorted_blocks`` and returns a
   single block with no post-split by ``target_max_block_size``
   (``ray/data/_internal/planner/exchange/sort_task_spec.py:148-161``).
3. The downstream ``map_batches(..., batch_size=None)`` consumes whole
   blocks as batches, so no re-chunking can divide a key either.

Consequence: one key's rows always arrive in one batch.  The trade-off is
that a pathologically hot key produces one oversized block (the reduce
task must hold it); that is a memory ceiling, not a correctness hazard —
and the same ceiling applies to Ray's own ``map_groups``.  Ops whose keys
can grow unboundedly hot (paragraph seeds, join salts) already cap or
salt them upstream.
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


def grouped_block_dedup(
    ds: ray.data.Dataset,
    keys: list[str],
    order: list[str] | None = None,
) -> ray.data.Dataset:
    """Global keep-one-row-per-key with ZERO per-group dispatch.

    ``grouped_block_map(ds, keys, lambda g: g.head(1))`` pays the
    ~0.1 ms/group Python call — ruinous when groups ≈ rows (a 50M-pair
    dedup measured 80+ minutes in it).  Here the sort is by EXACTLY
    ``keys`` (the colocation invariant applies to the full sort tuple
    ONLY — sorting by keys+order would let one key straddle blocks, the
    memory-note 4× blowup), then each block vectorizes: an in-block
    ``sort_values(keys + order)`` (complete per key, since the block holds
    all of the key's rows) followed by ``drop_duplicates(keys)``.

    ``order=None``: any of the key's rows may be kept — use only when rows
    of one key are identical.  ``order=[cols]``: the kept row is the
    global minimum in ``order`` (winner-pick, e.g. min doc_id)."""

    def block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        if order:
            df = df.sort_values(keys + order, kind="mergesort")
        return df.drop_duplicates(keys, keep="first")

    return ds.sort(keys).map_batches(block, batch_format="pandas", batch_size=None)


def grouped_block_sum(
    ds: ray.data.Dataset,
    keys: list[str],
    sums: dict[str, str],
) -> ray.data.Dataset:
    """Global grouped SUM with ZERO per-group dispatch — the fast
    replacement for ``groupby(keys).aggregate(Sum(col))`` when groups are
    many: Ray's aggregate REDUCE step pays a per-key merge loop that
    measured ~1.5 s/task at 50k groups (r5 session 4, events value
    histogram), while sort(keys) + one vectorized in-block pandas
    groupby-sum does the identical merge in milliseconds.  The colocation
    invariant (module docstring) guarantees every key's rows land in one
    block, so the block-local sum IS the global sum.

    ``sums`` maps input column → output column name.  Use only for
    reorder-safe sums (ints, or floats whose partials are exact — the
    caller owns that proof, same as with Ray's Sum)."""

    cols = list(sums)

    def block(df: pd.DataFrame) -> pd.DataFrame:
        # pandas groupby on an empty frame still yields the right columns
        g = df.groupby(keys, as_index=False, sort=False)[cols].sum()
        return g.rename(columns=sums)

    return ds.sort(keys).map_batches(block, batch_format="pandas", batch_size=None)
