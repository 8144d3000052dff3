"""The flagship extraction pipeline (SURVEY.md §3.4).

Two physical plans for the same logical job:

- ``regroup="colocate"`` (default, **no all-to-all**):
  ``read_parquet(url, warc_ts, html)`` → stale-crawl filter (broadcast
  semi-join against a tiny (url, max warc_ts) winner map; above the
  broadcast bound or on same-max-ts conflicts, a fixed-size dup-url Bloom
  filter splits the stream and only maybe-dup rows pay a grouped dedup
  exchange — ``functions/bloom.py``) → ``DocProcessor``
  ACTOR POOL (doc parse → page loop → detect → resolve → reading order →
  text extract → template assembly, all per input row = per document) →
  partitioned parquet.  A document never spans blocks, so per-url assembly
  needs no exchange; stale duplicate crawls were filtered before any
  payload was touched.
- ``regroup="sort"`` (page-parallel): doc-aligned page fan-out (task) →
  ``PageProcessor`` actor pool over page rows → ``sort(url)`` exchange →
  block-local assembly.  Spreads a single enormous document across the
  whole pool and tolerates same-timestamp conflicting duplicates; costs
  the one output-sized all-to-all (measured ~1.8x slower end-to-end).

Scale design notes (100 TB / multi-node):
- columns pruned at the read: only (url, warc_ts, html) leave storage;
- skew: the heavy-stage unit is a document (bounded, batch-dispatched
  across the pool) or a page in sort mode — never a whole input block
  (reference: one sequential page loop per process,
  /root/reference/src/autotag.py:123-138);
- the processing pool loads per-worker state once (``__init__``), sized to
  leave CPUs for read/write (see ``_default_concurrency``);
- everything streams: no take_all/to_pandas/materialize on the main path;
  consume with write_parquet / iter_batches or the helpers below.
"""

from __future__ import annotations

import os
from typing import Any

import ray
import ray.data

from .. import ensure_picklable
from ..sources.pages import read_pages
from ..stages.assemble_stage import make_assemble_block
from ..stages.dedup import dedup_latest
from ..stages.fanout import fanout_pages
from ..stages.process import DocProcessor, PageProcessor

DOC_COLUMNS = [
    "url", "text", "n_pages", "n_regions", "status",
    "template_json", "spans_json", "formulas_json",
]


def _default_concurrency(reserve_div: int = 8) -> tuple[int, int]:
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # pragma: no cover - cluster not yet up
        cpus = 8
    # fixed pool at cpus - max(1, cpus/reserve_div): measured best — the
    # default autoscaler (upscale only at 2x queue pressure) wastes the
    # whole ramp on short jobs, and a pool reserving EVERY cpu starves the
    # read/write stages (33s vs 7s at 32 cpus for the same job).  The
    # reserve covers read, write and the driver; never reserve every CPU
    # (read tasks would never schedule → deadlock on tiny sessions).
    # The Bloom route passes reserve_div=4: its two read passes + the
    # maybe-dup exchange need real CPU share, and a 7/8 pool starves them
    # (measured 123 s vs 87 s on the 149k-row 25%-dup corpus at 32 cpus).
    size = max(1, min(cpus - 1, cpus - max(1, cpus // reserve_div)))
    return (size, size)


_SMALL_INPUT_BYTES = 1 << 30  # below this, the winner scan is one task
# broadcast bound: above this many duplicated urls the per-worker winner map
# stops being "small side" as a Python dict; the pipeline switches to the
# BLOOM route — broadcast a fixed-size bit filter of the dup urls, stream
# definitely-unique rows straight to processing, and pay the grouped dedup
# exchange for the (dup + false-positive) maybe stream only.
_WINNER_BROADCAST_MAX = 2_000_000

FALLBACK_SORT = "fallback_sort"


class BloomRoute:
    """Stale-filter verdict: broadcast the dup-url Bloom filter, split the
    stream into definitely-unique rows (no exchange) and maybe-dup rows
    (grouped dedup exchange over only those rows)."""

    def __init__(self, bloom_ref: Any) -> None:
        self.bloom_ref = bloom_ref


def _merge_winner_partials(df):
    """Merge per-batch (url, max_ts, n_at_max, n) partials of one url."""
    import pandas as pd

    best = int(df["max_ts"].max())
    return pd.DataFrame(
        {
            "url": [df["url"].iloc[0]],
            "max_ts": [best],
            "n_at_max": [int(df.loc[df["max_ts"] == best, "n_at_max"].sum())],
            "n": [int(df["n"].sum())],
        }
    )


def _bloom_from_dups(dups_ds: "ray.data.Dataset", n_dups: int) -> BloomRoute:
    """Build the dup-url Bloom filter from the DISTRIBUTED winner table.

    Each block maps its urls to probe positions (a tiny uint64 array, k
    ints per url); the driver streams those batches and ORs bits into the
    one fixed-size bitmap — it never holds a url, only the filter."""
    import pandas as pd

    from ..functions.bloom import UrlBloom, bloom_positions

    bloom = UrlBloom(n_dups)
    m, k = bloom.m, bloom.k

    def positions(df: pd.DataFrame) -> pd.DataFrame:
        pos = bloom_positions(df["url"].to_numpy(), m, k).reshape(-1)
        return pd.DataFrame({"pos": pos.astype("uint64")})

    pos_ds = dups_ds.map_batches(positions, batch_format="pandas")
    for batch in pos_ds.iter_batches(batch_format="numpy"):
        bloom.set_positions(batch["pos"])
    return BloomRoute(ray.put(bloom))


def _stale_filter(source: str) -> Any:
    """Semi-join dedup prep: find urls crawled more than once and their
    winning warc_ts via a (url, warc_ts)-ONLY scan — a second read of just
    two pruned columns (cheap even at 100 TB: ~1% of the bytes).

    Small inputs (≤1 GiB): one Ray task does a columnar scan + pandas
    groupby (no sub-pipeline startup).  Large inputs: a distributed
    per-batch partial aggregate + one grouped merge over (url, partial)
    rows; the dup counts and the conflict check are computed DISTRIBUTED,
    so nothing bigger than a per-block count row reaches the driver until
    the winner map is proven small.

    Returns:
    - ``None`` — no duplicate urls; nothing to filter;
    - a ``ray.ObjectRef`` of ``{url: max_ts_us}`` for duplicated urls
      (broadcast once, read per task) — only when the map is under the
      broadcast bound AND no url has ≥2 crawls sharing the max warc_ts
      (a ts-only dict cannot disambiguate those);
    - ``BloomRoute`` — winner map too large to broadcast, or same-max-ts
      conflicts present: broadcast only the fixed-size dup-url Bloom
      filter; the caller splits the stream and pays the grouped dedup
      exchange (content_key tie-break included) for maybe-dup rows only.
    """
    import pandas as pd
    import pyarrow.dataset as pads

    fragments = list(pads.dataset(source).files)
    total_bytes = sum(os.path.getsize(f) for f in fragments)

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["warc_ts"].astype("datetime64[us]").astype("int64")
        d = pd.DataFrame({"url": df["url"].to_numpy(), "ts_us": ts.to_numpy()})
        mx = d.groupby("url", sort=False)["ts_us"].transform("max")
        d["at_max"] = (d["ts_us"] == mx).astype("int64")
        g = d.groupby("url", sort=False).agg(
            max_ts=("ts_us", "max"), n_at_max=("at_max", "sum"), n=("ts_us", "size")
        )
        return g.reset_index()

    if total_bytes <= _SMALL_INPUT_BYTES:
        @ray.remote(num_cpus=1)
        def scan_winners(path: str) -> pd.DataFrame:
            import pyarrow.dataset as pads2

            t = pads2.dataset(path).to_table(columns=["url", "warc_ts"])
            out = partials(t.to_pandas())
            return out[out["n"] > 1]

        dups = ray.get(scan_winners.remote(source))
        if len(dups) == 0:
            return None
        if not (dups["n_at_max"] > 1).any() and len(dups) <= _WINNER_BROADCAST_MAX:
            return ray.put(dict(zip(dups["url"], dups["max_ts"].astype("int64"))))
        from ..functions.bloom import UrlBloom

        bloom = UrlBloom(len(dups))
        bloom.add(dups["url"].to_numpy())
        return BloomRoute(ray.put(bloom))

    from .util import grouped_block_map

    merged = grouped_block_map(
        read_pages(source, columns=["url", "warc_ts"]).map_batches(
            partials, batch_format="pandas"
        ),
        ["url"],
        _merge_winner_partials,
    )
    import pyarrow.compute as pc

    dups_ds = merged.map_batches(
        lambda t: t.filter(pc.greater(t["n"], 1)), batch_format="pyarrow"
    ).materialize()  # winner table: consumed 2-3 times; lives in the object
    # store (distributed), bounded by the dup-url count — never the input

    def count_block(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"n": [len(df)], "conflicts": [int((df["n_at_max"] > 1).sum())]}
        )

    counts = dups_ds.map_batches(count_block, batch_format="pandas").to_pandas()
    n_dups = int(counts["n"].sum())  # driver sees per-BLOCK counts only
    n_conflicts = int(counts["conflicts"].sum())
    if n_dups == 0:
        return None
    if n_conflicts == 0 and n_dups <= _WINNER_BROADCAST_MAX:
        dups = dups_ds.to_pandas()  # proven bounded before materializing
        return ray.put(dict(zip(dups["url"], dups["max_ts"].astype("int64"))))
    return _bloom_from_dups(dups_ds, n_dups)


def _make_drop_stale(winners_ref: Any):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    def drop_stale(t: pa.Table) -> pa.Table:
        winners = ray.get(winners_ref)
        urls = pd.Series(t.column("url").to_pandas())
        ts_us = pc.cast(t.column("warc_ts"), pa.int64()).to_pandas().to_numpy()
        # vectorized semi-join: hash-map lookup per column, no Python loop
        win_ts = urls.map(winners).to_numpy()
        keep = pd.isna(win_ts) | (win_ts == ts_us)
        return t.filter(pa.array(keep, pa.bool_()))

    return drop_stale


def _make_bloom_split(bloom_ref: Any, keep_hits: bool):
    """Streaming filter against the broadcast Bloom bitmap: ``keep_hits``
    False passes definitely-unique rows, True passes maybe-dup rows."""
    import pyarrow as pa

    def split(t: pa.Table) -> pa.Table:
        bloom = ray.get(bloom_ref)
        hits = bloom.contains(t.column("url").to_pandas().to_numpy())
        return t.filter(pa.array(hits if keep_hits else ~hits, pa.bool_()))

    return split


def extract_pipeline(
    source: "str | ray.data.Dataset",
    *,
    model: str = "PP-DocLayout-L",
    zoom: float = 2.0,
    thresholds: dict[int, float] | None = None,
    process_table: bool = True,
    process_formula: bool = True,
    dedup: Any = "late",
    regroup: str = "colocate",
    batch_size: int = 8,
    concurrency: Any = None,
    repartition_blocks: int | None = None,
    output: str = "json",
    num_gpus: float | None = None,
    resources: dict | None = None,
    _winners_ref: Any = None,
) -> ray.data.Dataset:
    """Build the lazy extraction Dataset from a parquet path or a Dataset.

    ``num_gpus`` / ``resources``: per-actor resource pins for the DETECTOR
    stage only (the north-star GPU-pinned batched inference seam) — passed
    straight to the actor-pool ``map_batches``; with ``num_gpus`` set the
    stage stops claiming a CPU slot (``num_cpus=0``) so the GPU actors and
    the CPU read/assemble stages don't contend for the same slots.  The
    CPU default (``num_cpus=1``) is unchanged when both are None.  On this
    sandbox (no GPU) the kwargs are exercised structurally (a test asserts
    they reach ``map_batches``); on a real cluster they pin one detector
    actor per GPU.

    ``output``: "json" (default) emits the public docs contract
    (``spans_json``/``formulas_json`` strings, byte-identical per url to
    ``oracle.docs_to_table``).  "nested" emits native Arrow ``list<struct>``
    ``spans``/``formulas`` columns instead — downstream explodes
    (``spans_dataset``/``formulas_dataset``) become zero-copy Arrow
    flattens.  Honored on the colocate plan; the sort plan always emits the
    JSON contract (its assembly is the sink).

    ``regroup``:
    - "colocate" (default): NO output shuffle.  The fan-out yields
      doc-aligned blocks (all pages of a url in one block), so assembly is
      block-local.  Requires ``dedup="late"`` semantics handled by the
      semi-join stale filter; when the winner scan detects a url with ≥2
      crawls sharing the max warc_ts (which a ts-only dict cannot
      disambiguate) or a winner map too large to broadcast, the plan
      AUTO-SWITCHES to the Bloom route: broadcast a fixed-size dup-url
      bit filter, stream unique rows exchange-free, and run the grouped
      dedup (exact, content_key tie-break) over maybe-dup rows only.
    - "sort": classic sort("url") exchange before assembly (the same
      guarantee Ray's map_groups uses; a keyed hash repartition was
      measured 1.7x slower end-to-end on this Ray version).

    ``dedup``: "late" (default) resolves stale crawls without shuffling
    payloads — via the broadcast semi-join in "colocate" mode and inside
    the assembly groups in "sort" mode.  "early"/True adds the explicit
    ``groupby(url)`` payload dedup stage before processing (an extra
    all-to-all of the raw payload; only worth it at high duplicate rates).
    """
    ensure_picklable()
    is_path = isinstance(source, (str, list))
    if regroup == "colocate" and not is_path and dedup == "late" and _winners_ref is None:
        # a Dataset source can't be re-scanned for the semi-join winner
        # map; the sort path dedups correctly in one pass instead of
        # silently keeping stale duplicate crawls
        regroup = "sort"
    ds = read_pages(source) if is_path else source
    stage_kwargs = dict(
        model=model, zoom=zoom, thresholds=thresholds,
        process_table=process_table, process_formula=process_formula,
    )
    # detector-stage resource pins (GPU seam): num_gpus displaces the CPU
    # slot claim; custom resources (e.g. {"accelerator": 1}) pass through
    detector_resources: dict[str, Any] = {
        "num_cpus": 0 if num_gpus else 1,
    }
    if num_gpus is not None:
        detector_resources["num_gpus"] = num_gpus
    if resources is not None:
        detector_resources["resources"] = resources
    if dedup == "early" or dedup is True:
        ds = dedup_latest(ds)

    bloom_active = False
    if regroup == "colocate" and dedup == "late":
        winners_ref = _winners_ref
        if winners_ref is None and is_path:
            winners_ref = _stale_filter(source)
        if winners_ref == FALLBACK_SORT:
            # explicit caller override (tests / `_winners_ref` injection):
            # run the whole input through the sort plan
            regroup = "sort"
        elif isinstance(winners_ref, BloomRoute):
            # maybe-dup-only exchange: definitely-unique rows (Bloom miss)
            # stream straight to the processor with NO exchange; maybe-dup
            # rows (Bloom hit — dups plus ~6e-4 false positives) pay the
            # grouped dedup, which resolves winners exactly, including
            # same-max-ts ties (content_key tie-break in dedup_latest).
            # The payload is read twice (one pass per side) — at extreme
            # dup rates that beats the sort plan's full-output all-to-all.
            bref = winners_ref.bloom_ref
            unique = ds.map_batches(
                _make_bloom_split(bref, keep_hits=False),
                batch_format="pyarrow", num_cpus=0.5,
            )
            maybe = read_pages(source).map_batches(
                _make_bloom_split(bref, keep_hits=True),
                batch_format="pyarrow", num_cpus=0.5,
            )
            # dedup_latest emits pandas blocks; normalize to Arrow so the
            # union feeds the processor one homogeneous block type
            resolved = dedup_latest(maybe).map_batches(
                lambda t: t, batch_format="pyarrow", num_cpus=0.5
            )
            ds = unique.union(resolved)
            bloom_active = True
        elif winners_ref is not None:
            # num_cpus=0.5 keeps this a TASK stage (no fusion into the actor
            # pool): an ObjectRef captured in actor-constructor args breaks
            # actor restarts (ray#53727); task retries just re-fetch the ref
            ds = ds.map_batches(
                _make_drop_stale(winners_ref), batch_format="pyarrow", num_cpus=0.5
            )

    if regroup == "colocate":
        # one actor stage: doc parse → page loop → detect → resolve →
        # assemble, emitting finished doc rows — unit of work = document,
        # no intermediate serialization, no output exchange.
        return ds.map_batches(
            DocProcessor,
            fn_constructor_kwargs=dict(stage_kwargs, output=output),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency
            if concurrency is not None
            else _default_concurrency(4 if bloom_active else 8),
            **detector_resources,
        )

    # page-parallel path: fan-out makes the unit of work a page so one
    # enormous document spreads across the pool; the per-url sort exchange
    # reassembles.  num_cpus=0.5 on the fan-out keeps it a SEPARATE
    # operator from the actor-pool stage (no fusion), so page rows
    # re-batch at ``batch_size`` granularity.
    ds = ds.map_batches(fanout_pages, batch_format="pyarrow", num_cpus=0.5)
    if repartition_blocks:
        # explicit skew balance: spread the fan-out's page rows evenly
        # across ``repartition_blocks`` blocks before the heavy stage —
        # for inputs where the doc-aligned block layout is pathologically
        # skewed (the actor pool's batch-level dispatch usually suffices)
        ds = ds.repartition(repartition_blocks)
    ds = ds.map_batches(
        PageProcessor,
        fn_constructor_kwargs=stage_kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency if concurrency is not None else _default_concurrency(),
        **detector_resources,
    )
    ds = ds.sort("url")
    ds = ds.map_batches(
        make_assemble_block(model, zoom), batch_format="pandas", batch_size=None
    )
    return ds


def extract_to_parquet(source: str, out_dir: str, **kwargs: Any) -> None:
    """Run the pipeline and write partitioned parquet (resumable layout)."""
    ds = extract_pipeline(source, **kwargs)
    ds.write_parquet(out_dir, partition_cols=["size_bucket"])


def extract_all_to_parquet(source: str, out_dir: str, **kwargs: Any) -> None:
    """Write all three output tables: docs (one pipeline execution), then
    spans and formulas derived by RE-READING the written docs parquet —
    cheap column scans instead of re-executing the extraction twice."""
    import os

    extract_to_parquet(source, os.path.join(out_dir, "docs"), **kwargs)
    docs = ray.data.read_parquet(
        os.path.join(out_dir, "docs"), columns=["url", "spans_json", "formulas_json"]
    )
    spans_dataset(docs).write_parquet(os.path.join(out_dir, "spans"))
    formulas_dataset(docs).write_parquet(os.path.join(out_dir, "formulas"))


def formulas_dataset(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Explode doc rows into the per-url formula table (url, formula_id,
    mathml) — the materialized result of the formula-id ⋈ element join
    (/root/reference/src/autotag.py:262-295).

    NESTED docs (``output="nested"``): a zero-copy Arrow explode —
    ``list_parent_indices`` + ``flatten`` + struct-field selects, no JSON.
    JSON docs (the public parquet contract, e.g. re-read from a written
    docs table): the legacy per-row parse."""
    import json

    import pyarrow as pa
    import pyarrow.compute as pc

    schema = pa.schema(
        [("url", pa.string()), ("formula_id", pa.int64()), ("mathml", pa.string())]
    )

    def explode_nested(batch: pa.Table) -> pa.Table:
        formulas = batch.column("formulas").combine_chunks()
        parent = pc.list_parent_indices(formulas)
        flat = formulas.flatten()
        return pa.table(
            {
                "url": pc.take(batch.column("url"), parent),
                "formula_id": flat.field("formula_id"),
                "mathml": flat.field("mathml"),
            },
            schema=schema,
        )

    def explode_json(batch: pa.Table) -> pa.Table:
        rows = []
        for url, fj in zip(
            batch.column("url").to_pylist(), batch.column("formulas_json").to_pylist()
        ):
            for f in json.loads(fj):
                rows.append((url, int(f["formula_id"]), f["mathml"]))
        return pa.table(
            {
                "url": [r[0] for r in rows],
                "formula_id": [r[1] for r in rows],
                "mathml": [r[2] for r in rows],
            },
            schema=schema,
        )

    def explode(batch: pa.Table) -> pa.Table:
        # dispatch on the batch's own schema — calling docs.schema() on a
        # lazy Dataset would trigger (partial) execution on the driver
        if "formulas" in batch.column_names:
            return explode_nested(batch)
        return explode_json(batch)

    return docs.map_batches(explode, batch_format="pyarrow")


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

    import pyarrow.compute as pc

    def explode_nested(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans").combine_chunks()
        parent = pc.list_parent_indices(spans)
        flat = spans.flatten()
        cols: dict[str, Any] = {"url": pc.take(batch.column("url"), parent)}
        for f in schema:
            if f.name == "url":
                continue
            col = flat.field(f.name)
            if f.name == "page_no":
                # HTML spans carry no page number → 0 (unpaginated)
                col = pc.fill_null(col, 0)
            cols[f.name] = col.cast(f.type)
        return pa.table(cols, schema=schema)

    def explode_json(batch: pa.Table) -> pa.Table:
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

    def explode(batch: pa.Table) -> pa.Table:
        if "spans" in batch.column_names:
            return explode_nested(batch)
        return explode_json(batch)

    return docs.map_batches(explode, batch_format="pyarrow")
