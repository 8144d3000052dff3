"""Join operators Ray Data lacks natively, built from the documented
portable patterns (SURVEY.md §2.4 notes; the reference itself has no data
joins beyond the formula-id lookup).

- ``orders_lineitem_join``: BOTH-SIDES-LARGE partitioned hash join — add a
  ``bucket = key % B`` column to both sides, union, co-locate buckets with
  one grouped exchange, pandas merge inside each bucket.  Hot keys would be
  salted into sub-buckets at scale (keys here are uniform).
- ``events_asof_order``: AS-OF join (each event matched to the most recent
  order at-or-before its timestamp for the same customer) — bucket by key,
  ``pd.merge_asof`` per bucket over time-sorted frames.  DuckDB's native
  ``ASOF JOIN`` is the oracle.
"""

from __future__ import annotations

import pandas as pd
import ray.data

from .. import ensure_picklable
from ..sources.pages import read_table
from .util import grouped_block_map

JOIN_BUCKETS = 32


def orders_lineitem_join(sf_dir: str) -> ray.data.Dataset:
    """Revenue stats per order priority via an explicit partitioned hash join.

    Output (o_orderpriority, n_items, sum_qty) — integer-exact vs the SQL
    oracle at any parallelism.
    """
    ensure_picklable()
    from ray.data.aggregate import Sum

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    lineitem = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": df["o_orderkey"].astype("int64"),
                "bucket": (df["o_orderkey"] % JOIN_BUCKETS).astype("int64"),
                "side": "o",
                "priority": df["o_orderpriority"],
                "qty": 0.0,
            }
        )

    def tag_lineitem(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": df["l_orderkey"].astype("int64"),
                "bucket": (df["l_orderkey"] % JOIN_BUCKETS).astype("int64"),
                "side": "l",
                "priority": "",
                "qty": df["l_quantity"].astype("float64"),
            }
        )

    both = orders.map_batches(tag_orders, batch_format="pandas").union(
        lineitem.map_batches(tag_lineitem, batch_format="pandas")
    )

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        o = df[df["side"] == "o"][["key", "priority"]]
        li = df[df["side"] == "l"][["key", "qty"]]
        if len(o) == 0 or len(li) == 0:
            return pd.DataFrame(
                {"priority": pd.Series([], dtype="object"),
                 "part_n": pd.Series([], dtype="int64"),
                 "part_qty": pd.Series([], dtype="float64")}
            )
        j = li.merge(o, on="key", how="inner")
        g = j.groupby("priority", sort=True).agg(part_n=("qty", "size"), part_qty=("qty", "sum"))
        return g.reset_index()

    partials = grouped_block_map(both, ["bucket"], join_bucket)
    agg = partials.groupby("priority").aggregate(
        Sum("part_n", alias_name="n_items"), Sum("part_qty", alias_name="qty_raw")
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderpriority": df["priority"],
                "n_items": df["n_items"].astype("int64"),
                "sum_qty": df["qty_raw"].round(0).astype("int64"),
            }
        )

    return agg.map_batches(finish, batch_format="pandas")


def events_asof_order(sf_dir: str) -> ray.data.Dataset:
    """AS-OF join: each event → most recent order at-or-before its ts for
    customer ``user_id + 1`` (events.user_id is 0-based, customers 1-based).

    Output (event_id, order_ts_us BIGINT nullable) — epoch integers so the
    DuckDB ``ASOF JOIN`` oracle matches exactly.
    """
    ensure_picklable()
    events = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])

    def tag_events(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": (df["user_id"] + 1).astype("int64"),
                "side": "e",
                "event_id": df["event_id"].astype("int64"),
                "ts_us": df["ts"].astype("datetime64[us]").astype("int64"),
            }
        )

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": df["o_custkey"].astype("int64"),
                "side": "o",
                "event_id": -1,
                "ts_us": df["o_orderdate"].astype("datetime64[us]").astype("int64"),
            }
        )

    both = events.map_batches(tag_events, batch_format="pandas").union(
        orders.map_batches(tag_orders, batch_format="pandas")
    )

    def asof_key(df: pd.DataFrame) -> pd.DataFrame:
        ev = df[df["side"] == "e"].sort_values("ts_us", kind="mergesort")
        od = df[df["side"] == "o"].sort_values("ts_us", kind="mergesort")
        if len(ev) == 0:
            return pd.DataFrame(
                {"event_id": pd.Series([], dtype="int64"),
                 "order_ts_us": pd.Series([], dtype="Int64")}
            )
        if len(od) == 0:
            return pd.DataFrame(
                {"event_id": ev["event_id"].to_numpy(), "order_ts_us": pd.array([None] * len(ev), dtype="Int64")}
            )
        j = pd.merge_asof(
            ev[["event_id", "ts_us"]], od[["ts_us"]].assign(order_ts_us=od["ts_us"].to_numpy()),
            on="ts_us", direction="backward",
        )
        return pd.DataFrame(
            {"event_id": j["event_id"].to_numpy(), "order_ts_us": j["order_ts_us"].astype("Int64")}
        )

    return grouped_block_map(both, ["key"], asof_key)
