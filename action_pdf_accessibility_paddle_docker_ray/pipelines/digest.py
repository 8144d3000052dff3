"""Composite correctness digest for the round-5 extension operators.

The external driver's correctness gate records only the first 50
``queries()`` entries; the round-5 extension ops (multi-way joins, window
functions, graph analytics, funnel/cohort, PMI, ANN evals, moments,
curation composite, blocklist, anomaly, sessionize) sit past that window.
``r5_ext_digest`` folds all of them into ONE oracled gate row each:

    (op, n_rows, digest)

where ``digest`` is the order-insensitive sum, over the op's result rows,
of the first 8 hex digits of ``md5(canon)`` parsed as an integer, and
``canon`` joins the row's INTEGER and STRING column values (column names
sorted, NULL → ``~``) with ``|``.  Float/date columns are excluded from
the canon (their parallel-summation formatting is engine-dependent) but
the rows they *select* still bind — a wrong top-k or a wrong rollup
changes the surviving keys and therefore the digest.

The DuckDB oracle replays the identical computation over each op's
existing SQL oracle: ``('0x' || substr(md5(canon), 1, 8))::BIGINT`` parses
the same prefix, ``CONCAT_WS('|', COALESCE(CAST(c AS VARCHAR), '~'), …)``
builds the same canon (DuckDB's BIGINT→VARCHAR cast matches Python's
``str(int)`` exactly; both md5 over UTF-8 bytes).  A sum of 32-bit values
stays far below BIGINT range for any plausible row count.

Scale note: the digest adds no new distributed work — it runs each
member op's existing pipeline (all individually scale-audited) and folds
a constant-size summary per op on the driver.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from . import (
    analytics,
    dedup_ops,
    joins,
    relational,
    sampling,
    similarity,
    text_ops,
    web_ops,
)

# op name -> (callable, canon columns).  Canon columns are the op's
# INTEGER and STRING output columns, listed here explicitly (not
# introspected) so the Python and SQL sides can never drift.
DIGEST_OPS: dict[str, tuple] = {
    "top_orders_q3": (
        joins.top_orders_q3,
        ["o_orderkey", "o_orderpriority"],
    ),
    "regional_revenue_q5": (
        joins.regional_revenue_q5,
        ["n_name", "n_items"],
    ),
    "big_order_customers": (
        joins.big_order_customers,
        ["c_name", "c_custkey", "o_orderkey", "sum_qty"],
    ),
    "nation_year_rollup": (
        relational.nation_year_rollup,
        ["n_name", "o_year", "n_orders"],
    ),
    "events_user_running": (
        relational.events_user_running,
        ["event_id", "user_id", "rn", "cum_milli", "prev_milli"],
    ),
    "min_price_supplier": (
        joins.min_price_supplier,
        ["l_partkey", "min_price_milli", "n_at_min", "best_suppkey"],
    ),
    "host_triangles": (
        web_ops.host_triangles,
        ["n_hosts", "n_edges", "n_triangles"],
    ),
    "events_funnel": (
        relational.events_funnel,
        ["stage", "n_users"],
    ),
    "cohort_retention": (
        relational.cohort_retention,
        ["cohort_day", "day_offset", "n_users"],
    ),
    "type_distinct_users": (
        relational.type_distinct_users,
        ["event_type", "n_users"],
    ),
    "host_clustering": (
        web_ops.host_clustering,
        ["host", "deg", "n_tri", "clustering_milli"],
    ),
    "pmi_collocations": (
        text_ops.pmi_collocations,
        ["w1", "w2", "c12", "c1", "c2", "pmi_micro"],
    ),
    "ann_eval": (
        similarity.ann_eval,
        ["query_id", "n_truth", "n_hit", "recall_milli"],
    ),
    "ann_eval_ivf": (
        lambda sf: similarity.ann_eval(sf, index="ivf"),
        ["query_id", "n_truth", "n_hit", "recall_milli"],
    ),
    "source_length_stats": (
        relational.source_length_stats,
        ["source", "n_docs", "mean_milli", "var_milli"],
    ),
    "corpus_curate": (
        sampling.corpus_curate,
        ["doc_id", "lang"],
    ),
    "blocklist_filter": (
        web_ops.blocklist_filter,
        ["doc_id", "n_hits", "keep"],
    ),
    "events_anomaly": (
        relational.events_anomaly,
        ["event_id", "event_type", "v_milli", "is_outlier"],
    ),
    "events_sessionize": (
        relational.events_sessionize,
        ["user_id", "session_id", "n_events", "session_start_us",
         "session_end_us"],
    ),
    # round-5 session-4 additions (float `revenue` excluded from the cube
    # canon like the rollup member; the keys it selects still bind)
    "nation_year_cube": (
        relational.nation_year_cube,
        ["n_name", "o_year", "n_orders"],
    ),
    "user_mode_type": (
        relational.user_mode_type,
        ["user_id", "mode_type", "n_events"],
    ),
    "type_value_median": (
        relational.type_value_median,
        ["event_type", "n_events", "med_lo_milli", "med_hi_milli"],
    ),
    "events_ntile": (
        relational.events_ntile,
        ["event_id", "v_milli", "tile"],
    ),
    "part_skyline": (
        relational.part_skyline,
        ["p_size", "min_price_cents", "best_partkey"],
    ),
    "url_typo_pairs": (
        web_ops.url_typo_pairs,
        ["url_a", "url_b"],
    ),
    "page_link_audit": (
        web_ops.page_link_audit,
        ["host", "n_pages", "n_orphans", "n_dangling"],
    ),
    "dormant_customers": (
        joins.dormant_customers,
        ["c_custkey", "c_name", "acctbal_cents"],
    ),
    "source_vocab_overlap": (
        text_ops.source_vocab_overlap,
        ["source_a", "source_b", "n_a", "n_b", "n_common", "jaccard_milli"],
    ),
    "order_month_rank": (
        relational.order_month_rank,
        ["o_orderkey", "month", "price_cents", "rnk", "dense_rnk",
         "pct_milli"],
    ),
    "orders_cdc_merge": (
        joins.orders_cdc_merge,
        ["o_orderkey", "price_cents", "ver"],
    ),
    # round-5 session-5 additions
    "frequent_tokens": (
        analytics.frequent_tokens,
        ["token", "c"],
    ),
    "ppjoin_pairs": (
        dedup_ops.ppjoin_pairs,
        ["a", "b", "n_a", "n_b", "n_common", "jaccard_milli"],
    ),
    "nation_trade_volume": (
        joins.nation_trade_volume,
        ["supp_nation", "cust_nation", "l_year", "n_items", "revenue_e4"],
    ),
    "nation_market_share": (
        joins.nation_market_share,
        ["supp_nation", "l_year", "revenue_e4", "share_milli"],
    ),
    "containment_pairs": (
        dedup_ops.containment_pairs,
        ["a", "b", "n_a", "n_b", "n_common", "containment_milli"],
    ),
    "events_late_window": (
        relational.events_late_window,
        ["win_us", "n_accepted", "acc_milli", "n_late"],
    ),
    "embedding_covariance": (
        analytics.embedding_covariance,
        ["label", "dim_i", "dim_j", "n", "cov_num"],
    ),
    "source_frequent_tokens": (
        analytics.source_frequent_tokens,
        ["source", "token", "c"],
    ),
}

# The four ops whose candidate generation changed AFTER their green
# CORRECTNESS_r04 rows were recorded (the round-5 LSH degenerate-bucket
# bounding: slabbed agree matrix + spanning-subset emission).  Folding
# them into an in-window digest gives the post-change code its own
# driver-recorded hash-match rows; all emit integer-only columns.
DEDUP_RECERT_OPS: dict[str, tuple] = {
    "minhash_dedup": (dedup_ops.minhash_dedup, ["doc_id", "rep_id"]),
    "dedup_keep_best": (dedup_ops.dedup_keep_best, ["doc_id"]),
    "incremental_fuzzy_dedup": (
        dedup_ops.incremental_fuzzy_dedup,
        ["doc_id"],
    ),
    "dedup_eval": (
        dedup_ops.dedup_eval,
        ["n_docs", "n_truth_pairs", "n_found_pairs", "n_missed",
         "recall_milli", "precision_milli"],
    ),
}

_NULL = "~"


def _canon_series(df: pd.DataFrame, cols: list[str]) -> pd.Series:
    """`|`-joined string values in sorted-column order, NULL → `~`."""
    parts = []
    for c in sorted(cols):
        s = df[c]
        if pd.api.types.is_integer_dtype(s) and not s.isna().any():
            txt = s.astype("int64").astype(str)
        else:
            # string, or integer-with-NULLs (which pandas widens to float):
            # format each non-null value like DuckDB's VARCHAR cast
            txt = s.map(
                lambda v: _NULL
                if pd.isna(v)
                else (str(int(v)) if isinstance(v, float) else str(v))
            )
        parts.append(txt)
    out = parts[0]
    for p in parts[1:]:
        out = out + "|" + p
    return out


def digest_frame(df: pd.DataFrame, cols: list[str]) -> int:
    """Order-insensitive md5-prefix sum over the canon strings."""
    if len(df) == 0:
        return 0
    canon = _canon_series(df.reset_index(drop=True), cols)
    return int(
        sum(
            int(hashlib.md5(c.encode("utf-8")).hexdigest()[:8], 16)
            for c in canon
        )
    )


def _run_digest(sf_dir: str, members: dict[str, tuple]) -> pd.DataFrame:
    rows = []
    for op, (fn, cols) in members.items():
        res = fn(sf_dir)
        if hasattr(res, "to_pandas"):
            res = res.to_pandas()
        rows.append(
            {"op": op, "n_rows": len(res), "digest": digest_frame(res, cols)}
        )
    return pd.DataFrame(rows).sort_values("op", ignore_index=True)


def r5_ext_digest(sf_dir: str) -> pd.DataFrame:
    """One (op, n_rows, digest) row per round-5 extension operator."""
    return _run_digest(sf_dir, DIGEST_OPS)


def dedup_recert_digest(sf_dir: str) -> pd.DataFrame:
    """One (op, n_rows, digest) row per post-r04-changed dedup op."""
    return _run_digest(sf_dir, DEDUP_RECERT_OPS)


def digest_oracle_sql(
    member_oracles: dict[str, str],
    members: dict[str, tuple] = DIGEST_OPS,
) -> str:
    """DuckDB replay: the same canon/md5/sum over each member's oracle."""
    arms = []
    for op, (_fn, cols) in sorted(members.items()):
        canon = ", ".join(
            f"COALESCE(CAST({c} AS VARCHAR), '{_NULL}')" for c in sorted(cols)
        )
        arms.append(
            f"SELECT '{op}' AS op, COUNT(*) AS n_rows, "
            f"CAST(COALESCE(SUM(('0x' || substr(md5(CONCAT_WS('|', {canon})),"
            f" 1, 8))::BIGINT), 0) AS BIGINT) AS digest "
            f"FROM ({member_oracles[op]})"
        )
    return " UNION ALL ".join(arms)
