"""Round-5 session-4 operators: CUBE lattice, grouped mode, exact grouped
median, distributed NTILE, 2-D skyline, deletion-neighborhood typo join,
and the page-level orphan/dangling link audit.

Each op is checked against its own DuckDB oracle at sf0.001 (the same
comparison the driver's gate runs at sf0.01) plus semantic invariants the
oracle replay alone would not pin (NTILE tile-size law, skyline
non-dominance, exact-ed completeness vs brute force, lattice consistency).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _views(con, sf, tables):
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )


def _frame(x):
    return x.to_pandas() if hasattr(x, "to_pandas") else x


def _assert_frames_equal(got, want, key, float_cols=()):
    got = _frame(got).sort_values(key, ignore_index=True)[sorted(got.columns)]
    want = want.sort_values(key, ignore_index=True)[sorted(want.columns)]
    assert len(got) == len(want) > 0
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        if c in float_cols:
            assert np.allclose(got[c].astype(float), want[c].astype(float), atol=0)
        else:
            assert list(got[c]) == list(want[c]), f"column {c} differs"


def test_nation_year_cube_matches_duckdb(ray_session):
    from action_pdf_accessibility_paddle_docker_ray.pipelines.relational import (
        nation_year_cube,
        sql_nation_year_cube,
    )

    got = nation_year_cube(SF)
    con = duckdb.connect()
    _views(con, SF, ("nation", "customer", "orders"))
    want = con.execute(sql_nation_year_cube()).df()
    _assert_frames_equal(got, want, ["n_name", "o_year"], float_cols=("revenue",))
    # all four CUBE levels present
    fine = got[(got["n_name"] != "ALL") & (got["o_year"] != -1)]
    nat = got[(got["n_name"] != "ALL") & (got["o_year"] == -1)]
    yr = got[(got["n_name"] == "ALL") & (got["o_year"] != -1)]
    tot = got[(got["n_name"] == "ALL") & (got["o_year"] == -1)]
    assert len(fine) and len(nat) and len(yr) and len(tot) == 1
    # lattice consistency: every level re-aggregates to the same counts
    n = fine["n_orders"].sum()
    assert nat["n_orders"].sum() == yr["n_orders"].sum() == n
    assert int(tot["n_orders"].iloc[0]) == n


def test_user_mode_type_matches_duckdb_and_tie_break(ray_session):
    from action_pdf_accessibility_paddle_docker_ray.pipelines.relational import (
        sql_user_mode_type,
        user_mode_type,
    )

    got = _frame(user_mode_type(SF))
    con = duckdb.connect()
    _views(con, SF, ("events",))
    want = con.execute(sql_user_mode_type()).df()
    _assert_frames_equal(got, want, ["user_id"])
    # one row per user, and the mode count really is that user's max
    ev = con.execute(
        "SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2"
    ).df()
    assert got["user_id"].is_unique
    mx = ev.groupby("user_id")["n"].max()
    merged = got.set_index("user_id")
    assert (merged["n_events"] == mx.loc[merged.index]).all()
    # tie-break law: among a user's max-count types, the lexicographic min
    top = ev[ev["n"] == ev.groupby("user_id")["n"].transform("max")]
    expect_mode = top.groupby("user_id")["event_type"].min()
    assert (merged["mode_type"] == expect_mode.loc[merged.index]).all()


def test_type_value_median_matches_duckdb_and_parity(ray_session):
    from action_pdf_accessibility_paddle_docker_ray.pipelines.relational import (
        sql_type_value_median,
        type_value_median,
    )

    got = type_value_median(SF)
    con = duckdb.connect()
    _views(con, SF, ("events",))
    want = con.execute(sql_type_value_median()).df()
    _assert_frames_equal(got, want, ["event_type"])
    # med_lo == med_hi exactly when the group count is odd
    odd = got["n_events"] % 2 == 1
    assert (got.loc[odd, "med_lo_milli"] == got.loc[odd, "med_hi_milli"]).all()
    assert (got["med_lo_milli"] <= got["med_hi_milli"]).all()


def test_events_ntile_matches_duckdb_and_tile_law(ray_session):
    from action_pdf_accessibility_paddle_docker_ray.pipelines.relational import (
        events_ntile,
        sql_events_ntile,
    )

    got = _frame(events_ntile(SF))
    con = duckdb.connect()
    _views(con, SF, ("events",))
    want = con.execute(sql_events_ntile()).df()
    _assert_frames_equal(got, want, ["event_id"])
    # NTILE law: tile sizes differ by ≤1 and the big tiles come first;
    # tiles are monotone in the (v_milli, event_id) order
    sizes = got.groupby("tile").size()
    assert sorted(sizes.index) == list(range(1, 11))
    assert sizes.max() - sizes.min() <= 1
    big = sizes[sizes == sizes.max()].index
    assert list(big) == list(range(1, len(big) + 1))
    ordered = got.sort_values(["v_milli", "event_id"], ignore_index=True)
    assert (np.diff(ordered["tile"].to_numpy()) >= 0).all()


def test_part_skyline_matches_duckdb_and_non_dominated(ray_session):
    from action_pdf_accessibility_paddle_docker_ray.pipelines.relational import (
        part_skyline,
        sql_part_skyline,
    )

    got = part_skyline(SF)
    con = duckdb.connect()
    _views(con, SF, ("part",))
    want = con.execute(sql_part_skyline()).df()
    _assert_frames_equal(got, want, ["p_size"])
    # non-dominance against EVERY part, not just the per-size champions
    parts = con.execute(
        "SELECT CAST(p_size AS BIGINT) AS s, "
        "CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS pc FROM part"
    ).df()
    for _, row in got.iterrows():
        dom = parts[
            (parts["s"] >= row["p_size"])
            & (parts["pc"] <= row["min_price_cents"])
            & ((parts["s"] > row["p_size"]) | (parts["pc"] < row["min_price_cents"]))
        ]
        assert len(dom) == 0
    # frontier trade-off: bigger size always costs strictly more (else
    # the bigger part would dominate the smaller)
    srt = got.sort_values("p_size")
    assert (np.diff(srt["min_price_cents"].to_numpy()) > 0).all()


def test_url_typo_pairs_matches_duckdb_and_brute_force(ray_session):
    from action_pdf_accessibility_paddle_docker_ray.pipelines.web_ops import (
        _ed_le_1,
        sql_url_typo_pairs,
        url_typo_pairs,
    )

    got = _frame(url_typo_pairs(SF))
    con = duckdb.connect()
    _views(con, SF, ("documents",))
    want = con.execute(sql_url_typo_pairs()).df()
    _assert_frames_equal(got, want, ["url_a", "url_b"])
    # completeness: deletion-neighborhood banding finds EXACTLY the brute
    # force ed≤1 pair set over the distinct-url universe
    urls = sorted(
        con.execute(
            "SELECT DISTINCT 'https://' || source || '.example.com/d/' || "
            "CAST(doc_id % 97 AS VARCHAR) FROM documents"
        ).df().iloc[:, 0]
    )
    brute = {
        (a, b)
        for i, a in enumerate(urls)
        for b in urls[i + 1:]
        if abs(len(a) - len(b)) <= 1 and _ed_le_1(a, b)
    }
    assert set(zip(got["url_a"], got["url_b"])) == brute
    assert (got["url_a"] < got["url_b"]).all()


def test_ed_le_1_kernel():
    from action_pdf_accessibility_paddle_docker_ray.pipelines.web_ops import _ed_le_1

    assert _ed_le_1("abc", "abd")        # substitution
    assert _ed_le_1("abc", "ab")         # deletion
    assert _ed_le_1("ab", "abc")         # insertion (either order)
    assert _ed_le_1("abc", "bbc")        # substitution at position 0
    assert not _ed_le_1("ab", "ba")      # transposition is ed 2
    assert not _ed_le_1("abc", "a")      # length gap 2
    assert not _ed_le_1("abcd", "abdc")  # two substitutions


def test_page_link_audit_matches_duckdb_and_bounds(ray_session):
    from action_pdf_accessibility_paddle_docker_ray.pipelines.web_ops import (
        page_link_audit,
        sql_page_link_audit,
    )

    got = _frame(page_link_audit(SF))
    con = duckdb.connect()
    _views(con, SF, ("documents",))
    want = con.execute(sql_page_link_audit()).df()
    _assert_frames_equal(got, want, ["host"])
    assert (got["n_orphans"] <= got["n_pages"]).all()
    assert (got[["n_pages", "n_orphans", "n_dangling"]] >= 0).all().all()
    # the audit must BIND: the synthetic crawl has both orphans and
    # dangling targets somewhere
    assert got["n_orphans"].sum() > 0
    assert got["n_dangling"].sum() > 0


def test_dormant_customers_matches_duckdb_and_binds(ray_session):
    from action_pdf_accessibility_paddle_docker_ray.pipelines.joins import (
        dormant_customers,
        sql_dormant_customers,
    )

    got = _frame(dormant_customers(SF))
    con = duckdb.connect()
    _views(con, SF, ("customer", "orders"))
    want = con.execute(sql_dormant_customers()).df()
    _assert_frames_equal(got, want, ["c_custkey"])
    # anti-join semantics: NO dormant customer has a post-cutoff order,
    # and every non-dormant customer has one
    recent = set(
        con.execute(
            "SELECT DISTINCT o_custkey FROM orders "
            "WHERE o_orderdate >= TIMESTAMP '2000-01-01'"
        ).df()["o_custkey"]
    )
    assert not (set(got["c_custkey"]) & recent)
    all_cust = set(con.execute("SELECT c_custkey FROM customer").df()["c_custkey"])
    assert all_cust - set(got["c_custkey"]) == recent & all_cust
    assert len(got) > 0  # the cutoff binds at every SF (14/135/1355)


def test_source_vocab_overlap_matches_duckdb_and_set_laws(ray_session):
    from action_pdf_accessibility_paddle_docker_ray.pipelines.text_ops import (
        source_vocab_overlap,
        sql_source_vocab_overlap,
    )

    got = _frame(source_vocab_overlap(SF))
    con = duckdb.connect()
    _views(con, SF, ("documents",))
    want = con.execute(sql_source_vocab_overlap()).df()
    _assert_frames_equal(got, want, ["source_a", "source_b"])
    # set laws: intersection bounded by both sizes; jaccard in [0, 1000];
    # jaccard == 1000 iff the sets coincide exactly
    assert (got["n_common"] <= got[["n_a", "n_b"]].min(axis=1)).all()
    assert got["jaccard_milli"].between(0, 1000).all()
    full = got["jaccard_milli"] == 1000
    assert (
        (got.loc[full, "n_a"] == got.loc[full, "n_b"])
        & (got.loc[full, "n_a"] == got.loc[full, "n_common"])
    ).all()
    assert (got["source_a"] < got["source_b"]).all()


def test_order_month_rank_matches_duckdb_and_tie_laws(ray_session):
    from action_pdf_accessibility_paddle_docker_ray.pipelines.relational import (
        order_month_rank,
        sql_order_month_rank,
    )

    got = _frame(order_month_rank(SF))
    con = duckdb.connect()
    _views(con, SF, ("orders",))
    want = con.execute(sql_order_month_rank()).df()
    _assert_frames_equal(got, want, ["o_orderkey"])
    # tie laws: equal prices in a month share rnk AND dense_rnk; dense
    # ranks are gapless (max == distinct price count); min rank is 1
    for _, g in got.groupby("month"):
        assert g["rnk"].min() == g["dense_rnk"].min() == 1
        assert g["dense_rnk"].max() == g["price_cents"].nunique()
        by_price = g.groupby("price_cents")[["rnk", "dense_rnk"]].nunique()
        assert (by_price == 1).all().all()
    assert got["pct_milli"].between(0, 1000).all()


def test_order_month_rank_planted_ties_bind(ray_session, tmp_path):
    """The gate corpus has no equal prices within a month, so RANK and
    DENSE_RANK coincide there; a planted-tie table makes the tie
    semantics (and the RANK gap) actually bind against DuckDB."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from action_pdf_accessibility_paddle_docker_ray.pipelines.relational import (
        order_month_rank,
        sql_order_month_rank,
    )

    n = 300
    # 3 months × 100 orders, prices drawn from 7 values → heavy ties
    dates = pd.to_datetime(
        ["1997-%02d-15" % (1 + i % 3) for i in range(n)]
    ).astype("datetime64[us]")
    prices = [100.0 + 10.0 * (i * 37 % 7) for i in range(n)]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(n), pa.int64()),
                "o_custkey": pa.array([1] * n, pa.int64()),
                "o_orderstatus": pa.array(["O"] * n),
                "o_totalprice": pa.array(prices, pa.float64()),
                "o_orderdate": pa.array(dates),
                "o_orderpriority": pa.array(["1-URGENT"] * n),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    got = _frame(order_month_rank(str(tmp_path))).sort_values(
        "o_orderkey", ignore_index=True
    )
    con = duckdb.connect()
    _views(con, str(tmp_path), ("orders",))
    want = con.execute(sql_order_month_rank()).df()
    _assert_frames_equal(got, want, ["o_orderkey"])
    # the ties bind: RANK gaps (rnk != dense_rnk somewhere) and shared
    # ranks among equal prices
    assert (got["rnk"] != got["dense_rnk"]).any()
    assert got.duplicated(["month", "price_cents"]).any()


def test_session4_ops_in_digest_and_entry():
    """Every session-4 op is a queries()/oracle_sql() entry AND an
    r5_ext_digest member (driver-recorded coverage through the window),
    and the gate window is untouched."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry_mod
    from action_pdf_accessibility_paddle_docker_ray.pipelines.digest import (
        DIGEST_OPS,
    )

    ops = [
        "nation_year_cube", "user_mode_type", "type_value_median",
        "events_ntile", "part_skyline", "url_typo_pairs", "page_link_audit",
        "dormant_customers", "source_vocab_overlap", "order_month_rank",
        "orders_cdc_merge",
    ]
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    names = list(qs)
    for op in ops:
        assert op in qs and op in osql
        assert op in DIGEST_OPS
        assert names.index(op) >= 50, f"{op} must sit past the gate window"


def test_session4_events_ops_20x_scale_stress(ray_session, tmp_path):
    """20× gate-scale stress for the session-4 event aggregates: 2M rows
    through the counts-only NTILE rank, the grouped-mode exchange and the
    histogram median — all three must stay EXACT vs DuckDB at a volume
    where any per-row driver traffic or per-key merge loop would blow the
    budget (the r4 aggregate pathology measured ~1.9 ms/key — 2M keys
    would be an hour; this must finish in seconds)."""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from action_pdf_accessibility_paddle_docker_ray.pipelines.relational import (
        events_ntile,
        sql_events_ntile,
        sql_type_value_median,
        sql_user_mode_type,
        type_value_median,
        user_mode_type,
    )

    n = 2_000_000
    ids = np.arange(n, dtype=np.int64)
    # deterministic mixed-magnitude values incl. negatives (exercises the
    # floor-shift bucket ordering) and heavy value collisions per type
    vals = ((ids * 2654435761) % 1_000_000 - 200_000) / 1000.0
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(ids),
                "ts": pa.array(
                    pd.to_datetime("2020-01-01").to_datetime64()
                    + ids * np.timedelta64(1, "s")
                ),
                "user_id": pa.array(ids % 5000),
                "event_type": pa.array(
                    pd.Series(ids % 7).map(lambda k: f"t{k}").to_numpy(dtype=object)
                ),
                "value": pa.array(vals, pa.float64()),
                "props": pa.array([""] * n),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    con = duckdb.connect()
    _views(con, str(tmp_path), ("events",))

    t0 = time.time()
    nt = _frame(events_ntile(str(tmp_path)))
    md = type_value_median(str(tmp_path))
    mo = _frame(user_mode_type(str(tmp_path)))
    wall = time.time() - t0
    assert wall < 120, f"20x stress took {wall:.1f}s"

    want_nt = con.execute(sql_events_ntile()).df()
    _assert_frames_equal(nt, want_nt, ["event_id"])
    want_md = con.execute(sql_type_value_median()).df()
    _assert_frames_equal(md, want_md, ["event_type"])
    want_mo = con.execute(sql_user_mode_type()).df()
    _assert_frames_equal(mo, want_mo, ["user_id"])
    assert len(nt) == n and len(mo) == 5000 and len(md) == 7


def test_orders_cdc_merge_matches_duckdb_and_upsert_laws(ray_session):
    from action_pdf_accessibility_paddle_docker_ray.pipelines.joins import (
        _CDC_INSERT_BASE,
        orders_cdc_merge,
        sql_orders_cdc_merge,
    )

    got = _frame(orders_cdc_merge(SF))
    con = duckdb.connect()
    _views(con, SF, ("orders",))
    want = con.execute(sql_orders_cdc_merge()).df()
    _assert_frames_equal(got, want, ["o_orderkey"])
    base = con.execute(
        "SELECT o_orderkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) "
        "AS pc FROM orders"
    ).df().set_index("o_orderkey")["pc"]
    m = got.set_index("o_orderkey")
    # upsert laws: updated keys carry ver=1 with the bumped price; every
    # other base key survives untouched at ver=0; inserted keys sit above
    # the insert base and exist nowhere in the base table
    upd = m.index[(m.index % 7 == 3) & (m.index < _CDC_INSERT_BASE)]
    assert len(upd) > 0 and (m.loc[upd, "ver"] == 1).all()
    assert (m.loc[upd, "price_cents"] == base.loc[upd] + 50000).all()
    untouched = m.index[(m.index % 7 != 3) & (m.index < _CDC_INSERT_BASE)]
    assert (m.loc[untouched, "ver"] == 0).all()
    assert (m.loc[untouched, "price_cents"] == base.loc[untouched]).all()
    ins = m.index[m.index >= _CDC_INSERT_BASE]
    assert len(ins) > 0 and (m.loc[ins, "ver"] == 1).all()
    assert not set(ins) & set(base.index)
    # exactly one row per key (the compaction invariant)
    assert m.index.is_unique
