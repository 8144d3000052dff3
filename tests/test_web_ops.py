"""Round-4 web-corpus hygiene + weighted-sampling ops vs their DuckDB oracles."""

import duckdb
import pandas as pd
import pytest

from action_pdf_accessibility_paddle_docker_ray.pipelines import sampling, web_ops

SF = "/root/testdata/sf0.001"


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    return con.execute(sql).df()


@pytest.mark.parametrize(
    "raw, want",
    [
        # scheme+host lowercase, default port, www, trailing slash, fragment
        ("HTTPS://WWW.Ex.COM:443/A/b/?x=1#frag", "https://ex.com/A/b?x=1"),
        ("http://ex.com:80/", "http://ex.com"),
        # non-default port survives; http keeps :443
        ("http://ex.com:443/p", "http://ex.com:443/p"),
        # utm params drop, rest sort, empty params drop
        ("https://ex.com/p?utm_source=a&b=2&a=1&&utm_x=9", "https://ex.com/p?a=1&b=2"),
        # all params dropped -> no '?'
        ("https://ex.com/p?utm_only=1", "https://ex.com/p"),
        # www only stripped once, only as a prefix
        ("https://www.www.ex.com/p", "https://www.ex.com/p"),
        ("https://awww.ex.com/p", "https://awww.ex.com/p"),
        # non-URL junk passes through
        ("not a url", "not a url"),
    ],
)
def test_canonicalize_url_rules(raw, want):
    assert web_ops.canonicalize_url(raw) == want


def test_url_dedup_matches_oracle(ray_session):
    got = (
        web_ops.url_dedup(SF)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = (
        _oracle(web_ops.sql_url_dedup()).sort_values("url").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)
    # the synthesis must actually exercise the dedup (collapse > 0)
    assert got["n_dups"].max() > 1
    assert got["n_dups"].sum() == 500  # every input row accounted for
    assert len(got) < 500


def test_gopher_filter_matches_oracle(ray_session):
    got = (
        web_ops.gopher_filter(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        _oracle(web_ops.sql_gopher_filter())
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)
    # the rules must bind in both directions at this corpus
    assert 0 < got["keep"].sum() < len(got)


def test_priority_sample_matches_oracle(ray_session):
    got = (
        sampling.priority_sample(SF)
        .to_pandas()
        .sort_values("rk")
        .reset_index(drop=True)
    )
    want = _oracle(sampling.sql_priority_sample()).sort_values("rk").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns], want)
    assert len(got) == sampling._PRIO_K
    assert list(got["rk"]) == list(range(1, sampling._PRIO_K + 1))


def test_link_graph_matches_oracle(ray_session):
    got = (
        web_ops.link_graph(SF)
        .to_pandas()
        .sort_values(["src_host", "dst_host"])
        .reset_index(drop=True)
    )
    want = (
        _oracle(web_ops.sql_link_graph())
        .sort_values(["src_host", "dst_host"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)
    # every host emits self-edges (relative nav links resolve to own host)
    assert (got["src_host"] == got["dst_host"]).sum() == web_ops._N_SOURCES
    # and cross-host edges from the absolute anchors
    assert (got["src_host"] != got["dst_host"]).sum() > 0
    # all links accounted for: 2 nav per doc + 1 + doc_id % 3 anchors
    assert got["n_links"].sum() == 500 * 2 + sum(1 + i % 3 for i in range(500))


def test_line_dedup_matches_oracle(ray_session):
    got = (
        web_ops.line_dedup(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        _oracle(web_ops.sql_line_dedup())
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)
    # the planted banner guarantees the dedup binds on every doc
    assert (got["n_dropped"] >= 1).all()
    # first occurrence wins: the banner leads every deduped text
    assert got["text"].str.startswith(web_ops._BANNER).all()
    # and the trailing duplicate copy is gone
    assert not got["text"].str.endswith("\n" + web_ops._BANNER).any()


def test_line_dedup_order_preserved():
    # kernel-level: order of first occurrences is stable
    assert list(dict.fromkeys(["b", "a", "b", "c", "a"])) == ["b", "a", "c"]


def test_priority_sample_weight_monotonicity(ray_session, tmp_path):
    """A doc with overwhelming weight must be sampled first: the smallest
    possible u is 2^-32 (hit here — fmix32(11 ^ seed 11) = 0), so the
    planted weight must exceed 3 * 2^32 ≈ 1.3e10; 10^14 dominates."""
    df = pd.DataFrame(
        {
            "doc_id": pd.Series(range(200), dtype="int64"),
            "text": "x",
            "lang": "en",
            "source": "src0",
            "n_chars": pd.Series([3] * 199 + [10**14], dtype="int64"),
        }
    )
    df.to_parquet(tmp_path / "documents.parquet", index=False)
    out = sampling.priority_sample(str(tmp_path), k=5).to_pandas()
    assert out.iloc[0]["doc_id"] == 199
    assert len(out) == 5


def test_bloom_screen_matches_oracle(ray_session):
    got = (
        web_ops.bloom_screen(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        _oracle(web_ops.sql_bloom_screen())
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)
    # both outcomes occur: seen urls and proven-novel urls
    assert 0 < got["is_seen"].sum() < len(got)
    # no false negatives ever; no false positives at the default m
    assert ((got["maybe_seen"] - got["is_seen"]) >= 0).all()
    assert (got["maybe_seen"] == got["is_seen"]).all()


def test_bloom_screen_saturated_bitmap_still_exact(ray_session):
    """m=256 saturates the bitmap: false positives appear, the exact
    verify catches every one, and the oracle replays the saturated bitmap
    bit-for-bit (no false negatives by construction)."""
    got = (
        web_ops.bloom_screen(SF, m_bits=256)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        _oracle(web_ops.sql_bloom_screen(256))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)
    fp = ((got["maybe_seen"] == 1) & (got["is_seen"] == 0)).sum()
    fn = ((got["maybe_seen"] == 0) & (got["is_seen"] == 1)).sum()
    assert fp > 0 and fn == 0


def test_anchor_stats_matches_oracle(ray_session):
    got = (
        web_ops.anchor_stats(SF)
        .to_pandas()
        .sort_values("dst_host")
        .reset_index(drop=True)
    )
    want = (
        _oracle(web_ops.sql_anchor_stats())
        .sort_values("dst_host")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)
    # one row per destination host; every host receives links
    assert len(got) == web_ops._N_SOURCES
    # self-links (2 nav anchors per doc) dominate inbound counts, so each
    # host's n_src_hosts includes itself plus cross-host linkers
    assert (got["n_src_hosts"] >= 1).all()
    # anchor totals account for every link: 2 nav + 1 + doc_id % 3 per doc
    assert got["n_inlinks"].sum() == 500 * 2 + sum(1 + i % 3 for i in range(500))
    # top anchor is the nav 'home'/'about' tie broken lexicographically
    # wherever self-links dominate
    assert set(got["top_anchor"]).issubset({"home", "about", "l0", "l1", "l2"})


# --- robots_filter -----------------------------------------------------------


def test_robots_filter_matches_oracle(ray_session):
    import duckdb

    from action_pdf_accessibility_paddle_docker_ray.pipelines.flagship import (
        pages_path_for,
    )

    got = (
        web_ops.robots_filter(SF)
        .to_pandas()
        .sort_values(["url", "allowed"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    want = (
        con.execute(web_ops.sql_robots_filter(pages_path_for(SF) + "/*.parquet"))
        .df()
        .sort_values(["url", "allowed"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)
    # the synthesized rule table binds: both outcomes occur
    assert got["allowed"].nunique() == 2
    # every (host, seg) pair is decided consistently across its urls
    per_pair = got.groupby(["host", "seg"])["allowed"].nunique()
    assert (per_pair == 1).all()


def test_host_boilerplate_matches_oracle(ray_session):
    got = (
        web_ops.host_boilerplate(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        _oracle(web_ops.sql_host_boilerplate())
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)
    # the planted 90%-frequency nav line guarantees removals happen
    assert got["n_removed"].sum() > 0
    # rare nav line 3 (30% < 60% threshold) is never removed: any doc
    # carrying it keeps it
    carrying = got["text"].str.contains("item 3", regex=False)
    assert carrying.any()
    # content (the original text) always survives — it is unique per doc
    assert (got["text"].str.len() > 0).all()


def test_host_boilerplate_join_plan_equivalent(ray_session, monkeypatch):
    """Forcing the broadcast bound to zero routes through the tagged-sides
    grouped join + per-doc rebuild; output identical to the broadcast plan."""
    a = (
        web_ops.host_boilerplate(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    monkeypatch.setattr(web_ops, "_HB_BROADCAST_MAX", 0)
    b = (
        web_ops.host_boilerplate(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_host_boilerplate_threshold_semantics(ray_session, tmp_path):
    """Hand-built host: a line in 3/4 docs (75% >= 60%) is removed from
    all of them; a line in 1/4 docs (25%) survives."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    common, rare = "shared footer", "one-off line"
    texts = [
        f"{common}\nbody a",
        f"{common}\nbody b",
        f"{common}\nbody c\n{rare}",
        "body d",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["hostA"] * 4),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = (
        web_ops.host_boilerplate(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for _, row in got.iterrows():
        assert common not in row["text"]
    assert rare in got.loc[2, "text"]
    # synthesized nav lines also obey the per-host ratio on this 4-doc host
    assert (got["n_lines"] - got["n_removed"] >= 1).all()


def test_host_components_matches_oracle(ray_session):
    got = (
        web_ops.host_components(SF)
        .to_pandas()
        .sort_values("host")
        .reset_index(drop=True)
    )
    want = (
        _oracle(web_ops.sql_host_components())
        .sort_values("host")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # distributed propagation path agrees with the driver union-find
    dist = (
        web_ops.host_components(SF, cluster_mode="distributed")
        .to_pandas()
        .sort_values("host")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, dist)


def test_host_components_multi_and_singleton(ray_session, tmp_path):
    """Constructed corpus: a self-loop-only host becomes a singleton
    (own-id label); two disjoint edges form two separate components."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from action_pdf_accessibility_paddle_docker_ray.functions.fnv import fnv1a_32

    # doc 0 from source 'src1' links only to src1.example.com (self-loop);
    # doc 3 from 'alpha' links to src4.example.com (one real edge)
    t = pa.table(
        {
            "doc_id": pa.array([0, 3], pa.int64()),
            "text": pa.array(["x", "y"]),
            "lang": pa.array(["en"] * 2),
            "source": pa.array(["src1", "alpha"]),
            "n_chars": pa.array([1, 1], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = (
        web_ops.host_components(str(tmp_path))
        .to_pandas()
        .set_index("host")["comp_id"]
        .to_dict()
    )
    h_src1 = fnv1a_32("src1.example.com")
    h_alpha = fnv1a_32("alpha.example.com")
    h_src4 = fnv1a_32("src4.example.com")
    assert got["src1.example.com"] == h_src1  # singleton: own id
    assert got["alpha.example.com"] == got["src4.example.com"] == min(h_alpha, h_src4)
    assert len(got) == 3 and len(set(got.values())) == 2


def test_orc_roundtrip_and_dispatch(ray_session, tmp_path):
    """documents -> ORC sink -> sniffed read_any -> byte-equal frame;
    pruned read ships only the requested columns."""
    import pandas as pd

    from action_pdf_accessibility_paddle_docker_ray.sources import pages as P

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "orc_out")
    docs = P.read_table(sf, "documents")
    P.write_any(docs, out, fmt="orc")
    back = (
        P.read_any(out)  # extensionless dir: sniffed as orc
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    orig = docs.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(back[orig.columns.tolist()], orig)
    pruned = P.read_any(out, columns=["doc_id", "lang"], fmt="orc")
    assert set(pruned.schema().names) == {"doc_id", "lang"}


def test_orc_roundtrip_query_matches_oracle(ray_session):
    import duckdb

    from action_pdf_accessibility_paddle_docker_ray.sources import pages as P

    sf = "/root/testdata/sf0.001"
    got = (
        P.orc_roundtrip(sf)
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = (
        con.execute(P.sql_orc_roundtrip())
        .fetchdf()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_write_compacted_targets_file_size(ray_session, tmp_path):
    """Small target -> multiple near-even files; huge target -> one file;
    rows always preserved."""
    import os

    import pyarrow.dataset as pads

    from action_pdf_accessibility_paddle_docker_ray.sources import pages as P

    docs = P.read_table(SF, "documents")
    small = str(tmp_path / "small")
    n_small = P.write_compacted(docs, small, target_bytes=64 << 10)
    files = [f for f in os.listdir(small) if f.endswith(".parquet")]
    assert n_small > 1 and len(files) == n_small
    assert pads.dataset(small).count_rows() == 500
    big = str(tmp_path / "big")
    n_big = P.write_compacted(P.read_table(SF, "documents"), big,
                              target_bytes=1 << 30)
    assert n_big == 1
    assert pads.dataset(big).count_rows() == 500
