"""Round-3 additions: ADVICE bug fixes (range-join empty-orders class,
payload-miss handling, raster gating, label-propagation fallback) and the
scale-safety work items from VERDICT r2."""

import datetime as dt

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# ADVICE fixes
# ---------------------------------------------------------------------------

def test_range_join_key_with_zero_orders(ray_session, tmp_path):
    """LEFT-JOIN semantics: an event key with no orders at all must yield
    n_orders_7d=0 / last=-1, not IndexError (ADVICE r2, medium)."""
    from action_pdf_accessibility_paddle_docker_ray.pipelines.joins import (
        events_orders_range_join,
    )

    ts = dt.datetime(2026, 3, 1)
    events = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            # user 0 → custkey 1 (has an order), user 6 → custkey 7 (none)
            "user_id": pa.array([0, 6, 6], pa.int64()),
            "ts": pa.array([ts, ts, ts + dt.timedelta(days=2)], pa.timestamp("us")),
        }
    )
    orders = pa.table(
        {
            "o_custkey": pa.array([1], pa.int64()),
            "o_orderdate": pa.array([ts - dt.timedelta(days=1)], pa.timestamp("us")),
        }
    )
    pq.write_table(events, str(tmp_path / "events.parquet"))
    pq.write_table(orders, str(tmp_path / "orders.parquet"))

    out = events_orders_range_join(str(tmp_path)).to_pandas().set_index("event_id")
    assert out.loc[1, "n_orders_7d"] == 1
    assert out.loc[2, "n_orders_7d"] == 0 and out.loc[2, "last_order_ts_us"] == -1
    assert out.loc[3, "n_orders_7d"] == 0 and out.loc[3, "last_order_ts_us"] == -1


def test_attach_payload_missing_doc_yields_valid_empty_payload(ray_session):
    """A pair whose doc lookup misses must carry the VALID empty payload
    '|' (unpackable), not '' (which _unpack_payload rejects)."""
    import ray.data

    from action_pdf_accessibility_paddle_docker_ray.pipelines.dedup_ops import (
        _attach_payload,
        _unpack_payload,
    )

    docs = pd.DataFrame({"doc_id": [1], "payload": ["|text one"]})
    pairs = pd.DataFrame({"a": [1], "b": [999], "payload_a": "", "payload_b": ""})
    step = _attach_payload(
        ray.data.from_pandas(pairs), ray.data.from_pandas(docs), "a", "payload_a",
        dedupe=True,
    )
    step = _attach_payload(step, ray.data.from_pandas(docs), "b", "payload_b")
    got = step.to_pandas()
    assert got.loc[0, "payload_b"] == "|"
    sig, text = _unpack_payload(got.loc[0, "payload_b"])
    assert sig is None and text == ""


def test_raster_formula_image_always_maps_to_render_error():
    """JPEG/PNG magic bytes must raise NotImplementedError unconditionally
    (no formula model is wired even where cv2 imports), so run_mathml maps
    them to EC_ENGINE_RENDER instead of an uncaught UnicodeDecodeError."""
    from action_pdf_accessibility_paddle_docker_ray.cli import (
        _formula_image_to_latex,
    )

    for data in (b"\xff\xd8\xff\xe0junk\x9c\xff", b"\x89PNG\r\n\x1a\n\x00\xffbits"):
        with pytest.raises(NotImplementedError):
            _formula_image_to_latex(data)
    # non-raster payloads still decode as LaTeX text
    assert _formula_image_to_latex(b" x^2 ") == "x^2"


def test_label_propagation_falls_back_when_not_converged():
    """With max_iters too small for the chain's diameter the distributed
    propagation must fall back to the driver union-find (correct reps),
    never silently return wrong labels."""
    from action_pdf_accessibility_paddle_docker_ray.pipelines.dedup_ops import (
        _cluster_pairs,
        _cluster_pairs_distributed,
    )

    nodes = list(range(0, 120, 10))  # path graph 0-10-20-...-110
    pairs = pd.DataFrame({"a": nodes[:-1], "b": nodes[1:]})
    dist = _cluster_pairs_distributed(pairs, max_iters=2)
    got = dict(zip(dist["doc_id"], dist["rep_id"]))
    want = _cluster_pairs([tuple(r) for r in pairs.to_numpy()])
    assert got == want
    assert all(v == 0 for v in got.values())


# ---------------------------------------------------------------------------
# scale-safe stale filter (VERDICT r2 #1)
# ---------------------------------------------------------------------------

def test_bloom_filter_membership_and_fpr():
    from action_pdf_accessibility_paddle_docker_ray.functions.bloom import UrlBloom

    keys = np.array([f"https://dup.example/{i}" for i in range(5000)], dtype=object)
    other = np.array([f"https://uniq.example/{i}" for i in range(50000)], dtype=object)
    bloom = UrlBloom(len(keys))
    bloom.add(keys)
    assert bloom.contains(keys).all()  # zero false negatives, ever
    fpr = bloom.contains(other).mean()
    assert fpr < 0.01, fpr  # 16 bits/key, k=8 → ~6e-4 expected


def test_zero_broadcast_bound_uses_bloom_and_matches_oracle(ray_session, tmp_path):
    """Force _WINNER_BROADCAST_MAX=0: the pipeline must complete WITHOUT a
    driver-side dup table (BloomRoute) and produce byte-identical output."""
    import ray.data

    import action_pdf_accessibility_paddle_docker_ray.pipelines.extract as ex
    from action_pdf_accessibility_paddle_docker_ray.corpus import generate_pages
    from action_pdf_accessibility_paddle_docker_ray.oracle import oracle_extract

    t = generate_pages(120, seed=7)
    path = str(tmp_path / "pages.parquet")
    pq.write_table(t, path)

    old = ex._WINNER_BROADCAST_MAX
    ex._WINNER_BROADCAST_MAX = 0
    try:
        route = ex._stale_filter(path)
        assert isinstance(route, ex.BloomRoute)
        out = ex.extract_pipeline(path, concurrency=(1, 2)).to_pandas()
    finally:
        ex._WINNER_BROADCAST_MAX = old

    golden = {d["url"]: d["text"] for d in oracle_extract(t)}
    assert len(out) == len(golden)
    for r in out.itertuples(index=False):
        assert r.text == golden[r.url], r.url


def test_zero_broadcast_bound_distributed_scan_matches(ray_session, tmp_path):
    """Same forced-Bloom run through the DISTRIBUTED winner scan (driver
    only ever sees per-block count rows and position batches)."""
    import action_pdf_accessibility_paddle_docker_ray.pipelines.extract as ex
    from action_pdf_accessibility_paddle_docker_ray.corpus import generate_pages
    from action_pdf_accessibility_paddle_docker_ray.oracle import oracle_extract

    t = generate_pages(80, seed=11)
    path = str(tmp_path / "pages.parquet")
    pq.write_table(t, path)

    old_max, old_small = ex._WINNER_BROADCAST_MAX, ex._SMALL_INPUT_BYTES
    ex._WINNER_BROADCAST_MAX, ex._SMALL_INPUT_BYTES = 0, 0
    try:
        route = ex._stale_filter(path)
        assert isinstance(route, ex.BloomRoute)
        out = ex.extract_pipeline(
            path, concurrency=(1, 2), _winners_ref=route
        ).to_pandas()
    finally:
        ex._WINNER_BROADCAST_MAX, ex._SMALL_INPUT_BYTES = old_max, old_small

    golden = {d["url"]: d["text"] for d in oracle_extract(t)}
    assert len(out) == len(golden)
    for r in out.itertuples(index=False):
        assert r.text == golden[r.url], r.url


# ---------------------------------------------------------------------------
# native Arrow nested spans/formulas (VERDICT r2 #2)
# ---------------------------------------------------------------------------

def test_nested_output_explodes_match_json_path(ray_session, tmp_path):
    """extract_pipeline(output='nested') + Arrow-flatten explodes must give
    the same flat spans/formulas tables as the JSON docs contract."""
    from action_pdf_accessibility_paddle_docker_ray.corpus import generate_pages
    from action_pdf_accessibility_paddle_docker_ray.pipelines.extract import (
        extract_pipeline,
        formulas_dataset,
        spans_dataset,
    )

    t = generate_pages(60, seed=5)
    path = str(tmp_path / "pages.parquet")
    pq.write_table(t, path)

    docs_json = extract_pipeline(path, concurrency=(1, 2))
    docs_nested = extract_pipeline(path, concurrency=(1, 2), output="nested")

    key = ["url", "page_no", "reading_order"]
    a = spans_dataset(docs_json).to_pandas().sort_values(key).reset_index(drop=True)
    b = spans_dataset(docs_nested).to_pandas().sort_values(key).reset_index(drop=True)
    assert len(a) > 0 and a.equals(b)

    fk = ["url", "formula_id"]
    fa = formulas_dataset(docs_json).to_pandas().sort_values(fk).reset_index(drop=True)
    fb = formulas_dataset(docs_nested).to_pandas().sort_values(fk).reset_index(drop=True)
    assert len(fa) > 0 and fa.equals(fb)


def test_nested_docs_scalars_match_json_docs(ray_session, tmp_path):
    """Scalar doc columns are identical between the two output modes."""
    from action_pdf_accessibility_paddle_docker_ray.corpus import generate_pages
    from action_pdf_accessibility_paddle_docker_ray.pipelines.extract import (
        extract_pipeline,
    )
    from action_pdf_accessibility_paddle_docker_ray.schemas import (
        DOCS_NESTED,
        check_schema,
    )

    t = generate_pages(30, seed=13)
    path = str(tmp_path / "pages.parquet")
    pq.write_table(t, path)

    cols = ["url", "text", "n_pages", "n_regions", "status", "template_json"]
    a = (
        extract_pipeline(path, concurrency=(1, 2)).select_columns(cols)
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    nested = extract_pipeline(path, concurrency=(1, 2), output="nested")
    nt = nested.to_arrow_refs()
    import ray as _ray

    check_schema(_ray.get(nt[0]), DOCS_NESTED, where="nested docs")
    b = (
        nested.select_columns(cols)
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    assert a.equals(b)


# ---------------------------------------------------------------------------
# bounded unigram_logprob (VERDICT r2 #3)
# ---------------------------------------------------------------------------

def test_unigram_logprob_join_path_matches_broadcast(ray_session):
    """vocab_broadcast_max=0 forces the bucketed token⋈logprob join; the
    output must be bit-identical to the broadcast-dict path."""
    from action_pdf_accessibility_paddle_docker_ray.pipelines.text_ops import (
        unigram_logprob,
    )

    a = unigram_logprob(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        unigram_logprob(SF, vocab_broadcast_max=0)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert len(a) == 500
    assert a.equals(b)


# ---------------------------------------------------------------------------
# extraction SQL projections (VERDICT r2 #4)
# ---------------------------------------------------------------------------

def test_extract_meta_sql_handles_parse_error_and_counts(ray_session, tmp_path):
    """The doc-meta oracle replay must agree with the Ray pipeline on a
    corpus containing a corrupt %SDOC payload (status/parse semantics)."""
    import duckdb

    from action_pdf_accessibility_paddle_docker_ray.corpus import generate_pages
    from action_pdf_accessibility_paddle_docker_ray.pipelines.extract import (
        extract_pipeline,
    )
    from action_pdf_accessibility_paddle_docker_ray.pipelines.sql_oracles import (
        sql_extract_doc_meta,
        sql_extract_span_stats,
    )

    t = generate_pages(50, seed=21)
    bad = pa.table(
        {
            "url": ["https://bad.example/1"],
            "warc_ts": pa.array([dt.datetime(2026, 2, 1)], pa.timestamp("us")),
            "html": [b"%SDOC{not json"],
            "text": [""],
            "lang": ["en"],
        }
    )
    full = pa.concat_tables(
        [t.select(bad.column_names), bad], promote_options="default"
    )
    path = str(tmp_path / "pages.parquet")
    pq.write_table(full, path)

    got = (
        extract_pipeline(path, concurrency=(1, 2))
        .select_columns(["url", "n_pages", "n_regions", "status"])
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    con = duckdb.connect()
    want = (
        con.execute(sql_extract_doc_meta(path)).df()
        .sort_values("url").reset_index(drop=True)
    )
    assert len(got) == len(want) == 51
    assert got.loc[got["url"] == "https://bad.example/1", "status"].iloc[0] \
        == "parse_error:JSONDecodeError"
    for c in ("n_pages", "n_regions"):
        assert got[c].astype("int64").equals(want[c].astype("int64")), c
    assert got["status"].equals(want["status"])

    # span stats: SQL replay vs a pandas recount of the Ray spans
    from action_pdf_accessibility_paddle_docker_ray.pipelines.extract import (
        spans_dataset,
    )

    spans = spans_dataset(
        extract_pipeline(path, concurrency=(1, 2), output="nested")
    ).to_pandas()
    truth = (
        spans.groupby(["url", "page_no", "label"]).size().rename("n_spans")
        .reset_index()
    )
    sql_stats = con.execute(sql_extract_span_stats(path)).df()
    key = ["url", "page_no", "label"]
    truth = truth.sort_values(key).reset_index(drop=True)
    sql_stats = sql_stats.sort_values(key).reset_index(drop=True)
    assert len(truth) == len(sql_stats)
    assert truth["n_spans"].astype("int64").equals(sql_stats["n_spans"].astype("int64"))
