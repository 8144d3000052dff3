"""Analytics ops (pipelines/analytics.py): integer-exact PageRank,
per-language token-count deciles, quantized per-label centroids.

Each op also has a DuckDB oracle row in the driver gate; these tests pin
the semantics against tiny hand-computable references (including cases
the testdata never hits: offset id ranges, negative centroid sums)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _write_docs(tmp_path, doc_ids, texts=None, langs=None):
    n = len(doc_ids)
    t = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text": pa.array(texts or ["w " * 3] * n),
            "lang": pa.array(langs or ["en"] * n),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))


def _ref_pagerank(doc_ids, iters=5):
    from action_pdf_accessibility_paddle_docker_ray.pipelines.analytics import (
        _PR_EDGE_MUL,
        _PR_EDGE_OFF,
        _PR_OUT_DEGREE,
        _PR_SCALE,
    )

    n, m = len(doc_ids), min(doc_ids)
    init = _PR_SCALE // n
    base = (15 * init) // 100
    nodes = set(doc_ids)
    r = {d: init for d in doc_ids}
    for _ in range(iters):
        acc = {d: 0 for d in doc_ids}
        for src in doc_ids:
            share = r[src] // _PR_OUT_DEGREE
            for j in range(1, _PR_OUT_DEGREE + 1):
                dst = m + ((src - m) * _PR_EDGE_MUL + _PR_EDGE_OFF * j) % n
                if dst in nodes:
                    acc[dst] += share
        r = {d: base + (85 * acc[d]) // 100 for d in doc_ids}
    return r


def test_pagerank_matches_reference_with_offset_ids(ray_session, tmp_path):
    """Ids that don't start at 0 (min-offset edge mapping) still produce
    the loop-reference ranks, bit-exactly."""
    from action_pdf_accessibility_paddle_docker_ray.pipelines.analytics import pagerank

    ids = list(range(100, 108))
    _write_docs(tmp_path, ids)
    got = pagerank(str(tmp_path)).to_pandas().set_index("doc_id")["rank_q"]
    want = _ref_pagerank(ids)
    assert {int(k): int(v) for k, v in got.items()} == want


def test_pagerank_mass_conservation_and_determinism(ray_session):
    from action_pdf_accessibility_paddle_docker_ray.pipelines.analytics import (
        _PR_SCALE,
        pagerank,
    )

    a = pagerank(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(a) == 500
    # total mass stays within truncation loss of the full SCALE
    assert abs(int(a["rank_q"].sum()) - _PR_SCALE) < _PR_SCALE * 0.01
    b = pagerank(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_token_quantiles_matches_direct(ray_session, tmp_path):
    from action_pdf_accessibility_paddle_docker_ray.pipelines.analytics import (
        token_quantiles,
    )

    # en: counts 1..10; fr: counts {2,2,2,7}
    ids = list(range(14))
    texts = ["w " * k for k in range(1, 11)] + ["a b", "a b", "a b", "x " * 7]
    langs = ["en"] * 10 + ["fr"] * 4
    _write_docs(tmp_path, ids, texts, langs)
    got = token_quantiles(str(tmp_path)).to_pandas()
    g = got.set_index(["lang", "decile"])["n_tokens"]
    # en has cnt=10: decile k = value at rank k (1-indexed) = k
    for k in range(1, 10):
        assert g.loc[("en", k)] == k
    # fr cnt=4: rank ceil(k*4/10) -> k<=2 rank1, k<=5 rank2, k<=7 rank3, k>7 rank4
    assert g.loc[("fr", 1)] == 2 and g.loc[("fr", 5)] == 2
    assert g.loc[("fr", 7)] == 2 and g.loc[("fr", 9)] == 7
    # deciles are monotone per lang
    for lang in ("en", "fr"):
        vals = [g.loc[(lang, k)] for k in range(1, 10)]
        assert vals == sorted(vals)


def test_label_centroids_matches_numpy_with_negatives(ray_session, tmp_path):
    from action_pdf_accessibility_paddle_docker_ray.pipelines.analytics import (
        label_centroids,
    )

    rng = np.random.RandomState(7)
    vecs = (rng.rand(20, 8).astype(np.float32) - 0.8)  # mostly negative
    labels = (np.arange(20) % 3).astype(np.int32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(20), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))

    got = label_centroids(str(tmp_path)).to_pandas()
    q = np.floor(vecs.astype(np.float64) * 1_000_000 + 0.5).astype(np.int64)
    for lab in range(3):
        s = q[labels == lab].sum(axis=0)
        c = int((labels == lab).sum())
        want = np.sign(s) * (np.abs(s) // c)  # truncate toward zero
        sub = got[got["label"] == lab].sort_values("dim")
        assert list(sub["centroid_q"]) == list(want)
    assert (got["centroid_q"] < 0).any()  # the negative path is exercised


def test_countmin_one_sided_error_and_absent_probe(ray_session):
    from action_pdf_accessibility_paddle_docker_ray.pipelines.analytics import (
        countmin_tokens,
    )

    out = countmin_tokens(SF).set_index("token")
    # CM estimates never undercount
    assert (out["cm_est"] >= out["exact_c"]).all()
    # the planted absent probe has exact 0 (its est may be colliding mass)
    assert out.loc["zzz-absent", "exact_c"] == 0
    # high-frequency probes exist in the corpus
    assert out.loc["join", "exact_c"] > 0


def test_analytics_ops_empty_input(ray_session, tmp_path):
    """Empty shards (the resume/retry path) must not crash: pagerank and
    the histogram/centroid ops return 0 rows; countmin returns its fixed
    probe rows with zero counts."""
    import duckdb

    from action_pdf_accessibility_paddle_docker_ray.pipelines import analytics

    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{SF}/documents.parquet') LIMIT 0) "
        f"TO '{tmp_path}/documents.parquet' (FORMAT PARQUET)"
    )
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{SF}/embeddings.parquet') LIMIT 0) "
        f"TO '{tmp_path}/embeddings.parquet' (FORMAT PARQUET)"
    )
    sf = str(tmp_path)
    assert analytics.pagerank(sf).count() == 0
    assert analytics.token_quantiles(sf).count() == 0
    assert analytics.label_centroids(sf).count() == 0
    cm = analytics.countmin_tokens(sf)
    assert len(cm) == 12
    assert (cm["exact_c"] == 0).all() and (cm["cm_est"] == 0).all()


def test_table_profile_nulls_and_numeric_fold(ray_session, tmp_path):
    """Profile matches DuckDB on a table with planted nulls and numeric
    minima whose STRING order disagrees with numeric order (20 vs 111) —
    the cross-batch fold must stay in native dtype."""
    import duckdb

    from action_pdf_accessibility_paddle_docker_ray.pipelines.analytics import (
        table_profile,
        sql_table_profile,
    )

    t = pa.table(
        {
            "doc_id": pa.array([20, 111, 300, 4], pa.int64()),
            "text": pa.array(["b", None, "a", "c"]),
            "lang": pa.array(["en", "fr", None, "en"]),
            "source": pa.array(["s1", "s1", "s2", None]),
            "n_chars": pa.array([1, None, 3, 2], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    got = table_profile(str(tmp_path))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = (
        con.execute(sql_table_profile()).fetchdf()
        .sort_values("column").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    r = got.set_index("column")
    assert r.loc["doc_id", "min_v"] == "4" and r.loc["doc_id", "max_v"] == "300"
    assert r.loc["text", "n_null"] == 1 and r.loc["text", "n_distinct"] == 3


def test_incremental_dedup_drops_cross_half_and_new_side_dups(ray_session, tmp_path):
    """New docs whose text exists in the old half are dropped; duplicate
    texts within the new half keep the min doc_id."""
    from action_pdf_accessibility_paddle_docker_ray.pipelines.text_ops import (
        incremental_dedup,
    )

    # ids 0..3 existing, 4..7 new (split = (0+7+1)//2 = 4)
    texts = ["kept-old", "dup-with-new", "old-b", "old-c",
             "dup-with-new",        # 4: exists in old -> dropped
             "new-unique",          # 5: kept
             "new-dup", "new-dup"]  # 6,7: new-side dup -> keep 6
    _write_docs(tmp_path, list(range(8)), texts)
    out = incremental_dedup(str(tmp_path)).to_pandas().sort_values("doc_id")
    assert list(out["doc_id"]) == [5, 6]
    assert set(out["text"]) == {"new-unique", "new-dup"}


def test_domain_quota_binds_and_is_hash_deterministic(ray_session, tmp_path):
    from action_pdf_accessibility_paddle_docker_ray.pipelines.sampling import (
        _QUOTA_K,
        domain_quota_sample,
    )

    # one source with 3x the quota, one under it
    n = _QUOTA_K * 3
    ids = list(range(n + 5))
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(["x"] * len(ids)),
            "lang": pa.array(["en"] * len(ids)),
            "source": pa.array(["big"] * n + ["small"] * 5),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = domain_quota_sample(str(tmp_path)).to_pandas()
    g = out.groupby("source").size()
    assert g["big"] == _QUOTA_K and g["small"] == 5
    out2 = domain_quota_sample(str(tmp_path)).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values(["source", "rk"]).reset_index(drop=True),
        out2.sort_values(["source", "rk"]).reset_index(drop=True),
    )


def test_dup_components_equals_union_find(ray_session):
    """The public distributed-propagation components match the driver
    union-find on the same simhash pair set (min-id rep per component)."""
    from action_pdf_accessibility_paddle_docker_ray.pipelines.dedup_ops import (
        _cluster_pairs,
        dup_components,
        simhash_pairs,
    )

    pairs = simhash_pairs(SF)
    want = _cluster_pairs(sorted({(int(a), int(b)) for a, b in
                                  zip(pairs["a"], pairs["b"])}))
    got = dup_components(SF)  # default: driver union-find
    assert dict(zip(got["doc_id"], got["rep_id"])) == want
    got_dist = dup_components(SF, distributed=True)
    assert dict(zip(got_dist["doc_id"], got_dist["rep_id"])) == want
    # reps are component minima and label themselves
    r = dict(zip(got["doc_id"], got["rep_id"]))
    assert all(r[rep] == rep for rep in set(r.values()))


def test_text_normalize_matches_duckdb(ray_session, tmp_path):
    """Normalization regex chain agrees with the SQL oracle on punctuation,
    whitespace runs, tabs/newlines, and a non-ASCII character."""
    import duckdb

    from action_pdf_accessibility_paddle_docker_ray.pipelines.text_ops import (
        sql_text_normalize,
        text_normalize,
    )

    texts = ["Hello, World!!", "a\t b\n\n c", "  trim me  ", "café #1", ""]
    _write_docs(tmp_path, list(range(len(texts))), texts)
    got = (
        text_normalize(str(tmp_path)).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = (
        con.execute(sql_text_normalize()).fetchdf()
        .sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got.loc[0, "norm_text"] == "hello world"
    assert got.loc[1, "norm_text"] == "a b c"
    assert got.loc[2, "norm_text"] == "trim me"


def _write_emb(tmp_path, vec_ids, vecs, labels=None):
    t = pa.table(
        {
            "vec_id": pa.array(vec_ids, pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(labels or [0] * len(vec_ids), pa.int32()),
        }
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))


def test_approx_quantiles_matches_oracle_and_binds(ray_session):
    """sf0.001 run: sample smaller than the table (the sampler binds),
    deciles bit-match the DuckDB replay of filter + norm + rank."""
    import duckdb

    from action_pdf_accessibility_paddle_docker_ray.pipelines.analytics import (
        approx_quantiles,
        sql_approx_quantiles,
    )

    got = approx_quantiles(SF)
    assert list(got["decile"]) == list(range(1, 10))
    assert (got["value_q"].diff().dropna() >= 0).all()  # monotone deciles
    m = int(got["n_sample"].iloc[0])
    assert 0 < m < 500  # the hash threshold binds on the 500-row table
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF}/embeddings.parquet')"
    )
    want = con.execute(sql_approx_quantiles()).fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )


def test_approx_quantiles_small_table_full_sample(ray_session, tmp_path):
    """target >= n: threshold saturates, every row sampled, deciles are
    the exact order statistics (hand-computed on known norms)."""
    from action_pdf_accessibility_paddle_docker_ray.pipelines.analytics import (
        approx_quantiles,
    )

    # squared micro-norms: (k * 1e6)^2 for k = 1..10
    vecs = [[float(k)] + [0.0] * 3 for k in range(1, 11)]
    _write_emb(tmp_path, list(range(10)), vecs)
    got = approx_quantiles(str(tmp_path), target=1000)
    assert int(got["n_sample"].iloc[0]) == 10
    # rank ceil(d*10/10) = d  ->  value (d * 1e6)^2
    want = [(d * 1_000_000) ** 2 for d in range(1, 10)]
    assert list(got["value_q"]) == want


def test_key_skew_profile_matches_oracle(ray_session):
    import duckdb

    from action_pdf_accessibility_paddle_docker_ray.pipelines.analytics import (
        key_skew_profile,
        sql_key_skew_profile,
    )

    got = key_skew_profile(SF)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    want = con.execute(sql_key_skew_profile()).fetchdf()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert list(got["rank"]) == list(range(1, len(got) + 1))
    assert (got["n_rows"].diff().dropna() <= 0).all()  # descending counts


def test_key_skew_profile_planted_hot_key(ray_session, tmp_path):
    """A planted 80%-hot key dominates rank 1 with the right milli-share."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from action_pdf_accessibility_paddle_docker_ray.pipelines.analytics import (
        key_skew_profile,
    )

    users = [7] * 80 + list(range(100, 120))
    t = pa.table(
        {
            "event_id": pa.array(range(len(users)), pa.int64()),
            "ts": pa.array([0] * len(users), pa.int64()),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(["x"] * len(users)),
            "value": pa.array([0.0] * len(users)),
            "props": pa.array(["{}"] * len(users)),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = key_skew_profile(str(tmp_path))
    assert int(got.loc[0, "user_id"]) == 7
    assert int(got.loc[0, "n_rows"]) == 80
    assert int(got.loc[0, "pct_milli"]) == 800


def test_label_quantiles_matches_oracle_and_binds(ray_session):
    import duckdb

    from action_pdf_accessibility_paddle_docker_ray.pipelines.analytics import (
        label_quantiles,
        sql_label_quantiles,
    )

    got = label_quantiles(SF)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF}/embeddings.parquet')"
    )
    want = con.execute(sql_label_quantiles()).fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )
    # one decile row set per label; per-group sampler binds (sample
    # smaller than the group)
    assert set(got.groupby("label").size()) == {9}
    assert (got["n_sample"] > 0).all()
    per_label = got.drop_duplicates("label")
    assert (per_label["n_sample"] < 50).all()
    # deciles monotone within each label
    for _, g in got.groupby("label"):
        assert (g.sort_values("decile")["value_q"].diff().dropna() >= 0).all()
