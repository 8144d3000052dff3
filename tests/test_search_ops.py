"""Round-4 search ops — integer-exact BM25 and SemDeDup — vs their DuckDB
oracles at sf0.001."""

import duckdb
import pandas as pd
import pytest

from action_pdf_accessibility_paddle_docker_ray.pipelines import (
    similarity,
    sql_oracles,
    text_ops,
)
from action_pdf_accessibility_paddle_docker_ray.pipelines.dedup_ops import (
    _embedding_dim,
)

SF = "/root/testdata/sf0.001"


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.execute(sql).df()


def test_bm25_search_matches_oracle(ray_session):
    got = (
        text_ops.bm25_search(SF)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    want = (
        _oracle(text_ops.sql_bm25_search())
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    # binds: every query returns ranked rows at sf0.001 (even the
    # stopword+absent-token query — "the" is not in every doc, so its idf
    # is positive; the absent token contributes 0 in both engines)
    assert len(got) > 0
    assert got["score"].gt(0).all()
    assert set(got.columns) == {"query_id", "doc_id", "rank", "score"}
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)


def test_bm25_rank_is_dense_per_query(ray_session):
    got = text_ops.bm25_search(SF).to_pandas()
    for _, g in got.groupby("query_id"):
        assert sorted(g["rank"]) == list(range(1, len(g) + 1))
        assert len(g) <= text_ops._BM25_K


def test_semantic_dedup_matches_oracle(ray_session):
    got = (
        similarity.semantic_dedup(SF)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    dim = _embedding_dim(SF)
    want = (
        _oracle(sql_oracles.sql_semantic_dedup(dim))
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)
    # binds: at τ=0.35 milli the synthetic embeddings contain within-cluster
    # near-dups, so survivors must be a strict subset
    import pyarrow.parquet as pq

    n_all = pq.read_metadata(f"{SF}/embeddings.parquet").num_rows
    assert 0 < len(got) < n_all


def test_semantic_dedup_keep_rule(ray_session):
    """Survivor set honors the any-lower-id rule: re-checking every dropped
    vector finds an earlier cluster-mate at >= τ, and no survivor has one."""
    import numpy as np
    import pyarrow.parquet as pq

    got = similarity.semantic_dedup(SF).to_pandas()
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    df = t.to_pandas().sort_values("vec_id").reset_index(drop=True)
    mat = np.stack([np.asarray(e, dtype=np.float64) for e in df["embedding"]])
    norms = np.linalg.norm(mat, axis=1)
    sums, counts = similarity._kmeans_state(SF, 16, 5)
    assign = similarity._ivf_scores(
        similarity._ivf_quantize(mat), sums, counts
    ).argmax(axis=1)
    ids = df["vec_id"].to_numpy()
    survivors = set(got["vec_id"])
    # same float ops as the op's survivors kernel: dot / outer(norms)
    cos_milli = np.round((mat @ mat.T) / np.outer(norms, norms) * 1000)
    for i, vid in enumerate(ids):
        earlier = (ids < vid) & (assign == assign[i])
        has_dup = bool((cos_milli[i][earlier] >= 350).any())
        assert (vid in survivors) == (not has_dup)


def test_dsir_sample_matches_oracle(ray_session):
    from action_pdf_accessibility_paddle_docker_ray.pipelines import text_ops

    got = (
        text_ops.dsir_sample(SF)
        .to_pandas()
        .sort_values("rk")
        .reset_index(drop=True)
    )
    want = _oracle(text_ops.sql_dsir_sample()).sort_values("rk").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns], want)
    assert len(got) == text_ops._DSIR_K
    # scores are integer milli-ratios; the top doc should be target-like
    assert got["dsir_score"].is_monotonic_decreasing or (
        got["dsir_score"].diff().dropna() <= 0
    ).all()


def test_dsir_weights_favor_target_language(ray_session):
    """English docs must dominate the selected set — the point of DSIR."""
    import duckdb

    from action_pdf_accessibility_paddle_docker_ray.pipelines import text_ops

    got = text_ops.dsir_sample(SF).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    langs = con.execute(
        "SELECT doc_id, lang FROM documents"
    ).df().set_index("doc_id")["lang"]
    frac_en_sel = (langs.loc[got["doc_id"]] == "en").mean()
    frac_en_all = (langs == "en").mean()
    assert frac_en_sel > frac_en_all


def test_embedding_quantize_matches_oracle(ray_session):
    got = (
        similarity.embedding_quantize(SF)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    want = (
        _oracle(similarity.sql_embedding_quantize())
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert len(got) == 500
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)
    # int8 range respected: max possible sqsum is dim * 255^2
    dim = int(got["dim"].iloc[0])
    assert (got["code_sqsum"] <= dim * 255 * 255).all()
    assert (got["code_sum"] >= 0).all()


def test_embedding_quantize_constant_dim_is_zero(ray_session, tmp_path):
    # a constant dimension has mx == mn -> all codes 0, never a div-by-zero
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {"vec_id": pa.array([1, 2], pa.int64()),
         "embedding": pa.array([[1.0, 5.0], [1.0, 7.0]],
                               type=pa.list_(pa.float32()))}
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    got = (
        similarity.embedding_quantize(str(tmp_path))
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    # dim 1 constant -> code 0; dim 2 spans [5,7] -> codes 0 and 255
    assert list(got["code_sum"]) == [0, 255]


def test_knn_search_sq_matches_oracle(ray_session):
    """SQ8 asymmetric search: Ray result equals the DuckDB replay of
    fit + code + reconstruct + cosine rank; quantization binds (ranking
    differs from full-precision knn for at least one query)."""
    import duckdb

    from action_pdf_accessibility_paddle_docker_ray.pipelines import similarity

    sf = "/root/testdata/sf0.001"
    got = (
        similarity.knn_search_sq(sf)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')"
    )
    want = (
        con.execute(similarity.sql_knn_search_sq())
        .fetchdf()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    full = (
        similarity.knn_search(sf)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert not got.equals(full)


def test_rerank_search_matches_oracle_and_reorders(ray_session):
    """Two-stage search: the rerank output matches the DuckDB replay of
    BM25 + candidate term counts + interaction hash, and the rerank
    genuinely changes at least one query's top result vs raw BM25."""
    import duckdb

    from action_pdf_accessibility_paddle_docker_ray.pipelines import text_ops

    sf = "/root/testdata/sf0.001"
    got = (
        text_ops.rerank_search(sf)
        .to_pandas()
        .sort_values(["query_id", "rerank"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = (
        con.execute(text_ops.sql_rerank_search())
        .fetchdf()
        .sort_values(["query_id", "rerank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    bm = text_ops.bm25_search(sf).to_pandas()
    top1_bm = bm[bm["rank"] == 1].set_index("query_id")["doc_id"]
    top1_rr = got[got["rerank"] == 1].set_index("query_id")["doc_id"]
    assert (top1_bm != top1_rr).any()
    # reranked set is always a subset of the retrieved candidates
    cand = set(zip(bm["query_id"], bm["doc_id"]))
    assert set(zip(got["query_id"], got["doc_id"])) <= cand
