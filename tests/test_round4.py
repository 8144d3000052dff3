"""Round-4 tests.

1. The ``grouped_block_map`` hot-key invariant: after ``ds.sort(keys)``,
   every distinct key tuple's rows live in exactly ONE block, even when
   that key's rows are far larger than ``DataContext.target_max_block_size``.
   ~20 oracled operators depend on this; a violation at scale would be
   silent corruption, so we pin it adversarially here (see
   ``pipelines/util.py`` for the source-level proof in Ray 2.49.2).
"""

import numpy as np
import pandas as pd
import pytest
import ray.data

from action_pdf_accessibility_paddle_docker_ray.pipelines.util import grouped_block_map


@pytest.fixture()
def tiny_blocks():
    """Force a target block size far below one hot key's row bytes."""
    ctx = ray.data.DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 64 * 1024  # 64 KiB
    yield ctx
    ctx.target_max_block_size = old


def _hot_key_frame(n_hot: int, hot_key: int, n_cold: int, n_keys: int, seed: int):
    rng = np.random.default_rng(seed)
    keys = np.concatenate(
        [
            np.full(n_hot, hot_key, dtype=np.int64),
            rng.integers(0, n_keys, n_cold),
        ]
    )
    vals = rng.integers(0, 1 << 30, n_hot + n_cold).astype(np.int64)
    ids = np.arange(n_hot + n_cold, dtype=np.int64)
    df = pd.DataFrame({"k": keys, "id": ids, "v": vals})
    # Shuffle rows so the hot key is interleaved across input blocks.
    return df.sample(frac=1.0, random_state=seed).reset_index(drop=True)


def _from_pandas_sharded(df: pd.DataFrame, shard: int) -> ray.data.Dataset:
    return ray.data.from_pandas(
        [df.iloc[i : i + shard] for i in range(0, len(df), shard)]
    )


@pytest.mark.parametrize("hot_key", [0, 250, 10_000_000])
def test_hot_key_single_block_invariant(ray_session, tiny_blocks, hot_key):
    """A 120k-row key (~2.8 MB >> the 64 KiB target) must form ONE group,
    whether it sorts to the start, middle, or end of the key space."""

    # Local closure: cloudpickle ships it by value (the test module is not
    # importable from Ray workers).
    def group_summary(g: pd.DataFrame) -> pd.DataFrame:
        """Winner-picker + integrity checksum: splitting a group across
        blocks would duplicate its key row and break n / checksum / winner."""
        return pd.DataFrame(
            {
                "k": [g["k"].iloc[0]],
                "n": [len(g)],
                "winner": [int(g["id"].min())],
                "checksum": [int(g["v"].sum())],
            }
        )

    df = _hot_key_frame(120_000, hot_key, 30_000, 500, seed=hot_key % 97)
    ds = _from_pandas_sharded(df, 10_000)
    out = grouped_block_map(ds, ["k"], group_summary).to_pandas()

    expected = (
        df.groupby("k", sort=True)
        .agg(n=("id", "size"), winner=("id", "min"), checksum=("v", "sum"))
        .reset_index()
    )
    got = out.sort_values("k").reset_index(drop=True)
    assert len(got) == len(expected), "a key was split across blocks"
    assert (got["k"].values == expected["k"].values).all()
    assert (got["n"].values == expected["n"].values).all()
    assert (got["winner"].values == expected["winner"].values).all()
    assert (got["checksum"].values == expected["checksum"].values).all()


def test_hot_key_multi_column_sort(ray_session, tiny_blocks):
    """Same invariant for a composite (a, b) key — the exact shape the
    bucketed dedup/join ops use."""
    rng = np.random.default_rng(7)
    n_hot, n_cold = 100_000, 20_000
    a = np.concatenate([np.full(n_hot, 42), rng.integers(0, 60, n_cold)])
    b = np.concatenate([np.full(n_hot, 7), rng.integers(0, 9, n_cold)])
    df = pd.DataFrame(
        {
            "a": a.astype(np.int64),
            "b": b.astype(np.int64),
            "id": np.arange(n_hot + n_cold, dtype=np.int64),
        }
    ).sample(frac=1.0, random_state=7).reset_index(drop=True)
    ds = _from_pandas_sharded(df, 8_000)

    def summary(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "a": [g["a"].iloc[0]],
                "b": [g["b"].iloc[0]],
                "n": [len(g)],
                "winner": [int(g["id"].min())],
            }
        )

    out = grouped_block_map(ds, ["a", "b"], summary).to_pandas()
    expected = (
        df.groupby(["a", "b"], sort=True)
        .agg(n=("id", "size"), winner=("id", "min"))
        .reset_index()
    )
    got = out.sort_values(["a", "b"]).reset_index(drop=True)
    assert len(got) == len(expected)
    assert (got["n"].values == expected["n"].values).all()
    assert (got["winner"].values == expected["winner"].values).all()


def test_hot_key_pair_emitter(ray_session, tiny_blocks):
    """A pair-emitter (the LSH-bucket shape, drop_singletons=True): a split
    group would lose cross-fragment pairs.  Uses a 3000-row hot bucket whose
    string payload (~3000 x 60 B = 180 KB > 64 KiB target) exceeds one block,
    plus many singleton buckets."""
    rng = np.random.default_rng(11)
    n_hot, n_single = 3_000, 5_000
    bucket = np.concatenate(
        [np.full(n_hot, 999_999), 1 + np.arange(n_single)]
    ).astype(np.int64)
    ids = np.arange(n_hot + n_single, dtype=np.int64)
    pad = "x" * 60
    df = pd.DataFrame({"bucket": bucket, "id": ids, "payload": [pad] * len(ids)})
    df = df.sample(frac=1.0, random_state=11).reset_index(drop=True)
    ds = _from_pandas_sharded(df, 1_000)

    def adjacent_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """Emit consecutive (sorted-id) pairs: exactly n-1 pairs per group —
        any split fragment yields strictly fewer in total."""
        s = np.sort(g["id"].values)
        return pd.DataFrame({"lo": s[:-1], "hi": s[1:]})

    out = grouped_block_map(
        ds, ["bucket"], adjacent_pairs, drop_singletons=True
    ).to_pandas()
    assert len(out) == n_hot - 1
    hot_ids = np.sort(df.loc[df["bucket"] == 999_999, "id"].values)
    got = out.sort_values("lo").reset_index(drop=True)
    assert (got["lo"].values == hot_ids[:-1]).all()
    assert (got["hi"].values == hot_ids[1:]).all()


# ---------------------------------------------------------------------------
# connected components: auto-switch + dataset-resident propagation
# ---------------------------------------------------------------------------

def _random_pair_graph(seed: int, n_nodes: int, n_edges: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    a = rng.integers(0, n_nodes, n_edges)
    b = rng.integers(0, n_nodes, n_edges)
    m = a != b
    lo, hi = np.minimum(a[m], b[m]), np.maximum(a[m], b[m])
    return pd.DataFrame({"a": lo.astype("int64"), "b": hi.astype("int64")})


def test_cluster_components_auto_switch_equivalence(ray_session):
    """cluster_components must return identical components in driver mode,
    distributed mode, and the auto mode forced onto the distributed path
    (driver_max_pairs=0 — i.e. no pair row may reach the driver)."""
    from action_pdf_accessibility_paddle_docker_ray.pipelines.dedup_ops import (
        _cluster_pairs,
        cluster_components,
    )
    import ray.data

    pair_df = _random_pair_graph(3, n_nodes=400, n_edges=300)
    want = _cluster_pairs(
        sorted({(int(a), int(b)) for a, b in zip(pair_df["a"], pair_df["b"])})
    )

    for kwargs in (
        {"cluster_mode": "driver"},
        {"cluster_mode": "distributed"},
        {"cluster_mode": "auto", "driver_max_pairs": 0},  # forces distributed
        {"cluster_mode": "auto"},  # small pair set -> driver
    ):
        got = cluster_components(ray.data.from_pandas(pair_df), **kwargs)
        assert dict(zip(got["doc_id"], got["rep_id"])) == want, kwargs


def test_cluster_components_rejects_unknown_mode(ray_session):
    from action_pdf_accessibility_paddle_docker_ray.pipelines.dedup_ops import (
        cluster_components,
    )
    import ray.data

    with pytest.raises(ValueError):
        cluster_components(
            ray.data.from_pandas(pd.DataFrame({"a": [1], "b": [2]})),
            cluster_mode="nope",
        )


def test_dedup_corpus_antijoin_switch(ray_session):
    """drop_broadcast_max=0 forces the grouped anti-join filter; it must
    return exactly the broadcast path's keep set."""
    from action_pdf_accessibility_paddle_docker_ray.pipelines.dedup_ops import dedup_corpus

    sf = "/root/testdata/sf0.001"
    a = dedup_corpus(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        dedup_corpus(sf, drop_broadcast_max=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_table_profile_sketch_mode(ray_session):
    """exact=False swaps the distinct leg for the HLL sketch: every
    non-distinct column must be unchanged, and each n_distinct must fall
    within the sketch's documented error (p=12 → ~1.6% σ; assert 6σ)."""
    from action_pdf_accessibility_paddle_docker_ray.pipelines.analytics import table_profile

    sf = "/root/testdata/sf0.01"
    ex = table_profile(sf).set_index("column")
    sk = table_profile(sf, exact=False).set_index("column")
    pd.testing.assert_frame_equal(
        ex.drop(columns=["n_distinct"]), sk.drop(columns=["n_distinct"])
    )
    for col in ex.index:
        true, est = int(ex.loc[col, "n_distinct"]), int(sk.loc[col, "n_distinct"])
        assert abs(est - true) <= max(2, 0.10 * true), (col, true, est)


# ---------------------------------------------------------------------------
# resumable sinks for the expensive op families
# ---------------------------------------------------------------------------

def _read_buckets(out_dir: str) -> pd.DataFrame:
    import glob

    import pyarrow.dataset as pads

    dirs = sorted(glob.glob(f"{out_dir}/bucket-*"))
    frames = [pads.dataset(d).to_table().to_pandas() for d in dirs]
    return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()


def test_dedup_corpus_resumable_kill_restart(ray_session, tmp_path):
    """Kill after 3 of 8 buckets, restart: phase-A state is reused, only
    the remaining buckets run, and the union equals the direct op with no
    duplicate or missing rows."""
    from action_pdf_accessibility_paddle_docker_ray.pipelines.dedup_ops import dedup_corpus
    from action_pdf_accessibility_paddle_docker_ray.state.op_resume import (
        run_dedup_corpus_resumable,
    )

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "dc")
    r1 = run_dedup_corpus_resumable(sf, out, n_buckets=8, stop_after_buckets=3)
    assert r1["buckets_run"] == 3 and not r1["state_reused"]
    r2 = run_dedup_corpus_resumable(sf, out, n_buckets=8)
    assert r2["state_reused"] and r2["buckets_skipped"] == 3
    assert r2["buckets_run"] == 5

    got = _read_buckets(out).sort_values("doc_id").reset_index(drop=True)
    want = (
        dedup_corpus(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert got["doc_id"].is_unique

    # a third run is a full no-op
    r3 = run_dedup_corpus_resumable(sf, out, n_buckets=8)
    assert r3["buckets_skipped"] == 8 and r3["buckets_run"] == 0


def test_paragraph_dedup_resumable_kill_restart(ray_session, tmp_path):
    from action_pdf_accessibility_paddle_docker_ray.pipelines.text_ops import paragraph_dedup
    from action_pdf_accessibility_paddle_docker_ray.state.op_resume import (
        run_paragraph_dedup_resumable,
    )

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "pd")
    r1 = run_paragraph_dedup_resumable(sf, out, n_buckets=8, stop_after_buckets=2)
    assert r1["buckets_run"] == 2 and not r1["state_reused"]
    r2 = run_paragraph_dedup_resumable(sf, out, n_buckets=8)
    assert r2["state_reused"] and r2["buckets_skipped"] == 2
    assert r2["buckets_run"] == 6

    got = _read_buckets(out).sort_values("doc_id").reset_index(drop=True)
    want = (
        paragraph_dedup(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want
    )
    assert got["doc_id"].is_unique


# ---------------------------------------------------------------------------
# round-4 training-data ops
# ---------------------------------------------------------------------------

def test_doc_chunks_boundaries(ray_session, tmp_path):
    """Chunk math at the edges: 0 tokens → no chunk; exactly W → one
    chunk; W+1 → two, second covering the tail; full coverage with
    W-STEP overlap."""
    from action_pdf_accessibility_paddle_docker_ray.pipelines.text_ops import (
        _CHUNK_STEP,
        _CHUNK_W,
        doc_chunks,
    )

    toks_n = {0: 0, 1: 1, _CHUNK_W: 1, _CHUNK_W + 1: 2,
              _CHUNK_W + _CHUNK_STEP: 2, 3 * _CHUNK_STEP + _CHUNK_W: 4}
    df = pd.DataFrame(
        {
            "doc_id": pd.Series(range(len(toks_n)), dtype="int64"),
            "text": [" ".join(f"t{i}" for i in range(n)) for n in toks_n],
            "lang": "en",
            "source": "src0",
            "n_chars": pd.Series([1] * len(toks_n), dtype="int64"),
        }
    )
    df.to_parquet(tmp_path / "documents.parquet", index=False)
    out = doc_chunks(str(tmp_path)).to_pandas()
    got = out.groupby("doc_id").size().to_dict()
    want = {i: c for i, (n, c) in enumerate(zip(toks_n, toks_n.values())) if c}
    assert got == want
    # every token of the longest doc appears in some chunk, in order
    long_id = len(toks_n) - 1
    n = list(toks_n)[-1]
    chunks = out[out.doc_id == long_id].sort_values("chunk_id")
    covered = []
    for c, t in zip(chunks["chunk_id"], chunks["chunk_text"]):
        toks = t.split()
        assert toks == [f"t{i}" for i in range(c * _CHUNK_STEP, min(c * _CHUNK_STEP + _CHUNK_W, n))]
        covered.extend(toks)
    assert set(covered) == {f"t{i}" for i in range(n)}


def test_corpus_mix_weights_and_nesting(ray_session):
    """src0 (w=3.25) docs appear 3 or 4 times with the deterministic
    fraction; src1 (w=0.4) docs appear 0 or 1 times; default sources
    exactly once; copy ids are 0..n-1."""
    from action_pdf_accessibility_paddle_docker_ray.pipelines.sampling import corpus_mix

    sf = "/root/testdata/sf0.01"
    out = corpus_mix(sf).to_pandas()
    g = out.groupby(["source", "doc_id"]).size()
    for (src, _), n in g.items():
        if src == "src0":
            assert n in (3, 4)
        elif src == "src1":
            assert n == 1  # 0-copy docs have no rows at all
        else:
            assert n == 1
    # copies are a contiguous 0..n-1 range per doc
    m = out.groupby(["source", "doc_id"])["copy"].agg(["min", "max", "size"])
    assert (m["min"] == 0).all() and (m["max"] == m["size"] - 1).all()


def test_dup_components_auto_forced_distributed(ray_session, monkeypatch):
    """The public op on the real corpus with the driver bound forced to 0:
    the auto switch must take the distributed path and still match the
    driver union-find result."""
    import action_pdf_accessibility_paddle_docker_ray.pipelines.dedup_ops as dd

    sf = "/root/testdata/sf0.001"
    want = dd.dup_components(sf, cluster_mode="driver")
    monkeypatch.setattr(dd, "_DRIVER_MAX_PAIRS", 0)
    # cluster_components reads the module constant as its default
    got = dd.cluster_components(
        dd._simhash_pair_ds(sf), cluster_mode="auto", driver_max_pairs=0
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )


# --- exact substring dedup (Lee et al. 2022 keep-one semantics) ------------


def _subdup_oracle(sf: str) -> pd.DataFrame:
    import duckdb

    from action_pdf_accessibility_paddle_docker_ray.pipelines import text_ops

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    return (
        con.execute(text_ops.sql_substring_dedup())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_substring_dedup_matches_oracle(ray_session):
    from action_pdf_accessibility_paddle_docker_ray.pipelines import text_ops

    sf = "/root/testdata/sf0.001"
    want = _subdup_oracle(sf)
    got = (
        text_ops.substring_dedup(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)
    # the planted passages guarantee the dedup binds: every even doc except
    # the three per-passage keepers loses at least one full window
    assert (want["n_removed"] > 0).sum() > 100


def test_substring_dedup_join_path_equivalent(ray_session):
    """dup_broadcast_max=0 forces the bucketed-join plan (no driver-side
    dup map); results must be bit-identical to the broadcast plan."""
    from action_pdf_accessibility_paddle_docker_ray.pipelines import text_ops

    sf = "/root/testdata/sf0.001"
    want = _subdup_oracle(sf)
    got = (
        text_ops.substring_dedup(sf, dup_broadcast_max=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_substring_dedup_keeper_semantics(ray_session, tmp_path):
    """Planted corpus: three even docs share an 8-token sentence; the
    min-doc_id holder keeps it, the others lose exactly those 8 tokens."""
    from action_pdf_accessibility_paddle_docker_ray.pipelines import text_ops

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    df = pd.DataFrame(
        {
            "doc_id": pd.Series([2, 4, 6, 3], dtype="int64"),
            "text": [
                f"two pre2a pre2b {shared}",
                f"four pre4a pre4b {shared}",
                f"six pre6a pre6b {shared}",
                "short odd doc",  # odd: no augment; <8 tokens: no windows
            ],
        }
    )
    df.to_parquet(tmp_path / "documents.parquet", index=False)
    out = (
        text_ops.substring_dedup(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # doc 2 is the keeper of every shared window (the three augmented
    # passages differ per doc, so only the planted sentence dedups)
    assert out.loc[2, "n_removed"] == 0
    assert shared in out.loc[2, "text_deduped"]
    for d in (4, 6):
        assert out.loc[d, "n_removed"] == 8
        assert shared not in out.loc[d, "text_deduped"]
        # prefix and the (unique) augmented passage survive
        assert out.loc[d, "text_deduped"].startswith(
            {4: "four pre4a pre4b", 6: "six pre6a pre6b"}[d]
        )
    assert out.loc[3, "n_removed"] == 0
    assert out.loc[3, "text_deduped"] == "short odd doc"


def test_substring_dedup_resumable_kill_restart(ray_session, tmp_path):
    """Kill after 2 of 8 buckets, restart: the dup-window state is
    reused, only the remaining buckets run, and the union equals the
    direct op bit-for-bit."""
    from action_pdf_accessibility_paddle_docker_ray.pipelines.text_ops import (
        substring_dedup,
    )
    from action_pdf_accessibility_paddle_docker_ray.state.op_resume import (
        run_substring_dedup_resumable,
    )

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "sd")
    r1 = run_substring_dedup_resumable(sf, out, n_buckets=8, stop_after_buckets=2)
    assert r1["buckets_run"] == 2 and not r1["state_reused"]
    r2 = run_substring_dedup_resumable(sf, out, n_buckets=8)
    assert r2["state_reused"] and r2["buckets_skipped"] == 2
    assert r2["buckets_run"] == 6

    got = _read_buckets(out).sort_values("doc_id").reset_index(drop=True)
    want = (
        substring_dedup(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)
    assert got["doc_id"].is_unique

    r3 = run_substring_dedup_resumable(sf, out, n_buckets=8)
    assert r3["buckets_skipped"] == 8 and r3["buckets_run"] == 0


# --- dedup_keep_best --------------------------------------------------------


def test_dedup_keep_best_matches_oracle(ray_session):
    import duckdb

    from action_pdf_accessibility_paddle_docker_ray.pipelines import dedup_ops

    sf = "/root/testdata/sf0.001"
    got = (
        dedup_ops.dedup_keep_best(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = (
        con.execute(dedup_ops.sql_dedup_keep_best())
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # and the rule genuinely differs from min-id selection on this corpus
    dc = dedup_ops.dedup_corpus(sf).to_pandas()
    assert set(got["doc_id"]) != set(dc["doc_id"])
    assert len(got) == len(dc)  # same survivor count, different members


def test_dedup_keep_best_join_plan_equivalent(ray_session):
    from action_pdf_accessibility_paddle_docker_ray.pipelines import dedup_ops

    sf = "/root/testdata/sf0.001"
    a = (
        dedup_ops.dedup_keep_best(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        dedup_ops.dedup_keep_best(sf, drop_broadcast_max=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_dedup_keep_best_keeps_longest(ray_session, tmp_path):
    """Hand-built cluster: three near-identical docs of different lengths
    — the longest survives, not the lowest id."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from action_pdf_accessibility_paddle_docker_ray.pipelines import dedup_ops

    base = "alpha beta gamma delta epsilon zeta eta theta " * 20
    texts = [base, base + "iota kappa " * 30, base + "iota ", "unrelated " * 40]
    t = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["s"] * 4),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = set(
        dedup_ops.dedup_keep_best(str(tmp_path)).to_pandas()["doc_id"]
    )
    assert 1 in got  # the longest cluster member wins
    assert 0 not in got and 2 not in got
    assert 3 in got  # unclustered doc untouched


# --- resumable pagerank -----------------------------------------------------


def test_pagerank_resumable_kill_restart(ray_session, tmp_path):
    """Kill after 2 of 5 iterations; the restart resumes from iteration 2
    and the final ranks are bit-identical to the straight pipeline."""
    import pyarrow.dataset as pads

    from action_pdf_accessibility_paddle_docker_ray.pipelines.analytics import pagerank
    from action_pdf_accessibility_paddle_docker_ray.state.op_resume import (
        run_pagerank_resumable,
    )

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "pr")
    r1 = run_pagerank_resumable(sf, out, iters=5, stop_after_iters=2)
    assert r1["resumed_from"] == 0 and r1["iters_run"] == 2
    r2 = run_pagerank_resumable(sf, out, iters=5)
    assert r2["resumed_from"] == 2 and r2["iters_run"] == 3
    got = (
        pads.dataset(str(tmp_path / "pr" / "ranks"))
        .to_table()
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = pagerank(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["doc_id", "rank_q"]], want, check_dtype=False)
    # a third run with everything committed re-runs nothing
    r3 = run_pagerank_resumable(sf, out, iters=5)
    assert r3["resumed_from"] == 5 and r3["iters_run"] == 0


# --- incremental_fuzzy_dedup ------------------------------------------------


def test_incremental_fuzzy_dedup_matches_oracle(ray_session):
    import duckdb

    from action_pdf_accessibility_paddle_docker_ray.pipelines import dedup_ops

    sf = "/root/testdata/sf0.001"
    got = (
        dedup_ops.incremental_fuzzy_dedup(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = (
        con.execute(dedup_ops.sql_incremental_fuzzy_dedup())
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the screen binds: some new docs are near-dups of the existing half
    n_new = 250
    assert 0 < len(got) < n_new
    # anti-join path identical
    b = (
        dedup_ops.incremental_fuzzy_dedup(sf, drop_broadcast_max=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, b)


def test_incremental_fuzzy_dedup_planted(ray_session, tmp_path):
    """A new doc that is a light edit of an existing doc is dropped; a
    genuinely novel new doc survives."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from action_pdf_accessibility_paddle_docker_ray.pipelines import dedup_ops

    base = "the quick brown fox jumps over the lazy dog again and again " * 10
    novel = "completely different content about distributed dataflow systems " * 10
    # ids 0,1 = existing; 10,11 = new (split = (0+11+1)//2 = 6)
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 10, 11], pa.int64()),
            "text": pa.array([base, novel[::-1], base + "tail edit", novel]),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["s"] * 4),
            "n_chars": pa.array([1] * 4, pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = set(
        dedup_ops.incremental_fuzzy_dedup(str(tmp_path)).to_pandas()["doc_id"]
    )
    assert 10 not in got  # near-dup of existing doc 0
    assert 11 in got  # novel content survives


# --- customer_big_orders_left_join ------------------------------------------


def test_left_join_matches_oracle_and_outer_leg_binds(ray_session):
    import duckdb

    from action_pdf_accessibility_paddle_docker_ray.pipelines import joins

    sf = "/root/testdata/sf0.001"
    got = (
        joins.customer_big_orders_left_join(sf)
        .to_pandas()
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    want = (
        con.execute(joins.sql_customer_big_orders_left_join())
        .fetchdf()
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # outer-leg binding: some customers have no big order, and an inner
    # join would have lost them
    assert got["n_no_big"].sum() > 0
    assert got["n_customers"].sum() == 150


# --- empty-shard safety (resume/retry path) ---------------------------------


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("empty_sf")
    pq.write_table(
        pa.table(
            {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string()),
             "lang": pa.array([], pa.string()), "source": pa.array([], pa.string()),
             "n_chars": pa.array([], pa.int64())}
        ), str(d / "documents.parquet"))
    pq.write_table(
        pa.table(
            {"vec_id": pa.array([], pa.int64()),
             "embedding": pa.array([], pa.list_(pa.float32())),
             "label": pa.array([], pa.int32())}
        ), str(d / "embeddings.parquet"))
    pq.write_table(
        pa.table(
            {"event_id": pa.array([], pa.int64()), "ts": pa.array([], pa.int64()),
             "user_id": pa.array([], pa.int64()),
             "event_type": pa.array([], pa.string()),
             "value": pa.array([], pa.float64()),
             "props": pa.array([], pa.string())}
        ), str(d / "events.parquet"))
    pq.write_table(
        pa.table(
            {"c_custkey": pa.array([], pa.int64()), "c_name": pa.array([], pa.string()),
             "c_nationkey": pa.array([], pa.int64()),
             "c_acctbal": pa.array([], pa.float64()),
             "c_mktsegment": pa.array([], pa.string())}
        ), str(d / "customer.parquet"))
    pq.write_table(
        pa.table(
            {"o_orderkey": pa.array([], pa.int64()), "o_custkey": pa.array([], pa.int64()),
             "o_orderstatus": pa.array([], pa.string()),
             "o_totalprice": pa.array([], pa.float64()),
             "o_orderdate": pa.array([], pa.timestamp("us")),
             "o_orderpriority": pa.array([], pa.string())}
        ), str(d / "orders.parquet"))
    return str(d)


@pytest.mark.parametrize(
    "opname",
    ["approx_quantiles", "key_skew_profile", "host_boilerplate",
     "host_components", "dedup_keep_best", "incremental_fuzzy_dedup",
     "knn_search_sq", "embedding_quantize",
     "customer_big_orders_left_join", "orc_roundtrip"],
)
def test_session_ops_empty_shard_safe(ray_session, empty_sf, opname):
    """Every op added this session returns 0 rows (no crash) on empty
    input tables — the shape a resume/retry shard presents."""
    from action_pdf_accessibility_paddle_docker_ray.pipelines import (
        analytics,
        dedup_ops,
        joins,
        similarity,
        web_ops,
    )
    from action_pdf_accessibility_paddle_docker_ray.sources import pages as P

    fns = {
        "approx_quantiles": analytics.approx_quantiles,
        "key_skew_profile": analytics.key_skew_profile,
        "host_boilerplate": web_ops.host_boilerplate,
        "host_components": web_ops.host_components,
        "dedup_keep_best": dedup_ops.dedup_keep_best,
        "incremental_fuzzy_dedup": dedup_ops.incremental_fuzzy_dedup,
        "knn_search_sq": similarity.knn_search_sq,
        "embedding_quantize": similarity.embedding_quantize,
        "customer_big_orders_left_join": joins.customer_big_orders_left_join,
        "orc_roundtrip": P.orc_roundtrip,
    }
    r = fns[opname](empty_sf)
    if hasattr(r, "to_pandas"):
        r = r.to_pandas()
    assert len(r) == 0


# --- contrastive_pairs ------------------------------------------------------


def test_contrastive_pairs_matches_oracle(ray_session):
    import duckdb

    from action_pdf_accessibility_paddle_docker_ray.pipelines import dedup_ops

    sf = "/root/testdata/sf0.001"
    got = (
        dedup_ops.contrastive_pairs(sf)
        .to_pandas()
        .sort_values(["anchor_id", "positive_id"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = (
        con.execute(dedup_ops.sql_contrastive_pairs())
        .fetchdf()
        .sort_values(["anchor_id", "positive_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) > 0  # clusters exist, so triplets exist
    # structural invariants: positive != anchor; negative != both and
    # inside the id range
    assert (got["positive_id"] != got["anchor_id"]).all()
    assert (got["negative_id"] != got["anchor_id"]).all()
    assert (got["negative_id"] != got["positive_id"]).all()
    assert got["negative_id"].between(0, 499).all()


def test_contrastive_pairs_exclusion_shift_exact():
    """The two-exclusion index arithmetic enumerates exactly the id range
    minus {anchor, positive} as k sweeps 0..n-3."""
    import numpy as np

    lo, n, a, p = 0, 10, 3, 7
    seen = []
    for k in range(n - 2):
        x = lo + k
        x += x >= min(a, p)
        x += x >= max(a, p)
        seen.append(x)
    assert seen == [0, 1, 2, 4, 5, 6, 8, 9]


# --- dedup_eval -------------------------------------------------------------


def test_dedup_eval_perfect_recall_at_gate_scale(ray_session):
    """The LSH banding finds EVERY exact-Jaccard pair on the gate corpus
    — r=3/b=42's ~2e-8 boundary-miss claim, measured rather than
    asserted; the SQL oracle encodes recall == 1000 so any future miss
    fails the hash match."""
    import duckdb

    from action_pdf_accessibility_paddle_docker_ray.pipelines import dedup_ops

    sf = "/root/testdata/sf0.001"
    got = dedup_ops.dedup_eval(sf).reset_index(drop=True)
    assert int(got.loc[0, "n_missed"]) == 0
    assert int(got.loc[0, "recall_milli"]) == 1000
    assert int(got.loc[0, "precision_milli"]) == 1000
    assert int(got.loc[0, "n_truth_pairs"]) > 0  # the eval binds
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(dedup_ops.sql_dedup_eval()).fetchdf()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_dedup_eval_sampler_binds(ray_session):
    """max_docs below the corpus size engages the deterministic doc
    sampler; metrics still self-consistent on the subsample."""
    from action_pdf_accessibility_paddle_docker_ray.pipelines import dedup_ops

    got = dedup_ops.dedup_eval("/root/testdata/sf0.001", max_docs=200)
    n = int(got.loc[0, "n_docs"])
    assert 0 < n < 500
    assert int(got.loc[0, "recall_milli"]) == 1000
