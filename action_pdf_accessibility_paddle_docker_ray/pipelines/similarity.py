"""Similarity search over the embeddings table.

- ``knn_search``: brute-force cosine top-k — the exactness baseline.  The
  query matrix is broadcast once (``ray.put``), each batch does one numpy
  matmul against it and emits per-batch top-k partials; a final
  ``groupby(query_id)`` reduces partials to the global top-k.  Nothing but
  (query_id, neighbor_id, sim) rows ever shuffle.
- ``knn_search_lsh``: the scale path — random-hyperplane bucket index with
  multi-probe (hamming ≤ 1), exact cosine only within probed buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from .. import ensure_picklable
from ..sources.pages import read_table
from .util import grouped_block_map


def _load_queries(sf_dir: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    df = t.to_pandas().sort_values("vec_id").head(n_queries)
    ids = df["vec_id"].to_numpy()
    mat = np.stack([np.asarray(e, dtype=np.float64) for e in df["embedding"]])
    return ids, mat


def knn_search(sf_dir: str, *, k: int = 5, n_queries: int = 10) -> ray.data.Dataset:
    """Global exact top-k cosine neighbors for the first ``n_queries`` vectors.

    Output: (query_id, neighbor_id, rank) with rank 1..k ordered by
    (sim desc, neighbor_id) — integer-only output so the DuckDB oracle
    matches exactly.
    """
    ensure_picklable()
    q_ids, q_mat = _load_queries(sf_dir, n_queries)
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    q_ref = ray.put((q_ids, q_norm))

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        ids, qn = ray.get(q_ref)
        mat = np.stack([np.asarray(e, dtype=np.float64) for e in df["embedding"]])
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = qn @ mat.T  # [n_queries, batch]
        vec_ids = df["vec_id"].to_numpy()
        rows = {"query_id": [], "neighbor_id": [], "sim": []}
        for qi, qid in enumerate(ids):
            mask = vec_ids != qid
            s = sims[qi][mask]
            v = vec_ids[mask]
            if len(s) == 0:
                continue
            take = min(k, len(s))
            # per-batch partial top-k (sim desc, neighbor_id asc)
            order = np.lexsort((v, -s))[:take]
            rows["query_id"].extend([int(qid)] * take)
            rows["neighbor_id"].extend(v[order].astype("int64"))
            rows["sim"].extend(s[order])
        return pd.DataFrame(rows)

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["sim", "neighbor_id"], ascending=[False, True], kind="mergesort")
        df = df.head(k)
        return pd.DataFrame(
            {
                "query_id": df["query_id"].astype("int64").to_numpy(),
                "neighbor_id": df["neighbor_id"].astype("int64").to_numpy(),
                "rank": np.arange(1, len(df) + 1, dtype="int64"),
            }
        )

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    partials = ds.map_batches(partial_topk, batch_format="pandas")
    return grouped_block_map(partials, ["query_id"], final_topk)


class LshTopKStage:
    """LSH search stage: plane matrix + query probe codes built ONCE per
    instance, per-batch multi-probe candidate scan in ``__call__``.

    Run as a TASK stage (a per-process plane cache covers the state; see
    ``dedup_ops.cached_planes`` for the actor-vs-task rationale — the
    probe state here is a few KB and builds in <1 ms).

    Bucket codes use the floor-quantized ±1 projections from ``dedup_ops``
    (exact integer arithmetic — bit-reproducible by the DuckDB oracle).
    """

    def __init__(self, q_ids: np.ndarray, q_mat: np.ndarray, *, k: int,
                 planes: int, seed: int = 13) -> None:
        from .dedup_ops import bucket_codes, cached_planes

        self.k = k
        self.q_ids = q_ids
        self.q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
        self.planes_mat = cached_planes(q_mat.shape[1], planes, seed)
        self._codes = bucket_codes
        q_codes = bucket_codes(q_mat, self.planes_mat)
        # multi-probe: own bucket + every hamming-1 neighbour bucket
        self.q_probe = [
            [int(c)] + [int(c) ^ (1 << b) for b in range(planes)] for c in q_codes
        ]

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack([np.asarray(e, dtype=np.float64) for e in df["embedding"]])
        matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        codes = self._codes(mat, self.planes_mat)
        vec_ids = df["vec_id"].to_numpy()
        rows = {"query_id": [], "neighbor_id": [], "sim": []}
        for qi, qid in enumerate(self.q_ids):
            cand = np.isin(codes, self.q_probe[qi]) & (vec_ids != qid)
            if not cand.any():
                continue
            s = self.q_norm[qi] @ matn[cand].T
            v = vec_ids[cand]
            take = min(self.k, len(s))
            order = np.lexsort((v, -s))[:take]
            rows["query_id"].extend([int(qid)] * take)
            rows["neighbor_id"].extend(v[order].astype("int64"))
            rows["sim"].extend(s[order])
        return pd.DataFrame(rows)


def knn_search_lsh(
    sf_dir: str, *, k: int = 5, n_queries: int = 10, planes: int = 8
) -> pd.DataFrame:
    """Approximate top-k: sign-random-projection buckets with multi-probe
    (hamming ≤ 1); exact cosine only for probed candidates.

    At 100 TB the bucket id becomes the shuffle key (groupby(bucket) builds
    per-bucket sub-indexes once); here buckets stay columnar in one pass.
    Quantized ±1 projections (not raw float sign) make bucket assignment
    identical in the SQL oracle — see ``dedup_ops.bucket_codes``.
    """
    ensure_picklable()
    q_ids, q_mat = _load_queries(sf_dir, n_queries)
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    stage = LshTopKStage(q_ids, q_mat, k=k, planes=planes)
    partials = ds.map_batches(stage, batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["sim", "neighbor_id"], ascending=[False, True], kind="mergesort")
        df = df.head(k)
        return pd.DataFrame(
            {
                "query_id": df["query_id"].astype("int64").to_numpy(),
                "neighbor_id": df["neighbor_id"].astype("int64").to_numpy(),
                "rank": np.arange(1, len(df) + 1, dtype="int64"),
            }
        )

    out = grouped_block_map(partials, ["query_id"], final).to_pandas()
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


_IVF_QUANT = 4096.0  # floor-quantization scale for the coarse quantizer


def _ivf_quantize(mat: np.ndarray) -> np.ndarray:
    """floor(v·4096) — exact in float64 (float32 inputs), identical in SQL."""
    return np.floor(mat.astype(np.float64) * _IVF_QUANT).astype(np.int64)


def _ivf_scores(q: np.ndarray, sums: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Assignment scores dot(q, S_c)/n_c: integer dot products (exact —
    magnitudes ≤ 2^47 for 64-dim unit-scale embeddings) divided by integer
    counts in float64.  Because both operands are bit-identical integers in
    every engine, the float quotient is bit-identical too — the whole
    k-means trajectory is reproducible by the SQL oracle with NO
    accumulated float-order divergence."""
    return (q @ sums.T).astype(np.float64) / counts.astype(np.float64)


def _kmeans_state(
    sf_dir: str, n_clusters: int, n_iters: int = 5
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic distributed quantized k-means (seeded from the first
    ``n_clusters`` vectors): ``n_iters`` rounds of (per-batch INTEGER
    partial sums → driver reduce).  Returns the final (S, n) state —
    centroid c = S_c / n_c.  The per-round exchange is n_clusters × dim
    ints per batch; empty clusters keep their previous state.

    The embedding table is read + quantized ONCE and ``materialize()``d
    (it is the k-means working set, re-scanned every iteration)."""
    _ids, init = _load_queries(sf_dir, n_clusters)  # first n vectors as seeds
    sums = _ivf_quantize(init)
    counts = np.ones(n_clusters, dtype=np.int64)

    def quantize(df: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack([np.asarray(e, dtype=np.float64) for e in df["embedding"]])
        return pd.DataFrame({"qv": list(_ivf_quantize(mat))})

    ds = (
        read_table(sf_dir, "embeddings", columns=["embedding"])
        .map_batches(quantize, batch_format="pandas")
        .materialize()
    )
    for _ in range(n_iters):
        c_ref = ray.put((sums, counts))

        def partial_sums(df: pd.DataFrame) -> pd.DataFrame:
            s, n = ray.get(c_ref)
            q = np.stack([np.asarray(e, dtype=np.int64) for e in df["qv"]])
            assign = _ivf_scores(q, s, n).argmax(axis=1)
            rows = []
            for c in np.unique(assign):
                members = q[assign == c]
                rows.append({"cluster": int(c), "n": len(members),
                             "vec_sum": members.sum(axis=0).tolist()})
            return pd.DataFrame(rows)

        parts = ds.map_batches(partial_sums, batch_format="pandas").to_pandas()
        new_sums = np.zeros_like(sums)
        new_counts = np.zeros(n_clusters, dtype=np.int64)
        for row in parts.itertuples(index=False):
            new_sums[row.cluster] += np.asarray(row.vec_sum, dtype=np.int64)
            new_counts[row.cluster] += row.n
        empty = new_counts == 0
        new_sums[empty] = sums[empty]
        new_counts[empty] = counts[empty]
        sums, counts = new_sums, new_counts
    return sums, counts


def kmeans_clusters(
    sf_dir: str, *, n_clusters: int = 16, n_iters: int = 5
) -> ray.data.Dataset:
    """Standalone embedding clustering: the IVF coarse quantizer exposed as
    an operator — distributed quantized k-means (integer-exact partial
    sums, tiny per-round driver reduce of n_clusters × dim ints), then one
    streaming assignment pass with the converged state broadcast via
    ``ray.put``.  Returns (vec_id, cluster); bit-reproducible in SQL
    because the whole trajectory is integer arithmetic
    (``sql_oracles.sql_kmeans_clusters``)."""
    ensure_picklable()
    sums, counts = _kmeans_state(sf_dir, n_clusters, n_iters)
    c_ref = ray.put((sums, counts))
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        s, n = ray.get(c_ref)
        mat = np.stack([np.asarray(e, dtype=np.float64) for e in df["embedding"]])
        a = _ivf_scores(_ivf_quantize(mat), s, n).argmax(axis=1)
        return pd.DataFrame(
            {"vec_id": df["vec_id"].astype("int64").to_numpy(),
             "cluster": a.astype("int64")}
        )

    return ds.map_batches(assign, batch_format="pandas")


def knn_search_ivf(
    sf_dir: str, *, k: int = 5, n_queries: int = 10, n_clusters: int = 16,
    n_probe: int = 4,
) -> pd.DataFrame:
    """IVF approximate top-k: quantized-k-means coarse quantizer, queries
    probe the ``n_probe`` best cells, exact cosine only within probed cells.

    The scale path: cells become the shuffle key (groupby(cluster) builds
    per-cell sub-indexes once, queries fan out only to probed cells).
    Cell assignment is exact integer arithmetic end-to-end, so the cell of
    every vector — and hence the candidate sets — is reproducible by the
    DuckDB SQL oracle."""
    ensure_picklable()
    sums, counts = _kmeans_state(sf_dir, n_clusters)
    q_ids, q_mat = _load_queries(sf_dir, n_queries)
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    q_scores = _ivf_scores(_ivf_quantize(q_mat), sums, counts)
    # stable sort: ties → lower cell id, matching SQL row_number order
    q_cells = np.argsort(-q_scores, axis=1, kind="stable")[:, :n_probe]
    c_ref = ray.put((sums, counts, q_ids, q_norm, q_cells))

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s, n, ids, qn, cells = ray.get(c_ref)
        mat = np.stack([np.asarray(e, dtype=np.float64) for e in df["embedding"]])
        matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        assign = _ivf_scores(_ivf_quantize(mat), s, n).argmax(axis=1)
        vec_ids = df["vec_id"].to_numpy()
        rows = {"query_id": [], "neighbor_id": [], "sim": []}
        for qi, qid in enumerate(ids):
            cand = np.isin(assign, cells[qi]) & (vec_ids != qid)
            if not cand.any():
                continue
            s = qn[qi] @ matn[cand].T
            v = vec_ids[cand]
            take = min(k, len(s))
            order = np.lexsort((v, -s))[:take]
            rows["query_id"].extend([int(qid)] * take)
            rows["neighbor_id"].extend(v[order].astype("int64"))
            rows["sim"].extend(s[order])
        return pd.DataFrame(rows)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["sim", "neighbor_id"], ascending=[False, True], kind="mergesort")
        df = df.head(k)
        return pd.DataFrame(
            {
                "query_id": df["query_id"].astype("int64").to_numpy(),
                "neighbor_id": df["neighbor_id"].astype("int64").to_numpy(),
                "rank": np.arange(1, len(df) + 1, dtype="int64"),
            }
        )

    out = grouped_block_map(
        ds.map_batches(partial, batch_format="pandas"), ["query_id"], final
    ).to_pandas()
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# SemDeDup (round 4) — semantic dedup per Abbas et al. 2023
# (arXiv:2303.09540): k-means-cluster the embedding space, then drop
# within-cluster ε-near-duplicates so only the pruned corpus trains.
# Deterministic keep rule: a vector survives iff NO lower-id cluster-mate is
# ε-similar (round(cos·1000) >= threshold_milli — the same milli-rounded
# cross-engine cosine compare embedding_dedup's oracle proves out).
#
# Scale design: the cluster id IS the shuffle key — the k-means state is the
# IVF coarse quantizer (integer-exact, broadcast via ray.put), assignment is
# one streaming pass, and the O(m²) similarity work happens only WITHIN a
# cluster (m ≈ N/k), chunked to _VERIFY_CHUNK×m so a degenerate cluster
# never allocates m×m in one task.  At 100 TB you raise n_clusters so the
# per-cluster working set stays block-sized — same knob as IVF.
# ---------------------------------------------------------------------------


def semantic_dedup(
    sf_dir: str, *, n_clusters: int = 16, n_iters: int = 5,
    threshold_milli: int = 350,
) -> ray.data.Dataset:
    """Cluster-then-dedup survivors: (vec_id, cluster), one row per vector
    that is NOT an ε-near-duplicate of a lower-id vector in its cluster."""
    from .dedup_ops import _VERIFY_CHUNK

    ensure_picklable()
    sums, counts = _kmeans_state(sf_dir, n_clusters, n_iters)
    c_ref = ray.put((sums, counts))
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        s, n = ray.get(c_ref)
        mat = np.stack([np.asarray(e, dtype=np.float64) for e in df["embedding"]])
        a = _ivf_scores(_ivf_quantize(mat), s, n).argmax(axis=1)
        return pd.DataFrame(
            {"vec_id": df["vec_id"].astype("int64").to_numpy(),
             "cluster": a.astype("int64"), "embedding": list(mat)}
        )

    def survivors(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id", kind="mergesort")
        ids = g["vec_id"].to_numpy(dtype="int64")
        mat = np.stack([np.asarray(e, dtype=np.float64) for e in g["embedding"]])
        norms = np.linalg.norm(mat, axis=1)
        n = len(ids)
        dup = np.zeros(n, dtype=bool)
        # chunked: rows s0:e0 (candidate dups) vs ALL rows; peak CHUNK×n
        for s0 in range(1, n, _VERIFY_CHUNK):
            e0 = min(s0 + _VERIFY_CHUNK, n)
            sims = (mat[s0:e0] @ mat.T) / np.outer(norms[s0:e0], norms)
            cos_milli = np.round(sims * 1000)
            earlier = np.arange(n)[None, :] < np.arange(s0, e0)[:, None]
            dup[s0:e0] = ((cos_milli >= threshold_milli) & earlier).any(axis=1)
        keep = ~dup
        return pd.DataFrame(
            {"vec_id": ids[keep],
             "cluster": g["cluster"].to_numpy(dtype="int64")[keep]}
        )

    assigned = ds.map_batches(assign, batch_format="pandas")
    return grouped_block_map(assigned, ["cluster"], survivors)


def embedding_quantize(sf_dir: str) -> ray.data.Dataset:
    """Int8 scalar quantization of the embedding table — the compression
    pass every large-scale vector index runs before storage (e.g. the
    SQ8 codec of IVF-SQ indexes): per-dimension [min, max] fitted over
    the corpus, each value mapped to floor((v - mn) * 255 / (mx - mn)).

    Topology: per-batch per-dimension min/max partials (dim rows per
    batch) into one tiny grouped exchange; the fitted (mn, mx) vectors —
    dim-sized, provably driver-safe — broadcast once via ``ray.put``;
    coding is embarrassingly parallel numpy.  All arithmetic is float64
    with the same op order as the SQL replay, so codes match
    bit-for-bit.  Output: a per-vector code fingerprint
    (vec_id, code_sum, code_sqsum, dim) — the full code column is what a
    sink would write; the fingerprint is what the oracle can hash."""
    ensure_picklable()
    from ray.data.aggregate import Max, Min

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def stat_partials(df: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack([np.asarray(e, dtype=np.float64) for e in df["embedding"]])
        return pd.DataFrame(
            {"d": np.arange(1, mat.shape[1] + 1, dtype=np.int64),
             "part_mn": mat.min(axis=0), "part_mx": mat.max(axis=0)}
        )

    stats = (
        ds.map_batches(stat_partials, batch_format="pandas")
        .groupby("d")
        .aggregate(Min("part_mn", alias_name="mn"), Max("part_mx", alias_name="mx"))
        .to_pandas()  # dim rows — provably driver-safe
    )
    if stats.empty:  # empty shard (resume/retry path)
        return ray.data.from_pandas(
            pd.DataFrame(
                {"vec_id": pd.Series([], dtype="int64"),
                 "code_sum": pd.Series([], dtype="int64"),
                 "code_sqsum": pd.Series([], dtype="int64"),
                 "dim": pd.Series([], dtype="int64")}
            )
        )
    stats = stats.sort_values("d")
    mn = stats["mn"].to_numpy()
    mx = stats["mx"].to_numpy()
    span_ref = ray.put((mn, mx))

    def code(df: pd.DataFrame) -> pd.DataFrame:
        lo, hi = ray.get(span_ref)
        mat = np.stack([np.asarray(e, dtype=np.float64) for e in df["embedding"]])
        width = hi - lo
        safe = np.where(width > 0, width, 1.0)
        codes = np.floor((mat - lo) * 255.0 / safe)
        codes = np.where(width > 0, codes, 0.0).astype(np.int64)
        return pd.DataFrame(
            {"vec_id": df["vec_id"].astype("int64"),
             "code_sum": codes.sum(axis=1),
             "code_sqsum": (codes * codes).sum(axis=1),
             "dim": np.int64(mat.shape[1])}
        )

    return ds.map_batches(code, batch_format="pandas")


def sql_embedding_quantize() -> str:
    return (
        "WITH x AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v, "
        "unnest(generate_series(1, len(embedding))) AS d FROM embeddings), "
        "s AS (SELECT d, MIN(v) AS mn, MAX(v) AS mx FROM x GROUP BY d), "
        "c AS (SELECT vec_id, CASE WHEN s.mx > s.mn THEN "
        "CAST(floor((x.v - s.mn) * 255.0 / (s.mx - s.mn)) AS BIGINT) "
        "ELSE 0 END AS code FROM x JOIN s USING (d)) "
        "SELECT vec_id, CAST(SUM(code) AS BIGINT) AS code_sum, "
        "CAST(SUM(code * code) AS BIGINT) AS code_sqsum, "
        "CAST(COUNT(*) AS BIGINT) AS dim FROM c GROUP BY vec_id"
    )


def knn_search_sq(sf_dir: str, *, k: int = 5, n_queries: int = 10) -> ray.data.Dataset:
    """Exact top-k cosine search over the INT8-QUANTIZED corpus — the
    asymmetric distance computation (ADC) pass of an SQ8 vector index:
    queries stay full precision, every corpus vector is scored through
    its scalar-quantization reconstruction ``mn + code*(mx-mn)/255``.

    Composes ``embedding_quantize``'s fit (per-dim min/max partials into
    one dim-sized exchange, dim-sized spans broadcast once) with
    ``knn_search``'s per-batch partial-top-k scan — coding, decoding and
    scoring are all inside the one streaming pass, so the only exchanges
    are the dim-sized fit and the (queries x k)-sized top-k fold.  Codes
    and reconstructions use float64 with the SQL replay's exact op
    order.  Output: (query_id, neighbor_id, rank).
    """
    ensure_picklable()
    from ray.data.aggregate import Max, Min

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def stat_partials(df: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack([np.asarray(e, dtype=np.float64) for e in df["embedding"]])
        return pd.DataFrame(
            {"d": np.arange(1, mat.shape[1] + 1, dtype=np.int64),
             "part_mn": mat.min(axis=0), "part_mx": mat.max(axis=0)}
        )

    stats = (
        ds.map_batches(stat_partials, batch_format="pandas")
        .groupby("d")
        .aggregate(Min("part_mn", alias_name="mn"), Max("part_mx", alias_name="mx"))
        .to_pandas()  # dim rows — provably driver-safe
    )
    if stats.empty:  # empty shard (resume/retry path)
        return ray.data.from_pandas(
            pd.DataFrame(
                {"query_id": pd.Series([], dtype="int64"),
                 "neighbor_id": pd.Series([], dtype="int64"),
                 "rank": pd.Series([], dtype="int64")}
            )
        )
    stats = stats.sort_values("d")
    lo = stats["mn"].to_numpy()
    width = stats["mx"].to_numpy() - lo

    q_ids, q_mat = _load_queries(sf_dir, n_queries)
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    state_ref = ray.put((q_ids, q_norm, lo, width))

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        ids, qn, mn, w = ray.get(state_ref)
        mat = np.stack([np.asarray(e, dtype=np.float64) for e in df["embedding"]])
        safe = np.where(w > 0, w, 1.0)
        codes = np.floor((mat - mn) * 255.0 / safe)
        codes = np.where(w > 0, codes, 0.0)
        recon = mn + (codes * w) / 255.0
        norms = np.linalg.norm(recon, axis=1, keepdims=True)
        recon = recon / np.where(norms > 0, norms, 1.0)
        sims = qn @ recon.T
        vec_ids = df["vec_id"].to_numpy()
        rows = {"query_id": [], "neighbor_id": [], "sim": []}
        for qi, qid in enumerate(ids):
            mask = vec_ids != qid
            s = sims[qi][mask]
            v = vec_ids[mask]
            if len(s) == 0:
                continue
            take = min(k, len(s))
            order = np.lexsort((v, -s))[:take]
            rows["query_id"].extend([int(qid)] * take)
            rows["neighbor_id"].extend(v[order].astype("int64"))
            rows["sim"].extend(s[order])
        return pd.DataFrame(rows)

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["sim", "neighbor_id"], ascending=[False, True], kind="mergesort")
        df = df.head(k)
        return pd.DataFrame(
            {
                "query_id": df["query_id"].astype("int64").to_numpy(),
                "neighbor_id": df["neighbor_id"].astype("int64").to_numpy(),
                "rank": np.arange(1, len(df) + 1, dtype="int64"),
            }
        )

    partials = ds.map_batches(partial_topk, batch_format="pandas")
    return grouped_block_map(partials, ["query_id"], final_topk)


def sql_knn_search_sq(k: int = 5, n_queries: int = 10) -> str:
    """Replay fit (per-dim min/max), SQ8 code + reconstruction with the
    Ray side's exact float64 op order, then full-precision-query cosine
    ranking over the reconstructed vectors."""
    return (
        "WITH x AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v, "
        "unnest(generate_series(1, len(embedding))) AS d FROM embeddings), "
        "s AS (SELECT d, MIN(v) AS mn, MAX(v) AS mx FROM x GROUP BY d), "
        "r AS (SELECT vec_id, d, CASE WHEN s.mx > s.mn THEN "
        "s.mn + (floor((x.v - s.mn) * 255.0 / (s.mx - s.mn)) * (s.mx - s.mn)) "
        "/ 255.0 ELSE s.mn END AS rv FROM x JOIN s USING (d)), "
        "rec AS (SELECT vec_id, list(rv ORDER BY d) AS rvec FROM r "
        "GROUP BY vec_id), "
        f"q AS (SELECT vec_id AS query_id, embedding FROM embeddings "
        f"ORDER BY vec_id LIMIT {n_queries}), "
        "sims AS (SELECT q.query_id, rec.vec_id AS neighbor_id, "
        "list_cosine_similarity("
        "list_transform(q.embedding, y -> CAST(y AS DOUBLE)), rec.rvec) AS sim "
        "FROM q CROSS JOIN rec WHERE rec.vec_id != q.query_id), "
        "ranked AS (SELECT query_id, neighbor_id, row_number() OVER "
        "(PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank "
        "FROM sims) "
        f"SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= {k}"
    )


def sql_knn_search(k: int = 5, n_queries: int = 10) -> str:
    """Brute-force cosine top-k oracle (DuckDB list_cosine_similarity)."""
    return (
        "WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings "
        f"           ORDER BY vec_id LIMIT {n_queries}), "
        "sims AS (SELECT q.query_id, e.vec_id AS neighbor_id, "
        "  list_cosine_similarity("
        "    list_transform(q.embedding, x -> CAST(x AS DOUBLE)), "
        "    list_transform(e.embedding, x -> CAST(x AS DOUBLE))) AS sim "
        "  FROM q CROSS JOIN embeddings e WHERE e.vec_id != q.query_id), "
        "ranked AS (SELECT query_id, neighbor_id, "
        "  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank "
        "  FROM sims) "
        f"SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= {k}"
    )


def ann_eval(sf_dir: str, *, k: int = 5, n_queries: int = 10,
             planes: int = 8, index: str = "lsh") -> pd.DataFrame:
    """ANN index QA — empirical recall@k of an approximate index
    (``index`` = "lsh" multi-probe sign-projection, or "ivf" probed
    cells) against brute-force exact-cosine ground truth; the second
    member of the evaluation family beside ``dedup_eval`` (an index
    whose recall silently degrades is the classic production failure an
    eval harness exists to catch).  Unlike ``dedup_eval`` — whose LSH
    banding provably reaches recall 1000 and whose oracle ENCODES it —
    this eval MEASURES: on the synthetic embeddings the 8-plane
    hamming-1 LSH lands 0–400 milli and IVF n_probe=4 substantially
    higher, and the gate pins the measurement bit-exactly, so any probe
    or banding regression moves a recorded number instead of silently
    shipping a worse index.

    Scale design: both legs are the production pipelines themselves
    (``knn_search`` truth, ``knn_search_lsh`` candidate) — nothing is
    recomputed — and both outputs are PARAMETER-bounded (≤ k·n_queries
    rows), so the driver-side join is output-sized by construction, the
    same precedent as ``rerank_search``'s candidate table.  The SQL
    oracle composes the two legs' full replays, so a future banding or
    probe regression fails the gate's hash match rather than drifting
    silently.

    Output: (query_id, n_truth, n_hit, recall_milli), one row per query.
    """
    ensure_picklable()
    truth = knn_search(sf_dir, k=k, n_queries=n_queries).to_pandas()
    if index == "lsh":
        approx = knn_search_lsh(sf_dir, k=k, n_queries=n_queries, planes=planes)
    else:
        assert index == "ivf", index
        approx = knn_search_ivf(sf_dir, k=k, n_queries=n_queries)
    if len(truth) == 0:
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype="int64"),
                "n_truth": pd.Series([], dtype="int64"),
                "n_hit": pd.Series([], dtype="int64"),
                "recall_milli": pd.Series([], dtype="int64"),
            }
        )
    m = truth.merge(
        approx[["query_id", "neighbor_id"]].assign(hit=np.int64(1)),
        on=["query_id", "neighbor_id"],
        how="left",
    )
    g = m.groupby("query_id", as_index=False).agg(
        n_truth=("rank", "size"), n_hit=("hit", "count")
    )
    return pd.DataFrame(
        {
            "query_id": g["query_id"].astype("int64"),
            "n_truth": g["n_truth"].astype("int64"),
            "n_hit": g["n_hit"].astype("int64"),
            "recall_milli": (
                (1000 * g["n_hit"].astype("int64")) // g["n_truth"].astype("int64")
            ).astype("int64"),
        }
    )


def sql_ann_eval(dim: int, k: int = 5, n_queries: int = 10,
                 planes: int = 8, index: str = "lsh") -> str:
    from .sql_oracles import sql_knn_search_ivf, sql_knn_search_lsh

    if index == "lsh":
        approx_sql = sql_knn_search_lsh(dim, k=k, n_queries=n_queries, planes=planes)
    else:
        assert index == "ivf", index
        approx_sql = sql_knn_search_ivf(
            dim, k=k, n_queries=n_queries, n_clusters=16, n_probe=4
        )
    return (
        f"WITH t AS ({sql_knn_search(k=k, n_queries=n_queries)}), "
        f"a AS ({approx_sql}) "
        "SELECT t.query_id, COUNT(*) AS n_truth, "
        "CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hit, "
        "CAST((1000 * COUNT(a.neighbor_id)) // COUNT(*) AS BIGINT) "
        "AS recall_milli "
        "FROM t LEFT JOIN a ON a.query_id = t.query_id "
        "AND a.neighbor_id = t.neighbor_id "
        "GROUP BY t.query_id"
    )
