"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard, embedding
cosine — the training-data dedup family.

Scale shapes (per the Ray Data dedup pattern): shingle→minhash per batch
(vectorized numpy), explode to (band_id, band_hash, doc_id) rows,
``groupby(band)`` for candidate generation, signature-based verification,
then connected components.  Components use driver union-find here because
the candidate set is provably small at these SFs; the 100 TB path is
iterative min-label propagation (groupby until fixpoint) — documented, not
needed for correctness.

All hashes are explicit (blake2b / FNV / seeded affine) — deterministic
across processes (builtin ``hash`` is salted and never used).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data

from .. import ensure_picklable
from ..sources.pages import read_table
from .util import grouped_block_map

_MERSENNE_P = (1 << 61) - 1


_FNV64_PRIME = np.uint64(1099511628211)
_MIX1 = np.uint64(0xFF51AFD7ED558CCD)
_MIX2 = np.uint64(0xC4CEB9FE1A85EC53)


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Stable 64-bit hashes of the byte k-gram shingle set — fully
    vectorized (sliding windows × FNV-prime powers, murmur-style finalizer)
    instead of one digest call per shingle."""
    data = np.frombuffer(text.lower().encode("utf-8"), dtype=np.uint8)
    if len(data) < k:
        data = np.pad(data, (0, k - len(data)))
    win = np.lib.stride_tricks.sliding_window_view(data, k).astype(np.uint64)
    with np.errstate(over="ignore"):
        powers = _FNV64_PRIME ** np.arange(k, dtype=np.uint64)
        h = np.zeros(len(win), dtype=np.uint64)
        for j in range(k):  # k is small (5); windows dimension is vectorized
            h += win[:, j] * powers[j]
        h ^= h >> np.uint64(33)
        h *= _MIX1
        h ^= h >> np.uint64(33)
        h *= _MIX2
        h ^= h >> np.uint64(33)
    return np.unique(h)


def _minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE_P, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE_P, size=num_perm, dtype=np.uint64)
    return a, b


def _minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """sig_i = min over shingles of (a_i * x + b_i) with uint64 wraparound.

    Multiplicative hashing mod 2^64 — a valid (and fully vectorized)
    minhash family; deterministic everywhere numpy is."""
    with np.errstate(over="ignore"):
        vals = shingles[:, None] * a[None, :] + b[None, :]  # uint64 wraps
    return np.min(vals, axis=0)


def minhash_signatures(
    ds: ray.data.Dataset, num_perm: int = 64, shingle_k: int = 5,
    id_col: str = "doc_id", text_col: str = "text",
) -> ray.data.Dataset:
    a, b = _minhash_params(num_perm)

    def sig_batch(df: pd.DataFrame) -> pd.DataFrame:
        sigs = [
            _minhash_signature(_shingle_hashes(t, shingle_k), a, b).astype("int64")
            for t in df[text_col]
        ]
        return pd.DataFrame({id_col: df[id_col], "sig": sigs})

    return ds.map_batches(sig_batch, batch_format="pandas")


def _cluster_pairs(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find → {doc_id: representative (min id in component)}."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, j in pairs:
        ri, rj = find(i), find(j)
        if ri != rj:
            if rj < ri:
                ri, rj = rj, ri
            parent[rj] = ri
    return {x: find(x) for x in parent}


def minhash_dedup(
    sf_dir: str, *, num_perm: int = 64, bands: int = 16, threshold: float = 0.7,
    shingle_k: int = 5,
) -> pd.DataFrame:
    """MinHash-LSH near-dup clusters over ``documents``.

    Returns (doc_id, rep_id) for every doc that belongs to a near-dup
    cluster of size ≥ 2 (rep = min doc_id of the cluster); empty when the
    corpus has no near-dups.
    """
    ensure_picklable()
    rows_per_band = num_perm // bands
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    sigs = minhash_signatures(ds, num_perm, shingle_k)

    def band_rows(df: pd.DataFrame) -> pd.DataFrame:
        out_band, out_hash, out_doc, out_sig = [], [], [], []
        for doc_id, sig in zip(df["doc_id"], df["sig"]):
            sig = np.asarray(sig, dtype=np.int64)
            for band in range(bands):
                chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                out_band.append(band)
                out_hash.append(h)
                out_doc.append(int(doc_id))
                out_sig.append(sig)
        return pd.DataFrame(
            {"band": out_band, "band_hash": out_hash, "doc_id": out_doc, "sig": out_sig}
        )

    banded = sigs.map_batches(band_rows, batch_format="pandas")

    def candidates(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 "est": pd.Series([], dtype="float64")})
        df = df.sort_values("doc_id", kind="mergesort")
        ids = df["doc_id"].to_numpy()
        sigs_arr = np.stack([np.asarray(s, dtype=np.int64) for s in df["sig"]])
        a_out, b_out, est_out = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if ids[i] == ids[j]:
                    continue
                est = float(np.mean(sigs_arr[i] == sigs_arr[j]))
                if est >= threshold:
                    a_out.append(int(ids[i]))
                    b_out.append(int(ids[j]))
                    est_out.append(est)
        return pd.DataFrame({"a": a_out, "b": b_out, "est": est_out})

    pair_df = grouped_block_map(banded, ["band", "band_hash"], candidates).to_pandas()
    pairs = sorted({(int(r.a), int(r.b)) for r in pair_df.itertuples(index=False)})
    clusters = _cluster_pairs(pairs)
    if not clusters:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "rep_id": pd.Series([], dtype="int64")})
    rows = sorted(clusters.items())
    return pd.DataFrame(
        {"doc_id": [r[0] for r in rows], "rep_id": [r[1] for r in rows]}
    ).astype("int64")


def simhash_pairs(sf_dir: str, *, max_hamming: int = 3) -> pd.DataFrame:
    """SimHash near-dup candidate pairs: 64-bit token-weighted simhash,
    4×16-bit band LSH, exact hamming verify ≤ ``max_hamming``."""
    ensure_picklable()
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    # per-task memo of token → ±1 bit rows: natural-language corpora reuse a
    # small vocabulary, so each distinct token hashes once per batch worker
    token_rows: dict[str, np.ndarray] = {}

    def _row(tok: str) -> np.ndarray:
        row = token_rows.get(tok)
        if row is None:
            h = np.frombuffer(
                hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(),
                dtype=np.uint64,
            )[0]
            bits = (np.right_shift(h, np.arange(64, dtype=np.uint64)) & np.uint64(1))
            row = np.where(bits == 1, 1, -1).astype(np.int8)
            token_rows[tok] = row
        return row

    def sim_batch(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        weights = np.arange(64, dtype=np.uint64)
        for text in df["text"]:
            toks = set(text.lower().split())
            if toks:
                acc = np.sum([_row(t) for t in toks], axis=0, dtype=np.int64)
            else:
                acc = np.zeros(64, dtype=np.int64)
            sh = int(np.sum(np.left_shift(np.uint64(1), weights[acc > 0])))
            out.append(sh)
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "simhash": [f"{s:016x}" for s in out],
        })

    sims = ds.map_batches(sim_batch, batch_format="pandas")

    def band_rows(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"band": [], "chunk": [], "doc_id": [], "simhash": []}
        for doc_id, hx in zip(df["doc_id"], df["simhash"]):
            s = int(hx, 16)
            for band in range(4):
                rows["band"].append(band)
                rows["chunk"].append((s >> (16 * band)) & 0xFFFF)
                rows["doc_id"].append(int(doc_id))
                rows["simhash"].append(hx)
        return pd.DataFrame(rows)

    banded = sims.map_batches(band_rows, batch_format="pandas")

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        df = df.sort_values("doc_id", kind="mergesort")
        ids = df["doc_id"].to_numpy()
        hs = [int(h, 16) for h in df["simhash"]]
        a_o, b_o, d_o = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if ids[i] == ids[j]:
                    continue
                d = bin(hs[i] ^ hs[j]).count("1")
                if d <= max_hamming:
                    a_o.append(int(ids[i]))
                    b_o.append(int(ids[j]))
                    d_o.append(d)
        return pd.DataFrame({"a": a_o, "b": b_o, "hamming": d_o})

    pair_df = grouped_block_map(banded, ["band", "chunk"], verify).to_pandas()
    uniq = sorted({(int(r.a), int(r.b), int(r.hamming)) for r in pair_df.itertuples(index=False)})
    return pd.DataFrame(
        {"a": [u[0] for u in uniq], "b": [u[1] for u in uniq], "hamming": [u[2] for u in uniq]}
    ).astype("int64") if uniq else pd.DataFrame(
        {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64"),
         "hamming": pd.Series([], dtype="int64")}
    )


def jaccard_pairs(
    sf_dir: str, *, threshold: float = 0.8, k: int = 3,
    num_perm: int = 64, bands: int = 16,
) -> pd.DataFrame:
    """Exact n-gram Jaccard pairs over MinHash-LSH candidates.

    Candidate generation is the standard banding scheme (16 bands × 4 rows
    → ~99.98% recall at J=0.8); the EXACT Jaccard verify runs only inside
    candidate buckets, so the pairwise work is bounded by bucket size
    instead of corpus size (all-pairs-within-lang was measured 33 s at
    5000 docs; this shape stays sub-second).  Texts ride along in the band
    rows at this scale; at 10^12 docs the verify would re-join texts by
    bucketed key instead.
    """
    ensure_picklable()
    rows_per_band = num_perm // bands
    a_p, b_p = _minhash_params(num_perm)
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def band_rows(df: pd.DataFrame) -> pd.DataFrame:
        out = {"band": [], "band_hash": [], "doc_id": [], "text": [], "sig": []}
        for doc_id, text in zip(df["doc_id"], df["text"]):
            sig = _minhash_signature(_shingle_hashes(text, k), a_p, b_p).astype("int64")
            for band in range(bands):
                chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
                out["band"].append(band)
                out["band_hash"].append(
                    hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                )
                out["doc_id"].append(int(doc_id))
                out["text"].append(text)
                out["sig"].append(sig)
        return pd.DataFrame(out)

    banded = ds.map_batches(band_rows, batch_format="pandas")

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                              "b": pd.Series([], dtype="int64"),
                              "jaccard": pd.Series([], dtype="float64")})
        if len(df) < 2:
            return empty
        df = df.sort_values("doc_id", kind="mergesort")
        ids = df["doc_id"].to_numpy()
        # vectorized signature prefilter: exact (O(n^2) set ops) only for
        # pairs whose estimated similarity clears threshold - margin —
        # big candidate buckets (degenerate similar corpora) stay cheap
        sigs = np.stack([np.asarray(s, dtype=np.int64) for s in df["sig"]])
        m = len(ids)
        agree = np.zeros((m, m), dtype=np.uint16)
        for p in range(sigs.shape[1]):
            col = sigs[:, p]
            agree += (col[:, None] == col[None, :]).astype(np.uint16)
        est = agree / sigs.shape[1]
        iu, ju = np.triu_indices(m, k=1)
        cand = (est[iu, ju] >= threshold - 0.15) & (ids[iu] != ids[ju])
        if not cand.any():
            return empty
        sets: dict[int, frozenset] = {}

        def gramset(i: int) -> frozenset:
            if i not in sets:
                t = df["text"].iloc[i].lower()
                sets[i] = frozenset(t[x : x + k] for x in range(max(1, len(t) - k + 1)))
            return sets[i]

        a_o, b_o, j_o = [], [], []
        for i, j in zip(iu[cand], ju[cand]):
            si, sj = gramset(int(i)), gramset(int(j))
            union = len(si | sj)
            jac = len(si & sj) / union if union else 0.0
            if jac >= threshold:
                a_o.append(int(ids[i]))
                b_o.append(int(ids[j]))
                j_o.append(round(jac, 6))
        return pd.DataFrame({"a": a_o, "b": b_o, "jaccard": j_o})

    out = grouped_block_map(banded, ["band", "band_hash"], verify).to_pandas()
    out = out.drop_duplicates(subset=["a", "b"])
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def embedding_dedup(sf_dir: str, *, threshold: float = 0.3, planes: int = 6) -> pd.DataFrame:
    """Embedding cosine near-dup: random-hyperplane LSH buckets, exact
    cosine verify within buckets."""
    ensure_picklable()
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack([np.asarray(e, dtype=np.float64) for e in df["embedding"]])
        # same seeded planes in every task → consistent buckets
        hp = np.random.RandomState(11).normal(size=(mat.shape[1], planes))
        bits = (mat @ hp > 0).astype(np.int64)
        codes = (bits * (1 << np.arange(planes))).sum(axis=1)
        return pd.DataFrame({"vec_id": df["vec_id"], "bucket": codes, "embedding": list(mat)})

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 "cos_milli": pd.Series([], dtype="int64")})
        df = df.sort_values("vec_id", kind="mergesort")
        ids = df["vec_id"].to_numpy()
        mat = np.stack([np.asarray(e, dtype=np.float64) for e in df["embedding"]])
        norms = np.linalg.norm(mat, axis=1)
        sims = (mat @ mat.T) / np.outer(norms, norms)
        a_o, b_o, c_o = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if sims[i, j] >= threshold:
                    a_o.append(int(ids[i]))
                    b_o.append(int(ids[j]))
                    c_o.append(int(round(sims[i, j] * 1000)))
        return pd.DataFrame({"a": a_o, "b": b_o, "cos_milli": c_o})

    out = grouped_block_map(
        ds.map_batches(bucket, batch_format="pandas"), ["bucket"], verify
    ).to_pandas()
    return out.sort_values(["a", "b"]).reset_index(drop=True)
