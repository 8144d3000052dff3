"""Text-analysis + dedup operators over the ``documents`` table, and the
documents-derived HTML extraction round-trip.

SQL-checked ops keep to integer outputs (or exact string outputs) so the
DuckDB oracle matches bit-for-bit under any parallelism.  All hashing uses
explicit stable hash functions (hashlib / FNV) — never Python's builtin
``hash`` (randomized per process).
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
import ray.data

from .. import ensure_picklable
from ..functions.fnv import fnv1a_32
from ..sources.pages import read_table
from .util import grouped_block_dedup, grouped_block_map

_TOKEN_RE = r"\S+"
_WORD_RE = r"[A-Za-z]+"

STOPWORDS = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "de", "du", "pour"),
    "es": ("el", "la", "los", "las", "y", "es", "un", "una", "de", "por"),
    "sk": ("a", "je", "na", "sa", "to", "v", "z", "do", "pre", "que"),
}


def exact_dedup(sf_dir: str) -> ray.data.Dataset:
    """Exact text dedup: hash-partition on a content hash, keep min doc_id.

    The shuffle key is the sha1 of the text (uniform, no skew); the winner
    rule (min doc_id) is deterministic at any parallelism."""
    ensure_picklable()

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            text_sha=[hashlib.sha1(t.encode("utf-8")).hexdigest() for t in df["text"]]
        )
        return df

    def combiner(df: pd.DataFrame) -> pd.DataFrame:
        # batch-local pre-dedup: drops same-batch duplicates before the shuffle
        df = df.sort_values(["text_sha", "doc_id"], kind="mergesort")
        return df.groupby("text_sha", sort=False).head(1)

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"), "text": df["text"]}
        )

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    ds = ds.map_batches(add_hash, batch_format="pandas")
    ds = ds.map_batches(combiner, batch_format="pandas")
    # vectorized winner pick: at scale, groups = distinct texts = corpus-
    # sized, so the per-group dispatch of grouped_block_map is ruinous —
    # grouped_block_dedup's in-block sort + drop_duplicates keeps the
    # global min doc_id per sha with zero per-group Python
    deduped = grouped_block_dedup(ds, ["text_sha"], order=["doc_id"])
    return deduped.map_batches(project, batch_format="pandas")


def text_normalize(sf_dir: str) -> ray.data.Dataset:
    """ccnet-style normalization before fuzzy dedup: lowercase, strip
    ASCII punctuation, collapse whitespace runs, trim.  Pure per-row
    vectorized pandas str kernel — no exchange, no state; the SQL oracle
    applies the identical regex chain.  Output: (doc_id, norm_text)."""
    ensure_picklable()

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        s = (
            df["text"].str.lower()
            .str.replace(r"[^a-z0-9\s]", "", regex=True)
            .str.replace(r"\s+", " ", regex=True)
            .str.strip()
        )
        return pd.DataFrame({"doc_id": df["doc_id"], "norm_text": s})

    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        norm, batch_format="pandas"
    )


def sql_text_normalize() -> str:
    return (
        "SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), "
        r"'[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')) AS norm_text "
        "FROM documents"
    )


def incremental_dedup(sf_dir: str) -> ray.data.Dataset:
    """Incremental ingestion dedup: a 'new crawl' (upper half of the id
    range) anti-joined by exact content against the 'existing corpus'
    (lower half), plus min-doc_id dedup within the new side.

    The production flow for appending a crawl to a kept corpus.  Both
    sides are large, so there is no broadcast: rows tag their side and
    hash-partition on sha1(text) — ONE grouped exchange; a group emits
    its min new doc_id iff it contains no existing-side row.  A per-batch
    combiner pre-drops same-batch duplicate (side, sha) rows first.
    Output: (doc_id, text) of the new documents that survive."""
    ensure_picklable()

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            text_sha=[hashlib.sha1(t.encode("utf-8")).hexdigest() for t in df["text"]],
        )
        return df

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    # two scalars to the driver (id range) — defines the deterministic split
    lo, hi = ds.min("doc_id"), ds.max("doc_id")
    split = (lo + hi + 1) // 2

    def tag_and_combine(df: pd.DataFrame) -> pd.DataFrame:
        df = tag(df)
        df = df.assign(is_new=(df["doc_id"] >= split).astype("int64"))
        # batch-local: keep min doc_id per (sha, side); existing rows
        # need no text downstream
        df = df.sort_values(["text_sha", "is_new", "doc_id"], kind="mergesort")
        df = df.groupby(["text_sha", "is_new"], sort=False).head(1)
        df.loc[df["is_new"] == 0, "text"] = ""
        return df[["doc_id", "text", "text_sha", "is_new"]]

    keyed = ds.map_batches(tag_and_combine, batch_format="pandas")

    def resolve_block(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized anti-join + winner pick (groups = distinct texts =
        # corpus-sized, so per-group dispatch is ruinous at scale): the
        # upstream sort(["text_sha"]) co-locates each sha's rows in this
        # block; drop shas that have any existing-side row, then keep the
        # min new doc_id per survivor
        if len(df) == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "text": pd.Series([], dtype=str)})
        has_old = df.groupby("text_sha", sort=False)["is_new"].transform("min") == 0
        df = df[~has_old]
        df = df.sort_values(["text_sha", "doc_id"], kind="mergesort")
        df = df.drop_duplicates("text_sha", keep="first")
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"), "text": df["text"]}
        )

    return keyed.sort(["text_sha"]).map_batches(
        resolve_block, batch_format="pandas", batch_size=None
    )


def sql_incremental_dedup() -> str:
    return (
        "WITH s AS (SELECT (MIN(doc_id) + MAX(doc_id) + 1) // 2 AS sp "
        "FROM documents) "
        "SELECT MIN(doc_id) AS doc_id, text FROM documents, s "
        "WHERE doc_id >= s.sp AND text NOT IN "
        "(SELECT text FROM documents, s WHERE doc_id < s.sp) "
        "GROUP BY text"
    )


def token_count(sf_dir: str) -> ray.data.Dataset:
    ensure_picklable()

    def count(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "n_tokens": df["text"].str.count(_TOKEN_RE).astype("int64")}
        )

    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        count, batch_format="pandas"
    )


# GPT-2-style pre-tokenizer, simplified to the RE2 ∩ Python-re common
# subset (no \p classes, no lookahead): optional-leading-space letter runs,
# digit runs, punctuation runs, residual whitespace.  Leftmost-first
# alternation matches in both engines (parity spot-checked incl. mixed
# alnum, punctuation, tabs/newlines and leading spaces).
_BPE_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n]+|[ \t\n]+"


def bpe_token_count(sf_dir: str) -> ray.data.Dataset:
    """Token budgeting with a BPE-ish pre-tokenizer (plus the whitespace
    count for comparison) — the standard corpus-sizing signal.  One
    vectorized ``str.count`` per pattern per batch, no exchange."""
    ensure_picklable()

    def count(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_ws_tokens": df["text"].str.count(_TOKEN_RE).astype("int64"),
                "n_bpe_tokens": df["text"].str.count(_BPE_RE).astype("int64"),
            }
        )

    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        count, batch_format="pandas"
    )


def sql_bpe_token_count() -> str:
    return (
        r"SELECT doc_id, "
        r"CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_ws_tokens, "
        "CAST(length(regexp_extract_all(text, "
        "' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 " + "\\t\\n" + "]+|[ \\t\\n]+')) "
        "AS BIGINT) AS n_bpe_tokens FROM documents"
    )


def text_quality(sf_dir: str) -> ray.data.Dataset:
    """Quality-signal counters (all integers → bit-exact vs the SQL oracle)."""
    ensure_picklable()

    def score(df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"]
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_chars_m": text.str.len().astype("int64"),
                "n_tokens": text.str.count(_TOKEN_RE).astype("int64"),
                "n_words": text.str.count(_WORD_RE).astype("int64"),
                "n_punct": text.str.count(r"[.!?,;:]").astype("int64"),
                "n_stop": text.str.count(r"\b(?:the|a|and|of|to|in|is)\b").astype("int64"),
            }
        )

    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        score, batch_format="pandas"
    )


def token_histogram(sf_dir: str) -> ray.data.Dataset:
    """Word-count with a per-batch combiner: tokens never shuffle raw — only
    (token, partial count) rows do.  Top-20 by (count desc, token)."""
    ensure_picklable()
    from ray.data.aggregate import Sum

    def partial_counts(df: pd.DataFrame) -> "pa.Table":
        # Arrow block out: Ray's sort-aggregate over pandas blocks with
        # object-dtype keys measured ~8x slower than over Arrow
        import pyarrow as pa

        toks = df["text"].str.findall(_TOKEN_RE).explode().dropna()
        counts = toks.value_counts()
        return pa.table(
            {"token": pa.array(counts.index, type=pa.string()),
             "part_n": pa.array(counts.to_numpy().astype("int64"))}
        )

    ds = read_table(sf_dir, "documents", columns=["text"])
    ds = ds.map_batches(partial_counts, batch_format="pandas")
    agg = ds.groupby("token").aggregate(Sum("part_n", alias_name="n"))
    return agg.sort(["n", "token"], descending=[True, False]).limit(20)


def langid(sf_dir: str) -> ray.data.Dataset:
    """Heuristic language ID: stopword-hit scoring per language; ties → 'und'.

    Vectorized: one regex count per language per batch."""
    ensure_picklable()
    import numpy as np

    patterns = {
        lang: r"\b(?:" + "|".join(words) + r")\b" for lang, words in sorted(STOPWORDS.items())
    }

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        lower = df["text"].str.lower()
        scores = np.stack(
            [lower.str.count(pat).to_numpy() for pat in patterns.values()], axis=1
        )
        langs = np.array(list(patterns.keys()))
        best = scores.argmax(axis=1)
        best_score = scores.max(axis=1)
        second = np.sort(scores, axis=1)[:, -2] if scores.shape[1] > 1 else np.zeros(len(df))
        pred = np.where(best_score > second, langs[best], "und")
        pred = np.where(best_score == 0, "und", pred)
        return pd.DataFrame({"doc_id": df["doc_id"], "lang_pred": pred, "lang": df["lang"]})

    return read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"]).map_batches(
        classify, batch_format="pandas"
    )


def fingerprint(sf_dir: str) -> ray.data.Dataset:
    """Winnowing-style document fingerprint: rolling 8-gram FNV window,
    keep the 4 smallest window hashes → hex-joined fingerprint string."""
    ensure_picklable()

    import numpy as np

    _OFFSET = np.uint32(0x811C9DC5)
    _PRIME = np.uint32(0x1000193)

    def fp_one(text: str) -> str:
        k = 8
        if len(text) < k:
            hashes = np.array([fnv1a_32(text)], dtype=np.uint64)
        else:
            # all windows at once: FNV-1a is sequential over a window's k
            # chars, but fully vectorized ACROSS windows (k=8 tiny loop)
            cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
            win = np.lib.stride_tricks.sliding_window_view(cps, k)
            h = np.full(len(win), _OFFSET, dtype=np.uint32)
            with np.errstate(over="ignore"):
                for j in range(k):
                    h = (h ^ win[:, j]) * _PRIME
            hashes = h.astype(np.uint64)
        smallest = np.unique(hashes)[:4]
        return "-".join(f"{int(h):08x}" for h in smallest)

    def fp(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "fingerprint": [fp_one(t) for t in df["text"]]}
        )

    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        fp, batch_format="pandas"
    )


def repetition_stats(sf_dir: str) -> ray.data.Dataset:
    """Gopher-style repetition signals (Rae et al. 2021, public method):
    characters inside duplicated lines, and the most-frequent word bigram's
    count — the standard repetitious-document filters for training corpora.

    Integer-only outputs (numerators/denominators, not fractions) so the
    DuckDB oracle matches bit-for-bit: (doc_id, dup_line_chars, line_chars,
    top_bigram_n, n_bigrams)."""
    ensure_picklable()
    from collections import Counter

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        dup_chars, tot_chars, top_bi, n_bi = [], [], [], []
        for text in df["text"]:
            lines = text.split("\n")
            counts = Counter(lines)
            tot_chars.append(sum(len(ln) for ln in lines))
            dup_chars.append(
                sum(len(ln) for ln in lines if counts[ln] > 1)
            )
            toks = text.split()
            bigrams = Counter(
                a + " " + b for a, b in zip(toks, toks[1:])
            )
            top_bi.append(max(bigrams.values()) if bigrams else 0)
            n_bi.append(max(len(toks) - 1, 0))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "dup_line_chars": pd.Series(dup_chars, dtype="int64"),
                "line_chars": pd.Series(tot_chars, dtype="int64"),
                "top_bigram_n": pd.Series(top_bi, dtype="int64"),
                "n_bigrams": pd.Series(n_bi, dtype="int64"),
            }
        )

    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        stats, batch_format="pandas"
    )


# above this many distinct tokens the per-worker vocabulary dict stops
# being "small side"; the op switches to the bucketed token⋈logprob join
# (no driver-side vocabulary, all-exchange, unbounded-safe)
_VOCAB_BROADCAST_MAX = 1_000_000
_LP_JOIN_BUCKETS = 64


def unigram_logprob(
    sf_dir: str, *, vocab_broadcast_max: int | None = None
) -> ray.data.Dataset:
    """Unigram language-model scoring — the classic cheap quality signal.

    Phase 1 (both paths): global token counts via per-batch combiners + one
    grouped exchange — the DISTRIBUTED vocabulary.  The driver then learns
    only the vocabulary SIZE and the total token count (scalar aggregates):

    - vocabulary ≤ ``vocab_broadcast_max``: materialize it (proven
      bounded), broadcast the {token: micro-logprob} dict once
      (``ray.put``), score each batch in place — zero further exchanges.
    - larger: the open-web path.  Per-token logprobs stay a DATASET;
      (doc_id, token, count) rows co-partition with (token, lp) rows by a
      token-hash bucket (one grouped exchange), per-bucket partial sums
      flow into a tiny groupby(doc_id) — nothing token-shaped ever reaches
      the driver.

    Integer micro-logprob sums are order-free, so both paths are
    bit-identical to each other and to the SQL oracle at any parallelism.
    """
    ensure_picklable()
    import numpy as np
    import ray

    from ray.data.aggregate import Sum

    max_b = _VOCAB_BROADCAST_MAX if vocab_broadcast_max is None else vocab_broadcast_max

    def partial_counts(df: pd.DataFrame) -> "pa.Table":
        # Arrow block out — same ~8x aggregate win as token_histogram
        import pyarrow as pa

        toks = df["text"].str.findall(_TOKEN_RE).explode().dropna()
        counts = toks.value_counts()
        return pa.table(
            {"token": pa.array(counts.index, type=pa.string()),
             "part_n": pa.array(counts.to_numpy().astype("int64"))}
        )

    vocab_ds = (
        read_table(sf_dir, "documents", columns=["text"])
        .map_batches(partial_counts, batch_format="pandas")
        .groupby("token")
        .aggregate(Sum("part_n", alias_name="n"))
        .materialize()  # consumed 2-3 times; object-store resident
    )
    total = int(vocab_ds.sum("n"))
    n_vocab = vocab_ds.count()
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    if n_vocab <= max_b:
        vocab = vocab_ds.to_pandas()  # proven bounded before materializing
        lp_micro = np.round(np.log2(vocab["n"].to_numpy() / total) * 1e6).astype("int64")
        lp_ref = ray.put(dict(zip(vocab["token"], lp_micro)))

        def score(df: pd.DataFrame) -> pd.DataFrame:
            lp = ray.get(lp_ref)
            out_lp, out_n = [], []
            for text in df["text"]:
                toks = re.findall(_TOKEN_RE, text)
                out_lp.append(int(sum(lp[t] for t in toks)))
                out_n.append(len(toks))
            return pd.DataFrame(
                {
                    "doc_id": df["doc_id"],
                    "logprob_micro": pd.Series(out_lp, dtype="int64"),
                    "n_tokens": pd.Series(out_n, dtype="int64"),
                }
            )

        return docs.map_batches(score, batch_format="pandas")

    # ---- bucketed join path (vocabulary too large to broadcast) ----------
    def _bucket(tokens: pd.Series) -> np.ndarray:
        return (pd.util.hash_array(tokens.to_numpy(object)) % _LP_JOIN_BUCKETS).astype("int64")

    def lp_rows(df: pd.DataFrame) -> pd.DataFrame:
        lp = np.round(np.log2(df["n"].to_numpy() / total) * 1e6).astype("int64")
        return pd.DataFrame(
            {"bucket": _bucket(df["token"]), "side": "l", "doc_id": np.int64(-1),
             "token": df["token"], "cnt": np.int64(0), "lp": lp}
        )

    def doc_token_rows(df: pd.DataFrame) -> pd.DataFrame:
        toks = df.set_index("doc_id")["text"].str.findall(_TOKEN_RE).explode().dropna()
        g = toks.groupby([toks.index, toks.to_numpy()]).size()
        idx = g.index
        tokens = pd.Series(idx.get_level_values(1))
        return pd.DataFrame(
            {"bucket": _bucket(tokens), "side": "d",
             "doc_id": idx.get_level_values(0).to_numpy().astype("int64"),
             "token": tokens.to_numpy(), "cnt": g.to_numpy().astype("int64"),
             "lp": np.int64(0)}
        )

    both = vocab_ds.map_batches(lp_rows, batch_format="pandas").union(
        docs.map_batches(doc_token_rows, batch_format="pandas")
    )

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["side"] == "d"]
        if len(d) == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "lp_part": pd.Series([], dtype="int64"),
                                 "n_part": pd.Series([], dtype="int64")})
        lut = df[df["side"] == "l"]
        lp = d["token"].map(dict(zip(lut["token"], lut["lp"]))).astype("int64")
        part = pd.DataFrame(
            {"doc_id": d["doc_id"].to_numpy(),
             "lp_part": (lp * d["cnt"]).to_numpy(),
             "n_part": d["cnt"].to_numpy()}
        )
        g = part.groupby("doc_id", sort=False).sum()
        return g.reset_index()

    from .util import grouped_block_map

    def _arrow(df: pd.DataFrame) -> "pa.Table":
        # the final aggregate has one group per DOC (corpus-scale): feed it
        # Arrow blocks — Ray's aggregate over pandas blocks pays a
        # per-group Python dispatch (~27x measured at 60k groups)
        import pyarrow as pa

        return pa.Table.from_pandas(df, preserve_index=False)

    partials = grouped_block_map(both, ["bucket"], join_bucket).map_batches(
        _arrow, batch_format="pandas"
    )

    # zero-token docs still get a row (seed 0-partials per doc)
    def seed_rows(df: pd.DataFrame) -> "pa.Table":
        return _arrow(
            pd.DataFrame(
                {"doc_id": df["doc_id"].astype("int64"),
                 "lp_part": np.int64(0), "n_part": np.int64(0)}
            )
        )

    seeds = docs.map_batches(seed_rows, batch_format="pandas")
    agg = partials.union(seeds).groupby("doc_id").aggregate(
        Sum("lp_part", alias_name="logprob_micro"),
        Sum("n_part", alias_name="n_tokens"),
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"),
             "logprob_micro": df["logprob_micro"].astype("int64"),
             "n_tokens": df["n_tokens"].astype("int64")}
        )

    return agg.map_batches(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction: per-doc top-k terms by integer tf-idf score.
# Document frequency is computed distributed (per-batch combiner → one
# grouped exchange of (token, partial) rows); idf attaches to the
# (doc, token, tf) rows via a token-hash BUCKETED join — a per-row lookup
# inside each bucket, so a hot token ("the", df ≈ n_docs) never needs its
# rows co-located in one group the way a groupby(token) plan would.  No
# vocabulary ever reaches the driver.  Integer scores (micro-idf floor
# division) keep the DuckDB oracle bit-exact at any parallelism.
# ---------------------------------------------------------------------------

_TFIDF_K = 3
_TFIDF_BUCKETS = 64
_IDF_MICRO = 1_000_000


def tfidf_topk(sf_dir: str) -> ray.data.Dataset:
    """Per-doc top-3 terms by tf * ((n_docs * 1e6) // df), ties → token asc.

    Stages: explode → tf rows (materialized once, consumed twice) →
    df via combiner + groupby(token) → bucketed idf⋈tf join → per-doc
    top-k.  Returns (doc_id, rk, token, score)."""
    ensure_picklable()
    import numpy as np

    from ray.data.aggregate import Sum

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = docs.count()

    def tf_rows(t: "pa.Table") -> "pa.Table":
        # Arrow-native explode + count (VERDICT r3 Wrong #3): the read is
        # Arrow, so the hottest combiner (one row per distinct (doc, token))
        # stays zero-copy — split_pattern_regex(\s+) + drop "" ≡ findall(\S+)
        import pyarrow as pa
        import pyarrow.compute as pc

        toks = pc.split_pattern_regex(t.column("text"), r"\s+")
        flat = pc.list_flatten(toks)
        ids = pc.take(t.column("doc_id"), pc.list_parent_indices(toks))
        mask = pc.not_equal(flat, "")
        tbl = pa.table({"doc_id": ids.filter(mask), "token": flat.filter(mask)})
        g = tbl.group_by(["doc_id", "token"]).aggregate([([], "count_all")])
        return g.rename_columns(["doc_id", "token", "tf"])

    tf = docs.map_batches(tf_rows, batch_format="pyarrow").materialize()

    def df_partials(t: "pa.Table") -> "pa.Table":
        # (doc_id, token) is unique, so a token's batch row count IS its
        # batch-partial document frequency
        g = t.select(["token"]).group_by(["token"]).aggregate([([], "count_all")])
        return g.rename_columns(["token", "part_df"])

    dfreq = (
        tf.map_batches(df_partials, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("part_df", alias_name="df"))
    )

    def _bucket(tokens: pd.Series) -> "np.ndarray":
        return (
            pd.util.hash_array(tokens.to_numpy(object)) % _TFIDF_BUCKETS
        ).astype("int64")

    def idf_rows(df: pd.DataFrame) -> pd.DataFrame:
        idf = (np.int64(n_docs) * _IDF_MICRO) // df["df"].to_numpy()
        return pd.DataFrame(
            {"bucket": _bucket(df["token"]), "side": "l",
             "doc_id": np.int64(-1), "token": df["token"],
             "tf": np.int64(0), "idf": idf.astype("int64")}
        )

    def tf_side(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"bucket": _bucket(df["token"]), "side": "d",
             "doc_id": df["doc_id"].astype("int64"), "token": df["token"],
             "tf": df["tf"].astype("int64"), "idf": np.int64(0)}
        )

    both = dfreq.map_batches(idf_rows, batch_format="pandas").union(
        tf.map_batches(tf_side, batch_format="pandas")
    )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g[g["side"] == "d"]
        if len(d) == 0:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "token": pd.Series([], dtype="object"),
                 "score": pd.Series([], dtype="int64")}
            )
        lut = g[g["side"] == "l"]
        idf = d["token"].map(dict(zip(lut["token"], lut["idf"])))
        out = pd.DataFrame(
            {"doc_id": d["doc_id"].to_numpy(),
             "token": d["token"].to_numpy(),
             "score": d["tf"].to_numpy() * idf.to_numpy().astype("int64")}
        )
        # combiner: global top-k ⊆ union of per-bucket top-k, so the doc
        # exchange carries ≤ k rows per (doc, bucket) instead of every
        # scored token the doc has
        out = out.sort_values(
            ["score", "token"], ascending=[False, True], kind="mergesort"
        )
        return out.groupby("doc_id", sort=False).head(_TFIDF_K)

    scored = grouped_block_map(both, ["bucket"], join_bucket)

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["score", "token"], ascending=[False, True], kind="mergesort"
        ).head(_TFIDF_K)
        return pd.DataFrame(
            {"doc_id": g["doc_id"].to_numpy(),
             "rk": np.arange(1, len(g) + 1, dtype="int64"),
             "token": g["token"].to_numpy(),
             "score": g["score"].to_numpy().astype("int64")}
        )

    return grouped_block_map(scored, ["doc_id"], topk)


def sql_tfidf_topk() -> str:
    return (
        r"WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks "
        "FROM documents), "
        "u AS (SELECT doc_id, unnest(toks) AS token FROM t), "
        "tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf "
        "FROM u GROUP BY doc_id, token), "
        "df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf "
        "GROUP BY token), "
        "n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents), "
        "s AS (SELECT tf.doc_id, tf.token, "
        f"tf.tf * ((n.n * {_IDF_MICRO}) // df.df) AS score "
        "FROM tf, df, n WHERE tf.token = df.token), "
        "r AS (SELECT doc_id, token, score, CAST(row_number() OVER ("
        "PARTITION BY doc_id ORDER BY score DESC, token) AS BIGINT) AS rk "
        "FROM s) "
        f"SELECT doc_id, rk, token, score FROM r WHERE rk <= {_TFIDF_K}"
    )


# ---------------------------------------------------------------------------
# PII redaction: the standard pre-training scrub pass (emails / IPv4 /
# phone patterns → typed placeholders).  The synthetic corpus carries no
# PII, so — like ``html_extract`` below — the op derives a deterministic
# augmented text (doc_id-seeded contact line appended) on BOTH sides, then
# redacts; the SQL oracle rebuilds the same augmentation with string
# concatenation and replays the redaction with RE2 ``regexp_replace``.
# ---------------------------------------------------------------------------

# RE2-compatible (no lookaround/backrefs) so Python re and DuckDB agree.
PII_PATTERNS = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b555-\d{4}\b", "<PHONE>"),
]


def pii_augment_expr_sql() -> str:
    """The doc_id-seeded contact line, as a DuckDB expression over documents."""
    return (
        "text || ' Contact user' || CAST(doc_id AS VARCHAR) || "
        "'@example.org from 10.' || CAST(doc_id % 256 AS VARCHAR) || "
        "'.0.1 or call 555-' || CAST(1000 + doc_id % 9000 AS VARCHAR) || ' now.'"
    )


def _pii_augment(doc_id: int, text: str) -> str:
    return (
        f"{text} Contact user{doc_id}@example.org from 10.{doc_id % 256}.0.1 "
        f"or call 555-{1000 + doc_id % 9000} now."
    )


def pii_redact(sf_dir: str) -> ray.data.Dataset:
    """Redact emails/IPv4/phone patterns → placeholders; count matches.

    Embarrassingly parallel: one vectorized ``str.count`` + ``str.replace``
    per pattern per batch, no exchange.  ``n_pii`` counts matches on the
    ORIGINAL text (before any replacement) so the three counters are
    independent of replacement order; replacements apply in the fixed
    PII_PATTERNS order on both sides."""
    ensure_picklable()

    def redact(df: pd.DataFrame) -> pd.DataFrame:
        aug = pd.Series(
            [_pii_augment(int(d), t) for d, t in zip(df["doc_id"], df["text"])],
            index=df.index,
        )
        n = pd.Series(0, index=df.index, dtype="int64")
        red = aug
        for pat, repl in PII_PATTERNS:
            n = n + aug.str.count(pat).astype("int64")
            red = red.str.replace(pat, repl, regex=True)
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "text_redacted": red, "n_pii": n}
        )

    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        redact, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# Paragraph-level exact dedup (ccnet-style): drop every repeated paragraph
# corpus-wide, keeping only its first occurrence (min (doc_id, position)).
# The raw synthetic docs are single-line, so the op derives paragraphs
# deterministically as consecutive 10-token chunks — the same
# derive-on-both-sides pattern as ``html_extract``/``pii_redact``.
# ---------------------------------------------------------------------------

_PARA_TOKENS = 10
# occurrence key = doc_id * 1e6 + 1-based chunk start; assumes documents
# under 10M tokens and doc_id < 9.2e12 (int64).  At web scale both hold.
_PARA_KEY_MUL = 1_000_000


def _para_explode(df: pd.DataFrame) -> pd.DataFrame:
    paras, doc_ids, idxs = [], [], []
    for doc_id, text in zip(df["doc_id"], df["text"]):
        toks = re.findall(_TOKEN_RE, text)
        for i in range(1, len(toks) + 1, _PARA_TOKENS):
            paras.append(" ".join(toks[i - 1 : i - 1 + _PARA_TOKENS]))
            doc_ids.append(int(doc_id))
            idxs.append(i)
    return pd.DataFrame(
        {
            "para": paras,
            "doc_id": pd.Series(doc_ids, dtype="int64"),
            "i": pd.Series(idxs, dtype="int64"),
            "n_paras": pd.Series([0] * len(paras), dtype="int64"),
        }
    )


def _para_seeds(df: pd.DataFrame) -> pd.DataFrame:
    # one row per doc (i = -1) carrying its total chunk count, so
    # fully-deduped and empty docs still get an output row.  Seeds skip
    # the para exchange entirely — routing them through it would pile
    # every doc into one degenerate "" group (hot key).
    counts = [
        -(-len(re.findall(_TOKEN_RE, t)) // _PARA_TOKENS) for t in df["text"]
    ]
    return pd.DataFrame(
        {
            "para": [""] * len(df),
            "doc_id": df["doc_id"].astype("int64").to_numpy(),
            "i": pd.Series([-1] * len(df), dtype="int64"),
            "n_paras": pd.Series(counts, dtype="int64"),
        }
    )


def _para_combiner(df: pd.DataFrame) -> pd.DataFrame:
    if len(df) == 0:
        return df
    key = df["doc_id"].to_numpy() * _PARA_KEY_MUL + df["i"].to_numpy()
    out = df.assign(_k=key).sort_values("_k", kind="mergesort")
    return out.groupby("para", sort=False).head(1).drop(columns="_k")


def _para_winner(g: pd.DataFrame) -> pd.DataFrame:
    import numpy as np

    key = g["doc_id"].to_numpy() * _PARA_KEY_MUL + g["i"].to_numpy()
    return g.iloc[[int(np.argmin(key))]]


def _para_assemble(g: pd.DataFrame) -> pd.DataFrame:
    kept = g[g["i"] >= 0].sort_values("i", kind="mergesort")
    seed = g[g["i"] < 0]
    return pd.DataFrame(
        {
            "doc_id": [int(g["doc_id"].iloc[0])],
            "text_dedup": [" ".join(kept["para"])],
            "n_paras": [int(seed["n_paras"].iloc[0]) if len(seed) else 0],
            "n_kept": [len(kept)],
        }
    )


def paragraph_winners(docs: ray.data.Dataset) -> ray.data.Dataset:
    """The expensive global phase of paragraph dedup: occurrence explode →
    per-batch min-key combiner → one grouped exchange on ``para`` picking
    the global min-key winner.  Split out so the resumable runner
    (``state/op_resume.py``) can checkpoint its result as parquet."""
    occ = docs.map_batches(_para_explode, batch_format="pandas")
    occ = occ.map_batches(_para_combiner, batch_format="pandas")
    return grouped_block_map(occ, ["para"], _para_winner)


def paragraph_dedup(sf_dir: str) -> ray.data.Dataset:
    """Corpus-wide exact paragraph dedup with per-doc reassembly.

    Fully distributed — nothing paragraph-shaped touches the driver:
    1. explode docs into (para, doc_id, i, key) occurrence rows, plus one
       seed row per doc carrying its total chunk count (so fully-deduped
       and empty docs still get an output row);
    2. per-batch combiner keeps only the batch-local min-key occurrence of
       each para (drops most duplicates before the exchange);
    3. one grouped exchange on ``para`` picks the global min-key winner;
    4. one grouped exchange on ``doc_id`` reassembles winners in position
       order → (doc_id, text_dedup, n_paras, n_kept).
    """
    ensure_picklable()

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    winners = paragraph_winners(docs)
    seed_ds = docs.map_batches(_para_seeds, batch_format="pandas")
    return grouped_block_map(winners.union(seed_ds), ["doc_id"], _para_assemble)


def sql_paragraph_dedup() -> str:
    k = _PARA_TOKENS
    return (
        r"WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks "
        "FROM documents), "
        f"c AS (SELECT doc_id, i, array_to_string(toks[i:i+{k - 1}], ' ') AS para "
        f"FROM t, UNNEST(range(1, len(toks) + 1, {k})) AS r(i) "
        "WHERE len(toks) > 0), "
        "w AS (SELECT doc_id, i, para, "
        f"MIN(doc_id * {_PARA_KEY_MUL} + i) OVER (PARTITION BY para) AS wk FROM c), "
        "k AS (SELECT doc_id, string_agg(para, ' ' ORDER BY i) AS text_dedup, "
        "CAST(COUNT(*) AS BIGINT) AS n_kept FROM w "
        f"WHERE doc_id * {_PARA_KEY_MUL} + i = wk GROUP BY doc_id), "
        "np AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_paras FROM c "
        "GROUP BY doc_id) "
        "SELECT d.doc_id, COALESCE(k.text_dedup, '') AS text_dedup, "
        "COALESCE(np.n_paras, 0) AS n_paras, COALESCE(k.n_kept, 0) AS n_kept "
        "FROM documents d LEFT JOIN k ON d.doc_id = k.doc_id "
        "LEFT JOIN np ON d.doc_id = np.doc_id"
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination: flag documents sharing any full 4-token-gram
# with the "benchmark" subset (doc_id % 50 == 0 — the small held-out side,
# standard decontamination setting).  The benchmark gram set is the
# broadcast small side (ray.put once, read per batch); corpus docs stream.
# ---------------------------------------------------------------------------

_DECON_N = 4
_DECON_BENCH_MOD = 50


def _doc_grams(text: str) -> set:
    toks = re.findall(_TOKEN_RE, text)
    n = _DECON_N
    return {" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)}


def ngram_decontaminate(sf_dir: str) -> ray.data.Dataset:
    """Per-doc contamination flag + distinct-hit count vs the benchmark set.

    The benchmark gram set is bounded by the benchmark corpus (tiny by
    definition); it is collected once (distinct per batch first) and
    broadcast.  The full-corpus scan is a single embarrassingly-parallel
    pass — no exchange."""
    ensure_picklable()
    import ray as _ray

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def bench_grams(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[df["doc_id"] % _DECON_BENCH_MOD == 0]
        grams: set = set()
        for text in sub["text"]:
            grams |= _doc_grams(text)
        return pd.DataFrame({"gram": sorted(grams)})

    # distinct-per-batch partials → tiny driver-side union (benchmark-sized)
    bench = set()
    for batch in (
        docs.map_batches(bench_grams, batch_format="pandas")
        .iter_batches(batch_format="pandas")
    ):
        bench.update(batch["gram"])
    bench_ref = _ray.put(frozenset(bench))

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        bset = _ray.get(bench_ref)
        hits = [len(_doc_grams(t) & bset) for t in df["text"]]
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "contaminated": pd.Series(
                    [1 if h else 0 for h in hits], dtype="int64"
                ),
                "n_hits": pd.Series(hits, dtype="int64"),
            }
        )

    return docs.map_batches(flag, batch_format="pandas")


def sql_ngram_decontaminate() -> str:
    n = _DECON_N
    return (
        r"WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks "
        "FROM documents), "
        f"g AS (SELECT doc_id, array_to_string(toks[i:i+{n - 1}], ' ') AS gram "
        f"FROM t, UNNEST(range(1, len(toks) - {n - 2})) AS r(i) "
        f"WHERE len(toks) >= {n}), "
        "bench AS (SELECT DISTINCT gram FROM g "
        f"WHERE doc_id % {_DECON_BENCH_MOD} = 0), "
        "h AS (SELECT doc_id, CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_hits "
        "FROM g WHERE gram IN (SELECT gram FROM bench) GROUP BY doc_id) "
        "SELECT d.doc_id, CAST(CASE WHEN COALESCE(h.n_hits, 0) > 0 THEN 1 "
        "ELSE 0 END AS BIGINT) AS contaminated, "
        "COALESCE(h.n_hits, 0) AS n_hits "
        "FROM documents d LEFT JOIN h ON d.doc_id = h.doc_id"
    )


# ---------------------------------------------------------------------------
# Quality classifier: a fasttext-shaped hashed-feature linear model.  The
# "model" is deterministic by construction — weight(token) =
# fmix32(fnv1a32(token)) % 2001 - 1000 — so scoring is bit-reproducible
# in DuckDB (no trained weights to ship), while the Ray side keeps the
# exact shape a real classifier stage has: a callable CLASS on an actor
# pool whose per-actor state (here a token→weight memo standing in for
# loaded model weights) is built once in __init__ and reused per batch.
# ---------------------------------------------------------------------------

_QC_MOD = 2001
_QC_OFFSET = 1000


class _HashedLinearScorer:
    """Actor-pool scorer.  Hashing runs only over each batch's NEW unique
    tokens (Zipf makes the memo hit rate → 1 quickly); weight lookup and
    per-doc summing are vectorized pandas ops."""

    def __init__(self) -> None:
        self._memo: dict = {}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        from .sampling import fmix32_np

        toks = df.reset_index(drop=True)["text"].str.findall(_TOKEN_RE)
        ex = toks.explode().dropna()
        score = np.zeros(len(df), dtype=np.int64)
        n = np.zeros(len(df), dtype=np.int64)
        if len(ex):
            uniq = pd.unique(ex.to_numpy())
            new = [t for t in uniq if t not in self._memo]
            if new:
                fnv = np.array([fnv1a_32(t) for t in new], dtype=np.uint64)
                w = (fmix32_np(fnv).astype(np.int64) % _QC_MOD) - _QC_OFFSET
                self._memo.update(zip(new, w.tolist()))
            wts = ex.map(self._memo).astype("int64")
            sums = wts.groupby(ex.index).sum()
            counts = ex.groupby(ex.index).size()
            score[sums.index.to_numpy()] = sums.to_numpy()
            n[counts.index.to_numpy()] = counts.to_numpy()
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "score": score,
                "n_tokens": n,
                "label": (score >= 0).astype("int64"),
            }
        )


def quality_classifier(sf_dir: str) -> ray.data.Dataset:
    """Score every document with the hashed-feature linear model.

    Embarrassingly parallel — no exchange; the actor pool amortizes the
    weight memo across batches exactly as it would a loaded model."""
    ensure_picklable()
    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        _HashedLinearScorer, batch_format="pandas", concurrency=(1, 4)
    )


def sql_quality_classifier() -> str:
    from .sql_oracles import _fmix32_ctes, sql_fnv1a32

    frag, final = _fmix32_ctes("qx", "qf", ["token"], "hin", "hv")
    return (
        r"WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks "
        "FROM documents), "
        "u AS (SELECT doc_id, unnest(toks) AS token FROM t), "
        "tok AS (SELECT DISTINCT token FROM u), "
        f"qf AS (SELECT token, {sql_fnv1a32('token')} AS hin FROM tok), "
        f"{frag}, "
        f"w AS (SELECT token, (hv % {_QC_MOD}) - {_QC_OFFSET} AS w FROM {final}), "
        "s AS (SELECT u.doc_id, CAST(SUM(w.w) AS BIGINT) AS score, "
        "CAST(COUNT(*) AS BIGINT) AS n_tokens FROM u "
        "JOIN w ON u.token = w.token GROUP BY u.doc_id) "
        "SELECT d.doc_id, COALESCE(s.score, 0) AS score, "
        "COALESCE(s.n_tokens, 0) AS n_tokens, "
        "CAST(COALESCE(s.score, 0) >= 0 AS BIGINT) AS label "
        "FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id"
    )


# ---------------------------------------------------------------------------
# documents-derived HTML round-trip: wrap text in deterministic boilerplate,
# extract with the HTML arm, recover the text byte-exactly (SQL oracle =
# plain SELECT of the original text).
# ---------------------------------------------------------------------------

def _escape(text: str) -> str:
    return text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def wrap_document_html(doc_id: int, text: str) -> str:
    paras = "".join(f"<p>{_escape(line)}</p>" for line in text.split("\n"))
    return (
        "<!DOCTYPE html><html><head><title>doc</title>"
        '<script>track();</script></head><body>'
        '<nav><a href="/">home</a> <a href="/about">about</a></nav>'
        f"<article>{paras}</article>"
        '<aside><p><a href="/x">related</a> <a href="/y">links</a></p></aside>'
        f"<footer><p>footer {doc_id}</p></footer></body></html>"
    )


def html_extract(sf_dir: str) -> ray.data.Dataset:
    """Wrap → boilerplate-strip → byte-exact text recovery per url."""
    ensure_picklable()
    from ..functions.html_strip import strip_html

    def run(df: pd.DataFrame) -> pd.DataFrame:
        urls, texts = [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            html = wrap_document_html(int(doc_id), text)
            urls.append(f"https://docs.example/{int(doc_id)}")
            texts.append(strip_html(html)["text"])
        return pd.DataFrame({"url": urls, "text": texts})

    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        run, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# training-data chunking (round 4)
# ---------------------------------------------------------------------------

_CHUNK_W = 64   # tokens per training chunk
_CHUNK_STEP = 48  # stride (overlap = W - STEP = 16 tokens)


def doc_chunks(sf_dir: str) -> ray.data.Dataset:
    """Sliding-window token chunking with overlap — the standard
    pretraining chunker (context windows of W tokens, stride W-O).

    Chunk starts are s = 0, STEP, 2*STEP, ... while s + W < n_tokens, plus
    the final chunk containing the end, so every token is covered and no
    chunk is fully contained in its predecessor; 0-token docs emit no
    chunk.  Pure per-row explode — no exchange, no state, stable under any
    parallelism and resume boundary.  Output: (doc_id, chunk_id,
    chunk_text, n_tokens)."""
    ensure_picklable()

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        doc_ids, chunk_ids, texts, ntoks = [], [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            toks = re.findall(_TOKEN_RE, text)
            n = len(toks)
            if n == 0:
                continue
            n_chunks = 1 + (max(n - _CHUNK_W, 0) + _CHUNK_STEP - 1) // _CHUNK_STEP
            for c in range(n_chunks):
                s = c * _CHUNK_STEP
                doc_ids.append(int(doc_id))
                chunk_ids.append(c)
                texts.append(" ".join(toks[s : s + _CHUNK_W]))
                ntoks.append(min(_CHUNK_W, n - s))
        return pd.DataFrame(
            {
                "doc_id": pd.Series(doc_ids, dtype="int64"),
                "chunk_id": pd.Series(chunk_ids, dtype="int64"),
                "chunk_text": pd.Series(texts, dtype=object),
                "n_tokens": pd.Series(ntoks, dtype="int64"),
            }
        )

    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        explode, batch_format="pandas"
    )


def sql_doc_chunks() -> str:
    w, st = _CHUNK_W, _CHUNK_STEP
    return (
        r"WITH tk AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks "
        "FROM documents), "
        "ch AS (SELECT doc_id, toks, unnest(range(0, CASE WHEN len(toks) = 0 "
        f"THEN 0 ELSE 1 + (greatest(len(toks) - {w}, 0) + {st - 1}) // {st} "
        "END)) AS chunk_id FROM tk) "
        "SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id, "
        f"array_to_string(toks[chunk_id * {st} + 1 : chunk_id * {st} + {w}], ' ') "
        "AS chunk_text, "
        f"CAST(least({w}, len(toks) - chunk_id * {st}) AS BIGINT) AS n_tokens "
        "FROM ch"
    )


# ---------------------------------------------------------------------------
# inverted index (round 4)
# ---------------------------------------------------------------------------

_INDEX_MIN_DF = 25
_INDEX_MAX_DF = 1_000_000


def inverted_index(
    sf_dir: str, *, min_df: int = _INDEX_MIN_DF, max_df: int = _INDEX_MAX_DF
) -> ray.data.Dataset:
    """Token → sorted posting list over the corpus (search/decontamination
    primitive).  Tokens outside [min_df, max_df] are dropped: sub-min_df
    tokens are noise, super-max_df tokens are stopword-frequency and their
    postings would be corpus-sized (a real index shards those; the band
    keeps every posting row output-bounded by construction).

    Plan: Arrow-native distinct (doc, token) rows per batch (the same
    zero-copy explode as tfidf) → one grouped exchange on token → per-group
    df + ','-joined sorted postings.  Output: (token, df, postings)."""
    ensure_picklable()
    import numpy as np

    def tok_rows(t: "pa.Table") -> "pa.Table":
        import pyarrow as pa
        import pyarrow.compute as pc

        toks = pc.split_pattern_regex(t.column("text"), r"\s+")
        flat = pc.list_flatten(toks)
        ids = pc.take(t.column("doc_id"), pc.list_parent_indices(toks))
        mask = pc.not_equal(flat, "")
        tbl = pa.table({"doc_id": ids.filter(mask), "token": flat.filter(mask)})
        # batch-local distinct: (doc, token) appears once per batch
        g = tbl.group_by(["doc_id", "token"]).aggregate([([], "count_all")])
        return g.select(["doc_id", "token"])

    def postings(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g["doc_id"].to_numpy(dtype=np.int64))
        if not (min_df <= len(ids) <= max_df):
            return pd.DataFrame(
                {"token": pd.Series([], dtype=object),
                 "df": pd.Series([], dtype="int64"),
                 "postings": pd.Series([], dtype=object)}
            )
        return pd.DataFrame(
            {
                "token": [g["token"].iloc[0]],
                "df": pd.Series([len(ids)], dtype="int64"),
                "postings": [",".join(str(i) for i in ids)],
            }
        )

    rows = read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        tok_rows, batch_format="pyarrow"
    )
    return grouped_block_map(rows, ["token"], postings)


def sql_inverted_index(
    min_df: int = _INDEX_MIN_DF, max_df: int = _INDEX_MAX_DF
) -> str:
    return (
        "WITH tk AS (SELECT DISTINCT doc_id, tok AS token FROM documents, "
        r"UNNEST(regexp_extract_all(text, '\S+')) AS u(tok)) "
        "SELECT token, CAST(COUNT(*) AS BIGINT) AS df, "
        "string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings "
        f"FROM tk GROUP BY token HAVING COUNT(*) BETWEEN {min_df} AND {max_df}"
    )


# ---------------------------------------------------------------------------
# Exact substring dedup (published method: Lee et al. 2022, "Deduplicating
# Training Data Makes Language Models Better" — ExactSubstr): remove every
# occurrence of a cross-document duplicated k-token window EXCEPT the ones
# in the window's minimum-doc_id holder (keep-one semantics).  The reference
# has no corpus-level dedup at all (SURVEY §2.7: each doc independent); this
# is the training-data op its per-page overlap dedup scales up to.
#
# The synthetic documents share no long passages, so a deterministic
# boilerplate augmentation (same precedent as pii_redact / line_dedup)
# appends one of three ≥k-token passages to every even doc_id — the dup
# detection provably binds and the DuckDB oracle replays the augmentation.
#
# Scale design: phase 1 emits per-batch COMBINED (window-md5, partial
# distinct-doc count, partial min-doc) rows — each document is one input
# row, so batch-local distinct (h, doc) pairs are globally distinct and the
# partial counts sum exactly; one grouped exchange on the md5 key.  The
# driver then learns only the dup-window COUNT (a scalar):
#   - count ≤ broadcast bound: the {h: keeper} map broadcasts via ray.put
#     and the removal pass is a pure per-doc map — zero further exchanges;
#   - larger (the open-web path): dup rows stay a DATASET; window
#     occurrences co-partition with dup rows by an md5-hash bucket (one
#     grouped exchange), surviving (doc, start) removals co-partition with
#     the tagged text rows on doc_id (one more), and the per-doc rebuild is
#     block-local.  Nothing window-shaped ever reaches the driver.
# Both paths are bit-identical to each other and to the SQL oracle.
# ---------------------------------------------------------------------------

_SUBDUP_K = 8
_SUBDUP_BROADCAST_MAX = 1_000_000
_SUBDUP_BUCKETS = 64
_SUBDUP_PASSAGES = (
    "This website uses cookies to ensure you get the best experience on our site",
    "All rights reserved unauthorized reproduction of this article is strictly prohibited",
    "Subscribe to our newsletter for the latest updates delivered directly to your inbox",
)


def _subdup_augment(doc_id: int, text: str) -> str:
    if doc_id % 2 == 0:
        return text + " " + _SUBDUP_PASSAGES[doc_id % 3]
    return text


def _subdup_windows(toks: list) -> list:
    k = _SUBDUP_K
    return [
        hashlib.md5(" ".join(toks[i : i + k]).encode("utf-8")).hexdigest()
        for i in range(len(toks) - k + 1)
    ]


def _subdup_win_partial(df: pd.DataFrame) -> "pa.Table":
    # returns an ARROW block: Ray's sort-aggregate over pandas blocks
    # with object-dtype keys measured ~8x slower than over Arrow
    # (16 s vs 2 s on this very exchange at sf0.001)
    import pyarrow as pa

    h_all: list = []
    d_all: list = []
    for doc_id, text in zip(df["doc_id"], df["text"]):
        hs = set(_subdup_windows(re.findall(_TOKEN_RE, _subdup_augment(int(doc_id), text))))
        h_all.extend(hs)
        d_all.extend([int(doc_id)] * len(hs))
    part = pd.DataFrame({"h": pd.Series(h_all, dtype=object),
                         "doc_id": pd.Series(d_all, dtype="int64")})
    g = part.groupby("h", sort=False)["doc_id"].agg(["count", "min"])
    return pa.table(
        {"h": pa.array(g.index, type=pa.string()),
         "part_docs": pa.array(g["count"].to_numpy().astype("int64")),
         "min_doc": pa.array(g["min"].to_numpy().astype("int64"))}
    )


def subdup_dup_ds(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Phase-1 dup-window table (h, keeper): per-batch combiner + one
    grouped exchange.  Shared by ``substring_dedup`` and the resumable
    runner (``state/op_resume.py``)."""
    from ray.data.aggregate import Min, Sum

    return (
        docs.map_batches(_subdup_win_partial, batch_format="pandas")
        .groupby("h")
        .aggregate(Sum("part_docs", alias_name="n_docs"),
                   Min("min_doc", alias_name="keeper"))
        .map_batches(
            lambda df: df[df["n_docs"] >= 2][["h", "keeper"]],
            batch_format="pandas",
        )
    )


def _subdup_rows(ids, texts, n_toks, n_rm) -> pd.DataFrame:
    return pd.DataFrame(
        {"doc_id": pd.Series(ids, dtype="int64"),
         "text_deduped": pd.Series(texts, dtype=object),
         "n_tokens": pd.Series(n_toks, dtype="int64"),
         "n_removed": pd.Series(n_rm, dtype="int64")}
    )


def subdup_scrub_df(df: pd.DataFrame, dup: dict) -> pd.DataFrame:
    """Broadcast-plan removal pass: drop every occurrence of a dup window
    in every doc except its keeper.  Pure per-doc work."""
    import numpy as np

    k = _SUBDUP_K
    ids, texts, n_toks, n_rm = [], [], [], []
    for doc_id, text in zip(df["doc_id"], df["text"]):
        doc_id = int(doc_id)
        toks = re.findall(_TOKEN_RE, _subdup_augment(doc_id, text))
        mask = np.zeros(len(toks), dtype=bool)
        for i, h in enumerate(_subdup_windows(toks)):
            if dup.get(h, doc_id) != doc_id:
                mask[i : i + k] = True
        ids.append(doc_id)
        texts.append(" ".join(t for t, m in zip(toks, mask) if not m))
        n_toks.append(len(toks))
        n_rm.append(int(mask.sum()))
    return _subdup_rows(ids, texts, n_toks, n_rm)


def substring_dedup(
    sf_dir: str, *, dup_broadcast_max: int | None = None
) -> ray.data.Dataset:
    """Cross-document exact substring dedup, keep-one (min doc_id) — see
    module comment above for semantics and the two physical plans.
    Output: (doc_id, text_deduped, n_tokens, n_removed); ``text_deduped``
    is the surviving tokens joined by single spaces."""
    ensure_picklable()
    import numpy as np
    import ray

    max_b = _SUBDUP_BROADCAST_MAX if dup_broadcast_max is None else dup_broadcast_max
    k = _SUBDUP_K
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    # consumed twice (count + one of the two plans)
    dups = subdup_dup_ds(docs).materialize()
    n_dup = dups.count()

    _rows = _subdup_rows

    if n_dup <= max_b:
        dup_df = dups.to_pandas()  # proven bounded before materializing
        dup_ref = ray.put(dict(zip(dup_df["h"], dup_df["keeper"].astype(int))))

        def scrub(df: pd.DataFrame) -> pd.DataFrame:
            return subdup_scrub_df(df, ray.get(dup_ref))

        return docs.map_batches(scrub, batch_format="pandas")

    # ---- bucketed-join path (dup set too large to broadcast) -------------
    def _bucket(h: pd.Series) -> "np.ndarray":
        return (pd.util.hash_array(h.to_numpy(object)) % _SUBDUP_BUCKETS).astype("int64")

    def dup_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"bucket": _bucket(df["h"]), "side": "d", "doc_id": np.int64(-1),
             "h": df["h"], "i": np.int64(0), "keeper": df["keeper"].astype("int64")}
        )

    def occ_rows(df: pd.DataFrame) -> pd.DataFrame:
        ids, hs, starts = [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            ws = _subdup_windows(re.findall(_TOKEN_RE, _subdup_augment(int(doc_id), text)))
            ids.extend([int(doc_id)] * len(ws))
            hs.extend(ws)
            starts.extend(range(len(ws)))
        h = pd.Series(hs, dtype=object)
        return pd.DataFrame(
            {"bucket": _bucket(h), "side": "w",
             "doc_id": pd.Series(ids, dtype="int64"), "h": h,
             "i": pd.Series(starts, dtype="int64"), "keeper": np.int64(-1)}
        )

    both = dups.map_batches(dup_rows, batch_format="pandas").union(
        docs.map_batches(occ_rows, batch_format="pandas")
    )

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        w = df[df["side"] == "w"]
        d = df[df["side"] == "d"]
        if len(w) == 0 or len(d) == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "i": pd.Series([], dtype="int64")})
        keeper = w["h"].map(dict(zip(d["h"], d["keeper"].astype(int))))
        hit = keeper.notna() & (keeper != w["doc_id"])
        out = w[hit]
        return pd.DataFrame({"doc_id": out["doc_id"].to_numpy(),
                             "i": out["i"].to_numpy()})

    removals = grouped_block_map(both, ["bucket"], join_bucket)

    def text_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"), "side": "t",
             "text": df["text"], "i": np.int64(-1)}
        )

    def rm_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"), "side": "r",
             "text": "", "i": df["i"].astype("int64")}
        )

    merged = docs.map_batches(text_rows, batch_format="pandas").union(
        removals.map_batches(rm_rows, batch_format="pandas")
    )

    def rebuild_block(df: pd.DataFrame) -> pd.DataFrame:
        # sort(["doc_id"]) co-located each doc's text + removal rows here
        # (colocation invariant, module docstring above); one pass, with
        # the per-doc Python work being the unit of work by design
        if len(df) == 0:
            return _rows([], [], [], [])
        starts = {
            doc_id: g.to_numpy()
            for doc_id, g in df[df["side"] == "r"].groupby("doc_id", sort=False)["i"]
        }
        t = df[df["side"] == "t"]
        ids, texts, n_toks, n_rm = [], [], [], []
        for doc_id, text in zip(t["doc_id"], t["text"]):
            doc_id = int(doc_id)
            toks = re.findall(_TOKEN_RE, _subdup_augment(doc_id, text))
            mask = np.zeros(len(toks), dtype=bool)
            for s in starts.get(doc_id, ()):
                mask[int(s) : int(s) + k] = True
            kept = " ".join(tk for tk, m in zip(toks, mask) if not m)
            ids.append(doc_id); texts.append(kept)
            n_toks.append(len(toks)); n_rm.append(int(mask.sum()))
        return _rows(ids, texts, n_toks, n_rm)

    return merged.sort(["doc_id"]).map_batches(
        rebuild_block, batch_format="pandas", batch_size=None
    )


def sql_substring_dedup() -> str:
    k = _SUBDUP_K
    p0, p1, p2 = _SUBDUP_PASSAGES
    return (
        "WITH a AS (SELECT doc_id, text || CASE WHEN doc_id % 2 = 0 THEN "
        f"' ' || CASE doc_id % 3 WHEN 0 THEN '{p0}' WHEN 1 THEN '{p1}' "
        f"ELSE '{p2}' END ELSE '' END AS aug FROM documents), "
        r"tok AS (SELECT doc_id, regexp_extract_all(aug, '\S+') AS toks FROM a), "
        "w AS (SELECT doc_id, "
        f"unnest(range(1, greatest(len(toks) - {k - 2}, 1))) AS i, "
        f"unnest([md5(array_to_string(toks[j:j + {k - 1}], ' ')) "
        f"for j in range(1, greatest(len(toks) - {k - 2}, 1))]) AS h FROM tok), "
        "d AS (SELECT h, MIN(doc_id) AS keeper FROM w GROUP BY h "
        "HAVING COUNT(DISTINCT doc_id) >= 2), "
        "rm AS (SELECT DISTINCT w.doc_id AS doc_id, w.i + u.off AS pos "
        "FROM w JOIN d ON w.h = d.h AND w.doc_id != d.keeper, "
        f"unnest(range(0, {k})) AS u(off)), "
        "rl AS (SELECT doc_id, list(pos) AS rp FROM rm GROUP BY doc_id) "
        "SELECT t.doc_id, COALESCE(array_to_string([t.toks[p] for p in "
        "range(1, len(t.toks) + 1) if NOT list_contains(COALESCE(rl.rp, []), p)], "
        "' '), '') AS text_deduped, CAST(len(t.toks) AS BIGINT) AS n_tokens, "
        "CAST(COALESCE(len(rl.rp), 0) AS BIGINT) AS n_removed "
        "FROM tok t LEFT JOIN rl ON t.doc_id = rl.doc_id"
    )


# ---------------------------------------------------------------------------
# BM25 full-text search (round 4)
#
# Okapi BM25 (Robertson & Spärck Jones; the standard tf·idf ranking the
# reference's corpus has no counterpart for) over the documents table, for a
# fixed deterministic query set.  The classic ln-idf is replaced by a fully
# INTEGER idf/score pipeline (idf_s = (N-df)·10000 // (df+1); per-term score
# in exact integer arithmetic with k1=1.2, b=0.75 in milli-units) so the
# DuckDB oracle replays every division bit-for-bit — the same
# integer-determinism trade documented for quality_classifier and pagerank.
#
# Scale design (two passes, both exchange-bounded):
#   pass 1: corpus stats — per-batch partials of (N, total tokens) plus the
#     query tokens' per-batch distinct-doc counts; ≤ |query vocab|+1 rows
#     per batch reach the driver (counts only, never token-shaped state).
#   pass 2: the tiny {token: idf} map + corpus constants broadcast once
#     (ray.put); each batch computes its docs' scores vectorized (flatten →
#     filter to query vocab → bincount) and emits per-query TOP-K PARTIALS —
#     ≤ k·|queries| rows per batch into one grouped exchange on query_id.
# ---------------------------------------------------------------------------

_BM25_K = 5
# query mix: multi-term, high-df ("the" idf=0 at df=N), and an absent token
_BM25_QUERIES = (
    ("join", "hash", "row"),
    ("scan", "filter"),
    ("merge", "order", "small", "batch"),
    ("the", "zzz-absent"),
    ("vector", "window", "group"),
)


def bm25_search(
    sf_dir: str, *, k: int = _BM25_K, queries: tuple = _BM25_QUERIES
) -> ray.data.Dataset:
    """Integer-exact BM25 top-k: (query_id, doc_id, rank, score_micro).

    Docs whose integer score floors to 0 are dropped (matches the SQL
    ``WHERE score > 0``); rank ties break by doc_id ascending."""
    ensure_picklable()
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    qvocab = sorted({t for q in queries for t in q})
    vset = pa.array(qvocab, type=pa.string())

    def stats_partial(t: "pa.Table") -> "pa.Table":
        toks = pc.split_pattern_regex(t.column("text"), r"\s+")
        flat = pc.list_flatten(toks)
        ids = pc.take(t.column("doc_id"), pc.list_parent_indices(toks))
        mask = pc.not_equal(flat, "")
        n_tokens = pc.sum(pc.cast(mask, pa.int64())).as_py() or 0
        tbl = pa.table({"doc_id": ids.filter(mask), "token": flat.filter(mask)})
        qt = tbl.filter(pc.is_in(tbl.column("token"), value_set=vset))
        g = qt.group_by("token").aggregate([("doc_id", "count_distinct")])
        return pa.table(
            {
                "token": pa.concat_arrays(
                    [g.column("token").combine_chunks(), pa.array([""])]
                ),
                # each input row is one whole document, so batch-local
                # distinct-doc counts sum exactly across batches
                "df": pa.array(
                    g.column("doc_id_count_distinct").to_pylist() + [0], pa.int64()
                ),
                "n_docs": pa.array([0] * len(g) + [t.num_rows], pa.int64()),
                "n_tokens": pa.array([0] * len(g) + [n_tokens], pa.int64()),
            }
        )

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    parts = docs.map_batches(stats_partial, batch_format="pyarrow").to_pandas()
    n_corpus = int(parts["n_docs"].sum())
    total_len = int(parts["n_tokens"].sum())
    df_map = parts[parts["token"] != ""].groupby("token")["df"].sum()
    idf = {
        t: ((n_corpus - int(df_map.get(t, 0))) * 10000) // (int(df_map.get(t, 0)) + 1)
        for t in qvocab
    }
    q_ref = ray.put((tuple(queries), idf, n_corpus, total_len))

    def score_partial(t: "pa.Table") -> pd.DataFrame:
        qs, idf_m, n_c, tot = ray.get(q_ref)
        toks = pc.split_pattern_regex(t.column("text"), r"\s+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        mask = pc.and_(pc.not_equal(flat, ""), pc.is_in(flat, value_set=vset))
        nonempty = pc.not_equal(flat, "")
        n_rows = t.num_rows
        dl = np.zeros(n_rows, dtype=np.int64)
        np.add.at(dl, parent.filter(nonempty).to_numpy(zero_copy_only=False), 1)
        hit_tok = flat.filter(mask).to_numpy(zero_copy_only=False)
        hit_doc = parent.filter(mask).to_numpy(zero_copy_only=False)
        tok_idx = {tk: i for i, tk in enumerate(qvocab)}
        tf = np.zeros((n_rows, len(qvocab)), dtype=np.int64)
        if len(hit_tok):
            cols = np.fromiter((tok_idx[tk] for tk in hit_tok), dtype=np.int64)
            np.add.at(tf, (hit_doc, cols), 1)
        # integer BM25: rel_milli = dl·N·1000 // L; den in milli-units
        rel_milli = (dl * n_c * 1000) // tot if tot else np.zeros_like(dl)
        den_base = 300 + (9 * rel_milli) // 10
        doc_ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        rows = {"query_id": [], "doc_id": [], "score": []}
        for qi, q in enumerate(qs):
            score = np.zeros(n_rows, dtype=np.int64)
            for tk in q:
                tfv = tf[:, tok_idx[tk]]
                num = idf_m[tk] * 2200 * tfv
                den = 1000 * tfv + den_base
                score += num // den
            keep = score > 0
            if not keep.any():
                continue
            s, d = score[keep], doc_ids[keep]
            take = min(k, len(s))
            order = np.lexsort((d, -s))[:take]  # partial top-k
            rows["query_id"].extend([qi] * take)
            rows["doc_id"].extend(d[order])
            rows["score"].extend(s[order])
        return pd.DataFrame(
            {
                "query_id": pd.Series(rows["query_id"], dtype="int64"),
                "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                "score": pd.Series(rows["score"], dtype="int64"),
            }
        )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "doc_id"], ascending=[False, True], kind="mergesort")
        g = g.head(k)
        return pd.DataFrame(
            {
                "query_id": g["query_id"].astype("int64").to_numpy(),
                "doc_id": g["doc_id"].astype("int64").to_numpy(),
                "rank": np.arange(1, len(g) + 1, dtype="int64"),
                "score": g["score"].astype("int64").to_numpy(),
            }
        )

    partials = docs.map_batches(score_partial, batch_format="pyarrow")
    return grouped_block_map(partials, ["query_id"], final_topk)


def sql_bm25_search(k: int = _BM25_K, queries: tuple = _BM25_QUERIES) -> str:
    qvocab = sorted({t for q in queries for t in q})
    in_list = ", ".join(f"'{t}'" for t in qvocab)
    q_values = ", ".join(
        f"({qi}, '{tk}')" for qi, q in enumerate(queries) for tk in q
    )
    return (
        r"WITH toks AS (SELECT doc_id, tok FROM documents, "
        r"UNNEST(regexp_extract_all(text, '\S+')) AS u(tok)), "
        "st AS (SELECT (SELECT COUNT(*) FROM documents) AS n, "
        "COUNT(*) AS l FROM toks), "
        "dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id), "
        f"q(query_id, tok) AS (VALUES {q_values}), "
        f"df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks "
        f"WHERE tok IN ({in_list}) GROUP BY tok), "
        f"tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks "
        f"WHERE tok IN ({in_list}) GROUP BY doc_id, tok), "
        "scored AS (SELECT q.query_id, tf.doc_id, SUM("
        "(((st.n - df.df) * 10000) // (df.df + 1)) * 2200 * tf.tf "
        "// (1000 * tf.tf + 300 + (9 * ((dl.dl * st.n * 1000) // st.l)) // 10)"
        ") AS score "
        "FROM q JOIN df ON df.tok = q.tok JOIN tf ON tf.tok = q.tok "
        "JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN st "
        "GROUP BY q.query_id, tf.doc_id), "
        "r AS (SELECT query_id, doc_id, score, row_number() OVER ("
        "PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank "
        "FROM scored WHERE score > 0) "
        "SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, "
        "CAST(rank AS BIGINT) AS rank, CAST(score AS BIGINT) AS score "
        f"FROM r WHERE rank <= {k}"
    )


# ---------------------------------------------------------------------------
# DSIR-style data selection (Xie et al. 2023, arXiv:2302.03169): importance
# resampling toward a target distribution under hashed bag-of-ngram unigram
# models.  Sandbox-deterministic variant: the published method's
# log-likelihood-ratio weights are replaced by the integer ratio
# w[b] = ((cnt_target[b]+1) * 1e6) // (cnt_raw[b]+1) per hashed token
# bucket (add-one smoothing; the global normalizers are rank-invariant and
# dropped), so every division is exact in both numpy and DuckDB and the
# selected set is bit-reproducible.  Target distribution = the corpus's
# lang='en' slice; raw = the whole corpus.
# ---------------------------------------------------------------------------

_DSIR_B = 4096          # hashed feature buckets (fixed — bounds all state)
_DSIR_SCALE = 1_000_000
_DSIR_K = 100
_DSIR_TARGET_LANG = "en"


def _dsir_buckets(tokens: "np.ndarray") -> "np.ndarray":
    """bucket(token) = fmix32(fnv1a32(token)) % B for an array of UNIQUE
    tokens (callers dedup first — Zipf makes uniques ≪ occurrences)."""
    import numpy as np

    from .sampling import fmix32_np

    fnv = np.array([fnv1a_32(t) for t in tokens], dtype=np.uint64)
    return (fmix32_np(fnv) % np.uint64(_DSIR_B)).astype(np.int64)


def dsir_sample(sf_dir: str, *, k: int = _DSIR_K) -> ray.data.Dataset:
    """Select the ``k`` documents whose hashed-unigram distribution is most
    target-like (lang='en'), per the DSIR recipe: fit bucket counts on
    target and raw, weight each token occurrence by the smoothed integer
    count ratio, score a doc by its mean token weight, keep the top-k by
    (score desc, doc_id).

    Scale design: phase A folds per-batch (bucket, n_target, n_raw)
    partials — at most ``_DSIR_B`` rows per block — into ONE grouped
    exchange whose output is bounded by the FIXED bucket count (4096 rows
    at any corpus size); the weight table therefore always broadcasts.
    Phase B is embarrassingly parallel scoring with a per-batch top-k
    combiner, so the final exchange carries ≤ k rows per block into the
    single-block ranker (the ``priority_sample`` shape).  Nothing
    token-shaped or corpus-sized ever reaches the driver."""
    import numpy as np
    from ray.data.aggregate import Sum

    import pyarrow as pa

    ensure_picklable()
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def bucket_partial(df: pd.DataFrame) -> pa.Table:
        toks = df.reset_index(drop=True)["text"].str.findall(_TOKEN_RE)
        ex = toks.explode().dropna()
        if not len(ex):
            return pa.table(
                {"bucket": pa.array([], pa.int64()),
                 "part_t": pa.array([], pa.int64()),
                 "part_r": pa.array([], pa.int64())}
            )
        uniq, inv = np.unique(ex.to_numpy(dtype=object), return_inverse=True)
        b = _dsir_buckets(uniq)[inv]
        is_t = (
            (df["lang"].to_numpy(dtype=object) == _DSIR_TARGET_LANG)
            .astype(np.int64)[ex.index.to_numpy()]
        )
        n_t = np.bincount(b, weights=is_t, minlength=_DSIR_B).astype(np.int64)
        n_r = np.bincount(b, minlength=_DSIR_B).astype(np.int64)
        nz = np.nonzero(n_r)[0]
        return pa.table(
            {"bucket": pa.array(nz, pa.int64()),
             "part_t": pa.array(n_t[nz], pa.int64()),
             "part_r": pa.array(n_r[nz], pa.int64())}
        )

    counts = (
        ds.map_batches(bucket_partial, batch_format="pandas")
        .groupby("bucket")
        .aggregate(Sum("part_t", alias_name="n_t"), Sum("part_r", alias_name="n_r"))
        .to_pandas()  # ≤ _DSIR_B rows by construction — fixed-size state
    )
    weights = np.zeros(_DSIR_B, dtype=np.int64)
    b_idx = counts["bucket"].to_numpy().astype(np.int64)
    weights[b_idx] = (
        (counts["n_t"].to_numpy().astype(np.int64) + 1) * _DSIR_SCALE
        // (counts["n_r"].to_numpy().astype(np.int64) + 1)
    )
    # buckets with no corpus tokens keep the smoothed empty-ratio weight
    empty = weights == 0
    weights[empty] = _DSIR_SCALE  # (0+1)*SCALE // (0+1); never hit by data

    def score_batch(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        toks = df["text"].str.findall(_TOKEN_RE)
        ex = toks.explode().dropna()
        score = np.zeros(len(df), dtype=np.int64)
        n = np.zeros(len(df), dtype=np.int64)
        if len(ex):
            uniq, inv = np.unique(ex.to_numpy(dtype=object), return_inverse=True)
            w = weights[_dsir_buckets(uniq)][inv]
            rows = ex.index.to_numpy()
            score = np.bincount(rows, weights=w, minlength=len(df)).astype(np.int64)
            n = np.bincount(rows, minlength=len(df)).astype(np.int64)
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "n_tokens": n,
                "dsir_score": np.where(n > 0, score // np.maximum(n, 1), 0),
            }
        )
        out = out[out["n_tokens"] > 0]
        # combiner: local top-k so the final exchange is ≤ k rows per block
        out = out.sort_values(
            ["dsir_score", "doc_id"], ascending=[False, True], kind="mergesort"
        )
        return out.head(k)

    scored = ds.map_batches(score_batch, batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["dsir_score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "n_tokens": df["n_tokens"].to_numpy(),
                "dsir_score": df["dsir_score"].to_numpy(),
                "rk": np.arange(1, len(df) + 1, dtype=np.int64),
            }
        )

    return scored.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None
    )


def sql_dsir_sample() -> str:
    from .sql_oracles import _fmix32_ctes, sql_fnv1a32

    frag, final = _fmix32_ctes("dx", "df0", ["token"], "hin", "hv")
    return (
        r"WITH t AS (SELECT doc_id, lang, unnest(regexp_extract_all(text, "
        r"'\S+')) AS token FROM documents), "
        "tok AS (SELECT DISTINCT token FROM t), "
        f"df0 AS (SELECT token, {sql_fnv1a32('token')} AS hin FROM tok), "
        f"{frag}, "
        f"bk AS (SELECT token, hv % {_DSIR_B} AS b FROM {final}), "
        "tb AS (SELECT t.doc_id, t.lang, bk.b FROM t JOIN bk USING (token)), "
        "cnt AS (SELECT b, SUM(CASE WHEN lang = "
        f"'{_DSIR_TARGET_LANG}' THEN 1 ELSE 0 END) AS n_t, "
        "COUNT(*) AS n_r FROM tb GROUP BY b), "
        f"wt AS (SELECT b, ((n_t + 1) * {_DSIR_SCALE}) // (n_r + 1) AS w "
        "FROM cnt), "
        "s AS (SELECT tb.doc_id, SUM(wt.w) AS sw, COUNT(*) AS n FROM tb "
        "JOIN wt USING (b) GROUP BY tb.doc_id), "
        "r AS (SELECT doc_id, n AS n_tokens, sw // n AS dsir_score, "
        "row_number() OVER (ORDER BY sw // n DESC, doc_id) AS rk FROM s) "
        "SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, "
        "CAST(dsir_score AS BIGINT) AS dsir_score, CAST(rk AS BIGINT) AS rk "
        f"FROM r WHERE rk <= {_DSIR_K}"
    )


# ---------------------------------------------------------------------------
# BPE tokenizer training (round 4)
# ---------------------------------------------------------------------------

_BPE_MERGES = 8


def _merge_greedy(s: list, left: str, right: str) -> list:
    """One BPE merge rule applied greedily left-to-right, non-overlapping —
    shared by training (apply_merge) and encoding so they cannot drift."""
    out, i = [], 0
    while i < len(s):
        if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return out


def _select_merge_batch(
    cand: pd.DataFrame, lm: dict, rm: dict
) -> list[tuple[str, str, int]]:
    """Greedy PREFIX of the globally-sorted candidate pairs that is
    provably election-identical to applying them one sequential round at
    a time.  Candidate i joins the batch only if, for every earlier
    member j:

    - symbol-disjoint: {l_i, r_i} shares nothing with {l_j, r_j,
      l_j+r_j}, so applying j cannot change count(l_i, r_i) (existing
      pair counts never increase under a merge; adjacencies only
      collapse);
    - no merged-symbol collision: l_i+r_i is not an existing pair-table
      symbol, so new-pair counts cannot fold into an existing pair's;
    - strictly beats every reachable new pair: c_i > M_j where
      M_j = max(RM(l_j), LM(r_j)) bounds any pair merge j can create —
      (x, l_j r_j) inherits ≤ count(x, l_j) (right-role max of l_j) and
      (l_j r_j, y) inherits ≤ count(r_j, y) (left-role max of r_j).
      When l_j == r_j the bound includes c_j itself and the batch stops
      — conservatively correct.

    The prefix rule (stop at the FIRST failing candidate, never skip)
    guarantees every unselected pair has count ≤ the last selected one,
    so the sequential election at each virtual step sees no stronger
    competitor than the bound excludes."""
    selected: list[tuple[str, str, int]] = []
    interact: set[str] = set()
    pair_syms = set(lm) | set(rm)
    max_m = 0
    for row in cand.itertuples(index=False):
        left, right, count = str(row.l), str(row.r), int(row.c)
        if selected:
            if left in interact or right in interact:
                break
            if (left + right) in pair_syms:
                break
            if count <= max_m:
                break
        selected.append((left, right, count))
        interact.update((left, right, left + right))
        max_m = max(max_m, rm.get(left, 0), lm.get(right, 0))
    return selected


def bpe_train(
    sf_dir: str, n_merges: int = _BPE_MERGES, *, max_batch: int = 16,
    stats: dict | None = None,
) -> pd.DataFrame:
    """Distributed BPE tokenizer training (Sennrich et al. 2016,
    arXiv:1508.07909): learn the first ``n_merges`` merge rules over the
    corpus.  The op every from-scratch pretraining run performs before
    tokenizing anything.

    Topology — the only corpus-sized pass is phase 1:

    1. word counts: per-batch ``findall('[a-z]+')`` + ``value_counts``
       combiners (Arrow blocks out) into ONE grouped exchange — after
       this, every iteration runs over the VOCABULARY table (words ×
       symbol lists), which is sublinear in corpus bytes (~10^8 distinct
       words at web scale vs 10^13 tokens) and stays dataset-resident.
    2. per round: adjacent-pair counts via a zero-copy Arrow flatten
       (values/offsets arithmetic — no per-word Python in the counting
       pass) + per-batch combiner → grouped (l, r) sum → per-block
       top-``batch`` partials, so the driver folds ≤ num_blocks × batch
       candidate rows to elect the winners (count DESC, l ASC, r ASC);
       a second, symbols-bounded exchange computes per-symbol role
       maxima, and ``_select_merge_batch`` picks the longest candidate
       prefix that is provably election-identical to one-merge-per-round
       — so a production 32k-merge vocab pays ~32k/batch driver barriers
       instead of 32k (VERDICT r4 task 6), with zero behavior change.
       The merge application rewrites ONLY the words a vectorized screen
       proves contain a selected pair, then the vocabulary
       re-materializes (vocab-sized, keeps lineage flat across rounds).

    Overlapping pairs count every adjacency ("aaa" → (a,a) twice);
    application is greedy left-to-right non-overlapping — both standard
    BPE, both replayed bit-exactly by the chained recursive-CTE oracle
    (``sql_bpe_train``), which is unchanged by batching.  ``max_batch=1``
    forces the classic one-merge-per-round schedule (used by the
    equivalence test); ``stats`` (if given) receives ``{"rounds": k}``.
    Output: (step, left_sym, right_sym, pair_n), one row per learned
    merge."""
    ensure_picklable()
    import numpy as np
    import pyarrow as pa
    import ray
    from ray.data.aggregate import Sum

    def word_partials(df: pd.DataFrame) -> "pa.Table":
        words = df["text"].str.lower().str.findall(r"[a-z]+").explode().dropna()
        counts = words.value_counts()
        return pa.table(
            {"word": pa.array(counts.index, type=pa.string()),
             "part_n": pa.array(counts.to_numpy().astype("int64"))}
        )

    vocab = (
        read_table(sf_dir, "documents", columns=["text"])
        .map_batches(word_partials, batch_format="pandas")
        .groupby("word")
        .aggregate(Sum("part_n", alias_name="n"))
    )

    def to_syms(tbl: "pa.Table") -> "pa.Table":
        words = tbl["word"].to_pylist()
        return pa.table(
            {"word": tbl["word"], "n": tbl["n"],
             "syms": pa.array([list(w) for w in words],
                              type=pa.list_(pa.string()))}
        )

    words_ds = vocab.map_batches(to_syms, batch_format="pyarrow").materialize()

    def _flat(tbl: "pa.Table"):
        """(values, offsets-normalized, weights-per-position) of the syms
        list column — shared by the pair counter and the merge screen."""
        col = tbl.column("syms").combine_chunks()
        offs = col.offsets.to_numpy().astype(np.int64)
        vals = col.values.slice(offs[0], offs[-1] - offs[0])
        vals = np.asarray(vals.to_pandas(), dtype=object)
        offs = offs - offs[0]
        n = tbl.column("n").to_numpy()
        return vals, offs, n

    def _adjacent_mask(vals: "np.ndarray", offs: "np.ndarray") -> "np.ndarray":
        # position i pairs with i+1 unless i+1 starts the next word
        if len(vals) < 2:
            return np.zeros(0, dtype=bool)
        valid = np.ones(len(vals) - 1, dtype=bool)
        inner = offs[1:-1]  # word boundaries strictly inside the flat array
        valid[inner[(inner > 0) & (inner < len(vals))] - 1] = False
        return valid

    from ray.data.aggregate import Max

    def pair_partials(tbl: "pa.Table") -> "pa.Table":
        vals, offs, n = _flat(tbl)
        valid = _adjacent_mask(vals, offs)
        if not valid.any():
            return pa.table({"l": pa.array([], pa.string()),
                             "r": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        wt = np.repeat(n, np.diff(offs))[:-1]
        part = pd.DataFrame(
            {"l": vals[:-1][valid], "r": vals[1:][valid], "c": wt[valid]}
        ).groupby(["l", "r"], sort=False)["c"].sum().reset_index()
        return pa.Table.from_pandas(part, preserve_index=False)

    def role_partials(df: pd.DataFrame) -> pd.DataFrame:
        # per-block combiner for the per-symbol role maxima: ≤ 2 × (syms
        # in block) rows out, into a symbols-bounded grouped exchange
        if df.empty:
            return pd.DataFrame({"role": pd.Series([], dtype="object"),
                                 "sym": pd.Series([], dtype="object"),
                                 "m": pd.Series([], dtype="int64")})
        left = df.groupby("l", sort=False)["c"].max().reset_index()
        right = df.groupby("r", sort=False)["c"].max().reset_index()
        return pd.concat([
            pd.DataFrame({"role": "L", "sym": left["l"], "m": left["c"]}),
            pd.DataFrame({"role": "R", "sym": right["r"], "m": right["c"]}),
        ], ignore_index=True)

    merges: list[tuple[int, str, str, int]] = []
    rounds = 0
    while len(merges) < n_merges:
        budget = min(n_merges - len(merges), max(1, max_batch))

        def block_top(df: pd.DataFrame, B=budget) -> pd.DataFrame:
            if df.empty:
                return df
            df = df.sort_values(
                ["c", "l", "r"], ascending=[False, True, True], kind="mergesort"
            )
            return df.head(B)

        pair_ds = (
            words_ds.map_batches(pair_partials, batch_format="pyarrow")
            .groupby(["l", "r"])
            .aggregate(Sum("c", alias_name="c"))
            .materialize()  # symbol-pair-sized, reused by both folds below
        )
        # exact global top-`budget` (each (l, r) group lives in one block
        # post-groupby, so per-block top-B partials fold exactly):
        # ≤ num_blocks × budget rows — the bounded driver fold
        cand = pair_ds.map_batches(block_top, batch_format="pandas").to_pandas()
        if cand.empty:
            break
        cand = cand.sort_values(
            ["c", "l", "r"], ascending=[False, True, True], kind="mergesort"
        ).head(budget)
        if budget == 1:
            selected = [(str(cand.iloc[0]["l"]), str(cand.iloc[0]["r"]),
                         int(cand.iloc[0]["c"]))]
        else:
            # per-symbol role maxima: LM(s) = max c over pairs with LEFT
            # sym s, RM(s) = ... RIGHT sym s (bounds every pair a batched
            # merge can create — see _select_merge_batch)
            role = (
                pair_ds.map_batches(role_partials, batch_format="pandas")
                .groupby(["role", "sym"])
                .aggregate(Max("m", alias_name="m"))
                .to_pandas()  # ≤ 2 × |symbols| rows
            )
            lm = {str(s): int(m) for s, m in
                  zip(role[role["role"] == "L"]["sym"],
                      role[role["role"] == "L"]["m"])}
            rm = {str(s): int(m) for s, m in
                  zip(role[role["role"] == "R"]["sym"],
                      role[role["role"] == "R"]["m"])}
            selected = _select_merge_batch(cand, lm, rm)
        base_step = len(merges)
        merges.extend(
            (base_step + i + 1, left, right, count)
            for i, (left, right, count) in enumerate(selected)
        )
        rules = [(left, right) for left, right, _ in selected]

        def apply_rules(tbl: "pa.Table", R=tuple(rules)) -> "pa.Table":
            # one flatten serves every rule's screen: batched rules are
            # symbol-disjoint, so no rule creates or destroys another's
            # adjacencies — the screens are independent of apply order.
            vals, offs, _ = _flat(tbl)
            valid = _adjacent_mask(vals, offs)
            n_words = tbl.num_rows
            hit_words = []
            for left, right in R:
                hit_pos = np.zeros(len(vals), dtype=bool)
                if valid.any():
                    m = valid & (vals[:-1] == left) & (vals[1:] == right)
                    hit_pos[:-1] = m
                hw = (np.add.reduceat(hit_pos, offs[:-1]) > 0
                      if len(vals) else np.zeros(n_words, dtype=bool))
                hit_words.append(hw)
            any_hit = np.logical_or.reduce(hit_words) if hit_words else []
            syms_out = tbl.column("syms").to_pylist()
            for j in np.flatnonzero(any_hit):
                s = syms_out[j]
                for k, (left, right) in enumerate(R):
                    if hit_words[k][j]:
                        s = _merge_greedy(s, left, right)
                syms_out[j] = s
            return pa.table(
                {"word": tbl["word"], "n": tbl["n"],
                 "syms": pa.array(syms_out, type=pa.list_(pa.string()))}
            )

        words_ds = words_ds.map_batches(
            apply_rules, batch_format="pyarrow"
        ).materialize()
        rounds += 1

    if stats is not None:
        stats["rounds"] = rounds
    return pd.DataFrame(
        merges, columns=["step", "left_sym", "right_sym", "pair_n"]
    ).astype({"step": "int64", "pair_n": "int64"})


def _bpe_cte_prefix(n_merges: int) -> tuple[list[str], str]:
    """The shared CTE chain of the BPE oracles: returns (cte list, name of
    the final word→syms table w{n_merges}).

    Every non-recursive CTE is MATERIALIZED: DuckDB otherwise INLINES
    CTE references, and the w{t} <- (s{t-1}, b{t-1} x3) <- w{t-1} chain
    would copy the base scan ~4^n_merges times (observed as an fd
    explosion on the parquet view before any row flowed)."""
    ctes = [
        "tok AS MATERIALIZED (SELECT unnest(regexp_extract_all(lower(text), "
        "'[a-z]+')) AS word FROM documents)",
        "wc AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS n "
        "FROM tok GROUP BY word)",
        "w0 AS MATERIALIZED (SELECT word, n, split(word, '') AS syms FROM wc)",
    ]
    for t in range(n_merges):
        ctes.append(
            f"p{t} AS MATERIALIZED (SELECT syms[i] AS l, syms[i+1] AS r, SUM(n) AS c FROM ("
            f"SELECT n, syms, unnest(generate_series(1, len(syms)-1)) AS i FROM w{t})"
            " GROUP BY l, r)"
        )
        ctes.append(
            f"b{t} AS MATERIALIZED (SELECT l, r, CAST(c AS BIGINT) AS c FROM p{t} "
            "ORDER BY c DESC, l, r LIMIT 1)"
        )
        hit = (f"i < len(syms) AND syms[i] = (SELECT l FROM b{t}) "
               f"AND syms[i+1] = (SELECT r FROM b{t})")
        ctes.append(
            f"s{t} AS (SELECT word, n, syms, 1 AS i, CAST([] AS VARCHAR[]) AS out "
            f"FROM w{t} UNION ALL SELECT word, n, syms, "
            f"i + CASE WHEN {hit} THEN 2 ELSE 1 END, "
            f"list_append(out, CASE WHEN {hit} THEN (SELECT l || r FROM b{t}) "
            f"ELSE syms[i] END) FROM s{t} WHERE i <= len(syms))"
        )
        ctes.append(
            f"w{t+1} AS MATERIALIZED (SELECT word, n, out AS syms FROM s{t} "
            "WHERE i > len(syms))"
        )
    return ctes, f"w{n_merges}"


def sql_bpe_train(n_merges: int = _BPE_MERGES) -> str:
    """Chained recursive-CTE replay of ``bpe_train``: per step, pair
    counts via a generate_series explode, argmax via ORDER/LIMIT 1, and
    the greedy left-to-right merge as a position-walk recursive CTE whose
    rows finish at i = len(syms)+1 (verified identical on overlap cases
    like 'aaa')."""
    ctes, _ = _bpe_cte_prefix(n_merges)
    unioned = " UNION ALL ".join(
        f"SELECT {t+1} AS step, l, r, c FROM b{t}" for t in range(n_merges)
    )
    return (
        "WITH RECURSIVE " + ", ".join(ctes)
        + f" SELECT step, l AS left_sym, r AS right_sym, c AS pair_n FROM ({unioned}) "
        "ORDER BY step"
    )


# ---------------------------------------------------------------------------
# Bigram LM scoring (round 4) — the CCNet/KenLM-style perplexity signal
# ---------------------------------------------------------------------------

_BG_BUCKETS = 512  # (w1, w2) co-partition buckets for the scoring join
_BG_BROADCAST_MAX = 1_000_000  # bigram-model rows provably safe to broadcast


def bigram_logprob(
    sf_dir: str, *, model_broadcast_max: int | None = None
) -> ray.data.Dataset:
    """Bigram language-model scoring — fit an add-one-smoothed bigram LM on
    the corpus, score every document under it (the perplexity-style
    quality filter of CCNet / Wenzek et al. 2020, with the KenLM model
    replaced by the corpus's own bigram table, integer micro-log2 units).

    Distributed shape (nothing token-shaped touches the driver):

    1. fit: per-batch bigram partial counts (BOS-prefixed ``[a-z]+``
       stream) into ONE grouped (w1, w2) exchange → the model table,
       bigram-vocabulary-sized and dataset-resident.
    2. continuation vocabulary V: two model-sized exchanges
       (distinct-w2 groupby + a scalar count) — V is the only value the
       driver sees.
    3. conditional logprobs: sort the model by w1 (the
       ``grouped_block_map`` colocation invariant — every w1's rows in
       one block), then a VECTORIZED in-block ``transform('sum')`` gives
       the context count c1 with zero per-group dispatch;
       lp = round(log2((c12+1)/(c1+V)) * 1e6) as int64.
    4. score.  Auto-switch on a distributed model-row count (the
       ``unigram_logprob`` pattern): a model proven ≤
       ``model_broadcast_max`` rows broadcasts its {(w1,w2): lp} dict
       once via ``ray.put`` and every batch scores in place — zero
       further exchanges; a larger model takes the open-web path —
       doc-side (doc_id, w1, w2, cnt) partials union the lp rows under
       a hashed (w1, w2) bucket, one grouped exchange co-locates them,
       an in-block vectorized pandas merge + doc-id partial sum, then
       the final Arrow-combiner groupby(doc_id).  Both paths are
       bit-identical (equivalence-tested).

    Scoring the training corpus means every doc bigram exists in the
    model, so the join always hits (asserted).  Docs with < 2 stream
    tokens (i.e. zero [a-z] words) emit no bigrams and are excluded —
    identically in both engines.  Output: (doc_id, logprob_micro,
    n_bigrams)."""
    ensure_picklable()
    import numpy as np
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def _doc_bigrams(df: pd.DataFrame):
        """Fully vectorized batch → (doc_id, w1, w2) bigram arrays with the
        BOS marker ('<s>' cannot collide with [a-z]+ tokens): one explode,
        shifted same-row compare for interior pairs, first-token mask for
        the BOS pairs — no per-doc Python loop on this corpus-sized path."""
        df = df.reset_index(drop=True)
        ex = df["text"].str.lower().str.findall(r"[a-z]+").explode().dropna()
        pos = ex.index.to_numpy()  # batch row position per token
        vals = ex.to_numpy(dtype=object)
        docs_arr = df["doc_id"].to_numpy()
        if len(vals) == 0:
            empty = np.array([], dtype=object)
            return np.array([], dtype="int64"), empty, empty
        same = pos[:-1] == pos[1:]
        first = np.ones(len(vals), dtype=bool)
        first[1:] = ~same
        ids = np.concatenate([pos[first], pos[:-1][same]])
        w1 = np.concatenate(
            [np.full(int(first.sum()), "<s>", dtype=object), vals[:-1][same]]
        )
        w2 = np.concatenate([vals[first], vals[1:][same]])
        return docs_arr[ids].astype("int64"), w1, w2

    def bigram_partials(df: pd.DataFrame) -> "pa.Table":
        _, w1, w2 = _doc_bigrams(df)
        part = (
            pd.DataFrame({"w1": w1, "w2": w2})
            .groupby(["w1", "w2"], sort=False)
            .size()
            .reset_index(name="part_c")
        )
        return pa.Table.from_pandas(part, preserve_index=False)

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    model = (
        docs.map_batches(bigram_partials, batch_format="pandas")
        .groupby(["w1", "w2"])
        .aggregate(Sum("part_c", alias_name="c12"))
        .materialize()  # consumed twice (V count + lp pass)
    )
    # V = |{w2}| — continuation vocabulary; model-sized exchanges, scalar out
    v_size = int(model.groupby("w2").count().count())

    def lp_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"w1": pd.Series([], dtype=object), "w2": pd.Series([], dtype=object),
                 "lp": pd.Series([], dtype="int64")}
            )
        c1 = df.groupby("w1", sort=False)["c12"].transform("sum").to_numpy()
        lp = np.round(
            np.log2((df["c12"].to_numpy() + 1.0) / (c1 + v_size)) * 1e6
        ).astype("int64")
        return pd.DataFrame({"w1": df["w1"], "w2": df["w2"], "lp": lp})

    lp_ds = model.sort(["w1"]).map_batches(
        lp_block, batch_format="pandas", batch_size=None
    )

    max_b = _BG_BROADCAST_MAX if model_broadcast_max is None else model_broadcast_max
    if model.count() <= max_b:  # distributed count proves the bound FIRST
        import ray

        lp_df = lp_ds.to_pandas()
        lp_ref = ray.put(
            dict(zip(lp_df["w1"] + "\x1f" + lp_df["w2"], lp_df["lp"]))
        )

        def score_direct(df: pd.DataFrame) -> pd.DataFrame:
            lp = ray.get(lp_ref)
            ids, w1, w2 = _doc_bigrams(df)
            if len(ids) == 0:
                return pd.DataFrame(
                    {"doc_id": pd.Series([], dtype="int64"),
                     "logprob_micro": pd.Series([], dtype="int64"),
                     "n_bigrams": pd.Series([], dtype="int64")}
                )
            # vectorized dict lookup (Series.map runs the hash probes in C)
            lps = pd.Series(w1 + "\x1f" + w2).map(lp).to_numpy("int64")
            g = (
                pd.DataFrame({"doc_id": ids, "lp": lps})
                .groupby("doc_id", sort=False)["lp"]
                .agg(["sum", "size"])
                .reset_index()
            )
            return pd.DataFrame(
                {"doc_id": g["doc_id"].astype("int64"),
                 "logprob_micro": g["sum"].astype("int64"),
                 "n_bigrams": g["size"].astype("int64")}
            )

        return docs.map_batches(score_direct, batch_format="pandas")

    def _bucket(w1: pd.Series, w2: pd.Series) -> "np.ndarray":
        joined = (w1 + "\x1f" + w2).to_numpy(dtype=object)
        return (pd.util.hash_array(joined) % _BG_BUCKETS).astype("int64")

    def lp_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"bucket": _bucket(df["w1"], df["w2"]), "side": "l",
             "doc_id": np.int64(-1), "w1": df["w1"], "w2": df["w2"],
             "cnt": np.int64(0), "lp": df["lp"].astype("int64")}
        )

    def doc_rows(df: pd.DataFrame) -> pd.DataFrame:
        ids, w1, w2 = _doc_bigrams(df)
        part = (
            pd.DataFrame({"doc_id": ids, "w1": w1, "w2": w2})
            .groupby(["doc_id", "w1", "w2"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        return pd.DataFrame(
            {"bucket": _bucket(part["w1"], part["w2"]), "side": "d",
             "doc_id": part["doc_id"].astype("int64"), "w1": part["w1"],
             "w2": part["w2"], "cnt": part["cnt"].astype("int64"),
             "lp": np.int64(0)}
        )

    both = lp_ds.map_batches(lp_rows, batch_format="pandas").union(
        docs.map_batches(doc_rows, batch_format="pandas")
    )

    def score_block(df: pd.DataFrame) -> "pa.Table":
        d = df[df["side"] == "d"]
        if len(d) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "lp_part": pa.array([], pa.int64()),
                             "n_part": pa.array([], pa.int64())})
        lut = df[df["side"] == "l"]
        m = d.merge(lut[["w1", "w2", "lp"]], on=["w1", "w2"], how="left",
                    suffixes=("", "_m"))
        # training-corpus scoring: every doc bigram is in the model
        assert not m["lp_m"].isna().any(), "bigram missing from model"
        part = pd.DataFrame(
            {"doc_id": m["doc_id"].to_numpy(),
             "lp_part": (m["lp_m"].to_numpy().astype("int64") * m["cnt"].to_numpy()),
             "n_part": m["cnt"].to_numpy()}
        ).groupby("doc_id", sort=False).sum().reset_index()
        # Arrow block out: the final aggregate has one group per DOC
        return pa.Table.from_pandas(part, preserve_index=False)

    partials = both.sort(["bucket"]).map_batches(
        score_block, batch_format="pandas", batch_size=None
    )
    return (
        partials.groupby("doc_id")
        .aggregate(Sum("lp_part", alias_name="logprob_micro"),
                   Sum("n_part", alias_name="n_bigrams"))
    )


def sql_bigram_logprob() -> str:
    return (
        "WITH toks AS MATERIALIZED (SELECT doc_id, "
        "['<s>'] || regexp_extract_all(lower(text), '[a-z]+') AS ts FROM documents), "
        "bg AS MATERIALIZED (SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2 FROM ("
        "SELECT doc_id, ts, unnest(generate_series(1, len(ts)-1)) AS i FROM toks)), "
        "c12 AS MATERIALIZED (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 "
        "FROM bg GROUP BY w1, w2), "
        "c1 AS MATERIALIZED (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 "
        "FROM c12 GROUP BY w1), "
        "v AS (SELECT CAST(count(DISTINCT w2) AS BIGINT) AS v FROM bg), "
        "lp AS MATERIALIZED (SELECT w1, w2, CAST(ROUND(log2((c12.c12 + 1.0) / "
        "(c1.c1 + v.v)) * 1000000) AS BIGINT) AS lp "
        "FROM c12 JOIN c1 USING (w1) CROSS JOIN v) "
        "SELECT bg.doc_id, CAST(SUM(lp.lp) AS BIGINT) AS logprob_micro, "
        "CAST(COUNT(*) AS BIGINT) AS n_bigrams "
        "FROM bg JOIN lp ON bg.w1 = lp.w1 AND bg.w2 = lp.w2 GROUP BY bg.doc_id"
    )


class _BpeEncoder:
    """Actor-pool encoder: holds the broadcast merge table + a distinct-word
    memo that amortizes across every batch the actor sees (the tokenizer
    equivalent of a loaded model — the same seam as _HashedLinearScorer)."""

    def __init__(self, merges_ref):
        import ray

        self.merges = ray.get(merges_ref)
        self.memo: dict[str, int] = {}

    def _encode_len(self, word: str) -> int:
        v = self.memo.get(word)
        if v is None:
            s = list(word)
            for left, right in self.merges:
                s = _merge_greedy(s, left, right)
            v = self.memo[word] = len(s)
        return v

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids, n_words, n_tokens = [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            words = re.findall(r"[a-z]+", text.lower())
            if not words:
                continue  # no-word docs are absent in both engines
            ids.append(int(doc_id))
            n_words.append(len(words))
            n_tokens.append(sum(self._encode_len(w) for w in words))
        return pd.DataFrame(
            {"doc_id": pd.Series(ids, dtype="int64"),
             "n_words": pd.Series(n_words, dtype="int64"),
             "n_bpe_tokens": pd.Series(n_tokens, dtype="int64")}
        )


def bpe_encode(sf_dir: str, n_merges: int = _BPE_MERGES) -> ray.data.Dataset:
    """Apply the learned BPE tokenizer to the corpus — the train→encode
    composition every pretraining pipeline runs: ``bpe_train`` learns the
    merge table (M rows on the driver — the one legitimately driver-sized
    artifact), ``ray.put`` broadcasts it once, and an actor pool encodes
    each document, memoizing per distinct word so repeated words cost a
    dict hit, not a merge scan.  Embarrassingly parallel — zero exchange
    after training.  Output: (doc_id, n_words, n_bpe_tokens); the oracle
    reuses the training CTE chain's final word→syms table and joins the
    exploded doc words against it."""
    ensure_picklable()
    import ray

    merges = bpe_train(sf_dir, n_merges)
    merges_ref = ray.put(
        [(str(l), str(r)) for l, r in zip(merges["left_sym"], merges["right_sym"])]
    )
    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        _BpeEncoder,
        batch_format="pandas",
        concurrency=(1, 4),
        fn_constructor_kwargs={"merges_ref": merges_ref},
    )


def sql_bpe_encode(n_merges: int = _BPE_MERGES) -> str:
    ctes, final_w = _bpe_cte_prefix(n_merges)
    return (
        "WITH RECURSIVE " + ", ".join(ctes) + ", "
        "docw AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), "
        "'[a-z]+')) AS word FROM documents) "
        "SELECT docw.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words, "
        f"CAST(SUM(len(w.syms)) AS BIGINT) AS n_bpe_tokens "
        f"FROM docw JOIN {final_w} w USING (word) GROUP BY docw.doc_id"
    )


# ---------------------------------------------------------------------------
# rerank_search: the retrieve -> rerank composition (bi-encoder retrieval +
# cross-encoder rerank, the standard two-stage search stack).  The
# "cross-encoder" is the deterministic stand-in at the exact seam a real
# model would load (quality_classifier precedent): its logit is the
# candidate's total query-term frequency in integer micro-units plus an
# fmix32 interaction hash as the sub-unit tie-break, so DuckDB replays the
# whole model bit-for-bit.
# ---------------------------------------------------------------------------

_RERANK_K = 3
_RERANK_MUL = 2654435761


class _RerankStage:
    """Cross-encoder rerank stage: query structures + the hash 'model'
    built ONCE per actor in __init__ (the model-load seam); per-batch
    scoring in __call__."""

    def __init__(self, queries: tuple, cand_ref) -> None:
        import ray

        self.queries = [tuple(q) for q in queries]
        self.cands = ray.get(cand_ref)  # {doc_id: [query_id, ...]}

    def __call__(self, df: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        from .sampling import fmix32_np

        rows_q, rows_d, rows_s = [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            qids = self.cands.get(int(doc_id))
            if not qids:
                continue
            toks = [t for t in re.split(r"\s+", text) if t]
            counts: dict[str, int] = {}
            for t in toks:
                counts[t] = counts.get(t, 0) + 1
            for qid in qids:
                tf = sum(counts.get(term, 0) for term in self.queries[qid])
                h = int(
                    fmix32_np(
                        np.array(
                            [(int(doc_id) * _RERANK_MUL + qid) % (1 << 32)],
                            dtype=np.uint64,
                        )
                    )[0]
                )
                rows_q.append(qid)
                rows_d.append(int(doc_id))
                rows_s.append(tf * 1_000_000 + h % 1_000_000)
        return pd.DataFrame(
            {
                "query_id": pd.array(rows_q, dtype="int64"),
                "doc_id": pd.array(rows_d, dtype="int64"),
                "score2": pd.array(rows_s, dtype="int64"),
            }
        )


def rerank_search(
    sf_dir: str, *, k: int = _BM25_K, rerank_k: int = _RERANK_K,
    queries: tuple = _BM25_QUERIES,
) -> ray.data.Dataset:
    """Two-stage search: BM25 retrieves ``k`` candidates per query, an
    actor-pool "cross-encoder" rescans only the candidate documents and
    reranks them by true query-term frequency (micro-units) plus an
    fmix32 interaction tie-break, keeping ``rerank_k``.

    Scale design: the candidate table is parameter-bounded
    (n_queries × k rows — the one legitimately driver-sized artifact,
    same contract as the broadcast query matrix in ``knn_search``); it
    broadcasts as a {doc_id: queries} map, the document scan filters to
    candidate docs only (the rerank never touches the corpus beyond
    them), scoring is a stateful actor-pool stage, and the final
    per-query ranking is a candidate-sized grouped exchange.  Output:
    (query_id, doc_id, rerank, score2).
    """
    ensure_picklable()
    import ray

    from .util import grouped_block_map

    cands = bm25_search(sf_dir, k=k, queries=queries).to_pandas()
    cand_map: dict[int, list[int]] = {}
    for qid, did in zip(cands["query_id"], cands["doc_id"]):
        cand_map.setdefault(int(did), []).append(int(qid))
    cand_ref = ray.put(cand_map)

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    scored = docs.map_batches(
        _RerankStage,
        fn_constructor_args=(queries, cand_ref),
        batch_format="pandas",
        concurrency=(1, 2),
    )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        g = g.sort_values(["score2", "doc_id"], ascending=[False, True],
                          kind="mergesort").head(rerank_k)
        return pd.DataFrame(
            {
                "query_id": g["query_id"].astype("int64").to_numpy(),
                "doc_id": g["doc_id"].astype("int64").to_numpy(),
                "rerank": np.arange(1, len(g) + 1, dtype="int64"),
                "score2": g["score2"].astype("int64").to_numpy(),
            }
        )

    return grouped_block_map(scored, ["query_id"], finish)


def sql_rerank_search(
    k: int = _BM25_K, rerank_k: int = _RERANK_K, queries: tuple = _BM25_QUERIES
) -> str:
    """Replay retrieval (the BM25 oracle), candidate-only term counts, the
    fmix32 interaction hash, and the rerank window."""
    from .sql_oracles import _fmix32_ctes

    bm25 = sql_bm25_search(k=k, queries=queries)
    qvocab = sorted({t for q in queries for t in q})
    in_list = ", ".join(f"'{t}'" for t in qvocab)
    q_values = ", ".join(
        f"({qi}, '{tk}')" for qi, q in enumerate(queries) for tk in q
    )
    frag, final = _fmix32_ctes(
        "rr", "rr_h0", ["query_id", "doc_id", "tf"], "h0", "hv"
    )
    return (
        f"WITH rr_cands AS ({bm25}), "
        r"rr_toks AS (SELECT d.doc_id, u.tok FROM documents d, "
        r"UNNEST(regexp_extract_all(d.text, '\S+')) AS u(tok) "
        "WHERE d.doc_id IN (SELECT doc_id FROM rr_cands)), "
        f"rr_q(query_id, tok) AS (VALUES {q_values}), "
        f"rr_occ AS (SELECT doc_id, tok, COUNT(*) AS c FROM rr_toks "
        f"WHERE tok IN ({in_list}) GROUP BY doc_id, tok), "
        "rr_tf AS (SELECT c.query_id, c.doc_id, "
        "CAST(COALESCE(SUM(o.c), 0) AS BIGINT) AS tf "
        "FROM rr_cands c JOIN rr_q ON rr_q.query_id = c.query_id "
        "LEFT JOIN rr_occ o ON o.doc_id = c.doc_id AND o.tok = rr_q.tok "
        "GROUP BY c.query_id, c.doc_id), "
        "rr_h0 AS (SELECT query_id, doc_id, tf, "
        f"CAST((CAST(doc_id AS HUGEINT) * {_RERANK_MUL} + query_id) "
        "% 4294967296 AS BIGINT) AS h0 FROM rr_tf), "
        f"{frag}, "
        f"rr_sc AS (SELECT query_id, doc_id, "
        f"tf * 1000000 + hv % 1000000 AS score2 FROM {final}), "
        "rr_r AS (SELECT query_id, doc_id, score2, row_number() OVER ("
        "PARTITION BY query_id ORDER BY score2 DESC, doc_id) AS rerank "
        "FROM rr_sc) "
        "SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, "
        "CAST(rerank AS BIGINT) AS rerank, CAST(score2 AS BIGINT) AS score2 "
        f"FROM rr_r WHERE rerank <= {rerank_k}"
    )


_PMI_MIN_COUNT = 5
_PMI_TOPK = 50
_PMI_BUCKETS = 64


def pmi_collocations(sf_dir: str, *, min_count: int = _PMI_MIN_COUNT,
                     k: int = _PMI_TOPK) -> ray.data.Dataset:
    """Top-k bigram collocations by pointwise mutual information — the
    classic phrase-mining signal (Church & Hanks 1990) a tokenizer /
    phrase-vocab pipeline runs before merging multiword units.

    Distributed shape (ZERO driver-side state — not even a broadcast):

    1. one corpus pass emits per-batch unigram and interior-bigram count
       partials; one vocab-sized and one bigram-vocab-sized grouped
       exchange build the two count tables (materialized: each feeds two
       consumers — a scalar total and the scoring join).
    2. the unigram table attaches to the bigram rows by TWO tagged-sides
       sorted exchanges (key = w1, then w2) with vectorized in-block
       merges — the vocabulary never leaves the cluster.
    3. pmi_micro = round(log2(((c12·N)·N) / ((B·c1)·c2)) · 1e6) as int64,
       with the multiplication order pinned so the IEEE-double value is
       bit-identical to the SQL replay (N = unigram total, B = bigram
       total — the only two scalars the driver sees).
    4. rows with c12 ≥ min_count take a per-block local top-k before the
       global sort+limit, so the final sort runs over ≤ k·blocks rows.

    Output: (w1, w2, c12, c1, c2, pmi_micro), top-k by (pmi DESC, w1, w2).
    """
    ensure_picklable()
    import numpy as np
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def _tok_explode(df: pd.DataFrame):
        df = df.reset_index(drop=True)
        ex = df["text"].str.lower().str.findall(r"[a-z]+").explode().dropna()
        return ex.index.to_numpy(), ex.to_numpy(dtype=object)

    def uni_partials(df: pd.DataFrame) -> "pa.Table":
        _, vals = _tok_explode(df)
        part = (
            pd.DataFrame({"w": vals})
            .groupby("w", sort=False)
            .size()
            .reset_index(name="part_c")
        )
        return pa.Table.from_pandas(part, preserve_index=False)

    def bg_partials(df: pd.DataFrame) -> "pa.Table":
        pos, vals = _tok_explode(df)
        if len(vals) < 2:
            return pa.Table.from_pandas(
                pd.DataFrame(
                    {"w1": pd.Series([], dtype=object),
                     "w2": pd.Series([], dtype=object),
                     "part_c": pd.Series([], dtype="int64")}
                ),
                preserve_index=False,
            )
        same = pos[:-1] == pos[1:]
        part = (
            pd.DataFrame({"w1": vals[:-1][same], "w2": vals[1:][same]})
            .groupby(["w1", "w2"], sort=False)
            .size()
            .reset_index(name="part_c")
        )
        return pa.Table.from_pandas(part, preserve_index=False)

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    uni = (
        docs.map_batches(uni_partials, batch_format="pandas")
        .groupby("w")
        .aggregate(Sum("part_c", alias_name="c"))
        .materialize()  # vocab-sized; feeds the N scalar + two join legs
    )
    bg = (
        docs.map_batches(bg_partials, batch_format="pandas")
        .groupby(["w1", "w2"])
        .aggregate(Sum("part_c", alias_name="c12"))
        .materialize()  # bigram-vocab-sized; feeds the B scalar + the join
    )
    n_uni = int(uni.sum("c") or 0)
    n_bg = int(bg.sum("c12") or 0)
    _OUT_EMPTY = pd.DataFrame(
        {
            "w1": pd.Series([], dtype="object"),
            "w2": pd.Series([], dtype="object"),
            "c12": pd.Series([], dtype="int64"),
            "c1": pd.Series([], dtype="int64"),
            "c2": pd.Series([], dtype="int64"),
            "pmi_micro": pd.Series([], dtype="int64"),
        }
    )
    if n_bg == 0:
        return ray.data.from_pandas(_OUT_EMPTY)

    def _attach(ds_rows, key_col: str, out_col: str, carry: list):
        """Tagged-sides bucket co-partition: unigram counts onto bigram
        rows.  The exchange key is hash(word) % B — an int64 sort — not
        the word itself (a string sort over the bigram table measured
        ~2x the whole op's useful work); the in-block pandas hash merge
        on the word is exact."""

        def _bkt(keys: pd.Series) -> "np.ndarray":
            return (
                pd.util.hash_array(keys.to_numpy(dtype=object)) % _PMI_BUCKETS
            ).astype("int64")

        tagged_u = uni.map_batches(
            lambda df: pd.DataFrame(
                {
                    "key": df["w"].to_numpy(dtype=object),
                    "bucket": _bkt(df["w"]),
                    "uc": df["c"].to_numpy().astype("int64"),
                    "tag": np.zeros(len(df), dtype="int64"),
                }
            ),
            batch_format="pandas",
        )

        def tag_rows(df: pd.DataFrame) -> pd.DataFrame:
            out = df.assign(
                key=df[key_col].to_numpy(dtype=object),
                bucket=_bkt(df[key_col]),
                uc=np.zeros(len(df), dtype="int64"),
                tag=np.ones(len(df), dtype="int64"),
            )
            return out

        tagged_b = ds_rows.map_batches(tag_rows, batch_format="pandas")

        def merge_block(df: pd.DataFrame) -> pd.DataFrame:
            b = df[df["tag"] == 1]
            if len(b) == 0:
                cols = {
                    c: pd.Series([], dtype="object" if c in ("w1", "w2") else "int64")
                    for c in carry
                }
                cols[out_col] = pd.Series([], dtype="int64")
                return pd.DataFrame(cols)
            u = df[df["tag"] == 0].set_index("key")["uc"]
            out = b[carry].copy()
            # training-corpus property: every bigram word exists in uni
            out[out_col] = b["key"].map(u).to_numpy("int64")
            return out

        # union carries heterogeneous cols; normalize both sides first
        cols = ["key", "bucket", "uc", "tag"] + carry
        tagged_u = tagged_u.map_batches(
            lambda df: df.assign(
                **{
                    c: pd.Series([""] * len(df), dtype="object")
                    if c in ("w1", "w2")
                    else np.int64(0)
                    for c in carry
                }
            )[cols],
            batch_format="pandas",
        )
        tagged_b = tagged_b.map_batches(
            lambda df: df[cols], batch_format="pandas"
        )
        return (
            tagged_u.union(tagged_b)
            .sort(["bucket"])  # exactly the group key (colocation invariant)
            .map_batches(merge_block, batch_format="pandas", batch_size=None)
        )

    with_c1 = _attach(bg, "w1", "c1", ["w1", "w2", "c12"])
    with_c2 = _attach(with_c1, "w2", "c2", ["w1", "w2", "c12", "c1"])

    def score_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["c12"].to_numpy() >= min_count]
        if len(df) == 0:
            return _OUT_EMPTY
        c12 = df["c12"].to_numpy(dtype=np.float64)
        c1 = df["c1"].to_numpy(dtype=np.float64)
        c2 = df["c2"].to_numpy(dtype=np.float64)
        # multiplication order pinned to match the SQL replay bit-for-bit
        num = (c12 * float(n_uni)) * float(n_uni)
        den = (float(n_bg) * c1) * c2
        pmi = np.round(np.log2(num / den) * 1e6).astype("int64")
        out = pd.DataFrame(
            {
                "w1": df["w1"].to_numpy(dtype=object),
                "w2": df["w2"].to_numpy(dtype=object),
                "c12": df["c12"].to_numpy().astype("int64"),
                "c1": df["c1"].to_numpy().astype("int64"),
                "c2": df["c2"].to_numpy().astype("int64"),
                "pmi_micro": pmi,
            }
        )
        return out.sort_values(
            ["pmi_micro", "w1", "w2"], ascending=[False, True, True],
            kind="mergesort",
        ).head(k)

    scored = with_c2.map_batches(score_topk, batch_format="pandas")
    # ≤ k rows per block reach the global sort
    return scored.sort(
        ["pmi_micro", "w1", "w2"], descending=[True, False, False]
    ).limit(k)


def sql_pmi_collocations(min_count: int = _PMI_MIN_COUNT,
                         k: int = _PMI_TOPK) -> str:
    return (
        "WITH toks AS MATERIALIZED (SELECT "
        "regexp_extract_all(lower(text), '[a-z]+') AS ts FROM documents), "
        "uni AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS c "
        "FROM (SELECT unnest(ts) AS w FROM toks) GROUP BY w), "
        "bg AS MATERIALIZED (SELECT ts[i] AS w1, ts[i+1] AS w2 FROM ("
        "SELECT ts, unnest(generate_series(1, len(ts)-1)) AS i FROM toks)), "
        "c12 AS MATERIALIZED (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 "
        "FROM bg GROUP BY w1, w2), "
        "nu AS (SELECT CAST(SUM(c) AS BIGINT) AS nu FROM uni), "
        "nb AS (SELECT CAST(SUM(c12) AS BIGINT) AS nb FROM c12) "
        "SELECT c12.w1, c12.w2, c12.c12, u1.c AS c1, u2.c AS c2, "
        "CAST(ROUND(log2(((CAST(c12.c12 AS DOUBLE) * nu.nu) * nu.nu) / "
        "((CAST(nb.nb AS DOUBLE) * u1.c) * u2.c)) * 1000000) AS BIGINT) "
        "AS pmi_micro "
        "FROM c12 JOIN uni u1 ON u1.w = c12.w1 "
        "JOIN uni u2 ON u2.w = c12.w2 CROSS JOIN nu CROSS JOIN nb "
        f"WHERE c12.c12 >= {min_count} "
        f"ORDER BY pmi_micro DESC, c12.w1, c12.w2 LIMIT {k}"
    )


# --- round-5 session-4: per-source vocabulary overlap -----------------------


def source_vocab_overlap(sf_dir: str) -> pd.DataFrame:
    """Pairwise vocabulary Jaccard between sources — the corpus-mixing
    diagnostic (how lexically similar are two crawl feeds?) computed as a
    SET-SIMILARITY MATRIX over grouped distinct token sets, in exact
    integer milli-units.

    Scale plan: the corpus collapses to DISTINCT (source, token) rows
    (per-batch drop_duplicates, then one dedup exchange — bounded by
    sources × vocab, never by token occurrences); set sizes fold from
    per-block partials (≤ sources rows each); pair intersections come
    from ONE further sort exchange on [token] with per-token source-pair
    emission (≤ C(sources, 2) pairs per token) merged by
    ``grouped_block_sum``.  Driver traffic is the final
    C(sources, 2)-sized matrix only.  Same family as the LSH band→bucket
    shape, with the band key = the token itself.

    Output: (source_a, source_b, n_a, n_b, n_common, jaccard_milli) for
    pairs with at least one shared token; jaccard_milli =
    1000·|A∩B| // |A∪B|.
    """
    ensure_picklable()
    from .util import grouped_block_sum

    def distinct_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.findall(_TOKEN_RE)
        d = pd.DataFrame(
            {
                "source": df["source"].repeat(toks.str.len()),
                "token": toks.explode(),
            }
        ).dropna()
        return d.drop_duplicates()

    ds = read_table(sf_dir, "documents", columns=["source", "text"])
    st = grouped_block_dedup(
        ds.map_batches(distinct_partial, batch_format="pandas", batch_size=None),
        ["source", "token"],
    ).materialize()  # consumed twice (sizes + pairs); sources×vocab rows

    def size_partial(df: pd.DataFrame) -> pd.DataFrame:
        c = df["source"].value_counts()
        return pd.DataFrame(
            {"source": c.index, "n": c.to_numpy().astype("int64")}
        )

    sizes = (
        st.map_batches(size_partial, batch_format="pandas", batch_size=None)
        .to_pandas()  # ≤ sources × blocks rows
        .groupby("source")["n"].sum()
    )

    def pair_emit(g: pd.DataFrame) -> pd.DataFrame:
        srcs = sorted(g["source"])
        pairs = [
            (a, b) for i, a in enumerate(srcs) for b in srcs[i + 1:]
        ]
        out = pd.DataFrame(pairs, columns=["source_a", "source_b"])
        out["c"] = pd.Series(1, index=out.index, dtype="int64")
        return out

    inter = (
        grouped_block_sum(
            grouped_block_map(st, ["token"], pair_emit, drop_singletons=True),
            ["source_a", "source_b"],
            {"c": "n_common"},
        )
        .to_pandas()  # ≤ C(sources, 2) rows by construction
    )
    if len(inter) == 0:
        return pd.DataFrame(
            {
                "source_a": pd.Series([], dtype="object"),
                "source_b": pd.Series([], dtype="object"),
                "n_a": pd.Series([], dtype="int64"),
                "n_b": pd.Series([], dtype="int64"),
                "n_common": pd.Series([], dtype="int64"),
                "jaccard_milli": pd.Series([], dtype="int64"),
            }
        )
    n_a = inter["source_a"].map(sizes).astype("int64")
    n_b = inter["source_b"].map(sizes).astype("int64")
    common = inter["n_common"].astype("int64")
    return pd.DataFrame(
        {
            "source_a": inter["source_a"],
            "source_b": inter["source_b"],
            "n_a": n_a,
            "n_b": n_b,
            "n_common": common,
            "jaccard_milli": (1000 * common // (n_a + n_b - common)).astype(
                "int64"
            ),
        }
    ).sort_values(["source_a", "source_b"], ignore_index=True)


def sql_source_vocab_overlap() -> str:
    return (
        r"WITH st AS (SELECT DISTINCT source, tok FROM documents, "
        r"UNNEST(regexp_extract_all(text, '\S+')) AS u(tok)), "
        "sz AS (SELECT source, COUNT(*) AS n FROM st GROUP BY source), "
        "pr AS (SELECT a.source AS source_a, b.source AS source_b, "
        "COUNT(*) AS n_common FROM st a JOIN st b "
        "ON a.tok = b.tok AND a.source < b.source GROUP BY 1, 2) "
        "SELECT pr.source_a, pr.source_b, sa.n AS n_a, sb.n AS n_b, "
        "CAST(pr.n_common AS BIGINT) AS n_common, "
        "CAST(1000 * pr.n_common // (sa.n + sb.n - pr.n_common) AS BIGINT) "
        "AS jaccard_milli "
        "FROM pr JOIN sz sa ON sa.source = pr.source_a "
        "JOIN sz sb ON sb.source = pr.source_b"
    )
