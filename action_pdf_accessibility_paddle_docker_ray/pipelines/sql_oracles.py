"""DuckDB SQL oracles for the operators whose round-1 checks were
rows-only.

Every builder returns ONE SELECT statement (the driver executes a single
string per query) that recomputes the Ray operator's full result from the
raw parquet views — including the hash functions: fnv1a-32 / fmix32 are
generated as chained CTE steps with 32-bit arithmetic held in BIGINT
(products that can reach 2^63 go through HUGEINT), and LSH plane matrices
are inlined as ±1 literals from the same seeded generator the Ray side
uses.

Exactness notes (why Ray output == SQL output, not just approximately):

- ``minhash_dedup`` / ``jaccard_pairs`` verify candidates with EXACT
  char-k-gram Jaccard, so the oracle is the all-pairs exact scan; the only
  gap is LSH candidate recall, ≤ ~1e-9 at the corpus's measured minimum
  true-pair similarity (0.92 at both check SFs) and verified empirically.
- ``simhash_pairs`` recall is exact by pigeonhole (max_hamming 3 < 4
  bands), and the token hashes are recomputed bit-for-bit in SQL.
- ``embedding_dedup`` / ``knn_search_lsh`` bucket via floor-quantized
  integer projections — bit-equal across engines by construction.
- byte-level hashes assume byte == codepoint, which holds because the
  driver's documents corpus is pure ASCII (asserted by
  tests/test_sql_oracles.py); non-ASCII corpora would need a SQL
  utf-8-byte expansion here.
"""

from __future__ import annotations

import numpy as np

_M32 = 4294967296  # 2^32

# ---------------------------------------------------------------------------
# 32-bit hash primitives as SQL expression/CTE generators
# ---------------------------------------------------------------------------


def sql_fnv1a32(expr: str) -> str:
    """fnv1a-32 over the codepoints of a VARCHAR expression (one expression,
    safe in BIGINT: xor ≤ 2^32, ×16777619 < 2^56)."""
    return (
        f"list_reduce(list_prepend(2166136261::BIGINT, "
        f"[unicode(c)::BIGINT for c in split({expr}, '')]), "
        f"(h, b) -> (xor(h, b) * 16777619) % {_M32})"
    )


def _fmix32_ctes(prefix: str, src_cte: str, carry: list[str], in_col: str,
                 out_col: str) -> tuple[str, str]:
    """murmur3 fmix32 as 5 chained CTE steps (expression duplication in a
    single expression would blow up 2^5×; columns keep each step O(1)).
    Returns (sql_fragment, final_cte_name)."""
    cols = ", ".join(carry)
    steps = [
        f"xor(h, h // 65536)",
        f"CAST((h::HUGEINT * 2246822507) % {_M32} AS BIGINT)",  # 0x85EBCA6B
        f"xor(h, h // 8192)",
        f"CAST((h::HUGEINT * 3266489909) % {_M32} AS BIGINT)",  # 0xC2B2AE35
        f"xor(h, h // 65536)",
    ]
    parts = [f"{prefix}0 AS (SELECT {cols}, {in_col} AS h FROM {src_cte})"]
    for i, step in enumerate(steps):
        alias = "h" if i < len(steps) - 1 else out_col
        parts.append(
            f"{prefix}{i + 1} AS (SELECT {cols}, {step} AS {alias} FROM {prefix}{i})"
        )
    return ", ".join(parts), f"{prefix}{len(steps)}"


def _gramset_cte(k: int, table: str = "documents") -> str:
    """Distinct char-k-gram list per doc (1-based substr windows; one short
    window when the text is shorter than k — mirrors
    dedup_ops.char_gramset)."""
    return (
        f"g AS (SELECT doc_id, list_distinct([substr(lower(text), i, {k}) "
        f"for i in range(1, greatest(length(text) - {k - 2}, 2))]) AS grams "
        f"FROM {table})"
    )


# ---------------------------------------------------------------------------
# per-operator oracles
# ---------------------------------------------------------------------------


def sql_langid(stopwords: dict[str, tuple[str, ...]]) -> str:
    """Stopword-count argmax with strict-majority tie → 'und' (mirrors
    text_ops.langid)."""
    langs = sorted(stopwords)
    score_cols = ", ".join(
        "length(regexp_extract_all(lower(text), "
        f"'\\b(?:{'|'.join(stopwords[lang])})\\b'))::BIGINT AS s_{lang}"
        for lang in langs
    )
    m = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    n_at_max = " + ".join(f"(s_{lang} = m)::INT" for lang in langs)
    pick = " ".join(
        f"WHEN s_{lang} = m THEN '{lang}'" for lang in langs[:-1]
    ) + f" ELSE '{langs[-1]}'"
    return (
        f"WITH s AS (SELECT doc_id, lang, {score_cols} FROM documents), "
        f"t AS (SELECT *, {m} AS m FROM s), "
        f"u AS (SELECT *, {n_at_max} AS n_at_max FROM t) "
        f"SELECT doc_id, CASE WHEN m = 0 OR n_at_max > 1 THEN 'und' "
        f"{pick} END AS lang_pred, lang FROM u"
    )


def sql_fingerprint() -> str:
    """Winnowing fingerprint: fnv1a-32 of every 8-char window, 4 smallest
    distinct hashes hex-joined (mirrors text_ops.fingerprint)."""
    fnv = sql_fnv1a32("w")
    return (
        "WITH w AS (SELECT doc_id, CASE WHEN length(text) < 8 THEN [text] "
        "ELSE [substr(text, i, 8) for i in range(1, length(text) - 6)] END AS wins "
        "FROM documents), "
        f"h AS (SELECT doc_id, list_transform(wins, w -> {fnv}) AS hs FROM w) "
        "SELECT doc_id, array_to_string(list_transform("
        "list_sort(list_distinct(hs))[1:4], x -> printf('%08x', x)), '-') "
        "AS fingerprint FROM h"
    )


def sql_jaccard_pairs(threshold: float = 0.8, k: int = 3) -> str:
    """All-pairs exact char-k-gram Jaccard ≥ threshold (the LSH candidate
    stage has verified-exact recall at the check SFs — see module doc)."""
    return (
        f"WITH {_gramset_cte(k)}, "
        "j AS (SELECT a.doc_id AS a, b.doc_id AS b, "
        "len(list_intersect(a.grams, b.grams))::DOUBLE "
        "/ len(list_distinct(list_concat(a.grams, b.grams))) AS jac "
        "FROM g a JOIN g b ON a.doc_id < b.doc_id) "
        f"SELECT a, b, ROUND(jac, 6) AS jaccard FROM j WHERE jac >= {threshold}"
    )


def sql_minhash_dedup(threshold: float = 0.7, k: int = 5) -> str:
    """Exact-Jaccard pair graph → transitive closure → min-id representative
    (mirrors minhash_dedup's exact verify + union-find)."""
    return (
        f"WITH RECURSIVE {_gramset_cte(k)}, "
        "p AS (SELECT a.doc_id AS a, b.doc_id AS b "
        "FROM g a JOIN g b ON a.doc_id < b.doc_id "
        "WHERE len(list_intersect(a.grams, b.grams))::DOUBLE "
        f"/ len(list_distinct(list_concat(a.grams, b.grams))) >= {threshold}), "
        "e AS (SELECT a, b FROM p UNION SELECT b, a FROM p), "
        "reach(src, dst) AS (SELECT a, b FROM e "
        "UNION SELECT r.src, e.b FROM reach r JOIN e ON r.dst = e.a) "
        "SELECT src AS doc_id, least(src, MIN(dst)) AS rep_id "
        "FROM reach GROUP BY src"
    )


def sql_simhash_pairs(max_hamming: int = 3) -> str:
    """Recompute every document's 64-bit simhash (token fnv1a-32 → fmix32
    pair, ±1 bit votes) and scan all pairs for hamming ≤ max_hamming.
    Recall of the Ray side's 4×16-bit banding is exact by pigeonhole."""
    fnv = sql_fnv1a32("tok")
    fmix_a, end_a = _fmix32_ctes("ma", "f0", ["doc_id", "tok"], "fh", "h1")
    fmix_b, end_b = _fmix32_ctes(
        "mb", end_a, ["doc_id", "tok", "h1"], "xor(h1, 2654435769)", "h2"
    )
    lo_bits = ", ".join(
        f"SUM(CASE WHEN (h1 // {1 << j}) % 2 = 1 THEN 1 ELSE -1 END) AS a{j}"
        for j in range(32)
    )
    hi_bits = ", ".join(
        f"SUM(CASE WHEN (h2 // {1 << j}) % 2 = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(32)
    )
    h_lo = " + ".join(f"(CASE WHEN a{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(32))
    h_hi = " + ".join(f"(CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(32))
    return (
        "WITH toks AS (SELECT doc_id, "
        "unnest(list_distinct(regexp_extract_all(lower(text), '\\S+'))) AS tok "
        "FROM documents), "
        f"f0 AS (SELECT doc_id, tok, {fnv} AS fh FROM toks), "
        f"{fmix_a}, {fmix_b}, "
        f"bits AS (SELECT doc_id, {lo_bits}, {hi_bits} FROM {end_b} GROUP BY doc_id), "
        f"sh AS (SELECT doc_id, {h_lo} AS h_lo, {h_hi} AS h_hi FROM bits), "
        "full_sh AS (SELECT d.doc_id, COALESCE(s.h_lo, 0) AS h_lo, "
        "COALESCE(s.h_hi, 0) AS h_hi FROM documents d LEFT JOIN sh s USING (doc_id)) "
        "SELECT x.doc_id AS a, y.doc_id AS b, "
        "bit_count(xor(x.h_lo, y.h_lo)) + bit_count(xor(x.h_hi, y.h_hi)) AS hamming "
        "FROM full_sh x JOIN full_sh y ON x.doc_id < y.doc_id "
        f"WHERE bit_count(xor(x.h_lo, y.h_lo)) + bit_count(xor(x.h_hi, y.h_hi)) "
        f"<= {max_hamming}"
    )


def _planes_literal(dim: int, planes: int, seed: int) -> list[str]:
    """±1 plane-column literals from the SAME generator the Ray stages use."""
    from .dedup_ops import rademacher_planes

    mat = rademacher_planes(dim, planes, seed)
    return ["[" + ", ".join(str(int(v)) for v in mat[:, p]) + "]" for p in range(planes)]


def _bucket_expr(dim: int, planes: int, seed: int) -> str:
    """SQL bucket code: floor(v·2^24) ±1-projections → sign bits (exact
    integer arithmetic, mirrors dedup_ops.bucket_codes)."""
    cols = _planes_literal(dim, planes, seed)
    return " + ".join(
        f"(CASE WHEN list_dot_product(fq, {cols[p]}) > 0 THEN {1 << p} ELSE 0 END)"
        for p in range(planes)
    )


def sql_embedding_dedup(dim: int, threshold: float = 0.3, planes: int = 6,
                        seed: int = 11) -> str:
    bucket = _bucket_expr(dim, planes, seed)
    return (
        "WITH v AS (SELECT vec_id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings), "
        "q AS (SELECT vec_id, emb, list_transform(emb, "
        "x -> CAST(floor(x * 16777216.0) AS BIGINT)) AS fq FROM v), "
        f"c AS (SELECT vec_id, emb, {bucket} AS bucket FROM q), "
        "s AS (SELECT x.vec_id AS a, y.vec_id AS b, "
        "list_cosine_similarity(x.emb, y.emb) AS sim "
        "FROM c x JOIN c y ON x.vec_id < y.vec_id AND x.bucket = y.bucket) "
        "SELECT a, b, CAST(ROUND(sim * 1000) AS BIGINT) AS cos_milli "
        f"FROM s WHERE sim >= {threshold}"
    )


def sql_knn_search_lsh(dim: int, k: int = 5, n_queries: int = 10,
                       planes: int = 8, seed: int = 13) -> str:
    bucket = _bucket_expr(dim, planes, seed)
    return (
        "WITH v AS (SELECT vec_id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings), "
        "q AS (SELECT vec_id, emb, list_transform(emb, "
        "x -> CAST(floor(x * 16777216.0) AS BIGINT)) AS fq FROM v), "
        f"c AS (SELECT vec_id, emb, {bucket} AS code FROM q), "
        "qs AS (SELECT vec_id AS query_id, emb AS qemb, code AS qcode FROM c "
        f"WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id "
        f"LIMIT {n_queries})), "
        "cand AS (SELECT qs.query_id, c.vec_id AS neighbor_id, "
        "list_cosine_similarity(qs.qemb, c.emb) AS sim FROM qs JOIN c "
        "ON bit_count(xor(qs.qcode, c.code)) <= 1 AND c.vec_id != qs.query_id), "
        "ranked AS (SELECT query_id, neighbor_id, row_number() OVER ("
        "PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank FROM cand) "
        f"SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= {k}"
    )


def _ivf_iter_ctes(prev: str, idx: int, dim: int) -> tuple[str, str]:
    """One quantized-k-means iteration as CTEs: assign every vector to its
    best cell by score = dot(qv, S_c)/n_c (exact-int dot, float division of
    identical ints → bit-equal to numpy), then element-wise integer sums
    per cell; empty cells keep the previous state."""
    a, b, m, u, n, c = (f"{p}{idx}" for p in "abmunc")
    sql = (
        f"{a} AS (SELECT q.vec_id, q.qv, c.c, "
        f"list_dot_product(q.qv, c.s)::DOUBLE / c.n AS score "
        f"FROM q CROSS JOIN {prev} c), "
        f"{b} AS (SELECT vec_id, qv, c, row_number() OVER ("
        f"PARTITION BY vec_id ORDER BY score DESC, c) AS rn FROM {a}), "
        f"{m} AS (SELECT vec_id, qv, c FROM {b} WHERE rn = 1), "
        f"{u} AS (SELECT c, d.i AS dim, SUM(qv[d.i]) AS sv "
        f"FROM {m}, range(1, {dim + 1}) AS d(i) GROUP BY c, d.i), "
        f"{n} AS (SELECT c, COUNT(*) AS n FROM {m} GROUP BY c), "
        f"{c} AS (SELECT p.c, COALESCE(su.s, p.s) AS s, COALESCE({n}.n, p.n) AS n "
        f"FROM {prev} p "
        f"LEFT JOIN (SELECT c, list(sv ORDER BY dim) AS s FROM {u} GROUP BY c) su "
        f"ON p.c = su.c LEFT JOIN {n} ON p.c = {n}.c)"
    )
    return sql, c


def _ivf_cells_prefix(dim: int, n_clusters: int, n_iters: int) -> tuple[str, str]:
    """CTE chain (WITH included) from raw embeddings to every vector's
    converged cell: v → q → c0 seed → n_iters k-means iterations → fa →
    cells.  Returns (prefix_sql, final_state_cte); shared by the IVF
    search oracle and the standalone clustering oracle."""
    iters = []
    prev = "c0"
    for i in range(1, n_iters + 1):
        sql, prev = _ivf_iter_ctes(prev, i, dim)
        iters.append(sql)
    prefix = (
        "WITH v AS (SELECT vec_id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings), "
        "q AS (SELECT vec_id, emb, list_transform(emb, "
        "x -> CAST(floor(x * 4096.0) AS BIGINT)) AS qv FROM v), "
        "c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, "
        "qv AS s, CAST(1 AS BIGINT) AS n FROM "
        f"(SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT {n_clusters})), "
        + ", ".join(iters) + ", "
        # final cell of every vector under the converged state
        "fa AS (SELECT q.vec_id, c.c, "
        f"list_dot_product(q.qv, c.s)::DOUBLE / c.n AS score "
        f"FROM q CROSS JOIN {prev} c), "
        "cells AS (SELECT vec_id, c FROM (SELECT vec_id, c, row_number() OVER ("
        "PARTITION BY vec_id ORDER BY score DESC, c) AS rn FROM fa) WHERE rn = 1), "
    )
    return prefix, prev


def sql_kmeans_clusters(dim: int, n_clusters: int = 16, n_iters: int = 5) -> str:
    """Final cluster assignment of every vector under the converged
    quantized-k-means state (mirrors similarity.kmeans_clusters)."""
    prefix, _ = _ivf_cells_prefix(dim, n_clusters, n_iters)
    # the prefix ends with a trailing comma — close the CTE list with a
    # no-op and select the assignments
    return (
        prefix + "z AS (SELECT 1) "
        "SELECT vec_id, CAST(c AS BIGINT) AS cluster FROM cells"
    )


def sql_knn_search_ivf(dim: int, k: int = 5, n_queries: int = 10,
                       n_clusters: int = 16, n_probe: int = 4,
                       n_iters: int = 5) -> str:
    """Recompute the full quantized-k-means IVF search: seeded init from the
    first n_clusters vectors, n_iters exact-integer iterations, multi-cell
    probe, cosine rank (mirrors similarity.knn_search_ivf /
    _kmeans_state)."""
    prefix, final_state = _ivf_cells_prefix(dim, n_clusters, n_iters)
    return (
        prefix +
        # the first n_queries vectors probe their n_probe best cells
        "qs AS (SELECT vec_id AS query_id, emb, qv FROM q "
        f"WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id "
        f"LIMIT {n_queries})), "
        "pa AS (SELECT qs.query_id, c.c, "
        f"list_dot_product(qs.qv, c.s)::DOUBLE / c.n AS score "
        f"FROM qs CROSS JOIN {final_state} c), "
        "probe AS (SELECT query_id, c FROM (SELECT query_id, c, row_number() OVER ("
        f"PARTITION BY query_id ORDER BY score DESC, c) AS rn FROM pa) "
        f"WHERE rn <= {n_probe}), "
        "cand AS (SELECT p.query_id, ce.vec_id AS neighbor_id, "
        "list_cosine_similarity(qs.emb, v.emb) AS sim "
        "FROM probe p JOIN cells ce ON ce.c = p.c "
        "JOIN v ON v.vec_id = ce.vec_id "
        "JOIN qs ON qs.query_id = p.query_id WHERE ce.vec_id != p.query_id), "
        "ranked AS (SELECT query_id, neighbor_id, row_number() OVER ("
        "PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank FROM cand) "
        f"SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= {k}"
    )


def sql_image_features() -> str:
    """Byte-level features of the documents' utf-8 payloads (char == byte on
    the ASCII corpus): length, md5 digest, byte-entropy (mirrors
    stages/multimodal.ImageFeatureStage)."""
    return (
        "WITH c AS (SELECT doc_id, unnest(split(text, '')) AS ch FROM documents), "
        "cnt AS (SELECT doc_id, ch, count(*)::DOUBLE AS n FROM c GROUP BY doc_id, ch), "
        "tot AS (SELECT doc_id, sum(n) AS t FROM cnt GROUP BY doc_id), "
        "ent AS (SELECT cnt.doc_id, "
        "CAST(ROUND(-sum((n / t) * log2(n / t)) * 1000) AS BIGINT) AS entropy_milli "
        "FROM cnt JOIN tot USING (doc_id) GROUP BY cnt.doc_id) "
        "SELECT d.doc_id, octet_length(encode(d.text))::BIGINT AS n_bytes, "
        "md5(d.text) AS digest, COALESCE(e.entropy_milli, 0) AS entropy_milli "
        "FROM documents d LEFT JOIN ent e USING (doc_id)"
    )


# --- flagship extraction replayed in SQL -----------------------------------
#
# The %SDOC arm recomputes the FULL region pipeline: stub-detect filter
# (functions/sdoc.py:52-82 — 23-label set + per-class thresholds, >= keeps),
# overlap resolution (functions/boxes.py:39-122 — closed-rect intersect,
# <50%/<50% special-case exemption, union-find components via a recursive
# closure, greedy max-score/min-index elimination via a recursive CTE whose
# state is a (remaining, survivors) list pair), and the formula-in-text
# nesting (template.py:154-176 — resolved formulas overlapping a resolved
# text box are skipped as wrappers and re-emitted as nested spans).
# Coordinate zoom scaling cancels in every ratio, so boxes stay at BASE
# zoom.  The HTML arm counts parser blocks by their defining start tags
# (html_strip.py:118-146: one block per p/li/blockquote/h1-h6/figcaption/
# caption/pre/img/table outside DROP subtrees; the corpus generators never
# emit block tags inside DROP subtrees and escape all text).

_SQL_LOW_THRESH = "('paragraph_title','formula','header','seal','header_image')"
_SQL_LABELS23 = (
    "('paragraph_title','image','text','number','abstract','content',"
    "'figure_title','formula','table','table_title','reference','doc_title',"
    "'footnote','header','algorithm','footer','seal','chart_title','chart',"
    "'formula_number','header_image','footer_image','aside_text')"
)
_SQL_HTML_LABELS = (
    ("text", "<(p|li|blockquote)[^a-z]"),
    ("doc_title", "<h1[^a-z]"),
    ("paragraph_title", "<h[2-6][^a-z]"),
    ("figure_title", "<figcaption[^a-z]"),
    ("table_title", "<caption[^a-z]"),
    ("algorithm", "<pre[^a-z]"),
    ("image", "<img[^a-z]"),
    ("table", "<table[^a-z]"),
)


def _sql_extract_prefix(pages_glob: str) -> str:
    """Shared WITH-chain: winner dedup → %SDOC detect/resolve/nest tables
    (``wrappers``, ``tf``) + html winner rows (``win``)."""
    return f"""
WITH RECURSIVE
pages_t AS (SELECT url, warc_ts, decode(html) AS body FROM read_parquet('{pages_glob}')),
ranked AS (SELECT url, body, row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC, md5(body) DESC) AS rn FROM pages_t),
win AS (SELECT url, body FROM ranked WHERE rn = 1),
sd AS (SELECT url, substr(body, 6) AS j FROM win WHERE starts_with(body, '%SDOC')),
sdp AS (SELECT url, CAST(json_extract(j, '$.pages') AS JSON[]) AS parr FROM sd WHERE json_valid(j)),
sp AS (SELECT url, unnest([x for x in range(1, len(parr) + 1)]) AS pg, unnest(parr) AS pj FROM sdp),
spr AS (SELECT url, pg, CAST(coalesce(json_extract(pj, '$.truth_regions'), '[]') AS JSON[]) AS rarr FROM sp),
rb AS (SELECT url, pg, unnest([x for x in range(0, len(rarr))]) AS ord, unnest(rarr) AS rj FROM spr),
rbx AS (SELECT url, pg, ord,
        json_extract_string(rj, '$.label') AS label,
        CAST(json_extract(rj, '$.score') AS DOUBLE) AS score,
        CAST(json_extract(rj, '$.coordinate[0]') AS DOUBLE) AS x0,
        CAST(json_extract(rj, '$.coordinate[1]') AS DOUBLE) AS y0,
        CAST(json_extract(rj, '$.coordinate[2]') AS DOUBLE) AS x1,
        CAST(json_extract(rj, '$.coordinate[3]') AS DOUBLE) AS y1
       FROM rb),
det AS (SELECT url, pg, row_number() OVER (PARTITION BY url, pg ORDER BY ord) - 1 AS i,
               label, score, x0, y0, x1, y1
        FROM rbx
        WHERE label IN {_SQL_LABELS23}
          AND score >= (CASE WHEN label IN {_SQL_LOW_THRESH} THEN 0.3 ELSE 0.5 END)),
pairs AS (
  SELECT a.url, a.pg, a.i AS ia, b.i AS ib
  FROM det a JOIN det b ON a.url = b.url AND a.pg = b.pg AND a.i < b.i
  WHERE NOT (a.x1 < b.x0 OR a.x0 > b.x1 OR a.y1 < b.y0 OR a.y0 > b.y1)
    AND NOT (
      (CASE WHEN greatest(a.x1-a.x0,0)*greatest(a.y1-a.y0,0) > 0
            THEN (greatest(least(a.x1,b.x1)-greatest(a.x0,b.x0),0)*greatest(least(a.y1,b.y1)-greatest(a.y0,b.y0),0))
                 / (greatest(a.x1-a.x0,0)*greatest(a.y1-a.y0,0)) * 100.0 ELSE 0 END) < 50.0
      AND
      (CASE WHEN greatest(b.x1-b.x0,0)*greatest(b.y1-b.y0,0) > 0
            THEN (greatest(least(a.x1,b.x1)-greatest(a.x0,b.x0),0)*greatest(least(a.y1,b.y1)-greatest(a.y0,b.y0),0))
                 / (greatest(b.x1-b.x0,0)*greatest(b.y1-b.y0,0)) * 100.0 ELSE 0 END) < 50.0
    )),
und AS (SELECT url, pg, ia AS a, ib AS b FROM pairs UNION ALL SELECT url, pg, ib, ia FROM pairs),
reach AS (
  SELECT url, pg, a AS src, a AS dst FROM und
  UNION
  SELECT r.url, r.pg, r.src, u.b FROM reach r JOIN und u ON u.url = r.url AND u.pg = r.pg AND u.a = r.dst),
comp AS (SELECT url, pg, src AS i, MIN(dst) AS rep FROM reach GROUP BY url, pg, src),
comp_pairs AS (
  SELECT p.url, p.pg, c.rep, list(struct_pack(a := p.ia, b := p.ib)) AS pairlist
  FROM pairs p JOIN comp c ON c.url = p.url AND c.pg = p.pg AND c.i = p.ia
  GROUP BY p.url, p.pg, c.rep),
gstate AS (
  SELECT c.url, c.pg, c.rep,
         list_sort(list(struct_pack(ns := -d.score, i := d.i))) AS remaining,
         CAST([] AS BIGINT[]) AS survivors,
         any_value(cp.pairlist) AS pairlist
  FROM comp c
  JOIN det d ON d.url = c.url AND d.pg = c.pg AND d.i = c.i
  JOIN comp_pairs cp ON cp.url = c.url AND cp.pg = c.pg AND cp.rep = c.rep
  GROUP BY c.url, c.pg, c.rep
  UNION ALL
  SELECT url, pg, rep,
         [m for m in remaining IF m.i != remaining[1].i AND NOT list_contains(pairlist, struct_pack(a := least(remaining[1].i, m.i), b := greatest(remaining[1].i, m.i)))],
         list_append(survivors, remaining[1].i),
         pairlist
  FROM gstate WHERE len(remaining) > 0),
surv AS (SELECT url, pg, unnest(survivors) AS i FROM gstate WHERE len(remaining) = 0),
involved AS (SELECT DISTINCT url, pg, a AS i FROM und),
resolved AS (
  SELECT d.url, d.pg, d.i, d.label, d.x0, d.y0, d.x1, d.y1 FROM det d
  LEFT JOIN involved v ON v.url = d.url AND v.pg = d.pg AND v.i = d.i
  WHERE v.i IS NULL
  UNION ALL
  SELECT d.url, d.pg, d.i, d.label, d.x0, d.y0, d.x1, d.y1
  FROM surv s JOIN det d ON d.url = s.url AND d.pg = s.pg AND d.i = s.i),
tf AS (
  SELECT t.url, t.pg, t.i AS ti, f.i AS fi
  FROM resolved t JOIN resolved f ON t.url = f.url AND t.pg = f.pg AND t.i != f.i
  WHERE t.label = 'text' AND f.label = 'formula'
    AND NOT (t.x1 < f.x0 OR t.x0 > f.x1 OR t.y1 < f.y0 OR t.y0 > f.y1)),
skipped AS (SELECT DISTINCT url, pg, fi AS i FROM tf),
wrappers AS (
  SELECT r.url, r.pg, r.i, r.label FROM resolved r
  LEFT JOIN skipped k ON k.url = r.url AND k.pg = r.pg AND k.i = r.i
  WHERE k.i IS NULL)
"""


def sql_extract_doc_meta(pages_glob: str) -> str:
    """Per-url (n_pages, n_regions, status) of the flagship extraction:
    winner crawl = max (warc_ts, md5 content key), then the full
    detect→resolve replay for region counts (see ``_sql_extract_prefix``)."""
    html_regions = " + ".join(
        f"len(regexp_extract_all(body, '{pat}'))" for _, pat in _SQL_HTML_LABELS
    )
    return _sql_extract_prefix(pages_glob) + f"""
, sdoc_regions AS (SELECT url, count(*)::BIGINT AS n_regions FROM wrappers GROUP BY url)
SELECT w.url,
       CAST(CASE WHEN starts_with(w.body, '%SDOC')
                 THEN CASE WHEN json_valid(substr(w.body, 6))
                           THEN json_array_length(json_extract(substr(w.body, 6), '$.pages'))
                           ELSE 1 END
                 ELSE 1 END AS BIGINT) AS n_pages,
       CAST(CASE WHEN starts_with(w.body, '%SDOC') THEN coalesce(sr.n_regions, 0)
                 ELSE {html_regions} END AS BIGINT) AS n_regions,
       CASE WHEN starts_with(w.body, '%SDOC') AND NOT json_valid(substr(w.body, 6))
            THEN 'parse_error:JSONDecodeError' ELSE 'ok' END AS status
FROM win w LEFT JOIN sdoc_regions sr ON sr.url = w.url
"""


def sql_extract_span_stats(pages_glob: str) -> str:
    """Per-(url, page_no, label) span counts of the flagship extraction —
    the driver-checkable projection of ``extract_spans`` (html pages are
    page_no 0; %SDOC pages 1-based; nested formula spans counted)."""
    vals = ", ".join(f"('{label}', '{pat}')" for label, pat in _SQL_HTML_LABELS)
    return _sql_extract_prefix(pages_glob) + f"""
, sdoc_lab AS (
  SELECT url, pg AS page_no, label, count(*)::BIGINT AS n_spans FROM wrappers GROUP BY url, pg, label
  UNION ALL
  SELECT url, pg AS page_no, 'formula' AS label, count(*)::BIGINT AS n_spans FROM tf GROUP BY url, pg),
hl(label, pat) AS (VALUES {vals}),
html_lab AS (
  SELECT url, 0 AS page_no, hl.label AS label,
         len(regexp_extract_all(body, hl.pat))::BIGINT AS n_spans
  FROM win, hl
  WHERE NOT starts_with(body, '%SDOC') AND len(regexp_extract_all(body, hl.pat)) > 0)
SELECT url, CAST(page_no AS BIGINT) AS page_no, label, SUM(n_spans)::BIGINT AS n_spans
FROM (SELECT * FROM sdoc_lab UNION ALL SELECT * FROM html_lab)
GROUP BY url, page_no, label
"""


def sql_semantic_dedup(dim: int, n_clusters: int = 16, n_iters: int = 5,
                       threshold_milli: int = 350) -> str:
    """SemDeDup replay: the full quantized-k-means trajectory (shared with
    the IVF/kmeans oracles) assigns every vector a cluster, then a vector
    survives iff no lower-id cluster-mate has round(cos·1000) >= τ —
    mirrors similarity.semantic_dedup's keep rule exactly."""
    prefix, _ = _ivf_cells_prefix(dim, n_clusters, n_iters)
    return (
        prefix +
        "av AS (SELECT q.vec_id, cells.c AS cluster, q.emb "
        "FROM q JOIN cells ON cells.vec_id = q.vec_id) "
        "SELECT v.vec_id, CAST(v.cluster AS BIGINT) AS cluster FROM av v "
        "WHERE NOT EXISTS (SELECT 1 FROM av u "
        "WHERE u.cluster = v.cluster AND u.vec_id < v.vec_id "
        "AND CAST(ROUND(list_cosine_similarity(u.emb, v.emb) * 1000) AS BIGINT) "
        f">= {threshold_milli})"
    )
