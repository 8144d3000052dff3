"""Flagship input builder: a pages table derived deterministically from the
driver's ``documents`` table (HTML arm) plus seeded %SDOC docs (PDF arm).

The derived corpus lives under /tmp keyed by source dir — built once per
(sf_dir, n_sdoc) and reused by ``entry()``/``queries()``/``bench.py``.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq

from ..corpus import generate_pages
from .text_ops import wrap_document_html

_BASE_TS = dt.datetime(2026, 1, 1)


def corpus_from_documents(sf_dir: str, replicate: int = 1) -> pa.Table:
    """documents rows → HTML pages rows (deterministic wrapper).

    ``replicate > 1`` emits each document ``replicate`` times under
    distinct urls (``/r{n}`` suffix) — the scale-smoke knob."""
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"]
    )
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for doc_id, text, lang in zip(
        docs["doc_id"].to_pylist(), docs["text"].to_pylist(), docs["lang"].to_pylist()
    ):
        html = wrap_document_html(int(doc_id), text).encode("utf-8")
        for rep in range(replicate):
            suffix = f"/r{rep}" if replicate > 1 else ""
            urls.append(f"https://docs.example/{doc_id}{suffix}")
            tss.append(_BASE_TS + dt.timedelta(seconds=int(doc_id) + rep))
            htmls.append(html)
            texts.append(text)
            langs.append(lang)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def domain_stats(sf_dir: str):
    """Per-domain crawl counts over the derived pages corpus — the standard
    web-corpus composition report (and a pruned-read demo: ONLY the url
    column leaves storage).

    Output: top 20 (domain, n_pages) by (count desc, domain asc)."""
    import pandas as pd
    import ray.data
    from ray.data.aggregate import Sum

    from .. import ensure_picklable

    ensure_picklable()
    path = pages_path_for(sf_dir)

    def partial(df: pd.DataFrame) -> "pa.Table":
        # Arrow block out: web-scale domain counts are a many-group
        # aggregate, and Ray's aggregate over pandas blocks pays a
        # per-group Python dispatch (~27x measured at 60k groups)
        import pyarrow as pa

        dom = df["url"].str.extract(r"^[a-z]+://([^/]+)", expand=False).fillna("")
        counts = dom.value_counts()
        return pa.table(
            {"domain": pa.array(counts.index, type=pa.string()),
             "part_n": pa.array(counts.to_numpy().astype("int64"))}
        )

    ds = ray.data.read_parquet(path, columns=["url"])
    ds = ds.map_batches(partial, batch_format="pandas")
    agg = ds.groupby("domain").aggregate(Sum("part_n", alias_name="n_pages"))
    return agg.sort(["n_pages", "domain"], descending=[True, False]).limit(20)


def pages_path_for(
    sf_dir: str, n_sdoc: int = 120, seed: int = 42, n_files: int = 32,
    replicate: int = 1,
) -> str:
    """Build (once) and return the flagship pages corpus for an sf dir.

    Written as a DIRECTORY of ``n_files`` parquet files so the Ray read
    parallelizes (a single file = a single read task); rows are strided
    across files so heavy %SDOC docs spread evenly.
    """
    tag = hashlib.sha1(
        f"{os.path.abspath(sf_dir)}|{n_sdoc}|{seed}|{n_files}|{replicate}".encode()
    ).hexdigest()[:12]
    path = f"/tmp/graft_pages_{tag}"
    if not os.path.isdir(path):
        html_part = corpus_from_documents(sf_dir, replicate=replicate)
        sdoc_part = generate_pages(n_sdoc, seed=seed)
        table = pa.concat_tables([html_part, sdoc_part], promote_options="default")
        # 64-bit offsets so strided take over a >2GB payload column works
        idx_html = table.schema.get_field_index("html")
        table = table.set_column(
            idx_html, pa.field("html", pa.large_binary()),
            table.column("html").cast(pa.large_binary()),
        )
        tmp = path + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        n = table.num_rows
        for i in range(n_files):
            idx = list(range(i, n, n_files))  # stride → heavy docs spread
            pq.write_table(table.take(idx), os.path.join(tmp, f"part-{i:05d}.parquet"))
        os.replace(tmp, path)  # atomic publish
    return path
