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


def corpus_from_documents(sf_dir: str) -> pa.Table:
    """documents rows → HTML pages rows (deterministic wrapper)."""
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"]
    )
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for doc_id, text, lang in zip(
        docs["doc_id"].to_pylist(), docs["text"].to_pylist(), docs["lang"].to_pylist()
    ):
        urls.append(f"https://docs.example/{doc_id}")
        tss.append(_BASE_TS + dt.timedelta(seconds=int(doc_id)))
        htmls.append(wrap_document_html(int(doc_id), text).encode("utf-8"))
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


def pages_path_for(sf_dir: str, n_sdoc: int = 120, seed: int = 42) -> str:
    """Build (once) and return the flagship pages parquet for an sf dir."""
    tag = hashlib.sha1(f"{os.path.abspath(sf_dir)}|{n_sdoc}|{seed}".encode()).hexdigest()[:12]
    path = f"/tmp/graft_pages_{tag}.parquet"
    if not os.path.exists(path):
        html_part = corpus_from_documents(sf_dir)
        sdoc_part = generate_pages(n_sdoc, seed=seed)
        table = pa.concat_tables([html_part, sdoc_part], promote_options="default")
        tmp = path + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, path)  # atomic publish
    return path
