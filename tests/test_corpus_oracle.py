import collections

from action_pdf_accessibility_paddle_docker_ray.corpus import generate_pages
from action_pdf_accessibility_paddle_docker_ray.functions.sdoc import is_sdoc
from action_pdf_accessibility_paddle_docker_ray.oracle import (
    dedup_latest,
    extract_row,
    oracle_extract,
)


def test_corpus_deterministic():
    a = generate_pages(50, seed=42)
    b = generate_pages(50, seed=42)
    assert a.equals(b)
    c = generate_pages(50, seed=43)
    assert not a.equals(c)


def test_corpus_shape_and_skew():
    t = generate_pages(300, seed=42)
    assert t.column_names == ["url", "warc_ts", "html", "text", "lang"]
    kinds = collections.Counter(
        "sdoc" if is_sdoc(h) else "html" for h in t.column("html").to_pylist()
    )
    assert kinds["html"] > kinds["sdoc"] > 0
    # duplicated urls exist (dedup-by-recency exercise)
    urls = t.column("url").to_pylist()
    assert len(set(urls)) < len(urls)


def test_dedup_latest_keeps_freshest():
    t = generate_pages(300, seed=42)
    rows = t.to_pylist()
    deduped = dedup_latest(rows)
    assert len(deduped) == len({r["url"] for r in rows})
    by_url: dict = {}
    for r in rows:
        by_url.setdefault(r["url"], []).append(r)
    for d in deduped:
        assert d["warc_ts"] == max(r["warc_ts"] for r in by_url[d["url"]])


def test_oracle_statuses_ok_and_deterministic():
    t = generate_pages(60, seed=42)
    docs1 = oracle_extract(t)
    docs2 = oracle_extract(t)
    assert docs1 == docs2
    assert all(d["status"] == "ok" for d in docs1)
    assert all(d["text"] for d in docs1 if d["n_regions"] > 0)


def test_extract_row_error_status_on_bad_sdoc():
    import datetime as dt

    row = {
        "url": "u",
        "warc_ts": dt.datetime(2026, 1, 1),
        "html": b"%SDOC{not valid json",
        "text": "",
        "lang": "en",
    }
    doc = extract_row(row)
    assert doc["status"].startswith("parse_error")
    assert doc["text"] == ""
