"""Deterministic synthetic Common-Crawl-style pages corpus (FIXTURES.md §1).

Seeded, pure-Python generation of the input table
``(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)``
with the documented skew mix: ~80% short HTML docs, ~18% medium %SDOC docs
(1-10 pages), ~2% heavy %SDOC docs (100-400 pages).  A small fraction of
urls is duplicated with an older ``warc_ts`` to exercise dedup-by-recency.

The %SDOC pages deliberately include the overlap-resolution corner cases
the reference's post-processing handles (/root/reference/src/
process_bboxes.py): chain merges, containment, <50% mutual overlap
exemptions, score ties, formula-inside-text nesting, tables with spans and
±2px line jitter, and header/footer/number regions in both page halves.
"""

from __future__ import annotations

import datetime as dt
import random

import pyarrow as pa

from .functions.sdoc import make_sdoc

_VOCAB = (
    "data ray arrow stream block batch shuffle actor page region table cell "
    "formula text title header footer corpus crawl engine pipeline schema "
    "extract layout detect resolve order sort group join filter map reduce "
    "spill lineage manifest partition bucket skew broadcast vector token"
).split()

_LANGS = ("en", "de", "fr", "es", "sk")
_BASE_TS = dt.datetime(2026, 1, 1, 0, 0, 0)

# page geometry: US-Letter points; device px at BASE_ZOOM=2.0
_PAGE_W, _PAGE_H = 612.0, 792.0
_DEV_W, _DEV_H = 1224.0, 1584.0


def _words(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_VOCAB) for _ in range(n))


def _sentence(rng: random.Random) -> str:
    s = _words(rng, rng.randint(4, 14))
    return s[0].upper() + s[1:] + "."


def _escape(text: str) -> str:
    return text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _make_html_doc(rng: random.Random, i: int) -> tuple[bytes, str]:
    """Boilerplate-wrapped HTML page; returns (payload, raw_full_text)."""
    title = _words(rng, rng.randint(2, 5)).title()
    n_paras = rng.randint(1, 30)
    paras = [_sentence(rng) + " " + _sentence(rng) for _ in range(n_paras)]
    nav_links = " ".join(
        f'<a href="/{_words(rng, 1)}">{_words(rng, 1)}</a>' for _ in range(rng.randint(3, 8))
    )
    ad_text = _words(rng, 3)
    parts = [
        "<!DOCTYPE html>",
        f"<html><head><title>{_escape(title)}</title>",
        '<script>var x = "tracking";</script>',
        "<style>body { color: black }</style></head><body>",
        f"<nav>{nav_links}</nav>",
        f"<header><p>{_escape(_words(rng, 4))}</p></header>",
        "<article>",
        f"<h1>{_escape(title)}</h1>",
    ]
    parts.extend(f"<p>{_escape(p)}</p>" for p in paras)
    if rng.random() < 0.2:  # an in-article table
        rows = "".join(
            "<tr>" + "".join(f"<td>{_escape(_words(rng, 2))}</td>" for _ in range(3)) + "</tr>"
            for _ in range(rng.randint(2, 4))
        )
        parts.append(f"<table>{rows}</table>")
    parts.append("</article>")
    parts.append(f'<aside><p>{_escape(_words(rng, 6))} <a href="/x">{_escape(_words(rng, 2))}</a></p></aside>')
    parts.append(f'<div><a href="/ads">{_escape(ad_text)}</a></div>')
    parts.append(f"<footer><p>© {_escape(_words(rng, 3))}</p></footer>")
    parts.append("</body></html>")
    html = "\n".join(parts)
    raw_text = "\n".join([title] + paras + [ad_text])
    return html.encode("utf-8"), raw_text


def _region(label: str, score: float, box: tuple[float, float, float, float], **extra) -> dict:
    r = {"label": label, "score": round(score, 4), "coordinate": [round(v, 2) for v in box]}
    r.update(extra)
    return r


def _glyphs_for_region(rng: random.Random, box, n_lines: int = None) -> list[dict]:
    """Word glyph runs laid out in lines inside a region (device px)."""
    x0, y0, x1, y1 = box
    runs = []
    line_h = 22.0
    n_lines = n_lines or max(1, int((y1 - y0) // line_h))
    for li in range(n_lines):
        y = y0 + 4 + li * line_h
        if y + line_h > y1:
            break
        x = x0 + 4
        while x < x1 - 60:
            word = rng.choice(_VOCAB)
            w = 10.0 * len(word)
            if x + w > x1 - 4:
                break
            runs.append({"text": word, "x0": round(x, 1), "y0": round(y, 1),
                         "x1": round(x + w, 1), "y1": round(y + line_h - 4, 1)})
            x += w + 8.0
    return runs


def _make_sdoc_page(rng: random.Random, page_index: int) -> dict:
    regions: list[dict] = []
    glyphs: list[dict] = []
    y = 60.0

    def add_text_region(label: str, height: float, score: float) -> tuple:
        nonlocal y
        box = (80.0, y, _DEV_W - 80.0 - rng.random() * 200.0, y + height)
        regions.append(_region(label, score, box))
        glyphs.extend(_glyphs_for_region(rng, box))
        y += height + 20.0
        return box

    # header & page number (both halves exercised via page parity)
    if rng.random() < 0.7:
        hbox = (100.0, 10.0, 700.0, 40.0)
        regions.append(_region("header", 0.4 + rng.random() * 0.5, hbox))
        glyphs.extend(_glyphs_for_region(rng, hbox, 1))
    if rng.random() < 0.7:
        if page_index % 2 == 0:
            nbox = (580.0, _DEV_H - 40.0, 650.0, _DEV_H - 12.0)
        else:
            nbox = (580.0, 12.0, 650.0, 40.0)
        regions.append(_region("number", 0.55 + rng.random() * 0.4, nbox))
        glyphs.append({"text": str(page_index + 1), "x0": nbox[0] + 2, "y0": nbox[1] + 2,
                       "x1": nbox[0] + 20, "y1": nbox[3] - 2})

    if page_index == 0:
        add_text_region("doc_title", 50.0, 0.6 + rng.random() * 0.35)
    if rng.random() < 0.6:
        add_text_region("paragraph_title", 36.0, 0.35 + rng.random() * 0.6)

    for _ in range(rng.randint(1, 4)):
        add_text_region("text", 80.0 + rng.random() * 120.0, 0.55 + rng.random() * 0.4)

    case = rng.random()
    if case < 0.25:
        # chain merge: b1-b2 overlap >50% of b1, b3 ~93% inside b2 —
        # a 3-box connected component for the greedy max-score resolution
        base_y = y
        b1 = (100.0, base_y, 500.0, base_y + 120.0)
        b2 = (150.0, base_y + 30.0, 550.0, base_y + 150.0)
        b3 = (420.0, base_y + 70.0, 560.0, base_y + 140.0)
        s = 0.55 + rng.random() * 0.3
        regions.append(_region("text", s, b1))
        regions.append(_region("image", s if rng.random() < 0.3 else s + 0.1, b2))  # score tie case
        regions.append(_region("text", min(0.95, s + 0.05), b3))
        glyphs.extend(_glyphs_for_region(rng, b1))
        y = base_y + 180.0
    elif case < 0.45:
        # containment: small box fully inside a big one
        base_y = y
        big = (100.0, base_y, 800.0, base_y + 180.0)
        small = (150.0, base_y + 30.0, 380.0, base_y + 90.0)
        regions.append(_region("image", 0.6 + rng.random() * 0.3, big))
        regions.append(_region("figure_title", 0.52 + rng.random() * 0.3, small))
        y = base_y + 200.0
    elif case < 0.6:
        # <50% mutual overlap: both keep (special-case exemption)
        base_y = y
        a = (100.0, base_y, 500.0, base_y + 100.0)
        b = (400.0, base_y + 60.0, 900.0, base_y + 220.0)
        regions.append(_region("text", 0.6, a))
        regions.append(_region("text", 0.65, b))
        glyphs.extend(_glyphs_for_region(rng, a))
        glyphs.extend(_glyphs_for_region(rng, b))
        y = base_y + 240.0

    if rng.random() < 0.35:
        # formula inside text (nesting case)
        box = (80.0, y, 1000.0, y + 140.0)
        regions.append(_region("text", 0.7, box))
        glyphs.extend(_glyphs_for_region(rng, box))
        fbox = (200.0, y + 50.0, 420.0, y + 100.0)
        latex = rng.choice(
            ["\\frac{a}{b}+c", "x^{2}+y^{2}=z^{2}", "\\sqrt{q}-\\alpha", "\\lambda=p+1"]
        )
        regions.append(_region("formula", 0.32 + rng.random() * 0.6, fbox, latex=latex))
        y += 160.0
    elif rng.random() < 0.2:
        # standalone formula
        fbox = (300.0, y, 700.0, y + 60.0)
        regions.append(_region("formula", 0.4 + rng.random() * 0.5, fbox,
                               latex="\\sigma^{2}=\\frac{s}{n}"))
        y += 80.0

    if rng.random() < 0.3 and y < _DEV_H - 300.0:
        # table with grid jitter and spans
        tb = (120.0, y, 900.0, y + 220.0)
        n_r, n_c = rng.randint(2, 4), rng.randint(2, 4)
        cw = (tb[2] - tb[0]) / n_c
        ch = (tb[3] - tb[1]) / n_r
        cell_boxes = []
        for r in range(n_r):
            c = 0
            while c < n_c:
                span = 2 if (c + 1 < n_c and rng.random() < 0.15) else 1
                if rng.random() < 0.08:  # missing cell
                    c += span
                    continue
                jx = rng.uniform(-2.0, 2.0)
                jy = rng.uniform(-2.0, 2.0)
                cell_boxes.append(
                    [round(c * cw + jx, 1), round(r * ch + jy, 1),
                     round((c + span) * cw + jx, 1), round((r + 1) * ch + jy, 1)]
                )
                c += span
        regions.append(_region("table", 0.6 + rng.random() * 0.3, tb, cell_boxes=cell_boxes))
        glyphs.extend(_glyphs_for_region(rng, tb))
        y += 240.0

    if rng.random() < 0.4:
        fbox = (100.0, _DEV_H - 70.0, 900.0, _DEV_H - 45.0)
        regions.append(_region("footer", 0.45 + rng.random() * 0.5, fbox))
        glyphs.extend(_glyphs_for_region(rng, fbox, 1))

    # sub-threshold noise region (dropped by the detector's thresholds)
    if rng.random() < 0.5:
        regions.append(_region("seal", 0.1, (1000.0, 1400.0, 1100.0, 1500.0)))

    return {
        "width": _PAGE_W,
        "height": _PAGE_H,
        "glyph_runs": glyphs,
        "truth_regions": regions,
    }


def _make_sdoc_doc(rng: random.Random, n_pages: int) -> tuple[bytes, str]:
    pages = [_make_sdoc_page(rng, p) for p in range(n_pages)]
    payload = make_sdoc({"pages": pages})
    raw_text = "\n".join(
        " ".join(run["text"] for run in page["glyph_runs"]) for page in pages
    )
    return payload, raw_text


def generate_pages(n_docs: int, seed: int = 42) -> pa.Table:
    """Generate the pages table; duplicated urls (~3%) carry an older warc_ts."""
    rng = random.Random(seed)
    urls, tss, htmls, texts, langs = [], [], [], [], []

    def emit(url: str, ts: dt.datetime, html: bytes, text: str, lang: str) -> None:
        urls.append(url)
        tss.append(ts)
        htmls.append(html)
        texts.append(text)
        langs.append(lang)

    for i in range(n_docs):
        r = rng.random()
        if r < 0.80:
            kind = "html"
            html, text = _make_html_doc(rng, i)
        elif r < 0.98:
            kind = "sdoc"
            html, text = _make_sdoc_doc(rng, rng.randint(1, 10))
        else:
            kind = "sdoc"
            html, text = _make_sdoc_doc(rng, rng.randint(100, 400))
        url = f"https://site{i % 97}.example/{kind}/{i:08d}"
        ts = _BASE_TS + dt.timedelta(seconds=rng.randint(0, 10_000_000))
        lang = rng.choice(_LANGS)
        emit(url, ts, html, text, lang)
        if rng.random() < 0.03:
            # older duplicate of the same url with different (stale) payload
            stale_html, stale_text = _make_html_doc(rng, i)
            emit(url, ts - dt.timedelta(seconds=rng.randint(1, 500_000)),
                 stale_html, stale_text, lang)

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def write_pages_parquet(path: str, n_docs: int, seed: int = 42) -> str:
    import pyarrow.parquet as pq

    table = generate_pages(n_docs, seed)
    pq.write_table(table, path)
    return path
