"""WARC source: the wire format web corpora actually arrive in.

Common Crawl ships as WARC/1.0 (ISO 28500) — length-framed records, one
per fetched page — and any engine claiming the web-corpus space needs to
ingest it natively, not just parquet.  This module provides

- ``write_warc`` / ``warc_path_for``: a deterministic WARC rendering of
  the derived pages corpus (one ``.warc`` file per parquet shard, atomic
  publish, cached under /tmp like ``flagship.pages_path_for``), used as
  the test/bench fixture;
- ``read_warc``: the Ray-native reader — ``read_binary_files`` (one read
  task per archive, so a 32-shard corpus parses 32-wide) followed by a
  length-framed record parser in ``map_batches``.  Content-Length framing
  is the only correct way to split WARC: payloads may contain anything,
  including lines that look like record headers.

Scale note: one read task holds one archive in memory.  Real crawls cut
WARCs at ~1 GB precisely so that whole-file tasks stay cheap; at 100 TB
that is ~100k files → ~100k tasks, well within Ray's scheduler envelope.
Records never cross file boundaries in WARC, so the parse is
embarrassingly parallel with zero exchange.
"""

from __future__ import annotations

import hashlib
import os
from typing import Any, Iterator

import pyarrow as pa

_CRLF = b"\r\n"


def _render_record(url: str, ts_iso: str, payload: bytes) -> bytes:
    """One WARC/1.0 response record, Content-Length framed per ISO 28500
    (header block, blank line, payload, two CRLFs)."""
    header = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: response" + _CRLF
        + b"WARC-Target-URI: " + url.encode("utf-8") + _CRLF
        + b"WARC-Date: " + ts_iso.encode("ascii") + _CRLF
        + b"Content-Length: " + str(len(payload)).encode("ascii") + _CRLF
    )
    return header + _CRLF + payload + _CRLF + _CRLF


def write_warc(table: pa.Table, path: str) -> None:
    """Render a pages-shaped Arrow table (url, warc_ts, html) to one WARC
    file.  Row order is preserved — the rendering is deterministic."""
    with open(path, "wb") as f:
        for url, ts, payload in zip(
            table["url"].to_pylist(),
            table["warc_ts"].to_pylist(),
            table["html"].to_pylist(),
        ):
            ts_iso = ts.strftime("%Y-%m-%dT%H:%M:%SZ")
            f.write(_render_record(url, ts_iso, payload))


def warc_path_for(sf_dir: str, **pages_kwargs: Any) -> str:
    """Build (once) the WARC rendering of the flagship pages corpus: one
    ``.warc`` per parquet shard, atomically published so concurrent
    builders race safely.  Scaffolding, not the operator — a real
    deployment reads crawler-produced WARCs."""
    import pyarrow.parquet as pq

    from ..pipelines.flagship import pages_path_for

    pages = pages_path_for(sf_dir, **pages_kwargs)
    tag = hashlib.sha1(pages.encode()).hexdigest()[:12]
    path = f"/tmp/graft_warc_{tag}"
    if not os.path.isdir(path):
        tmp = path + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        for name in sorted(os.listdir(pages)):
            shard = pq.read_table(
                os.path.join(pages, name), columns=["url", "warc_ts", "html"]
            )
            write_warc(shard, os.path.join(tmp, name.replace(".parquet", ".warc")))
        os.replace(tmp, path)
    return path


def write_warc_gz(table: pa.Table, path: str) -> None:
    """Render a pages-shaped table to PER-RECORD GZIP MEMBERS — the real
    Common-Crawl framing (one gzip stream per record, concatenated), which
    is what makes single-record ranged reads possible on .warc.gz files.
    ``gzip.compress(mtime=0)`` keeps the rendering deterministic."""
    import gzip

    with open(path, "wb") as f:
        for url, ts, payload in zip(
            table["url"].to_pylist(),
            table["warc_ts"].to_pylist(),
            table["html"].to_pylist(),
        ):
            ts_iso = ts.strftime("%Y-%m-%dT%H:%M:%SZ")
            f.write(gzip.compress(_render_record(url, ts_iso, payload), mtime=0))


def warc_gz_path_for(sf_dir: str, **pages_kwargs: Any) -> str:
    """Like ``warc_path_for`` but gzip-member framed (.warc.gz per shard)."""
    import pyarrow.parquet as pq

    from ..pipelines.flagship import pages_path_for

    pages = pages_path_for(sf_dir, **pages_kwargs)
    tag = hashlib.sha1((pages + "|gz").encode()).hexdigest()[:12]
    path = f"/tmp/graft_warcgz_{tag}"
    if not os.path.isdir(path):
        tmp = path + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        for name in sorted(os.listdir(pages)):
            shard = pq.read_table(
                os.path.join(pages, name), columns=["url", "warc_ts", "html"]
            )
            write_warc_gz(
                shard, os.path.join(tmp, name.replace(".parquet", ".warc.gz"))
            )
        os.replace(tmp, path)
    return path


def parse_warc_gz_bytes(data: bytes) -> Iterator[dict]:
    """Gzip-member WARC walk: each record is its own gzip stream, so the
    member boundary (found via ``zlib.decompressobj(wbits=31).unused_data``)
    IS the record boundary.  Yields the same dicts as ``parse_warc_bytes``
    with ``offset``/``rec_bytes`` measured in COMPRESSED archive bytes —
    exactly what a ranged fetch of one record needs."""
    import zlib

    pos, n = 0, len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        raw = d.decompress(data[pos:])
        # one member == one record: parse exactly one
        rec = next(parse_warc_bytes(raw))
        end = n - len(d.unused_data)
        rec["offset"] = pos
        rec["rec_bytes"] = end - pos
        yield rec
        pos = end


def _parse_archive(blob: bytes) -> Iterator[dict]:
    """Framing dispatch: per-record gzip members (1f 8b magic) or plain
    length-framed WARC/1.0."""
    if blob[:2] == b"\x1f\x8b":
        return parse_warc_gz_bytes(blob)
    return parse_warc_bytes(blob)


def parse_warc_bytes(data: bytes) -> Iterator[dict]:
    """Length-framed WARC record walk.  Yields dicts of the header fields
    this engine consumes plus the raw payload bytes.

    The loop advances by Content-Length — header-looking bytes inside a
    payload can never desync the parse (the failure mode of naive
    split-on-blank-line readers)."""
    pos, n = 0, len(data)
    while pos < n:
        head_end = data.index(b"\r\n\r\n", pos)
        headers = {}
        for line in data[pos:head_end].split(_CRLF)[1:]:  # [0] is the version
            k, _, v = line.partition(b": ")
            headers[k.decode("ascii")] = v.decode("utf-8")
        length = int(headers["Content-Length"])
        payload = data[head_end + 4 : head_end + 4 + length]
        end = head_end + 4 + length + 4  # payload + record-ending CRLFCRLF
        yield {
            "url": headers["WARC-Target-URI"],
            "warc_date": headers["WARC-Date"],
            "payload": payload,
            "offset": pos,  # byte position of the record in the archive
            "rec_bytes": end - pos,
        }
        pos = end


def read_warc(path: str):
    """Ray-native WARC reader: one read task per archive file, then the
    record parser as a batch transform.  Output rows:
    (url, warc_date, n_bytes, payload_md5) — the parse proof without
    shipping payload bytes past the stage that needs them; callers that
    want the payload column use ``parse_warc_bytes`` in their own stage.
    """
    import ray.data

    def parse(batch: pa.Table) -> pa.Table:
        urls, dates, sizes, digests = [], [], [], []
        for blob in batch["bytes"].to_pylist():
            for rec in _parse_archive(blob):
                urls.append(rec["url"])
                dates.append(rec["warc_date"])
                sizes.append(len(rec["payload"]))
                digests.append(hashlib.md5(rec["payload"]).hexdigest())
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_date": pa.array(dates, pa.string()),
                "n_bytes": pa.array(sizes, pa.int64()),
                "payload_md5": pa.array(digests, pa.string()),
            }
        )

    ds = ray.data.read_binary_files(path, file_extensions=["warc", "gz"])
    return ds.map_batches(parse, batch_format="pyarrow")


def read_warc_index(path: str):
    """Build the CDX-style random-access index of a WARC corpus: one row
    per record with (url, warc_file, offset, rec_bytes, n_bytes).  A
    fetcher can then serve any url with a single ranged read — the
    standard Common-Crawl access pattern (their cluster.idx/CDXJ files).
    Same zero-exchange topology as ``read_warc``; the parser already
    walks Content-Length frames, so offsets are free."""
    import ray.data

    def index(batch: pa.Table) -> pa.Table:
        urls, files, offs, recs, sizes = [], [], [], [], []
        for blob, p in zip(batch["bytes"].to_pylist(), batch["path"].to_pylist()):
            base = os.path.basename(p)
            for rec in _parse_archive(blob):
                urls.append(rec["url"])
                files.append(base)
                offs.append(rec["offset"])
                recs.append(rec["rec_bytes"])
                sizes.append(len(rec["payload"]))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_file": pa.array(files, pa.string()),
                "offset": pa.array(offs, pa.int64()),
                "rec_bytes": pa.array(recs, pa.int64()),
                "n_bytes": pa.array(sizes, pa.int64()),
            }
        )

    ds = ray.data.read_binary_files(
        path, file_extensions=["warc", "gz"], include_paths=True
    )
    return ds.map_batches(index, batch_format="pyarrow")
