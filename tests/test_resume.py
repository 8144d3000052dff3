"""Resumability: kill after chunk k, restart, no dup/missing urls
(SURVEY.md §5c)."""

import os

import pyarrow.dataset as pads
import pyarrow.parquet as pq

from action_pdf_accessibility_paddle_docker_ray.corpus import generate_pages
from action_pdf_accessibility_paddle_docker_ray.oracle import oracle_extract
from action_pdf_accessibility_paddle_docker_ray.state.manifest import (
    load_manifest,
    metrics_report,
    run_resumable,
)


def _make_sharded_corpus(tmp_path, n_docs=60, n_files=6):
    table = generate_pages(n_docs, seed=42)
    src = tmp_path / "pages"
    src.mkdir()
    n = table.num_rows
    for i in range(n_files):
        idx = list(range(i, n, n_files))
        pq.write_table(table.take(idx), str(src / f"part-{i:05d}.parquet"))
    return str(src), table


def test_crash_and_resume_no_dup_no_missing(ray_session, tmp_path):
    src, table = _make_sharded_corpus(tmp_path)
    out = str(tmp_path / "out")

    # "crash" after the first chunk (2 files per chunk)
    first = run_resumable(src, out, chunk_files=2, stop_after_chunks=1)
    assert first["chunks_run"] == 1
    partial = load_manifest(out)
    assert len(partial) == 2

    committed_mtimes = {
        k: os.path.getmtime(os.path.join(out, "_manifest", f"{k}.json"))
        for k in partial
    }

    # restart: completes the rest, does not redo committed shards
    second = run_resumable(src, out, chunk_files=2)
    assert second["shards_skipped"] == 2
    assert len(load_manifest(out)) == 6
    for k, mtime in committed_mtimes.items():
        assert os.path.getmtime(os.path.join(out, "_manifest", f"{k}.json")) == mtime

    # final output: exactly the oracle's url set, no dups, texts match
    import glob

    part_files = sorted(glob.glob(os.path.join(out, "chunk-*", "**", "*.parquet"),
                                  recursive=True))
    rows = pads.dataset(part_files).to_table(columns=["url", "text"]).to_pylist()
    golden = {d["url"]: d["text"] for d in oracle_extract(table)}
    urls = [r["url"] for r in rows]
    assert len(urls) == len(set(urls)), "duplicate urls after resume"
    assert set(urls) == set(golden)
    for r in rows:
        assert r["text"] == golden[r["url"]]


def test_changed_shard_is_reprocessed(ray_session, tmp_path):
    src, _ = _make_sharded_corpus(tmp_path, n_docs=30, n_files=3)
    out = str(tmp_path / "out")
    run_resumable(src, out, chunk_files=3)
    assert run_resumable(src, out, chunk_files=3)["shards_skipped"] == 3

    # mutate one shard → fingerprint changes → only that shard reruns
    victim = os.path.join(src, "part-00001.parquet")
    t = pq.read_table(victim)
    pq.write_table(t.slice(0, t.num_rows - 1), victim)
    third = run_resumable(src, out, chunk_files=3)
    assert third["shards_skipped"] == 2
    assert third["chunks_run"] == 1


def test_metrics_report(ray_session, tmp_path):
    src, _ = _make_sharded_corpus(tmp_path, n_docs=30, n_files=3)
    out = str(tmp_path / "out")
    run_resumable(src, out, chunk_files=2)
    report = metrics_report(out)
    assert report["shards"] == 3
    assert report["docs"] > 0
    assert report["docs_per_sec"] is not None
    assert report["input_bytes"] > 0


def test_output_report(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from action_pdf_accessibility_paddle_docker_ray.corpus import generate_pages
    from action_pdf_accessibility_paddle_docker_ray.pipelines.extract import extract_pipeline
    from action_pdf_accessibility_paddle_docker_ray.pipelines.report import output_report

    path = str(tmp_path / "p.parquet")
    pq.write_table(generate_pages(50, seed=42), path)
    docs = extract_pipeline(path, concurrency=(1, 2))
    rep = output_report(docs)
    assert rep["docs"].sum() == 50
    assert rep["errors"].sum() == 0
    assert (rep["pages"] >= rep["docs"]).all()
    # heavy size buckets really contain multi-page docs
    assert rep.loc[rep["size_bucket"].idxmax(), "max_pages"] > 50
