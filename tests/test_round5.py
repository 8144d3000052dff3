"""Round-5 tests.

Resumable sinks for the remaining minhash-family ops (VERDICT r4 task 5):
``dedup_keep_best`` and ``incremental_fuzzy_dedup`` get the same phase-A
global-state checkpoint + per-bucket atomic-publish contract as
``dedup_corpus``, with kill-after-k restart tests proving the resumed
union is bit-identical to the direct op.
"""

import glob

import pandas as pd
import pyarrow.dataset as pads


def _read_buckets(out_dir: str) -> pd.DataFrame:
    dirs = sorted(glob.glob(f"{out_dir}/bucket-*"))
    frames = [pads.dataset(d).to_table().to_pandas() for d in dirs]
    return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()


def test_dedup_keep_best_resumable_kill_restart(ray_session, tmp_path):
    """Kill after 3 of 8 buckets, restart: the drop-table checkpoint is
    reused, only the remaining buckets run, and the union equals the
    direct op with no duplicate or missing rows."""
    from action_pdf_accessibility_paddle_docker_ray.pipelines.dedup_ops import (
        dedup_keep_best,
    )
    from action_pdf_accessibility_paddle_docker_ray.state.op_resume import (
        run_dedup_keep_best_resumable,
    )

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "kb")
    r1 = run_dedup_keep_best_resumable(sf, out, n_buckets=8, stop_after_buckets=3)
    assert r1["buckets_run"] == 3 and not r1["state_reused"]
    r2 = run_dedup_keep_best_resumable(sf, out, n_buckets=8)
    assert r2["state_reused"] and r2["buckets_skipped"] == 3
    assert r2["buckets_run"] == 5

    got = _read_buckets(out).sort_values("doc_id").reset_index(drop=True)
    want = (
        dedup_keep_best(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert got["doc_id"].is_unique

    r3 = run_dedup_keep_best_resumable(sf, out, n_buckets=8)
    assert r3["buckets_skipped"] == 8 and r3["buckets_run"] == 0


def test_incremental_fuzzy_dedup_resumable_kill_restart(ray_session, tmp_path):
    """Same contract for the incremental op; the checkpoint additionally
    carries the id-median split scalar, so the restarted phase B never
    recomputes lo/hi (a changed corpus invalidates via the fingerprint)."""
    from action_pdf_accessibility_paddle_docker_ray.pipelines.dedup_ops import (
        incremental_fuzzy_dedup,
    )
    from action_pdf_accessibility_paddle_docker_ray.state.op_resume import (
        run_incremental_fuzzy_dedup_resumable,
    )

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "ifd")
    r1 = run_incremental_fuzzy_dedup_resumable(
        sf, out, n_buckets=8, stop_after_buckets=2
    )
    assert r1["buckets_run"] == 2 and not r1["state_reused"]
    r2 = run_incremental_fuzzy_dedup_resumable(sf, out, n_buckets=8)
    assert r2["state_reused"] and r2["buckets_skipped"] == 2
    assert r2["buckets_run"] == 6

    got = _read_buckets(out).sort_values("doc_id").reset_index(drop=True)
    want = (
        incremental_fuzzy_dedup(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert got["doc_id"].is_unique

    r3 = run_incremental_fuzzy_dedup_resumable(sf, out, n_buckets=8)
    assert r3["buckets_skipped"] == 8 and r3["buckets_run"] == 0
