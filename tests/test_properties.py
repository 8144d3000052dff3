"""Property-based tests (hypothesis) for the page-local kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from action_pdf_accessibility_paddle_docker_ray.functions.boxes import (
    boxes_overlap,
    overlap_pairs,
    resolve_overlaps,
)
from action_pdf_accessibility_paddle_docker_ray.functions.table_grid import infer_table_grid
from action_pdf_accessibility_paddle_docker_ray.pipelines.dedup_ops import (
    _minhash_params,
    _minhash_signature,
    _shingle_hashes,
)

_box = st.tuples(
    st.floats(0, 900), st.floats(0, 900), st.floats(10, 300), st.floats(10, 300)
).map(lambda t: [t[0], t[1], t[0] + t[2], t[1] + t[3]])

_boxes = st.lists(_box, min_size=0, max_size=12)
_scores = st.floats(0.05, 0.95)


@settings(max_examples=60, deadline=None)
@given(_boxes, st.lists(_scores, min_size=12, max_size=12))
def test_resolution_invariants(boxes, scores):
    scores = scores[: len(boxes)]
    keep = resolve_overlaps(scores, boxes) if boxes else []
    # survivors are unique, in original order, within range
    assert keep == sorted(set(keep))
    assert all(0 <= i < len(boxes) for i in keep)
    # no two survivors remain a *conflicting* pair (non-exempt overlap)
    coords = np.asarray(boxes, float).reshape(-1, 4)
    conflict = set(overlap_pairs(coords))
    for a in keep:
        for b in keep:
            if a < b:
                assert (a, b) not in conflict, (a, b)
    # determinism
    assert keep == resolve_overlaps(scores, boxes)
    # every removed box overlapped something kept or removed (it had a pair)
    removed = set(range(len(boxes))) - set(keep)
    paired = {i for p in conflict for i in p}
    assert removed <= paired


@settings(max_examples=60, deadline=None)
@given(_box, _box)
def test_overlap_predicate_symmetric(a, b):
    assert boxes_overlap(a, b) == boxes_overlap(b, a)


@settings(max_examples=40, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 500), st.integers(0, 500),
              st.integers(5, 120), st.integers(5, 120)),
    min_size=1, max_size=10,
))
def test_table_grid_total_and_sorted(cells):
    cell_boxes = [[x, y, x + w, y + h] for x, y, w, h in cells]
    grid = infer_table_grid(cell_boxes, [0.0, 0.0, 1000.0, 1000.0])
    assert grid["rows"] >= 0 and grid["columns"] >= 0
    flat = grid["cells"]
    if grid["rows"] > 0 and grid["columns"] > 0:
        # exactly rows*cols entries, sorted row-major, 1-based positions
        assert len(flat) == grid["rows"] * grid["columns"]
        keys = [(c["row"], c["column"]) for c in flat]
        assert keys == sorted(keys)
        assert keys[0] == (1, 1)
    # deterministic
    assert infer_table_grid(cell_boxes, [0.0, 0.0, 1000.0, 1000.0]) == grid


@settings(max_examples=40, deadline=None)
@given(st.text(min_size=0, max_size=300))
def test_shingle_hashes_deterministic(text):
    h1 = _shingle_hashes(text)
    h2 = _shingle_hashes(text)
    assert np.array_equal(h1, h2)
    assert len(h1) >= 1


@settings(max_examples=40, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               min_size=0, max_size=300))
def test_shingle_hashes_ascii_case_insensitive(text):
    # ascii only: unicode case-folding is not involutive ('ß'.upper() == 'SS')
    assert np.array_equal(_shingle_hashes(text), _shingle_hashes(text.upper()))


@settings(max_examples=20, deadline=None)
@given(st.text(min_size=30, max_size=200))
def test_minhash_identical_texts_have_identical_signatures(text):
    a, b = _minhash_params(64)
    s1 = _minhash_signature(_shingle_hashes(text), a, b)
    s2 = _minhash_signature(_shingle_hashes(text + ""), a, b)
    assert np.array_equal(s1, s2)
    assert len(s1) == 64
