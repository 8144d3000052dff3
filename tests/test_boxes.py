import numpy as np

from action_pdf_accessibility_paddle_docker_ray.functions.boxes import (
    boxes_overlap,
    find_overlapping_indices,
    overlap_pairs,
    resolve_overlaps,
)


def test_touching_edges_count_as_overlap():
    # closed-interval predicate (/root/reference/src/process_bboxes.py:15-20)
    assert boxes_overlap([0, 0, 10, 10], [10, 0, 20, 10])
    assert not boxes_overlap([0, 0, 10, 10], [10.01, 0, 20, 10])


def test_small_mutual_overlap_is_exempt():
    # both overlap fractions < 50% → pair ignored (process_bboxes.py:110-111)
    coords = np.array([[0, 0, 100, 100], [80, 80, 200, 200]], float)
    assert overlap_pairs(coords) == []
    assert resolve_overlaps([0.9, 0.8], coords) == [0, 1]


def test_containment_is_not_exempt():
    # the formula-inside-text exemption is hard-disabled (process_bboxes.py:189-190)
    coords = np.array([[0, 0, 100, 100], [10, 10, 30, 30]], float)
    assert overlap_pairs(coords) == [(0, 1)]
    assert resolve_overlaps([0.9, 0.8], coords) == [0]
    assert resolve_overlaps([0.7, 0.8], coords) == [1]


def test_chain_greedy_resolution():
    # A-B overlap heavily, B-C overlap heavily, A-C disjoint: keep max score,
    # drop its direct neighbours, then keep the rest (process_bboxes.py:335-368)
    coords = np.array(
        [[0, 0, 100, 100], [10, 0, 110, 100], [60, 0, 160, 100]], float
    )
    # overlap fractions: A-B 90%, B-C 50%, A-C 40%/40% (exempt) → chain (0,1),(1,2)
    # pairs: (0,1) and (1,2); scores: b highest → b kept, a & c removed
    assert resolve_overlaps([0.5, 0.9, 0.6], coords) == [1]
    # a highest → a kept, b removed; c not neighbour of a → survives
    assert resolve_overlaps([0.9, 0.5, 0.6], coords) == [0, 2]


def test_score_tie_keeps_lowest_index():
    coords = np.array([[0, 0, 100, 100], [0, 0, 100, 100]], float)
    assert resolve_overlaps([0.7, 0.7], coords) == [0]


def test_survivors_in_original_order():
    coords = np.array(
        [[0, 0, 10, 10], [200, 200, 300, 300], [0, 0, 10, 10]], float
    )
    assert resolve_overlaps([0.5, 0.9, 0.8], coords) == [1, 2]


def test_find_overlapping_indices_raw_predicate():
    coords = np.array([[0, 0, 100, 100], [80, 80, 200, 200], [500, 500, 600, 600]], float)
    # raw predicate ignores the <50% special case (template_json.py:198-217)
    assert find_overlapping_indices(coords, 0) == [1]
    assert find_overlapping_indices(coords, 2) == []
