"""Overlap resolution over detected layout boxes (the reference's flagship dedup).

Reference semantics (/root/reference/src/process_bboxes.py:23-389):

1. A pair of boxes "overlaps" when their closed rectangles intersect —
   touching edges count (predicate at process_bboxes.py:1-20).
2. "Special case" pairs are ignored (treated as non-overlapping): both
   mutual overlap fractions < 50% of each box's own area
   (process_bboxes.py:107-119).  The formula-inside-text containment
   exemption is hard-disabled in the reference via an early ``return
   False`` (process_bboxes.py:189-190, TODO PVQ-4049), so containment
   pairs are NOT exempt.
3. Overlapping boxes form connected components over the pair graph
   (process_bboxes.py:225-282).
4. Per component, greedily: keep the max-score member, remove its
   *direct* neighbours, recurse on the remainder
   (process_bboxes.py:335-368).  Ties on score resolve to the
   smallest box index (the reference iterates a CPython set of small
   ints, which yields ascending order for the index ranges involved;
   we make that a contract).
5. Surviving boxes are emitted in their original order
   (process_bboxes.py:52-57).

This implementation is vectorized (numpy pairwise interval tests) and
page-local — it runs inside ``map_batches`` with no shuffle.
"""

from __future__ import annotations

import numpy as np


def boxes_overlap(c1, c2) -> bool:
    """Closed-rectangle intersection (touching counts) —
    /root/reference/src/process_bboxes.py:1-20."""
    return not (c1[2] < c2[0] or c1[0] > c2[2] or c1[3] < c2[1] or c1[1] > c2[3])


def overlap_pairs(coords: np.ndarray) -> list[tuple[int, int]]:
    """All (i, j), i<j, overlapping pairs minus the <50%/<50% special case.

    ``coords``: float array [n, 4] of (x0, y0, x1, y1).
    """
    n = len(coords)
    if n < 2:
        return []
    x0, y0, x1, y1 = coords[:, 0], coords[:, 1], coords[:, 2], coords[:, 3]
    # pairwise closed-interval intersection (touching counts)
    inter = ~(
        (x1[:, None] < x0[None, :])
        | (x0[:, None] > x1[None, :])
        | (y1[:, None] < y0[None, :])
        | (y0[:, None] > y1[None, :])
    )
    # overlap fractions (percent of own area), process_bboxes.py:121-176
    ix = np.minimum(x1[:, None], x1[None, :]) - np.maximum(x0[:, None], x0[None, :])
    iy = np.minimum(y1[:, None], y1[None, :]) - np.maximum(y0[:, None], y0[None, :])
    inter_area = np.maximum(ix, 0.0) * np.maximum(iy, 0.0)
    area = np.maximum(x1 - x0, 0.0) * np.maximum(y1 - y0, 0.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        pct_own = np.where(area[:, None] > 0, inter_area / area[:, None] * 100.0, 0.0)
    # special case: both fractions < 50 → ignore the pair
    special = (pct_own < 50.0) & (pct_own.T < 50.0)
    keep = inter & ~special
    iu, ju = np.triu_indices(n, k=1)
    mask = keep[iu, ju]
    return list(zip(iu[mask].tolist(), ju[mask].tolist()))


def _connected_components(n: int, pairs: list[tuple[int, int]]) -> list[list[int]]:
    """Union-find components over boxes that appear in at least one pair."""
    parent = list(range(n))

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i, j in pairs:
        ri, rj = find(i), find(j)
        if ri != rj:
            # smaller root wins → deterministic representative
            if rj < ri:
                ri, rj = rj, ri
            parent[rj] = ri

    members: dict[int, list[int]] = {}
    involved = {i for p in pairs for i in p}
    for i in sorted(involved):
        members.setdefault(find(i), []).append(i)
    return [members[k] for k in sorted(members)]


def resolve_overlaps(scores, coords) -> list[int]:
    """Indices of surviving boxes, in original order.

    ``scores``: sequence of floats; ``coords``: [n, 4] array-like.
    """
    coords = np.asarray(coords, dtype=np.float64).reshape(-1, 4)
    n = len(coords)
    pairs = overlap_pairs(coords)
    if not pairs:
        return list(range(n))
    pair_set = set(pairs)
    removed: set[int] = set()
    for component in _connected_components(n, pairs):
        group = sorted(component)
        while group:
            # max score, ties → smallest index (ascending scan keeps first max)
            best = max(group, key=lambda i: float(scores[i]))
            nxt = []
            for member in group:
                if member == best:
                    continue
                a, b = (best, member) if best < member else (member, best)
                if (a, b) in pair_set:
                    removed.add(member)
                else:
                    nxt.append(member)
            group = nxt
    return [i for i in range(n) if i not in removed]


def find_overlapping_indices(coords: np.ndarray, idx: int) -> list[int]:
    """Indices of boxes overlapping box ``idx`` (raw predicate, no special case).

    Mirrors ``TemplateJsonCreator._find_overlaps``
    (/root/reference/src/template_json.py:198-217), used for
    formula-inside-text nesting.
    """
    out = []
    for j in range(len(coords)):
        if j == idx:
            continue
        if boxes_overlap(coords[idx], coords[j]):
            out.append(j)
    return out
