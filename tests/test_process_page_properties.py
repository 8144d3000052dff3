"""Properties of the full per-page kernel over randomized synthetic pages."""

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from action_pdf_accessibility_paddle_docker_ray.corpus import _make_sdoc_page
from action_pdf_accessibility_paddle_docker_ray.functions.template import process_page


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 10_000), st.integers(0, 5))
def test_process_page_invariants(seed, page_index):
    page = _make_sdoc_page(random.Random(seed), page_index)
    result = process_page(page, page_index + 1)

    # deterministic
    assert process_page(page, page_index + 1) == result

    # reading order: elements sorted by (float(bbox[3]) desc, then x asc)
    elements = result["elements"]
    keys = [
        (float(e["bbox"][3]), 1000.0 - float(e["bbox"][0])) for e in elements
    ]
    assert keys == sorted(keys, reverse=True)

    # every formula with custom data got an id and a matching formulas entry
    ids = {f[0] for f in result["formulas"]}
    for e in elements:
        if e.get("tag") == "Formula" and "id" in e:
            assert int(e["id"]) in ids

    # spans reading_order is a contiguous 0..n-1 sequence
    orders = [s["reading_order"] for s in result["spans"]]
    assert orders == list(range(len(orders)))

    # page number flows into every span row
    assert all(s["page_no"] == page_index + 1 for s in result["spans"])

    # text contains no artifact content markers: artifact labels excluded
    assert result["n_regions"] == len(elements)
