from action_pdf_accessibility_paddle_docker_ray.functions.table_grid import (
    _clean_lines,
    _find_line_index,
    infer_table_grid,
)


def test_clean_lines_two_px_chained_merge():
    # chained: previous advances even for dropped lines (process_table.py:166-186)
    assert _clean_lines([10, 12, 14, 20]) == [10, 20]
    assert _clean_lines([10, 13, 20]) == [10, 13, 20]


def test_find_line_index_tie_prefers_first():
    assert _find_line_index(15, [10, 20]) == 0


def test_clean_grid():
    cells = [
        [0, 0, 50, 20], [50, 0, 100, 20],
        [0, 20, 50, 40], [50, 20, 100, 40],
    ]
    grid = infer_table_grid(cells, [100.0, 200.0, 200.0, 240.0])
    assert grid["rows"] == 2 and grid["columns"] == 2
    assert len(grid["cells"]) == 4
    c0 = grid["cells"][0]
    assert (c0["row"], c0["column"], c0["row_span"], c0["column_span"]) == (1, 1, 1, 1)
    # bbox = table origin + snapped box (process_table.py:72)
    assert c0["bbox"] == [100.0, 200.0, 150.0, 220.0]


def test_jittered_edges_snap_to_grid():
    cells = [
        [0, 0, 50, 20], [51, 1, 100, 21],   # ±2px jitter on shared edges
        [0, 21, 50, 41], [50, 20, 101, 40],
    ]
    grid = infer_table_grid(cells, [0.0, 0.0, 100.0, 40.0])
    assert grid["rows"] == 2 and grid["columns"] == 2


def test_spans_and_missing_cells():
    # col-span 2 cell on row 1; row 2 has a missing cell at (2,2)
    cells = [
        [0, 0, 100, 20],
        [0, 20, 50, 40],
    ]
    grid = infer_table_grid(cells, [0.0, 0.0, 100.0, 40.0])
    assert grid["rows"] == 2 and grid["columns"] == 2
    flat = grid["cells"]
    assert len(flat) == 4
    assert flat[0]["column_span"] == 2
    placeholder = flat[3]
    assert placeholder == {"row": 2, "column": 2, "row_span": 0, "column_span": 0}
    # flat list sorted by (row, column)
    assert [(c["row"], c["column"]) for c in flat] == [(1, 1), (1, 2), (2, 1), (2, 2)]


def test_empty_cells():
    assert infer_table_grid([], [0, 0, 10, 10]) == {"rows": 0, "columns": 0, "cells": []}
