"""Table-grid inference from detected cell boxes.

Reference semantics (/root/reference/src/process_table.py):
- grid lines = rounded cell-edge coordinates, deduped, sorted, then lines
  within 2px of the *previous seen* line dropped (chained —
  process_table.py:166-186: ``previous_line`` advances even for dropped
  lines).
- per cell: snap int-truncated min/max to the *nearest* line
  (process_table.py:210-221, ties → smaller index), position =
  min_index + 1 (1-based), span = max_index - min_index.
- cell ``box`` = snapped bbox in table-local px, ``bbox`` = table origin +
  box in page-device px (process_table.py:59-73).
- missing (row, col) grid positions are filled with span-0 placeholders and
  the flat list comes out sorted by (row, col); duplicate positions — later
  cell wins (process_table.py:85-122).
- empty detection → ``{"rows": 0, "columns": 0, "cells": []}``
  (process_table.py:30-35).
"""

from __future__ import annotations


def _create_lines(cell_coords: list, min_index: int, max_index: int) -> list[int]:
    """Rounded, insertion-order-unique edge coordinates
    (/root/reference/src/process_table.py:142-164; Python banker's round)."""
    lines: list[int] = []
    for c in cell_coords:
        lo = round(c[min_index])
        hi = round(c[max_index])
        if lo not in lines:
            lines.append(lo)
        if hi not in lines:
            lines.append(hi)
    return lines


def _clean_lines(lines: list[int]) -> list[int]:
    """Sort then drop lines ≤2px after the previous seen line (chained)."""
    lines = sorted(lines)
    previous = -10
    out: list[int] = []
    for line in lines:
        if line - previous > 2:
            out.append(line)
        previous = line
    return out


def _find_line_index(target: int, lines: list[int]) -> int:
    """Nearest line index; ties → smallest index
    (/root/reference/src/process_table.py:210-221)."""
    best, best_dist = 0, None
    for i, line in enumerate(lines):
        d = abs(line - target)
        if best_dist is None or d < best_dist:
            best, best_dist = i, d
    return best


def _position_span(lo: int, hi: int, lines: list[int]) -> tuple[int, int, int, int]:
    min_index = _find_line_index(lo, lines)
    max_index = _find_line_index(hi, lines)
    return min_index, max_index, min_index + 1, max_index - min_index


def infer_table_grid(cell_coords: list, table_coordinate: list | tuple) -> dict:
    """Cell boxes (table-local device px) + table bbox → grid dict.

    Returns ``{"rows": int, "columns": int, "cells": [...]}`` with cells
    carrying 1-based (row, column), spans, ``box`` (table-local) and
    ``bbox`` (page-device).
    """
    if not cell_coords:
        return {"rows": 0, "columns": 0, "cells": []}

    row_lines = _clean_lines(_create_lines(cell_coords, 1, 3))
    column_lines = _clean_lines(_create_lines(cell_coords, 0, 2))
    number_rows = len(row_lines) - 1
    number_columns = len(column_lines) - 1
    table_min_x = table_coordinate[0]
    table_min_y = table_coordinate[1]

    cells: list[dict] = []
    for c in cell_coords:
        r_lo, r_hi, row, row_span = _position_span(int(c[1]), int(c[3]), row_lines)
        c_lo, c_hi, col, col_span = _position_span(int(c[0]), int(c[2]), column_lines)
        box = [column_lines[c_lo], row_lines[r_lo], column_lines[c_hi], row_lines[r_hi]]
        cells.append(
            {
                "row": row,
                "column": col,
                "row_span": row_span,
                "column_span": col_span,
                "box": box,
                "bbox": [
                    table_min_x + box[0],
                    table_min_y + box[1],
                    table_min_x + box[2],
                    table_min_y + box[3],
                ],
            }
        )

    cells = _fill_missing_cells_and_sort(cells, number_rows, number_columns)
    return {"rows": number_rows, "columns": number_columns, "cells": cells}


def _fill_missing_cells_and_sort(cells: list, number_rows: int, number_columns: int) -> list:
    """Grid scatter: placeholders for empty positions, later duplicates win,
    flattened row-major (/root/reference/src/process_table.py:85-122)."""
    if not cells:
        return []
    grid = [
        [
            {"row": r, "column": c, "row_span": 0, "column_span": 0}
            for c in range(1, number_columns + 1)
        ]
        for r in range(1, number_rows + 1)
    ]
    for cell in cells:
        r = cell["row"] - 1
        c = cell["column"] - 1
        if 0 <= r < number_rows and 0 <= c < number_columns:
            grid[r][c] = cell
    return [cell for row in grid for cell in row]
