"""PDF table detection from positioned text + ruling lines.

The geometry equivalent of the reference's pdfplumber table stage
(``app/utils/parser.py:615-716``), built on the first-party layout
interpreter (:func:`ingest.pdfparse.extract_page_layout`). Two strategies,
mirroring pdfplumber's "lattice"/"text" pair:

* **Lattice** — when a page draws a ruled grid (>= 3 vertical and >= 3
  horizontal rules crossing a common region), cell boundaries come from the
  rules; every span is binned into the enclosing cell.
* **Text alignment** — otherwise, rows are spans clustered by baseline y,
  and a table is a run of >= ``MIN_ROWS`` consecutive rows whose cell
  groups align on shared column x-positions.

Both return tables as ``rows: List[List[str]]`` (top→bottom, left→right),
ready for ``ingest.tables.clean_table`` / ``build_table_obj``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

from multimodal_rag_tpu.ingest.pdfparse import RuleSegment, TextSpan

# Tolerances (PDF points).
Y_TOL = 2.5          # spans within this y-distance share a row
X_CLUSTER_TOL = 6.0  # column starts within this distance align
GAP_MIN = 9.0        # minimum x-gap separating two cells in a row
MIN_ROWS = 3         # minimum rows for a text-aligned table
MIN_COLS = 2
COVERAGE = 0.6       # fraction of rows that must populate a column


def _cluster(values: Sequence[float], tol: float) -> List[float]:
    """1-D agglomerative clustering → sorted cluster centers."""
    out: List[List[float]] = []
    for v in sorted(values):
        if out and v - out[-1][-1] <= tol:
            out[-1].append(v)
        else:
            out.append([v])
    return [sum(c) / len(c) for c in out]


def _rows_of(spans: Sequence[TextSpan]) -> List[List[TextSpan]]:
    """Group spans into baseline rows, top of page first (device y up)."""
    rows: List[Tuple[float, List[TextSpan]]] = []
    for s in sorted(spans, key=lambda s: -s.y):
        if rows and abs(rows[-1][0] - s.y) <= Y_TOL:
            rows[-1][1].append(s)
        else:
            rows.append((s.y, [s]))
    return [sorted(r, key=lambda s: s.x0) for _, r in rows]


def _merge_adjacent(row: List[TextSpan]) -> List[TextSpan]:
    """Merge spans separated by less than a cell gap into one cell span."""
    merged: List[TextSpan] = []
    for s in row:
        if merged and s.x0 - merged[-1].x1 < GAP_MIN:
            prev = merged[-1]
            joiner = "" if s.x0 - prev.x1 < 0.35 * prev.size else " "
            merged[-1] = TextSpan(
                prev.x0, max(prev.x1, s.x1), prev.y, prev.size,
                prev.text + joiner + s.text,
            )
        else:
            merged.append(TextSpan(s.x0, s.x1, s.y, s.size, s.text))
    return merged


# ---------------------------------------------------------------------------
# Lattice strategy
# ---------------------------------------------------------------------------


def _lattice_tables(
    spans: Sequence[TextSpan], rules: Sequence[RuleSegment]
) -> Tuple[List[List[List[str]]], List[Tuple[float, float, float, float]]]:
    """Tables from ruled grids. Returns (tables, bounding boxes)."""
    hrules = [r for r in rules if r.horizontal]
    vrules = [r for r in rules if r.vertical]
    if len(hrules) < 3 or len(vrules) < 3:
        return [], []

    # Grid region: intersection of rule extents. Cluster rule positions.
    ys = _cluster([(r.y0 + r.y1) / 2 for r in hrules], Y_TOL)
    xs = _cluster([(r.x0 + r.x1) / 2 for r in vrules], 2.0)
    if len(ys) < 3 or len(xs) < 3:
        return [], []

    # Keep only rules that actually span the grid (>= 60% of its extent).
    x_lo, x_hi = min(xs), max(xs)
    y_lo, y_hi = min(ys), max(ys)
    ys = [
        y for y in ys
        if any(
            abs((r.y0 + r.y1) / 2 - y) <= Y_TOL
            and (min(r.x1, x_hi) - max(r.x0, x_lo)) >= 0.6 * (x_hi - x_lo)
            for r in hrules
        )
    ]
    xs = [
        x for x in xs
        if any(
            abs((r.x0 + r.x1) / 2 - x) <= 2.0
            and (min(r.y1, y_hi) - max(r.y0, y_lo)) >= 0.6 * (y_hi - y_lo)
            for r in vrules
        )
    ]
    if len(ys) < 3 or len(xs) < 3:
        return [], []

    ys_desc = sorted(ys, reverse=True)  # top row first (y grows upward)
    xs_asc = sorted(xs)
    n_rows, n_cols = len(ys_desc) - 1, len(xs_asc) - 1

    cells: List[List[List[str]]] = [
        [[] for _ in range(n_cols)] for _ in range(n_rows)
    ]
    hit = False
    for s in sorted(spans, key=lambda s: (-s.y, s.x0)):
        cx, cy = (s.x0 + s.x1) / 2, s.y
        if not (x_lo <= cx <= x_hi and y_lo <= cy <= y_hi):
            continue
        ri = next(
            (i for i in range(n_rows) if ys_desc[i] >= cy >= ys_desc[i + 1]),
            None,
        )
        ci = next(
            (j for j in range(n_cols) if xs_asc[j] <= cx <= xs_asc[j + 1]),
            None,
        )
        if ri is not None and ci is not None:
            cells[ri][ci].append(s.text)
            hit = True
    if not hit:
        return [], []
    table = [[" ".join(c).strip() for c in row] for row in cells]
    return [table], [(x_lo, y_lo, x_hi, y_hi)]


# ---------------------------------------------------------------------------
# Text-alignment strategy
# ---------------------------------------------------------------------------


def _text_tables(
    spans: Sequence[TextSpan],
    exclude: Sequence[Tuple[float, float, float, float]],
) -> List[List[List[str]]]:
    def excluded(s: TextSpan) -> bool:
        cx = (s.x0 + s.x1) / 2
        return any(
            x0 - 2 <= cx <= x1 + 2 and y0 - 2 <= s.y <= y1 + 2
            for x0, y0, x1, y1 in exclude
        )

    rows = _rows_of([s for s in spans if not excluded(s)])
    merged_rows = [_merge_adjacent(r) for r in rows]

    tables: List[List[List[str]]] = []
    run: List[List[TextSpan]] = []

    def flush() -> None:
        nonlocal run
        if len(run) >= MIN_ROWS:
            table = _align_columns(run)
            if table is not None:
                tables.append(table)
        run = []

    prev_starts: Optional[List[float]] = None
    for row in merged_rows:
        starts = [c.x0 for c in row]
        if len(row) >= MIN_COLS:
            if prev_starts is not None and run and _compatible(
                prev_starts, starts
            ):
                run.append(row)
            else:
                flush()
                run = [row]
            prev_starts = starts
        else:
            flush()
            prev_starts = None
    flush()
    return tables


def _compatible(a: Sequence[float], b: Sequence[float]) -> bool:
    """Two rows belong to one table if most column starts align."""
    matches = sum(
        1 for x in b if any(abs(x - y) <= X_CLUSTER_TOL for y in a)
    )
    return matches >= max(2, min(len(a), len(b)) - 1)


def _align_columns(run: List[List[TextSpan]]) -> Optional[List[List[str]]]:
    """Map each run row's cells onto global column clusters."""
    col_xs = _cluster(
        [c.x0 for row in run for c in row], X_CLUSTER_TOL
    )
    if len(col_xs) < MIN_COLS:
        return None
    counts = [0] * len(col_xs)
    grid: List[List[str]] = []
    for row in run:
        cells = [""] * len(col_xs)
        for c in row:
            ci = min(
                range(len(col_xs)), key=lambda i: abs(col_xs[i] - c.x0)
            )
            cells[ci] = (cells[ci] + " " + c.text).strip()
            counts[ci] += 1
        grid.append(cells)
    # Require per-column coverage so prose paragraphs don't become tables.
    keep = [i for i, n in enumerate(counts) if n >= COVERAGE * len(run)]
    if len(keep) < MIN_COLS:
        return None
    return [[row[i] for i in keep] for row in grid]


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------


def detect_tables(layout: Dict[str, Any]) -> List[List[List[str]]]:
    """Page layout (from ``extract_page_layout``) → list of tables, each a
    list of rows of cell strings."""
    spans: List[TextSpan] = layout.get("spans", [])
    rules: List[RuleSegment] = layout.get("rules", [])
    if not spans:
        return []
    lattice, boxes = _lattice_tables(spans, rules)
    return lattice + _text_tables(spans, boxes)
