"""Table formatting helpers (reference parser.py:657-661, 1789-1806)."""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from tabulate import tabulate


def clean_table(rows: List[List[Any]]) -> List[List[str]]:
    """Drop empty rows, stringify + strip cells (reference parser.py:637-649)."""
    cleaned = []
    for row in rows:
        if not row or not any(row):
            continue
        cells = [str(cell).strip() if cell else "" for cell in row]
        if any(cells):
            cleaned.append(cells)
    return cleaned


def to_markdown(headers: List[str], data_rows: List[List[str]]) -> str:
    """GitHub-flavored markdown via tabulate (reference parser.py:657-661)."""
    try:
        return tabulate(data_rows, headers=headers, tablefmt="github")
    except Exception:
        return str([headers] + data_rows)


def simple_table_summary(table_data: List[List[str]], headers: List[str]) -> str:
    """Heuristic summary (reference parser.py:1789-1806): row/col counts +
    first five column names."""
    row_count = len(table_data) - 1 if headers else len(table_data)
    col_count = len(headers) if headers else (
        len(table_data[0]) if table_data else 0
    )
    summary = f"Table: {row_count} rows × {col_count} columns"
    if headers:
        summary += f". Columns: {', '.join(headers[:5])}"
        if len(headers) > 5:
            summary += f" and {len(headers) - 5} more"
    return summary


def build_table_obj(
    table_id: str,
    cleaned: List[List[str]],
    metadata: Dict[str, Any],
) -> Optional[Dict[str, Any]]:
    """Standard table object: id/content/raw_data/summary/metadata
    (reference parser.py:666-685). Returns None for degenerate tables
    (<2 rows, matching the reference's skip)."""
    if not cleaned or len(cleaned) < 2:
        return None
    headers, data_rows = cleaned[0], cleaned[1:]
    meta = dict(metadata)
    meta.update(
        {"row_count": len(data_rows), "col_count": len(headers),
         "columns": headers}
    )
    return {
        "id": table_id,
        "content": to_markdown(headers, data_rows),
        "raw_data": cleaned,
        "summary": simple_table_summary(cleaned, headers),
        "metadata": meta,
    }
