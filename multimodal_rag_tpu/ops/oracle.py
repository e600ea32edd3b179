"""NumPy brute-force oracles for kernel verification (SURVEY.md §4).

Tie-breaking contract everywhere: higher score first; equal scores resolve
to the lower database index (stable, matches the kernels' merge order).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def mips_topk_oracle(
    queries: np.ndarray, database: np.ndarray, k: int,
    valid: np.ndarray | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact top-k maximum-inner-product search.

    queries (B, D), database (N, D), optional valid (N,) bool.
    → (values (B, k) f32, indices (B, k) i64).
    """
    scores = queries.astype(np.float64) @ database.astype(np.float64).T
    if valid is not None:
        scores[:, ~valid.astype(bool)] = -np.inf
    # np.argsort is stable; sorting by (-score) keeps lower index first on ties.
    order = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    vals = np.take_along_axis(scores, order, axis=1)
    return vals.astype(np.float32), order.astype(np.int64)
