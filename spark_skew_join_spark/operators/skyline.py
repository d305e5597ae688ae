"""Skyline (Pareto frontier) computation — two-phase local/global sweep.

A row is on the skyline iff no other row *dominates* it: at least as
good on every criterion and strictly better on one (Börzsönyi, Kossmann
& Stocker, "The Skyline Operator", ICDE 2001). "Cheapest-but-largest"
style multi-criteria shortlists reduce to this.

SQL can only express it as a quadratic ``NOT EXISTS`` self-join, so
this is one of the few operators here that earns its Arrow batches: the
distributed algorithm is the classic two phases

1. **local skylines** — each partition computes its own Pareto set with
   a lexicographic sort + sweep (``mapInPandas``, numpy-vectorized
   dominance checks against the kept set only).  Dominance within a
   partition implies global dominance, so this loses nothing, and on
   real data it collapses partitions to a few survivors (the skyline of
   n random points over d dimensions has expected size O(log^{d-1} n)).
2. **global merge** — the union of local skylines, now tiny, is folded
   onto one partition and swept once more.

Ties on every criterion are mutually non-dominating: duplicate-valued
rows all stay (no strict improvement), matching the SQL definition, so
the result set is unique and partitioning-independent — oracle-EXACT.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _sweep(pdf: pd.DataFrame, cols: list[str], signs: list[float]) -> pd.DataFrame:
    """Pareto set of one pandas batch (all-minimize after sign flip)."""
    if pdf.empty:
        return pdf
    m = pdf[cols].to_numpy(dtype=float) * np.asarray(signs)
    # dominators of a row can only precede it in ascending lex order
    order = np.lexsort(tuple(m[:, d] for d in reversed(range(m.shape[1]))))
    m = m[order]
    kept_rows: list[int] = []
    kept: np.ndarray | None = None
    for i in range(m.shape[0]):
        p = m[i]
        if kept is not None and kept_rows:
            le_all = (kept <= p).all(axis=1)
            lt_any = (kept < p).any(axis=1)
            if (le_all & lt_any).any():
                continue
        kept_rows.append(i)
        kept = m[kept_rows]
    return pdf.iloc[order[kept_rows]]


def skyline(
    df: DataFrame,
    minimize: list[str] | None = None,
    maximize: list[str] | None = None,
) -> DataFrame:
    """Rows not dominated by any other row. All input columns pass
    through; criteria must be numeric and non-null."""
    minimize = list(minimize or [])
    maximize = list(maximize or [])
    cols = minimize + maximize
    if not cols:
        raise ValueError("need at least one minimize/maximize column")
    signs = [1.0] * len(minimize) + [-1.0] * len(maximize)
    schema = df.schema

    def local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _sweep(pdf, cols, signs)

    def merge(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [p for p in batches if not p.empty]
        if parts:
            yield _sweep(pd.concat(parts, ignore_index=True), cols, signs)

    candidates = df.mapInPandas(local, schema)
    return candidates.repartition(1).mapInPandas(merge, schema)
