"""Dynamic-time-warping template matching over tier series.

The similarity family covers embeddings (ANN, operators/similarity.py)
and documents (MinHash/SimHash/edit tiers, operators/dedup.py); this
adds the classic SERIES shape: score every per-key series against a
small set of reference patterns under time warping — "find the keys
whose traffic looks like this incident signature", where Euclidean
distance fails because the pattern arrives stretched or shifted
(reference analog: repurpose hands per-cell time-sorted series to
user-supplied resample reductions, src/repurpose/img2ts.py:652-668 —
DTW-to-template is exactly such an order-aware per-series reduction).

Scale design (the 100 TB story):

* references are PATTERNS — short (≲ a few hundred points) and few;
  they collect to the driver once and broadcast inside the Arrow batch
  closure, the same bounded-collect class as the IVF training sample
  (operators/similarity.py).
* series are TIER series (hourly/daily rollups — bounded per key by
  construction, PLANS.md partition math), never raw points: one hash
  exchange on the keys, one Arrow batch per key via ``applyInPandas``.
* the DP kernel is the ANTI-DIAGONAL formulation: cells on one
  anti-diagonal depend only on the previous two, so the whole diagonal
  updates as one numpy vector op — O(n+m) Python iterations instead of
  O(n·m) loop cells; the cost matrix is a single vectorized outer
  |x−y| (O(n·m) doubles, bounded because m is a pattern length).
* ``band`` (Sakoe-Chiba) masks |i−j| > band to +inf — the standard
  accuracy/latency knob; ``None`` runs unconstrained.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dtw_kernel(
    x: np.ndarray, y: np.ndarray, band: int | None = None
) -> float:
    """Banded DTW distance (|x−y| step cost, symmetric steps) via the
    anti-diagonal vectorized DP.  Returns the min warping-path cost;
    +inf when the band forbids every path (|len(x)−len(y)| > band)."""
    n, m = len(x), len(y)
    if n == 0 or m == 0:
        return float("inf")
    if band is not None and abs(n - m) > band:
        return float("inf")
    cost = np.abs(np.subtract.outer(x, y))
    if band is not None:
        i = np.arange(n)[:, None]
        j = np.arange(m)[None, :]
        cost = np.where(np.abs(i - j) <= band, cost, np.inf)
    # D over anti-diagonals: diag d holds cells (i, d-i); prev / prev2
    # supply D[i-1, j] & D[i, j-1] / D[i-1, j-1] as shifted slices
    prev2: np.ndarray | None = None
    prev = np.array([cost[0, 0]])
    for d in range(1, n + m - 1):
        lo = max(0, d - m + 1)
        hi = min(n - 1, d)  # i runs lo..hi on this diagonal
        ln = hi - lo + 1
        best = np.full(ln, np.inf)
        plo = max(0, (d - 1) - m + 1)
        # D[i-1, j] lives on diag d-1 at offset i-1-plo (valid i-1 >= 0)
        up = np.full(ln, np.inf)
        src = np.arange(lo, hi + 1) - 1 - plo
        ok = (np.arange(lo, hi + 1) - 1 >= 0) & (src >= 0) & (src < len(prev))
        up[ok] = prev[src[ok]]
        # D[i, j-1] on diag d-1 at offset i-plo (valid j-1 = d-1-i >= 0)
        left = np.full(ln, np.inf)
        src = np.arange(lo, hi + 1) - plo
        ok = (d - 1 - np.arange(lo, hi + 1) >= 0) & (src >= 0) & (
            src < len(prev)
        )
        left[ok] = prev[src[ok]]
        best = np.minimum(up, left)
        if prev2 is not None:
            p2lo = max(0, (d - 2) - m + 1)
            diag = np.full(ln, np.inf)
            src = np.arange(lo, hi + 1) - 1 - p2lo
            ok = (
                (np.arange(lo, hi + 1) - 1 >= 0)
                & (d - 2 - (np.arange(lo, hi + 1) - 1) >= 0)
                & (src >= 0)
                & (src < len(prev2))
            )
            diag[ok] = prev2[src[ok]]
            best = np.minimum(best, diag)
        cur = cost[np.arange(lo, hi + 1), d - np.arange(lo, hi + 1)] + best
        prev2, prev = prev, cur
    return float(prev[-1])


def _znorm(a: np.ndarray) -> np.ndarray:
    s = a.std()
    return (a - a.mean()) / s if s > 0 else a - a.mean()


def dtw_to_references(
    series: DataFrame,
    refs: DataFrame,
    keys: list | tuple = ("event_type",),
    ts_col: str = "ts",
    value_col: str = "value",
    ref_id_col: str = "ref_id",
    ref_seq_col: str = "pattern",
    band: int | None = None,
    znorm: bool = False,
) -> DataFrame:
    """Score every per-``keys`` series against every reference pattern:
    one output row (keys…, ref_id, n_points, dtw_dist) per pair.
    ``znorm=True`` z-normalizes series AND patterns first (standard for
    shape matching — match the shape, not the level).  Infeasible pairs
    under the band (length gap > band) return NULL dtw_dist."""
    keys = list(keys)
    patterns = [
        (r[ref_id_col], np.asarray(r[ref_seq_col], dtype="float64"))
        for r in refs.select(ref_id_col, ref_seq_col).collect()
    ]
    if not patterns:
        raise ValueError("refs is empty")
    if znorm:
        patterns = [(rid, _znorm(p)) for rid, p in patterns]

    out_fields = keys + ["ref_id", "n_points", "dtw_dist"]
    key_schema = series.select(*keys).schema
    ref_id_type = refs.schema[ref_id_col].dataType.simpleString()
    schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in key_schema)
        + f", ref_id {ref_id_type}, n_points long, dtw_dist double"
    )

    def _score(pdf):
        import pandas as pd

        pdf = pdf.sort_values(ts_col, kind="mergesort")
        x = pdf[value_col].to_numpy(dtype="float64")
        if znorm:
            x = _znorm(x)
        krow = [pdf.iloc[0][k] for k in keys]
        rows = []
        for rid, pat in patterns:
            d = dtw_kernel(x, pat, band=band)
            rows.append(
                krow + [rid, len(x), None if not np.isfinite(d) else d]
            )
        return pd.DataFrame(rows, columns=out_fields)

    return (
        series.select(*keys, ts_col, value_col)
        .groupBy(*keys)
        .applyInPandas(_score, schema)
    )
