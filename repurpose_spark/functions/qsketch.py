"""Mergeable quantile sketch (KLL-style) for percentile tiers.

Exact percentiles do NOT re-aggregate: a daily p99 cannot be computed
from hourly p99s, so an exact percentile tier would have to re-read raw
— the same wall the distinct-count tier hit before the HLL sketch
(`operators/rollup.py::rollup_distinct_sketch`).  This module closes
the percentile half of that gap with a Karnin–Lang–Liberty-style
compactor sketch: hourly sketches union into daily sketches losslessly
(merge operates on the retained samples + weights, never the dropped
ones), so coarser tiers never touch raw.  The TimescaleDB continuous-
aggregate pattern for `percentile_agg`, in pure numpy — Spark exposes
`approx_percentile` but not its intermediate state as a column, so the
sketch must be first-class bytes here.

Guarantees: rank error ~O(1/k) (empirically ≤ ~1.3 % at the default
k=256 — test-enforced against exact numpy quantiles, including after
merges and parquet round trips).  Like the HLL tier, estimates are
error-bounded, NOT byte-stable: compaction keeps odd- or even-indexed
samples by a deterministic per-compaction toggle, but partition layout
changes insert order, which changes which samples survive.  Use exact
`percentile_approx`-free full sorts where byte-stable answers are
required and a raw re-read is affordable.

Layout: levels of float64 samples; a sample at level i carries weight
2^i.  Level capacities shrink geometrically (2/3) from the top, per the
KLL paper; compaction sorts a full level and promotes every other
sample to the level above.  Serialization is a flat struct + float64
little-endian block, safe for parquet binary columns.
"""

from __future__ import annotations

import struct

import numpy as np

DEFAULT_K = 256
_CAP_RATIO = 2.0 / 3.0
_MAGIC = b"KLL1"


def _capacity(k: int, depth_from_top: int) -> int:
    return max(8, int(np.ceil(k * _CAP_RATIO**depth_from_top)))


class QuantileSketch:
    __slots__ = ("k", "n", "levels", "_toggle")

    def __init__(self, k: int = DEFAULT_K):
        self.k = int(k)
        self.n = 0
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self._toggle = 0

    # ------------------------------------------------------------ update
    def update(self, values: np.ndarray) -> "QuantileSketch":
        """Batch insert (vectorized — the only hot path).  NaNs are the
        caller's nulls and are dropped here, mirroring COUNT(col)."""
        v = np.asarray(values, dtype=np.float64).ravel()
        if v.size:
            v = v[~np.isnan(v)]
        if not v.size:
            return self
        self.n += int(v.size)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()
        return self

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            # capacities shrink from the top, so they shift as new
            # levels appear — recompute against the live height
            cap = _capacity(self.k, len(self.levels) - 1 - i)
            lvl = self.levels[i]
            if lvl.size <= cap:
                i += 1
                continue
            lvl = np.sort(lvl)
            # keep one parity, promote the other: each survivor's weight
            # doubles, which is exactly "moves up one level"
            off = self._toggle & 1
            self._toggle += 1
            promoted = lvl[off::2]
            self.levels[i] = np.empty(0, dtype=np.float64)
            if i + 1 == len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
            self.levels[i + 1] = np.concatenate(
                [self.levels[i + 1], promoted]
            )
            i += 1

    # ------------------------------------------------------------- merge
    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        """Union: concatenate level-wise, then re-compress.  Associative
        and weight-preserving — the property that makes coarser tiers
        computable from finer ones without raw."""
        if other.n == 0:
            return self
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for i, lvl in enumerate(other.levels):
            if lvl.size:
                self.levels[i] = np.concatenate([self.levels[i], lvl])
        self.n += other.n
        self._compress()
        return self

    # ------------------------------------------------------------ query
    def quantiles(self, qs) -> np.ndarray:
        """Rank-based lower quantiles (quantile_disc semantics): the
        smallest retained sample whose cumulative weight reaches
        ceil(q·n)."""
        if self.n == 0:
            return np.full(len(qs), np.nan)
        vals = np.concatenate(self.levels)
        wts = np.concatenate(
            [
                np.full(lvl.size, 1 << i, dtype=np.int64)
                for i, lvl in enumerate(self.levels)
            ]
        )
        order = np.argsort(vals, kind="stable")
        vals, wts = vals[order], np.cumsum(wts[order])
        total = wts[-1]
        out = np.empty(len(qs), dtype=np.float64)
        for j, q in enumerate(qs):
            target = max(1, int(np.ceil(float(q) * total)))
            out[j] = vals[np.searchsorted(wts, target, side="left")]
        return out

    # ---------------------------------------------------------- serde
    def to_bytes(self) -> bytes:
        head = _MAGIC + struct.pack(
            "<IQI", self.k, self.n, len(self.levels)
        )
        sizes = struct.pack(
            f"<{len(self.levels)}I", *(lvl.size for lvl in self.levels)
        )
        body = b"".join(
            np.ascontiguousarray(lvl, dtype="<f8").tobytes()
            for lvl in self.levels
        )
        return head + sizes + body

    @classmethod
    def from_bytes(cls, buf: bytes) -> "QuantileSketch":
        if buf[:4] != _MAGIC:
            raise ValueError("not a KLL1 sketch blob")
        k, n, nlev = struct.unpack_from("<IQI", buf, 4)
        sizes = struct.unpack_from(f"<{nlev}I", buf, 20)
        sk = cls(k)
        sk.n = n
        off = 20 + 4 * nlev
        levels = []
        for sz in sizes:
            levels.append(
                np.frombuffer(buf, dtype="<f8", count=sz, offset=off).copy()
            )
            off += 8 * sz
        sk.levels = levels or [np.empty(0, dtype=np.float64)]
        return sk

    @property
    def n_retained(self) -> int:
        return int(sum(lvl.size for lvl in self.levels))
