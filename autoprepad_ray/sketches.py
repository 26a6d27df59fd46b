"""Mergeable sketches (pure numpy) for distributed column profiling.

Every sketch supports ``update(values)`` / ``merge(other)`` / a finalize
accessor, so profiles compose as: per-block partial (inside
``map_batches``) -> tree merge (small second ``map_batches`` level) ->
driver finalize.  Exactness contract:

- :class:`MomentSketch` (count / nulls / nan / sum / sumsq / min / max)
  is exact and associative.
- :class:`ValueCounts` is exact while the merged distinct count stays
  under ``max_items``; past that it flips ``overflow`` and downstream
  consumers must fall back to :class:`TDigest` / :class:`HyperLogLog`
  (the documented 100-TB path; the small-scale/correctness path is
  exact, mirroring the reference's exact numpy statistics, e.g.
  /root/reference/pipelines/preprocessing/statistical/TukeyTransformer.py:37-38).
- :class:`TDigest` quantiles are approximate (merging digest, k1 scale;
  mergeable quantile sketches per "An Experimental Analysis of Quantile
  Sketches over Data Streams", EDBT 2023 — t-digest chosen for tight
  tail quantiles, which is where Tukey fences live).
- :class:`HyperLogLog` distinct counts are approximate (p=14, ~0.8%;
  the standard mergeable distinct-count register sketch).
"""

from __future__ import annotations

import base64
import math
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pandas as pd

# ---------------------------------------------------------------------------
# hashing helpers

_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def np_object(arr) -> np.ndarray:
    """pa.Array/ChunkedArray/array-like -> numpy object array, robustly.

    StringArray.to_numpy(zero_copy_only=False) can fail on large chunks
    ("Wrapping ... failed"); the pandas conversion path is reliable."""
    import pyarrow as _pa

    if isinstance(arr, (_pa.Array, _pa.ChunkedArray)):
        return np.asarray(arr.to_pandas(), dtype=object)
    return np.asarray(arr, dtype=object)


def hash64(values: Any, seed: int = 0) -> np.ndarray:
    """Deterministic vectorized 64-bit hashes of an array-like.

    Uses pandas' C hash (stable across processes — no PYTHONHASHSEED
    dependence), optionally re-mixed with a seed via splitmix64 so
    independent hash families (minhash permutations, HLL, salts) can be
    derived from one base hash.
    """
    h = pd.util.hash_pandas_object(pd.Series(values), index=False).to_numpy()
    if seed:
        h = splitmix64(h ^ np.uint64(seed * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF))
    return h


def splitmix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += np.uint64(0x9E3779B97F4A7C15)
        z = x
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


def popcount64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized popcount for uint64 (numpy<2 has no bitwise_count)."""
    x = np.atleast_1d(np.asarray(x))
    # force C-order: fancy indexing can hand us F-ordered arrays whose
    # last axis is not contiguous, which the uint8 view rejects
    b = np.ascontiguousarray(x, dtype=np.uint64) \
        .view(np.uint8).reshape(*x.shape, 8)
    return _POP8[b].sum(axis=-1).astype(np.int64)


def _bit_length64(z: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 via smear + popcount."""
    z = z.astype(np.uint64, copy=True)
    for s in (1, 2, 4, 8, 16, 32):
        z |= z >> np.uint64(s)
    return popcount64(z)


# ---------------------------------------------------------------------------
# moments


@dataclass
class MomentSketch:
    """Exact count/null/nan/sum/min/max + stable variance — associative.

    Variance uses the parallel Welford merge (n, mean, M2) — the naive
    sum-of-squares sketch cancels catastrophically for data with
    |mean| >> std.  Finalized mean/std(ddof=1) mirror the reference's
    ZTransformerMean.py:37-39 semantics; min/max back the MinMax score
    scaling (runs.py:200-201).
    """

    n: int = 0          # non-null, non-nan observations
    nulls: int = 0      # arrow nulls
    nans: int = 0       # float NaNs
    total: float = 0.0
    mean_: float = 0.0
    m2: float = 0.0
    vmin: float = math.inf
    vmax: float = -math.inf

    def _combine(self, nb: int, mean_b: float, m2_b: float) -> None:
        na = self.n
        n = na + nb
        delta = mean_b - self.mean_
        self.mean_ += delta * nb / n
        self.m2 += m2_b + delta * delta * na * nb / n
        self.n = n

    def update(self, values: np.ndarray, nulls: int = 0) -> None:
        self.nulls += int(nulls)
        if values.size == 0:
            return
        if values.dtype.kind == "f":
            mask = np.isnan(values)
            self.nans += int(mask.sum())
            values = values[~mask]
        if values.size == 0:
            return
        v = values.astype(np.float64, copy=False)
        mb = float(v.mean())
        self.total += float(v.sum())
        self._combine(v.size, mb, float(((v - mb) ** 2).sum()))
        self.vmin = min(self.vmin, float(v.min()))
        self.vmax = max(self.vmax, float(v.max()))

    def merge(self, o: "MomentSketch") -> "MomentSketch":
        self.nulls += o.nulls
        self.nans += o.nans
        self.total += o.total
        if o.n:
            self._combine(o.n, o.mean_, o.m2)
        self.vmin = min(self.vmin, o.vmin)
        self.vmax = max(self.vmax, o.vmax)
        return self

    @property
    def mean(self) -> float:
        return self.total / self.n if self.n else float("nan")

    @property
    def var(self) -> float:
        """Sample variance, ddof=1 (reference ZTransformerMean.py:38)."""
        if self.n < 2:
            return 0.0
        return max(0.0, self.m2 / (self.n - 1))

    @property
    def std(self) -> float:
        return math.sqrt(self.var)

    def to_dict(self) -> dict:
        return {
            "n": self.n, "nulls": self.nulls, "nans": self.nans,
            "total": self.total, "mean_": self.mean_, "m2": self.m2,
            "vmin": self.vmin, "vmax": self.vmax,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "MomentSketch":
        return cls(**d)


# ---------------------------------------------------------------------------
# exact value counts (bounded)


class ValueCounts:
    """Exact value->count map, bounded; ``overflow`` => approximate path.

    Backs exact quantiles (numpy-linear-interpolation semantics, matching
    both np.quantile — reference TukeyTransformer.py:37-38 — and DuckDB
    quantile_cont), exact distinct counts, modes and histograms at
    correctness scale.  ``max_items`` caps driver/shuffle memory; at
    100-TB scale the profile job flips to TDigest/HLL when any block's
    merged map overflows.

    Internally array-backed (sorted values + int64 counts) so update and
    merge are vectorized np.unique folds — no per-value Python loops in
    the profile hot path.
    """

    __slots__ = ("max_items", "overflow", "_vals", "_cnts")

    def __init__(self, max_items: int = 1_000_000):
        self.max_items = max_items
        self.overflow = False
        self._vals: np.ndarray | None = None   # sorted
        self._cnts: np.ndarray | None = None

    @classmethod
    def from_items(cls, values, counts, max_items: int = 1_000_000
                   ) -> "ValueCounts":
        vc = cls(max_items=max_items)
        vc._fold(np.asarray(values), np.asarray(counts, dtype=np.int64))
        return vc

    def _fold(self, vals: np.ndarray, cnts: np.ndarray) -> None:
        if self.overflow or vals.size == 0:
            return
        if self._vals is None:
            uniq, inv = np.unique(vals, return_inverse=True)
            merged = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(merged, inv, cnts)
        else:
            allv = np.concatenate([self._vals, vals])
            allc = np.concatenate([self._cnts, cnts])
            uniq, inv = np.unique(allv, return_inverse=True)
            merged = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(merged, inv, allc)
        self._vals, self._cnts = uniq, merged
        if len(uniq) > self.max_items:
            # keep the merged arrays so the owner can drain() them into
            # an approximate sketch (t-digest / HLL) before they vanish
            self.overflow = True

    def drain(self) -> tuple[np.ndarray, np.ndarray]:
        """Hand over the merged arrays (used to seed the approximate
        sketches when exactness is abandoned) and clear."""
        vals = self._vals if self._vals is not None else np.array([])
        cnts = (self._cnts if self._cnts is not None
                else np.array([], dtype=np.int64))
        self._vals = self._cnts = None
        return vals, cnts

    def update(self, values: np.ndarray) -> None:
        if self.overflow or values.size == 0:
            return
        if values.dtype.kind == "f":
            values = values[~np.isnan(values)]
            if values.size == 0:
                return
        uniq, cnt = np.unique(values, return_counts=True)
        self._fold(uniq, cnt)

    def merge(self, o: "ValueCounts") -> "ValueCounts":
        if o.overflow:
            self.overflow = True
            self._vals = self._cnts = None
        if self.overflow:
            return self
        if o._vals is not None:
            self._fold(o._vals, o._cnts)
        return self

    @property
    def counts(self) -> dict:
        """Dict view (materialized on demand — finalize-time use only)."""
        if self._vals is None:
            return {}
        return dict(zip(self._vals.tolist(), self._cnts.tolist()))

    @property
    def distinct(self) -> int:
        return 0 if self._vals is None else len(self._vals)

    def sorted_arrays(self) -> tuple[np.ndarray, np.ndarray]:
        if self._vals is None:
            return np.array([]), np.array([], dtype=np.int64)
        return self._vals, self._cnts

    def quantile(self, q: float) -> float:
        """quantile_cont / np.quantile(linear) from weighted sorted values."""
        if self.overflow or self._vals is None:
            return float("nan")
        vals, cnts = self._vals, self._cnts
        n = int(cnts.sum())
        if n == 1:
            return float(vals[0])
        # positions of sorted order statistics: value v covers ranks
        # [cum_prev, cum_prev + cnt - 1] (0-based)
        pos = q * (n - 1)
        lo_rank = int(math.floor(pos))
        hi_rank = min(lo_rank + 1, n - 1)
        frac = pos - lo_rank
        cum = np.cumsum(cnts)
        lo_val = float(vals[np.searchsorted(cum, lo_rank, side="right")])
        hi_val = float(vals[np.searchsorted(cum, hi_rank, side="right")])
        return lo_val + (hi_val - lo_val) * frac

    def mode(self) -> tuple[Any, int]:
        """Most frequent value; ties broken by smallest value (deterministic,
        mirrors SQL `ORDER BY n DESC, value LIMIT 1`)."""
        top = int(self._cnts.max())
        cand = self._vals[self._cnts == top]
        return cand.min(), top

    def histogram(self, edges: np.ndarray) -> np.ndarray:
        """Fixed-edge histogram counts (len(edges)-1 bins, right-open last-closed)."""
        vals, cnts = self.sorted_arrays()
        out = np.zeros(len(edges) - 1, dtype=np.int64)
        idx = np.clip(np.searchsorted(edges, vals, side="right") - 1, 0, len(edges) - 2)
        np.add.at(out, idx, cnts)
        return out

    def to_dict(self) -> dict:
        items = ([] if self._vals is None
                 else list(zip(self._vals.tolist(), self._cnts.tolist())))
        return {"max_items": self.max_items, "overflow": self.overflow,
                "counts": items}

    @classmethod
    def from_dict(cls, d: dict) -> "ValueCounts":
        vc = cls(max_items=d["max_items"])
        vc.overflow = d["overflow"]
        if d["counts"]:
            vals = [k for k, _ in d["counts"]]
            cnts = [v for _, v in d["counts"]]
            vc._fold(np.asarray(vals), np.asarray(cnts, dtype=np.int64))
        return vc


# ---------------------------------------------------------------------------
# t-digest (merging digest, k1 scale function)


class TDigest:
    """Approximate quantiles; mergeable; the 100-TB path for fences/medians.

    Merging-digest with the arcsine (k1) scale function — centroids near
    the tails stay small so extreme quantiles (Tukey fences at q25/q75,
    MAD median) remain tight.
    """

    __slots__ = ("compression", "means", "weights", "_buf_m", "_buf_w")

    def __init__(self, compression: int = 200):
        self.compression = compression
        self.means = np.empty(0)
        self.weights = np.empty(0, dtype=np.int64)
        self._buf_m: list = []
        self._buf_w: list = []

    def update(self, values: np.ndarray) -> None:
        if values.size == 0:
            return
        v = values.astype(np.float64, copy=False)
        if v.dtype.kind == "f":
            v = v[~np.isnan(v)]
        if v.size == 0:
            return
        self._buf_m.append(v)
        self._buf_w.append(np.ones(v.size, dtype=np.int64))
        if sum(m.size for m in self._buf_m) > 8 * self.compression:
            self._compress()

    def update_weighted(self, values: np.ndarray, weights: np.ndarray) -> None:
        """Seed from (value, weight) pairs — exact ValueCounts handoff."""
        if values.size == 0:
            return
        self._buf_m.append(values.astype(np.float64, copy=False))
        self._buf_w.append(weights.astype(np.int64, copy=False))
        self._compress()

    def merge(self, o: "TDigest") -> "TDigest":
        o._compress()
        if o.means.size:
            self._buf_m.append(o.means)
            self._buf_w.append(o.weights)
        self._compress()
        return self

    def _k(self, q: np.ndarray | float) -> np.ndarray | float:
        return self.compression * (np.arcsin(2 * np.asarray(q) - 1) / np.pi + 0.5)

    def _compress(self) -> None:
        if not self._buf_m and self.means.size <= self.compression:
            return
        m = np.concatenate([self.means] + self._buf_m) if self._buf_m else self.means
        w = np.concatenate([self.weights] + self._buf_w) if self._buf_w else self.weights
        self._buf_m, self._buf_w = [], []
        if m.size == 0:
            return
        order = np.argsort(m, kind="mergesort")
        m, w = m[order], w[order]
        total = w.sum()
        out_m: list[float] = []
        out_w: list[int] = []
        cur_m, cur_w = m[0], int(w[0])
        cum = 0  # weight strictly before current centroid
        k_lo = self._k(0.0)
        for i in range(1, m.size):
            q_hi = (cum + cur_w + w[i]) / total
            if self._k(q_hi) - k_lo <= 1.0:
                cur_m = (cur_m * cur_w + m[i] * w[i]) / (cur_w + w[i])
                cur_w += int(w[i])
            else:
                out_m.append(float(cur_m))
                out_w.append(cur_w)
                cum += cur_w
                k_lo = self._k(cum / total)
                cur_m, cur_w = m[i], int(w[i])
        out_m.append(float(cur_m))
        out_w.append(cur_w)
        self.means = np.array(out_m)
        self.weights = np.array(out_w, dtype=np.int64)

    def quantile(self, q: float) -> float:
        self._compress()
        if self.means.size == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        w = self.weights.astype(np.float64)
        total = w.sum()
        # centroid "centers" in cumulative-weight space
        centers = np.cumsum(w) - w / 2.0
        target = q * total
        if target <= centers[0]:
            return float(self.means[0])
        if target >= centers[-1]:
            return float(self.means[-1])
        i = np.searchsorted(centers, target) - 1
        t = (target - centers[i]) / (centers[i + 1] - centers[i])
        return float(self.means[i] + t * (self.means[i + 1] - self.means[i]))

    def to_dict(self) -> dict:
        self._compress()
        return {"compression": self.compression,
                "means": self.means.tolist(), "weights": self.weights.tolist()}

    @classmethod
    def from_dict(cls, d: dict) -> "TDigest":
        td = cls(compression=d["compression"])
        td.means = np.array(d["means"])
        td.weights = np.array(d["weights"], dtype=np.int64)
        return td


# ---------------------------------------------------------------------------
# HyperLogLog


class HyperLogLog:
    """Approximate distinct count (mergeable registers); p=14 → ~0.8% err."""

    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 14):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        if h.size == 0:
            return
        h = h.astype(np.uint64, copy=False)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)  # top 64-p bits of the remaining stream
        # rho = leading zeros of `rest` within 64-p bits, + 1
        bl = _bit_length64(rest)
        rho = np.where(rest == 0, 64 - self.p + 1, 64 - bl + 1).astype(np.uint8)
        rho = np.minimum(rho, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)

    def update(self, values: Any, seed: int = 0x51) -> None:
        self.add_hashes(hash64(values, seed=seed))

    def merge(self, o: "HyperLogLog") -> "HyperLogLog":
        np.maximum(self.registers, o.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        raw = alpha * m * m / np.sum(np.exp2(-self.registers.astype(np.float64)))
        zeros = int(np.count_nonzero(self.registers == 0))
        if raw <= 2.5 * m and zeros > 0:
            return m * math.log(m / zeros)  # linear counting
        return float(raw)

    def to_dict(self) -> dict:
        return {"p": self.p,
                "registers": base64.b64encode(self.registers.tobytes()).decode()}

    @classmethod
    def from_dict(cls, d: dict) -> "HyperLogLog":
        h = cls(p=d["p"])
        h.registers = np.frombuffer(
            base64.b64decode(d["registers"]), dtype=np.uint8).copy()
        return h
