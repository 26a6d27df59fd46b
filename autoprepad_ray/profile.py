"""Profile job: one streaming pass -> per-column statistics artifact.

This is the engine's "fit phase" — the Ray-Data re-expression of the
reference's fitted-transformer state (Tukey fences TukeyTransformer.py:37-42,
MAD median/mad MedianAbsolutDeviation.py:41-42, imputer medians/modes,
RobustScaler center/scale — all scalars learned over the train frame).

Shape: ``map_batches(partial)`` emits ONE serialized sketch-bundle row per
block (pre-aggregation — nothing row-shaped ever shuffles), a second tiny
``map_batches`` level tree-merges 32 bundles at a time, and the driver
finalizes the handful of survivors into a :class:`TableProfile`.  The
artifact is a few KB of JSON — broadcast to validate tasks exactly like
the reference shares fitted scalars by object reference.
"""

from __future__ import annotations

import json
import pickle
from dataclasses import dataclass, field
from typing import Any, Iterable

import numpy as np
import pyarrow as pa

from .sketches import HyperLogLog, MomentSketch, TDigest, ValueCounts, hash64

POOLED = "__pooled__"  # reference's global-flattened stats (SURVEY §1.1)


def _col_kind(t: pa.DataType) -> str:
    if pa.types.is_floating(t) or pa.types.is_integer(t) or pa.types.is_decimal(t):
        return "numeric"
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return "timestamp"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_boolean(t):
        return "numeric"
    return "other"


@dataclass
class ColumnSketch:
    """Partial (mergeable) state for one column."""

    name: str
    kind: str
    moments: MomentSketch = field(default_factory=MomentSketch)
    values: ValueCounts = field(default_factory=ValueCounts)
    tdigest: TDigest = field(default_factory=TDigest)
    hll: HyperLogLog = field(default_factory=HyperLogLog)

    def _spill_to_sketches(self) -> None:
        """Exactness abandoned: seed t-digest + HLL from the drained
        exact value counts (a weighted t-digest update and a hash pass
        over the DISTINCT values reproduce everything the approximate
        sketches would have seen)."""
        vals, cnts = self.values.drain()
        if len(vals) == 0:
            return
        if self.kind in ("numeric", "timestamp"):
            self.tdigest.update_weighted(
                np.asarray(vals, dtype=np.float64),
                np.asarray(cnts, dtype=np.int64))
        self.hll.add_hashes(hash64(vals))

    def update_array(self, arr: pa.ChunkedArray | pa.Array) -> None:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        nulls = arr.null_count
        if self.kind in ("numeric", "timestamp"):
            np_vals = arr.drop_null().to_numpy(zero_copy_only=False)
            if self.kind == "timestamp":
                np_vals = np_vals.astype("datetime64[us]").astype(np.int64)
            np_vals = np.asarray(np_vals)
            self.moments.update(np_vals, nulls=nulls)
            if not self.values.overflow:
                # exact path: t-digest/HLL stay dormant (lazy) — they are
                # seeded from the exact counts only if exactness is lost
                self.values.update(np_vals)
                if self.values.overflow:
                    self._spill_to_sketches()
            else:
                clean = (np_vals[~np.isnan(np_vals)]
                         if np_vals.dtype.kind == "f" else np_vals)
                self.tdigest.update(clean.astype(np.float64, copy=False))
                if clean.size:
                    self.hll.add_hashes(hash64(clean))
        elif self.kind == "string":
            from .sketches import np_object
            vals = np_object(arr.drop_null())
            self.moments.nulls += nulls
            self.moments.n += len(vals)
            if not self.values.overflow:
                self.values.update(vals)
                if self.values.overflow:
                    self._spill_to_sketches()
            elif len(vals):
                self.hll.add_hashes(hash64(vals))
        else:
            self.moments.nulls += nulls
            self.moments.n += len(arr) - nulls

    def merge(self, o: "ColumnSketch") -> "ColumnSketch":
        self.moments.merge(o.moments)
        if o.values.overflow or self.values.overflow:
            # at least one side is approximate: fold both exact sides
            # into sketches, then merge sketches
            if not self.values.overflow:
                self.values.overflow = True
                self._spill_to_sketches()
            if not o.values.overflow:
                o.values.overflow = True
                o._spill_to_sketches()
            o.values.drain()
            self.values.drain()
            self.values.overflow = True
        else:
            self.values.merge(o.values)
            if self.values.overflow:
                self._spill_to_sketches()
        self.tdigest.merge(o.tdigest)
        self.hll.merge(o.hll)
        return self

    # ---- finalize accessors -------------------------------------------------

    @property
    def count(self) -> int:
        return self.moments.n

    @property
    def null_count(self) -> int:
        return self.moments.nulls + self.moments.nans

    def quantile(self, q: float) -> float:
        """Exact (ValueCounts, numpy-linear semantics) under the distinct
        threshold; t-digest past it — the documented scale contract."""
        if not self.values.overflow:
            return self.values.quantile(q)
        return self.tdigest.quantile(q)

    @property
    def exact_quantiles(self) -> bool:
        return not self.values.overflow

    def distinct(self) -> float:
        if not self.values.overflow:
            return float(self.values.distinct)
        return self.hll.estimate()

    def mode(self) -> tuple[Any, int] | None:
        if self.values.overflow or not self.values.counts:
            return None
        return self.values.mode()

    def to_dict(self) -> dict:
        return {
            "name": self.name, "kind": self.kind,
            "moments": self.moments.to_dict(),
            "values": self.values.to_dict(),
            "tdigest": self.tdigest.to_dict(),
            "hll": self.hll.to_dict(),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "ColumnSketch":
        return cls(
            name=d["name"], kind=d["kind"],
            moments=MomentSketch.from_dict(d["moments"]),
            values=ValueCounts.from_dict(d["values"]),
            tdigest=TDigest.from_dict(d["tdigest"]),
            hll=HyperLogLog.from_dict(d["hll"]),
        )


@dataclass
class TableProfile:
    """Finalized profile artifact: broadcastable, JSON-serializable."""

    columns: dict[str, ColumnSketch]
    n_rows: int = 0
    fingerprint: str = ""

    def __getitem__(self, name: str) -> ColumnSketch:
        return self.columns[name]

    def __contains__(self, name: str) -> bool:
        return name in self.columns

    def to_json(self) -> str:
        return json.dumps({
            "n_rows": self.n_rows, "fingerprint": self.fingerprint,
            "columns": {k: v.to_dict() for k, v in self.columns.items()},
        })

    @classmethod
    def from_json(cls, s: str) -> "TableProfile":
        d = json.loads(s)
        return cls(
            columns={k: ColumnSketch.from_dict(v) for k, v in d["columns"].items()},
            n_rows=d["n_rows"], fingerprint=d["fingerprint"],
        )


# ---------------------------------------------------------------------------
# the job


def _make_partial_fn(columns: list[str] | None, pooled: bool,
                     max_exact: int):
    def partial(batch: pa.Table) -> dict:
        cols = columns if columns is not None else batch.column_names
        sketches: dict[str, ColumnSketch] = {}
        n = batch.num_rows
        for name in cols:
            if name not in batch.column_names:
                continue
            kind = _col_kind(batch.schema.field(name).type)
            cs = ColumnSketch(name=name, kind=kind)
            cs.values.max_items = max_exact
            cs.update_array(batch[name])
            sketches[name] = cs
        if pooled:
            ps = ColumnSketch(name=POOLED, kind="numeric")
            ps.values.max_items = max_exact
            for name, cs in list(sketches.items()):
                if cs.kind == "numeric":
                    ps.update_array(batch[name])
            sketches[POOLED] = ps
        payload = pickle.dumps((n, sketches))
        return pa.table({"payload": pa.array([payload], type=pa.large_binary())})

    return partial


def _merge_bundles(batch: pa.Table) -> pa.Table:
    total = 0
    merged: dict[str, ColumnSketch] = {}
    for payload in batch["payload"].to_pylist():
        n, sketches = pickle.loads(payload)
        total += n
        for name, cs in sketches.items():
            if name in merged:
                merged[name].merge(cs)
            else:
                merged[name] = cs
    out = pickle.dumps((total, merged))
    return pa.table({"payload": pa.array([out], type=pa.large_binary())})


def profile_dataset(ds, columns: list[str] | None = None, *,
                    pooled: bool = False, max_exact: int = 2_000_000,
                    fingerprint: str = "") -> TableProfile:
    """Compute a :class:`TableProfile` in one streaming pass over ``ds``.

    ``pooled=True`` additionally produces the reference's global-flattened
    statistics over all numeric columns (np.quantile with no axis,
    TukeyTransformer.py:37-38) under the ``__pooled__`` key.
    """
    partials = ds.map_batches(
        _make_partial_fn(columns, pooled, max_exact),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    # tree level: merge 32 block-bundles per task before the driver sees them
    combined = partials.map_batches(_merge_bundles, batch_size=32,
                                    batch_format="pyarrow")
    rows = combined.take_all()
    total = 0
    merged: dict[str, ColumnSketch] = {}
    for row in rows:
        n, sketches = pickle.loads(row["payload"])
        total += n
        for name, cs in sketches.items():
            if name in merged:
                merged[name].merge(cs)
            else:
                merged[name] = cs
    return TableProfile(columns=merged, n_rows=total, fingerprint=fingerprint)


def profile_arrays(named_arrays: dict[str, np.ndarray], *, pooled: bool = False,
                   max_exact: int = 2_000_000) -> TableProfile:
    """Single-process profile of in-memory arrays (tests / tiny refs)."""
    merged: dict[str, ColumnSketch] = {}
    n_rows = 0
    pooled_cs = ColumnSketch(name=POOLED, kind="numeric")
    for name, arr in named_arrays.items():
        arr = np.asarray(arr)
        kind = "numeric" if arr.dtype.kind in "ifb" else "string"
        cs = ColumnSketch(name=name, kind=kind)
        cs.values.max_items = max_exact
        cs.update_array(pa.array(arr))
        merged[name] = cs
        n_rows = max(n_rows, len(arr))
        if pooled and kind == "numeric":
            pooled_cs.update_array(pa.array(arr))
    if pooled:
        merged[POOLED] = pooled_cs
    return TableProfile(columns=merged, n_rows=n_rows)
