"""Distributed Bloom-filter build + broadcast probe.

The scale story: ``stages/join.semi_join`` broadcasts the right side's
EXACT distinct-key array, which is perfect until the key set outgrows
the object store (its ``max_broadcast_keys`` bail-out).  A Bloom filter
at ~12 bits/key is ~40x smaller than raw int64 keys, so at 100-TB scale
it is the prefilter that lets the probe side drop the overwhelming
majority of rows BEFORE any exchange — the surviving sliver is then
verified exactly (broadcast keys when they fit, a bucketed shuffle join
otherwise).  Bloom filters have false positives but never false
negatives, so prefilter + exact verify is lossless.

No reference counterpart (the reference joins only index-aligned
labels, /root/reference/pipelines/experiment/experiment.py:125); this
is a standard large-pipeline building block (Bloom 1970; Broder &
Mitzenmacher 2004 survey).

Build shape: one pass over the key stream — each block sets its keys'
bits into a PRIVATE bitmap and emits it as one pickled payload row
(the near_dup census pattern: never per-key Python rows), a 32-way
merge level ORs 32 block partials per task, the driver ORs the
O(blocks/32) survivors.  Probe shape: the (bits, m, k) tuple rides the
object store once via ``ray.put``; each probe block tests all k
positions vectorized (word-index gather + bit masks), no Python loop
over rows.

Null semantics match SQL ``IN``: a NULL key is never a member — build
drops nulls, probe reports them non-member.  Integer keys always hash
as int64 regardless of the width (or nullability) of the source column
(pandas' hash is dtype-sensitive — the repo hash-dtype lesson — so an
int32 probe must hash like the int64 build, and a nullable int column
must not silently hash as float64).
"""

from __future__ import annotations

import pickle

import numpy as np
import pyarrow as pa

from ..sketches import hash64, splitmix64

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _arrow_keys(arr) -> tuple[np.ndarray, np.ndarray | None]:
    """Arrow array/ChunkedArray -> (numpy keys with nulls removed,
    valid bool mask or None if no nulls).  Integer columns come back
    int64 even when nullable (to_numpy on a nullable int column would
    yield float64 + NaN — which hashes differently and would break the
    no-false-negative contract)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    valid = None
    if arr.null_count:
        valid = np.asarray(arr.is_valid())
        arr = arr.drop_null()
    keys = arr.to_numpy(zero_copy_only=False)
    return keys, valid


def _positions(keys, m_bits: int, k: int) -> np.ndarray:
    """(n, k) uint64 bit positions via double hashing (Kirsch &
    Mitzenmacher 2006: h1 + i*h2 preserves the asymptotic FP rate with
    two hash evaluations).  ``hash64`` is the single shared base hash,
    so build and probe can never disagree on a key's positions."""
    keys = np.asarray(keys)
    if keys.dtype.kind in "iu" and keys.dtype != np.int64:
        # pandas' hash is dtype-sensitive (repo hash-dtype lesson):
        # an int32 probe side must hash like the int64 build side.
        keys = keys.astype(np.int64)
    base = hash64(keys)
    h1 = splitmix64(base)
    h2 = splitmix64(base ^ _GOLDEN) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    with np.errstate(over="ignore"):
        return (h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)


def _set_bits(words: np.ndarray, pos: np.ndarray) -> None:
    np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                     np.uint64(1) << (pos & np.uint64(63)))


def _test_bits(words: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Boolean (n,) mask: every one of the k positions set."""
    sel = words[(pos >> np.uint64(6)).astype(np.int64)]
    hit = (sel >> (pos & np.uint64(63))) & np.uint64(1)
    return hit.all(axis=1)


def _build(ds, col: str, m_bits: int, k: int, with_keys: bool):
    """Shared build pass: each block's payload carries its private
    bitmap (+ its unique keys when ``with_keys``); the merge ORs /
    uniques respectively, the driver folds the survivors."""
    n_words = (m_bits + 63) // 64

    def part(t: pa.Table) -> pa.Table:
        words = np.zeros(n_words, dtype=np.uint64)
        keys, _ = _arrow_keys(t[col])
        if len(keys):
            _set_bits(words, _positions(keys, m_bits, k))
        payload = (words, np.unique(keys)) if with_keys else (words,)
        return pa.table({"payload": pa.array([pickle.dumps(payload)],
                                             type=pa.large_binary())})

    def merge(t: pa.Table) -> pa.Table:
        parts = [pickle.loads(p) for p in t["payload"].to_pylist()]
        if not parts:
            return pa.table({"payload": pa.array(
                [], type=pa.large_binary())})
        acc = parts[0][0].copy()
        for p in parts[1:]:
            np.bitwise_or(acc, p[0], out=acc)
        out = (acc, np.unique(np.concatenate([p[1] for p in parts]))) \
            if with_keys else (acc,)
        return pa.table({"payload": pa.array([pickle.dumps(out)],
                                             type=pa.large_binary())})

    rows = (ds.map_batches(part, batch_format="pyarrow",
                           zero_copy_batch=True)
              .map_batches(merge, batch_size=32, batch_format="pyarrow")
              .take_all())
    acc = np.zeros(n_words, dtype=np.uint64)
    key_parts = []
    for r in rows:
        p = pickle.loads(r["payload"])
        np.bitwise_or(acc, p[0], out=acc)
        if with_keys:
            key_parts.append(p[1])
    bloom = {"bits": acc, "m": m_bits, "k": k}
    if not with_keys:
        return bloom
    keys = np.unique(np.concatenate(key_parts)) if key_parts else \
        np.empty(0, dtype=np.int64)
    return bloom, keys


def build_bloom(ds, col: str, *, m_bits: int, k: int = 7) -> dict:
    """One-pass distributed build over ``ds[col]``; returns
    ``{"bits": uint64 words, "m": m_bits, "k": k}`` ready for
    ``ray.put``.  Size ``m_bits`` ~ 12 bits per expected distinct key
    for ~1% FP at k=7."""
    return _build(ds, col, m_bits, k, with_keys=False)


def build_bloom_with_keys(ds, col: str, *, m_bits: int, k: int = 7
                          ) -> tuple[dict, np.ndarray]:
    """ONE pass producing BOTH the Bloom bitmap and the exact sorted
    distinct-key array — the query shape at test scale: bloom
    prefilter + exact-broadcast verify without executing the build
    side twice.  At true 100-TB scale the exact half is dropped (keys
    won't fit) and the verify becomes a bucketed join on the bloom
    survivors."""
    return _build(ds, col, m_bits, k, with_keys=True)


def probe_bloom(values, bloom: dict) -> np.ndarray:
    """Vectorized membership test — boolean mask aligned with the
    input, no false negatives.  Accepts numpy arrays or Arrow
    arrays/ChunkedArrays; Arrow nulls report non-member (and a
    nullable int column keeps hashing as int64, never float64)."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        keys, valid = _arrow_keys(values)
        hit = np.zeros(len(keys), dtype=bool) if not len(keys) else \
            _test_bits(bloom["bits"],
                       _positions(keys, bloom["m"], bloom["k"]))
        if valid is None:
            return hit
        out = np.zeros(len(valid), dtype=bool)
        out[valid] = hit
        return out
    values = np.asarray(values)
    if not len(values):
        return np.zeros(0, dtype=bool)
    return _test_bits(bloom["bits"],
                      _positions(values, bloom["m"], bloom["k"]))
