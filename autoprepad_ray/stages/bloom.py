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
"""

from __future__ import annotations

import pickle

import numpy as np
import pyarrow as pa

from ..sketches import hash64, splitmix64

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


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


def build_bloom(ds, col: str, *, m_bits: int, k: int = 7) -> dict:
    """One-pass distributed build over ``ds[col]``; returns
    ``{"bits": uint64 words, "m": m_bits, "k": k}`` ready for
    ``ray.put``.  Size ``m_bits`` ~ 12 bits per expected distinct key
    for ~1% FP at k=7."""
    n_words = (m_bits + 63) // 64

    def part(t: pa.Table) -> pa.Table:
        words = np.zeros(n_words, dtype=np.uint64)
        keys = t[col].to_numpy(zero_copy_only=False)
        if len(keys):
            _set_bits(words, _positions(keys, m_bits, k))
        return pa.table({"payload": pa.array([pickle.dumps(words)],
                                             type=pa.large_binary())})

    def merge(t: pa.Table) -> pa.Table:
        parts = [pickle.loads(p) for p in t["payload"].to_pylist()]
        if not parts:
            return pa.table({"payload": pa.array([],
                                                 type=pa.large_binary())})
        acc = parts[0].copy()
        for p in parts[1:]:
            np.bitwise_or(acc, p, out=acc)
        return pa.table({"payload": pa.array([pickle.dumps(acc)],
                                             type=pa.large_binary())})

    rows = (ds.map_batches(part, batch_format="pyarrow",
                           zero_copy_batch=True)
              .map_batches(merge, batch_size=32, batch_format="pyarrow")
              .take_all())
    acc = np.zeros(n_words, dtype=np.uint64)
    for r in rows:
        np.bitwise_or(acc, pickle.loads(r["payload"]), out=acc)
    return {"bits": acc, "m": m_bits, "k": k}


def build_bloom_with_keys(ds, col: str, *, m_bits: int, k: int = 7
                          ) -> tuple[dict, np.ndarray]:
    """ONE pass over the key stream producing BOTH the Bloom bitmap
    and the exact sorted distinct-key array (each block's payload
    carries its private bitmap + its unique keys; the merge ORs /
    uniques respectively).  The query shape at test scale: bloom
    prefilter + exact-broadcast verify without executing the build
    side twice.  At true 100-TB scale the exact half is dropped
    (keys won't fit) and the verify becomes a bucketed join on the
    bloom survivors."""
    n_words = (m_bits + 63) // 64

    def part(t: pa.Table) -> pa.Table:
        words = np.zeros(n_words, dtype=np.uint64)
        keys = t[col].to_numpy(zero_copy_only=False)
        if len(keys):
            _set_bits(words, _positions(keys, m_bits, k))
        return pa.table({"payload": pa.array(
            [pickle.dumps((words, np.unique(keys)))],
            type=pa.large_binary())})

    def merge(t: pa.Table) -> pa.Table:
        parts = [pickle.loads(p) for p in t["payload"].to_pylist()]
        if not parts:
            return pa.table({"payload": pa.array([],
                                                 type=pa.large_binary())})
        acc = parts[0][0].copy()
        for w, _ in parts[1:]:
            np.bitwise_or(acc, w, out=acc)
        keys = np.unique(np.concatenate([p[1] for p in parts]))
        return pa.table({"payload": pa.array([pickle.dumps((acc, keys))],
                                             type=pa.large_binary())})

    rows = (ds.map_batches(part, batch_format="pyarrow",
                           zero_copy_batch=True)
              .map_batches(merge, batch_size=32, batch_format="pyarrow")
              .take_all())
    acc = np.zeros(n_words, dtype=np.uint64)
    key_parts = []
    for r in rows:
        w, u = pickle.loads(r["payload"])
        np.bitwise_or(acc, w, out=acc)
        key_parts.append(u)
    keys = np.unique(np.concatenate(key_parts)) if key_parts else \
        np.empty(0, dtype=np.int64)
    return {"bits": acc, "m": m_bits, "k": k}, keys


def probe_bloom(values, bloom: dict) -> np.ndarray:
    """Vectorized membership test — boolean mask, no false negatives."""
    values = np.asarray(values) if not isinstance(values, np.ndarray) \
        else values
    if not len(values):
        return np.zeros(0, dtype=bool)
    return _test_bits(bloom["bits"],
                      _positions(values, bloom["m"], bloom["k"]))
