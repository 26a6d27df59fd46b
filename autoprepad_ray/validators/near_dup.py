"""Near-duplicate detection on the ``phash`` column (SURVEY §2.7,
FIXTURES R5): exact-bucket stage + banded-Hamming stage, skew-safe.

Skew handling (the north rule names popular phash values as the hazard):
- counting is two-level: the per-block Arrow ``group_by`` partial acts as
  the salt level (each block contributes at most ONE row per phash no
  matter how hot the value), so the final ``groupby(phash)`` merges
  block-partials, never raw rows;
- membership listing for hot hashes is capped per bucket
  (``sample_cap``) with the count still exact — a 10^6-row bucket ships
  a bounded sample plus its true cardinality instead of O(n^2) pairs.

Banded Hamming: the 64-bit hash splits into 4x16-bit bands; hashes
within Hamming distance <= 4 of each other share at least one band in
the common case (guaranteed when the <=4 differing bits do not all land
in distinct bands; with 4 flipped bits in 4 distinct bands recall drops —
documented approximation, mitigated by also bucketing on the exact
hash).  Candidate pairs are verified with exact ``hamming64``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.imagecodec import hamming64


def duplicate_phash_groups(ds, *, phash_col: str = "phash",
                           id_col: str = "image_id", sample_cap: int = 64):
    """Exact near-dup buckets: phash values occurring >= 2 times, with an
    exact count and a bounded id sample per bucket."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = t.select([phash_col]).group_by([phash_col]).aggregate(
            [([], "count_all")])
        return g.rename_columns([phash_col, "n"])

    counts = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby(phash_col).aggregate(Sum("n", alias_name="n")))
    dup_counts = counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n"], 2)),
        batch_format="pyarrow")
    dup_rows = dup_counts.take_all()
    dup_set = {int(r[phash_col]) for r in dup_rows}
    n_by_hash = {int(r[phash_col]): int(r["n"]) for r in dup_rows}
    if not dup_set:
        return pa.table({phash_col: pa.array([], type=pa.int64()),
                         "n": pa.array([], type=pa.int64()),
                         "ids": pa.array([], type=pa.list_(pa.string()))})

    import ray
    dup_ref = ray.put(np.fromiter(dup_set, dtype=np.int64))

    def members(t: pa.Table) -> pa.Table:
        dups = ray.get(dup_ref)
        ph = t[phash_col].to_numpy(zero_copy_only=False)
        mask = np.isin(ph, dups)
        return t.select([id_col, phash_col]).filter(pa.array(mask))

    def collapse(g: pd.DataFrame) -> pd.DataFrame:
        ph = int(g[phash_col].iloc[0])
        ids = sorted(g[id_col].tolist())[:sample_cap]
        return pd.DataFrame({phash_col: [ph], "n": [n_by_hash[ph]],
                             "ids": [ids]})

    return (ds.map_batches(members, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(phash_col)
            .map_groups(collapse, batch_format="pandas"))


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


def hamming_neardup_pairs(ds, *, max_dist: int = 4,
                          phash_col: str = "phash",
                          id_col: str = "image_id",
                          bucket_cap: int = 512):
    """Banded-LSH candidate generation + exact Hamming verification.

    Returns a Dataset (id_a, id_b, dist) with id_a < id_b, dist in
    [1, max_dist] (exact duplicates are the other stage's job).
    Buckets larger than ``bucket_cap`` are truncated (hot-hash guard) —
    their members are already reported by the exact-bucket stage.
    """

    def explode(t: pa.Table) -> dict:
        ph = t[phash_col].to_numpy(zero_copy_only=False)
        ids = np.asarray(t[id_col].to_numpy(zero_copy_only=False))
        return _band_rows(ph, ids)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=["image_id"]).head(bucket_cap)
        ph = g["phash"].to_numpy()
        ids = g["image_id"].to_numpy()
        n = len(g)
        out_a, out_b, out_d = [], [], []
        if 2 <= n:
            u = ph.astype(np.int64).view(np.uint64)
            for i in range(n - 1):
                d = hamming64(u[i + 1:].view(np.int64), int(ph[i]))
                hit = np.nonzero((d >= 1) & (d <= max_dist))[0]
                for j in hit:
                    a, b = ids[i], ids[i + 1 + j]
                    if a > b:
                        a, b = b, a
                    out_a.append(a)
                    out_b.append(b)
                    out_d.append(int(d[j]))
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "dist": out_d})

    from ray.data.aggregate import Min

    pairs = (ds.map_batches(explode, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby(["band", "band_val"])
             .map_groups(bucket_pairs, batch_format="pandas"))
    # the same pair can surface from multiple bands -> dedupe
    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Min("dist", alias_name="dist"))
