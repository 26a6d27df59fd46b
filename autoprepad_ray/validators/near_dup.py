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

Banded Hamming (multi-index hashing, Norouzi et al.'s substring
pigeonhole): the 64-bit hash splits into 4x16-bit bands; two hashes at
Hamming distance d share an exact band whenever some band carries none
of the d differing bits — guaranteed for d <= 3 (4 bands, pigeonhole),
~90% for d = 4 under uniform bit positions (documented recall bound;
exact-equal hashes are the other stage's job).  The opt-in
``scheme='2x32f1'`` (2x32-bit bands, 1-bit-flip enumeration) makes
recall EXACT through d = 5 at 66 keys/row — see
:func:`_band_stream_flip`.

Execution shape — pairing and verification are DISTRIBUTED, never
driver-side:
1. dense band census (4x65536 bincount partials, vector-add tree merge)
   decides the path: ``prune`` broadcasts the multi-member bucket keys
   and ships only their rows; ``mih_shuffle`` (when collisions are the
   norm, n >> 2^16 per band) skips the pointless filter and ships the
   whole band stream;
2. either way, ONE hash-partitioned exchange on ``part =
   splitmix64(band_key) % P`` co-locates complete buckets, and
   ``groupby(part).map_groups`` pairs within lexsorted segments — full
   64-bit Hamming verification happens inside the group.  Rows are
   deduped to one representative per distinct hash value (min id) both
   per block and per part, which also neutralizes hot-value skew.
Only verified (id_a, id_b, dist) pairs — the output — reach the driver.
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray


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


def _minid_per_key(keys: np.ndarray, ids: np.ndarray
                   ) -> tuple[np.ndarray, np.ndarray]:
    """(sorted unique keys, min id per key) — vectorized lexsort fold
    of (key, id) partials."""
    order = np.lexsort((ids, keys))
    keys, ids = keys[order], ids[order]
    first = np.r_[True, keys[1:] != keys[:-1]] if len(keys) else \
        np.empty(0, bool)
    return keys[first], ids[first]


def _merge_minid_payloads(batch: pa.Table) -> pa.Table:
    parts = [pickle.loads(p) for p in batch["payload"].to_pylist()]
    keys = np.concatenate([p[0] for p in parts])
    ids = np.concatenate([p[1] for p in parts])
    return _pickled(_minid_per_key(keys, ids))


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
        """Capped member sample PER BLOCK: at most sample_cap (min) ids
        per dup hash leave each block, so the driver collection is
        bounded by dup_hashes x sample_cap x blocks-touching-them even
        when a hot hash has millions of rows (counts stay exact from
        the census)."""
        from ..sketches import np_object

        dups = ray.get(dup_ref)
        ph = t[phash_col].to_numpy(zero_copy_only=False)
        m = np.isin(ph, dups)
        ph, ids = ph[m], np_object(t[id_col])[m]
        order = np.lexsort((ids, ph))
        ph, ids = ph[order], ids[order]
        first = np.r_[True, ph[1:] != ph[:-1]] if len(ph) else \
            np.empty(0, bool)
        rank = np.arange(len(ph)) - np.maximum.accumulate(
            np.where(first, np.arange(len(ph)), 0)) if len(ph) else \
            np.empty(0, np.int64)
        keep = rank < sample_cap
        # packed (hash, id) arrays: the driver fold is one lexsort over
        # arrays, never per-row dict appends
        return _pickled((ph[keep].astype(np.int64), ids[keep]))

    parts = [pickle.loads(r["payload"])
             for r in ds.map_batches(members, batch_format="pyarrow",
                                     zero_copy_batch=True).take_all()]
    ph_all = np.concatenate([p[0] for p in parts]) if parts else \
        np.empty(0, np.int64)
    id_all = np.concatenate([p[1] for p in parts]) if parts else \
        np.empty(0, object)
    order = np.lexsort((id_all, ph_all))
    ph_all, id_all = ph_all[order], id_all[order]
    bounds = np.flatnonzero(np.r_[True, ph_all[1:] != ph_all[:-1], True])
    hashes, id_lists = [], []
    for s, e in zip(bounds[:-1], bounds[1:]):
        hashes.append(int(ph_all[s]))
        id_lists.append(id_all[s:min(e, s + sample_cap)].tolist())
    # id list type INFERRED from the data (string image ids, int64 doc
    # ids both work); only the no-members case needs an explicit type
    ids_arr = pa.array(id_lists) if id_lists else \
        pa.array([], type=pa.list_(pa.string()))
    return pa.table({
        phash_col: pa.array(hashes, type=pa.int64()),
        "n": pa.array([dup[h] for h in hashes], type=pa.int64()),
        "ids": ids_arr})


_GROUPED_SEG_MAX = 256  # segments up to this size batch by size class


def _segment_pairs(keys: np.ndarray, ids: np.ndarray, ph: np.ndarray,
                   max_dist: int, bucket_cap: int, *,
                   verify: bool = True) -> pd.DataFrame:
    """Vectorized within-bucket pairing over lexsorted candidate rows.

    Segments are batched BY SIZE CLASS: all size-m buckets stack into a
    (k, m) hash matrix and every intra-bucket pair is verified with one
    XOR + popcount broadcast per class — no per-segment Python loop (at
    n >> 2^16 per band the average bucket holds n/2^16 rows and the
    loop, not the shuffle, dominated).  Segments past _GROUPED_SEG_MAX
    (rare; capped at ``bucket_cap``) fall back to a row-vs-rest sweep.

    ``verify=False`` skips the Hamming check and emits EVERY intra-
    bucket pair with dist 0 — the LSH candidate-enumeration mode (the
    minhash / sign-LSH stages verify with their own exact metric
    afterwards); ``ph`` is ignored there."""
    from ..sketches import popcount64

    order = np.argsort(keys, kind="mergesort")
    keys, ids, ph = keys[order], ids[order], ph[order]
    bounds = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1], True])
    sizes = np.diff(bounds)
    starts = bounds[:-1]
    out_a: list = []
    out_b: list = []
    out_d: list = []
    u = ph.astype(np.int64).view(np.uint64)

    def emit(a, b, d):
        swap = a > b
        out_a.append(np.where(swap, b, a))
        out_b.append(np.where(swap, a, b))
        out_d.append(d)

    sel = (sizes >= 2) & (sizes <= _GROUPED_SEG_MAX)
    for m in np.unique(sizes[sel]):
        st = starts[sizes == m]
        idx = st[:, None] + np.arange(m)[None, :]          # (k, m)
        iu, ju = np.triu_indices(int(m), 1)
        # chunk so the (k, m(m-1)/2) pair matrix stays ~32 MB
        step = max(1, 4_000_000 // max(1, len(iu)))
        for c in range(0, len(st), step):
            ic = idx[c:c + step]
            if verify:
                Pc = u[ic]
                d = popcount64(Pc[:, iu] ^ Pc[:, ju]).astype(np.int64)
                hit = (d >= 1) & (d <= max_dist)
                if not hit.any():
                    continue
                ks, ps = np.nonzero(hit)
                emit(ids[ic[ks, iu[ps]]], ids[ic[ks, ju[ps]]], d[hit])
            else:
                emit(ids[ic[:, iu].ravel()], ids[ic[:, ju].ravel()],
                     np.zeros(len(ic) * len(iu), dtype=np.int64))
    for s, size in zip(starts[sizes > _GROUPED_SEG_MAX],
                       sizes[sizes > _GROUPED_SEG_MAX]):
        e = s + min(int(size), bucket_cap)
        for i in range(s, e - 1):
            if verify:
                d = popcount64(u[i + 1:e] ^ u[i]).astype(np.int64)
                hit = (d >= 1) & (d <= max_dist)
                if hit.any():
                    j = np.nonzero(hit)[0] + i + 1
                    emit(np.broadcast_to(ids[i], j.shape).copy(), ids[j],
                         d[hit])
            else:
                j = np.arange(i + 1, e)
                emit(np.broadcast_to(ids[i], j.shape).copy(), ids[j],
                     np.zeros(len(j), dtype=np.int64))
    if out_a:
        df = pd.DataFrame({
            "id_a": pd.Series(np.concatenate(out_a)),
            "id_b": pd.Series(np.concatenate(out_b)),
            "dist": pd.Series(np.concatenate(out_d), dtype=np.int64)})
    else:
        # typed even when empty: map_groups concatenates per-group frames
        # and an untyped empty column would break schema unification
        df = pd.DataFrame({
            "id_a": pd.Series(np.asarray([], dtype=ids.dtype)),
            "id_b": pd.Series(np.asarray([], dtype=ids.dtype)),
            "dist": pd.Series([], dtype=np.int64)})
    # a pair can surface from several bands
    return df.drop_duplicates(subset=["id_a", "id_b"])


N_BANDS = 4
BAND_SLOTS = 65536  # 16-bit substrings; dense combo key = band*65536+val

_EMPTY_PAIRS = {"id_a": pd.Series([], dtype=object),
                "id_b": pd.Series([], dtype=object),
                "dist": pd.Series([], dtype=np.int64)}


def _band_combos(ph: np.ndarray) -> np.ndarray:
    """(n, 4) dense band-bucket keys for 64-bit hashes."""
    u = ph.astype(np.int64).view(np.uint64)
    out = np.empty((len(ph), N_BANDS), dtype=np.int64)
    for b in range(N_BANDS):
        out[:, b] = np.int64(b * BAND_SLOTS) + (
            (u >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
    return out


def _dense_band_census(ds, phash_col: str) -> np.ndarray:
    """Total per-bucket counts over the (block-deduped) band stream:
    per-block 4x65536 bincount, vector-add tree merge."""
    def partial(t: pa.Table) -> pa.Table:
        ph = np.unique(t[phash_col].to_numpy(zero_copy_only=False))
        dense = np.bincount(_band_combos(ph).ravel(),
                            minlength=N_BANDS * BAND_SLOTS) \
            .astype(np.int32)
        return _pickled(dense)

    def merge(batch: pa.Table) -> pa.Table:
        total = np.zeros(N_BANDS * BAND_SLOTS, dtype=np.int64)
        for p in batch["payload"].to_pylist():
            total += pickle.loads(p)
        return _pickled(total)

    merged = ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .map_batches(merge, batch_size=32, batch_format="pyarrow")
    total = np.zeros(N_BANDS * BAND_SLOTS, dtype=np.int64)
    for r in merged.take_all():
        total += pickle.loads(r["payload"])
    return total


def _pack_sliced(keys: np.ndarray, out_ph: np.ndarray,
                 num_parts: int) -> pa.Table:
    """Sort (key, hash) rows by key-hash slice and emit one pickled
    payload row per slice (the packed-payload exchange shape)."""
    from ..sketches import splitmix64

    if not len(keys):
        return pa.table({"slice": pa.array([], type=pa.int32()),
                         "payload": pa.array([],
                                             type=pa.large_binary())})
    sl = (splitmix64(keys.view(np.uint64))
          % np.uint64(num_parts)).astype(np.int32)
    order = np.argsort(sl, kind="stable")
    sl, keys, out_ph = sl[order], keys[order], out_ph[order]
    bounds = np.flatnonzero(np.r_[True, sl[1:] != sl[:-1], True])
    slices, payloads = [], []
    for s, e in zip(bounds[:-1], bounds[1:]):
        slices.append(int(sl[s]))
        payloads.append(pickle.dumps((keys[s:e], out_ph[s:e])))
    return pa.table({"slice": pa.array(slices, type=pa.int32()),
                     "payload": pa.array(payloads,
                                         type=pa.large_binary())})


def _band_stream_flip(ds, phash_col: str, num_parts: int):
    """2x32-bit bands with 1-bit-flip enumeration — the EXACT d<=4 mode
    (CLAUDE.md round-3 thread; cf. Norouzi et al. multi-index hashing
    with query expansion).

    Each hash emits, per 32-bit band, its band value plus all 32 1-bit
    flips (66 keys/row).  Two hashes at distance d split their
    differing bits between the two bands; by pigeonhole some band
    carries <= floor(d/2) of them, so for d <= 5 some band differs in
    <= 2 bits — and 1-bit flips FROM BOTH SIDES meet in the middle:
    diff 0 collides on the originals, diff 1 on one side's flip, diff 2
    on the two complementary flips.  Recall is therefore exact for
    max_dist <= 5 (the 4x16 scheme is exact only to 3, ~90% at 4); the
    pairing stage's XOR+popcount verify discards the extra candidates
    flips invent.  Cost: 66 keys/row vs 4 — opt-in where the missed
    ~10% at d=4 matters more than the 16x band-stream volume."""

    def fn(t: pa.Table) -> pa.Table:
        ph = np.unique(t[phash_col].to_numpy(zero_copy_only=False))
        u = ph.astype(np.int64).view(np.uint64)
        flips = (np.uint64(1) << np.arange(32, dtype=np.uint64))
        keys_l, ph_l = [], []
        for b in range(2):
            val = ((u >> np.uint64(32 * b))
                   & np.uint64(0xFFFFFFFF))                  # (n,)
            cand = np.concatenate(
                [val[:, None], val[:, None] ^ flips[None, :]],
                axis=1)                                      # (n, 33)
            off = np.uint64((b + 1) << 32)  # band tag above the 32 bits
            keys_l.append((cand + off).astype(np.int64).ravel())
            ph_l.append(np.repeat(ph, 33))
        return _pack_sliced(np.concatenate(keys_l),
                            np.concatenate(ph_l), num_parts)

    # smaller batches: the 66x key expansion makes per-batch scratch
    # ~1 KB/row — keep batch x concurrency well inside worker heaps
    return ds.map_batches(fn, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=16384)


def _band_stream(ds, phash_col: str, num_parts: int, hot_ref=None):
    """Sliced band-row payloads over DISTINCT per-block hash values —
    pairing runs in hash space (ids resolved only for matched pairs).
    Each block emits ONE pickled (keys, hashes) array pair per key-hash
    slice (the pass-1 census packing: the exchange moves blocks x slices
    payload ROWS, not 4n row-shaped records — Ray's per-row shuffle
    overhead is the cost at bench scale, not the bytes).  Slicing by
    splitmix64(bucket key) keeps every bucket complete in one slice;
    per-block dedupe also neutralizes hot-value skew (a popular hash
    contributes one row per bucket per block, not thousands)."""
    from ..sketches import splitmix64

    def fn(t: pa.Table) -> pa.Table:
        ph = np.unique(t[phash_col].to_numpy(zero_copy_only=False))
        keys = _band_combos(ph).ravel()
        out_ph = np.repeat(ph, N_BANDS)
        if hot_ref is not None:
            m = np.isin(keys, ray.get(hot_ref))
            keys, out_ph = keys[m], out_ph[m]
        return _pack_sliced(keys, out_ph, num_parts)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


@ray.remote
def _hash_pair_slice_task(max_dist: int, bucket_cap: int,
                          *payload_lists) -> pd.DataFrame:
    """Flat pairing task for ONE slice of the packed band stream.
    Receives only its own slice's payload cells (slice-addressed
    scatter, ``stages.transport``)."""
    payloads = [p for lst in payload_lists for p in lst]
    if not payloads:
        return pd.DataFrame({"ph_a": pd.Series([], dtype=np.int64),
                             "ph_b": pd.Series([], dtype=np.int64),
                             "dist": pd.Series([], dtype=np.int64)})
    parts = [pickle.loads(p) for p in payloads]
    keys = np.concatenate([p[0] for p in parts])
    ph = np.concatenate([p[1] for p in parts])
    uniq = np.unique(np.stack([keys, ph], axis=1), axis=0)
    out = _segment_pairs(uniq[:, 0], uniq[:, 1], uniq[:, 1],
                        max_dist, bucket_cap)
    return out.rename(columns={"id_a": "ph_a", "id_b": "ph_b"})


def _pair_parts(band_ds, max_dist: int, bucket_cap: int,
                num_parts: int | None = None) -> pd.DataFrame:
    """Distributed pairing: the packed band stream materializes once,
    scatter tasks split it into slice-addressed cells (bytes move once
    even on a multi-node cluster — ``stages.transport``), and FLAT
    per-slice ray tasks pair their own cells (cross-block dedupe +
    segment-vectorized pairing + exact Hamming verify inside each task
    — a sort-groupby pays ~1-2 s of exchange overhead for a keyspace of
    dozens of slices).  Only verified (ph_a, ph_b, dist) pairs leave
    the tasks."""
    from ..stages.transport import scatter_slices

    if num_parts is None:
        num_parts = default_num_parts()
    per_slice = scatter_slices(band_ds.materialize(), num_parts)
    futs = [_hash_pair_slice_task.remote(max_dist, bucket_cap,
                                         *per_slice[s])
            for s in range(num_parts)]
    out = pd.concat(ray.get(futs), ignore_index=True)
    if not len(out):
        return pd.DataFrame({"ph_a": pd.Series([], dtype=np.int64),
                             "ph_b": pd.Series([], dtype=np.int64),
                             "dist": pd.Series([], dtype=np.int64)})
    # a pair can surface in several buckets routed to different slices
    return out.drop_duplicates(["ph_a", "ph_b"]).reset_index(drop=True)


def _resolve_ids(ds, phash_col: str, id_col: str,
                 ph_pairs: pd.DataFrame) -> pd.DataFrame:
    """Map hash pairs to (id_a, id_b, dist) with the GLOBAL min id as
    each hash's representative: one pruned execution (broadcast matched
    hashes, per-block min-id partials — tiny by construction)."""
    if not len(ph_pairs):
        return pd.DataFrame(_EMPTY_PAIRS)
    need = np.unique(np.concatenate([ph_pairs["ph_a"].to_numpy(),
                                     ph_pairs["ph_b"].to_numpy()]))
    need_ref = ray.put(need.astype(np.int64))

    def partial(t: pa.Table) -> pa.Table:
        from ..sketches import np_object
        ph = t[phash_col].to_numpy(zero_copy_only=False)
        m = np.isin(ph, ray.get(need_ref))
        ph, ids = ph[m], np_object(t[id_col])[m]
        if len(ph):
            order = np.lexsort((ids, ph))
            ph, ids = ph[order], ids[order]
            first = np.r_[True, ph[1:] != ph[:-1]]
            ph, ids = ph[first], ids[first]
        # packed (hash, min-id) arrays — the driver fold is one
        # vectorized lexsort over arrays, never per-row dict updates
        return _pickled((ph.astype(np.int64), ids))

    parts = [pickle.loads(r["payload"])
             for r in ds.map_batches(partial, batch_format="pyarrow",
                                     zero_copy_batch=True)
             .map_batches(_merge_minid_payloads, batch_size=32,
                          batch_format="pyarrow").take_all()]
    ph_all = np.concatenate([p[0] for p in parts])
    id_all = np.concatenate([p[1] for p in parts])
    ph_u, id_u = _minid_per_key(ph_all, id_all)

    def _lookup(col: np.ndarray) -> np.ndarray:
        pos = np.minimum(np.searchsorted(ph_u, col), len(ph_u) - 1) \
            if len(ph_u) else np.zeros(len(col), dtype=np.int64)
        if not len(ph_u) or not (ph_u[pos] == col).all():
            # loud, like the dict KeyError this replaced: a pair hash
            # absent from the resolution scan means the input chain
            # changed between executions (see materialize_input)
            missing = col if not len(ph_u) else col[ph_u[pos] != col]
            raise KeyError(
                f"_resolve_ids: {len(missing)} pair hash(es) not found "
                "in the id-resolution scan (nondeterministic input "
                "chain? pass materialize_input=True)")
        return id_u[pos]

    a = _lookup(ph_pairs["ph_a"].to_numpy())
    b = _lookup(ph_pairs["ph_b"].to_numpy())
    swap = a > b
    out = pd.DataFrame({
        "id_a": pd.Series(np.where(swap, b, a)),
        "id_b": pd.Series(np.where(swap, a, b)),
        "dist": ph_pairs["dist"].astype(np.int64).to_numpy()})
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def default_num_parts(mult: int = 4, floor: int = 16) -> int:
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4)) \
            if ray.is_initialized() else 4
    except Exception:
        cpus = 4
    return max(floor, cpus * mult)


def hamming_neardup_pairs(ds, *, max_dist: int = 4,
                          phash_col: str = "phash",
                          id_col: str = "image_id",
                          bucket_cap: int = 4096,
                          num_parts: int | None = None,
                          sat_min: int = 100_000, sat_frac: float = 0.02,
                          force_path: str | None = None,
                          materialize_input: bool = False,
                          scheme: str = "4x16") -> pd.DataFrame:
    """Banded-LSH candidates + exact Hamming verification, distributed.

    Returns a DataFrame (id_a, id_b, dist), id_a < id_b, 1 <= dist <=
    max_dist, one representative id per distinct hash value.  The dense
    census picks the path: ``prune`` (collisions rare — ship only
    multi-member buckets' rows) or ``mih_shuffle`` (collisions the norm
    at n >> 2^16 per band — ship the whole deduped band stream; the
    filter would keep ~everything anyway).  Both paths end in the same
    hash-partitioned groupby pairing; results are path-independent.

    ``scheme='2x32f1'`` switches to the exact-recall banding
    (:func:`_band_stream_flip`): recall is EXACT for max_dist <= 5
    instead of exact-to-3/~90%-at-4, at 66 keys/row instead of 4 — no
    census (32-bit bands make collisions rare, and every candidate is
    popcount-verified anyway).

    ``ds`` is consumed up to three times (census, band stream, id
    resolution).  For a cheap pruned parquet read that is the right
    trade; when ``ds`` is a COMPUTED chain (e.g. SimHash signatures),
    pass ``materialize_input=True`` so the chain executes once and the
    small (id, hash) stream is object-store-resident for the re-reads.
    """
    if num_parts is None:
        num_parts = default_num_parts()
    if materialize_input:
        ds = ds.materialize()
    if scheme == "2x32f1":
        if max_dist > 5:
            raise ValueError("2x32f1 guarantees recall only to dist 5")
        band_ds = _band_stream_flip(ds, phash_col, num_parts)
        ph_pairs = _pair_parts(band_ds, max_dist, bucket_cap, num_parts)
        return _resolve_ids(ds, phash_col, id_col, ph_pairs)
    if scheme != "4x16":
        raise ValueError(f"unknown banding scheme {scheme!r}")
    census = _dense_band_census(ds, phash_col)
    hot = np.nonzero(census >= 2)[0].astype(np.int64)
    if hot.size == 0:
        return pd.DataFrame(_EMPTY_PAIRS)
    collision_rows = int(census[hot].sum())
    path = force_path or (
        "mih_shuffle"
        if collision_rows > max(sat_min, int(sat_frac * census.sum()))
        else "prune")
    hot_ref = ray.put(hot) if path == "prune" else None
    band_ds = _band_stream(ds, phash_col, num_parts, hot_ref)
    ph_pairs = _pair_parts(band_ds, max_dist, bucket_cap, num_parts)
    return _resolve_ids(ds, phash_col, id_col, ph_pairs)


def phash_dedup_clusters(ds, *, phash_col: str = "phash",
                         id_col: str = "image_id", max_dist: int = 4,
                         member_cap: int = 4096,
                         scheme: str = "4x16",
                         materialize_input: bool = False):
    """Transitive near-duplicate CLUSTERS for the image/phash family —
    the keep-one-canonical step the minhash path already has
    (pairs name WHO matches; a dedup needs the components).

    Edges feeding ``stages.graph.connected_components``:

    - NEAR (1 <= dist <= max_dist): :func:`hamming_neardup_pairs`,
      which reports one representative id (the global min) per
      DISTINCT hash value;
    - EXACT (dist 0): every hash with >= 2 rows contributes star edges
      representative -> member from :func:`duplicate_phash_groups`, so
      same-hash rows join their representative's component.  Member
      listings are bounded by ``member_cap`` ids per hash value (the
      census counts stay exact) — past the cap a hot hash's remaining
      members stay unlabeled singletons; raise the cap or dedup
      exact-equal hashes upstream first at that density.

    Together the transitive closure equals the closure of ALL row
    pairs at Hamming distance <= max_dist (recall caveats of the
    banding ``scheme`` apply to the NEAR component — exact to d=3 for
    4x16, d=5 for 2x32f1).

    Returns ``ds``'s id column labeled (id, cluster_id, is_canonical)
    via the broadcast ``attach_clusters`` — rows in no cluster label
    themselves and stay canonical.
    """
    from ..stages.graph import attach_clusters, connected_components

    if materialize_input:
        ds = ds.materialize()
    near = hamming_neardup_pairs(ds, phash_col=phash_col, id_col=id_col,
                                 max_dist=max_dist, scheme=scheme)
    groups = duplicate_phash_groups(ds, phash_col=phash_col,
                                    id_col=id_col,
                                    sample_cap=member_cap).to_pandas()
    ex_a, ex_b = [], []
    for ids in groups["ids"]:
        members = np.asarray(ids, dtype=object)
        if len(members) >= 2:
            ex_a.append(np.broadcast_to(members[0],
                                        (len(members) - 1,)).copy())
            ex_b.append(members[1:])
    src = np.concatenate([near["id_a"].to_numpy()] + ex_a) \
        if len(near) or ex_a else np.empty(0, dtype=object)
    dst = np.concatenate([near["id_b"].to_numpy()] + ex_b) \
        if len(near) or ex_a else np.empty(0, dtype=object)
    cc = connected_components((src, dst), "src", "dst")
    return attach_clusters(ds.select_columns([id_col]), id_col, cc)
