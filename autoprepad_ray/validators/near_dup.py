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
recall EXACT through d = 5 at 66 keys/row — see :func:`_scheme_keys`.

Execution shape — pairing, id resolution and verification are all
DISTRIBUTED, never driver-side (r5 layout):

1. the deduped band stream carries (band_key, hash, block-min id)
   triples sliced by ``part = splitmix64(band_key) % P`` — every bucket
   lands complete in one slice, and because EVERY block containing a
   hash ships that hash's row for each of its band keys, a pairing task
   can fold the GLOBAL min id per hash from its own slice alone;
2. flat per-slice ray tasks (slice-addressed scatter,
   ``stages.transport``) dedupe cross-block rows, pair within lexsorted
   bucket segments with the size-class-batched XOR+popcount kernel, and
   return verified (hash_a, hash_b, dist) pairs PLUS the (hash, min id)
   resolution entries for exactly the hashes their pairs touch — the
   separate id-resolution pass of earlier rounds no longer exists.
Only verified pairs and their per-hash representatives — the output —
reach the driver.
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
    if not parts:
        # a filtered mixed stream can hand the merge an empty batch
        return pa.table({"payload": pa.array([], type=pa.large_binary())})
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
        # empty-list value type derives from the INPUT id column so the
        # output schema is stable whether or not dups exist (r4 advice:
        # hardcoded list<string> flipped the schema for int64-id inputs)
        sch = ds.schema()
        id_type = dict(zip(sch.names, sch.types)).get(id_col, pa.string())
        return pa.table({phash_col: pa.array([], type=pa.int64()),
                         "n": pa.array([], type=pa.int64()),
                         "ids": pa.array([], type=pa.list_(id_type))})
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
    return pa.table({
        phash_col: pa.array(hashes, type=pa.int64()),
        "n": pa.array([dup[h] for h in hashes], type=pa.int64()),
        "ids": pa.array(id_lists)})


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


def _scheme_keys(ph: np.ndarray, scheme: str) -> tuple[np.ndarray, int]:
    """All band-bucket keys per hash for a banding scheme, row-major.

    ``4x16``: 4 16-bit substrings (multi-index hashing) — exact recall
    to d = 3, ~90% at d = 4; 4 keys/hash.

    ``2x32f1``: 2x32-bit bands with 1-bit-flip enumeration (Norouzi et
    al. MIH with query expansion).  Each hash emits, per band, its band
    value plus all 32 1-bit flips (66 keys/hash).  Two hashes at
    distance d split their differing bits between the two bands; by
    pigeonhole some band carries <= floor(d/2) of them, so for d <= 5
    some band differs in <= 2 bits — and 1-bit flips FROM BOTH SIDES
    meet in the middle: diff 0 collides on the originals, diff 1 on one
    side's flip, diff 2 on the two complementary flips.  Recall is
    therefore exact for max_dist <= 5; the pairing stage's XOR+popcount
    verify discards the extra candidates flips invent.  Cost: 66
    keys/hash vs 4 — opt-in where the missed ~10% at d = 4 matters more
    than the 16x band-stream volume.

    Returns (keys flattened to (n * keys_per_hash,), keys_per_hash);
    ``np.repeat(ph, keys_per_hash)`` aligns hashes with their keys."""
    if scheme == "4x16":
        return _band_combos(ph).ravel(), N_BANDS
    if scheme == "2x32f1":
        u = ph.astype(np.int64).view(np.uint64)
        flips = (np.uint64(1) << np.arange(32, dtype=np.uint64))
        cols = []
        for b in range(2):
            val = ((u >> np.uint64(32 * b))
                   & np.uint64(0xFFFFFFFF))                  # (n,)
            cand = np.concatenate(
                [val[:, None], val[:, None] ^ flips[None, :]],
                axis=1)                                      # (n, 33)
            off = np.uint64((b + 1) << 32)  # band tag above the 32 bits
            cols.append((cand + off).astype(np.int64))
        return np.concatenate(cols, axis=1).ravel(), 66
    raise ValueError(f"unknown banding scheme {scheme!r}")


def _owner_keys(ph: np.ndarray, scheme: str) -> np.ndarray:
    """ONE deterministic band key per hash (its first key) — used to
    assign each hash an owner slice so per-hash side-channel emissions
    (exact-dup min ids) happen exactly once across pairing tasks."""
    u = ph.astype(np.int64).view(np.uint64)
    if scheme == "4x16":
        return (u & np.uint64(0xFFFF)).astype(np.int64)
    if scheme == "2x32f1":
        return ((u & np.uint64(0xFFFFFFFF))
                + np.uint64(1 << 32)).astype(np.int64)
    raise ValueError(f"unknown banding scheme {scheme!r}")


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
                 num_parts: int, ids: np.ndarray | None = None) -> pa.Table:
    """Sort (key, hash[, id]) rows by key-hash slice and emit one
    pickled payload row per slice (the packed-payload exchange shape)."""
    from ..sketches import splitmix64

    if not len(keys):
        return pa.table({"slice": pa.array([], type=pa.int32()),
                         "payload": pa.array([],
                                             type=pa.large_binary())})
    sl = (splitmix64(keys.view(np.uint64))
          % np.uint64(num_parts)).astype(np.int32)
    order = np.argsort(sl, kind="stable")
    sl, keys, out_ph = sl[order], keys[order], out_ph[order]
    if ids is not None:
        ids = ids[order]
    bounds = np.flatnonzero(np.r_[True, sl[1:] != sl[:-1], True])
    slices, payloads = [], []
    for s, e in zip(bounds[:-1], bounds[1:]):
        slices.append(int(sl[s]))
        payloads.append(pickle.dumps(
            (keys[s:e], out_ph[s:e]) if ids is None
            else (keys[s:e], out_ph[s:e], ids[s:e])))
    return pa.table({"slice": pa.array(slices, type=pa.int32()),
                     "payload": pa.array(payloads,
                                         type=pa.large_binary())})


def _band_stream(ds, phash_col: str, id_col: str, num_parts: int, *,
                 scheme: str = "4x16", hot_ref=None):
    """Sliced band-row payloads over DISTINCT per-block hash values,
    each row carrying the hash's BLOCK-min id.  Because every block
    containing a hash emits that hash's (key, hash, min id) row for
    each of its band keys, any pairing task folding a slice sees ALL
    blocks' entries for every hash present there — so the GLOBAL min
    id per hash is computable inside the task and the separate
    id-resolution execution of earlier rounds is gone.

    Each block emits ONE pickled (keys, hashes, ids) array triple per
    key-hash slice (the pass-1 census packing: the exchange moves
    blocks x slices payload ROWS, not row-shaped records — Ray's
    per-row shuffle overhead is the cost at bench scale, not the
    bytes).  Slicing by splitmix64(bucket key) keeps every bucket
    complete in one slice; per-block dedupe also neutralizes hot-value
    skew (a popular hash contributes one row per bucket per block, not
    thousands)."""

    def fn(t: pa.Table) -> pa.Table:
        from ..sketches import np_object

        ph_rows = t[phash_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ids_rows = np_object(t[id_col])
        ph, minid = _minid_per_key(ph_rows, ids_rows)
        keys, kpr = _scheme_keys(ph, scheme)
        out_ph = np.repeat(ph, kpr)
        out_id = np.repeat(minid, kpr)
        if hot_ref is not None:
            m = np.isin(keys, ray.get(hot_ref))
            keys, out_ph, out_id = keys[m], out_ph[m], out_id[m]
        return _pack_sliced(keys, out_ph, num_parts, ids=out_id)

    # smaller batches under the 66x key expansion: per-batch scratch is
    # ~1 KB/row there — keep batch x concurrency well inside worker heaps
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=16384 if scheme == "2x32f1" else None)


@ray.remote
def _hash_pair_slice_task(max_dist: int, bucket_cap: int,
                          *payload_lists) -> pd.DataFrame:
    """Flat pairing task for ONE slice of a packed (keys, hashes) band
    stream WITHOUT ids (the image pipeline's pass-2 payloads).  Kept
    beside :func:`_id_pair_slice_task` for streams whose ids resolve
    via a later pruned read (``_resolve_ids``)."""
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


@ray.remote
def _census_fold_task(*blocks):
    """Merge the census payload rows of <= 32 fused-pass blocks into one
    (values, counts) partial (None when the blocks carry none)."""
    parts = []
    for b in blocks:
        for p in b.filter(pc.equal(b["kind"], "census"))["payload"] \
                .to_pylist():
            parts.append(pickle.loads(p))
    return _merge_count_arrays(parts) if parts else None


@ray.remote
def _id_pair_slice_task(max_dist: int, bucket_cap: int, dup_ref,
                        num_parts: int, slice_id: int, scheme: str,
                        *payload_lists):
    """Flat pairing task for ONE slice of the id-carrying band stream.

    Returns (ph_a, ph_b, dist, res_ph, res_id):

    - verified hash pairs within this slice's buckets (cross-block
      dedupe + size-class-batched XOR+popcount verify);
    - (hash, GLOBAL min id) resolution entries for every hash touched
      by an emitted pair — valid because all blocks deliver a hash's
      rows to each of its band slices (see ``_band_stream``) — plus,
      when ``dup_ref`` names exact-duplicate hashes, the entries for
      dup hashes whose owner key routes to this slice (so each dup
      hash resolves exactly once across tasks even when it pairs with
      nothing)."""
    payloads = [p for lst in payload_lists for p in lst]
    empty = (np.empty(0, np.int64), np.empty(0, np.int64),
             np.empty(0, np.int64), np.empty(0, np.int64),
             np.empty(0, object))
    if not payloads:
        return empty
    from ..sketches import splitmix64

    parts = [pickle.loads(p) for p in payloads]
    keys = np.concatenate([p[0] for p in parts])
    ph = np.concatenate([p[1] for p in parts])
    ids = np.concatenate([p[2] for p in parts])
    ph_u, minid = _minid_per_key(ph, ids)
    uniq = np.unique(np.stack([keys, ph], axis=1), axis=0)
    pairs = _segment_pairs(uniq[:, 0], uniq[:, 1], uniq[:, 1],
                           max_dist, bucket_cap)
    ph_a = pairs["id_a"].to_numpy().astype(np.int64)
    ph_b = pairs["id_b"].to_numpy().astype(np.int64)
    dist = pairs["dist"].to_numpy().astype(np.int64)
    res = np.unique(np.concatenate([ph_a, ph_b])) if len(ph_a) else \
        np.empty(0, np.int64)
    if dup_ref is not None:
        dup = dup_ref  # top-level ObjectRef args arrive dereferenced
        if len(dup):
            pos = np.minimum(np.searchsorted(dup, ph_u),
                             len(dup) - 1)
            is_dup = dup[pos] == ph_u if len(ph_u) else \
                np.empty(0, bool)
            cand = ph_u[is_dup]
            own = (splitmix64(_owner_keys(cand, scheme).view(np.uint64))
                   % np.uint64(num_parts)).astype(np.int64) == slice_id
            res = np.unique(np.concatenate([res, cand[own]]))
    if not len(res):
        return (ph_a, ph_b, dist, np.empty(0, np.int64),
                np.empty(0, object))
    res_id = minid[np.searchsorted(ph_u, res)]
    return (ph_a, ph_b, dist, res, res_id)


def _pair_ids(packed, num_parts: int, max_dist: int, bucket_cap: int,
              scheme: str, *, dup_ref=None, kind: str | None = None):
    """Distributed pairing over a MATERIALIZED id-carrying band stream:
    scatter tasks split it into slice-addressed cells (bytes move once
    even multi-node — ``stages.transport``), flat per-slice ray tasks
    pair and resolve ids in one visit.  Returns (hash-pair DataFrame
    (ph_a, ph_b, dist), sorted resolution arrays (hashes, min ids))."""
    from ..stages.transport import scatter_slices

    per_slice = scatter_slices(packed, num_parts, kind=kind)
    futs = [_id_pair_slice_task.remote(max_dist, bucket_cap, dup_ref,
                                       num_parts, s, scheme,
                                       *per_slice[s])
            for s in range(num_parts)]
    outs = ray.get(futs)
    ph_a = np.concatenate([o[0] for o in outs])
    ph_b = np.concatenate([o[1] for o in outs])
    dist = np.concatenate([o[2] for o in outs])
    res_ph = np.concatenate([o[3] for o in outs])
    res_id = np.concatenate([o[4] for o in outs])
    # a pair can surface in several buckets routed to different slices;
    # its dist is identical everywhere (exact Hamming), keep the first
    if len(ph_a):
        order = np.lexsort((ph_b, ph_a))
        ph_a, ph_b, dist = ph_a[order], ph_b[order], dist[order]
        first = np.r_[True, (ph_a[1:] != ph_a[:-1])
                      | (ph_b[1:] != ph_b[:-1])]
        ph_a, ph_b, dist = ph_a[first], ph_b[first], dist[first]
    pairs = pd.DataFrame({"ph_a": pd.Series(ph_a, dtype=np.int64),
                          "ph_b": pd.Series(ph_b, dtype=np.int64),
                          "dist": pd.Series(dist, dtype=np.int64)})
    # same hash from several slices carries the identical global min id
    ph_map, id_map = _minid_per_key(res_ph, res_id)
    return pairs, ph_map, id_map


def _lookup_minid(ph_map: np.ndarray, id_map: np.ndarray,
                  col: np.ndarray) -> np.ndarray:
    pos = np.minimum(np.searchsorted(ph_map, col), len(ph_map) - 1) \
        if len(ph_map) else np.zeros(len(col), dtype=np.int64)
    if len(col) and (not len(ph_map) or not (ph_map[pos] == col).all()):
        missing = col if not len(ph_map) else col[ph_map[pos] != col]
        raise KeyError(
            f"_lookup_minid: {len(missing)} pair hash(es) missing from "
            "the in-task id resolution — pairing and resolution ride "
            "the same stream, so this indicates a bug, not input skew")
    return id_map[pos]


def _resolve_ids(ds, phash_col: str, id_col: str,
                 ph_pairs: pd.DataFrame) -> pd.DataFrame:
    """Map hash pairs to (id_a, id_b, dist) with the GLOBAL min id as
    each hash's representative via one pruned execution of ``ds``
    (broadcast matched hashes, per-block min-id partials — tiny by
    construction).  Used by streams that pair WITHOUT ids riding the
    band cells (the image pipeline's pass-2 payloads)."""
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
    a = _lookup_minid(ph_u, id_u, ph_pairs["ph_a"].to_numpy())
    b = _lookup_minid(ph_u, id_u, ph_pairs["ph_b"].to_numpy())
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
    max_dist, one representative id (the global min) per distinct hash
    value.  The dense census picks the path: ``prune`` (collisions rare
    — ship only multi-member buckets' rows) or ``mih_shuffle``
    (collisions the norm at n >> 2^16 per band — ship the whole deduped
    band stream; the filter would keep ~everything anyway).  Both paths
    end in the same slice-addressed flat-task pairing; results are
    path-independent.

    ``scheme='2x32f1'`` switches to the exact-recall banding
    (:func:`_scheme_keys`): recall is EXACT for max_dist <= 5 instead
    of exact-to-3/~90%-at-4, at 66 keys/row instead of 4 — no census
    (32-bit bands make collisions rare, and every candidate is
    popcount-verified anyway).

    ``ds`` is consumed up to TWICE (census, band stream) — the band
    cells carry block-min ids, so pairing tasks resolve global
    representative ids in the same visit and the id-resolution pass of
    earlier rounds is gone.  For a cheap pruned parquet read two reads
    are the right trade; when ``ds`` is a COMPUTED chain (e.g. SimHash
    signatures), pass ``materialize_input=True`` so the chain executes
    once.
    """
    if num_parts is None:
        num_parts = default_num_parts()
    if materialize_input:
        ds = ds.materialize()
    hot_ref = None
    if scheme == "2x32f1":
        if max_dist > 5:
            raise ValueError("2x32f1 guarantees recall only to dist 5")
    elif scheme == "4x16":
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
    else:
        raise ValueError(f"unknown banding scheme {scheme!r}")
    band_ds = _band_stream(ds, phash_col, id_col, num_parts,
                           scheme=scheme, hot_ref=hot_ref)
    ph_pairs, ph_map, id_map = _pair_ids(band_ds.materialize(), num_parts,
                                         max_dist, bucket_cap, scheme)
    if not len(ph_pairs):
        return pd.DataFrame(_EMPTY_PAIRS)
    a = _lookup_minid(ph_map, id_map, ph_pairs["ph_a"].to_numpy())
    b = _lookup_minid(ph_map, id_map, ph_pairs["ph_b"].to_numpy())
    swap = a > b
    out = pd.DataFrame({
        "id_a": pd.Series(np.where(swap, b, a)),
        "id_b": pd.Series(np.where(swap, a, b)),
        "dist": ph_pairs["dist"].to_numpy()})
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def phash_dedup_clusters(ds, *, phash_col: str = "phash",
                         id_col: str = "image_id", max_dist: int = 4,
                         num_parts: int | None = None,
                         bucket_cap: int = 4096,
                         scheme: str = "4x16",
                         materialize_input: bool = False):
    """Transitive near-duplicate CLUSTERS for the image/phash family —
    the keep-one-canonical step the minhash path already has (pairs
    name WHO matches; a dedup needs the components).

    r5 layout — clustering happens in HASH space, so exact-collision
    members never materialize anywhere (the r4 shape listed dup-hash
    member ids on the driver and built star edges in a Python loop,
    with a silent ``member_cap`` truncation):

    1. ONE fused pass over (id, phash) emits per block BOTH the exact
       value census partial (row counts per hash) and the id-carrying
       band cells — the census and band-stream executions of the old
       shape collapse into one;
    2. flat pairing tasks return verified hash pairs + the global min
       id per pair-touched hash, plus min ids for exact-dup hashes
       (owner-sliced, each resolved exactly once);
    3. the driver runs connected components over HASH-pair edges (dup
       hashes ride as self-nodes), assigns every component the minimum
       member min-id as its cluster id, and broadcasts one sorted
       (hash -> cluster id) map — bounded by pair-touched + dup hashes,
       never by rows;
    4. one labeling pass maps every row through its hash: rows sharing
       a hash join the hash's component implicitly (NO star edges, NO
       member listings, NO cap), unmatched rows label themselves.

    The transitive closure equals the closure of ALL row pairs at
    Hamming distance <= max_dist including dist 0 (recall caveats of
    the banding ``scheme`` apply to the near component — exact to d=3
    for 4x16, d=5 for 2x32f1).

    Two executions of ``ds`` total (fused pass + labeling) — pass
    ``materialize_input=True`` for computed chains.  Returns a Dataset
    (id, cluster_id, is_canonical); the canonical row of every cluster
    is its minimum id (the one a dedup keeps).
    """
    from ..stages.graph import _star_forest

    if num_parts is None:
        num_parts = default_num_parts()
    if materialize_input:
        ds = ds.materialize()

    def fused(t: pa.Table) -> pa.Table:
        from ..sketches import np_object

        ph_rows = t[phash_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ids_rows = np_object(t[id_col])
        vals, cnts = np.unique(ph_rows, return_counts=True)
        ph, minid = _minid_per_key(ph_rows, ids_rows)
        keys, kpr = _scheme_keys(ph, scheme)
        band = _pack_sliced(keys, np.repeat(ph, kpr), num_parts,
                            ids=np.repeat(minid, kpr))
        band = band.append_column(
            "kind", pa.array(["band"] * band.num_rows))
        census = pa.table({
            "slice": pa.array([-1], type=pa.int32()),
            "payload": pa.array([pickle.dumps((vals, cnts))],
                                type=pa.large_binary()),
            "kind": pa.array(["census"])})
        return pa.concat_tables([band, census])

    fused_out = ds.map_batches(
        fused, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=16384 if scheme == "2x32f1" else None).materialize()

    # exact value census fold: flat ray tasks over the materialized
    # blocks' refs (a Dataset execution pays ~0.5 s of flat scheduling
    # cost just to re-read KB-scale payload rows); hashes with >= 2
    # rows form components even without a near pair
    refs = fused_out.to_arrow_refs()
    futs = [_census_fold_task.remote(*refs[i:i + 32])
            for i in range(0, len(refs), 32)]
    parts = [p for p in ray.get(futs) if p is not None]
    vals, cnts = _merge_count_arrays(parts) if parts else (
        np.empty(0, np.int64), np.empty(0, np.int64))
    dup = vals[cnts >= 2].astype(np.int64)
    dup_ref = ray.put(dup)

    ph_pairs, ph_map, id_map = _pair_ids(
        fused_out, num_parts, max_dist, bucket_cap, scheme,
        dup_ref=dup_ref, kind="band")

    # hash-space connected components: pair edges + dup self-nodes
    node, root = _star_forest(ph_pairs["ph_a"].to_numpy(),
                              ph_pairs["ph_b"].to_numpy())
    all_h = np.unique(np.concatenate([node, dup]))
    root_of = all_h.copy()
    if len(node):
        pos = np.minimum(np.searchsorted(node, all_h), len(node) - 1)
        hit = node[pos] == all_h
        root_of[hit] = root[pos[hit]]
    if len(all_h):
        # every mapped hash has a resolved min id: pair hashes from the
        # task that paired them, dup hashes from their owner slice
        m = _lookup_minid(ph_map, id_map, all_h)
        order = np.lexsort((m, root_of))
        r_s, m_s = root_of[order], m[order]
        first = np.r_[True, r_s[1:] != r_s[:-1]]
        roots_u, cluster_min = r_s[first], m_s[first]
        cluster_of_hash = cluster_min[np.searchsorted(roots_u, root_of)]
    else:
        cluster_of_hash = np.empty(0, dtype=object)
    map_ref = ray.put((all_h, cluster_of_hash))

    def label(t: pa.Table) -> pa.Table:
        from ..sketches import np_object

        h_sorted, c_arr = ray.get(map_ref)
        ph = t[phash_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ids = np_object(t[id_col])
        out = ids.copy()
        if len(h_sorted):
            pos = np.minimum(np.searchsorted(h_sorted, ph),
                             len(h_sorted) - 1)
            hit = h_sorted[pos] == ph
            out[hit] = c_arr[pos[hit]]
        return pa.table({id_col: pa.array(ids),
                         "cluster_id": pa.array(out),
                         "is_canonical": pa.array(out == ids)})

    return ds.map_batches(label, batch_format="pyarrow",
                          zero_copy_batch=True)
