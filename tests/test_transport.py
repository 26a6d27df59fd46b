"""Slice-addressed scatter (stages.transport): a pairing task must
receive ONLY its own slice's payload bytes — the round-2 flat-fanout
pattern shipped every block to every task, which is O(slices x stream)
network on a multi-node cluster."""

import pickle

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data as rd

from autoprepad_ray.stages.transport import scatter_slices


def _packed_ds(num_blocks, slices_per_block, num_slices, *, kind=None,
               seed=3):
    rng = np.random.default_rng(seed)
    tables = []
    for b in range(num_blocks):
        sl = rng.choice(num_slices, size=slices_per_block,
                        replace=False).astype(np.int32)
        cols = {
            "slice": pa.array(sl),
            # payload encodes (block, slice) so ownership is checkable
            "payload": pa.array(
                [pickle.dumps((b, int(s))) for s in sl],
                type=pa.large_binary())}
        if kind is not None:
            cols["kind"] = pa.array([kind] * len(sl))
        tables.append(pa.table(cols))
    return rd.from_arrow(tables).materialize()


def test_scatter_tasks_receive_only_their_slice():
    num_slices = 7
    packed = _packed_ds(5, 4, num_slices)
    per_slice = scatter_slices(packed, num_slices)
    assert len(per_slice) == num_slices
    seen = set()
    for s, refs in enumerate(per_slice):
        for cell in ray.get(refs):
            for blob in cell:
                b, sl = pickle.loads(blob)
                # the ownership property: nothing from another slice
                assert sl == s, (b, sl, s)
                seen.add((b, sl))
    # ...and every payload arrived exactly once somewhere
    expect = {pickle.loads(blob)
              for t in packed.to_arrow_refs()
              for blob in ray.get(t)["payload"].to_pylist()}
    assert seen == expect


def test_scatter_kind_filter_drops_other_rows():
    num_slices = 4
    band = _packed_ds(3, 3, num_slices, kind="band")
    # mix in viol-style rows that must never reach pairing tasks
    def add_viol(t: pa.Table) -> pa.Table:
        extra = pa.table({
            "slice": pa.array([-1], type=pa.int32()),
            "payload": pa.array([b"VIOLPAYLOAD"], type=pa.large_binary()),
            "kind": pa.array(["viol"])})
        return pa.concat_tables([t, extra])

    mixed = band.map_batches(add_viol, batch_format="pyarrow",
                             batch_size=None).materialize()
    per_slice = scatter_slices(mixed, num_slices, kind="band")
    blobs = [blob for refs in per_slice for cell in ray.get(refs)
             for blob in cell]
    assert blobs and all(b != b"VIOLPAYLOAD" for b in blobs)
    assert len(blobs) == 9


def test_scatter_empty_stream():
    empty = rd.from_arrow(pa.table({
        "slice": pa.array([], type=pa.int32()),
        "payload": pa.array([], type=pa.large_binary())})).materialize()
    per_slice = scatter_slices(empty, 5)
    assert all(not ray.get(refs) or all(not c for c in ray.get(refs))
               for refs in per_slice)


def test_segment_pairs_no_verify_enumerates_all_bucket_pairs():
    """verify=False must emit exactly the brute-force intra-bucket pair
    set (the LSH candidate mode reusing the size-class kernel)."""
    from autoprepad_ray.validators.near_dup import _segment_pairs

    rng = np.random.default_rng(11)
    n = 400
    keys = rng.integers(0, 40, size=n).astype(np.int64)
    ids = np.array([f"d{i:04d}" for i in rng.permutation(n)],
                   dtype=object)
    out = _segment_pairs(keys, ids, np.zeros(n, dtype=np.int64),
                         0, 10_000, verify=False)
    got = {(a, b) for a, b in zip(out["id_a"], out["id_b"])}
    want = set()
    for k in np.unique(keys):
        members = ids[keys == k]
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                a, b = members[i], members[j]
                want.add((a, b) if a < b else (b, a))
    assert got == want


@pytest.mark.parametrize("ids_dtype", ["str", "int"])
def test_verify_prefilter_hash_agreement(ids_dtype):
    """verify_pairs_routed's hash64 mask must match batch ids against
    candidate ids regardless of the id column type (pandas hashes
    int64-typed and object-typed arrays DIFFERENTLY — both sides go
    through object arrays)."""
    import pandas as pd

    from autoprepad_ray.stages.dedup import verify_pairs_routed

    if ids_dtype == "str":
        ids = [f"id{i}" for i in range(30)]
    else:
        ids = list(range(1000, 1030))
    tbl = pa.table({"doc_id": pa.array(ids),
                    "val": pa.array(np.arange(30, dtype=np.float64))})
    ds = rd.from_arrow(tbl).repartition(3)
    cand = pd.DataFrame({"id_a": [ids[1], ids[5]],
                         "id_b": [ids[2], ids[9]]})

    def extract(sub):
        return sub["val"].to_numpy(zero_copy_only=False).tolist()

    out = verify_pairs_routed(ds, "doc_id", cand, extract,
                              lambda a, b: a + b, "s")
    got = {(a, b): s for a, b, s in
           zip(out["id_a"], out["id_b"], out["s"])}
    assert got == {(ids[1], ids[2]): 3.0, (ids[5], ids[9]): 14.0}
