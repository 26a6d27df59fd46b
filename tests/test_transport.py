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


def test_candidate_pairs_stay_distributed():
    """Directive: no driver-side list of ALL candidate pairs.  The
    candidate path must return a grid of per-(slice, part) cell refs —
    cells route each pair (with all its cross-slice duplicates) to one
    verify part — and its source must never collect pairs with
    pd.concat(ray.get(...)) (the round-3 pattern this replaces)."""
    import inspect

    from autoprepad_ray.stages import dedup

    src = inspect.getsource(dedup.candidate_pairs_grid)
    assert "pd.concat(ray.get" not in src

    # a tiny keyed stream with two hot buckets split across blocks
    keyed = rd.from_arrow([
        pa.table({"key": pa.array([1, 1, 2], type=pa.int64()),
                  "doc_id": pa.array([10, 11, 20], type=pa.int64())}),
        pa.table({"key": pa.array([1, 2, 3], type=pa.int64()),
                  "doc_id": pa.array([12, 21, 30], type=pa.int64())}),
    ])
    num_parts = 8
    grid = dedup.candidate_pairs_grid(keyed, 1000, num_slices=16,
                                      num_parts=num_parts)
    assert len(grid) == num_parts
    assert all(isinstance(c, ray.ObjectRef) for refs in grid
               for c in refs)
    seen = {}
    for p, refs in enumerate(grid):
        for cell in ray.get(refs):
            a, b = pickle.loads(cell)
            for pair in zip(a.tolist(), b.tolist()):
                # every copy of a pair lands in ITS one part
                assert seen.setdefault(pair, p) == p
    want = {(10, 11), (10, 12), (11, 12), (20, 21)}
    assert set(seen) == want
    # part assignment matches the deterministic worker-side hash
    ida = np.array([a for a, _ in seen], dtype=object)
    idb = np.array([b for _, b in seen], dtype=object)
    codes = dedup._pair_part_codes(ida, idb, num_parts)
    assert {p for p in seen.values()} == set(codes.tolist()) and all(
        seen[(a, b)] == c for a, b, c in zip(ida, idb, codes))


def test_minhash_dataset_output_equals_pandas():
    """output='dataset' (the zero-driver-materialization cluster path)
    must contain exactly the pandas-mode pairs, typed."""
    import pandas as pd

    from autoprepad_ray.stages.dedup import minhash_lsh_pairs

    import pyarrow.parquet as pq
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text"])
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    for k in range(5):
        ids.append(100000 + k)
        texts.append(" ".join(texts[k].split()[:-2]))
    tbl = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                    "text": pa.array(texts)})
    ds = rd.from_arrow(tbl).repartition(4)
    want = minhash_lsh_pairs(ds, "text", "doc_id", threshold=0.5)
    got_ds = minhash_lsh_pairs(ds, "text", "doc_id", threshold=0.5,
                               output="dataset")
    assert got_ds.schema().types[0] == pa.int64()
    got = got_ds.to_pandas().sort_values(["id_a", "id_b"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, want.astype({"id_a": np.int64, "id_b": np.int64}))
