"""Slice-addressed scatter for packed payload streams.

The flat-task pairing pattern (one ray task per key slice over a
``materialize()``d packed stream) originally handed EVERY task the refs
of EVERY block and let each task filter its slice out.  On one node that
is free — blocks are plasma-shared and reads are zero-copy — but on a
multi-node cluster each task must FETCH every block, so bytes moved =
num_slices x stream size (thousands-fold amplification for the large
packed streams: the deduped Hamming band stream, the minhash keyed
stream).

This module makes every payload byte move ONCE: a small number of
scatter tasks split the packed ``(slice, payload)`` rows into one return
object PER SLICE (``num_returns=num_slices`` — the Ray idiom whose
return objects are owned by the caller, so no lifetime hazards from
``ray.put`` inside short-lived map workers), and pairing task ``s`` is
handed only slice-``s`` refs.  Bytes per payload: packed block ->
scatter task (locality-schedulable next to the block) -> the one pairing
task that owns its slice.

Sizing: Ray stores task returns under ~100 KB inline in the OWNER's
process, so pathologically small cells would pile the whole stream into
the driver heap.  Scatter tasks therefore group enough input blocks that
the expected per-slice cell clears ``TARGET_CELL_BYTES``; when the whole
stream is small the single-task case is trivially fine.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

# keep per-(task, slice) cells comfortably above Ray's ~100 KB
# inline-return bound so large streams live in plasma, not the driver
TARGET_CELL_BYTES = 128 * 1024


@ray.remote
def _scatter_task(num_slices: int, kind: str | None, *blocks):
    """Split packed (slice, payload[, kind]) rows of ``blocks`` into one
    list-of-payload-bytes return PER SLICE."""
    out: list[list[bytes]] = [[] for _ in range(num_slices)]
    for b in blocks:
        t = b
        if t.num_rows == 0:
            # Ray emits 0-row blocks with an EMPTY schema (no columns)
            # for input splits whose map UDF never ran — they carry no
            # payload and would KeyError on the column lookups below
            continue
        if kind is not None:
            t = t.filter(pc.equal(t["kind"], kind))
        sl = t["slice"].to_numpy(zero_copy_only=False)
        for s, p in zip(sl, t["payload"].to_pylist()):
            out[s].append(p)
    return tuple(out)


def scatter_slices(packed, num_slices: int, *, kind: str | None = None
                   ) -> list[list["ray.ObjectRef"]]:
    """Scatter a MATERIALIZED packed Dataset by its ``slice`` column.

    ``packed`` must have columns ``slice`` (int) and ``payload``
    (binary); rows with slice outside ``[0, num_slices)`` are the
    caller's bug.  When ``kind`` is given only rows with that ``kind``
    value participate (lets a mixed stream — e.g. pass-2 blocks carrying
    both violation tables and band payloads — scatter without a separate
    filtered copy; the non-matching rows are read once per scatter task,
    never shipped to pairing tasks).

    Returns ``per_slice`` where ``per_slice[s]`` is a list of ObjectRefs
    each resolving to a ``list[bytes]`` of slice-``s`` payloads.  Pass
    them as top-level ``*args`` to the per-slice task so Ray fetches
    exactly the bytes that task owns.
    """
    refs = packed.to_arrow_refs()
    if not refs:
        return [[] for _ in range(num_slices)]
    size = packed.size_bytes() or 0
    n_tasks = max(1, min(len(refs),
                         int(size // (num_slices * TARGET_CELL_BYTES))))
    grids = [
        _scatter_task.options(num_returns=num_slices).remote(
            num_slices, kind, *(refs[i] for i in group))
        for group in np.array_split(np.arange(len(refs)), n_tasks)
        if len(group)]
    return [[g[s] for g in grids] for s in range(num_slices)]
