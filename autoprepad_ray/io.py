"""Table IO: Lance is the nominal format (the north rule's storage), but
``lance`` is not importable in this sandbox (no network), so readers
fall back to Parquet with the identical logical layout
(``partition=<pid>/...`` directories, same schema).  All call sites go
through these helpers so the format swap is one place.
"""

from __future__ import annotations

import importlib
import os

import ray.data as rd


def lance_available() -> bool:
    try:
        importlib.import_module("lance")
        return True
    except ImportError:
        return False


def read_table(path: str, columns: list[str] | None = None, **kwargs):
    """Read a dataset directory/file: Lance when the path is a ``.lance``
    dataset and the library exists, CSV for ``.csv`` (the reference's
    caller-side source, main.py:16 ``pd.read_csv``), else Parquet."""
    stripped = path.rstrip("/")
    if stripped.endswith(".lance"):
        if not lance_available():
            raise ImportError(
                "lance not available in this environment; materialize the "
                "dataset as Parquet with the same partition layout")
        return rd.read_lance(path, columns=columns, **kwargs)
    if stripped.endswith(".csv"):
        ds = rd.read_csv(path, **kwargs)
        return ds.select_columns(columns) if columns else ds
    if stripped.endswith((".json", ".jsonl")):
        ds = rd.read_json(path, **kwargs)
        return ds.select_columns(columns) if columns else ds
    if stripped.endswith((".feather", ".arrow")):
        # Arrow IPC shards: no native Ray reader — fan one task out per
        # file (shard-parallel; the format is already columnar, so the
        # task is a zero-parse mmap + optional column prune)
        import glob as _glob

        import pyarrow as pa

        files = sorted(_glob.glob(path)) if any(
            ch in path for ch in "*?[") else [path]
        if not files:
            raise FileNotFoundError(
                f"no Arrow IPC files match {path!r}")

        def _load(t: "pa.Table") -> "pa.Table":
            import pyarrow.feather as feather
            tabs = [feather.read_table(p, columns=columns)
                    for p in t["path"].to_pylist()]
            return pa.concat_tables(tabs)

        return rd.from_items([{"path": f} for f in files]).map_batches(
            _load, batch_size=1, batch_format="pyarrow")
    if stripped.endswith(".txt"):
        # line-per-row corpus shards (the rawest LLM-corpus input);
        # one column named "text"
        return rd.read_text(path, **kwargs)
    return rd.read_parquet(path, columns=columns, **kwargs)


def write_partitioned(ds, out_dir: str, partition_col: str = "partition_id",
                      **kwargs) -> None:
    """Resumable output layout: one directory per partition value (the
    checkpoint unit used by pipelines.runner)."""
    os.makedirs(out_dir, exist_ok=True)
    ds.write_parquet(out_dir, partition_cols=[partition_col], **kwargs)
