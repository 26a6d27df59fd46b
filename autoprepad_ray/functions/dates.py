"""Datetime expansion — the reference's DateEncoder (DateEncoder.py:30-48):
each datetime column expands to YEAR / MONTH / WKDAY / HOUR / MINUTE /
SECOND integer columns.  pyarrow.compute kernels, zero row loops.
Weekday is Monday=0 (pandas ``.dt.weekday`` semantics, mirrored in SQL
as ``isodow - 1``)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

PARTS = ("YEAR", "MONTH", "WKDAY", "HOUR", "MINUTE", "SECOND")


def date_encode(batch: pa.Table, col: str, prefix: str | None = None) -> pa.Table:
    p = prefix or col
    arr = batch[col]
    batch = batch.append_column(f"{p}_YEAR", pc.cast(pc.year(arr), pa.int32()))
    batch = batch.append_column(f"{p}_MONTH", pc.cast(pc.month(arr), pa.int32()))
    batch = batch.append_column(
        f"{p}_WKDAY", pc.cast(pc.day_of_week(arr, count_from_zero=True,
                                             week_start=1), pa.int32()))
    batch = batch.append_column(f"{p}_HOUR", pc.cast(pc.hour(arr), pa.int32()))
    batch = batch.append_column(f"{p}_MINUTE", pc.cast(pc.minute(arr), pa.int32()))
    batch = batch.append_column(f"{p}_SECOND", pc.cast(pc.second(arr), pa.int32()))
    return batch
