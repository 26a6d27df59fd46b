"""End-to-end validation of the image+caption table (the north-rule
pipeline): schema assert, NaN-token canonicalization, per-column
profiles, Tukey/MAD row evidence, null-rate budget, uniqueness,
referential integrity, per-partition PSI drift, decode verification,
and phash near-duplicates — composed from the engine's validators, one
Dataset pipeline per shuffle-keyed concern (SURVEY §7.1 execution shape).

Checks and thresholds map 1:1 to FIXTURES.md recipes R1-R7; the verdict
composition is the reference's OR-merge (experiment.py:441-445): a
partition FAILs if ANY check exceeds its budget.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..functions.strings import canonicalize_nan_tokens
from ..profile import profile_dataset
from ..validators import drift, near_dup, referential, row_checks as rc, uniqueness

EXPECTED_FIELDS = {
    "image_id": pa.string(), "bytes": pa.large_binary(),
    "w": pa.int32(), "h": pa.int32(), "fmt": pa.string(),
    "caption": pa.string(), "phash": pa.int64(),
}


def assert_schema(ds) -> list[str]:
    """Schema validator: the declared input_hint schema is ASSERTED, not
    inferred (engine inverts XCopySchemaTransformer's coercion)."""
    schema = ds.schema()
    errors = []
    have = dict(zip(schema.names, schema.types))
    for name, typ in EXPECTED_FIELDS.items():
        if name not in have:
            errors.append(f"missing column {name}")
        elif have[name] != typ and not (
                pa.types.is_binary(have[name]) and pa.types.is_binary(typ)
                or pa.types.is_large_binary(have[name])):
            errors.append(f"{name}: {have[name]} != {typ}")
    return errors


def _prep(batch: pa.Table) -> pa.Table:
    """Canonicalize caption NaN tokens + derive caption_len."""
    cap = canonicalize_nan_tokens(batch["caption"])
    batch = batch.set_column(batch.column_names.index("caption"),
                             "caption", cap)
    # caption_len stays NULL for null captions: the null-rate budget is
    # its own check; the length distribution (profile + PSI) describes
    # present values only.
    clen = pc.utf8_length(cap)
    return batch.append_column("caption_len", pc.cast(clen, pa.int64()))


@dataclass
class ImageValidationReport:
    verdicts: pd.DataFrame
    profile: Any
    stat_violations: Any = None          # Dataset: flagged rows
    dup_ids: pd.DataFrame | None = None
    orphans: pd.DataFrame | None = None
    drift_psi: pd.DataFrame | None = None
    decode_violations: pd.DataFrame | None = None
    neardup_groups: pd.DataFrame | None = None
    neardup_pairs: pd.DataFrame | None = None
    schema_errors: list = field(default_factory=list)

    def failed_partitions(self) -> dict[str, list[int]]:
        out = {}
        for check in [c for c in self.verdicts.columns if c.endswith("_fail")]:
            out[check[:-5]] = sorted(
                self.verdicts.loc[self.verdicts[check] == 1,
                                  "partition_id"].astype(int).tolist())
        return out


def validate_images(images_dir: str, captions_path: str | None = None, *,
                    ref_partitions: tuple[int, ...] = (0, 1, 2),
                    stat_budget: float = 0.005,
                    null_budget: float = 0.05,
                    psi_budget: float = 0.2,
                    decode: bool = True,
                    decode_concurrency: int | None = None,
                    neardup: bool = True) -> ImageValidationReport:
    # bytes is ~95% of the table; every metadata concern reads a
    # column-pruned projection and only the decode stage reads payloads.
    META_COLS = ["image_id", "w", "h", "fmt", "caption", "phash",
                 "partition_id"]
    ds = rd.read_parquet(images_dir)
    schema_errors = assert_schema(ds)
    meta = rd.read_parquet(images_dir, columns=META_COLS)
    prepped = meta.map_batches(_prep, batch_format="pyarrow",
                               zero_copy_batch=True)

    # ---- profile job over the clean reference partitions (fit phase) ----
    ref_set = list(ref_partitions)
    ref_ds = prepped.map_batches(
        lambda t: t.filter(pc.is_in(t["partition_id"],
                                    value_set=pa.array(ref_set, type=t["partition_id"].type))),
        batch_format="pyarrow")
    prof = profile_dataset(
        ref_ds, columns=["w", "h", "caption_len", "caption", "fmt"])

    # ---- validate job: row evidence + null flags, one streaming pass ----
    # fences on w/h only: caption_len is log-normal by construction, so
    # its heavy tail is a DISTRIBUTION property (checked via PSI below),
    # not a per-row anomaly — Tukey on it would flag ~4% of clean rows.
    states = rc.fence_states(prof, ["w", "h"])
    checked = rc.check_rows(prepped, states)

    def add_null_flag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "caption_null",
            pc.cast(pc.is_null(t["caption"]), pa.int8()))

    checked = checked.map_batches(add_null_flag, batch_format="pyarrow")

    # stat + null budgets in ONE streaming pass over the checked rows
    summary = rc.partition_check_summary(
        checked, "partition_id",
        {"stat": ((rc.TUKEY_TOTAL, rc.MAD_TOTAL), stat_budget),
         "null": (("caption_null",), null_budget)})

    stat_viol = checked.map_batches(
        lambda t: t.filter(pc.or_(pc.greater(t[rc.TUKEY_TOTAL], 0),
                                  pc.greater(t[rc.MAD_TOTAL], 0))),
        batch_format="pyarrow").drop_columns(["caption"])

    # ---- uniqueness on image_id (R3) ----
    ids_ds = rd.read_parquet(images_dir, columns=["image_id",
                                                  "partition_id"])
    dup_df = uniqueness.duplicate_keys(
        ids_ds.select_columns(["image_id"]), ["image_id"]).to_pandas()
    dup_parts = None
    if len(dup_df):
        # locate which partitions the duplicate ids live in (broadcast
        # the small dup-id set, filter in map_batches — no shuffle)
        import ray as _ray
        dup_ref = _ray.put(set(dup_df["image_id"]))

        def locate(t: pa.Table) -> pa.Table:
            ids = set(_ray.get(dup_ref))
            mask = pa.array([i in ids for i in t["image_id"].to_pylist()])
            return t.select(["image_id", "partition_id"]).filter(mask)

        dup_parts = (ids_ds.map_batches(locate, batch_format="pyarrow")
                     .to_pandas())

    # ---- referential integrity vs captions (R4) ----
    orphan_df = None
    if captions_path is not None:
        caps = rd.read_parquet(captions_path, columns=["image_id"])
        orphan_df = referential.orphans(
            ids_ds.select_columns(["image_id"]), caps, "image_id",
            direction="both").to_pandas()

    # ---- drift per partition vs the reference profile (R6) ----
    # all histograms + fmt counts in ONE pass over the pruned projection
    psi_rows = []
    edges_wh = np.array([0, 48, 80, 112, 160, 8192], dtype=float)
    edges_cap = np.arange(0.0, 220.0, 20.0)
    per_part, cat_part = drift.partition_histograms(
        prepped, {"w": edges_wh, "h": edges_wh, "caption_len": edges_cap},
        ["fmt"], "partition_id")
    ref_hists = {col: np.sum([hists[p] for p in ref_set if p in hists],
                             axis=0)
                 for col, hists in per_part.items()}
    fmt_counts = cat_part["fmt"]
    fmt_cats = sorted({c for d in fmt_counts.values() for c in d})
    fmt_ref = np.array([sum(fmt_counts[p].get(c, 0)
                            for p in ref_set if p in fmt_counts)
                        for c in fmt_cats], dtype=float)
    for pid in sorted(per_part["w"].keys()):
        row = {"partition_id": pid}
        for col in ("w", "h", "caption_len"):
            row[f"psi_{col}"] = drift.psi_from_counts(
                ref_hists[col], per_part[col][pid])
        row["psi_fmt"] = drift.psi_from_counts(
            fmt_ref, [fmt_counts.get(pid, {}).get(c, 0) for c in fmt_cats])
        row["drift_fail"] = int(
            pid not in ref_set and max(
                row["psi_w"], row["psi_h"], row["psi_caption_len"],
                row["psi_fmt"]) > psi_budget)
        psi_rows.append(row)
    drift_df = pd.DataFrame(psi_rows)

    # ---- decode verification (R7, actor pool) ----
    decode_df = None
    if decode:
        from ..stages.decode import decode_verify
        payload_ds = rd.read_parquet(
            images_dir, columns=["image_id", "bytes", "w", "h", "fmt",
                                 "phash", "partition_id"])
        dv = decode_verify(payload_ds, concurrency=decode_concurrency)
        decode_df = dv.map_batches(
            lambda t: t.filter(pc.equal(t["decode_ok"], 0))
            .select(["image_id", "partition_id", "fmt", "decode_reason"]),
            batch_format="pyarrow").to_pandas()

    # ---- near-duplicates on phash (R5) ----
    nd_groups = nd_pairs = None
    if neardup:
        ph_ds = rd.read_parquet(images_dir, columns=["image_id", "phash"])
        nd_groups = near_dup.duplicate_phash_groups(ph_ds).to_pandas()
        nd_pairs = near_dup.hamming_neardup_pairs(ph_ds)

    # ---- verdict composition (OR-merge) ----
    verdicts = summary.merge(drift_df[["partition_id", "drift_fail"]],
                             on="partition_id")
    uniq_fail = set()
    if dup_parts is not None and len(dup_parts):
        uniq_fail = set(dup_parts["partition_id"].astype(int))
    verdicts["uniq_fail"] = verdicts["partition_id"].astype(int).map(
        lambda p: int(p in uniq_fail))
    decode_fail = set()
    if decode_df is not None and len(decode_df):
        decode_fail = set(decode_df["partition_id"].astype(int))
    verdicts["decode_fail"] = verdicts["partition_id"].astype(int).map(
        lambda p: int(p in decode_fail))
    fail_cols = [c for c in verdicts.columns if c.endswith("_fail")]
    verdicts["fail"] = (verdicts[fail_cols].max(axis=1)).astype(int)
    verdicts = verdicts.sort_values("partition_id").reset_index(drop=True)

    return ImageValidationReport(
        verdicts=verdicts, profile=prof, stat_violations=stat_viol,
        dup_ids=dup_df, orphans=orphan_df, drift_psi=drift_df,
        decode_violations=decode_df, neardup_groups=nd_groups,
        neardup_pairs=nd_pairs, schema_errors=schema_errors)
