"""Run manifest + per-partition checkpoint/resume for image validation
(north rule: "resumable from checkpoint with per-partition lineage +
metrics").

Layout under ``out_dir``::

    profile_<fingerprint>.json            # cached fit-phase artifact
    manifest.json                         # completed partitions + lineage
    partitions/partition=<pid>/verdict.json
    partitions/partition=<pid>/violations.parquet

Contracts:
- the profile artifact is keyed by an input fingerprint (paths + sizes
  of the reference partitions), so a resume NEVER mixes profiles from
  different inputs (SURVEY §7.6);
- per-partition outputs are written to a temp dir then atomically
  renamed; the manifest is rewritten (tmp + ``os.replace``) after each
  partition completes — a killed run loses at most the partition in
  flight;
- on resume, completed partitions are skipped and their input files are
  never read (the pending-partition filter is pushed into the read);
- cross-partition key checks (uniqueness, referential, near-dup) are
  run-scoped, not partition-scoped: they re-run over key columns only
  (bytes are never read for them) and their results are recorded in the
  manifest run section.  At 10^12-row scale these become incremental
  merges of per-partition key sketches — the per-partition HLL/count
  partials this engine already emits are the building blocks.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from .. import __version__
from ..profile import TableProfile, profile_dataset
from ..validators import drift, near_dup, referential, row_checks as rc, uniqueness
from .image_validation import _prep, assert_schema


def _fingerprint(paths: list[str]) -> str:
    h = hashlib.sha256()
    for p in sorted(paths):
        h.update(p.encode())
        h.update(str(os.path.getsize(p)).encode())
    return h.hexdigest()[:16]


def _atomic_write_json(path: str, obj) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, default=str)
    os.replace(tmp, path)


def discover_partitions(images_dir: str) -> dict[int, list[str]]:
    out: dict[int, list[str]] = {}
    for d in sorted(glob.glob(os.path.join(images_dir, "partition=*"))):
        pid = int(os.path.basename(d).split("=")[1])
        out[pid] = sorted(glob.glob(os.path.join(d, "*.parquet")))
    return out


def _load_or_build_profile(out_dir: str, ref_files: list[str],
                           ref_partitions) -> tuple[TableProfile, str]:
    fp = _fingerprint(ref_files)
    path = os.path.join(out_dir, f"profile_{fp}.json")
    if os.path.exists(path):
        with open(path) as f:
            return TableProfile.from_json(f.read()), fp
    ds = rd.read_parquet(ref_files)
    prof = profile_dataset(
        ds.map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True),
        columns=["w", "h", "caption_len", "caption", "fmt"],
        fingerprint=fp)
    _atomic_write_json(path, json.loads(prof.to_json()))
    return prof, fp


def run_validation(images_dir: str, out_dir: str, *,
                   captions_path: str | None = None,
                   ref_partitions: tuple[int, ...] = (0, 1, 2),
                   stat_budget: float = 0.005, null_budget: float = 0.05,
                   psi_budget: float = 0.2, decode: bool = True,
                   decode_concurrency: int | None = None,
                   run_global_checks: bool = True) -> dict:
    """Validate all partitions, skipping those already checkpointed.

    Returns the manifest dict (also persisted to ``manifest.json``)."""
    os.makedirs(os.path.join(out_dir, "partitions"), exist_ok=True)
    parts = discover_partitions(images_dir)
    manifest_path = os.path.join(out_dir, "manifest.json")
    manifest = {"engine_version": __version__, "images_dir": images_dir,
                "partitions": {}, "runs": []}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)

    ref_files = [f for p in ref_partitions for f in parts.get(p, [])]
    prof, prof_fp = _load_or_build_profile(out_dir, ref_files,
                                           ref_partitions)
    states = rc.fence_states(prof, ["w", "h"])

    # reference histograms for drift — cached beside the profile, keyed
    # by the same input fingerprint, so a resume never re-reads the
    # reference partitions
    edges_wh = np.array([0, 48, 80, 112, 160, 8192], dtype=float)
    edges_cap = np.arange(0.0, 220.0, 20.0)
    hist_cache = os.path.join(out_dir, f"refhists_{prof_fp}.json")
    if os.path.exists(hist_cache):
        with open(hist_cache) as f:
            cached = json.load(f)
        ref_hists = {k: np.asarray(v, dtype=np.int64)
                     for k, v in cached["hists"].items()}
        ref_fmt = cached["fmt"]
    else:
        ref_ds = rd.read_parquet(ref_files).map_batches(
            _prep, batch_format="pyarrow", zero_copy_batch=True)
        ref_hists = {
            "w": drift.histogram_counts(ref_ds, "w", edges_wh),
            "h": drift.histogram_counts(ref_ds, "h", edges_wh),
            "caption_len": drift.histogram_counts(ref_ds, "caption_len",
                                                  edges_cap),
        }
        ref_fmt = drift.categorical_counts(ref_ds, "fmt")
        _atomic_write_json(hist_cache, {
            "hists": {k: v.tolist() for k, v in ref_hists.items()},
            "fmt": ref_fmt})

    def _complete(p: int) -> bool:
        entry = manifest["partitions"].get(str(p))
        if entry is None or entry.get("profile_fp") != prof_fp:
            return False
        # trust but verify: the checkpoint is the OUTPUT, not the
        # manifest line — a deleted/partial partition dir re-runs
        return os.path.exists(os.path.join(
            out_dir, "partitions", f"partition={p}", "verdict.json"))

    pending = [p for p in sorted(parts) if not _complete(p)]

    import pickle

    from .image_validation import META_COLS

    states_blob = pickle.dumps(states)
    hist_specs = {"w": edges_wh, "h": edges_wh, "caption_len": edges_cap}

    def meta_pass(batch: pa.Table, _cache={}) -> pa.Table:
        """ONE fused pass per partition: evidence counts + violation
        listing + drift histograms + fmt counts (mirrors the fused
        execution shape of pipelines.image_validation)."""
        if "c" not in _cache:
            _cache["c"] = rc.RowChecker(states_blob)
        batch = _prep(batch)
        checked = _cache["c"](batch)
        nul = pc.cast(pc.is_null(checked["caption"]), pa.int8())
        checked = checked.append_column("caption_null", nul)
        tuk = checked[rc.TUKEY_TOTAL].to_numpy(zero_copy_only=False)
        mad = checked[rc.MAD_TOTAL].to_numpy(zero_copy_only=False)
        nularr = checked["caption_null"].to_numpy(zero_copy_only=False)
        viol = (tuk > 0) | (mad > 0)
        counts = (batch.num_rows, int(viol.sum()), int((nularr > 0).sum()))
        viol_tbl = checked.drop(["caption"]).filter(
            pa.array(viol | (nularr > 0)))
        hists = {}
        for col, edges in hist_specs.items():
            v = checked[col].cast(pa.float64()).combine_chunks() \
                .to_numpy(zero_copy_only=False)
            v = v[~np.isnan(v)]
            idx = np.clip(np.searchsorted(edges, v, side="right") - 1,
                          0, len(edges) - 2)
            hists[col] = np.bincount(idx, minlength=len(edges) - 1) \
                .astype(np.int64)
        from ..sketches import np_object
        fv, fc = np.unique(np_object(checked["fmt"]), return_counts=True)
        fmt_counts = dict(zip(fv.tolist(), fc.tolist()))
        # agg rows go to the driver; viol rows stay distributed and are
        # written straight to the partition's violations sink
        return pa.table({
            "kind": pa.array(["agg", "viol"]),
            "payload": pa.array(
                [pickle.dumps((counts, hists, fmt_counts)),
                 pickle.dumps(viol_tbl)], type=pa.large_binary())})

    for pid in pending:
        t0 = time.time()
        schema_errors = assert_schema(rd.read_parquet(parts[pid]))
        meta = rd.read_parquet(parts[pid], columns=META_COLS)
        n_rows = stat_viol = null_viol = 0
        cur_hists = {c: np.zeros(len(e) - 1, dtype=np.int64)
                     for c, e in hist_specs.items()}
        cur_fmt: dict = {}
        mp = meta.map_batches(meta_pass, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
        for r in mp.map_batches(
                lambda t: t.filter(pc.equal(t["kind"], "agg")),
                batch_format="pyarrow").take_all():
            (n, sv, nv), hi, fc = pickle.loads(r["payload"])
            n_rows += n
            stat_viol += sv
            null_viol += nv
            for c in cur_hists:
                cur_hists[c] += hi[c]
            for k, v in fc.items():
                cur_fmt[k] = cur_fmt.get(k, 0) + v

        cats = sorted(set(ref_fmt) | set(cur_fmt))
        psi = {c: drift.psi_from_counts(ref_hists[c], cur_hists[c])
               for c in cur_hists}
        psi["fmt"] = drift.psi_from_counts(
            [ref_fmt.get(c, 0) for c in cats],
            [cur_fmt.get(c, 0) for c in cats])

        decode_bad = 0
        decode_ids: list[str] = []
        if decode:
            from ..stages.decode import decode_verify
            payload_ds = rd.read_parquet(parts[pid])
            bad = decode_verify(payload_ds,
                                concurrency=decode_concurrency) \
                .map_batches(
                    lambda t: t.filter(pc.equal(t["decode_ok"], 0))
                    .select(["image_id", "decode_reason"]),
                    batch_format="pyarrow").take_all()
            decode_bad = len(bad)
            decode_ids = [r["image_id"] for r in bad[:100]]

        verdict = {
            "partition_id": pid,
            "n_rows": n_rows,
            "stat_viol": stat_viol,
            "stat_fail": int(n_rows > 0 and stat_viol / n_rows > stat_budget),
            "null_viol": null_viol,
            "null_fail": int(n_rows > 0 and null_viol / n_rows > null_budget),
            "psi": {k: round(v, 6) for k, v in psi.items()},
            "drift_fail": int(pid not in ref_partitions
                              and max(psi.values()) > psi_budget),
            "decode_viol": decode_bad,
            "decode_fail": int(decode_bad > 0),
            "decode_sample": decode_ids,
            "schema_errors": schema_errors,
        }
        verdict["fail"] = int(any(verdict[k] for k in
                                  ("stat_fail", "null_fail", "drift_fail",
                                   "decode_fail")) or bool(schema_errors))

        # atomic per-partition output: write to tmp dir, rename into place
        pdir = os.path.join(out_dir, "partitions", f"partition={pid}")
        tmp = pdir + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        viol_dir = os.path.join(tmp, "violations")
        os.makedirs(viol_dir, exist_ok=True)  # keep the dir even if empty
        if stat_viol or null_viol:
            # distributed write: violation blocks never concat on the
            # driver (capped per block, unbounded block count at scale)
            def _unpack(t: pa.Table) -> pa.Table:
                tabs = [pickle.loads(p) for p in
                        t.filter(pc.equal(t["kind"], "viol"))["payload"]
                        .to_pylist()]
                return pa.concat_tables(tabs, promote_options="default")

            mp.map_batches(_unpack, batch_format="pyarrow",
                           batch_size=None).write_parquet(viol_dir)
        _atomic_write_json(os.path.join(tmp, "verdict.json"), verdict)
        if os.path.exists(pdir):
            shutil.rmtree(pdir)
        os.replace(tmp, pdir)

        manifest["partitions"][str(pid)] = {
            "profile_fp": prof_fp,
            "inputs": [{"path": p, "bytes": os.path.getsize(p)}
                       for p in parts[pid]],
            "verdict": verdict,
            "wall_s": round(time.time() - t0, 3),
            "engine_version": __version__,
            "completed_at": time.time(),
        }
        _atomic_write_json(manifest_path, manifest)

    run_entry = {"started_at": time.time(), "pending": pending,
                 "profile_fp": prof_fp}
    if run_global_checks:
        all_files = [f for fs in parts.values() for f in fs]
        key_ds = rd.read_parquet(all_files, columns=["image_id", "phash"])
        dups = uniqueness.duplicate_keys(
            key_ds.select_columns(["image_id"]), ["image_id"])
        run_entry["uniqueness_violations"] = dups.num_rows
        run_entry["uniqueness_sample"] = dups["image_id"].to_pylist()[:50]
        nd = near_dup.duplicate_phash_groups(key_ds).to_pandas()
        run_entry["neardup_groups"] = len(nd)
        if captions_path is not None:
            orp = referential.orphans(
                key_ds.select_columns(["image_id"]),
                rd.read_parquet(captions_path, columns=["image_id"]),
                "image_id", direction="both").to_pandas()
            run_entry["referential_orphans"] = len(orp)
    manifest["runs"].append(run_entry)
    _atomic_write_json(manifest_path, manifest)
    return manifest
