"""Deterministic F-IMG fixture generator (FIXTURES.md).

One logical image+caption table in the exact BASELINE.json ``input_hint``
shape — (image_id: string, bytes: binary, w: int32, h: int32, fmt:
string, caption: string, phash: int64) — written as partitioned Parquet
(``images/partition={pid}/part.parquet``, Lance-layout-compatible) plus a
companion ``captions.parquet`` (image_id, caption) for referential
integrity.  Everything is a pure function of (seed, partition_id,
row_index); regenerating any scale yields identical tables.

Injection recipes R1-R7 are applied when ``inject=True`` and the
generator returns the exact expected outcomes so tests can pin verdicts.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .functions import imagecodec as ic
from .sketches import hash64

ADJS = ["quiet", "bright", "rusty", "smooth", "ancient", "tiny", "vast",
        "pale", "bold", "curved"]
NOUNS = ["harbor", "lantern", "valley", "engine", "forest", "window",
         "bridge", "garden", "signal", "mirror"]
VERBS = ["rests", "glows", "turns", "waits", "drifts", "hums", "leans",
         "shines", "floats", "stands"]

W_CHOICES = np.array([32, 64, 96, 128], dtype=np.int32)
W_PROBS = np.array([0.4, 0.3, 0.2, 0.1])
DRIFT_CHOICES = np.array([64, 96, 128, 192], dtype=np.int32)  # R6 shift


@dataclass
class FimgExpectations:
    outlier_w_ids: list = field(default_factory=list)        # R1
    null_caption_partition: int = 5                           # R2
    dup_ids: list = field(default_factory=list)               # R3
    orphan_image_ids: list = field(default_factory=list)      # R4 images w/o caption
    orphan_caption_ids: list = field(default_factory=list)    # R4 captions w/o image
    exact_pairs: list = field(default_factory=list)           # R5 same phash
    hamming_pairs: list = field(default_factory=list)         # R5 (a, b, dist)
    hot_phash: int | None = None                              # R5 skew value
    hot_count: int = 0
    drift_partition: int = 7                                  # R6
    bad_decode_ids: list = field(default_factory=list)        # R7


def _rng(seed: int, pid: int, i: int, tag: int = 0) -> np.random.Generator:
    key = int(hash64([f"{seed}/{pid}/{i}/{tag}"])[0])
    return np.random.default_rng(key)


def _caption(seed: int, pid: int, i: int, stretch: float = 1.0) -> str:
    rng = _rng(seed, pid, i, tag=1)
    target = int(np.clip(rng.lognormal(3.4, 0.5) * stretch, 5, 200))
    words = []
    n = 0
    while n < target:
        w = f"a {ADJS[rng.integers(10)]} {NOUNS[rng.integers(10)]} {VERBS[rng.integers(10)]}"
        words.append(w)
        n += len(w) + 1
    return " ".join(words)[:200]


def _make_image(content_key: str, w: int, h: int, fmt: str, seed: int
                ) -> tuple[bytes, int]:
    img = ic.synth_image(content_key, w, h, seed=seed)
    data = ic.encode_ppm(img) if fmt == "ppm" else ic.encode_qraw(img)
    decoded = ic.decode(data, fmt)
    return data, ic.average_hash(decoded)


def generate_partition(pid: int, rows: int, seed: int = 42, *,
                       inject: bool = True, partitions: int = 8
                       ) -> tuple[pa.Table, list[tuple[str, str]], dict]:
    """Build one partition table + its caption rows + local expectations."""
    drift = inject and pid == 7 and partitions > 7
    info: dict = {"outlier_ids": [], "dup_ids": [], "orphan_image_ids": [],
                  "exact_pairs": [], "hamming_pairs": [], "hot": [],
                  "bad_decode_ids": []}
    ids, blobs, ws, hs, fmts, captions, phashes = [], [], [], [], [], [], []
    n_outlier = max(1, rows // 100) if (inject and pid == 3) else 0
    for i in range(rows):
        image_id = f"img-{pid:04d}-{i:07d}"
        rng = _rng(seed, pid, i)
        choices = DRIFT_CHOICES if drift else W_CHOICES
        w = int(choices[rng.choice(4, p=W_PROBS)])
        h = int(choices[rng.choice(4, p=W_PROBS)])
        if drift:
            fmt = "ppm" if rng.random() < 0.5 else "qraw"
        else:
            fmt = "ppm" if rng.random() < 0.9 else "qraw"
        content_key = image_id
        stretch = 1.5 if drift else 1.0
        caption = _caption(seed, pid, i, stretch)

        if inject and pid == 3 and i < n_outlier:          # R1 outlier-w
            w, h = 4096, 32
            info["outlier_ids"].append(image_id)
        if inject and pid == 6 and i < 10 and partitions > 6:  # R3 dup ids
            image_id = f"img-{1:04d}-{i:07d}"
            info["dup_ids"].append(image_id)
        if inject and pid == 4 and i < 40 and partitions > 4:  # R5 exact pairs
            content_key = f"pair-{pid}-{i // 2}"
            if i % 2 == 1:
                info["exact_pairs"].append(
                    (f"img-{pid:04d}-{i-1:07d}", image_id))
        if inject and i >= rows - max(2, rows // 50) \
                and pid < min(7, partitions):  # R5 hot phash (2% of rows)
            content_key = "hot-phash-content"
            w = h = 64
            fmt = "ppm"
            info["hot"].append(image_id)

        data, ph = _make_image(content_key, w, h, fmt, seed)

        if inject and pid == 4 and 40 <= i < 60 and partitions > 4:
            # R5 hamming pairs: same content, flip a few pixels
            base_key = f"ham-{i // 2}"
            img = ic.synth_image(base_key, 64, 64, seed=seed)
            if i % 2 == 1:
                img = img.copy()
                img[0:8, 0:8, :] ^= 255  # invert one hash cell -> dist ~1-3
            w = h = 64
            fmt = "ppm"
            data = ic.encode_ppm(img)
            ph = ic.average_hash(img)
            if i % 2 == 1:
                prev = phashes[-1]
                dist = int(ic.hamming64(np.int64(prev), np.int64(ph))[0])
                info["hamming_pairs"].append(
                    (f"img-{pid:04d}-{i-1:07d}", image_id, dist))

        if inject and pid == 2 and partitions > 2:
            r7 = rows // 2                                   # scale-relative
            if r7 <= i < r7 + 5:                             # R7 truncated
                data = data[:max(8, len(data) // 2)]
                info["bad_decode_ids"].append(image_id)
            elif r7 + 5 <= i < r7 + 10:                      # R7 fmt lies
                img = ic.synth_image(content_key, w, h, seed=seed)
                data = ic.encode_qraw(img)
                fmt = "ppm"
                info["bad_decode_ids"].append(image_id)

        if inject and pid == 5 and i % 5 == 0 and partitions > 5:  # R2 nulls
            caption = None if i % 10 == 0 else "NaN"

        ids.append(image_id)
        blobs.append(data)
        ws.append(w)
        hs.append(h)
        fmts.append(fmt)
        captions.append(caption)
        phashes.append(ph)

    table = pa.table({
        "image_id": pa.array(ids, type=pa.string()),
        "bytes": pa.array(blobs, type=pa.large_binary()),
        "w": pa.array(ws, type=pa.int32()),
        "h": pa.array(hs, type=pa.int32()),
        "fmt": pa.array(fmts, type=pa.string()),
        "caption": pa.array(captions, type=pa.string()),
        "phash": pa.array(phashes, type=pa.int64()),
        "partition_id": pa.array(np.full(rows, pid, dtype=np.int32)),
    })

    cap_rows = []
    for image_id, caption in zip(ids, captions):
        if inject and pid == 2 and partitions > 2:
            idx = int(image_id.split("-")[-1])
            r4 = rows // 4                                   # scale-relative
            if r4 <= idx < min(rows, r4 + 25):              # R4 orphan images
                info["orphan_image_ids"].append(image_id)
                continue
        cap_rows.append((image_id, caption if caption is not None else ""))
    return table, cap_rows, info


def generate_fimg(out_dir: str, *, partitions: int = 8, rows: int = 5000,
                  seed: int = 42, inject: bool = True,
                  use_ray: bool = False) -> FimgExpectations:
    """Generate the partitioned image table + captions; returns expected
    outcomes.  ``use_ray=True`` fans partition generation out as Ray
    tasks (bench-scale path)."""
    os.makedirs(out_dir, exist_ok=True)
    exp = FimgExpectations()

    def _gen_write(pid: int):
        """Generate AND write one partition locally in the task — only
        the small caption/info side returns to the driver (the 8-GB
        scale table never moves through the object store)."""
        table, caps, info = generate_partition(pid, rows, seed,
                                               inject=inject,
                                               partitions=partitions)
        pdir = os.path.join(out_dir, "images", f"partition={pid}")
        os.makedirs(pdir, exist_ok=True)
        pq.write_table(table, os.path.join(pdir, "part.parquet"))
        hot_hash = None
        if info["hot"]:
            hot_set = set(info["hot"])
            for iid, ph in zip(table["image_id"].to_pylist(),
                               table["phash"].to_pylist()):
                if iid in hot_set:
                    hot_hash = ph
                    break
        return caps, info, hot_hash

    if use_ray:
        import ray
        gen = ray.remote(_gen_write)
        results = ray.get([gen.remote(p) for p in range(partitions)])
    else:
        results = [_gen_write(p) for p in range(partitions)]

    all_caps: list[tuple[str, str]] = []
    hot_hashes = []
    for pid, (caps, info, hot_hash) in enumerate(results):
        all_caps.extend(caps)
        exp.outlier_w_ids.extend(info["outlier_ids"])
        exp.dup_ids.extend(info["dup_ids"])
        exp.orphan_image_ids.extend(info["orphan_image_ids"])
        exp.exact_pairs.extend(info["exact_pairs"])
        exp.hamming_pairs.extend(info["hamming_pairs"])
        exp.bad_decode_ids.extend(info["bad_decode_ids"])
        if info["hot"]:
            exp.hot_count += len(info["hot"])
            if hot_hash is not None:
                hot_hashes.append(hot_hash)
    if hot_hashes:
        exp.hot_phash = hot_hashes[0]

    # R4: caption-side orphans (ids that never existed as images)
    if inject:
        for k in range(5):
            oid = f"img-orph-{k:07d}"
            all_caps.append((oid, f"orphan caption {k}"))
            exp.orphan_caption_ids.append(oid)

    cap_table = pa.table({
        "image_id": pa.array([c[0] for c in all_caps], type=pa.string()),
        "caption": pa.array([c[1] for c in all_caps], type=pa.string()),
    })
    # small row groups: a single-file parquet read parallelizes only at
    # row-group granularity — default ~1Mi-row groups serialize the
    # caption-census branch of image-validation pass 1
    pq.write_table(cap_table, os.path.join(out_dir, "captions.parquet"),
                   row_group_size=65536)
    return exp


FIMG_CACHE_VERSION = 2  # bump when codec/hash semantics change


def fimg_cache_dir(base: str, partitions: int, rows: int, seed: int,
                   inject: bool) -> str:
    return os.path.join(
        base, f"fimg_v{FIMG_CACHE_VERSION}_p{partitions}_r{rows}_s{seed}"
        f"_{'inj' if inject else 'clean'}")


def ensure_fimg(base: str = "/tmp/autoprepad_fimg", *, partitions: int = 8,
                rows: int = 5000, seed: int = 42, inject: bool = True,
                use_ray: bool = False) -> tuple[str, FimgExpectations | None]:
    """Generate-once cache: returns (dir, expectations-or-None-if-cached)."""
    d = fimg_cache_dir(base, partitions, rows, seed, inject)
    done = os.path.join(d, "_DONE")
    if os.path.exists(done):
        return d, None
    exp = generate_fimg(d, partitions=partitions, rows=rows, seed=seed,
                        inject=inject, use_ray=use_ray)
    with open(done, "w") as f:
        f.write("ok")
    return d, exp


# ---------------------------------------------------------------------------
# F-MIXED: schema-inference / EVSE-style table (FIXTURES.md §F-MIXED)
# Mirrors the reference's own seeded-anomaly example
# (XCopySchemaTransformer.py:134-162, defaults.py:113-170 dummy_data).


PLATFORMS = ["android", "ios", "web"]
AVAILABILITY = ["available", "occupied", "offline"]


def generate_fmixed(n: int = 1000, seed: int = 42) -> tuple[pa.Table, dict]:
    """Deterministic mixed-type table with labeled anomalies (y_true).

    Anomaly recipes (each row flagged y_true=1):
    - availability misspelled ('avaiable', 'ocupied');
    - timestamp in the wrong year (1999 vs 2023);
    - invalid uuid (wrong shape);
    - locationId -9999 sentinel;
    - rare platform class ('blackberry').
    """
    rng = np.random.default_rng(seed)
    rows = []
    expected = {"misspelled": [], "wrong_year": [], "bad_uuid": [],
                "sentinel_loc": [], "rare_platform": []}
    hexd = "0123456789abcdef"
    for i in range(n):
        r = _rng(seed, 0, i, tag=9)
        evseid = f"DE*A{r.integers(10)}{r.integers(10)}*E{r.integers(10000, 99999)}"
        loc = float(r.integers(1000, 9999))
        uuid = "".join(hexd[r.integers(16)] for _ in range(8)) + "-" + \
            "".join(hexd[r.integers(16)] for _ in range(4)) + "-" + \
            "".join(hexd[r.integers(16)] for _ in range(12))
        platform = PLATFORMS[r.integers(3)]
        availability = AVAILABILITY[r.integers(3)]
        ts = (f"2023-{r.integers(1, 13):02d}-{r.integers(1, 28):02d} "
              f"{r.integers(24):02d}:{r.integers(60):02d}:00")
        y = 0
        if i % 97 == 0:
            availability = "avaiable" if i % 2 else "ocupied"
            y = 1
            expected["misspelled"].append(i)
        elif i % 89 == 0:
            ts = "1999-01-01 00:00:00"
            y = 1
            expected["wrong_year"].append(i)
        elif i % 83 == 0:
            uuid = "not-a-uuid-" + str(i)
            y = 1
            expected["bad_uuid"].append(i)
        elif i % 79 == 0:
            loc = -9999.0
            y = 1
            expected["sentinel_loc"].append(i)
        elif i % 73 == 0:
            platform = "blackberry"
            y = 1
            expected["rare_platform"].append(i)
        if i % 101 == 0 and y == 0:
            availability = "NaN"  # reference NaN token, not an anomaly
        rows.append((i, evseid, loc, uuid, platform, availability, ts, y))
    cols = list(zip(*rows))
    table = pa.table({
        "row_id": pa.array(cols[0], type=pa.int64()),
        "evseid": pa.array(cols[1], type=pa.string()),
        "locationId": pa.array(cols[2], type=pa.float64()),
        "uuid": pa.array(cols[3], type=pa.string()),
        "platform": pa.array(cols[4], type=pa.string()),
        "availability": pa.array(cols[5], type=pa.string()),
        "timestamp": pa.array(cols[6], type=pa.string()),
        "y_true": pa.array(cols[7], type=pa.int64()),
    })
    return table, expected


# ---------------------------------------------------------------------------
# F-MEDIA: audio + video tables for the multimodal media stages
# (beyond-reference surface; see functions/mediacodec.py docstring).
# Same purity rule as F-IMG: every payload is a function of (seed, id).


@dataclass
class FmediaExpectations:
    bad_audio_ids: list = field(default_factory=list)      # truncated/garbage
    stub_audio_ids: list = field(default_factory=list)     # real-world fmt -> stub
    truncated_video_ids: list = field(default_factory=list)
    neardup_video_pairs: list = field(default_factory=list)  # (a, b) sorted


def generate_fmedia(out_dir: str, *, audio_rows: int = 64,
                    video_rows: int = 24, seed: int = 42,
                    inject: bool = True) -> FmediaExpectations:
    """Write ``audio.parquet`` (audio_id, fmt, bytes) and
    ``videos.parquet`` (video_id, fmt, bytes).  Injections: one
    truncated audio, one garbage-magic audio, one real-world-format
    audio (exercises the codec stub), one truncated video, and two
    planted near-dup video pairs (shared ``content_key`` -> identical
    frames -> sampled-frame phashes collide)."""
    from .functions import mediacodec as mc

    os.makedirs(out_dir, exist_ok=True)
    exp = FmediaExpectations()

    a_ids, a_fmts, a_bytes = [], [], []
    for i in range(audio_rows):
        aid = f"aud-{i:06d}"
        rng = np.random.default_rng(int(hash64([aid], seed=seed)[0]) ^ 1)
        ns = int(rng.integers(4000, 24000))
        ch = 2 if i % 5 == 0 else 1
        payload = mc.encode_wavr(
            mc.synth_audio(aid, ns, 16_000, seed=seed, channels=ch), 16_000)
        fmt = "wavr"
        if inject and i == 3:
            payload = payload[:len(payload) // 2]          # truncated body
            exp.bad_audio_ids.append(aid)
        elif inject and i == 7:
            payload = b"JUNK" + payload[4:]                # garbage magic
            exp.bad_audio_ids.append(aid)
        elif inject and i == 11:
            fmt = "mp3"                                    # stub path
            exp.stub_audio_ids.append(aid)
        a_ids.append(aid)
        a_fmts.append(fmt)
        a_bytes.append(payload)
    pq.write_table(pa.table({
        "audio_id": pa.array(a_ids, type=pa.string()),
        "fmt": pa.array(a_fmts, type=pa.string()),
        "bytes": pa.array(a_bytes, type=pa.binary()),
    }), os.path.join(out_dir, "audio.parquet"))

    v_ids, v_fmts, v_bytes = [], [], []
    for i in range(video_rows):
        vid = f"vid-{i:06d}"
        content_key = vid
        if inject and i in (5, 13):     # near-dup partner of i-1
            content_key = f"vid-{i - 1:06d}"
            exp.neardup_video_pairs.append((f"vid-{i - 1:06d}", vid))
        frames = mc.synth_video(content_key, w=32, h=32, n_frames=8,
                                seed=seed)
        payload = mc.encode_vraw(frames, fps=8.0)
        if inject and i == 9:
            payload = payload[:mc.VRAW_HEADER + 32 * 32 * 3 * 3]  # 3 of 8 frames
            exp.truncated_video_ids.append(vid)
        v_ids.append(vid)
        v_fmts.append("vraw")
        v_bytes.append(payload)
    pq.write_table(pa.table({
        "video_id": pa.array(v_ids, type=pa.string()),
        "fmt": pa.array(v_fmts, type=pa.string()),
        "bytes": pa.array(v_bytes, type=pa.binary()),
    }), os.path.join(out_dir, "videos.parquet"))
    return exp


FMEDIA_CACHE_VERSION = 1


def ensure_fmedia(base: str = "/tmp/autoprepad_fmedia", *,
                  audio_rows: int = 64, video_rows: int = 24,
                  seed: int = 42, inject: bool = True
                  ) -> tuple[str, FmediaExpectations | None]:
    """Generate-once cache: returns (dir, expectations-or-None-if-cached)."""
    d = os.path.join(base, f"fmedia_v{FMEDIA_CACHE_VERSION}_a{audio_rows}"
                           f"_v{video_rows}_s{seed}"
                           f"_{'inj' if inject else 'clean'}")
    done = os.path.join(d, "_DONE")
    if os.path.exists(done):
        return d, None
    exp = generate_fmedia(d, audio_rows=audio_rows, video_rows=video_rows,
                          seed=seed, inject=inject)
    with open(done, "w") as f:
        f.write("ok")
    return d, exp
