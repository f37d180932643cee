"""Resumable partitioned output: bucketed parquet + per-partition manifests.

The reference has no checkpointing — a killed run restarts from zero and
outputs are even mutated after the fact (``sec_parser/cli.py:19-41,122-124``).
Here output is partitioned by a url-hash bucket; each completed bucket gets
a ``_manifest.json`` sidecar recording row count, byte count, and an input
fingerprint. On restart, :func:`resume_filter` drops rows of completed
buckets *before* extraction, so finished partitions are never reprocessed
(north rule: per-partition lineage manifests → killed run resumes).

The bucket id is a deterministic hash of the url (not Python ``hash()``,
which is salted per process), so the same corpus always lands in the same
buckets across runs and cluster sizes.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# FNV-64 prime powers (cycle 64): position-dependent byte weights for the
# vectorized polynomial hash below (built with Python-int pow to avoid
# numpy scalar-overflow warnings; uint64 wraparound downstream is intended).
_POW = np.array([pow(0x100000001B3, i, 1 << 64) for i in range(64)],
                dtype=np.uint64)

# Version of the url→bucket mapping, stamped into every bucket manifest.
# Changing url_bucket's hash (r2 moved crc32 → the FNV-poly/splitmix64
# scheme) remaps rows across buckets; a checkpoint written under another
# scheme would silently SKIP rows whose new bucket happens to be "done"
# and re-extract rows into fresh buckets (duplicates). A scheme mismatch
# therefore invalidates the bucket exactly like an input-fingerprint
# mismatch. Bump this string whenever url_bucket's arithmetic changes.
BUCKET_SCHEME = "fnvpoly64-splitmix64-v2"


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (same construction as stages/dedup.py)."""
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def url_bucket(urls: pa.ChunkedArray | pa.Array, n_buckets: int) -> pa.Array:
    """Stable bucket id per url, fully vectorized.

    Zero-copy view of the Arrow string buffers → per-byte weighted
    polynomial hash (position-dependent FNV-prime powers, uint64 wrap) →
    ``np.add.reduceat`` per row → splitmix64 finalize → ``% n_buckets``.
    No per-row Python (this runs in the resume filter and once per write
    wave over every row — the r1 crc32 loop was the hot spot there).
    Deterministic across processes/runs: pure arithmetic, no seed."""
    h = string_hash64(urls)
    return pa.array((h % np.uint64(n_buckets)).astype(np.int32),
                    type=pa.int32())


def string_hash64(strs: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Full 64-bit stable hash per string value — the un-bucketed core of
    :func:`url_bucket` (same zero-copy buffer walk + splitmix64 finish),
    exposed so multi-key coarse partitioning can combine per-column
    hashes without losing entropy to an early modulo."""
    arr = strs.combine_chunks() if isinstance(strs, pa.ChunkedArray) else strs
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    la = arr.cast(pa.large_binary())
    off_buf = np.frombuffer(la.buffers()[1], dtype=np.int64)
    offsets = off_buf[la.offset:la.offset + n + 1]
    data = np.frombuffer(la.buffers()[2], dtype=np.uint8)
    seg = data[offsets[0]:offsets[-1]].astype(np.uint64)
    rel = (offsets - offsets[0]).astype(np.int64)
    lengths = np.diff(rel)
    sums = np.zeros(n, dtype=np.uint64)
    if seg.size:
        pos = np.arange(seg.size, dtype=np.int64) - np.repeat(rel[:-1], lengths)
        weighted = (seg + np.uint64(1)) * _POW[pos & 63]
        nz = lengths > 0
        sums[nz] = np.add.reduceat(weighted, rel[:-1][nz])
    return _mix64(sums ^ (lengths.astype(np.uint64) << np.uint64(32)))


def add_bucket_column(ds, n_buckets: int = 64):
    def add(batch: pa.Table) -> pa.Table:
        return batch.append_column("bucket", url_bucket(batch["url"], n_buckets))
    return ds.map_batches(add, batch_format="pyarrow")


def input_fingerprint(corpus_path) -> str:
    """Fingerprint of the input partition set: shard paths + sizes.

    A changed input must invalidate completed-bucket checkpoints (a bucket
    id alone would silently skip reprocessing after the corpus changed —
    SURVEY.md §7.3 resume-correctness requirement)."""
    import hashlib

    if not isinstance(corpus_path, str) or not os.path.isdir(corpus_path):
        return ""
    parts = []
    for root, _, files in sorted(os.walk(corpus_path)):
        for f in sorted(files):
            p = os.path.join(root, f)
            parts.append(f"{os.path.relpath(p, corpus_path)}:{os.path.getsize(p)}")
    return hashlib.md5("|".join(parts).encode()).hexdigest()


def completed_buckets(out_dir: str, fingerprint: str = "",
                      n_buckets: int | None = None) -> set[int]:
    """Buckets with a manifest whose input fingerprint matches (empty
    fingerprint on either side = no check, for non-directory inputs) AND
    whose recorded bucketing scheme/count match the current run — a
    checkpoint written under a different url→bucket mapping (old hash, or
    different ``n_buckets``) maps rows to different bucket ids and must
    reprocess, not resume (silent skip/duplicate otherwise)."""
    done: set[int] = set()
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        if name.startswith("bucket="):
            manifest = os.path.join(out_dir, name, "_manifest.json")
            if os.path.exists(manifest):
                with open(manifest) as fh:
                    meta = json.load(fh)
                recorded = meta.get("input_fingerprint", "")
                if fingerprint and recorded and recorded != fingerprint:
                    continue  # input changed → bucket must reprocess
                if meta.get("bucket_scheme") != BUCKET_SCHEME:
                    continue  # bucketing hash changed → rows remapped
                if n_buckets is not None and \
                        meta.get("n_buckets") != n_buckets:
                    continue  # bucket count changed → rows remapped
                done.add(int(name.split("=", 1)[1]))
    return done


def completed_parquet_files(out_dir: str, fingerprint: str = "",
                            n_buckets: int | None = None) -> list[str]:
    """Parquet files of every COMPLETED bucket (see
    :func:`completed_buckets`) — the one listing the flagship's three
    resume-replay passes (content dedup, near dedup, consistency) all
    share (review finding: three drifting copies)."""
    files: list[str] = []
    for b in sorted(completed_buckets(out_dir, fingerprint, n_buckets)):
        bdir = os.path.join(out_dir, f"bucket={b}")
        files += [os.path.join(bdir, f) for f in sorted(os.listdir(bdir))
                  if f.endswith(".parquet")]
    return files


def resume_filter(ds, out_dir: str, n_buckets: int = 64,
                  fingerprint: str = ""):
    """Drop input rows whose output bucket already has a valid manifest."""
    done = completed_buckets(out_dir, fingerprint, n_buckets)
    if not done:
        return ds
    done_list = sorted(done)

    def keep(batch: pa.Table) -> pa.Table:
        buckets = url_bucket(batch["url"], n_buckets)
        mask = pc.invert(pc.is_in(buckets, value_set=pa.array(done_list,
                                                              type=pa.int32())))
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def clean_incomplete_buckets(out_dir: str, fingerprint: str = "",
                             n_buckets: int | None = None) -> None:
    """Remove bucket dirs without a valid manifest (crashed write, or a
    changed-input fingerprint, or a stale bucketing scheme). Without this,
    re-writing a bucket appends a second complete file set next to the
    crashed run's fragments and the bucket silently holds duplicate rows."""
    import shutil

    if not os.path.isdir(out_dir):
        return
    done = completed_buckets(out_dir, fingerprint, n_buckets)
    for name in os.listdir(out_dir):
        if not name.startswith("bucket="):
            continue
        if int(name.split("=", 1)[1]) not in done:
            shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)


def _stamp_bucket(out_dir: str, name: str, input_fingerprint: str,
                  n_buckets: int) -> tuple[int, int]:
    import pyarrow.parquet as pq

    bdir = os.path.join(out_dir, name)
    rows = bytes_ = nfiles = 0
    for f in os.listdir(bdir):
        if f.endswith(".parquet"):
            rows += pq.ParquetFile(os.path.join(bdir, f)).metadata.num_rows
            bytes_ += os.path.getsize(os.path.join(bdir, f))
            nfiles += 1
    with open(os.path.join(bdir, "_manifest.json"), "w") as fh:
        json.dump({"bucket": int(name.split("=", 1)[1]), "rows": rows,
                   "bytes": bytes_, "files": nfiles,
                   "input_fingerprint": input_fingerprint,
                   "bucket_scheme": BUCKET_SCHEME,
                   "n_buckets": n_buckets}, fh)
    return rows, 1


def write_partitioned(extracted_ds, out_dir: str, n_buckets: int = 64,
                      input_fingerprint: str = "",
                      run_metrics: dict | None = None,
                      n_waves: int = 4) -> dict:
    """Write one directory per bucket + manifest sidecars, in WAVES.

    Each wave writes a contiguous slice of buckets and stamps their
    manifests immediately, so a killed run loses at most one wave of work
    instead of the whole write (crash-safe incremental checkpointing; a
    bucket is only ever counted when its manifest exists, and
    :func:`clean_incomplete_buckets` removes crashed fragments before any
    re-write). Bucketed dirs — never one giant file. Each wave re-scans
    the materialized records once (~3-4 s per wave at 100k docs), so the
    wave count trades checkpoint granularity against write overhead; at
    cluster scale the clean implementation is a custom datasink with
    per-bucket completion callbacks.
    """
    ds = add_bucket_column(extracted_ds, n_buckets)
    pre_done = completed_buckets(out_dir, input_fingerprint, n_buckets)

    # bucket row counts up front: writing an EMPTY dataset with
    # partition_cols drops a stray file at the output root, breaking
    # hive-partition reads — empty buckets/waves must be skipped entirely
    def bucket_counts(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch["bucket"])
        return pa.table({"bucket": vc.field("values"),
                         "n": vc.field("counts")})

    counts: dict[int, int] = {}
    for r in ds.select_columns(["bucket"]).map_batches(
            bucket_counts, batch_format="pyarrow").take_all():
        counts[r["bucket"]] = counts.get(r["bucket"], 0) + r["n"]

    n_waves = max(1, min(n_waves, n_buckets))
    per_wave = (n_buckets + n_waves - 1) // n_waves
    for wi in range(n_waves):
        lo, hi = wi * per_wave, min((wi + 1) * per_wave, n_buckets)
        wave_buckets = [b for b in range(lo, hi)
                        if b not in pre_done and counts.get(b, 0) > 0]
        if not wave_buckets:
            continue
        wave_set = set(wave_buckets)

        wave_arr = pa.array(sorted(wave_set), type=pa.int32())

        def keep(batch: pa.Table, _wa=wave_arr) -> pa.Table:
            return batch.filter(pc.is_in(batch["bucket"], value_set=_wa))

        wave_ds = ds.map_batches(keep, batch_format="pyarrow")
        wave_ds.write_parquet(out_dir, partition_cols=["bucket"])
        for b in wave_buckets:
            name = f"bucket={b}"
            if os.path.isdir(os.path.join(out_dir, name)):
                _stamp_bucket(out_dir, name, input_fingerprint, n_buckets)

    total_rows = 0
    n_done = 0
    for name in sorted(os.listdir(out_dir)):
        if not name.startswith("bucket="):
            continue
        manifest = os.path.join(out_dir, name, "_manifest.json")
        if not os.path.exists(manifest):
            continue
        with open(manifest) as fh:
            total_rows += json.load(fh)["rows"]
        n_done += 1
    summary = {"rows": total_rows, "buckets": n_done}
    # run-level lineage record: config + metrics alongside the buckets
    # (north rule: per-partition lineage manifests AND metrics checkpointed)
    with open(os.path.join(out_dir, "_run_manifest.json"), "w") as fh:
        json.dump({**summary, "input_fingerprint": input_fingerprint,
                   "n_buckets": n_buckets,
                   "metrics": run_metrics or {}}, fh, indent=1)
    return summary
