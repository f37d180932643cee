"""The flagship pipeline: corpus parquet → extraction records → output.

read_parquet → (resume filter) → skew split → dedup by url →
map_batches(ExtractDocuments actor pool) → grouped consistency/sequence
shuffles → partitioned, manifest-checkpointed parquet.

This is the rebuilt equivalent of the reference's whole CLI run
(``sec_parser/cli.py:80-144``) expressed as one lazy streaming Dataset
plan. The reference processed documents sequentially and patched outputs
in a second pass; here the cross-document steps run *before* the write.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..stages import consistency as CONS
from ..stages import manifest as MAN
from ..stages.extract import extract_dataset

# Payloads above this size get single-row blocks so one giant document
# can't stall a whole batch behind it (skew split; north rule).
SKEW_SPLIT_BYTES = 4 * 1024 * 1024


def split_oversized(ds, threshold: int = SKEW_SPLIT_BYTES):
    """Route oversized payloads into their own single-row blocks.

    Ray Data splits blocks dynamically on *output*, but a huge row inside a
    normal batch still serializes extraction of its batch-mates. Filtering
    into two sub-streams lets the big-doc stream run with batch_size=1
    while the normal stream keeps large batches. Returns (normal, big).
    """
    def is_big(batch: pa.Table) -> pa.Table:
        sizes = pc.binary_length(batch["html"])
        return batch.append_column("_big", pc.greater(sizes, threshold))

    tagged = ds.map_batches(is_big, batch_format="pyarrow")
    normal = tagged.filter(expr="_big == False").drop_columns(["_big"])
    big = tagged.filter(expr="_big == True").drop_columns(["_big"])
    return normal, big


def dedup_by_url(ds, *, n_parts: int = 64, apply: str = "broadcast"):
    """Exact dedup on url: keep the newest capture (max warc_ts) per url —
    WITHOUT shuffling payloads.

    The naive ``groupby(url)`` moves every html payload through an
    all-to-all; here only the ``(url, warc_ts)`` projection shuffles:
    per-batch (url, max_ts, count) partials reduce through a coarsened
    ``groupby(url-hash)`` (the `exact_dedup` shuffle shape — the decision
    never aggregates on the driver), and only the DUPLICATED-url winner
    table leaves the shuffle. ``apply="broadcast"`` (default) collects
    that table — bounded by the duplicate-url count, a small fraction of
    any real crawl, never O(unique urls) — and filters each batch locally.
    ``apply="shuffle"`` never collects anything: the full rows take one
    coarsened ``groupby(url-hash)`` payload shuffle and the winner pick
    runs in-partition — the path for a pathologically duplicate-heavy
    corpus. Identical output either way (ties at the max warc_ts for one
    url all survive: the projection cannot distinguish identical captures;
    content hash would — and exact content dedup downstream catches them
    anyway).
    """
    import pandas as pd
    import ray

    from ..stages.relational import add_coarse_part

    if apply == "shuffle":
        def winner(group: pa.Table) -> pa.Table:
            df = group.to_pandas()
            ts = df["warc_ts"].astype(str)
            mask = ts == ts.groupby(df["url"], sort=False).transform("max")
            return pa.Table.from_pandas(df[mask].drop(columns=["_kpart"]),
                                        preserve_index=False)

        return (add_coarse_part(ds, "url", n_parts)
                .groupby("_kpart").map_groups(winner,
                                              batch_format="pyarrow"))

    empty_partial = pa.table({"url": pa.array([], type=pa.string()),
                              "max": pa.array([], type=pa.string()),
                              "count": pa.array([], type=pa.int64())})

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "url" not in batch.schema.names:
            return empty_partial
        df = batch.select(["url", "warc_ts"]).to_pandas()
        df["warc_ts"] = df["warc_ts"].astype(str)
        g = df.groupby("url", sort=False)["warc_ts"]
        out = g.agg(["max", "count"]).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    def combine(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        agg = df.groupby("url", sort=False).agg(
            ts=("max", "max"), n=("count", "sum")).reset_index()
        dups = agg[agg["n"] > 1]
        return pa.table({"url": pa.array(dups["url"], type=pa.string()),
                         "ts": pa.array(dups["ts"], type=pa.string())})

    partials = (ds.select_columns(["url", "warc_ts"])
                .map_batches(partial, batch_format="pyarrow"))
    dups = (add_coarse_part(partials, "url", n_parts)
            .groupby("_kpart").map_groups(combine, batch_format="pyarrow")
            .to_pandas())
    if dups.empty:
        return ds
    keep_ts = dict(zip(dups["url"], dups["ts"]))
    keep_ref = ray.put(keep_ts)

    def keep(batch: pa.Table) -> pa.Table:
        kmap = ray.get(keep_ref)
        urls = pd.Series(batch["url"].to_pylist())
        ts = pd.Series([str(t) for t in batch["warc_ts"].to_pylist()])
        winner_ts = urls.map(kmap)
        mask = winner_ts.isna() | (ts == winner_ts)
        return batch.filter(pa.array(mask.to_numpy()))

    return ds.map_batches(keep, batch_format="pyarrow")


def _payload_fp_batch(batch: pa.Table) -> pa.Table:
    """(url, ts, fp) projection rows for non-empty payloads — md5 inside
    the worker; payloads never leave the batch."""
    import hashlib

    urls, tss, fps = [], [], []
    for url, ts, payload in zip(batch["url"].to_pylist(),
                                batch["warc_ts"].to_pylist(),
                                batch["html"].to_pylist()):
        if payload:
            urls.append(url)
            tss.append(str(ts))
            fps.append(hashlib.md5(payload).hexdigest())
    return pa.table({"url": pa.array(urls, type=pa.string()),
                     "ts": pa.array(tss, type=pa.string()),
                     "fp": pa.array(fps, type=pa.string())})


def dedup_by_content(corpus_ds, *, n_parts: int = 64,
                     apply: str = "broadcast", extra_fp_ds=None):
    """Exact content dedup over raw PAYLOADS: captures carrying a
    byte-identical ``html`` payload (mirror copies, re-hosted pages) keep
    only those of the min url — the training-data "exact dedup", applied
    BEFORE extraction so duplicate documents are never parsed at all.
    (Dedup on *extracted* text could not catch mirrors: the url is
    deliberately baked into every record's title/front matter.)

    The decision is PER-CAPTURE (url, warc_ts), not per-url: this stage
    runs before url-dedup in the default ``dedup="post"`` flow, so one
    capture whose payload mirrors another url must not drag down sibling
    captures of its url whose content is unique. Captures of the same url
    sharing a payload are left alone (url-dedup's territory).

    Shuffle discipline mirrors :func:`dedup_by_url`: md5 hashing happens
    inside ``map_batches``, the (url, ts, fp) projection reduces through a
    coarsened ``groupby(fp-hash)``, and only the drop list (bounded by the
    duplicate-capture count) broadcasts — or, with ``apply="shuffle"``,
    the full rows take one coarsened ``groupby(fp-hash)`` payload shuffle
    and nothing reaches the driver.

    Resume interaction (r4): ``extra_fp_ds`` — a (url, ts, fp) Dataset of
    the rows already WRITTEN to completed buckets — unions into the
    decision pass, the same pattern the consistency aggregates use, so a
    mirror pair straddling the crash point dedupes identically to a
    fresh run. The written side only ever CAUSES drops of pending rows,
    never suffers one: the crashed run's own decision pass ran over the
    full input pre-write, so written buckets cannot contain a row a
    fresh run would drop; and buckets partition by url-hash, so one url
    never splits across the written/pending line. In shuffle mode the
    written projections ride the payload shuffle as phantom rows
    (typed-null payload columns) and are masked out of the output."""
    import hashlib

    import pandas as pd
    import ray

    from ..stages.relational import add_coarse_part

    if apply == "shuffle":
        def add_fp(batch: pa.Table) -> pa.Table:
            fps = [hashlib.md5(p).hexdigest() if p else ""
                   for p in batch["html"].to_pylist()]
            batch = batch.append_column("_fp",
                                        pa.array(fps, type=pa.string()))
            return batch.append_column(
                "_phantom", pa.array([False] * batch.num_rows))

        def winner(group: pa.Table) -> pa.Table:
            df = group.to_pandas()
            fp = df["_fp"]
            keep_url = df["url"].groupby(fp, sort=False).transform("min")
            mask = ((fp == "") | (df["url"] == keep_url)) \
                & ~df["_phantom"]
            return pa.Table.from_pandas(
                df[mask].drop(columns=["_kpart", "_fp", "_phantom"]),
                preserve_index=False)

        tagged = corpus_ds.map_batches(add_fp, batch_format="pyarrow")
        if extra_fp_ds is not None:
            schema = tagged.schema()
            fields = list(zip(schema.names, schema.types))

            def phantom(batch: pa.Table) -> pa.Table:
                n = batch.num_rows
                cols = []
                for nm, tp in fields:
                    if nm == "url":
                        cols.append(batch["url"].cast(pa.string()))
                    elif nm == "_fp":
                        cols.append(batch["fp"].cast(pa.string()))
                    elif nm == "_phantom":
                        cols.append(pa.array([True] * n))
                    else:
                        cols.append(pa.nulls(n, type=tp))
                return pa.Table.from_arrays(
                    cols, names=[nm for nm, _ in fields])

            tagged = tagged.union(
                extra_fp_ds.map_batches(phantom, batch_format="pyarrow"))
        return (add_coarse_part(tagged, "_fp", n_parts)
                .groupby("_kpart").map_groups(winner,
                                              batch_format="pyarrow"))

    def combine(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        keep_url = df["url"].groupby(df["fp"], sort=False).transform("min")
        drop = df[df["url"] != keep_url]
        return pa.table({"url": pa.array(drop["url"], type=pa.string()),
                         "ts": pa.array(drop["ts"], type=pa.string())})

    proj = (corpus_ds.select_columns(["url", "html", "warc_ts"])
            .map_batches(_payload_fp_batch, batch_format="pyarrow"))
    if extra_fp_ds is not None:
        proj = proj.union(extra_fp_ds)
    drop = (add_coarse_part(proj, "fp", n_parts)
            .groupby("_kpart").map_groups(combine, batch_format="pyarrow")
            .to_pandas())
    if drop.empty:
        return corpus_ds
    drop_set = set(zip(drop["url"], drop["ts"]))
    drop_ref = ray.put(drop_set)

    def keep(batch: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        mask = pa.array([(u, str(t)) not in d
                         for u, t in zip(batch["url"].to_pylist(),
                                         batch["warc_ts"].to_pylist())])
        return batch.filter(mask)

    return corpus_ds.map_batches(keep, batch_format="pyarrow")


def near_dedup_records(extracted, *, extra_text_ds=None,
                       threshold: float = 0.8, num_perm: int = 64,
                       bands: int = 16, k: int = 3, n_parts: int = 64,
                       max_bucket: int | None = 256):
    """Near-duplicate dedup over EXTRACTED text — the flagship's opt-in
    MinHash stage. Exact content dedup (:func:`dedup_by_content`)
    cannot catch re-hosted near-copies whose extracted text differs
    only in the url-bearing front matter; this stage bands the
    extracted text (`ok` rows with non-empty text only — error/skipped
    rows never cluster), verifies signature agreement ≥ ``threshold``
    in-partition, clusters the verified pairs, and drops every
    non-representative row (rep = min 64-bit url-hash id of the
    cluster, deterministic under any partitioning; the 2⁻⁶⁴ id
    collision chance is the usual content-addressing gamble).

    Shuffle discipline matches the exact stages: only (id, band_key,
    sig) projections shuffle; the drop list is bounded by the near-dup
    count and broadcasts; payloads never move.

    Resume interaction (the :func:`dedup_by_content` pattern):
    ``extra_text_ds`` — (url, extracted_text, status) rows already
    WRITTEN to completed buckets — unions into the decision pass so a
    near-dup pair straddling the crash point dedupes identically to a
    fresh run. Drops only ever apply to PENDING rows: the crashed run
    decided over the full input pre-write, so written rows cannot be
    losers of any cluster the resume rediscovers."""
    import numpy as np
    import pandas as pd
    import ray

    from ..stages.dedup import (cluster_pairs_dataset,
                                minhash_verified_pairs)
    from ..stages.manifest import string_hash64

    def to_rows(batch: pa.Table) -> pa.Table:
        mask = pc.and_(pc.equal(batch["status"], "ok"),
                       pc.not_equal(batch["extracted_text"], ""))
        b = batch.filter(mask)
        ids = string_hash64(b["url"].combine_chunks()
                            if isinstance(b["url"], pa.ChunkedArray)
                            else b["url"]).view(np.int64)
        return pa.table({
            "_nd_id": pa.array(ids, type=pa.int64()),
            "extracted_text": b["extracted_text"].cast(pa.large_string())})

    proj = extracted.map_batches(to_rows, batch_format="pyarrow")
    if extra_text_ds is not None:
        proj = proj.union(extra_text_ds.map_batches(
            to_rows, batch_format="pyarrow"))

    pair_ds = minhash_verified_pairs(
        proj, "extracted_text", "_nd_id", num_perm=num_perm, bands=bands,
        k=k, threshold=threshold, n_parts=n_parts,
        max_bucket=max_bucket).materialize()

    def touched(df: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(np.concatenate([df["a"].to_numpy(np.int64),
                                        df["b"].to_numpy(np.int64)])) \
            if len(df) else np.empty(0, dtype=np.int64)
        return pd.DataFrame({"_nd_id": ids})

    ids_ds = pair_ds.map_batches(touched, batch_format="pandas")
    clusters = cluster_pairs_dataset(pair_ds, ids_ds, "_nd_id",
                                     n_parts=n_parts)
    losers = clusters.map_batches(
        lambda df: df.loc[df["id"] != df["rep"], ["id"]],
        batch_format="pandas").to_pandas()
    if losers.empty:
        return extracted
    loser_ref = ray.put(np.unique(losers["id"].to_numpy(np.int64)))

    def keep(batch: pa.Table) -> pa.Table:
        drop = ray.get(loser_ref)
        ids = string_hash64(batch["url"].combine_chunks()
                            if isinstance(batch["url"], pa.ChunkedArray)
                            else batch["url"]).view(np.int64)
        return batch.filter(pa.array(~np.isin(ids, drop)))

    return extracted.map_batches(keep, batch_format="pyarrow")


def run_flagship(corpus_path, facts_path: str | None = None,
                 out_dir: str | None = None, *, dedup: bool | str = True,
                 consistency: bool = True, concurrency=None,
                 batch_size: int = 16, n_buckets: int = 64,
                 skew_threshold: int = SKEW_SPLIT_BYTES,
                 sequence_mode: str = "broadcast",
                 content_dedup: bool = False,
                 near_dedup: bool = False):
    """Build (and optionally write) the flagship extraction Dataset.

    ``dedup``: True/"post" drops duplicate-url captures *after* extraction
    from the materialized records — no extra input pass, negligible wasted
    compute when duplicates are rare (any crawl frontier). "pre" runs the
    decision pass over the raw input first — pay one serial projection
    read to skip extracting duplicates, worth it when the dup rate is
    high. False disables.

    ``near_dedup``: opt-in MinHash near-dup over extracted text
    (:func:`near_dedup_records`) — catches re-hosted near-copies exact
    content dedup can't; resume-consistent via the written-bucket union.

    ``sequence_mode``: "broadcast" (default) sends the url→sequence and
    first-wins mapping tables to every task via ``ray.put`` — fastest
    while filings × labels fit driver memory. "join" ranks/aggregates
    both distributedly and hash-joins them back on url / family_key
    (``CONS.sequence_dataset`` + ``mappings_dataset`` + ``apply_joins``)
    — the 10^12-doc path; identical output.

    Returns the final Dataset when ``out_dir`` is None, else writes the
    partitioned output (resuming past completed buckets) and returns the
    write summary dict.
    """
    import time as _time

    import ray
    import ray.data

    t_start = _time.monotonic()
    if hasattr(corpus_path, "map_batches"):
        ds = corpus_path
    else:
        # ≥4 blocks per core so the streaming executor always has backlog
        # (42 auto-coalesced blocks starved a 32-CPU run in profiling)
        n_blocks = max(64, int(ray.cluster_resources().get("CPU", 8)) * 4)
        ds = ray.data.read_parquet(corpus_path, override_num_blocks=n_blocks)

    fingerprint = MAN.input_fingerprint(corpus_path)
    if out_dir:
        # crashed fragments must go before any re-write or buckets would
        # hold duplicate rows (old + new complete file sets side by side)
        MAN.clean_incomplete_buckets(out_dir, fingerprint, n_buckets)
        ds = MAN.resume_filter(ds, out_dir, n_buckets, fingerprint)
    if dedup == "pre":
        ds = dedup_by_url(ds)
    if content_dedup:
        # pays one payload-hash pass over the raw input to skip extracting
        # byte-identical mirror copies entirely. On a resume, union the
        # WRITTEN buckets' payload fingerprints into the decision pass so
        # a mirror pair straddling the crash point dedupes exactly like a
        # fresh run (the written row wins: it is globally correct — the
        # crashed run decided over the full input pre-write).
        extra_fp = None
        if out_dir:
            import pyarrow.parquet as _pq
            done_files = MAN.completed_parquet_files(out_dir, fingerprint,
                                                     n_buckets)
            # per-FILE schema check: a mixed old/new output dir (some
            # buckets written before payload_fp existed) must degrade to
            # replaying only the new-format buckets, not crash the
            # resume (review finding: a first-file-only check passed and
            # then the column-projected read raised on the old files)
            fp_files = [f for f in done_files
                        if "payload_fp" in _pq.read_schema(f).names]
            if fp_files:
                def to_fp_rows(batch: pa.Table) -> pa.Table:
                    mask = pc.not_equal(batch["payload_fp"], "")
                    batch = batch.filter(mask)
                    return pa.table({
                        "url": batch["url"].cast(pa.string()),
                        "ts": batch["warc_ts"].cast(pa.string()),
                        "fp": batch["payload_fp"].cast(pa.string())})

                extra_fp = ray.data.read_parquet(
                    fp_files,
                    columns=["url", "warc_ts", "payload_fp"]
                ).map_batches(to_fp_rows, batch_format="pyarrow")
        ds = dedup_by_content(ds, extra_fp_ds=extra_fp)

    # (min, max) pools when actors are requested; never the whole node or
    # the feeder read tasks starve (silent deadlock / 1/3 utilization)
    if isinstance(concurrency, int):
        concurrency = (max(1, concurrency - 4), concurrency)
    normal, big = split_oversized(ds, skew_threshold)
    # Default num_cpus=0.7: mild oversubscription — the streaming executor
    # leaves ~30% of cores idle at 1.0 cpu/task (measured 22/32 busy);
    # tune per node via PDF_PARSER_EXTRACT_CPUS (on fully-loaded sockets
    # oversubscription can flip to thrash).
    import os as _os
    extract_cpus = float(_os.environ.get("PDF_PARSER_EXTRACT_CPUS", "0.7"))
    extracted = extract_dataset(normal, facts_path, batch_size=batch_size,
                                concurrency=concurrency,
                                num_cpus=extract_cpus)
    big_extracted = extract_dataset(big, facts_path, batch_size=1,
                                    concurrency=(1, 2) if concurrency else None)
    extracted = extracted.union(big_extracted)

    if consistency or dedup in (True, "post") or out_dir:
        # The first-wins aggregate is a real barrier: it must see every
        # document's mappings before any backfill. Materialize the condensed
        # records once (they are far smaller than the input payloads; the
        # object store spills if needed) so extraction doesn't execute twice
        # — once for the aggregates and again for the apply pass (and the
        # wave-writer filters the materialized records once per wave).
        extracted = extracted.materialize()
    if dedup in (True, "post"):
        extracted = dedup_by_url(extracted)
    if near_dedup:
        # MinHash near-dup over extracted text (opt-in). On a resume the
        # WRITTEN buckets' text rows union into the decision pass so a
        # near-dup pair straddling the crash point dedupes exactly like
        # a fresh run (drops only apply to pending rows — see
        # near_dedup_records).
        extra_text = None
        if out_dir:
            import ray.data as _rdnd
            done_files = MAN.completed_parquet_files(out_dir, fingerprint,
                                                     n_buckets)
            if done_files:
                extra_text = _rdnd.read_parquet(
                    done_files,
                    columns=["url", "extracted_text", "status"])
        extracted = near_dedup_records(extracted, extra_text_ds=extra_text)
    if consistency:
        # On a resume, the pending rows must aggregate against the rows in
        # the already-completed buckets too, or mappings/sequences diverge
        # from what a fresh run over the full corpus produces. The written
        # output carries exactly the projections the aggregates need; the
        # crashed run computed its aggregates pre-write over the FULL
        # input, so written values are globally correct and the union
        # reconstructs that state.
        agg_input = extracted
        if out_dir:
            import ray.data as _rd
            done_files = MAN.completed_parquet_files(out_dir, fingerprint,
                                                     n_buckets)
            if done_files:
                written = _rd.read_parquet(done_files, columns=[
                    "url", "family_key", "period_end", "doc_kind",
                    "mappings"])
                agg_input = extracted.select_columns(
                    ["url", "family_key", "period_end", "doc_kind",
                     "mappings"]).union(written)
        if sequence_mode == "join":
            map_ds = CONS.mappings_dataset(agg_input)
            seq_ds = CONS.sequence_dataset(agg_input)
            extracted = CONS.apply_joins(extracted, map_ds, seq_ds)
        else:
            resolved = CONS.first_wins_mappings(agg_input)
            seq_map = CONS.compute_sequence(agg_input)
            extracted = CONS.apply_all(extracted, resolved, seq_map)

    if out_dir:
        summary = MAN.write_partitioned(extracted, out_dir, n_buckets,
                                        input_fingerprint=fingerprint)
        # stamp run-level metrics now that the (lazy) plan has executed
        elapsed = _time.monotonic() - t_start
        import json as _json
        import os as _os2
        run_path = _os2.path.join(out_dir, "_run_manifest.json")
        with open(run_path) as fh:
            run = _json.load(fh)
        run["metrics"] = {
            "elapsed_sec": round(elapsed, 2),
            "docs_per_sec": round(summary["rows"] / elapsed, 2) if elapsed else 0,
            "config": {"batch_size": batch_size, "n_buckets": n_buckets,
                       "dedup": str(dedup), "consistency": consistency,
                       "extract_cpus": extract_cpus},
        }
        with open(run_path, "w") as fh:
            _json.dump(run, fh, indent=1)
        return summary
    return extracted
