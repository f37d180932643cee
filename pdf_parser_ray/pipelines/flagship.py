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


def dedup_by_url(ds):
    """Exact dedup on url: keep the newest capture (max warc_ts) per url.

    A hash-shuffle groupby on the partitioning key — the same key the
    output bucketing uses, so downstream stages inherit sane partitioning.
    """
    def first(group: pa.Table) -> pa.Table:
        if group.num_rows == 1:
            return group
        order = pc.sort_indices(group, sort_keys=[("warc_ts", "descending")])
        return group.take(order[:1])

    return ds.groupby("url").map_groups(first, batch_format="pyarrow")


def run_flagship(corpus_path, facts_path: str | None = None,
                 out_dir: str | None = None, *, dedup: bool = True,
                 consistency: bool = True, concurrency=None,
                 batch_size: int = 16, n_buckets: int = 64,
                 skew_threshold: int = SKEW_SPLIT_BYTES):
    """Build (and optionally write) the flagship extraction Dataset.

    Returns the final Dataset when ``out_dir`` is None, else writes the
    partitioned output (resuming past completed buckets) and returns the
    write summary dict.
    """
    import ray.data

    ds = (corpus_path if hasattr(corpus_path, "map_batches")
          else ray.data.read_parquet(corpus_path))

    if out_dir:
        ds = MAN.resume_filter(ds, out_dir, n_buckets)
    if dedup:
        ds = dedup_by_url(ds)

    # Autoscaling (1, N) pools: two fixed-size pools would reserve every
    # CPU and starve the upstream read tasks — a resource deadlock that
    # presents as a silent hang on a small node.
    if isinstance(concurrency, int):
        concurrency = (1, concurrency)
    normal, big = split_oversized(ds, skew_threshold)
    extracted = extract_dataset(normal, facts_path, batch_size=batch_size,
                                concurrency=concurrency)
    big_extracted = extract_dataset(big, facts_path, batch_size=1,
                                    concurrency=(1, 2) if concurrency else None)
    extracted = extracted.union(big_extracted)

    if consistency:
        # The first-wins aggregate is a real barrier: it must see every
        # document's mappings before any backfill. Materialize the condensed
        # records once (they are far smaller than the input payloads; the
        # object store spills if needed) so extraction doesn't execute twice
        # — once for the aggregate and again for the apply pass.
        extracted = extracted.materialize()
        resolved = CONS.first_wins_mappings(extracted)
        extracted = CONS.apply_consistent_mappings(extracted, resolved)
        extracted = CONS.assign_filing_sequence(extracted)

    if out_dir:
        return MAN.write_partitioned(extracted, out_dir, n_buckets)
    return extracted
