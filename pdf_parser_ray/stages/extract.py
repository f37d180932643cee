"""The flagship extraction stage: corpus rows → extraction records.

Rebuilds the reference's per-document ``process_pdf`` loop
(``sec_parser/cli.py:102-111`` — strictly sequential) as an actor-pool
``map_batches`` over zero-copy Arrow batches. Stateful setup (taxonomy alias
index, structured-facts side table) happens once per actor in ``__init__``
— the reference reloaded the taxonomy per document (``pipeline.py:245``)
and rebuilt the alias index per table (``normalize.py:110``).

Scale notes
-----------
* The facts side table is small (an EDGAR stand-in); it is loaded from a
  parquet path in ``__init__`` — once per actor, never per batch. Passing a
  path (not an ObjectRef) also sidesteps ray#53727 (actor restart with
  constructor args in the object store).
* ``batch_size`` defaults small (16): payloads are whole documents, and the
  per-document parse is the expensive part — small batches keep the
  streaming executor's pipeline full and bound worker heap.
* Oversized payloads (> ``skew_split_bytes``) are routed through the same
  actors but in single-row batches via a pre-pass ``repartition`` hint; see
  ``pipelines/flagship.py`` for the skew split.
"""

from __future__ import annotations

import pyarrow as pa

from ..kernels.docpipe import process_document
from ..kernels.facts import FactsStore
from ..kernels.taxonomy import LabelNormalizer

RECORD_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.string()),
    # md5 of the raw payload: lets a RESUMED run replay content-dedup
    # decisions against already-written buckets without re-reading the
    # raw corpus (flagship.dedup_by_content extra_fp_ds)
    ("payload_fp", pa.string()),
    ("status", pa.string()),
    ("doc_kind", pa.string()),
    ("family_key", pa.string()),
    ("period_end", pa.string()),
    ("extracted_text", pa.large_string()),
    ("spans", pa.list_(pa.struct([("section", pa.string()),
                                  ("start", pa.int64()),
                                  ("end", pa.int64())]))),
    ("mappings", pa.list_(pa.struct([("label", pa.string()),
                                     ("canonical", pa.string())]))),
    ("n_pages", pa.int64()),
    ("n_spans", pa.int64()),
    ("confidence_avg", pa.float64()),
    ("meta_json", pa.large_string()),
])


class ExtractDocuments:
    """Actor-pool UDF: one corpus batch in, one extraction-record batch out.

    Use as ``ds.map_batches(ExtractDocuments, fn_constructor_kwargs=
    {"facts_path": ...}, batch_format="pyarrow", batch_size=16,
    concurrency=N)``.
    """

    def __init__(self, facts_path: str | None = None):
        from .classify import SectionClassifier

        self.normalizer = LabelNormalizer()
        # per-worker model-backed section classifier (north rule:
        # "model-backed section classifiers replacing the reference's LLM
        # calls") — prototype matrix built once per actor/worker, used by
        # the Notes path of every document this worker processes
        self.classifier = SectionClassifier()
        self.facts: FactsStore | None = None
        if facts_path:
            import pyarrow.parquet as pq
            self.facts = FactsStore(pq.read_table(facts_path).to_pylist())

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        urls = batch["url"].to_pylist()
        payloads = batch["html"].to_pylist()
        ts = batch["warc_ts"].to_pylist()
        recs = []
        for u, h, t in zip(urls, payloads, ts):
            rec = process_document(u, h, str(t), self.normalizer,
                                   self.facts, self.classifier)
            rec["payload_fp"] = hashlib.md5(h).hexdigest() if h else ""
            recs.append(rec)
        return pa.Table.from_pylist(recs, schema=RECORD_SCHEMA)


# Per-worker-process state cache for task-mode extraction. Ray reuses
# worker processes, so the taxonomy/facts load happens once per worker —
# the same amortization an actor gives, without reserving CPUs.
_TASK_STATE: dict[str, ExtractDocuments] = {}


def _extract_batch(batch: pa.Table, facts_path: str | None = None) -> pa.Table:
    key = facts_path or ""
    state = _TASK_STATE.get(key)
    if state is None:
        state = _TASK_STATE[key] = ExtractDocuments(facts_path)
    return state(batch)


def extract_dataset(ds, facts_path: str | None = None, *,
                    batch_size: int = 16, concurrency=None,
                    num_cpus: float = 1.0, use_actors: bool = False):
    """Wire the extraction stage onto a corpus Dataset.

    Default is a TASK pool with per-worker cached state: task maps fuse
    with the upstream read into one operator and autoscale to every free
    CPU. A fixed actor pool reserves CPUs and starves its own feeder tasks
    (profiled: a (28,32) pool ran at ~8 effective CPUs because the read
    stage had 4 CPUs left). Use ``use_actors=True`` for genuinely heavy
    state (a model that takes seconds to load) where per-worker duplication
    or restart cost matters more than fusion.
    """
    if use_actors:
        kwargs = {}
        if concurrency is not None:
            kwargs["concurrency"] = concurrency
        return ds.map_batches(
            ExtractDocuments,
            fn_constructor_kwargs={"facts_path": facts_path},
            batch_format="pyarrow",
            batch_size=batch_size,
            num_cpus=num_cpus,
            **kwargs,
        )
    kwargs = {}
    if concurrency is not None:
        # in task mode, concurrency caps concurrent tasks (an upper bound,
        # not a reserved pool) — keeps the knob meaningful on both paths
        kwargs["concurrency"] = (concurrency[1]
                                 if isinstance(concurrency, tuple)
                                 else concurrency)
    return ds.map_batches(
        _extract_batch,
        fn_kwargs={"facts_path": facts_path},
        batch_format="pyarrow",
        batch_size=batch_size,
        num_cpus=num_cpus,
        **kwargs,
    )
