"""Per-stage breakdown of the flagship extraction pipeline (VERDICT r2 #6).

Two independent measurements, printed as one JSON line each:

1. kernel: single-thread per-doc cost with the notes section classifier
   ON vs OFF over the same docs — attributes the model's share without
   any Ray/host-parallelism noise.
2. ray phases: staged bench corpus, then wall time of (a) read+extract
   to materialize, (b) consistency aggregates + apply, (c) partitioned
   write — the boundaries run_flagship actually has (the materialize
   barrier and the write are real phase edges; everything upstream of
   the materialize is one fused streaming stage by design).

Usage: PYTHONPATH=/root/repo python tools/profile_extract.py [n_docs]
Owns its Ray session (bench/CLI/tests rule).
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

import pyarrow.parquet as pq


def kernel_breakdown(n_docs: int = 300) -> dict:
    from pdf_parser_ray.kernels.docpipe import process_document
    from pdf_parser_ray.kernels.facts import FactsStore
    from pdf_parser_ray.kernels.taxonomy import LabelNormalizer
    from pdf_parser_ray.sources.corpus import write_corpus
    from pdf_parser_ray.stages.classify import SectionClassifier

    with tempfile.TemporaryDirectory() as td:
        corpus_dir, facts_path = write_corpus(td, n_docs=n_docs, shards=1)
        rows = pq.read_table(corpus_dir).to_pylist()
        normalizer = LabelNormalizer()
        classifier = SectionClassifier()
        facts = FactsStore(pq.read_table(facts_path).to_pylist())

        def run(clf) -> float:
            # warm (imports, regex compile, numpy first-touch)
            r0 = rows[0]
            process_document(r0["url"], r0["html"], str(r0["warc_ts"]),
                             normalizer, facts, clf)
            t0 = time.time()
            for r in rows:
                process_document(r["url"], r["html"], str(r["warc_ts"]),
                                 normalizer, facts, clf)
            return time.time() - t0

        with_model = run(classifier)
        without = run(None)
    return {
        "docs": len(rows),
        "sec_with_classifier": round(with_model, 2),
        "sec_without_classifier": round(without, 2),
        "classifier_share_pct": round(100 * (with_model - without)
                                      / with_model, 1),
        "docs_per_sec_single_thread": round(len(rows) / with_model, 1),
    }


def ray_phases(n_docs: int, num_cpus: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR", log_to_driver=False)
    import bench
    from pdf_parser_ray.pipelines.flagship import (dedup_by_url,
                                                   split_oversized)
    from pdf_parser_ray.stages import consistency as CONS
    from pdf_parser_ray.stages import manifest as MAN
    from pdf_parser_ray.stages.extract import extract_dataset

    out: dict = {"n_docs": n_docs, "num_cpus": num_cpus}
    with tempfile.TemporaryDirectory() as td:
        t0 = time.time()
        corpus_dir, facts_path = bench.stage_corpus(td, n_docs, shards=128)
        out["stage_corpus_sec"] = round(time.time() - t0, 2)
        bench.warm_workers()

        import ray.data
        t0 = time.time()
        n_blocks = max(64, num_cpus * 4)
        ds = ray.data.read_parquet(corpus_dir,
                                   override_num_blocks=n_blocks)
        normal, big = split_oversized(ds, 1 << 20)
        extracted = extract_dataset(normal, facts_path, batch_size=16)
        big_x = extract_dataset(big, facts_path, batch_size=1)
        extracted = extracted.union(big_x).materialize()
        out["extract_materialize_sec"] = round(time.time() - t0, 2)
        out["rows"] = extracted.count()

        t0 = time.time()
        extracted = dedup_by_url(extracted)
        resolved = CONS.first_wins_mappings(extracted)
        seq_map = CONS.compute_sequence(extracted)
        extracted = CONS.apply_all(extracted, resolved, seq_map)
        extracted = extracted.materialize()
        out["consistency_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        odir = td + "/out"
        MAN.write_partitioned(extracted, odir, 64,
                              input_fingerprint=MAN.input_fingerprint(
                                  corpus_dir))
        out["write_sec"] = round(time.time() - t0, 2)
    ray.shutdown()
    out["docs_per_sec_extract_phase"] = round(
        out["rows"] / out["extract_materialize_sec"], 1)
    return out


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    print(json.dumps({"kernel": kernel_breakdown()}))
    import os
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    print(json.dumps({"ray_phases": ray_phases(n_docs, num_cpus)}))


if __name__ == "__main__":
    main()
