"""Single-thread per-document kernel rate probe — the host-noise anchor.

BASELINE.md leans on this number to separate real regressions from the
shared host's vCPU-steal noise: the per-doc kernel touches no Ray, no
object store and no parallelism, so run-to-run drift here IS host noise
(historically it holds 81-84 docs/s while 32-way wall-clock swings 2x).

Usage: PYTHONPATH=/root/repo python tools/kernel_rate.py [n_docs]
Prints one JSON line: {"docs": N, "sec": s, "docs_per_sec": r}.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

import pyarrow.parquet as pq


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 300

    from pdf_parser_ray.kernels.docpipe import process_document
    from pdf_parser_ray.kernels.facts import FactsStore
    from pdf_parser_ray.kernels.taxonomy import LabelNormalizer
    from pdf_parser_ray.sources.corpus import write_corpus
    from pdf_parser_ray.stages.classify import SectionClassifier

    with tempfile.TemporaryDirectory() as td:
        corpus_dir, facts_path = write_corpus(td, n_docs=n_docs, shards=1)
        tbl = pq.read_table(corpus_dir)
        normalizer = LabelNormalizer()
        classifier = SectionClassifier()
        facts = FactsStore(pq.read_table(facts_path).to_pylist())

        rows = tbl.to_pylist()
        # warm one doc (imports, regex compiles, numpy first-touch)
        process_document(rows[0]["url"], rows[0]["html"],
                         str(rows[0]["warc_ts"]), normalizer, facts,
                         classifier)
        t0 = time.time()
        ok = 0
        for r in rows:
            rec = process_document(r["url"], r["html"], str(r["warc_ts"]),
                                   normalizer, facts, classifier)
            ok += rec.get("status") == "ok"
        sec = time.time() - t0
    print(json.dumps({"docs": len(rows), "ok": ok,
                      "sec": round(sec, 2),
                      "docs_per_sec": round(len(rows) / sec, 1)}))


if __name__ == "__main__":
    main()
