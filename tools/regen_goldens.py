"""Regenerate tests/goldens.json after an intentional output change."""
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_parser_ray.kernels.docpipe import process_document
from pdf_parser_ray.kernels.facts import FactsStore
from pdf_parser_ray.kernels.taxonomy import LabelNormalizer
from pdf_parser_ray.sources.corpus import synth_corpus
from pdf_parser_ray.stages.classify import SectionClassifier

# goldens freeze the FLAGSHIP path: classifier included, exactly as
# stages/extract.ExtractDocuments wires it
rows, facts_rows = synth_corpus(40, seed=7)
norm, fs, cls = LabelNormalizer(), FactsStore(facts_rows), SectionClassifier()
goldens = {}
for r in rows:
    rec = process_document(r["url"], r["html"], str(r["warc_ts"]), norm, fs,
                           cls)
    goldens[r["url"]] = {
        "md5": hashlib.md5(rec["extracted_text"].encode()).hexdigest(),
        "status": rec["status"], "doc_kind": rec["doc_kind"],
        "n_spans": rec["n_spans"],
    }
out = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens.json")
json.dump(goldens, open(out, "w"), indent=1, sort_keys=True)
print(f"wrote {len(goldens)} goldens")
