"""CLI entrypoint — the ``ray job submit`` surface of the engine.

Rebuilds the reference's ``sec-parse`` CLI (``sec_parser/cli.py:44-144``)
as a Dataset job: where the reference looped PDFs sequentially and
patched outputs post-hoc, this submits one streaming pipeline with
resume-from-manifest semantics.

Usage (driver-owned Ray session; safe under ``ray job submit``)::

    python -m pdf_parser_ray.cli synth --out /tmp/corpus --docs 2000
    python -m pdf_parser_ray.cli run --input /tmp/corpus/corpus \
        --facts /tmp/corpus/facts.parquet --out /tmp/extracted
    python -m pdf_parser_ray.cli qa --input /tmp/extracted
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(address="local", **kwargs)
    return ray


def cmd_synth(args) -> int:
    from .sources.corpus import write_corpus

    corpus_dir, facts_path = write_corpus(args.out, n_docs=args.docs,
                                          seed=args.seed, shards=args.shards)
    print(json.dumps({"corpus": corpus_dir, "facts": facts_path}))
    return 0


def cmd_run(args) -> int:
    ray = _ensure_ray(args.num_cpus)
    from .pipelines.flagship import run_flagship

    try:
        summary = run_flagship(
            args.input, args.facts, out_dir=args.out,
            n_buckets=args.buckets,
            concurrency=(1, args.concurrency) if args.concurrency else None,
            dedup=not args.no_dedup, consistency=not args.no_consistency)
        print(json.dumps(summary))
        return 0
    finally:
        ray.shutdown()


def cmd_qa(args) -> int:
    """Evaluate EXISTING extraction output (the reference's --eval-only
    mode, test_runner.py:449-506): summary counts by default, per-document
    colored report with --per-doc, markdown report file with --report."""
    ray = _ensure_ray(args.num_cpus)
    import ray.data as rd

    from .stages.qa import (qa_dataset, render_report, summarize,
                            write_markdown_report)

    try:
        ds = rd.read_parquet(args.input)
        if args.per_doc:
            print(render_report(ds, color=sys.stdout.isatty(),
                                max_docs=args.max_docs))
        if args.report:
            write_markdown_report(ds, args.report, max_docs=args.max_docs)
            print(f"report written to {args.report}", file=sys.stderr)
        summary = summarize(qa_dataset(ds))
        print(json.dumps(summary, sort_keys=True))
        failed = sum(v for k, v in summary.items() if k.startswith("qa_fail:"))
        return 1 if failed else 0
    finally:
        ray.shutdown()


def cmd_query(args) -> int:
    """Run one named pipeline from the query surface over a testdata
    dir; print row count + head, optionally write the result parquet."""
    import ray

    from .pipelines import queries as Q

    fns = {n: f for n, f in vars(Q).items()
           if n.startswith("q") and n[1:2].isdigit() and callable(f)}
    if args.name not in fns:
        names = ", ".join(sorted(fns))
        print(f"unknown query {args.name!r}; available: {names}",
              file=sys.stderr)
        return 2
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False)
    try:
        out = fns[args.name](args.sf_dir)
        if hasattr(out, "to_pandas"):
            out = out.to_pandas()
        print(f"{args.name}: {len(out)} rows", file=sys.stderr)
        print(out.head(args.head).to_string())
        if args.out:
            out.to_parquet(args.out, index=False)
            print(f"written to {args.out}", file=sys.stderr)
        return 0
    finally:
        ray.shutdown()


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="pdf_parser_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("synth", help="write a deterministic synthetic corpus")
    p.add_argument("--out", required=True)
    p.add_argument("--docs", type=int, default=500)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--shards", type=int, default=16)
    p.set_defaults(fn=cmd_synth)

    p = sub.add_parser("run", help="run the flagship extraction pipeline")
    p.add_argument("--input", required=True, help="corpus parquet dir")
    p.add_argument("--facts", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--buckets", type=int, default=64)
    p.add_argument("--concurrency", type=int, default=None)
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("--no-dedup", action="store_true")
    p.add_argument("--no-consistency", action="store_true")
    p.set_defaults(fn=cmd_run)

    p = sub.add_parser("qa", help="quality harness over extraction output")
    p.add_argument("--input", required=True)
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("--per-doc", action="store_true",
                   help="print the per-document check report")
    p.add_argument("--report", metavar="PATH", default=None,
                   help="write a markdown report file")
    p.add_argument("--max-docs", type=int, default=None)
    p.set_defaults(fn=cmd_qa)

    p = sub.add_parser("query", help="run one named pipeline (q01..q65)")
    p.add_argument("name", help="query name, e.g. q35_decontaminate")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--out", default=None, help="write result parquet")
    p.add_argument("--head", type=int, default=10)
    p.add_argument("--num-cpus", type=int, default=None)
    p.set_defaults(fn=cmd_query)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
