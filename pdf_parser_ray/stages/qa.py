"""QA + summary stages over the extraction output Dataset.

The reference ran its quality harness as a second CLI pass over written
files (``test_runner.py:449-506``) and printed batch summary counts from
the driver loop (``cli.py:126-144``). Here both are Dataset operations:
``qa_dataset`` appends per-document check results via ``map_batches``;
``summarize`` computes the run summary with a partial-aggregate pattern
(never collecting documents to the driver).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..kernels.qa import run_qa

QA_TYPE = pa.list_(pa.struct([("check", pa.string()),
                              ("passed", pa.bool_()),
                              ("message", pa.string())]))


def _apply_qa(batch: pa.Table) -> pa.Table:
    texts = batch["extracted_text"].to_pylist()
    kinds = batch["doc_kind"].to_pylist()
    results = []
    n_failed = []
    for text, kind in zip(texts, kinds):
        res = run_qa(text, kind)
        results.append([{"check": r.check, "passed": r.passed,
                         "message": r.message} for r in res])
        n_failed.append(sum(1 for r in res if not r.passed))
    batch = batch.append_column("qa", pa.array(results, type=QA_TYPE))
    return batch.append_column("qa_failed", pa.array(n_failed, type=pa.int64()))


def qa_dataset(extracted_ds):
    """Append ``qa`` (per-check results) and ``qa_failed`` columns."""
    return extracted_ds.map_batches(_apply_qa, batch_format="pyarrow")


def summarize(extracted_ds) -> dict:
    """Run summary: status/kind counts + per-check pass rates.

    Partial aggregation inside map_batches → tiny partial frames → final
    combine on the driver (the combine input is O(batches), not O(docs)).
    """
    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([c for c in ("status", "doc_kind", "qa")
                           if c in batch.schema.names]).to_pandas()
        rows: dict[str, int] = {}
        for status, kind in zip(df["status"], df["doc_kind"]):
            rows[f"status:{status}"] = rows.get(f"status:{status}", 0) + 1
            rows[f"kind:{kind}"] = rows.get(f"kind:{kind}", 0) + 1
        if "qa" in df.columns:
            for qa in df["qa"]:
                for r in qa:
                    key = f"qa_pass:{r['check']}" if r["passed"] \
                        else f"qa_fail:{r['check']}"
                    rows[key] = rows.get(key, 0) + 1
        return pa.Table.from_pandas(
            pd.DataFrame({"key": list(rows), "n": list(rows.values())}))

    partials = extracted_ds.map_batches(partial, batch_format="pyarrow")
    out: dict[str, int] = {}
    for r in partials.take_all():
        out[r["key"]] = out.get(r["key"], 0) + r["n"]
    return out


_GREEN, _RED, _BOLD, _RESET = "\x1b[32m", "\x1b[31m", "\x1b[1m", "\x1b[0m"


def render_report(extracted_ds, *, color: bool = False,
                  max_docs: int | None = None) -> str:
    """Per-document check report — the reference's ``test_runner`` colored
    report / markdown report (``test_runner.py:449-506``), rebuilt as a
    stream over the QA projection (url, status, doc_kind, qa, qa_failed);
    document texts never reach the driver.

    ``color=True`` adds the reference's ANSI styling for terminals; the
    plain variant doubles as the markdown report body."""
    g, r, b, z = (_GREEN, _RED, _BOLD, _RESET) if color else ("", "", "", "")
    lines: list[str] = []
    total_pass = total_fail = n_docs = 0
    qa_ds = qa_dataset(extracted_ds).select_columns(
        ["url", "status", "doc_kind", "qa", "qa_failed"])
    done = False
    for batch in qa_ds.iter_batches(batch_format="pandas", batch_size=256):
        if done:
            break
        for row in batch.itertuples(index=False):
            if max_docs is not None and n_docs >= max_docs:
                done = True
                break
            n_docs += 1
            lines.append(f"{b}{row.url}{z} [{row.doc_kind}/{row.status}]")
            for c in row.qa:
                ok = bool(c["passed"])
                total_pass += ok
                total_fail += not ok
                mark = f"{g}✓{z}" if ok else f"{r}✗{z}"
                msg = f" — {c['message']}" if c["message"] and not ok else ""
                lines.append(f"  {mark} {c['check']}{msg}")
            lines.append("")
    lines.append("---")
    lines.append(f"{b}Summary:{z} {total_pass} passed, {total_fail} failed "
                 f"across {n_docs} documents")
    return "\n".join(lines)


def write_markdown_report(extracted_ds, path: str,
                          max_docs: int | None = None) -> None:
    """Write the plain report to ``path`` (reference ``--report`` flag)."""
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(render_report(extracted_ds, color=False, max_docs=max_docs))
        fh.write("\n")
