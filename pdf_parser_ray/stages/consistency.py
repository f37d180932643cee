"""Cross-document stages: the engine's only shuffles.

Rebuilds the reference's driver-side post-pass (``sec_parser/cli.py:113-124``
— in-memory ``enforce_consistent_mappings`` + sort-by-period +
read-modify-write of already-written files) as two grouped Ray Data
operations computed *before* the write:

* **label consistency** (``consistency.py:6-33`` in the reference): across
  all filings of a document family, each label maps to the first non-empty
  canonical. The reference's "first" is file order (``sorted(glob)``); our
  deterministic rebuild defines first = min ``(period_end, url)`` within
  the ``(family_key, label)`` group (SURVEY.md §7.3).
* **filing sequence** (``cli.py:122-124``): rank filings within a family by
  ``period_end`` (oldest = 1), tie-broken by url.

Scale notes: both shuffles move only tiny projections — ``(family_key,
label, canonical, period_end, url)`` and ``(family_key, url, period_end)``
— never the extracted text. The mapping fix-ups come back to the full
dataset as a broadcast dict (families × labels is small even at corpus
scale because label cardinality is bounded by the taxonomy), applied inside
``map_batches``. If label cardinality ever explodes, swap the broadcast for
an equi-join on ``family_key`` — the partitioning key is already right.
"""

from __future__ import annotations

import pyarrow as pa


def _explode_mappings(batch: pa.Table) -> pa.Table:
    """(url, family_key, period_end, mappings[]) → one row per mapping."""
    out = {"family_key": [], "label": [], "canonical": [],
           "period_end": [], "url": []}
    fams = batch["family_key"].to_pylist()
    maps = batch["mappings"].to_pylist()
    pes = batch["period_end"].to_pylist()
    urls = batch["url"].to_pylist()
    for fam, mp, pe, url in zip(fams, maps, pes, urls):
        for m in mp or []:
            out["family_key"].append(fam)
            out["label"].append(m["label"])
            out["canonical"].append(m["canonical"])
            out["period_end"].append(pe or "")
            out["url"].append(url)
    return pa.table(out)


def first_wins_mappings(extracted_ds) -> dict[tuple[str, str], str]:
    """Compute {(family_key, label) → canonical} with deterministic
    first-wins (min (period_end, url) among rows with non-empty canonical).

    Returns a plain dict (small: bounded by families × taxonomy labels) for
    broadcast back into the apply stage.
    """
    pairs = (
        extracted_ds
        .select_columns(["url", "family_key", "period_end", "mappings"])
        .map_batches(_explode_mappings, batch_format="pyarrow")
    )

    def reduce_group(group: pa.Table) -> pa.Table:
        rows = group.to_pylist()
        rows.sort(key=lambda r: (r["period_end"], r["url"]))
        best = ""
        for r in rows:
            if r["canonical"]:
                best = r["canonical"]
                break
        first = rows[0]
        return pa.table({"family_key": [first["family_key"]],
                         "label": [first["label"]],
                         "canonical": [best]})

    resolved = pairs.groupby(["family_key", "label"]).map_groups(
        reduce_group, batch_format="pyarrow")
    return {(r["family_key"], r["label"]): r["canonical"]
            for r in resolved.take_all()}


def apply_consistent_mappings(extracted_ds, resolved: dict[tuple[str, str], str]):
    """Backfill empty canonicals from the family-global mapping table.

    ``resolved`` is shipped once via the UDF closure (Ray serializes it into
    the task spec — it is small); the rebuilt equivalent of the reference's
    in-place backfill (``consistency.py:24-31``).
    """
    import ray

    resolved_ref = ray.put(resolved)

    def fix(batch: pa.Table) -> pa.Table:
        table = ray.get(resolved_ref)
        fams = batch["family_key"].to_pylist()
        maps = batch["mappings"].to_pylist()
        new_maps = []
        changed = False
        for fam, mp in zip(fams, maps):
            row_new = []
            for m in mp or []:
                canon = m["canonical"]
                if not canon:
                    canon = table.get((fam, m["label"]), "")
                    changed = changed or bool(canon)
                row_new.append({"label": m["label"], "canonical": canon})
            new_maps.append(row_new)
        if not changed:
            return batch
        idx = batch.schema.get_field_index("mappings")
        typ = batch.schema.field(idx).type
        return batch.set_column(idx, batch.schema.field(idx),
                                pa.array(new_maps, type=typ))

    return extracted_ds.map_batches(fix, batch_format="pyarrow")


def assign_filing_sequence(extracted_ds):
    """Add a ``filing_sequence`` column: rank by period_end (oldest=1)
    within family, ties broken by url; 0 for non-filing rows.

    Grouped rank — a per-family sort, never a global sort. The shuffle
    payload is the full record here only because the result must rejoin the
    text; at 100 TB the cheaper plan is rank on the (family, url,
    period_end) projection + equi-join back, but family groups are tiny
    (one issuer's filings) so co-locating whole rows per family is bounded.
    """
    def rank(group: pa.Table) -> pa.Table:
        rows = list(zip(group["url"].to_pylist(),
                        group["period_end"].to_pylist(),
                        group["doc_kind"].to_pylist()))
        filings = sorted((r for r in rows if r[2] == "sec" and r[1]),
                         key=lambda r: (r[1], r[0]))
        seq = {url: i + 1 for i, (url, _, _) in enumerate(filings)}
        col = pa.array([seq.get(u, 0) for u in group["url"].to_pylist()],
                       type=pa.int64())
        return group.append_column("filing_sequence", col)

    return extracted_ds.groupby("family_key").map_groups(
        rank, batch_format="pyarrow")
