"""Relational building blocks used by the query surface: partial-aggregate
groupby, broadcast hash join, grouped rank, first-wins per key.

These encode the shuffle-discipline rules of SURVEY.md §4.2 as reusable
helpers:

* ``pre_aggregate`` — combine inside ``map_batches`` *before* the
  ``groupby`` so the all-to-all moves one row per (block × key), not one
  per input row.
* ``broadcast_join`` — the small side is ``ray.put`` once and dict-looked-up
  inside ``map_batches``; no shuffle at all.
* ``grouped_rank`` — rank within a key ordered by a column; a grouped sort,
  never a global one.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

AGGS = ("sum", "count", "min", "max")


def pre_aggregate(ds, keys: list[str], aggs: dict[str, tuple[str, str]],
                  batch_size: int = 8192, *, as_dataset: bool = False,
                  n_parts: int = 64):
    """Partial+final aggregation.

    ``aggs``: out_col → (in_col, fn) with fn in sum/count/min/max; ``avg``
    is derived by callers as sum/count. Per-batch pandas groupby computes
    partials; the final combine groups the (small) partial rows. The
    default returns the final pandas frame (aggregate results are
    driver-small by contract — report-style key spaces).

    ``as_dataset=True`` is the HIGH-CARDINALITY finish: the partial rows
    take one coarsened ``groupby(key-hash)`` exchange (multi-key hashing
    via :func:`add_coarse_part`) and each partition folds every key it
    holds vectorized — the result stays a Dataset of one row per distinct
    key combo, nothing O(distinct keys) on the driver. Float op-order
    note (advisor): either finish re-sums per-batch float partials in
    block/partition order, a different FP association than a SQL
    engine's direct per-group sum — round on comparison.
    """
    partial_specs = {}
    for out, (col, fn) in aggs.items():
        if fn not in AGGS:
            raise ValueError(f"unsupported agg {fn}")
        partial_specs[out] = (col, fn)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False)
        cols = {}
        for out, (col, fn) in partial_specs.items():
            if fn == "count":
                cols[out] = g[col].count() if col != "*" else g.size()
            else:
                cols[out] = getattr(g[col], fn)()
        return pd.DataFrame(cols).reset_index()

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False)
        out_cols = {}
        for out, (_, fn) in partial_specs.items():
            out_cols[out] = g[out].sum() if fn in ("sum", "count") \
                else getattr(g[out], fn)()
        return pd.DataFrame(out_cols).reset_index()

    partials = ds.map_batches(partial, batch_format="pandas",
                              batch_size=batch_size)
    if as_dataset:
        return (add_coarse_part(partials, keys, n_parts)
                .groupby("_kpart")
                .map_groups(lambda g: fold(g.drop(columns=["_kpart"])),
                            batch_format="pandas"))
    return fold(partials.to_pandas())


def broadcast_join(ds, small_df: pd.DataFrame, *, on: str,
                   select: list[str] | None = None, how: str = "inner",
                   batch_size: int = 8192):
    """Map-side hash join: ``small_df`` is broadcast via ``ray.put`` once;
    each batch merges against it locally."""
    import ray

    if select:
        small_df = small_df[[on, *select]]
    small_ref = ray.put(small_df)

    def join(df: pd.DataFrame) -> pd.DataFrame:
        small = ray.get(small_ref)
        return df.merge(small, on=on, how=how)

    return ds.map_batches(join, batch_format="pandas", batch_size=batch_size)


def semi_join_broadcast(ds, keys, *, on: str, anti: bool = False,
                        batch_size: int = 8192):
    """Semi/anti join against a small key set: the keys are ``ray.put``
    once and each batch filters with a vectorized ``isin`` — no shuffle.
    ``keys`` is any iterable of key values (a pandas Series, list, or
    set). ``anti=True`` keeps rows whose key is NOT in the set
    (blocklist filtering); the default keeps rows whose key IS in it.

    This is the pattern for "filter the 100-TB table by a derived key
    set": compute the key set with a pre-aggregate (driver-small by
    contract), broadcast it, and stream the big side through untouched.
    """
    import numpy as np
    import ray

    key_arr = np.asarray(pd.unique(pd.Series(list(keys))))
    keys_ref = ray.put(key_arr)

    def filt(df: pd.DataFrame) -> pd.DataFrame:
        mask = df[on].isin(ray.get(keys_ref))
        return df[~mask] if anti else df[mask]

    return ds.map_batches(filt, batch_format="pandas",
                          batch_size=batch_size)


def shuffle_join(left, right, *, left_on: str, right_on: str | None = None,
                 how: str = "inner", n_parts: int = 64,
                 batch_size: int = 8192):
    """Big-to-big distributed hash join — neither side fits on the driver.

    Shape: project + tag each side, align both to one physical schema
    (other side's payload columns become typed nulls), union the two
    Datasets, then ONE coarsened ``groupby(key-hash)`` shuffle co-locates
    every row of a key from both sides; an in-partition pandas merge
    finishes. This deliberately avoids Ray 2.49's ``Dataset.join``
    (hash-join aggregators are actors reserving one CPU each —
    num_partitions > free CPUs deadlocks; nested non-key columns are
    rejected), and moves each input row across the wire exactly once.

    ``how`` is ``inner``, ``left``, ``semi`` or ``anti`` — the semi/anti
    modes are the SHUFFLE twin of :func:`semi_join_broadcast` for when
    the key set itself is too big to broadcast: output is the left
    rows whose key does (semi) / does not (anti) appear on the right,
    left columns only. Payload column names must be disjoint between
    the two sides (no suffixing — rename upstream). The right key is
    renamed to ``left_on`` in the output.
    """
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(f"unsupported join type {how}")
    right_on = right_on or left_on

    def arrow_types(schema) -> dict:
        # pandas-block datasets report numpy dtypes / Python classes
        out = {}
        for n, t in zip(schema.names, schema.types):
            if not isinstance(t, pa.DataType):
                try:
                    t = pa.from_numpy_dtype(t)
                except (pa.ArrowNotImplementedError, TypeError):
                    t = pa.string()
            if isinstance(t, pa.ExtensionType):
                # e.g. Ray's tensor extension: two batches carry DISTINCT
                # extension instances that refuse to cast to each other;
                # join on the storage representation instead
                t = t.storage_type
            out[n] = t
        return out

    if how in ("semi", "anti"):
        # only the key matters on the right: never ship its payload
        right = right.select_columns([right_on])
    lschema = left.schema()
    rschema = right.schema()
    lpay = [n for n in lschema.names if n != left_on]
    rpay = [n for n in rschema.names if n != right_on]
    overlap = set(lpay) & set(rpay)
    if overlap:
        raise ValueError(f"overlapping payload columns: {sorted(overlap)}")
    ltypes = arrow_types(lschema)
    rtypes = arrow_types(rschema)
    key_type = ltypes[left_on]
    unified = pa.schema(
        [pa.field(left_on, key_type)]
        + [pa.field(n, ltypes[n]) for n in lpay]
        + [pa.field(n, rtypes[n]) for n in rpay]
        + [pa.field("_side", pa.int8())])

    def align(side: int, key_col: str):
        def add(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = []
            for f in unified:
                if f.name == "_side":
                    cols.append(pa.array([side] * n, type=pa.int8()))
                elif f.name == left_on:
                    cols.append(batch[key_col].cast(f.type))
                elif f.name in batch.column_names:
                    col = batch[f.name]
                    if isinstance(col.type, pa.ExtensionType):
                        col = col.cast(col.type.storage_type)
                    cols.append(col.cast(f.type))
                else:
                    cols.append(pa.nulls(n, type=f.type))
            return pa.Table.from_arrays(cols, schema=unified)
        return add

    tagged = (left.map_batches(align(0, left_on), batch_format="pyarrow",
                               batch_size=batch_size)
              .union(right.map_batches(align(1, right_on),
                                       batch_format="pyarrow",
                                       batch_size=batch_size)))

    if how in ("semi", "anti"):
        out_schema = pa.schema(
            [pa.field(left_on, key_type)]
            + [pa.field(n, ltypes[n]) for n in lpay])
    else:
        out_schema = pa.schema(
            [pa.field(left_on, key_type)]
            + [pa.field(n, ltypes[n]) for n in lpay]
            + [pa.field(n, rtypes[n]) for n in rpay])

    def merge(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = group["_side"]
        lt = group.filter(pc.equal(side, 0)).select([left_on, *lpay])
        if how in ("semi", "anti"):
            rkeys = group.filter(pc.equal(side, 1))[left_on]
            mask = pc.is_in(lt[left_on], value_set=rkeys.combine_chunks())
            if how == "anti":
                mask = pc.invert(mask)
            return lt.filter(mask).cast(out_schema)
        rt = group.filter(pc.equal(side, 1)).select([left_on, *rpay])
        out = lt.to_pandas().merge(rt.to_pandas(), on=left_on, how=how)
        if not len(out):
            return out_schema.empty_table()
        # left joins put NaN in unmatched right payloads; from_pandas=True
        # maps those to typed nulls instead of failing the int cast
        cols = [pa.array(out[f.name], type=f.type, from_pandas=True)
                for f in out_schema]
        return pa.Table.from_arrays(cols, schema=out_schema)

    return (add_coarse_part(tagged, left_on, n_parts)
            .groupby("_kpart").map_groups(merge, batch_format="pyarrow"))


def add_coarse_part(ds, key: str | list[str], n_parts: int = 64,
                    part_col: str = "_kpart"):
    """Append a COARSENED partition key — hash(key) % n_parts — so a
    downstream ``groupby(part_col)`` co-locates all rows of each key while
    the executor sees ``n_parts`` groups instead of one per key (Ray's
    ``map_groups`` costs ~0.25 ms of Python per group; 15k customer keys
    cost ~4 s of pure dispatch). Works for string and integer keys; a
    LIST of keys hashes each column at full 64-bit width and mixes the
    per-column hashes (no early modulo, no string concatenation)."""
    from .manifest import _mix64, string_hash64, url_bucket

    import numpy as np

    def col_hash(batch: pa.Table, name: str) -> np.ndarray:
        col = batch[name]
        if pa.types.is_integer(col.type):
            vals = col.combine_chunks().to_numpy(zero_copy_only=False) \
                if isinstance(col, pa.ChunkedArray) else \
                col.to_numpy(zero_copy_only=False)
            return _mix64(vals.astype(np.uint64))
        return string_hash64(col.cast(pa.string()))

    keys = [key] if isinstance(key, str) else list(key)

    def add(batch: pa.Table) -> pa.Table:
        if len(keys) == 1:
            col = batch[keys[0]]
            if pa.types.is_integer(col.type):
                part = (col_hash(batch, keys[0])
                        % np.uint64(n_parts)).astype(np.int64)
                arr = pa.array(part, type=pa.int64())
            else:
                arr = url_bucket(col.cast(pa.string()),
                                 n_parts).cast(pa.int64())
        else:
            h = np.zeros(batch.num_rows, dtype=np.uint64)
            for name in keys:
                h = _mix64(h * np.uint64(0x100000001B3)
                           ^ col_hash(batch, name))
            arr = pa.array((h % np.uint64(n_parts)).astype(np.int64),
                           type=pa.int64())
        return batch.append_column(part_col, arr)

    return ds.map_batches(add, batch_format="pyarrow")


def grouped_rank(ds, key: str, order_by: list[str], rank_col: str = "rnk",
                 n_parts: int = 64):
    """row_number() over (partition by key order by order_by) as a grouped
    shuffle; deterministic via full order_by tie-breaks. The shuffle key is
    coarsened (see :func:`add_coarse_part`); ranking within a partition is
    a vectorized pandas sort + grouped cumcount over every key it holds."""
    def rank(group: pa.Table) -> pa.Table:
        df = (group.to_pandas()
              .sort_values([key, *order_by], kind="mergesort"))
        df[rank_col] = df.groupby(key, sort=False).cumcount() + 1
        return pa.Table.from_pandas(df.drop(columns=["_kpart"]),
                                    preserve_index=False)

    return (add_coarse_part(ds, key, n_parts)
            .groupby("_kpart").map_groups(rank, batch_format="pyarrow"))


def first_per_key(ds, key: str, order_by: list[str], *,
                  keep: list[str], n_parts: int = 64):
    """arg_min-style first row per key (deterministic order_by); same
    coarsened-shuffle shape as :func:`grouped_rank`."""
    def first(group: pa.Table) -> pa.Table:
        df = (group.to_pandas()
              .sort_values([key, *order_by], kind="mergesort")
              .drop_duplicates(key, keep="first"))
        return pa.Table.from_pandas(df[[key, *keep]], preserve_index=False)

    return (add_coarse_part(ds, key, n_parts)
            .groupby("_kpart").map_groups(first, batch_format="pyarrow"))


def topk(ds, by: str, k: int, *, ascending: bool = False,
         tie_break: str | None = None,
         batch_size: int = 8192) -> pd.DataFrame:
    """Global top-k without a global sort: per-batch local top-k, then a
    driver-side merge of the k × blocks candidates. ``tie_break`` (always
    ascending) makes the result deterministic under value ties."""
    cols = [by] + ([tie_break] if tie_break else [])
    asc = [ascending] + [True] * (len(cols) - 1)

    def local(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(cols, ascending=asc, kind="mergesort").head(k)

    cands = ds.map_batches(local, batch_format="pandas",
                           batch_size=batch_size).to_pandas()
    return (cands.sort_values(cols, ascending=asc, kind="mergesort")
            .head(k).reset_index(drop=True))


def grouped_topk(ds, key: str, by: str, k: int, *,
                 tie_break: str, keep: list[str] | None = None,
                 ascending: bool = False, n_parts: int = 64,
                 batch_size: int = 8192):
    """Top-k rows per key (largest ``by``, deterministic ``tie_break``).

    Two-level pruning so the shuffle never moves more than it must:
    per-BATCH local top-k per key first (a batch can contribute at most k
    rows per key to the exchange), then the coarsened ``groupby(key-hash)``
    co-locates each key's candidates and a vectorized in-partition
    sort + grouped head finishes. Bounded output per key — the grouped
    twin of :func:`topk`."""
    cols = [by, tie_break]
    asc = [ascending, True]
    out_cols = [key, *(keep if keep is not None else [by, tie_break])]

    def local(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, *cols], ascending=[True, *asc],
                            kind="mergesort")
        return df.groupby(key, sort=False).head(k)

    pruned = ds.map_batches(local, batch_format="pandas",
                            batch_size=batch_size)

    def final(group: pa.Table) -> pa.Table:
        df = (group.to_pandas()
              .sort_values([key, *cols], ascending=[True, *asc],
                           kind="mergesort"))
        df = df.groupby(key, sort=False).head(k)
        df["rnk"] = df.groupby(key, sort=False).cumcount() + 1
        return pa.Table.from_pandas(df[[*out_cols, "rnk"]],
                                    preserve_index=False)

    return (add_coarse_part(pruned, key, n_parts)
            .groupby("_kpart").map_groups(final, batch_format="pyarrow"))


def stratified_sample(ds, group_col: str, id_col: str,
                      rates: dict[str, float], *,
                      default_rate: float = 0.0, batch_size: int = 8192):
    """Deterministic per-stratum sampling: keep a row iff the first 4 hex
    chars of ``md5(id)`` fall below the stratum's rate threshold — the
    same content-free stable hash as :func:`..textstats.assign_split`, so
    the sample is reproducible on any cluster size and any partitioning,
    with no RNG state and no shuffle (pure per-batch map). ``rates`` maps
    group value → keep fraction; thresholds round to 4 hex digits
    (65536ths) so the exact rule is SQL-replicable for the oracle."""
    import hashlib

    thresholds = {g: format(min(65535, int(round(r * 65536))), "04x")
                  for g, r in rates.items()}
    default_thr = format(min(65535, int(round(default_rate * 65536))), "04x")

    def sample(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.Series(
            [hashlib.md5(str(v).encode()).hexdigest()[:4]
             for v in df[id_col]], index=df.index)
        thr = (df[group_col].map(thresholds).fillna(default_thr))
        return df[h < thr]

    return ds.map_batches(sample, batch_format="pandas",
                          batch_size=batch_size)


def asof_join_backward(ds, right_df: pd.DataFrame, *, key: str,
                       right_key: str, ts: str, right_ts: str,
                       value_cols: list[str], batch_size: int = 8192):
    """As-of join (Ray Data has none): for each left row, the latest right
    row of the same key with right_ts <= ts. Inner semantics.

    The right side is broadcast once (sorted); each left batch runs one
    vectorized ``pandas.merge_asof``. At scale, when the right side stops
    being broadcastable, the same semantics run per key-bucket: hash both
    sides on the key, sort within bucket, merge — the documented
    partitioning assumption (co-partition by key, time-sorted).
    """
    import ray

    right = right_df.rename(columns={right_key: key, right_ts: ts})
    # full-column tie-break: among right rows sharing (key, ts),
    # merge_asof(backward) takes the LAST row in sort order, so sorting
    # by the value columns too makes the winner the max value tuple —
    # deterministic under any input order (review finding)
    right = right[[key, ts, *value_cols]].sort_values(
        [ts, *value_cols], kind="mergesort")
    right_ref = ray.put(right)

    def join(df: pd.DataFrame) -> pd.DataFrame:
        r = ray.get(right_ref).copy()
        left = df.sort_values(ts, kind="mergesort").copy()
        # arrow round-trips yield mixed s/us/ns resolutions; merge_asof
        # requires identical dtypes
        left[ts] = left[ts].astype("datetime64[ns]")
        r[ts] = r[ts].astype("datetime64[ns]")
        out = pd.merge_asof(left, r, on=ts, by=key, direction="backward")
        return out.dropna(subset=value_cols)

    return ds.map_batches(join, batch_format="pandas", batch_size=batch_size)


def sessionize(ds, *, key: str, ts: str, id_col: str,
               gap_seconds: int = 1800, n_parts: int = 64):
    """Gap-based sessionization: a new session starts when the time since
    the key's previous event exceeds ``gap_seconds``. Emits
    (id_col, key, session_seq) with session_seq 1-based per key.

    The custom windowed operator the reference lacks and Ray Data doesn't
    ship. Shuffle shape: the key is COARSENED (:func:`add_coarse_part`) so
    the executor sees ``n_parts`` groups, not one Python ``map_groups``
    call per user key (~0.25 ms dispatch each — hours at 10^8 users); the
    in-partition computation is one vectorized pandas sort + per-key
    grouped diff/cumsum over every key the partition holds."""
    import pyarrow as pa

    def assign(group: pa.Table) -> pa.Table:
        df = (group.to_pandas()
              .sort_values([key, ts, id_col], kind="mergesort"))
        g = df.groupby(key, sort=False)
        gap = g[ts].diff().dt.total_seconds()
        new_session = gap.isna() | (gap > gap_seconds)
        df["session_seq"] = (new_session.groupby(df[key], sort=False)
                             .cumsum().astype("int64"))
        return pa.Table.from_pandas(df[[id_col, key, "session_seq"]],
                                    preserve_index=False)

    return (add_coarse_part(ds, key, n_parts)
            .groupby("_kpart").map_groups(assign, batch_format="pyarrow"))


def sliding_window_sum(ds, *, key: str, ts_day_col: str, value_col: str,
                       window: int = 7) -> pd.DataFrame:
    """Trailing ROWS-window aggregate over a daily series per key.

    Two-level shape: the heavy data reduces to per-(key, day) partials
    inside ``map_batches`` (pre-aggregate pattern — the shuffle carries
    one row per key×day, bounded by calendar size × key cardinality, not
    by event count); the tiny aggregated frame then gets a vectorized
    pandas ``rolling`` per key. Matches SQL ``SUM(...) OVER (PARTITION BY
    key ORDER BY day ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW)``
    over the daily aggregate."""
    daily = pre_aggregate(ds, [key, ts_day_col],
                          {"day_value": (value_col, "sum"),
                           "n": (value_col, "count")})
    daily = daily.sort_values([key, ts_day_col], kind="mergesort")
    daily["window_value"] = (daily.groupby(key, sort=False)["day_value"]
                             .transform(lambda s: s.rolling(window,
                                                            min_periods=1)
                                        .sum()))
    return daily.reset_index(drop=True)


def range_join_count(ds, right_df: pd.DataFrame, *, key: str,
                     right_key: str, ts: str, right_start: str,
                     right_end: str, id_col: str,
                     batch_size: int = 8192) -> pd.DataFrame:
    """Range join (Ray Data has none): count, per left row, the right-side
    intervals of the same key containing its timestamp
    (``right_start <= ts < right_end``). Inner semantics — left rows with
    zero matches are absent.

    The right side (key, start, end) broadcasts once sorted by key; each
    left batch equi-merges on key then applies the vectorized interval
    filter — the broadcast-range-join shape. At scale, when the interval
    table stops being broadcastable, the same semantics run key-bucketed:
    hash-partition both sides on the key and run this per partition (the
    co-partitioning assumption every distributed range join rests on)."""
    import ray

    small = right_df[[right_key, right_start, right_end]].copy()
    small_ref = ray.put(small)

    def count(df: pd.DataFrame) -> pd.DataFrame:
        r = ray.get(small_ref)
        m = df[[id_col, key, ts]].merge(
            r, left_on=key, right_on=right_key, how="inner")
        hit = m[(m[ts] >= m[right_start]) & (m[ts] < m[right_end])]
        if hit.empty:
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        out = (hit.groupby(id_col, sort=False).size()
               .reset_index(name="n"))
        return out

    parts = ds.map_batches(count, batch_format="pandas",
                           batch_size=batch_size).to_pandas()
    if parts.empty:
        return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                             "n": pd.Series(dtype="int64")})
    # left rows never split across batches → partials are already final
    return parts.sort_values(id_col).reset_index(drop=True)


def grouped_quantiles(ds, key: str, value_col: str,
                      quantiles=(0.5, 0.9, 0.99), *,
                      n_parts: int = 64, method: str = "exact",
                      nbins: int = 64) -> pd.DataFrame:
    """Per-key quantiles, exact or sketch-grade, same output shape.

    ``method="exact"`` (default, linear interpolation — matches SQL
    ``quantile_cont``): coarsened-key shuffle co-locates each key's values,
    the in-partition computation is one vectorized pandas groupby-quantile
    over every key the partition holds. Exactness requires a full shuffle
    of the value column by construction.

    ``method="sketch"``: the 100-TB swap — per-batch mergeable equi-width
    histograms (``sketch.grouped_histogram``, ≤ keys × ``nbins`` partial
    rows per batch, ZERO shuffles) with linear interpolation inside the
    containing bin; per-key error is bounded by one bin width of that
    key's value range. Callers flip one flag instead of rewiring onto the
    sketch module."""
    if method == "sketch":
        from .sketch import grouped_histogram, histogram_quantiles

        hist, bounds = grouped_histogram(ds, key, value_col, nbins=nbins,
                                         return_bounds=True)
        out = histogram_quantiles(hist, key, quantiles, bounds=bounds,
                                  nbins=nbins)
        return out.sort_values(key).reset_index(drop=True)
    if method != "exact":
        raise ValueError(f"unknown quantile method {method}")
    qcols = [f"q{int(q * 100)}" for q in quantiles]

    def part(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        g = df.groupby(key, sort=False)[value_col]
        out = {key: []}
        vals: dict[str, list] = {c: [] for c in qcols}
        for k, s in g:
            out[key].append(k)
            for q, c in zip(quantiles, qcols):
                vals[c].append(float(s.quantile(q, interpolation="linear")))
        return pa.Table.from_pandas(pd.DataFrame({**out, **vals}),
                                    preserve_index=False)

    res = (add_coarse_part(ds.select_columns([key, value_col]), key, n_parts)
           .groupby("_kpart").map_groups(part, batch_format="pyarrow")
           .to_pandas())
    return res.sort_values(key).reset_index(drop=True)


def grouped_percent_rank(ds, key: str, order_by: list[str],
                         pct_col: str = "pct", n_parts: int = 64):
    """percent_rank() over (partition by key order by order_by): rank
    normalized to [0, 1] as (rank - 1) / (n_key - 1) — the quantile
    normalization used to compare a score against its group (e.g. doc
    quality vs language peers). Deterministic when order_by ends in a
    unique tie-break column.

    Same coarsened-shuffle shape as :func:`grouped_rank`; the per-key
    row count comes from a vectorized grouped transform inside the same
    partition pass, so no second shuffle. Single-row keys get 0.0 (the
    SQL convention).
    """
    import numpy as np

    def rank(group: pa.Table) -> pa.Table:
        df = (group.to_pandas()
              .sort_values([key, *order_by], kind="mergesort"))
        g = df.groupby(key, sort=False)
        n = g[key].transform("size").to_numpy(dtype=np.float64)
        r = g.cumcount().to_numpy(dtype=np.float64)
        df[pct_col] = np.where(n > 1, r / (n - 1), 0.0)
        return pa.Table.from_pandas(df.drop(columns=["_kpart"]),
                                    preserve_index=False)

    return (add_coarse_part(ds, key, n_parts)
            .groupby("_kpart").map_groups(rank, batch_format="pyarrow"))


def grouped_count_distinct(ds, key_expr_col: str, value_col: str, *,
                           n_parts: int = 64, batch_size: int = 8192):
    """Exact COUNT(DISTINCT value) per key. Per-batch local (key, value)
    dedupe prunes the exchange (a batch contributes each pair once),
    then the coarsened ``groupby(key-hash)`` co-locates a key's
    remaining pairs and an in-partition pandas ``nunique`` finishes —
    the exact-answer twin of the KMV/HLL sketches for when the
    distinct-pair volume is worth shuffling.
    """
    def local(df: pd.DataFrame) -> pd.DataFrame:
        return df[[key_expr_col, value_col]].drop_duplicates()

    pruned = ds.map_batches(local, batch_format="pandas",
                            batch_size=batch_size)

    def final(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        out = (df.groupby(key_expr_col, sort=False)[value_col]
               .nunique().rename("n_distinct").reset_index())
        out["n_distinct"] = out["n_distinct"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    return (add_coarse_part(pruned, key_expr_col, n_parts)
            .groupby("_kpart").map_groups(final, batch_format="pyarrow"))


def asof_join_shuffle(left_ds, right_ds, *, key: str, right_key: str,
                      ts: str, right_ts: str, value_cols: list[str],
                      n_parts: int = 64, batch_size: int = 8192):
    """Big-to-big as-of join: neither side broadcasts.

    The scale twin of :func:`asof_join_backward` (whose right side is a
    ``ray.put`` pandas frame): both sides project to (key, ts, payload),
    align to one schema with typed nulls plus a side tag, union, and a
    single coarsened ``groupby(key-hash)`` co-locates every row of a key
    from both sides; a vectorized in-partition ``merge_asof`` (sorted by
    ts, by=key) finishes. Inner semantics — left rows with no earlier
    right row are dropped, matching the broadcast version. One exchange,
    each input row moves once; identical output to the broadcast path.
    """
    import numpy as np

    left_pay = [c for c in left_ds.schema().names if c not in (key, ts)]

    def lrows(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[key, ts, *left_pay]].copy()
        for c in value_cols:
            out[c] = np.nan
        out["_side"] = np.int8(0)
        return out

    def rrows(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[right_key, right_ts, *value_cols]].rename(
            columns={right_key: key, right_ts: ts})
        for c in left_pay:
            out[c] = None
        out["_side"] = np.int8(1)
        return out[[key, ts, *left_pay, *value_cols, "_side"]]

    unioned = (left_ds.map_batches(lrows, batch_format="pandas",
                                   batch_size=batch_size)
               .union(right_ds.map_batches(rrows, batch_format="pandas",
                                           batch_size=batch_size)))

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        df = group
        lt = df[df["_side"] == 0]
        rt = df[df["_side"] == 1]
        if lt.empty or rt.empty:
            return pd.DataFrame(
                {c: pd.Series(dtype="object")
                 for c in (key, ts, *left_pay, *value_cols)})
        l = lt[[key, ts, *left_pay]].sort_values(ts, kind="mergesort")
        # same full-column tie-break as asof_join_backward: the winner
        # among duplicate (key, ts) right rows must not depend on the
        # shuffle's partition-assembly order
        r = rt[[key, ts, *value_cols]].sort_values(
            [ts, *value_cols], kind="mergesort")
        # arrow round-trips yield mixed s/us/ns resolutions; merge_asof
        # requires identical dtypes
        l = l.copy()
        r = r.copy()
        l[ts] = l[ts].astype("datetime64[ns]")
        r[ts] = r[ts].astype("datetime64[ns]")
        out = pd.merge_asof(l, r, on=ts, by=key, direction="backward")
        return out.dropna(subset=value_cols)

    return (add_coarse_part(unioned, key, n_parts)
            .groupby("_kpart")
            .map_groups(lambda g: merge(g.drop(columns=["_kpart"])),
                        batch_format="pandas"))


def grouped_running_sum(ds, key: str, order_by: list[str],
                        value_col: str, *, out_col: str = "running",
                        n_parts: int = 64):
    """Cumulative SUM(value) OVER (PARTITION BY key ORDER BY order_by
    ROWS UNBOUNDED PRECEDING) — the running-total window the feature
    pipelines ask for. Same coarsened-shuffle shape as
    :func:`grouped_rank`: one exchange on the hashed key, vectorized
    in-partition sort + grouped cumsum over every key the partition
    holds; deterministic via full order_by tie-breaks."""
    def accum(group: pa.Table) -> pa.Table:
        df = (group.to_pandas()
              .sort_values([key, *order_by], kind="mergesort"))
        df[out_col] = (df.groupby(key, sort=False)[value_col]
                       .cumsum().astype("float64"))
        return pa.Table.from_pandas(df.drop(columns=["_kpart"]),
                                    preserve_index=False)

    return (add_coarse_part(ds, key, n_parts)
            .groupby("_kpart").map_groups(accum, batch_format="pyarrow"))


def grouping_sets_aggregate(ds, keys: list[str], sets, aggs: dict, *,
                            all_label: str = "ALL",
                            batch_size: int = 8192,
                            mode: str = "driver",
                            n_parts: int = 64):
    """GROUP BY GROUPING SETS: the finest level (all ``keys``) runs as
    ONE :func:`pre_aggregate` pass over the data; every requested
    grouping set folds FROM that finest level — the input streams
    exactly once regardless of how many sets. sum/count fold by sum,
    min/max by min/max (avg = derive sum/count downstream, as
    everywhere in this module). Keys absent from a set carry
    ``all_label`` (deterministic, SQL-COALESCE-replicable — a NULL
    would hash differently between pandas and the oracle). Keys must
    be non-null and must not collide with ``all_label``: pandas
    groupby silently drops NULL-keyed rows (diverging from SQL, which
    totals them), and a genuine key equal to the label would be
    indistinguishable from subtotal rows — both raise (per batch,
    BEFORE the groupby can hide them) instead of corrupting totals.
    :func:`rollup_aggregate` (prefix sets) and :func:`cube_aggregate`
    (the power set) are thin wrappers.

    ``mode="driver"`` (default) folds the coarser levels from the
    finest-level pandas frame on the driver — right for report-style
    key spaces (the frame is O(distinct combos)). ``mode="distributed"``
    is the HIGH-CARDINALITY path: the finest level stays a Dataset
    (:func:`pre_aggregate` ``as_dataset=True``), each coarser level is
    one coarsened ``groupby(level-key-hash)`` exchange over that
    partial Dataset, and the result is returned as a Dataset (union of
    levels) — nothing O(distinct combos) ever lands on the driver. In
    distributed mode key columns come back as STRINGS (one union
    schema across levels) and agg columns as float64 (int64 for
    count).

    Float op-order note (advisor): coarser-level SUMs re-add
    finest-level float partials — a different FP association than a
    SQL engine's direct per-group sum over raw rows. At the 2-dp
    rounding of the revenue oracles this has never flipped a digit,
    but a boundary value could; if a grouping-sets oracle ever hash
    flakes on the last digit, diagnose HERE first (same ULP class as
    the documented kmeans caveat)."""
    def _guard(df: pd.DataFrame) -> pd.DataFrame:
        if df[keys].isna().any().any():
            raise ValueError(
                "grouping-sets aggregation requires non-null key values "
                "(pandas groupby drops them; SQL would total them) — "
                "fillna upstream")
        if df[keys].isin([all_label]).any().any():
            raise ValueError(
                f"key value collides with all_label {all_label!r} — "
                "pick a different all_label")
        return df

    guarded = ds.map_batches(_guard, batch_format="pandas",
                             batch_size=batch_size)
    fold_fn = {out: ("sum" if fn in ("sum", "count") else fn)
               for out, (_, fn) in aggs.items()}
    if mode == "distributed":
        return _grouping_sets_distributed(
            guarded, keys, sets, aggs, fold_fn, all_label=all_label,
            batch_size=batch_size, n_parts=n_parts)
    if mode != "driver":
        raise ValueError(f"unknown grouping-sets mode {mode}")
    fine = pre_aggregate(guarded, keys, aggs, batch_size=batch_size)
    frames = []
    for lvl in sets:
        lvl = list(lvl)
        if lvl == keys:
            g = fine.copy()
        elif lvl:
            g = fine.groupby(lvl, sort=False).agg(
                {out: fn for out, fn in fold_fn.items()}).reset_index()
        else:
            g = pd.DataFrame([{out: (fine[out].sum() if fn == "sum"
                                     else getattr(fine[out], fn)())
                               for out, fn in fold_fn.items()}])
        for dropped in (k for k in keys if k not in lvl):
            g[dropped] = all_label
        frames.append(g[[*keys, *fold_fn]])
    return pd.concat(frames, ignore_index=True)


def _grouping_sets_distributed(guarded, keys, sets, aggs, fold_fn, *,
                               all_label, batch_size, n_parts):
    """Dataset-native grouping-sets finish (see
    :func:`grouping_sets_aggregate` ``mode="distributed"``): fine level
    = one coarsened pre-aggregate exchange; each non-empty coarser
    level = one more coarsened exchange over the (already reduced)
    fine Dataset; the grand-total level folds single-row per-block
    partials (O(blocks) driver rows, not O(combos))."""
    import ray.data

    out_schema = pa.schema(
        [pa.field(k, pa.string()) for k in keys]
        + [pa.field(out, pa.int64() if aggs[out][1] == "count"
                    else pa.float64()) for out in fold_fn])

    def to_table(g: pd.DataFrame) -> pa.Table:
        cols = [pa.array(g[f.name], type=f.type, from_pandas=True)
                for f in out_schema]
        return pa.Table.from_arrays(cols, schema=out_schema)

    def to_str(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        for k in keys:
            out[k] = out[k].astype(str)
        return out

    fine = pre_aggregate(
        guarded.map_batches(to_str, batch_format="pandas",
                            batch_size=batch_size),
        keys, aggs, batch_size=batch_size, as_dataset=True,
        n_parts=n_parts).materialize()  # consumed once per level

    def level_fold(lvl):
        def fn(df: pd.DataFrame) -> pa.Table:
            df = df.drop(columns=["_kpart"])
            g = df.groupby(lvl, sort=False).agg(
                {out: f for out, f in fold_fn.items()}).reset_index()
            for dropped in (k for k in keys if k not in lvl):
                g[dropped] = all_label
            return to_table(g)
        return fn

    parts_ds = []
    for lvl in sets:
        lvl = list(lvl)
        if lvl == keys:
            parts_ds.append(fine.map_batches(
                lambda df: to_table(df), batch_format="pandas"))
        elif lvl:
            parts_ds.append(
                add_coarse_part(fine, lvl, n_parts)
                .groupby("_kpart").map_groups(level_fold(lvl),
                                              batch_format="pandas"))
        else:
            def block_total(df: pd.DataFrame) -> pd.DataFrame:
                return pd.DataFrame(
                    [{out: (df[out].sum() if fn == "sum"
                            else getattr(df[out], fn)())
                      for out, fn in fold_fn.items()}])

            gt = (fine.map_batches(block_total, batch_format="pandas")
                  .to_pandas())
            row = pd.DataFrame(
                [{out: (gt[out].sum() if fn == "sum"
                        else getattr(gt[out], fn)())
                  for out, fn in fold_fn.items()}])
            for k in keys:
                row[k] = all_label
            parts_ds.append(ray.data.from_arrow(to_table(row)))
    result = parts_ds[0]
    for extra in parts_ds[1:]:
        result = result.union(extra)
    return result


def rollup_aggregate(ds, keys: list[str], aggs: dict, *,
                     all_label: str = "ALL", batch_size: int = 8192,
                     mode: str = "driver", n_parts: int = 64):
    """GROUP BY ROLLUP(keys...) = grouping sets over the key-list
    prefixes, longest first (see :func:`grouping_sets_aggregate`)."""
    sets = [keys[:i] for i in range(len(keys), -1, -1)]
    return grouping_sets_aggregate(ds, keys, sets, aggs,
                                   all_label=all_label,
                                   batch_size=batch_size,
                                   mode=mode, n_parts=n_parts)


def grouped_corr(ds, key: str, x_col: str, y_col: str, *,
                 batch_size: int = 8192,
                 n_parts: int = 64) -> pd.DataFrame:
    """Pearson correlation per key from moment partials — one streaming
    pass: each batch contributes (n, Σx, Σy, Σxy, Σx², Σy²) per key
    (six numbers per key per batch, never the rows), a coarsened
    ``groupby(key-hash)`` exchange folds them to ONE row per distinct
    key (advisor: the earlier driver-side fold collected
    O(batches × keys) partial rows — the only aggregate in this module
    that skipped the coarsened-combine discipline), and

        r = (n·Σxy − Σx·Σy) / (√(n·Σx² − Σx²ᵗᵒᵗ) · √(n·Σy² − Σy²ᵗᵒᵗ))

    is evaluated ONCE from the folded sums — the exact expression a SQL
    oracle can mirror term for term (never the incremental-update form,
    whose float error path differs; the fold re-adds per-batch float
    partials in partition order, a different FP association than SQL's
    direct per-group sums — masked by the 6-dp round, same ULP class
    as the documented kmeans caveat). Rows with a null x or y are
    dropped (SQL aggregate semantics)."""
    import numpy as np

    def part(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=[x_col, y_col])
        x = d[x_col].to_numpy(np.float64)
        y = d[y_col].to_numpy(np.float64)
        g = pd.DataFrame({key: d[key], "x": x, "y": y,
                          "xy": x * y, "xx": x * x, "yy": y * y})
        agg = g.groupby(key, sort=False).agg(
            n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
            sxy=("xy", "sum"), sxx=("xx", "sum"), syy=("yy", "sum"))
        return agg.reset_index()

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        return (group.drop(columns=["_kpart"])
                .groupby(key, sort=False).sum(numeric_only=True)
                .reset_index())

    part_ds = (ds.select_columns([key, x_col, y_col])
               .map_batches(part, batch_format="pandas",
                            batch_size=batch_size))
    parts = (add_coarse_part(part_ds, key, n_parts)
             .groupby("_kpart").map_groups(fold, batch_format="pandas")
             .to_pandas())
    tot = parts.groupby(key, sort=True).sum(numeric_only=True)
    n = tot["n"].to_numpy(np.float64)
    sx, sy = tot["sx"].to_numpy(), tot["sy"].to_numpy()
    sxy, sxx, syy = (tot["sxy"].to_numpy(), tot["sxx"].to_numpy(),
                     tot["syy"].to_numpy())
    denom = np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy)
    with np.errstate(divide="ignore", invalid="ignore"):
        r = np.where(denom > 0, (n * sxy - sx * sy) / denom, np.nan)
    out = pd.DataFrame({key: tot.index, "n": tot["n"].astype("int64"),
                        "corr": np.round(r, 6)})
    return out.reset_index(drop=True)


def cube_aggregate(ds, keys: list[str], aggs: dict, *,
                   all_label: str = "ALL", batch_size: int = 8192,
                   mode: str = "driver", n_parts: int = 64):
    """GROUP BY CUBE(keys...) = grouping sets over the power set of the
    key list, finest first (see :func:`grouping_sets_aggregate`)."""
    from itertools import combinations

    sets = [list(c) for r in range(len(keys), -1, -1)
            for c in combinations(keys, r)]
    return grouping_sets_aggregate(ds, keys, sets, aggs,
                                   all_label=all_label,
                                   batch_size=batch_size,
                                   mode=mode, n_parts=n_parts)


def funnel_conversion(ds, *, key: str, ts: str, type_col: str,
                      from_event: str, to_event: str,
                      window_seconds: int = 3600, n_parts: int = 64,
                      batch_size: int = 8192):
    """Sequential-pattern funnel window (Ray Data has none): per key,
    how many ``to_event`` rows were preceded by a ``from_event`` of the
    same key (latest one with ts ≤ the target's ts) within
    ``window_seconds``. The click→purchase attribution question.

    Shape: the input projects to (key, ts, stage-flag) rows filtered to
    the two event types (everything else never leaves the batch); ONE
    coarsened ``groupby(key-hash)`` exchange co-locates each key's
    rows; the in-partition pass is one vectorized sort + per-key
    forward-fill of the last ``from_event`` timestamp + window test.
    Ties at equal ts resolve from-before-to (a same-instant
    ``from_event`` counts — SQL's ``c.ts <= p.ts`` semantics), pinned
    by the explicit stage-flag sort column, not event-name order.
    Returns a Dataset of (key, n_target, n_converted) — one row per key
    with ≥1 ``to_event``."""
    def proj(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df[type_col].isin([from_event, to_event])]
        return pd.DataFrame({
            key: d[key],
            ts: d[ts],
            "_r": (d[type_col] == to_event).astype("int8")})

    rows = (ds.select_columns([key, ts, type_col])
            .map_batches(proj, batch_format="pandas",
                         batch_size=batch_size))

    def compute(group: pd.DataFrame) -> pd.DataFrame:
        df = group.sort_values([key, ts, "_r"], kind="mergesort")
        df[ts] = df[ts].astype("datetime64[ns]")
        last_from = (df[ts].where(df["_r"] == 0)
                     .groupby(df[key], sort=False).ffill())
        tgt = df[df["_r"] == 1]
        delta = (tgt[ts] - last_from[tgt.index]).dt.total_seconds()
        conv = (delta.notna() & (delta <= window_seconds))
        agg = (pd.DataFrame({key: tgt[key], "n": 1,
                             "c": conv.astype("int64")})
               .groupby(key, sort=False)
               .agg(n_target=("n", "sum"), n_converted=("c", "sum"))
               .reset_index())
        agg["n_target"] = agg["n_target"].astype("int64")
        agg["n_converted"] = agg["n_converted"].astype("int64")
        return agg

    return (add_coarse_part(rows, key, n_parts)
            .groupby("_kpart")
            .map_groups(lambda g: compute(g.drop(columns=["_kpart"])),
                        batch_format="pandas"))


def grouped_ntile(ds, key: str, order_by: list[str], *, tiles: int = 4,
                  out_col: str = "tile", n_parts: int = 64):
    """NTILE(t) OVER (PARTITION BY key ORDER BY order_by) — equal-ish
    quantile bucket assignment per key (1-based; the first ``n % t``
    buckets take one extra row, SQL's exact fill rule; keys with fewer
    rows than tiles give each row its own bucket). Deterministic via
    full order_by tie-breaks. Same coarsened-shuffle shape as
    :func:`grouped_rank`; the in-partition computation is one
    vectorized sort + grouped cumcount + closed-form bucket formula."""
    import numpy as np

    def assign(group: pa.Table) -> pa.Table:
        df = (group.to_pandas()
              .sort_values([key, *order_by], kind="mergesort"))
        g = df.groupby(key, sort=False)
        r = g.cumcount().to_numpy(np.int64)
        n = g[key].transform("size").to_numpy(np.int64)
        base = n // tiles
        rem = n % tiles
        cut = rem * (base + 1)
        tile = np.where(r < cut, r // (base + 1),
                        rem + (r - cut) // np.maximum(base, 1))
        df[out_col] = (tile + 1).astype("int64")
        return pa.Table.from_pandas(df.drop(columns=["_kpart"]),
                                    preserve_index=False)

    return (add_coarse_part(ds, key, n_parts)
            .groupby("_kpart").map_groups(assign, batch_format="pyarrow"))


def grouped_mode(ds, key: str, value_col: str, *, out_col: str = "modal",
                 n_parts: int = 64, batch_size: int = 8192):
    """Most frequent value per key (grouped MODE), ties to the smallest
    value — deterministic under any partitioning. Combiner-shaped: each
    batch reduces to (key, value, count) partials (a batch contributes
    each pair once), ONE coarsened ``groupby(key-hash)`` exchange folds
    the counts and picks the argmax in-partition. Returns a Dataset of
    (key, out_col) — one row per key, never the raw pairs on the
    driver. NULL keys or values raise per batch (the grouping-sets
    discipline: pandas groupby silently drops them while SQL keeps a
    NULL group — filter upstream if you mean to exclude them)."""
    def part(df: pd.DataFrame) -> pd.DataFrame:
        if df[key].isna().any() or df[value_col].isna().any():
            raise ValueError(
                "grouped_mode requires non-null keys and values "
                "(pandas groupby drops them; SQL would group them) — "
                "filter upstream")
        return (df.groupby([key, value_col], sort=False).size()
                .rename("c").reset_index())

    parts = ds.select_columns([key, value_col]).map_batches(
        part, batch_format="pandas", batch_size=batch_size)

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.groupby([key, value_col], sort=False)["c"].sum()
             .reset_index()
             .sort_values([key, "c", value_col],
                          ascending=[True, False, True],
                          kind="mergesort"))
        top = g.drop_duplicates(key, keep="first")
        return (top[[key, value_col]]
                .rename(columns={value_col: out_col}))

    return (add_coarse_part(parts, key, n_parts)
            .groupby("_kpart")
            .map_groups(lambda g: fold(g.drop(columns=["_kpart"])),
                        batch_format="pandas"))


def grouped_lag_delta(ds, *, key: str, ts: str, id_col: str,
                      out_col: str = "delta_sec", n_parts: int = 64):
    """LAG window: per row, seconds since the key's PREVIOUS event
    (NULL for each key's first event) — ordered by (ts, id) with the
    id tie-break so the result is deterministic. Same coarsened-shuffle
    shape as :func:`sessionize`; the in-partition computation is one
    vectorized grouped diff."""
    def assign(group: pa.Table) -> pa.Table:
        df = (group.to_pandas()
              .sort_values([key, ts, id_col], kind="mergesort"))
        delta = df.groupby(key, sort=False)[ts].diff().dt.total_seconds()
        out = pd.DataFrame({id_col: df[id_col], out_col: delta})
        return pa.Table.from_pandas(out, preserve_index=False)

    return (add_coarse_part(ds, key, n_parts)
            .groupby("_kpart").map_groups(assign, batch_format="pyarrow"))
