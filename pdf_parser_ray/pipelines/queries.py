"""The query surface: named pipelines over the driver's testdata tables.

Each ``q_*`` function takes ``sf_dir`` and returns a pandas DataFrame (or
Dataset). Column names match the DuckDB oracle SQL in ``ORACLE_SQL``
exactly — the driver sorts columns by name and value-hashes, so every
computed column is named identically on both sides.

Float discipline: sums of doubles are rounded to 2 dp on BOTH sides (fp
summation order differs between engines); counts and token stats are
integers (exact); cosine similarities are computed in float64 on both
sides and rounded to 6 dp.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..stages import dedup as D
from ..stages import relational as R
from ..stages import similarity as SIM
from ..stages import textstats as TS
from ..stages.multimodal import SampleFrames


def _read(sf_dir: str, table: str):
    import ray.data
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet")


# ---------------------------------------------------------------------------
# Relational (TPC-H-ish) — exercise partial-agg groupby / broadcast join /
# grouped rank / top-k
# ---------------------------------------------------------------------------


def q01_pricing_summary(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "lineitem").select_columns(
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"])
    out = R.pre_aggregate(
        ds, ["l_returnflag", "l_linestatus"],
        {"sum_qty": ("l_quantity", "sum"),
         "sum_base_price": ("l_extendedprice", "sum"),
         "count_order": ("l_quantity", "count")})
    out["sum_qty"] = out["sum_qty"].round(2)
    out["sum_base_price"] = out["sum_base_price"].round(2)
    out["count_order"] = out["count_order"].astype("int64")
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def q02_segment_revenue(sf_dir: str) -> pd.DataFrame:
    customer = pd.read_parquet(f"{sf_dir}/customer.parquet",
                               columns=["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders").select_columns(
        ["o_custkey", "o_totalprice"])
    joined = R.broadcast_join(orders, customer.rename(
        columns={"c_custkey": "o_custkey"}), on="o_custkey")
    out = R.pre_aggregate(joined, ["c_mktsegment"],
                          {"revenue": ("o_totalprice", "sum"),
                           "n_orders": ("o_totalprice", "count")})
    out["revenue"] = out["revenue"].round(2)
    out["n_orders"] = out["n_orders"].astype("int64")
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def q03_order_priority(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "orders").select_columns(
        ["o_orderpriority", "o_orderstatus"])

    def flt(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["o_orderstatus"] == "F"]

    out = R.pre_aggregate(
        ds.map_batches(flt, batch_format="pandas"),
        ["o_orderpriority"], {"order_count": ("o_orderstatus", "count")})
    out["order_count"] = out["order_count"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def q04_events_by_type(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events").select_columns(["event_type", "value"])
    out = R.pre_aggregate(ds, ["event_type"],
                          {"n": ("value", "count"),
                           "total_value": ("value", "sum")})
    out["n"] = out["n"].astype("int64")
    out["total_value"] = out["total_value"].round(2)
    return out.sort_values("event_type").reset_index(drop=True)


def q05_order_rank(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "orders").select_columns(
        ["o_orderkey", "o_custkey", "o_orderdate"])
    ranked = R.grouped_rank(ds, "o_custkey", ["o_orderdate", "o_orderkey"],
                            rank_col="rnk")
    df = ranked.to_pandas()[["o_orderkey", "o_custkey", "rnk"]]
    df["rnk"] = df["rnk"].astype("int64")
    return df.sort_values("o_orderkey").reset_index(drop=True)


def q06_first_order(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "orders").select_columns(
        ["o_orderkey", "o_custkey", "o_orderdate"])
    first = R.first_per_key(ds, "o_custkey", ["o_orderdate", "o_orderkey"],
                            keep=["o_orderkey"])
    df = first.to_pandas().rename(columns={"o_orderkey": "first_orderkey"})
    return (df[["o_custkey", "first_orderkey"]]
            .sort_values("o_custkey").reset_index(drop=True))


def q07_top_orders(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "orders").select_columns(
        ["o_orderkey", "o_totalprice"])
    out = R.topk(ds, "o_totalprice", 10, tie_break="o_orderkey")
    out["o_totalprice"] = out["o_totalprice"].round(2)
    return out[["o_orderkey", "o_totalprice"]].reset_index(drop=True)


def q08_events_props(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events").select_columns(["event_type", "props"])

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["k_val"] = df["props"].str.extract(r'"k":\s*(\d+)').astype("int64")
        return df[["event_type", "k_val"]]

    out = R.pre_aggregate(ds.map_batches(extract, batch_format="pandas"),
                          ["event_type"], {"sum_k": ("k_val", "sum"),
                                           "max_k": ("k_val", "max")})
    out["sum_k"] = out["sum_k"].astype("int64")
    out["max_k"] = out["max_k"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def q09_events_window(sf_dir: str) -> pd.DataFrame:
    """Tumbling daily window per event_type — the time-bucketed aggregate a
    streaming pipeline needs; window assignment is a per-batch map (no
    shuffle), only the per-(window, type) partials shuffle."""
    ds = _read(sf_dir, "events").select_columns(["event_type", "ts", "value"])

    def window(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["day"] = df["ts"].dt.strftime("%Y-%m-%d")
        return df[["event_type", "day", "value"]]

    out = R.pre_aggregate(ds.map_batches(window, batch_format="pandas"),
                          ["event_type", "day"],
                          {"n": ("value", "count"),
                           "total_value": ("value", "sum")})
    out["n"] = out["n"].astype("int64")
    out["total_value"] = out["total_value"].round(2)
    return out.sort_values(["event_type", "day"]).reset_index(drop=True)


def q17_sliding_window(sf_dir: str) -> pd.DataFrame:
    """7-row trailing window sum of daily event value per event_type."""
    ds = _read(sf_dir, "events").select_columns(["event_type", "ts", "value"])

    def day(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["day"] = df["ts"].dt.strftime("%Y-%m-%d")
        return df[["event_type", "day", "value"]]

    out = R.sliding_window_sum(ds.map_batches(day, batch_format="pandas"),
                               key="event_type", ts_day_col="day",
                               value_col="value", window=7)
    out["n"] = out["n"].astype("int64")
    out["day_value"] = out["day_value"].round(2)
    out["window_value"] = out["window_value"].round(2)
    return out[["event_type", "day", "day_value", "window_value", "n"]]


def q61_range_join(sf_dir: str) -> pd.DataFrame:
    """Range join: per event, how many of the user's 2-day activity
    windows (one per active day) contain its timestamp — every event
    matches its own day's window and possibly the previous day's, so the
    interval semantics (1..2 matches) are genuinely exercised."""
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    days = (pd.DataFrame({"user_id": ev["user_id"],
                          "d": pd.to_datetime(ev["ts"]).dt.floor("D")})
            .drop_duplicates())
    win = pd.DataFrame({
        "o_custkey": days["user_id"],
        "w_start": days["d"],
        "w_end": days["d"] + pd.Timedelta(days=2),
    })
    ds = _read(sf_dir, "events").select_columns(["event_id", "user_id", "ts"])

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["ts"] = df["ts"].astype("datetime64[ns]")
        return df

    out = R.range_join_count(ds.map_batches(norm, batch_format="pandas"),
                             win, key="user_id", right_key="o_custkey",
                             ts="ts", right_start="w_start",
                             right_end="w_end", id_col="event_id")
    out["event_id"] = out["event_id"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out


def q62_value_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact per-type value quantiles (p50/p90/p99)."""
    ds = _read(sf_dir, "events").select_columns(["event_type", "value"])
    out = R.grouped_quantiles(ds, "event_type", "value",
                              quantiles=(0.5, 0.9, 0.99))
    for c in ("q50", "q90", "q99"):
        out[c] = out[c].round(6)
    return out


def q15_sessionize(sf_dir: str) -> pd.DataFrame:
    """Gap-based sessions (30 min) per user over the events stream."""
    ds = _read(sf_dir, "events").select_columns(["event_id", "user_id", "ts"])
    out = R.sessionize(ds, key="user_id", ts="ts", id_col="event_id").to_pandas()
    for c in ("event_id", "user_id", "session_seq"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def q16_asof_join(sf_dir: str) -> pd.DataFrame:
    """For each event, the user's latest order at or before the event."""
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate", "o_orderkey"])
    # dedupe ties: one row per (user, date), max orderkey — as-of picks
    # arbitrarily among equal timestamps otherwise (oracle would diverge)
    orders = (orders.groupby(["o_custkey", "o_orderdate"], sort=False)
              ["o_orderkey"].max().reset_index())
    ds = _read(sf_dir, "events").select_columns(["event_id", "user_id", "ts"])
    out = R.asof_join_backward(
        ds, orders, key="user_id", right_key="o_custkey",
        ts="ts", right_ts="o_orderdate",
        value_cols=["o_orderkey"]).to_pandas()
    out = out[["event_id", "o_orderkey"]]
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Text analysis over documents
# ---------------------------------------------------------------------------


def q10_doc_stats(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text", "lang"])
    stats = TS.text_stats_dataset(ds)
    out = R.pre_aggregate(stats, ["lang"],
                          {"n_docs": ("doc_id", "count"),
                           "total_tokens": ("token_cnt", "sum"),
                           "total_chars": ("char_cnt", "sum"),
                           "total_bpe": ("bpe_cnt", "sum")})
    for c in ("n_docs", "total_tokens", "total_chars", "total_bpe"):
        out[c] = out[c].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


def q11_lang_pred(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    pred = ds.map_batches(lambda df: TS.add_lang_pred(df),
                          batch_format="pandas")
    out = R.pre_aggregate(pred, ["lang_pred"],
                          {"n": ("doc_id", "count")})
    out["n"] = out["n"].astype("int64")
    return out.sort_values("lang_pred").reset_index(drop=True)


def q12_quality_filter(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    stats = TS.text_stats_dataset(ds)
    df = stats.filter(expr="is_quality == 1").select_columns(
        ["doc_id", "token_cnt"]).to_pandas()
    df["token_cnt"] = df["token_cnt"].astype("int64")
    return df.sort_values("doc_id").reset_index(drop=True)


def q14_winnow_fingerprint(sf_dir: str) -> pd.DataFrame:
    """Winnowed rolling-hash fingerprints, exploded (doc_id, fingerprint)."""
    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    df = TS.winnow_dataset(ds, "doc_id").to_pandas().drop_duplicates()
    df["doc_id"] = df["doc_id"].astype("int64")
    return (df.sort_values(["doc_id", "fingerprint"])
            .reset_index(drop=True))


def q13_fingerprint(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    fp = ds.map_batches(lambda df: TS.add_fingerprint(df),
                        batch_format="pandas")
    df = fp.select_columns(["doc_id", "fingerprint"]).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Dedup family (self-union corpus so duplicates exist by construction)
# ---------------------------------------------------------------------------

DUP_OFFSET = 10_000_000


def _doubled_documents(sf_dir: str, perturb: bool = False):
    """documents ∪ copy (ids + DUP_OFFSET); optionally append one token to
    the copy's text so the pair is a near-dup, not an exact dup."""
    base = _read(sf_dir, "documents").select_columns(["doc_id", "text"])

    def shift(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["doc_id"] = df["doc_id"] + DUP_OFFSET
        if perturb:
            df["text"] = df["text"] + " perturbed"
        return df

    # identity pandas map on the base branch: unioning arrow blocks with
    # pandas blocks trips downstream block builders and spams schema-
    # mismatch warnings
    base_pd = base.map_batches(lambda df: df, batch_format="pandas")
    return base_pd.union(base_pd.map_batches(shift, batch_format="pandas"))


def q60_train_split(sf_dir: str) -> pd.DataFrame:
    """Deterministic 90/5/5 train/val/test assignment per document."""
    ds = _read(sf_dir, "documents").select_columns(["doc_id"])
    out = TS.assign_split(ds, "doc_id").to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q19_unigram_quality(sf_dir: str) -> pd.DataFrame:
    """Fit-then-score unigram LM corpus-likelihood quality signal."""
    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    out = TS.unigram_logprob(ds, "doc_id")
    out["doc_id"] = out["doc_id"].astype("int64")
    return out


def q18_kmv_sketch(sf_dir: str) -> pd.DataFrame:
    """KMV distinct sketch over events.user_id — the k smallest distinct
    md5 hashes, exactly replicable in SQL (the estimate itself is
    approximate; the sketch content is deterministic)."""
    from ..stages.sketch import kmv_sketch
    ds = _read(sf_dir, "events").select_columns(["user_id"])
    hs = kmv_sketch(ds, "user_id", k=64)
    return pd.DataFrame({"rnk": pd.Series(range(1, len(hs) + 1),
                                          dtype="int64"),
                         "h": hs})


def q20_exact_dedup(sf_dir: str) -> pd.DataFrame:
    ds = _doubled_documents(sf_dir)
    fp = ds.map_batches(lambda df: TS.add_fingerprint(df),
                        batch_format="pandas")
    kept = D.exact_dedup(fp, "fingerprint", "doc_id",
                         keep_cols=["doc_id"])
    df = kept.to_pandas()[["doc_id", "fingerprint"]]
    df["doc_id"] = df["doc_id"].astype("int64")
    return df.sort_values("doc_id").reset_index(drop=True)


def _pair_recall(clusters, id_name: str) -> pd.DataFrame:
    """SQL-checkable invariant of a near-dup run over the doubled corpus:
    every constructed duplicate pair (i, i+OFFSET) must land in one cluster.
    Robust to extra merges from *natural* near-dups in the corpus (which
    exact SQL can't model, but this invariant survives). ``clusters`` is
    the (id, rep) Dataset the dedup stages return — the thin query-surface
    ``to_pandas`` the scale architecture allows (output-sized)."""
    if not isinstance(clusters, pd.DataFrame):
        clusters = clusters.to_pandas()
    rep = dict(zip(clusters["id"], clusters["rep"]))
    base = sorted(i for i in rep if i < DUP_OFFSET)
    return pd.DataFrame({
        id_name: pd.Series(base, dtype="int64"),
        "same_cluster": pd.Series(
            [int(rep[i] == rep.get(i + DUP_OFFSET)) for i in base],
            dtype="int64"),
    })


def _doubled_ids(sf_dir: str, table: str = "documents",
                 id_col: str = "doc_id") -> list:
    """The doubled corpus's id universe, from a columnar id-only read —
    saves the dedup stages a whole extra pass over the derived dataset."""
    base = pd.read_parquet(f"{sf_dir}/{table}.parquet",
                           columns=[id_col])[id_col].tolist()
    return base + [i + DUP_OFFSET for i in base]


def q21_minhash_dedup(sf_dir: str) -> pd.DataFrame:
    clusters = D.minhash_lsh_dedup(
        _doubled_documents(sf_dir, perturb=True), "text", "doc_id",
        threshold=0.7, ids=_doubled_ids(sf_dir))
    return _pair_recall(clusters, "doc_id")


def q22_simhash_dedup(sf_dir: str) -> pd.DataFrame:
    out = D.simhash_dedup(_doubled_documents(sf_dir), "text", "doc_id",
                          max_hamming=3, ids=_doubled_ids(sf_dir))
    return _pair_recall(out, "doc_id")


def q23_ngram_jaccard_dedup(sf_dir: str) -> pd.DataFrame:
    out = D.ngram_jaccard_dedup(_doubled_documents(sf_dir, perturb=True),
                                "text", "doc_id", threshold=0.7,
                                ids=_doubled_ids(sf_dir))
    return _pair_recall(out, "doc_id")


def q24_embedding_dedup(sf_dir: str) -> pd.DataFrame:
    import ray.data
    base = _read(sf_dir, "embeddings").select_columns(["vec_id", "embedding"])

    def shift(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["vec_id"] = df["vec_id"] + DUP_OFFSET
        # scale by 2 — cosine-identical, a true near-dup for cosine metric
        df["embedding"] = df["embedding"].map(
            lambda v: (np.asarray(v) * 2.0).tolist())
        return df

    # identity pandas map so both union branches share a block type
    # (mixed arrow+pandas blocks break iter_batches downstream)
    base_pd = base.map_batches(lambda df: df, batch_format="pandas")
    ds = base_pd.union(base_pd.map_batches(shift, batch_format="pandas"))
    out = D.embedding_dedup(ds, "embedding", "vec_id", threshold=0.999999,
                            ids=_doubled_ids(sf_dir, "embeddings", "vec_id"))
    return _pair_recall(out, "vec_id")


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

N_QUERIES = 8
KNN_K = 5


def _query_vectors(sf_dir: str) -> dict:
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    q = emb[emb["vec_id"] < N_QUERIES].sort_values("vec_id")
    return {"ids": q["vec_id"].tolist(),
            "mat": np.stack(q["embedding"].to_numpy())}


def q30_knn_bruteforce(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "embeddings")
    out = SIM.knn_topk(ds, _query_vectors(sf_dir), vec_col="embedding",
                       id_col="vec_id", k=KNN_K)
    for c in ("query_id", "neighbor_id"):
        out[c] = out[c].astype("int64")
    return out[["query_id", "neighbor_id", "cosine"]].reset_index(drop=True)


_IVF_CACHE: dict[str, "SIM.IVFIndex"] = {}


def _ivf_index(sf_dir: str) -> "SIM.IVFIndex":
    """Build (or reuse) the persisted IVF index for this sf_dir — the
    corpus is scanned once at build; searches read only probed
    ``ivf_part=`` directories."""
    idx = _IVF_CACHE.get(sf_dir)
    if idx is None:
        import hashlib
        import os
        import tempfile

        # the fingerprint ties the persisted index to the INPUT's identity
        # (path + size + mtime) — a /tmp index surviving a testdata refresh
        # must rebuild, not silently serve stale partitions
        src = f"{sf_dir}/embeddings.parquet"
        stat = os.stat(src)
        tag = hashlib.md5(
            f"{src}:{stat.st_size}:{stat.st_mtime_ns}".encode()
        ).hexdigest()[:12]
        index_dir = os.path.join(tempfile.gettempdir(),
                                 f"pdf_parser_ray_ivf_{tag}")
        if os.path.exists(os.path.join(index_dir, "_centroids.parquet")):
            idx = SIM.IVFIndex.open(index_dir, "embedding", "vec_id")
        else:
            # a dir without the centroids sidecar is a crashed partial
            # build — writing next to its fragments would duplicate rows
            import shutil
            shutil.rmtree(index_dir, ignore_errors=True)
            idx = SIM.IVFIndex.build(_read(sf_dir, "embeddings"),
                                     "embedding", "vec_id", index_dir,
                                     n_centroids=8)
        _IVF_CACHE[sf_dir] = idx
    return idx


def q31_knn_ivf(sf_dir: str) -> pd.DataFrame:
    """IVF-pruned ANN + its recall against brute force (rows-only check)."""
    ds = _read(sf_dir, "embeddings")
    queries = _query_vectors(sf_dir)
    approx = _ivf_index(sf_dir).search(queries, k=KNN_K, nprobe=3)
    exact = SIM.knn_topk(ds, queries, vec_col="embedding", id_col="vec_id",
                         k=KNN_K)
    rows = []
    for qid in queries["ids"]:
        a = set(approx[approx["query_id"] == qid]["neighbor_id"])
        e = set(exact[exact["query_id"] == qid]["neighbor_id"])
        rows.append({"query_id": int(qid),
                     "recall_pct": int(100 * len(a & e) / max(1, len(e)))})
    return pd.DataFrame(rows)


def q92_knn_ivf_full_probe(sf_dir: str) -> pd.DataFrame:
    """IVF index probed at nprobe = n_centroids: the union of every
    probed partition IS the corpus, so the result must equal brute
    force EXACTLY — same oracle as q30 by design, which hash-pins the
    whole IVF plumbing (build partitioning, hive-pruned reads, vector
    round-trip through parquet, shared knn_topk finish). Only the
    recall-vs-nprobe trade (q31) stays rows-only by nature."""
    queries = _query_vectors(sf_dir)
    out = _ivf_index(sf_dir).search(queries, k=KNN_K, nprobe=8)
    return (out.sort_values(["query_id", "cosine", "neighbor_id"],
                            ascending=[True, False, True])
            .reset_index(drop=True))


# ---------------------------------------------------------------------------
# Multimodal plumbing (deterministic fake decode)
# ---------------------------------------------------------------------------


def q40_frame_sample(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])

    def to_payload(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"media_id": df["doc_id"],
                             "payload": [t.encode() for t in df["text"]]})

    media = ds.map_batches(to_payload, batch_format="pandas")
    frames = media.map_batches(
        SampleFrames, fn_constructor_kwargs={"payload_col": "payload",
                                             "n_frames": 4},
        batch_format="pandas", batch_size=64, concurrency=(1, 8))
    df = frames.to_pandas()
    df["media_id"] = df["media_id"].astype("int64")
    df["frame_idx"] = df["frame_idx"].astype("int64")
    return (df.sort_values(["media_id", "frame_idx"])
            .reset_index(drop=True))


# ---------------------------------------------------------------------------
# Flagship extraction (rows-only; the per-document semantics are not SQL)
# ---------------------------------------------------------------------------


def _documents_as_corpus(sf_dir: str):
    """documents.parquet → corpus rows, built inside map_batches (the
    corpus wrap is part of the distributed pipeline, not a driver loop)."""
    import random

    from ..sources.corpus import _BASE_TS, build_web_page

    def wrap(df: pd.DataFrame) -> pd.DataFrame:
        from datetime import timedelta
        out = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
        for rec in df.itertuples():
            rng = random.Random(1000 + rec.doc_id)
            html = build_web_page(rng, str(rec.source), rec.doc_id,
                                  body_text=rec.text)
            out["url"].append(
                f"https://docs.example.org/{rec.source}/{rec.doc_id}")
            out["warc_ts"].append(_BASE_TS + timedelta(minutes=int(rec.doc_id)))
            out["html"].append(html.encode())
            out["text"].append(rec.text)
            out["lang"].append(rec.lang)
        return pd.DataFrame(out)

    return _read(sf_dir, "documents").map_batches(wrap, batch_format="pandas")


def q50_extract(sf_dir: str) -> pd.DataFrame:
    from ..stages.extract import extract_dataset

    ds = _documents_as_corpus(sf_dir)
    extracted = extract_dataset(ds, None)
    df = extracted.select_columns(
        ["url", "status", "doc_kind", "n_spans"]).to_pandas()
    return df.sort_values("url").reset_index(drop=True)


def q51_qa_summary(sf_dir: str) -> pd.DataFrame:
    """Extraction → QA harness → per-check pass/fail counts (rows-only:
    the 9-check harness is not SQL)."""
    from ..stages.extract import extract_dataset
    from ..stages.qa import qa_dataset, summarize

    ds = _documents_as_corpus(sf_dir)
    summary = summarize(qa_dataset(extract_dataset(ds, None)))
    out = pd.DataFrame({"key": sorted(summary),
                        "n": [summary[k] for k in sorted(summary)]})
    out["n"] = out["n"].astype("int64")
    return out


def q25_top_tokens(sf_dir: str) -> pd.DataFrame:
    """Exact distributed heavy hitters over documents.text (top 50)."""
    ds = _read(sf_dir, "documents").select_columns(["text"])
    out = TS.top_tokens(ds, "text", k=50)
    return out.reset_index(drop=True)


def q26_inverted_index(sf_dir: str) -> pd.DataFrame:
    """Posting-list build: distinct (token, doc_id) for tokens >= 8 chars."""
    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    df = TS.inverted_index(ds, "doc_id", "text",
                           min_token_len=8).to_pandas()
    df["doc_id"] = df["doc_id"].astype("int64")
    return df.sort_values(["token", "doc_id"]).reset_index(drop=True)


def q63_grouped_topk(sf_dir: str) -> pd.DataFrame:
    """Top-3 orders per customer by totalprice (bounded per-key output;
    batch-level pruning before the grouped shuffle)."""
    ds = _read(sf_dir, "orders").select_columns(
        ["o_custkey", "o_orderkey", "o_totalprice"])
    df = R.grouped_topk(ds, "o_custkey", "o_totalprice", 3,
                        tie_break="o_orderkey",
                        keep=["o_orderkey", "o_totalprice"]).to_pandas()
    df["o_totalprice"] = df["o_totalprice"].round(2)
    df["rnk"] = df["rnk"].astype("int64")
    df["o_custkey"] = df["o_custkey"].astype("int64")
    df["o_orderkey"] = df["o_orderkey"].astype("int64")
    return (df[["o_custkey", "o_orderkey", "o_totalprice", "rnk"]]
            .sort_values(["o_custkey", "rnk"]).reset_index(drop=True))


def q65_join_revenue(sf_dir: str) -> pd.DataFrame:
    """Big-to-big shuffle join (lineitem ⋈ orders on orderkey) feeding a
    partial aggregate: revenue by order priority. Exercises
    :func:`R.shuffle_join` — one coarsened key shuffle, in-partition
    merge — where neither side is broadcastable at scale."""
    li = _read(sf_dir, "lineitem").select_columns(
        ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders").select_columns(
        ["o_orderkey", "o_orderpriority"])
    joined = R.shuffle_join(li, orders, left_on="l_orderkey",
                            right_on="o_orderkey")

    def add_rev(df: pd.DataFrame) -> pd.DataFrame:
        df["rev"] = df["l_extendedprice"] * (1.0 - df["l_discount"])
        return df[["o_orderpriority", "rev"]]

    out = R.pre_aggregate(
        joined.map_batches(add_rev, batch_format="pandas"),
        ["o_orderpriority"],
        {"revenue": ("rev", "sum"), "n": ("rev", "count")})
    out["revenue"] = out["revenue"].round(2)
    out["n"] = out["n"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


ACTIVE_USER_MIN_EVENTS = 30


def q29_active_user_events(sf_dir: str) -> pd.DataFrame:
    """Semi-join filter by a derived key set: keep events of users with
    ≥30 events (key set from a pre-aggregate, broadcast once via
    ``ray.put``), then aggregate value by event type."""
    ds = _read(sf_dir, "events").select_columns(
        ["user_id", "event_type", "value"])
    per_user = R.pre_aggregate(ds, ["user_id"],
                               {"n": ("event_type", "count")})
    active = per_user.loc[per_user["n"] >= ACTIVE_USER_MIN_EVENTS,
                          "user_id"]
    kept = R.semi_join_broadcast(ds, active, on="user_id")
    # COUNT(*) semantics: count a never-null column (event_type), not
    # value — a null value must still count (advisor finding; the q34
    # oracle implies nulls are in-scope for events.value)
    out = R.pre_aggregate(kept, ["event_type"],
                          {"n": ("event_type", "count"),
                           "sum_value": ("value", "sum")})
    out["n"] = out["n"].astype("int64")
    out["sum_value"] = out["sum_value"].round(2)
    return out.sort_values("event_type").reset_index(drop=True)


def q27_tfidf_topk(sf_dir: str) -> pd.DataFrame:
    """Per-document top-3 tf-idf terms (whitespace tokens, lowercased)."""
    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    df = TS.tfidf_topk(ds, "doc_id", "text", k=3).to_pandas()
    df["doc_id"] = df["doc_id"].astype("int64")
    df["rnk"] = df["rnk"].astype("int64")
    return (df[["doc_id", "token", "score", "rnk"]]
            .sort_values(["doc_id", "rnk"]).reset_index(drop=True))


def q28_bigram_hitters(sf_dir: str) -> pd.DataFrame:
    """Exact distributed heavy hitters over token bigrams (top 40)."""
    ds = _read(sf_dir, "documents").select_columns(["text"])
    out = TS.top_tokens(ds, "text", k=40, ngram=2)
    return out.rename(columns={"tok": "bigram"}).reset_index(drop=True)


def q32_repetition_stats(sf_dir: str) -> pd.DataFrame:
    """Gopher-style per-document repetition / diversity signals."""
    ds = _read(sf_dir, "documents")
    df = TS.repetition_stats(ds, "doc_id", "text").to_pandas()
    df["doc_id"] = df["doc_id"].astype("int64")
    return df.sort_values("doc_id").reset_index(drop=True)


def q33_chunk_documents(sf_dir: str) -> pd.DataFrame:
    """Token-window training chunks (window=32, stride=16)."""
    ds = _read(sf_dir, "documents")
    df = TS.chunk_documents(ds, "doc_id", "text",
                            window=32, stride=16).to_pandas()
    df["doc_id"] = df["doc_id"].astype("int64")
    return (df.sort_values(["doc_id", "chunk_id"])
            .reset_index(drop=True))


def q34_value_histogram(sf_dir: str) -> pd.DataFrame:
    """Mergeable per-type equi-width value histogram — the sketch-grade
    swap for q62's exact quantiles. The bin counts are deterministic
    integers, so the sketch content is hash-oracle-checkable even though
    quantile estimates derived from it are approximate."""
    from ..stages.sketch import grouped_histogram
    ds = _read(sf_dir, "events").select_columns(["event_type", "value"])
    out = grouped_histogram(ds, "event_type", "value", nbins=64)
    return out.sort_values(["event_type", "bin_id"]).reset_index(drop=True)


def q35_decontaminate(sf_dir: str) -> pd.DataFrame:
    """Train/test decontamination: distinct 8-token-gram overlap counts
    for test-split docs against the train split (contaminated docs
    only). The GPT-3-style pre-training hygiene pass."""
    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    train = TS.filter_split(ds, "doc_id", {"train"})
    test = TS.filter_split(ds, "doc_id", {"test"})
    out = TS.ngram_contamination(train, test, "doc_id", "text", n=8)
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q36_bloom_bits(sf_dir: str) -> pd.DataFrame:
    """Bloom-filter sketch over events.user_id: the exact set-bit
    positions (deterministic md5 double hashing), hash-oracle-checkable
    like the KMV sketch even though membership answers are
    probabilistic."""
    from ..stages.sketch import BLOOM_K, BLOOM_M, bloom_sketch
    ds = _read(sf_dir, "events").select_columns(["user_id"])
    bits = bloom_sketch(ds, "user_id", m=BLOOM_M, k=BLOOM_K)
    return pd.DataFrame({"pos": pd.Series(np.flatnonzero(bits),
                                          dtype="int64")})


def q37_label_centroids(sf_dir: str) -> pd.DataFrame:
    """Per-label mean embedding (class centroids), exploded to
    (label, dim, v) rows for exact SQL comparison."""
    ds = _read(sf_dir, "embeddings")
    return SIM.label_centroids(ds, vec_col="embedding",
                               label_col="label")


def q38_kmeans(sf_dir: str) -> pd.DataFrame:
    """Distributed Lloyd's k-means (k=8, 2 iterations, deterministic
    first-k init) over the embedding table; output is the final
    cluster assignment per vector."""
    ds = _read(sf_dir, "embeddings")
    out = SIM.kmeans(ds, vec_col="embedding", id_col="vec_id",
                     k=8, iters=2).to_pandas()
    out["vec_id"] = out["vec_id"].astype("int64")
    return out.sort_values("vec_id").reset_index(drop=True)


def q39_count_min(sf_dir: str) -> pd.DataFrame:
    """Count-min sketch over the documents token stream: nonzero cells
    (row, cell, n) are exact sums of deterministic hash buckets, so the
    sketch content is hash-oracle-checkable."""
    from ..stages.sketch import CMS_D, CMS_W, count_min_sketch
    ds = _read(sf_dir, "documents").select_columns(["text"])
    mat = count_min_sketch(ds, "text", d=CMS_D, w=CMS_W)
    r, c = np.nonzero(mat)
    return pd.DataFrame({"row": pd.Series(r, dtype="int64"),
                         "cell": pd.Series(c, dtype="int64"),
                         "n": pd.Series(mat[r, c], dtype="int64")})


def q41_temperature_sample(sf_dir: str) -> pd.DataFrame:
    """Temperature (alpha=0.5) language rebalancing over documents:
    deterministic md5-threshold keep decisions with per-lang rates
    sqrt(n_min / n_lang) computed from the corpus itself."""
    ds = _read(sf_dir, "documents").select_columns(["doc_id", "lang"])
    out = TS.temperature_sample(ds, "doc_id", "lang",
                                alpha=0.5).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return (out[["doc_id", "lang"]].sort_values("doc_id")
            .reset_index(drop=True))


def q42_percent_rank(sf_dir: str) -> pd.DataFrame:
    """Per-language percent-rank of document length — quantile
    normalization of a score against its group."""
    ds = _read(sf_dir, "documents").select_columns(
        ["doc_id", "lang", "n_chars"])
    out = R.grouped_percent_rank(ds, "lang", ["n_chars", "doc_id"])\
        .to_pandas()
    out["pct"] = out["pct"].round(6)
    for c in ("doc_id", "n_chars"):
        out[c] = out[c].astype("int64")
    return (out[["doc_id", "lang", "n_chars", "pct"]]
            .sort_values("doc_id").reset_index(drop=True))


def q43_uniform_sample(sf_dir: str) -> pd.DataFrame:
    """Deterministic uniform corpus sample: the 100 docs with the
    smallest md5(doc_id) — order-free, cluster-size-free, and exactly
    reproducible (the standard 'hold out an eval subset' op). Local
    per-block top-k + driver merge; no global sort."""
    import hashlib as _hl
    ds = _read(sf_dir, "documents").select_columns(["doc_id"])

    def add_h(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["h"] = [_hl.md5(str(v).encode()).hexdigest()
                   for v in df["doc_id"]]
        return df

    withh = ds.map_batches(add_h, batch_format="pandas")
    out = R.topk(withh, "h", 100, ascending=True, tie_break="doc_id")
    out["doc_id"] = out["doc_id"].astype("int64")
    return (out[["doc_id", "h"]].sort_values("doc_id")
            .reset_index(drop=True))


def q44_pack_documents(sf_dir: str) -> pd.DataFrame:
    """Whole-document packing into ~256-token training bins within 16
    stable hash shards."""
    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    out = TS.pack_documents(ds, "doc_id", "text", budget=256,
                            n_shards=16).to_pandas()
    for c in ("doc_id", "shard", "n_tokens", "pack_id"):
        out[c] = out[c].astype("int64")
    return (out[["doc_id", "shard", "n_tokens", "pack_id"]]
            .sort_values("doc_id").reset_index(drop=True))


def q45_connected_components(sf_dir: str) -> pd.DataFrame:
    """General connected components exposed as a first-class op: the
    graph joins consecutive doc_ids that share a language (path-shaped
    islands), built with the big-to-big shuffle join and solved by the
    same cluster_pairs_dataset engine the near-dup family uses
    (distributed label propagation past the size gate)."""
    ds = _read(sf_dir, "documents").select_columns(["doc_id", "lang"])

    def lmap(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"j": df.doc_id.astype("int64"),
                             "a_id": df.doc_id.astype("int64"),
                             "lang_a": df.lang})

    def rmap(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"j": (df.doc_id + 1).astype("int64"),
                             "b_id": df.doc_id.astype("int64"),
                             "lang_b": df.lang})

    joined = R.shuffle_join(ds.map_batches(lmap, batch_format="pandas"),
                            ds.map_batches(rmap, batch_format="pandas"),
                            left_on="j")

    def edges(df: pd.DataFrame) -> pd.DataFrame:
        m = df[df.lang_a == df.lang_b]
        return pd.DataFrame({"a": m.b_id.astype("int64"),
                             "b": m.a_id.astype("int64")})

    pairs = joined.map_batches(edges, batch_format="pandas")
    out = D.cluster_pairs_dataset(pairs, ds.select_columns(["doc_id"]),
                                  "doc_id").to_pandas()
    out = out.rename(columns={"id": "doc_id"})
    for c in ("doc_id", "rep"):
        out[c] = out[c].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q46_daily_active(sf_dir: str) -> pd.DataFrame:
    """Exact daily-active-users: COUNT(DISTINCT user_id) per day via
    local pair dedupe + coarsened-key shuffle (the exact twin of the
    KMV/HLL sketches)."""
    ds = _read(sf_dir, "events").select_columns(["ts", "user_id"])

    def day(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"day": df["ts"].dt.strftime("%Y-%m-%d"),
                             "user_id": df["user_id"]})

    out = R.grouped_count_distinct(
        ds.map_batches(day, batch_format="pandas"), "day",
        "user_id").to_pandas()
    out["n_distinct"] = out["n_distinct"].astype("int64")
    return out.sort_values("day").reset_index(drop=True)


def _pagerank_edges(sf_dir: str):
    """The customer→supplier link graph induced by orders⋈lineitem;
    edges built with the big-to-big shuffle join, supplier ids offset
    into their own namespace. Shared by q47 (driver-mode rank table)
    and q66 (distributed rank table) so both modes face the identical
    graph and oracle."""
    orders = _read(sf_dir, "orders").select_columns(
        ["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem").select_columns(
        ["l_orderkey", "l_suppkey"])
    joined = R.shuffle_join(orders, li, left_on="o_orderkey",
                            right_on="l_orderkey")

    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "src": df["o_custkey"].astype("int64"),
            "dst": (df["l_suppkey"] + 1_000_000_000).astype("int64")})

    return joined.map_batches(to_edges, batch_format="pandas")


def q47_pagerank(sf_dir: str) -> pd.DataFrame:
    """PageRank (2 power iterations), driver-mode rank table (the
    cheap path while the node table fits; auto-gated)."""
    from ..stages.graph import pagerank
    out = pagerank(_pagerank_edges(sf_dir), "src", "dst",
                   iters=2, damping=0.85, mode="driver")
    out["rank"] = out["rank"].round(6)
    return out.sort_values("node").reset_index(drop=True)


def q66_pagerank_distributed(sf_dir: str) -> pd.DataFrame:
    """Same PageRank, rank table as a Dataset: each iteration is a
    shuffle_join(edges, weights, on=src) + coarsened groupby(dst) fold
    + left join back onto the node table — no O(nodes) driver state
    (the 10^9-node web-graph path). Same oracle as q47, so the driver
    pins both execution modes hash-equal."""
    from ..stages.graph import pagerank
    out = pagerank(_pagerank_edges(sf_dir), "src", "dst",
                   iters=2, damping=0.85, mode="distributed")
    out["rank"] = out["rank"].round(6)
    return out.sort_values("node").reset_index(drop=True)


def q48_incremental_dedup(sf_dir: str) -> pd.DataFrame:
    """Incremental ingest dedup: build the persisted fingerprint index
    over the corpus once, then check a NEW shard (the same docs re-keyed
    +10^7, i.e. guaranteed exact dups) against it reading only touched
    index buckets."""
    import shutil
    import tempfile

    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    index_dir = tempfile.mkdtemp(prefix="fpindex_")
    try:
        D.build_fingerprint_index(ds, "doc_id", "text", index_dir)

        def rekey(df: pd.DataFrame) -> pd.DataFrame:
            out = df.copy()
            out["doc_id"] = (out["doc_id"] + 10_000_000).astype("int64")
            return out

        new_ds = ds.map_batches(rekey, batch_format="pandas")
        out = D.dedup_against_index(new_ds, index_dir, "doc_id", "text")
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q67_incremental_minhash(sf_dir: str) -> pd.DataFrame:
    """Incremental NEAR-dup against a persisted MinHash band index —
    the rolling-ingest twin of q48 (exact) built from the q21 banding:
    the corpus's band rows persist once in ``band_part=`` buckets; a
    NEW shard (perturbed mirrors, ids +DUP_OFFSET) bands once and
    probes only the buckets it touches. Pair-recall invariant: every
    new doc must near-match its source."""
    import shutil
    import tempfile

    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    index_dir = tempfile.mkdtemp(prefix="bandidx_")
    try:
        D.build_minhash_band_index(ds, "doc_id", "text", index_dir)

        def shift(df: pd.DataFrame) -> pd.DataFrame:
            out = df.copy()
            out["doc_id"] = (out["doc_id"] + DUP_OFFSET).astype("int64")
            out["text"] = out["text"] + " perturbed"
            return out

        new_ds = ds.map_batches(shift, batch_format="pandas")
        matches = D.dedup_against_band_index(
            new_ds, index_dir, "doc_id", "text", threshold=0.7).to_pandas()
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)

    by_new = matches.groupby("doc_id")["match_id"].apply(set)
    base = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])["doc_id"].astype("int64")
    flag = [int(src in by_new.get(src + DUP_OFFSET, set()))
            for src in sorted(base)]
    return pd.DataFrame({
        "doc_id": pd.Series(sorted(base + DUP_OFFSET), dtype="int64"),
        "matched_src": pd.Series(flag, dtype="int64")})


def q84_order_ntile(sf_dir: str) -> pd.DataFrame:
    """NTILE(4) quantile buckets per customer over order history
    (ordered by date, key tie-break) — the equal-fill window rule SQL
    defines (first n%t buckets one row larger)."""
    ds = _read(sf_dir, "orders").select_columns(
        ["o_orderkey", "o_custkey", "o_orderdate"])
    out = (R.grouped_ntile(ds, "o_custkey",
                           ["o_orderdate", "o_orderkey"], tiles=4)
           .to_pandas())
    out = out[["o_orderkey", "o_custkey", "tile"]]
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("o_orderkey").reset_index(drop=True)


def q85_modal_event_type(sf_dir: str) -> pd.DataFrame:
    """Grouped MODE: each user's most frequent event type (ties to the
    lexicographically smallest type) — combiner-shaped counts, one
    coarsened exchange, in-partition argmax."""
    ds = _read(sf_dir, "events").select_columns(["user_id", "event_type"])
    out = (R.grouped_mode(ds, "user_id", "event_type",
                          out_col="modal_type").to_pandas())
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


def q86_grouped_hll(sf_dir: str) -> pd.DataFrame:
    """Per-event-type HLL registers over user_id (p=12) — the grouped
    mergeable-sketch shape ("distinct users per segment"); register
    content is deterministic, so the oracle pins the registers exactly,
    not the estimate (the q77 discipline, grouped)."""
    from ..stages.sketch import grouped_hll_registers
    ds = _read(sf_dir, "events").select_columns(["event_type", "user_id"])
    out = grouped_hll_registers(ds, "event_type", "user_id", p=12)
    return out.reset_index(drop=True)


def q93_weighted_avg_discount(sf_dir: str) -> pd.DataFrame:
    """Weighted mean (quantity-weighted average discount per return
    flag): the per-batch map adds the product column, then ONE
    pre-aggregate pass carries (Σw·x, Σw) — the general
    weighted-aggregate shape (never AVG of AVGs)."""
    ds = _read(sf_dir, "lineitem").select_columns(
        ["l_returnflag", "l_discount", "l_quantity"])

    def prod(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["l_returnflag", "l_quantity"]].copy()
        out["wx"] = df["l_discount"] * df["l_quantity"]
        return out

    agg = R.pre_aggregate(ds.map_batches(prod, batch_format="pandas"),
                          ["l_returnflag"],
                          {"swx": ("wx", "sum"), "sw": ("l_quantity",
                                                        "sum")})
    agg["w_avg_discount"] = (agg["swx"] / agg["sw"]).round(6)
    return (agg[["l_returnflag", "w_avg_discount"]]
            .sort_values("l_returnflag").reset_index(drop=True))


def q94_event_pivot(sf_dir: str) -> pd.DataFrame:
    """PIVOT on a bounded key set: per user, one column per event type
    (conditional-count indicators added per batch, then one
    pre-aggregate pass — the wide stream never shuffles raw rows)."""
    types = ["click", "error", "purchase", "signup", "view"]
    ds = _read(sf_dir, "events").select_columns(["user_id", "event_type"])

    def ind(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["user_id"]].copy()
        for t in types:
            out[f"n_{t}"] = (df["event_type"] == t).astype("int64")
        return out

    agg = R.pre_aggregate(ds.map_batches(ind, batch_format="pandas"),
                          ["user_id"],
                          {f"n_{t}": (f"n_{t}", "sum") for t in types})
    agg["user_id"] = agg["user_id"].astype("int64")
    for t in types:
        agg[f"n_{t}"] = agg[f"n_{t}"].astype("int64")
    return agg.sort_values("user_id").reset_index(drop=True)


def q95_unpivot_rates(sf_dir: str) -> pd.DataFrame:
    """UNPIVOT / melt: the (tax, discount) metric columns become
    (metric, value) rows — a pure per-batch map (zero shuffles), the
    long-form layout feature stores ingest."""
    ds = _read(sf_dir, "lineitem").select_columns(
        ["l_orderkey", "l_linenumber", "l_tax", "l_discount"])

    def melt(df: pd.DataFrame) -> pd.DataFrame:
        out = df.melt(id_vars=["l_orderkey", "l_linenumber"],
                      value_vars=["l_tax", "l_discount"],
                      var_name="metric", value_name="value")
        out["value"] = out["value"].round(2)
        return out

    out = ds.map_batches(melt, batch_format="pandas").to_pandas()
    out["l_orderkey"] = out["l_orderkey"].astype("int64")
    out["l_linenumber"] = out["l_linenumber"].astype("int64")
    return (out.sort_values(["l_orderkey", "l_linenumber", "metric"])
            .reset_index(drop=True))


def q96_geomean_price(sf_dir: str) -> pd.DataFrame:
    """Log-domain aggregate (geometric mean of order totals per
    priority): Σln(x) and n ride one pre-aggregate pass,
    exp(Σln/n) finishes — the numerically-sane product aggregate."""
    ds = _read(sf_dir, "orders").select_columns(
        ["o_orderpriority", "o_totalprice"])

    def logs(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["o_totalprice"] > 0]
        out = d[["o_orderpriority"]].copy()
        out["lx"] = np.log(d["o_totalprice"].to_numpy(np.float64))
        return out

    agg = R.pre_aggregate(ds.map_batches(logs, batch_format="pandas"),
                          ["o_orderpriority"],
                          {"slx": ("lx", "sum"), "n": ("lx", "count")})
    agg["geomean"] = np.round(np.exp(agg["slx"] / agg["n"]), 2)
    agg["n"] = agg["n"].astype("int64")
    return (agg[["o_orderpriority", "n", "geomean"]]
            .sort_values("o_orderpriority").reset_index(drop=True))


def q97_revenue_share(sf_dir: str) -> pd.DataFrame:
    """Ratio-to-report window (share of total): per-segment revenue and
    its fraction of the grand total — one pre-aggregate pass; the
    normalization is a driver-side divide over the tiny report frame."""
    customer = pd.read_parquet(f"{sf_dir}/customer.parquet",
                               columns=["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders").select_columns(
        ["o_custkey", "o_totalprice"])
    joined = R.broadcast_join(orders, customer.rename(
        columns={"c_custkey": "o_custkey"}), on="o_custkey")
    agg = R.pre_aggregate(joined, ["c_mktsegment"],
                          {"revenue": ("o_totalprice", "sum")})
    total = agg["revenue"].sum()
    out = pd.DataFrame({
        "segment": agg["c_mktsegment"],
        "revenue": agg["revenue"].round(2),
        "share": (agg["revenue"] / total).round(6)})
    return out.sort_values("segment").reset_index(drop=True)


def q90_top_tokens_per_lang(sf_dir: str) -> pd.DataFrame:
    """Grouped heavy hitters: the 5 most frequent tokens per language
    (ties to the lexicographically smaller token) — combiner-shaped
    (lang, token, count) partials through one coarsened exchange, then
    the grouped-topk finish; the raw token stream never shuffles."""
    ds = _read(sf_dir, "documents").select_columns(["lang", "text"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.split()
        t = (pd.DataFrame({"lang": df["lang"], "tok": toks})
             .explode("tok").dropna(subset=["tok"]))
        if t.empty:
            return pd.DataFrame({"lang": pd.Series(dtype="object"),
                                 "tok": pd.Series(dtype="object"),
                                 "c": pd.Series(dtype="int64")})
        return (t.groupby(["lang", "tok"], sort=False).size()
                .rename("c").reset_index())

    parts = ds.map_batches(part, batch_format="pandas", batch_size=256)

    # co-partition on (lang, tok) so the count fold is global, then the
    # existing grouped_topk finish (two-level pruning: each batch ships
    # at most 5 candidate rows per lang into the second tiny exchange)
    counts = (R.add_coarse_part(parts, ["lang", "tok"], 32)
              .groupby("_kpart")
              .map_groups(
                  lambda df: df.drop(columns=["_kpart"])
                  .groupby(["lang", "tok"], sort=False)["c"]
                  .sum().reset_index(), batch_format="pandas"))
    out = (R.grouped_topk(counts, "lang", "c", 5, tie_break="tok",
                          keep=["tok", "c"], n_parts=8).to_pandas())
    out["c"] = out["c"].astype("int64")
    out["rnk"] = out["rnk"].astype("int64")
    return (out.sort_values(["lang", "rnk"])
            .reset_index(drop=True)[["lang", "tok", "c", "rnk"]])


def q91_value_zscore_outliers(sf_dir: str) -> pd.DataFrame:
    """Per-key z-score outlier flags: events whose value deviates more
    than 3 population standard deviations from their event type's mean
    — one pre-aggregate pass for the (n, Σx, Σx²) moments, a broadcast
    of the tiny moment table, and a per-batch vectorized flag; the
    event stream moves zero times."""
    ds = _read(sf_dir, "events").select_columns(
        ["event_id", "event_type", "value"])

    def mom(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=["value"])
        x = d["value"].to_numpy(np.float64)
        g = pd.DataFrame({"event_type": d["event_type"],
                          "x": x, "xx": x * x})
        return (g.groupby("event_type", sort=False)
                .agg(n=("x", "size"), sx=("x", "sum"),
                     sxx=("xx", "sum")).reset_index())

    parts = ds.map_batches(mom, batch_format="pandas").to_pandas()
    tot = parts.groupby("event_type", sort=True).sum(numeric_only=True)
    n = tot["n"].to_numpy(np.float64)
    mean = tot["sx"].to_numpy() / n
    var = tot["sxx"].to_numpy() / n - mean * mean
    stats = pd.DataFrame({"event_type": tot.index, "mu": mean,
                          "sigma": np.sqrt(np.maximum(var, 0.0))})

    import ray
    ref = ray.put(stats)

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        s = ray.get(ref)
        d = df.dropna(subset=["value"]).merge(s, on="event_type")
        z = (d["value"].to_numpy(np.float64) - d["mu"].to_numpy()) \
            / d["sigma"].to_numpy()
        m = np.abs(z) > 3.0
        out = d[m][["event_id", "event_type"]].copy()
        out["z"] = np.round(z[m], 6)
        return out

    out = ds.map_batches(flag, batch_format="pandas").to_pandas()
    out["event_id"] = out["event_id"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def q88_funnel_conversion(sf_dir: str) -> pd.DataFrame:
    """Funnel attribution window: per user, purchases preceded by that
    user's latest click within one hour (same-instant click counts —
    SQL's c.ts <= p.ts)."""
    ds = _read(sf_dir, "events").select_columns(
        ["user_id", "ts", "event_type"])
    out = (R.funnel_conversion(ds, key="user_id", ts="ts",
                               type_col="event_type",
                               from_event="click", to_event="purchase",
                               window_seconds=3600).to_pandas())
    out = out.rename(columns={"n_target": "n_purchases"})
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


def q89_weighted_sample(sf_dir: str) -> pd.DataFrame:
    """Length-weighted document sampling without replacement
    (Efraimidis–Spirakis keys on the stable id hash): 100 docs weighted
    by token count."""
    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])

    def wcol(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_tokens": df["text"].fillna("").str.split().str.len()
            .astype("int64")})

    weighted = ds.map_batches(wcol, batch_format="pandas")
    out = TS.weighted_sample(weighted, "doc_id", "n_tokens", k=100)
    out["doc_id"] = out["doc_id"].astype("int64")
    out["n_tokens"] = out["n_tokens"].astype("int64")
    return out.reset_index(drop=True)


def q83_y4m_frame_stats(sf_dir: str) -> pd.DataFrame:
    """REAL video decode through the actor-pool stage: each doc becomes
    a genuine YUV4MPEG2 payload (20x16 C420, 6 frames) whose luma bytes
    follow the SQL-replicable law (doc_id*31 + frame*17 + pixel*13) %
    251 (chroma = constant 128); SampleY4MFrames parses the stream
    header, stride-skips the chroma planes, samples every 2nd frame and
    reduces the DECODED luma to (y_sum, y_mean) — any parse-offset bug
    shifts bytes and breaks the oracle, so the hash pins the decoder,
    not the generator."""
    from pdf_parser_ray.stages.multimodal import sample_y4m_dataset

    W, H, F = 20, 16, 6
    header = f"YUV4MPEG2 W{W} H{H} F30:1 Ip A1:1 C420\n".encode()
    chroma = bytes([128]) * ((W // 2) * (H // 2) * 2)
    px = np.arange(W * H, dtype=np.int64)

    def to_video(df: pd.DataFrame) -> pd.DataFrame:
        payloads = []
        for d in df["doc_id"].astype("int64"):
            parts = [header]
            for f in range(F):
                y = ((d * 31 + f * 17 + px * 13) % 251).astype(np.uint8)
                parts.append(b"FRAME\n" + y.tobytes() + chroma)
            payloads.append(b"".join(parts))
        return pd.DataFrame({"media_id": df["doc_id"].astype("int64"),
                             "payload": payloads})

    ds = (_read(sf_dir, "documents").select_columns(["doc_id"])
          .map_batches(to_video, batch_format="pandas", batch_size=64))
    out = sample_y4m_dataset(ds, stride=2, mode="strict").to_pandas()
    out["media_id"] = out["media_id"].astype("int64")
    return (out.sort_values(["media_id", "frame_idx"])
            .reset_index(drop=True))


def q82_chained_ingest_waves(sf_dir: str) -> pd.DataFrame:
    """The incremental-ingest story end to end (q48 × q67 × compaction
    interaction): wave 1 (documents) builds BOTH persisted indexes;
    wave 2 (ids +10M: exact copies for doc_id%3==0, one-junk-token
    near-dups for %3==1, every-2nd-token-replaced novel docs for %3==2)
    probes exact first, the remainder probes the band index, survivors
    are KEPT and union-append into the fingerprint index; the index is
    then COMPACTED (one file per bucket) and wave 3 — exact copies of
    the kept docs (ids +20M) — probes the appended+compacted index.
    Output: one row per doc in every wave with its decision and, where
    exactness defines it, the matched source id."""
    import shutil
    import tempfile

    semi_join_broadcast = R.semi_join_broadcast
    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    fp_dir = tempfile.mkdtemp(prefix="fpidx_q82_")
    band_dir = tempfile.mkdtemp(prefix="bandidx_q82_")
    try:
        D.build_fingerprint_index(ds, "doc_id", "text", fp_dir)
        D.build_minhash_band_index(ds, "doc_id", "text", band_dir)

        def wave2(df: pd.DataFrame) -> pd.DataFrame:
            out = df.copy()
            # constructed-oracle precondition (review finding): an
            # EMPTY %3==2 doc would survive its 'novel' transform
            # unchanged (dup_exact, oracle says kept) and a <3-token
            # %3==1 doc has no 3-shingles for the band probe
            # (kept, oracle says dup_near). Fail loudly if a datagen
            # change ever violates it instead of red-hashing cryptically.
            ntok = out["text"].fillna("").str.split().str.len()
            if (ntok < 3).any():
                raise ValueError(
                    "q82 precondition violated: documents with < 3 "
                    "tokens break the constructed decision oracle")
            src = out["doc_id"].to_numpy()
            out["doc_id"] = (src + DUP_OFFSET).astype("int64")
            mode = src % 3
            texts = out["text"].tolist()
            for i in range(len(out)):
                if mode[i] == 1:          # near-dup: one junk token
                    texts[i] = texts[i] + " zzptbz"
                elif mode[i] == 2:        # novel: kill every 3-shingle
                    toks = texts[i].split()
                    nid = int(out["doc_id"].iloc[i])
                    toks[0::2] = [f"zq{nid}x{j}"
                                  for j in range(len(toks[0::2]))]
                    texts[i] = " ".join(toks)
            out["text"] = texts
            return out

        new_ds = ds.map_batches(wave2, batch_format="pandas").materialize()
        exact = D.dedup_against_index(new_ds, fp_dir, "doc_id", "text")
        remainder = semi_join_broadcast(
            new_ds, exact["doc_id"], on="doc_id", anti=True)
        near = D.dedup_against_band_index(
            remainder, band_dir, "doc_id", "text",
            threshold=0.7).to_pandas()
        near_ids = set(near["doc_id"].astype("int64"))
        kept_ds = semi_join_broadcast(
            remainder, sorted(near_ids), on="doc_id",
            anti=True).materialize()
        # union append: survivors join the corpus index (disjoint
        # buckets — appends never rewrite), then compact to one file
        # per bucket and probe wave 3 against the appended index
        D.build_fingerprint_index(kept_ds, "doc_id", "text", fp_dir)
        D.compact_index(fp_dir)

        def wave3(df: pd.DataFrame) -> pd.DataFrame:
            out = df.copy()
            out["doc_id"] = (out["doc_id"] + DUP_OFFSET).astype("int64")
            return out

        w3 = D.dedup_against_index(kept_ds.map_batches(
            wave3, batch_format="pandas"), fp_dir, "doc_id", "text")
    finally:
        shutil.rmtree(fp_dir, ignore_errors=True)
        shutil.rmtree(band_dir, ignore_errors=True)

    base = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])["doc_id"].astype("int64")
    exact_map = dict(zip(exact["doc_id"].astype("int64"),
                         exact["match_id"].astype("int64")))
    w3_map = dict(zip(w3["doc_id"].astype("int64"),
                      w3["match_id"].astype("int64")))
    rows = [(int(d), "corpus", None) for d in base]
    for d in base:
        nid = int(d) + DUP_OFFSET
        if nid in exact_map:
            rows.append((nid, "dup_exact", exact_map[nid]))
        elif nid in near_ids:
            rows.append((nid, "dup_near", None))
        else:
            rows.append((nid, "kept", None))
    rows += [(int(d), "dup_exact_w3", int(m)) for d, m in w3_map.items()]
    out = pd.DataFrame(rows, columns=["doc_id", "decision", "match_id"])
    out["doc_id"] = out["doc_id"].astype("int64")
    # float64 with NaN for the NULLs — the dtype DuckDB's fetchdf gives a
    # nullable BIGINT, so both sides hash identically (the q80 pattern)
    out["match_id"] = out["match_id"].astype("float64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q71_asof_join_shuffle(sf_dir: str) -> pd.DataFrame:
    """q16's as-of join with NEITHER side broadcast: orders pre-dedupe
    to (custkey, date, max orderkey) as a Dataset, both sides meet in
    one coarsened key-hash exchange, merge_asof runs in-partition. Same
    oracle as q16 — the driver pins the broadcast and shuffle as-of
    modes hash-equal (the q47/q66 pattern)."""
    orders = _read(sf_dir, "orders").select_columns(
        ["o_custkey", "o_orderdate", "o_orderkey"])
    right = R.pre_aggregate(orders, ["o_custkey", "o_orderdate"],
                            {"o_orderkey": ("o_orderkey", "max")})
    import ray.data
    right_ds = ray.data.from_pandas(right).repartition(4)
    ds = _read(sf_dir, "events").select_columns(
        ["event_id", "user_id", "ts"])

    def rename(df: pd.DataFrame) -> pd.DataFrame:
        return df.rename(columns={"o_custkey": "user_id",
                                  "o_orderdate": "ts"})

    out = R.asof_join_shuffle(
        ds, right_ds.map_batches(rename, batch_format="pandas"),
        key="user_id", right_key="user_id", ts="ts", right_ts="ts",
        value_cols=["o_orderkey"]).to_pandas()
    out = out[["event_id", "o_orderkey"]]
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def q72_running_total(sf_dir: str) -> pd.DataFrame:
    """Per-customer running order total (cumulative window SUM ordered
    by date then orderkey) — one coarsened exchange, vectorized
    in-partition grouped cumsum."""
    ds = _read(sf_dir, "orders").select_columns(
        ["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"])
    out = R.grouped_running_sum(
        ds, "o_custkey", ["o_orderdate", "o_orderkey"],
        "o_totalprice").to_pandas()
    out = out[["o_orderkey", "o_custkey", "running"]]
    out["running"] = out["running"].round(2)
    for c in ("o_orderkey", "o_custkey"):
        out[c] = out[c].astype("int64")
    return out.sort_values("o_orderkey").reset_index(drop=True)


def q68_bigram_pmi(sf_dir: str) -> pd.DataFrame:
    """Collocation mining: top-40 token bigrams by PMI (min count 5) —
    combiner-shaped distributed unigram+bigram counts, driver sees only
    the Zipf-tiny candidate set."""
    ds = _read(sf_dir, "documents").select_columns(["text"])
    out = TS.bigram_pmi(ds, "text", min_count=5, k=40)
    out["c"] = out["c"].astype("int64")
    return out.reset_index(drop=True)


def q69_redact_pii(sf_dir: str) -> pd.DataFrame:
    """PII scrub: emails/phones regex-redacted per document (pure
    vectorized per-batch map, zero shuffles). The corpus has no PII, so
    the query injects deterministic synthetic contact lines first — the
    oracle injects the identical lines in SQL — making the redaction
    rule itself what the hash pins."""
    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])

    def inject(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        ids = out["doc_id"].astype("int64")
        out["text"] = (out["text"].fillna("")
                       + " contact: user" + ids.astype(str)
                       + "@example.com or +1 555-"
                       + (1000 + ids % 9000).astype(str))
        return out

    seeded = ds.map_batches(inject, batch_format="pandas")
    out = TS.redact_pii(seeded, "doc_id").to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    out["n_redacted"] = out["n_redacted"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q70_quality_top_p(sf_dir: str) -> pd.DataFrame:
    """Quality-weighted curation: keep each language's top 25% of
    documents by unigram-LM likelihood (rank on the 6dp-rounded score,
    doc_id tie-break)."""
    ds = _read(sf_dir, "documents").select_columns(
        ["doc_id", "lang", "text"])
    out = TS.quality_top_p(ds, "doc_id", "lang", "text", p=0.25)
    out["doc_id"] = out["doc_id"].astype("int64")
    return out


def q73_duplicate_spans(sf_dir: str) -> pd.DataFrame:
    """Cross-document repeated-substring statistics (the ExactSubstr
    measurement): per doc, the count of 5-gram positions whose gram
    occurs more than once corpus-wide, and the token coverage of those
    duplicated spans (interval union)."""
    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    out = TS.duplicate_span_stats(ds, "doc_id", "text", k=5)
    return out.reset_index(drop=True)


def q81_remove_duplicate_spans(sf_dir: str) -> pd.DataFrame:
    """ExactSubstr duplicate-span REMOVAL (the transform completing
    q73's measure): tokens covered by corpus-duplicated 5-grams are
    dropped when their maximal covered run is ≥ 8 tokens (shorter
    covered runs survive — exercises the run-length branch); remaining
    tokens re-join with single spaces."""
    ds = _read(sf_dir, "documents").select_columns(["doc_id", "text"])
    out = TS.remove_duplicate_spans(ds, "doc_id", "text",
                                    k=5, min_run=8).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q74_importance_weights(sf_dir: str) -> pd.DataFrame:
    """DSIR-style data selection: per-doc mean unigram log-likelihood
    ratio of a target-domain LM (lang='en' docs) vs the raw-corpus LM,
    add-one smoothed over the shared vocabulary."""
    ds = _read(sf_dir, "documents").select_columns(
        ["doc_id", "lang", "text"])

    def mark(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["is_target"] = (out["lang"] == "en")
        return out

    marked = ds.map_batches(mark, batch_format="pandas")
    return TS.importance_weights(marked, "doc_id", "text",
                                 target_col="is_target")


def q75_inactive_customers(sf_dir: str) -> pd.DataFrame:
    """Shuffle anti-join, big-to-big: customers with orders but NO
    events — the key set is the whole events user universe, too big to
    broadcast at web scale, so both sides meet in the coarsened
    key-hash exchange and the anti filter runs in-partition."""
    orders = _read(sf_dir, "orders").select_columns(
        ["o_custkey", "o_totalprice"])
    events = _read(sf_dir, "events").select_columns(["user_id"])
    out = R.shuffle_join(orders, events, left_on="o_custkey",
                         right_on="user_id", how="anti")
    agg = R.pre_aggregate(out, ["o_custkey"],
                          {"n_orders": ("o_totalprice", "count"),
                           "revenue": ("o_totalprice", "sum")})
    agg["n_orders"] = agg["n_orders"].astype("int64")
    agg["revenue"] = agg["revenue"].round(2)
    return agg.sort_values("o_custkey").reset_index(drop=True)


def _rollup_revenue(sf_dir: str, mode: str) -> pd.DataFrame:
    """Shared q76/q87 computation — ONE pipeline body so the two
    mode-pinning queries cannot silently diverge (the q47/q66 pattern;
    review finding)."""
    customer = pd.read_parquet(f"{sf_dir}/customer.parquet",
                               columns=["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders").select_columns(
        ["o_custkey", "o_orderpriority", "o_totalprice"])
    joined = R.broadcast_join(orders, customer.rename(
        columns={"c_custkey": "o_custkey"}), on="o_custkey")
    out = R.rollup_aggregate(
        joined, ["c_mktsegment", "o_orderpriority"],
        {"revenue": ("o_totalprice", "sum"),
         "n_orders": ("o_totalprice", "count")}, mode=mode)
    if hasattr(out, "to_pandas"):
        out = out.to_pandas()
    out = out.rename(columns={"c_mktsegment": "segment",
                              "o_orderpriority": "priority"})
    out["revenue"] = out["revenue"].round(2)
    out["n_orders"] = out["n_orders"].astype("int64")
    return (out.sort_values(["segment", "priority"])
            .reset_index(drop=True))


def q76_rollup_revenue(sf_dir: str) -> pd.DataFrame:
    """GROUP BY ROLLUP(segment, priority): one streaming pre-aggregate
    pass at the finest level; coarser levels fold from its partials —
    the input never re-streams per level."""
    return _rollup_revenue(sf_dir, "driver")


def q87_rollup_distributed(sf_dir: str) -> pd.DataFrame:
    """q76's ROLLUP through the DISTRIBUTED grouping-sets finish (same
    oracle as q76 by design — the q47/q66 mode-pinning pattern): the
    fine level stays a Dataset, every coarser level is one coarsened
    exchange, and nothing O(distinct combos) lands on the driver; the
    shared oracle pins the two modes hash-equal in the driver's
    correctness record, not just in pytest."""
    return _rollup_revenue(sf_dir, "distributed")


def q77_hll_registers(sf_dir: str) -> pd.DataFrame:
    """HyperLogLog sketch CONTENT as the oracle target (the q18/q36
    discipline: the estimate is approximate, the registers are
    deterministic integers): distinct-user registers over events,
    p=12, non-zero registers only."""
    from ..stages.sketch import hll_sketch
    ds = _read(sf_dir, "events").select_columns(["user_id"])
    regs = hll_sketch(ds, "user_id", p=12)
    nz = np.nonzero(regs)[0]
    return pd.DataFrame({"idx": nz.astype("int64"),
                         "register": regs[nz].astype("int64")})


def q78_value_hour_corr(sf_dir: str) -> pd.DataFrame:
    """Grouped Pearson correlation (value vs hour-of-day per event
    type) from one pass of moment partials — six numbers per key per
    batch ever move."""
    ds = _read(sf_dir, "events").select_columns(
        ["event_type", "ts", "value"])

    def hour(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"event_type": df["event_type"],
                             "h": df["ts"].dt.hour.astype("float64"),
                             "value": df["value"]})

    out = R.grouped_corr(ds.map_batches(hour, batch_format="pandas"),
                         "event_type", "value", "h")
    return out.sort_values("event_type").reset_index(drop=True)


def q79_cube_revenue(sf_dir: str) -> pd.DataFrame:
    """GROUP BY CUBE(segment, priority): all four grouping levels fold
    from one streaming pre-aggregate pass."""
    customer = pd.read_parquet(f"{sf_dir}/customer.parquet",
                               columns=["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders").select_columns(
        ["o_custkey", "o_orderpriority", "o_totalprice"])
    joined = R.broadcast_join(orders, customer.rename(
        columns={"c_custkey": "o_custkey"}), on="o_custkey")
    out = R.cube_aggregate(
        joined, ["c_mktsegment", "o_orderpriority"],
        {"revenue": ("o_totalprice", "sum"),
         "n_orders": ("o_totalprice", "count")})
    out = out.rename(columns={"c_mktsegment": "segment",
                              "o_orderpriority": "priority"})
    out["revenue"] = out["revenue"].round(2)
    out["n_orders"] = out["n_orders"].astype("int64")
    return (out.sort_values(["segment", "priority"])
            .reset_index(drop=True))


def q80_event_lag_delta(sf_dir: str) -> pd.DataFrame:
    """LAG window: per event, seconds since the user's previous event
    (NULL for firsts) — one coarsened exchange, vectorized in-partition
    grouped diff."""
    ds = _read(sf_dir, "events").select_columns(
        ["event_id", "user_id", "ts"])
    out = (R.grouped_lag_delta(ds, key="user_id", ts="ts",
                               id_col="event_id")
           .to_pandas())
    out["event_id"] = out["event_id"].astype("int64")
    out["delta_sec"] = out["delta_sec"].astype("float64").round(6)
    return out.sort_values("event_id").reset_index(drop=True)


def q49_corpus_pipeline(sf_dir: str) -> pd.DataFrame:
    """The end-to-end LLM-corpus pipeline as ONE streaming composition —
    quality filter → exact dedup → temperature rebalancing → train
    split → token-budget packing — every stage of which is individually
    oracle-checked (q12/q20/q41/q60/q44), here chained so the oracle
    validates the whole data flow including stage interactions (e.g.
    sampling rates computed on the deduped counts)."""
    ds = _read(sf_dir, "documents").select_columns(
        ["doc_id", "lang", "text"])
    stats = TS.text_stats_dataset(ds)
    good = stats.filter(expr="is_quality == 1").select_columns(
        ["doc_id", "lang", "text", "fingerprint"])
    deduped = D.exact_dedup(good, "fingerprint", "doc_id",
                            keep_cols=["lang", "text"])
    sampled = TS.temperature_sample(deduped, "doc_id", "lang",
                                    alpha=0.5)
    train = TS.filter_split(sampled, "doc_id", {"train"})
    out = TS.pack_documents(train, "doc_id", "text", budget=256,
                            n_shards=16).to_pandas()
    for c in ("doc_id", "shard", "n_tokens", "pack_id"):
        out[c] = out[c].astype("int64")
    return (out[["doc_id", "shard", "n_tokens", "pack_id"]]
            .sort_values("doc_id").reset_index(drop=True))


SAMPLE_RATES = {"en": 0.5, "zh": 0.25}
SAMPLE_DEFAULT = 0.125


def q64_stratified_sample(sf_dir: str) -> pd.DataFrame:
    """Deterministic per-language stratified sample of documents."""
    ds = _read(sf_dir, "documents").select_columns(["doc_id", "lang"])
    df = R.stratified_sample(ds, "lang", "doc_id", SAMPLE_RATES,
                             default_rate=SAMPLE_DEFAULT).to_pandas()
    df["doc_id"] = df["doc_id"].astype("int64")
    return (df[["doc_id", "lang"]].sort_values("doc_id")
            .reset_index(drop=True))
