"""Driver-contract tests: a fast subset of queries() vs oracle_sql() via
DuckDB at sf0.001 (the full suite runs in tools/check_oracle.py)."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"
FAST = ["q01_pricing_summary", "q02_segment_revenue", "q04_events_by_type",
        "q06_first_order", "q10_doc_stats", "q11_lang_pred",
        "q13_fingerprint", "q20_exact_dedup", "q30_knn_bruteforce",
        "q40_frame_sample"]


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", FAST)
def test_query_matches_oracle(name, oracle_con, ray_session):
    import __ray_entry__ as E
    from tools.check_oracle import norm, to_pandas, value_hash

    mine = norm(to_pandas(E.queries()[name](SF)))
    theirs = norm(oracle_con.execute(E.oracle_sql()[name]).fetchdf())
    assert len(mine) == len(theirs), (len(mine), len(theirs))
    assert sorted(mine.columns) == sorted(theirs.columns)
    assert value_hash(mine) == value_hash(theirs)


def test_entry_smoke(ray_session):
    import __ray_entry__ as E
    res = E.entry()
    rows = res.take_all()
    assert len(rows) >= 1
    assert {"url", "status", "extracted_text", "spans"} <= set(rows[0])
