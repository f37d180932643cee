"""Driver-mimic: run queries() vs oracle_sql() side-by-side and compare.

Usage: PYTHONPATH=/root/repo python tools/check_oracle.py [sf_dir] [only...]
Mirrors the driver's comparison: row count, column-name set, and an
order-insensitive value hash over columns sorted by name.
"""

from __future__ import annotations

import hashlib
import sys
import traceback

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res) -> pd.DataFrame:
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return res


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        rows.append("\x1f".join(repr(v) for v in tup))
    rows.sort()
    return hashlib.md5("\x1e".join(rows).encode()).hexdigest()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    """Width-normalize WITHIN a dtype kind only (float32→float64,
    int32→int64). Never cast int→float: the driver's value-hash is
    type-sensitive across the int/float divide, so the local harness must
    expose that divergence (ADVICE r1: q08/q10 were masked by a blanket
    float64 cast)."""
    out = df.copy()
    for c in out.columns:
        if out[c].dtype.kind == "f":
            out[c] = out[c].astype("float64").round(6)
        elif out[c].dtype.kind in "iu":
            out[c] = out[c].astype("int64")
        else:
            out[c] = out[c].astype(str)
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR", log_to_driver=False)

    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = norm(to_pandas(fn(sf_dir)))
        except Exception:
            print(f"FAIL {name}: query raised")
            traceback.print_exc()
            failures += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(mine)} rows, cols={sorted(mine.columns)}")
            continue
        try:
            theirs = norm(con.execute(oracles[name]).fetchdf())
        except Exception:
            print(f"FAIL {name}: oracle SQL raised")
            traceback.print_exc()
            failures += 1
            continue
        problems = []
        if len(mine) != len(theirs):
            problems.append(f"rows {len(mine)} vs {len(theirs)}")
        if sorted(mine.columns) != sorted(theirs.columns):
            problems.append(f"cols {sorted(mine.columns)} vs {sorted(theirs.columns)}")
        elif value_hash(mine) != value_hash(theirs):
            problems.append("value-hash mismatch")
            merged = mine[sorted(mine.columns)].merge(
                theirs[sorted(theirs.columns)], how="outer", indicator=True)
            diff = merged[merged["_merge"] != "both"]
            problems.append(f"{len(diff)} differing rows; sample:\n"
                            f"{diff.head(6).to_string()}")
        if problems:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"OK   {name}: {len(mine)} rows")
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
