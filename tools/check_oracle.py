"""Local stand-in for the driver's correctness gate.

Runs every ``queries()[name](sf_dir)`` and, where ``oracle_sql()`` has an
entry, the DuckDB SQL on the same tables; compares row count, column names
and an order-insensitive value hash (rows sorted by all columns, columns
sorted by name — mirroring the documented driver compare).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(result) -> pd.DataFrame:
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    return result


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    h = hashlib.sha256()
    for c in df.columns:
        col = df[c]
        if np.issubdtype(col.dtype, np.floating):
            h.update(np.ascontiguousarray(col.to_numpy()).tobytes())
        else:
            h.update(str(col.tolist()).encode())
    return h.hexdigest()[:16]


def main():
    args = [a for a in sys.argv[1:]]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = set(a for a in args if "/" not in a)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as m

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = m.queries()
    oracles = m.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = canonical(to_pandas(fn(sf_dir)))
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: query raised {type(exc).__name__}: {exc}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(mine)} rows ({dt:.1f}s) [no oracle]")
            del mine
            import gc

            gc.collect()
            continue
        try:
            theirs = canonical(con.sql(oracles[name]).df())
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: oracle raised {exc}")
            continue
        ok_rows = len(mine) == len(theirs)
        ok_cols = list(mine.columns) == list(theirs.columns)
        ok_vals = ok_rows and ok_cols and mine.equals(theirs)
        if not ok_vals and ok_rows and ok_cols:
            # detailed diff for debugging
            for c in mine.columns:
                a, b = mine[c], theirs[c]
                if np.issubdtype(a.dtype, np.floating) or np.issubdtype(b.dtype, np.floating):
                    same = np.isclose(a.astype(float), b.astype(float),
                                      rtol=0, atol=0, equal_nan=True)
                else:
                    same = (a == b).to_numpy()
                if not same.all():
                    i = int(np.nonzero(~same)[0][0])
                    print(f"      {name}: col {c} differs at row {i}: "
                          f"{a.iloc[i]!r} vs {b.iloc[i]!r}")
                    break
        status = "ok   " if ok_vals else "FAIL "
        if not ok_vals:
            failures.append(name)
        print(f"{status}{name}: rows {len(mine)}/{len(theirs)} cols={ok_cols} "
              f"({dt:.1f}s)")
        # drop refs + gc between queries: lingering Dataset/DataFrame refs
        # pin object-store blocks and degrade later queries 3-5x
        # (BASELINE.md measurement; bench.py does the same)
        del mine, theirs
        import gc

        gc.collect()
    print("FAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
