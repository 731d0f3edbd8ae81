"""Full queries() vs oracle_sql() sweep at an arbitrary scale factor —
the in-repo mirror of the driver's CORRECTNESS gate (which runs at
sf0.01; tests/test_oracle.py covers sf0.001 in CI).

Usage: python tools/oracle_sweep.py [sf_dir] [name ...]
"""

import sys
import time

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True).astype(str)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False)
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    failures = []
    checked = 0
    for name in qs:
        if only and name not in only:
            continue
        checked += 1
        t0 = time.time()
        try:
            res = qs[name](sf)
            got = canon(res.to_pandas() if hasattr(res, "to_pandas") else res)
            want = canon(con.sql(oracles[name]).df())
            if list(got.columns) != list(want.columns):
                raise AssertionError(
                    f"columns {list(got.columns)} != {list(want.columns)}"
                )
            pd.testing.assert_frame_equal(got, want)
            print(f"OK   {name}: rows={len(got)} ({time.time() - t0:.1f}s)", flush=True)
        except Exception as ex:  # noqa: BLE001 - report and continue
            failures.append(name)
            print(f"FAIL {name}: {type(ex).__name__} {str(ex)[:300]}", flush=True)
    print(f"\n{checked - len(failures)}/{checked} green")
    if failures:
        print("failures:", failures)
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
