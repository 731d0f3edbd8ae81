"""Mirror of the driver's correctness gate: run every ``queries()`` entry
at sf0.001 and compare against ``oracle_sql()`` via DuckDB (row count,
column names, order-insensitive values)."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__ as e

    return e


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    out = df[cols].sort_values(cols).reset_index(drop=True)
    return out.astype(str)


def test_all_oracles(entry_mod, con):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    # equality, not subset: every query MUST carry an oracle and vice
    # versa, so the two registries can never drift apart silently
    assert set(oracles) == set(qs), (
        f"queries-without-oracle: {sorted(set(qs) - set(oracles))}; "
        f"oracles-without-query: {sorted(set(oracles) - set(qs))}"
    )
    failures = []
    for name, sql in oracles.items():
        got = _canon(_to_df(qs[name](SF)))
        want = _canon(con.sql(sql).df())
        if list(got.columns) != list(want.columns):
            failures.append(f"{name}: columns {list(got.columns)} != {list(want.columns)}")
            continue
        try:
            pd.testing.assert_frame_equal(got, want)
        except AssertionError as ex:
            failures.append(f"{name}: {str(ex)[:200]}")
    assert not failures, "\n".join(failures)


def test_rows_only_queries(entry_mod):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    for name in set(qs) - set(oracles):
        df = _to_df(qs[name](SF))
        assert len(df) >= 0  # runs and yields a stable frame
        assert len(df.columns) > 0
