"""Local mirror of the driver's correctness gate.

For every ``queries()`` entry that has an ``oracle_sql()`` twin, run
both on the same sf dir and compare row count + sorted values, the way
the driver does (columns sorted by name, order-insensitive).
"""

import importlib
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.sql(sql).df()


def _to_pandas(obj) -> pd.DataFrame:
    try:
        import ray.data

        if isinstance(obj, ray.data.Dataset):
            return obj.to_pandas()
    except ImportError:
        pass
    import pyarrow as pa

    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _entry():
    return importlib.import_module("__ray_entry__")


def pytest_generate_tests(metafunc):
    if "qname" in metafunc.fixturenames:
        mod = _entry()
        names = [n for n in mod.queries() if n in mod.oracle_sql()]
        metafunc.parametrize("qname", names)


def test_query_matches_oracle(ray_session, sf_small, qname):
    mod = _entry()
    ray_df = _canon(_to_pandas(mod.queries()[qname](sf_small)))
    duck_df = _canon(_duck(sf_small, mod.oracle_sql()[qname]))
    assert list(ray_df.columns) == list(duck_df.columns), (
        f"{qname}: column mismatch {list(ray_df.columns)} vs {list(duck_df.columns)}"
    )
    assert len(ray_df) == len(duck_df), f"{qname}: row count"
    pd.testing.assert_frame_equal(ray_df, duck_df, check_dtype=False, check_exact=False, atol=1e-6)
