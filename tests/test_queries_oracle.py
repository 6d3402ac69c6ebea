"""Side-by-side check of every oracle-backed query vs DuckDB (driver model).

Mirrors the driver's comparison: run the Ray pipeline and the oracle SQL
on the same parquet tables, sort columns by name and rows by value, and
compare row counts + values.  Uses sf0.001 for speed; the driver runs
the same at sf0.01.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con.sql(sql).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="stable").reset_index(drop=True)
    return df


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    return ray_session


def _oracle_names():
    from planetiler_ray.pipelines.queries import ORACLE_SQL
    return sorted(ORACLE_SQL)


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(name):
    from planetiler_ray.pipelines.queries import ORACLE_SQL, QUERIES
    got = _norm(_to_pandas(QUERIES[name](SF_DIR)))
    exp = _norm(_duck(ORACLE_SQL[name]))
    assert list(got.columns) == list(exp.columns), (list(got.columns), list(exp.columns))
    assert len(got) == len(exp), f"{name}: rows {len(got)} vs {len(exp)}"
    for c in got.columns:
        g, e = got[c].to_numpy(), exp[c].to_numpy()
        if np.issubdtype(g.dtype, np.floating) or np.issubdtype(e.dtype, np.floating):
            assert np.allclose(g.astype(float), e.astype(float),
                               rtol=0, atol=1e-9), f"{name}.{c}"
        else:
            assert (g == e).all(), f"{name}.{c}: first diff at " \
                f"{np.nonzero(g != e)[0][:5]}"


def test_rows_only_queries_run():
    from planetiler_ray.pipelines.queries import ORACLE_SQL, QUERIES
    for name in set(QUERIES) - set(ORACLE_SQL):
        df = _to_pandas(QUERIES[name](SF_DIR))
        assert len(df) > 0, name
