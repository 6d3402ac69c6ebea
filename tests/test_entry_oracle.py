"""Driver-model oracle check for the queries registered only at the
``__ray_entry__`` level (image pyramid/join, MVT/line/poly tile
summaries, OSM world queries) — the same comparison
``test_queries_oracle.py`` applies to the core query suite."""

import importlib
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _entry_module():
    sys.path.insert(0, "/root/repo")
    return importlib.import_module("__ray_entry__")


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con.sql(sql).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="stable") \
        .reset_index(drop=True)


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _entry_only_names():
    from planetiler_ray.pipelines.queries import ORACLE_SQL
    e = _entry_module()
    return sorted(set(e.oracle_sql()) - set(ORACLE_SQL))


@pytest.mark.parametrize("name", _entry_only_names())
def test_entry_query_matches_oracle(name, ray_session):
    e = _entry_module()
    got = _norm(_to_pandas(e.queries()[name](SF_DIR)))
    exp = _norm(_duck(e.oracle_sql()[name]))
    assert list(got.columns) == list(exp.columns), \
        (list(got.columns), list(exp.columns))
    assert len(got) == len(exp), f"{name}: rows {len(got)} vs {len(exp)}"
    for c in got.columns:
        g, x = got[c].to_numpy(), exp[c].to_numpy()
        if np.issubdtype(g.dtype, np.floating) or \
                np.issubdtype(x.dtype, np.floating):
            assert np.allclose(g.astype(float), x.astype(float),
                               rtol=0, atol=1e-9), f"{name}.{c}"
        else:
            assert (g == x).all(), f"{name}.{c}"


def test_osm_world_deterministic(tmp_path):
    """Rebuilding the OSM world twice yields identical bytes."""
    from planetiler_ray.osmworld import build_osm_world
    a, b = tmp_path / "a.pbf", tmp_path / "b.pbf"
    build_osm_world(str(a), 40)
    build_osm_world(str(b), 40)
    assert a.read_bytes() == b.read_bytes()
    assert a.stat().st_size > 0
