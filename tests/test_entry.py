"""Mirror of the driver's correctness gate: every queries() entry vs its
DuckDB oracle_sql() at sf0.001 (the driver runs sf0.01 — same shape).

Comparison = column names, row counts, and order-insensitive values
(rows sorted by all columns; floats already rounded inside the queries)."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("ENTRY_TEST_SF", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return c


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            s = pd.to_datetime(df[c])
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), ignore_index=True)


def assert_frames_match(got: pd.DataFrame, exp: pd.DataFrame, name: str):
    assert sorted(got.columns) == sorted(exp.columns), \
        f"{name}: columns {sorted(got.columns)} != {sorted(exp.columns)}"
    assert len(got) == len(exp), f"{name}: rows {len(got)} != {len(exp)}"
    g, e = _normalize(got), _normalize(exp)
    for c in g.columns:
        if pd.api.types.is_float_dtype(g[c]):
            np.testing.assert_allclose(
                g[c].to_numpy(), e[c].to_numpy(), atol=1e-8, rtol=1e-9,
                err_msg=f"{name}.{c}")
        else:
            mismatch = (g[c].astype(str) != e[c].astype(str))
            assert not mismatch.any(), (
                f"{name}.{c}: first diff "
                f"{g[c][mismatch].head(3).tolist()} vs "
                f"{e[c][mismatch].head(3).tolist()}")


ALL = sorted(entrymod.queries())
# the hybrid oracle precomputes its VALUES from the documents parquet —
# point it at THIS test's sf dir (the driver leaves it unset → sf0.01)
os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF_DIR
ORACLES = entrymod.oracle_sql()


def test_oracles_subset_of_queries():
    assert set(ORACLES) <= set(entrymod.queries())


@pytest.mark.parametrize("name", ALL)
def test_entry_query(spark, con, name):
    fn = entrymod.queries()[name]
    got = fn(spark, SF_DIR).toPandas()
    if name not in ORACLES:
        assert len(got) >= 0  # rows-only contract; schema must materialize
        assert len(got.columns) > 0
        return
    exp = con.sql(ORACLES[name]).df()
    assert_frames_match(got, exp, name)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["doc_id", "score"]


def test_oracle_sql_degrades_without_corpus(tmp_path):
    """A missing/unreadable corpus dir must cost ONLY the hybrid entry
    (with a warning) — every string-built oracle still comes back, so a
    broken env can't take down the whole correctness gate."""
    import warnings

    old = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR")
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = str(tmp_path / "nope")
    try:
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            oracles = entrymod.oracle_sql()
        assert "hybrid_search_topk" not in oracles
        assert "ft_bm25_topk" in oracles and "tpch_q1" in oracles
        assert any("hybrid_search_topk oracle unavailable" in str(x.message)
                   for x in w)
    finally:
        if old is None:
            os.environ.pop("SPARK_GRAFT_ORACLE_SF_DIR", None)
        else:
            os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = old


def test_oracle_sql_memoizes_hybrid(monkeypatch):
    """Repeated oracle_sql() calls must not re-run the numpy hybrid
    oracle for an sf dir already computed (the memo also keeps the
    relational-oracle-only callers cheap after the first call)."""
    assert SF_DIR in entrymod._HYBRID_ORACLE_CACHE  # computed at import
    calls = {"n": 0}

    def boom(*a, **k):
        calls["n"] += 1
        raise AssertionError("hybrid oracle recomputed despite memo")

    import pandas as pd
    monkeypatch.setattr(pd, "read_parquet", boom)
    oracles = entrymod.oracle_sql()
    assert "hybrid_search_topk" in oracles
    assert calls["n"] == 0
