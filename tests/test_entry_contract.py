"""Driver-contract test: every ``queries()`` entry with an
``oracle_sql()`` twin must match DuckDB row-for-row at sf0.01 —
the same rows+schema+values comparison the driver's CORRECTNESS
gate performs (columns sorted by name, rows sorted by value).
"""

import math
import os
import shutil

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_CONTRACT_SF", "/root/testdata/sf0.01")

import __spark_entry__ as entrymod


def _duck_con():
    con = duckdb.connect()
    for t in entrymod.TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm(v):
    if v is None:
        return ("\x00null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("\x00nan",)
        return round(v, 9)
    if isinstance(v, bool):
        return int(v)
    return v


def _canon(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = [tuple(_norm(v) for v in row) for row in df_pandas[cols].itertuples(index=False)]
    return cols, sorted(rows, key=repr)


@pytest.fixture(scope="module")
def oracle_map():
    return entrymod.oracle_sql()


@pytest.fixture(scope="module", autouse=True)
def _fresh_entry_state():
    # the entry crawl store/oracle dirs are cached across processes;
    # wipe them so this test exercises generation too
    for d in (entrymod._ORACLE_DIR, entrymod._ENTRY_STORE):
        shutil.rmtree(d, ignore_errors=True)
    yield


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(name, spark, oracle_map):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR).toPandas()
    if name not in oracle_map:
        pytest.skip(f"{name}: documented rows-only query (no oracle)")
    odf = _duck_con().execute(oracle_map[name]).df()
    s_cols, s_rows = _canon(sdf)
    o_cols, o_rows = _canon(odf)
    assert s_cols == o_cols, f"schema mismatch: {s_cols} vs {o_cols}"
    assert len(s_rows) == len(o_rows), f"row count {len(s_rows)} vs {len(o_rows)}"
    mism = [i for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b]
    assert not mism, f"{len(mism)} mismatching rows; first: {s_rows[mism[0]]} vs {o_rows[mism[0]]}"
