"""Shared Spark session + oracle helpers for the test suite."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from global_market_index_etl_spark.session import get_spark  # noqa: E402
from global_market_index_etl_spark.sources.tables import TABLES  # noqa: E402

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="gmie-tests", master="local[8]", shuffle_partitions=8)
    yield s


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]").astype("int64")
        elif s.dtype == object and s.map(
            lambda v: v is None or hasattr(v, "toordinal"), na_action="ignore"
        ).all():
            out[c] = pd.to_datetime(s).astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        elif s.dtype == object:
            out[c] = s.astype(str)
        else:
            try:
                out[c] = s.astype("int64")
            except (TypeError, ValueError):
                out[c] = s.astype(str)
    return out.sort_values(by=list(out.columns), ignore_index=True)


# Oracle output types the driver's value hash maps 1:1 onto Spark output
# types.  DuckDB's sum(BIGINT) yields HUGEINT (int128) — value-identical to
# Spark's BIGINT but representation-divergent, which fails the driver's
# type-sensitive hash while passing a post-normalization value compare
# (exactly what happened to curation_pipeline_v3 / text_ppl_buckets in r9).
ORACLE_TYPE_ALLOWLIST = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT",
    "DOUBLE", "FLOAT", "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP",
}


def _dtype_family(s: pd.Series) -> str:
    """Collapse a pandas dtype to the family the driver's hash keys on.

    Spark's toPandas renders DATE columns as object-of-datetime.date while
    DuckDB's fetchdf gives datetime64[us] — the driver normalizes both to
    the same hash input (fx_asof_rate_fill/ts_reshape_suite are
    long-green), so date-like object columns classify as datetime."""
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if s.dtype == object and s.map(
        lambda v: v is None or hasattr(v, "toordinal"), na_action="ignore"
    ).all() and s.notna().any():
        return "datetime"
    return "object"


def assert_matches_oracle(spark, name, spark_fn, sql, sf_dir, float_rtol=0.0):
    """Differential check mimicking the driver: row count, column set,
    output dtype family, and (sorted) values — exact for non-floats,
    optional rtol for floats."""
    sdf = spark_fn(spark, sf_dir).toPandas()
    con = duck_connection(sf_dir)
    odf = con.execute(sql).fetchdf()
    con.close()
    assert len(sdf) == len(odf), (
        f"{name}: row count spark={len(sdf)} oracle={len(odf)}"
    )
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    )
    # Type identity BEFORE normalization: an oracle emitting HUGEINT (→
    # float64 in fetchdf) against Spark's int64 is a driver hash failure
    # even when every value matches, so it must fail here too.
    for c in sdf.columns:
        fs, fo = _dtype_family(sdf[c]), _dtype_family(odf[c])
        # all-null columns surface as object/float on either side — only
        # enforce when both sides carry at least one non-null value
        if sdf[c].notna().any() and odf[c].notna().any():
            assert fs == fo, (
                f"{name}.{c}: output dtype family spark={fs} ({sdf[c].dtype}) "
                f"oracle={fo} ({odf[c].dtype}) — value hash would diverge"
            )
    s = _normalize(sdf)
    o = _normalize(odf)
    for c in s.columns:
        sv, ov = s[c].values, o[c].values
        if pd.api.types.is_float_dtype(s[c]):
            for i, (x, y) in enumerate(zip(sv, ov)):
                if pd.isna(x) and pd.isna(y):
                    continue
                ok = (
                    x == y
                    if float_rtol == 0.0
                    else math.isclose(x, y, rel_tol=float_rtol, abs_tol=1e-12)
                )
                assert ok, f"{name}.{c}[{i}]: spark={x!r} oracle={y!r}"
        else:
            mism = (sv != ov).nonzero()[0] if hasattr(sv != ov, "nonzero") else []
            assert len(mism) == 0, (
                f"{name}.{c}: first mismatch at {mism[0]}: "
                f"spark={sv[mism[0]]!r} oracle={ov[mism[0]]!r}"
            )
