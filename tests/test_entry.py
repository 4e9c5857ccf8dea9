"""Driver-contract rehearsal: every queries() entry must match its
oracle_sql() on the same parquet tables — row count, column names, and
order-insensitive values (the driver's CORRECTNESS gate, run here at
sf0.001 for speed; the driver uses sf0.01)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> None:
    assert len(spark_pdf) == len(duck_pdf), f"{name}: row count {len(spark_pdf)} != {len(duck_pdf)}"
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
    )
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    for col in a.columns:
        av, bv = a[col].to_numpy(), b[col].to_numpy()
        # the driver's value-hash is dtype-sensitive: an int64 Spark
        # column vs a float64 oracle column (e.g. DuckDB SUM -> HUGEINT
        # -> float64) hash-mismatches even when values are equal
        a_float = np.issubdtype(av.dtype, np.floating)
        b_float = np.issubdtype(bv.dtype, np.floating)
        assert a_float == b_float, (
            f"{name}.{col}: dtype kind mismatch spark={av.dtype} oracle={bv.dtype}"
            " (driver value-hash would fail)"
        )
        if a_float or b_float:
            # NULL-bearing int columns arrive as float64 + NaN on both
            # sides (e.g. resolve_redirects.chain_len for cycles); the
            # driver's byte-hash treats aligned NaNs as equal, so the
            # rehearsal must too — masks must match, non-NaN exactly
            af, bf = av.astype(float), bv.astype(float)
            an, bn = np.isnan(af), np.isnan(bf)
            assert (an == bn).all(), f"{name}.{col}: NULL positions differ"
            assert np.allclose(
                af[~an], bf[~bn], rtol=0, atol=0
            ), f"{name}.{col}: float values differ"
        else:
            assert (av == bv).all(), f"{name}.{col}: values differ"


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, sf_dir, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    spark_pdf = q(spark, sf_dir).toPandas()
    if sql is None:
        # non-SQL-expressible op: driver records a rows-only check
        assert len(spark_pdf) >= 0
        return
    con = _duck(sf_dir)
    duck_pdf = con.execute(sql).df()
    con.close()
    _compare(spark_pdf, duck_pdf, name)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert [f.name for f in df.schema.fields] == ["id", "rank"]
