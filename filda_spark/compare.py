"""Spark-vs-DuckDB comparison harness mirroring the driver's correctness
check: row count, column names, and order-insensitive value comparison
(columns sorted by name, rows sorted by all columns).

Used by tests to catch parity drift before the driver does.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

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


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_df, oracle_pdf: pd.DataFrame, float_atol: float = 0.0) -> list[str]:
    """Returns a list of mismatch descriptions; empty list == parity."""
    issues: list[str] = []
    s = _canon(spark_df.toPandas())
    o = _canon(oracle_pdf)
    if list(s.columns) != list(o.columns):
        return [f"column mismatch: spark={list(s.columns)} oracle={list(o.columns)}"]
    if len(s) != len(o):
        issues.append(f"row count: spark={len(s)} oracle={len(o)}")
        return issues
    for c in s.columns:
        sv, ov = s[c].to_numpy(), o[c].to_numpy()
        sf = np.issubdtype(np.asarray(sv).dtype, np.floating)
        of = np.issubdtype(np.asarray(ov).dtype, np.floating)
        # dtype-CLASS mismatch (float one side, integer the other) is a
        # driver-hash FAIL even when values agree numerically — the r4
        # tile_pyramid class (DuckDB sum(BIGINT) -> HUGEINT -> float64 vs
        # Spark int64). Flag it before the numeric coercion below hides it.
        if sf != of and (
            (sf and np.issubdtype(np.asarray(ov).dtype, np.integer))
            or (of and np.issubdtype(np.asarray(sv).dtype, np.integer))
        ):
            issues.append(
                f"col {c}: dtype class mismatch spark={np.asarray(sv).dtype} "
                f"oracle={np.asarray(ov).dtype} — driver hash is type-sensitive"
            )
        if sf or of:
            sv = np.asarray(sv, dtype=np.float64)
            ov = np.asarray(ov, dtype=np.float64)
            both_nan = np.isnan(sv) & np.isnan(ov)
            exact = (sv == ov) | both_nan
            if not exact.all():
                close = np.isclose(sv, ov, rtol=0, atol=float_atol, equal_nan=True)
                n_exact_bad = int((~exact).sum())
                if close.all():
                    issues.append(
                        f"col {c}: {n_exact_bad} values differ (<= atol {float_atol}) — "
                        f"hash-risk, e.g. {sv[~exact][:3]} vs {ov[~exact][:3]}"
                    )
                else:
                    bad = ~close
                    issues.append(
                        f"col {c}: {int(bad.sum())} values differ beyond atol, "
                        f"e.g. {sv[bad][:3]} vs {ov[bad][:3]}"
                    )
        else:
            eq = pd.Series(sv).astype(str).eq(pd.Series(ov).astype(str))
            if not eq.all():
                bad = ~eq
                issues.append(
                    f"col {c}: {int(bad.sum())} values differ, "
                    f"e.g. {list(pd.Series(sv)[bad][:3])} vs {list(pd.Series(ov)[bad][:3])}"
                )
    return issues
