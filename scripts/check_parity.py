"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and the matching
``oracle_sql()`` statement on DuckDB over the same parquet tables, then
compares row count, sorted-by-name schema, and values (exact for
non-floats, tolerance for floats).  Usage::

    python scripts/check_parity.py [sf_dir] [query ...]

Defaults to /root/testdata/sf0.01 and all queries.
"""
import json
import math
import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: json.dumps(v, sort_keys=True, default=str)
                              if isinstance(v, (list, dict, np.ndarray)) else v)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def values_equal(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, bool]:
    """Returns (exact, close). ``exact`` mirrors the driver's value-hash
    parity: bitwise-equal floats (both-NaN allowed) and sentinel-canonical
    non-floats. ``close`` additionally allows rtol=1e-6/atol=1e-9 on floats
    — reported separately so a tolerance-only pass can never masquerade as
    a driver-gate PASS."""
    if list(a.columns) != list(b.columns) or len(a) != len(b):
        return False, False
    exact = True
    for c in a.columns:
        av, bv = a[c], b[c]
        ak = np.issubdtype(av.dtype, np.floating) if av.dtype != object else False
        bk = np.issubdtype(bv.dtype, np.floating) if bv.dtype != object else False
        # dtype-CLASS mismatch (float on one engine, integer on the other)
        # fails the exact gate even when values are numerically equal: the
        # driver's value hash is type-sensitive, and this is precisely the
        # class that produced the r4 tile_pyramid FAIL (DuckDB sum(BIGINT)
        # -> HUGEINT -> float64 vs Spark int64). Keep `close` so the report
        # still shows the values agreed.
        if ak != bk and (
            (ak and np.issubdtype(bv.dtype, np.integer))
            or (bk and np.issubdtype(av.dtype, np.integer))
        ):
            exact = False
        if ak or bk:
            x = pd.to_numeric(av, errors="coerce").astype(float).to_numpy()
            y = pd.to_numeric(bv, errors="coerce").astype(float).to_numpy()
            both_nan = np.isnan(x) & np.isnan(y)
            if not np.all(both_nan | (x == y)):
                exact = False
                if not np.all(
                    both_nan | np.isclose(x, y, rtol=1e-6, atol=1e-9, equal_nan=True)
                ):
                    return False, False
        else:
            # sentinel BEFORE astype(str): astype first would canonicalize
            # None -> 'None' and NaN -> 'nan', spuriously mismatching equal
            # nulls across engines
            ac = av.where(av.notna(), "\0").astype(str)
            bc = bv.where(bv.notna(), "\0").astype(str)
            if not ac.equals(bc):
                return False, False
    return exact, True


def main():
    args = sys.argv[1:]
    if args and os.path.isdir(args[0]):
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.01", args
    only = set(names) or None

    from pyspark.sql import SparkSession
    import __spark_entry__ as entry

    spark = (SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "48g")
             .config("spark.sql.adaptive.enabled", "true")
             .appName("check_parity").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, os_ = entry.queries(), entry.oracle_sql()
    results, bad = {}, []
    for name, fn in qs.items():
        if only is not None and name not in only:
            continue
        rec = {"rows_match": False, "schema_match": False, "hash_match": False,
               "spark_rows": None, "oracle_rows": None, "err": None}
        try:
            sdf = canon(fn(spark, sf_dir).toPandas())
            rec["spark_rows"] = len(sdf)
            sql = os_.get(name)
            if sql is None:
                rec["err"] = "no_oracle"
            else:
                odf = canon(con.execute(sql).fetchdf())
                rec["oracle_rows"] = len(odf)
                rec["rows_match"] = len(sdf) == len(odf)
                rec["schema_match"] = list(sdf.columns) == list(odf.columns)
                if rec["rows_match"] and rec["schema_match"]:
                    exact, close = values_equal(sdf, odf)
                    # hash_match mirrors the driver gate: EXACT values only.
                    # A tolerance-only pass is surfaced as tol_only so it can
                    # never mask a driver FAIL.
                    rec["hash_match"] = exact
                    rec["tol_only"] = close and not exact
        except Exception as e:  # noqa: BLE001 - harness must report, not die
            rec["err"] = f"{type(e).__name__}: {e}"[:500]
        results[name] = rec
        ok = rec["hash_match"]
        if not ok:
            bad.append(name)
        tag = "PASS" if ok else ("FAIL(tol-only: floats differ in ulps; driver gate would FAIL)"
                                 if rec.get("tol_only") else "FAIL")
        print(f"{tag} {name} spark={rec['spark_rows']} oracle={rec['oracle_rows']}"
              + (f" err={rec['err']}" if rec["err"] else ""), flush=True)

    unknown = sorted(only - set(qs)) if only else []
    if unknown:
        print(f"UNKNOWN query names (not in the registry): {unknown}")
    print(json.dumps({"total": len(results), "fail": bad, "unknown": unknown}))
    spark.stop()
    return 1 if bad or unknown else 0


if __name__ == "__main__":
    raise SystemExit(main())
