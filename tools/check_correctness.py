"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 on Spark and its ``oracle_sql()``
twin on DuckDB, then compares row count, schema (sorted column names), and an
order-insensitive value comparison. Flags exact-float mismatches separately
from approx mismatches so FP-rounding hazards surface before the driver runs.

Usage: python tools/check_correctness.py [query ...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize cell values to comparable primitives
    def canon(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, (list, tuple)):
            return tuple(canon(x) for x in v)
        if hasattr(v, "tolist"):  # numpy scalar/array
            t = v.tolist()
            return tuple(canon(x) for x in t) if isinstance(t, list) else canon(t)
        if isinstance(v, float):
            return v
        return v
    out = df.apply(lambda col: col.map(canon))

    # Sort on a representation-normalized key: floats that compare equal but
    # print differently across engines (-0.0 vs 0.0, 1 vs 1.0) must land in
    # the same position or the zipped row compare pairs wrong rows.
    def sort_key(v):
        if v is None:
            return (0, "")
        if isinstance(v, bool):
            return (1, str(v))
        if isinstance(v, (int, float)):
            f = float(v) + 0.0  # -0.0 -> 0.0
            if math.isnan(f):
                return (2, "nan")
            return (2, f"{f:.9e}")
        if isinstance(v, tuple):
            return (3, tuple(sort_key(x) for x in v))
        return (4, str(v))

    rows = sorted(
        out.itertuples(index=False, name=None),
        key=lambda r: tuple(sort_key(x) for x in r),
    )
    return pd.DataFrame(rows, columns=out.columns)


def values_equal(a, b, exact: bool) -> bool:
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(values_equal(x, y, exact) for x, y in zip(a, b))
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        if exact:
            return fa == fb
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def compare(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> dict:
    res = {"rows": len(spark_df) == len(oracle_df)}
    a, b = normalize(spark_df), normalize(oracle_df)
    res["schema"] = list(a.columns) == list(b.columns)
    if not res["rows"] or not res["schema"]:
        res["values_exact"] = res["values_approx"] = False
        res["detail"] = f"spark rows={len(spark_df)} cols={list(a.columns)}; oracle rows={len(oracle_df)} cols={list(b.columns)}"
        return res
    exact = approx = True
    first_diff = None
    for i, (ra, rb) in enumerate(zip(a.itertuples(index=False, name=None), b.itertuples(index=False, name=None))):
        row_exact = all(values_equal(x, y, True) for x, y in zip(ra, rb))
        row_approx = all(values_equal(x, y, False) for x, y in zip(ra, rb))
        if not row_exact:
            exact = False
            if first_diff is None:
                first_diff = (i, ra, rb)
        if not row_approx:
            approx = False
            if first_diff is not None and not row_approx:
                first_diff = (i, ra, rb)
                break
    res["values_exact"] = exact
    res["values_approx"] = approx
    if first_diff:
        res["detail"] = f"row {first_diff[0]}: spark={first_diff[1][:8]} oracle={first_diff[2][:8]}"
    return res


def main() -> int:
    import __spark_entry__ as entrymod
    from azure_medicine_data_engineering_spark.session import get_spark

    only = set(sys.argv[1:])
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    spark = get_spark(
        "correctness-check",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        # default 1g driver heap OOMs on runtime-oversized broadcasts when
        # sweeping synthetic >sf0.1 data (SPARK_GRAFT_SF_DIR overrides);
        # harmless at the standard SFs
        conf={"spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "4g")},
    )
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata is one file per table; Spark-written replica
        # dirs (tools/make_replica.py) are DIRECTORIES of part files
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        elif not os.path.exists(path):
            # partial replicas (make_replica --only=documents) carry only
            # the fact tables a sweep needs — skip the rest; a query that
            # touches a missing table fails loudly at run time
            continue
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    results = {}
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            sdf = df.toPandas()
            for c in getattr(df, "_stage_caches", None) or []:
                c.unpersist()
        except Exception as e:
            results[name] = {"error": f"spark: {type(e).__name__}: {e}"}
            failed.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        # The DRIVER's canonicalization does pandas.sort_values over raw
        # cells and dies on unhashable list/dict values (r3's only red row
        # was an array<double> output column). Every registered query must
        # emit scalar columns only.
        import numpy as _np
        hostile = [
            c for c in sdf.columns
            if any(isinstance(v, (list, dict, set, tuple, _np.ndarray))
                   for v in sdf[c].dropna().head(3))
        ]
        if hostile:
            results[name] = {"error": f"driver-hostile non-scalar columns: {hostile}"}
            failed.append(name)
            print(f"FAIL {name}: non-scalar output columns {hostile} "
                  "(driver canon cannot sort them)")
            continue
        if name not in oracles:
            results[name] = {"rows_only": len(sdf), "sec": round(time.time() - t0, 2)}
            print(f"OK?  {name}: rows-only check, {len(sdf)} rows")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            results[name] = {"error": f"oracle: {type(e).__name__}: {e}"}
            failed.append(name)
            print(f"FAIL {name}: oracle error: {e}")
            continue
        res = compare(sdf, odf)
        res["sec"] = round(time.time() - t0, 2)
        results[name] = res
        ok = res["rows"] and res["schema"] and res["values_exact"]
        soft = res["rows"] and res["schema"] and res["values_approx"]
        tag = "PASS" if ok else ("SOFT" if soft else "FAIL")
        if tag == "FAIL":
            failed.append(name)
        print(f"{tag} {name}: {json.dumps(res)}")

    print(f"\n{len(results) - len(failed)}/{len(results)} pass; failed: {failed}")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
