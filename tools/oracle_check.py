#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <outDir>
  (run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)

Driver-faithful semantics (aligned after the r02 divergence):
  - rows are sorted with pandas sort_values over all columns, NOT a
    stringified key — array-typed result columns therefore fail loudly
    here exactly as they crash the driver's comparator;
  - values compare via their string representation post-pandas, so an
    int64 99111 does NOT equal a float64 99111.0 (DuckDB HUGEINT sums
    materialize as float64 in pandas — cast sums in the oracle SQL).
"""
import json, sys, glob, os, math
import duckdb
import pandas as pd
import numpy as np


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, tuple, np.ndarray, dict))).any():
            raise TypeError(
                f"array-typed result column '{c}': the driver's pandas "
                "sort_values cannot sort it — reshape the query to scalars "
                "(posexplode/unnest)")
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="stable").reset_index(drop=True)
    return df


def canon_value(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return "NULL"
    return str(v)


def values_equal(a, b) -> bool:
    # strict: int64 99111 != float64 99111.0 (mirrors the driver's hash)
    return canon_value(a) == canon_value(b)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    fails = 0
    for name, sql in sorted(oracle.items()):
        spark_glob = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not spark_glob:
            print(f"FAIL {name}: no spark output")
            fails += 1
            continue
        try:
            odf = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle side error: {e}")
            fails += 1
            continue
        try:
            sdf = canon(pd.concat([pd.read_parquet(p) for p in spark_glob]))
        except Exception as e:
            print(f"FAIL {name}: spark side error: {e}")
            fails += 1
            continue
        ok_rows = len(odf) == len(sdf)
        ok_schema = list(odf.columns) == list(sdf.columns)
        ok_vals = False
        if ok_rows and ok_schema:
            ok_vals = all(
                values_equal(sdf.iat[i, j], odf.iat[i, j])
                for i in range(len(sdf))
                for j in range(len(sdf.columns))
            )
        status = "PASS" if (ok_rows and ok_schema and ok_vals) else "FAIL"
        if status == "FAIL":
            fails += 1
            print(f"{status} {name}: rows {len(sdf)}/{len(odf)} schema_match={ok_schema}")
            if ok_rows and ok_schema:
                for i in range(len(sdf)):
                    for j in range(len(sdf.columns)):
                        if not values_equal(sdf.iat[i, j], odf.iat[i, j]):
                            print(f"  first diff @row{i} col={sdf.columns[j]}: spark={sdf.iat[i, j]!r} oracle={odf.iat[i, j]!r}")
                            break
                    else:
                        continue
                    break
            elif not ok_schema:
                print(f"  spark cols:  {list(sdf.columns)}")
                print(f"  oracle cols: {list(odf.columns)}")
        else:
            print(f"{status} {name} ({len(sdf)} rows)")
    print(f"{'ALL PASS' if fails == 0 else f'{fails} FAILURES'} / {len(oracle)} queries")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
