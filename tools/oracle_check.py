#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <outDir>
  (run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)

For each query name in <outDir>/oracle_sql.json: registers every parquet
table in <sfDir> as a DuckDB view, runs the oracle SQL, loads the Spark
result parquet, sorts columns by name + rows by all columns, and compares
values exactly (strict — if this passes, any tolerance-based driver
compare passes too).
"""
import json, sys, glob, os, math
import duckdb
import pandas as pd
import numpy as np


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        # stringify for a stable sort across dtypes incl. lists
        key = df.apply(lambda r: tuple(str(v) for v in r), axis=1)
        df = df.iloc[np.argsort(key, kind="stable")].reset_index(drop=True)
    return df


def values_equal(a, b) -> bool:
    if isinstance(a, (list, np.ndarray)) or isinstance(b, (list, np.ndarray)):
        a = list(a) if a is not None else None
        b = list(b) if b is not None else None
        if a is None or b is None:
            return a == b
        return len(a) == len(b) and all(values_equal(x, y) for x, y in zip(a, b))
    if a is None or b is None or (isinstance(a, float) and math.isnan(a)):
        an = a is None or (isinstance(a, float) and math.isnan(a))
        bn = b is None or (isinstance(b, float) and math.isnan(b))
        return an == bn
    if isinstance(a, float) or isinstance(b, float):
        return float(a) == float(b)
    return a == b


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
            print(f"FAIL {name}: oracle sql error: {e}")
            fails += 1
            continue
        sdf = canon(pd.concat([pd.read_parquet(p) for p in spark_glob]))
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
