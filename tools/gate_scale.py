#!/usr/bin/env python3
"""Scale-tier mimic of the driver's DuckDB-oracle gate (r14 verdict
item #1): run every oracle compare at a larger sf with a per-query
timeout and write a committed JSON artifact, so "the gate holds at
sf1" is a repo-resident measurement instead of a claim.

Differences from tools/oracle_check.py (the faithful sf0.01 mimic):
  - each oracle query runs in its own subprocess with a wall timeout;
    a DuckDB twin that is too slow at scale records "oracle_timeout"
    (rows+schema evidence only) instead of hanging the sweep;
  - per-query spark-dump row counts and oracle wall seconds are
    recorded so super-linear scaling is visible per query;
  - queries with no oracle SQL (the driver's rows-only exemptions)
    are recorded as rows_only with their dumped row count.

Usage:
  python3 tools/gate_scale.py <sfDir> <verifyOutDir> <artifact.json>
      [timeout_sec=300] [workers=8]
  (run `sbt "runMain graft.Verify <sfDir> <verifyOutDir>"` first)
Worker mode (internal): gate_scale.py --worker <sfDir> <outDir> <name>
"""
import glob
import json
import math
import os
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor


def canon(df):
    import numpy as np
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].map(lambda v: isinstance(
                v, (list, tuple, np.ndarray, dict))).any():
            raise TypeError(f"array-typed result column '{c}'")
    if len(df.columns):
        df = df.sort_values(by=list(df.columns),
                            kind="stable").reset_index(drop=True)
    return df


def canon_value(v):
    import pandas as pd
    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return "NULL"
    return str(v)


def worker(sf_dir, out_dir, name):
    """Compare one query; print a single JSON result line."""
    import duckdb
    import pandas as pd
    res = {"name": name}
    t0 = time.time()
    try:
        con = duckdb.connect()
        # in-memory connections have NO spill dir by default — a heavy
        # twin (recursive pagerank CTE at sf1) then dies with an
        # allocation failure instead of spilling. Give each worker a
        # bounded spill area; the memory cap keeps concurrent workers
        # from fighting over the box.
        # PER-WORKER spill subdir: the quota counts every file in the
        # dir, so a shared dir lets a dead worker's leftovers starve
        # the next query (r16 lesson). Cleaned in the finally below.
        spill = os.path.join(
            os.environ.get("GATE_SPILL_DIR", "/tmp/duckdb_spill"),
            f"{name}-{os.getpid()}")
        os.makedirs(spill, exist_ok=True)
        con.execute(f"SET temp_directory='{spill}'")
        con.execute("SET max_temp_directory_size='"
                    f"{os.environ.get('GATE_SPILL_MAX', '45GiB')}'")
        con.execute(
            f"SET memory_limit='{os.environ.get('GATE_MEM', '24GB')}'")
        for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
            t = os.path.basename(p)[: -len(".parquet")]
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        with open(os.path.join(out_dir, "oracle_sql.json")) as f:
            sql = json.load(f)[name]
        odf = canon(con.execute(sql).df())
        res["oracle_sec"] = round(time.time() - t0, 2)
        sdf = canon(pd.concat([
            pd.read_parquet(p)
            for p in glob.glob(os.path.join(out_dir, name, "*.parquet"))]))
        res["rows_spark"] = len(sdf)
        res["rows_oracle"] = len(odf)
        ok_rows = len(odf) == len(sdf)
        ok_schema = list(odf.columns) == list(sdf.columns)
        ok_vals = ok_rows and ok_schema and all(
            canon_value(sdf.iat[i, j]) == canon_value(odf.iat[i, j])
            for i in range(len(sdf)) for j in range(len(sdf.columns)))
        res["status"] = "PASS" if ok_vals else "FAIL"
        if not ok_vals:
            res["detail"] = (f"rows {len(sdf)}/{len(odf)} "
                             f"schema_match={ok_schema}")
            if ok_rows and ok_schema:
                for i in range(len(sdf)):
                    for j in range(len(sdf.columns)):
                        if canon_value(sdf.iat[i, j]) != canon_value(
                                odf.iat[i, j]):
                            res["detail"] += (
                                f"; first diff @row{i} "
                                f"col={sdf.columns[j]}: "
                                f"spark={sdf.iat[i, j]!r} "
                                f"oracle={odf.iat[i, j]!r}")
                            break
                    else:
                        continue
                    break
    except Exception as e:
        res["status"] = "ERROR"
        res["detail"] = f"{type(e).__name__}: {e}"[:400]
    finally:
        import shutil
        shutil.rmtree(os.path.join(
            os.environ.get("GATE_SPILL_DIR", "/tmp/duckdb_spill"),
            f"{name}-{os.getpid()}"), ignore_errors=True)
    print("RESULT " + json.dumps(res), flush=True)


def spark_rows(out_dir, name):
    import pandas as pd
    files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    if not files:
        return None
    return sum(len(pd.read_parquet(p)) for p in files)


def main():
    sf_dir, out_dir, artifact = sys.argv[1:4]
    timeout = int(sys.argv[4]) if len(sys.argv) > 4 else 300
    workers = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    dumped = sorted(
        os.path.basename(d) for d in glob.glob(os.path.join(out_dir, "*"))
        if os.path.isdir(d))
    results = {}

    def run_one(name):
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker",
             sf_dir, out_dir, name],
            capture_output=True, text=True, timeout=None if timeout <= 0
            else timeout)
        for line in p.stdout.splitlines():
            if line.startswith("RESULT "):
                return json.loads(line[len("RESULT "):])
        return {"name": name, "status": "ERROR",
                "detail": (p.stderr or p.stdout)[-300:],
                "oracle_sec": round(time.time() - t0, 2)}

    def guarded(name):
        try:
            r = run_one(name)
        except subprocess.TimeoutExpired:
            r = {"name": name, "status": "ORACLE_TIMEOUT",
                 "oracle_sec": timeout,
                 "rows_spark": spark_rows(out_dir, name)}
            # a SIGKILLed worker never reaches its finally — reap its
            # spill subdir here so later queries get the full disk
            import shutil
            root = os.environ.get("GATE_SPILL_DIR", "/tmp/duckdb_spill")
            for d in glob.glob(os.path.join(root, f"{name}-*")):
                shutil.rmtree(d, ignore_errors=True)
        return r

    with ThreadPoolExecutor(max_workers=workers) as ex:
        for r in ex.map(guarded, sorted(oracle)):
            results[r["name"]] = r
            print(f"{r['status']:>14} {r['name']} "
                  f"({r.get('oracle_sec', '?')}s)", flush=True)

    # rows-only queries: dumped by Verify but not in oracle_sql.json
    for name in dumped:
        if name in oracle:
            continue
        n = spark_rows(out_dir, name)
        results[name] = {"name": name, "status": "ROWS_ONLY",
                         "rows_spark": n}
        if n is None or n == 0:
            results[name]["status"] = "ROWS_ONLY_EMPTY"
    # queries registered but never dumped (spark-side failure)
    missing = [n for n in oracle if n not in dumped]
    for n in missing:
        results[n] = {"name": n, "status": "SPARK_MISSING"}

    counts = {}
    for r in results.values():
        counts[r["status"]] = counts.get(r["status"], 0) + 1
    art = {
        "sf_dir": sf_dir,
        "timeout_sec": timeout,
        "summary": counts,
        "total": len(results),
        "results": {k: results[k] for k in sorted(results)},
    }
    with open(artifact, "w") as f:
        json.dump(art, f, indent=1, sort_keys=True)
    print(f"wrote {artifact}: {counts}")
    return 0 if set(counts) <= {"PASS", "ROWS_ONLY",
                                "ORACLE_TIMEOUT"} else 1


if __name__ == "__main__":
    if sys.argv[1] == "--worker":
        worker(*sys.argv[2:5])
    else:
        sys.exit(main())
