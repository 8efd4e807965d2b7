#!/usr/bin/env python3
"""Builder-side bench evidence: run the FULL graft bench N times and
write a committed BENCH_LOCAL_r{round}.json artifact — per-query min
across runs plus per-run timestamps/loadavg/wall — so a contended
driver-host bench number is explainable from the repo alone (the r12
lesson: the driver run said 185 s, the judge's re-run 119 s, and the
evidence lived only in the judge's session).

Usage: python3 tools/bench_local.py <round> [runs=3] [sf_dir] [cpus] [out]
       [only=q1,q2,...]   (subset runs record their membership in the artifact)
Writes BENCH_LOCAL_r{round}.json in the repo root (or `out` when given —
the sf1 scale runs commit as BENCH_SF1_r{round}.json to keep the sf0.1
round-over-round series clean).
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def one_run(sf_dir: str, cpus: str, only: str = "") -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=cpus)
    env.pop("SPARK_GRAFT_ONLY", None)
    if only:  # explicit subset runs (the sf10 heavy-subset artifact)
        env["SPARK_GRAFT_ONLY"] = only
    t0 = time.time()
    load0 = os.getloadavg()
    out = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        cwd=REPO, env=env, capture_output=True, text=True)
    wall = time.time() - t0
    # the [bench-full] line carries the COMPLETE per-query map (the
    # final bare-JSON line is length-budgeted for the driver window)
    full = None
    for line in out.stdout.splitlines():
        if line.startswith("[bench-full] "):
            full = json.loads(line[len("[bench-full] "):])
    if full is None:
        raise SystemExit(
            f"no [bench-full] line in bench output (exit {out.returncode});"
            f" tail:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")
    return {
        "started_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                     time.gmtime(t0)),
        "wall_sec": round(wall, 1),
        "loadavg_before": [round(x, 2) for x in load0],
        "loadavg_after": [round(x, 2) for x in os.getloadavg()],
        "total": full["value"],
        "engine_sec": full.get("engine_sec"),
        "twins_sec": full.get("twins_sec"),
        "fit_sec": full.get("fit_sec"),
        "cold_total": full.get("cold_total"),
        "errors": full.get("errors", {}),
        "queries": full["queries"],
        "queries_cold": full.get("queries_cold", {}),
    }


def main() -> None:
    rnd = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    cpus = sys.argv[4] if len(sys.argv) > 4 else "32"
    only = sys.argv[6] if len(sys.argv) > 6 else ""
    results = []
    for i in range(runs):
        r = one_run(sf_dir, cpus, only)
        results.append(r)
        print(f"run {i + 1}/{runs}: total={r['total']} "
              f"wall={r['wall_sec']}s load={r['loadavg_before']}",
              flush=True)
    names = sorted({q for r in results for q in r["queries"]})
    mins = {q: min(r["queries"][q] for r in results if q in r["queries"])
            for q in names}
    # cold-vs-warm breakout (r14 verdict item #2): each query's FIRST
    # in-process run (Bench's queries_cold map) pays codegen plus every
    # per-process memoized-artifact build (saved indexes, bucketed
    # store, SharedFrames temp parquet, trained pair tables) that
    # min-of-3 then reads warm. Run 1 of the first sbt invocation is
    # the true cold process; its queries_cold is the committed cold
    # evidence, with the >=0.5s deltas vs the warm min called out.
    cold = results[0].get("queries_cold", {})
    cold_deltas = {
        q: round(cold[q] - mins[q], 2)
        for q in names if q in cold and cold[q] - mins[q] >= 0.5}
    art = {
        "round": int(rnd),
        "subset": sorted(only.split(",")) if only else None,
        "sf": sf_dir,
        "cpus": int(cpus),
        "runs": results,
        "min_total": round(sum(mins.values()), 2),
        "cold_total": results[0].get("cold_total"),
        "cold_minus_min_by_query": dict(sorted(
            cold_deltas.items(), key=lambda kv: -kv[1])),
        "query_min": {q: round(v, 2) for q, v in sorted(mins.items())},
        # engine/twins/fit splits are per-run subtotals (Bench's own
        # membership sets); the min-composite split is not recoverable
        # from the mins alone
        "run_engine_sec": [r["engine_sec"] for r in results],
        "run_twins_sec": [r["twins_sec"] for r in results],
        "run_fit_sec": [r["fit_sec"] for r in results],
    }
    out = (sys.argv[5] if len(sys.argv) > 5
           else os.path.join(REPO, f"BENCH_LOCAL_r{rnd}.json"))
    with open(out, "w") as f:
        json.dump(art, f, indent=1, sort_keys=True)
    print(f"wrote {out}: min_total={art['min_total']}")


if __name__ == "__main__":
    main()
