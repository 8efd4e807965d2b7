#!/bin/bash
# Round-17 evidence chain (VERDICT r16 items 2 and 4): sequential so
# the sbt build lock and the 32 cores are never contended between
# steps — each measurement is a quiet-host number.
#
# sf10 data: python3 tools/gen_scale_data.py testdata_sf10 10.0
# (seed 1042, byte-reproducible; 60M lineitem / 500k documents /
# 200k embeddings — gitignored like testdata_sf1).
set -x
cd /root/repo
STAMP() { date -u +%H:%M:%SZ; }

# stale Spark temp from any earlier kill -9 would eat the disk quota
rm -rf /tmp/blockmgr-* /tmp/spark-* 2>/dev/null

echo "=== [$(STAMP)] step 1: Verify at sf10 ==="
sbt -batch "runMain graft.Verify /root/repo/testdata_sf10 /tmp/v_sf10" \
  > /tmp/r17_verify_sf10.log 2>&1
echo "verify exit=$?"
grep -c "failed" /tmp/r17_verify_sf10.log

echo "=== [$(STAMP)] step 2: DuckDB scale gate at sf10 ==="
python3 tools/gate_scale.py /root/repo/testdata_sf10 /tmp/v_sf10 \
  GATE_SCALE_SF10_r17.json 900 4 > /tmp/r17_gate_sf10.log 2>&1
echo "gate exit=$?"
tail -5 /tmp/r17_gate_sf10.log

echo "=== [$(STAMP)] step 3: stepped-rate streaming soak ==="
# near-dup: 4k/8k/16k docs/s brackets the ~11-12k/s capacity r16
# measured at 6x headroom; sessions: 20k/40k/80k events/s. 120 s per
# rate so each section has a settled trigger cadence.
sbt -batch "runMain graft.StreamSoak SOAK_r17.json 120 120 4000,8000,16000 20000,40000,80000" \
  > /tmp/r17_soak.log 2>&1
echo "soak exit=$?"
grep "\[soak\]" /tmp/r17_soak.log

echo "=== [$(STAMP)] step 4: full bench at sf10 (2 runs) ==="
python3 tools/bench_local.py 17 2 /root/repo/testdata_sf10 32 \
  /root/repo/BENCH_SF10_r17.json > /tmp/r17_bench_sf10.log 2>&1
echo "bench exit=$?"
tail -3 /tmp/r17_bench_sf10.log

echo "=== [$(STAMP)] chain done ==="
