#!/bin/bash
# Round-16 evidence chain (VERDICT r15 items 1, 2, 4): sequential so
# the sbt build lock and the 32 cores are never contended between
# steps — each measurement is a quiet-host number.
set -x
cd /root/repo
STAMP() { date -u +%H:%M:%SZ; }

echo "=== [$(STAMP)] step 1: Verify at sf1 ==="
sbt -batch "runMain graft.Verify /root/repo/testdata_sf1 /tmp/v_sf1" \
  > /tmp/r16_verify_sf1.log 2>&1
echo "verify exit=$?"
tail -3 /tmp/r16_verify_sf1.log

echo "=== [$(STAMP)] step 2: DuckDB scale gate at sf1 ==="
python3 tools/gate_scale.py /root/repo/testdata_sf1 /tmp/v_sf1 \
  GATE_SCALE_SF1_r16.json 600 8 > /tmp/r16_gate_sf1.log 2>&1
echo "gate exit=$?"
tail -5 /tmp/r16_gate_sf1.log

echo "=== [$(STAMP)] step 3: streaming soak ==="
sbt -batch "runMain graft.StreamSoak SOAK_r16.json 300 180" \
  > /tmp/r16_soak.log 2>&1
echo "soak exit=$?"
tail -3 /tmp/r16_soak.log

echo "=== [$(STAMP)] step 4: full bench at sf1 (2 runs) ==="
python3 tools/bench_local.py 16 2 /root/repo/testdata_sf1 32 \
  /root/repo/BENCH_SF1_r16.json > /tmp/r16_bench_sf1.log 2>&1
echo "bench exit=$?"
tail -3 /tmp/r16_bench_sf1.log

echo "=== [$(STAMP)] chain done ==="
