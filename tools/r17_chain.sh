#!/bin/bash
# Round-17 evidence chain (VERDICT r16 items 2 and 4): sequential so
# the sbt build lock and the 32 cores are never contended between
# steps — each measurement is a quiet-host number.
#
# sf10 data: python3 tools/gen_scale_data.py testdata_sf10 10.0
# (seed 1042, byte-reproducible; 60M lineitem / 500k documents /
# 200k embeddings — gitignored like testdata_sf1).
#
# The sf10 tier runs the HEAVY SUBSET (the judge's explicit fallback:
# a full-registry dump measured ~0.9 queries/min at sf10 ≈ 5 h for the
# Verify step alone): the ~55 slowest sf1 lines + the super-linear
# watchlist + one representative per operator family. The FULL
# registry keeps its committed 10x evidence at sf1
# (GATE_SCALE_SF1_r16_full.json).
set -x
cd /root/repo
STAMP() { date -u +%H:%M:%SZ; }

SUBSET="triplet_mine_fixed,jaccard_pairs_exact,jaccard_probe_exact,semantic_dedup_fixed,skipgram_pmi,covisitation,crossdup_md5,bm25_prf,maxsim_md5_topk,minhash_neardup,char_entropy,crossdup_filter,minhash_calibration,bm25_batch,source_overlap_exact,word_lm_score,heavy_tokens,line_dedup,edit_distance_verify,hybrid_rrf,hll_registers,vocab_top,phrase_query,bm25_topk,opq_knn,bucketed_join,ivfpq_knn,attribution_u_shaped,value_quantiles,store_update_ids,srp_neardup,curation_pipeline,chunk_docs,pca_moments,bigram_pmi,semantic_dedup,blocking_quality,token_ppr,exact_dedup,neardup_pairs_md5,neardup_components_md5,dedup_span_removal,dup_spans,decontaminate,q1_agg,q2_join_agg,events_hourly,sessionized_events,louvain_communities,pagerank_directed,curation_funnel,wet_ingest,bitmap_distinct,mutual_knn_fixed,ivf_fixed_knn,source_sketch_jaccard,rfm_segments"

# stale Spark temp from any earlier kill -9 would eat the disk quota
rm -rf /tmp/blockmgr-* /tmp/spark-* 2>/dev/null

echo "=== [$(STAMP)] step 1: Verify heavy subset at sf10 ==="
SPARK_GRAFT_VERIFY_ONLY="$SUBSET" \
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

echo "=== [$(STAMP)] step 4: heavy-subset bench at sf10 (2 runs) ==="
python3 tools/bench_local.py 17 2 /root/repo/testdata_sf10 32 \
  /root/repo/BENCH_SF10_r17.json "$SUBSET" > /tmp/r17_bench_sf10.log 2>&1
echo "bench exit=$?"
tail -3 /tmp/r17_bench_sf10.log

echo "=== [$(STAMP)] step 5: full bench at sf0.1 (3 runs) ==="
python3 tools/bench_local.py 17 3 /root/testdata/sf0.1 32 \
  /root/repo/BENCH_LOCAL_r17.json > /tmp/r17_bench_local.log 2>&1
echo "bench exit=$?"
tail -3 /tmp/r17_bench_local.log

echo "=== [$(STAMP)] chain done ==="
