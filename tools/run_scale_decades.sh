#!/bin/bash
# Round-7 scale-decade runs (verdict items 1b/3): generate sf1 (10x) and
# sf10 (100x) from the driver's sf0.1 snapshot, then run the
# self-adjudicating scale bench at both decades. sf1 runs the FULL
# registry; sf10 runs the flagship dedup/ANN/graph/spatial families
# (brute-force recall oracles excluded by design — they are quadratic
# recall INSTRUMENTS, not production paths). Everything goes through
# spark-submit so an interactive sbt session keeps working.
set -e
cd /root/repo
J=target/scala-2.13/nyctaxietlpysparkspark_2.13-0.1.0.jar
S=/opt/spark/bin/spark-submit

echo "[decades] generating sf1 (10x)"
$S --master local[32] --driver-memory 48g --class graft.ScaleUp "$J" \
  /root/testdata/sf0.1 /tmp/sf1 10 > /tmp/scaleup_sf1.log 2>&1
echo "[decades] sf1 scale bench (full registry)"
python3 tools/scale_bench.py --sf-dir /tmp/sf1 --data-factor 10 \
  --baseline BENCH_full.json --out BENCH_scale_sf1.json --threshold 8 \
  --log /tmp/scale_sf1.log

echo "[decades] generating sf10 (100x)"
$S --master local[32] --driver-memory 48g --class graft.ScaleUp "$J" \
  /root/testdata/sf0.1 /tmp/sf10 100 > /tmp/scaleup_sf10.log 2>&1
echo "[decades] sf10 scale bench (flagship families)"
python3 tools/scale_bench.py --sf-dir /tmp/sf10 --data-factor 100 \
  --baseline BENCH_full.json --out BENCH_scale_sf10.json --threshold 80 \
  --queries q_dedup_exact,q_dedup_minhash,q_dedup_lsh,q_dedup_near,q_dedup_clusters_fast,q_dedup_canonical,q_dedup_best,q_dedup_simhash_pairs,q_dedup_ngram,q_dedup_embed,q_semdedup,q_sim_lsh,q_sim_ivf,q_sim_pq,q_sim_ivfpq,q_sim_hamming,q_twostage,q_sim_prefix,q_pagerank,q_triangles,q_khop,q_recursive,q_markov,q_spatial,q_density,q_dbscan,q_editsim,q_er,q_cdc_apply \
  --log /tmp/scale_sf10.log
echo "[decades] done"
