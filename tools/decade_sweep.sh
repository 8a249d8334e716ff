#!/bin/bash
# Second-decade scale sweep (SCALING.md round 13): runs the Bench
# subset below against each SF dir given as arguments, one JVM per SF
# (the round-11/12 protocol), writing /tmp/decade_<tag>.json per SF.
# Usage: tools/decade_sweep.sh /root/testdata/sf0.1 /tmp/graft_scale/sf1 /tmp/graft_scale/sf10
set -e
cd "$(dirname "$0")/.."
SUBSET="a1_label_counts,a2_degree,a4_degree_percentile,d1_exact_dedup,d2_minhash_lsh,d8_fuzzy_match,g3_node2vec_embeddings,gx_connected_components,gx_pagerank,gx_triangles,j11b_asof_native,j12_range_join,j13_bucketed_join,sql_graph_2hop,sql_q2_min_cost_supplier,sql_q9_product_profit,sql_q18_large_orders,w7_rolling_window,sim_lsh_topk,sim_ivf_topk,sim_ivf_trained,t10_tfidf,t22_bpe_merges,e11_stream_ingest_dedup,m0_training_corpus"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
for SF in "$@"; do
  TAG=$(basename "$SF")
  echo "=== $SF -> /tmp/decade_${TAG}.json ==="
  SPARK_GRAFT_SF_DIR="$SF" java -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    -Xmx96g $OPENS graft.Bench "$SUBSET" \
    2>/tmp/decade_${TAG}.err | tail -1 > /tmp/decade_${TAG}.json
  tail -c 400 /tmp/decade_${TAG}.json; echo
done
