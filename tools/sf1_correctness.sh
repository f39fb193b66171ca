#!/bin/sh
# r17 verdict item 2: oracle-gate the probe family at sf1 — the scale where
# plan transitions actually happen (the jaccard broadcast->SMJ flip lives
# there). Runs graft.Verify on the ScaleUp sf1 directory for the probe-family
# gates, then replays each gate's oracle SQL in DuckDB against the SAME sf1
# parquet and compares rows+schema+values; writes CORRECTNESS_sf1.json.
#
# Usage: sh tools/sf1_correctness.sh   (from /root/repo; sf1 must exist —
#        sbt "runMain graft.tools.ScaleUp" builds it)
set -e
cd /root/repo
GATES="q_sim_knn_ivfpq,q_spearman,q_stream_outer_join,q_stream_stream_join,q_stream_session_parity,q_stream_session_rocksdb,q_sim_semdedup,q_prefix_sum,q_pipe_jaccard_block,q_sim_knn_pq_rerank,q_join_bucketed,q_mm_embed_real,q_layout_compact,q_pipe_split_safe,q_pipe_temp_sample,q_sim_semdedup_auto,q_sim_knn_matryoshka,q_expanding,q_pipe_dup_groups_dist,q_pipe_winnow_spans,q_sim_knn_ivf_learned_k64,q_sim_knn_pq_prod"
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} SPARK_GRAFT_VERIFY_FILTER="$GATES" \
  sbt -batch "runMain graft.Verify /root/repo/target/sf1 /root/repo/target/verify_sf1"
python3 tools/check_oracle.py --json /root/repo/target/correctness_sf1_gates.json \
  /root/repo/target/sf1 /root/repo/target/verify_sf1 $(echo "$GATES" | tr ',' ' ')
python3 - <<'EOF'
import json
gates = json.load(open("/root/repo/target/correctness_sf1_gates.json"))
out = {"sf": "sf1 (ScaleUp x10 of sf0.1, token/embedding copy-disjoint)",
       "n_gates": len(gates),
       "n_pass": sum(1 for v in gates.values() if v == "pass"),
       "gates": gates}
json.dump(out, open("/root/repo/CORRECTNESS_sf1.json", "w"), indent=1)
print(f"CORRECTNESS_sf1.json: {out['n_pass']}/{out['n_gates']} pass")
EOF
