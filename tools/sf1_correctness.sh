#!/bin/sh
# r17 verdict item 2, extended r18: oracle-gate the surface at sf1 — the
# scale where plan transitions actually happen (the jaccard broadcast->SMJ
# flip lives there). Runs graft.Verify on the ScaleUp sf1 directory for the
# FULL gate surface, then replays every gate's oracle SQL in DuckDB against
# the SAME sf1 parquet and compares rows+schema+values; writes
# CORRECTNESS_sf1.json. A per-gate DuckDB budget (default 300 s) turns a
# quadratic replay that cannot finish at sf1 into an explicit SKIP row —
# never a hang, never a silent pass.
#
# Usage: sh tools/sf1_correctness.sh   (from /root/repo; sf1 must exist —
#        sbt "runMain graft.tools.ScaleUp" builds it)
set -e
cd /root/repo
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  sbt -batch "runMain graft.Verify /root/repo/target/sf1 /root/repo/target/verify_sf1"
# stale-proof: if check_oracle dies before writing its json (corrupt
# oracle_sql.json, import error), the summary below must fail on a missing
# file, never regenerate CORRECTNESS_sf1.json from a previous run's gates
rm -f /root/repo/target/correctness_sf1_gates.json
python3 tools/check_oracle.py \
  --json /root/repo/target/correctness_sf1_gates.json \
  --timeout "${SF1_ORACLE_TIMEOUT:-300}" \
  /root/repo/target/sf1 /root/repo/target/verify_sf1 || true
python3 - <<'EOF'
import json
gates = json.load(open("/root/repo/target/correctness_sf1_gates.json"))
out = {"sf": "sf1 (ScaleUp x10 of sf0.1, token/embedding copy-disjoint)",
       "n_gates": len(gates),
       "n_pass": sum(1 for v in gates.values() if v == "pass"),
       "n_skip": sum(1 for v in gates.values()
                     if str(v).startswith("SKIP")),
       "note": ("full-surface sf1 oracle run; SKIP rows are quadratic "
                "DuckDB replays over the per-gate budget (explicit, never "
                "counted as pass) - the Spark side ran and dumped results "
                "for every gate"),
       "gates": gates}
json.dump(out, open("/root/repo/CORRECTNESS_sf1.json", "w"), indent=1)
bad = {k: v for k, v in gates.items()
       if v != "pass" and not str(v).startswith("SKIP")}
print(f"CORRECTNESS_sf1.json: {out['n_pass']}/{out['n_gates']} pass, "
      f"{out['n_skip']} skip, {len(bad)} FAIL")
for k, v in sorted(bad.items()):
    print(f"  FAIL {k}: {v}")
raise SystemExit(1 if bad else 0)
EOF
