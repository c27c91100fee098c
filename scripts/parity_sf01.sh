#!/usr/bin/env bash
# Scale-parity gate (VERDICT r14 next #7): the driver's hash gate runs
# at sf0.01; this runs the SAME Verify-dump + DuckDB compare for the 15
# scale-shaped rows (dedup / ANN / pipeline families) at sf0.1 once per
# round, writing PARITY_sf01.json next to the round's correctness
# artifact. Usage: scripts/parity_sf01.sh [sfDir] (default sf0.1).
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.1}"
OUT=/tmp/graft_parity_sf01
ROWS="dedup_exact,dedup_minhash,dedup_clusters,dedup_simhash,dedup_substring,dedup_semantic,dedup_embedding_lsh,ann_ivf,ann_ivf_join,ann_lsh_join,ann_pq,ann_maxsim,pipeline_curate,pipeline_web,warc_read"
rm -rf "$OUT"
sbt -batch "runMain graft.Verify $SF $OUT $ROWS" 1>&2
python3 scripts/parity.py "$SF" "$OUT" | tee /tmp/parity_sf01.txt 1>&2
python3 - "$SF" <<'EOF' > PARITY_sf01.json
import sys, json, re
txt = open("/tmp/parity_sf01.txt").read()
ok = re.findall(r"\[ok\]\s+(\S+):", txt)
fail = re.findall(r"\[FAIL\]\s+(\S+):", txt)
print(json.dumps({
    "sf_dir": sys.argv[1],
    "pass": not fail,
    "ok": sorted(ok),
    "fail": sorted(fail),
}, indent=1))
EOF
cat PARITY_sf01.json
