#!/bin/bash
# Subset correctness check: verify_subset.sh q1_agg,d2_minhash_lsh [sfDir]
# Runs graft.Verify for only the named queries (plain JVM — no sbt lock)
# and prints just those queries' verify_local verdicts.
set -e
ONLY="$1"
SF="${2:-/root/testdata/sf0.01}"
OUT="/tmp/verify_subset_$$"
SPARK_GRAFT_ONLY="$ONLY" java -Xmx16g \
  --add-exports java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens java.base/java.lang=ALL-UNNAMED \
  --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens java.base/java.util=ALL-UNNAMED \
  --add-opens java.base/java.nio=ALL-UNNAMED \
  --add-opens java.base/sun.security.action=ALL-UNNAMED \
  --add-opens java.base/java.io=ALL-UNNAMED \
  --add-opens java.base/java.net=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify "$SF" "$OUT" 2>/dev/null | tail -1
python3 tools/verify_local.py "$SF" "$OUT" 2>&1 \
  | grep -E "^(PASS|FAIL) (${ONLY//,/|})( |:)" || true
rm -rf "$OUT"
