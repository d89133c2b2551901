#!/usr/bin/env bash
# Driver-conditions reproduction (the r15 verdict's missing knob):
# benchmark a query set twice — once idle, once with a deliberately
# CONCURRENT second JVM (graft.Verify at sf0.01, looped) sharing the
# box — and write both BENCH_DETAIL-format artifacts for comparison.
#
# The concurrent JVM runs OUTSIDE sbt (two sbt processes would fight
# over the project lock), with the same JDK17 --add-opens flags
# build.sbt injects. Compile first: sbt -batch compile.
#
# Usage: tools/contended_bench.sh out_dir [query ...]
#   (default queries: the 19-query evs streaming family)
#
# Interpretation: per-query `steal_ms` in the artifacts separates host
# noise from the deliberate contention — the idle pass should read
# steal ≈ 0; if it doesn't, the host was busy and the pass should be
# rerun (r16 measured the same query at 6.5 s idle vs 93 s inside a
# host steal burst, so an uncontrolled idle pass is meaningless).
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=${1:?usage: contended_bench.sh out_dir [query ...]}; shift || true
mkdir -p "$OUT"
QUERIES=("$@")
if [ ${#QUERIES[@]} -eq 0 ]; then
  QUERIES=(evs_cdc_apply evs_dedup_within_watermark evs_ewma_state
    evs_hourly_tumbling evs_incremental_ingest evs_jdbc_sink
    evs_late_data_drop evs_session_custom_state evs_session_windows
    evs_sliding_counts evs_stream_dedup evs_stream_full_join
    evs_stream_left_join evs_stream_semi_join evs_stream_static_join
    evs_stream_stream_join evs_user_running_counts evs_variant_tumbling
    evs_windowed_topk)
fi

CLASSES=target/scala-2.13/classes
[ -d "$CLASSES" ] || { echo "compile first: sbt -batch compile" >&2; exit 1; }
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
JAVA="java $ADD_OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"
CP="$CLASSES:$(ls -d /opt/spark/jars/*.jar | tr '\n' ':')"

bench() { # $1 = artifact path
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_DETAIL_OUT="$1" \
  $JAVA -Xmx16g -cp "$CP" graft.Bench "${QUERIES[@]}" \
    > "$1.stdout" 2> "$1.stderr"
}

echo "== idle pass =="
bench "$OUT/idle.json"

echo "== contended pass (concurrent Verify JVMs at sf0.01, looped) =="
STOP=0
( while [ ! -f "$OUT/.stop" ]; do
    $JAVA -Xmx8g -cp "$CP" graft.Verify /root/testdata/sf0.01 \
      "$OUT/verify_churn" > /dev/null 2>&1 || true
    rm -rf "$OUT/verify_churn"
  done ) &
CHURN=$!
trap 'touch "$OUT/.stop"; wait $CHURN 2>/dev/null || true' EXIT
sleep 10   # let the churn JVM reach steady state
bench "$OUT/contended.json"
touch "$OUT/.stop"; wait $CHURN 2>/dev/null || true; trap - EXIT

python3 - "$OUT" <<'EOF'
import json, sys, statistics
out = sys.argv[1]
idle = json.load(open(f"{out}/idle.json"))["queries"]
cont = json.load(open(f"{out}/contended.json"))["queries"]
print(f"{'query':32s} {'idle_med':>8s} {'cont_med':>8s} {'ratio':>6s} {'idle_steal':>10s} {'cont_steal':>10s}")
for q in sorted(idle):
    i, c = idle[q], cont[q]
    r = c["med"] / i["med"] if i["med"] else float("nan")
    print(f"{q:32s} {i['med']:8.2f} {c['med']:8.2f} {r:6.2f} "
          f"{sum(i['steal_ms']):9d}ms {sum(c['steal_ms']):9d}ms")
ti = sum(v["med"] for v in idle.values()); tc = sum(v["med"] for v in cont.values())
print(f"{'TOTAL':32s} {ti:8.2f} {tc:8.2f} {tc/ti:6.2f}")
EOF
