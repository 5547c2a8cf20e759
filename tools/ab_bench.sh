#!/bin/bash
# Interleaved same-box bench A/B: A = a prior-round worktree's compiled
# classes, B = HEAD's. Usage:
#   tools/ab_bench.sh <A_classes_dir> <B_classes_dir> <gates_csv> <pairs> [sf_dir]
# Runs A,B,A,B,... serially (never concurrent), one JVM per run, and
# prints each run's one-line Bench JSON tagged with the arm and index.
set -u
A_CLASSES="$1"; B_CLASSES="$2"; GATES="$3"; PAIRS="$4"
SF_DIR="${5:-/root/testdata/sf0.1}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
run_one() {
  local arm="$1" classes="$2" idx="$3"
  local out
  out=$(SPARK_GRAFT_SF_DIR="$SF_DIR" java $ADD_OPENS \
    -Xmx"${SPARK_DRIVER_MEM:-8g}" \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "/opt/spark/jars/*:$classes" graft.Bench "$GATES" 2>/dev/null | \
    grep '"metric":"total"' | tail -1)
  echo "{\"arm\":\"$arm\",\"run\":$idx,$(echo "$out" | sed 's/^{//')"
}
for i in $(seq 1 "$PAIRS"); do
  run_one A "$A_CLASSES" "$i"
  run_one B "$B_CLASSES" "$i"
done
