#!/bin/bash
# Interleaved same-box bench A/B: A = a prior-round worktree's compiled
# classes, B = HEAD's. Usage:
#   tools/ab_bench.sh <A_classes_dir> <B_classes_dir> <gates_csv> <pairs> [sf_dir]
# Runs pairs serially (never concurrent), one JVM per run, ALTERNATING
# the leading arm per pair (A,B then B,A then A,B ...) so first-run
# warm-up effects never land systematically on one arm. Prints each
# run's one-line Bench JSON tagged with the arm and index.
#
# CAVEAT (SURVEY §6q-2): both arms must be built with BOTH
# `sbt compile` AND `sbt "Compile / copyResources"` — plain compile
# omits META-INF/services and the graft-cdf source silently vanishes.
# CAVEAT (gate-definition skew): only compare gates whose DEFINITIONS
# are identical in both arms' trees (`git diff A..B -- <gate files>`),
# otherwise engine-cost and gate-volume changes conflate.
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
    -cp "/opt/spark/jars/*:$classes" graft.Bench "$GATES" 2>/tmp/ab_arm_err.log | \
    grep '"metric":"total"' | tail -1)
  # A failed Bench run (silent fast failure) must abort the A/B, not
  # emit a truncated JSON line that poisons the record downstream.
  if [ -z "$out" ]; then
    echo "FATAL: arm $arm run $idx produced no total line; stderr tail:" >&2
    tail -20 /tmp/ab_arm_err.log >&2
    exit 1
  fi
  # sanity: every requested gate must appear in the per-query map —
  # check each key EXPLICITLY (a numeric-field count would let
  # bookkeeping fields like total_ms pad over a missing gate)
  local g
  for g in $(echo "$GATES" | tr ',' ' '); do
    if ! echo "$out" | grep -q "\"$g\":"; then
      echo "FATAL: arm $arm run $idx missing gate \"$g\" in its per-query map" >&2
      echo "$out" >&2
      exit 1
    fi
  done
  echo "{\"arm\":\"$arm\",\"run\":$idx,$(echo "$out" | sed 's/^{//')"
}
for i in $(seq 1 "$PAIRS"); do
  if [ $((i % 2)) -eq 1 ]; then
    run_one A "$A_CLASSES" "$i"
    run_one B "$B_CLASSES" "$i"
  else
    run_one B "$B_CLASSES" "$i"
    run_one A "$A_CLASSES" "$i"
  fi
done
