#!/usr/bin/env bash
# Builder-side bench runner pinned to the driver's per-round protocol
# (VERDICT r2 item 7: driver/builder bench parity), so BASELINE.md numbers
# and BENCH_r{N}.json are produced by the SAME invocation:
#
#   - cold JVM per run: sbt -batch "runMain graft.Bench" (run/fork := true,
#     so the JVM flags are exactly build.sbt's javaOptions — module opens,
#     heap = SPARK_DRIVER_MEM | min(12g, RAM/2), ReservedCodeCacheSize=512m)
#   - SPARK_GRAFT_SF_DIR selects the scale (driver: /root/testdata/sf0.1)
#   - in-JVM warmup + per-query cache clearing live in Bench.scala itself,
#     shared by both runners by construction
#
# Usage: tools/bench.sh [sfDir] [outJson] [onlyCsv]
#   tools/bench.sh                                  # full suite at sf0.1
#   tools/bench.sh /root/testdata/sf0.1 /tmp/b.json q_text_tokens,q_text_tfidf
set -euo pipefail
SF_DIR="${1:-/root/testdata/sf0.1}"
OUT="${2:-/tmp/bench_local.json}"
ONLY="${3:-}"
cd "$(dirname "$0")/.."
# Canary first (r3 postmortem): prove a forked JVM with the build's
# javaOptions can START within 120 s before committing to the 90-query
# suite (sbt startup alone can take ~60 s when the host's I/O throttle
# budget is drained). If it can't, print the flags and abort loudly —
# never ship a config that hangs the driver's harness at JVM startup again.
# NOTE: do not pipe sbt into `grep -q` here — grep -q exits at first match,
# sbt's remaining output then dies on SIGPIPE (141), and pipefail turns a
# PASSING canary into the FATAL branch. Write the log, then grep the file.
# Compile FIRST (untimed — a cold checkout legitimately takes minutes on
# this throttled host) so the canary's 120 s measures only sbt startup +
# JVM fork, never compilation: a slow compile must not read as a dead JVM.
sbt -batch compile > /dev/null 2>&1 || { echo "FATAL: sbt compile failed" >&2; exit 1; }
CANARY_LOG="$(mktemp /tmp/canary_sbt.XXXXXX.log)"
timeout 120 sbt -batch "runMain graft.Canary" > "$CANARY_LOG" 2>&1 || true
if ! grep -q CANARY_OK "$CANARY_LOG"; then
  echo "FATAL: forked-JVM canary did not start within 120s." >&2
  echo "Active javaOptions (from build.sbt):" >&2
  grep -E 'CANARY_OK|Xm|XX' "$CANARY_LOG" >&2 || true
  sbt -batch 'show javaOptions' 2>/dev/null | tail -5 >&2 || true
  exit 1
fi
grep CANARY_OK "$CANARY_LOG"
# sbt prefixes the JSON stdout line with "[info] " — strip via -o extraction
SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_ONLY="$ONLY" \
  sbt -batch "runMain graft.Bench" 2>&1 \
  | tee /tmp/bench_sbt.log | grep -oE '\{"(metric|queries)".*\}' | tail -1 > "$OUT"
cat "$OUT"
