#!/usr/bin/env bash
# Round-9 measurement sequence (VERDICT r8 asks #1-#4), serialized —
# one Spark JVM at a time per the measurement protocol (a concurrent
# sbt/bench run contaminates the timed windows; see README).
set -uo pipefail
cd "$(dirname "$0")/.."
log() { echo "[r9] $(date -u +%H:%M:%S) $*"; }

# 1. q116 solo sf0.1 re-measurement (VERDICT #2) — Bench-matching
#    config: default 8g heap, 32 shuffle partitions
log "q116 solo sf0.1 (bench config)"
SPARK_DRIVER_MEM=8g tools/run.sh graft.tools.TimeQuery \
  /root/testdata/sf0.1 q116_simhash_combos 5 \
  > /tmp/r9_q116_solo.log 2>&1
log "q116 done rc=$?"

# 2. STREAM_r09 longrun (VERDICT #3): nocompact / inband / async legs
log "stream longrun (3 legs x 120 batches)"
SPARK_DRIVER_MEM=24g tools/run.sh graft.tools.StreamBench \
  longrun 2000 120 20 \
  > /tmp/r9_stream.log 2>&1
log "stream done rc=$?"
cp streambench_longrun_out.json STREAM_r09.json 2>/dev/null

# 3. q35 per-stage decomposition g30 vs g100 (VERDICT #1b) at scaled
#    resources (48g heap, 512 parts — the width/heap protocol)
log "q35 stage ladder g30"
SPARK_DRIVER_MEM=48g SPARK_GRAFT_SHUFFLE_PARTS=512 tools/run.sh \
  graft.tools.TimeQuery scaledata/g30 \
  q35_shingles,q35_sigs,q35_bands,q35_lsh,q35_minhash_lsh 3 \
  > /tmp/r9_q35stages_g30.log 2>&1
log "q35 stage ladder g100"
SPARK_DRIVER_MEM=48g SPARK_GRAFT_SHUFFLE_PARTS=512 tools/run.sh \
  graft.tools.TimeQuery scaledata/g100 \
  q35_shingles,q35_sigs,q35_bands,q35_lsh,q35_minhash_lsh 2 \
  > /tmp/r9_q35stages_g100.log 2>&1
log "q35 stages done rc=$?"

# 4. Calm 48g/512-part ScaleBench leg g30->g100: q35 (VERDICT #1a)
#    + q97 (VERDICT #4 re-leg)
log "scalebench g30->g100 q35,q97 at 48g/512"
SPARK_DRIVER_MEM=48g SPARK_GRAFT_SHUFFLE_PARTS=512 tools/run.sh \
  graft.tools.ScaleBench scaledata/g30 scaledata/g100 3.3333 \
  BENCH_SCALE_r09_g100fam.json q35_minhash_lsh,q97_prefix_join \
  > /tmp/r9_scale_g100.log 2>&1
log "scalebench done rc=$?"
log "sequence complete"
