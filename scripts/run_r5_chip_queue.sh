#!/bin/bash
# Round-5 chip work queue: the round's chip-gated deliverables in priority
# order.  Each stage logs under /tmp/r5queue and is skippable by sentinel,
# so a worker crash or round clock costs one stage, not the queue.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p /tmp/r5queue

log() { echo "[r5queue $(date +%H:%M:%S)] $*" | tee -a /tmp/r5queue/queue.log; }

# 0. wait for the backend
until timeout 200 python -c "import jax; assert jax.devices()" 2>/dev/null; do
  log "axon backend still down; sleeping 120s"
  sleep 120
done
log "backend up"

# 1. train-step attend-form A/B (XLA vs bd_q vs bd_kv/auto)
if [ ! -f /tmp/r5queue/trainab.done ]; then
  log "stage 1: train-step attend-form A/B"
  timeout 1800 python scripts/bench_train_step.py \
      > /tmp/r5queue/trainab.log 2>&1 && touch /tmp/r5queue/trainab.done
  log "stage 1 rc=$? (log /tmp/r5queue/trainab.log)"
fi

# 2. framewise FST/FB sweeps through the rank-mask engine (resumable)
if [ ! -f /tmp/r5queue/framewise.done ]; then
  log "stage 2: framewise cycle (rank-mask engine)"
  timeout 7200 python scripts/run_framewise_cycle.py \
      > /tmp/r5queue/framewise.log 2>&1 \
    && touch /tmp/r5queue/framewise.done
  log "stage 2 rc=$? (log /tmp/r5queue/framewise.log)"
fi

# 3. converged train-from-scratch round-trip (longest last)
if [ ! -f /tmp/r5queue/roundtrip.done ]; then
  log "stage 3: roundtrip train (300 epochs) + verify"
  timeout 9000 python scripts/train_export_roundtrip.py train --epochs 300 \
      > /tmp/r5queue/roundtrip_train.log 2>&1 \
    && timeout 3600 python scripts/train_export_roundtrip.py verify \
         --max-frames 8192 --report /tmp/r5queue/roundtrip_report.json \
         > /tmp/r5queue/roundtrip_verify.log 2>&1 \
    && touch /tmp/r5queue/roundtrip.done
  log "stage 3 rc=$? (logs /tmp/r5queue/roundtrip_*.log)"
fi

log "queue complete"
