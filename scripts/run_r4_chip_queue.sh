#!/bin/bash
# Round-4 chip work queue: runs the chip-gated deliverables in priority
# order once the axon backend is reachable.  Each stage logs to its own
# file under /tmp/r4queue and is individually skippable by sentinel.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p /tmp/r4queue

log() { echo "[r4queue $(date +%H:%M:%S)] $*" | tee -a /tmp/r4queue/queue.log; }

# 0. wait for the backend
until timeout 200 python -c "import jax; assert jax.devices()" 2>/dev/null; do
  log "axon backend still down; sleeping 120s"
  sleep 120
done
log "backend up"

# 1. temporal eval cycle (resumable — skips finished JSONs)
if [ ! -f /tmp/r4queue/temporal.done ]; then
  log "stage 1: temporal cycle"
  timeout 5400 python scripts/run_temporal_cycle.py \
      > /tmp/r4queue/temporal.log 2>&1 \
    && touch /tmp/r4queue/temporal.done
  log "stage 1 rc=$? (log /tmp/r4queue/temporal.log)"
fi

# 2. e2e composition probe (the unattributed ~44 ms)
if [ ! -f /tmp/r4queue/probe.done ]; then
  log "stage 2: e2e composition probe"
  timeout 1800 python scripts/probe_e2e_composition.py \
      > /tmp/r4queue/probe.log 2>&1 && touch /tmp/r4queue/probe.done
  log "stage 2 rc=$? (log /tmp/r4queue/probe.log)"
fi

# 3. bench A/B: default vs st_block_b=32, then canonical run
if [ ! -f /tmp/r4queue/bench.done ]; then
  log "stage 3: bench block_b A/B + canonical"
  { echo "--- default block_b"; timeout 1200 python bench.py;
    echo "--- st_block_b=32"; PCAUDIO_BENCH_ST_BLOCK_B=32 timeout 1200 python bench.py;
  } > /tmp/r4queue/bench.log 2>&1 && touch /tmp/r4queue/bench.done
  log "stage 3 rc=$? (log /tmp/r4queue/bench.log)"
fi

# 4. train-step A/B: XLA vs bd_q vs bd_kv(auto)
if [ ! -f /tmp/r4queue/trainab.done ]; then
  log "stage 4: train-step attend-form A/B"
  timeout 1800 python scripts/bench_train_step.py \
      > /tmp/r4queue/trainab.log 2>&1 && touch /tmp/r4queue/trainab.done
  log "stage 4 rc=$? (log /tmp/r4queue/trainab.log)"
fi

# 5. converged train-from-scratch (long; last so earlier stages own the chip)
if [ ! -f /tmp/r4queue/roundtrip.done ]; then
  log "stage 5: roundtrip train (150 epochs)"
  timeout 7200 python scripts/train_export_roundtrip.py train --epochs 150 \
      > /tmp/r4queue/roundtrip_train.log 2>&1 \
    && timeout 3600 python scripts/train_export_roundtrip.py verify \
         --max-frames 8192 --report /tmp/r4queue/roundtrip_report.json \
         > /tmp/r4queue/roundtrip_verify.log 2>&1 \
    && touch /tmp/r4queue/roundtrip.done
  log "stage 5 rc=$? (logs /tmp/r4queue/roundtrip_*.log)"
fi

log "queue complete"
