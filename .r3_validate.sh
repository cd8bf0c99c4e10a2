#!/bin/bash
# Round-3 validation chain: waits for the TPU tunnel to recover, then runs
# the focused tests for this round's perf changes, the e2e suites, the
# mapping profiler, and the bench. All output -> .r3_validate.log.
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*" >> .r3_validate.log; }
log "=== validation chain start ==="
for i in $(seq 1 200); do
  if timeout 90 python -c "import jax, jax.numpy as jnp; print('TPU-OK', float((jnp.ones(8)*2).sum()))" 2>/dev/null | grep -q TPU-OK; then
    log "TPU recovered (attempt $i)"
    break
  fi
  sleep 55
done
log "--- stage 1: focused tests (orb/ba/maintenance) ---"
timeout 1200 python -m pytest tests/test_orb.py tests/test_ba.py tests/test_map_maintenance.py -q >> .r3_validate.log 2>&1
log "stage 1 rc=$?"
log "--- stage 2: e2e mono + rgbd ---"
timeout 1800 python -m pytest tests/test_e2e_mono.py tests/test_e2e_rgbd.py -q >> .r3_validate.log 2>&1
log "stage 2 rc=$?"
log "--- stage 3: mapping profile ---"
timeout 900 python .prof_map2.py >> .r3_validate.log 2>&1
log "stage 3 rc=$?"
log "--- stage 4: bench ---"
timeout 900 python bench.py >> .r3_validate.log 2>&1
log "stage 4 rc=$?"
log "=== validation chain done ==="
