#!/bin/bash
# Round-3 pending TPU measurement battery.  Waits for the axon tunnel,
# then runs the probes this round needs, logging to $LOG.
set -u
LOG=${1:-/tmp/probes_r3.log}
exec > >(tee -a "$LOG") 2>&1

echo "=== $(date -u) waiting for tunnel ==="
for i in $(seq 1 400); do
  if timeout 100 python -c "import jax; jax.devices()" 2>/dev/null; then
    echo "=== $(date -u) tunnel UP (attempt $i) ==="
    break
  fi
  sleep 60
done

run() {
  name=$1; shift
  echo ""
  echo "=== $(date -u) START $name ==="
  timeout 3000 "$@"
  echo "=== $(date -u) END $name (rc=$?) ==="
}

cd /root/repo
run check_merge_pallas python verify/check_merge_pallas_tpu.py
run bench_sph_bigpool_parts python verify/bench_sph_bigpool_parts.py
run bench_sph_hchunk_ab python verify/bench_sph_hchunk_ab.py
echo "=== $(date -u) R3 EARLY BATTERY COMPLETE ==="
