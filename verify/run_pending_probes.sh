#!/bin/bash
# Round-2 pending TPU measurement battery.  Waits for the axon tunnel,
# then runs every probe blocked by the outage, logging to stdout (run
# under `tee` or a task runner).  Each probe is individually bounded;
# a flaky tunnel mid-battery skips the probe rather than killing the
# run.
set -u
LOG=${1:-/tmp/probes_r2.log}
exec > >(tee -a "$LOG") 2>&1

echo "=== $(date -u) waiting for tunnel ==="
for i in $(seq 1 300); do
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
  timeout 2400 "$@"
  echo "=== $(date -u) END $name (rc=$?) ==="
}

cd /root/repo
run bench_whole_solve python verify/bench_whole_solve.py
run bench_zg_resident python verify/bench_zg_resident.py 64 128 256
run bench_configs python verify/bench_configs.py
run bench_rb512_plans python verify/bench_rb512_plans.py
run bench_forcing512 python verify/bench_forcing512.py
run bench_sph_scaling_ab python verify/bench_sph_scaling_ab.py
run bench python bench.py
run bench512 python bench.py --size=512
echo "=== $(date -u) BATTERY COMPLETE ==="
