#!/bin/bash
# Round-3 second measurement battery (after stages512b + bf16_512):
# per-stage numbers at 256^3 for the 512^3 gap attribution, the
# 256^3 deep-fuse solver sweep (VERDICT r2 item 7), and the SPH
# z-band-skip A/B that decides the pallas_z_skip default.
set -u
LOG=${1:-/tmp/probes_r3b.log}
exec > >(tee -a "$LOG") 2>&1

run() {
  name=$1; shift
  echo ""
  echo "=== $(date -u) START $name ==="
  timeout 3000 "$@"
  echo "=== $(date -u) END $name (rc=$?) ==="
}

cd /root/repo
run stages512b python verify/bench_stages512b.py
run sph_zskip python verify/bench_sph_zskip_ab.py
run stages256 python verify/bench_stages256.py
run stages512c python verify/bench_stages512c.py
run rb256_deep python verify/bench_rb256_deep.py
run bf16_512 python verify/bench_bf16_512.py
echo "=== $(date -u) R3B BATTERY COMPLETE ==="
