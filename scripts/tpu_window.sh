#!/bin/bash
# Everything queued for the next healthy-TPU window, in priority order.
# Each stage is independently resumable; logs land in /tmp/tpu_window/.
# Usage: bash scripts/tpu_window.sh [stage...]   (default: all)
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/tpu_window
cd /root/repo

probe() {
  timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

stage_bench() {  # BENCH_r03 headline (512^2 parity grid)
  timeout 1800 python bench.py 2>&1 | tee /tmp/tpu_window/bench.log
}

stage_quality() {  # cross-method table; labels pre-generated on CPU
  timeout 5400 python scripts/quality_evidence.py --skip-labels \
    --lr 1.2e-4 --lr-step 30 --epochs 120 \
    2>&1 | tee /tmp/tpu_window/quality.log
}

stage_ab() {  # kernel A/Bs queued in TODO.md (VPU argmin, NN tile, max-bwd)
  for rt in 256 512 1024; do
    HIMO_NN_RT=$rt timeout 1200 python scripts/kernel_bench.py \
      2>&1 | tee -a /tmp/tpu_window/ab.log || true
  done
  HIMO_MAXBWD_PALLAS=1 timeout 1200 python scripts/kernel_bench.py \
    2>&1 | tee -a /tmp/tpu_window/ab.log || true
}

if ! probe; then
  echo "TPU unreachable; aborting" >&2
  exit 1
fi
for s in "${@:-bench quality ab}"; do
  "stage_$s"
done
