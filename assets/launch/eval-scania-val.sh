#!/bin/bash
# Scania val pipeline: flow inference -> submission zip -> local metrics
# (the reference's README.md:36-95 end-to-end loop).
set -euo pipefail
DATA_DIR=${1:?usage: eval-scania-val.sh SCANIA_VAL_DIR [METHOD]}
METHOD=${2:-seflowpp_best}

python -m himo_tpu.cli.save_zip data_dir="$DATA_DIR" res_name="$METHOD"
python -m himo_tpu.cli.eval data_dir="$DATA_DIR" res_name="$METHOD"

# Optional: GT archive + leaderboard-style scoring of the produced zip.
python -m himo_tpu.cli.save_zip_gt data_dir="$DATA_DIR" output_dir="$DATA_DIR/gt_zip" res_name=flow
python -m himo_tpu.cli.score \
    --gt_zip "$DATA_DIR/gt_zip/flow-submit.zip" \
    --pred_zip "$DATA_DIR/results/$METHOD-submit.zip" \
    --output_dir "$DATA_DIR/scores"
