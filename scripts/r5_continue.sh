#!/usr/bin/env bash
# Round-5 continuation: take the winning transient-penalty probe to 1M.
# Usage: r5_continue.sh <run_name>   (lever flags persist via the run's
# re-saved flags.json — no re-specification needed)
set -u
cd "$(dirname "$0")/.."
name=${1:?run name}
while ps -ef | grep -v grep | grep -q "sqair_tpu.scripts.experiment"; do
  sleep 10
done
echo "=== continue $name -> 1M ==="
timeout 18000 python -m sqair_tpu.scripts.experiment \
  --results_dir play_results --run_name "$name" --resume \
  --train_itr 1000000 --log_itr 10000 --save_itr 50000 --fig_itr 100000 \
  --report_loss_every 1000 >>"/tmp/${name}_cont.log" 2>&1
echo "=== $name continuation exit: $? ==="
