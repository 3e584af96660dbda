#!/usr/bin/env bash
# Round-5 architectural-lever fine-tune: the explained-so-far coverage
# signal (tests/test_coverage_signal.py), warm-started function-preserving
# from the 1M release state via tools/pad_coverage_params.py.
# 30k iters at T=10 under the release run's own flags (transient penalty
# 400 stays on — the pressure the new architecture can now act on).
set -u
cd "$(dirname "$0")/.."
while ps -ef | grep -v grep | grep -q "sqair_tpu.scripts.experiment"; do
  sleep 10
done
echo "=== cov_ft 1000000 -> 1030000 ==="
timeout 14000 python -m sqair_tpu.scripts.experiment \
  --results_dir play_results --run_name cov_ft --resume \
  --disc_coverage_signal \
  --train_itr 1030000 --log_itr 2000 --save_itr 10000 --fig_itr 10000 \
  --report_loss_every 1000 >>/tmp/cov_ft.log 2>&1
echo "=== cov_ft exit: $? ==="
