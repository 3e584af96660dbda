#!/usr/bin/env bash
# Remaining bank-512 probes at 24k iters (T=3..5): enough to rank the
# over-counting knobs (round-2's over-counting diagnosis was visible by
# 16k) while leaving chip time for the 1M curriculum.  b512_base was
# graceful-stopped at its 24k eval for a like-for-like comparison.
set -u
cd "$(dirname "$0")/.."

COMMON="--results_dir play_results
  --data_config sqair_tpu/configs/font_seq_mnist_data.py
  --on_device_data --steps_per_call 10 --eval_on_train=False
  --report_loss_every 1000"

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 2400 python -m sqair_tpu.scripts.experiment $COMMON \
    --run_name "$name" "$@" >"/tmp/${name}.log" 2>&1
  echo "=== $name exit: $? ==="
}

B512="--model_config sqair_tpu/configs/mlp_mnist_model.py
  --seq_len 3 --stage_itr 8000 --train_itr 24000
  --save_itr 8000 --fig_itr 8000 --log_itr 8000
  --font_bank_size 512 --font_train_samples 8192 --output_std 0.15"
run "b512_std03" $B512 --output_std 0.3
run "b512_geom"  $B512 --disc_prior_type geom --step_success_prob 0.5
run "b512_bias0" $B512 --disc_step_bias 0
echo "=== b512 rest complete ==="
