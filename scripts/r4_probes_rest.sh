#!/usr/bin/env bash
# Remaining round-4 chip probes after the 2026-08-19 session restart:
#  1. conv_p1_bias0 — the informative next conv-ladder point (NOTES round-4:
#     aspect penalty 1 fixed glimpse geometry + kept tracking alive, but
#     over-discovery persisted -> attack the count side with disc_step_bias 0).
#  2. b512_geom / b512_bias0 — the two missing bank-512 over-counting probes
#     (VERDICT r3 #4; base + std03 already measured, both negative).
# Each ~24k iters, T=3..5 staged; ~8-10 min chip each at measured rates.
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

CONV="--model_config sqair_tpu/configs/conv_mnist_model.py
  --seq_len 3 --stage_itr 8000 --train_itr 24000
  --save_itr 8000 --fig_itr 8000 --log_itr 8000
  --font_train_samples 2048
  --prop_step_bias 8 --disc_step_bias 0 --conv_kernel 5 --output_std 0.1
  --aspect_penalty 1"
run "conv_p1_bias0" $CONV

B512="--model_config sqair_tpu/configs/mlp_mnist_model.py
  --seq_len 3 --stage_itr 8000 --train_itr 24000
  --save_itr 8000 --fig_itr 8000 --log_itr 8000
  --font_bank_size 512 --font_train_samples 8192 --output_std 0.15"
run "b512_geom"  $B512 --disc_prior_type geom --step_success_prob 0.5
run "b512_bias0" $B512 --disc_step_bias 0
echo "=== r4 probes rest complete ==="
