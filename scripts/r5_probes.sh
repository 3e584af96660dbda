#!/usr/bin/env bash
# Round-5 chip probes (VERDICT r4 #4, #5):
#  1. conv_p1_bias05 — the knife-edge midpoint the round-4 ladder skipped:
#     aspect_penalty 1 (repairs geometry, keeps tracking) + disc_step_bias
#     0.5 (between the over-discovery regime at 1 and the trivial-count
#     collapse at 0).  24k iters, ~10 min chip.
#  2. b512_horizon — the last untested bank-512 lever: horizon.  Same
#     curriculum recipe as the bank-256 run that crossed 0.37->0.66 only
#     after ~150k iters (stage_itr 100k, font_train_samples 16384,
#     output_std 0.15), run to 300k so the crossing window is covered.
#     ~35 min chip at measured per-stage rates.
set -u
cd "$(dirname "$0")/.."

COMMON=(--results_dir play_results
  --data_config sqair_tpu/configs/font_seq_mnist_data.py
  --on_device_data --steps_per_call 10 --eval_on_train=False
  --report_loss_every 1000)

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 4000 python -m sqair_tpu.scripts.experiment "${COMMON[@]}" \
    --run_name "$name" "$@" >"/tmp/${name}.log" 2>&1
  echo "=== $name exit: $? ==="
}

CONV=(--model_config sqair_tpu/configs/conv_mnist_model.py
  --seq_len 3 --stage_itr 8000 --train_itr 24000
  --save_itr 8000 --fig_itr 8000 --log_itr 8000
  --font_train_samples 2048
  --prop_step_bias 8 --disc_step_bias 0.5 --conv_kernel 5 --output_std 0.1
  --aspect_penalty 1)
run "conv_p1_bias05" "${CONV[@]}"

B512=(--model_config sqair_tpu/configs/mlp_mnist_model.py
  --seq_len 3 --stage_itr 100000 --train_itr 300000
  --save_itr 50000 --fig_itr 50000 --log_itr 25000
  --font_bank_size 512 --font_train_samples 16384 --output_std 0.15)
run "b512_horizon" "${B512[@]}"
echo "=== r5 probes complete ==="
