#!/usr/bin/env bash
# Round-4 chip-time ladders (VERDICT r3 #3, #4), run back-to-back after
# the 1M curriculum run frees the chip.
#
#  - conv aspect-penalty ladder: the round-2 tracking recipe
#    (prop 8 / disc 1 / kernel 5 / std 0.1) over-segments glyphs into
#    vertical slivers (aspect 0.79, acc 0.39).  Sweep --aspect_penalty
#    {1,10,50}: penalty*aspect of a few nats is where the CPU mechanism
#    sweep showed the regulariser starts to bind (docs/NOTES.md).
#  - bank-512 probe ladder: four knobs against the phantom-box
#    over-counting on the harder bank-512 dataset (docs/NOTES.md round-2;
#    knob list corrected round-3 — step_success_prob binds only under
#    the geometric discovery prior).
set -u
cd "$(dirname "$0")/.."

COMMON="--results_dir play_results
  --data_config sqair_tpu/configs/font_seq_mnist_data.py
  --on_device_data --steps_per_call 10 --eval_on_train=False
  --report_loss_every 1000"

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 3600 python -m sqair_tpu.scripts.experiment $COMMON \
    --run_name "$name" "$@" >"/tmp/${name}.log" 2>&1
  echo "=== $name exit: $? ==="
}

# --- conv aspect-penalty ladder (tracking recipe; 24k iters, 8k stages
# reach T=5; figures every 8k show whether IDs persist) ---
CONV="--model_config sqair_tpu/configs/conv_mnist_model.py
  --seq_len 3 --stage_itr 8000 --train_itr 24000
  --save_itr 8000 --fig_itr 8000 --log_itr 8000
  --prop_step_bias 8 --disc_step_bias 1 --conv_kernel 5 --output_std 0.1"
for p in 1 10 50; do
  run "conv_aspect_p${p}" $CONV --aspect_penalty "$p"
done

# --- bank-512 over-counting probe ladder (mlp recipe; 40k iters, fast
# 8k curriculum reaches T=8) ---
B512="--model_config sqair_tpu/configs/mlp_mnist_model.py
  --seq_len 3 --stage_itr 8000 --train_itr 40000
  --save_itr 8000 --fig_itr 8000 --log_itr 8000
  --font_bank_size 512 --font_train_samples 8192 --output_std 0.15"
run "b512_base"  $B512
run "b512_std03" $B512 --output_std 0.3
run "b512_geom"  $B512 --disc_prior_type geom --step_success_prob 0.5
run "b512_bias0" $B512 --disc_step_bias 0
