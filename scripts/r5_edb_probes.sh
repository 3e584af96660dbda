#!/usr/bin/env bash
# Round-5 early-frame discovery probe ladder (VERDICT r4 #1).
#
# The 0.8746 plateau is entirely t<=1 over-discovery (per-t eval at 698k:
# acc [0.37 0.39 0.99 1.0 ...], counts [1.55 1.53 0.93 0.92 ...]) and the
# spurious boxes have SATURATED posterior logits (an eval-time logit tilt
# of -1 flips zero samples), so the fix must be trained in.  Fork the
# curriculum at ckpt-698000 and train 24k iters (crossing into the T=10
# stage at 700k) under each lever:
#   edb_prior1 — early_disc_step_bias 1 (#steps-prior ramp, t<2)
#   edb_prior3 — early_disc_step_bias 3 (stronger prior cost)
#   edb_logit2 — early_disc_logit_bias 2 (posterior-side threshold shift)
# Winner = largest t<=1 accuracy gain at ~equal IWAE; it then continues to 1M.
set -u
cd "$(dirname "$0")/.."

SRC=play_results/curriculum_1m_b256/2
CKPT=ckpt-698000

# wait for the chip to free up (conv probe may still be running)
while ps -ef | grep -v grep | grep -q "sqair_tpu.scripts.experiment"; do
  sleep 20
done

fork() {
  name=$1
  rm -rf "play_results/$name"
  mkdir -p "play_results/$name/1"
  cp "$SRC/flags.json" "play_results/$name/1/"
  cp -r "$SRC/$CKPT" "play_results/$name/1/"
}

run() {
  name=$1; shift
  fork "$name"
  echo "=== $name: $* ==="
  timeout 2400 python -m sqair_tpu.scripts.experiment \
    --results_dir play_results --run_name "$name" --resume \
    --train_itr 722000 --log_itr 8000 --save_itr 24000 --fig_itr 24000 \
    --report_loss_every 1000 \
    "$@" >"/tmp/${name}.log" 2>&1
  echo "=== $name exit: $? ==="
}

run "edb_prior1" --early_disc_step_bias 1
run "edb_prior3" --early_disc_step_bias 3
run "edb_logit2" --early_disc_logit_bias 2
echo "=== edb ladder complete ==="
