#!/usr/bin/env bash
# Round-5 ladder 3: transient-discovery penalty (the unabsorbable lever).
#
# Ladder 1 (cost-side: prior ramp / logit shift) — negative: saturated
# logits pass no gradient.  Ladder 2 (desaturation +/- prior ramp) —
# negative: the posterior re-inflates raw logits ~6x to cancel the scale,
# and the learned conditional cat prior absorbs any fixed t=0 ramp.
# Ladder 3 charges q's own expected early counts in excess of the
# sequence's propagation-stabilised count (models/model.py
# transient_penalty): monotone in the presence probabilities, so
# re-inflation RAISES the cost; paired with logit scale 0.15 so the
# sigmoid path has gradient at the measured raw-logit population.
#
# Fork from curriculum ckpt-698000 (raw logits 10-45 -> effective
# 1.5-6.75 under the scale: the stochastic region), NOT from the
# re-inflated ladder-2 endpoint.
set -u
cd "$(dirname "$0")/.."

SRC=play_results/curriculum_1m_b256/2
CKPT=ckpt-698000

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
    --train_itr 722000 --log_itr 6000 --save_itr 24000 --fig_itr 24000 \
    --report_loss_every 1000 \
    "$@" >"/tmp/${name}.log" 2>&1
  echo "=== $name exit: $? ==="
}

run "tp10_scale015" --early_disc_logit_scale 0.15 --transient_disc_penalty 10
run "tp50_scale015" --early_disc_logit_scale 0.15 --transient_disc_penalty 50
echo "=== tp ladder complete ==="
