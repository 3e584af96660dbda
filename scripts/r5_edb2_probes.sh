#!/usr/bin/env bash
# Round-5 desaturation probe ladder (second early-frame ladder).
#
# Ladder 1 (r5_edb_probes.sh) was a clean 3-point NEGATIVE: prior ramps
# (early_disc_step_bias 1/3) and a posterior logit shift
# (early_disc_logit_bias 2) all changed the target but not one sample in
# 24k iters — the spurious t<=1 presence logits sit at 10-45
# (tools/diag_presence_logits.py), where Bernoulli samples have zero
# particle variance, VIMCO passes no score gradient, and sigmoid' ~ 1e-10
# kills the pathwise term.  Cost-side levers cannot reach saturated
# samples.
#
# Ladder 2 attacks the saturation itself (new levers in
# models/discover.py / nn/stochastic.py):
#   edb_scale015        — early_disc_logit_scale 0.15: multiplies q's t<2
#                         presence logit, mapping 10-45 onto 1.5-6.75 where
#                         sampling is stochastic and VIMCO sees variance.
#   edb_clamp3          — early_disc_logit_clamp 3: straight-through |cap|;
#                         forward desaturates, backward passes the full
#                         gradient to the raw logits.
#   edb_scale015_prior1 — desaturation + the #steps prior ramp: once
#                         samples vary, the prior-side cost (dead alone in
#                         ladder 1) has something to push against.
#   edb_clamp3_prior1   — same pressure pairing for the clamp.
# Winner = largest drop in t<=1 counts (1.55 -> ~0.93) / rise in t<=1
# accuracy at ~equal IWAE; it continues 722k -> 1M.
set -u
cd "$(dirname "$0")/.."

SRC=play_results/curriculum_1m_b256/2
CKPT=ckpt-698000

# wait for the chip to free up (b512_horizon may still be running)
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

run "edb_scale015" --early_disc_logit_scale 0.15
run "edb_clamp3" --early_disc_logit_clamp 3
run "edb_scale015_prior1" --early_disc_logit_scale 0.15 --early_disc_step_bias 1
run "edb_clamp3_prior1" --early_disc_logit_clamp 3 --early_disc_step_bias 1
echo "=== edb2 ladder complete ==="
