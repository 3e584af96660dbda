#!/usr/bin/env bash
# Does the transient-discovery penalty generalise across dataset families?
# b512_horizon's residual error carries the SAME early-frame over-discovery
# signature as the headline run (per-t counts 1.211 / acc 0.711 flat for
# t<3, stabilising at 0.949 from t=3) — but its transient window is one
# frame longer, so the anchor moves to t=3 (--early_disc_horizon 3).
# Fork ckpt-200000 (0.797 valid) and apply the headline winner recipe.
set -u
cd "$(dirname "$0")/.."

SRC=play_results/b512_horizon/1
name=b512_tp400
while ps -ef | grep -v grep | grep -q "sqair_tpu.scripts.experiment"; do
  sleep 10
done
rm -rf "play_results/$name"
mkdir -p "play_results/$name/1"
cp "$SRC/flags.json" "play_results/$name/1/"
cp -r "$SRC/ckpt-200000" "play_results/$name/1/"
echo "=== $name ==="
timeout 2400 python -m sqair_tpu.scripts.experiment \
  --results_dir play_results --run_name "$name" --resume \
  --train_itr 224000 --log_itr 6000 --save_itr 24000 --fig_itr 24000 \
  --report_loss_every 1000 \
  --early_disc_horizon 3 --early_disc_logit_scale 0.15 \
  --transient_disc_penalty 400 >"/tmp/${name}.log" 2>&1
echo "=== $name exit: $? ==="
