# Round-4 chip-time priority queue (VERDICT r3 "Next round" 1-4).
# NOT meant to run unattended end-to-end: execute the numbered blocks in
# order, checking each result, and free the chip ~45 min before round end
# (driver wrap-up protocol, docs/NOTES.md).  All long runs: launch with
# run_in_background + generous timeouts; the host has ONE core, so never
# overlap two compile-heavy jobs.

set -euo pipefail
cd "$(dirname "$0")/.."

# ---------------------------------------------------------------- 1. bench
# The CHAIN=10 program has never compiled on TPU (VERDICT r3 weak #1):
# validate it FIRST.  Expected >=20,000 f/s/chip.  If the chained compile
# misbehaves over the tunnel: SQAIR_BENCH_CHAIN=1 python bench.py, and
# record why in docs/NOTES.md.
# python bench.py

# ------------------------------------------------- 2. finish BASELINE cfg 3
# Resume the 1M curriculum from ckpt-450000 (T=7; stages T=8/9/10 at
# 500k/600k/700k... boundaries; ~2-3h chip).  flags.json restores the
# recipe; CLI wins for the additions.  steps_per_call=10 divides every
# cadence (report 2000 / log 25000 / save 50000 / stage 100000) and the
# resumed step.  NOTE round-2 wedge happened during the T=8 stage
# recompile: if the tunnel dies here, note the time and fall back to the
# watcher.
# python -m sqair_tpu.scripts.experiment \
#   --results_dir play_results --run_name curriculum_1m_b256 --resume \
#   --data_config sqair_tpu/configs/font_seq_mnist_data.py \
#   --model_config sqair_tpu/configs/mlp_mnist_model.py \
#   --on_device_data --steps_per_call 10
# Then (CPU, chip stays free): eval sweep + promote
# SQAIR_PLATFORM=cpu python -m sqair_tpu.scripts.eval \
#   --checkpoint_dir play_results/curriculum_1m_b256/2 \
#   --data_config sqair_tpu/configs/font_seq_mnist_data.py \
#   --model_config sqair_tpu/configs/mlp_mnist_model.py
# python tools/promote_release.py --run_dir play_results/curriculum_1m_b256/2 \
#   --out release_models/mnist_mlp/1 --step 1000000

# ------------------------------------------- 3. conv aspect-penalty ladder
# Round-2 tracking recipe (conv_r2b: prop 8 / disc 1 / kernel 5 / std .1)
# + the penalty at sub-binding / binding / dominating weights.  CPU eval
# of the round-2 checkpoints (docs/NOTES.md round-4): the sliver regime
# measures aspect = 0.79, the merged-box regime 0.10, and the CPU
# mechanism sweep showed binding starts when penalty*aspect reaches a few
# nats — so 1/10/50 (0.8 / 8 / 40 nats initially) spans the range.
# Watch `aspect` + count accuracy + the stable-ID figures.
# for P in 1 10 50; do
#   python -m sqair_tpu.scripts.experiment \
#     --data_config sqair_tpu/configs/font_seq_mnist_data.py \
#     --model_config sqair_tpu/configs/conv_mnist_model.py \
#     --results_dir play_results --run_name conv_aspect_p$P \
#     --seq_len 3 --stage_itr 4000 --train_itr 24000 \
#     --prop_step_bias 8 --disc_step_bias 1 --conv_kernel 5 --output_std 0.1 \
#     --aspect_penalty $P --on_device_data \
#     --report_loss_every 500 --log_itr 4000 --fig_itr 4000 --save_itr 8000
# done

# ------------------------------------------------- 4. bank-512 probe ladder
# docs/NOTES.md round-3 ladder: base / likelihood temperature / geometric
# prior / no disc eagerness.  ~40k iters each ranks the knobs.
# COMMON="--data_config sqair_tpu/configs/font_seq_mnist_data.py \
#   --model_config sqair_tpu/configs/mlp_mnist_model.py \
#   --results_dir play_results --font_bank_size 512 --font_train_samples 16384 \
#   --seq_len 3 --stage_itr 8000 --train_itr 40000 --on_device_data \
#   --report_loss_every 1000 --log_itr 8000 --fig_itr 8000 --save_itr 40000"
# python -m sqair_tpu.scripts.experiment $COMMON --run_name b512_base
# python -m sqair_tpu.scripts.experiment $COMMON --run_name b512_std03 --output_std 0.3
# python -m sqair_tpu.scripts.experiment $COMMON --run_name b512_geom --disc_prior_type geom --step_success_prob 0.5
# python -m sqair_tpu.scripts.experiment $COMMON --run_name b512_bias0 --disc_step_bias 0
