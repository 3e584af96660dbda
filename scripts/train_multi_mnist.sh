#!/usr/bin/env bash
# Curriculum training recipe (reference: scripts/train_multi_mnist.sh).
cd "$(dirname "$0")/.."

python -m sqair_tpu.scripts.experiment\
    --results_dir results\
    --run_name multi_mnist\
    --data_config sqair_tpu/configs/seq_mnist_data.py\
    --model_config sqair_tpu/configs/mlp_mnist_model.py\
    --seq_len 3\
    --stage_itr 100000\
    --train_itr 1000000
