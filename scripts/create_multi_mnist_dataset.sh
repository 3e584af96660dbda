#!/usr/bin/env bash
# Dataset creation (reference: scripts/create_multi_mnist_dataset.sh).
cd "$(dirname "$0")/.."
python -m sqair_tpu.scripts.create_seq_mnist "$@"
