#!/usr/bin/env bash
# Reference parity: scripts/download_models.sh fetched released checkpoints
# from Google Drive. This build environment has no network access and no
# released checkpoints yet; train an equivalent model locally instead:
#
#   bash scripts/train_multi_mnist.sh
#
# or produce a quick exploratory checkpoint:
#
#   python notebooks/play.py --quick_train
echo "No released checkpoints to download in this environment." >&2
echo "Train one with: bash scripts/train_multi_mnist.sh" >&2
exit 1
