"""Dataset creation script.

Reference: sqair/data/create_seq_mnist.py — creates train/validation
moving-digit pickles.  Uses real MNIST idx files if present in
data/MNIST_data, otherwise synthetic stroke templates.

Run: python -m sqair_tpu.scripts.create_seq_mnist [--n_train N] [--n_valid N]
"""
from __future__ import annotations

import argparse
import gzip
import os

import numpy as np

from sqair_tpu.data import create_seq_dataset, make_template_bank, save_pickle

_DATA_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "data", "MNIST_data")


def load_mnist_idx(data_dir: str, partition: str):
    """Loads raw MNIST idx(.gz) files if the user provides them."""
    prefix = "train" if partition == "train" else "t10k"
    img_path = None
    for candidate in (f"{prefix}-images-idx3-ubyte.gz", f"{prefix}-images-idx3-ubyte"):
        p = os.path.join(data_dir, candidate)
        if os.path.exists(p):
            img_path = p
            break
    if img_path is None:
        return None
    opener = gzip.open if img_path.endswith(".gz") else open
    with opener(img_path, "rb") as f:
        data = f.read()
    assert int.from_bytes(data[:4], "big") == 2051
    n = int.from_bytes(data[4:8], "big")
    imgs = np.frombuffer(data[16:], np.uint8).reshape(n, 28, 28)
    return imgs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_train", type=int, default=60000)
    p.add_argument("--n_valid", type=int, default=10000)
    p.add_argument("--n_timesteps", type=int, default=10)
    p.add_argument("--canvas", type=int, default=50)
    p.add_argument("--obj_size", type=int, default=28)
    p.add_argument("--name", default="seq_mnist")
    p.add_argument("--out_dir", default=_DATA_DIR)
    args = p.parse_args()

    for partition, n in (("train", args.n_train), ("validation", args.n_valid)):
        print(f'Processing partition "{partition}"')
        templates = load_mnist_idx(args.out_dir, partition)
        if templates is None:
            print("  no MNIST idx files found -> synthetic stroke templates")
            seed = 0 if partition == "train" else 1
            templates = make_template_bank(max(1024, n // 8), args.obj_size, seed)
        data = create_seq_dataset(
            n_samples=n, n_timesteps=args.n_timesteps,
            canvas_size=(args.canvas, args.canvas),
            obj_size=(args.obj_size, args.obj_size),
            seed=0 if partition == "train" else 1,
            templates=templates,
        )
        filename = os.path.join(args.out_dir, f"{args.name}_{partition}.pickle")
        print(f'  saving to "{filename}"')
        save_pickle(filename, data)


if __name__ == "__main__":
    main()
