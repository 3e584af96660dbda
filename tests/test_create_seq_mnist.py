"""Real-MNIST idx ingestion path (sqair_tpu/scripts/create_seq_mnist.py).

The reference trains on actual MNIST idx files read through the TF1 MNIST
reader (reference data.py:81, create_seq_mnist.py:89-131).  No network in
this image means no real MNIST — so the idx path is proven with FIXTURE
idx files (font-rendered digit glyphs packed into the genuine idx3/idx1
binary format, raw and gzipped), end-to-end: idx files -> create_seq_mnist
-> reference-format pickle -> the training loader.
"""
import gzip
import os
import pickle

import numpy as np
import pytest

from sqair_tpu.data.loader import Minibatcher, load_pickle, process_data
from sqair_tpu.data.mnist_tools import AXES, tile_nums_over_time
from sqair_tpu.data.synthetic import make_font_digit_bank
from sqair_tpu.scripts.create_seq_mnist import load_mnist_idx, main

N_DIGITS, DIGIT, CANVAS, T = 32, 14, 28, 3


def _write_idx3(path: str, imgs: np.ndarray, gz: bool):
    n, h, w = imgs.shape
    header = (2051).to_bytes(4, "big") + n.to_bytes(4, "big") \
        + h.to_bytes(4, "big") + w.to_bytes(4, "big")
    blob = header + imgs.astype(np.uint8).tobytes()
    opener = gzip.open if gz else open
    with opener(path, "wb") as f:
        f.write(blob)


def _write_idx1(path: str, labels: np.ndarray, gz: bool):
    n = labels.shape[0]
    header = (2049).to_bytes(4, "big") + n.to_bytes(4, "big")
    blob = header + labels.astype(np.uint8).tobytes()
    opener = gzip.open if gz else open
    with opener(path, "wb") as f:
        f.write(blob)


@pytest.fixture(scope="module")
def digit_bank():
    return make_font_digit_bank(N_DIGITS, DIGIT, seed=0)


@pytest.fixture(scope="module")
def idx_dir(tmp_path_factory, digit_bank):
    """train partition gzipped, t10k raw — both layouts must load."""
    d = tmp_path_factory.mktemp("mnist_idx")
    imgs, labels = digit_bank
    _write_idx3(str(d / "train-images-idx3-ubyte.gz"), imgs, gz=True)
    _write_idx1(str(d / "train-labels-idx1-ubyte.gz"), labels, gz=True)
    _write_idx3(str(d / "t10k-images-idx3-ubyte"), imgs[:16], gz=False)
    _write_idx1(str(d / "t10k-labels-idx1-ubyte"), labels[:16], gz=False)
    return str(d)


class TestIdxLoader:
    def test_roundtrip_gz(self, idx_dir, digit_bank):
        imgs, labels = digit_bank
        got_imgs, got_labels = load_mnist_idx(idx_dir, "train")
        np.testing.assert_array_equal(got_imgs, imgs)
        np.testing.assert_array_equal(got_labels, labels)

    def test_roundtrip_raw(self, idx_dir, digit_bank):
        imgs, labels = digit_bank
        got_imgs, got_labels = load_mnist_idx(idx_dir, "validation")
        np.testing.assert_array_equal(got_imgs, imgs[:16])
        np.testing.assert_array_equal(got_labels, labels[:16])

    def test_missing_dir_returns_none(self, tmp_path):
        assert load_mnist_idx(str(tmp_path), "train") is None


class TestEndToEnd:
    @pytest.fixture(scope="class")
    def pickles(self, idx_dir):
        import sys

        argv, sys.argv = sys.argv, [
            "create_seq_mnist",
            "--n_train", "8", "--n_valid", "4",
            "--n_timesteps", str(T), "--canvas", str(CANVAS),
            "--obj_size", str(DIGIT),
            "--name", "fixture", "--out_dir", idx_dir,
        ]
        try:
            main()
        finally:
            sys.argv = argv
        return idx_dir

    def test_pickle_contract(self, pickles, digit_bank):
        """The written pickle matches the reference's on-disk contract
        (create_seq_mnist.py:85-87 + data.py:178-186): imgs [T,N,H,W]
        uint8, nums [1,N,max+1] uint8 cumulative one-hot, coords
        [T,N,max,4], labels from the REAL idx labels."""
        _, labels = digit_bank
        # raw on-disk contract first (pre-conversion): uint8 canvases
        with open(os.path.join(pickles, "fixture_train.pickle"), "rb") as f:
            raw = pickle.load(f)
        assert raw["imgs"].dtype == np.uint8
        # then through the loader (data.py:189-201: /255 + float nums)
        data = load_pickle(os.path.join(pickles, "fixture_train.pickle"))
        assert data["imgs"].shape == (T, 8, CANVAS, CANVAS)
        assert data["nums"].shape[:2] == (1, 8)
        assert data["coords"].shape[0] == T
        # canvases contain actual digit pixels where nums > 0
        counts = data["nums"].astype(np.int32).sum(-1)[0]
        for i, c in enumerate(counts):
            if c > 0:
                assert data["imgs"][0, i].max() > 0
        # labels came from the idx label file (digits 0..9, not all zero)
        assert data["labels"].max() <= 9
        if counts.max() > 0:
            assert set(np.unique(data["labels"])) != {0} or labels.max() == 0

    def test_training_loader_consumes_pickle(self, pickles):
        """Same path the training entry uses: process -> tile -> batch."""
        data = load_pickle(os.path.join(pickles, "fixture_validation.pickle"))
        process_data(data, T)
        tile_nums_over_time(data)
        it = Minibatcher(data, batch_size=4, axes=AXES, shuffle=False)
        batch = next(it)
        assert batch["imgs"].shape == (T, 4, CANVAS, CANVAS)
        assert batch["imgs"].dtype == np.float32
        assert float(batch["imgs"].max()) <= 1.0
        assert batch["nums"].shape[0] == T
