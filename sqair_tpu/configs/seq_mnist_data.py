"""Data config for pre-generated moving-MNIST pickles.

Reference: sqair/configs/seq_mnist_data.py (same flags; same pickle format).
"""
from sqair_tpu.experiment import flags
from sqair_tpu.data.mnist_tools import load  # noqa: F401  (config contract)

flags.DEFINE_string("train_path", "seq_mnist_train.pickle", "")
flags.DEFINE_string("valid_path", "seq_mnist_validation.pickle", "")
