"""SQAIR-TPU: a TPU-native JAX framework for Sequential Attend, Infer, Repeat.

A from-scratch rebuild of the capabilities of akosiorek/sqair (NeurIPS 2018,
arXiv 1806.01794) designed for TPU hardware:

- fixed-shape, fully jit-compiled model: ``lax.scan`` over time and object
  slots with presence masking (vs. TF1 while_loop + TensorArrays + dynamic
  partitions in the reference),
- the spatial-transformer glimpse crop/paste expressed as separable bilinear
  interpolation *matmuls* that run on the MXU (vs. tf.contrib.resampler's
  CUDA gather kernel),
- IWAE/VIMCO particles tiled on-chip, importance weights reduced on device,
- data parallelism over a ``jax.sharding.Mesh`` (ICI collectives inserted by
  XLA), with the whole train step compiled as a single program,
- an on-device moving-MNIST generator (jit-able) as well as a
  pickle-compatible loader for the reference datasets.

Layer map mirrors the reference (see SURVEY.md):
  ops/       L0 math kernels (distributions, ST, indexing, targets)
  nn/        L0 NN primitives (MLP, RNN cells, stochastic modules)
  models/    L1-L3 (cores, Discover/Propagate, SQAIRTimestep, SequentialAIR, Model)
  data/      datasets + curriculum
  training/  optimizers, train step, checkpointing
  parallel/  mesh + sharded training
  experiment/ flags + config-module loader + run dirs
  configs/   code-as-config files (mlp_mnist_model.py, seq_mnist_data.py)
"""

__version__ = "0.1.0"
