"""Stress-variant model config: 30%-smaller digits.

Reference README:44-51 states that shrinking the digits by 30% requires
retuning ``disc_step_bias`` and ``output_std`` (the defaults were tuned for
28px digits on a 50px canvas).  This config keeps the full mlp_mnist_model
surface and only shifts those defaults; pair it with
``small_digit_seq_mnist_data.py``.  CLI overrides still win.
"""
from __future__ import annotations

from sqair_tpu.configs.mlp_mnist_model import load  # noqa: F401 (config contract)
from sqair_tpu.experiment import flags

# smaller objects cover fewer pixels: a weaker discovery bias avoids
# spurious detections, and a tighter output std sharpens the likelihood so
# small digits are still worth explaining (README:44-51)
# smaller digits -> less foreground mass, so each object buys fewer
# likelihood nats: sharpen the likelihood AND keep discovery encouraged
# (round-1 finding: output_std too high collapses presence on sparse
# canvases and the collapse is absorbing, docs/NOTES.md)
flags.set_default("disc_step_bias", 2.0)
flags.set_default("output_std", 0.1)
