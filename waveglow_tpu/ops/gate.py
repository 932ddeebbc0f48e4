"""WaveNet gated activation (the reference's hottest fused op).

``gated(a, b) = tanh((a+b)[..., :C]) * sigmoid((a+b)[..., C:])`` — the
TorchScript-fused op at reference model.py:13-20, here in channels-last
layout. XLA fuses this entire expression into the surrounding matmuls on TPU;
a Pallas variant lives in ``waveglow_tpu.kernels`` for whole-layer fusion.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gated_activation(acts: jnp.ndarray, cond: jnp.ndarray,
                     n_channels: int) -> jnp.ndarray:
  """[..., 2C] + [..., 2C] -> [..., C] gated output."""
  x = acts + cond
  t_act = jnp.tanh(x[..., :n_channels])
  s_act = jax.nn.sigmoid(x[..., n_channels:])
  return t_act * s_act
