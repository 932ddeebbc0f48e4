"""The WN stack: non-causal WaveNet conditioning network of one coupling.

Behavioral contract (reference model.py:68-138): ``start`` 1x1 conv lifts the
first coupling half to ``n_channels``; 8 dilated convs (dilation 2^i, "same"
padding) produce gate pre-activations that are summed with per-layer slices of
one big mel-conditioning projection; gated activations feed residual/skip 1x1
convs; the zero-initialized ``end`` conv emits ``(b, log_s)``.

TPU-native realization: channels-last activations ``[B, T, C]``; every conv is
an MXU matmul (see waveglow_tpu.ops.conv); the gate-channel layout keeps the
tanh half in ``[..., :C]`` and the sigmoid half in ``[..., C:]`` exactly as
the reference slices them, so imported torch weights drop in unchanged.

For tensor parallelism, the natural sharding is Megatron-style: ``in_layers``
and ``cond`` weights column-parallel over the 2C gate axis, ``res_skip``
row-parallel over its C input axis (see waveglow_tpu.parallel.sharding).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from waveglow_tpu.models.weightnorm import init_weightnorm, materialize
from waveglow_tpu.ops.conv import conv1x1, dilated_conv
from waveglow_tpu.ops.gate import gated_activation


def init_wn_params(rng: np.random.Generator, n_in_channels: int,
                   n_mel_channels: int, n_layers: int, n_channels: int,
                   kernel_size: int, weight_norm: bool = True) -> Dict:
  """Random init mirroring the reference's structure (model.py:75-113).

  ``end`` is zero-initialized so couplings start as the identity
  (model.py:88-92); all other convs use fan-in uniform init and are
  weight-normed (as (g, v)) when ``weight_norm`` is set.
  """
  assert kernel_size % 2 == 1
  assert n_channels % 2 == 0

  def uniform(shape, fan_in):
    bound = 1.0 / np.sqrt(fan_in)
    return rng.uniform(-bound, bound, size=shape).astype(np.float32)

  def conv_init(cin, cout, k=None):
    if k is None:
      w = uniform((cin, cout), cin)
      fan_in = cin
    else:
      w = uniform((k, cin, cout), cin * k)
      fan_in = cin * k
    conv = init_weightnorm(w) if weight_norm else {"w": w}
    conv["b"] = uniform((cout,), fan_in)
    return conv

  params = {
      "start": conv_init(n_in_channels, n_channels),
      "cond": conv_init(n_mel_channels, 2 * n_channels * n_layers),
      "in_layers": [
          conv_init(n_channels, 2 * n_channels, k=kernel_size)
          for _ in range(n_layers)
      ],
      "res_skip": [
          conv_init(
              n_channels,
              2 * n_channels if i < n_layers - 1 else n_channels)
          for i in range(n_layers)
      ],
      "end": {
          "w": np.zeros((n_channels, 2 * n_in_channels), dtype=np.float32),
          "b": np.zeros((2 * n_in_channels,), dtype=np.float32),
      },
  }
  return params


def wn_forward(params: Dict, audio0: jnp.ndarray, spect: jnp.ndarray,
               n_channels: int, n_layers: int, kernel_size: int,
               cond_all: Optional[jnp.ndarray] = None,
               compute_dtype=None) -> jnp.ndarray:
  """[B, T, n_half] x [B, T, n_mels*n_group] -> [B, T, 2*n_half] = (b, log_s).

  ``cond_all`` may carry a precomputed conditioning projection (so synthesis
  can hoist it out of per-flow work); otherwise it is computed here.
  """
  x = conv1x1(audio0, materialize(params["start"]), params["start"]["b"],
              compute_dtype=compute_dtype)
  if cond_all is None:
    cond_all = wn_condition(params, spect, compute_dtype=compute_dtype)

  output = None
  for i in range(n_layers):
    in_layer = params["in_layers"][i]
    in_act = dilated_conv(x, materialize(in_layer), in_layer["b"],
                          dilation=2 ** i, compute_dtype=compute_dtype)
    cond_i = cond_all[..., i * 2 * n_channels:(i + 1) * 2 * n_channels]
    acts = gated_activation(in_act, cond_i, n_channels)

    res_skip = params["res_skip"][i]
    rs = conv1x1(acts, materialize(res_skip), res_skip["b"],
                 compute_dtype=compute_dtype)
    if i < n_layers - 1:
      x = x + rs[..., :n_channels]
      skip = rs[..., n_channels:]
    else:
      skip = rs
    output = skip if output is None else output + skip

  return conv1x1(output, params["end"]["w"], params["end"]["b"],
                 compute_dtype=compute_dtype)


def wn_condition(params: Dict, spect: jnp.ndarray,
                 compute_dtype=None) -> jnp.ndarray:
  """The mel-conditioning projection [B, T, 2*C*n_layers] of one flow."""
  return conv1x1(spect, materialize(params["cond"]), params["cond"]["b"],
                 compute_dtype=compute_dtype)
