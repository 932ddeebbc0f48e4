"""Convolution primitives as MXU-shaped matmuls (channels-last layout).

TPU-first design: instead of ``lax.conv_general_dilated`` (the literal
translation of the reference's ``torch.nn.Conv1d`` usage, reference
model.py:84-113), every conv here is expressed as matmuls over ``[B*T, C]``
activations:

  * 1x1 conv           -> a single ``x @ w`` matmul;
  * k-tap dilated conv -> k matmuls of statically shifted views (zero "same"
    padding), which XLA fuses and the MXU tiles directly — dilation never
    touches the hardware;
  * ConvTranspose1d    -> one ``x @ w`` matmul producing per-frame kernels,
    then a static overlap-add with frame-axis (not sample-axis) shifts.

Weight layouts (differ from torch on purpose; importers transpose):
  * 1x1:              ``w[Cin, Cout]``            (torch: ``[Cout, Cin, 1]``)
  * k-tap:            ``w[K, Cin, Cout]``         (torch: ``[Cout, Cin, K]``)
  * conv-transpose:   ``w[Cin, K, Cout]``         (torch: ``[Cin, Cout, K]``)

Precision policy (matters — the v5e is HBM-bandwidth bound on this model):
  * ``compute_dtype=None`` (parity mode): float32 operands with
    Precision.HIGHEST (TPU f32 matmuls otherwise run as bf16 passes) and
    float32 intermediates;
  * ``compute_dtype=bfloat16`` (fast mode): bf16 operands on the MXU (which
    always accumulates in f32 internally) AND bf16-stored intermediates —
    halving activation HBM traffic. Callers that need an f32 result (the
    coupling's (b, log_s) head) pass ``out_dtype=jnp.float32``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _mm(x: jnp.ndarray, w: jnp.ndarray, compute_dtype,
        out_dtype=None) -> jnp.ndarray:
  if compute_dtype is not None:
    x = x.astype(compute_dtype)
    w = w.astype(compute_dtype)
    preferred = out_dtype if out_dtype is not None else compute_dtype
    return jnp.dot(x, w, preferred_element_type=preferred)
  return jnp.dot(x, w, precision=jax.lax.Precision.HIGHEST,
                 preferred_element_type=jnp.float32)


def conv1x1(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None,
            compute_dtype=None, out_dtype=None) -> jnp.ndarray:
  """Pointwise conv: [..., Cin] @ [Cin, Cout] (+ bias)."""
  y = _mm(x, w, compute_dtype, out_dtype)
  if b is not None:
    y = y + b.astype(y.dtype)
  return y


def shift_time(x: jnp.ndarray, offset: int) -> jnp.ndarray:
  """Zero-padded shift along the time axis (axis 1 of [B, T, C]).

  ``offset > 0`` yields ``y[t] = x[t + offset]`` (look-ahead);
  ``offset < 0`` yields ``y[t] = x[t - |offset|]`` (look-back).
  """
  if offset == 0:
    return x
  t = x.shape[1]
  if offset > 0:
    return jnp.pad(x[:, offset:, :], ((0, 0), (0, offset), (0, 0)))
  return jnp.pad(x[:, :t + offset, :], ((0, 0), (-offset, 0), (0, 0)))


def dilated_conv(x: jnp.ndarray, w: jnp.ndarray,
                 b: Optional[jnp.ndarray] = None, dilation: int = 1,
                 compute_dtype=None, out_dtype=None) -> jnp.ndarray:
  """"Same"-padded dilated conv: [B, T, Cin] x [K, Cin, Cout] -> [B, T, Cout].

  Matches torch ``Conv1d(padding=dilation*(K-1)//2)`` semantics for odd K
  (reference model.py:98-104): ``y[t] = sum_k w[k] @ x[t + (k - K//2) * d]``.
  """
  k = w.shape[0]
  assert k % 2 == 1, "kernel size must be odd for same padding"
  half = k // 2
  y = None
  for tap in range(k):
    offset = (tap - half) * dilation
    term = _mm(shift_time(x, offset), w[tap], compute_dtype, out_dtype)
    y = term if y is None else y + term
  if b is not None:
    y = y + b.astype(y.dtype)
  return y


def conv_transpose1d(x: jnp.ndarray, w: jnp.ndarray,
                     b: Optional[jnp.ndarray] = None, stride: int = 256,
                     compute_dtype=None, out_dtype=None) -> jnp.ndarray:
  """Transposed conv: [B, T, Cin] x [Cin, K, Cout] -> [B, (T-1)*stride + K, Cout].

  Equivalent to torch ``ConvTranspose1d(padding=0)`` (reference
  model.py:145-150 uses K=1024, stride=256 for the mel upsampler).

  Realized as ONE matmul: output stride-group g (samples g*stride + p,
  p < stride) depends only on the ``ratio = K/stride`` input frames
  x[g-ratio+1 .. g], so an im2col concat of the ratio shifted views against
  a [ratio*Cin, stride*Cout] repacked kernel writes the output exactly once.
  The earlier formulation (per-frame [B, T, K, Cout] kernels + frame-axis
  overlap-add) moved ~2.4 GB of HBM per synthesis call at production shapes
  and measured 17 ms vs ~4 ms for this one (scripts/bench_stage_breakdown.py);
  the contraction also deepens from Cin=80 to ratio*Cin=320, which the MXU
  tiles far better.
  """
  cin, k, cout = w.shape
  assert k % stride == 0, "kernel length must be a multiple of stride"
  ratio = k // stride
  batch, t, _ = x.shape
  # ratio-1 trailing zero frames produce the partial-coverage tail outputs
  xp = jnp.pad(x, ((0, 0), (0, ratio - 1), (0, 0)))
  xcat = jnp.concatenate([shift_time(xp, -j) for j in range(ratio)], axis=-1)
  # w2[j*Cin + ci, p*Cout + co] = w[ci, j*stride + p, co]
  w2 = w.reshape(cin, ratio, stride, cout).transpose(1, 0, 2, 3).reshape(
      ratio * cin, stride * cout)
  y = _mm(xcat.reshape(batch * (t + ratio - 1), ratio * cin), w2,
          compute_dtype, out_dtype)
  y = y.reshape(batch, (t + ratio - 1) * stride, cout)
  if b is not None:
    y = y + b.astype(y.dtype)
  return y
