"""The WN stack: non-causal WaveNet conditioning network of one coupling.

Behavioral contract (reference model.py:68-138): ``start`` 1x1 conv lifts the
first coupling half to ``n_channels``; ``n_layers`` dilated convs (dilation
2^i, "same" padding) produce gate pre-activations summed with per-layer
slices of one big mel-conditioning projection; gated activations feed
residual/skip 1x1 convs; the zero-initialized ``end`` conv emits (b, log_s).

TPU-native realization: channels-last ``[B, T, C]`` activations, every conv an
MXU matmul. Weight layouts make the gate/res-skip pair axis EXPLICIT so
tensor-parallel sharding of the hidden channel axis C is a plain
PartitionSpec (tanh and sigmoid gate halves stay co-located per shard):

  start:     w [n_half, C]            b [C]
  in_layers: w [K, C, 2, C]           b [2, C]     (pair 0 = tanh, 1 = sigmoid)
  cond:      w [n_mels*n_group, L, 2, C]  b [L, 2, C]
  res_skip:  w [C, 2, C]              b [2, C]     (pair 0 = residual, 1 = skip)
  last res_skip: w [C, C]             b [C]        (skip only, model.py:106-110)
  end:       w [C, 2*n_half]          b [2*n_half] (never weight-normed)

Torch checkpoints map onto these with pure reshapes/transposes (torch packs
the pair axis as channel blocks [tanh C; sigmoid C] and layer-major cond
slices, reference model.py:124-126).

Megatron-style TP (see waveglow_tpu.parallel.sharding): in_layers and cond
column-parallel on the trailing C, res_skip row-parallel on its leading C,
one psum per layer restores the replicated residual/skip.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from waveglow_tpu.models.weightnorm import init_weightnorm, materialize
from waveglow_tpu.ops.conv import _mm, conv1x1, shift_time


def init_wn_params(rng: np.random.Generator, n_in_channels: int,
                   n_mel_channels: int, n_layers: int, n_channels: int,
                   kernel_size: int, weight_norm: bool = True) -> Dict:
  """Random init mirroring the reference's structure (model.py:75-113).

  ``end`` is zero-initialized so couplings start as the identity
  (model.py:88-92); other convs use torch-style fan-in uniform init and are
  weight-normed as (g, v) when ``weight_norm`` is set.
  """
  assert kernel_size % 2 == 1
  assert n_channels % 2 == 0

  def uniform(shape, fan_in):
    bound = 1.0 / np.sqrt(fan_in)
    return rng.uniform(-bound, bound, size=shape).astype(np.float32)

  def conv_init(w_shape, fan_in, out_ndim):
    w = uniform(w_shape, fan_in)
    conv = init_weightnorm(w, out_ndim) if weight_norm else {"w": w}
    conv["b"] = uniform(w_shape[-out_ndim:], fan_in)
    return conv

  c = n_channels
  params = {
      "start": conv_init((n_in_channels, c), n_in_channels, 1),
      "cond": conv_init((n_mel_channels, n_layers, 2, c), n_mel_channels, 3),
      "in_layers": [
          conv_init((kernel_size, c, 2, c), c * kernel_size, 2)
          for _ in range(n_layers)
      ],
      "res_skip": [
          conv_init((c, 2, c), c, 2) if i < n_layers - 1
          else conv_init((c, c), c, 1)
          for i in range(n_layers)
      ],
      "end": {
          "w": np.zeros((c, 2 * n_in_channels), dtype=np.float32),
          "b": np.zeros((2 * n_in_channels,), dtype=np.float32),
      },
  }
  return params


def abstract_wn_params(n_in_channels: int, n_mel_channels: int,
                       n_layers: int, n_channels: int, kernel_size: int,
                       weight_norm: bool = True) -> Dict:
  """Shape/dtype skeleton of :func:`init_wn_params` — nothing materialized.

  Placement templates (sharded checkpoint restore) only need shapes, dtypes
  and shardings; building them from ``jax.ShapeDtypeStruct`` leaves avoids
  allocating the host-side weights that ``init_wn_params`` produces. Kept in
  lockstep with ``init_wn_params`` by
  tests/test_model.py::test_abstract_params_matches_init.
  """
  def leaf(*shape):
    return jax.ShapeDtypeStruct(shape, np.float32)

  def conv(w_shape, out_ndim):
    out_shape = w_shape[-out_ndim:]
    d = ({"g": leaf(*out_shape), "v": leaf(*w_shape)} if weight_norm
         else {"w": leaf(*w_shape)})
    d["b"] = leaf(*out_shape)
    return d

  c = n_channels
  return {
      "start": conv((n_in_channels, c), 1),
      "cond": conv((n_mel_channels, n_layers, 2, c), 3),
      "in_layers": [
          conv((kernel_size, c, 2, c), 2) for _ in range(n_layers)
      ],
      "res_skip": [
          conv((c, 2, c), 2) if i < n_layers - 1 else conv((c, c), 1)
          for i in range(n_layers)
      ],
      "end": {
          "w": leaf(c, 2 * n_in_channels),
          "b": leaf(2 * n_in_channels),
      },
  }


def wn_forward(params: Dict, audio0: jnp.ndarray, spect: jnp.ndarray,
               n_channels: int, n_layers: int, kernel_size: int,
               compute_dtype=None, use_pallas: bool = False,
               valid_t: Optional[int] = None) -> jnp.ndarray:
  """[B, T, n_half] x [B, T, n_mels*n_group] -> [B, T, 2*n_half] = (b, log_s).

  Conditioning is computed PER LAYER from ``spect`` (a packed
  [B, T, L, 2, C] projection was measured slower — see the w_cond comment
  below; a hoisted-projection variant was removed as dead code in round 5).

  ``use_pallas`` routes the per-layer body through the fused Pallas kernel
  (kernel_size 3 only; differentiable via wn_layer_trainable's custom VJP).

  ``valid_t`` is the true time length when the caller padded T: residual-
  stream rows >= valid_t are forced to zero after the start conv and after
  every residual update, so the dilated taps read pad rows exactly like the
  zero "same" padding an unpadded T=valid_t call would — positions
  < valid_t are then BIT-IDENTICAL to the unpadded program (this is what
  makes bucket-padded serving exact; see Synthesizer.infer docstring). On
  the XLA path valid_t may be a traced scalar or a per-batch [B] vector
  (rows can have different true lengths in a micro-batch); the Pallas path
  needs a static int (its kernel masks per tile).

  (A taps+spect single-gate-matmul variant was measured 0.91x — slower —
  on v5e: XLA already fuses the cond add into a matmul epilogue, and the
  wider [B, T, 3C+M] concat write costs more than the saved roundtrip. See
  scripts/bench_wn_variants.py and docs/PERFORMANCE.md.)
  """
  if use_pallas and kernel_size == 3:
    return _wn_forward_pallas(params, audio0, spect, n_channels, n_layers,
                              compute_dtype=compute_dtype, valid_t=valid_t)
  c = n_channels
  half_k = kernel_size // 2
  keep = None
  if valid_t is not None:
    valid = jnp.asarray(valid_t).reshape(-1, 1)  # scalar or per-batch [B]
    keep = (jnp.arange(audio0.shape[1])[None, :] < valid)[..., None]
  # The residual stream x stays float32 in both modes (it accumulates over
  # n_layers adds); everything fatter than x is bf16 in fast mode.
  x = conv1x1(audio0, materialize(params["start"]), params["start"]["b"],
              compute_dtype=compute_dtype, out_dtype=jnp.float32)
  if keep is not None:
    x = jnp.where(keep, x, 0.0)
  # Per-layer cond matmuls (not one big [.., L, 2, C] projection): each
  # layer's conditioning is then a CONTIGUOUS [B, T, 2C] buffer — slicing
  # layer i out of a packed [B, T, L, 2, C] tensor is a strided HBM read
  # that dominated the gate cost on v5e.
  w_cond = materialize(params["cond"])          # [M, L, 2, C]

  output = None
  for i in range(n_layers):
    dilation = 2 ** i
    in_layer = params["in_layers"][i]
    w_in = materialize(in_layer).reshape(kernel_size, c, 2 * c)
    # cast the residual stream once per layer, so the k shifted reads touch
    # bf16 (not f32) memory in fast mode
    x_mm = x if compute_dtype is None else x.astype(compute_dtype)
    # im2col over taps: ONE [B*T, K*C] @ [K*C, 2C] matmul instead of K
    # K=C matmuls — measured ~1.6x faster on v5e (bigger contraction dim)
    taps = jnp.concatenate(
        [shift_time(x_mm, (tap - half_k) * dilation)
         for tap in range(kernel_size)], axis=-1)
    pre = _mm(taps, w_in.reshape(kernel_size * c, 2 * c), compute_dtype)
    pre = pre.reshape(pre.shape[:-1] + (2, c)) + in_layer["b"].astype(pre.dtype)

    cond_i = _mm(spect, w_cond[:, i].reshape(-1, 2 * c), compute_dtype)
    cond_i = (cond_i.reshape(cond_i.shape[:-1] + (2, c))
              + params["cond"]["b"][i].astype(cond_i.dtype))
    gates = pre + cond_i.astype(pre.dtype)
    acts = jnp.tanh(gates[..., 0, :]) * jax.nn.sigmoid(gates[..., 1, :])

    res_skip = params["res_skip"][i]
    w_rs = materialize(res_skip)
    if i < n_layers - 1:
      rs = _mm(acts, w_rs.reshape(c, 2 * c), compute_dtype)
      rs = rs.reshape(rs.shape[:-1] + (2, c)) + res_skip["b"].astype(rs.dtype)
      x = x + rs[..., 0, :].astype(jnp.float32)
      if keep is not None:
        # biases/cond make pad rows nonzero every layer; re-zero them so the
        # NEXT layer's dilated taps see the unpadded call's zero boundary
        x = jnp.where(keep, x, 0.0)
      skip = rs[..., 1, :]
    else:
      skip = _mm(acts, w_rs, compute_dtype) + res_skip["b"].astype(
          jnp.float32 if compute_dtype is None else compute_dtype)
    # skip accumulation in f32 (adds fuse into the matmul epilogue)
    skip = skip.astype(jnp.float32)
    output = skip if output is None else output + skip

  return conv1x1(output, params["end"]["w"], params["end"]["b"],
                 compute_dtype=compute_dtype, out_dtype=jnp.float32)


def _wn_forward_pallas(params: Dict, audio0: jnp.ndarray, spect: jnp.ndarray,
                       n_channels: int, n_layers: int,
                       compute_dtype=None,
                       valid_t: Optional[int] = None) -> jnp.ndarray:
  """WN stack with one fused Pallas kernel per layer (see kernels/wn_layer.py).

  The skip accumulator is summed in XLA between kernel calls — the
  in-kernel aliased-accumulator variant exists (wn_layer_fused's skip_acc)
  but this environment's Mosaic compiler rejects it at the productive tile
  size, see the inline comment below. ``valid_t`` marks the true time
  length when the caller padded T to a tile multiple: pad rows of the
  residual stream are forced to zero so the taps read them exactly like
  the reference's zero "same" padding.

  Layers run through :func:`wn_layer_trainable` (custom VJP), so this path
  is differentiable — training can opt in via hparams.use_pallas.
  """
  from waveglow_tpu.kernels import wn_layer as kl

  dtype = compute_dtype or jnp.float32
  c = n_channels
  t = audio0.shape[1]
  x = conv1x1(audio0, materialize(params["start"]), params["start"]["b"],
              compute_dtype=compute_dtype, out_dtype=dtype)
  if valid_t is not None and valid_t < t:
    keep = (jnp.arange(t) < valid_t)[None, :, None]
    x = jnp.where(keep, x, jnp.zeros_like(x))  # fuses into the start matmul
  w_cond = materialize(params["cond"])

  output = None
  for i in range(n_layers):
    dilation = 2 ** i
    in_layer = params["in_layers"][i]
    res_skip = params["res_skip"][i]
    w_in = materialize(in_layer).reshape(3, c, 2 * c).astype(dtype)
    w_rs = materialize(res_skip).reshape(c, -1).astype(dtype)

    cond_i = _mm(spect, w_cond[:, i].reshape(-1, 2 * c), compute_dtype)
    cond_i = (cond_i.reshape(cond_i.shape[:-1] + (2, c))
              + params["cond"]["b"][i].astype(cond_i.dtype)).astype(dtype)

    # In-kernel skip accumulation (skip_acc=...) is implemented and tested
    # in interpret mode, but this environment's Mosaic compiler rejects the
    # aliased-accumulator variant at tile 1024 (HTTP 500) and tile 512
    # costs ~1.6x, so the accumulate stays in XLA here.
    x, skip = kl.wn_layer_trainable(
        x, cond_i, w_in,
        in_layer["b"].astype(jnp.float32), w_rs,
        res_skip["b"].astype(jnp.float32), dilation,
        kl.DEFAULT_TILE, valid_t)
    skip = skip.astype(jnp.float32)
    output = skip if output is None else output + skip

  return conv1x1(output, params["end"]["w"], params["end"]["b"],
                 compute_dtype=compute_dtype, out_dtype=jnp.float32)
