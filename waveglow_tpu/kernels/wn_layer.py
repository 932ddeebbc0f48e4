"""Pallas TPU kernel: one fused WN layer (dilated conv + gate + res/skip).

The XLA path materializes three HBM round-trips per WN layer: the gate
pre-activations [B, T, 2C], the gated activations [B, T, C], and the
res/skip output [B, T, 2C]. This kernel keeps all of them in VMEM for a
time tile, so per layer only the residual stream, conditioning slice, and
skip accumulator touch HBM, and the VPU gate work overlaps the MXU matmuls
across the tile pipeline.

Math (identical to waveglow_tpu.models.wn.wn_forward's layer body,
reference model.py:123-135):

  pre  = sum_tap  x[t + (tap-1)*d] @ w_in[tap]           (3-tap dilated conv)
  gate = tanh(pre_t + b_t + cond_t) * sigmoid(pre_s + b_s + cond_s)
  rs   = gate @ w_rs + b_rs
  x'   = x + rs[..., :C]   (all but last layer)
  skip = skip_acc + (rs[..., C:] or rs on the last layer)

Grid: one flat dimension over batch*time-tiles (TPU grids execute
sequentially, so scratch persists across steps). The residual stream x
lives in HBM (ANY) and each tap's shifted window is DMA'd into VMEM
scratch — halo windows cannot be expressed with block-granular BlockSpecs.

Performance notes (v5e, measured — see docs/PERFORMANCE.md):
  * The tap DMAs are double-buffered across grid steps: step n prefetches
    step n+1's windows before computing, so the x reads ride under the
    matmuls. The first, un-overlapped version of this kernel measured ~22%
    BEHIND the XLA body; the pipelined one is ~1.3x ahead.
  * T must be a multiple of the tile: the jnp.pad of the conditioning
    slice and the output re-slices that a ragged edge forces cost ~1.65 ms
    per layer at production shapes — more than the kernel's entire win.
    Callers pad the time axis once per model call instead (and pass
    ``valid_t`` so pad rows of the residual stream stay zero, preserving
    the reference's zero "same"-padding semantics, model.py:100-104).
  * Sublane-misaligned HBM offsets (dilation % 8 != 0) crash the remote
    Mosaic compiler (HTTP 500 from the compile helper), so for dilation
    < 8 the caller passes three PRE-SHIFTED views of x and every DMA reads
    at an aligned ``i*tile`` offset (two extra XLA shift-copies, ~0.26 ms —
    still a clear win over the XLA body).
  * The skip accumulator is carried through the kernel via an aliased
    input/output: accumulating in XLA instead costs a separate [B, T, C]
    add chain per layer. It rides at x.dtype — the f32 variant's
    double-buffered VMEM blocks overflow the 16 MB budget at tile 1024,
    and tile 512 costs ~1.6x.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 1024
MIN_ALIGNED_DILATION = 8


def _body(x_taps, cond_ref, w_in_ref, b_in_ref, w_rs_ref, b_rs_ref, acc_ref,
          x_out_ref, skip_ref, x_scratch, sems, *, dilation: int, tile: int,
          channels: int, last_layer: bool, n_tiles: int, valid_t: int,
          aligned: bool):
  c = channels
  n = pl.program_id(0)
  n_total = pl.num_programs(0)

  def tap_dma(idx, slot, tap):
    b = idx // n_tiles
    i = idx % n_tiles
    if aligned:
      # One halo-padded [B, T + 2d, C] buffer; windows at i*tile + tap*d
      # are sublane-aligned because d % 8 == 0.
      src = x_taps[0].at[b, pl.ds(i * tile + tap * dilation, tile), :]
    else:
      # d < 8: three pre-shifted [B, T, C] buffers, aligned i*tile windows.
      src = x_taps[tap].at[b, pl.ds(i * tile, tile), :]
    return pltpu.make_async_copy(src, x_scratch.at[slot, tap],
                                 sems.at[slot, tap])

  slot = jax.lax.rem(n, 2)
  next_slot = jax.lax.rem(n + 1, 2)

  @pl.when(n == 0)
  def _():
    for tap in range(3):
      tap_dma(0, 0, tap).start()

  @pl.when(n + 1 < n_total)
  def _():
    for tap in range(3):
      tap_dma(n + 1, next_slot, tap).start()

  for tap in range(3):
    tap_dma(n, slot, tap).wait()

  # Three K=C dots from separate tap slabs: a single lane-concatenated
  # K=3C matmul was tried and measured ~6% SLOWER under Mosaic (unlike the
  # XLA path, where im2col's bigger contraction wins ~1.6x).
  pre = jnp.dot(x_scratch[slot, 0], w_in_ref[0],
                preferred_element_type=jnp.float32)
  pre += jnp.dot(x_scratch[slot, 1], w_in_ref[1],
                 preferred_element_type=jnp.float32)
  pre += jnp.dot(x_scratch[slot, 2], w_in_ref[2],
                 preferred_element_type=jnp.float32)
  pre += b_in_ref[:].astype(jnp.float32)
  gates = pre + cond_ref[:].reshape(tile, 2 * c).astype(jnp.float32)

  acts = jnp.tanh(gates[:, :c]) * jax.nn.sigmoid(gates[:, c:])
  acts = acts.astype(x_out_ref.dtype)

  rs = jnp.dot(acts, w_rs_ref[:], preferred_element_type=jnp.float32)
  rs += b_rs_ref[:].astype(jnp.float32)

  x_center = x_scratch[slot, 1]  # the zero-offset tap is the residual
  if last_layer:
    x_next = x_center
    skip = rs
  else:
    x_next = (x_center.astype(jnp.float32) + rs[:, :c]).astype(x_out_ref.dtype)
    skip = rs[:, c:]
  if acc_ref is not None:
    skip = skip + acc_ref[:].astype(jnp.float32)
  skip_ref[:] = skip.astype(skip_ref.dtype)

  if valid_t < n_tiles * tile:
    # Rows past the caller's model-level time padding must stay exactly
    # zero in the residual stream: the next layer's taps read them as the
    # reference's zero "same" padding. (Skip rows need no mask — nothing
    # convolves over the skip accumulator and pad rows are sliced off.)
    i = n % n_tiles
    row = jax.lax.broadcasted_iota(jnp.int32, (tile, c), 0)
    keep = (i * tile + row) < valid_t
    x_next = jnp.where(keep, x_next, jnp.zeros_like(x_next))
  x_out_ref[:] = x_next


def wn_layer_fused(x: jnp.ndarray, cond_i: jnp.ndarray, w_in: jnp.ndarray,
                   b_in: jnp.ndarray, w_rs: jnp.ndarray, b_rs: jnp.ndarray,
                   dilation: int, tile: int = DEFAULT_TILE,
                   skip_acc: Optional[jnp.ndarray] = None,
                   skip_f32: bool = False,
                   valid_t: Optional[int] = None, interpret: bool = None
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
  if interpret is None:
    # Mosaic lowering needs a real TPU; everywhere else use the interpreter.
    interpret = jax.devices()[0].platform != "tpu"
  t = x.shape[1]
  # Ragged time axis (callers on the hot path pad t instead): first pad t up
  # to a sublane multiple — Mosaic rejects non-multiple-of-8 tiles — then
  # shrink the tile to the largest multiple-of-8 divisor of the padded t.
  pad = (-t) % 8
  tp = t + pad
  if tp % tile != 0:
    tile = max(s for s in range(8, min(tile, tp) + 1, 8) if tp % s == 0)
  if valid_t is None:
    valid_t = t
  if pad:
    x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    cond_i = jnp.pad(cond_i, ((0, 0), (0, pad)) + ((0, 0),) * (cond_i.ndim - 2))
    if skip_acc is not None:
      skip_acc = jnp.pad(skip_acc, ((0, 0), (0, pad), (0, 0)))
  x_out, skip = _wn_layer_fused(x, cond_i, w_in, b_in, w_rs, b_rs, skip_acc,
                                dilation=dilation, tile=tile,
                                skip_f32=skip_f32, valid_t=valid_t,
                                interpret=interpret)
  if pad:
    x_out, skip = x_out[:, :t], skip[:, :t]
  return x_out, skip


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def wn_layer_trainable(x: jnp.ndarray, cond_i: jnp.ndarray,
                       w_in: jnp.ndarray, b_in: jnp.ndarray,
                       w_rs: jnp.ndarray, b_rs: jnp.ndarray,
                       dilation: int, tile: int, valid_t: Optional[int]
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
  """Differentiable fused WN layer: Pallas forward + analytic XLA backward.

  Same forward as :func:`wn_layer_fused` (without the in-kernel skip
  accumulator — training accumulates skips in XLA, where the add chain
  fuses into the backward anyway). The VJP recomputes the cheap
  intermediates (taps/gates/acts — remat-style, nothing saved from the
  kernel) and applies the closed-form adjoints of conv/gate/res-skip.
  """
  return wn_layer_fused(x, cond_i, w_in, b_in, w_rs, b_rs,
                        dilation=dilation, tile=tile, valid_t=valid_t)


def _wn_layer_trainable_fwd(x, cond_i, w_in, b_in, w_rs, b_rs,
                            dilation, tile, valid_t):
  out = wn_layer_fused(x, cond_i, w_in, b_in, w_rs, b_rs,
                       dilation=dilation, tile=tile, valid_t=valid_t)
  return out, (x, cond_i, w_in, b_in, w_rs, b_rs)


def _wn_layer_trainable_bwd(dilation, tile, valid_t, residuals, cotangents):
  from waveglow_tpu.ops.conv import shift_time
  x, cond_i, w_in, b_in, w_rs, b_rs = residuals
  dx_next, dskip = cotangents
  bsz, t, c = x.shape
  f32 = jnp.float32
  last_layer = w_rs.shape[-1] == c

  # recompute the forward intermediates (f32 math, at least as accurate as
  # the kernel's f32-accumulating dots)
  shifted = [shift_time(x, (tap - 1) * dilation) for tap in range(3)]
  taps = jnp.concatenate(shifted, axis=-1).astype(f32)       # [B, T, 3C]
  gates = jnp.dot(taps, w_in.reshape(3 * c, 2 * c).astype(f32))
  gates = (gates + b_in.reshape(-1).astype(f32)
           + cond_i.reshape(bsz, t, 2 * c).astype(f32))
  t_act = jnp.tanh(gates[..., :c])
  s_act = jax.nn.sigmoid(gates[..., c:])
  acts = t_act * s_act

  dx_next = dx_next.astype(f32)
  dskip = dskip.astype(f32)
  if valid_t is not None and valid_t < t:
    # the forward zeroes x_next rows >= valid_t, so no gradient flows back
    # through them
    keep = (jnp.arange(t) < valid_t)[None, :, None]
    dx_next = jnp.where(keep, dx_next, jnp.zeros_like(dx_next))

  if last_layer:
    drs = dskip                                              # [B, T, C]
    dx = dx_next                                             # x' = x
  else:
    drs = jnp.concatenate([dx_next, dskip], axis=-1)         # [B, T, 2C]
    dx = dx_next                                             # x' = x + res

  dacts = jnp.dot(drs, w_rs.astype(f32).T)                   # [B, T, C]
  dw_rs = jnp.einsum("btc,btk->ck", acts, drs).astype(w_rs.dtype)
  db_rs = drs.sum((0, 1)).reshape(b_rs.shape).astype(b_rs.dtype)

  da = dacts * s_act * (1.0 - t_act * t_act)
  db = dacts * t_act * s_act * (1.0 - s_act)
  dgates = jnp.concatenate([da, db], axis=-1)                # [B, T, 2C]

  dcond = dgates.reshape(cond_i.shape).astype(cond_i.dtype)
  db_in = dgates.sum((0, 1)).reshape(b_in.shape).astype(b_in.dtype)
  dw_in = jnp.einsum("btk,btm->km", taps,
                     dgates).reshape(w_in.shape).astype(w_in.dtype)

  # adjoint of the 3-tap dilated conv: scatter each tap's contribution back
  # (shift_time's adjoint is shift_time with the negated offset)
  g_w = jnp.dot(dgates, w_in.reshape(3 * c, 2 * c).astype(f32).T)
  for tap in range(3):
    dx = dx + shift_time(g_w[..., tap * c:(tap + 1) * c],
                         -(tap - 1) * dilation)
  return (dx.astype(x.dtype), dcond, dw_in, db_in, dw_rs, db_rs)


wn_layer_trainable.defvjp(_wn_layer_trainable_fwd, _wn_layer_trainable_bwd)


@functools.partial(jax.jit, static_argnames=("dilation", "tile", "skip_f32",
                                             "valid_t", "interpret"))
def _wn_layer_fused(x: jnp.ndarray, cond_i: jnp.ndarray, w_in: jnp.ndarray,
                    b_in: jnp.ndarray, w_rs: jnp.ndarray, b_rs: jnp.ndarray,
                    skip_acc: Optional[jnp.ndarray], dilation: int,
                    tile: int = DEFAULT_TILE, skip_f32: bool = False,
                    valid_t: int = None, interpret: bool = False
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
  """One fused WN layer. T must be a multiple of ``tile``.

  Args:
    x:      [B, T, C] residual stream (bf16 or f32); rows >= valid_t zero.
    cond_i: [B, T, 2, C] this layer's conditioning slice (pre-activation
            conditioning, i.e. cond projection + nothing else).
    w_in:   [3, C, 2C] dilated-conv taps.
    b_in:   [2, C] or [2C] conv bias.
    w_rs:   [C, 2C] res/skip weights ([C, C] on the last layer).
    b_rs:   [2, C] / [2C] (or [C]) res/skip bias.
    skip_acc: optional [B, T, C] f32 running skip sum, accumulated in-kernel
            (the buffer is donated/aliased into the skip output).
    valid_t: rows >= valid_t of x_next are forced to zero (time padding).
  Returns:
    (x_next [B, T, C], skip [B, T, C]) — on the last layer x_next is x
    unchanged. skip is f32 when ``skip_acc`` is given, else x.dtype.
  """
  batch, t, c = x.shape
  assert t % tile == 0, f"t={t} not a multiple of tile={tile}"
  rs_out = w_rs.shape[-1]
  last_layer = rs_out == c
  b_in = b_in.reshape(-1)
  b_rs = b_rs.reshape(-1)
  n_tiles = t // tile
  aligned = dilation % MIN_ALIGNED_DILATION == 0

  if aligned:
    x_views = (jnp.pad(x, ((0, 0), (dilation, dilation), (0, 0))),)
  else:
    # Pre-shifted views so every DMA offset is the sublane-aligned i*tile.
    x_m = jnp.pad(x[:, :t - dilation, :], ((0, 0), (dilation, 0), (0, 0)))
    x_pl = jnp.pad(x[:, dilation:, :], ((0, 0), (0, dilation), (0, 0)))
    x_views = (x_m, x, x_pl)

  def kernel(*refs):
    x_refs = refs[:len(x_views)]
    rest = refs[len(x_views):]
    if skip_acc is None:
      (cond_ref, w_in_ref, b_in_ref, w_rs_ref, b_rs_ref,
       x_out_ref, skip_ref, scratch, sems) = rest
      acc_ref = None
    else:
      (cond_ref, w_in_ref, b_in_ref, w_rs_ref, b_rs_ref, acc_ref,
       x_out_ref, skip_ref, scratch, sems) = rest
    _body(x_refs, cond_ref, w_in_ref, b_in_ref, w_rs_ref, b_rs_ref, acc_ref,
          x_out_ref, skip_ref, scratch, sems, dilation=dilation, tile=tile,
          channels=c, last_layer=last_layer, n_tiles=n_tiles,
          valid_t=valid_t, aligned=aligned)

  tile_spec = pl.BlockSpec((None, tile, c),
                           lambda n: (n // n_tiles, n % n_tiles, 0))
  in_specs = (
      [pl.BlockSpec(memory_space=pl.ANY)] * len(x_views) + [
          pl.BlockSpec((None, tile, 2, c),
                       lambda n: (n // n_tiles, n % n_tiles, 0, 0)),
          pl.BlockSpec((3, c, 2 * c), lambda n: (0, 0, 0)),
          pl.BlockSpec((2 * c,), lambda n: (0,)),
          pl.BlockSpec((c, rs_out), lambda n: (0, 0)),
          pl.BlockSpec((rs_out,), lambda n: (0,)),
      ])
  inputs = list(x_views) + [cond_i, w_in, b_in, w_rs, b_rs]
  aliases = {}
  skip_dtype = jnp.float32 if skip_f32 else x.dtype
  if skip_acc is not None:
    in_specs.append(tile_spec)
    inputs.append(skip_acc)
    aliases = {len(inputs) - 1: 1}  # skip_acc buffer becomes the skip output
    skip_dtype = skip_acc.dtype

  flops_per_step = 2 * tile * c * (3 * 2 * c + rs_out)
  x_next, skip = pl.pallas_call(
      kernel,
      grid=(batch * n_tiles,),
      in_specs=in_specs,
      out_specs=(tile_spec, tile_spec),
      out_shape=(
          jax.ShapeDtypeStruct((batch, t, c), x.dtype),
          jax.ShapeDtypeStruct((batch, t, c), skip_dtype),
      ),
      scratch_shapes=[
          pltpu.VMEM((2, 3, tile, c), x.dtype),
          pltpu.SemaphoreType.DMA((2, 3)),
      ],
      input_output_aliases=aliases,
      cost_estimate=pl.CostEstimate(
          flops=batch * n_tiles * flops_per_step,
          bytes_accessed=(3 * x.size + cond_i.size + 2 * batch * t * c)
          * x.dtype.itemsize,
          transcendentals=2 * batch * t * c,
      ),
      interpret=interpret,
  )(*inputs)

  return x_next, skip
