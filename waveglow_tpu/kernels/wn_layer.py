"""Pallas TPU kernel: one fused WN layer (dilated conv + gate + res/skip).

The XLA path materializes three HBM round-trips per WN layer: the gate
pre-activations [B, T, 2C], the gated activations [B, T, C], and the
res/skip output [B, T, 2C]. This kernel keeps all of them in VMEM for a
time tile, so per layer only the residual stream, conditioning slice and
skip tile touch HBM, and the VPU gate work overlaps the MXU matmuls across
the tile pipeline.

Math (identical to waveglow_tpu.models.wn.wn_forward's layer body,
reference model.py:123-135):

  pre  = sum_tap  x[t + (tap-1)*d] @ w_in[tap]           (3-tap dilated conv)
  gate = tanh(pre_t + b_t + cond_t) * sigmoid(pre_s + b_s + cond_s)
  rs   = gate @ w_rs + b_rs
  x'   = x + rs[..., :C]   (all but last layer)
  skip = rs[..., C:]       (or rs on the last layer)

Grid: (batch, time-tiles). The residual stream x lives in HBM (ANY) and the
kernel DMAs an overlapping ``tile + 2*dilation`` window into VMEM scratch —
halo windows cannot be expressed with block-granular BlockSpecs.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 1024
MIN_ALIGNED_DILATION = 8


def _kernel(x_hbm, cond_ref, w_in_ref, b_in_ref, w_rs_ref, b_rs_ref,
            x_out_ref, skip_ref, x_scratch, sems, *, dilation: int, tile: int,
            channels: int, last_layer: bool):
  c = channels
  b = pl.program_id(0)
  i = pl.program_id(1)

  # One DMA per tap into its own aligned scratch slab: DMA engines handle
  # arbitrary HBM offsets, whereas sublane-misaligned VMEM slice reads
  # (x_scratch[d:d+tile] for small d) crash the Mosaic compiler.
  copies = []
  for tap in range(3):
    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * tile + tap * dilation, tile), :],
        x_scratch.at[tap], sems.at[tap])
    copy.start()
    copies.append(copy)
  for copy in copies:
    copy.wait()

  pre = jnp.dot(x_scratch[0], w_in_ref[0],
                preferred_element_type=jnp.float32)
  pre += jnp.dot(x_scratch[1], w_in_ref[1],
                 preferred_element_type=jnp.float32)
  pre += jnp.dot(x_scratch[2], w_in_ref[2],
                 preferred_element_type=jnp.float32)
  pre += b_in_ref[:].astype(jnp.float32)
  gates = pre + cond_ref[:].reshape(tile, 2 * c).astype(jnp.float32)

  acts = jnp.tanh(gates[:, :c]) * jax.nn.sigmoid(gates[:, c:])
  acts = acts.astype(x_out_ref.dtype)

  rs = jnp.dot(acts, w_rs_ref[:], preferred_element_type=jnp.float32)
  rs += b_rs_ref[:].astype(jnp.float32)

  x_center = x_scratch[1]  # the zero-offset tap is the residual itself
  if last_layer:
    x_out_ref[:] = x_center
    skip_ref[:] = rs.astype(skip_ref.dtype)
  else:
    x_out_ref[:] = (x_center.astype(jnp.float32)
                    + rs[:, :c]).astype(x_out_ref.dtype)
    skip_ref[:] = rs[:, c:].astype(skip_ref.dtype)


def wn_layer_fused(x: jnp.ndarray, cond_i: jnp.ndarray, w_in: jnp.ndarray,
                   b_in: jnp.ndarray, w_rs: jnp.ndarray, b_rs: jnp.ndarray,
                   dilation: int, tile: int = DEFAULT_TILE,
                   interpret: bool = None
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
  if interpret is None:
    # Mosaic lowering needs a real TPU; everywhere else use the interpreter.
    interpret = jax.devices()[0].platform != "tpu"
  return _wn_layer_fused(x, cond_i, w_in, b_in, w_rs, b_rs,
                         dilation=dilation, tile=tile, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("dilation", "tile", "interpret"))
def _wn_layer_fused(x: jnp.ndarray, cond_i: jnp.ndarray, w_in: jnp.ndarray,
                    b_in: jnp.ndarray, w_rs: jnp.ndarray, b_rs: jnp.ndarray,
                    dilation: int, tile: int = DEFAULT_TILE,
                    interpret: bool = False
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
  """One fused WN layer.

  Args:
    x:      [B, T, C] residual stream (bf16 or f32).
    cond_i: [B, T, 2, C] this layer's conditioning slice (pre-activation
            conditioning, i.e. cond projection + nothing else).
    w_in:   [3, C, 2C] dilated-conv taps.
    b_in:   [2, C] or [2C] conv bias.
    w_rs:   [C, 2C] res/skip weights ([C, C] on the last layer).
    b_rs:   [2, C] / [2C] (or [C]) res/skip bias.
  Returns:
    (x_next [B, T, C], skip [B, T, C]) — on the last layer x_next is x
    unchanged and skip has C columns.
  """
  if not interpret:
    assert dilation % MIN_ALIGNED_DILATION == 0, (
        f"dilation {dilation} < {MIN_ALIGNED_DILATION}: sublane-misaligned "
        "windows crash the TPU compiler; use the XLA path")
  batch, t, c = x.shape
  rs_out = w_rs.shape[-1]
  last_layer = rs_out == c
  b_in = b_in.reshape(-1)
  b_rs = b_rs.reshape(-1)

  t_pad = (-t) % tile
  n_tiles = (t + t_pad) // tile
  x_p = jnp.pad(x, ((0, 0), (dilation, dilation + t_pad), (0, 0)))
  cond_p = jnp.pad(cond_i, ((0, 0), (0, t_pad), (0, 0), (0, 0)))

  kernel = functools.partial(_kernel, dilation=dilation, tile=tile,
                             channels=c, last_layer=last_layer)

  x_next, skip = pl.pallas_call(
      kernel,
      grid=(batch, n_tiles),
      in_specs=[
          pl.BlockSpec(memory_space=pl.ANY),                    # x (HBM)
          pl.BlockSpec((None, tile, 2, c), lambda b, i: (b, i, 0, 0)),
          pl.BlockSpec((3, c, 2 * c), lambda b, i: (0, 0, 0)),
          pl.BlockSpec((2 * c,), lambda b, i: (0,)),
          pl.BlockSpec((c, rs_out), lambda b, i: (0, 0)),
          pl.BlockSpec((rs_out,), lambda b, i: (0,)),
      ],
      out_specs=(
          pl.BlockSpec((None, tile, c), lambda b, i: (b, i, 0)),
          pl.BlockSpec((None, tile, c), lambda b, i: (b, i, 0)),
      ),
      out_shape=(
          jax.ShapeDtypeStruct((batch, t + t_pad, c), x.dtype),
          jax.ShapeDtypeStruct((batch, t + t_pad, c), x.dtype),
      ),
      scratch_shapes=[
          pltpu.VMEM((3, tile, c), x.dtype),
          pltpu.SemaphoreType.DMA((3,)),
      ],
      interpret=interpret,
  )(x_p, cond_p, w_in, b_in, w_rs, b_rs)

  return x_next[:, :t, :], skip[:, :t, :]
