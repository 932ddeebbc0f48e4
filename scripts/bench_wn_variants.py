"""Microbench: XLA WN-stack variants on the TPU at production shapes.

Variants:
  base     - production wn_forward (separate tap + cond matmuls per layer)
  fusegate - taps+spect concatenated into ONE gate matmul per layer

MEASURED RESULT (v5e, batch 8 x 26432 x 256 bf16, 2026-08-18):
  base 32.07 ms, fusegate 35.20 ms (0.91x) — a DEAD END. XLA already fuses
  the cond add into a matmul epilogue, so the single wide matmul only adds
  a fatter [B, T, 3C+M] concat write. Kept here as the reproducible record;
  the production path stays on separate matmuls (docs/PERFORMANCE.md).

Usage: python scripts/bench_wn_variants.py [--iters 10]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def wn_forward_fusegate(params, audio0, spect, c, n_layers, compute_dtype):
  """wn_forward with taps+spect fused into one gate matmul per layer."""
  import jax
  import jax.numpy as jnp
  from waveglow_tpu.models.weightnorm import materialize
  from waveglow_tpu.ops.conv import _mm, conv1x1, shift_time

  x = conv1x1(audio0, materialize(params["start"]), params["start"]["b"],
              compute_dtype=compute_dtype, out_dtype=jnp.float32)
  w_cond = materialize(params["cond"])
  spect_mm = spect if compute_dtype is None else spect.astype(compute_dtype)

  output = None
  for i in range(n_layers):
    dilation = 2 ** i
    in_layer = params["in_layers"][i]
    w_in = materialize(in_layer).reshape(3, c, 2 * c)
    x_mm = x if compute_dtype is None else x.astype(compute_dtype)
    shifted = [shift_time(x_mm, (tap - 1) * dilation) for tap in range(3)]
    taps_spect = jnp.concatenate(shifted + [spect_mm], axis=-1)
    w_comb = jnp.concatenate(
        [w_in.reshape(3 * c, 2 * c),
         w_cond[:, i].reshape(-1, 2 * c)], axis=0).astype(taps_spect.dtype)
    gates = _mm(taps_spect, w_comb, compute_dtype)
    gates = (gates.reshape(gates.shape[:-1] + (2, c))
             + in_layer["b"].astype(gates.dtype)
             + params["cond"]["b"][i].astype(gates.dtype))
    acts = jnp.tanh(gates[..., 0, :]) * jax.nn.sigmoid(gates[..., 1, :])

    res_skip = params["res_skip"][i]
    w_rs = materialize(res_skip)
    if i < n_layers - 1:
      rs = _mm(acts, w_rs.reshape(c, 2 * c), compute_dtype)
      rs = rs.reshape(rs.shape[:-1] + (2, c)) + res_skip["b"].astype(rs.dtype)
      x = x + rs[..., 0, :].astype(jnp.float32)
      skip = rs[..., 1, :]
    else:
      skip = _mm(acts, w_rs, compute_dtype) + res_skip["b"].astype(
          jnp.float32 if compute_dtype is None else compute_dtype)
    skip = skip.astype(jnp.float32)
    output = skip if output is None else output + skip

  return conv1x1(output, params["end"]["w"], params["end"]["b"],
                 compute_dtype=compute_dtype, out_dtype=jnp.float32)


def wn_forward_bf16_residual(params, audio0, spect, c, n_layers,
                             compute_dtype):
  """wn_forward with the residual stream x kept in bf16 (not f32)."""
  import jax
  import jax.numpy as jnp
  from waveglow_tpu.models.weightnorm import materialize
  from waveglow_tpu.ops.conv import _mm, conv1x1, shift_time

  x = conv1x1(audio0, materialize(params["start"]), params["start"]["b"],
              compute_dtype=compute_dtype, out_dtype=compute_dtype)
  w_cond = materialize(params["cond"])

  output = None
  for i in range(n_layers):
    dilation = 2 ** i
    in_layer = params["in_layers"][i]
    w_in = materialize(in_layer).reshape(3, c, 2 * c)
    taps = jnp.concatenate(
        [shift_time(x, (tap - 1) * dilation) for tap in range(3)], axis=-1)
    pre = _mm(taps, w_in.reshape(3 * c, 2 * c), compute_dtype)
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
      x = x + rs[..., 0, :]                      # bf16 residual update
      skip = rs[..., 1, :]
    else:
      skip = _mm(acts, w_rs, compute_dtype) + res_skip["b"].astype(
          compute_dtype)
    output = skip if output is None else output + skip  # bf16 skip acc

  return conv1x1(output, params["end"]["w"], params["end"]["b"],
                 compute_dtype=compute_dtype, out_dtype=jnp.float32)


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--batch", type=int, default=8)
  ap.add_argument("--t", type=int, default=26432)
  ap.add_argument("--c", type=int, default=256)
  ap.add_argument("--n-half", type=int, default=4)
  ap.add_argument("--layers", type=int, default=8)
  ap.add_argument("--iters", type=int, default=10)
  ap.add_argument("--dtype", default="bfloat16")
  args = ap.parse_args()

  import jax
  import jax.numpy as jnp
  from waveglow_tpu.models.wn import init_wn_params, wn_forward

  cdt = jnp.bfloat16 if args.dtype == "bfloat16" else None

  rng = np.random.default_rng(0)
  params = init_wn_params(rng, n_in_channels=args.n_half,
                          n_mel_channels=640, n_layers=args.layers,
                          n_channels=args.c, kernel_size=3,
                          weight_norm=False)
  params["end"]["w"] = rng.standard_normal(
      params["end"]["w"].shape).astype(np.float32) * 0.01
  params = jax.device_put(params)

  audio0 = jnp.asarray(
      rng.standard_normal((args.batch, args.t, args.n_half)) * 0.3,
      dtype=jnp.float32)
  spect = jnp.asarray(rng.standard_normal((args.batch, args.t, 640)) * 0.3,
                      dtype=jnp.bfloat16 if cdt is not None else jnp.float32)

  def timeit(fn):
    out = fn(params, audio0, spect)
    float(out.astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(args.iters):
      out = fn(params, audio0, spect)
    float(out.astype(jnp.float32).sum())
    return (time.perf_counter() - t0) / args.iters * 1e3, out

  base_fn = jax.jit(lambda p, a, s: wn_forward(
      p, a, s, args.c, args.layers, 3, compute_dtype=cdt))
  fuse_fn = jax.jit(lambda p, a, s: wn_forward_fusegate(
      p, a, s, args.c, args.layers, cdt))
  bf16x_fn = jax.jit(lambda p, a, s: wn_forward_bf16_residual(
      p, a, s, args.c, args.layers, cdt or jnp.float32))

  t_base, o_base = timeit(base_fn)
  t_fuse, o_fuse = timeit(fuse_fn)
  t_bf16, o_bf16 = timeit(bf16x_fn)
  err = float(jnp.max(jnp.abs(o_fuse - o_base)))
  err_b = float(jnp.max(jnp.abs(o_bf16 - o_base)))
  print(f"base       {t_base:7.2f} ms")
  print(f"fusegate   {t_fuse:7.2f} ms   speedup {t_base / t_fuse:5.2f}x   "
        f"max|diff| {err:.2e}")
  print(f"bf16-resid {t_bf16:7.2f} ms   speedup {t_base / t_bf16:5.2f}x   "
        f"max|diff| {err_b:.2e}")


if __name__ == "__main__":
  main()
