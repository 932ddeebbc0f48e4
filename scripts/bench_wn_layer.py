"""Microbench: one WN layer, Pallas fused kernel vs XLA body, on the TPU.

Usage: python scripts/bench_wn_layer.py [--dilations 1,8,128] [--iters 20]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--dilations", default="1,8,128")
  ap.add_argument("--batch", type=int, default=8)
  ap.add_argument("--t", type=int, default=26432)
  ap.add_argument("--c", type=int, default=256)
  ap.add_argument("--iters", type=int, default=20)
  ap.add_argument("--tile", type=int, default=1024)
  ap.add_argument("--dtype", default="bfloat16")
  ap.add_argument("--last", action="store_true")
  args = ap.parse_args()

  import jax
  import jax.numpy as jnp
  from waveglow_tpu.kernels.wn_layer import wn_layer_fused
  from waveglow_tpu.ops.conv import _mm, shift_time

  dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
  c = args.c
  rng = np.random.default_rng(0)
  x = jnp.asarray(rng.standard_normal((args.batch, args.t, c)), dtype=dt)
  cond = jnp.asarray(
      rng.standard_normal((args.batch, args.t, 2, c)) * 0.1, dtype=dt)
  w_in = jnp.asarray(rng.standard_normal((3, c, 2 * c)) * 0.05, dtype=dt)
  b_in = jnp.asarray(rng.standard_normal((2 * c,)) * 0.01, dtype=jnp.float32)
  rs_out = c if args.last else 2 * c
  w_rs = jnp.asarray(rng.standard_normal((c, rs_out)) * 0.05, dtype=dt)
  b_rs = jnp.asarray(rng.standard_normal((rs_out,)) * 0.01, dtype=jnp.float32)

  def xla_body(x, cond, dilation):
    taps = jnp.concatenate(
        [shift_time(x, (tap - 1) * dilation) for tap in range(3)], axis=-1)
    pre = _mm(taps, w_in.reshape(3 * c, 2 * c), dt)
    pre = pre + b_in.astype(pre.dtype)
    gates = pre + cond.reshape(pre.shape).astype(pre.dtype)
    acts = jnp.tanh(gates[..., :c]) * jax.nn.sigmoid(gates[..., c:])
    rs = _mm(acts.astype(dt), w_rs, dt) + b_rs.astype(dt)
    if rs_out == c:
      return x, rs
    return (x.astype(jnp.float32) + rs[..., :c]).astype(dt), rs[..., c:]

  for d_str in args.dilations.split(","):
    d = int(d_str)
    xla_fn = jax.jit(lambda x, cond, _d=d: xla_body(x, cond, _d))
    pal_fn = jax.jit(lambda x, cond, _d=d: wn_layer_fused(
        x, cond, w_in, b_in, w_rs, b_rs, dilation=_d, tile=args.tile))

    try:
      xo = xla_fn(x, cond)
      float(xo[1].astype(jnp.float32).sum())
      t0 = time.perf_counter()
      for _ in range(args.iters):
        xo = xla_fn(x, cond)
      float(xo[1].astype(jnp.float32).sum())
      t_xla = (time.perf_counter() - t0) / args.iters * 1e3
    except Exception as e:
      print(f"d={d} XLA FAILED: {type(e).__name__}: {e}")
      continue

    try:
      po = pal_fn(x, cond)
      float(po[1].astype(jnp.float32).sum())
      err = float(jnp.max(jnp.abs(po[1].astype(jnp.float32)
                                  - xo[1].astype(jnp.float32))))
      err_x = float(jnp.max(jnp.abs(po[0].astype(jnp.float32)
                                    - xo[0].astype(jnp.float32))))
      t0 = time.perf_counter()
      for _ in range(args.iters):
        po = pal_fn(x, cond)
      float(po[1].astype(jnp.float32).sum())
      t_pal = (time.perf_counter() - t0) / args.iters * 1e3
      print(f"d={d:4d}  xla {t_xla:7.3f} ms   pallas {t_pal:7.3f} ms   "
            f"speedup {t_xla / t_pal:5.2f}x   max|skip diff| {err:.2e} "
            f"max|x diff| {err_x:.2e}")
    except Exception as e:
      print(f"d={d:4d}  xla {t_xla:7.3f} ms   pallas FAILED: "
            f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
  main()
