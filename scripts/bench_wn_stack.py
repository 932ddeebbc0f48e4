"""Microbench: one full WN stack (start + 8 fused layers + end) on the TPU.

Compares wn_forward(use_pallas=False) vs use_pallas=True at production
shapes, including the per-layer cond matmuls — the exact unit the model
runs 12x per synthesis call.

Usage: python scripts/bench_wn_stack.py [--tile 512] [--iters 10]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--batch", type=int, default=8)
  ap.add_argument("--t", type=int, default=26624)
  ap.add_argument("--c", type=int, default=256)
  ap.add_argument("--n-half", type=int, default=4)
  ap.add_argument("--layers", type=int, default=8)
  ap.add_argument("--iters", type=int, default=10)
  ap.add_argument("--tile", type=int, default=0, help="0 = kernel default")
  ap.add_argument("--valid-t", type=int, default=26432)
  args = ap.parse_args()

  import jax
  import jax.numpy as jnp
  from waveglow_tpu.models import wn as wn_mod
  from waveglow_tpu.models.weightnorm import fuse
  from waveglow_tpu.models.wn import init_wn_params, wn_forward

  if args.tile:
    import waveglow_tpu.kernels.wn_layer as kl
    kl.DEFAULT_TILE = args.tile

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
                      dtype=jnp.bfloat16)

  def run(use_pallas):
    fn = jax.jit(lambda p, a, s: wn_forward(
        p, a, s, args.c, args.layers, 3, compute_dtype=jnp.bfloat16,
        use_pallas=use_pallas,
        valid_t=args.valid_t if use_pallas else None))
    out = fn(params, audio0, spect)
    float(out.astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(args.iters):
      out = fn(params, audio0, spect)
    float(out.astype(jnp.float32).sum())
    return (time.perf_counter() - t0) / args.iters * 1e3, out

  t_xla, o_xla = run(False)
  try:
    t_pal, o_pal = run(True)
    err = float(jnp.max(jnp.abs(o_pal - o_xla)))
    print(f"tile={args.tile or 'default'}  xla {t_xla:7.2f} ms   "
          f"pallas {t_pal:7.2f} ms   speedup {t_xla / t_pal:5.2f}x   "
          f"max|diff| {err:.2e}")
  except Exception as e:
    print(f"tile={args.tile or 'default'}  xla {t_xla:7.2f} ms   "
          f"pallas FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
  main()
