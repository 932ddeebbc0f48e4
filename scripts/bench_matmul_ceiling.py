"""Measure the pure-matmul ceiling for the WN stack's three shapes, plus
elementwise-op costs, to locate the model's MXU-utilization gap.

The model runs ~92 effective TFLOPs (47% of v5e bf16 peak). If the bare
matmuls at the model's own shapes also top out near that, the 47% is a
shape/bandwidth ceiling and further stack fusion can't pay; if they run much
faster, the gap is fusable overhead.

Usage: python scripts/bench_matmul_ceiling.py [--rows 211456]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--rows", type=int, default=8 * 26432)
  ap.add_argument("--iters", type=int, default=20)
  args = ap.parse_args()

  import jax
  import jax.numpy as jnp

  rows = args.rows
  rng = np.random.default_rng(0)

  def timeit(fn, *xs):
    out = fn(*xs)
    float(out.astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(args.iters):
      out = fn(*xs)
    float(out.astype(jnp.float32).sum())
    return (time.perf_counter() - t0) / args.iters

  # the WN stack's matmul shapes (bf16 in, bf16 out)
  shapes = [
      ("in_layer  [R,768]@[768,512]", (rows, 768), (768, 512)),
      ("cond      [R,640]@[640,512]", (rows, 640), (640, 512)),
      ("res_skip  [R,256]@[256,512]", (rows, 256), (256, 512)),
  ]
  for name, (m, k), (_, n) in shapes:
    a = jnp.asarray(rng.standard_normal((m, k)), dtype=jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((k, n)), dtype=jnp.bfloat16)
    f = jax.jit(lambda a, b: jnp.dot(a, b,
                                     preferred_element_type=jnp.bfloat16))
    dt = timeit(f, a, b)
    tflops = 2 * m * k * n / dt / 1e12
    print(f"{name}: {dt * 1e3:7.3f} ms  {tflops:6.1f} TFLOPs")

  # one full WN layer's matmul WORK only, chained like the model (same
  # dependency structure, zero gate/add/shift work)
  x = jnp.asarray(rng.standard_normal((rows, 768)), dtype=jnp.bfloat16)
  w1 = jnp.asarray(rng.standard_normal((768, 512)), dtype=jnp.bfloat16)
  wc = jnp.asarray(rng.standard_normal((640, 512)), dtype=jnp.bfloat16)
  sp = jnp.asarray(rng.standard_normal((rows, 640)), dtype=jnp.bfloat16)
  w2 = jnp.asarray(rng.standard_normal((256, 512)), dtype=jnp.bfloat16)

  def layer_mms(x, sp, w1, wc, w2):
    pre = jnp.dot(x, w1, preferred_element_type=jnp.bfloat16)
    cond = jnp.dot(sp, wc, preferred_element_type=jnp.bfloat16)
    g = pre + cond
    return jnp.dot(g[:, :256], w2, preferred_element_type=jnp.bfloat16)

  dt = timeit(jax.jit(layer_mms), x, sp, w1, wc, w2)
  fl = 2 * rows * (768 * 512 + 640 * 512 + 256 * 512)
  print(f"layer matmuls only:          {dt * 1e3:7.3f} ms  "
        f"{fl / dt / 1e12:6.1f} TFLOPs")

  # gate cost on its own (VPU): tanh*sigmoid over [R, 512] bf16
  g = jnp.asarray(rng.standard_normal((rows, 512)), dtype=jnp.bfloat16)

  def gate(g):
    return jnp.tanh(g[:, :256]) * jax.nn.sigmoid(g[:, 256:])

  dt = timeit(jax.jit(gate), g)
  print(f"gate (tanh*sig) [R,512]:     {dt * 1e3:7.3f} ms")

  # f32 add chain (the residual/skip updates): x + y at [R, 256] f32
  xf = jnp.asarray(rng.standard_normal((rows, 256)), dtype=jnp.float32)
  yf = jnp.asarray(rng.standard_normal((rows, 256)), dtype=jnp.float32)
  dt = timeit(jax.jit(jnp.add), xf, yf)
  print(f"f32 add [R,256]:             {dt * 1e3:7.3f} ms")
  dt = timeit(jax.jit(jnp.add), xf.astype(jnp.bfloat16),
              yf.astype(jnp.bfloat16))
  print(f"bf16 add [R,256]:            {dt * 1e3:7.3f} ms")


if __name__ == "__main__":
  main()
