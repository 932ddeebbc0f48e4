"""Per-stage synthesis time breakdown on the TPU (MFU audit).

Decomposes the headline audio-sec/s number into its pipeline stages —
upsample/unfold, noise generation, WN stacks, inv1x1 reverses, coupling
elementwise — each timed as its own jitted program at the production shapes,
and compares the stage sum against the measured whole-model time. Stage
programs carry per-execution dispatch overhead the fused model amortizes
(docs/PERFORMANCE.md "ceiling" section), so the sum is an UPPER bound on
the true per-stage cost; the interesting signal is the ratio between rows.

Prints one JSON line per stage plus a whole-model reference row.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def timeit(fn, *args, iters=5):
  out = fn(*args)
  jax_fetch(out)
  t0 = time.perf_counter()
  for _ in range(iters):
    out = fn(*args)
  jax_fetch(out)
  return (time.perf_counter() - t0) / iters


def jax_fetch(out):
  import jax
  leaves = jax.tree_util.tree_leaves(out)
  float(leaves[0].sum())  # force full execution + host fetch


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--batch", type=int, default=8)
  ap.add_argument("--frames", type=int, default=826)
  ap.add_argument("--iters", type=int, default=5)
  ap.add_argument("--dtype", default="bfloat16")
  ap.add_argument("--platform", default=None)
  args = ap.parse_args()

  import jax
  if args.platform:
    jax.config.update("jax_platforms", args.platform)
  import jax.numpy as jnp

  try:
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/waveglow_tpu_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
  except Exception:
    pass

  from waveglow_tpu.hparams import HParams, overwrite_custom_hparams
  from waveglow_tpu.models.waveglow import (UPSAMPLE_KERNEL, UPSAMPLE_STRIDE,
                                            WaveGlowConfig, block_noise,
                                            fuse_for_inference, infer,
                                            infer_noise_shapes, init_params,
                                            unfold_groups, upsample_mel)
  from waveglow_tpu.models.wn import wn_forward
  from waveglow_tpu.ops import inv1x1

  hp = overwrite_custom_hparams(HParams(), {"compute_dtype": args.dtype})
  config = WaveGlowConfig.from_hparams(hp)
  cdt = jnp.bfloat16 if args.dtype == "bfloat16" else None

  params = jax.device_put(fuse_for_inference(init_params(config, seed=0)))
  rng = np.random.default_rng(0)
  mel = jnp.asarray(rng.standard_normal(
      (args.batch, hp.n_mel_channels, args.frames)).astype(np.float32))
  key = jax.random.PRNGKey(0)

  n_groups = (args.frames * UPSAMPLE_STRIDE) // config.n_group
  rows = []

  def report(stage, seconds, note=""):
    row = {"stage": stage, "ms": round(seconds * 1e3, 2), "note": note}
    rows.append(row)
    print(json.dumps(row), flush=True)

  # --- whole model (the headline path) -------------------------------------
  whole = jax.jit(lambda p, m, k: infer(p, config, m, sigma=1.0, rng=k,
                                        compute_dtype=cdt,
                                        scan_flows=hp.scan_flows))
  t_whole = timeit(whole, params, mel, key, iters=args.iters)
  report("whole_model", t_whole,
         f"{args.batch * args.frames * UPSAMPLE_STRIDE / hp.sampling_rate / t_whole:.1f} audio-sec/s")

  # --- upsample + trim + unfold ---------------------------------------------
  def up_fn(p, m):
    up = upsample_mel(p, m, cdt)
    up = up[:, :-(UPSAMPLE_KERNEL - UPSAMPLE_STRIDE), :]
    return unfold_groups(up[:, :n_groups * config.n_group, :], config.n_group)
  up_jit = jax.jit(up_fn)
  report("upsample_unfold", timeit(up_jit, params, mel, iters=args.iters))
  spect_g = up_jit(params, mel)

  # --- noise generation ------------------------------------------------------
  gpf = UPSAMPLE_STRIDE // config.n_group
  noise_jit = jax.jit(lambda k: block_noise(k, config, args.batch, 0,
                                            n_groups // gpf))
  report("noise_generation", timeit(noise_jit, key, iters=args.iters),
         f"{len(infer_noise_shapes(config, args.batch, n_groups))} tensors")

  # --- one WN stack at full width (n_half=4) --------------------------------
  audio_half = jnp.asarray(rng.standard_normal(
      (args.batch, n_groups, config.n_group // 2)).astype(np.float32))
  wn_jit = jax.jit(lambda p, a, s: wn_forward(
      p, a, s, config.n_channels, config.n_layers, config.kernel_size,
      compute_dtype=cdt))
  t_wn = timeit(wn_jit, params["flows"][0]["wn"], audio_half, spect_g,
                iters=args.iters)
  report("wn_stack_one_flow", t_wn,
         f"x{config.n_flows} flows ~= {t_wn * config.n_flows * 1e3:.1f} ms")

  # --- inv1x1 reverse x n_flows ----------------------------------------------
  audio_g = jnp.asarray(rng.standard_normal(
      (args.batch, n_groups, config.n_group)).astype(np.float32))

  def inv_fn(p, a):
    for flow in p["flows"]:
      w_inv = flow["inv1x1"]["w_inv"]
      pad = a.shape[-1] - w_inv.shape[0]
      a = a.at[..., pad:].set(
          inv1x1.reverse(a[..., pad:], w_inv))
    return a
  report("inv1x1_reverse_all_flows",
         timeit(jax.jit(inv_fn), params, audio_g, iters=args.iters))

  # --- coupling elementwise x n_flows ---------------------------------------
  b_s = jnp.asarray(rng.standard_normal(
      (args.batch, n_groups, config.n_group)).astype(np.float32))

  def coupling_fn(a, bs):
    for _ in range(config.n_flows):
      half = a.shape[-1] // 2
      a1 = (a[..., half:] - bs[..., :half]) * jnp.exp(-bs[..., half:])
      a = jnp.concatenate([a[..., :half], a1], axis=-1)
    return a
  report("coupling_elementwise_all_flows",
         timeit(jax.jit(coupling_fn), audio_g, b_s, iters=args.iters))

  stage_sum = sum(r["ms"] for r in rows[1:])
  wn_total = next(r["ms"] for r in rows if r["stage"] == "wn_stack_one_flow"
                  ) * (config.n_flows - 1)
  print(json.dumps({
      "stage": "SUMMARY",
      "whole_model_ms": rows[0]["ms"],
      "stage_sum_ms": round(stage_sum + wn_total, 2),
      "note": "stage sum counts wn_stack x n_flows; independent-program "
              "dispatch overhead makes the sum an upper bound",
  }), flush=True)


if __name__ == "__main__":
  main()
