"""Bench: long-utterance synthesis, one-call vs constant-memory chunked.

Usage: python scripts/bench_chunked.py [--minutes 1] [--chunk 1024]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--minutes", type=float, default=1.0)
  ap.add_argument("--chunk", type=int, default=1024)
  ap.add_argument("--iters", type=int, default=3)
  ap.add_argument("--skip-full", action="store_true")
  args = ap.parse_args()

  import jax
  import jax.numpy as jnp
  from waveglow_tpu.hparams import HParams
  from waveglow_tpu.inference.streaming import (block_noise, infer_chunked,
                                                receptive_halo_frames)
  from waveglow_tpu.models.waveglow import (WaveGlowConfig,
                                            fuse_for_inference, infer,
                                            init_params)

  hp = HParams()
  config = WaveGlowConfig.from_hparams(hp)
  frames = int(args.minutes * 60 * hp.sampling_rate / hp.hop_length)
  frames -= frames % 8
  audio_s = frames * hp.hop_length / hp.sampling_rate
  print(f"utterance: {frames} frames = {audio_s:.1f}s; "
        f"halo {receptive_halo_frames(config)} frames; chunk {args.chunk}")

  params = jax.device_put(fuse_for_inference(init_params(config, seed=0)))
  rng = np.random.default_rng(0)
  mel = jnp.asarray(rng.standard_normal((1, 80, frames)).astype(np.float32))
  key = jax.random.PRNGKey(0)

  def bench(name, fn):
    wav = fn()
    s = float(wav.astype(jnp.float32).sum())  # force full execution
    t0 = time.perf_counter()
    for _ in range(args.iters):
      wav = fn()
    float(wav.astype(jnp.float32).sum())
    dt = (time.perf_counter() - t0) / args.iters
    print(f"{name}: {audio_s / dt:8.1f} audio-sec/s  ({dt * 1e3:.0f} ms/call,"
          f" checksum {s:.3f})")
    return wav

  w_c = bench("chunked ", lambda: infer_chunked(
      params, config, mel, rng=key, chunk_frames=args.chunk,
      compute_dtype=jnp.bfloat16, scan_flows=True))

  if not args.skip_full:
    noise = block_noise(key, config, 1, 0, frames)
    w_f = bench("one-call", lambda: infer(
        params, config, mel, noise=noise, compute_dtype=jnp.bfloat16,
        scan_flows=True))
    err = float(jnp.max(jnp.abs(w_c.astype(jnp.float32)
                                - w_f.astype(jnp.float32))))
    print(f"max|chunked - one-call| = {err:.2e} (bf16 path)")


if __name__ == "__main__":
  main()
