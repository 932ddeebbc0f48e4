"""Training-step sweep on the TPU: batch size x remat scope x grad accum
x pallas, one process, one JSON line per config.

Usage:
  python scripts/bench_train_sweep.py                     # default grid
  python scripts/bench_train_sweep.py --configs "batch_size=24;batch_size=24,remat_scope=wn"
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

DEFAULT_GRID = [
    "batch_size=8",
    "batch_size=8,remat_scope=wn",
    "batch_size=8,remat=false",
    "batch_size=24",
    "batch_size=24,remat_scope=wn",
    "batch_size=24,grad_accum=3",
]


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--configs", default=";".join(DEFAULT_GRID),
                  help="semicolon-separated hparam override strings")
  ap.add_argument("--iters", type=int, default=5)
  ap.add_argument("--dtype", default="bfloat16")
  args = ap.parse_args()

  import jax
  import jax.numpy as jnp

  try:
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/waveglow_tpu_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
  except Exception:
    pass

  from waveglow_tpu.dsp.mel import MelSTFT
  from waveglow_tpu.hparams import (HParams, overwrite_custom_hparams,
                                    parse_custom_hparams)
  from waveglow_tpu.models.waveglow import WaveGlowConfig, init_params
  from waveglow_tpu.training.step import (init_state, make_optimizer,
                                          make_train_step)

  rng = np.random.default_rng(0)
  base_params = None

  for spec in args.configs.split(";"):
    spec = spec.strip()
    if not spec:
      continue
    hp = overwrite_custom_hparams(
        HParams(), {"compute_dtype": args.dtype,
                    **parse_custom_hparams(spec)})
    config = WaveGlowConfig.from_hparams(hp)
    if base_params is None:
      base_params = init_params(config, seed=0)
    try:
      mel_op = MelSTFT(hp)
      optimizer = make_optimizer(hp.learning_rate)
      state = init_state(jax.device_put(base_params), optimizer)
      step = make_train_step(config, hp, mel_op, optimizer)
      audio = jnp.asarray(rng.uniform(
          -0.5, 0.5, (hp.batch_size, hp.segment_length)).astype(np.float32))

      t_c0 = time.perf_counter()
      state, loss = step(state, audio)
      float(loss)
      compile_s = time.perf_counter() - t_c0

      t0 = time.perf_counter()
      for _ in range(args.iters):
        state, loss = step(state, audio)
      float(loss)
      elapsed = time.perf_counter() - t0
      print(json.dumps({
          "config": spec,
          "samples_per_sec": round(hp.batch_size * args.iters / elapsed, 2),
          "step_seconds": round(elapsed / args.iters, 4),
          "compile_plus_first_step_s": round(compile_s, 1),
          "loss_finite": bool(np.isfinite(float(loss))),
      }), flush=True)
      del state, step
    except Exception as e:
      print(json.dumps({"config": spec,
                        "error": f"{type(e).__name__}: {str(e)[:300]}"}),
            flush=True)


if __name__ == "__main__":
  main()
