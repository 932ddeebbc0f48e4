"""End-to-end training throughput INCLUDING the real host data pipeline.

The device-only training bench (bench.py --train) feeds a pre-staged tensor;
this script proves the host side keeps up (SURVEY §7 hard part 6): it
generates a real wav folder, streams it through SegmentDataset + BatchLoader
(native C++ batch decode + prefetch thread), and times the same jitted train
step fed from the loader.

Prints one JSON line per batch-size config:
  {"config": ..., "e2e_samples_per_sec": ..., "loader_samples_per_sec": ...,
   "device_samples_per_sec": ...}
where loader_* is the host pipeline alone (no device work) and device_* is
the step alone on a pre-staged batch — e2e should sit at ~device rate when
the prefetch thread hides the host work.

Usage:
  python scripts/bench_train_e2e.py                   # default: batch 8 + 24
  python scripts/bench_train_e2e.py --save benchmarks/train_e2e.json
"""

import argparse
import json
import sys
import time
import wave
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

FIXTURE_SAMPLES = 211_357  # the reference res/audio.wav length (9.585 s)


def generate_dataset(folder: Path, n_files: int, sampling_rate: int) -> None:
  folder.mkdir(parents=True, exist_ok=True)
  rng = np.random.default_rng(0)
  for i in range(n_files):
    path = folder / f"utt{i:04d}.wav"
    if path.exists():
      continue
    data = (rng.uniform(-0.3, 0.3, FIXTURE_SAMPLES) *
            np.iinfo(np.int16).max).astype(np.int16)
    with wave.open(str(path), "wb") as f:
      f.setnchannels(1)
      f.setsampwidth(2)
      f.setframerate(sampling_rate)
      f.writeframes(data.tobytes())


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--data-dir", type=Path,
                  default=Path("/tmp/waveglow_e2e_data"))
  ap.add_argument("--files", type=int, default=100)
  ap.add_argument("--configs", default="batch_size=8;batch_size=24,grad_accum=3",
                  help="semicolon-separated hparam override strings")
  ap.add_argument("--iters", type=int, default=10,
                  help="timed steps per config (after one warmup/compile)")
  ap.add_argument("--dtype", default="bfloat16")
  ap.add_argument("--save", type=Path, default=None,
                  help="also write the result rows to this JSON file")
  ap.add_argument("--platform", default=None,
                  help="force the jax platform (e.g. cpu for smoke runs)")
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

  from waveglow_tpu import native
  from waveglow_tpu.dsp.mel import MelSTFT
  from waveglow_tpu.hparams import (HParams, overwrite_custom_hparams,
                                    parse_custom_hparams)
  from waveglow_tpu.models.waveglow import WaveGlowConfig, init_params
  from waveglow_tpu.training.data import (BatchLoader, SegmentDataset,
                                          load_dataset)
  from waveglow_tpu.training.step import (init_state, make_optimizer,
                                          make_train_step)

  generate_dataset(args.data_dir, args.files, HParams().sampling_rate)
  entries = load_dataset(args.data_dir)

  rows = []
  base_params = None
  base_config = None
  for spec in args.configs.split(";"):
    spec = spec.strip()
    if not spec:
      continue
    hp = overwrite_custom_hparams(
        HParams(), {"compute_dtype": args.dtype, **parse_custom_hparams(spec)})
    config = WaveGlowConfig.from_hparams(hp)
    if base_params is None or config != base_config:
      base_params = init_params(config, seed=0)
      base_config = config

    dataset = SegmentDataset(entries, hp)
    loader = BatchLoader(dataset, hp.batch_size, drop_last=True, prefetch=2)
    steps_per_epoch = len(loader)

    def batches(n):
      """n loader batches, spanning epochs (each epoch re-crops)."""
      got = 0
      epoch = 0
      while got < n:
        for b in loader.epoch(epoch):
          yield b
          got += 1
          if got >= n:
            return
        epoch += 1

    # --- host pipeline alone ---------------------------------------------
    next(batches(1))  # touch files once (header cache, page cache)
    t0 = time.perf_counter()
    n_loader = max(args.iters, 2 * steps_per_epoch)
    for _ in batches(n_loader):
      pass
    loader_elapsed = time.perf_counter() - t0
    loader_rate = hp.batch_size * n_loader / loader_elapsed

    # --- device step alone -------------------------------------------------
    mel_op = MelSTFT(hp)
    optimizer = make_optimizer(hp.learning_rate)
    state = init_state(jax.device_put(base_params), optimizer)
    step = make_train_step(config, hp, mel_op, optimizer)
    staged = jnp.asarray(next(batches(1)))
    state, loss = step(state, staged)  # compile
    float(loss)
    t0 = time.perf_counter()
    for _ in range(args.iters):
      state, loss = step(state, staged)
    float(loss)
    device_rate = hp.batch_size * args.iters / (time.perf_counter() - t0)

    # --- end to end: loader -> device_put -> step --------------------------
    state = init_state(jax.device_put(base_params), optimizer)
    it = batches(args.iters + 1)
    state, loss = step(state, jnp.asarray(next(it)))  # warm
    float(loss)
    t0 = time.perf_counter()
    for batch in it:
      state, loss = step(state, jnp.asarray(batch))
    float(loss)
    e2e_elapsed = time.perf_counter() - t0
    e2e_rate = hp.batch_size * args.iters / e2e_elapsed

    row = {
        "config": spec,
        "dtype": args.dtype,
        "files": len(entries),
        "native_loader": bool(native.native_available()),
        "e2e_samples_per_sec": round(e2e_rate, 2),
        "device_samples_per_sec": round(device_rate, 2),
        "loader_samples_per_sec": round(loader_rate, 2),
        "host_feed_headroom": round(loader_rate / device_rate, 2),
        "e2e_vs_device": round(e2e_rate / device_rate, 3),
        "loss_finite": bool(np.isfinite(float(loss))),
        "platform": jax.devices()[0].platform,
    }
    rows.append(row)
    print(json.dumps(row), flush=True)
    del state, step

  if args.save:
    args.save.parent.mkdir(parents=True, exist_ok=True)
    args.save.write_text(json.dumps(rows, indent=1) + "\n")


if __name__ == "__main__":
  main()
