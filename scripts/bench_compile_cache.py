"""Measure what the persistent XLA compile cache saves a restarted daemon.

A warmed serve daemon holds one compiled program per (bucket, pow2-batch,
raw/denoised) combination at ~37 s of XLA compile each over a tunneled TPU;
a rolling restart without a persistent cache re-pays all of them. This
script measures the restart cost directly: it runs the SAME construct +
warmup sequence in two child processes (separate processes, because an
in-process second run would hit the live jit cache, not the on-disk one) —

  1. COLD: fresh cache directory -> every program compiles;
  2. WARM: same directory -> every program loads from disk.

Children run sequentially (one process per TPU). Prints one JSON line;
--save writes the artifact (committed: benchmarks/compile_cache_tpu.json).
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _child_main(args):
  import jax

  if args.platform:
    jax.config.update("jax_platforms", args.platform)
  from dataclasses import asdict

  from waveglow_tpu.compile_cache import enable_compile_cache
  from waveglow_tpu.checkpointing.store import CheckpointWaveglow
  from waveglow_tpu.hparams import HParams, overwrite_custom_hparams, \
      parse_custom_hparams
  from waveglow_tpu.inference.server import SynthesisService
  from waveglow_tpu.models.waveglow import WaveGlowConfig, init_params

  enable_compile_cache(args.cache_dir)
  hp = overwrite_custom_hparams(
      HParams(), {"compute_dtype": args.dtype,
                  **parse_custom_hparams(args.extra_hparams)})
  ckpt = CheckpointWaveglow(
      state_dict=init_params(WaveGlowConfig.from_hparams(hp), seed=0),
      optimizer=None, learning_rate=hp.learning_rate, iteration=1,
      hparams=asdict(hp))

  t0 = time.perf_counter()
  service = SynthesisService(ckpt, max_batch=args.max_batch)
  t_construct = time.perf_counter() - t0
  report = service.warmup([args.frames])
  print(json.dumps({"construct_s": round(t_construct, 1),
                    "warmup_s": report["seconds"],
                    "programs": report["programs"]}))


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--frames", type=int, default=832)
  ap.add_argument("--dtype", default="bfloat16")
  ap.add_argument("--max-batch", type=int, default=8)
  ap.add_argument("--cache-dir", default="/tmp/waveglow_cc_bench")
  ap.add_argument("--platform", default=None)
  ap.add_argument("--extra-hparams", default=None,
                  help="e.g. tiny model for CPU smoke runs")
  ap.add_argument("--save", type=Path, default=None)
  ap.add_argument("--child", action="store_true", help=argparse.SUPPRESS)
  args = ap.parse_args()

  if args.child:
    _child_main(args)
    return

  if Path(args.cache_dir).exists():
    shutil.rmtree(args.cache_dir)  # cold means COLD

  def run(tag):
    cmd = [sys.executable, __file__, "--child",
           "--frames", str(args.frames), "--dtype", args.dtype,
           "--max-batch", str(args.max_batch),
           "--cache-dir", args.cache_dir,
           "--extra-hparams", args.extra_hparams or ""]
    if args.platform:
      cmd += ["--platform", args.platform]
    t0 = time.perf_counter()
    out = subprocess.run(cmd, stdout=subprocess.PIPE, check=True,
                         env=os.environ, text=True)
    wall = time.perf_counter() - t0
    child = json.loads(out.stdout.strip().splitlines()[-1])
    child["process_wall_s"] = round(wall, 1)
    return child

  cold = run("cold")
  warm = run("warm")
  result = {
      "metric": "compile_cache_restart_savings",
      "dtype": args.dtype,
      "frames": args.frames,
      "max_batch": args.max_batch,
      "programs": cold["programs"],
      "cold": cold,
      "warm": warm,
      "warmup_speedup": round(cold["warmup_s"] / max(warm["warmup_s"], 1e-9),
                              1),
      "restart_seconds_saved": round(
          (cold["construct_s"] + cold["warmup_s"])
          - (warm["construct_s"] + warm["warmup_s"]), 1),
  }
  line = json.dumps(result)
  print(line)
  if args.save:
    args.save.parent.mkdir(parents=True, exist_ok=True)
    args.save.write_text(json.dumps(result, indent=1) + "\n")


if __name__ == "__main__":
  main()
