"""Full-scale measurement of the default bucket-padding deviation.

The `synthesize` CLI defaults to `--bucket-frames 64`: mels are padded to a
64-frame multiple with the log-clamp silence floor so a folder of N distinct
lengths costs O(distinct buckets) XLA compiles instead of N (each full-model
remote compile is ~37 s over a tunneled TPU). Position-keyed noise makes
every kept sample draw identical noise to the unbucketed call — the ONLY
deviation channel is the trailing receptive-field window seeing silence-pad
conditioning instead of the 'same'-conv zero boundary
(tests/test_serving.py::test_bucket_padding_deviation_bound pins this at toy
scale; this script measures it at FULL scale).

A fresh model cannot measure it: the zero-initialized end convs (reference
model.py:88-92) make couplings identity, so conditioning never reaches the
output. The script therefore first trains the full 12x256 model on the real
speech fixture (the train_demo recipe) until the conditioning path is live,
then synthesizes the fixture's 826-frame mel solo (exact program) and
bucket-padded to 832 with the same seed and compares:

  * body  = samples outside the trailing reach window (must be ~0 in f32;
    bf16 adds compilation-dependent rounding between the two programs)
  * tail  = the reach window n_flows * (k-1)/2 * (2^n_layers - 1) * n_group
    = 24,480 samples (1.11 s) where pad conditioning can leak in

Prints one JSON line; --save writes it to a benchmarks/ artifact.
Committed result: benchmarks/bucket_deviation_tpu.json.
"""

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent
FIXTURE = REPO / "tests" / "fixtures" / "audio.wav"


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--iterations", type=int, default=600,
                  help="training iterations to give the model a live "
                       "conditioning path before measuring")
  ap.add_argument("--workdir", type=Path,
                  default=Path("/tmp/waveglow_bucket_dev"))
  ap.add_argument("--checkpoint", type=Path, default=None,
                  help="skip training, measure this checkpoint instead")
  ap.add_argument("--bucket-frames", type=int, default=64)
  ap.add_argument("--save", type=Path, default=None)
  ap.add_argument("--platform", default=None)
  ap.add_argument("--extra-hparams", default=None,
                  help="e.g. tiny model for CPU smoke runs: "
                       "'n_flows=2,n_channels=32,n_layers=2'")
  args = ap.parse_args()

  import jax
  if args.platform:
    jax.config.update("jax_platforms", args.platform)
  try:
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/waveglow_tpu_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
  except Exception:
    pass

  from waveglow_tpu.checkpointing import (get_last_checkpoint_any,
                                          load_checkpoint_any)
  from waveglow_tpu.hparams import parse_custom_hparams
  from waveglow_tpu.inference.synthesizer import Synthesizer
  from waveglow_tpu.training.data import load_dataset
  from waveglow_tpu.training.loop import train

  t_begin = time.perf_counter()

  if args.checkpoint is not None:
    ckpt_path = args.checkpoint
  else:
    train_dir = args.workdir / "train"
    val_dir = args.workdir / "val"
    for d, n in ((train_dir, 8), (val_dir, 2)):
      d.mkdir(parents=True, exist_ok=True)
      for i in range(n):
        dst = d / f"audio{i}.wav"
        if not dst.exists():
          shutil.copy(FIXTURE, dst)
    hp = {
        "batch_size": "8", "epochs": str(args.iterations),
        "iters_per_checkpoint": "0", "epochs_per_checkpoint": "0",
        **parse_custom_hparams(args.extra_hparams),
    }
    ckpt_dir = args.workdir / "ckpts"
    if ckpt_dir.exists():
      shutil.rmtree(ckpt_dir)
    train(hp, None, load_dataset(train_dir), load_dataset(val_dir), ckpt_dir)
    ckpt_path, _ = get_last_checkpoint_any(ckpt_dir)
  train_wall = time.perf_counter() - t_begin

  ckpt = load_checkpoint_any(ckpt_path)

  result = {
      "metric": "bucket_padding_deviation_fullscale",
      "iterations": args.iterations if args.checkpoint is None else None,
      "bucket_frames": args.bucket_frames,
      "train_wall_seconds": round(train_wall, 1),
      "platform": None,
      "dtypes": {},
  }

  from waveglow_tpu.dsp.mel import MelSTFT

  for dtype in ("float32", "bfloat16"):
    synth = Synthesizer(ckpt, custom_hparams={"compute_dtype": dtype})
    result["platform"] = jax.devices()[0].platform
    mel = np.asarray(MelSTFT(synth.hparams).get_mel_from_file(FIXTURE))
    frames = mel.shape[-1]
    # solo = the exact unpadded program; bucketed = the CLI default
    solo = synth.infer(mel, seed=0, denoiser_strength=0.0).wav
    bucketed = synth.infer(mel, seed=0, denoiser_strength=0.0,
                           bucket_frames=args.bucket_frames).wav
    assert solo.shape == bucketed.shape

    cfg = synth.config
    reach = (cfg.n_flows * ((cfg.kernel_size - 1) // 2)
             * (2 ** cfg.n_layers - 1) * cfg.n_group)
    dev = np.abs(bucketed.astype(np.float64) - solo.astype(np.float64))
    sig_rms = float(np.sqrt(np.mean(np.square(solo.astype(np.float64)))))
    sig_peak = float(np.max(np.abs(solo)))

    def stats(x):
      return {"max_abs": float(np.max(x)) if x.size else 0.0,
              "rms": float(np.sqrt(np.mean(np.square(x)))) if x.size else 0.0}

    pad_frames = (-frames) % args.bucket_frames
    result["dtypes"][dtype] = {
        "frames": int(frames),
        "padded_to": int(frames + pad_frames),
        "samples": int(solo.shape[0]),
        "tail_reach_samples": int(reach),
        "signal_rms": round(sig_rms, 6),
        "signal_peak": round(sig_peak, 6),
        "body": stats(dev[:-reach]),
        "tail": stats(dev[-reach:]),
        "tail_rel_rms": round(
            float(np.sqrt(np.mean(np.square(dev[-reach:])))) / sig_rms, 6),
    }
    print(dtype, json.dumps(result["dtypes"][dtype]), flush=True)

  result["wall_seconds"] = round(time.perf_counter() - t_begin, 1)
  line = json.dumps(result)
  print(line)
  if args.save:
    args.save.parent.mkdir(parents=True, exist_ok=True)
    args.save.write_text(line + "\n")


if __name__ == "__main__":
  main()
