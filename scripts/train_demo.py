"""Real-audio end-to-end training demo on the TPU.

Trains the FULL 12-flow/256-channel model on the vendored 9.6 s speech
fixture (overfit-one-utterance) through the complete production pipeline —
native wav decode, prefetch, jitted on-device-mel train step, the
reference's checkpoint schedule — then runs the real ``validate()`` quality
runtime on the near-init vs final checkpoints and reports the improvement:
NLL, MCD(+DTW), cosine and structural mel similarity.

This is the learning-dynamics proof at full scale on real speech that the
unit tests (tests/test_learning.py, tiny configs, synthetic sines) cannot
give: loss must fall and every copy-synthesis quality metric must improve.

Prints one JSON line; --save writes it to a benchmarks/ artifact.
"""

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent
FIXTURE = REPO / "tests" / "fixtures" / "audio.wav"


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--iterations", type=int, default=1000)
  ap.add_argument("--workdir", type=Path,
                  default=Path("/tmp/waveglow_train_demo"))
  ap.add_argument("--dtype", default="bfloat16")
  ap.add_argument("--save", type=Path, default=None)
  ap.add_argument("--platform", default=None)
  ap.add_argument("--extra-hparams", default=None,
                  help="extra overrides, e.g. a tiny model for CPU smoke "
                       "runs: 'n_flows=2,n_channels=32,n_layers=2'")
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

  from waveglow_tpu.checkpointing import (get_checkpoint_any,
                                          load_checkpoint_any)
  from waveglow_tpu.eval.validation import validate
  from waveglow_tpu.training.data import load_dataset
  from waveglow_tpu.training.loop import train

  # --- data: batch 8 of random 16k-sample crops of the one utterance -------
  train_dir = args.workdir / "train"
  val_dir = args.workdir / "val"
  eval_dir = args.workdir / "eval"
  for d, n in ((train_dir, 8), (val_dir, 2), (eval_dir, 1)):
    d.mkdir(parents=True, exist_ok=True)
    for i in range(n):
      dst = d / f"audio{i}.wav"
      if not dst.exists():
        shutil.copy(FIXTURE, dst)

  # 8 entries / global batch 8 -> 1 batch-iteration per epoch, so epochs ==
  # iterations; saves land at iteration 1 (near-init) and the last iteration
  # (reference schedule: first + last with both periodic knobs off)
  from waveglow_tpu.hparams import parse_custom_hparams
  hp = {
      "batch_size": "8", "epochs": str(args.iterations),
      "iters_per_checkpoint": "0", "epochs_per_checkpoint": "0",
      "compute_dtype": args.dtype,
      **parse_custom_hparams(args.extra_hparams),
  }
  ckpt_dir = args.workdir / "ckpts"
  logdir = args.workdir / "logs"
  if ckpt_dir.exists():
    shutil.rmtree(ckpt_dir)
  if logdir.exists():
    shutil.rmtree(logdir)

  t0 = time.perf_counter()
  train(hp, logdir, load_dataset(train_dir), load_dataset(val_dir), ckpt_dir)
  train_wall = time.perf_counter() - t0

  losses = {}
  with open(logdir / "metrics.jsonl") as f:
    for line in f:
      rec = json.loads(line)
      if rec["event"] == "train_step":
        losses[rec["iteration"]] = rec["loss"]

  # --- quality before/after via the real validate() runtime ----------------
  eval_entries = load_dataset(eval_dir)

  def quality(iteration):
    ckpt = load_checkpoint_any(get_checkpoint_any(ckpt_dir, iteration))
    entries = validate(ckpt, eval_entries,
                       custom_hparams={"compute_dtype": args.dtype},
                       denoiser_strength=0.0005, sigma=1.0,
                       entry_names=set(), full_run=True,
                       save_callback=lambda *a: None, seed=0)
    e = entries[0]
    return {"mcd_dtw": round(e.mfcc_dtw_mcd, 3), "mcd": round(e.mcd, 3),
            "cosine": round(e.cosine_similarity, 4),
            "ssim": round(e.structural_similarity, 4)}

  before = quality(1)
  after = quality(args.iterations)

  result = {
      "metric": "train_demo_real_audio",
      "iterations": args.iterations,
      "dtype": args.dtype,
      "platform": jax.devices()[0].platform,
      "train_wall_seconds": round(train_wall, 1),
      "loss_first": round(losses[1], 4),
      "loss_last": round(losses[max(losses)], 4),
      "loss_curve_every_100": {str(i): round(losses[i], 4)
                               for i in sorted(losses) if i % 100 == 0},
      "quality_near_init": before,
      "quality_final": after,
      "improved": {
          "loss": losses[max(losses)] < losses[1],
          "mcd_dtw": after["mcd_dtw"] < before["mcd_dtw"],
          "cosine": after["cosine"] > before["cosine"],
      },
  }
  print(json.dumps(result), flush=True)
  if args.save:
    args.save.parent.mkdir(parents=True, exist_ok=True)
    args.save.write_text(json.dumps(result, indent=1) + "\n")


if __name__ == "__main__":
  main()
