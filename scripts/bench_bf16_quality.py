"""Quantify the bf16 production mode's QUALITY at full scale.

The headline throughput (BENCH_r*.json) is measured in bfloat16; this
script attaches the quality number that claim needs (VERDICT r4 missing
#4): synthesize the 9.6 s speech fixture with a trained full-size
12x256 checkpoint in float32 and in bfloat16 — SAME injected noise, so
the only difference is compute precision — and report:

  * waveform deltas: max|bf16 - f32|, RMS(delta)/RMS(f32), RMS ratio;
  * the reference's own quality metrics BETWEEN the two outputs
    (MCD+-DTW, cosine mel similarity, SSIM of rendered spectrograms —
    reference validation.py:211-264);
  * each mode's copy-synthesis quality vs the SOURCE mel (so the bf16
    degradation is read against the task-level metric scale);
  * per-mode inference wall time (the speed the quality buys).

Usage (TPU):
  python scripts/train_demo.py --iterations 2000        # trained weights
  python scripts/bench_bf16_quality.py --save benchmarks/bf16_quality_tpu.json

Prints one JSON line. tests/test_regression_pinned.py pins the committed
artifact's bounds.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent
FIXTURE = REPO / "tests" / "fixtures" / "audio.wav"


def mel_metrics(mel_a, mel_b):
  """Reference metric stack between two log-mels (validation.py:211-264)."""
  from waveglow_tpu.eval.metrics import (calculate_structural_similarity_np,
                                         cosine_dist_mels, get_metrics_mels)
  from waveglow_tpu.eval.plots import (make_same_width_by_filling_white,
                                       plot_melspec_np)

  mcd_dtw, penalty_dtw, _ = get_metrics_mels(mel_a, mel_b, use_dtw=True)
  mcd, penalty, _ = get_metrics_mels(mel_a, mel_b, use_dtw=False)
  cosine = cosine_dist_mels(mel_a, mel_b)
  raw_a, _ = plot_melspec_np(mel_a)
  raw_b, _ = plot_melspec_np(mel_b)
  # a re-melled waveform can differ by a frame from the source mel: pad the
  # rendered plots to one width, exactly as validate() does
  raw_a, raw_b = make_same_width_by_filling_white([raw_a, raw_b])
  ssim, _ = calculate_structural_similarity_np(raw_a, raw_b)
  return {"mcd_dtw": round(mcd_dtw, 3), "penalty_dtw": round(penalty_dtw, 4),
          "mcd": round(mcd, 3), "cosine": round(cosine, 5),
          "ssim": round(ssim, 4)}


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--checkpoint", default="/tmp/waveglow_train_demo/ckpts",
                  help="checkpoint file, or a directory of checkpoints "
                       "(the last iteration is used)")
  ap.add_argument("--sigma", type=float, default=1.0)
  ap.add_argument("--denoiser-strength", type=float, default=0.0005)
  ap.add_argument("--save", type=Path, default=None)
  ap.add_argument("--platform", default=None,
                  help="force a jax platform (e.g. cpu for smoke runs)")
  ap.add_argument("--custom-hparams", default=None,
                  help="overrides applied to BOTH modes (tiny-config smoke)")
  args = ap.parse_args()

  import jax

  if args.platform:
    jax.config.update("jax_platforms", args.platform)

  import numpy as np

  from waveglow_tpu.checkpointing import (get_last_checkpoint_any,
                                          load_checkpoint_any)
  from waveglow_tpu.dsp.mel import MelSTFT
  from waveglow_tpu.hparams import parse_custom_hparams
  from waveglow_tpu.inference.synthesizer import Synthesizer
  from waveglow_tpu.models.waveglow import infer_noise_shapes

  path = Path(args.checkpoint)
  if path.is_dir():
    try:  # a CHECKPOINTS directory: use the last iteration
      path, _ = get_last_checkpoint_any(path)
    except FileNotFoundError:
      pass  # a single .orbax checkpoint directory itself
  ckpt = load_checkpoint_any(path)
  overrides = parse_custom_hparams(args.custom_hparams)

  synth = {
      "float32": Synthesizer(ckpt, compute_dtype="float32",
                             custom_hparams=overrides),
      "bfloat16": Synthesizer(ckpt, compute_dtype="bfloat16",
                              custom_hparams=overrides),
  }
  hp = synth["float32"].hparams
  mel_op = MelSTFT(hp)
  mel = np.asarray(mel_op.get_mel_from_file(FIXTURE), dtype=np.float32)
  frames = mel.shape[-1]

  # identical injected standard-normal noise for both modes: the ONLY
  # difference between the runs is compute precision (jax.random with the
  # same key would also match, but explicit injection removes any doubt)
  shapes = infer_noise_shapes(synth["float32"].config, 1, frames * 32)
  rng = np.random.default_rng(0)
  noise = [rng.standard_normal(s).astype(np.float32) for s in shapes]

  wavs, times = {}, {}
  for mode, s in synth.items():
    r = s.infer(mel, sigma=args.sigma, noise=noise,
                denoiser_strength=args.denoiser_strength)
    # time a second call: the first paid the XLA compile
    t0 = time.perf_counter()
    r = s.infer(mel, sigma=args.sigma, noise=noise,
                denoiser_strength=args.denoiser_strength)
    times[mode] = round(time.perf_counter() - t0, 4)
    wavs[mode] = np.asarray(r.wav_denoised, dtype=np.float64)

  w32, w16 = wavs["float32"], wavs["bfloat16"]
  delta = w16 - w32
  rms32 = float(np.sqrt(np.mean(w32 ** 2)))

  mels = {m: np.asarray(mel_op.get_mel(w.astype(np.float32)))
          for m, w in wavs.items()}

  result = {
      "metric": "bf16_vs_f32_synthesis_quality",
      "platform": jax.devices()[0].platform,
      "device": str(jax.devices()[0]),
      "checkpoint": str(path),
      "iteration": int(ckpt.iteration),
      "config": f"{hp.n_flows}x{hp.n_channels}",
      "frames": int(frames),
      "audio_seconds": round(frames * 256 / hp.sampling_rate, 3),
      "sigma": args.sigma,
      "denoiser_strength": args.denoiser_strength,
      "waveform_delta": {
          "max_abs": round(float(np.abs(delta).max()), 6),
          "rms_delta_over_rms_f32": round(
              float(np.sqrt(np.mean(delta ** 2))) / rms32, 6),
          "rms_ratio_bf16_over_f32": round(
              float(np.sqrt(np.mean(w16 ** 2))) / rms32, 6),
      },
      "bf16_vs_f32": mel_metrics(mels["float32"], mels["bfloat16"]),
      "f32_vs_source": mel_metrics(mel, mels["float32"]),
      "bf16_vs_source": mel_metrics(mel, mels["bfloat16"]),
      "inference_seconds": times,
  }
  line = json.dumps(result)
  print(line)
  if args.save:
    args.save.parent.mkdir(parents=True, exist_ok=True)
    args.save.write_text(json.dumps(result, indent=1) + "\n")


if __name__ == "__main__":
  main()
